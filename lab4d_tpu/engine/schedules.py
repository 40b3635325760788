"""Training-progress schedules as traced scalars.

Parity: dvr_model.set_progress (engine/model.py:95-160) — but instead of
mutating a config dict, `compute_sched(step)` returns a dict of jnp
scalars consumed inside the jitted loss function, so one compiled program
serves the whole run.
"""

from __future__ import annotations

import jax.numpy as jnp


def interp_wt_jnp(x, y, x2, kind: str = "linear"):
    x0, x1 = x
    y0, y1 = y
    t = (x2 - x0) / (x1 - x0)
    if kind == "linear":
        y2 = y0 + t * (y1 - y0)
    elif kind == "log":
        ly0, ly1 = jnp.log10(jnp.float32(y0)), jnp.log10(jnp.float32(y1))
        y2 = 10.0 ** (ly0 + t * (ly1 - ly0))
    else:
        raise ValueError(kind)
    return jnp.clip(y2, min(y0, y1), max(y0, y1))


def compute_sched(step):
    """Schedule scalars at an optimization step (traced or concrete)."""
    step = jnp.asarray(step, dtype=jnp.float32)
    return {
        # positional-encoding annealing: 0.6 -> 1.0 over 4k steps
        "alpha": interp_wt_jnp((0, 4000), (0.6, 1.0), step),
        # instance-code swap probability: 1.0 -> 0.2 over 2k steps
        "beta_prob": interp_wt_jnp((0, 2000), (1.0, 0.2), step),
        # loss-weight ramps (factors multiplying the static flag weights)
        "reg_cam_prior_factor": interp_wt_jnp((0, 800), (1.0, 0.0), step),
        "reg_eikonal_factor": interp_wt_jnp((0, 4000), (1.0, 100.0), step, "log"),
        "reg_skel_prior_factor": interp_wt_jnp((0, 4000), (1.0, 0.0), step),
        "reg_gauss_mask_factor": interp_wt_jnp((0, 4000), (1.0, 0.0), step),
    }
