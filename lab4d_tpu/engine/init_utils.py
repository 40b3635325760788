"""Init-time prior fitting: camera/intrinsics/skeleton MLP fits and the
SDF geometry distillation.

Parity: TimeMLP.mlp_init (time.py:76-96, Adam-until-converged) and
NeRF.geometry_init (nerf.py:251-295, 500-step distillation). Both run as
jit-compiled lax.while_loop / scan programs over the full param tree —
losses only touch the relevant submodule so other params receive zero
gradient (plain Adam, no weight decay, exactly like the reference).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import numpy as np
import jax
import jax.numpy as jnp
import optax

from lab4d_tpu.utils.loss import align_vectors


def fit_until_converged(
    loss_fn: Callable,
    params,
    tol: float,
    lr: float = 1e-3,
    max_iters: int = 5000,
    log_name: str = "fit",
):
    """Minimize loss_fn(params) with Adam until loss < tol (bounded).

    Returns the fitted params. Runs as a single jitted while_loop.
    """
    tx = optax.adam(lr)

    @jax.jit
    def run(params):
        opt_state = tx.init(params)

        def cond(carry):
            i, _, _, loss = carry
            return (loss > tol) & (i < max_iters)

        def body(carry):
            i, p, s, _ = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (i + 1, p, s, loss)

        init_loss = loss_fn(params)
        i, params, _, loss = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), params, opt_state, init_loss)
        )
        return params, loss, i

    params, loss, iters = run(params)
    print(f"[init] {log_name}: loss={float(loss):.6f} after {int(iters)} iters")
    return params


def fit_geometry(
    model,
    params,
    pools: Dict[str, Dict[str, np.ndarray]],
    num_steps: int = 500,
    lr: float = 1e-3,
):
    """SDF distillation from proxy geometry (nerf.py:251-295).

    Args:
        pools: per-category {"pts": (S, n, 3), "sdf_gt": (S, n, 1),
            "inst_id": (S, n)} pre-sampled on host (S = num_steps)
    """
    tx = optax.adam(lr)

    def step_loss(p, step):
        total = 0.0
        for cate, pool in pools.items():
            pts = pool["pts"][step]
            sdf_gt = pool["sdf_gt"][step]
            inst_id = pool["inst_id"][step]
            field = lambda method, *a, **kw: model.apply(
                {"params": p},
                *a,
                method=method,
                rngs={"aux": jax.random.fold_in(jax.random.PRNGKey(7), step)},
                **kw,
            )
            sdf, vis, eik = field(
                partial(_field_init_terms, cate=cate), pts, inst_id
            )
            scale = jax.lax.stop_gradient(align_vectors(sdf, sdf_gt))
            sdf_loss = jnp.mean((sdf * scale - sdf_gt) ** 2)
            vis_loss = -jax.nn.log_sigmoid(vis).mean() * 0.01
            mask = (eik > 0).astype(jnp.float32)
            eik_loss = (
                jnp.sum(eik * mask) / jnp.maximum(jnp.sum(mask), 1.0) * 1e-4
            )
            total = total + sdf_loss + vis_loss + eik_loss
        return total

    @jax.jit
    def run(params):
        opt_state = tx.init(params)

        def body(carry, step):
            p, s = carry
            loss, grads = jax.value_and_grad(step_loss)(p, step)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss

        (params, _), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(num_steps)
        )
        return params, losses

    params, losses = run(params)
    print(
        f"[init] geometry: loss {float(losses[0]):.4f} -> {float(losses[-1]):.4f}"
    )
    return params


def _field_init_terms(model, pts, inst_id, cate: str):
    """SDF, visibility and per-point eikonal for one field; method target
    for model.apply."""
    field = model.fields.field_params[cate]
    sdf = field.forward(pts, inst_id=inst_id, get_density=False)
    vis = field.vis_mlp(pts, inst_id=inst_id)
    eik = field.compute_eikonal(pts[:, None, None], inst_id=inst_id)
    return sdf, vis, eik
