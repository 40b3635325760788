"""The fused flow+cycle warp (Deformable.compute_flow_cycle, one
pair-stacked blend-skinning pass) must match the separate
compute_flow + cycle_loss path exactly."""

import numpy as np
import jax
import pytest

import lab4d_tpu.nnutils.nerf as nerf_mod
import lab4d_tpu.nnutils.deformable as deform_mod
from lab4d_tpu.engine.schedules import compute_sched
from __graft_entry__ import _build


def _loss_dict(model, batch, params):
    # jit per call site: the monkeypatched variant traces separately;
    # eager full-model applies cost ~60 s each on CPU
    sched = compute_sched(100)

    def f(p, b):
        return model.apply(
            {"params": p}, b, sched, train=True,
            rngs={"aux": jax.random.PRNGKey(7), "swap": jax.random.PRNGKey(8)},
        )

    return jax.jit(f)(params, batch)


@pytest.mark.slow
def test_fused_flow_cycle_matches_separate(monkeypatch):
    model, batch = _build(M=4, N=8, num_frames=16, fg_motion="skel-quad")
    rngs = {"params": jax.random.PRNGKey(0), "aux": jax.random.PRNGKey(1),
            "swap": jax.random.PRNGKey(2)}
    sched = compute_sched(0)
    params = jax.jit(model.init, static_argnames=("train",))(
        rngs, batch, sched, train=True
    )["params"]

    fused = _loss_dict(model, batch, params)

    # force the base (separate) implementation
    monkeypatch.setattr(
        deform_mod.Deformable,
        "compute_flow_cycle",
        nerf_mod.NeRF.compute_flow_cycle,
    )
    separate = _loss_dict(model, batch, params)

    assert set(fused) == set(separate)
    for k in fused:
        np.testing.assert_allclose(
            np.asarray(fused[k]), np.asarray(separate[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )
