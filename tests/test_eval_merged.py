"""Parity of the merged two-pass eval path (NeRF.query_field_eval)
against the legacy resample-and-reevaluate path: both evaluate the field
at the same union of depths, so every rendered channel must agree to
numerical tolerance."""

import numpy as np
import jax
import pytest

from lab4d_tpu.engine.schedules import compute_sched
from tests.test_model import RNGS, make_model_and_batch


@pytest.mark.parametrize("fg_motion", ["rigid", "skel-quad"])
def test_merged_eval_matches_legacy(monkeypatch, fg_motion):
    model, batch = make_model_and_batch(fg_motion=fg_motion, M=2, N=8)
    sched = compute_sched(0)
    params = jax.jit(model.init, static_argnames=("train",))(
        RNGS, batch, sched, train=True
    )["params"]

    eval_batch = {
        "dataid": batch["dataid"][:1, 0],
        "frameid_sub": batch["frameid_sub"][:1, 0],
        "crop2raw": batch["crop2raw"][:1, 0],
        "hxy": batch["hxy"][:1, 0],
        "geo": batch["geo"],
    }

    def run():
        return model.apply(
            {"params": params}, eval_batch, method=model.evaluate_chunk
        )

    monkeypatch.setenv("LAB4D_EVAL_MERGED", "0")
    legacy = jax.device_get(run())
    monkeypatch.setenv("LAB4D_EVAL_MERGED", "1")
    merged = jax.device_get(run())

    assert set(legacy) == set(merged), (set(legacy) ^ set(merged))
    for k in legacy:
        np.testing.assert_allclose(
            merged[k], legacy[k], rtol=2e-4, atol=2e-5,
            err_msg=f"channel {k} diverged between eval paths",
        )


@pytest.mark.parametrize("fg_motion", ["rigid", "skel-quad"])
def test_topk_eval_full_budget_matches_exact(monkeypatch, fg_motion):
    """query_field_eval_topk with topk == n_depth selects every union
    sample, and its re-solved density must reproduce the exact merged
    path's integration weights — so every rendered channel agrees even on
    an untrained model (where integration weights are spread out)."""
    model, batch = make_model_and_batch(fg_motion=fg_motion, M=2, N=8)
    sched = compute_sched(0)
    params = jax.jit(model.init, static_argnames=("train",))(
        RNGS, batch, sched, train=True
    )["params"]

    eval_batch = {
        "dataid": batch["dataid"][:1, 0],
        "frameid_sub": batch["frameid_sub"][:1, 0],
        "crop2raw": batch["crop2raw"][:1, 0],
        "hxy": batch["hxy"][:1, 0],
        "geo": batch["geo"],
    }

    def run():
        return model.apply(
            {"params": params}, eval_batch, method=model.evaluate_chunk
        )

    monkeypatch.setenv("LAB4D_EVAL_MERGED", "1")
    monkeypatch.delenv("LAB4D_EVAL_TOPK", raising=False)
    exact = jax.device_get(run())
    monkeypatch.setenv("LAB4D_EVAL_TOPK", "64")
    import lab4d_tpu.nnutils.nerf as nerf_mod

    # topk == n_depth normally dispatches to the exact path; force the
    # topk implementation to prove it degenerates to the same answer
    monkeypatch.setattr(nerf_mod, "_eval_topk", lambda: None)
    orig = nerf_mod.NeRF.query_field_eval

    def force_topk(self, samples_dict, sched=None, n_depth=64):
        return self.query_field_eval_topk(
            samples_dict, sched=sched, n_depth=n_depth, topk=n_depth
        )

    monkeypatch.setattr(nerf_mod.NeRF, "query_field_eval", force_topk)
    topk = jax.device_get(run())
    monkeypatch.setattr(nerf_mod.NeRF, "query_field_eval", orig)

    assert set(exact) == set(topk), (set(exact) ^ set(topk))
    for k in exact:
        np.testing.assert_allclose(
            topk[k], exact[k], rtol=5e-4, atol=5e-4,
            err_msg=f"channel {k} diverged between topk and exact eval",
        )
