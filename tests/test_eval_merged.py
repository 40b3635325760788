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
    model, batch = make_model_and_batch(fg_motion=fg_motion)
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
    model, batch = make_model_and_batch(fg_motion=fg_motion)
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


def test_topk8_rgb_close_to_exact_on_distilled_model(monkeypatch):
    """K=8 weight-ranked heavy-head eval must stay within 40 dB of the
    exact every-sample evaluation on a model with CONCENTRATED
    integration weights (geometry-distilled sphere + sharpened beta —
    the regime render.py ships K=8 for; an untrained model's spread-out
    weights are covered by the degenerate K=n_depth test above)."""
    import jax.numpy as jnp

    from lab4d_tpu.engine.init_utils import fit_geometry

    model, batch = make_model_and_batch("fg", "rigid")
    sched = compute_sched(4000)  # PE fully annealed
    params = jax.jit(model.init, static_argnames=("train",))(
        RNGS, batch, sched, train=True
    )["params"]

    # distill a sphere SDF (radius 0.1, the rigid-fg init prior) into
    # the field — same pool layout the Trainer builds
    rng = np.random.default_rng(0)
    S, n = 120, 256
    pts = rng.uniform(-0.25, 0.25, (S, n, 3)).astype(np.float32)
    sdf_gt = (
        np.linalg.norm(pts, axis=-1, keepdims=True) - 0.1
    ).astype(np.float32)
    pools = {
        "fg": {
            "pts": jnp.asarray(pts),
            "sdf_gt": jnp.asarray(sdf_gt),
            "inst_id": jnp.zeros((S, n), jnp.int32),
        }
    }
    params = fit_geometry(model, params, pools, num_steps=S)

    # sharpen VolSDF beta toward trained-model sharpness so integration
    # weights concentrate (logibeta is trained 10x-lr "explicit" group)
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    for k in list(flat):
        if k[-1] == "logibeta":
            flat[k] = flat[k] + 2.0
    params = flax.traverse_util.unflatten_dict(flat)

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
    monkeypatch.setenv("LAB4D_EVAL_TOPK", "8")
    approx = jax.device_get(run())

    # where the object actually renders (exact alpha > 0.5)
    m = exact["mask"][..., 0] > 0.5
    assert m.sum() > 0
    err = np.mean((approx["rgb"][m] - exact["rgb"][m]) ** 2)
    psnr = -10 * np.log10(max(float(err), 1e-12))
    assert psnr >= 40.0, f"topk8 rgb only {psnr:.1f} dB vs exact"
    # the mask (total integration mass) is exact by construction; depth
    # is integrated from the K selected samples, so it is exact only
    # where the weights are concentrated — check interior pixels
    np.testing.assert_allclose(
        approx["mask"], exact["mask"], atol=1e-5, rtol=1e-5
    )
    mi = exact["mask"][..., 0] > 0.9
    assert mi.sum() > 0
    # rays whose mass splits across well-separated depth lobes (front and
    # back sphere intersections) shift when the tail lobe is dropped, so
    # bound the TYPICAL depth error, not the worst ray
    derr = np.abs(approx["depth"][mi] - exact["depth"][mi])
    assert np.median(derr) < 1e-3, np.sort(derr.ravel())
