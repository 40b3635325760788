"""Channel-subset rendering (`render.py --render_keys` /
LAB4D_EVAL_CHANNELS): the eval pass skips producers of unrequested
channels (feature/vis MLPs, cycle warp, the normal-gradient vjp), and
every channel it still produces must match the full pass exactly."""

import numpy as np
import jax
import pytest

from lab4d_tpu.engine.schedules import compute_sched
from tests.test_model import RNGS, make_model_and_batch


@pytest.fixture(scope="module")
def model_params_batch():
    model, batch = make_model_and_batch(fg_motion="skel-quad")
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
    return model, params, eval_batch


def _run(model, params, eval_batch):
    return jax.device_get(
        model.apply({"params": params}, eval_batch, method=model.evaluate_chunk)
    )


def test_restricted_channels_match_full(monkeypatch, model_params_batch):
    model, params, eval_batch = model_params_batch
    monkeypatch.delenv("LAB4D_EVAL_CHANNELS", raising=False)
    full = _run(model, params, eval_batch)

    monkeypatch.setenv("LAB4D_EVAL_CHANNELS", "rgb,depth,mask")
    sub = _run(model, params, eval_batch)

    for k in ("rgb", "depth", "mask"):
        assert k in sub, k
        np.testing.assert_allclose(
            sub[k], full[k], rtol=1e-5, atol=1e-6,
            err_msg=f"channel {k} changed under channel restriction",
        )
    for k in ("normal", "eikonal", "feature", "vis", "cyc_dist",
              "gauss_mask"):
        assert k not in sub, f"unrequested channel {k} still produced"


def test_normal_subset_matches_full(monkeypatch, model_params_batch):
    model, params, eval_batch = model_params_batch
    monkeypatch.delenv("LAB4D_EVAL_CHANNELS", raising=False)
    full = _run(model, params, eval_batch)

    monkeypatch.setenv("LAB4D_EVAL_CHANNELS", "normal,mask")
    sub = _run(model, params, eval_batch)

    assert "normal" in sub and "eikonal" in sub  # eikonal rides the vjp
    np.testing.assert_allclose(
        sub["normal"], full["normal"], rtol=1e-5, atol=1e-6
    )
    assert "feature" not in sub and "vis" not in sub


def test_gauss_mask_subset(monkeypatch, model_params_batch):
    """gauss_mask must not require requesting xyz as well (it consumes the
    per-sample xyz internally)."""
    model, params, eval_batch = model_params_batch
    monkeypatch.delenv("LAB4D_EVAL_CHANNELS", raising=False)
    full = _run(model, params, eval_batch)

    monkeypatch.setenv("LAB4D_EVAL_CHANNELS", "gauss_mask,mask")
    sub = _run(model, params, eval_batch)
    np.testing.assert_allclose(
        sub["gauss_mask"], full["gauss_mask"], rtol=1e-5, atol=1e-6
    )
