"""Unit tests for trainer internals: loss-spike rollback, one-cycle LR,
per-group param labeling, and the check_func parity harness."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lab4d_tpu.engine.trainer import Trainer, onecycle_linear, param_labels


class _Stub:
    check_grad = Trainer.check_grad


def test_rollback_on_grad_spike():
    tr = _Stub()
    good = {"w": np.ones(3, np.float32)}
    good_opt = {"m": np.zeros(3, np.float32)}
    tr.model_cache = [good, {"w": np.full(3, 2.0, np.float32)}]
    tr.opt_cache = [good_opt, {"m": np.ones(3, np.float32)}]
    tr.params = {"w": jnp.full(3, 99.0)}
    tr.opt_state = {"m": jnp.full(3, 99.0)}

    tr.check_grad(1.0)  # under threshold: untouched
    assert float(tr.params["w"][0]) == 99.0

    tr.check_grad(50.0)  # spike: restore the two-rounds-ago snapshot
    np.testing.assert_allclose(np.asarray(tr.params["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(tr.opt_state["m"]), 0.0)

    tr.params = {"w": jnp.full(3, 7.0)}
    tr.check_grad(float("nan"))  # non-finite also rolls back
    np.testing.assert_allclose(np.asarray(tr.params["w"]), 1.0)


def test_onecycle_linear_shape():
    total = 1000
    peak = 5e-4
    lr0 = onecycle_linear(0, total, peak, 0.1, 25.0, 1e4)
    lr_peak = onecycle_linear(100, total, peak, 0.1, 25.0, 1e4)
    lr_end = onecycle_linear(total, total, peak, 0.1, 25.0, 1e4)
    assert float(lr0) == pytest.approx(peak / 25.0)
    assert float(lr_peak) == pytest.approx(peak)
    assert float(lr_end) < float(lr0)
    # monotone up then down
    ups = [float(onecycle_linear(s, total, peak, 0.1, 25.0, 1e4))
           for s in range(0, 100, 10)]
    downs = [float(onecycle_linear(s, total, peak, 0.1, 25.0, 1e4))
             for s in range(100, total, 100)]
    assert all(a <= b + 1e-9 for a, b in zip(ups, ups[1:]))
    assert all(a >= b - 1e-9 for a, b in zip(downs, downs[1:]))


def test_param_labels_explicit_groups():
    params = {
        "fields": {
            "logscale": jnp.zeros(1),
            "mlp": {"kernel": jnp.zeros((4, 4))},
            "base_quat": jnp.zeros((2, 4)),
        }
    }
    labels = param_labels(params)
    assert labels["fields"]["logscale"] == "explicit"
    assert labels["fields"]["base_quat"] == "explicit"
    assert labels["fields"]["mlp"]["kernel"] == "base"


def test_check_func_harness():
    from tests.utils import check_func

    f1 = jax.jit(lambda x: x * 2.0)
    f2 = lambda x: x + x
    stats = check_func(f1, f2, (jnp.arange(8.0),), n_iters=3, warmup=1)
    assert "mean_ms" in stats["f1"]

    with pytest.raises(AssertionError):
        check_func(f1, lambda x: x * 3.0, (jnp.arange(8.0),), n_iters=1)


def test_merge_params_surgery():
    from lab4d_tpu.engine.trainer import _merge_params

    params = {
        "fields": {
            "inst_embedding": {"embedding": jnp.zeros((3, 8))},
            "camera": {"base_quat": jnp.zeros((3, 4))},
            "mlp": {"kernel": jnp.zeros((4, 4))},
        }
    }
    loaded = {
        "fields": {
            # 5 videos in the source checkpoint -> mean-compressed to 3
            "inst_embedding": {
                "embedding": np.arange(40, dtype=np.float32).reshape(5, 8)
            },
            "camera": {"base_quat": np.ones((5, 4), np.float32)},
            "mlp": {"kernel": np.full((4, 4), 2.0, np.float32)},
        }
    }
    merged = _merge_params(params, loaded)
    emb = np.asarray(merged["fields"]["inst_embedding"]["embedding"])
    expect = np.arange(40, dtype=np.float32).reshape(5, 8).mean(0)
    np.testing.assert_allclose(emb, np.tile(expect, (3, 1)))
    np.testing.assert_allclose(
        np.asarray(merged["fields"]["camera"]["base_quat"]), 1.0
    )
    np.testing.assert_allclose(
        np.asarray(merged["fields"]["mlp"]["kernel"]), 2.0
    )


def test_freeze_bone_len_labels():
    """--freeze_bone_len labels skeleton bone lengths 'frozen' (0 lr)
    for the category->new-instance transfer workflow (tutorial 4)."""
    from lab4d_tpu.engine.trainer import param_labels

    params = {
        "fields": {
            "warp": {
                "articulation": {"log_bone_len": np.zeros(25),
                                 "so3": np.zeros((16, 25, 3))},
            },
            "mlp": {"kernel": np.zeros((4, 4))},
        }
    }
    import flax

    lab = flax.traverse_util.flatten_dict(
        param_labels(params, freeze_bone_len=True)
    )
    assert lab[("fields", "warp", "articulation", "log_bone_len")] == "frozen"
    assert lab[("fields", "mlp", "kernel")] == "base"
    lab2 = flax.traverse_util.flatten_dict(param_labels(params))
    assert lab2[("fields", "warp", "articulation", "log_bone_len")] != "frozen"


def test_large_grad_steps_are_skipped_not_clipped():
    """Reference parity (ref trainer.py:581-604): a step whose global
    grad norm exceeds the threshold must be SKIPPED (zero update), not
    applied at clipped magnitude; norms below pass through untouched,
    and the pre-check norm is exposed in the state either way."""
    from lab4d_tpu.engine.trainer import clip_with_norm

    tx = clip_with_norm(5.0)
    g_small = {"w": jnp.asarray([3.0, 4.0])}  # norm 5.0 is NOT < 5.0
    g_big = {"w": jnp.asarray([30.0, 40.0])}
    g_nan = {"w": jnp.asarray([np.nan, 1.0])}
    state = tx.init(g_small)

    out, state = tx.update({"w": jnp.asarray([0.3, 0.4])}, state)
    np.testing.assert_allclose(np.asarray(out["w"]), [0.3, 0.4], rtol=1e-6)
    assert float(state.grad_norm) == pytest.approx(0.5)

    out, state = tx.update(g_big, state)
    np.testing.assert_array_equal(np.asarray(out["w"]), [0.0, 0.0])
    assert float(state.grad_norm) == pytest.approx(50.0)

    out, state = tx.update(g_nan, state)  # non-finite: skip too
    np.testing.assert_array_equal(np.asarray(out["w"]), [0.0, 0.0])
