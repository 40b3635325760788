"""Loss/grad finiteness across every model family the reference supports:
warp types (dense, nvp, skel-human, composed), the comp field type
(Total-Recon fg+bg), and multi-instance morphology codes (RAC)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lab4d_tpu.engine.schedules import compute_sched
from tests.test_model import RNGS, make_model_and_batch


def _loss_and_grads(model, batch, wrt_grads=True):
    sched = compute_sched(100)
    variables = jax.jit(model.init, static_argnames=("train",))(
        RNGS, batch, sched, train=True
    )

    def loss_fn(p):
        ld = model.apply(
            {"params": p}, batch, sched, train=True,
            rngs={"aux": jax.random.PRNGKey(3), "swap": jax.random.PRNGKey(4)},
        )
        return sum(jax.tree.leaves(ld)), ld

    if wrt_grads:
        (total, ld), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(variables["params"])
        for leaf in jax.tree.leaves(grads):
            assert bool(jnp.isfinite(leaf).all()), "non-finite gradient"
    else:
        total, ld = jax.jit(loss_fn)(variables["params"])
    assert np.isfinite(float(total))
    for k, v in ld.items():
        assert np.isfinite(float(v)), f"loss {k} not finite"
    return ld


@pytest.mark.parametrize(
    "fg_motion",
    [
        "dense",  # the fast representative; the rest are slow-marked
        pytest.param("nvp", marks=pytest.mark.slow),
        pytest.param("skel-human", marks=pytest.mark.slow),
        pytest.param("comp_skel-quad_dense", marks=pytest.mark.slow),
    ],
)
def test_warp_variants_fg(fg_motion):
    model, batch = make_model_and_batch("fg", fg_motion)
    ld = _loss_and_grads(model, batch, wrt_grads=False)
    if fg_motion.startswith(("skel", "comp")):
        assert "reg_skel_prior" in ld
    if fg_motion.startswith("comp"):
        assert float(ld["reg_soft_deform"]) >= 0


@pytest.mark.slow
def test_comp_field_type():
    """Total-Recon configuration: fg + bg composed along rays."""
    model, batch = make_model_and_batch("comp", "bob")
    ld = _loss_and_grads(model, batch)
    # both fields' masks supervise (field-specific masking rules apply)
    assert any(k.startswith("mask") for k in ld)


def test_bg_field_type():
    model, batch = make_model_and_batch("bg", "rigid")
    _loss_and_grads(model, batch, wrt_grads=False)


@pytest.mark.slow
def test_multi_instance_codes():
    """RAC-style: per-video morphology codes (--nosingle_inst)."""
    from lab4d_tpu.engine.model import DVRModel
    from lab4d_tpu.nnutils.embedding import FrameInfo
    from tests.test_model import LOSS_WEIGHTS

    num_frames, M, N = 10, 2, 6
    fi = FrameInfo(
        [0, num_frames // 2, num_frames],
        [0, num_frames // 2 + 1, num_frames + 2],
        list(range(num_frames)),
    )
    rt = np.tile(np.eye(4, dtype=np.float32)[None], (num_frames, 1, 1))
    rt[:, 2, 3] = 1.0
    intr = np.tile(
        np.array([100.0, 100.0, 32.0, 32.0], np.float32)[None], (num_frames, 1)
    )
    model = DVRModel(
        frame_info=fi, field_type="fg", fg_motion="skel-quad",
        num_inst=2, train_res=64, intrinsics_init=intr, rtmat_fg=rt,
        rtmat_bg=rt, loss_weights=LOSS_WEIGHTS,
    )
    _, batch = make_model_and_batch("fg", "skel-quad", M=M, N=N)
    batch = dict(batch)
    batch["dataid"] = jnp.asarray(np.array([[0, 0], [1, 1]], np.int32))
    ld = _loss_and_grads(model, batch)
    assert "rgb" in ld


def test_compose_fields_matches_gather_reference():
    """The one-hot permutation-matmul depth compose must be bitwise-close
    to the take_along_axis formulation it replaced (which lowered to
    serial dynamic-slices on TPU; see MultiFields.compose_fields)."""
    from lab4d_tpu.nnutils.multifields import MultiFields

    rng = np.random.default_rng(0)
    M, N, D = 2, 8, 16

    def mk(C):
        return jnp.asarray(rng.standard_normal((M, N, D, C)).astype(np.float32))

    fields = {
        "fg": {"depth": mk(1), "rgb": mk(3), "feat": mk(16)},
        "bg": {"depth": mk(1) + 0.5, "rgb": mk(3)},  # feat missing on bg
    }
    deltas = {"fg": mk(1) ** 2, "bg": mk(1) ** 2}

    out, out_deltas = MultiFields.compose_fields(fields, deltas)

    # gather reference
    cat = {
        k: jnp.concatenate(
            [fields[c].get(k, jnp.zeros((M, N, D, v.shape[-1])))
             for c in ("fg", "bg")],
            axis=2,
        )
        for k, v in fields["fg"].items()
    }
    deltas_cat = jnp.concatenate([deltas["fg"], deltas["bg"]], axis=2)
    z_idx = jnp.argsort(cat["depth"], axis=2)
    for k, v in cat.items():
        ref = jnp.take_along_axis(v, jnp.broadcast_to(z_idx, v.shape), axis=2)
        np.testing.assert_allclose(out[k], ref, rtol=1e-6, atol=1e-6)
    ref_d = jnp.take_along_axis(
        deltas_cat, jnp.broadcast_to(z_idx, deltas_cat.shape), axis=2
    )
    np.testing.assert_allclose(out_deltas, ref_d, rtol=1e-6, atol=1e-6)
    # sorted depth must be nondecreasing
    assert np.all(np.diff(np.asarray(out["depth"][..., 0]), axis=-1) >= 0)
