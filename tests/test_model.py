"""Model-level tests: forward loss, gradients, schedules, pair flip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lab4d_tpu.engine.model import DVRModel
from lab4d_tpu.engine.schedules import compute_sched, interp_wt_jnp
from lab4d_tpu.nnutils.embedding import FrameInfo
from lab4d_tpu.nnutils.nerf import flip_pair

LOSS_WEIGHTS = tuple(
    {
        "mask_wt": 0.1, "rgb_wt": 0.1, "depth_wt": 1e-4, "flow_wt": 0.5,
        "vis_wt": 1e-2, "feature_wt": 1e-2, "feat_reproj_wt": 5e-2,
        "reg_visibility_wt": 1e-4, "reg_eikonal_wt": 1e-3,
        "reg_deform_cyc_wt": 0.01, "reg_delta_skin_wt": 5e-3,
        "reg_skin_entropy_wt": 5e-4, "reg_gauss_skin_wt": 1e-3,
        "reg_cam_prior_wt": 0.1, "reg_skel_prior_wt": 0.1,
        "reg_gauss_mask_wt": 0.01, "reg_soft_deform_wt": 100.0,
    }.items()
)


def make_model_and_batch(field_type="fg", fg_motion="rigid", M=2, N=6):
    """M and N chosen coprime-ish so broadcasting bugs can't hide."""
    num_frames = 10
    fi = FrameInfo([0, num_frames], [0, num_frames + 2], list(range(num_frames)))
    rt = np.tile(np.eye(4, dtype=np.float32)[None], (num_frames, 1, 1))
    rt[:, 2, 3] = 1.0
    intr = np.tile(
        np.array([100.0, 100.0, 32.0, 32.0], np.float32)[None], (num_frames, 1)
    )
    model = DVRModel(
        frame_info=fi, field_type=field_type, fg_motion=fg_motion,
        num_inst=1, train_res=64, intrinsics_init=intr, rtmat_fg=rt,
        rtmat_bg=rt, loss_weights=LOSS_WEIGHTS,
    )
    rng = np.random.default_rng(0)
    nraw = num_frames + 2
    cates = ("fg", "bg") if field_type == "comp" else (field_type,)
    geo = {
        c: {
            "aabb": jnp.asarray([[-0.2] * 3, [0.2] * 3], jnp.float32),
            "near_far_table": jnp.tile(
                jnp.asarray([0.5, 2.0], jnp.float32), (nraw, 1)
            ),
            "proxy_corners": jnp.asarray(
                rng.standard_normal((8, 3)) * 0.1, jnp.float32
            ),
        }
        for c in cates
    }
    batch = {
        "rgb": rng.random((M, 2, N, 3)).astype(np.float32),
        "mask": (rng.random((M, 2, N, 1)) > 0.5).astype(np.float32),
        "depth": rng.random((M, 2, N, 1)).astype(np.float32),
        "feature": rng.standard_normal((M, 2, N, 16)).astype(np.float32),
        "flow": rng.standard_normal((M, 2, N, 2)).astype(np.float32),
        "flow_uct": rng.random((M, 2, N, 1)).astype(np.float32),
        "vis2d": np.ones((M, 2, N, 1), np.float32),
        "crop2raw": np.tile(np.array([1.0, 1.0, 0.0, 0.0], np.float32), (M, 2, 1)),
        "is_detected": np.ones((M, 2), np.float32),
        "dataid": np.zeros((M, 2), np.int32),
        "frameid_sub": rng.integers(0, num_frames - 1, (M, 2)).astype(np.int32),
        "hxy": np.concatenate(
            [rng.integers(0, 64, (M, 2, N, 2)), np.ones((M, 2, N, 1))], -1
        ).astype(np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch["geo"] = geo
    return model, batch


RNGS = {
    "params": jax.random.PRNGKey(0),
    "aux": jax.random.PRNGKey(1),
    "swap": jax.random.PRNGKey(2),
}


class TestSchedules:
    def test_interp(self):
        assert float(interp_wt_jnp((0, 100), (0.0, 1.0), 50.0)) == pytest.approx(0.5)
        assert float(interp_wt_jnp((0, 100), (1.0, 0.0), 200.0)) == 0.0
        assert float(
            interp_wt_jnp((0, 100), (1.0, 100.0), 50.0, "log")
        ) == pytest.approx(10.0, rel=1e-3)

    def test_sched_endpoints(self):
        s0 = compute_sched(0)
        assert float(s0["alpha"]) == pytest.approx(0.6)
        assert float(s0["beta_prob"]) == pytest.approx(1.0)
        s_end = compute_sched(10_000)
        assert float(s_end["alpha"]) == 1.0
        assert float(s_end["reg_eikonal_factor"]) == pytest.approx(100.0)
        assert float(s_end["reg_cam_prior_factor"]) == 0.0


class TestFlipPair:
    def test_flip(self):
        x = jnp.arange(8).reshape(8, 1)
        got = np.asarray(flip_pair(x)).reshape(-1)
        np.testing.assert_array_equal(got, [1, 0, 3, 2, 5, 4, 7, 6])

    def test_flip_tree(self):
        d = {"a": jnp.arange(4), "b": (jnp.arange(4), jnp.arange(4))}
        out = flip_pair(d)
        np.testing.assert_array_equal(np.asarray(out["a"]), [1, 0, 3, 2])


class TestForwardLoss:
    def test_rigid_fg_loss_and_grads_finite(self):
        model, batch = make_model_and_batch("fg", "rigid")
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

        (total, ld), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(variables["params"])
        assert np.isfinite(float(total))
        for k, v in ld.items():
            assert np.isfinite(float(v)), f"loss {k} not finite"
        for leaf in jax.tree.leaves(grads):
            assert bool(jnp.isfinite(leaf).all()), "non-finite gradient"

    def test_bob_fg_loss_finite(self):
        model, batch = make_model_and_batch("fg", "bob")
        sched = compute_sched(100)
        variables = jax.jit(model.init, static_argnames=("train",))(
            RNGS, batch, sched, train=True
        )
        ld = jax.jit(
            lambda p: model.apply(
                {"params": p}, batch, sched, train=True,
                rngs={"aux": jax.random.PRNGKey(3), "swap": jax.random.PRNGKey(4)},
            )
        )(variables["params"])
        total = sum(jax.tree.leaves(ld))
        assert np.isfinite(float(total))
        # skinning-specific losses must be present and finite (entropy can
        # legitimately underflow to 0 when skinning is one-hot)
        assert float(ld["reg_skin_entropy"]) >= 0
        assert float(ld["reg_gauss_skin"]) != 0

    def test_eval_render_chunk(self):
        model, batch = make_model_and_batch("fg", "rigid")
        sched = compute_sched(100)
        variables = jax.jit(model.init, static_argnames=("train",))(
            RNGS, batch, sched, train=True
        )
        eval_batch = {
            "dataid": batch["dataid"][:, 0],
            "frameid_sub": batch["frameid_sub"][:, 0],
            "crop2raw": batch["crop2raw"][:, 0],
            "hxy": batch["hxy"][:, 0],
            "geo": batch["geo"],
        }
        rendered = jax.jit(
            lambda p, b: model.apply(
                {"params": p}, b, sched=None, method=model.evaluate_chunk
            )
        )(variables["params"], eval_batch)
        assert "rgb" in rendered and "normal" in rendered and "depth" in rendered
        for k, v in rendered.items():
            assert bool(jnp.isfinite(v).all()), f"eval output {k} not finite"


def test_eval_path_stays_unfused():
    """Rendering must not route through the pallas field kernels: the
    kernel call is a fusion boundary that costs more than it saves in the
    eval graph (measured 685 vs 308 ms/frame on v5e; see
    FeatureNeRF.query_all_heads). Training keeps the kernel."""
    model, batch = make_model_and_batch("fg", "skel-quad")
    sched = compute_sched(100)
    variables = jax.jit(model.init, static_argnames=("train",))(
        RNGS, batch, sched, train=True
    )

    def probe(mod, _):
        f = mod.fields.field_params["fg"]
        xyz = jnp.zeros((1, 4, 8, 3))
        out = f.query_all_heads(xyz, None, jnp.zeros((1,), jnp.int32),
                                jnp.zeros((1,), jnp.int32), None, False)
        return jnp.zeros(()) if out is None else jnp.ones(())

    flag = model.apply(variables, None, method=probe)
    assert float(flag) == 0.0


def init_params_with_intrinsics_prior(model, batch, sched):
    """model.init + the trainer's intrinsics prior surgery (trainer.py
    mlp_init step 1). Raw-init intrinsics are fx~1 / ppoint=0, which
    sends the synthetic rays ~140 units from the canonical origin; out
    there the freq-512 PE phase exceeds f32 resolution (ulp(512*140) ~
    8e-3 rad), so the gradients of ANY two bitwise-different but
    mathematically equal implementations legitimately diverge O(1) —
    numeric parity is only well-posed at training-realistic scales."""
    import flax
    from lab4d_tpu.nnutils.intrinsics import intrinsics_base_init

    variables = jax.jit(model.init, static_argnames=("train",))(
        RNGS, batch, sched, train=True
    )
    params = flax.core.unfreeze(variables["params"])
    lf, pp = intrinsics_base_init(
        np.asarray(model.intrinsics_init), model.frame_info
    )
    params["intrinsics"]["base_logfocal"] = jnp.asarray(lf)
    params["intrinsics"]["base_ppoint"] = jnp.asarray(pp)
    return {"params": params}


@pytest.mark.slow
def test_fused_kernel_train_parity(monkeypatch):
    """The fused field-megakernel train path (pallas interpret mode on
    CPU) must reproduce the jnp decomposition's losses and gradients.
    This is the default train pipeline for articulated fg fields on TPU
    (FeatureNeRF.query_all_heads + the fused MLP kernels)."""
    import lab4d_tpu.nnutils.base as base_mod

    model, batch = make_model_and_batch("fg", "skel-quad")
    sched = compute_sched(100)
    variables = init_params_with_intrinsics_prior(model, batch, sched)

    def loss_fn(p):
        ld = model.apply(
            {"params": p}, batch, sched, train=True,
            rngs={"aux": jax.random.PRNGKey(3), "swap": jax.random.PRNGKey(4)},
        )
        return sum(jax.tree.leaves(ld)), ld

    # jit each variant (the fused flag is read at trace time): eager
    # op-by-op execution of the full fwd+bwd took ~200 s on CPU, the
    # jitted pair compiles+runs in a fraction of that
    (t0, ld0), g0 = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"])
    monkeypatch.setattr(base_mod, "_fused_enabled", lambda: True)
    (t1, ld1), g1 = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"])
    for k in ld0:
        np.testing.assert_allclose(
            float(ld0[k]), float(ld1[k]), atol=1e-4, rtol=1e-3, err_msg=k
        )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_sparse_eikonal_matches_dense_loss():
    """The compact (S,D,1) train-time eikonal must produce the exact same
    reg_eikonal loss value as the reference-layout dense scatter (the two
    differ only in where the nonzero-mean's zero rows live)."""
    from lab4d_tpu.nnutils.nerf import NeRF
    from lab4d_tpu.ops.renderer import render_pixel
    from lab4d_tpu.utils.loss import nonzero_mean

    num_frames = 10
    fi = FrameInfo([0, num_frames], [0, num_frames], list(range(num_frames)))
    rt = np.tile(np.eye(4, dtype=np.float32)[None], (num_frames, 1, 1))
    rt[:, 2, 3] = 1.0
    kw = dict(category="fg", frame_info=fi, rtmat_init=rt, num_inst=1,
              D=2, W=32, num_freq_dir=-1, appr_channels=16)
    f_sparse = NeRF(eikonal_dense=False, **kw)
    f_dense = NeRF(eikonal_dense=True, **kw)

    xyz = jnp.asarray(
        np.random.default_rng(3).standard_normal((4, 8, 16, 3)), jnp.float32
    ) * 0.1

    def eik(mod, pts):
        return mod.compute_eikonal(pts, inst_id=None, sched=None)

    rngs = {"params": jax.random.PRNGKey(0), "aux": jax.random.PRNGKey(7)}
    variables = f_sparse.init(rngs, xyz, method=eik)
    aux = {"aux": jax.random.PRNGKey(7)}
    e_sparse = f_sparse.apply(variables, xyz, method=eik, rngs=aux)
    e_dense = f_dense.apply(variables, xyz, method=eik, rngs=aux)

    assert e_sparse.shape[1:] == (16, 1)      # (S, D, 1)
    assert e_dense.shape == (4, 8, 16, 1)     # reference layout
    # same reduction chain as render_pixel + _apply_loss_weights
    l_sparse = nonzero_mean(e_sparse.mean(axis=(-1, -2)))
    l_dense = nonzero_mean(e_dense.mean(axis=(-1, -2)))
    np.testing.assert_allclose(
        np.asarray(l_sparse), np.asarray(l_dense), rtol=1e-6
    )


@pytest.mark.slow
def test_train_loss_unchanged_by_dead_channel_pruning():
    """Dropping the integrated xyz/xyz_cam channels at train must not move
    any loss value: no training loss reads them (they are eval readouts).
    Compares the full loss_dict with the pruning pop monkeypatched out."""
    from lab4d_tpu.nnutils.multifields import MultiFields

    model, batch = make_model_and_batch("fg", "skel-quad")
    sched = compute_sched(100)
    variables = model.init(RNGS, batch, sched, train=True)
    rngs = {"aux": jax.random.PRNGKey(5), "swap": jax.random.PRNGKey(6)}

    def apply_loss(v, b):
        return model.apply(v, b, sched, train=True, rngs=rngs)

    loss_pruned = jax.jit(apply_loss)(variables, batch)

    orig = MultiFields.query_multifields

    def unpruned(self, samples_dict, sched=None, train=True, flow_thresh=None):
        # identical query but with the train-time xyz/xyz_cam pop disabled
        multifields_dict, deltas_dict, aux_dict = {}, {}, {}
        for cate in self.categories:
            (
                multifields_dict[cate],
                deltas_dict[cate],
                aux_dict[cate],
            ) = self.field_params[cate].query_field(
                samples_dict[cate], sched=sched, train=train,
                flow_thresh=flow_thresh,
            )
        return multifields_dict, deltas_dict, aux_dict

    MultiFields.query_multifields = unpruned
    try:
        loss_full = jax.jit(apply_loss)(variables, batch)
    finally:
        MultiFields.query_multifields = orig

    assert set(loss_pruned) == set(loss_full)
    for k in loss_pruned:
        # rtol only absorbs XLA fusion-order rounding (dropping channels
        # changes fusion boundaries; observed delta ~1e-7 relative)
        np.testing.assert_allclose(
            np.asarray(loss_pruned[k]), np.asarray(loss_full[k]),
            atol=1e-9, rtol=1e-5, err_msg=f"loss {k} moved under pruning",
        )
    for v in jax.tree.leaves(loss_pruned):
        assert np.isfinite(float(v))

    # eval path must still expose the xyz readout channels
    eval_batch = {
        "dataid": batch["dataid"][:, 0],
        "frameid_sub": batch["frameid_sub"][:, 0],
        "crop2raw": batch["crop2raw"][:, 0],
        "hxy": batch["hxy"][:, 0],
        "geo": batch["geo"],
    }
    rendered = model.apply(
        variables, eval_batch, sched=None, method=DVRModel.evaluate_chunk
    )
    assert "xyz" in rendered and "xyz_cam" in rendered
