"""Quadratic-form SkinningField fast path vs the bone-coord legacy path.

The fast path (skinning.SkinningField._quad_call) computes per-bone
dist^2 as a quadratic form and folds the affine obj->bone map into the
delta MLP's first layer; it must match the direct evaluation exactly
(both are the same algebra in a different association order).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lab4d_tpu.nnutils.embedding import FrameInfo
from lab4d_tpu.nnutils.skinning import SkinningField


def _frame_info(num_frames=8, num_vids=2):
    per = num_frames // num_vids
    offsets = [i * per for i in range(num_vids + 1)]
    return FrameInfo(offsets, offsets, list(range(num_frames)))


def _bones(key, M, B):
    kq, kt = jax.random.split(key)
    q = jax.random.normal(kq, (M, B, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = jax.random.normal(kt, (M, B, 3)) * 0.2
    # dual quaternion from (q, t): qd = 0.5 * t_quat * q
    from lab4d_tpu.utils.quat import quaternion_translation_to_dual_quaternion

    return quaternion_translation_to_dual_quaternion(q, t)


@pytest.mark.parametrize("num_inst,inst_mode", [(1, "id"), (3, "id"), (3, "none")])
@pytest.mark.parametrize("delta_skin", [True, False])
@pytest.mark.parametrize("use_frame_id", [True, False])
def test_quad_matches_legacy(num_inst, inst_mode, delta_skin, use_frame_id):
    M, N, D, B = 4, 3, 5, 7
    fi = _frame_info()
    model = SkinningField(
        num_coords=B,
        frame_info=fi,
        num_inst=num_inst,
        delta_skin=delta_skin,
        symm_idx=None,
    )
    key = jax.random.PRNGKey(0)
    kx, kb, ki = jax.random.split(key, 3)
    xyz = jax.random.normal(kx, (M, N, D, 3)) * 0.3
    bone2obj = _bones(kb, M, B)
    frame_id = jnp.arange(M) % fi.num_frames if use_frame_id else None
    inst_id = (
        jax.random.randint(ki, (M,), 0, num_inst) if inst_mode == "id" else None
    )

    params = model.init(
        jax.random.PRNGKey(1), xyz, bone2obj, frame_id, inst_id
    )
    skin_q, delta_q = model.apply(
        params, xyz, bone2obj, frame_id, inst_id, quad=True
    )
    skin_l, delta_l = model.apply(
        params, xyz, bone2obj, frame_id, inst_id, quad=False
    )
    assert skin_q.shape == (M, N, D, B)
    np.testing.assert_allclose(
        np.asarray(skin_q), np.asarray(skin_l), atol=2e-5, rtol=1e-4
    )
    if delta_skin:
        np.testing.assert_allclose(
            np.asarray(delta_q), np.asarray(delta_l), atol=2e-5, rtol=1e-4
        )
    else:
        assert delta_q is None and delta_l is None


def test_quad_grads_match():
    M, N, D, B = 2, 2, 4, 5
    fi = _frame_info()
    model = SkinningField(num_coords=B, frame_info=fi, num_inst=1)
    key = jax.random.PRNGKey(2)
    kx, kb = jax.random.split(key)
    xyz = jax.random.normal(kx, (M, N, D, 3)) * 0.3
    bone2obj = _bones(kb, M, B)
    frame_id = jnp.arange(M) % fi.num_frames
    params = model.init(jax.random.PRNGKey(3), xyz, bone2obj, frame_id, None)

    def loss(params, xyz, quad):
        skin, delta = model.apply(params, xyz, bone2obj, frame_id, None, quad=quad)
        out = jnp.sum(jax.nn.softmax(skin, -1) * jnp.cos(skin))
        return out + jnp.sum(delta**2)

    gq = jax.grad(loss, argnums=(0, 1))(params, xyz, True)
    gl = jax.grad(loss, argnums=(0, 1))(params, xyz, False)
    for a, b in zip(jax.tree.leaves(gq), jax.tree.leaves(gl)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3
        )
