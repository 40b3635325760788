"""Multi-head field kernel vs its jnp oracle (pallas interpret mode on
CPU; on-TPU parity is additionally exercised through the training path)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lab4d_tpu.ops.field_kernel import (
    OUT_DIMS,
    FieldCfg,
    fused_nerf_heads,
    nerf_heads_reference,
)


def _mlp_params(ks, dims, skips, in_ch):
    out = []
    ch = in_ch
    for i, w in enumerate(dims):
        if i in skips:
            ch += in_ch
        out.append(jax.random.normal(next(ks), (ch, w)) * 0.2)
        out.append(jax.random.normal(next(ks), (1, w)) * 0.02)
        ch = w
    return out


@pytest.fixture
def setup():
    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 64))
    M, spp = 2, 32
    x = jax.random.normal(next(ks), (M * spp, 3)) * 0.4
    appr = jax.random.normal(next(ks), (M, 8)) * 0.3
    freqs = tuple(float(f) for f in 2.0 ** np.arange(6))
    cfg = FieldCfg(
        freqs=freqs, nf_base=5, nf_color=6, nf_vis=5, nf_feat=3,
        skips_base=(4,), skips_color=(4,), skips_vis=(4,), skips_feat=(4,),
    )
    W = 32
    nets = dict(
        base=_mlp_params(ks, [W] * 5 + [W], (4,), 33),
        sdf=[jax.random.normal(next(ks), (W, 1)) * 0.3, jnp.zeros((1, 1))],
        color=_mlp_params(ks, [W, W, W], (4,), 39),
        rgb1=[jax.random.normal(next(ks), (W + 8, 16)) * 0.2,
              jnp.zeros((1, 16))],
        rgb2=[jax.random.normal(next(ks), (16, 3)) * 0.3, jnp.zeros((1, 3))],
        vis=_mlp_params(ks, [16, 16, 1], (4,), 33),
        feat=_mlp_params(ks, [W] * 5 + [16], (4,), 21),
    )
    win_b = jnp.clip(jnp.linspace(1.2, -0.1, 5), 0, 1)
    win_c = jnp.clip(jnp.linspace(1.2, -0.3, 6), 0, 1)
    return x, appr, win_b, win_c, nets, cfg, spp


IBETA = jnp.full((1, 1), 2.0)


def test_forward_matches_reference(setup):
    x, appr, win_b, win_c, nets, cfg, spp = setup
    a = fused_nerf_heads(x, None, appr, win_b, win_c, nets, IBETA, cfg, spp)
    b = nerf_heads_reference(x, None, appr, win_b, win_c, nets, IBETA, cfg, spp)
    assert tuple(v.shape for v in a) == tuple(
        (x.shape[0], c) for c in OUT_DIMS
    )
    for va, vb in zip(a, b):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=2e-4)


def test_grads_match_reference(setup):
    x, appr, win_b, win_c, nets, cfg, spp = setup

    def loss(fn, x, appr, nets, ibeta):
        out = jnp.concatenate(
            fn(x, None, appr, win_b, win_c, nets, ibeta, cfg, spp), axis=-1
        )
        return jnp.sum(jnp.tanh(out) * jnp.arange(1.0, 22.0))

    gf = jax.grad(lambda *a: loss(fused_nerf_heads, *a),
                  argnums=(0, 1, 2, 3))(x, appr, nets, IBETA)
    gr = jax.grad(lambda *a: loss(nerf_heads_reference, *a),
                  argnums=(0, 1, 2, 3))(x, appr, nets, IBETA)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               atol=2e-3, rtol=1e-3)
    for name in nets:
        for i, (ga, gb) in enumerate(zip(gf[2][name], gr[2][name])):
            np.testing.assert_allclose(
                np.asarray(ga), np.asarray(gb), atol=5e-3, rtol=2e-3,
                err_msg=f"{name}[{i}]",
            )
    np.testing.assert_allclose(np.asarray(gf[3]), np.asarray(gr[3]),
                               atol=5e-3, rtol=2e-3)


def test_no_appearance_path(setup):
    x, appr, win_b, win_c, nets, cfg, spp = setup
    nets = dict(nets)
    nets["rgb1"] = [nets["rgb1"][0][: nets["base"][0].shape[1]],
                    nets["rgb1"][1]]
    a = fused_nerf_heads(x, None, None, win_b, win_c, nets, IBETA, cfg, spp)
    b = nerf_heads_reference(x, None, None, win_b, win_c, nets, IBETA, cfg, spp)
    for va, vb in zip(a, b):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=2e-4)
