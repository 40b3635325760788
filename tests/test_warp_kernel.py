"""Experimental fused skinning-warp kernel vs its jnp oracle (interpret
mode; the kernel is gated off by default — see
SkinningWarp.use_warp_kernel — but must stay correct)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lab4d_tpu.ops.warp_kernel import (
    fused_skin_warp,
    pack_pair_rows,
    skin_warp_reference,
)


@pytest.fixture
def setup():
    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 32))
    M, spp, B, W1 = 2, 32, 25, 64
    x = jax.random.normal(next(ks), (M * spp, 3)) * 0.3
    q = jax.random.normal(next(ks), (M, B, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = jax.random.normal(next(ks), (M, B, 3)) * 0.2
    gauss = jnp.exp(jax.random.normal(next(ks), (B, 3)) * 0.3) * 0.1
    u = jax.random.normal(next(ks), (M, W1)) * 0.1
    sqr = jax.random.normal(next(ks), (M, B, 4))
    sqr = sqr / jnp.linalg.norm(sqr, axis=-1, keepdims=True)
    sqd = jax.random.normal(next(ks), (M, B, 4)) * 0.05
    wb = [
        jax.random.normal(next(ks), (3 * B, W1)) * 0.1, jnp.zeros((1, W1)),
        jax.random.normal(next(ks), (W1, W1)) * 0.1, jnp.zeros((1, W1)),
        jax.random.normal(next(ks), (W1, B)) * 0.1, jnp.zeros((1, B)),
    ]
    rows = pack_pair_rows(q, t, gauss, u, sqr, sqd)
    return x, rows, wb, B, spp


def test_warp_forward(setup):
    x, rows, wb, B, spp = setup
    a = fused_skin_warp(x, rows, wb, B, spp)
    b = skin_warp_reference(x, rows, wb, B, spp)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_warp_grads(setup):
    x, rows, wb, B, spp = setup

    def loss(fn, x, rows, wb):
        out = fn(x, rows, wb, B, spp)
        return jnp.sum(jnp.sin(out[:, :5] * jnp.arange(1.0, 6.0)))

    gf = jax.grad(lambda *a: loss(fused_skin_warp, *a), argnums=(0, 1, 2))(
        x, rows, wb
    )
    gr = jax.grad(lambda *a: loss(skin_warp_reference, *a), argnums=(0, 1, 2))(
        x, rows, wb
    )
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               atol=1e-3, rtol=1e-3)
    for ga, gb in zip(gf[2], gr[2]):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=1e-3, rtol=1e-3)
