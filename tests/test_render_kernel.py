"""Fused volume-render kernel vs its jnp oracle and vs render_pixel
(pallas interpret mode on CPU; on-TPU parity additionally exercised
through the training path)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lab4d_tpu.ops.render_kernel import (
    RenderCfg,
    fused_volume_render,
    render_pixel_fused,
    volume_render_reference,
)
from lab4d_tpu.ops.renderer import render_pixel

R, D = 32, 16


def _flat_inputs(key, has_flow=True, has_gauss=True, cm=2):
    ks = iter(jax.random.split(key, 16))
    P = R * D
    dens = jax.random.uniform(next(ks), (R, D)) * 2.0
    vis = jax.random.normal(next(ks), (R, D))
    vAll = jax.random.normal(next(ks), (P, 9))
    deltas = jax.random.uniform(next(ks), (R, D)) * 0.1 + 0.01
    exM = jax.random.normal(next(ks), (P, cm)) if cm else None
    flow = None
    if has_flow:
        fxy = jax.random.normal(next(ks), (P, 2))
        fv = (jax.random.uniform(next(ks), (P, 1)) > 0.3).astype(jnp.float32)
        flow = jnp.concatenate([fxy, fv], axis=-1)
    gdens = jax.random.uniform(next(ks), (R, D)) * 2.0 if has_gauss else None
    cfg = RenderCfg(
        d=D, n_live=6, n_frozen=3, cm=cm,
        has_flow=has_flow, has_gauss=has_gauss,
    )
    return dens, vis, vAll, deltas, exM, flow, gdens, cfg


def _loss(out):
    oAll, oM, sc = out
    tot = jnp.sum(oAll * jnp.arange(1.0, oAll.shape[-1] + 1))
    if oM is not None:
        tot += 2.0 * jnp.sum(oM)
    # all differentiable scalar columns: mask, vis_num, gauss, flow
    tot += jnp.sum(sc[:, 0]) + 3.0 * jnp.sum(sc[:, 1])
    tot += 0.5 * jnp.sum(sc[:, 3]) + jnp.sum(sc[:, 4:6] * 1.7)
    return tot


@pytest.mark.parametrize(
    "has_flow,has_gauss,cm",
    [(True, True, 2), (False, False, 0), (True, False, 1), (False, True, 0)],
)
def test_kernel_matches_oracle(has_flow, has_gauss, cm):
    args = _flat_inputs(jax.random.PRNGKey(0), has_flow, has_gauss, cm)
    cfg = args[-1]
    inputs, cfg = args[:-1], args[-1]

    out_k = fused_volume_render(*inputs, cfg)
    out_r = volume_render_reference(*inputs, cfg)
    for a, b in zip(out_k, out_r):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    diff_idx = [i for i, v in enumerate(inputs) if v is not None]
    f_k = lambda *xs: _loss(fused_volume_render(
        *_sub(inputs, diff_idx, xs), cfg))
    f_r = lambda *xs: _loss(volume_render_reference(
        *_sub(inputs, diff_idx, xs), cfg))
    xs = [inputs[i] for i in diff_idx]
    g_k = jax.grad(f_k, argnums=tuple(range(len(xs))))(*xs)
    g_r = jax.grad(f_r, argnums=tuple(range(len(xs))))(*xs)
    for i, (a, b) in enumerate(zip(g_k, g_r)):
        if diff_idx[i] == 5:  # flow: valid channel is boolean-derived
            a, b = a[:, :2], b[:, :2]  # upstream; kernel zeroes its grad
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=1e-5, err_msg=f"grad arg {diff_idx[i]}"
        )


def _sub(inputs, idx, xs):
    out = list(inputs)
    for i, x in zip(idx, xs):
        out[i] = x
    return out


def _field_dict(key, M=4, N=8, D_=D, comp=False):
    ks = iter(jax.random.split(key, 24))
    shp = (M, N, D_)
    fd = {
        "density": jax.random.uniform(next(ks), shp + (1,)) * 2.0,
        "vis": jax.random.normal(next(ks), shp + (1,)),
        "rgb": jax.random.uniform(next(ks), shp + (3,)),
        "depth": jax.random.uniform(next(ks), shp + (1,)) * 3.0,
        "feature": jax.random.normal(next(ks), shp + (4,)),
        "eikonal": jax.random.uniform(next(ks), shp + (1,)),
        "delta_skin": jax.random.uniform(next(ks), shp + (1,)),
        "cyc_dist": jax.random.uniform(next(ks), shp + (1,)),
        "skin_entropy": jax.random.uniform(next(ks), shp + (1,)),
        "xyz_cam": jax.random.normal(next(ks), shp + (3,)),
        "normal": jax.random.normal(next(ks), shp + (3,)),
        "gauss_density": jax.random.uniform(next(ks), shp + (1,)) * 2.0,
    }
    fxy = jax.random.normal(next(ks), shp + (2,))
    fv = (jax.random.uniform(next(ks), shp + (1,)) > 0.3).astype(jnp.float32)
    fd["flow"] = jnp.concatenate([fxy, fv], axis=-1)
    if comp:
        fd["density_fg"] = jax.random.uniform(next(ks), shp + (1,)) * 2.0
        fd["density_bg"] = jax.random.uniform(next(ks), shp + (1,)) * 2.0
    deltas = jax.random.uniform(next(ks), shp + (1,)) * 0.1 + 0.01
    return fd, deltas


@pytest.mark.parametrize("comp", [False, True])
def test_render_pixel_parity(comp):
    fd, deltas = _field_dict(jax.random.PRNGKey(1), comp=comp)
    out_jnp = render_pixel(fd, deltas)
    out_k = render_pixel_fused(fd, deltas)
    assert out_k is not None
    assert set(out_k) == set(out_jnp)
    for k in out_jnp:
        np.testing.assert_allclose(
            out_k[k], out_jnp[k], rtol=2e-4, atol=2e-5, err_msg=k
        )

    def loss_of(fn):
        def f(fd_diff):
            full = dict(fd_diff)
            out = fn(full, deltas)
            tot = 0.0
            for i, k in enumerate(sorted(out)):
                tot = tot + jnp.sum(out[k]) * (0.5 + 0.25 * i)
            return tot
        return f

    g_j = jax.grad(loss_of(render_pixel))(fd)
    g_k = jax.grad(loss_of(render_pixel_fused))(fd)
    for k in g_j:
        a, b = g_k[k], g_j[k]
        if k == "flow":  # valid channel is boolean-derived upstream;
            a, b = a[..., :2], b[..., :2]  # kernel zeroes its grad
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=2e-5, err_msg=f"grad {k}"
        )


def test_unsupported_shapes_return_none():
    fd, deltas = _field_dict(jax.random.PRNGKey(2), M=1, N=3)
    assert render_pixel_fused(fd, deltas) is None
