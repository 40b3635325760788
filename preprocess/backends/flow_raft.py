"""RAFT-lite neural optical flow (JAX/flax).

The reference's flow priors come from VCNPlus
(preprocess/third_party/vcnplus/compute_flow.py:36-182, ~2.6k LoC +
DCNv2 CUDA). This is a compact recurrent all-pairs flow net in the same
spirit as RAFT (Teed & Deng, ECCV 2020), sized to run on CPU/TPU without
vendored CUDA ops:

  feature encoder (1/8 res) -> all-pairs correlation pyramid ->
  conv-GRU iterative updates -> bilinear 8x upsample.

Weights load from a local cache only — no downloads are attempted
(zero-egress environment): ``database/weights/flow_raft.msgpack`` or
``$LAB4D_WEIGHTS_DIR/flow_raft.msgpack``. When absent, callers fall back
to the classical pyramid flow (flow_jax.py); ``available()`` reports
which. `scripts/train_flow_raft.py` distills weights from synthetic
scenes with analytic ground-truth flow.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import serialization

FDIM = 64          # correlation feature width
HDIM = 64          # GRU hidden width
CDIM = 48          # context width
ITERS = 6
LEVELS = 3         # correlation pyramid levels
RADIUS = 3         # lookup radius per level
WEIGHTS_NAME = "flow_raft.msgpack"


# ------------------------------------------------------------------ modules


class Encoder(nn.Module):
    """3-stage stride-2 conv encoder: (H, W, 3) -> (H/8, W/8, out)."""

    out: int

    @nn.compact
    def __call__(self, x):
        for ch in (32, 48, 64):
            x = nn.Conv(ch, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
            x = nn.Conv(ch, (3, 3))(x)
            x = nn.relu(x)
        return nn.Conv(self.out, (1, 1))(x)


class ConvGRU(nn.Module):
    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(HDIM, (3, 3))(hx))
        r = nn.sigmoid(nn.Conv(HDIM, (3, 3))(hx))
        q = jnp.tanh(
            nn.Conv(HDIM, (3, 3))(jnp.concatenate([r * h, x], axis=-1))
        )
        return (1 - z) * h + z * q


class UpdateBlock(nn.Module):
    @nn.compact
    def __call__(self, h, corr, flow, ctx):
        mf = nn.relu(nn.Conv(64, (1, 1))(corr))
        mf = jnp.concatenate([mf, flow], axis=-1)
        mf = nn.relu(nn.Conv(48, (3, 3))(mf))
        x = jnp.concatenate([mf, ctx], axis=-1)
        h = ConvGRU()(h, x)
        delta = nn.Conv(2, (3, 3))(nn.relu(nn.Conv(64, (3, 3))(h)))
        return h, delta


class RAFTLite(nn.Module):
    """Two frames (H, W, 3) in [0,1] -> flow (H, W, 2) in pixels."""

    iters: int = ITERS

    @nn.compact
    def __call__(self, im0, im1):
        H, W = im0.shape[:2]
        fnet = Encoder(FDIM, name="fnet")
        f0 = fnet(im0)
        f1 = fnet(im1)  # same module instance -> shared weights
        cx = Encoder(HDIM + CDIM, name="cnet")(im0)
        h = jnp.tanh(cx[..., :HDIM])
        ctx = nn.relu(cx[..., HDIM:])

        corr_pyr = _corr_pyramid(f0, f1)
        hh, ww = f0.shape[:2]
        coords0 = _coords_grid(hh, ww)
        flow8 = jnp.zeros((hh, ww, 2), jnp.float32)
        upd = UpdateBlock(name="update")
        for _ in range(self.iters):
            corr = _corr_lookup(corr_pyr, coords0 + flow8)
            h, delta = upd(h, corr, flow8, ctx)
            flow8 = flow8 + delta
        flow = jax.image.resize(flow8 * 8.0, (H, W, 2), "bilinear")
        return flow


# ------------------------------------------------------- correlation volume


def _coords_grid(h, w):
    y, x = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    return jnp.stack([x, y], axis=-1).astype(jnp.float32)


def _corr_pyramid(f0, f1):
    h, w, c = f0.shape
    corr = jnp.einsum("ijc,klc->ijkl", f0, f1) / jnp.sqrt(jnp.float32(c))
    corr = corr.reshape(h * w, h, w, 1)
    pyr = [corr]
    for _ in range(LEVELS - 1):
        corr = nn.avg_pool(corr, (2, 2), strides=(2, 2))
        pyr.append(corr)
    return pyr


def _bilinear_nhwc(img, x, y):
    """img (N, H, W, 1); x/y (N, K) -> (N, K)."""
    H, W = img.shape[1:3]
    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)
    wy = jnp.clip(y - y0, 0.0, 1.0)

    def at(yy, xx):
        idx = (yy * W + xx).astype(jnp.int32)
        flat = img.reshape(img.shape[0], H * W)
        return jnp.take_along_axis(flat, idx, axis=1)

    v = (
        at(y0, x0) * (1 - wx) * (1 - wy)
        + at(y0, x1) * wx * (1 - wy)
        + at(y1, x0) * (1 - wx) * wy
        + at(y1, x1) * wx * wy
    )
    return v


def _corr_lookup(pyr, coords):
    """Sample a (2R+1)^2 window around coords at each pyramid level.

    coords (h, w, 2) in level-0 feature pixels -> (h, w, LEVELS*(2R+1)^2).
    """
    h, w = coords.shape[:2]
    n = h * w
    r = RADIUS
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    dx = dx.reshape(-1)
    dy = dy.reshape(-1)
    out = []
    flat = coords.reshape(n, 2)
    for lvl, corr in enumerate(pyr):
        scale = 0.5**lvl
        cx = flat[:, :1] * scale + dx[None]
        cy = flat[:, 1:2] * scale + dy[None]
        out.append(_bilinear_nhwc(corr[..., 0][..., None], cx, cy))
    return jnp.concatenate(out, axis=-1).reshape(h, w, -1)


# ------------------------------------------------------------------ host API


def weights_path() -> str:
    from preprocess.backends.weights import resolve_weights

    return resolve_weights(WEIGHTS_NAME)


@functools.lru_cache(maxsize=1)
def _load_params_cached(path: str, mtime: float):
    model = RAFTLite()
    dummy = jnp.zeros((64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
    with open(path, "rb") as f:
        loaded = serialization.from_bytes(params, f.read())
    return loaded


def load_params(path: Optional[str] = None):
    """Weights from the local cache, or None when absent/corrupt."""
    path = path or weights_path()
    if not os.path.exists(path):
        return None
    try:
        return _load_params_cached(path, os.path.getmtime(path))
    except Exception as e:  # corrupt/stale file must not kill preprocessing
        print(f"[warn] flow_raft weights unusable ({e}); classical fallback")
        return None


def available() -> bool:
    return load_params() is not None


@functools.lru_cache(maxsize=1)
def _jitted_pair():
    model = RAFTLite()

    @jax.jit
    def run(params, g0, g1):
        fw = model.apply({"params": params}, g0, g1)
        bw = model.apply({"params": params}, g1, g0)
        return fw, bw

    return run


def compute_pair_flow(
    img0_u8: np.ndarray, img1_u8: np.ndarray, res: int = 256,
    params=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Same contract as flow_jax.compute_pair_flow: uint8 RGB pair ->
    (fw, bw) float32 (res, res, 3) [u, v, occ]."""
    import cv2

    from preprocess.backends.flow_jax import OCC_THRESH, _warp

    params = params if params is not None else load_params()
    assert params is not None, "flow_raft weights missing"
    i0 = cv2.resize(img0_u8, (res, res)).astype(np.float32) / 255.0
    i1 = cv2.resize(img1_u8, (res, res)).astype(np.float32) / 255.0
    fw, bw = _jitted_pair()(params, jnp.asarray(i0), jnp.asarray(i1))

    def occ_of(f, g):
        gx = _warp(g[..., 0], f)
        gy = _warp(g[..., 1], f)
        err = jnp.linalg.norm(f + jnp.stack([gx, gy], -1), axis=-1)
        return err / jnp.float32(res) - OCC_THRESH

    fw3 = jnp.concatenate([fw, occ_of(fw, bw)[..., None]], -1)
    bw3 = jnp.concatenate([bw, occ_of(bw, fw)[..., None]], -1)
    return np.asarray(fw3), np.asarray(bw3)
