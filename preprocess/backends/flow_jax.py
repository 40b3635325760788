"""TPU-native dense optical flow: coarse-to-fine pyramidal Lucas-Kanade
with Gaussian-aggregated structure tensors and flow-field smoothing,
fully jitted JAX (replaces the reference's VCNPlus CUDA network,
reference: preprocess/third_party/vcnplus/compute_flow.py:36-182, as the
default flow backend; a learned backend can be plugged in the same API).

Everything is static-shape: images are resized to a fixed working
resolution (multiple of 32), the pyramid depth is fixed, and per-level
iteration counts are Python constants, so one XLA compilation serves a
whole video.  Occlusion is scored by forward-backward cycle error and
stored in the third channel with the reference's convention: occ > 0
means occluded.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# working resolution (flow npys are stored at this res; loaders rescale)
DEFAULT_RES = 288  # multiple of 32; ~300^2 like the reference's filter res
NUM_LEVELS = 5
ITERS_PER_LEVEL = 4
WINDOW_SIGMA = 2.5
SMOOTH_SIGMA = 1.5
LAMBDA = 1e-3  # Tikhonov floor for the 2x2 LK solve
OCC_THRESH = 0.05  # cycle error threshold, fraction of image size


def _gauss_kernel1d(sigma: float):
    r = max(1, int(3 * sigma))
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur on (..., H, W)."""
    k = _gauss_kernel1d(sigma)
    pad = (k.shape[0] - 1) // 2

    def conv_last(x):
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
        return jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(
            xp.reshape(-1, xp.shape[-1])
        ).reshape(x.shape)

    out = conv_last(img)
    out = jnp.swapaxes(conv_last(jnp.swapaxes(out, -1, -2)), -1, -2)
    return out


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    img = _blur(img, 1.0)
    return img[..., ::2, ::2]


def _grad(img: jnp.ndarray):
    """Central differences on (H, W)."""
    gx = (jnp.roll(img, -1, axis=-1) - jnp.roll(img, 1, axis=-1)) * 0.5
    gy = (jnp.roll(img, -1, axis=-2) - jnp.roll(img, 1, axis=-2)) * 0.5
    return gx, gy


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W) image at float coords; clamped borders."""
    h, w = img.shape
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0, y0 = jnp.floor(x).astype(jnp.int32), jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape
    xx, yy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32), indexing="xy")
    return _bilinear(img, xx + flow[..., 0], yy + flow[..., 1])


def _lk_refine(i0: jnp.ndarray, i1: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """One windowed-LK update of flow (H, W, 2) at a single pyramid level."""
    i1w = _warp(i1, flow)
    gx, gy = _grad(i1w)
    it = i1w - i0
    # Gaussian-aggregated normal equations
    a11 = _blur(gx * gx, WINDOW_SIGMA) + LAMBDA
    a12 = _blur(gx * gy, WINDOW_SIGMA)
    a22 = _blur(gy * gy, WINDOW_SIGMA) + LAMBDA
    b1 = _blur(gx * it, WINDOW_SIGMA)
    b2 = _blur(gy * it, WINDOW_SIGMA)
    det = a11 * a22 - a12 * a12
    du = (-a22 * b1 + a12 * b2) / det
    dv = (a12 * b1 - a11 * b2) / det
    # clamp per-iteration update to keep the linearization honest
    du = jnp.clip(du, -2.0, 2.0)
    dv = jnp.clip(dv, -2.0, 2.0)
    flow = flow + jnp.stack([du, dv], -1)
    # smooth the field (diffusion regularizer)
    flow = jnp.stack(
        [_blur(flow[..., 0], SMOOTH_SIGMA), _blur(flow[..., 1], SMOOTH_SIGMA)], -1
    )
    return flow


def _upsample_flow(flow: jnp.ndarray, shape) -> jnp.ndarray:
    h, w = shape
    scale_x = w / flow.shape[1]
    scale_y = h / flow.shape[0]
    up = jax.image.resize(flow, (h, w, 2), method="bilinear")
    return up * jnp.asarray([scale_x, scale_y], jnp.float32)


@partial(jax.jit, static_argnames=())
def flow_pyramid(i0: jnp.ndarray, i1: jnp.ndarray) -> jnp.ndarray:
    """Dense flow i0 -> i1; both (H, W) grayscale in [0, 1]."""
    pyr0, pyr1 = [i0], [i1]
    for _ in range(NUM_LEVELS - 1):
        pyr0.append(_downsample2(pyr0[-1]))
        pyr1.append(_downsample2(pyr1[-1]))
    flow = jnp.zeros(pyr0[-1].shape + (2,), jnp.float32)
    for lvl in range(NUM_LEVELS - 1, -1, -1):
        if lvl != NUM_LEVELS - 1:
            flow = _upsample_flow(flow, pyr0[lvl].shape)
        for _ in range(ITERS_PER_LEVEL):
            flow = _lk_refine(pyr0[lvl], pyr1[lvl], flow)
    return flow


@jax.jit
def flow_pair_with_occ(i0: jnp.ndarray, i1: jnp.ndarray):
    """Forward + backward flow with cycle-based occlusion channel.

    Returns (fw, bw), each (H, W, 3) float32 [u, v, occ]; occ > 0 = occluded.
    """
    fw = flow_pyramid(i0, i1)
    bw = flow_pyramid(i1, i0)
    size = jnp.float32(max(i0.shape))

    def occ_of(f, g):
        # |f(p) + g(p + f(p))| — cycle error of following f then g
        gx = _warp(g[..., 0], f)
        gy = _warp(g[..., 1], f)
        err = jnp.linalg.norm(f + jnp.stack([gx, gy], -1), axis=-1)
        return err / size - OCC_THRESH

    fw3 = jnp.concatenate([fw, occ_of(fw, bw)[..., None]], -1)
    bw3 = jnp.concatenate([bw, occ_of(bw, fw)[..., None]], -1)
    return fw3, bw3


def to_gray(img_u8: np.ndarray, res: int = DEFAULT_RES) -> np.ndarray:
    """uint8 RGB (H, W, 3) -> float32 grayscale at the working resolution."""
    import cv2

    g = cv2.cvtColor(img_u8, cv2.COLOR_RGB2GRAY).astype(np.float32) / 255.0
    return cv2.resize(g, (res, res), interpolation=cv2.INTER_AREA)


def compute_pair_flow(img0_u8: np.ndarray, img1_u8: np.ndarray, res: int = DEFAULT_RES):
    """Host API: uint8 RGB pair -> (fw, bw) float32 (res, res, 3).

    Flow vectors are in working-resolution pixels; loaders rescale
    (preprocess/libs/io.py load_flow).
    """
    g0, g1 = to_gray(img0_u8, res), to_gray(img1_u8, res)
    fw, bw = flow_pair_with_occ(jnp.asarray(g0), jnp.asarray(g1))
    return np.asarray(fw), np.asarray(bw)
