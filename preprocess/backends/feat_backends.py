"""Pixel-feature backends: 16-dim L2-normalized descriptor maps at
112x112 per frame, masked to the object (reference:
preprocess/scripts/extract_dinov2.py — dinov2_vits14 patch tokens,
PCA-16 fit over masked pixels across all videos of a collection).

Backends:
  dinov2     — torch.hub dinov2_vits14 when its weights are cached
  net        — trained dense-descriptor U-Net (feat_net.py) when
               database/weights/feat_net.msgpack exists: self-supervised
               on synthetic multi-view correspondences (InfoNCE over
               flow-matched pixels), emitting 24-dim maps that go
               through the same collection PCA
  filterbank — fallback: a jitted JAX multi-scale oriented filter bank
               (Gaussian color pyramid + even/odd steerable responses),
               PCA'd to 16 dims over masked pixels across the collection.
               Deterministic, no weights; gives the feature/matching
               losses a meaningful (if weaker) descriptor space.
"""

from __future__ import annotations

import os
from functools import partial
from typing import List

import cv2
import numpy as np

import jax
import jax.numpy as jnp

FEAT_RES = 112
NUM_PCA = 16


# ---------------------------------------------------------------------------
# filter-bank backend (JAX)
# ---------------------------------------------------------------------------


def _gauss1d(sigma: float):
    r = max(1, int(3 * sigma))
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _sep_blur(img, sigma):
    """(H,W,C) separable Gaussian blur."""
    k = _gauss1d(sigma)
    pad = (len(k) - 1) // 2

    def conv_axis(x, axis):
        xm = jnp.moveaxis(x, axis, -1)
        shp = xm.shape
        xp = jnp.pad(xm.reshape(-1, shp[-1]), ((0, 0), (pad, pad)), mode="edge")
        out = jax.vmap(lambda r: jnp.convolve(r, k, mode="valid"))(xp)
        return jnp.moveaxis(out.reshape(shp), -1, axis)

    return conv_axis(conv_axis(img, 0), 1)


@partial(jax.jit, static_argnames=("out_res",))
def filterbank_features(rgb: jnp.ndarray, out_res: int = FEAT_RES) -> jnp.ndarray:
    """(H,W,3) float in [0,1] -> (out_res, out_res, 24) raw responses."""
    img = jax.image.resize(rgb, (out_res * 2, out_res * 2, 3), "bilinear")
    gray = img.mean(-1, keepdims=True)
    chans = []
    # multi-scale color
    for sigma in (1.0, 3.0, 8.0):
        chans.append(_sep_blur(img, sigma))
    # oriented even/odd responses at two scales
    for sigma in (1.5, 4.0):
        g = _sep_blur(gray, sigma)[..., 0]
        gx = (jnp.roll(g, -1, 1) - jnp.roll(g, 1, 1)) * 0.5
        gy = (jnp.roll(g, -1, 0) - jnp.roll(g, 1, 0)) * 0.5
        gxx = (jnp.roll(gx, -1, 1) - jnp.roll(gx, 1, 1)) * 0.5
        gyy = (jnp.roll(gy, -1, 0) - jnp.roll(gy, 1, 0)) * 0.5
        gxy = (jnp.roll(gx, -1, 0) - jnp.roll(gx, 1, 0)) * 0.5
        for c in (gx, gy, gxx, gyy, gxy):
            chans.append(c[..., None])
    # local contrast
    g1 = _sep_blur(gray, 1.0)
    g4 = _sep_blur(gray, 4.0)
    chans.append(g1 - g4)
    feat = jnp.concatenate(chans, -1)
    feat = jax.image.resize(feat, (out_res, out_res, feat.shape[-1]), "bilinear")
    return feat


def _frame_features_filterbank(rgb_u8: np.ndarray) -> np.ndarray:
    rgb = jnp.asarray(rgb_u8.astype(np.float32) / 255.0)
    return np.asarray(filterbank_features(rgb))


# ---------------------------------------------------------------------------
# dinov2 backend (gated)
# ---------------------------------------------------------------------------


def probe_dinov2() -> bool:
    import torch

    hub_dir = torch.hub.get_dir()
    return os.path.isdir(os.path.join(hub_dir, "facebookresearch_dinov2_main"))


_DINO = None


def _frame_features_dinov2(rgb_u8: np.ndarray) -> np.ndarray:
    global _DINO
    import torch
    import torch.nn.functional as F

    if _DINO is None:
        _DINO = torch.hub.load("facebookresearch/dinov2", "dinov2_vits14")
        _DINO.eval()
    img = cv2.resize(rgb_u8, (224, 224)).astype(np.float32) / 255.0
    img = (img - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    x = torch.tensor(img.transpose(2, 0, 1)[None], dtype=torch.float32)
    with torch.no_grad():
        tok = _DINO.forward_features(x)["x_norm_patchtokens"]
        feat = tok.reshape(1, 16, 16, -1).permute(0, 3, 1, 2)
        feat = F.interpolate(feat, size=(FEAT_RES, FEAT_RES), mode="bilinear")
    return feat[0].permute(1, 2, 0).numpy()


# ---------------------------------------------------------------------------
# collection-level extraction with shared PCA
# ---------------------------------------------------------------------------


def extract_features_collection(
    seq_frames: List[List[str]],
    crop_size: int,
    use_full: bool,
    component_id: int = 1,
    backend: str = "filterbank",
    rng_seed: int = 0,
):
    """seq_frames: per-video lists of raw frame paths. Yields per-video
    (N, 112, 112, 16) float16 arrays, masked + L2-normalized, with one
    PCA basis shared across the collection."""
    from sklearn.decomposition import PCA

    from preprocess.libs.io import load_frame_data

    if backend == "dinov2":
        frame_fn = _frame_features_dinov2
    elif backend == "net":
        from preprocess.backends.feat_net import frame_features_net

        frame_fn = frame_features_net
    else:
        frame_fn = _frame_features_filterbank

    raw_feats, masks = [], []
    for paths in seq_frames:
        vid_feats, vid_masks = [], []
        for p in paths:
            rgb, _, mask, _ = load_frame_data(p, crop_size, use_full, component_id)
            rgb_u8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            vid_feats.append(frame_fn(rgb_u8))
            vid_masks.append(
                cv2.resize(
                    mask.astype(np.uint8), (FEAT_RES, FEAT_RES),
                    interpolation=cv2.INTER_NEAREST,
                ).astype(bool)
            )
        raw_feats.append(np.stack(vid_feats))
        masks.append(np.stack(vid_masks))

    # fit the shared PCA over subsampled masked pixels
    rng = np.random.default_rng(rng_seed)
    samples = []
    for vf, vm in zip(raw_feats, masks):
        px = vf[vm]
        if len(px) == 0:
            px = vf.reshape(-1, vf.shape[-1])
        take = min(len(px), 20000)
        samples.append(px[rng.choice(len(px), take, replace=False)])
    pool = np.concatenate(samples, 0)
    pca = PCA(n_components=min(NUM_PCA, pool.shape[-1]))
    pca.fit(pool)

    out = []
    for vf, vm in zip(raw_feats, masks):
        n = vf.shape[0]
        flat = pca.transform(vf.reshape(-1, vf.shape[-1]))
        if flat.shape[-1] < NUM_PCA:  # pad if the bank is narrow
            flat = np.pad(flat, ((0, 0), (0, NUM_PCA - flat.shape[-1])))
        feat = flat.reshape(n, FEAT_RES, FEAT_RES, NUM_PCA)
        feat = feat / np.maximum(
            np.linalg.norm(feat, axis=-1, keepdims=True), 1e-6
        )
        feat = feat * vm[..., None]
        out.append(feat.astype(np.float16))
    return out
