"""Learned pixel-descriptor backend: a small conv U-Net producing dense
24-dim descriptor maps, trained SELF-SUPERVISED on synthetic multi-view
correspondences (scripts/train_feat_net.py, InfoNCE over flow-matched
pixels). Replaces the role of the reference's pretrained DINOv2 patch
features (preprocess/scripts/extract_dinov2.py) in a zero-egress
environment: what the downstream FeatureNeRF + global matching need is
exactly cross-view consistency of the descriptor at a surface point,
which is the training objective here.

The net emits RAW 24-dim maps; the collection-level masked PCA to 16
dims (feat_backends.extract_features_collection) applies unchanged, so
the .npy contract and loader are backend-agnostic.

Weights resolve via preprocess.backends.weights.resolve_weights
("feat_net.msgpack"); absent weights fall back to the filter bank.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import serialization

FEAT_RES = 112
OUT_DIM = 24
WEIGHTS_NAME = "feat_net.msgpack"


class FeatNet(nn.Module):
    """(H, W, 3) in [0,1] -> (H, W, OUT_DIM) L2-normalized descriptors."""

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[:2]
        e0 = nn.relu(nn.Conv(32, (3, 3))(x))
        e0 = nn.relu(nn.Conv(32, (3, 3))(e0))
        e1 = nn.relu(nn.Conv(48, (3, 3), strides=(2, 2))(e0))
        e1 = nn.relu(nn.Conv(48, (3, 3))(e1))
        e2 = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2))(e1))
        e2 = nn.relu(nn.Conv(64, (3, 3))(e2))
        # dilated context at 1/4 res widens receptive field cheaply
        e2 = nn.relu(nn.Conv(64, (3, 3), kernel_dilation=(2, 2))(e2))
        e2 = nn.relu(nn.Conv(64, (3, 3), kernel_dilation=(4, 4))(e2))

        u1 = jax.image.resize(e2, (e1.shape[0], e1.shape[1], 64), "bilinear")
        u1 = nn.relu(nn.Conv(48, (3, 3))(jnp.concatenate([u1, e1], -1)))
        u0 = jax.image.resize(u1, (h, w, 48), "bilinear")
        u0 = nn.relu(nn.Conv(32, (3, 3))(jnp.concatenate([u0, e0], -1)))
        out = nn.Conv(OUT_DIM, (1, 1))(u0)
        return out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6
        )


def weights_path() -> str:
    from preprocess.backends.weights import resolve_weights

    return resolve_weights(WEIGHTS_NAME)


def probe_feat_net() -> bool:
    return os.path.exists(weights_path())


@functools.lru_cache(maxsize=2)
def _load_cached(path: str, mtime: float):
    model = FeatNet()
    dummy = jnp.zeros((FEAT_RES, FEAT_RES, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy)["params"]
    with open(path, "rb") as f:
        params = serialization.from_bytes(params, f.read())
    run = jax.jit(lambda im: model.apply({"params": params}, im))
    return run


def frame_features_net(rgb_u8: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (FEAT_RES, FEAT_RES, OUT_DIM) float32."""
    import cv2

    path = weights_path()
    run = _load_cached(path, os.path.getmtime(path))
    img = cv2.resize(rgb_u8, (FEAT_RES, FEAT_RES)).astype(np.float32) / 255.0
    return np.asarray(run(jnp.asarray(img)))
