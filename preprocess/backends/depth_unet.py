"""Monocular depth U-Net (JAX/flax).

The reference's depth priors come from ZoeDepth via torch.hub
(reference: preprocess/scripts/depth.py:37-59). In this zero-egress
environment hub weights are usually absent, so this provides a compact
trainable monocular depth net in the RAFT-lite mold (flow_raft.py):

  stride-2 conv encoder (4 stages) -> decoder with skip connections ->
  softplus metric depth at input resolution.

Weights load from the local cache only: ``database/weights/
depth_unet.msgpack`` or ``$LAB4D_WEIGHTS_DIR/depth_unet.msgpack``.
``scripts/train_depth_unet.py`` distills them from synthetic scenes with
analytic ground-truth depth; the depth backend auto-upgrades over the
classical motion-parallax proxy when the file exists
(preprocess/backends/depth_backends.py).
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import serialization

WEIGHTS_NAME = "depth_unet.msgpack"
CHANNELS = (32, 48, 64, 96)
RES = 256  # native working resolution


class DepthUNet(nn.Module):
    """rgb (H, W, 3) in [0,1] -> metric depth (H, W), H/W multiples of 16."""

    @nn.compact
    def __call__(self, x):
        skips = []
        h = x
        for ch in CHANNELS:
            h = nn.relu(nn.Conv(ch, (3, 3), strides=(2, 2))(h))
            h = nn.relu(nn.Conv(ch, (3, 3))(h))
            skips.append(h)
        h = nn.relu(nn.Conv(128, (3, 3))(h))
        for ch, s in zip(reversed(CHANNELS), reversed(skips)):
            h = jax.image.resize(h, s.shape[:2] + (h.shape[-1],), "bilinear")
            h = jnp.concatenate([h, s], axis=-1)
            h = nn.relu(nn.Conv(ch, (3, 3))(h))
        h = jax.image.resize(h, x.shape[:2] + (h.shape[-1],), "bilinear")
        h = nn.relu(nn.Conv(16, (3, 3))(h))
        # init bias so the initial depth sits near the scene scale (~3)
        out = nn.Conv(1, (1, 1), bias_init=nn.initializers.constant(3.0))(h)
        return nn.softplus(out[..., 0])


# ------------------------------------------------------------------ host API


def weights_path() -> str:
    from preprocess.backends.weights import resolve_weights

    return resolve_weights(WEIGHTS_NAME)


@functools.lru_cache(maxsize=1)
def _load_params_cached(path: str, mtime: float):
    model = DepthUNet()
    dummy = jnp.zeros((64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy)["params"]
    with open(path, "rb") as f:
        return serialization.from_bytes(params, f.read())


def load_params(path: Optional[str] = None):
    """Weights from the local cache, or None when absent/corrupt."""
    path = path or weights_path()
    if not os.path.exists(path):
        return None
    try:
        return _load_params_cached(path, os.path.getmtime(path))
    except Exception as e:  # corrupt file must not kill preprocessing
        print(f"[warn] depth_unet weights unusable ({e}); classical fallback")
        return None


def available() -> bool:
    return load_params() is not None


@functools.lru_cache(maxsize=1)
def _jitted():
    model = DepthUNet()
    return jax.jit(lambda p, x: model.apply({"params": p}, x))


def depth_video_unet(
    frames: List[np.ndarray], params=None, res: int = RES
) -> List[np.ndarray]:
    """Per-frame metric depth at the original frame resolution."""
    import cv2

    params = params if params is not None else load_params()
    assert params is not None, "depth_unet weights missing"
    run = _jitted()
    out = []
    for f in frames:
        h, w = f.shape[:2]
        x = cv2.resize(f, (res, res)).astype(np.float32) / 255.0
        d = np.asarray(run(params, jnp.asarray(x)))
        out.append(
            cv2.resize(d, (w, h), interpolation=cv2.INTER_LINEAR).astype(
                np.float32
            )
        )
    return out
