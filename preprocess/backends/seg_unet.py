"""Video segmentation U-Net (JAX/flax).

The reference segments with Track-Anything (SAM + XMem) driven by a text
prompt or GUI (reference: scripts/run_preprocess.py:25-44). In this
zero-egress environment those weights are unavailable, so this provides
a compact trainable video segmenter in the depth_unet.py mold:

  input  (H, W, 4): rgb in [0,1] + a previous-mask conditioning channel
                    (0.5 = unknown; the first frame bootstraps from
                    appearance/shading alone)
  output (H, W):    foreground probability

The conditioning channel is the XMem-style memory reduced to its
essence: at inference the previous frame's prediction is fed forward, so
the net tracks the object instead of re-deciding per frame; training
feeds it heavily-corrupted ground-truth masks so it learns to correct
drift rather than copy.

Weights load from the local cache only: ``database/weights/
seg_unet.msgpack`` or ``$LAB4D_WEIGHTS_DIR/seg_unet.msgpack``.
``scripts/train_seg_unet.py`` distills them from synthetic scenes with
analytic masks; the segmentation backend auto-upgrades over the
classical motion-seeded GrabCut when the file exists
(preprocess/backends/seg_backends.py).
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

WEIGHTS_NAME = "seg_unet.msgpack"
CHANNELS = (32, 48, 64, 96)
RES = 256  # native working resolution


class SegUNet(nn.Module):
    """x (H, W, 4) = [rgb, prev_mask] -> fg probability (H, W)."""

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
        logit = nn.Conv(1, (1, 1))(h)
        return jax.nn.sigmoid(logit[..., 0])


# ------------------------------------------------------------------ host API


def weights_path() -> str:
    from preprocess.backends.weights import resolve_weights

    return resolve_weights(WEIGHTS_NAME)


@functools.lru_cache(maxsize=1)
def _load_params_cached(path: str, mtime: float):
    model = SegUNet()
    dummy = jnp.zeros((64, 64, 4), jnp.float32)
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
        print(f"[warn] seg_unet weights unusable ({e}); grabcut fallback")
        return None


def available() -> bool:
    return load_params() is not None


@functools.lru_cache(maxsize=1)
def _jitted():
    model = SegUNet()
    return jax.jit(lambda p, x: model.apply({"params": p}, x))


def segment_video_unet(
    frames: List[np.ndarray], params=None, res: int = RES
) -> List[np.ndarray]:
    """Per-frame int8 fg masks at each frame's raw resolution.

    The previous frame's soft prediction is fed back as the conditioning
    channel (0.5 on the first frame)."""
    import cv2

    params = params if params is not None else load_params()
    assert params is not None, "seg_unet weights missing"
    run = _jitted()
    prev = np.full((res, res), 0.5, np.float32)
    out = []
    for f in frames:
        h, w = f.shape[:2]
        rgb = cv2.resize(f, (res, res)).astype(np.float32) / 255.0
        x = np.concatenate([rgb, prev[..., None]], axis=-1)
        prob = np.asarray(run(params, jnp.asarray(x)))
        prev = prob
        mask = (prob > 0.5).astype(np.uint8)
        # keep the largest component for stability (matches grabcut path)
        if mask.any():
            num, labels = cv2.connectedComponents(mask)
            if num > 2:
                counts = np.bincount(labels.ravel())
                counts[0] = 0
                mask = (labels == counts.argmax()).astype(np.uint8)
        full = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
        out.append(full.astype(np.int8))
    return out
