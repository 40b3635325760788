"""Canonical-viewpoint CNN (JAX/flax) — the zero-egress stand-in for the
reference's DensePose-CSE viewpoint network
(reference: preprocess/third_party/viewpoint/dp_viewpoint.py), in the
same local-weights mold as flow_raft.py / depth_unet.py.

A small conv net maps a masked, bbox-cropped RGB image to the rotation
taking the object's canonical frame to the camera frame, predicted in
the continuous 6D rotation parameterization (Zhou et al., CVPR 2019 —
two free columns, Gram-Schmidt).

Weights load from the local cache only:
``database/weights/viewpoint_{cls}.msgpack`` (fallback
``viewpoint_net.msgpack``) under ``database/weights`` or
``$LAB4D_WEIGHTS_DIR``. ``scripts/train_viewpoint.py`` distills them
from synthetic articulated scenes with known canonical pose;
canonical registration auto-upgrades when a file exists
(preprocess/scripts/canonical_registration.py).
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

RES = 96  # crop resolution fed to the net


class ViewpointNet(nn.Module):
    """Masked rgb crop (RES, RES, 3) in [0,1] -> rotation matrix (3, 3)."""

    @nn.compact
    def __call__(self, x):
        for ch in (32, 64, 96, 128):
            x = nn.relu(nn.Conv(ch, (3, 3), strides=(2, 2))(x))
            x = nn.relu(nn.Conv(ch, (3, 3))(x))
        x = x.mean(axis=(0, 1))  # global average pool
        x = nn.relu(nn.Dense(128)(x))
        sixd = nn.Dense(6)(x)
        return rot6d_to_matrix(sixd)


def rot6d_to_matrix(sixd: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt two columns -> SO(3) (Zhou et al. 6D rep)."""
    a1, a2 = sixd[..., :3], sixd[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-6)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-6)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


# ------------------------------------------------------------------ host API


def weights_path(obj_class: str = "") -> str:
    from preprocess.backends.weights import resolve_weights

    if obj_class:
        p = resolve_weights(f"viewpoint_{obj_class}.msgpack")
        if os.path.exists(p):
            return p
    return resolve_weights("viewpoint_net.msgpack")


@functools.lru_cache(maxsize=4)
def _load_params_cached(path: str, mtime: float):
    model = ViewpointNet()
    dummy = jnp.zeros((RES, RES, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy)["params"]
    with open(path, "rb") as f:
        return serialization.from_bytes(params, f.read())


def load_params(obj_class: str = "", path: Optional[str] = None):
    path = path or weights_path(obj_class)
    if not os.path.exists(path):
        return None
    try:
        return _load_params_cached(path, os.path.getmtime(path))
    except Exception as e:
        print(f"[warn] viewpoint weights unusable ({e}); chain-only prior")
        return None


def available(obj_class: str = "") -> bool:
    return load_params(obj_class) is not None


@functools.lru_cache(maxsize=1)
def _jitted():
    model = ViewpointNet()
    return jax.jit(lambda p, x: model.apply({"params": p}, x))


def crop_masked(rgb_u8: np.ndarray, mask: np.ndarray) -> Optional[np.ndarray]:
    """Mask-centered square crop resized to RES, background zeroed."""
    import cv2

    ys, xs = np.nonzero(mask > 0)
    if len(ys) == 0:
        return None
    cy, cx = ys.mean(), xs.mean()
    half = max(np.ptp(ys), np.ptp(xs)) * 0.7 + 8
    h, w = mask.shape
    y0, y1 = int(max(0, cy - half)), int(min(h, cy + half))
    x0, x1 = int(max(0, cx - half)), int(min(w, cx + half))
    crop = rgb_u8[y0:y1, x0:x1] * (mask[y0:y1, x0:x1, None] > 0)
    return cv2.resize(crop, (RES, RES)).astype(np.float32) / 255.0


def predict_viewpoints(
    img_paths: List[str], obj_class: str = "", every: int = 4
) -> dict:
    """Sparse {frame_idx: 3x3 rotation} priors for canonical registration
    (same contract as the reference's CSE viewpoint head outputs)."""
    import cv2

    params = load_params(obj_class)
    assert params is not None, "viewpoint weights missing"
    run = _jitted()
    out = {}
    for i in range(0, len(img_paths), every):
        p = img_paths[i]
        rgb = cv2.imread(p)[..., ::-1]
        mpath = p.replace("JPEGImages", "Annotations").replace(".jpg", ".npy")
        if not os.path.exists(mpath):
            continue
        mask = np.load(mpath)
        crop = crop_masked(rgb, mask)
        if crop is None:
            continue
        out[i] = np.asarray(run(params, jnp.asarray(crop)))
    return out
