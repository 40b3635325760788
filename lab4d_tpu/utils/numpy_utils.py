"""Host-side numpy helpers: schedule interpolation, PCA for feature
visualization, bilinear sampling. Parity: lab4d/utils/numpy_utils.py."""

from __future__ import annotations

import numpy as np


def interp_wt(x, y, x2, type: str = "linear"):
    """Map scalar x2 from range [x0, x1] to [y0, y1] (linear or log-space),
    clipped to the y range. Works on python/numpy scalars (host schedules).
    """
    x0, x1 = x
    y0, y1 = y
    if type == "linear":
        y2 = y0 + (x2 - x0) * (y1 - y0) / (x1 - x0)
    elif type == "log":
        ly0, ly1 = np.log10(y0), np.log10(y1)
        y2 = 10 ** (ly0 + (x2 - x0) * (ly1 - ly0) / (x1 - x0))
    else:
        raise ValueError(type)
    return float(np.clip(y2, min(y0, y1), max(y0, y1)))


def pca_numpy(raw_data: np.ndarray, n_components: int):
    """Closed-form PCA factory; returns a function applying the projection.

    Used to visualize 16-d DINO features as RGB.
    """
    mean = raw_data.mean(axis=0)
    centered = raw_data - mean
    cov = np.cov(centered.T)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1]
    eigval = eigval[order]
    eigvec = eigvec[:, order]
    top = eigvec[:, :n_components]

    def apply_pca_fn(data: np.ndarray, normalize: bool = False) -> np.ndarray:
        shape = data.shape
        flat = data.reshape(-1, shape[-1])
        proj = (flat - mean) @ top
        if normalize:
            proj = proj / np.sqrt(np.maximum(eigval[:n_components], 1e-12))
            proj = np.clip(proj, -2, 2)
            proj = (proj + 2) / 4
        return proj.reshape(shape[:-1] + (n_components,))

    return apply_pca_fn


def bilinear_interp(feat: np.ndarray, xy_loc: np.ndarray) -> np.ndarray:
    """Bilinear sample a (H, W, C) feature map at float (N, 2) xy locations."""
    dtype = feat.dtype
    H, W = feat.shape[:2]
    ul = np.floor(xy_loc).astype(int)
    fx = (xy_loc[:, 0] - ul[:, 0])[:, None]
    fy = (xy_loc[:, 1] - ul[:, 1])[:, None]
    x0 = np.clip(ul[:, 0], 0, W - 2)
    y0 = np.clip(ul[:, 1], 0, H - 2)
    q11 = feat[y0, x0]
    q12 = feat[y0, x0 + 1]
    q21 = feat[y0 + 1, x0]
    q22 = feat[y0 + 1, x0 + 1]
    out = (
        q11 * (1 - fx) * (1 - fy)
        + q21 * (1 - fx) * fy
        + q12 * fx * (1 - fy)
        + q22 * fx * fy
    )
    return out.astype(dtype)
