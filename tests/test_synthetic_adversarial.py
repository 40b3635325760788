"""Self-consistency checks for the adversarial synthetic scene: the
analytic flow/depth/mask/texture must agree with each other, motion must
actually be fast, and occlusions must actually occur — otherwise the
validation run it feeds (scripts/validate_adversarial.py) proves nothing.
"""

import numpy as np
import pytest

from tests.synthetic_adversarial import (
    make_adversarial_dataset,
    render_frame,
    deform_to,
    cam_pose,
    limb_angle,
)


RES = 64
K = np.array([1.3 * RES, 1.3 * RES, RES / 2, RES / 2])


def _bilinear(img, uv):
    h, w = img.shape[:2]
    x = np.clip(uv[..., 0], 0, w - 1.001)
    y = np.clip(uv[..., 1], 0, h - 1.001)
    x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
    fx, fy = (x - x0)[..., None], (y - y0)[..., None]
    return (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x0 + 1] * fx * (1 - fy)
        + img[y0 + 1, x0] * (1 - fx) * fy
        + img[y0 + 1, x0 + 1] * fx * fy
    )


def test_flow_photometric_consistency():
    """Warping frame j's rgb back along GT flow i->j must reproduce frame
    i's rgb wherever the flow says visible (texture is view-independent up
    to shading; tolerance covers the shading change)."""
    t0, t1 = 0.0, 1.0 / 64
    rgb0, hit0, _, pts_c, part, _ = render_frame(t0, K, RES)
    rgb1 = render_frame(t1, K, RES)[0]

    pts1 = deform_to(pts_c, part, t1)
    rt1 = cam_pose(t1)
    p = pts1 @ rt1[:3, :3].T + rt1[:3, 3]
    uv = np.stack(
        [
            K[0] * p[..., 0] / p[..., 2] + K[2],
            K[1] * p[..., 1] / p[..., 2] + K[3],
        ],
        -1,
    )
    warped = _bilinear(rgb1, uv)
    # interior pixels only (away from silhouette aliasing)
    from scipy import ndimage

    interior = ndimage.binary_erosion(hit0, iterations=2)
    err = np.abs(warped - rgb0)[interior].mean()
    assert err < 0.06, f"photometric err {err}"


def test_fast_motion_and_occlusion(tmp_path):
    root = make_adversarial_dataset(
        str(tmp_path), num_frames=16, res=RES, feat_res=16, cam_noise_deg=0.0
    )
    flow = np.load(
        f"{root}/processed/FlowFW_1/Full-Resolution/adversarial-0000/crop-{RES}.npy"
    )
    mask = np.load(
        f"{root}/processed/Annotations/Full-Resolution/adversarial-0000/crop-{RES}.npy"
    )[..., 0]
    mags = []
    occ_fracs = []
    for i in range(flow.shape[0]):
        m = mask[i]
        mag = np.linalg.norm(flow[i, ..., :2][m], axis=-1)
        mags.append(np.median(mag))
        vis = flow[i, ..., 2][m]
        occ_fracs.append(1.0 - vis.mean())
    # fast motion: median flow over the object is "many" pixels at this
    # 16-frame/64-px config (scales ~4x at the 64-frame/256-px default)
    assert max(mags) > 4.0, f"motion too slow: {mags}"
    # occlusions exist but don't dominate
    assert 0.01 < max(occ_fracs) < 0.6, f"occlusion fractions: {occ_fracs}"


def test_depth_mask_consistency(tmp_path):
    root = make_adversarial_dataset(
        str(tmp_path), num_frames=4, res=RES, feat_res=16
    )
    d = np.load(
        f"{root}/processed/Depth/Full-Resolution/adversarial-0000/crop-{RES}.npy"
    )
    m = np.load(
        f"{root}/processed/Annotations/Full-Resolution/adversarial-0000/crop-{RES}.npy"
    )[..., 0]
    assert ((d > 0) == m).mean() > 0.995
    assert np.isfinite(d).all()
    assert d[m].min() > 1.0 and d[m].max() < 4.5  # inside the camera orbit
    feat = np.load(
        f"{root}/processed/Features/Full-Resolution/adversarial-0000/"
        f"crop-{RES}-dinov2-01.npy"
    )
    assert feat.shape[-1] == 16  # dataloader/model contract


def test_limb_articulation_nontrivial():
    """The limb sweep covers a wide angle range — a rigid fit cannot
    explain the data."""
    angles = [limb_angle(t) for t in np.linspace(0, 1, 64, endpoint=False)]
    assert np.rad2deg(max(angles) - min(angles)) > 120
