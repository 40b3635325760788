"""Synthetic RAW scene generator for preprocessing tests.

Unlike tests/synthetic.py (which writes the *processed* layout directly),
this writes what the preprocessing pipeline takes as input plus optional
ground-truth priors, so individual stages can be tested against analytic
truth:

  JPEGImages/Full-Resolution/<seq>/%05d.jpg   textured render
  Annotations/.../%05d.npy                    GT int masks (if requested)
  Depth/.../%05d.npy                          GT depth     (if requested)
  FlowFW_d, FlowBW_d/.../%05d.npy             GT flow+occ  (if requested)

Scene: a small textured sphere (fg, radius 0.5 at origin) inside a large
"room" sphere (bg, radius 6) the camera orbits within, so both fg and bg
have depth + texture and camera registration / TSDF are well-posed.
"""

from __future__ import annotations

import os

import numpy as np

FG_RADIUS = 0.5
BG_RADIUS = 6.0
CAM_DIST = 3.0


def orbit_pose(t: float, dist: float = CAM_DIST):
    """Scene-to-camera SE(3), camera orbiting the origin (y-axis)."""
    ang = 2 * np.pi * t
    R_y = np.array(
        [
            [np.cos(ang), 0, -np.sin(ang)],
            [0, 1, 0],
            [np.sin(ang), 0, np.cos(ang)],
        ]
    )
    rt = np.eye(4)
    rt[:3, :3] = R_y
    rt[2, 3] = dist
    return rt


def _texture(p: np.ndarray, freqs=(3.1, 5.7, 9.3)) -> np.ndarray:
    """Procedural smooth 3D texture: (..., 3) rgb in [0, 1]."""
    r = np.zeros(p.shape[:-1] + (3,))
    for i, f in enumerate(freqs):
        phase = p @ np.array([f, f * 1.3 + i, f * 0.7 - i])
        r[..., i] = 0.5 + 0.3 * np.sin(phase) + 0.2 * np.sin(2.3 * phase + 1.0)
    return np.clip(r, 0, 1)


def _sphere_hit(origin, dirs, radius, inner=False):
    """Ray-sphere; returns (s, hit). inner=True takes the far root."""
    b = 2 * dirs @ origin
    a = np.sum(dirs * dirs, -1)
    c = origin @ origin - radius**2
    disc = b**2 - 4 * a * c
    ok = disc > 0
    sq = np.sqrt(np.maximum(disc, 0))
    s = (-b + sq) / (2 * a) if inner else (-b - sq) / (2 * a)
    ok = ok & (s > 0)
    return np.where(ok, s, 0.0), ok


def render_frame(rt, K, res):
    """Returns rgb (res,res,3), mask (fg bool), depth (z), pts (scene xyz)."""
    xs, ys = np.meshgrid(np.arange(res), np.arange(res), indexing="xy")
    fx, fy, cx, cy = K
    d = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs, float)], -1)
    R, tvec = rt[:3, :3], rt[:3, 3]
    origin = -R.T @ tvec
    dirs = d @ R

    s_fg, hit_fg = _sphere_hit(origin, dirs, FG_RADIUS)
    s_bg, hit_bg = _sphere_hit(origin, dirs, BG_RADIUS, inner=True)
    use_fg = hit_fg & (~hit_bg | (s_fg < s_bg))
    s = np.where(use_fg, s_fg, s_bg)
    pts = origin + s[..., None] * dirs

    normal_fg = pts / FG_RADIUS
    normal_bg = -pts / BG_RADIUS
    normal = np.where(use_fg[..., None], normal_fg, normal_bg)
    light = np.array([0.5, 0.7, 0.5])
    lam = 0.4 + 0.6 * np.clip(normal @ light, 0, 1)
    tex = np.where(
        use_fg[..., None], _texture(pts * 4.0), _texture(pts, freqs=(1.3, 2.1, 0.9))
    )
    rgb = np.clip(lam[..., None] * tex, 0, 1)
    depth = s * d[..., 2]
    return rgb.astype(np.float32), use_fg, depth.astype(np.float32), pts


def project(pts, rt, K):
    p = pts @ rt[:3, :3].T + rt[:3, 3]
    fx, fy, cx, cy = K
    z = np.maximum(p[..., 2], 1e-6)
    return np.stack([fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], -1)


def make_raw_scene(
    root: str,
    seqname: str = "rawsim-0000",
    num_frames: int = 12,
    res: int = 96,
    write_masks: bool = True,
    write_depth: bool = True,
    write_flow: bool = True,
    deltas=(1, 2, 4, 8),
    orbit_span: float = 0.6,
):
    """Write the raw scene; returns dict of GT arrays."""
    import imageio

    proc = f"{root}/processed"
    dirs = {}
    subs = ["JPEGImages", "JPEGImagesRaw", "Annotations", "Depth"] + [
        f"Flow{d}_{k}" for k in deltas for d in ("FW", "BW")
    ]
    for sub in subs:
        dirs[sub] = f"{proc}/{sub}/Full-Resolution/{seqname}"
        os.makedirs(dirs[sub], exist_ok=True)

    # focal = max(H, W): matches the pipeline's intrinsics guess
    # (preprocess/libs/io.py default_intrinsics), keeping registration
    # well-posed against ground truth
    K = np.array([float(res), float(res), res / 2, res / 2], np.float64)
    rts = np.stack(
        [orbit_pose(orbit_span * i / num_frames) for i in range(num_frames)]
    )

    rgbs, masks, depths, pts_all = [], [], [], []
    for i in range(num_frames):
        rgb, fg, depth, pts = render_frame(rts[i], K, res)
        rgbs.append(rgb)
        masks.append(fg)
        depths.append(depth)
        pts_all.append(pts)
        frame8 = (rgb * 255).astype(np.uint8)
        imageio.imwrite(f"{dirs['JPEGImages']}/{i:05d}.jpg", frame8, quality=95)
        imageio.imwrite(f"{dirs['JPEGImagesRaw']}/{i:05d}.jpg", frame8, quality=95)
        if write_masks:
            np.save(f"{dirs['Annotations']}/{i:05d}.npy", fg.astype(np.int8))
        if write_depth:
            np.save(f"{dirs['Depth']}/{i:05d}.npy", depth.astype(np.float16))

    if write_flow:
        xs, ys = np.meshgrid(np.arange(res), np.arange(res), indexing="xy")
        base = np.stack([xs, ys], -1).astype(np.float32)
        for d in deltas:
            for i in range(num_frames - d):
                fw = project(pts_all[i], rts[i + d], K) - base
                bw = project(pts_all[i + d], rts[i], K) - base
                # occ: negative logit = visible (synthetic: all visible)
                occ = -np.ones((res, res, 1), np.float32)
                np.save(
                    f"{dirs[f'FlowFW_{d}']}/{i:05d}.npy",
                    np.concatenate([fw, occ], -1).astype(np.float32),
                )
                np.save(
                    f"{dirs[f'FlowBW_{d}']}/{i + d:05d}.npy",
                    np.concatenate([bw, occ], -1).astype(np.float32),
                )

    return {
        "K": K,
        "rts": rts,
        "rgbs": np.stack(rgbs),
        "masks": np.stack(masks),
        "depths": np.stack(depths),
        "seqname": seqname,
        "root": root,
    }
