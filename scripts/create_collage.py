"""Tile rendered videos of multiple runs/sequences into one grid video
(reference: scripts/create_collage.py, moviepy -> plain imageio/numpy).

  python scripts/create_collage.py <glob-of-mp4s-or-png-dirs> <out.mp4> [cols]
"""

from __future__ import annotations

import glob
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def _load_clip(path, max_frames=150):
    import imageio

    if os.path.isdir(path):
        frames = [
            imageio.imread(p)
            for p in sorted(glob.glob(f"{path}/*.png"))[:max_frames]
        ]
        return np.stack(frames) if frames else None
    try:
        return np.stack(list(imageio.mimread(path, memtest=False))[:max_frames])
    except Exception:
        return None


def create_collage(pattern: str, out_path: str, cols: int = 0, res: int = 256):
    import cv2

    from lab4d_tpu.utils.io import save_video

    paths = sorted(glob.glob(pattern))
    clips = [c for c in (_load_clip(p) for p in paths) if c is not None]
    if not clips:
        print(f"no clips matched {pattern}")
        return None
    n = len(clips)
    cols = cols or int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / cols))
    length = max(len(c) for c in clips)

    grid_frames = []
    for t in range(length):
        tiles = []
        for c in clips:
            f = c[min(t, len(c) - 1)]
            if f.ndim == 2:
                f = np.repeat(f[..., None], 3, -1)
            tiles.append(cv2.resize(f[..., :3], (res, res)))
        while len(tiles) < rows * cols:
            tiles.append(np.zeros((res, res, 3), np.uint8))
        rows_img = [
            np.concatenate(tiles[r * cols : (r + 1) * cols], 1)
            for r in range(rows)
        ]
        grid_frames.append(np.concatenate(rows_img, 0))
    save_video(np.stack(grid_frames), out_path)
    print(f"collage ({n} clips, {rows}x{cols}) -> {out_path}")
    return out_path


if __name__ == "__main__":
    create_collage(
        sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 0
    )
