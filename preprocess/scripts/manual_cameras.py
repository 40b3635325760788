"""Manual key-frame camera annotation, JSON-based.

The reference ships a gradio+plotly GUI (reference:
preprocess/scripts/manual_cameras.py) that writes
Cameras/<seq>/01-manual.json mapping frame index -> 4x4 canonical
object-to-camera transforms.  This environment has no gradio, so the
workflow is file-based:

  1. `python preprocess/scripts/manual_cameras.py template <seq> [n_key]`
     writes a template json with identity/turntable guesses at key frames.
  2. Edit the rotations (any external tool / known rig).
  3. run_preprocess picks the json up automatically for obj_class=other.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "../..")))


def turntable_guess(num_frames: int, num_key: int = 8):
    """Evenly-spaced azimuth guesses: a sane starting template."""
    out = {}
    for i in range(num_key):
        t = i / num_key
        ang = 2 * np.pi * t
        rt = np.eye(4)
        rt[:3, :3] = np.array(
            [
                [np.cos(ang), 0, -np.sin(ang)],
                [0, 1, 0],
                [np.sin(ang), 0, np.cos(ang)],
            ]
        )
        rt[2, 3] = 3.0
        frame = int(round(t * (num_frames - 1)))
        out[frame] = rt.tolist()
    return out


def write_template(seqname: str, outdir: str = "database/processed", num_key: int = 8):
    from preprocess.libs.io import frame_list

    n = len(frame_list(outdir, seqname))
    cam_dir = f"{outdir}/Cameras/Full-Resolution/{seqname}"
    os.makedirs(cam_dir, exist_ok=True)
    path = f"{cam_dir}/01-manual.json"
    with open(path, "w") as f:
        json.dump(turntable_guess(n, num_key), f, indent=1)
    print(f"wrote manual-camera template: {path} — edit before training")
    return path


def ensure_manual_cameras(seqnames, outdir: str = "database/processed"):
    """Write templates for any sequence missing its manual json."""
    missing = []
    for s in seqnames:
        path = f"{outdir}/Cameras/Full-Resolution/{s}/01-manual.json"
        if not os.path.exists(path):
            write_template(s, outdir)
            missing.append(s)
    if missing:
        print(
            "manual cameras: template jsons were generated for "
            f"{missing}; edit them for best results (turntable guess used)."
        )


if __name__ == "__main__":
    if sys.argv[1] == "template":
        write_template(sys.argv[2], num_key=int(sys.argv[3]) if len(sys.argv) > 3 else 8)
    else:
        print(__doc__)
