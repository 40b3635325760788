"""Turntable videos of per-round intermediate geometry (proxy meshes,
bone gaussians, camera frusta) exported by the trainer
(reference: scripts/render_intermediate.py, pyrender -> here the
dependency-free splat rasterizer).

  python scripts/render_intermediate.py --testdir logdir/<seq>-<log> \
      [--data_class fg] [--show_cams]
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("testdir", "", "run dir, e.g. logdir/seq-log")
flags.DEFINE_string("data_class", "fg", "fg | bg")
flags.DEFINE_integer("res", 512, "render resolution")
flags.DEFINE_integer("num_views", 12, "turntable frames per round")
flags.DEFINE_bool("show_cams", False, "composite camera frusta mesh")


def render_intermediate(testdir, data_class="fg", res=512, num_views=12,
                        show_cams=False):
    from lab4d_tpu.meshlib import concatenate, load_obj
    from lab4d_tpu.utils.io import save_video
    from lab4d_tpu.utils.raster import render_mesh, look_at

    # trainer exports "<round>-<cate>-proxy.obj" per round
    proxy_paths = sorted(glob.glob(f"{testdir}/*-{data_class}-proxy.obj"))
    if not proxy_paths:
        print(f"no proxy meshes for {data_class} under {testdir}")
        return []

    frames = []
    for round_idx, path in enumerate(proxy_paths):
        mesh = load_obj(path)
        if show_cams:
            cam_path = path.replace("proxy", "cams")
            if os.path.exists(cam_path):
                mesh = concatenate([mesh, load_obj(cam_path)])
        verts = np.asarray(mesh.vertices)
        if len(verts) == 0:
            continue
        center = (verts.max(0) + verts.min(0)) / 2
        radius = max(float(np.linalg.norm(verts - center, axis=-1).max()), 1e-3)
        K = np.array([res, res, res / 2, res / 2], float)
        ang = 2 * np.pi * round_idx / max(len(proxy_paths), 1)
        eye = center + 2.5 * radius * np.array(
            [np.sin(ang) * 0.97, 0.26, -np.cos(ang) * 0.97]
        )
        img = render_mesh(
            verts, np.asarray(mesh.faces), look_at(eye, center), K, res
        )
        frames.append((img * 255).astype(np.uint8))

    out = f"{testdir}/intermediate-{data_class}.mp4"
    save_video(np.stack(frames), out)
    print(f"saved {len(frames)} intermediate frames to {out}")
    return frames


def main(_):
    render_intermediate(
        FLAGS.testdir, FLAGS.data_class, FLAGS.res, FLAGS.num_views,
        FLAGS.show_cams,
    )


if __name__ == "__main__":
    app.run(main)
