"""Per-delta optical flow over a processed video: writes per-frame
FlowFW_d / FlowBW_d npys at the flow working resolution
(reference: preprocess/third_party/vcnplus/compute_flow.py)."""

from __future__ import annotations

import glob
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "../..")))


def pick_flow_backend():
    """Flow backend selection (mirrors the seg/depth/feat backends):
    LAB4D_FLOW_BACKEND = auto (default) | raft | classical. `auto`
    upgrades to the RAFT-lite net when its weights are cached locally."""
    choice = os.environ.get("LAB4D_FLOW_BACKEND", "auto")
    if choice != "classical":
        from preprocess.backends import flow_raft

        if flow_raft.available():
            return "raft", flow_raft.compute_pair_flow
        if choice == "raft":
            raise FileNotFoundError(
                f"LAB4D_FLOW_BACKEND=raft but no weights at "
                f"{flow_raft.weights_path()}"
            )
    from preprocess.backends.flow_jax import compute_pair_flow

    return "classical", compute_pair_flow


def compute_flow(seqname: str, outdir: str, dframe: int):
    backend, compute_pair_flow = pick_flow_backend()

    img_paths = sorted(
        glob.glob(f"{outdir}/JPEGImages/Full-Resolution/{seqname}/*.jpg")
    )
    fw_dir = f"{outdir}/FlowFW_{dframe}/Full-Resolution/{seqname}"
    bw_dir = f"{outdir}/FlowBW_{dframe}/Full-Resolution/{seqname}"
    os.makedirs(fw_dir, exist_ok=True)
    os.makedirs(bw_dir, exist_ok=True)

    cache = {}

    def load(i):
        if i not in cache:
            cache[i] = cv2.imread(img_paths[i])[..., ::-1]
            if len(cache) > 2 * dframe + 2:  # bound memory
                cache.pop(min(cache))
        return cache[i]

    for i in range(len(img_paths) - dframe):
        fw, bw = compute_pair_flow(load(i), load(i + dframe))
        name_i = os.path.basename(img_paths[i]).replace(".jpg", ".npy")
        name_j = os.path.basename(img_paths[i + dframe]).replace(".jpg", ".npy")
        np.save(f"{fw_dir}/{name_i}", fw.astype(np.float16))
        np.save(f"{bw_dir}/{name_j}", bw.astype(np.float16))
    print(f"flow (delta={dframe}, backend={backend}) done: {seqname}")


if __name__ == "__main__":
    compute_flow(sys.argv[1], sys.argv[2], int(sys.argv[3]))
