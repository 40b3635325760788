"""Feature-map extraction for a whole collection with a shared PCA basis:
Features/<seq>/{crop,full}-<S>-dinov2-01.npy (reference:
preprocess/scripts/extract_dinov2.py; the filename keeps the reference's
"dinov2" tag for loader compatibility regardless of backend)."""

from __future__ import annotations

import configparser
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "../..")))

from preprocess.backends import pick_backend
from preprocess.backends.feat_backends import (
    extract_features_collection,
    probe_dinov2,
)
from preprocess.libs.io import frame_list


def extract_features(
    collection_name: str,
    crop_size: int = 256,
    component_id: int = 1,
    database_root: str = "database",
):
    outdir = f"{database_root}/processed"
    # three-way: hub-cached dinov2 > trained descriptor net > filter bank
    from preprocess.backends.feat_net import probe_feat_net

    fallback = pick_backend(
        "LAB4D_FEAT_BACKEND", "net", "filterbank", probe_feat_net
    )
    backend = pick_backend("LAB4D_FEAT_BACKEND", "dinov2", fallback,
                           probe_dinov2)

    config = configparser.RawConfigParser()
    config.read(f"{database_root}/configs/{collection_name}.config")
    seqnames = []
    for vidid in range(len(config.sections()) - 1):
        img_path = config.get(f"data_{vidid}", "img_path")
        seqnames.append(img_path.strip("/").split("/")[-1])

    seq_frames = [frame_list(outdir, s) for s in seqnames]
    for use_full, prefix in ((False, "crop"), (True, "full")):
        feats = extract_features_collection(
            seq_frames, crop_size, use_full, component_id, backend=backend
        )
        for seqname, f in zip(seqnames, feats):
            feat_dir = f"{outdir}/Features/Full-Resolution/{seqname}"
            os.makedirs(feat_dir, exist_ok=True)
            np.save(
                f"{feat_dir}/{prefix}-{crop_size}-dinov2-{component_id:02d}.npy", f
            )
    print(f"features ({backend}) done: {collection_name}")
    return backend


if __name__ == "__main__":
    extract_features(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 256)
