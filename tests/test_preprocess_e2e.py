"""End-to-end preprocessing test: raw frames only (no GT priors) ->
full pipeline (segmentation, flow, depth, crop, cameras, TSDF,
canonical, features, config) -> training dataloader yields a batch."""

import glob
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.synthetic_raw import make_raw_scene


@pytest.mark.slow
def test_pipeline_end_to_end(tmp_path):
    root = str(tmp_path)
    seq = "e2esim-0000"
    make_raw_scene(
        root, seqname=seq, num_frames=10, res=96, orbit_span=0.12,
        write_masks=False, write_depth=False, write_flow=False,
    )
    outdir = f"{root}/processed"

    from preprocess.backends.depth_backends import extract_depth
    from preprocess.backends.seg_backends import run_segmentation
    from preprocess.scripts.write_config import write_config
    from scripts.run_preprocess import run_extract_priors

    run_segmentation(seq, outdir)
    # per-frame masks written for every frame
    assert len(glob.glob(f"{outdir}/Annotations/Full-Resolution/{seq}/*.npy")) == 10

    run_extract_priors(seq, outdir, "quad")
    write_config("e2esim", root)

    from preprocess.scripts.extract_features import extract_features

    extract_features("e2esim", 64, database_root=root)

    # artifact audit: everything training needs exists and is finite
    need = [
        f"{outdir}/JPEGImages/Full-Resolution/{seq}/crop-256.npy",
        f"{outdir}/Annotations/Full-Resolution/{seq}/crop-256.npy",
        f"{outdir}/Annotations/Full-Resolution/{seq}/crop-256-crop2raw.npy",
        f"{outdir}/Depth/Full-Resolution/{seq}/crop-256.npy",
        f"{outdir}/FlowFW_1/Full-Resolution/{seq}/crop-256.npy",
        f"{outdir}/FlowBW_8/Full-Resolution/{seq}/crop-256.npy",
        f"{outdir}/Cameras/Full-Resolution/{seq}/00.npy",
        f"{outdir}/Cameras/Full-Resolution/{seq}/01-canonical.npy",
        f"{outdir}/Cameras/Full-Resolution/{seq}/mesh-00-centered.obj",
        f"{outdir}/Features/Full-Resolution/{seq}/crop-64-dinov2-01.npy",
        f"{root}/configs/e2esim.config",
    ]
    for path in need:
        assert os.path.exists(path), path
    for path in need:
        if path.endswith(".npy"):
            arr = np.load(path)
            assert np.isfinite(arr.astype(np.float32)).all(), path

    cams = np.load(f"{outdir}/Cameras/Full-Resolution/{seq}/00.npy")
    assert cams.shape == (10, 4, 4)
    # rotations stay orthonormal through the chain + recentering
    RtR = cams[:, :3, :3] @ np.swapaxes(cams[:, :3, :3], -1, -2)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (10, 1, 1)), atol=1e-4)

    # the packed data loads through the training dataloader
    from lab4d_tpu.dataloader.data_utils import config_to_datasets, get_data_info

    opts = {
        "seqname": "e2esim",
        "database_root": root,
        "data_prefix": "crop",
        "train_res": 256,
        "feature_type": "dinov2",
        "pixels_per_image": 8,
    }
    datasets = config_to_datasets(opts)
    assert len(datasets) == 1
    batch = datasets[0].load_pairs_batch(np.array([0, 2]))
    for key in ("rgb", "mask", "depth", "flow", "feature"):
        assert key in batch, key
        assert np.isfinite(np.asarray(batch[key], np.float32)).all(), key
