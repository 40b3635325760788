"""End-to-end CLI coverage: train a tiny skel-quad model on the synthetic
dataset, then exercise render (turntable + bev), export (meshes +
fg-motion.json), and reanimate (motion override) off the checkpoint."""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = [
    "--seqname", "appsim", "--logname", "e2e", "--fg_motion", "skel-quad",
    "--train_res", "64", "--use_cpu",
]


def run_cli(entry, args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "lab4d_tpu", entry)] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, f"{entry} failed:\n{res.stdout[-3000:]}\n{res.stderr[-3000:]}"
    return res


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from tests.synthetic import make_synthetic_dataset

    work = str(tmp_path_factory.mktemp("apps"))
    make_synthetic_dataset(
        f"{work}/database", seqname="appsim", num_vids=2, num_frames=8, res=64
    )
    run_cli(
        "train.py",
        COMMON + [
            "--num_rounds", "1", "--iters_per_round", "2", "--imgs_per_gpu",
            "2", "--pixels_per_image", "4", "--eval_res", "16",
            "--save_freq", "1", "--database_root", "database",
        ],
        work,
    )
    assert os.path.exists(f"{work}/logdir/appsim-e2e/ckpt_latest.flax")
    return work


@pytest.mark.slow
def test_render_turntable_and_bev(trained_run):
    work = trained_run
    for viewpoint in ("rot-0-360", "bev-30"):
        run_cli(
            "render.py",
            COMMON + [
                "--load_suffix", "latest", "--inst_id", "0", "--render_res",
                "16", "--viewpoint", viewpoint, "--num_frames", "2",
                "--database_root", "database",
            ],
            work,
        )
        out_dir = f"{work}/logdir/appsim-e2e/renderings_0000/{viewpoint}"
        pngs = glob.glob(f"{out_dir}/rgb-*.png")
        assert pngs, f"no rgb renders for {viewpoint}"


@pytest.mark.slow
def test_export_and_reanimate(trained_run):
    work = trained_run
    run_cli(
        "export.py",
        COMMON + [
            "--load_suffix", "latest", "--inst_id", "0",
            "--grid_size", "32", "--database_root", "database",
        ],
        work,
    )
    export_dir = f"{work}/logdir/appsim-e2e/export_0000"
    motion_path = f"{export_dir}/fg-motion.json"
    assert os.path.exists(motion_path), "no motion json exported"
    objs = glob.glob(f"{export_dir}/**/*.obj", recursive=True)
    assert objs, "no meshes exported"
    motion = json.load(open(motion_path))
    assert "field2cam" in motion
    assert "joint_so3" in motion or "t_articulation" in motion

    # reanimate: drive instance 1 with instance 0's exported motion
    run_cli(
        "export.py",
        COMMON + [
            "--load_suffix", "latest", "--inst_id", "1",
            "--grid_size", "32", "--database_root", "database",
        ],
        work,
    )
    run_cli(
        "reanimate.py",
        COMMON + [
            "--load_suffix", "latest", "--inst_id", "1", "--motion_id", "0",
            "--render_res", "16", "--num_frames", "2",
            "--database_root", "database",
        ],
        work,
    )
    outs = glob.glob(f"{work}/logdir/appsim-e2e/renderings_*/reanimate*/*.png") + \
        glob.glob(f"{work}/logdir/appsim-e2e/renderings_*/ref/*.png")
    assert outs, "reanimate produced no frames"
