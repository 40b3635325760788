"""End-to-end preprocessing orchestrator: raw videos in
database/raw/<vidname>/ -> training-ready database/processed/** priors
(reference: scripts/run_preprocess.py).

  python scripts/run_preprocess.py <vidname> <text_prompt_seg> <obj_class> <devlist>
  e.g.    python scripts/run_preprocess.py cat-pikachu-0 cat quad "0"

obj_class in {human, quad, other}; "other" expects manual camera
annotations (Cameras/<seq>/01-manual.json — see
preprocess/scripts/manual_cameras.py).  Per-video stages fan out over
devices via lab4d_tpu.utils.device_map (the reference used per-GPU
process pinning; here workers pin JAX default devices / CPU processes).
"""

from __future__ import annotations

import configparser
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from lab4d_tpu.utils.device_map import device_map
from preprocess.backends.depth_backends import extract_depth
from preprocess.backends.seg_backends import run_segmentation
from preprocess.scripts.camera_registration import camera_registration
from preprocess.scripts.canonical_registration import canonical_registration
from preprocess.scripts.compute_flow import compute_flow
from preprocess.scripts.crop import extract_crop
from preprocess.scripts.extract_features import extract_features
from preprocess.scripts.extract_frames import extract_frames
from preprocess.scripts.frame_filter import frame_filter
from preprocess.scripts.write_config import write_config


def run_extract_frames(seqname, outdir, infile, use_filter_frames):
    raw_dir = f"{outdir}/JPEGImagesRaw/Full-Resolution/{seqname}"
    shutil.rmtree(raw_dir, ignore_errors=True)
    os.makedirs(raw_dir, exist_ok=True)
    extract_frames(infile, raw_dir)

    # clear stale per-sequence outputs
    for sub in ("JPEGImages", "Annotations", "Cameras", "Features", "Depth"):
        shutil.rmtree(
            f"{outdir}/{sub}/Full-Resolution/{seqname}", ignore_errors=True
        )
    for d in glob.glob(f"{outdir}/Flow*/Full-Resolution/{seqname}"):
        shutil.rmtree(d, ignore_errors=True)

    if use_filter_frames:
        frame_filter(seqname, outdir)
    else:
        out_dir = f"{outdir}/JPEGImages/Full-Resolution/{seqname}"
        os.makedirs(out_dir, exist_ok=True)
        for p in sorted(glob.glob(f"{raw_dir}/*.jpg")):
            shutil.copy(p, out_dir)


def run_extract_priors(seqname, outdir, obj_class):
    print("extracting priors:", seqname)
    for dframe in (1, 2, 4, 8):
        compute_flow(seqname, outdir, dframe)
    extract_depth(seqname, outdir)
    extract_crop(seqname, 256, 0, outdir)
    extract_crop(seqname, 256, 1, outdir)
    camera_registration(seqname, 0, outdir)
    camera_registration(seqname, 1, outdir)
    from preprocess.scripts.tsdf_fusion import tsdf_fusion

    tsdf_fusion(seqname, 0, outdir)
    canonical_registration(seqname, 256, obj_class, outdir=outdir)


def run_preprocess(
    vidname: str,
    text_prompt_seg: str,
    obj_class: str,
    devlist,
    database_root: str = "database",
    use_filter_frames: bool = True,
):
    assert obj_class in ("human", "quad", "other")
    outdir = f"{database_root}/processed"
    viddir = f"{database_root}/raw/{vidname}"

    if not os.path.isdir(viddir) or not os.listdir(viddir):
        from preprocess.scripts.download import download_seq

        download_seq(vidname, database_root)

    frame_args = []
    for counter, infile in enumerate(sorted(glob.glob(f"{viddir}/*"))):
        seqname = f"{vidname}-{counter:04d}"
        frame_args.append((seqname, outdir, infile, use_filter_frames))
    if not frame_args:
        raise FileNotFoundError(f"no raw videos under {viddir}")
    device_map(run_extract_frames, frame_args, devices=devlist)

    write_config(vidname, database_root)

    config = configparser.RawConfigParser()
    config.read(f"{database_root}/configs/{vidname}.config")
    seqnames = []
    for vidid in range(len(config.sections()) - 1):
        img_path = config.get(f"data_{vidid}", "img_path")
        seqnames.append(img_path.strip("/").split("/")[-1])

    device_map(
        run_segmentation,
        [(s, outdir, text_prompt_seg) for s in seqnames],
        devices=devlist,
    )

    if obj_class == "other":
        from preprocess.scripts.manual_cameras import ensure_manual_cameras

        ensure_manual_cameras(seqnames, outdir)

    device_map(
        run_extract_priors,
        [(s, outdir, obj_class) for s in seqnames],
        devices=devlist,
    )

    extract_features(vidname, 256, database_root=database_root)
    print(f"preprocessing done: {vidname}")


if __name__ == "__main__":
    if len(sys.argv) != 5:
        print(f"Usage: python {sys.argv[0]} <vidname> <text_prompt_seg> "
              "<obj_class: human|quad|other> <devlist e.g. '0,1'>")
        sys.exit(1)
    run_preprocess(
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        [int(x) for x in sys.argv[4].split(",")],
    )
