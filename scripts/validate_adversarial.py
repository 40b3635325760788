"""Adversarial-scene validation run (VERDICT round-1 item 6).

This environment has zero egress, so no reference sequence can be
downloaded; instead this drives the full train CLI on the adversarial
synthetic scene (tests/synthetic_adversarial.py: articulated fast-moving
textured object with occlusions and noisy camera priors) at the
reference's flagship configuration (skel-quad, 20 rounds x 200 iters,
4096 rays/iter, 256 px data) and reports final PSNR + wall-clock for
docs/performance.md.

Usage:
    python scripts/validate_adversarial.py [--workdir DIR] [--cpu]
        [--rounds N] [--res R] [--frames F]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/adversarial_val")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rounds", type=int, default=20)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--fg_motion", default="skel-quad")
    args = ap.parse_args()

    from tests.synthetic_adversarial import make_adversarial_dataset

    work = args.workdir
    os.makedirs(work, exist_ok=True)
    data_root = f"{work}/database"
    marker = f"{data_root}/.generated-{args.res}-{args.frames}"
    if not os.path.exists(marker):
        print(f"generating adversarial dataset at {args.res}px...")
        make_adversarial_dataset(
            data_root,
            num_frames=args.frames,
            res=args.res,
            feat_res=112 if args.res >= 224 else args.res // 4,
        )
        open(marker, "w").close()

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [
        sys.executable, os.path.join(REPO, "lab4d_tpu", "train.py"),
        "--seqname", "adversarial", "--logname", f"val-{args.fg_motion}",
        "--fg_motion", args.fg_motion,
        "--train_res", str(args.res),
        "--num_rounds", str(args.rounds),
        "--database_root", "database",
    ]
    if args.cpu:
        cmd += [
            "--use_cpu", "--iters_per_round", "20", "--imgs_per_gpu", "8",
            "--eval_res", "64",
        ]
    t0 = time.time()
    res = subprocess.run(cmd, cwd=work, env=env)
    wall = time.time() - t0
    if res.returncode != 0:
        print(f"TRAIN FAILED rc={res.returncode}")
        sys.exit(1)

    metrics = f"{work}/logdir/adversarial-val-{args.fg_motion}/metrics.jsonl"
    psnrs, ssims = [], []
    with open(metrics) as f:
        for line in f:
            rec = json.loads(line)
            if "eval/psnr" in rec:
                psnrs.append(rec["eval/psnr"])
            if "eval/ssim" in rec:
                ssims.append(rec["eval/ssim"])
    print(json.dumps({
        "scene": "adversarial (articulated+textured+occlusions+noisy cams)",
        "fg_motion": args.fg_motion,
        "rounds": args.rounds,
        "res": args.res,
        "wall_clock_min": round(wall / 60, 2),
        "psnr_first": round(psnrs[0], 2) if psnrs else None,
        "psnr_best": round(max(psnrs), 2) if psnrs else None,
        "psnr_final": round(psnrs[-1], 2) if psnrs else None,
        "ssim_final": round(ssims[-1], 3) if ssims else None,
    }))


if __name__ == "__main__":
    main()
