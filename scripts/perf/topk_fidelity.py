"""Validate the K=8 weight-ranked eval against the exact every-sample
evaluation on a CONVERGED checkpoint (VERDICT r4 item 4: round-4's
accuracy evidence was a 2-round checkpoint only).

usage: python scripts/perf/topk_fidelity.py <workdir> <seqname> <logname> \
          [--frames 4] [--res 128] [--topk 8] [--cpu]
       (<workdir> contains database/ and logdir/<seqname>-<logname>/
        with ckpt_latest.flax + opts.log from a training run)

Prints one JSON line: rgb PSNR of topk=8 vs exact over rendered eval
frames (in-object pixels), mask agreement, depth median error, and each
path's PSNR vs GT.
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("seqname")
    ap.add_argument("logname")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--topk", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    os.chdir(os.path.abspath(args.workdir))
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    rundir = os.path.join("logdir", f"{args.seqname}-{args.logname}")
    from absl import flags

    import lab4d_tpu.config  # registers flags
    import lab4d_tpu.render  # noqa: F401  (render-only flags e.g. eval_topk)
    from lab4d_tpu.config import get_config

    # replay only the flags this binary registers (opts.log also snapshots
    # absl builtins like --nohelp that aren't defined outside app.run)
    known = set(flags.FLAGS._flags().keys())
    argv = ["topk_fidelity"]
    for line in open(f"{rundir}/opts.log"):
        line = line.strip()
        name = line.lstrip("-").split("=", 1)[0]
        if name.startswith("no") and name[2:] in known:
            argv.append(line)
        elif name in known:
            argv.append(line)
    argv += ["--load_suffix=latest", "--logname=" + args.logname,
             "--seqname=" + args.seqname]
    flags.FLAGS(argv)
    opts = get_config()
    opts["load_path"] = os.path.join(rundir, "ckpt_latest.flax")

    from lab4d_tpu.engine.trainer import Trainer

    trainer = Trainer(opts)

    fids = np.linspace(
        0, trainer.data_info["frame_info"].num_frames - 2, args.frames
    ).astype(int)

    def render(topk):
        if topk:
            os.environ["LAB4D_EVAL_TOPK"] = str(topk)
        else:
            os.environ.pop("LAB4D_EVAL_TOPK", None)
        if hasattr(trainer, "_eval_render"):
            del trainer._eval_render  # env is read at trace time
        return trainer.render_frames(fids, render_res=args.res,
                                     return_ref=True)

    exact, ref = render(0)
    approx, _ = render(args.topk)

    m = exact["mask"][..., 0] > 0.5
    err = float(np.mean((approx["rgb"][m] - exact["rgb"][m]) ** 2))
    psnr = -10 * np.log10(max(err, 1e-12))
    mask_err = float(np.abs(approx["mask"] - exact["mask"]).max())
    mi = exact["mask"][..., 0] > 0.9
    dmed = (
        float(np.median(np.abs(approx["depth"][mi] - exact["depth"][mi])))
        if mi.sum() else float("nan")
    )

    gtm = ref["mask"][..., 0] > 0.5

    def psnr_gt(pred):
        e = float(np.mean((pred["rgb"][gtm] - ref["rgb"][gtm]) ** 2))
        return -10 * np.log10(max(e, 1e-12))

    print(json.dumps({
        "metric": "topk_vs_exact_rgb_psnr_converged",
        "value": round(psnr, 2), "unit": "dB",
        "topk": args.topk, "frames": int(len(fids)), "res": args.res,
        "mask_max_abs_err": round(mask_err, 8),
        "depth_median_abs_err": round(dmed, 6),
        "exact_vs_gt_psnr": round(psnr_gt(exact), 2),
        "topk_vs_gt_psnr": round(psnr_gt(approx), 2),
    }))


if __name__ == "__main__":
    main()
