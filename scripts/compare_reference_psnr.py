"""Side-by-side PSNR: the reference PyTorch trainer (CPU) vs lab4d_tpu,
on the SAME synthetic scene (tests/synthetic.py writes the exact
database/processed/** layout the reference's vidloader consumes).

This is the behavioral half of reference parity (VERDICT round-3 missing
item 1): both trainers run a few low-res rounds end-to-end and report a
masked-foreground PSNR trajectory on the same eval frames.

usage:
  python scripts/compare_reference_psnr.py <workdir> \
      [--rounds 3] [--res 64] [--iters 50] [--which both|ref|ours]

Runs each framework in THIS process (the reference needs process-global
stubs from scripts/reference_runtime.py, so run ref and ours in separate
invocations — `--which both` forks subprocesses for isolation). Writes
<workdir>/psnr_compare.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def masked_psnr(pred_rgb, ref_rgb, ref_mask):
    """PSNR over pixels where the GT mask is on (the object region —
    background is empty in the synthetic scene)."""
    m = ref_mask.reshape(-1) > 0.5
    if m.sum() == 0:
        return float("nan")
    a = pred_rgb.reshape(-1, 3)[m]
    b = ref_rgb.reshape(-1, 3)[m]
    mse = float(np.mean((a - b) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def effective_iters(iters, frames, imgs_per_gpu=4):
    """Optimizer steps per round the REFERENCE actually executes: its
    train loader is length floor((frames-1)/imgs_per_gpu) with
    drop_last=True (ref data_utils.py:63-71, vidloader.py:160-161) and
    train_one_round breaks at min(iters_per_round, len(trainloader))
    (ref trainer.py:337-339). Both sides must run THIS many steps per
    round — and put it in the schedule horizon — or the comparison is
    step-asymmetric (round-4 ran ours at 20 iters/round vs ref's 3)."""
    return min(iters, max((frames - 1) // imgs_per_gpu, 1))


def make_dataset(workdir, seqname, res, num_frames):
    from tests.synthetic import make_synthetic_dataset

    db = os.path.join(workdir, "database")
    if not os.path.exists(os.path.join(db, "configs", f"{seqname}.config")):
        # feat_res=112: the reference's vidloader hardcodes 112x112
        # feature maps (lab4d/dataloader/vidloader.py:322-336)
        make_synthetic_dataset(
            db, seqname=seqname, num_vids=1, num_frames=num_frames, res=res,
            feat_res=112,
        )
    return db


def run_reference(workdir, seqname, rounds, res, iters, frames):
    """Train the reference for `rounds` rounds; PSNR after each round."""
    iters = effective_iters(iters, frames)
    os.chdir(workdir)
    from scripts.reference_runtime import import_reference_trainer

    Trainer, ref_config = import_reference_trainer()

    import torch

    # the reference never seeds; at short horizons (9 optimizer steps)
    # the PSNR trajectory varies by >5 dB run-to-run from pixel-draw
    # noise alone (measured: [18.0,18.0,19.1] vs [18.0,13.5,14.0] on
    # identical settings). Pin everything for a reproducible comparison.
    torch.manual_seed(0)
    np.random.seed(0)
    import random as _random

    _random.seed(0)

    from absl import flags

    argv = [
        "ref_train",
        f"--seqname={seqname}",
        "--logname=refcmp",
        "--fg_motion=rigid",
        "--field_type=fg",
        f"--train_res={res}",
        f"--eval_res={min(res, 32)}",
        # schedule horizon: clamped to >=3 on BOTH sides (pct_start =
        # 2/num_rounds must stay <1; ref trainer.py:191-210) — training
        # still runs exactly `rounds` rounds on both sides, so the LR
        # schedules are identical and only the executed prefix differs.
        f"--num_rounds={max(rounds, 3)}",
        f"--iters_per_round={iters}",
        "--imgs_per_gpu=4",
        "--pixels_per_image=8",
        "--num_workers=0",
        "--save_freq=100",
        "--logroot=logdir_ref/",
    ]
    flags.FLAGS(argv)
    opts = ref_config.get_config()

    trainer = Trainer(opts)
    trainer.init_model()  # prior-based init (intrinsics/cameras/geometry)

    import cv2

    def eval_psnr(dump=None):
        """Masked PSNR via the reference's own eval machinery (trainer
        load_batch + construct_eval_batch + model.evaluate), GT resized
        to eval_res — same metric lab4d_tpu logs as eval/psnr."""
        trainer.model.eval()
        ref_dict, batch = trainer.load_batch(
            trainer.evalloader.dataset, trainer.eval_fid
        )
        trainer.construct_eval_batch(batch)
        with torch.no_grad():
            rendered = trainer.model.evaluate(batch)
        pred = rendered["rgb"].detach().cpu().numpy()  # (M, h, w, 3)
        h, w = pred.shape[1:3]
        ref_rgb = np.stack(
            [cv2.resize(im.astype(np.float32), (w, h),
                        interpolation=cv2.INTER_AREA)
             for im in ref_dict["ref_rgb"]]
        )
        ref_mask = np.stack(
            [cv2.resize(
                m.astype(np.float32), (w, h),
                interpolation=cv2.INTER_NEAREST,
            ) for m in np.asarray(ref_dict["ref_mask"])[..., 0]]
        )
        if dump is not None:
            extra = {
                k: rendered[k].detach().cpu().numpy()
                for k in ("depth", "mask") if k in rendered
            }
            np.savez(dump, pred=pred, ref_rgb=ref_rgb, ref_mask=ref_mask,
                     **extra)
        return masked_psnr(pred, ref_rgb, ref_mask)

    if rounds == 0:
        # pure-init evaluation (the prior-driven initialization, zero
        # optimizer steps) + channel dump for init-parity diagnosis
        trainer.model.eval()
        with torch.no_grad():
            p = eval_psnr(dump=os.path.join(workdir, "init_ref.npz"))
        print(f"[ref] init: psnr={p:.2f}", flush=True)
        return [p]

    def diag():
        out = {}
        for k, v in trainer.model.named_parameters():
            lk = k.lower()
            if v.numel() <= 2 and ("beta" in lk or "scale" in lk):
                out[k] = [round(float(x), 4) for x in v.detach().flatten()]
        try:
            fld = trainer.model.fields.field_params["fg"]
            out["aabb"] = np.asarray(
                fld.aabb.detach().cpu()
            ).round(3).tolist()
            out["proxy_bounds"] = np.asarray(
                fld.proxy_geometry.bounds
            ).round(3).tolist()
        except Exception as e:
            out["aabb_err"] = str(e)
        return out

    traj = []
    for r in range(rounds):
        trainer.model.train()
        trainer.train_one_round(r)
        trainer.model.eval()
        trainer.model.update_geometry_aux()
        with torch.no_grad():
            p = eval_psnr()
        traj.append(p)
        print(f"[ref] round {r}: psnr={p:.2f} diag={diag()}", flush=True)

    # canonical mesh in WORLD units (canonical verts / exp(logscale)),
    # for the mesh-extraction-parity half of the comparison
    fld = trainer.model.fields.field_params["fg"]
    mesh = fld.extract_canonical_mesh(grid_size=64, level=0.0,
                                      use_visibility=False,
                                      use_extend_aabb=True)
    scale = float(fld.logscale.exp())
    mesh.vertices = np.asarray(mesh.vertices) / scale
    mesh.export(os.path.join(workdir, "mesh_ref.obj"))
    return traj


def run_ours(workdir, seqname, rounds, res, iters, frames):
    iters = effective_iters(iters, frames)
    os.chdir(workdir)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from lab4d_tpu.config import get_config
    from lab4d_tpu.engine.trainer import Trainer

    from absl import flags

    argv = [
        "train",
        f"--seqname={seqname}",
        "--logname=ourscmp",
        "--fg_motion=rigid",
        "--field_type=fg",
        f"--train_res={res}",
        f"--eval_res={min(res, 32)}",
        f"--num_rounds={max(rounds, 3)}",  # same clamp as the ref side
        f"--iters_per_round={iters}",
        "--imgs_per_gpu=4",
        "--pixels_per_image=8",
        "--num_workers=0",
        "--save_freq=100",
        "--use_cpu",
        "--database_root=database",
    ]
    flags.FLAGS(argv)
    opts = get_config()
    trainer = Trainer(opts)

    # drive rounds manually and compute the SAME masked PSNR as the
    # reference side (train first, then eval — the trainer's own logging
    # evals before each round)
    import jax.tree_util as tu

    def diag():
        out = {}
        for path, v in tu.tree_leaves_with_path(trainer.params):
            k = tu.keystr(path).lower()
            if np.size(v) <= 2 and ("beta" in k or "scale" in k):
                out[tu.keystr(path)] = [
                    round(float(x), 4) for x in np.asarray(v).flatten()
                ]
        try:
            g = trainer.geo_state["fg"]
            out["aabb"] = np.asarray(g["aabb"]).round(3).tolist()
            out["proxy_bounds"] = np.asarray(
                trainer.proxy["fg"].bounds
            ).round(3).tolist()
        except Exception as e:
            out["aabb_err"] = str(e)
        return out

    if rounds == 0:
        out, ref = trainer.render_frames(trainer.eval_fid, return_ref=True)
        p = masked_psnr(out["rgb"], ref["rgb"], ref["mask"][..., 0])
        np.savez(
            os.path.join(workdir, "init_ours.npz"),
            pred=np.asarray(out["rgb"]), ref_rgb=np.asarray(ref["rgb"]),
            ref_mask=np.asarray(ref["mask"][..., 0]),
            depth=np.asarray(out.get("depth")),
            mask=np.asarray(out.get("mask")),
        )
        print(f"[ours] init: psnr={p:.2f}", flush=True)
        return [p]

    traj = []
    for r in range(rounds):
        trainer.train_one_round(r)
        trainer.current_round += 1
        trainer.update_geometry_aux()
        out, ref = trainer.render_frames(trainer.eval_fid, return_ref=True)
        p = masked_psnr(out["rgb"], ref["rgb"], ref["mask"][..., 0])
        traj.append(p)
        print(f"[ours] round {r}: psnr={p:.2f} diag={diag()}", flush=True)
    print(f"[ours] psnr trajectory: {traj}", flush=True)

    # canonical mesh in WORLD units — same symmetric settings as the ref
    # side (grid 64, level 0, no visibility mask, extended aabb)
    mesh = trainer.extract_canonical_mesh(
        "fg", grid_size=64, level=0.0, use_visibility=False,
        use_extend_aabb=True,
    )
    # the FIELD's logscale specifically — skeleton configs carry a second
    # logscale leaf under the articulation MLP (init 0), and a fuzzy
    # match would silently pick it and corrupt the mesh scale
    logscale = np.asarray(
        trainer.params["fields"]["field_params_fg"]["logscale"]
    )
    mesh.vertices = np.asarray(mesh.vertices) / float(np.exp(logscale))
    mesh.export(os.path.join(workdir, "mesh_ours.obj"))
    return traj


def compare_meshes(workdir):
    """Mesh-extraction parity: chamfer/f-score between the two exported
    world-unit canonical meshes, and each vs the GT sphere (radius 0.5,
    tests/synthetic.py render_sphere_frame). Ref meshes come from the
    same export settings as lab4d/export.py:174-178 (no visibility
    mask, level 0)."""
    from lab4d_tpu.meshlib import load_obj, uv_sphere
    from lab4d_tpu.utils.metrics import chamfer_distance, fscore

    ref = load_obj(os.path.join(workdir, "mesh_ref.obj"))
    ours = load_obj(os.path.join(workdir, "mesh_ours.obj"))
    gt = uv_sphere(radius=0.5, count=[32, 32])
    return {
        "chamfer_ours_vs_ref": chamfer_distance(ours, ref),
        "fscore_ours_vs_ref": fscore(ours, ref, threshold=0.05),
        "chamfer_ours_vs_gt": chamfer_distance(ours, gt),
        "chamfer_ref_vs_gt": chamfer_distance(ref, gt),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--seqname", default="refcmp")
    ap.add_argument("--which", default="both",
                    choices=["both", "ref", "ours"])
    args = ap.parse_args()

    # absolute: the dataset config embeds img_path as given, and both
    # runners chdir(workdir) — a relative workdir would break those paths
    args.workdir = os.path.abspath(args.workdir)
    os.makedirs(args.workdir, exist_ok=True)
    make_dataset(args.workdir, args.seqname, args.res, args.frames)

    if args.which == "both":
        # run each side in its own process (the reference installs
        # process-global stubs/patches)
        out = {
            "settings": {
                "rounds": args.rounds, "res": args.res,
                "iters_requested": args.iters,
                "iters_effective": effective_iters(args.iters, args.frames),
                "frames": args.frames, "seqname": args.seqname,
            }
        }
        for which in ("ref", "ours"):
            cmd = [
                sys.executable, os.path.abspath(__file__), args.workdir,
                f"--rounds={args.rounds}", f"--res={args.res}",
                f"--iters={args.iters}", f"--frames={args.frames}",
                f"--seqname={args.seqname}", f"--which={which}",
            ]
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=28800)
            sys.stdout.write(r.stdout[-4000:])
            if r.returncode != 0:
                sys.stderr.write(r.stderr[-6000:])
                raise SystemExit(f"{which} run failed")
            part = json.load(
                open(os.path.join(args.workdir, f"psnr_{which}.json"))
            )
            out[which] = part
        out["psnr_delta_final"] = out["ours"][-1] - out["ref"][-1]
        if args.rounds > 0:  # rounds=0 is init-only, no meshes exported
            out["mesh"] = compare_meshes(args.workdir)
        path = os.path.join(args.workdir, "psnr_compare.json")
        json.dump(out, open(path, "w"), indent=1)
        print(json.dumps(out))
        return

    if args.which == "ref":
        traj = run_reference(args.workdir, args.seqname, args.rounds,
                             args.res, args.iters, args.frames)
    else:
        traj = run_ours(args.workdir, args.seqname, args.rounds, args.res,
                        args.iters, args.frames)
    json.dump(traj, open(
        os.path.join(args.workdir, f"psnr_{args.which}.json"), "w"))


if __name__ == "__main__":
    main()
