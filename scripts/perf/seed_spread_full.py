"""Full-budget seed spread for the ours side of the PSNR comparison.

Same protocol as scripts/compare_reference_psnr.py run_ours at the
full_budget_400steps setting (81 frames, 20 rounds x 20 effective
iters, 64px, CPU), varying ONLY the host pixel-draw RNG stream.
Prints the final-round masked PSNR per seed.
"""
import os, sys, json
sys.path.insert(0, "/root/repo")
seed = int(sys.argv[1])
workdir = os.path.abspath(sys.argv[2])
os.makedirs(workdir, exist_ok=True)
from scripts.compare_reference_psnr import make_dataset, masked_psnr
make_dataset(workdir, "refcmp", 64, 81)
os.chdir(workdir)
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from absl import flags
from lab4d_tpu.config import get_config
from lab4d_tpu.engine.trainer import Trainer
flags.FLAGS(["t", "--seqname=refcmp", f"--logname=seed{seed}", "--fg_motion=rigid",
  "--field_type=fg", "--train_res=64", "--eval_res=32", "--num_rounds=20",
  "--iters_per_round=20", "--imgs_per_gpu=4", "--pixels_per_image=8",
  "--num_workers=0", "--save_freq=100", "--use_cpu", "--database_root=database"])
opts = get_config()
t = Trainer(opts)
t.trainloader.rng = np.random.default_rng(seed)  # vary only the pixel-draw stream
traj = []
for r in range(20):
    t.train_one_round(r); t.current_round += 1; t.update_geometry_aux()
    out, ref = t.render_frames(t.eval_fid, return_ref=True)
    traj.append(masked_psnr(out["rgb"], ref["rgb"], ref["mask"][..., 0]))
    print("SEED", seed, "round", r, round(traj[-1], 3), flush=True)
print("SEED", seed, json.dumps(traj), flush=True)
