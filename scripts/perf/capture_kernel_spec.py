"""Phase 1 (CPU): capture the exact fused_nerf_heads call spec from one
training forward; writes /tmp/lab4d_kernel_spec.pkl."""
import pickle
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import lab4d_tpu.ops.field_kernel as fk

captured = {}
orig = fk.fused_nerf_heads


def spy(x, dir_extra, appr_rows, win_b, win_c, nets, ibeta, cfg, spp):
    if "cfg" not in captured:
        captured["cfg"] = tuple(cfg)
        captured["spp"] = spp
        captured["x"] = x.shape
        captured["dir_extra"] = None if dir_extra is None else dir_extra.shape
        captured["appr_rows"] = None if appr_rows is None else appr_rows.shape
        captured["win_b"] = None if win_b is None else win_b.shape
        captured["win_c"] = None if win_c is None else win_c.shape
        captured["nets"] = {
            k: [tuple(a.shape) for a in v] for k, v in nets.items()
        }
    return orig(x, dir_extra, appr_rows, win_b, win_c, nets, ibeta, cfg, spp)


fk.fused_nerf_heads = spy
import lab4d_tpu.nnutils.feature as feat_mod

# feature.py imports the symbol inside the function each call -> patching
# the module attr is enough

import os
os.environ["LAB4D_FUSED_MLP"] = "1"
# force the fused path probe on cpu
import lab4d_tpu.nnutils.base as base_mod

base_mod._FUSED = True if hasattr(base_mod, "_FUSED") else None
orig_enabled = base_mod._fused_enabled
base_mod._fused_enabled = lambda: True

from __graft_entry__ import _build
from lab4d_tpu.engine.schedules import compute_sched

model, batch = _build(M=128, N=16, num_frames=64, fg_motion="skel-quad")
rngs = {"params": jax.random.PRNGKey(0), "aux": jax.random.PRNGKey(1),
        "swap": jax.random.PRNGKey(2)}
sched = compute_sched(0)
with jax.disable_jit():
    # abstract eval only: trace the forward to capture shapes without
    # running the (slow) interpret-mode kernel
    pass

params = jax.jit(model.init, static_argnames=("train",))(
    rngs, batch, sched, train=True)
print("captured:", {k: v for k, v in captured.items() if k != "nets"})
print("nets:", captured["nets"])
with open("/tmp/lab4d_kernel_spec.pkl", "wb") as f:
    pickle.dump(captured, f)
print("OK")
