"""Train-step ablation bench on the real TPU: time the full jitted step
with individual stages stubbed out (patched pre-trace) to locate cost.

usage: python scripts/perf/bench_step_ablation.py <variant>
variants: full nojac noflow nocyc nowarp nofeat nointr
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
variant = sys.argv[1]

import numpy as np
import jax, jax.numpy as jnp
import optax

import lab4d_tpu.nnutils.nerf as nerf_mod
import lab4d_tpu.nnutils.deformable as deform_mod
import lab4d_tpu.nnutils.warping as warp_mod

if variant == "nojac":
    def _nojac(self, xyz, xyz_cam, dir_cam, field2cam, frame_id, inst_id,
               samples_dict, sched, train):
        return {"eikonal": jnp.zeros(xyz.shape[:-1] + (1,), xyz.dtype)}
    nerf_mod.NeRF.compute_jacobian = _nojac
elif variant == "noflow":
    def _noflow(self, hxy, xyz, frame_id, inst_id, field2cam, Kinv,
                samples_dict, flow_thresh=None):
        return {"flow": jnp.zeros(xyz.shape[:-1] + (2,), xyz.dtype)}
    nerf_mod.NeRF.compute_flow = _noflow
    if hasattr(deform_mod.Deformable, "compute_flow"):
        deform_mod.Deformable.compute_flow = _noflow
elif variant == "nocyc":
    def _nocyc(self, xyz, xyz_t, frame_id, inst_id, samples_dict=None,
               train=True):
        z = jnp.zeros(xyz.shape[:-1] + (1,), xyz.dtype)
        return {"cyc_dist": z, "skin_entropy": z, "delta_skin": z}
    nerf_mod.NeRF.cycle_loss = _nocyc
    deform_mod.Deformable.cycle_loss = _nocyc
elif variant == "nowarp":
    # skinning warp becomes identity: measures DQ-skinning + delta-MLP cost
    def _idwarp(self, xyz, frame_id, inst_id, backward=False,
                samples_dict=None, sched=None, train=True):
        z = jnp.zeros(xyz.shape[:-1] + (1,), xyz.dtype)
        return xyz, {"skin_entropy": z, "delta_skin": z}
    warp_mod.SkinningWarp.__call__ = _idwarp
elif variant == "noheads":
    # constant-ish heads: measures everything EXCEPT the field megakernel
    import lab4d_tpu.nnutils.feature as feat_mod
    def _cheap(self, xyz, dir, frame_id, inst_id, sched, train):
        s = jnp.tanh(xyz.sum(-1, keepdims=True))
        d = jax.nn.sigmoid(s)
        return {"density": d, f"density_{self.category}": d,
                "rgb": jax.nn.sigmoid(xyz),
                "vis": s,
                "feature": jnp.tanh(jnp.concatenate([xyz]*6, -1)[..., :16])}
    feat_mod.FeatureNeRF.query_all_heads = _cheap
elif variant == "nofeat":
    import lab4d_tpu.nnutils.feature as feat_mod
    def _nomatch(self, feat_px, feat_canonical, xyz_canonical,
                 num_candidates=1024):
        return jnp.zeros(feat_px.shape[:-1] + (3,), feat_px.dtype)
    feat_mod.FeatureNeRF.global_match = _nomatch

from lab4d_tpu.engine.schedules import compute_sched
from __graft_entry__ import _build

import os
imgs = int(os.environ.get("ABL_IMGS", 128)); px = int(os.environ.get("ABL_PX", 16))
model, batch = _build(M=imgs, N=px, num_frames=64, fg_motion="skel-quad")
rays = imgs * 2 * px
rngs = {"params": jax.random.PRNGKey(0), "aux": jax.random.PRNGKey(1),
        "swap": jax.random.PRNGKey(2)}
sched = compute_sched(0)
params = jax.jit(model.init, static_argnames=("train",))(
    rngs, batch, sched, train=True)["params"]
tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(5e-4, weight_decay=1e-4))
opt_state = tx.init(params)

def train_step(params, opt_state, batch, step, rng):
    sched = compute_sched(step)
    r_aux, r_swap = jax.random.split(rng)
    def loss_fn(p):
        loss_dict = model.apply({"params": p}, batch, sched, train=True,
                                rngs={"aux": r_aux, "swap": r_swap})
        return sum(jax.tree.leaves(loss_dict))
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss

step_fn = jax.jit(train_step, donate_argnums=(0, 1))
for i in range(3):
    params, opt_state, loss = step_fn(params, opt_state, batch, float(i),
                                      jax.random.PRNGKey(i))
_ = float(loss)
iters = 30
t0 = time.perf_counter()
for i in range(iters):
    params, opt_state, loss = step_fn(params, opt_state, batch, float(i),
                                      jax.random.PRNGKey(i))
_ = float(loss)
dt = (time.perf_counter() - t0) / iters
print(json.dumps({"variant": variant, "ms_per_step": round(dt * 1e3, 2),
                  "rays_per_sec": round(rays / dt)}))
