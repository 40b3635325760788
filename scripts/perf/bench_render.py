"""Time the merged-eval render path with hoisted jits (mirrors
render.render_batch's lax.map whole-frame dispatch, but warmup-able).
usage: python scripts/perf/bench_render.py <res> [chunk] [n_iters]
env: ABL_PYLOOP=1 -> python chunk loop instead of lax.map
"""
import sys, time, json, os
sys.path.insert(0, "/root/repo")
res = int(sys.argv[1])
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
pyloop = os.environ.get("ABL_PYLOOP", "0") == "1"

import numpy as np
import jax, jax.numpy as jnp

from lab4d_tpu.engine.schedules import compute_sched
from __graft_entry__ import _build

model, batch = _build(M=2, N=4, num_frames=16, fg_motion="skel-quad")
rngs = {"params": jax.random.PRNGKey(0), "aux": jax.random.PRNGKey(1),
        "swap": jax.random.PRNGKey(2)}
params = jax.jit(model.init, static_argnames=("train",))(
    rngs, batch, compute_sched(0), train=True)["params"]

from lab4d_tpu.utils.cam_traj import create_xy_grid
hxy = np.asarray(create_xy_grid(res))[None].astype(np.float32)
npix = hxy.shape[1]
eval_batch = {
    "dataid": jnp.zeros((1,), jnp.int32),
    "frameid_sub": jnp.zeros((1,), jnp.int32),
    "crop2raw": jnp.asarray([[1.0, 1.0, 0.0, 0.0]], jnp.float32),
    "geo": batch["geo"],
    "hxy": jnp.asarray(hxy[:, :chunk]),
}

@jax.jit
def prep_one(params, sub):
    return model.apply({"params": params}, sub,
                       method=model.prepare_eval_samples)

@jax.jit
def render_frame(params, samples, hxy_chunks):
    def body(hxy_c):
        samples_c = {cate: {**samples[cate], "hxy": hxy_c}
                     for cate in samples}
        return model.apply({"params": params}, samples_c, sched=None,
                           method=model.evaluate_rays)
    return jax.lax.map(body, hxy_chunks)

@jax.jit
def render_chunk(params, samples_c):
    return model.apply({"params": params}, samples_c, sched=None,
                       method=model.evaluate_rays)

csize = min(chunk, npix)
pad = (-npix) % csize
hxy_all = hxy
if pad:
    hxy_all = np.concatenate(
        [hxy_all, np.tile(hxy_all[:, -1:], (1, pad, 1))], axis=1)
n_chunks = (npix + pad) // csize
hxy_chunks = jnp.asarray(
    hxy_all.reshape(1, n_chunks, csize, 3).transpose(1, 0, 2, 3))

def one_frame():
    samples = prep_one(params, eval_batch)
    if pyloop:
        outs = []
        for c in range(n_chunks):
            samples_c = {cate: {**samples[cate], "hxy": hxy_chunks[c]}
                         for cate in samples}
            outs.append(render_chunk(params, samples_c))
        return float(outs[-1]["rgb"].ravel()[0])
    out = render_frame(params, samples, hxy_chunks)
    return float(out["rgb"].ravel()[0])

one_frame()  # compile
t0 = time.perf_counter()
for _ in range(n):
    one_frame()
dt = (time.perf_counter() - t0) / n
print(json.dumps({"res": res, "chunk": chunk, "pyloop": pyloop,
                  "ms_per_frame": round(dt * 1e3, 1),
                  "fps": round(1.0 / dt, 2),
                  "rays_per_sec": round(npix / dt)}))
