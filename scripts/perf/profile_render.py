"""Capture a jax.profiler trace of the merged-eval render path on the
real TPU and print the per-op device-time breakdown.

usage: python scripts/perf/profile_render.py [res] [chunk] [out_dir]
"""
import sys, os, glob, collections
sys.path.insert(0, "/root/repo")

res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 512
out_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/lab4d_render_trace"

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

csize = min(chunk, npix)
pad = (-npix) % csize
hxy_all = hxy
if pad:
    hxy_all = np.concatenate(
        [hxy_all, np.tile(hxy_all[:, -1:], (1, pad, 1))], axis=1)
hxy_chunks = jnp.asarray(
    hxy_all.reshape(1, -1, csize, 3).swapaxes(0, 1))

samples = prep_one(params, eval_batch)
out = render_frame(params, samples, hxy_chunks)
_ = float(jax.tree.leaves(out)[0].sum())  # warm up + fence

with jax.profiler.trace(out_dir):
    for _ in range(2):
        out = render_frame(params, samples, hxy_chunks)
    _ = float(jax.tree.leaves(out)[0].sum())

# ---- parse the xplane proto: aggregate per-op device time
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                         recursive=True))
assert paths, f"no xplane under {out_dir}"
xs = xplane_pb2.XSpace()
with open(paths[-1], "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    ev_meta = plane.event_metadata
    stats = collections.Counter()
    counts = collections.Counter()
    for line in plane.lines:
        if "XLA Ops" not in line.name:
            continue
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            stats[name] += ev.duration_ps / 1e9  # ms
            counts[name] += 1
    tot = sum(stats.values())
    print(f"== plane: {plane.name}  XLA-Ops total {tot:.2f} ms over capture")
    for name, ms in stats.most_common(50):
        print(f"  {ms:9.3f} ms  x{counts[name]:<5d} {name[:150]}")
