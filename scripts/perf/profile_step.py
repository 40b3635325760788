"""Capture a jax.profiler trace of the full train step on the real TPU
and print the per-op device-time breakdown (top fusions by total time).

usage: python scripts/perf/profile_step.py [out_dir]
"""
import sys, os, glob, time, collections
sys.path.insert(0, "/root/repo")

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lab4d_trace"

import jax, jax.numpy as jnp
import optax

from lab4d_tpu.engine.schedules import compute_sched
from __graft_entry__ import _build

model, batch = _build(M=128, N=16, num_frames=64, fg_motion="skel-quad")
rngs = {"params": jax.random.PRNGKey(0), "aux": jax.random.PRNGKey(1),
        "swap": jax.random.PRNGKey(2)}
sched = compute_sched(0)
params = jax.jit(model.init, static_argnames=("train",))(
    rngs, batch, sched, train=True)["params"]
from lab4d_tpu.engine.trainer import clip_with_norm
tx = optax.chain(
    clip_with_norm(5.0),
    optax.adamw(5e-4, b1=0.9, b2=0.999, weight_decay=1e-4),
)
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

with jax.profiler.trace(out_dir):
    for i in range(10):
        params, opt_state, loss = step_fn(params, opt_state, batch, float(i),
                                          jax.random.PRNGKey(i))
    _ = float(loss)

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
        # only XLA Ops / XLA Modules / Steps lines carry per-fusion
        # timings; other plane lines would double-count device time
        if "XLA Ops" not in line.name and "XLA TraceMe" not in line.name \
                and line.name != "Steps" and "XLA Modules" not in line.name:
            continue
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            stats[(line.name, name)] += ev.duration_ps / 1e9  # ms
            counts[(line.name, name)] += 1
    print(f"== plane: {plane.name}")
    by_line = collections.defaultdict(list)
    for (ln, name), ms in stats.items():
        by_line[ln].append((ms, name, counts[(ln, name)]))
    for ln, items in by_line.items():
        tot = sum(ms for ms, _, _ in items)
        print(f"-- line: {ln} (total {tot:.2f} ms over capture)")
        for ms, name, c in sorted(items, reverse=True)[:40]:
            print(f"  {ms:9.3f} ms  x{c:<4d} {name[:140]}")
