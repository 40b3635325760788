"""Phase 2 (TPU): time fused_nerf_heads fwd and fwd+bwd standalone from
the captured spec. usage: python scripts/perf/bench_field_kernel.py [fwd|bwd]"""
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
mode = sys.argv[1] if len(sys.argv) > 1 else "bwd"

import numpy as np
import jax
import jax.numpy as jnp

from lab4d_tpu.ops.field_kernel import FieldCfg, fused_nerf_heads

with open("/tmp/lab4d_kernel_spec.pkl", "rb") as f:
    spec = pickle.load(f)

cfg = FieldCfg(*spec["cfg"])
spp = spec["spp"]
rng = np.random.default_rng(0)


def arr(shape, scale=0.2):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


x = arr(spec["x"], 0.3)
appr = arr(spec["appr_rows"], 0.3)
win_b = jnp.clip(jnp.linspace(1.2, 0.2, spec["win_b"][0]), 0, 1)
win_c = jnp.clip(jnp.linspace(1.2, 0.2, spec["win_c"][0]), 0, 1)
nets = {k: [arr(s, 0.2 if len(s) == 2 and s[0] > 1 else 0.02) for s in v]
        for k, v in spec["nets"].items()}
ibeta = jnp.full((1, 1), 20.0)

P = x.shape[0]


def fwd(x, appr, nets, ibeta):
    outs = fused_nerf_heads(x, None, appr, win_b, win_c, nets, ibeta,
                            cfg, spp)
    return sum(o.sum() for o in outs)


if mode == "fwd":
    fn = jax.jit(fwd)
else:
    fn = jax.jit(jax.grad(fwd, argnums=(0, 2)))

out = fn(x, appr, nets, ibeta)
jax.tree.map(lambda a: a.block_until_ready(), out)
# fence via readback (block_until_ready unreliable under axon)
_ = float(jax.tree.leaves(out)[0].ravel()[0])

iters = 20
t0 = time.perf_counter()
for _ in range(iters):
    out = fn(x, appr, nets, ibeta)
_ = float(jax.tree.leaves(out)[0].ravel()[0])
dt = (time.perf_counter() - t0) / iters
import json, os
print(json.dumps({
    "mode": mode, "P": P,
    "bf16": os.environ.get("LAB4D_KERNEL_BF16", "0"),
    "tile": os.environ.get("LAB4D_MAX_TILE", "2048"),
    "tile_bwd": os.environ.get("LAB4D_MAX_TILE_BWD", "512"),
    "ms": round(dt * 1e3, 2),
    "Mpts_per_s": round(P / dt / 1e6, 1),
}))
