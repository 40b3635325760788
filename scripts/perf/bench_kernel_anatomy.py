"""Anatomy bench: where does the field megakernel's forward time go?

Builds stripped pallas kernels with the same tile/grid structure and the
real layer shapes (skel-quad cfg from /tmp/lab4d_kernel_spec.pkl) and times:
  mm      - just the matmul chain (base+color+rgb+vis+feat MLPs)
  mm+emb  - plus sincos table + embed concats
  full    - plus final elementwise (density/sigmoid/norm) ~ real fwd
  mmpure  - SAME total matmul K-budget but pure 128-wide layers:
            no skips, no concats, no odd K (isolates concat/layout cost)
  mmwide  - mm but with a (tile,128) output (isolates narrow-out cost)
usage: python scripts/perf/bench_kernel_anatomy.py [mm|emb|full|mmpure|mmwide|...bf16] [tile]
"""
import pickle
import sys
import time
import json

sys.path.insert(0, "/root/repo")
mode = sys.argv[1] if len(sys.argv) > 1 else "mm"
tile = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lab4d_tpu.ops.field_kernel import FieldCfg, _sincos, _embed
from lab4d_tpu.ops.mlp_kernel import _dot

with open("/tmp/lab4d_kernel_spec.pkl", "rb") as f:
    spec = pickle.load(f)
cfg = FieldCfg(*spec["cfg"])
rng = np.random.default_rng(0)


def arr(shape, scale=0.2):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


P = spec["x"][0]
x = arr(spec["x"], 0.3)
nets = {k: [arr(s, 0.2 if len(s) == 2 and s[0] > 1 else 0.02) for s in v]
        for k, v in spec["nets"].items()}
import os as _o
if _o.environ.get("KANAT_BF16_WEIGHTS", "0") == "1" or (len(sys.argv) > 1 and sys.argv[1].endswith("bf16")):
    nets = {k: [a.astype(jnp.bfloat16) for a in v] for k, v in nets.items()}
fcol = jnp.asarray(
    np.concatenate([2.0 ** np.arange(len(cfg.freqs) and 0 or 0)]) if False
    else np.tile(np.repeat(2.0 ** np.arange(10), 1), 3)[None, :30].astype(np.float32)
)
# frequency columns: (1, 3F) like the real kernel
F = max(cfg.nf_base, cfg.nf_color, cfg.nf_vis, cfg.nf_feat)
fcol = jnp.asarray(np.tile(2.0 ** np.arange(F), 3)[None].astype(np.float32))

flat_wb = []
wb_shapes = {}
for k, v in nets.items():
    wb_shapes[k] = [tuple(a.shape) for a in v]
    flat_wb += list(v)


BF16_CHAIN = mode.endswith("bf16")


def _dotc(a, b, out_dtype):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=out_dtype)


def mlp_chain(h, wb, skips):
    n = len(wb) // 2
    h0 = h
    for i in range(n):
        if i in skips:
            h = jnp.concatenate([h0, h], axis=-1)
        if BF16_CHAIN:
            # weights already bf16; bf16 operands, f32 accum/out (Mosaic
            # requires 32-bit acc), cast back to bf16 after the relu
            h = _dotc(h.astype(jnp.bfloat16), wb[2 * i], jnp.float32) \
                + wb[2 * i + 1].astype(jnp.float32)
        else:
            h = _dot(h, wb[2 * i]) + wb[2 * i + 1]
        if i < n - 1:
            h = jnp.maximum(h, jnp.zeros((), h.dtype))
    return h.astype(jnp.float32)


def body(x_ref, fcol_ref, *rest):
    wb_refs = rest[:-1]
    out_ref = rest[-1]
    xs = x_ref[:]
    wb = [r[:] for r in wb_refs]
    # unflatten
    netd, off = {}, 0
    for k in nets:
        cnt = len(wb_shapes[k])
        netd[k] = wb[off : off + cnt]
        off += cnt

    if BF16_CHAIN:
        xs = xs.astype(jnp.bfloat16)
    if mode.startswith("mmpure"):
        # same K-sum as the real chain (~766+331+590+... contractions of
        # K<=191) expressed as 15 pure (128,128) layers: K budget
        # 766+128+331+224+128+590+128 ~= 2295 -> 18 layers of K=128
        h = jnp.concatenate([xs] * 43, -1)[:, :128]
        w = wb[2]  # any (128,128) weight
        for _ in range(18):
            h = jnp.maximum(_dot(h, w), 0.0)
        out_ref[:] = h[:, :1]
        return
    if mode.startswith("mm"):
        # pad x to the real embed widths with broadcasted copies (same
        # matmul shapes, no sincos/concat work)
        C = xs.shape[1]
        nb = 3 + 2 * C * cfg.nf_base
        Xb = jnp.concatenate([xs] * ((nb + C - 1) // C), -1)[:, :nb]
        nc = 3 + 2 * C * cfg.nf_color
        Xc = jnp.concatenate([xs] * ((nc + C - 1) // C), -1)[:, :nc]
        nv = 3 + 2 * C * cfg.nf_vis
        Xv = jnp.concatenate([xs] * ((nv + C - 1) // C), -1)[:, :nv]
        nf = 3 + 2 * C * cfg.nf_feat
        Xf = jnp.concatenate([xs] * ((nf + C - 1) // C), -1)[:, :nf]
    else:
        ang, sin_t, cos_t = _sincos(xs, fcol_ref[:])
        Xb = _embed(xs, sin_t, cos_t, cfg.nf_base, None)
        Xc = _embed(xs, sin_t, cos_t, cfg.nf_color, None)
        Xv = _embed(xs, sin_t, cos_t, cfg.nf_vis, None)
        Xf = _embed(xs, sin_t, cos_t, cfg.nf_feat, None)

    feat = mlp_chain(Xb, netd["base"], cfg.skips_base)
    feat = jnp.maximum(feat, 0.0)
    sdf = _dot(feat.astype(netd["sdf"][0].dtype), netd["sdf"][0]).astype(jnp.float32) + netd["sdf"][1].astype(jnp.float32)
    featc = mlp_chain(Xc, netd["color"], cfg.skips_color)
    hc = feat + jnp.maximum(featc, 0.0)
    rgb_h = jnp.maximum(
        _dot(hc.astype(netd["rgb1"][0].dtype), netd["rgb1"][0][: hc.shape[1]]).astype(jnp.float32)
        + netd["rgb1"][1].astype(jnp.float32), 0.0)
    rgb = _dot(rgb_h.astype(netd["rgb2"][0].dtype), netd["rgb2"][0]).astype(jnp.float32) + netd["rgb2"][1].astype(jnp.float32)
    vis = mlp_chain(Xv, netd["vis"], cfg.skips_vis)
    f16 = mlp_chain(Xf, netd["feat"], cfg.skips_feat)

    if mode == "full":
        ib = 20.0
        density = (0.5 + 0.5 * jnp.sign(sdf) * (jnp.exp(-jnp.abs(sdf) * ib) - 1.0)) * ib
        rgb = jax.nn.sigmoid(rgb)
        fn = jnp.sqrt(jnp.sum(f16 * f16, -1, keepdims=True) + 1e-12)
        f16 = f16 / jnp.maximum(fn, 1e-6)
        sdf = density

    if mode.startswith("mmwide"):
        out_ref[:] = jnp.broadcast_to(
            sdf + rgb[:, :1] + vis[:, :1] + jnp.sum(f16, -1, keepdims=True),
            (sdf.shape[0], 128),
        )
    else:
        out_ref[:] = (
            sdf + rgb[:, :1] + vis[:, :1] + jnp.sum(f16, -1, keepdims=True)
        )


grid = (P // tile,)
in_specs = [
    pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    pl.BlockSpec(fcol.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
]
args = [x, fcol]
for a in flat_wb:
    a2 = a if a.ndim == 2 else a.reshape(1, -1)
    in_specs.append(pl.BlockSpec(a2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    args.append(a2)

fn = pl.pallas_call(
    body,
    grid=grid,
    in_specs=in_specs,
    out_specs=pl.BlockSpec(
        (tile, 128 if mode.startswith("mmwide") else 1), lambda i: (i, 0),
        memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct(
        (P, 128 if mode.startswith("mmwide") else 1), jnp.float32),
    interpret=jax.default_backend() != "tpu",
)
jfn = jax.jit(fn)
out = jfn(*args)
_ = float(out.ravel()[0])
iters = 20
t0 = time.perf_counter()
for _ in range(iters):
    out = jfn(*args)
_ = float(out.ravel()[0])
dt = (time.perf_counter() - t0) / iters
print(json.dumps({"mode": mode, "tile": tile, "P": P,
                  "ms": round(dt * 1e3, 2),
                  "Mpts_per_s": round(P / dt / 1e6, 1)}))
