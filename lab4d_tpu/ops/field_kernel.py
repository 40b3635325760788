"""Pallas TPU megakernel: all per-point NeRF field heads in one pass.

One kernel evaluates, per point tile, everything nerf.NeRF derives from a
canonical point (nerf.py:167-215 + visibility + feature field):

    sincos table (union of all frequency bands, computed once)
      -> basefield MLP -> sdf head
      -> colorfield MLP -> (+ base feat) -> rgb head (dir/appearance cond)
      -> visibility MLP
      -> feature MLP (16-d descriptor)

emitted as four outputs (density (P,1), rgb (P,3), vis (P,1),
feat (P,16)) so each reshapes to its (M,N,D,C) consumer shape as a free
bitcast — a packed (P,24) output costs ~3.5 ms/step of slice/pad copies
downstream. Replaces 4 fused-MLP kernel launches + XLA head/concat glue,
and the (P, 128) intermediate features never reach HBM.

Appearance codes are per-pair rows: the grid is one tile per pair
(tile = samples-per-pair), so each tile reads its own (1, Ca) row and
writes its own appearance gradient row — no cross-tile accumulation.

Backward is a custom VJP that recomputes the forward per tile and
backprops every head; weight gradients accumulate in VMEM across the
sequential grid.
"""

from __future__ import annotations

import collections
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lab4d_tpu.ops.mlp_kernel import (
    _dot,
    _dot_nt,
    _dot_tn,
    _fold_sum_blocks,
    _interpret,
)

OUT_DIMS = (1, 3, 1, 16)  # density, rgb, vis, feat

# hashable static config (custom_vjp nondiff args must be hashable)
FieldCfg = collections.namedtuple(
    "FieldCfg",
    "freqs nf_base nf_color nf_vis nf_feat "
    "skips_base skips_color skips_vis skips_feat",
)
# tile caps, env-overridable for on-hardware sweeps (docs/performance.md)
import os as _os

MAX_TILE = int(_os.environ.get("LAB4D_MAX_TILE", 2048))
MAX_TILE_BWD = int(_os.environ.get("LAB4D_MAX_TILE_BWD", 1024))
# Mosaic's default scoped-vmem budget (16 MB) caps the backward tile at
# 512 points; v5e has 128 MB of VMEM, so raise the per-kernel budget and
# let the tile sweep pick the winner (docs/performance.md)
VMEM_LIMIT = int(_os.environ.get("LAB4D_KERNEL_VMEM_MB", 96)) * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


# --------------------------------------------------------------- embedding


def _sincos(x, fcol):
    """x (T, 3) -> ang/sin/cos (T, 3F) in [f0(3), f1(3), ...] block order.
    fcol: (1, 3F) per-column frequency scales (kernel input — captured
    constants are rejected by pallas)."""
    F = fcol.shape[-1] // x.shape[1]
    xw = jnp.concatenate([x] * F, axis=-1)
    ang = xw * fcol
    return ang, jnp.sin(ang), jnp.cos(ang)


def _embed(x, sin_t, cos_t, n_freqs, window):
    """Assemble [x, sin[:3n]*w, cos[:3n]*w] from the shared table."""
    C = x.shape[1]
    s = sin_t[:, : C * n_freqs]
    c = cos_t[:, : C * n_freqs]
    if window is not None:
        w = window[0, : C * n_freqs]
        s, c = s * w, c * w
    return jnp.concatenate([x, s, c], axis=-1)


def _embed_bwd(dX, x, sin_t, cos_t, n_freqs, window, fcol):
    """Gradient of _embed wrt x; dX (T, 3+6n)."""
    C = x.shape[1]
    gs = dX[:, C : C + C * n_freqs]
    gc = dX[:, C + C * n_freqs :]
    if window is not None:
        w = window[0, : C * n_freqs]
        gs, gc = gs * w, gc * w
    dang = (
        cos_t[:, : C * n_freqs] * gs - sin_t[:, : C * n_freqs] * gc
    ) * fcol[:, : C * n_freqs]
    return dX[:, :C] + _fold_sum_blocks(dang, C)


# ------------------------------------------------------------------- MLPs
#
# Weight lists arrive in SPLIT layout (see _split_nets): a skip layer
# holds three entries [W_x, W_h, b] and computes x @ W_x + h @ W_h + b
# instead of concat([x, h]) @ W — the 191/167-wide concat layers cost
# ~18% of the fwd matmul chain (odd-K padding + materializing the concat;
# measured by bench_kernel_anatomy, docs/performance.md).


def _num_layers(wb_len: int, skips) -> int:
    """Layer count of a split-layout weight list (skip layers take three
    entries, others two)."""
    n = wb_len // 2
    while n > 0 and 2 * n + sum(1 for s in skips if s < n) != wb_len:
        n -= 1
    assert n > 0, (wb_len, skips)
    return n


def _layer_starts(wb_len: int, skips):
    n = _num_layers(wb_len, skips)
    starts, pos = [], 0
    for i in range(n):
        starts.append(pos)
        pos += 3 if i in skips else 2
    return n, starts


def _mlp_fwd(x, wb, skips, final_act, keep_inputs=False):
    """Split-layout MLP forward; returns (out, layer_inputs|None) where
    layer_inputs[i] is layer i's hidden operand (x re-enters via W_x)."""
    n, starts = _layer_starts(len(wb), skips)
    h = x
    inputs = [] if keep_inputs else None
    for i in range(n):
        if keep_inputs:
            inputs.append(h)
        p = starts[i]
        if i in skips:
            h = _dot(x, wb[p]) + _dot(h, wb[p + 1]) + wb[p + 2]
        else:
            h = _dot(h, wb[p]) + wb[p + 1]
        if i < n - 1:
            h = jnp.maximum(h, 0.0)
    if final_act:
        h = jnp.maximum(h, 0.0)
    return h, inputs


def _mlp_bwd(g, x, out, inputs, wb, skips, final_act):
    """Backprop one split-layout MLP; returns (dX, grads) with grads in
    the same flat split layout as wb."""
    n, starts = _layer_starts(len(wb), skips)
    grads = [None] * len(wb)
    if final_act:
        g = g * (out > 0.0)

    dX = jnp.zeros_like(x)
    for i in reversed(range(n)):
        if i < n - 1:
            g = g * (inputs[i + 1] > 0.0)
        p = starts[i]
        if i in skips:
            grads[p] = _dot_tn(x, g)
            grads[p + 1] = _dot_tn(inputs[i], g)
            grads[p + 2] = jnp.sum(g, axis=0, keepdims=True)
            dX = dX + _dot_nt(g, wb[p])
            g = _dot_nt(g, wb[p + 1])
        else:
            grads[p] = _dot_tn(inputs[i], g)
            grads[p + 1] = jnp.sum(g, axis=0, keepdims=True)
            g = _dot_nt(g, wb[p])
    return dX + g, grads


# ------------------------------------------------------------ kernel bodies


def _forward_tile(x, dir_extra, appr_row, win_b, win_c, nets, cfg, fcol, ibeta):
    """Shared forward dataflow; returns (packed_out, cache) where cache
    holds everything backward needs."""
    T = x.shape[0]
    ang, sin_t, cos_t = _sincos(x, fcol)

    Xb = _embed(x, sin_t, cos_t, cfg.nf_base, win_b)
    feat, in_b = _mlp_fwd(Xb, nets["base"], cfg.skips_base, True, True)

    sdf = _dot(feat, nets["sdf"][0]) + nets["sdf"][1]

    Xc = _embed(x, sin_t, cos_t, cfg.nf_color, win_c)
    featc, in_c = _mlp_fwd(Xc, nets["color"], cfg.skips_color, True, True)
    hc = feat + featc

    # rgb1 weights are per-segment blocks [W_hc, (W_dir), (W_appr), b]:
    # the appearance row's contribution is a single (1, W/2) row matmul
    # broadcast as a bias instead of a (T, Ca) broadcast + concat
    rgb1 = nets["rgb1"]
    p = 0
    acc = _dot(hc, rgb1[p]); p += 1
    if dir_extra is not None:
        acc = acc + _dot(dir_extra, rgb1[p]); p += 1
    if appr_row is not None:
        acc = acc + _dot(appr_row, rgb1[p]); p += 1
    rgb_h = jnp.maximum(acc + rgb1[p], 0.0)
    rgb = _dot(rgb_h, nets["rgb2"][0]) + nets["rgb2"][1]

    Xv = _embed(x, sin_t, cos_t, cfg.nf_vis, None)
    vis, in_v = _mlp_fwd(Xv, nets["vis"], cfg.skips_vis, False, True)

    Xf = _embed(x, sin_t, cos_t, cfg.nf_feat, None)
    f16, in_f = _mlp_fwd(Xf, nets["feat"], cfg.skips_feat, False, True)

    # final nonlinearities in-kernel: VolSDF density (Laplace CDF of the
    # sdf), sigmoid rgb, L2-normalized features — their (P, .) elementwise
    # passes otherwise cost ~4 ms/step of HBM traffic in XLA glue
    ib = ibeta[0, 0]
    # exp(x) - 1 instead of expm1 (not lowered by Mosaic); the lost
    # precision near 0 is ~1e-7 absolute on a 0.5-magnitude term
    density = (
        0.5 + 0.5 * jnp.sign(sdf) * (jnp.exp(-jnp.abs(sdf) * ib) - 1.0)
    ) * ib
    rgb_act = jax.nn.sigmoid(rgb)
    fnorm = jnp.sqrt(jnp.sum(f16 * f16, axis=-1, keepdims=True) + 1e-12)
    f16n = f16 / jnp.maximum(fnorm, 1e-6)

    out = (density, rgb_act, vis, f16n)
    cache = dict(
        ang=ang, sin_t=sin_t, cos_t=cos_t,
        Xb=Xb, in_b=in_b, feat=feat,
        Xc=Xc, in_c=in_c, featc=featc,
        rgb_h=rgb_h,
        Xv=Xv, in_v=in_v, vis=vis,
        Xf=Xf, in_f=in_f, f16=f16,
        sdf=sdf, rgb_act=rgb_act, f16n=f16n, fnorm=fnorm, ib=ib,
    )
    return out, cache


def _backward_tile(g, x, cache, nets, cfg, win_b, win_c, dir_extra,
                   appr_row, fcol):
    """Backprop the per-head gradients; returns (dx, ddir, dappr,
    net_grads, dibeta)."""
    C = x.shape[1]
    g_density, g_rgb_act, g_vis, g_f16n = g

    # density = (0.5 + 0.5 sign(s) expm1(-|s| ib)) ib
    sdf, ib = cache["sdf"], cache["ib"]
    e = jnp.exp(-jnp.abs(sdf) * ib)
    g_sdf = g_density * (-0.5 * ib * ib * e)
    # d density / d ib = A - 0.5 * ib * s * e, A = density / ib
    ddens_dib = (
        0.5 + 0.5 * jnp.sign(sdf) * (jnp.exp(-jnp.abs(sdf) * ib) - 1.0)
        - 0.5 * ib * sdf * e
    )
    dibeta = jnp.sum(g_density * ddens_dib).reshape(1, 1)

    rgb_act = cache["rgb_act"]
    g_rgb = g_rgb_act * rgb_act * (1.0 - rgb_act)

    f16n, fnorm = cache["f16n"], cache["fnorm"]
    denom = jnp.maximum(fnorm, 1e-6)
    g_f16 = (g_f16n - f16n * jnp.sum(f16n * g_f16n, -1, keepdims=True)) / denom

    # rgb head backward (segment form mirrors _forward_tile's rgb1 fold)
    d_rgb_h = _dot_nt(g_rgb, nets["rgb2"][0])
    g_rgb2 = [_dot_tn(cache["rgb_h"], g_rgb), jnp.sum(g_rgb, 0, keepdims=True)]
    d_rgb_h = d_rgb_h * (cache["rgb_h"] > 0.0)
    hc = cache["feat"] + cache["featc"]
    rgb1 = nets["rgb1"]
    g_rgb1 = [None] * len(rgb1)
    gsum = jnp.sum(d_rgb_h, axis=0, keepdims=True)
    p = 0
    d_hc = _dot_nt(d_rgb_h, rgb1[p])
    g_rgb1[p] = _dot_tn(hc, d_rgb_h); p += 1
    ddir = None
    if dir_extra is not None:
        ddir = _dot_nt(d_rgb_h, rgb1[p])
        g_rgb1[p] = _dot_tn(dir_extra, d_rgb_h); p += 1
    dappr = None
    if appr_row is not None:
        # appr is one row broadcast over the tile: its weight grad is the
        # outer product appr_row^T (sum_rows d_rgb_h)
        dappr = _dot_nt(gsum, rgb1[p])
        g_rgb1[p] = _dot_tn(appr_row, gsum); p += 1
    g_rgb1[p] = gsum

    # sdf head backward
    d_feat = _dot_nt(g_sdf, nets["sdf"][0]) + d_hc
    g_sdfh = [_dot_tn(cache["feat"], g_sdf), jnp.sum(g_sdf, 0, keepdims=True)]

    dXb, g_base = _mlp_bwd(
        d_feat, cache["Xb"], cache["feat"], cache["in_b"], nets["base"],
        cfg.skips_base, True,
    )
    dXc, g_color = _mlp_bwd(
        d_hc, cache["Xc"], cache["featc"], cache["in_c"], nets["color"],
        cfg.skips_color, True,
    )
    dXv, g_vis_net = _mlp_bwd(
        g_vis, cache["Xv"], cache["vis"], cache["in_v"], nets["vis"],
        cfg.skips_vis, False,
    )
    dXf, g_feat_net = _mlp_bwd(
        g_f16, cache["Xf"], cache["f16"], cache["in_f"], nets["feat"],
        cfg.skips_feat, False,
    )

    sin_t, cos_t = cache["sin_t"], cache["cos_t"]
    dx = (
        _embed_bwd(dXb, x, sin_t, cos_t, cfg.nf_base, win_b, fcol)
        + _embed_bwd(dXc, x, sin_t, cos_t, cfg.nf_color, win_c, fcol)
        + _embed_bwd(dXv, x, sin_t, cos_t, cfg.nf_vis, None, fcol)
        + _embed_bwd(dXf, x, sin_t, cos_t, cfg.nf_feat, None, fcol)
    )
    net_grads = dict(
        base=g_base, sdf=g_sdfh, color=g_color, rgb1=g_rgb1, rgb2=g_rgb2,
        vis=g_vis_net, feat=g_feat_net,
    )
    return dx, ddir, dappr, net_grads, dibeta


# ------------------------------------------------------------ pallas glue


_NET_SKIPS = dict(base="skips_base", color="skips_color", vis="skips_vis",
                  feat="skips_feat")


def _split_nets(nets, cfg, dir_dim, appr_dim):
    """Host-side: rewrite every skip-layer weight (Cx+W, Wout) into a
    (W_x, W_h) pair, and the rgb1 input weight into per-segment blocks
    [W_hc, (W_dir), (W_appr)], so the kernel never concatenates."""
    out = {}
    for name, arrs in nets.items():
        if name in _NET_SKIPS:
            skips = getattr(cfg, _NET_SKIPS[name])
            n = len(arrs) // 2
            xdim = arrs[0].shape[0]
            lst = []
            for i in range(n):
                W, b = arrs[2 * i], arrs[2 * i + 1]
                if i in skips and i < n:
                    lst += [W[:xdim], W[xdim:], b]
                else:
                    lst += [W, b]
            out[name] = lst
        elif name == "rgb1":
            W, b = arrs
            hc_w = W.shape[0] - dir_dim - appr_dim
            segs = [W[:hc_w]]
            off = hc_w
            if dir_dim:
                segs.append(W[off : off + dir_dim]); off += dir_dim
            if appr_dim:
                segs.append(W[off : off + appr_dim]); off += appr_dim
            out[name] = segs + [b]
        else:
            out[name] = list(arrs)
    return out


def _merge_net_grads(dnets, nets, cfg):
    """Inverse of _split_nets on gradients: concat split blocks back to
    the caller's original weight shapes."""
    out = {}
    for name, arrs in nets.items():
        g = dnets[name]
        if name in _NET_SKIPS:
            skips = getattr(cfg, _NET_SKIPS[name])
            n = len(arrs) // 2
            lst, pos = [], 0
            for i in range(n):
                if i in skips and i < n:
                    lst += [jnp.concatenate([g[pos], g[pos + 1]], 0),
                            g[pos + 2]]
                    pos += 3
                else:
                    lst += [g[pos], g[pos + 1]]
                    pos += 2
            out[name] = lst
        elif name == "rgb1":
            out[name] = [jnp.concatenate(g[:-1], 0), g[-1]]
        else:
            out[name] = list(g)
    for name, arrs in nets.items():
        out[name] = [
            ga.reshape(orig.shape) for ga, orig in zip(out[name], arrs)
        ]
    return out


def _flatten_nets(nets):
    """Deterministic flat list of (name, idx) -> array, plus reassembler."""
    order = []
    flat = []
    for name in ("base", "sdf", "color", "rgb1", "rgb2", "vis", "feat"):
        arrs = nets[name]
        for i, a in enumerate(arrs):
            order.append((name, i))
            # biases as (1, C) rows for clean VMEM tiling
            flat.append(a.reshape(1, -1) if a.ndim == 1 else a)
    return flat, order


def _unflatten_nets(flat, order):
    nets = {}
    for (name, i), a in zip(order, flat):
        nets.setdefault(name, []).append(a)
    return nets


def _net_specs(flat):
    return [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in flat
    ]


def _fwd_kernel(x_ref, fcol_ref, ibeta_ref, *refs, order, cfg, has_dir,
                has_appr, has_wb, has_wc):
    idx = 0
    dir_ref = appr_ref = wb_ref = wc_ref = None
    if has_dir:
        dir_ref = refs[idx]; idx += 1
    if has_appr:
        appr_ref = refs[idx]; idx += 1
    if has_wb:
        wb_ref = refs[idx]; idx += 1
    if has_wc:
        wc_ref = refs[idx]; idx += 1
    n_out = len(OUT_DIMS)
    net_refs = refs[idx:-n_out]
    out_refs = refs[-n_out:]
    nets = _unflatten_nets([r[:] for r in net_refs], order)
    out, _ = _forward_tile(
        x_ref[:],
        None if dir_ref is None else dir_ref[:],
        None if appr_ref is None else appr_ref[0:1],
        None if wb_ref is None else wb_ref[:],
        None if wc_ref is None else wc_ref[:],
        nets, cfg, fcol_ref[:], ibeta_ref[:],
    )
    for ref, val in zip(out_refs, out):
        ref[:] = val


def _bwd_kernel(x_ref, gd_ref, gr_ref, gv_ref, gf_ref, fcol_ref, ibeta_ref,
                *refs, order, cfg, has_dir, has_appr, has_wb, has_wc, n_nets,
                tiles_per_pair):
    idx = 0
    dir_ref = appr_ref = wb_ref = wc_ref = None
    if has_dir:
        dir_ref = refs[idx]; idx += 1
    if has_appr:
        appr_ref = refs[idx]; idx += 1
    if has_wb:
        wb_ref = refs[idx]; idx += 1
    if has_wc:
        wc_ref = refs[idx]; idx += 1
    net_refs = refs[idx : idx + n_nets]
    out_refs = refs[idx + n_nets :]
    nets = _unflatten_nets([r[:] for r in net_refs], order)

    x = x_ref[:]
    fcol = fcol_ref[:]
    win_b = None if wb_ref is None else wb_ref[:]
    win_c = None if wc_ref is None else wc_ref[:]
    _, cache = _forward_tile(
        x,
        None if dir_ref is None else dir_ref[:],
        None if appr_ref is None else appr_ref[0:1],
        win_b, win_c, nets, cfg, fcol, ibeta_ref[:],
    )
    dx, ddir, dappr, net_grads, dibeta = _backward_tile(
        (gd_ref[:], gr_ref[:], gv_ref[:], gf_ref[:]),
        x, cache, nets, cfg, win_b, win_c,
        None if dir_ref is None else dir_ref[:],
        None if appr_ref is None else appr_ref[0:1],
        fcol,
    )

    oi = 0
    out_refs[oi][:] = dx; oi += 1
    if has_dir:
        out_refs[oi][:] = ddir; oi += 1
    step = pl.program_id(0)
    if has_appr:
        appr_out = out_refs[oi]
        # several tiles may share one pair row: zero on first visit,
        # accumulate after (the grid is sequential)
        @pl.when(step % tiles_per_pair == 0)
        def _zero_appr():
            appr_out[:] = jnp.zeros_like(appr_out)

        appr_out[:] += jnp.broadcast_to(dappr, appr_out.shape)
        oi += 1
    grads_flat, _ = _flatten_nets(net_grads)
    grads_flat.append(dibeta)  # (1, 1) accumulator rides with the weights

    @pl.when(step == 0)
    def _init():
        for k in range(len(grads_flat)):
            out_refs[oi + k][:] = jnp.zeros_like(out_refs[oi + k])

    for k, gk in enumerate(grads_flat):
        out_refs[oi + k][:] += gk.reshape(out_refs[oi + k].shape)


# ----------------------------------------------------------------- public


def _pick_tile(samples_per_pair, limit):
    """Largest power-of-two subdivision of the per-pair sample count that
    fits the VMEM budget (appearance rows broadcast across a pair's
    tiles)."""
    tile = samples_per_pair
    while tile > limit and tile % 2 == 0:
        tile //= 2
    if tile > limit or tile % 8 != 0:
        return None
    return tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_nerf_heads(x, dir_extra, appr_rows, win_b, win_c, nets, ibeta,
                     cfg, spp):
    """x: (P, 3) canonical points; dir_extra: (P, Cd) or None; appr_rows:
    (M, Ca) per-pair appearance codes or None; win_b/win_c: annealing
    windows (F,) or None; nets: dict of weight lists; ibeta: (1, 1)
    VolSDF inverse-beta; cfg: static FieldCfg; spp: samples-per-pair.

    Returns (density (P,1), sigmoid rgb (P,3), vis (P,1),
    normalized feat (P,16))."""
    return _run_fwd(x, dir_extra, appr_rows, win_b, win_c, nets, ibeta,
                    cfg, spp)


def _run_fwd(x, dir_extra, appr_rows, win_b, win_c, nets, ibeta, cfg, spp):
    P = x.shape[0]
    tile = _pick_tile(spp, MAX_TILE)
    assert tile is not None and P % tile == 0
    tiles_per_pair = spp // tile
    grid = (P // tile,)
    snets = _split_nets(
        nets, cfg,
        0 if dir_extra is None else dir_extra.shape[1],
        0 if appr_rows is None else appr_rows.shape[1],
    )
    flat, order = _flatten_nets(snets)

    fcol = jnp.asarray(
        np.repeat(np.asarray(cfg.freqs, np.float32), x.shape[1])[None]
    )
    in_specs = [
        pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(fcol.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, fcol, ibeta.reshape(1, 1)]
    if dir_extra is not None:
        in_specs.append(pl.BlockSpec((tile, dir_extra.shape[1]),
                                     lambda i: (i, 0), memory_space=pltpu.VMEM))
        args.append(dir_extra)
    if appr_rows is not None:
        # pallas requires >=8-row blocks: replicate each pair row 8x and
        # read row 0 per tile; several tiles may share one pair row
        appr8 = jnp.repeat(appr_rows, 8, axis=0)
        in_specs.append(
            pl.BlockSpec(
                (8, appr_rows.shape[1]),
                lambda i: (i // tiles_per_pair, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(appr8)
    for w in (win_b, win_c):
        if w is not None:
            # per-freq window -> per-embedding-column weights
            wc = jnp.repeat(w.reshape(-1), x.shape[1])[None]
            in_specs.append(pl.BlockSpec(wc.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(wc)
    in_specs += _net_specs(flat)
    args += flat

    kern = functools.partial(
        _fwd_kernel, order=tuple(order), cfg=cfg,
        has_dir=dir_extra is not None, has_appr=appr_rows is not None,
        has_wb=win_b is not None, has_wc=win_c is not None,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for c in OUT_DIMS
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((P, c), jnp.float32) for c in OUT_DIMS
        ),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*args)


def _vjp_fwd(x, dir_extra, appr_rows, win_b, win_c, nets, ibeta, cfg, spp):
    out = _run_fwd(x, dir_extra, appr_rows, win_b, win_c, nets, ibeta,
                   cfg, spp)
    return out, (x, dir_extra, appr_rows, win_b, win_c, nets, ibeta)


def _vjp_bwd(cfg, spp, res, g):
    x, dir_extra, appr_rows, win_b, win_c, nets, ibeta = res
    return _run_bwd(x, g, dir_extra, appr_rows, win_b, win_c, nets, ibeta,
                    cfg, spp)


def _run_bwd(x, g, dir_extra, appr_rows, win_b, win_c, nets, ibeta, cfg,
             spp):
    P = x.shape[0]
    # the backward holds 4 nets' activations + grad accumulators in VMEM:
    # subdivide each pair across tiles until it fits
    tile = spp
    while tile > MAX_TILE_BWD and tile % 2 == 0:
        tile //= 2
    tiles_per_pair = spp // tile
    grid = (P // tile,)
    snets = _split_nets(
        nets, cfg,
        0 if dir_extra is None else dir_extra.shape[1],
        0 if appr_rows is None else appr_rows.shape[1],
    )
    flat, order = _flatten_nets(snets)

    fcol = jnp.asarray(
        np.repeat(np.asarray(cfg.freqs, np.float32), x.shape[1])[None]
    )
    in_specs = [
        pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for c in OUT_DIMS
    ] + [
        pl.BlockSpec(fcol.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, *g, fcol, ibeta.reshape(1, 1)]
    if dir_extra is not None:
        in_specs.append(pl.BlockSpec((tile, dir_extra.shape[1]),
                                     lambda i: (i, 0), memory_space=pltpu.VMEM))
        args.append(dir_extra)
    if appr_rows is not None:
        appr8 = jnp.repeat(appr_rows, 8, axis=0)
        in_specs.append(
            pl.BlockSpec(
                (8, appr_rows.shape[1]),
                lambda i: (i // tiles_per_pair, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(appr8)
    for w in (win_b, win_c):
        if w is not None:
            wc = jnp.repeat(w.reshape(-1), x.shape[1])[None]
            in_specs.append(pl.BlockSpec(wc.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(wc)
    in_specs += _net_specs(flat)
    args += flat

    out_shapes = [jax.ShapeDtypeStruct((P, x.shape[1]), jnp.float32)]
    out_specs = [pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if dir_extra is not None:
        out_shapes.append(jax.ShapeDtypeStruct(dir_extra.shape, jnp.float32))
        out_specs.append(pl.BlockSpec((tile, dir_extra.shape[1]),
                                      lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    if appr_rows is not None:
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (appr_rows.shape[0] * 8, appr_rows.shape[1]), jnp.float32
            )
        )
        out_specs.append(
            pl.BlockSpec(
                (8, appr_rows.shape[1]),
                lambda i: (i // tiles_per_pair, 0),
                memory_space=pltpu.VMEM,
            )
        )
    for a in flat:
        out_shapes.append(jax.ShapeDtypeStruct(a.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(a.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    out_shapes.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))  # dibeta
    out_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))

    kern = functools.partial(
        _bwd_kernel, order=tuple(order), cfg=cfg,
        has_dir=dir_extra is not None, has_appr=appr_rows is not None,
        has_wb=win_b is not None, has_wc=win_c is not None,
        n_nets=len(flat), tiles_per_pair=tiles_per_pair,
    )
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*args)

    oi = 0
    dx = outs[oi]; oi += 1
    ddir = None
    if dir_extra is not None:
        ddir = outs[oi]; oi += 1
    dappr = None
    if appr_rows is not None:
        dappr = outs[oi][::8]; oi += 1
    grads_flat = outs[oi:-1]
    dibeta = outs[-1].reshape(ibeta.shape)
    dnets = _merge_net_grads(_unflatten_nets(list(grads_flat), order),
                             nets, cfg)
    dwb = None if win_b is None else jnp.zeros_like(win_b)
    dwc = None if win_c is None else jnp.zeros_like(win_c)
    return dx, ddir, dappr, dwb, dwc, dnets, dibeta


fused_nerf_heads.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------------------------- jnp oracle


def nerf_heads_reference(x, dir_extra, appr_rows, win_b, win_c, nets,
                         ibeta, cfg, spp):
    """jnp twin of the kernel dataflow (layouts via embedding.fourier_embed)."""
    from lab4d_tpu.nnutils.embedding import fourier_embed
    from lab4d_tpu.ops.mlp_kernel import mlp_reference

    freqs = cfg.freqs

    def embed(n, window):
        return fourier_embed(x, freqs[:n], window)

    def run(name, X, skips, final_act):
        wb = nets[name]
        Ws = [wb[2 * i] for i in range(len(wb) // 2)]
        bs = [wb[2 * i + 1].reshape(-1) for i in range(len(wb) // 2)]
        return mlp_reference(X, Ws, bs, skips, final_act)

    feat = run("base", embed(cfg.nf_base, win_b), cfg.skips_base, True)
    sdf = feat @ nets["sdf"][0] + nets["sdf"][1].reshape(-1)
    featc = run("color", embed(cfg.nf_color, win_c), cfg.skips_color, True)
    hc = feat + featc
    parts = [hc]
    if dir_extra is not None:
        parts.append(dir_extra)
    if appr_rows is not None:
        P = x.shape[0]
        rep = jnp.repeat(appr_rows, spp, axis=0)
        parts.append(rep)
    rgb_in = jnp.concatenate(parts, -1)
    rgb_h = jax.nn.relu(rgb_in @ nets["rgb1"][0] + nets["rgb1"][1].reshape(-1))
    rgb = rgb_h @ nets["rgb2"][0] + nets["rgb2"][1].reshape(-1)
    vis = run("vis", embed(cfg.nf_vis, None), cfg.skips_vis, False)
    f16 = run("feat", embed(cfg.nf_feat, None), cfg.skips_feat, False)
    ib = ibeta.reshape(())
    density = (
        0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) * ib)
    ) * ib
    rgb = jax.nn.sigmoid(rgb)
    f16 = f16 / jnp.maximum(
        jnp.sqrt(jnp.sum(f16 * f16, -1, keepdims=True) + 1e-12), 1e-6
    )
    return density, rgb, vis, f16


# NOTE: a forward+SDF-gradient kernel variant (fused_nerf_heads_grad:
# in-kernel 3-tangent forward mode through the base MLP + sdf head,
# giving the canonical SDF gradient as a 5th output for eval normals)
# was built in round 3 and DELETED in round 5: the default eval path is
# all-XLA (the pallas call is a fusion boundary that loses at eval —
# 308 ms vs 685 ms per 256^2 skel-quad frame, docs/performance.md), so
# the variant was reachable only through its parity tests. Measured while
# it lived: dsdf cost +2 ms per 8k-ray chunk in-kernel; the full normal
# chain through it ran 88 ms embedded vs 89 ms for reverse-mode through
# warp+MLP — no win to keep ~200 LoC of dead kernel.
