"""Pallas TPU kernel: the full neural-blend-skinning warp in one pass.

Per point tile (one tile = a power-of-two slice of one pair's samples),
the kernel computes what SkinningWarp.__call__ chains through five
modules (warping.py:150-200, skinning.py, geom.dual_quaternion_skinning):

    bone-local coords (gauss-scaled)  ->  Gaussian skin logits
      + delta-skin MLP (75 -> 64 -> 64 -> 25, time/inst folded)
      -> softmax -> hemisphere-fixed dual-quaternion blend -> warped xyz
      + skin cross-entropy + delta^2 (the warp's aux losses)

Per-pair conditioning (bone rotations/translations, blend dual quats,
the time-row fold of the delta MLP's first layer) arrives as one packed
(8, 128) row block per pair, built OUTSIDE in jnp — autodiff composes
the kernel's custom VJP with the tiny per-pair packing math, so
gradients reach the articulation/camera parameters without any
hand-written chain.

The backward kernel recomputes the tile forward under jax.vjp (pallas
kernel bodies trace ordinary jax, so the transpose is derived
automatically) and accumulates weight/row grads across the grid.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lab4d_tpu.ops.mlp_kernel import _interpret

ROW_W = 128  # packed per-pair row width
ROW_H = 16  # rows per pair block: rg(3), tr, u, pad, qr^T(4), qd^T(4), pad
OUT_DIM = 8  # [xyz(3), skin_entropy, delta_sq, pad(3)]
MAX_TILE = 2048
MAX_TILE_BWD = 256


def _pick_tile(spp, limit):
    tile = spp
    while tile > limit and tile % 2 == 0:
        tile //= 2
    if tile > limit or tile % 8 != 0:
        return None
    return tile


# ----------------------------------------------------------- tile forward


def _warp_tile(x, blk, sel, w1, b1, w2, b2, w3, b3, B):
    """x: (T, 3); blk: (ROW_H, 128) packed pair rows; sel: (3B, B)
    bone-sum selection. Returns (T, OUT_DIM)."""
    rg = blk[0:3, : 3 * B]          # (3, 3B) scaled bone rotations
    tr = blk[3:4, : 3 * B]          # (1, 3B)
    u = blk[4:5, : b1.shape[-1]]    # (1, W1) time-row fold
    qrT = blk[6:10, :B]             # (4, B) blend quats, transposed
    qdT = blk[10:14, :B]

    xb = jnp.dot(x, rg, preferred_element_type=jnp.float32) - tr  # (T, 3B)
    dist2 = jnp.dot(xb * xb, sel, preferred_element_type=jnp.float32)

    h = jnp.maximum(jnp.dot(xb, w1, preferred_element_type=jnp.float32)
                    + b1 + u, 0.0)
    h = jnp.maximum(jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2,
                    0.0)
    delta = jnp.maximum(
        jnp.dot(h, w3, preferred_element_type=jnp.float32) + b3, 0.0
    ) * 0.1

    skin = -(dist2 + delta)
    prob = jax.nn.softmax(skin, axis=-1)
    entropy = (jax.nn.logsumexp(skin, axis=-1) - jnp.max(skin, axis=-1))[
        :, None
    ]
    delta_sq = jnp.mean(delta**2, axis=-1, keepdims=True)

    # hemisphere sign fix against the dominant bone (geom.py:129-186);
    # contractions index the transposed quats to avoid in-kernel
    # reshapes/transposes (unsupported vector shape casts in Mosaic)
    dn_bb = (((0,), (0,)), ((), ()))  # contract the 4-component axis
    sign_tab = jnp.where(
        jax.lax.dot_general(qrT, qrT, dn_bb,
                            preferred_element_type=jnp.float32) > 0,
        1.0, -1.0,
    )
    onehot = jax.nn.one_hot(jnp.argmax(prob, -1), B, dtype=prob.dtype)
    sw = prob * jnp.dot(onehot, sign_tab, preferred_element_type=jnp.float32)
    dn_tb = (((1,), (1,)), ((), ()))  # contract the bone axis
    qr_w = jax.lax.dot_general(sw, qrT, dn_tb,
                               preferred_element_type=jnp.float32)
    qd_w = jax.lax.dot_general(sw, qdT, dn_tb,
                               preferred_element_type=jnp.float32)
    inv = jax.lax.rsqrt(jnp.maximum(jnp.sum(qr_w * qr_w, -1, keepdims=True),
                                    1e-12))
    qr_w = qr_w * inv
    qd_w = qd_w * inv

    w, xq, yq, zq = (qr_w[:, i] for i in range(4))
    px, py, pz = (x[:, i] for i in range(3))
    cx = yq * pz - zq * py + w * px
    cy = zq * px - xq * pz + w * py
    cz = xq * py - yq * px + w * pz
    rx = px + 2 * (yq * cz - zq * cy)
    ry = py + 2 * (zq * cx - xq * cz)
    rz = pz + 2 * (xq * cy - yq * cx)
    dw, dx, dy, dz = (qd_w[:, i] for i in range(4))
    tx = 2 * (-dw * xq + dx * w - dy * zq + dz * yq)
    ty = 2 * (-dw * yq + dx * zq + dy * w - dz * xq)
    tz = 2 * (-dw * zq - dx * yq + dy * xq + dz * w)
    out3 = jnp.stack([rx + tx, ry + ty, rz + tz], -1)

    pad = jnp.zeros((x.shape[0], OUT_DIM - 5), jnp.float32)
    return jnp.concatenate([out3, entropy, delta_sq, pad], axis=-1)


def _fwd_kernel(x_ref, blk_ref, sel_ref, *wb_refs, B):
    out_ref = wb_refs[-1]
    w = [r[:] for r in wb_refs[:-1]]
    out_ref[:] = _warp_tile(x_ref[:], blk_ref[:], sel_ref[:], *w, B=B)


def _bwd_kernel(x_ref, g_ref, blk_ref, sel_ref, *refs, B, tiles_per_pair):
    wb = [r[:] for r in refs[:6]]
    dx_ref, dblk_ref = refs[6], refs[7]
    dwb_refs = refs[8:]

    def fn(x, blk, *w):
        return _warp_tile(x, blk, sel_ref[:], *w, B=B)

    _, vjp = jax.vjp(fn, x_ref[:], blk_ref[:], *wb)
    grads = vjp(g_ref[:])
    dx_ref[:] = grads[0]

    step = pl.program_id(0)

    @pl.when(step % tiles_per_pair == 0)
    def _zero_row():
        dblk_ref[:] = jnp.zeros_like(dblk_ref)

    dblk_ref[:] += grads[1]

    @pl.when(step == 0)
    def _zero_w():
        for r in dwb_refs:
            r[:] = jnp.zeros_like(r)

    for r, gw in zip(dwb_refs, grads[2:]):
        r[:] += gw.reshape(r.shape)


# ----------------------------------------------------------------- public


def _specs(x, blk8, sel, wb, tile, tiles_per_pair):
    in_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    blk_spec = pl.BlockSpec(
        (ROW_H, ROW_W), lambda i: (i // tiles_per_pair, 0),
        memory_space=pltpu.VMEM,
    )
    sel_spec = pl.BlockSpec(sel.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    wb_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in wb
    ]
    return in_specs, blk_spec, sel_spec, wb_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_skin_warp(x, pair_rows, mlp_wb, B, spp):
    """x: (P, 3) points; pair_rows: (M, 8, ROW_W) packed per-pair
    conditioning; mlp_wb: [W1, b1, W2, b2, W3, b3] delta-skin params
    (biases (1, C), inst code folded); B: bone count; spp: samples/pair.

    Returns (P, OUT_DIM) packed [warped xyz, skin entropy, delta^2]."""
    return _run_fwd(x, pair_rows, mlp_wb, B, spp)


def _sel(B):
    s = np.zeros((3 * B, B), np.float32)
    for k in range(3 * B):
        s[k, k // 3] = 1.0
    return s


def _run_fwd(x, pair_rows, mlp_wb, B, spp):
    P = x.shape[0]
    tile = _pick_tile(spp, MAX_TILE)
    assert tile is not None and P % tile == 0
    tiles_per_pair = spp // tile
    blk8 = pair_rows.reshape(-1, ROW_W)
    sel = jnp.asarray(_sel(B))
    in_specs, blk_spec, sel_spec, wb_specs = _specs(
        x, blk8, sel, mlp_wb, tile, tiles_per_pair
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, B=B),
        grid=(P // tile,),
        in_specs=in_specs + [blk_spec, sel_spec] + wb_specs,
        out_specs=pl.BlockSpec((tile, OUT_DIM), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, OUT_DIM), jnp.float32),
        interpret=_interpret(),
    )(x, blk8, sel, *mlp_wb)
    return out


def _vjp_fwd(x, pair_rows, mlp_wb, B, spp):
    return _run_fwd(x, pair_rows, mlp_wb, B, spp), (x, pair_rows, mlp_wb)


def _vjp_bwd(B, spp, res, g):
    x, pair_rows, mlp_wb = res
    P = x.shape[0]
    tile = _pick_tile(spp, MAX_TILE_BWD)
    tiles_per_pair = spp // tile
    blk8 = pair_rows.reshape(-1, ROW_W)
    sel = jnp.asarray(_sel(B))
    in_specs, blk_spec, sel_spec, wb_specs = _specs(
        x, blk8, sel, mlp_wb, tile, tiles_per_pair
    )
    in_specs.append(pl.BlockSpec((tile, OUT_DIM), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    # order: x, g, blk, sel, wb...
    all_in = [in_specs[0], in_specs[1], blk_spec, sel_spec] + wb_specs

    out_shapes = [
        jax.ShapeDtypeStruct((P, 3), jnp.float32),
        jax.ShapeDtypeStruct(blk8.shape, jnp.float32),
    ] + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in mlp_wb]
    out_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW_H, ROW_W), lambda i: (i // tiles_per_pair, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in mlp_wb
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, B=B, tiles_per_pair=tiles_per_pair),
        grid=(P // tile,),
        in_specs=all_in,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=_interpret(),
    )(x, g, blk8, sel, *mlp_wb)
    dx = outs[0]
    dblk = outs[1].reshape(pair_rows.shape)
    dwb = list(outs[2:])
    return dx, dblk, dwb


fused_skin_warp.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------------------------- jnp oracle


def skin_warp_reference(x, pair_rows, mlp_wb, B, spp):
    """jnp twin of the kernel's tile dataflow (used in tests)."""
    M = pair_rows.shape[0]
    sel = jnp.asarray(_sel(B))
    outs = []
    for m in range(M):
        xm = x[m * spp : (m + 1) * spp]
        outs.append(
            _warp_tile(xm, pair_rows[m], sel, *mlp_wb, B=B)
        )
    return jnp.concatenate(outs, 0)


def pack_pair_rows(q, t, gauss, u, se3_qr, se3_qd):
    """Build the (M, ROW_H, ROW_W) conditioning block (differentiable jnp).

    q/t: (M, B, 4)/(M, B, 3) bone-to-object articulation; gauss: (B, 3)
    per-bone scales; u: (M, W1) time-row fold of the delta MLP's first
    layer; se3_qr/qd: (M, B, 4) blend dual quaternions.
    """
    from lab4d_tpu.utils.quat import quaternion_to_matrix

    M, B = q.shape[:2]
    R = quaternion_to_matrix(q)  # (M, B, 3, 3) bone -> obj
    Rs = R / gauss[None, :, None, :]  # scale output axis by 1/gauss
    # rg[m, j, b*3+i] = Rs[m, b, j, i]
    rg = Rs.transpose(0, 2, 1, 3).reshape(M, 3, 3 * B)
    tr = jnp.einsum("mbj,mbji->mbi", t, Rs).reshape(M, 1, 3 * B)

    def row(a, width=ROW_W):
        a = a.reshape(M, -1)
        return jnp.pad(a, ((0, 0), (0, width - a.shape[-1])))[:, None, :]

    def mat(a):  # (M, R, C) -> padded to ROW_W cols
        return jnp.pad(a, ((0, 0), (0, 0), (0, ROW_W - a.shape[-1])))

    rows = jnp.concatenate(
        [
            mat(rg),                                  # rows 0-2
            row(tr),                                  # row 3
            row(u),                                   # row 4
            jnp.zeros((M, 1, ROW_W)),                 # row 5 (pad)
            mat(se3_qr.transpose(0, 2, 1)),           # rows 6-9: qr^T (4, B)
            mat(se3_qd.transpose(0, 2, 1)),           # rows 10-13
            jnp.zeros((M, 2, ROW_W)),                 # rows 14-15
        ],
        axis=1,
    )
    return rows
