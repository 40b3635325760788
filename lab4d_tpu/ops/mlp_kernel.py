"""Pallas TPU kernel: fused multi-layer ReLU MLP over a large point batch.

The per-point field evaluation (PosEmbed -> CondMLP -> heads) is the hot
op of the ray pipeline (~262k points x 8 layers x 256 wide per train
step). Under plain XLA each layer's activation round-trips HBM
(262k x 256 x 4B = 268 MB per layer); this kernel keeps all layer
weights resident in VMEM (~2.3 MB) and streams point tiles, so HBM
traffic collapses to inputs + outputs.

Backward is a custom VJP: activations are recomputed per tile (flash-
style rematerialization) and weight gradients accumulate in VMEM scratch
across the sequential TPU grid, written out on the last tile.

Used for first-order paths only (query_nerf / rendering). The eikonal
double-backward path keeps the jnp implementation (small 1/16 subsample),
sidestepping custom-VJP-of-VJP.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile of points processed per grid step (backward holds per-layer
# activations + weights + weight-grad accumulators in VMEM, so it uses a
# smaller tile)
TILE_P = 1024
TILE_P_BWD = 512


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


import os as _os_mod


def _kernel_bf16() -> bool:
    # read per call (not at import) so monkeypatch.setenv / in-process
    # A/B harnesses actually flip the gate
    return _os_mod.environ.get("LAB4D_KERNEL_BF16", "0") == "1"


def _dot(a, b):
    """MXU matmul with f32 accumulation.

    LAB4D_KERNEL_BF16=1 feeds the MXU bf16 operands (f32 accumulation
    stays). Measured on v5e (262k-point field megakernel, skel-quad
    dims): fwd 5.51 ms f32 vs 5.07 ms bf16, fwd+bwd 9.71 vs 9.98 —
    i.e. NO win; the kernel is VMEM-IO/pipeline bound at these widths
    (W=128..256), not MXU-pass bound, and the in-kernel astype adds VPU
    work. Default stays f32 (exact vs the jnp oracle); the gate remains
    for re-measurement if widths grow (docs/performance.md)."""
    if _kernel_bf16():
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dg_bwd() -> bool:
    return _os_mod.environ.get("LAB4D_DG_BWD", "1") == "1"


def _dot_tn(a, b):
    """a.T @ b without materializing the transpose: dot_general
    contracting over rows of BOTH operands. Inside a pallas kernel an
    explicit (T, C).T is a real sublane/lane relayout on TPU; the
    dimension-number form lets Mosaic feed the MXU directly. Used for
    weight grads dW = acts.T @ g. LAB4D_DG_BWD=0 restores the explicit
    transpose for A/B."""
    if not _dg_bwd():
        return _dot(a.T, b)
    if _kernel_bf16():
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_nt(a, b):
    """a @ b.T without materializing the transpose (contract over the
    last dim of both operands). Used for input grads dX = g @ W.T."""
    if not _dg_bwd():
        return _dot(a, b.T)
    if _kernel_bf16():
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _pad_rows(x, tile):
    P = x.shape[0]
    pad = (-P) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x, P


# ----------------------------------------------------------------- forward


def _fwd_kernel(x_ref, *refs, n_layers: int, skip_idx: Tuple[int, ...]):
    """refs = [W_0, b_0, ..., W_{L-1}, b_{L-1}, out_ref]"""
    out_ref = refs[-1]
    x = x_ref[:]
    h = x
    for i in range(n_layers):
        w = refs[2 * i][:]
        b = refs[2 * i + 1][:]
        if i in skip_idx:
            h = jnp.concatenate([x, h], axis=-1)
        h = _dot(h, w) + b
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    out_ref[:] = h


def _fwd(x, weights, biases, skip_idx, final_act):
    n_layers = len(weights)
    out_dim = weights[-1].shape[1]
    xp, P = _pad_rows(x, TILE_P)
    grid = (xp.shape[0] // TILE_P,)

    in_specs = [
        pl.BlockSpec((TILE_P, x.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ]
    args = [xp]
    for w, b in zip(weights, biases):
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        args += [w, b.reshape(1, -1)]

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, n_layers=n_layers, skip_idx=tuple(skip_idx)
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TILE_P, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], out_dim), jnp.float32),
        interpret=_interpret(),
    )(*args)
    out = out[:P]
    if final_act:
        out = jnp.maximum(out, 0.0)
    return out


# ---------------------------------------------------------------- backward


def _bwd_kernel(
    x_ref, g_ref, *refs, n_layers: int, skip_idx: Tuple[int, ...]
):
    """refs = [W_0.., b_0.., dx_ref, dW_0.., db_0.., acts_scratch]

    Recomputes activations, then backprops the tile; dW/db accumulate in
    the output refs across sequential grid steps.
    """
    num_w = n_layers
    w_refs = [refs[2 * i] for i in range(num_w)]
    dx_ref = refs[2 * num_w]
    dw_refs = [refs[2 * num_w + 1 + i] for i in range(num_w)]
    db_refs = [refs[2 * num_w + 1 + num_w + i] for i in range(num_w)]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for i in range(num_w):
            dw_refs[i][:] = jnp.zeros_like(dw_refs[i])
            db_refs[i][:] = jnp.zeros_like(db_refs[i])

    x = x_ref[:]
    # forward recompute, stashing layer inputs only; the relu output of
    # layer i is recoverable from layer_inputs[i+1] (modulo skip concat)
    h = x
    layer_inputs = []
    for i in range(n_layers):
        if i in skip_idx:
            h = jnp.concatenate([x, h], axis=-1)
        layer_inputs.append(h)
        b = refs[2 * i + 1][:]
        h = _dot(h, w_refs[i][:]) + b
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)

    def relu_out(i):
        nxt = layer_inputs[i + 1]
        if (i + 1) in skip_idx:
            return nxt[:, x.shape[1]:]
        return nxt

    # backward; relu mask via post-activation positivity
    g = g_ref[:]
    dx_acc = jnp.zeros_like(x)
    for i in reversed(range(n_layers)):
        inp = layer_inputs[i]
        if i < n_layers - 1:
            g = g * (relu_out(i) > 0.0)
        dw_refs[i][:] += _dot_tn(inp, g)
        db_refs[i][:] += jnp.sum(g, axis=0, keepdims=True)
        g = _dot_nt(g, w_refs[i][:])
        if i in skip_idx:
            dx_acc = dx_acc + g[:, : x.shape[1]]
            g = g[:, x.shape[1]:]
    dx_ref[:] = dx_acc + g


def _bwd(x, g, weights, biases, skip_idx):
    n_layers = len(weights)
    TILE = TILE_P_BWD
    xp, P = _pad_rows(x, TILE)
    gp, _ = _pad_rows(g, TILE)
    grid = (xp.shape[0] // TILE,)

    in_specs = [
        pl.BlockSpec((TILE, x.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, g.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xp, gp]
    for w, b in zip(weights, biases):
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        args += [w, b.reshape(1, -1)]

    out_shapes = [jax.ShapeDtypeStruct((xp.shape[0], x.shape[1]), jnp.float32)]
    out_specs = [
        pl.BlockSpec((TILE, x.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ]
    for w in weights:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    for b in biases:
        out_shapes.append(jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )

    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, n_layers=n_layers, skip_idx=tuple(skip_idx)
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=_interpret(),
    )(*args)
    dx = outs[0][:P]
    dws = outs[1 : 1 + n_layers]
    dbs = [b.reshape(-1) for b in outs[1 + n_layers :]]
    return dx, list(dws), dbs


# ------------------------------------------------------------- public API


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_relu_mlp(x, weights, biases, skip_idx=(), final_act=False):
    """Fused D-layer MLP: relu between layers, optional input-skip concat
    at layer indices in skip_idx, optional relu on the output.

    Args:
        x: (P, C_in) float32 points
        weights: list of (C_i, W_i) kernels; biases: list of (W_i,)
    Returns:
        (P, W_last)
    """
    return _fwd(x, list(weights), list(biases), skip_idx, final_act)


def _vjp_fwd(x, weights, biases, skip_idx, final_act):
    out = _fwd(x, list(weights), list(biases), skip_idx, final_act)
    return out, (x, list(weights), list(biases), out if final_act else None)


def _vjp_bwd(skip_idx, final_act, res, g):
    x, weights, biases, out = res
    if final_act:
        g = g * (out > 0.0)
    dx, dws, dbs = _bwd(x, g, weights, biases, skip_idx)
    return dx, dws, dbs


fused_relu_mlp.defvjp(_vjp_fwd, _vjp_bwd)


def mlp_reference(x, weights, biases, skip_idx=(), final_act=False):
    """jnp oracle with identical semantics (used in tests)."""
    h = x
    n = len(weights)
    for i in range(n):
        if i in skip_idx:
            h = jnp.concatenate([x, h], axis=-1)
        h = h @ weights[i] + biases[i]
        if i < n - 1:
            h = jnp.maximum(h, 0.0)
    if final_act:
        h = jnp.maximum(h, 0.0)
    return h


# ----------------------------------------------------- PE-fused MLP kernel


def _pe_tables(freqs, C):
    """Per-column frequency scales for the lane-wide embedding.

    Embedding layout (shared with embedding.fourier_embed):
        [x (C), sin blocks (F x C), cos blocks (F x C)]
    The angles are computed ELEMENTWISE (tiled x * freq columns) and sin /
    cos are two wide transcendental ops over (T, FC) — no MXU matmuls and
    no phase additions, both of which lose precision that sin() at
    |ang| ~ 2^F amplifies catastrophically.
    """
    freq_col = np.repeat(np.asarray(freqs, np.float32), C)[None]  # (1, FC)
    return freq_col


def _pe_win_cols(window, C, F):
    """(F,) annealing window -> per-embedding-column weights (1, 2FC)."""
    per_freq = jnp.repeat(window.reshape(-1), C)
    return jnp.concatenate([per_freq, per_freq]).reshape(1, -1)


def _pe_build(x, freq_ref, win_ref, n_freqs):
    """Fourier-embed a (T, C) tile in VMEM; returns (X, ang)."""
    xw = jnp.concatenate([x] * n_freqs, axis=-1)  # (T, FC)
    ang = xw * freq_ref[:]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if win_ref is not None:
        emb = emb * win_ref[0]
    return jnp.concatenate([x, emb], axis=-1), ang


def _fold_sum_blocks(a, C):
    """Sum (T, B*C) over its B C-wide blocks with lane-wide pairwise adds."""
    B = a.shape[1] // C
    while B > 1:
        if B % 2:
            a = jnp.concatenate(
                [a[:, :C] + a[:, (B - 1) * C :], a[:, C : (B - 1) * C]], axis=-1
            )
            B -= 1
        half = (B // 2) * C
        a = a[:, :half] + a[:, half:]
        B //= 2
    return a


def _pe_grad_to_x(x, g_embed, ang, freq_ref, win_ref, n_freqs):
    """Pull the embedded-space gradient back to raw coordinates."""
    C = x.shape[1]
    FC = n_freqs * C
    gs = g_embed[:, C : C + FC]
    gc = g_embed[:, C + FC :]
    if win_ref is not None:
        gs = gs * win_ref[0, :FC]
        gc = gc * win_ref[0, FC:]
    dang = (jnp.cos(ang) * gs - jnp.sin(ang) * gc) * freq_ref[:]
    return g_embed[:, :C] + _fold_sum_blocks(dang, C)


def _pe_fwd_kernel(x_ref, freq_ref, *refs,
                   n_layers, skip_idx, has_win, n_freqs):
    out_ref = refs[-1]
    win_ref = refs[0] if has_win else None
    wb = refs[1:-1] if has_win else refs[:-1]
    x, _ = _pe_build(x_ref[:], freq_ref, win_ref, n_freqs)
    h = x
    for i in range(n_layers):
        if i in skip_idx:
            h = jnp.concatenate([x, h], axis=-1)
        h = _dot(h, wb[2 * i][:]) + wb[2 * i + 1][:]
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    out_ref[:] = h


def _pe_bwd_kernel(x_ref, g_ref, freq_ref, *refs,
                   n_layers, skip_idx, has_win, n_freqs):
    win_ref = refs[0] if has_win else None
    wb = refs[1:] if has_win else refs
    num_w = n_layers
    w_refs = [wb[2 * i] for i in range(num_w)]
    dx_ref = wb[2 * num_w]
    dw_refs = [wb[2 * num_w + 1 + i] for i in range(num_w)]
    db_refs = [wb[2 * num_w + 1 + num_w + i] for i in range(num_w)]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for i in range(num_w):
            dw_refs[i][:] = jnp.zeros_like(dw_refs[i])
            db_refs[i][:] = jnp.zeros_like(db_refs[i])

    x_raw = x_ref[:]
    x, ang = _pe_build(x_raw, freq_ref, win_ref, n_freqs)
    h = x
    layer_inputs = []
    for i in range(n_layers):
        if i in skip_idx:
            h = jnp.concatenate([x, h], axis=-1)
        layer_inputs.append(h)
        h = _dot(h, w_refs[i][:]) + wb[2 * i + 1][:]
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)

    def relu_out(i):
        nxt = layer_inputs[i + 1]
        if (i + 1) in skip_idx:
            return nxt[:, x.shape[1]:]
        return nxt

    g = g_ref[:]
    dX = jnp.zeros_like(x)
    for i in reversed(range(n_layers)):
        inp = layer_inputs[i]
        if i < n_layers - 1:
            g = g * (relu_out(i) > 0.0)
        dw_refs[i][:] += _dot_tn(inp, g)
        db_refs[i][:] += jnp.sum(g, axis=0, keepdims=True)
        g = _dot_nt(g, w_refs[i][:])
        if i in skip_idx:
            dX = dX + g[:, : x.shape[1]]
            g = g[:, x.shape[1]:]
    dX = dX + g
    dx_ref[:] = _pe_grad_to_x(x_raw, dX, ang, freq_ref, win_ref, n_freqs)


def _pe_specs(x, window, weights, biases, freqs, tile):
    C = x.shape[1]
    freq_col = _pe_tables(freqs, C)
    in_specs = [
        pl.BlockSpec((tile, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(freq_col.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(freq_col)]
    if window is not None:
        win_cols = _pe_win_cols(window, C, len(freqs))
        in_specs.append(
            pl.BlockSpec((1, win_cols.shape[-1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(win_cols)
    for w, b in zip(weights, biases):
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        args += [w, b.reshape(1, -1)]
    return in_specs, args


def _pe_fwd(x, window, weights, biases, freqs, skip_idx, final_act):
    n_layers = len(weights)
    out_dim = weights[-1].shape[1]
    xp, P = _pad_rows(x, TILE_P)
    grid = (xp.shape[0] // TILE_P,)
    in_specs, args = _pe_specs(x, window, weights, biases, freqs, TILE_P)

    out = pl.pallas_call(
        functools.partial(
            _pe_fwd_kernel, n_layers=n_layers, skip_idx=tuple(skip_idx),
            has_win=window is not None, n_freqs=len(freqs),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TILE_P, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], out_dim), jnp.float32),
        interpret=_interpret(),
    )(xp, *args)
    out = out[:P]
    if final_act:
        out = jnp.maximum(out, 0.0)
    return out


def _pe_bwd_call(x, g, window, weights, biases, freqs, skip_idx):
    n_layers = len(weights)
    TILE = TILE_P_BWD
    xp, P = _pad_rows(x, TILE)
    gp, _ = _pad_rows(g, TILE)
    grid = (xp.shape[0] // TILE,)
    in_specs, args = _pe_specs(x, window, weights, biases, freqs, TILE)
    in_specs.insert(1, pl.BlockSpec((TILE, g.shape[1]), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM))

    out_shapes = [jax.ShapeDtypeStruct((xp.shape[0], x.shape[1]), jnp.float32)]
    out_specs = [
        pl.BlockSpec((TILE, x.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ]
    for w in weights:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    for b in biases:
        out_shapes.append(jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )

    outs = pl.pallas_call(
        functools.partial(
            _pe_bwd_kernel, n_layers=n_layers, skip_idx=tuple(skip_idx),
            has_win=window is not None, n_freqs=len(freqs),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=_interpret(),
    )(xp, gp, *args)
    dx = outs[0][:P]
    dws = outs[1 : 1 + n_layers]
    dbs = [b.reshape(-1) for b in outs[1 + n_layers :]]
    return dx, dws, dbs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_pe_mlp(x, window, weights, biases, freqs, skip_idx=(), final_act=False):
    """Fourier-embed + fused MLP in one kernel pass.

    The embedding (PosEmbedding layout: [x, per-freq sin/cos blocks],
    optional per-freq annealing window) is computed in VMEM per tile, so
    the (P, C_embed) feature matrix never exists in HBM.

    Args:
        x: (P, C) raw coordinates; window: (F,) annealing weights or None
        weights/biases: MLP params consuming fourier_embed_dim(C, F) inputs
        freqs: static tuple of frequency band values
    """
    return _pe_fwd(x, window, list(weights), list(biases), freqs, skip_idx,
                   final_act)


def _pe_vjp_fwd(x, window, weights, biases, freqs, skip_idx, final_act):
    out = _pe_fwd(x, window, list(weights), list(biases), freqs, skip_idx,
                  final_act)
    return out, (x, window, list(weights), list(biases),
                 out if final_act else None)


def _pe_vjp_bwd(freqs, skip_idx, final_act, res, g):
    x, window, weights, biases, out = res
    if final_act:
        g = g * (out > 0.0)
    dx, dws, dbs = _pe_bwd_call(x, g, window, weights, biases, freqs, skip_idx)
    dwin = None if window is None else jnp.zeros_like(window)
    return dx, dwin, list(dws), list(dbs)


fused_pe_mlp.defvjp(_pe_vjp_fwd, _pe_vjp_bwd)


def pe_mlp_reference(x, window, weights, biases, freqs, skip_idx=(),
                     final_act=False):
    """jnp oracle (layout shared via embedding.fourier_embed)."""
    from lab4d_tpu.nnutils.embedding import fourier_embed

    embed = fourier_embed(x, freqs, window)
    return mlp_reference(embed, weights, biases, skip_idx, final_act)
