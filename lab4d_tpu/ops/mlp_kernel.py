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
from typing import Sequence, Tuple

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


def _dot(a, b):
    """MXU matmul with f32 accumulation. Measured: the kernel is VMEM-IO
    bound at these widths (W=128..256), so bf16 inputs don't change its
    runtime — keep f32 for exactness against the jnp oracle."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


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
        dw_refs[i][:] += _dot(inp.T, g)
        db_refs[i][:] += jnp.sum(g, axis=0, keepdims=True)
        g = _dot(g, w_refs[i][:].T)
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
