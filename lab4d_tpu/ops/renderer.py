"""Differentiable volume rendering primitives (jnp).

Parity target: lab4d/utils/render_utils.py. All functions keep static
shapes: rays (M, N), samples D fixed, so the whole pipeline jits into a
fused XLA program; the transmittance cumsum maps to an efficient on-chip
scan.
"""

from __future__ import annotations

import numpy as np
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def permutation_gather(indices: jnp.ndarray, packed: jnp.ndarray):
    """values[..., indices, :] as a one-hot permutation MATMUL.

    indices: (..., N) int indices into the S axis of packed (..., S, C);
    returns (..., N, C). A batched take_along_axis broadcast over many
    channels lowers to serial dynamic-slices on TPU (measured 2.5x
    slower on the merged-eval depth sort); the one-hot einsum is a
    single fused MXU contraction. Exact — one_hot rows are exactly one
    1.0. Shared by the eval depth-sort merge (nerf.query_field_eval),
    the comp-field compose (multifields.compose_fields), and
    sample_pdf's inverse-CDF lookups."""
    onehot = jax.nn.one_hot(indices, packed.shape[-2], dtype=packed.dtype)
    return jnp.einsum("...ns,...sc->...nc", onehot, packed)


def sample_cam_rays(
    hxy: jnp.ndarray,
    Kinv: jnp.ndarray,
    near_far: jnp.ndarray,
    n_depth: int = 64,
    depth: Optional[jnp.ndarray] = None,
    perturb: bool = False,
    rng: Optional[jax.Array] = None,
):
    """Sample points along camera rays.

    Args:
        hxy: (M, N, 3) homogeneous pixel coordinates
        Kinv: (M, 3, 3) inverse intrinsics
        near_far: (M, 2) near/far planes
        n_depth: samples per ray (ignored if depth given)
        depth: optional (M, N, D, 1) fixed depths
        perturb: stratified jitter (requires rng)
    Returns:
        xyz (M,N,D,3) cam-space points, dir (M,N,D,3) unit directions,
        deltas (M,N,D,1) inter-sample distances, depth (M,N,D,1)
    """
    raydir = jnp.einsum("mni,mji->mnj", hxy, Kinv)  # == hxy @ Kinv^T
    dir_norm = jnp.linalg.norm(raydir, axis=-1, keepdims=True)  # (M, N, 1)

    if depth is None:
        z = jnp.linspace(0.0, 1.0, n_depth)
        depth = near_far[:, None, 0:1] * (1 - z) + near_far[:, None, 1:2] * z
        depth = jnp.broadcast_to(
            depth[:, :, :, None], (hxy.shape[0], hxy.shape[1], n_depth, 1)
        )
    else:
        n_depth = depth.shape[2]

    if perturb:
        mid = 0.5 * (depth[:, :, :-1] + depth[:, :, 1:])
        upper = jnp.concatenate([mid, depth[:, :, -1:]], axis=2)
        lower = jnp.concatenate([depth[:, :, :1], mid], axis=2)
        u = jax.random.uniform(rng, depth.shape, dtype=depth.dtype)
        depth = lower + (upper - lower) * u

    xyz = raydir[:, :, None, :] * depth  # (M, N, D, 3)

    deltas = depth[:, :, 1:] - depth[:, :, :-1]
    deltas = jnp.concatenate([deltas, deltas[:, :, -1:]], axis=2)
    deltas = deltas * dir_norm[:, :, None, :]

    unit_dir = raydir / jnp.maximum(dir_norm, 1e-12)
    unit_dir = jnp.broadcast_to(unit_dir[:, :, None, :], xyz.shape)
    return xyz, unit_dir, deltas, depth


def compute_weights(density: jnp.ndarray, deltas: jnp.ndarray):
    """Volume-rendering weights and transmittance.

    Parity: render_utils.py:99-126.
        weights_i = alpha_i * prod_{j<i}(1 - alpha_j),
        transmit_i = prod_{j<=i}(1 - alpha_j)  (exp-transmittance form)
    """
    # squeeze BEFORE multiplying: (M,N,D,1) elementwise ops waste 127/128
    # lanes of every (8,128) tile; (M,N,D) keeps the D axis minor
    tau = deltas[..., 0] * density[..., 0]  # (M, N, D)
    alpha = 1.0 - jnp.exp(-tau)
    # (a triangular-matmul cumsum was tried here; at default TPU matmul
    # precision it drifts from jnp.cumsum via bf16 rounding and measured
    # no faster at D=64, so the plain cumsum stays)
    cum = jnp.cumsum(tau, axis=-1)
    transmit_incl = jnp.exp(-cum)  # T_{i+1} = exp(-sum_{j<=i} tau_j)
    transmit_excl = jnp.concatenate(
        [jnp.ones_like(transmit_incl[..., :1]), transmit_incl[..., :-1]], axis=-1
    )
    weights = alpha * transmit_excl
    return weights, transmit_incl


# keys integrated with frozen (detached) normalized weights
_KEY_FREEZE = ("cyc_dist", "xyz_cam", "skin_entropy")
# keys not integrated (handled specially or left per-sample)
_KEY_SKIP = (
    "density",
    "vis",
    "flow",
    "eikonal",
    "xy_reproj",
    "xyz_reproj",
    "gauss_density",
)


def render_pixel(field_dict: Dict[str, jnp.ndarray], deltas: jnp.ndarray):
    """Volume-render field outputs along rays. Parity: render_utils.py:59-96.

    A fully-fused Pallas volume-render kernel was built and measured here
    in rounds 1-3: numerically exact but SLOWER than this XLA path on v5e
    both in training (129k vs 178k rays/s end-to-end) and in eval fusion
    (685 ms vs ~310 ms per 512px frame) — its block-identity-matmul
    formulation of the per-ray<->per-sample moves does ~RT x the minimal
    integration FLOPs, and XLA already fuses the cumsum/exp/weighted-sum
    chain. Deleted in round 4; measurements kept in docs/performance.md."""
    weights, transmit = compute_weights(field_dict["density"], deltas)
    rendered = integrate(field_dict, weights)

    if "eikonal" in field_dict:
        rendered["eikonal"] = field_dict["eikonal"].mean(axis=(-1, -2))
    if "delta_skin" in field_dict:
        rendered["delta_skin"] = field_dict["delta_skin"].mean(axis=(-1, -2))

    # visibility BCE: -E_t[ transmit * logsigmoid(vis) ], normalized by mean
    # visibility so the loss scale is transmittance-invariant. Computed on
    # the squeezed (M,N,D) layout (see compute_weights). Absent when the
    # eval channel subset skipped the vis head (nerf._eval_channels).
    if "vis" in field_dict:
        is_visible = jax.lax.stop_gradient(transmit)
        vis_loss = -jnp.mean(
            jax.nn.log_sigmoid(field_dict["vis"][..., 0]) * is_visible,
            axis=-1, keepdims=True,
        )
        vis_loss = vis_loss / jax.lax.stop_gradient(
            jnp.maximum(is_visible.mean(), 1e-6)
        )
        rendered["vis"] = vis_loss

    if "gauss_density" in field_dict:
        gauss_weights, _ = compute_weights(field_dict["gauss_density"], deltas)
        rendered["gauss_mask"] = jnp.sum(gauss_weights, axis=-1, keepdims=True)
    return rendered


def integrate(field_dict: Dict[str, jnp.ndarray], weights: jnp.ndarray):
    """Integrate per-sample field values into per-ray values.

    Parity: render_utils.py:129-184 (incl. flow-specific weighting, normal
    re-normalization, and density_*->mask_* normalization).
    """
    rendered = {}
    mask = jnp.sum(weights, axis=-1, keepdims=True)
    rendered["mask"] = mask
    w_norm = weights / (mask + 1e-6)

    # pack all integrable channels into ONE tensor per weight flavor and
    # reduce with a single contraction: 16 separate (M,N,D,.) weighted
    # sums (each with its own backward transpose) cost ~4 ms/step in XLA
    # glue; one einsum lowers to a single batched matvec
    groups = {False: [], True: []}  # frozen_weights? -> [(key, value)]
    for k, v in field_dict.items():
        if k in _KEY_SKIP:
            continue
        groups[k in _KEY_FREEZE].append((k, v))
    for frozen, items in groups.items():
        if not items:
            continue
        wt = jax.lax.stop_gradient(w_norm) if frozen else w_norm
        packed = (
            items[0][1]
            if len(items) == 1
            else jnp.concatenate([v for _, v in items], axis=-1)
        )
        # elementwise+reduce rather than an einsum matvec: the einsum made
        # XLA pick a channel-major layout for `packed`, forcing relayout
        # copies of every pallas (P,C) output feeding it (the ~1.7 ms
        # copy tail in the round-5 profile); the VPU reduce accepts the
        # producers' layout (A/B: 21.03 vs 21.23 ms/step train)
        out = jnp.sum(wt[..., None] * packed, axis=-2)
        off = 0
        for k, v in items:
            rendered[k] = out[..., off : off + v.shape[-1]]
            off += v.shape[-1]

    if "flow" in field_dict:
        w_flow = weights * field_dict["flow"][..., 2]
        w_flow = w_flow / (jnp.sum(w_flow, axis=-1, keepdims=True) + 1e-6)
        rendered["flow"] = jnp.sum(
            w_flow[..., None] * field_dict["flow"][..., :2], axis=-2
        )

    if "normal" in rendered:
        n = rendered["normal"]
        rendered["normal"] = n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6
        )

    # normalize per-field densities into composition masks
    dens_keys = [k for k in rendered if k.startswith("density_")]
    if dens_keys:
        total = sum(rendered[k] for k in dens_keys) + 1e-6
        for k in dens_keys:
            rendered["mask_" + k[len("density_"):]] = rendered[k] / total
            del rendered[k]
    return rendered


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_importance: int,
    det: bool = False,
    rng: Optional[jax.Array] = None,
    eps: float = 1e-5,
):
    """Inverse-CDF importance sampling along rays.

    Parity: render_utils.py:187-233.

    Args:
        bins: (R, S-1) depth bin midpoints; weights: (R, S-2)
    Returns:
        samples: (R, n_importance) sampled depths
    """
    R, S = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (R, S+1)

    if det:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_importance), (R, n_importance))
    else:
        u = jax.random.uniform(rng, (R, n_importance))

    # broadcast bucket search: (R, n, S+1) comparisons lower to one fused
    # VPU pass; a vmapped searchsorted lowers to per-element gathers
    # (profiled at ~27 ms per 8k-ray chunk on v5e)
    inds = jnp.sum(cdf[:, None, :] <= u[:, :, None], axis=-1).astype(jnp.int32)
    below = jnp.clip(inds - 1, 0, S)
    above = jnp.clip(inds, 0, S)

    # gather cdf+bin values via permutation_gather (one matmul per index
    # tensor) instead of four take_along_axis calls; the bins table is
    # edge-padded to S+1 entries so index clamping matches the original
    # clip(idx, 0, bins.shape[1]-1)
    B = bins.shape[1]
    if B < S + 1:
        binsp = jnp.concatenate(
            [bins, jnp.repeat(bins[:, -1:], S + 1 - B, axis=1)], axis=-1
        )
    else:
        binsp = bins[:, : S + 1]
    packed = jnp.stack([cdf, binsp], axis=-1)  # (R, S+1, 2)
    pick_b = permutation_gather(below, packed)
    pick_a = permutation_gather(above, packed)
    cdf_b, bins_b = pick_b[..., 0], pick_b[..., 1]
    cdf_a, bins_a = pick_a[..., 0], pick_a[..., 1]

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)
