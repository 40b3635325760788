"""Canonical (fg viewpoint) registration as a jitted JAX optimization
(reference: preprocess/libs/torch_models.py CanonicalRegistration).

Optimizes one quaternion per frame so that (a) annotated/predicted
canonical rotations are respected (unary term) and (b) adjacent relative
rotations match the Procrustes chain from camera registration (pairwise
term).  Phase 1 fits pairwise-only (propagates the chain), phase 2 adds
the unary term.  Runs as a single optax Adam loop per phase with an
early-exit tolerance, jit-stepped.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp
import optax

from lab4d_tpu.utils.geom import rot_angle
from lab4d_tpu.utils.quat import (
    matrix_to_quaternion,
    quaternion_to_matrix,
)


def _losses(quats, rel_gt, annot_idx, annot_rot):
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    R = quaternion_to_matrix(q)  # (N,3,3)
    rel = R[1:] @ jnp.swapaxes(R[:-1], -1, -2)
    pairwise = rot_angle(rel @ jnp.swapaxes(rel_gt, -1, -2)).mean()
    unary = rot_angle(
        R[annot_idx] @ jnp.swapaxes(annot_rot, -1, -2)
    ).mean()
    return unary, pairwise


def optimize_canonical_rotations(
    cams_chain: np.ndarray,
    annotations: Dict[int, np.ndarray],
    lr: float = 1e-2,
    max_iters: int = 2000,
) -> np.ndarray:
    """cams_chain: (N,4,4) scene2cam chain; annotations: frame -> 4x4 (or 3x3)
    canonical rotations. Returns (N,3,3) optimized rotations."""
    n = len(cams_chain)
    rel_gt = jnp.asarray(
        cams_chain[1:, :3, :3] @ np.swapaxes(cams_chain[:-1, :3, :3], -1, -2),
        jnp.float32,
    )
    if annotations:
        annot_idx = jnp.asarray(sorted(annotations.keys()), jnp.int32)
        annot_rot = jnp.asarray(
            np.stack([np.asarray(annotations[k])[:3, :3] for k in sorted(annotations)]),
            jnp.float32,
        )
    else:  # gauge-fix frame 0 to identity; pairwise term does the rest
        annot_idx = jnp.zeros((1,), jnp.int32)
        annot_rot = jnp.eye(3, dtype=jnp.float32)[None]

    # init: propagate the first annotation through the chain
    k0 = int(annot_idx[0])
    R0 = np.asarray(annot_rot[0])
    chain = cams_chain[:, :3, :3]
    init = np.zeros((n, 3, 3), np.float32)
    for i in range(n):
        init[i] = chain[i] @ np.linalg.inv(chain[k0]) @ R0
    quats = matrix_to_quaternion(jnp.asarray(init))

    opt = optax.adam(lr)

    @jax.jit
    def step(quats, opt_state, unary_wt):
        def loss_fn(qs):
            unary, pairwise = _losses(qs, rel_gt, annot_idx, annot_rot)
            return unary_wt * unary + pairwise

        loss, grads = jax.value_and_grad(loss_fn)(quats)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(quats, updates), opt_state, loss

    for unary_wt, tol in ((0.0, 0.015), (1.0, 0.030)):
        opt_state = opt.init(quats)
        for i in range(max_iters):
            quats, opt_state, loss = step(quats, opt_state, unary_wt)
            if i % 100 == 0 and float(loss) < tol:
                break

    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    return np.asarray(quaternion_to_matrix(q))
