"""Quaternion and dual-quaternion algebra in pure jnp.

Functional parity with the reference library (lab4d/utils/quat_transform.py)
which dispatches to custom CUDA kernels for quaternion_mul/conjugate
(lab4d/third_party/quaternion/src/quaternion.cu:30-123). Under XLA those
hand-written kernels are unnecessary: the elementwise chains fuse, and
double-backward (needed because the eikonal loss differentiates through
skinning) falls out of ordinary jax autodiff.

Conventions: quaternions are (..., 4) arrays, real part first (w, x, y, z).
A dual quaternion is a tuple (q_r, q_d) of two (..., 4) arrays.
SE(3) is represented either as a (quat, trans) tuple or a (..., 4, 4) matrix.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

DualQuaternion = Tuple[jnp.ndarray, jnp.ndarray]
QuaternionTranslation = Tuple[jnp.ndarray, jnp.ndarray]


def quaternion_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a quaternion (= inverse for unit quaternions)."""
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the real part is non-negative."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quaternion_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of two quaternions; broadcasts like jnp."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_apply(q: jnp.ndarray, pt: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3D points by unit quaternions.

    Uses the expanded Rodrigues form (2 cross products) rather than
    q * p * q^-1, which is cheaper and equally fusible under XLA.
    """
    qw = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, pt)
    uuv = jnp.cross(qv, uv)
    return pt + 2.0 * (qw * uv + uuv)


def quaternion_translation_apply(
    q: jnp.ndarray, t: jnp.ndarray, pt: jnp.ndarray
) -> jnp.ndarray:
    return quaternion_apply(q, pt) + t


def quaternion_translation_inverse(
    q: jnp.ndarray, t: jnp.ndarray
) -> QuaternionTranslation:
    q_inv = quaternion_conjugate(q)
    return q_inv, quaternion_apply(q_inv, -t)


def quaternion_translation_mul(
    qt1: QuaternionTranslation, qt2: QuaternionTranslation
) -> QuaternionTranslation:
    q1, t1 = qt1
    q2, t2 = qt2
    return quaternion_mul(q1, q2), quaternion_apply(q1, t2) + t1


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Convert axis-angle vectors (angle = norm) to unit quaternions.

    Small-angle branch uses the series sin(x/2)/x ~= 1/2 - x^2/48 to stay
    differentiable at zero.
    """
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(sq, 1e-24))
    half = 0.5 * angle
    small = angle < 1e-6
    sin_half_over_angle = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angle)
    return jnp.concatenate(
        [jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1
    )


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Convert quaternions (not necessarily unit) to rotation matrices."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    s = 2.0 / jnp.sum(q * q, axis=-1)
    row0 = jnp.stack(
        [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)], -1
    )
    row1 = jnp.stack(
        [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)], -1
    )
    row2 = jnp.stack(
        [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)], -1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """Convert rotation matrices to quaternions (wxyz, real part >= 0 not
    enforced). Branch-free variant of the Shepperd method: compute all four
    candidate quaternions and select the best-conditioned one.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    # candidate quaternions, each scaled by the corresponding q_abs component
    cand = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
        ],
        axis=-2,
    )
    cand = cand / (2.0 * jnp.maximum(q_abs[..., None], 0.1))
    best = jnp.argmax(q_abs, axis=-1)
    return jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]


def quaternion_translation_to_se3(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(q, t) -> (..., 4, 4) SE(3) matrix."""
    rmat = quaternion_to_matrix(q)
    top = jnp.concatenate([rmat, t[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_to_quaternion_translation(se3: jnp.ndarray, tuple_out: bool = True):
    q = matrix_to_quaternion(se3[..., :3, :3])
    t = se3[..., :3, 3]
    if tuple_out:
        return q, t
    return jnp.concatenate([q, t], axis=-1)


# ----------------------------- dual quaternions -----------------------------


def quaternion_translation_to_dual_quaternion(
    q: jnp.ndarray, t: jnp.ndarray
) -> DualQuaternion:
    return q, 0.5 * quaternion_mul(jnp.concatenate([jnp.zeros_like(t[..., :1]), t], -1), q)


def dual_quaternion_to_quaternion_translation(
    dq: DualQuaternion,
) -> QuaternionTranslation:
    q_r, q_d = dq
    t = 2.0 * quaternion_mul(q_d, quaternion_conjugate(q_r))[..., 1:]
    return q_r, t


def dual_quaternion_to_se3(dq: DualQuaternion) -> jnp.ndarray:
    q, t = dual_quaternion_to_quaternion_translation(dq)
    return quaternion_translation_to_se3(q, t)


def se3_to_dual_quaternion(se3: jnp.ndarray) -> DualQuaternion:
    q, t = se3_to_quaternion_translation(se3)
    return quaternion_translation_to_dual_quaternion(q, t)


def dual_quaternion_mul(dq1: DualQuaternion, dq2: DualQuaternion) -> DualQuaternion:
    r1, d1 = dq1
    r2, d2 = dq2
    return (
        quaternion_mul(r1, r2),
        quaternion_mul(r1, d2) + quaternion_mul(d1, r2),
    )


def dual_quaternion_q_conjugate(dq: DualQuaternion) -> DualQuaternion:
    return quaternion_conjugate(dq[0]), quaternion_conjugate(dq[1])


def dual_quaternion_inverse(dq: DualQuaternion) -> DualQuaternion:
    """Inverse of a unit dual quaternion (= quaternion conjugate)."""
    return dual_quaternion_q_conjugate(dq)


def dual_quaternion_apply(dq: DualQuaternion, pt: jnp.ndarray) -> jnp.ndarray:
    q, t = dual_quaternion_to_quaternion_translation(dq)
    return quaternion_apply(q, pt) + t


def dual_quaternion_norm(dq: DualQuaternion) -> DualQuaternion:
    return dual_quaternion_mul(dq, dual_quaternion_q_conjugate(dq))


def dual_quaternion_d_conjugate(dq: DualQuaternion) -> DualQuaternion:
    """Dual-number conjugate: (r, d) -> (r, -d) (quat_transform.py:449-450)."""
    return (dq[0], -dq[1])


def dual_quaternion_3rd_conjugate(dq: DualQuaternion) -> DualQuaternion:
    """Combined quaternion + dual conjugate (quat_transform.py:453-455)."""
    return dual_quaternion_d_conjugate(dual_quaternion_q_conjugate(dq))


def dual_quaternion_linear_blend(w: jnp.ndarray, dq_basis: DualQuaternion):
    """Normalized linear blend of dual-quaternion bases
    (quat_transform.py:348-371; handles leading batch dims).

    Args:
        w: (..., N, K) blend weights; dq_basis: ((..., K, T, 4) x 2)
    Returns:
        ((..., N, T, 4) x 2) unit dual quaternions
    """
    br = jnp.einsum("...nk,...ktd->...ntd", w, dq_basis[0])
    bd = jnp.einsum("...nk,...ktd->...ntd", w, dq_basis[1])
    inv = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(br * br, -1, keepdims=True), 1e-12))
    return (br * inv, bd * inv)
