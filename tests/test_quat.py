"""Math-layer parity tests: quaternion/DQ algebra against scipy and
brute-force references (SURVEY.md stage 1 harness)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from lab4d_tpu.utils import quat as Q


def rand_quat(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def to_scipy(q):  # wxyz -> xyzw
    return np.concatenate([q[..., 1:], q[..., :1]], -1)


class TestQuaternion:
    def test_mul_matches_scipy(self):
        a, b = rand_quat(32, 0), rand_quat(32, 1)
        got = np.asarray(Q.quaternion_mul(jnp.asarray(a), jnp.asarray(b)))
        want = (R.from_quat(to_scipy(a)) * R.from_quat(to_scipy(b))).as_quat()
        want = np.concatenate([want[..., 3:], want[..., :3]], -1)
        # sign-invariant comparison
        sign = np.sign(np.sum(got * want, -1, keepdims=True))
        np.testing.assert_allclose(got, want * sign, atol=1e-6)

    def test_apply_matches_matrix(self):
        q = rand_quat(16)
        pts = np.random.default_rng(2).standard_normal((16, 3))
        got = np.asarray(Q.quaternion_apply(jnp.asarray(q), jnp.asarray(pts)))
        want = np.einsum(
            "nij,nj->ni", R.from_quat(to_scipy(q)).as_matrix(), pts
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_matrix_roundtrip(self):
        q = rand_quat(64, 3)
        m = np.asarray(Q.quaternion_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(
            m, R.from_quat(to_scipy(q)).as_matrix(), atol=1e-5
        )
        q2 = np.asarray(Q.matrix_to_quaternion(jnp.asarray(m)))
        sign = np.sign(np.sum(q2 * q, -1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-5)

    def test_axis_angle(self):
        aa = np.random.default_rng(4).standard_normal((32, 3))
        got = np.asarray(Q.axis_angle_to_quaternion(jnp.asarray(aa)))
        want = R.from_rotvec(aa).as_quat()
        want = np.concatenate([want[..., 3:], want[..., :3]], -1)
        sign = np.sign(np.sum(got * want, -1, keepdims=True))
        np.testing.assert_allclose(got, want * sign, atol=1e-6)
        # differentiable at zero
        g = jax.grad(lambda x: Q.axis_angle_to_quaternion(x).sum())(
            jnp.zeros(3)
        )
        assert np.isfinite(np.asarray(g)).all()

    def test_qt_inverse(self):
        q = rand_quat(8, 5)
        t = np.random.default_rng(6).standard_normal((8, 3))
        qi, ti = Q.quaternion_translation_inverse(jnp.asarray(q), jnp.asarray(t))
        pts = np.random.default_rng(7).standard_normal((8, 3))
        fwd = Q.quaternion_translation_apply(
            jnp.asarray(q), jnp.asarray(t), jnp.asarray(pts)
        )
        back = Q.quaternion_translation_apply(qi, ti, fwd)
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)


class TestDualQuaternion:
    def test_se3_roundtrip(self):
        q = rand_quat(16, 8)
        t = np.random.default_rng(9).standard_normal((16, 3))
        dq = Q.quaternion_translation_to_dual_quaternion(
            jnp.asarray(q), jnp.asarray(t)
        )
        q2, t2 = Q.dual_quaternion_to_quaternion_translation(dq)
        np.testing.assert_allclose(np.asarray(q2), q, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t2), t, atol=1e-5)

    def test_mul_is_compose(self):
        qa, qb = rand_quat(8, 10), rand_quat(8, 11)
        rng = np.random.default_rng(12)
        ta, tb = rng.standard_normal((8, 3)), rng.standard_normal((8, 3))
        dqa = Q.quaternion_translation_to_dual_quaternion(
            jnp.asarray(qa), jnp.asarray(ta)
        )
        dqb = Q.quaternion_translation_to_dual_quaternion(
            jnp.asarray(qb), jnp.asarray(tb)
        )
        dqc = Q.dual_quaternion_mul(dqa, dqb)
        pts = rng.standard_normal((8, 3))
        got = np.asarray(Q.dual_quaternion_apply(dqc, jnp.asarray(pts)))
        want = Q.quaternion_translation_apply(
            jnp.asarray(qa),
            jnp.asarray(ta),
            Q.quaternion_translation_apply(
                jnp.asarray(qb), jnp.asarray(tb), jnp.asarray(pts)
            ),
        )
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)

    def test_inverse(self):
        q = rand_quat(8, 13)
        t = np.random.default_rng(14).standard_normal((8, 3))
        dq = Q.quaternion_translation_to_dual_quaternion(
            jnp.asarray(q), jnp.asarray(t)
        )
        dqi = Q.dual_quaternion_inverse(dq)
        ident = Q.dual_quaternion_mul(dq, dqi)
        np.testing.assert_allclose(
            np.asarray(ident[0][..., 0]), 1.0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ident[1]), 0.0, atol=1e-5
        )

    def test_double_differentiable(self):
        """Eikonal-through-skinning requires grad-of-grad through quaternion
        ops (the reason the reference ships custom CUDA double-backward,
        quaternion.cu:30-123)."""

        def f(x):
            q = Q.axis_angle_to_quaternion(x)
            return jnp.sum(Q.quaternion_apply(q, x) ** 2)

        g2 = jax.hessian(f)(jnp.asarray([0.1, 0.2, 0.3]))
        assert np.isfinite(np.asarray(g2)).all()
