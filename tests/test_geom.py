"""Geometry + renderer op tests (parity harness per SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from lab4d_tpu.utils import geom as G
from lab4d_tpu.utils import quat as Q
from lab4d_tpu.utils import skel as S
from lab4d_tpu.ops import renderer as Rops


class TestKOps:
    def test_K_roundtrip(self):
        K = jnp.asarray([[100.0, 110.0, 32.0, 36.0]])
        Kmat = G.K2mat(K)
        np.testing.assert_allclose(np.asarray(G.mat2K(Kmat)), np.asarray(K))
        ident = np.asarray(G.K2inv(K) @ Kmat)
        np.testing.assert_allclose(ident, np.eye(3)[None], atol=1e-6)

    def test_pinhole(self):
        K = jnp.asarray([[100.0, 100.0, 32.0, 32.0]])
        pts = jnp.asarray([[[0.0, 0.0, 2.0]]])
        hxy = G.pinhole_projection(G.K2mat(K), pts)
        np.testing.assert_allclose(
            np.asarray(hxy)[0, 0], [32.0, 32.0, 1.0], atol=1e-4
        )


class TestSO3:
    def test_exp_map_matches_scipy(self):
        from scipy.spatial.transform import Rotation as R

        v = np.random.default_rng(0).standard_normal((16, 3))
        got = np.asarray(G.so3_to_exp_map(jnp.asarray(v)))
        np.testing.assert_allclose(got, R.from_rotvec(v).as_matrix(), atol=1e-5)


class TestDQSkinning:
    def test_single_bone_is_rigid(self):
        """With one bone and weight 1, DQ skinning == rigid transform."""
        q = Q.axis_angle_to_quaternion(jnp.asarray([[0.3, -0.2, 0.5]]))
        t = jnp.asarray([[0.1, 0.2, -0.3]])
        dq = Q.quaternion_translation_to_dual_quaternion(q, t)
        dq = (dq[0][:, None], dq[1][:, None])  # (1, B=1, 4)
        pts = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, 5, 3)), jnp.float32
        )
        skin = jnp.ones((1, 5, 1))
        out = G.dual_quaternion_skinning(dq, pts, skin)
        want = Q.quaternion_translation_apply(q[:, None], t[:, None], pts)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)

    def test_hemisphere_consistency(self):
        """Blending q and -q must behave like blending q with itself."""
        q = Q.axis_angle_to_quaternion(jnp.asarray([[0.4, 0.1, -0.2]]))
        t = jnp.asarray([[0.05, -0.1, 0.2]])
        dq = Q.quaternion_translation_to_dual_quaternion(q, t)
        dq_pos = (
            jnp.concatenate([dq[0], dq[0]], 0)[None],
            jnp.concatenate([dq[1], dq[1]], 0)[None],
        )
        dq_neg = (
            jnp.concatenate([dq[0], -dq[0]], 0)[None],
            jnp.concatenate([dq[1], -dq[1]], 0)[None],
        )
        pts = jnp.asarray([[[0.3, 0.2, 0.1]]])
        skin = jnp.asarray([[[0.6, 0.4]]])
        out_pos = G.dual_quaternion_skinning(dq_pos, pts, skin)
        out_neg = G.dual_quaternion_skinning(dq_neg, pts, skin)
        np.testing.assert_allclose(
            np.asarray(out_pos), np.asarray(out_neg), atol=1e-5
        )


class TestFK:
    def test_zero_pose_recovers_rest(self):
        skel = S.get_predefined_skeleton("quad")
        local = S.rest_joints_to_local(
            jnp.asarray(skel.rest_joints), skel
        )
        q, t = S.fk_quat_trans(local, jnp.zeros((skel.num_joints, 3)), skel)
        np.testing.assert_allclose(
            np.asarray(t), skel.rest_joints, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(q[..., 0]), 1.0, atol=1e-6
        )

    def test_fk_matches_matrix_chain(self):
        """Quaternion FK == explicit 4x4 matrix chain."""
        skel = S.get_predefined_skeleton("human")
        rng = np.random.default_rng(0)
        so3 = rng.standard_normal((skel.num_joints, 3)) * 0.3
        local = np.asarray(
            S.rest_joints_to_local(jnp.asarray(skel.rest_joints), skel)
        )
        q, t = S.fk_quat_trans(jnp.asarray(local), jnp.asarray(so3), skel)

        # brute-force matrix chain
        mats = [None] * skel.num_joints
        for j in skel.topo_order:
            m = np.eye(4)
            m[:3, :3] = np.asarray(G.so3_to_exp_map(jnp.asarray(so3[j])))
            m[:3, 3] = local[j]
            p = skel.parents[j]
            mats[j] = m if p < 0 else mats[p] @ m
        want_t = np.stack([m[:3, 3] for m in mats])
        want_R = np.stack([m[:3, :3] for m in mats])
        np.testing.assert_allclose(np.asarray(t), want_t, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(Q.quaternion_to_matrix(q)), want_R, atol=1e-5
        )

    def test_shift_joints_to_bones(self):
        skel = S.get_predefined_skeleton("quad")
        joints = jnp.asarray(skel.rest_joints)
        bones = S.shift_joints_to_bones(joints, skel)
        assert bones.shape == joints.shape
        # leaf joints keep their positions
        parents = np.asarray(skel.parents)
        leaves = [
            j for j in range(skel.num_joints) if j not in set(parents[parents >= 0])
        ]
        np.testing.assert_allclose(
            np.asarray(bones)[leaves], skel.rest_joints[leaves], atol=1e-6
        )


class TestRenderer:
    def test_weights_sum_and_transmit(self):
        rng = np.random.default_rng(0)
        density = jnp.asarray(rng.random((2, 3, 8, 1)) * 5)
        deltas = jnp.asarray(np.full((2, 3, 8, 1), 0.1))
        w, T = Rops.compute_weights(density, deltas)
        assert w.shape == (2, 3, 8) and T.shape == (2, 3, 8)
        # weights = alpha_i * prod_{j<i}(1 - alpha_exp_j) brute force
        tau = np.asarray(density)[..., 0] * 0.1
        alpha = 1 - np.exp(-tau)
        Texcl = np.concatenate(
            [np.ones_like(tau[..., :1]), np.exp(-np.cumsum(tau, -1))[..., :-1]],
            -1,
        )
        np.testing.assert_allclose(np.asarray(w), alpha * Texcl, atol=1e-5)
        # opaque medium -> mask ~ 1
        w2, _ = Rops.compute_weights(
            jnp.full((1, 1, 64, 1), 1e4), jnp.full((1, 1, 64, 1), 0.1)
        )
        assert float(w2.sum()) > 0.99

    def test_sample_cam_rays_shapes(self):
        hxy = jnp.asarray(np.random.rand(2, 5, 3), jnp.float32)
        Kinv = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
        near_far = jnp.tile(jnp.asarray([[0.5, 2.0]]), (2, 1))
        xyz, dirs, deltas, depth = Rops.sample_cam_rays(
            hxy, Kinv, near_far, n_depth=16
        )
        assert xyz.shape == (2, 5, 16, 3)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(dirs, axis=-1)), 1.0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(depth[:, :, 0, 0]), 0.5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(depth[:, :, -1, 0]), 2.0, atol=1e-6
        )

    def test_sample_pdf_concentrates(self):
        """Importance samples should land in high-weight bins."""
        bins = jnp.tile(jnp.linspace(0, 1, 31)[None], (4, 1))
        w = np.full((4, 30), 1e-4)
        w[:, 10:15] = 1.0  # peak around bins 10-15 (~0.33-0.5)
        samples = Rops.sample_pdf(bins, jnp.asarray(w), 64, det=True)
        frac = ((samples > 0.3) & (samples < 0.55)).mean()
        assert float(frac) > 0.9

    def test_integrate_mask_and_rgb(self):
        M, N, D = 1, 2, 16
        density = jnp.full((M, N, D, 1), 1e4)
        deltas = jnp.full((M, N, D, 1), 0.1)
        rgb = jnp.ones((M, N, D, 3)) * 0.7
        vis = jnp.zeros((M, N, D, 1))
        out = Rops.render_pixel(
            {"density": density, "rgb": rgb, "vis": vis}, deltas
        )
        np.testing.assert_allclose(np.asarray(out["mask"]), 1.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out["rgb"]), 0.7, atol=1e-3)


class TestNearFar:
    def test_get_near_far(self):
        pts = jnp.asarray(np.random.default_rng(0).standard_normal((64, 3)))
        rt = jnp.eye(4)[None].at[:, 2, 3].set(5.0)
        nf = np.asarray(G.get_near_far(pts, rt, tol_fac=1.0))
        z = np.asarray(pts)[:, 2] + 5
        np.testing.assert_allclose(nf[0], [z.min(), z.max()], atol=1e-5)
