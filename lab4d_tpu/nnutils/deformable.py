"""Deformable (dynamic) neural field = FeatureNeRF + warp field (flax).

Parity: lab4d/nnutils/deformable.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from lab4d_tpu.nnutils.feature import FeatureNeRF
from lab4d_tpu.nnutils.warping import (
    ComposedWarp,
    DenseWarp,
    IdentityWarp,
    SkinningWarp,
    parse_warp_type,
)


class Deformable(FeatureNeRF):
    """Dynamic field: backward warp un-articulates observed time-t points to
    the canonical frame; articulations are cached per batch in get_samples
    (one batched FK)."""

    fg_motion: str = "rigid"
    joint_angles_init: Optional[np.ndarray] = None

    def setup(self):
        super().setup()
        spec = parse_warp_type(self.fg_motion)
        kwargs = dict(spec["kwargs"])
        kwargs["frame_info"] = self.frame_info
        if spec["cls"] in (SkinningWarp, ComposedWarp):
            kwargs["joint_angles_init"] = self.joint_angles_init
        self.warp = spec["cls"](**kwargs)

    @property
    def has_skinning(self):
        return self.fg_motion not in ("rigid", "dense")

    # ------------------------------------------------------------- warping

    def backward_warp(
        self, xyz_cam, dir_cam, field2cam, frame_id, inst_id, samples_dict=None
    ):
        """Camera -> time-t object space -> canonical (deformable.py:119-152)."""
        xyz_t, dir = self.cam_to_field(xyz_cam, dir_cam, field2cam)
        xyz, warp_dict = self.warp(
            xyz_t, frame_id, inst_id, backward=True, samples_dict=samples_dict
        )
        out = {"xyz": xyz, "dir": dir, "xyz_t": xyz_t}
        out.update(warp_dict)
        return out

    def forward_warp(self, xyz, field2cam, frame_id, inst_id, samples_dict=None):
        """Canonical -> time-t -> camera (deformable.py:154-171)."""
        xyz_next, _ = self.warp(
            xyz, frame_id, inst_id, backward=False, samples_dict=samples_dict
        )
        return self.field_to_cam(xyz_next, field2cam)

    def prepare_forward_warp(self, xyz, inst_id, samples_dict):
        """Precompute forward-skin weights once for the flow + cycle paths.

        Valid only for the plain SkinningWarp: its forward skin is a
        function of (canonical xyz, rest articulation, mean time embedding,
        inst) — none of which differ between the two call sites.
        ComposedWarp post-warps the points per frame first, so it is
        excluded.
        """
        if (
            type(self.warp) is SkinningWarp
            and samples_dict is not None
            and "rest_articulation" in samples_dict
        ):
            skin, delta = self.warp.skinning_model(
                xyz, samples_dict["rest_articulation"], None, inst_id
            )
            samples_dict = dict(samples_dict)
            samples_dict["fwd_skin"] = (skin, delta)
        return samples_dict

    # --------------------------------------------------------------- losses

    def cycle_loss(self, xyz, xyz_t, frame_id, inst_id, samples_dict=None, train=True):
        """Canonical -> fwd warp -> compare against time-t points
        (deformable.py:173-198)."""
        cyc_dict = super().cycle_loss(
            xyz, xyz_t, frame_id, inst_id, samples_dict, train
        )
        if not train:
            return cyc_dict
        xyz_cycled, warp_dict = self.warp(
            xyz, frame_id, inst_id, backward=False, samples_dict=samples_dict
        )
        from lab4d_tpu.utils.geom import safe_norm

        cyc_dict["cyc_dist"] = safe_norm(xyz_cycled - xyz_t)
        cyc_dict.update(warp_dict)
        return cyc_dict

    def compute_flow_cycle(
        self, hxy, xyz, xyz_t, frame_id, inst_id, field2cam, Kinv,
        samples_dict, flow_thresh=None,
    ):
        """Fused flow + cycle warps: both forward-warp the SAME canonical
        points with the SAME cached skin weights (prepare_forward_warp)
        and differ only in the per-bone SE(3)s (t vs flipped-t, composed
        with rest^-1), so the softmax, hemisphere anchor, blend matmuls
        and quaternion apply run once on pair-stacked arrays
        (dual_quaternion_skinning_pair). Numerically identical to the
        separate compute_flow + cycle_loss path (tests/test_flow_cycle.py).
        Parity: nerf.py:948-997 + deformable.py:173-198."""
        fwd_skin = None if samples_dict is None else samples_dict.get("fwd_skin")
        if type(self.warp) is not SkinningWarp or fwd_skin is None:
            return super().compute_flow_cycle(
                hxy, xyz, xyz_t, frame_id, inst_id, field2cam, Kinv,
                samples_dict, flow_thresh=flow_thresh,
            )
        from lab4d_tpu.nnutils.nerf import flip_pair
        from lab4d_tpu.utils.geom import (
            Kmatinv,
            dual_quaternion_skinning_pair,
            pinhole_projection,
            safe_norm,
        )
        from lab4d_tpu.utils.loss import cross_entropy_skin_loss
        from lab4d_tpu.utils.quat import (
            dual_quaternion_inverse,
            dual_quaternion_mul,
        )

        skin, delta = fwd_skin
        rest = samples_dict["rest_articulation"]
        t_art = samples_dict["t_articulation"]
        t_next = (flip_pair(t_art[0]), flip_pair(t_art[1]))
        rest_next = (flip_pair(rest[0]), flip_pair(rest[1]))
        se3_cyc = dual_quaternion_mul(t_art, dual_quaternion_inverse(rest))
        se3_flow = dual_quaternion_mul(
            t_next, dual_quaternion_inverse(rest_next)
        )
        skin_prob = jax.nn.softmax(skin, axis=-1)
        xyz_cyc, xyz_next = dual_quaternion_skinning_pair(
            se3_cyc, se3_flow, xyz, skin_prob
        )

        cyc_dict = {
            "cyc_dist": safe_norm(xyz_cyc - xyz_t),
            "skin_entropy": cross_entropy_skin_loss(skin)[..., None],
        }
        if delta is not None:
            cyc_dict["delta_skin"] = jnp.mean(delta**2, axis=-1, keepdims=True)
        else:
            # keep loss_dict/logging keys identical to the separate
            # compute_flow + cycle_loss path for delta_skin=False configs
            cyc_dict["delta_skin"] = jnp.zeros_like(cyc_dict["cyc_dist"])

        field2cam_next = (flip_pair(field2cam[0]), flip_pair(field2cam[1]))
        Kinv_next = flip_pair(Kinv)
        xyz_cam_next = self.field_to_cam(xyz_next, field2cam_next)
        hxy_next = pinhole_projection(Kmatinv(Kinv_next), xyz_cam_next)
        flow = (hxy_next - hxy[:, :, None])[..., :2]
        xyz_valid = xyz_cam_next[..., -1:] > 1e-6
        if flow_thresh is not None:
            mag = jnp.linalg.norm(flow, axis=-1, keepdims=True)
            xyz_valid = xyz_valid & (mag < float(flow_thresh))
        flow = jnp.concatenate([flow, xyz_valid.astype(flow.dtype)], axis=-1)
        return {"flow": flow}, cyc_dict

    def gauss_skin_consistency_loss(self, aabb, sched=None, nsample: int = 2048):
        """BCE-align Gaussian-bone density with the field's own density
        (deformable.py:200-236)."""
        if not isinstance(self.warp, SkinningWarp):
            return jnp.zeros(())
        pts = self.sample_points_aabb(
            self.make_rng("aux"), aabb, nsample, extend_factor=0.25
        )
        density_gauss = self.warp.get_gauss_density(pts)  # (N,1)
        density = self.forward(pts, inst_id=None, get_density=True, sched=sched)
        density = jax.lax.stop_gradient(density / jnp.exp(self.logibeta))
        density = jnp.clip(density, 0.0, 1.0)

        weight_pos = 0.5 / (1e-6 + density.mean())
        weight_neg = 0.5 / (1e-6 + (1 - density).mean())
        weight = jax.lax.stop_gradient(
            density * weight_pos + (1 - density) * weight_neg
        )
        dg = jnp.clip(density_gauss, 1e-6, 1 - 1e-6)
        bce = -(density * jnp.log(dg) + (1 - density) * jnp.log(1 - dg))
        return jnp.mean(bce * weight)

    def soft_deform_loss(self, aabb, sched=None, nsample: int = 1024):
        """Penalize the soft post-warp displacement (deformable.py:238-252)."""
        if not isinstance(self.warp, ComposedWarp):
            return jnp.zeros(())
        r1, r2, r3 = jax.random.split(self.make_rng("aux"), 3)
        pts = self.sample_points_aabb(r1, aabb, nsample, extend_factor=1.0)
        frame_id = jax.random.randint(
            r2, (nsample,), 0, self.frame_info.num_frames_raw
        )
        inst_id = jax.random.randint(r3, (nsample,), 0, self.warp.num_inst)
        dist2 = self.warp.compute_post_warp_dist2(
            pts[:, None, None], frame_id, inst_id
        )
        return dist2.mean()

    def skel_prior_loss(self):
        if isinstance(self.warp, SkinningWarp) and self.warp.skel_type != "flat":
            return self.warp.articulation.skel_prior_loss()
        return jnp.zeros(())

    # --------------------------------------------------------------- queries

    def get_samples(self, Kinv, batch, train: bool = True):
        """Adds cached articulations (one batched FK) to the samples dict
        (deformable.py:254-289)."""
        samples_dict = super().get_samples(Kinv, batch, train=train)
        if isinstance(self.warp, SkinningWarp):
            frame_id = samples_dict["frame_id"]
            if "joint_so3" in batch:
                samples_dict["rest_articulation"] = (
                    self.warp.articulation.get_mean_vals()
                )
                samples_dict["t_articulation"] = self.warp.articulation.get_vals(
                    frame_id, override_so3=batch["joint_so3"]
                )
            else:
                (
                    samples_dict["t_articulation"],
                    samples_dict["rest_articulation"],
                ) = self.warp.articulation.get_vals_and_mean(frame_id)
        return samples_dict

    def query_field(self, samples_dict, sched=None, train=True, flow_thresh=None):
        feat_dict, deltas, aux_dict = super().query_field(
            samples_dict, sched=sched, train=train, flow_thresh=flow_thresh
        )
        from lab4d_tpu.nnutils.nerf import _eval_wants

        if train or _eval_wants("gauss_mask"):
            gauss_field = self.compute_gauss_density(
                feat_dict["xyz"], samples_dict
            )
            feat_dict.update(gauss_field)
        return feat_dict, deltas, aux_dict

    def compute_gauss_density(self, xyz, samples_dict):
        """Bone-Gaussian density along rays for the gauss_mask loss
        (deformable.py:329-356)."""
        if not isinstance(self.warp, SkinningWarp):
            return {}
        shape = xyz.shape[:-1]
        rest_articulation = (
            samples_dict["rest_articulation"][0][:1],
            samples_dict["rest_articulation"][1][:1],
        )
        xyz = xyz.reshape(-1, 3)
        gauss_density = self.warp.get_gauss_density(
            xyz, bone2obj=rest_articulation
        )
        gauss_density = gauss_density * jnp.exp(self.warp.logibeta)
        return {"gauss_density": gauss_density.reshape(shape + (1,))}
