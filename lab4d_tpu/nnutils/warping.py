"""Warp fields (flax): identity / dense-MLP / neural blend skinning /
skeleton+soft composition. Parity: lab4d/nnutils/warping.py.

Interface: warp(xyz, frame_id, inst_id, backward=..., samples_dict=...,
sched=..., train=...) -> (xyz_out, aux_dict).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from lab4d_tpu.nnutils.base import CondMLP
from lab4d_tpu.nnutils.embedding import FrameInfo, PosEmbedding, TimeEmbedding
from lab4d_tpu.nnutils.pose import ArticulationFlatMLP, ArticulationSkelMLP
from lab4d_tpu.nnutils.skinning import SkinningField
from lab4d_tpu.utils.geom import (
    dual_quaternion_skinning,
    get_xyz_bone_distance,
)
from lab4d_tpu.utils.loss import cross_entropy_skin_loss
from lab4d_tpu.utils.quat import (
    dual_quaternion_inverse,
    dual_quaternion_mul,
)


class IdentityWarp(nn.Module):
    """Rigid: no deformation (warping.py:59-102)."""

    frame_info: FrameInfo = None
    num_freq_xyz: int = 10
    num_freq_t: int = 6

    @property
    def num_inst(self):
        return self.frame_info.num_vids

    def __call__(
        self, xyz, frame_id, inst_id, backward=False, samples_dict=None,
        sched=None, train=True,
    ):
        return xyz, {}


class DenseWarp(IdentityWarp):
    """D-NeRF-style dense translation fields, separate fwd/bwd MLPs
    (warping.py:105-170)."""

    D: int = 6
    W: int = 256
    num_freq_xyz: int = 6

    def setup(self):
        self.pos_embedding = PosEmbedding(3, self.num_freq_xyz)
        self.time_embedding = TimeEmbedding(
            num_freq_t=self.num_freq_t, frame_info=self.frame_info
        )
        self.forward_map = CondMLP(
            num_inst=self.num_inst, D=self.D, W=self.W, out_channels=3
        )
        self.backward_map = CondMLP(
            num_inst=self.num_inst, D=self.D, W=self.W, out_channels=3
        )

    def __call__(
        self, xyz, frame_id, inst_id, backward=False, samples_dict=None,
        sched=None, train=True,
    ):
        xyz_embed = self.pos_embedding(xyz)
        t_embed = self.time_embedding(frame_id)
        t_embed = t_embed.reshape((-1,) + (1,) * (xyz.ndim - 2) + (t_embed.shape[-1],))
        t_embed = jnp.broadcast_to(t_embed, xyz.shape[:-1] + t_embed.shape[-1:])
        embed = jnp.concatenate([xyz_embed, t_embed], axis=-1)
        mlp = self.backward_map if backward else self.forward_map
        motion = mlp(embed, inst_id)
        return xyz + motion * 0.1, {}


class NVPWarp(IdentityWarp):
    """Invertible warp: one RealNVP map serves forward and backward
    (warping.py:173-226)."""

    D: int = 2

    def setup(self):
        from lab4d_tpu.nnutils.nvp import NVP

        self.time_embedding = TimeEmbedding(
            num_freq_t=self.num_freq_t, frame_info=self.frame_info
        )
        self.map = NVP(n_layers=self.D)

    def __call__(
        self, xyz, frame_id, inst_id, backward=False, samples_dict=None,
        sched=None, train=True,
    ):
        t_embed = self.time_embedding(frame_id)
        t_embed = t_embed.reshape(
            (-1,) + (1,) * (xyz.ndim - 2) + (t_embed.shape[-1],)
        )
        if backward:
            out = self.map.inverse(t_embed, xyz)
        else:
            out = self.map.forward(t_embed, xyz)
        return out, {}


class SkinningWarp(IdentityWarp):
    """Neural blend skinning: bag-of-bones or skeleton articulation +
    Gaussian skinning + DQ blend (warping.py:229-406)."""

    skel_type: str = "flat"  # "flat" | "human" | "quad"
    joint_angles_init: Optional[np.ndarray] = None
    num_se3: int = 25
    init_gauss_scale: float = 0.03
    init_beta: float = 0.01

    def setup(self):
        if self.skel_type == "flat":
            self.articulation = ArticulationFlatMLP(
                frame_info=self.frame_info, num_se3=self.num_se3
            )
            symm_idx = None
            num_se3 = self.num_se3
        else:
            self.articulation = ArticulationSkelMLP(
                frame_info=self.frame_info,
                skel_type=self.skel_type,
                joint_angles_init=self.joint_angles_init,
            )
            num_se3 = self.articulation.skeleton.num_joints
            symm_idx = self.articulation.skeleton.symm_idx

        self.skinning_model = SkinningField(
            num_coords=num_se3,
            frame_info=self.frame_info,
            num_inst=self.num_inst,
            init_scale=self.init_gauss_scale,
            symm_idx=symm_idx,
        )
        self.logibeta = self.param(
            "logibeta", lambda k, s: jnp.full(s, -np.log(self.init_beta)), (1,)
        )

    def __call__(
        self, xyz, frame_id, inst_id, backward=False, samples_dict=None,
        sched=None, train=True,
    ):
        """Blend-skin points with per-bone SE(3) between time-t and rest
        configurations (warping.py:277-336)."""
        samples_dict = samples_dict or {}
        if "rest_articulation" in samples_dict and "t_articulation" in samples_dict:
            rest_articulation = samples_dict["rest_articulation"]
            t_articulation = samples_dict["t_articulation"]
        else:
            t_articulation, rest_articulation = self.articulation.get_vals_and_mean(
                frame_id
            )

        if backward:
            se3 = dual_quaternion_mul(
                rest_articulation, dual_quaternion_inverse(t_articulation)
            )
            articulation = t_articulation
        else:
            se3 = dual_quaternion_mul(
                t_articulation, dual_quaternion_inverse(rest_articulation)
            )
            articulation = rest_articulation
            frame_id = None

        # fully-fused path: bone coords + delta MLP + softmax + DQ blend in
        # one Pallas pass (ops/warp_kernel.py)
        kernel_out = self.kernel_warp(
            xyz, articulation, se3, frame_id, inst_id
        )
        if kernel_out is not None:
            return kernel_out

        # articulation stays per-pair (M, B, 4); get_bone_coords applies it
        # to the (M, N, D, 3) samples as a batched matmul without
        # materializing sample-resolution quaternion arrays
        #
        # forward-warp skin weights depend only on (xyz, rest articulation,
        # mean time embedding, inst) — the flow and cycle paths query them
        # at the same canonical points, so the field caches them once in
        # samples_dict["fwd_skin"] (Deformable.prepare_forward_warp)
        cached = None
        if not backward and samples_dict is not None:
            cached = samples_dict.get("fwd_skin")
        if cached is not None:
            skin, delta_skin = cached
        else:
            skin, delta_skin = self.skinning_model(
                xyz, articulation, frame_id, inst_id
            )
        skin_prob = jax.nn.softmax(skin, axis=-1)
        out = dual_quaternion_skinning(se3, xyz, skin_prob)

        warp_dict: Dict[str, jnp.ndarray] = {}
        warp_dict["skin_entropy"] = cross_entropy_skin_loss(skin)[..., None]
        if delta_skin is not None:
            warp_dict["delta_skin"] = jnp.mean(
                delta_skin**2, axis=-1, keepdims=True
            )
        return out, warp_dict

    def use_warp_kernel(self, xyz) -> bool:
        """Whether the fused warp kernel covers this configuration.

        Off by default (LAB4D_WARP_KERNEL=1 enables): after the matmul-form
        rewrites, the jnp warp is already faster than the Mosaic kernel at
        these shapes (lane-granularity quaternion slices dominate), and the
        jax.vjp-derived backward holds too many residuals per tile."""
        import os

        from lab4d_tpu.nnutils.base import _fused_enabled

        if os.environ.get("LAB4D_WARP_KERNEL", "0") != "1":
            return False
        if not _fused_enabled() or xyz.ndim != 4:
            return False
        sm = self.skinning_model
        if not sm.delta_skin or sm.num_freq_xyz != 0 or sm.num_inst != 1:
            return False
        # kernel hardcodes the 3-matmul chain: D=2 + head, no active skips
        if sm.delta_field.D != 2 or any(
            s < sm.delta_field.D for s in sm.delta_field.skips
        ):
            return False
        from lab4d_tpu.ops.warp_kernel import MAX_TILE, ROW_W, _pick_tile

        B = sm.num_coords
        if max(3 * B, 4 * B) > ROW_W:
            return False
        spp = xyz.shape[1] * xyz.shape[2]
        return _pick_tile(spp, MAX_TILE) is not None

    def kernel_warp(self, xyz, articulation, se3, frame_id, inst_id):
        """Run the fused skinning warp; None when unsupported."""
        if not self.use_warp_kernel(xyz):
            return None
        from lab4d_tpu.ops.warp_kernel import fused_skin_warp, pack_pair_rows
        from lab4d_tpu.utils.quat import (
            dual_quaternion_to_quaternion_translation,
        )

        sm = self.skinning_model
        M = xyz.shape[0]
        spp = xyz.shape[1] * xyz.shape[2]

        # time rows (per pair) -> first-layer fold of the delta MLP
        if frame_id is None:
            t_rows = jnp.broadcast_to(
                sm.time_embedding.mean_embedding().reshape(1, -1),
                (M, sm.time_embedding.out_channels),
            )
        else:
            t_rows = sm.time_embedding(frame_id).reshape(M, -1)
        dummy = jnp.zeros((M, 1, 1, 3 * sm.num_coords))
        weights, biases, row_adds = sm.delta_field(
            dummy, inst_id, row_code=t_rows, return_params=True
        )
        u = row_adds[0]  # (M, W1)

        q, t = dual_quaternion_to_quaternion_translation(articulation)
        rows = pack_pair_rows(q, t, sm.get_gauss(), u, se3[0], se3[1])
        wb = [weights[0], biases[0], weights[1], biases[1],
              weights[2], biases[2]]
        out = fused_skin_warp(
            xyz.reshape(-1, 3), rows, wb, sm.num_coords, spp
        )
        lead = xyz.shape[:-1]
        warp_dict: Dict[str, jnp.ndarray] = {
            "skin_entropy": out[:, 3:4].reshape(lead + (1,)),
            "delta_skin": out[:, 4:5].reshape(lead + (1,)),
        }
        return out[:, :3].reshape(lead + (3,)), warp_dict

    def get_gauss_density(self, xyz, bone2obj=None):
        """Bone-sphere density at points (warping.py:355-387): hard max over
        per-bone Gaussian scores with radius 0.01."""
        if bone2obj is None:
            bone2obj = self.articulation.get_mean_vals()
        dist2 = get_xyz_bone_distance(xyz, bone2obj) / (0.01**2)
        score = jnp.exp(-0.5 * dist2)
        return jnp.max(score, axis=-1)[..., None]

    def get_gauss_sdf(self, xyz, bias: float = 0.0):
        density = jnp.clip(self.get_gauss_density(xyz), 1e-6, 1 - 1e-6)
        return -jax.scipy.special.logit(density) + bias


class ComposedWarp(SkinningWarp):
    """Skeleton warp composed with a soft dense post-warp
    (warping.py:409-503)."""

    post_warp_D: int = 2
    post_warp_W: int = 256

    def setup(self):
        super().setup()
        self.post_warp = DenseWarp(
            frame_info=self.frame_info, D=self.post_warp_D, W=self.post_warp_W
        )

    def __call__(
        self, xyz, frame_id, inst_id, backward=False, samples_dict=None,
        sched=None, train=True,
    ):
        if not backward and frame_id is not None:
            xyz, _ = self.post_warp(
                xyz, frame_id, inst_id, backward=False, samples_dict=samples_dict
            )
        out, warp_dict = super().__call__(
            xyz, frame_id, inst_id, backward=backward, samples_dict=samples_dict,
            sched=sched, train=train,
        )
        if backward and frame_id is not None:
            out, _ = self.post_warp(
                out, frame_id, inst_id, backward=True, samples_dict=samples_dict
            )
        return out, warp_dict

    def compute_post_warp_dist2(self, xyz, frame_id, inst_id):
        """Soft-deformation magnitude + cycle reg (warping.py:485-503)."""
        xyz_t, _ = self.post_warp(xyz, frame_id, inst_id, backward=False)
        dist2 = jnp.sum((xyz_t - xyz) ** 2, axis=-1)
        xyz_back, _ = self.post_warp(xyz_t, frame_id, inst_id, backward=True)
        dist2 = (dist2 + jnp.sum((xyz_t - xyz_back) ** 2, axis=-1)) * 0.5
        return dist2


def parse_warp_type(fg_motion: str) -> Dict:
    """Map a fg_motion string to a warp class + kwargs.

    fg_motion in {rigid, dense, bob, skel-human, skel-quad,
    comp_skel-{human,quad}_dense} (warping.py:18-56).
    """
    if fg_motion == "rigid":
        return {"cls": IdentityWarp, "kwargs": {}}
    if fg_motion == "dense":
        return {"cls": DenseWarp, "kwargs": {}}
    if fg_motion == "nvp":
        return {"cls": NVPWarp, "kwargs": {}}
    if fg_motion == "bob":
        return {"cls": SkinningWarp, "kwargs": {"skel_type": "flat"}}
    if fg_motion.startswith("skel-"):
        return {"cls": SkinningWarp, "kwargs": {"skel_type": fg_motion.split("-")[1]}}
    if fg_motion.startswith("comp"):
        parts = fg_motion.split("_")[1:]
        assert parts[0] in ("skel-human", "skel-quad")
        assert parts[1] == "dense", "only skel+dense composition is supported"
        return {"cls": ComposedWarp, "kwargs": {"skel_type": parts[0].split("-")[1]}}
    raise NotImplementedError(fg_motion)
