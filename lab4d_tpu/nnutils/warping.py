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
