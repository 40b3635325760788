"""Camera and articulation MLPs (flax).

Parity target: lab4d/nnutils/pose.py.
- CameraMLP: time-conditioned SE(3) with per-video base rotations
  (pose.py:29-150)
- ArticulationFlatMLP: bag-of-bones free SE(3) per bone (pose.py:240-323)
- ArticulationSkelMLP: joint-angle head + per-instance bone lengths +
  symmetry + forward kinematics (pose.py:326-600)

Articulation outputs are dual quaternions ((M,B,4), (M,B,4)), bone->object.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from lab4d_tpu.nnutils.base import CondMLP
from lab4d_tpu.nnutils.linear import TorchDense
from lab4d_tpu.nnutils.embedding import FrameInfo
from lab4d_tpu.nnutils.time_mlp import TimeMLP
from lab4d_tpu.utils.quat import (
    axis_angle_to_quaternion,
    quaternion_mul,
    quaternion_translation_to_dual_quaternion,
    quaternion_translation_to_se3,
)
from lab4d_tpu.utils.skel import (
    Skeleton,
    fk_se3,
    get_predefined_skeleton,
    rest_joints_to_local,
    shift_joints_to_bones_dq,
)


def _normalize(v, axis=-1, eps=1e-12):
    return v / jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True) + eps)


class CameraMLP(TimeMLP):
    """Time-varying object-to-camera SE(3), as (quat, trans).

    `rtmat_init` is the external camera prior (already scaled to field
    units); it also defines the per-video base rotations and the prior loss
    target (pose.py:82-107).
    """

    frame_info: FrameInfo = None
    rtmat_init: np.ndarray = None  # (M, 4, 4), one per filtered frame

    def setup(self):
        super().setup()
        self.trans_head = [TorchDense(self.W // 2), TorchDense(3)]
        self.quat_head = [TorchDense(self.W // 2), TorchDense(4)]
        # identity quaternion init (overwritten from priors by mlp_init;
        # the reference uses zeros + base_init, pose.py:82,96-102)
        self.base_quat = self.param(
            "base_quat",
            lambda key, shape: jnp.zeros(shape).at[:, 0].set(1.0),
            (self.frame_info.num_vids, 4),
        )

    def _heads(self, t_feat):
        trans = self.trans_head[1](nn.relu(self.trans_head[0](t_feat)))
        quat = self.quat_head[1](nn.relu(self.quat_head[0](t_feat)))
        return _normalize(quat), trans

    def get_vals(self, frame_id=None):
        """Camera pose at given (raw) frame ids; None = all filtered frames."""
        t_feat = self.forward_feat(self.time_embedding(frame_id))
        quat, trans = self._heads(t_feat)
        inst_id = self.frame_ids_to_vid(frame_id)
        base_quat = _normalize(self.base_quat[inst_id])
        return quaternion_mul(quat, base_quat), trans

    def __call__(self, frame_id=None):
        return self.get_vals(frame_id)

    def compute_distance_to_prior(self):
        """MSE between predicted SE(3) (all filtered frames) and the prior."""
        quat, trans = self.get_vals(None)
        pred = quaternion_translation_to_se3(quat, trans)
        gt = jnp.asarray(self.rtmat_init)
        return jnp.mean((pred - gt) ** 2)


def camera_base_quat_init(rtmat: np.ndarray, frame_info: FrameInfo) -> np.ndarray:
    """Initial per-video base rotations from the prior trajectory
    (pose.py:96-102). Host-side numpy; used to overwrite params after init."""
    from lab4d_tpu.utils.quat import matrix_to_quaternion

    first = frame_info.frame_offset[:-1]
    base_rmat = jnp.asarray(rtmat[first, :3, :3])
    return np.asarray(matrix_to_quaternion(base_rmat))


class ArticulationFlatMLP(TimeMLP):
    """Bag-of-bones articulation: per-bone free SE(3) over time."""

    frame_info: FrameInfo = None
    num_se3: int = 25

    def setup(self):
        super().setup()
        self.trans_head = [TorchDense(self.W // 2), TorchDense(3 * self.num_se3)]
        self.so3_head = [TorchDense(self.W // 2), TorchDense(3 * self.num_se3)]

    def forward_arti(self, t_embed, inst_id=None):
        t_feat = self.forward_feat(t_embed)
        trans = self.trans_head[1](nn.relu(self.trans_head[0](t_feat)))
        trans = 0.1 * trans.reshape(t_embed.shape[:-1] + (self.num_se3, 3))
        so3 = self.so3_head[1](nn.relu(self.so3_head[0](t_feat)))
        so3 = so3.reshape(t_embed.shape[:-1] + (self.num_se3, 3))
        qr = axis_angle_to_quaternion(so3)
        return quaternion_translation_to_dual_quaternion(qr, trans)

    def get_vals(self, frame_id=None):
        return self.forward_arti(self.time_embedding(frame_id))

    def get_mean_vals(self, inst_id=None):
        t_embed = self.time_embedding.mean_embedding()
        return self.forward_arti(t_embed)

    def get_vals_and_mean(self, frame_id=None):
        pred_t = self.get_vals(frame_id)
        pred_mean = self.get_mean_vals()
        pred_mean = (
            jnp.broadcast_to(pred_mean[0], pred_t[0].shape),
            jnp.broadcast_to(pred_mean[1], pred_t[1].shape),
        )
        return pred_t, pred_mean

    def __call__(self, frame_id=None):
        return self.get_vals(frame_id)

    def skel_prior_loss(self):
        return jnp.zeros(())


class ArticulationSkelMLP(TimeMLP):
    """Skeleton articulation: joint angles -> FK -> bone dual quaternions."""

    frame_info: FrameInfo = None
    skel_type: str = "quad"
    joint_angles_init: Optional[np.ndarray] = None  # (M, B, 3) prior

    def setup(self):
        super().setup()
        self.skeleton: Skeleton = get_predefined_skeleton(self.skel_type)
        self.num_se3 = self.skeleton.num_joints
        self.so3_head = [TorchDense(self.W // 2), TorchDense(3 * self.num_se3)]
        self.logscale = self.param("logscale", nn.initializers.zeros, (1,))
        self.shift = self.param("shift", nn.initializers.zeros, (3,))
        self.log_bone_len = CondMLP(
            num_inst=self.frame_info.num_vids,
            D=2,
            W=64,
            out_channels=self.num_se3,
        )

    def compute_so3(self, t_embed):
        t_feat = self.forward_feat(t_embed)
        so3 = self.so3_head[1](nn.relu(self.so3_head[0](t_feat)))
        return so3.reshape(t_embed.shape[:-1] + (self.num_se3, 3))

    def compute_rel_rest_joints(
        self, inst_id=None, override_log_bone_len=None, batch_shape=()
    ):
        """Parent-relative rest joints scaled by (symmetrized) per-instance
        bone lengths (pose.py:466-494)."""
        rel = rest_joints_to_local(
            jnp.asarray(self.skeleton.rest_joints), self.skeleton
        )  # (B, 3)
        rel = jnp.broadcast_to(rel, batch_shape + rel.shape)

        empty_feat = jnp.zeros(batch_shape + (0,))
        if override_log_bone_len is not None:
            log_inc = override_log_bone_len
        else:
            log_inc = self.log_bone_len(empty_feat, inst_id)
        bone_len = jnp.exp(log_inc + self.logscale)
        symm = jnp.asarray(np.asarray(self.skeleton.symm_idx))
        bone_len = (bone_len + bone_len[..., symm]) / 2.0
        return rel * bone_len[..., None]

    def forward_arti(
        self,
        t_embed,
        inst_id=None,
        return_so3: bool = False,
        override_so3=None,
        override_local_rest_joints=None,
    ):
        if override_so3 is None:
            so3 = self.compute_so3(t_embed)
        else:
            so3 = override_so3
        if return_so3:
            return so3

        if override_local_rest_joints is None:
            local_rest = self.compute_rel_rest_joints(
                inst_id=inst_id, batch_shape=so3.shape[:-2]
            )
        else:
            local_rest = override_local_rest_joints

        dq = fk_se3(local_rest, so3, self.skeleton)
        return shift_joints_to_bones_dq(dq, self.skeleton, shift=self.shift)

    def get_vals(self, frame_id=None, return_so3=False, override_so3=None):
        inst_id = self.frame_ids_to_vid(frame_id)
        t_embed = self.time_embedding(frame_id)
        return self.forward_arti(
            t_embed, inst_id, return_so3=return_so3, override_so3=override_so3
        )

    def get_mean_vals(self, inst_id=None):
        t_embed = self.time_embedding.mean_embedding()
        shape = () if inst_id is None else inst_id.shape
        if inst_id is not None:
            t_embed = jnp.broadcast_to(t_embed, inst_id.shape + t_embed.shape[-1:])
        return self.forward_arti(t_embed, inst_id)

    def get_vals_and_mean(self, frame_id=None):
        """Batched t-pose + rest-pose FK in one forward pass (pose.py:518-567)."""
        inst_id = self.frame_ids_to_vid(frame_id)
        bs = inst_id.shape[0]
        t_embed = self.time_embedding(frame_id)
        t_embed_mean = jnp.broadcast_to(
            self.time_embedding.mean_embedding(), t_embed.shape
        )
        t_all = jnp.concatenate([t_embed, t_embed_mean], axis=0)

        rel_i = self.compute_rel_rest_joints(inst_id=inst_id, batch_shape=(bs,))
        rel_c = self.compute_rel_rest_joints(inst_id=None, batch_shape=(bs,))
        rel_all = jnp.concatenate([rel_i, rel_c], axis=0)

        dq = self.forward_arti(t_all, None, override_local_rest_joints=rel_all)
        pred_t = (dq[0][:bs], dq[1][:bs])
        pred_mean = (dq[0][bs:], dq[1][bs:])
        return pred_t, pred_mean

    def __call__(self, frame_id=None):
        return self.get_vals(frame_id)

    def skel_prior_loss(self):
        """L2 prior on rest joint-angle and bone-length increments
        (pose.py:569-600)."""
        t_embed = self.time_embedding.mean_embedding()
        so3 = self.forward_arti(t_embed, None, return_so3=True)
        loss_so3 = jnp.mean(so3**2)
        empty_feat = jnp.zeros(so3.shape[:-2] + (0,))
        log_inc = self.log_bone_len(empty_feat, None)
        return loss_so3 + 0.02 * jnp.mean(log_inc**2)

    def prior_fit_loss(self):
        """Loss used by init-time fitting: match so3 to external joint angles
        over all filtered frames (pose.py:399-406)."""
        t_embed = self.time_embedding(None)
        so3 = self.forward_arti(t_embed, None, return_so3=True)
        gt = jnp.asarray(self.joint_angles_init)
        return jnp.mean((so3 - gt) ** 2)
