"""Gaussian-bone skinning field (flax). Parity: lab4d/nnutils/skinning.py."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from lab4d_tpu.nnutils.base import CondMLP
from lab4d_tpu.nnutils.embedding import FrameInfo, PosEmbedding, TimeEmbedding
from lab4d_tpu.utils.geom import get_bone_coords


class SkinningField(nn.Module):
    """Skinning weights from Gaussian bones + learned time/inst delta.

    skin = -(||x_bone / gauss||^2 + relu(delta) * 0.1), per bone
    (skinning.py:89-124).
    """

    num_coords: int
    frame_info: FrameInfo = None
    num_inst: int = 1
    D: int = 2
    W: int = 64
    num_freq_xyz: int = 0
    num_freq_t: int = 6
    inst_channels: int = 32
    init_scale: float = 0.03
    delta_skin: bool = True
    symm_idx: Optional[tuple] = None

    def setup(self):
        self.log_gauss = self.param(
            "log_gauss",
            lambda k, s: jnp.full(s, np.log(self.init_scale)),
            (self.num_coords, 3),
        )
        if self.delta_skin:
            self.pos_embedding = PosEmbedding(3 * self.num_coords, self.num_freq_xyz)
            self.time_embedding = TimeEmbedding(
                num_freq_t=self.num_freq_t, frame_info=self.frame_info
            )
            self.delta_field = CondMLP(
                num_inst=self.num_inst,
                D=self.D,
                W=self.W,
                inst_channels=self.inst_channels,
                out_channels=self.num_coords,
                skips=(4,),
            )

    def get_gauss(self):
        log_gauss = self.log_gauss
        if self.symm_idx is not None:
            symm = jnp.asarray(np.asarray(self.symm_idx))
            log_gauss = (log_gauss[symm] + log_gauss) / 2.0
        return jnp.exp(log_gauss)

    def get_gauss_bone_coords(self, xyz, bone2obj):
        """Points -> scaled bone-local coordinates (skinning.py:126-142).
        The 1/gauss scaling folds into the bone rotation matrices so no
        sample-resolution elementwise pass is needed."""
        return get_bone_coords(xyz, bone2obj, scale=self.get_gauss())

    def __call__(self, xyz, bone2obj, frame_id, inst_id):
        """Args:
            xyz: (M,N,D,3) canonical points
            bone2obj: ((M,N,D,B,4), (M,N,D,B,4)) dual quaternions
            frame_id: (M,) or None (mean time embedding)
        Returns:
            skin: (M,N,D,B) unnormalized log-weights; delta or None
        """
        xyz_bone = self.get_gauss_bone_coords(xyz, bone2obj)
        dist2 = jnp.sum(xyz_bone**2, axis=-1)

        if self.delta_skin:
            xyz_embed = self.pos_embedding(
                xyz_bone.reshape(xyz.shape[:-1] + (-1,))
            )
            # time codes are constant per pair row -> low-rank row add in
            # the CondMLP instead of a sample-resolution broadcast+concat
            if frame_id is None:
                t_rows = jnp.broadcast_to(
                    self.time_embedding.mean_embedding().reshape(1, -1),
                    (xyz.shape[0], self.time_embedding.out_channels),
                )
            else:
                t_rows = self.time_embedding(frame_id).reshape(
                    xyz.shape[0], -1
                )
            delta = self.delta_field(xyz_embed, inst_id, row_code=t_rows)
            delta = jax.nn.relu(delta) * 0.1
            skin = -(dist2 + delta)
        else:
            skin = -dist2
            delta = None
        return skin, delta
