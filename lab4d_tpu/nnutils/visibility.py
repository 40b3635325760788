"""Visibility field (flax). Parity: lab4d/nnutils/visibility.py."""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from lab4d_tpu.nnutils.base import CondMLP, embed_cond_mlp
from lab4d_tpu.nnutils.embedding import PosEmbedding


class VisField(nn.Module):
    """Predict a visibility logit (-inf, +inf) for 3D canonical points."""

    num_inst: int
    D: int = 2
    W: int = 64
    num_freq_xyz: int = 10
    inst_channels: int = 32

    def setup(self):
        self.pos_embedding = PosEmbedding(3, self.num_freq_xyz)
        self.basefield = CondMLP(
            num_inst=self.num_inst,
            D=self.D,
            W=self.W,
            inst_channels=self.inst_channels,
            out_channels=1,
            skips=(4,),
        )

    def __call__(self, xyz: jnp.ndarray, inst_id=None, fused=None):
        return embed_cond_mlp(
            self.basefield, self.pos_embedding, xyz, inst_id=inst_id,
            fused=fused,
        )
