"""MLP primitives (flax). Parity: lab4d/nnutils/base.py.

BaseMLP is a skip-connection MLP; CondMLP concatenates a learned instance
code to the input. MLP widths here (W=64..256) are small relative to the
MXU tile (128x128); the batched point dimension supplies the parallelism,
so evaluation maps to dense (P, C) x (C, W) matmuls that tile cleanly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from lab4d_tpu.nnutils.embedding import InstEmbedding


class BaseMLP(nn.Module):
    """Skip-connection MLP (base.py:17-78)."""

    D: int = 8
    W: int = 256
    out_channels: int = 3
    skips: Sequence[int] = (4,)
    final_act: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] == 0:
            return x
        out = x
        for i in range(self.D):
            if i in self.skips:
                out = jnp.concatenate([x, out], axis=-1)
            out = nn.relu(nn.Dense(self.W, name=f"linear_{i + 1}")(out))
        out = nn.Dense(self.out_channels, name="linear_final")(out)
        if self.final_act:
            out = nn.relu(out)
        return out


class CondMLP(nn.Module):
    """MLP conditioned on a per-instance code (base.py:81-157).

    `inst_id` of None evaluates with the mean instance code.
    """

    num_inst: int
    D: int = 8
    W: int = 256
    inst_channels: int = 32
    out_channels: int = 3
    skips: Sequence[int] = (4,)
    final_act: bool = False

    def setup(self):
        self.inst_embedding = InstEmbedding(self.num_inst, self.inst_channels)
        self.backbone = BaseMLP(
            D=self.D,
            W=self.W,
            out_channels=self.out_channels,
            skips=self.skips,
            final_act=self.final_act,
        )

    def __call__(
        self,
        feat: jnp.ndarray,
        inst_id: Optional[jnp.ndarray],
        beta_prob=None,
        train: bool = False,
    ) -> jnp.ndarray:
        """Args:
            feat: (M, ..., in_channels)
            inst_id: (M,) instance ids or None (mean instance)
        """
        if self.inst_channels == 0:
            inst_code = jnp.zeros(feat.shape[:-1] + (0,))
        elif inst_id is None:
            mean = self.inst_embedding.mean()
            inst_code = jnp.broadcast_to(
                mean, feat.shape[:-1] + (self.inst_channels,)
            )
        else:
            code = self.inst_embedding(inst_id, beta_prob=beta_prob, train=train)
            code = code.reshape(code.shape[:1] + (1,) * (feat.ndim - 2) + (-1,))
            inst_code = jnp.broadcast_to(
                code, feat.shape[:-1] + (self.inst_channels,)
            )
        x = jnp.concatenate([feat, inst_code], axis=-1)
        if x.shape[-1] == 0:
            return x
        return self.backbone(x)
