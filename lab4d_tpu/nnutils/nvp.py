"""Invertible RealNVP warp field (flax).

Parity target: lab4d/third_party/nvp.py (vendored CaDeX-style NVP used by
NVPWarp, warping.py:173-226). Re-designed compactly: per block, three
affine coupling layers (one per coordinate axis), each predicting a
scale/translation for its axis from the other two axes plus the time
code. Exact inverse by construction.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from lab4d_tpu.nnutils.linear import TorchDense

from lab4d_tpu.nnutils.embedding import PosEmbedding


class _CouplingMLP(nn.Module):
    width: int = 64
    depth: int = 2

    @nn.compact
    def __call__(self, h):
        for _ in range(self.depth):
            h = nn.relu(TorchDense(self.width)(h))
        out = TorchDense(2)(h)  # (log_scale, translation)
        return out


class CouplingLayer(nn.Module):
    """Affine coupling on one axis: x_a' = x_a * exp(s) + t, where (s, t)
    depend on the other axes and the conditioning code."""

    axis: int
    width: int = 64
    depth: int = 2
    num_freq_xyz: int = 4

    def setup(self):
        self.pos_embedding = PosEmbedding(2, self.num_freq_xyz)
        self.mlp = _CouplingMLP(width=self.width, depth=self.depth)

    def _st(self, others, code):
        h = jnp.concatenate([self.pos_embedding(others), code], axis=-1)
        out = self.mlp(h)
        # bound the scale for stability
        s = jnp.tanh(out[..., :1]) * 0.5
        t = out[..., 1:2] * 0.1
        return s, t

    def _split(self, xyz):
        others = jnp.concatenate(
            [xyz[..., : self.axis], xyz[..., self.axis + 1 :]], axis=-1
        )
        return xyz[..., self.axis : self.axis + 1], others

    def _merge(self, xa, others):
        return jnp.concatenate(
            [others[..., : self.axis], xa, others[..., self.axis :]], axis=-1
        )

    def forward(self, xyz, code):
        xa, others = self._split(xyz)
        s, t = self._st(others, code)
        return self._merge(xa * jnp.exp(s) + t, others)

    def inverse(self, xyz, code):
        xa, others = self._split(xyz)
        s, t = self._st(others, code)
        return self._merge((xa - t) * jnp.exp(-s), others)


class NVP(nn.Module):
    """Stack of coupling layers cycling through the 3 axes."""

    n_layers: int = 2
    width: int = 64
    depth: int = 2

    def setup(self):
        self.layers = [
            CouplingLayer(axis=i % 3, width=self.width, depth=self.depth)
            for i in range(self.n_layers * 3)
        ]

    def forward(self, code, xyz):
        code = jnp.broadcast_to(code, xyz.shape[:-1] + code.shape[-1:])
        for layer in self.layers:
            xyz = layer.forward(xyz, code)
        return xyz

    def inverse(self, code, xyz):
        code = jnp.broadcast_to(code, xyz.shape[:-1] + code.shape[-1:])
        for layer in reversed(self.layers):
            xyz = layer.inverse(xyz, code)
        return xyz
