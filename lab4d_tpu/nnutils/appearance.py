"""Global appearance code over time (flax). Parity: lab4d/nnutils/appearance.py."""

from __future__ import annotations

import flax.linen as nn

from lab4d_tpu.nnutils.linear import TorchDense

from lab4d_tpu.nnutils.embedding import FrameInfo
from lab4d_tpu.nnutils.time_mlp import TimeMLP


class AppearanceEmbedding(TimeMLP):
    """Per-frame appearance code (shadow / lighting / exposure)."""

    frame_info: FrameInfo = None
    appr_channels: int = 32
    D: int = 2
    W: int = 64
    time_scale: float = 0.1

    def setup(self):
        super().setup()
        self.output = TorchDense(self.appr_channels)

    def get_vals(self, frame_id=None):
        return self.output(self.forward_feat(self.time_embedding(frame_id)))

    def __call__(self, frame_id=None):
        return self.get_vals(frame_id)
