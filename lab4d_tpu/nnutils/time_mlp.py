"""Time-conditioned MLP base (flax). Parity: lab4d/nnutils/time.py.

The reference's `mlp_init` (Adam-until-converged prior fitting,
time.py:76-96) lives in `lab4d_tpu.engine.init_utils.fit_module_to_prior`
as a jit-compiled lax.while_loop over the module's param subtree.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from lab4d_tpu.nnutils.base import BaseMLP
from lab4d_tpu.nnutils.embedding import FrameInfo, TimeEmbedding


def scale_num_freq_t(num_freq_t: int, frame_info: FrameInfo) -> int:
    """Scale time-frequency count by video length (time.py:37-44):
    64 frames -> num_freq_t, doubling frames adds one octave."""
    if num_freq_t <= 0:
        return num_freq_t
    max_ts = int(
        (frame_info.frame_offset[1:] - frame_info.frame_offset[:-1]).max()
    )
    return int(np.rint(np.log2(max_ts / 64) + num_freq_t))


class TimeMLP(nn.Module):
    """MLP over a learned time embedding.

    Subclasses add output heads; this base produces (…, W) features.
    """

    frame_info: FrameInfo
    D: int = 5
    W: int = 256
    num_freq_t: int = 6
    skips: tuple = ()
    time_scale: float = 1.0

    def setup(self):
        self.time_embedding = TimeEmbedding(
            num_freq_t=scale_num_freq_t(self.num_freq_t, self.frame_info),
            frame_info=self.frame_info,
            out_channels=self.W,
            time_scale=self.time_scale,
        )
        self.backbone = BaseMLP(
            D=self.D, W=self.W, out_channels=self.W, skips=self.skips,
            final_act=True,
        )

    def forward_feat(self, t_embed: jnp.ndarray) -> jnp.ndarray:
        return self.backbone(t_embed)

    def __call__(self, frame_id=None):
        return self.forward_feat(self.time_embedding(frame_id))

    def frame_ids_to_vid(self, frame_id):
        fi = self.frame_info
        if frame_id is None:
            return jnp.asarray(fi.frame_to_vid)
        return jnp.asarray(fi.raw_fid_to_vid)[frame_id]
