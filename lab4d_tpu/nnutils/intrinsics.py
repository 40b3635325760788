"""Camera intrinsics MLP (flax). Parity: lab4d/nnutils/intrinsics.py."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from lab4d_tpu.nnutils.linear import TorchDense

from lab4d_tpu.nnutils.embedding import FrameInfo
from lab4d_tpu.nnutils.time_mlp import TimeMLP


class IntrinsicsMLP(TimeMLP):
    """Time-varying intrinsics (fx, fy, cx, cy) with per-video base values.

    Pixels are forced square by averaging fx/fy (intrinsics.py:104).
    """

    frame_info: FrameInfo = None
    intrinsics_init: np.ndarray = None  # (M, 4) prior per filtered frame
    num_freq_t: int = 0
    time_scale: float = 0.1

    def setup(self):
        super().setup()
        self.focal_head = [TorchDense(self.W // 2), TorchDense(2)]
        self.base_logfocal = self.param(
            "base_logfocal", nn.initializers.zeros, (self.frame_info.num_vids, 2)
        )
        self.base_ppoint = self.param(
            "base_ppoint", nn.initializers.zeros, (self.frame_info.num_vids, 2)
        )

    def get_vals(self, frame_id=None):
        t_feat = self.forward_feat(self.time_embedding(frame_id))
        focal = jnp.exp(self.focal_head[1](nn.relu(self.focal_head[0](t_feat))))
        inst_id = self.frame_ids_to_vid(frame_id)
        focal = focal * jnp.exp(self.base_logfocal[inst_id])
        focal = (focal + focal[..., ::-1]) / 2.0  # square pixels
        ppoint = jnp.broadcast_to(self.base_ppoint[inst_id], focal.shape)
        return jnp.concatenate([focal, ppoint], axis=-1)

    def __call__(self, frame_id=None):
        return self.get_vals(frame_id)

    def compute_distance_to_prior(self):
        pred = self.get_vals(None)
        return jnp.mean((pred - jnp.asarray(self.intrinsics_init)) ** 2)


def intrinsics_base_init(intrinsics: np.ndarray, frame_info: FrameInfo):
    """Host-side initializer for base_logfocal / base_ppoint from the first
    frame of each video (intrinsics.py:67-73)."""
    first = frame_info.frame_offset[:-1]
    base_logfocal = np.log(intrinsics[first, :2])
    base_ppoint = intrinsics[first, 2:]
    return base_logfocal.astype(np.float32), base_ppoint.astype(np.float32)
