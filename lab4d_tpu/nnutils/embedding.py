"""Fourier position/time embeddings and learnable instance codes (flax).

Parity target: lab4d/nnutils/embedding.py. Differences by design:
- PosEmbedding is a stateless callable; the coarse-to-fine annealing window
  `alpha` is a traced scalar passed per call (the reference mutates module
  state via set_alpha, embedding.py:61-125).
- Instance-code swapping takes `beta_prob` as a traced scalar and an explicit
  rng (embedding.py:266-281 uses global torch RNG).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from lab4d_tpu.nnutils.linear import TorchDense


class FrameInfo:
    """Static per-dataset frame metadata (host-side numpy, baked as jit
    constants). Mirrors the buffers of reference TimeEmbedding
    (embedding.py:152-188).

    Args:
        frame_offset: (V+1,) cumulative counts of *filtered* frames per video
        frame_offset_raw: (V+1,) cumulative counts of raw frames per video
        frame_mapping: (M,) absolute raw frame id of each filtered frame
    """

    def __init__(self, frame_offset, frame_offset_raw, frame_mapping):
        self.frame_offset = np.asarray(frame_offset, dtype=np.int64)
        self.frame_offset_raw = np.asarray(frame_offset_raw, dtype=np.int64)
        self.frame_mapping = np.asarray(frame_mapping, dtype=np.int64)

        self.num_frames = int(self.frame_offset[-1])
        self.num_frames_raw = int(self.frame_offset_raw[-1])
        self.num_vids = len(self.frame_offset) - 1

        raw_fid = np.arange(self.num_frames_raw)
        self.raw_fid_to_vid = (
            np.searchsorted(self.frame_offset_raw, raw_fid, side="right") - 1
        ).astype(np.int64)
        self.raw_fid_to_vstart = self.frame_offset_raw[self.raw_fid_to_vid]
        self.raw_fid_to_vidlen = (
            self.frame_offset_raw[self.raw_fid_to_vid + 1] - self.raw_fid_to_vstart
        )
        self.max_ts = int(
            (self.frame_offset_raw[1:] - self.frame_offset_raw[:-1]).max()
        )
        self.frame_to_vid = self.raw_fid_to_vid[self.frame_mapping]

    # identity-based equality: safe as a static linen attribute
    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)

    @classmethod
    def single_video(cls, num_frames: int) -> "FrameInfo":
        return cls([0, num_frames], [0, num_frames], list(range(num_frames)))


def fourier_embed_dim(in_channels: int, n_freqs: int) -> int:
    if n_freqs == -1:
        return 0
    return in_channels * (2 * n_freqs + 1)


def fourier_embed_blocks(x: jnp.ndarray, freqs, window=None):
    """The three Fourier-feature blocks [x, sin(FxC), cos(FxC)] WITHOUT
    the final concat, for consumers that split their weight matrix along
    K instead (BaseMLP block_matmul): on TPU the concat is a pure
    relayout that XLA cannot always fuse away. Block order and values
    match fourier_embed exactly."""
    if len(freqs) == 0:
        return [x]
    freqs_arr = jnp.asarray(freqs, jnp.float32)
    ang = x[..., None, :] * freqs_arr[:, None]  # (..., F, C)
    sin_b, cos_b = jnp.sin(ang), jnp.cos(ang)
    if window is not None:
        sin_b = sin_b * window[:, None]
        cos_b = cos_b * window[:, None]
    flat_shape = x.shape[:-1] + (len(freqs) * x.shape[-1],)
    return [x, sin_b.reshape(flat_shape), cos_b.reshape(flat_shape)]


def fourier_embed(x: jnp.ndarray, freqs, window=None) -> jnp.ndarray:
    """Fourier features in the PE-fused-kernel layout
    [x, sin blocks (F x C), cos blocks (F x C)], with an optional (F,)
    annealing window. The jnp twin of the kernel's in-VMEM embedding —
    any module routing through BaseMLP's pe_spec path uses THIS layout
    (it differs from PosEmbedding.__call__'s interleaved sin/cos order;
    the two are separate parameterizations, never mixed)."""
    freqs_arr = jnp.asarray(freqs, jnp.float32)
    ang = x[..., None, :] * freqs_arr[:, None]  # (..., F, C)
    sin_b, cos_b = jnp.sin(ang), jnp.cos(ang)
    if window is not None:
        sin_b = sin_b * window[:, None]
        cos_b = cos_b * window[:, None]
    flat_shape = x.shape[:-1] + (len(freqs) * x.shape[-1],)
    return jnp.concatenate(
        [x, sin_b.reshape(flat_shape), cos_b.reshape(flat_shape)], axis=-1
    )


class PosEmbedding:
    """Fourier features (x, sin(2^k x), cos(2^k x), ...) with an optional
    coarse-to-fine annealing window.

    The output channel layout matches the reference (embedding.py:69-110):
    [x, then per-frequency (sin, cos) blocks of size in_channels].
    """

    def __init__(self, in_channels: int, n_freqs: int, logscale: bool = True):
        self.in_channels = in_channels
        self.n_freqs = n_freqs
        self.out_channels = fourier_embed_dim(in_channels, n_freqs)
        if n_freqs > 0:
            if logscale:
                self.freq_bands = 2.0 ** np.linspace(0, n_freqs - 1, n_freqs)
            else:
                self.freq_bands = np.linspace(1, 2 ** (n_freqs - 1), n_freqs)
            self.freq_bands = self.freq_bands.astype(np.float32)

    def get_window(self, alpha: Optional[jnp.ndarray]):
        """Per-frequency annealing weights (F,), or None when alpha is None
        (full bands). Used to hand the embedding to the PE-fused kernel."""
        if alpha is None or self.n_freqs <= 0:
            return None
        window = jnp.clip(
            alpha * self.n_freqs - jnp.arange(self.n_freqs), 0.0, 1.0
        )
        return 0.5 * (1 + jnp.cos(jnp.pi * window + jnp.pi))

    def pe_spec(self, alpha: Optional[jnp.ndarray]):
        """(freqs tuple, window) for BaseMLP's fused PE path, or None when
        this embedding is an identity/empty map."""
        if self.n_freqs <= 0:
            return None
        return (tuple(float(f) for f in self.freq_bands), self.get_window(alpha))

    def __call__(self, x: jnp.ndarray, alpha: Optional[jnp.ndarray] = None):
        """Args:
            x: (..., in_channels)
            alpha: traced scalar in [0, 1] or None (= no annealing / full bands)
        Returns:
            (..., out_channels)
        """
        if self.n_freqs == -1:
            return x[..., :0]
        if self.n_freqs == 0:
            return x

        freqs = jnp.asarray(self.freq_bands)  # (F,)
        ang = x[..., None, :] * freqs[:, None]  # (..., F, C)
        bands = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-2)  # (..., F, 2, C)

        if alpha is not None:
            window = jnp.clip(alpha * self.n_freqs - jnp.arange(self.n_freqs), 0.0, 1.0)
            window = 0.5 * (1 + jnp.cos(jnp.pi * window + jnp.pi))
            bands = bands * window[:, None, None]

        flat = bands.reshape(x.shape[:-1] + (2 * self.n_freqs * self.in_channels,))
        return jnp.concatenate([x, flat], axis=-1)

    def mean_embedding(self) -> jnp.ndarray:
        return jnp.zeros((self.out_channels,))


class InstEmbedding(nn.Module):
    """Learnable per-video instance code with code-swap regularization.

    Parity: embedding.py:230-294.
    """

    num_inst: int
    inst_channels: int

    def setup(self):
        if self.inst_channels > 0:
            self.mapping = nn.Embed(self.num_inst, self.inst_channels)

    def __call__(self, inst_id, beta_prob=None, train: bool = False):
        if self.inst_channels == 0:
            return jnp.zeros(inst_id.shape + (0,))
        if self.num_inst == 1:
            return self.mapping(jnp.zeros_like(inst_id))
        if train and beta_prob is not None:
            rng = self.make_rng("swap")
            r_id, r_mask = jax.random.split(rng)
            rand_id = jax.random.randint(
                r_id, (inst_id.shape[0],), 0, self.num_inst
            ).reshape((inst_id.shape[0],) + (1,) * (inst_id.ndim - 1))
            rand_id = jnp.broadcast_to(rand_id, inst_id.shape)
            swap = jax.random.uniform(r_mask, inst_id.shape) < beta_prob
            inst_id = jnp.where(swap, rand_id, inst_id)
        return self.mapping(inst_id)

    def mean(self) -> jnp.ndarray:
        """Mean instance code (embedding.py:283-285)."""
        return self.mapping.embedding.mean(axis=0)


class TimeEmbedding(nn.Module):
    """Fourier-time + instance-code embedding per frame.

    Parity: embedding.py:137-227. `frame_id` indexes *raw* frame ids; the
    time coordinate is normalized to [-1, 1] within each video and scaled by
    the longest video (frame_to_tid, embedding.py:179-188).
    """

    num_freq_t: int
    frame_info: FrameInfo
    out_channels: int = 128
    time_scale: float = 1.0

    def setup(self):
        self.fourier = PosEmbedding(1, self.num_freq_t)
        self.inst_embedding = InstEmbedding(
            self.frame_info.num_vids, inst_channels=self.out_channels
        )
        self.mapping1 = TorchDense(self.out_channels)
        self.mapping2 = TorchDense(self.out_channels)

    def frame_to_tid(self, frame_id: jnp.ndarray) -> jnp.ndarray:
        fi = self.frame_info
        vidlen = jnp.asarray(fi.raw_fid_to_vidlen)[frame_id]
        tid_sub = frame_id - jnp.asarray(fi.raw_fid_to_vstart)[frame_id]
        tid = (tid_sub - vidlen / 2.0) / fi.max_ts * 2.0
        return tid * self.time_scale

    def __call__(self, frame_id=None):
        """Args:
            frame_id: (...,) raw frame ids, or None for all filtered frames
        Returns:
            (..., out_channels) time embeddings
        """
        fi = self.frame_info
        if frame_id is None:
            frame_id = jnp.asarray(fi.frame_mapping)
        inst_id = jnp.asarray(fi.raw_fid_to_vid)[frame_id]
        t_sample = self.frame_to_tid(frame_id)

        coeff = self.fourier(t_sample[..., None])
        coeff = self.mapping1(coeff)
        inst_code = self.inst_embedding(inst_id)
        return self.mapping2(jnp.concatenate([coeff, inst_code], axis=-1))

    def mean_embedding(self):
        """Mean time embedding over all filtered frames (embedding.py:219-227)."""
        return self.__call__(None).mean(axis=0, keepdims=True)
