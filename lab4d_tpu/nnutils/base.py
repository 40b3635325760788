"""MLP primitives (flax). Parity: lab4d/nnutils/base.py.

BaseMLP is a skip-connection MLP; CondMLP concatenates a learned instance
code to the input. On TPU, first-order evaluations route through the
Pallas fused-MLP kernel (ops/mlp_kernel.py) which keeps all layer weights
in VMEM and streams point tiles — ~1.5x over per-layer XLA matmuls for
the training fwd+bwd. Paths that need double-backward (eikonal through
the SDF) pass fused=False and use the plain jnp chain.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from lab4d_tpu.nnutils.embedding import InstEmbedding
from lab4d_tpu.nnutils.linear import TorchDense, torch_linear_init


def _fused_enabled() -> bool:
    if os.environ.get("LAB4D_FUSED_MLP", "1") != "1":
        return False
    return jax.default_backend() == "tpu"


def _mlp_bf16_enabled() -> bool:
    """LAB4D_MLP_BF16=1 runs the jnp MLP chains with bf16 activations and
    weights (f32 accumulation). Hypothesis was that the unfused eval
    graph is HBM-traffic-bound so halving activation bytes should win;
    MEASURED on v5e (merged two-pass eval, skel-quad): 245.7 ms/frame
    bf16 vs 235.6 f32 @256^2, 876 vs 845 @512^2 — a small LOSS (the
    casts cost more than the saved bytes; XLA already fuses most
    elementwise consumers into the matmuls). Default stays f32/OFF.
    Coordinates and Fourier ANGLES stay f32 either way (bf16's ~3
    decimal digits would wreck sin(2^11 x) phases); only the bounded
    sin/cos features and layer activations are cast
    (docs/performance.md)."""
    return os.environ.get("LAB4D_MLP_BF16", "0") == "1"


class ScaleLayer(nn.Module):
    """Multiply by a fixed scale (base.py:8-14) — used to damp warp MLP
    outputs (e.g. DenseWarp translations x0.1)."""

    scale: float = 0.1

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * self.scale


class BaseMLP(nn.Module):
    """Skip-connection MLP (base.py:17-78)."""

    D: int = 8
    W: int = 256
    out_channels: int = 3
    skips: Sequence[int] = (4,)
    final_act: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        fused: Optional[bool] = None,
        const_code: Optional[jnp.ndarray] = None,
        pe_spec=None,
        row_code: Optional[jnp.ndarray] = None,
        return_params: bool = False,
    ) -> jnp.ndarray:
        """row_code: optional (M, Cr) conditioning that is constant within
        each leading-batch row of x (M, ..., Cx) — e.g. per-frame time
        codes. Treated as concatenated after the features at the input and
        skip layers, but applied as a low-rank add (row_code @ W_rows,
        broadcast over the point dims) instead of materializing a (P, Cr)
        concat. Forces the jnp path (the fused kernels are row-agnostic).

        const_code: optional (C,) conditioning vector that is constant
        across points — treated as if concatenated to x at the input and at
        every skip layer, but algebraically folded into the biases instead
        of materializing a (P, C) broadcast + concat (a measured ~6 ms/step
        relayout on TPU). Parameter shapes are identical either way.

        pe_spec: optional (freqs tuple, window) — x is then RAW coordinates
        and the Fourier embedding happens inside the fused kernel (or
        inline for the jnp path); the params consume the embedded width."""
        if x.shape[-1] == 0 and const_code is None and row_code is None:
            return x
        if pe_spec is not None:
            pe_freqs, pe_window = pe_spec
            feat_ch = x.shape[-1] * (2 * len(pe_freqs) + 1)
        else:
            feat_ch = x.shape[-1]
        row_ch = 0 if row_code is None else row_code.shape[-1]
        code_ch = 0 if const_code is None else const_code.shape[-1]
        in_ch = feat_ch + row_ch + code_ch
        # torch.nn.Linear default init on every layer (reference parity;
        # see torch_linear_init)
        weights, biases = [], []
        ch = in_ch
        for i in range(self.D):
            if i in self.skips:
                ch += in_ch
            li = torch_linear_init(ch)
            w = self.param(f"linear_{i + 1}", li, (ch, self.W))
            b = self.param(f"bias_{i + 1}", li, (self.W,))
            weights.append(w)
            biases.append(b)
            ch = self.W
        li = torch_linear_init(ch)
        w = self.param("linear_final", li, (ch, self.out_channels))
        b = self.param("bias_final", li, (self.out_channels,))
        weights.append(w)
        biases.append(b)

        row_adds = {}  # layer index -> (M, W) per-row addend
        if code_ch > 0 or row_ch > 0:
            # fold the code rows of each consuming layer into its bias and
            # extract the per-row (low-rank) weight blocks
            code = None if const_code is None else const_code.reshape(code_ch)
            folded_w, folded_b = [], []
            for i, (w_i, b_i) in enumerate(zip(weights, biases)):
                takes_input = i == 0 or (i < self.D and i in self.skips)
                if takes_input:
                    # the input block [feat, row, code] leads the concat
                    w_feat = w_i[:feat_ch]
                    w_row = w_i[feat_ch : feat_ch + row_ch]
                    w_code = w_i[feat_ch + row_ch : in_ch]
                    w_rest = w_i[in_ch:]
                    folded_w.append(jnp.concatenate([w_feat, w_rest], 0))
                    b_new = b_i if code is None else b_i + code @ w_code
                    folded_b.append(b_new)
                    if row_ch > 0:
                        row_adds[i] = row_code @ w_row  # (M, W)
                else:
                    folded_w.append(w_i)
                    folded_b.append(b_i)
            weights, biases = folded_w, folded_b
        in_ch = feat_ch

        if return_params:
            # hand the (const-folded) weight/bias lists to a caller that
            # drives a multi-head fused kernel directly; per-row (M, W)
            # addends come along when row_code was given
            biases_r = [b.reshape(1, -1) for b in biases]
            if row_code is not None:
                return weights, biases_r, row_adds
            return weights, biases_r

        use_fused = _fused_enabled() if fused is None else (
            fused and _fused_enabled()
        )
        if row_adds:
            use_fused = False  # fused kernels have no per-row bias concept
        if use_fused:
            flat = x.reshape(-1, x.shape[-1])
            if pe_spec is not None:
                from lab4d_tpu.ops.mlp_kernel import fused_pe_mlp

                out = fused_pe_mlp(
                    flat, pe_window, weights, biases, pe_freqs,
                    tuple(self.skips), self.final_act,
                )
            else:
                from lab4d_tpu.ops.mlp_kernel import fused_relu_mlp

                out = fused_relu_mlp(
                    flat, weights, biases, tuple(self.skips), self.final_act
                )
            return out.reshape(x.shape[:-1] + (self.out_channels,))

        # input features as BLOCKS, never concatenated: every consuming
        # matmul is split along its K rows instead ((A|B) @ [Wa;Wb] =
        # A@Wa + B@Wb). XLA lowers the skip/PE concats to column-wise
        # relayouts that measured ~50 ms of a 523 ms 512^2 eval frame on
        # v5e (round-4 profile); split matmuls fuse into each block's
        # producer. Same trick the pallas field kernel uses
        # (ops/field_kernel.py skip-concat fold).
        if pe_spec is not None:
            from lab4d_tpu.nnutils.embedding import fourier_embed_blocks

            blocks = fourier_embed_blocks(x, pe_freqs, pe_window)
        else:
            blocks = [x]

        def row_add(i, h):
            if i not in row_adds:
                return h
            u = row_adds[i].astype(h.dtype)
            return h + u.reshape(u.shape[:1] + (1,) * (h.ndim - 2) + u.shape[-1:])

        out_dtype = x.dtype
        if _mlp_bf16_enabled():
            # embedded features are bounded (sin/cos in [-1,1]) -> safe to
            # cast; the MXU still accumulates f32 internally for bf16
            # operands, only the stored activations shrink
            blocks = [b.astype(jnp.bfloat16) for b in blocks]
            weights = [w.astype(jnp.bfloat16) for w in weights]
            biases = [b.astype(jnp.bfloat16) for b in biases]

        def matmul(h, w):
            # f32 accumulation even for bf16 operands (bf16 preferred
            # type would let partial sums round to bf16), cast back after
            out = jax.lax.dot_general(
                h, w, (((h.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out.astype(h.dtype)

        def block_matmul(blks, w):
            # w rows ordered as concat(blks); slicing is loop-invariant
            out, off = None, 0
            for b in blks:
                k = b.shape[-1]
                part = matmul(b, w[off : off + k])
                out = part if out is None else out + part
                off += k
            return out

        out = None
        for i in range(self.D):
            blks = blocks if out is None or i in self.skips else []
            if out is not None:
                blks = blks + [out]
            out = nn.relu(row_add(i, block_matmul(blks, weights[i])) + biases[i])
        out = row_add(self.D, matmul(out, weights[-1])) + biases[-1]
        if self.final_act:
            out = nn.relu(out)
        return out.astype(out_dtype)


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
        fused: Optional[bool] = None,
        pe_spec=None,
        row_code: Optional[jnp.ndarray] = None,
        return_params: bool = False,
    ) -> jnp.ndarray:
        """Args:
            feat: (M, ..., in_channels) — RAW coordinates when pe_spec is
                given (the backbone embeds them in-kernel)
            inst_id: (M,) instance ids or None (mean instance)
            row_code: optional (M, Cr) per-row conditioning (e.g. time
                codes), applied as a low-rank add (see BaseMLP)
            return_params: return the (const-folded) weight/bias lists for
                an external fused kernel instead of evaluating (only valid
                on constant-code paths)
        """
        if self.inst_channels == 0:
            if feat.shape[-1] == 0:
                return feat
            return self.backbone(
                feat, fused=fused, pe_spec=pe_spec, row_code=row_code,
                return_params=return_params,
            )

        # constant-code fast path: a single morphology (or the mean code)
        # conditions every point identically, so the code folds into the
        # backbone biases instead of a (P, C) broadcast + concat
        code = None
        if inst_id is None:
            code = self.inst_embedding.mean().reshape(-1)
        elif self.num_inst == 1:
            one = jnp.zeros((1,), jnp.int32)
            code = self.inst_embedding(
                one, beta_prob=beta_prob, train=train
            ).reshape(-1)
        if code is not None:
            if feat.shape[-1] == 0:
                # code-only MLP (e.g. per-instance bone lengths): evaluate
                # the single row and broadcast
                out = self.backbone(code[None], fused=False)
                return jnp.broadcast_to(
                    out.reshape((1,) * (feat.ndim - 1) + out.shape[-1:]),
                    feat.shape[:-1] + out.shape[-1:],
                )
            return self.backbone(
                feat, fused=fused, const_code=code, pe_spec=pe_spec,
                row_code=row_code, return_params=return_params,
            )

        # per-instance codes vary per leading row: apply them through the
        # same low-rank row path (appended after any caller row_code so the
        # declared input order is [feat, row, inst])
        inst_rows = self.inst_embedding(inst_id, beta_prob=beta_prob, train=train)
        inst_rows = inst_rows.reshape(inst_rows.shape[0], -1)
        rows = (
            inst_rows if row_code is None
            else jnp.concatenate([row_code, inst_rows], axis=-1)
        )
        return self.backbone(
            feat, fused=fused, pe_spec=pe_spec, row_code=rows,
            return_params=return_params,
        )


def embed_cond_mlp(
    cond_mlp,
    pos_embedding,
    x,
    alpha=None,
    inst_id=None,
    beta_prob=None,
    train: bool = False,
    fused=None,
):
    """Run PosEmbedding + CondMLP, routing the embedding into the PE-fused
    kernel when possible (the (P, C_embed) feature matrix then never
    touches HBM)."""
    spec = pos_embedding.pe_spec(alpha)
    if spec is None:
        feat = pos_embedding(x, alpha=alpha)
        return cond_mlp(
            feat, inst_id, beta_prob=beta_prob, train=train, fused=fused
        )
    return cond_mlp(
        x, inst_id, beta_prob=beta_prob, train=train, fused=fused,
        pe_spec=spec,
    )
