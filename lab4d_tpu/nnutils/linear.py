"""torch.nn.Linear-parity initialization for flax layers.

Reference parity, not taste: the reference uses torch defaults
everywhere (no custom inits in its nnutils), and the distributions
matter behaviorally. flax's lecun_normal(+zero bias) has ~1.7x the
per-layer weight std; compounded over an 8-layer trunk the untrained
field outputs O(1) values where torch's outputs O(0.01) — measured
init-render gap of 2.8 dB vs the reference (pred rgb ~0.46-0.52 vs the
reference's alpha*sigmoid(~0)=0.37; round-5 init-parity study) plus
larger early gradients (more check_grad step skips).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_linear_init(fan_in: int):
    """torch.nn.Linear default: kernel AND bias ~ U(±1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(max(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """nn.Dense with torch.nn.Linear default init (same param names, so
    param trees are interchangeable with nn.Dense)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = torch_linear_init(x.shape[-1])
        w = self.param("kernel", init, (x.shape[-1], self.features))
        b = self.param("bias", init, (self.features,))
        return x @ w + b
