"""Loss helpers (jnp). Parity: lab4d/utils/loss_utils.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def entropy_loss(prob: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Entropy of probability distributions; low entropy = peaky skinning."""
    return -jnp.sum(prob * jnp.log(prob + 1e-9), axis=axis)


def cross_entropy_skin_loss(skin: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy between softmax(skin) and the one-hot argmax assignment.

    Parity: loss_utils.py:21-42. Equivalent closed form:
    CE = logsumexp(skin) - skin[argmax] = logsumexp(skin) - max(skin).
    """
    return jax.nn.logsumexp(skin, axis=-1) - jnp.max(skin, axis=-1)


def align_vectors(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Scale k minimizing ||k*v1 - v2||^2; falls back to 1 if negative."""
    scale = jnp.sum(v1 * v2) / jnp.maximum(jnp.sum(v1 * v1), 1e-12)
    return jnp.where(scale < 0, 1.0, scale)


def masked_mean(v: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of v over elements where mask is truthy (0 if empty)."""
    mask = mask.astype(v.dtype)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(v * mask) / denom


def nonzero_mean(v: jnp.ndarray) -> jnp.ndarray:
    """TPU-friendly equivalent of torch `v[v > 0].mean()` used by the loss
    reducer (reference engine/model.py:602): a masked dense mean."""
    mask = (v > 0).astype(v.dtype)
    denom = jnp.sum(mask)
    return jnp.where(denom > 0, jnp.sum(v * mask) / jnp.maximum(denom, 1.0), 0.0)
