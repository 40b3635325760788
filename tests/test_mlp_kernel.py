"""Pallas fused-MLP kernel vs jnp oracle (runs in interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lab4d_tpu.ops.mlp_kernel import fused_relu_mlp, mlp_reference


def make_mlp(key, dims, seed=0):
    rng = np.random.default_rng(seed)
    weights, biases = [], []
    for cin, cout in zip(dims[:-1], dims[1:]):
        weights.append(
            jnp.asarray(rng.standard_normal((cin, cout)) / np.sqrt(cin),
                        jnp.float32)
        )
        biases.append(jnp.asarray(rng.standard_normal(cout) * 0.01, jnp.float32))
    return weights, biases


@pytest.mark.parametrize(
    "P,dims,skips,final_act",
    [
        (256, (63, 128, 128, 64), (), False),
        (1500, (95, 256, 256, 256, 256, 256), (2,), True),  # skip concat
        (1024, (16, 64, 1), (), False),
    ],
)
def test_forward_matches_reference(P, dims, skips, final_act):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((P, dims[0])), jnp.float32)
    weights, biases = make_mlp(None, list(dims))
    # fix skip-layer input dim
    weights = [
        (
            jnp.asarray(
                np.random.default_rng(i).standard_normal(
                    (dims[i] + (dims[0] if i in skips else 0), dims[i + 1])
                )
                / np.sqrt(dims[i]),
                jnp.float32,
            )
        )
        for i in range(len(dims) - 1)
    ]
    got = fused_relu_mlp(x, weights, biases, tuple(skips), final_act)
    want = mlp_reference(x, weights, biases, tuple(skips), final_act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_grads_match_reference():
    P, dims, skips = 700, (31, 128, 128, 128, 8), (2,)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((P, dims[0])), jnp.float32)
    weights = [
        jnp.asarray(
            np.random.default_rng(10 + i).standard_normal(
                (dims[i] + (dims[0] if i in skips else 0), dims[i + 1])
            )
            / np.sqrt(dims[i]),
            jnp.float32,
        )
        for i in range(len(dims) - 1)
    ]
    biases = [
        jnp.asarray(np.random.default_rng(20 + i).standard_normal(d) * 0.01,
                    jnp.float32)
        for i, d in enumerate(dims[1:])
    ]
    tgt = jnp.asarray(rng.standard_normal((P, dims[-1])), jnp.float32)

    def loss_k(x, ws, bs):
        out = fused_relu_mlp(x, ws, bs, tuple(skips), False)
        return jnp.sum((out - tgt) ** 2)

    def loss_r(x, ws, bs):
        out = mlp_reference(x, ws, bs, tuple(skips), False)
        return jnp.sum((out - tgt) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, weights, biases)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, weights, biases)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-2, rtol=1e-3
        )


def test_final_act_grad():
    P, dims = 128, (8, 32, 16)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((P, dims[0])),
                    jnp.float32)
    weights, biases = make_mlp(None, list(dims), seed=5)

    gk = jax.grad(
        lambda x: jnp.sum(fused_relu_mlp(x, weights, biases, (), True) ** 2)
    )(x)
    gr = jax.grad(
        lambda x: jnp.sum(mlp_reference(x, weights, biases, (), True) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-3)
