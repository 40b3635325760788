"""Quality/selection gates for the learned descriptor backend
(preprocess/backends/feat_net.py), mirroring the other backend gates:
selection contract, shape/finiteness, and a shipped-weights gate
asserting the net beats the filter bank on held-out correspondence
accuracy."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from preprocess.backends.feat_net import weights_path

SHIPPED = weights_path()


def test_backend_selection_contract(monkeypatch, tmp_path):
    from preprocess.backends import pick_backend

    # explicit env wins
    monkeypatch.setenv("LAB4D_FEAT_BACKEND", "filterbank")
    assert pick_backend(
        "LAB4D_FEAT_BACKEND", "net", "filterbank", lambda: True
    ) == "filterbank"
    # auto: probe decides
    monkeypatch.setenv("LAB4D_FEAT_BACKEND", "auto")
    assert pick_backend(
        "LAB4D_FEAT_BACKEND", "net", "filterbank", lambda: True
    ) == "net"
    assert pick_backend(
        "LAB4D_FEAT_BACKEND", "net", "filterbank", lambda: False
    ) == "filterbank"


def test_feat_net_shapes():
    import jax
    import jax.numpy as jnp

    from preprocess.backends.feat_net import FEAT_RES, OUT_DIM, FeatNet

    model = FeatNet()
    img = jnp.zeros((FEAT_RES, FEAT_RES, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    out = model.apply({"params": params}, img)
    assert out.shape == (FEAT_RES, FEAT_RES, OUT_DIM)
    assert np.isfinite(np.asarray(out)).all()
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    assert np.all(norms < 1.0 + 1e-4)


@pytest.mark.skipif(not os.path.exists(SHIPPED),
                    reason="no shipped feat_net weights")
def test_shipped_weights_beat_filterbank():
    """Held-out top-1 correspondence accuracy (K in-pair candidates) of
    the shipped net must beat the classical filter bank."""
    import jax.numpy as jnp

    from preprocess.backends.feat_backends import filterbank_features
    from preprocess.backends.feat_net import frame_features_net
    from scripts.train_feat_net import (
        K,
        RES,
        photometric_jitter,
        sample_correspondences,
    )
    from scripts.train_flow_raft import gen_pair

    rng = np.random.default_rng(42)

    def top1(desc_fn):
        accs = []
        for _ in range(4):
            rgb0, rgb1, flow, valid = gen_pair(rng, RES)
            rgb1 = photometric_jitter(rng, rgb1)
            corr = sample_correspondences(rng, flow, valid)
            if corr is None:
                continue
            src, dst = corr
            f0, f1 = np.asarray(desc_fn(rgb0)), np.asarray(desc_fn(rgb1))
            f0 = f0 / np.maximum(np.linalg.norm(f0, axis=-1, keepdims=True), 1e-6)
            f1 = f1 / np.maximum(np.linalg.norm(f1, axis=-1, keepdims=True), 1e-6)
            d0 = f0[src[:, 0], src[:, 1]]
            di = np.clip(np.round(dst).astype(int), 0, RES - 1)
            d1 = f1[di[:, 0], di[:, 1]]
            sim = d0 @ d1.T
            accs.append(float((sim.argmax(1) == np.arange(K)).mean()))
        return float(np.mean(accs))

    acc_net = top1(
        lambda im: frame_features_net((im * 255).astype(np.uint8))
    )
    acc_fb = top1(
        lambda im: filterbank_features(jnp.asarray(im.astype(np.float32)))
    )
    assert acc_net > acc_fb, (acc_net, acc_fb)
