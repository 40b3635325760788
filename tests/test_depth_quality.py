"""Depth backend quality + selection tests (mirrors the flow backend
tests): the classical parallax proxy is quantified against analytic
depth, and the neural U-Net auto-upgrades when local weights exist.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.train_depth_unet import gen_frame, silog_rmse


def test_depth_backend_selection(tmp_path, monkeypatch):
    """auto -> flowdisp without weights, unet with cached weights."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from preprocess.backends import depth_unet
    from preprocess.backends.depth_backends import pick_depth_backend

    monkeypatch.setenv("LAB4D_WEIGHTS_DIR", str(tmp_path))
    monkeypatch.delenv("LAB4D_DEPTH_BACKEND", raising=False)
    # hide any torch.hub cache so the probe can't pick zoe
    monkeypatch.setenv("TORCH_HOME", str(tmp_path / "nohub"))
    depth_unet._load_params_cached.cache_clear()
    assert pick_depth_backend() == "flowdisp"

    monkeypatch.setenv("LAB4D_DEPTH_BACKEND", "const")
    assert pick_depth_backend() == "const"
    monkeypatch.delenv("LAB4D_DEPTH_BACKEND", raising=False)

    model = depth_unet.DepthUNet()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((64, 64, 3), jnp.float32)
    )["params"]
    with open(tmp_path / depth_unet.WEIGHTS_NAME, "wb") as f:
        f.write(serialization.to_bytes(params))
    depth_unet._load_params_cached.cache_clear()
    assert pick_depth_backend() == "unet"

    # inference contract: original resolution, finite, positive
    rgb, _ = gen_frame(np.random.default_rng(0), 64)
    frames = [(np.clip(rgb, 0, 1) * 255).astype(np.uint8)]
    d = depth_unet.depth_video_unet(frames, res=64)[0]
    assert d.shape == rgb.shape[:2]
    assert np.isfinite(d).all() and (d > 0).all()
    depth_unet._load_params_cached.cache_clear()


def test_classical_depth_scale_consistency():
    """The parallax proxy must produce positive finite depth with the
    median pinned near the nominal scene scale — the property the
    camera-registration stage depends on."""
    rng = np.random.default_rng(5)
    from preprocess.backends.depth_backends import (
        MEDIAN_DEPTH,
        depth_video_flowdisp,
    )

    rgb0, _ = gen_frame(rng, 96)
    rgb1, _ = gen_frame(rng, 96)
    frames = [(np.clip(r, 0, 1) * 255).astype(np.uint8) for r in (rgb0, rgb1)]
    d = depth_video_flowdisp(frames, res=96)[0]
    assert np.isfinite(d).all() and (d > 0).all()
    assert 0.3 * MEDIAN_DEPTH < np.median(d) < 3 * MEDIAN_DEPTH


SHIPPED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "database", "weights", "depth_unet.msgpack",
)


@pytest.mark.skipif(not os.path.exists(SHIPPED),
                    reason="no shipped depth weights")
def test_shipped_unet_beats_classical():
    """Distilled weights must beat the parallax proxy on held-out
    synthetic frames (scale-invariant log RMSE)."""
    import jax
    import jax.numpy as jnp

    from preprocess.backends.depth_unet import DepthUNet, load_params
    from preprocess.backends.depth_backends import depth_video_flowdisp

    params = load_params(SHIPPED)
    assert params is not None
    model = DepthUNet()
    run = jax.jit(lambda a: model.apply({"params": params}, a))
    rng = np.random.default_rng(77)
    e_net, e_classic = [], []
    for _ in range(3):
        rgb, gt = gen_frame(rng, 128)
        e_net.append(silog_rmse(run(jnp.asarray(rgb)), gt))
        rgb2, _ = gen_frame(rng, 128)
        frames = [(np.clip(r, 0, 1) * 255).astype(np.uint8)
                  for r in (rgb, rgb2)]
        e_classic.append(silog_rmse(depth_video_flowdisp(frames, res=128)[0],
                                    gt))
    assert np.mean(e_net) < np.mean(e_classic), (e_net, e_classic)
