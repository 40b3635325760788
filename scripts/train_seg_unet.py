"""Distill video-segmentation U-Net weights from synthetic scenes with
analytic masks (tests/synthetic_raw.py + tests/synthetic_adversarial.py
renderers), replacing the reference's Track-Anything (SAM + XMem) prior
(reference: scripts/run_preprocess.py:25-44) in a zero-egress
environment.

    python scripts/train_seg_unet.py [steps] [res] [out_path]

Writes database/weights/seg_unet.msgpack; the segmentation backend
auto-upgrades when that file exists (preprocess/backends/
seg_backends.py). Each training sample pairs a rendered frame with a
corrupted previous-frame mask in the conditioning channel (random
affine shift / dilation / erosion / dropout, sometimes blank) so the net
learns drift-correcting temporal propagation, not mask copying. Prints
held-out IoU for the trained net vs the classical GrabCut backend.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from scripts.train_flow_raft import _rand_pose


def _render_raw(rng, res: int):
    """synthetic_raw frame (textured fg sphere inside textured bg sphere)
    with randomized fg size, camera, and texture."""
    import tests.synthetic_raw as sr

    K = (res * rng.uniform(0.8, 1.3), res * rng.uniform(0.8, 1.3),
         res / 2, res / 2)
    rt = _rand_pose(rng, rng.uniform(0, 1))
    orig_tex, orig_r = sr._texture, sr.FG_RADIUS
    f = rng.uniform(2.0, 12.0, 3)

    def tex(p, freqs=None):
        return orig_tex(p, freqs=tuple(f if freqs is None else freqs))

    sr._texture = tex
    sr.FG_RADIUS = orig_r * rng.uniform(0.5, 1.6)
    try:
        rgb, mask, _, _ = sr.render_frame(rt, K, res)
    finally:
        sr._texture, sr.FG_RADIUS = orig_tex, orig_r
    return rgb.astype(np.float32), mask.astype(np.float32)


def _render_adversarial(rng, res: int):
    """Articulated two-part object composited over a textured background
    (the adversarial renderer leaves misses black, which would make the
    task trivial)."""
    import tests.synthetic_adversarial as sa

    K = (res * rng.uniform(0.9, 1.4), res * rng.uniform(0.9, 1.4),
         res / 2, res / 2)
    rgb, mask, _, _, _, _ = sa.render_frame(rng.uniform(0, 1), K, res)
    bg_rgb, bg_mask = _render_raw(rng, res)
    bg = np.where(bg_mask[..., None] > 0, bg_rgb * 0.6, bg_rgb)  # darken the
    # raw scene's fg sphere so it reads as clutter, not the target
    rgb = np.where(mask[..., None], rgb, bg)
    return rgb.astype(np.float32), mask.astype(np.float32)


def _random_crop(rng, rgb, mask, res: int):
    """Random crop + resize: translation/scale augmentation."""
    import cv2

    h = rgb.shape[0]
    s = int(h * rng.uniform(0.6, 1.0))
    y0 = rng.integers(0, h - s + 1)
    x0 = rng.integers(0, h - s + 1)
    rgb_c = cv2.resize(rgb[y0:y0 + s, x0:x0 + s], (res, res))
    mask_c = cv2.resize(mask[y0:y0 + s, x0:x0 + s], (res, res),
                        interpolation=cv2.INTER_NEAREST)
    return rgb_c, mask_c


def _corrupt_prev(rng, mask, res: int):
    """Simulated previous-frame prediction: shifted/eroded/dilated GT,
    occasionally blank (first-frame bootstrap)."""
    import cv2

    r = rng.uniform()
    if r < 0.25:
        return np.full((res, res), 0.5, np.float32)
    m = mask.astype(np.float32)
    dx, dy = rng.integers(-res // 12, res // 12 + 1, 2)
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    m = cv2.warpAffine(m, M, (res, res))
    k = int(rng.integers(1, res // 24 + 2))
    kern = np.ones((k, k), np.uint8)
    if rng.uniform() < 0.5:
        m = cv2.dilate(m, kern)
    else:
        m = cv2.erode(m, kern)
    if rng.uniform() < 0.3:  # speckle dropout
        drop = rng.random((res, res)) < 0.05
        m = np.where(drop, 1.0 - m, m)
    return np.clip(m + rng.normal(0, 0.05, m.shape), 0, 1).astype(np.float32)


def gen_sample(rng, res: int):
    if rng.uniform() < 0.5:
        rgb, mask = _render_raw(rng, res)
    else:
        rgb, mask = _render_adversarial(rng, res)
    rgb, mask = _random_crop(rng, rgb, mask, res)
    prev = _corrupt_prev(rng, mask, res)
    x = np.concatenate([rgb, prev[..., None]], axis=-1)
    return x.astype(np.float32), mask.astype(np.float32)


def make_batch(rng, B, res):
    out = [gen_sample(rng, res) for _ in range(B)]
    return tuple(np.stack([o[i] for o in out]) for i in range(2))


def iou(pred, gt) -> float:
    p = np.asarray(pred) > 0.5
    g = np.asarray(gt) > 0.5
    inter = (p & g).sum()
    union = (p | g).sum()
    return float(inter / max(union, 1))


def main(steps=1500, res=128, out_path=None, batch=4, seed=0, log_every=50):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from preprocess.backends.seg_unet import SegUNet, weights_path

    from preprocess.backends.weights import train_out_path

    out_path = out_path or train_out_path("seg_unet.msgpack")
    rng = np.random.default_rng(seed)
    model = SegUNet()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((res, res, 4), jnp.float32)
    )["params"]
    print("params:", sum(x.size for x in jax.tree.leaves(params)))

    sched = optax.warmup_cosine_decay_schedule(
        0.0, 3e-4, min(100, steps // 10), steps
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=1e-5))
    opt = tx.init(params)

    def loss_fn(p, x, gt):
        prob = jax.vmap(lambda a: model.apply({"params": p}, a))(x)
        prob = jnp.clip(prob, 1e-6, 1 - 1e-6)
        bce = -(gt * jnp.log(prob) + (1 - gt) * jnp.log(1 - prob)).mean()
        inter = (prob * gt).sum(axis=(1, 2))
        dice = 1.0 - (2 * inter + 1.0) / (
            prob.sum(axis=(1, 2)) + gt.sum(axis=(1, 2)) + 1.0
        )
        return bce + dice.mean()

    @jax.jit
    def step(p, o, x, gt):
        l, g = jax.value_and_grad(loss_fn)(p, x, gt)
        upd, o = tx.update(g, o, p)
        return optax.apply_updates(p, upd), o, l

    n_pool = min(96, max(steps, 1))
    print(f"generating {n_pool} batches ...", flush=True)
    pool = [tuple(jnp.asarray(x) for x in make_batch(rng, batch, res))
            for _ in range(n_pool)]

    t0 = time.time()
    for it in range(steps):
        x, gt = pool[it % n_pool]
        params, opt, l = step(params, opt, x, gt)
        if it % log_every == 0 or it == steps - 1:
            print(f"step {it}: loss={float(l):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    if os.path.dirname(out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"wrote {out_path}")

    # held-out comparison vs the classical grabcut backend on a short
    # orbit clip (the grabcut backend needs motion)
    from preprocess.backends.seg_backends import segment_video_grabcut
    from preprocess.backends.seg_unet import segment_video_unet

    ev_rng = np.random.default_rng(seed + 1234)
    import tests.synthetic_raw as sr

    K = (res * 1.1, res * 1.1, res / 2, res / 2)
    frames, gts = [], []
    for i in range(6):
        rgb, mask, _, _ = sr.render_frame(
            _rand_pose(ev_rng, 0.1 + 0.08 * i), K, res
        )
        frames.append((np.clip(rgb, 0, 1) * 255).astype(np.uint8))
        gts.append(mask)
    m_net = segment_video_unet(frames, params=params, res=res)
    m_gc = segment_video_grabcut(frames, res=res)
    i_net = np.mean([iou(a, b) for a, b in zip(m_net, gts)])
    i_gc = np.mean([iou(a, b) for a, b in zip(m_gc, gts)])
    print(f"held-out IoU: unet={i_net:.3f}, grabcut={i_gc:.3f}")
    return float(i_net), float(i_gc)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        steps=int(a[0]) if len(a) > 0 else 1500,
        res=int(a[1]) if len(a) > 1 else 128,
        out_path=a[2] if len(a) > 2 else None,
    )
