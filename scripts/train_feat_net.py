"""Train the dense-descriptor net SELF-SUPERVISED on synthetic
multi-view correspondences, replacing the reference's pretrained DINOv2
prior (preprocess/scripts/extract_dinov2.py) in a zero-egress
environment.

Pairs come from the same randomized renderer as the flow distillation
(scripts/train_flow_raft.gen_pair): two views of a textured scene with
analytic dense correspondence (flow) and an occlusion-aware validity
mask. The loss is symmetric InfoNCE over flow-matched pixels: the
descriptor of a point in view 0 must match the descriptor at its
reprojection in view 1 against K-1 in-pair negatives — exactly the
cross-view consistency FeatureNeRF's feature/matching losses consume.

    python scripts/train_feat_net.py [steps] [out_path]

Writes database/weights/feat_net.msgpack; the feature backend
auto-upgrades when that file exists. Prints held-out correspondence
accuracy for the net vs the classical filter bank.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from scripts.train_flow_raft import gen_pair

RES = 112
K = 192  # matched pixels per pair (positives; each is a negative for the rest)


def photometric_jitter(rng, rgb):
    """Per-channel gain/offset + gamma, modeling the exposure /
    white-balance shifts of real casual video between views (the regime
    where raw-color matching — the filter bank's strength on synthetic
    pairs — breaks and learned invariance pays)."""
    gain = rng.uniform(0.7, 1.3, 3)
    bias = rng.uniform(-0.1, 0.1, 3)
    gamma = rng.uniform(0.8, 1.25)
    out = np.clip(rgb, 0, 1) ** gamma
    return np.clip(out * gain + bias, 0.0, 1.0).astype(np.float32)


def sample_correspondences(rng, flow, valid):
    """K source pixels (y, x) + their matched target pixels, valid only."""
    ys, xs = np.nonzero(valid > 0.5)
    if len(ys) < K:
        return None
    take = rng.choice(len(ys), K, replace=False)
    y0, x0 = ys[take], xs[take]
    disp = flow[y0, x0]
    x1 = np.clip(x0 + disp[:, 0], 0, RES - 1)
    y1 = np.clip(y0 + disp[:, 1], 0, RES - 1)
    return (
        np.stack([y0, x0], -1).astype(np.int32),
        np.stack([y1, x1], -1).astype(np.float32),
    )


def make_batch(rng, B):
    out = []
    while len(out) < B:
        rgb0, rgb1, flow, valid = gen_pair(rng, RES)
        corr = sample_correspondences(rng, flow, valid)
        if corr is None:
            continue
        out.append((rgb0, photometric_jitter(rng, rgb1), corr[0], corr[1]))
    return tuple(np.stack([o[i] for o in out]) for i in range(4))


def bilinear(fmap, yx):
    """fmap (H, W, C), yx (K, 2) float (y, x) -> (K, C)."""
    import jax.numpy as jnp

    y, x = yx[:, 0], yx[:, 1]
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, fmap.shape[0] - 2)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, fmap.shape[1] - 2)
    wy = (y - y0)[:, None]
    wx = (x - x0)[:, None]
    f00 = fmap[y0, x0]
    f01 = fmap[y0, x0 + 1]
    f10 = fmap[y0 + 1, x0]
    f11 = fmap[y0 + 1, x0 + 1]
    return (
        f00 * (1 - wy) * (1 - wx)
        + f01 * (1 - wy) * wx
        + f10 * wy * (1 - wx)
        + f11 * wy * wx
    )


def eval_top1(desc_fn, seed: int = 999, n_pairs: int = 8) -> float:
    """Held-out top-1 correspondence accuracy among the K in-pair
    candidates, under photometric jitter on view 1. Re-seeds its own rng
    so two backends evaluated with the same seed see IDENTICAL pairs
    (a paired comparison — unpaired draws made the gate flaky)."""
    ev = np.random.default_rng(seed)
    accs = []
    for _ in range(n_pairs):
        rgb0, rgb1, flow, valid = gen_pair(ev, RES)
        rgb1 = photometric_jitter(ev, rgb1)
        corr = sample_correspondences(ev, flow, valid)
        if corr is None:
            continue
        src, dst = corr
        f0 = np.asarray(desc_fn(rgb0))
        f1 = np.asarray(desc_fn(rgb1))
        f0 = f0 / np.maximum(np.linalg.norm(f0, axis=-1, keepdims=True), 1e-6)
        f1 = f1 / np.maximum(np.linalg.norm(f1, axis=-1, keepdims=True), 1e-6)
        d0 = f0[src[:, 0], src[:, 1]]
        di = np.round(dst).astype(int)
        d1 = f1[np.clip(di[:, 0], 0, RES - 1), np.clip(di[:, 1], 0, RES - 1)]
        sim = d0 @ d1.T
        accs.append(float((sim.argmax(1) == np.arange(K)).mean()))
    return float(np.mean(accs))


def main(steps=1200, out_path=None, batch=4, seed=0, log_every=50):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from preprocess.backends.feat_net import FeatNet, weights_path

    from preprocess.backends.weights import train_out_path

    out_path = out_path or train_out_path("feat_net.msgpack")
    rng = np.random.default_rng(seed)
    model = FeatNet()
    d = jnp.zeros((RES, RES, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), d)["params"]
    print("params:", sum(x.size for x in jax.tree.leaves(params)))

    sched = optax.warmup_cosine_decay_schedule(
        0.0, 3e-4, min(100, steps // 10), steps
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=1e-5))
    opt = tx.init(params)
    temp = 0.07

    def pair_loss(p, i0, i1, src, dst):
        f0 = model.apply({"params": p}, i0)
        f1 = model.apply({"params": p}, i1)
        d0 = f0[src[:, 0], src[:, 1]]           # (K, C)
        d1 = bilinear(f1, dst)                   # (K, C)
        d1 = d1 / jnp.maximum(
            jnp.linalg.norm(d1, axis=-1, keepdims=True), 1e-6
        )
        logits = d0 @ d1.T / temp                # (K, K)
        labels = jnp.arange(K)
        ls = optax.softmax_cross_entropy_with_integer_labels
        return 0.5 * (ls(logits, labels).mean() + ls(logits.T, labels).mean())

    def loss_fn(p, i0, i1, src, dst):
        return jax.vmap(
            lambda a, b, s, t: pair_loss(p, a, b, s, t)
        )(i0, i1, src, dst).mean()

    @jax.jit
    def step(p, o, i0, i1, src, dst):
        l, g = jax.value_and_grad(loss_fn)(p, i0, i1, src, dst)
        upd, o = tx.update(g, o, p)
        return optax.apply_updates(p, upd), o, l

    n_pool = min(96, max(steps, 1))
    print(f"generating {n_pool} batches ...", flush=True)
    pool = []
    import jax.numpy as jnp  # noqa: F811

    for _ in range(n_pool):
        b = make_batch(rng, batch)
        pool.append(tuple(jnp.asarray(x) for x in b))

    t0 = time.time()
    for it in range(steps):
        i0, i1, src, dst = pool[it % n_pool]
        params, opt, l = step(params, opt, i0, i1, src, dst)
        if it % log_every == 0 or it == steps - 1:
            print(f"step {it}: loss={float(l):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    if os.path.dirname(out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"wrote {out_path}")

    # held-out: top-1 correspondence accuracy among K candidates,
    # net vs the classical filter bank (PAIRED: eval_top1 re-seeds per
    # call so both backends see identical pairs)
    from preprocess.backends.feat_backends import filterbank_features

    run = jax.jit(lambda p, im: model.apply({"params": p}, im))

    acc_net = eval_top1(lambda im: run(params, jnp.asarray(
        im.astype(np.float32))), seed=seed + 999, n_pairs=8)
    acc_fb = eval_top1(lambda im: filterbank_features(jnp.asarray(
        im.astype(np.float32))), seed=seed + 999, n_pairs=8)
    print(f"held-out top-1 correspondence acc (K={K}): "
          f"net={acc_net:.3f}, filterbank={acc_fb:.3f}")
    return acc_net, acc_fb


if __name__ == "__main__":
    a = sys.argv[1:]
    main(steps=int(a[0]) if len(a) > 0 else 1200,
         out_path=a[1] if len(a) > 1 else None)
