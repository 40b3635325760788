"""Distill monocular-depth U-Net weights from synthetic scenes with
analytic ground-truth depth (tests/synthetic_raw.py renderer), replacing
the reference's pretrained ZoeDepth prior
(reference: preprocess/scripts/depth.py:37-59) in a zero-egress
environment.

    python scripts/train_depth_unet.py [steps] [res] [out_path]

Writes database/weights/depth_unet.msgpack; the depth backend
auto-upgrades when that file exists (preprocess/backends/
depth_backends.py). Prints held-out scale-invariant RMSE for the trained
net vs the classical motion-parallax proxy.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from scripts.train_flow_raft import _rand_pose


def gen_frame(rng: np.random.Generator, res: int):
    """One random textured frame + GT depth (camera z, metric)."""
    import tests.synthetic_raw as sr

    K = (res * rng.uniform(0.8, 1.3), res * rng.uniform(0.8, 1.3),
         res / 2, res / 2)
    rt = _rand_pose(rng, rng.uniform(0, 1))

    orig_tex = sr._texture
    f = rng.uniform(2.0, 12.0, 3)

    def tex(p, freqs=None):
        return orig_tex(p, freqs=tuple(f if freqs is None else freqs))

    sr._texture = tex
    try:
        rgb, _, depth, _ = sr.render_frame(rt, K, res)
    finally:
        sr._texture = orig_tex
    return rgb.astype(np.float32), depth.astype(np.float32)


def make_batch(rng, B, res):
    out = [gen_frame(rng, res) for _ in range(B)]
    return tuple(np.stack([o[i] for o in out]) for i in range(2))


def silog_rmse(pred, gt) -> float:
    """Scale-invariant log RMSE (Eigen et al.) over valid gt."""
    pred = np.maximum(np.asarray(pred, np.float64), 1e-3)
    m = gt > 1e-3
    d = np.log(pred[m]) - np.log(gt[m])
    return float(np.sqrt(np.mean(d**2) - np.mean(d) ** 2))


def main(steps=1200, res=128, out_path=None, batch=4, seed=0, log_every=50):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from preprocess.backends.depth_unet import DepthUNet, weights_path

    from preprocess.backends.weights import train_out_path

    out_path = out_path or train_out_path("depth_unet.msgpack")
    rng = np.random.default_rng(seed)
    model = DepthUNet()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((res, res, 3), jnp.float32)
    )["params"]
    print("params:", sum(x.size for x in jax.tree.leaves(params)))

    sched = optax.warmup_cosine_decay_schedule(
        0.0, 3e-4, min(100, steps // 10), steps
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=1e-5))
    opt = tx.init(params)

    def loss_fn(p, rgb, gt):
        pred = jax.vmap(lambda a: model.apply({"params": p}, a))(rgb)
        valid = (gt > 1e-3).astype(jnp.float32)
        logd = jnp.log(jnp.maximum(pred, 1e-3)) - jnp.log(
            jnp.maximum(gt, 1e-3)
        )
        n = jnp.maximum(valid.sum(axis=(1, 2)), 1.0)
        mse = (valid * logd**2).sum(axis=(1, 2)) / n
        mean = (valid * logd).sum(axis=(1, 2)) / n
        silog = mse - 0.5 * mean**2
        # edge-aware gradient matching keeps boundaries crisp
        gx = jnp.abs(jnp.diff(logd, axis=2)) * valid[:, :, 1:]
        gy = jnp.abs(jnp.diff(logd, axis=1)) * valid[:, 1:, :]
        grad = gx.mean(axis=(1, 2)) + gy.mean(axis=(1, 2))
        return (silog + 0.5 * grad).mean()

    @jax.jit
    def step(p, o, rgb, gt):
        l, g = jax.value_and_grad(loss_fn)(p, rgb, gt)
        upd, o = tx.update(g, o, p)
        return optax.apply_updates(p, upd), o, l

    n_pool = min(96, max(steps, 1))
    print(f"generating {n_pool} batches ...", flush=True)
    pool = [tuple(jnp.asarray(x) for x in make_batch(rng, batch, res))
            for _ in range(n_pool)]

    t0 = time.time()
    for it in range(steps):
        rgb, gt = pool[it % n_pool]
        params, opt, l = step(params, opt, rgb, gt)
        if it % log_every == 0 or it == steps - 1:
            print(f"step {it}: loss={float(l):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    if os.path.dirname(out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"wrote {out_path}")

    # held-out comparison vs the classical motion-parallax proxy
    from preprocess.backends.depth_backends import depth_video_flowdisp

    ev_rng = np.random.default_rng(seed + 1234)
    run = jax.jit(lambda p, x: model.apply({"params": p}, x))
    e_net, e_classic = [], []
    for _ in range(4):
        rgb, gt = gen_frame(ev_rng, res)
        e_net.append(silog_rmse(run(params, jnp.asarray(rgb)), gt))
        # the classical backend needs a short motion clip
        rgb2, _ = gen_frame(ev_rng, res)
        frames8 = [(np.clip(r, 0, 1) * 255).astype(np.uint8)
                   for r in (rgb, rgb2)]
        d_classic = depth_video_flowdisp(frames8, res=res)[0]
        e_classic.append(silog_rmse(d_classic, gt))
    print(f"held-out siLog-RMSE: unet={np.mean(e_net):.3f}, "
          f"classical={np.mean(e_classic):.3f}")
    return float(np.mean(e_net)), float(np.mean(e_classic))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        steps=int(a[0]) if len(a) > 0 else 1200,
        res=int(a[1]) if len(a) > 1 else 128,
        out_path=a[2] if len(a) > 2 else None,
    )
