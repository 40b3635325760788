"""Distill RAFT-lite flow weights from synthetic scenes with analytic
ground-truth flow (tests/synthetic_raw.py renderer), replacing the
reference's pretrained VCNPlus prior
(preprocess/third_party/vcnplus/compute_flow.py) in a zero-egress
environment.

    python scripts/train_flow_raft.py [steps] [res] [out_path]

Writes database/weights/flow_raft.msgpack (~2.3 MB); the flow backend
auto-upgrades when that file exists (preprocess/scripts/compute_flow.py).
Prints held-out EPE for the trained net vs the classical pyramid flow.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from tests.synthetic_raw import CAM_DIST, render_frame, orbit_pose, project


def _pose(t, el, dd):
    """Orbit pose at phase t with elevation el (rad) and distance offset."""
    rt = orbit_pose(t, dist=CAM_DIST + dd)
    R_x = np.array(
        [
            [1, 0, 0],
            [0, np.cos(el), -np.sin(el)],
            [0, np.sin(el), np.cos(el)],
        ]
    )
    rt2 = np.eye(4)
    rt2[:3, :3] = R_x @ rt[:3, :3]
    rt2[:3, 3] = R_x @ rt[:3, 3]
    return rt2


def _rand_pose(rng, t):
    """Orbit pose with random elevation/distance jitter."""
    return _pose(t, rng.uniform(-0.5, 0.5), rng.uniform(-0.6, 0.9))


def gen_pair(rng: np.random.Generator, res: int):
    """One random textured pair + dense GT flow (px) + valid mask."""
    import tests.synthetic_raw as sr

    K = (res * rng.uniform(0.8, 1.3), res * rng.uniform(0.8, 1.3),
         res / 2, res / 2)
    t0 = rng.uniform(0, 1)
    dt = rng.uniform(0.005, 0.05) * rng.choice([-1, 1])
    # scene-level jitter (elevation, distance) is SHARED between the two
    # frames — re-drawing it per frame (the round-1..3 behavior) made
    # every "adjacent-frame" pair jump up to ~57 deg of elevation, i.e.
    # mean |flow| ~46 px at 128 res, nothing like the delta 1..8 frame
    # pairs the preprocessing pipeline actually computes; the camera may
    # still drift slightly within a pair
    el = rng.uniform(-0.5, 0.5)
    dd = rng.uniform(-0.6, 0.9)
    rt0 = _pose(t0, el, dd)
    rt1 = _pose(
        t0 + dt, el + rng.uniform(-0.03, 0.03), dd + rng.uniform(-0.05, 0.05)
    )

    # vary the procedural texture per scene
    orig_tex = sr._texture
    f = rng.uniform(2.0, 12.0, 3)

    def tex(p, freqs=None):
        return orig_tex(p, freqs=tuple(f if freqs is None else freqs))

    sr._texture = tex
    try:
        rgb0, fg0, _, pts0 = render_frame(rt0, K, res)
        rgb1, _, _, _ = render_frame(rt1, K, res)
    finally:
        sr._texture = orig_tex

    xs, ys = np.meshgrid(np.arange(res), np.arange(res), indexing="xy")
    px1 = project(pts0, rt1, K)
    flow = px1 - np.stack([xs, ys], -1)
    # occlusion: where the fg sphere covers the re-projected point in
    # frame 1 but the source pixel was bg (or vice versa) supervision is
    # wrong; mask by re-render depth consistency
    _, _, _, pts1 = render_frame(rt1, K, res)
    inb = ((px1[..., 0] >= 0) & (px1[..., 0] < res - 1)
           & (px1[..., 1] >= 0) & (px1[..., 1] < res - 1))
    xi = np.clip(px1[..., 0].round().astype(int), 0, res - 1)
    yi = np.clip(px1[..., 1].round().astype(int), 0, res - 1)
    same_pt = np.linalg.norm(pts1[yi, xi] - pts0, axis=-1) < 0.08
    valid = (inb & same_pt).astype(np.float32)
    return (rgb0.astype(np.float32), rgb1.astype(np.float32),
            flow.astype(np.float32), valid)


def make_batch(rng, B, res):
    out = [gen_pair(rng, res) for _ in range(B)]
    return tuple(np.stack([o[i] for o in out]) for i in range(4))


def epe(pred, gt, valid):
    e = np.linalg.norm(np.asarray(pred) - gt, axis=-1)
    return float((e * valid).sum() / np.maximum(valid.sum(), 1))


def main(steps=1500, res=128, out_path=None, batch=4, seed=0,
         log_every=50):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from preprocess.backends.flow_raft import RAFTLite, weights_path

    from preprocess.backends.weights import train_out_path

    out_path = out_path or train_out_path("flow_raft.msgpack")
    rng = np.random.default_rng(seed)
    model = RAFTLite()
    d = jnp.zeros((res, res, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), d, d)["params"]
    print("params:", sum(x.size for x in jax.tree.leaves(params)))

    sched = optax.warmup_cosine_decay_schedule(
        0.0, 2e-4, min(100, steps // 10), steps
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=1e-5))
    opt = tx.init(params)

    def loss_fn(p, i0, i1, gt, valid):
        pred = jax.vmap(
            lambda a, b: model.apply({"params": p}, a, b)
        )(i0, i1)
        err = jnp.abs(pred - gt).sum(-1)
        return (err * valid).sum() / jnp.maximum(valid.sum(), 1.0)

    @jax.jit
    def step(p, o, i0, i1, gt, valid):
        l, g = jax.value_and_grad(loss_fn)(p, i0, i1, gt, valid)
        upd, o = tx.update(g, o, p)
        return optax.apply_updates(p, upd), o, l

    # pre-stage the dataset on device: per-step host->device uploads are
    # ~1 s through the tunneled TPU, so generate a fixed pool of batches
    # once and cycle (pool size caps memory; 96 batches x 4 pairs is
    # plenty of diversity for a 580k-param net)
    n_pool = min(96, max(steps, 1))
    print(f"generating {n_pool} batches ...", flush=True)
    pool = []
    for _ in range(n_pool):
        b = make_batch(rng, batch, res)
        pool.append(tuple(jnp.asarray(x) for x in b))

    t0 = time.time()
    for it in range(steps):
        i0, i1, gt, valid = pool[it % n_pool]
        params, opt, l = step(params, opt, i0, i1, gt, valid)
        if it % log_every == 0 or it == steps - 1:
            print(f"step {it}: loss={float(l):.3f} px "
                  f"({time.time() - t0:.0f}s)", flush=True)

    if os.path.dirname(out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"wrote {out_path}")

    # held-out comparison vs the classical pyramid backend
    from preprocess.backends.flow_jax import flow_pyramid, to_gray

    ev_rng = np.random.default_rng(seed + 1234)
    run = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b))
    e_raft, e_classic = [], []
    for _ in range(8):
        i0, i1, gt, valid = gen_pair(ev_rng, res)
        e_raft.append(epe(run(params, jnp.asarray(i0), jnp.asarray(i1)),
                          gt, valid))
        import cv2

        g0 = cv2.cvtColor((i0 * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
        g1 = cv2.cvtColor((i1 * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
        fc = flow_pyramid(jnp.asarray(g0, jnp.float32) / 255.0,
                          jnp.asarray(g1, jnp.float32) / 255.0)
        e_classic.append(epe(fc, gt, valid))
    print(f"held-out EPE: raft={np.mean(e_raft):.2f} px, "
          f"classical={np.mean(e_classic):.2f} px")
    return float(np.mean(e_raft)), float(np.mean(e_classic))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        steps=int(a[0]) if len(a) > 0 else 1500,
        res=int(a[1]) if len(a) > 1 else 128,
        out_path=a[2] if len(a) > 2 else None,
    )
