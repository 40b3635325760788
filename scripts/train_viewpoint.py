"""Distill canonical-viewpoint CNN weights from synthetic articulated
scenes with known canonical pose, replacing the reference's pretrained
DensePose-CSE viewpoint heads
(reference: preprocess/third_party/viewpoint/dp_viewpoint.py) in a
zero-egress environment.

    python scripts/train_viewpoint.py [steps] [out_path]

Writes database/weights/viewpoint_net.msgpack; canonical registration
auto-upgrades when that file exists. Prints held-out geodesic rotation
error vs the random-rotation chance level (~126 deg).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from preprocess.backends.viewpoint_net import RES


def _rand_rotation(rng: np.random.Generator) -> np.ndarray:
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def gen_sample(rng: np.random.Generator, res: int = RES):
    """Render the articulated creature from a random viewpoint; returns
    (masked rgb crop, canonical-to-camera rotation)."""
    import tests.synthetic_adversarial as sa
    from preprocess.backends.viewpoint_net import crop_masked

    R = _rand_rotation(rng)
    rt = np.eye(4)
    rt[:3, :3] = R
    rt[2, 3] = rng.uniform(2.0, 3.4)

    t = rng.uniform(0, 1)  # random articulation phase
    K = (res * rng.uniform(0.9, 1.4), res * rng.uniform(0.9, 1.4),
         res / 2, res / 2)

    orig = sa.cam_pose
    sa.cam_pose = lambda _t, dist=2.6: rt
    try:
        rgb, hit, _, _, _, _ = sa.render_frame(t, K, res)
    finally:
        sa.cam_pose = orig
    crop = crop_masked(
        (np.clip(rgb, 0, 1) * 255).astype(np.uint8), hit.astype(np.int8)
    )
    if crop is None:  # object out of frame: resample
        return gen_sample(rng, res)
    return crop.astype(np.float32), R.astype(np.float32)


def make_batch(rng, B):
    out = [gen_sample(rng) for _ in range(B)]
    return tuple(np.stack([o[i] for o in out]) for i in range(2))


def geodesic_deg(Ra: np.ndarray, Rb: np.ndarray) -> float:
    tr = np.trace(np.asarray(Ra).T @ np.asarray(Rb))
    return float(np.rad2deg(np.arccos(np.clip((tr - 1) / 2, -1, 1))))


def main(steps=1500, out_path=None, batch=16, seed=0, log_every=50):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from preprocess.backends.viewpoint_net import ViewpointNet, weights_path

    from preprocess.backends.weights import train_out_path

    out_path = out_path or train_out_path("viewpoint_net.msgpack")
    rng = np.random.default_rng(seed)
    model = ViewpointNet()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((RES, RES, 3), jnp.float32)
    )["params"]
    print("params:", sum(x.size for x in jax.tree.leaves(params)))

    sched = optax.warmup_cosine_decay_schedule(
        0.0, 3e-4, min(100, steps // 10), steps
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=1e-5))
    opt = tx.init(params)

    def loss_fn(p, imgs, Rs):
        pred = jax.vmap(lambda a: model.apply({"params": p}, a))(imgs)
        # geodesic-equivalent Frobenius loss
        return jnp.mean(jnp.sum((pred - Rs) ** 2, axis=(-2, -1)))

    @jax.jit
    def step(p, o, imgs, Rs):
        l, g = jax.value_and_grad(loss_fn)(p, imgs, Rs)
        upd, o = tx.update(g, o, p)
        return optax.apply_updates(p, upd), o, l

    n_pool = min(96, max(steps, 1))
    print(f"generating {n_pool} batches ...", flush=True)
    pool = [tuple(jnp.asarray(x) for x in make_batch(rng, batch))
            for _ in range(n_pool)]

    t0 = time.time()
    for it in range(steps):
        imgs, Rs = pool[it % n_pool]
        params, opt, l = step(params, opt, imgs, Rs)
        if it % log_every == 0 or it == steps - 1:
            print(f"step {it}: loss={float(l):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    if os.path.dirname(out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"wrote {out_path}")

    # held-out geodesic error
    ev = np.random.default_rng(seed + 1234)
    run = jax.jit(lambda p, x: model.apply({"params": p}, x))
    errs = []
    for _ in range(32):
        img, R = gen_sample(ev)
        errs.append(geodesic_deg(run(params, jnp.asarray(img)), R))
    print(f"held-out geodesic error: median={np.median(errs):.1f} deg "
          f"(chance ~126 deg)")
    return float(np.median(errs))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(steps=int(a[0]) if len(a) > 0 else 1500,
         out_path=a[1] if len(a) > 1 else None)
