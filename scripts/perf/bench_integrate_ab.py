"""A/B harness for the integrate() reduction form (ops/renderer.py).

Measures full-train-step time on the flagship skel-quad config with the
current tree. Used for the round-5 decision between the einsum matvec
and the VPU elementwise+reduce (the reduce avoids channel-major
relayout copies of the pallas head outputs; interleaved pairs on v5e:
einsum 21.23 ms/step mean, reduce 21.03 — see docs/performance.md).
Run on the real TPU; on CPU the layouts differ and the result is
meaningless.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import optax

from lab4d_tpu.engine.schedules import compute_sched
from __graft_entry__ import _build


def main(steps: int = 30):
    model, batch = _build(M=128, N=16, num_frames=64, fg_motion="skel-quad")
    rngs = {
        "params": jax.random.PRNGKey(0),
        "aux": jax.random.PRNGKey(1),
        "swap": jax.random.PRNGKey(2),
    }
    params = jax.jit(model.init, static_argnames=("train",))(
        rngs, batch, compute_sched(0), train=True
    )["params"]
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(5e-4, weight_decay=1e-4))
    opt_state = tx.init(params)

    def train_step(params, opt_state, batch, step, rng):
        sched = compute_sched(step)
        r_aux, r_swap = jax.random.split(rng)

        def loss_fn(p):
            ld = model.apply(
                {"params": p}, batch, sched, train=True,
                rngs={"aux": r_aux, "swap": r_swap},
            )
            return sum(jax.tree.leaves(ld))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    f = jax.jit(train_step, donate_argnums=(0, 1))
    for i in range(3):
        params, opt_state, loss = f(params, opt_state, batch, float(i), jax.random.PRNGKey(i))
    _ = float(loss)  # host readback is the only reliable fence under axon
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss = f(params, opt_state, batch, float(i), jax.random.PRNGKey(i))
    _ = float(loss)
    dt = time.perf_counter() - t0
    print(f"ms/step={dt / steps * 1e3:.2f} rays/s={4096 * steps / dt:.0f}")


if __name__ == "__main__":
    main()
