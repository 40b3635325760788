"""Benchmark: training-step throughput (rays/sec/chip) on the flagship
deformable model (skel-quad, default flags: 128 imgs x 2(pair) x 16 px =
4096 rays/iter, 64 samples/ray).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference PyTorch skel-quad training throughput ~13k rays/s on
one RTX 3090 (BASELINE.md: 4096 rays x 4000 iters / 1260 s).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_RAYS_PER_SEC = 13_000.0


def wait_for_healthy_backend(budget_s: float = 2400.0) -> bool:
    """Probe the accelerator in a timed child process until it answers.

    The tunneled TPU service intermittently degrades so far that even
    `jax.devices()` blocks forever in-process; probing in a killable
    subprocess is the only safe health check. Retries within `budget_s`
    (compile service outages have lasted hours), returns False if the
    backend never comes up so the caller can fail cleanly instead of
    hanging the driver."""
    probe = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((512, 512));"
        "(x @ x).block_until_ready();"
        "print('BENCH_PROBE_OK')"
    )
    deadline = time.monotonic() + budget_s
    while True:
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe],
                capture_output=True, text=True, timeout=180,
            )
            if "BENCH_PROBE_OK" in out.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False
        print("bench: backend unhealthy, retrying...", file=sys.stderr)
        time.sleep(120)


def hardware_probe(n: int = 20) -> float:
    """Fixed-protocol speed probe: ms per 4096^2 f32 matmul.

    The tunneled v5e's effective speed moves between hardware windows
    (docs/performance.md measured a 1.6x swing on identical code); every
    bench line carries this figure so window-to-window drift in the
    workload numbers is normalizable."""
    import jax
    import jax.numpy as jnp

    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (4096, 4096), jnp.float32)

    @jax.jit
    def chain(x):
        for _ in range(4):
            x = x @ a
        return x

    out = chain(a)
    _ = float(out[0, 0])  # host readback is the only reliable axon fence
    t0 = time.perf_counter()
    out = a
    for _ in range(n):
        out = chain(out)
    _ = float(out[0, 0])
    return (time.perf_counter() - t0) / (4 * n) * 1e3


def render_bench(topk: int) -> dict:
    """Render fps @512^2, full channel set, via the standalone harness
    (scripts/perf/bench_render.py) in a subprocess. topk=0 is the
    reference-comparable EXACT every-sample evaluation (ref
    nerf.py:686-738); topk=8 is the render CLI's shipped default
    (weight-ranked heavy-head eval — exact density/mask/depth, rgb
    within 60 dB of exact; nerf._eval_topk). Returns {} on failure so a
    render-side breakage cannot take down the train metric."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "perf", "bench_render.py")
    try:
        env = dict(os.environ, LAB4D_EVAL_TOPK=str(topk))
        # mode-optimal chunk (docs/performance.md sweeps): exact prefers
        # 512-1024 (505.8 @512 vs 583.7 @2048), topk prefers 2048
        chunk = "2048" if topk else "1024"
        out = subprocess.run(
            [sys.executable, script, "512", chunk, "3"],
            capture_output=True, text=True, timeout=1200, env=env,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "fps" in d:
                return d
    except (subprocess.TimeoutExpired, OSError):
        pass
    return {}


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from lab4d_tpu.engine.schedules import compute_sched
    from __graft_entry__ import _build

    probe_ms = hardware_probe()

    imgs, px = 128, 16
    model, batch = _build(M=imgs, N=px, num_frames=64, fg_motion="skel-quad")
    rays = imgs * 2 * px

    rngs = {
        "params": jax.random.PRNGKey(0),
        "aux": jax.random.PRNGKey(1),
        "swap": jax.random.PRNGKey(2),
    }
    sched = compute_sched(0)
    params = jax.jit(model.init, static_argnames=("train",))(
        rngs, batch, sched, train=True
    )["params"]

    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(5e-4, weight_decay=1e-4),
    )
    opt_state = tx.init(params)

    def train_step(params, opt_state, batch, step, rng):
        sched = compute_sched(step)
        r_aux, r_swap = jax.random.split(rng)

        def loss_fn(p):
            loss_dict = model.apply(
                {"params": p}, batch, sched, train=True,
                rngs={"aux": r_aux, "swap": r_swap},
            )
            return sum(jax.tree.leaves(loss_dict))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step_fn = jax.jit(train_step, donate_argnums=(0, 1))

    # warmup (compile + 2 steps); use a scalar readback as the fence —
    # under the axon remote platform block_until_ready is not a reliable
    # barrier, a host transfer is
    for i in range(3):
        params, opt_state, loss = step_fn(
            params, opt_state, batch, float(i), jax.random.PRNGKey(i)
        )
    _ = float(loss)

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss = step_fn(
            params, opt_state, batch, float(i), jax.random.PRNGKey(i)
        )
    _ = float(loss)
    dt = time.perf_counter() - t0

    rays_per_sec = rays * iters / dt


    # driver metric FIRST (one parseable line), extra metrics after;
    # probe_matmul_ms is the fixed-protocol hardware-window probe that
    # makes numbers comparable across windows (docs/performance.md)
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
                "probe_matmul_ms": round(probe_ms, 3),
            }
        ),
        flush=True,
    )

    # both render numbers, every round: exact (reference-comparable,
    # every-sample eval) AND the shipped topk=8 approximation — the two
    # metrics changed meaning mid-series in round 4; never again
    for name, topk in (
        ("render_fps_512_full_channels_exact", 0),
        ("render_fps_512_full_channels_topk8", 8),
    ):
        rb = render_bench(topk)
        if rb:
            # reference render baseline: ~164k rays/s on a 3090 (BASELINE.md)
            print(
                json.dumps(
                    {
                        "metric": name,
                        "value": rb.get("fps"),
                        "unit": "fps",
                        "vs_baseline": round(
                            rb.get("rays_per_sec", 0.0) / 164_000.0, 3
                        ),
                        "ms_per_frame": rb.get("ms_per_frame"),
                        "probe_matmul_ms": round(probe_ms, 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    if not wait_for_healthy_backend():
        # never hang the driver: record the outage as a measurable zero
        print(
            json.dumps(
                {
                    "metric": "train_rays_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "rays/s",
                    "vs_baseline": 0.0,
                    "error": "accelerator backend unreachable (service outage)",
                }
            )
        )
        sys.exit(0)
    main()
