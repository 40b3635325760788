"""Equivalence + micro-benchmark harness (parity:
lab4d/tests/utils.py:9-62 `check_func`): run two implementations on the
same inputs, assert numerical agreement, and report wall-time stats with
warmup discard — the tool the reference uses to validate optimized
rewrites against naive oracles."""

from __future__ import annotations

import time
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def check_func(
    f1: Callable,
    f2: Callable,
    args: Sequence,
    n_iters: int = 20,
    warmup: int = 3,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    names=("f1", "f2"),
):
    """Assert f1(*args) == f2(*args) and compare timings.

    Returns dict with per-fn mean/std milliseconds. Functions may return
    arrays or pytrees of arrays.
    """
    o1 = f1(*args)
    o2 = f2(*args)
    flat1, tree1 = jax.tree.flatten(o1)
    flat2, tree2 = jax.tree.flatten(o2)
    assert tree1 == tree2, f"output structure differs: {tree1} vs {tree2}"
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol, rtol=rtol
        )

    stats = {}
    for name, fn in zip(names, (f1, f2)):
        times = []
        for it in range(n_iters + warmup):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            if it >= warmup:
                times.append(time.perf_counter() - t0)
        stats[name] = {
            "mean_ms": float(np.mean(times) * 1e3),
            "std_ms": float(np.std(times) * 1e3),
        }
    return stats
