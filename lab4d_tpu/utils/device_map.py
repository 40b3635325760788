"""Process-level task parallelism over accelerator devices.

Parity: lab4d/utils/gpu_utils.py (gpu_map) — used by preprocessing and
parallel rendering to fan independent tasks out over devices. Device
pinning uses JAX-visible device env vars instead of CUDA_VISIBLE_DEVICES;
on a single-chip host this degrades to a process pool.
"""

from __future__ import annotations

import multiprocessing
import os
from typing import Callable, List, Optional, Sequence, Tuple


def _device_probe(q):
    try:
        import jax

        q.put(len(jax.devices()))
    except Exception:
        q.put(1)


def _detect_devices(timeout_s: float = 30.0) -> List[int]:
    """Count accelerator devices WITHOUT risking a hang: jax.devices()
    blocks indefinitely when the accelerator plugin's backend service is
    down (observed with a tunneled TPU), so probe in a disposable child
    process with a hard timeout and fall back to one worker."""
    if os.environ.get("LAB4D_DEVICES"):
        return list(range(int(os.environ["LAB4D_DEVICES"])))
    ctx = multiprocessing.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_device_probe, args=(q,), daemon=True)
    p.start()
    p.join(timeout_s)
    if p.is_alive() or q.empty():
        if p.is_alive():
            p.terminate()
        return [0]
    return list(range(q.get()))


def _static_worker(func, args, rank, result_queue):
    out = [func(*arg) for arg in args]
    result_queue.put((rank, out))


def _dynamic_worker(func, arg, it, dev_id, result_queue, dev_queue):
    out = func(*arg)
    dev_queue.put(dev_id)
    result_queue.put((it, out))


def device_map(
    func: Callable,
    args: Sequence[Tuple],
    devices: Optional[List[int]] = None,
    method: str = "static",
):
    """Map func over argument tuples, one process per device.

    method="static" interleaves tasks across devices up front (fastest for
    balanced workloads); "dynamic" hands tasks to devices as they free up.
    """
    mp = multiprocessing.get_context("spawn")
    if devices is None:
        devices = _detect_devices()
    prev_visible = os.environ.get("JAX_VISIBLE_DEVICES")

    try:
        if method == "static":
            args_by_rank = [[] for _ in devices]
            for it, arg in enumerate(args):
                args_by_rank[it % len(devices)].append(arg)

            result_queue = mp.Queue()
            procs = []
            for rank, dev in enumerate(devices):
                os.environ["JAX_VISIBLE_DEVICES"] = str(dev)
                p = mp.Process(
                    target=_static_worker,
                    args=(func, args_by_rank[rank], rank, result_queue),
                )
                p.start()
                procs.append(p)
            for p in procs:
                p.join()

            by_rank = {}
            while not result_queue.empty():
                rank, out = result_queue.get(block=False)
                by_rank[rank] = out
            return [
                by_rank[it % len(devices)][it // len(devices)]
                for it in range(len(args))
            ]

        if method == "dynamic":
            dev_queue = mp.Queue()
            for dev in devices:
                dev_queue.put(dev)
            result_queue = mp.Queue()
            procs = []
            for it, arg in enumerate(args):
                dev = dev_queue.get()
                os.environ["JAX_VISIBLE_DEVICES"] = str(dev)
                p = mp.Process(
                    target=_dynamic_worker,
                    args=(func, arg, it, dev, result_queue, dev_queue),
                )
                p.start()
                procs.append(p)
            for p in procs:
                p.join()

            by_it = {}
            while not result_queue.empty():
                it, out = result_queue.get(block=False)
                by_it[it] = out
            return [by_it[it] for it in range(len(args))]

        raise NotImplementedError(method)
    finally:
        if prev_visible is not None:
            os.environ["JAX_VISIBLE_DEVICES"] = prev_visible
        else:
            os.environ.pop("JAX_VISIBLE_DEVICES", None)
