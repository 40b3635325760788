"""Device-mesh construction and sharding helpers.

Replaces the reference's NCCL/DDP layer (train.py:28-33, trainer.py:110-115):
parallelism is expressed as sharding annotations on a jitted step.
Axes:
  data  — shards the ray/image batch (DP parity with DDP)
  video — shards per-video streams for category models (RAC-style)

Multi-host (DCN) extends the same mesh via jax.distributed.initialize;
collectives ride ICI within a slice.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: Optional[int] = None, num_video: int = 1, devices=None
) -> Mesh:
    """Build a ("data", "video") mesh over available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_video
    used = devices[: num_data * num_video]
    arr = np.asarray(used).reshape(num_data, num_video)
    return Mesh(arr, ("data", "video"))


def batch_sharding(mesh: Mesh):
    """Shard the leading (image) axis of every batch leaf over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh):
    """Device-put a host batch with its leading axis sharded over "data";
    scalars and geo state are replicated."""
    data_s = batch_sharding(mesh)
    repl = replicated(mesh)

    def place(path, x):
        # geo state is replicated; per-image arrays shard on axis 0
        if any("geo" == p for p in path):
            return jax.device_put(x, repl)
        return jax.device_put(x, data_s)

    import jax.tree_util as jtu

    flat, tree = jtu.tree_flatten_with_path(batch)
    placed = [
        place([getattr(k, "key", str(k)) for k in path], x) for path, x in flat
    ]
    return jtu.tree_unflatten(tree, placed)


def init_distributed():
    """Multi-host init (no-op on single host)."""
    import os

    if os.environ.get("LAB4D_MULTIHOST", "0") == "1":
        jax.distributed.initialize()
