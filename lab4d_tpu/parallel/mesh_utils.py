"""Device-mesh construction and sharding helpers.

Replaces the reference's NCCL/DDP layer (train.py:28-33, trainer.py:110-115):
parallelism is expressed as sharding annotations on a jitted step.
Axes:
  data  — shards the ray/image batch (DP parity with DDP)
  video — shards per-video parameter tables + pixel streams for category
          models (RAC-style, docs/source/tutorials/category_model.rst:41)

Multi-host (DCN) extends the same mesh via jax.distributed.initialize;
collectives ride ICI within a slice.

Used by engine/trainer.py (train-step shardings), lab4d_tpu/train.py
(multi-host init) and __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# Parameter-name tokens that mark per-video tables (leading dim = num
# videos): instance codes (embedding.py:230-294 in the reference), camera
# base rotations (pose.py:60-77 here), intrinsics base focal/ppoint.
PER_VIDEO_PARAM_TOKENS = (
    "inst_embedding",
    "base_quat",
    "base_logfocal",
    "base_ppoint",
    "base_trans",
)


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


def batch_pspec() -> P:
    """Shard the leading (image) axis of batch leaves over BOTH mesh axes:
    each device holds its own slice of the pixel stream (DP over rays; the
    category config additionally splits the stream by video shard)."""
    return P(("data", "video"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_pspec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_pspecs(params, num_vids: int, num_video_shards: int):
    """PartitionSpec tree for the model params: per-video tables are
    sharded on axis 0 over "video", everything else replicated.

    A leaf is per-video iff its path contains one of
    PER_VIDEO_PARAM_TOKENS *and* its leading dim equals ``num_vids``
    (the name check avoids false positives like a (4,)-bias on a
    quaternion head).
    """
    import jax.tree_util as jtu

    def spec(path, leaf):
        if num_video_shards > 1 and num_vids % num_video_shards == 0:
            names = "/".join(str(getattr(k, "key", k)) for k in path)
            if (
                any(tok in names for tok in PER_VIDEO_PARAM_TOKENS)
                and getattr(leaf, "ndim", 0) >= 1
                and leaf.shape[0] == num_vids
            ):
                return P("video")
        return P()

    flat, tree = jtu.tree_flatten_with_path(params)
    return jtu.tree_unflatten(tree, [spec(p, x) for p, x in flat])


def param_shardings(mesh: Mesh, params, num_vids: int):
    """NamedSharding tree matching :func:`param_pspecs` on ``mesh``."""
    num_video_shards = mesh.shape.get("video", 1)
    specs = param_pspecs(params, num_vids, num_video_shards)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def init_opt_state(tx, params, mesh: Mesh):
    """Optimizer init on already-sharded params: moments created via
    zeros_like inherit their parameter's sharding; leaves created from
    scratch (e.g. adam's step count) land on a single device and are
    re-placed replicated so every train-step argument lives on ``mesh``."""
    opt_state = tx.init(params)
    repl = replicated(mesh)

    def fix(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh == mesh:
            return x
        return jax.device_put(x, repl)

    return jax.tree.map(fix, opt_state)


def shard_batch(batch: Dict, mesh: Mesh):
    """Device-put a host batch with its leading axis sharded over the
    mesh; scalars and geo state are replicated."""
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
    """Multi-host init (no-op on single host).

    Mirrors the reference's torch.distributed.init_process_group
    (train.py:28-33). Two modes, both behind LAB4D_MULTIHOST=1:
      * TPU pods: coordinator/topology comes from the environment —
        bare jax.distributed.initialize().
      * explicit rendezvous (the reference's env:// analog, also used by
        the 2-process CPU smoke test): LAB4D_COORDINATOR=host:port,
        LAB4D_NUM_PROCESSES, LAB4D_PROCESS_ID.
    """
    import os

    if os.environ.get("LAB4D_MULTIHOST", "0") != "1":
        return
    coord = os.environ.get("LAB4D_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["LAB4D_NUM_PROCESSES"]),
            process_id=int(os.environ["LAB4D_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()
