"""Worker for the 2-process jax.distributed smoke test
(tests/test_multiprocess.py). Each process owns 2 virtual CPU devices;
the global mesh spans both processes (4 devices), so the jitted loss
really crosses the process boundary (the DCN analog of the reference's
torchrun/NCCL launch, scripts/train.sh:12-16).

usage: distributed_worker.py <process_id> <num_processes> <port>
       (num_processes=1 runs the single-process reference on the same
       4-device mesh in one process)
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
devs_per_proc = 4 // nproc

os.environ["JAX_PLATFORMS"] = "cpu"
flags = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
flags.append(f"--xla_force_host_platform_device_count={devs_per_proc}")
os.environ["XLA_FLAGS"] = " ".join(flags)
os.environ["LAB4D_FUSED_MLP"] = "0"
for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
            "TPU_NAME", "TPU_WORKER_HOSTNAMES"):
    os.environ.pop(var, None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")  # axon ignores the env var

if nproc > 1:
    os.environ["LAB4D_MULTIHOST"] = "1"
    os.environ["LAB4D_COORDINATOR"] = f"localhost:{port}"
    os.environ["LAB4D_NUM_PROCESSES"] = str(nproc)
    os.environ["LAB4D_PROCESS_ID"] = str(pid)
    from lab4d_tpu.parallel.mesh_utils import init_distributed

    init_distributed()
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from __graft_entry__ import _build
from lab4d_tpu.engine.schedules import compute_sched

n_global = len(jax.devices())
assert n_global == 4, n_global
mesh = Mesh(np.asarray(jax.devices()), ("data",))

model, batch = _build(M=2 * n_global, N=4)
rngs = {
    "params": jax.random.PRNGKey(0),
    "aux": jax.random.PRNGKey(1),
    "swap": jax.random.PRNGKey(2),
}
sched = compute_sched(0)
# every process initializes from the same keys -> identical params; the
# replicated global array is then assembled from process-local copies
params_local = jax.jit(model.init, static_argnames=("train",))(
    rngs, batch, sched, train=True
)["params"]

repl = NamedSharding(mesh, P())
data_sh = NamedSharding(mesh, P("data"))


def to_global(np_arr, sharding):
    np_arr = np.asarray(np_arr)
    return jax.make_array_from_callback(
        np_arr.shape, sharding, lambda idx: np_arr[idx]
    )


params_g = jax.tree.map(lambda a: to_global(a, repl), params_local)
geo = batch.pop("geo")
batch_g = {k: to_global(v, data_sh) for k, v in batch.items()}
batch_g["geo"] = jax.tree.map(lambda a: to_global(a, repl), geo)


def loss_fn(p, b):
    ld = model.apply(
        {"params": p}, b, sched, train=True,
        rngs={"aux": jax.random.PRNGKey(3), "swap": jax.random.PRNGKey(4)},
    )
    return sum(jax.tree.leaves(ld))


step = jax.jit(jax.value_and_grad(loss_fn), out_shardings=(repl, repl))
loss, grads = step(params_g, batch_g)
gnorm = jax.jit(
    lambda g: jnp.sqrt(
        sum(jnp.sum(x * x) for x in jax.tree.leaves(g))
    ),
    out_shardings=repl,
)(grads)
# replicated outputs are process-locally addressable
print(f"RESULT pid={pid} loss={float(loss):.8f} gnorm={float(gnorm):.6f}",
      flush=True)
