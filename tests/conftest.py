"""Test config: force CPU backend with 8 virtual devices (sharding tests
run on a fake mesh, mirroring how the reference tests multi-GPU with
CUDA_VISIBLE_DEVICES pinning)."""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA compilation cache: jit compiles dominate test wall-time,
# and most test programs are identical across runs/PRs — CI restores this
# dir via actions/cache
_cache_dir = os.environ.get(
    "LAB4D_JIT_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
