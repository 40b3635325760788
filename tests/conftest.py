"""Test config: force CPU backend with 8 virtual devices (sharding tests
run on a fake mesh, mirroring how the reference tests multi-GPU with
CUDA_VISIBLE_DEVICES pinning)."""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
