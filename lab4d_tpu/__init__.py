"""lab4d_tpu: a TPU-native JAX framework for 4D reconstruction from monocular video.

Re-designed from scratch with the capabilities of the Lab4D reference
(BANMo / RAC / Total-Recon style per-scene optimization): canonical SDF
neural fields, appearance/visibility/feature fields, time-varying camera
pose + intrinsics, and articulated/deformable warp fields, optimized by
differentiable volume rendering against pre-extracted priors.

Architecture: pure-functional flax/optax modules, jit-compiled train and
render steps, Pallas kernels for the fused ray pipeline, and
jax.sharding meshes (data/video axes) in place of the reference's
PyTorch-DDP/NCCL stack.
"""

__version__ = "0.1.0"
