"""Pluggable preprocessing backends.

Each prior (flow, depth, segmentation, features) has a default backend
that runs everywhere (JAX/classical, no external weights) and optional
neural backends that activate when their dependencies + weights are
available.  Selection via env vars:

  LAB4D_DEPTH_BACKEND   = zoe | unet | flowdisp | const      (default: auto)
  LAB4D_SEG_BACKEND     = external | unet | grabcut | full   (default: auto)
  LAB4D_FEAT_BACKEND    = dinov2 | net | filterbank          (default: auto)
  LAB4D_FLOW_BACKEND    = raft | classical                    (default: auto)

"auto" picks the neural backend if importable, else the classical one.
"""

import os


def pick_backend(env_key: str, neural: str, classical: str, probe) -> str:
    """Resolve a backend name: explicit env var wins, else probe() decides."""
    choice = os.environ.get(env_key, "auto")
    if choice != "auto":
        return choice
    try:
        ok = probe()
    except Exception:
        ok = False
    return neural if ok else classical
