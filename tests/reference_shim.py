"""Import helper for `/root/reference/lab4d` (the upstream PyTorch
implementation) on a CPU-only box.

The reference's package __init__ imports the whole model stack, which
pulls GPU/third-party deps that are absent here (trimesh, pysdf, skimage,
cv2, the CUDA quaternion extension). None of their functionality is
needed for numeric parity checks of the math layer — torch CPU is — so
this shim installs minimal stand-ins in sys.modules before the import.

Used by tests/test_reference_parity.py, which asserts OUR jax
implementations agree numerically with the reference's torch code on
golden inputs (VERDICT round-2 item 2).
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _importable(name):
    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ValueError):
        return False


def _rodrigues(rvec):
    """cv2.Rodrigues for axis-angle -> rotation matrix (numpy)."""
    import numpy as _np

    r = _np.asarray(rvec, dtype=_np.float64).reshape(3)
    theta = float(_np.linalg.norm(r))
    if theta < 1e-12:
        return _np.eye(3), None
    k = r / theta
    K = _np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
    )
    R = _np.eye(3) + _np.sin(theta) * K + (1 - _np.cos(theta)) * (K @ K)
    return R, None


def _stub(name, added, **attrs):
    """Install a fake module named `name` ONLY if it is genuinely
    unimportable in this environment; record it in `added` so it can be
    removed from sys.modules once the reference is loaded. Never shadows
    a real installed package (round-3 regression: stubbing installed
    cv2/imageio poisoned every later test in the same pytest process)."""
    if name in sys.modules:
        return sys.modules[name]
    if _importable(name):
        return None  # real module exists; let the reference import it
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    added.append(name)
    return m


def import_reference():
    """Import and return the reference's math/nn modules. Returns a dict
    with quat_transform, geom_utils, skel_utils, render_utils, embedding,
    plus torch.

    Stubs for genuinely-missing third-party deps are installed only for
    the duration of the reference import and removed afterwards (the
    loaded reference modules keep their own references); likewise
    REFERENCE_ROOT is dropped from sys.path again so the reference's
    top-level `preprocess`/`scripts`/`browser` packages can never shadow
    this repo's."""

    class _Placeholder:
        def __init__(self, *a, **k):
            raise RuntimeError("stubbed third-party module used")

    added_stubs = []
    path_added = REFERENCE_ROOT not in sys.path
    if path_added:
        sys.path.insert(0, REFERENCE_ROOT)

    _stub("trimesh", added_stubs, Trimesh=_Placeholder,
          creation=types.SimpleNamespace())
    _stub("pysdf", added_stubs, SDF=_Placeholder)
    _stub("gdown", added_stubs)
    _stub("cv2", added_stubs, Rodrigues=_rodrigues)
    _stub("imageio", added_stubs)
    sk = _stub("skimage", added_stubs)
    skm = _stub("skimage.measure", added_stubs, marching_cubes=_Placeholder)
    if sk is not None and skm is not None:
        sk.measure = skm
    # the CUDA quaternion extension: quat_transform only calls it for
    # CUDA tensors; CPU tensors take the jit-scripted fallbacks
    _stub(
        "quaternion",
        added_stubs,
        quaternion_mul=_Placeholder,
        quaternion_conjugate=_Placeholder,
    )

    try:
        import torch  # noqa: F401

        from lab4d.utils import (  # noqa: F401
            geom_utils,
            quat_transform,
            render_utils,
            skel_utils,
        )
        from lab4d.nnutils import embedding  # noqa: F401
    finally:
        for name in added_stubs:
            sys.modules.pop(name, None)
        if path_added and REFERENCE_ROOT in sys.path:
            sys.path.remove(REFERENCE_ROOT)

    # the reference's public quaternion_mul only handles (..., 3) "pure"
    # quaternion operands on its CUDA path (src/quaternion.cu supports 3-
    # or 4-vector operands); its CPU fallback requires 4. Restore the CUDA
    # dispatch semantics on CPU using the reference's OWN scripted
    # 3D-operand kernels so functions like quaternion_apply/fk_se3 run.
    _orig_mul = quat_transform.quaternion_mul

    def _mul_cpu(a, b):
        if a.shape[-1] == 3 and b.shape[-1] == 4:
            return quat_transform._quaternion_3D_mul_4D(a, b)
        if a.shape[-1] == 4 and b.shape[-1] == 3:
            return quat_transform._quaternion_4D_mul_3D(a, b)
        return _orig_mul(a, b)

    quat_transform.quaternion_mul = _mul_cpu

    return dict(
        torch=torch,
        quat_transform=quat_transform,
        geom_utils=geom_utils,
        skel_utils=skel_utils,
        render_utils=render_utils,
        embedding=embedding,
    )


_cache = None


def get_reference():
    global _cache
    if _cache is None:
        _cache = import_reference()
    return _cache
