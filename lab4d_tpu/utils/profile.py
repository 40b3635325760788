"""Tracing / profiling utilities.

Parity: lab4d/utils/profile_utils.py — the reference wraps
torch.profiler.record_function around every function in the package
(lab4d/__init__.py:34-63) and dumps Chrome traces per round
(profile_utils.py:113-161). Here the equivalents are jax.named_scope
spans (visible in XLA/TPU traces) and jax.profiler trace dumps.
"""

from __future__ import annotations

import contextlib
import functools
import inspect
import os
import types
from typing import Optional

import jax


def record_function(name: str):
    """Decorator adding a named XLA scope around a function, so it shows up
    as a span in profiler traces (parity: profile_utils.py:12-51)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with jax.named_scope(name):
                return fn(*args, **kwargs)

        return wrapper

    return deco


def record_class(cls):
    """Decorate every public method of a class (profile_utils.py:54-90)."""
    for attr_name, attr in list(vars(cls).items()):
        if attr_name.startswith("__"):
            continue
        if isinstance(attr, types.FunctionType):
            setattr(
                cls, attr_name,
                record_function(f"{cls.__name__}.{attr_name}")(attr),
            )
    return cls


def decorate_module(module, recurse: bool = False):
    """Wrap all functions/classes of a module in named scopes
    (profile_utils.py:93-110)."""
    for attr_name in dir(module):
        if attr_name.startswith("__"):
            continue
        attr = getattr(module, attr_name)
        if isinstance(attr, types.FunctionType) and attr.__module__ == module.__name__:
            setattr(module, attr_name, record_function(attr_name)(attr))
        elif inspect.isclass(attr) and attr.__module__ == module.__name__:
            record_class(attr)
    return module


@contextlib.contextmanager
def tpu_profile(save_dir: str, tag: str, enabled: bool = True):
    """Context manager dumping a TPU/host trace viewable in TensorBoard or
    Perfetto (parity: torch_profile, profile_utils.py:113-161)."""
    if not enabled:
        yield
        return
    trace_dir = os.path.join(save_dir, f"trace_{tag}")
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield
    print(f"[profile] trace written to {trace_dir}")


def annotate(name: Optional[str] = None):
    """Lightweight span annotation for hot functions inside jit."""

    def deco(fn):
        scope = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with jax.named_scope(scope):
                return fn(*args, **kwargs)

        return wrapper

    return deco
