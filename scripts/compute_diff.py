"""Regression checker: compare two processed-dataset (or logdir) trees
npy-by-npy (reference: scripts/compute_diff.py).

  python scripts/compute_diff.py <dir_a> <dir_b> [rtol]
Exit code 1 if any array differs beyond tolerance or is missing.
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np


def compute_diff(dir_a: str, dir_b: str, rtol: float = 1e-3, atol: float = 1e-4):
    paths_a = sorted(
        glob.glob(f"{dir_a}/**/*.npy", recursive=True)
    )
    failures = []
    checked = 0
    for pa in paths_a:
        rel = os.path.relpath(pa, dir_a)
        pb = os.path.join(dir_b, rel)
        if not os.path.exists(pb):
            failures.append((rel, "missing in B"))
            continue
        a = np.load(pa).astype(np.float64)
        b = np.load(pb).astype(np.float64)
        if a.shape != b.shape:
            failures.append((rel, f"shape {a.shape} vs {b.shape}"))
            continue
        err = np.abs(a - b)
        bad = err > (atol + rtol * np.abs(b))
        if bad.any():
            failures.append(
                (rel, f"{bad.mean():.2%} px differ, max err {err.max():.4g}")
            )
        checked += 1
    extra = set(
        os.path.relpath(p, dir_b)
        for p in glob.glob(f"{dir_b}/**/*.npy", recursive=True)
    ) - set(os.path.relpath(p, dir_a) for p in paths_a)
    for rel in sorted(extra):
        failures.append((rel, "missing in A"))

    for rel, msg in failures:
        print(f"DIFF {rel}: {msg}")
    print(f"checked {checked} arrays, {len(failures)} failures")
    return failures


if __name__ == "__main__":
    rtol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-3
    sys.exit(1 if compute_diff(sys.argv[1], sys.argv[2], rtol) else 0)
