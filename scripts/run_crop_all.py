"""Re-crop every processed sequence of a video collection in parallel.

Covers reference scripts/run_crop_all.py (a multiprocessing pool over
extract_crop for all seqs matching a collection prefix); here the fan-
out uses the same device_map scheduler as run_preprocess so it shares
its worker bookkeeping and works on CPU-only hosts.

    python scripts/run_crop_all.py <collection> [crop_size] [outdir]
    e.g. python scripts/run_crop_all.py cat-pikachu 256
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from lab4d_tpu.utils.device_map import device_map
from preprocess.scripts.crop import extract_crop


def crop_one(seqname: str, use_full: int, crop_size: int, outdir: str):
    """Module-level worker (device_map spawns processes; the target must
    be picklable)."""
    extract_crop(seqname, crop_size, use_full, outdir=outdir)


def main():
    if len(sys.argv) < 2 or (len(sys.argv) > 2 and not sys.argv[2].isdigit()):
        print(__doc__)
        sys.exit(1)
    collection = sys.argv[1]
    crop_size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    outdir = sys.argv[3] if len(sys.argv) > 3 else "database/processed"

    seq_dirs = sorted(
        glob.glob(os.path.join(outdir, "JPEGImages", "Full-Resolution",
                               collection + "*"))
    )
    if not seq_dirs:
        print(f"no sequences matching {collection}* under {outdir}")
        sys.exit(1)
    seqnames = [os.path.basename(p) for p in seq_dirs]

    # one task per (seq, crop/full) pair, like the reference pool
    tasks = [(s, use_full, crop_size, outdir)
             for s in seqnames for use_full in (0, 1)]
    print(f"cropping {len(seqnames)} seqs ({len(tasks)} tasks) at "
          f"{crop_size}px")
    device_map(crop_one, tasks)
    print("done")


if __name__ == "__main__":
    main()
