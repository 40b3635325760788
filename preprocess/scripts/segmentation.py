"""Segmentation stage (thin wrapper over the segmentation backends;
reference: scripts/run_preprocess.py track_anything_lab4d)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "../..")))

from preprocess.backends.seg_backends import run_segmentation  # noqa: F401

if __name__ == "__main__":
    seqname = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else "database/processed"
    prompt = sys.argv[3] if len(sys.argv) > 3 else ""
    run_segmentation(seqname, outdir, prompt)
