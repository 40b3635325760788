"""Monocular depth stage (thin wrapper over the depth backends;
reference: preprocess/scripts/depth.py)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "../..")))

from preprocess.backends.depth_backends import extract_depth  # noqa: F401

if __name__ == "__main__":
    extract_depth(sys.argv[1])
