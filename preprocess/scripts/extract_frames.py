"""Dump video frames to JPEGs, skipping leading black frames
(reference: preprocess/scripts/extract_frames.py)."""

import os
import sys

import numpy as np


def extract_frames(in_path: str, out_path: str):
    import imageio

    print("extracting frames:", in_path)
    os.makedirs(out_path, exist_ok=True)
    reader = imageio.get_reader(in_path)
    count = 0
    started = False
    for im in reader:
        if not started:
            if not np.any(np.asarray(im) > 0):
                continue  # leading black frame
            started = True
        imageio.imwrite("%s/%05d.jpg" % (out_path, count), im)
        count += 1
    return count


if __name__ == "__main__":
    extract_frames(sys.argv[1], sys.argv[2])
