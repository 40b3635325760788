"""Offline preprocessing pipeline: raw videos -> database/processed/** priors.

TPU-native re-design of the reference pipeline (reference:
preprocess/ + scripts/run_preprocess.py). Stages:

  frames -> filter -> segmentation -> flow -> depth -> crop/pack
         -> camera registration -> TSDF fusion -> canonical registration
         -> feature extraction

Heavy dense compute (optical flow, TSDF fusion, canonical-pose
optimization, feature filter banks) runs as jitted JAX programs so the
same code targets TPU or CPU; external neural priors (ZoeDepth, SAM /
Track-Anything, DINOv2) are pluggable backends that gate cleanly when
their weights are unavailable (see preprocess/backends/).
"""
