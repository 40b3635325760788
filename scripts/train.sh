#!/bin/bash
# Launch training (reference: scripts/train.sh wrapped torchrun; the JAX
# stack is single-process per host — multi-host pods set JAX distributed
# env vars / use `jax.distributed.initialize` inside train.py).
#
#   bash scripts/train.sh lab4d_tpu/train.py <num_devices> --seqname ... --logname ...
ENTRY=$1
DEV=$2
shift 2
PYTHONPATH="$(dirname "$0")/..":$PYTHONPATH \
  python "$ENTRY" --ngpu "$DEV" "$@"
