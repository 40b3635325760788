"""Training CLI.

Parity: lab4d/train.py — absl app building a Trainer and running the
round-based loop. The reference's NCCL process-group launch (train.py:28-33,
one process per GPU) is replaced by single-program multi-chip execution:
one process drives all local devices, the ray batch is sharded over the
mesh's "data" axis inside the jitted train step.

Usage:
    python -m lab4d_tpu.train --seqname <seq> --logname <run> [flags]
"""

import os
import sys

from absl import app

cwd = os.getcwd()
if cwd not in sys.path:
    sys.path.insert(0, cwd)

from lab4d_tpu.config import get_config, save_config


def train(_):
    opts = get_config()
    if opts.get("use_cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    save_config()

    # multi-host (DCN) init — no-op on a single host (ref train.py:28-33)
    from lab4d_tpu.parallel.mesh_utils import init_distributed

    init_distributed()

    from lab4d_tpu.engine.trainer import Trainer

    trainer = Trainer(opts)
    trainer.train()


def main():
    app.run(train)


if __name__ == "__main__":
    main()
