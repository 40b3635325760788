"""Fan rendering of many sequences/instances out over devices
(reference: scripts/run_rendering_parallel.py, per-GPU process pinning
-> lab4d_tpu.utils.device_map).

  python scripts/run_rendering_parallel.py <seqname> <logname> <devlist>
"""

from __future__ import annotations

import configparser
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from lab4d_tpu.utils.device_map import device_map


def _render_one(seqname, logname, inst_id, extra_args):
    import subprocess

    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(__file__), "..", "lab4d_tpu", "render.py"),
        "--seqname", seqname,
        "--logname", logname,
        "--inst_id", str(inst_id),
        "--load_suffix", "latest",
    ] + list(extra_args)
    subprocess.run(cmd, check=True)
    return inst_id


def run_rendering_parallel(seqname, logname, devlist, extra_args=()):
    config = configparser.RawConfigParser()
    config.read(f"database/configs/{seqname}.config")
    num_vids = len(config.sections()) - 1
    args = [(seqname, logname, i, tuple(extra_args)) for i in range(num_vids)]
    return device_map(_render_one, args, devices=devlist, method="dynamic")


if __name__ == "__main__":
    if len(sys.argv) < 4:
        print(f"Usage: python {sys.argv[0]} <seqname> <logname> <devlist> [extra flags...]")
        sys.exit(1)
    run_rendering_parallel(
        sys.argv[1],
        sys.argv[2],
        [int(x) for x in sys.argv[3].split(",")],
        sys.argv[4:],
    )
