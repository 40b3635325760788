"""Package a training run for sharing: checkpoints, opts, exported
meshes/videos (reference: scripts/zip_logdir.py).

  python scripts/zip_logdir.py logdir/<seqname>-<logname> [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile


def zip_logdir(run_dir: str, out_path: str = ""):
    run_dir = run_dir.rstrip("/")
    out_path = out_path or f"{os.path.basename(run_dir)}-logdir.zip"
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_STORED) as zf:
        for root, _, files in os.walk(run_dir):
            for f in files:
                p = os.path.join(root, f)
                zf.write(p, os.path.relpath(p, os.path.dirname(run_dir)))
    print(f"wrote {out_path}")
    return out_path


if __name__ == "__main__":
    zip_logdir(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "")
