"""Package a preprocessed sequence for sharing: zips configs + processed
buffers of one collection (reference: scripts/zip_dataset.py).

  python scripts/zip_dataset.py <vidname> [out.zip]
"""

from __future__ import annotations

import glob
import os
import sys
import zipfile


def zip_dataset(vidname: str, out_path: str = "", database_root: str = "database"):
    out_path = out_path or f"{vidname}-dataset.zip"
    members = [f"{database_root}/configs/{vidname}.config"]
    for sub_dir in sorted(glob.glob(f"{database_root}/processed/*/Full-Resolution")):
        members += sorted(glob.glob(f"{sub_dir}/{vidname}-[0-9]*"))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_STORED) as zf:
        for member in members:
            if os.path.isdir(member):
                for root, _, files in os.walk(member):
                    for f in files:
                        p = os.path.join(root, f)
                        zf.write(p, p)
            elif os.path.exists(member):
                zf.write(member, member)
    print(f"wrote {out_path}")
    return out_path


if __name__ == "__main__":
    zip_dataset(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "")
