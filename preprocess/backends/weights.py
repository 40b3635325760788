"""Weight-file resolution shared by the neural preprocessing backends.

Search order for a weight file ``<name>``:

1. ``$LAB4D_WEIGHTS_DIR/<name>`` (explicit override)
2. ``database/weights/<name>`` relative to the CURRENT directory
   (user-local weights in a workdir)
3. ``database/weights/<name>`` relative to the REPO (the trained
   weights shipped in-tree) — without this fallback a user running
   from their own workdir would silently drop to the classical
   backends even though trained weights ship with the framework.

Returns the first existing path, else the cwd-relative path.

Training scripts must NOT write through resolve_weights (the repo
fallback would make a short experimental run clobber the shipped
trained weights) — they write to train_out_path(), which is always
cwd-relative unless $LAB4D_WEIGHTS_DIR overrides it.
"""

from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def resolve_weights(name: str) -> str:
    env_dir = os.environ.get("LAB4D_WEIGHTS_DIR")
    if env_dir:
        return os.path.join(env_dir, name)
    cwd_path = os.path.join("database", "weights", name)
    if os.path.exists(cwd_path):
        return cwd_path
    repo_path = os.path.join(_REPO, "database", "weights", name)
    if os.path.exists(repo_path):
        return repo_path
    return cwd_path


def train_out_path(name: str) -> str:
    """Default OUTPUT path for training scripts: always the cwd (or the
    explicit $LAB4D_WEIGHTS_DIR), never the repo fallback."""
    wdir = os.environ.get(
        "LAB4D_WEIGHTS_DIR", os.path.join("database", "weights")
    )
    return os.path.join(wdir, name)
