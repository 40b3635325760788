"""Reanimation CLI: drive a fitted model with motion exported from
another video (motion transfer).

Parity: lab4d/reanimate.py — loads export_<motion_id>/fg-motion.json and
overrides batch["joint_so3"] + batch["field2cam"]["fg"].
"""

import json
import os
import sys

import numpy as np
from absl import app, flags

cwd = os.getcwd()
if cwd not in sys.path:
    sys.path.insert(0, cwd)

from lab4d_tpu.config import get_config
from lab4d_tpu.render import construct_batch_from_opts, render


class ReanimateFlags:
    flags.DEFINE_integer("motion_id", 0, "motion id (source video)")


def construct_batch_from_opts_reanimate(
    opts, model, params, geo_state, proxy, data_info
):
    import jax.numpy as jnp

    from lab4d_tpu.utils.quat import se3_to_quaternion_translation

    motion_path = "%s/%s-%s/export_%04d/fg-motion.json" % (
        opts["logroot"], opts["seqname"], opts["logname"], opts["motion_id"],
    )
    with open(motion_path) as fp:
        motion_data = json.load(fp)
    field2cam = np.asarray(motion_data["field2cam"], np.float32).reshape(-1, 4, 4)
    joint_so3 = np.asarray(motion_data["joint_so3"], np.float32)

    opts = dict(opts)
    opts["num_frames"] = len(field2cam)
    batch, raw_size = construct_batch_from_opts(
        opts, model, params, geo_state, proxy, data_info
    )

    batch["joint_so3"] = jnp.asarray(joint_so3)
    f2c = se3_to_quaternion_translation(jnp.asarray(field2cam), tuple_out=False)
    batch["field2cam"] = {"fg": f2c}
    return batch, raw_size


def main_fn(_):
    opts = get_config()
    render(opts, construct_batch_func=construct_batch_from_opts_reanimate)


def main():
    app.run(main_fn)


if __name__ == "__main__":
    main()
