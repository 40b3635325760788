"""Export CLI: canonical meshes, per-frame articulated meshes, bone
meshes, and explicit motion parameters (fg-motion.json) for reanimation.

Parity: lab4d/export.py — same outputs: <cate>.obj rest mesh,
<cate>-%05d.obj per-frame meshes, <cate>-%05d-bone.obj bones, and
<cate>-motion.json with field2cam / t_articulation / joint_so3.
"""

import json
import os
import sys
from typing import NamedTuple, Optional, Tuple

import numpy as np
from absl import app, flags

cwd = os.getcwd()
if cwd not in sys.path:
    sys.path.insert(0, cwd)

from lab4d_tpu.config import get_config


class ExportMeshFlags:
    flags.DEFINE_integer("inst_id", 0, "video/instance id")
    flags.DEFINE_integer("grid_size", 128, "grid size of marching cubes")
    flags.DEFINE_float(
        "level", 0.0, "contour value of marching cubes isosurface"
    )


class MotionParamsExpl(NamedTuple):
    field2cam: Tuple[np.ndarray, np.ndarray]  # (quat, trans)
    t_articulation: Optional[Tuple[np.ndarray, np.ndarray]]  # dual quat
    so3: Optional[np.ndarray]  # (B, 3) joint angles
    mesh_t: "object"  # Mesh at time t
    bone_t: "object"  # bone mesh at time t


def _field_apply(model, params, method, *args):
    import jax

    return model.apply({"params": params}, *args, method=method)


def extract_canonical_mesh(model, params, geo_state, cate, opts):
    """Marching cubes over the canonical SDF (multifields.py:143-176)."""
    import jax.numpy as jnp

    from lab4d_tpu.meshlib.marching import marching_cubes

    aabb = np.asarray(geo_state[cate]["aabb"])
    inst_id = opts["inst_id"]

    import jax

    fn = lambda m, p: m.fields.field_params[cate].forward(
        p, inst_id=jnp.full((p.shape[0],), inst_id, jnp.int32),
        get_density=False,
    )
    jfn = jax.jit(
        lambda p, pts: model.apply({"params": p}, pts, method=fn)
    )

    def sdf_fn(pts):
        # jitted (eager per-chunk apply is per-op-dispatch-bound on a
        # remote accelerator); one compile, ~8 dispatches per grid
        return np.asarray(jfn(params, jnp.asarray(pts, jnp.float32)))

    return marching_cubes(
        sdf_fn, aabb, grid_size=opts["grid_size"], level=opts["level"],
        apply_connected_component=(cate == "fg"),
    )


def extract_deformation(model, params, cate, mesh_rest, inst_id, frame_ids,
                        fg_motion):
    """Per-frame forward-warped meshes + motion params (export.py:56-134)."""
    import jax.numpy as jnp

    from lab4d_tpu.meshlib import Mesh
    from lab4d_tpu.utils.quat import quaternion_translation_to_se3
    from lab4d_tpu.utils.vis import draw_skeleton_bones

    import jax

    from lab4d_tpu.utils.quat import dual_quaternion_to_quaternion_translation

    has_skinning = cate == "fg" and fg_motion not in ("rigid", "dense")
    has_skel = has_skinning and ("skel" in fg_motion or "comp" in fg_motion)
    xyz = jnp.asarray(mesh_rest.vertices, jnp.float32)
    inst = jnp.asarray([inst_id], jnp.int32)

    def frame_fn(m, fid):
        """Every per-frame motion quantity in ONE traced call. The old
        per-frame eager apply launched hundreds of tiny ops per frame —
        per-op dispatch is pathological on a remote accelerator; this
        compiles once and dispatches once per frame."""
        field = m.fields.field_params[cate]
        field2cam = field.camera_mlp.get_vals(fid)
        out = {"field2cam": field2cam}
        samples_dict = {}
        if has_skinning:
            arti = field.warp.articulation.get_vals_and_mean(fid)
            samples_dict["t_articulation"] = arti[0]
            samples_dict["rest_articulation"] = arti[1]
            out["t_articulation"] = arti[0]
            if has_skel:
                out["so3"] = field.warp.articulation.get_vals(
                    fid, return_so3=True
                )
            # bone centers for visualization, camera-space transform
            _, centers = dual_quaternion_to_quaternion_translation(
                (arti[0][0][0], arti[0][1][0])
            )
            out["bone_centers"] = centers
            out["se3_mat"] = quaternion_translation_to_se3(
                field2cam[0], field2cam[1]
            )[0]
        out["xyz_t"] = field.forward_warp(
            xyz[None, None], field2cam, fid, inst, samples_dict=samples_dict
        )
        return out

    apply_frame = jax.jit(
        lambda p, fid: model.apply({"params": p}, fid, method=frame_fn)
    )

    edges = None
    if has_skel:
        skel = _field_apply(
            model, params,
            lambda m: m.fields.field_params[cate].warp.articulation.skeleton,
        )
        edges = skel.edges
    logscale = float(
        np.exp(
            np.asarray(
                _field_apply(
                    model, params,
                    lambda m: m.fields.field_params[cate].logscale,
                )
            ).reshape(())
        )
    )

    # dispatch frames async and read back in groups: one transfer per
    # group batches the (slow) readback link without keeping every
    # frame's (V,3) warped-vertex buffer live on device at once (long
    # captures with dense meshes would OOM HBM otherwise)
    group = 16
    outs = []
    for lo in range(0, len(frame_ids), group):
        outs_dev = [
            apply_frame(params, jnp.asarray([frame_id], jnp.int32))
            for frame_id in frame_ids[lo : lo + group]
        ]
        outs.extend(jax.device_get(outs_dev))

    motion_tuples = {}
    for frame_id, out in zip(frame_ids, outs):
        field2cam = out["field2cam"]
        mesh_bones_t = None
        if has_skinning:
            mesh_bones_t = draw_skeleton_bones(out["bone_centers"], edges)
            mesh_bones_t.apply_transform(out["se3_mat"])
        mesh_t = Mesh(out["xyz_t"][0, 0], mesh_rest.faces)
        f2c_world = (field2cam[0], field2cam[1] / logscale)
        motion_tuples[frame_id] = MotionParamsExpl(
            field2cam=f2c_world,
            t_articulation=(
                tuple(out["t_articulation"]) if has_skinning else None
            ),
            so3=out["so3"][0] if has_skel else None,
            mesh_t=mesh_t,
            bone_t=mesh_bones_t,
        )

    if has_skinning:
        # rest mesh with instance morphology applied (export.py:114-132)
        idn_q = np.zeros((1, 4), np.float32)
        idn_q[:, 0] = 1
        idn = (jnp.asarray(idn_q), jnp.zeros((1, 3), jnp.float32))
        arti_i = _field_apply(
            model, params,
            lambda m, i: m.fields.field_params[
                cate
            ].warp.articulation.get_mean_vals(i),
            inst,
        )
        # rest articulation = global (mean-instance) rest pose; the warp
        # then stretches bones from rest to this instance's morphology
        arti_mean = _field_apply(
            model, params,
            lambda m: m.fields.field_params[
                cate
            ].warp.articulation.get_mean_vals(None),
        )
        arti_mean = tuple(
            a.reshape((1,) * (arti_i[0].ndim - a.ndim) + a.shape)
            for a in arti_mean
        )
        sd = {"t_articulation": arti_i, "rest_articulation": arti_mean}
        xyz_i = _field_apply(
            model, params,
            lambda m, x, f2c, i, s: m.fields.field_params[cate].forward_warp(
                x, f2c, None, i, samples_dict=s
            ),
            xyz[None, None], idn, inst, sd,
        )
        from lab4d_tpu.meshlib import Mesh

        mesh_rest = Mesh(np.asarray(xyz_i)[0, 0], mesh_rest.faces)
    return mesh_rest, motion_tuples


def save_motion_params(meshes_rest, motion_tuples, save_dir):
    """Write objs + motion json (export.py:137-168)."""
    from lab4d_tpu.utils.quat import (
        dual_quaternion_to_se3,
        quaternion_translation_to_se3,
    )
    import jax.numpy as jnp

    for cate, mesh_rest in meshes_rest.items():
        mesh_rest.export("%s/%s.obj" % (save_dir, cate))
        motion_params = {"field2cam": [], "t_articulation": [], "joint_so3": []}
        for frame_id, mp in motion_tuples[cate].items():
            mp.mesh_t.export("%s/%s-%05d.obj" % (save_dir, cate, frame_id))
            if mp.bone_t is not None and not mp.bone_t.is_empty:
                mp.bone_t.export("%s/%s-%05d-bone.obj" % (save_dir, cate, frame_id))
            f2c = np.asarray(
                quaternion_translation_to_se3(
                    jnp.asarray(mp.field2cam[0]), jnp.asarray(mp.field2cam[1])
                )
            )[0]
            motion_params["field2cam"].append(f2c.tolist())
            if mp.t_articulation is not None:
                t_arti = np.asarray(
                    dual_quaternion_to_se3(
                        (jnp.asarray(mp.t_articulation[0]),
                         jnp.asarray(mp.t_articulation[1]))
                    )
                )[0]
                motion_params["t_articulation"].append(t_arti.tolist())
            if mp.so3 is not None:
                motion_params["joint_so3"].append(np.asarray(mp.so3).tolist())
        with open("%s/%s-motion.json" % (save_dir, cate), "w") as fp:
            json.dump(motion_params, fp)


def extract_motion_params(model, params, geo_state, opts, data_info):
    inst_id = opts["inst_id"]
    frame_info = data_info["frame_info"]
    offset = frame_info.frame_offset
    frame_ids = frame_info.frame_mapping[offset[inst_id] : offset[inst_id + 1]]
    print("Extracting motion parameters for frame ids:", list(frame_ids))

    meshes_rest, motion_tuples = {}, {}
    for cate in geo_state:
        mesh = extract_canonical_mesh(model, params, geo_state, cate, opts)
        meshes_rest[cate], motion_tuples[cate] = extract_deformation(
            model, params, cate, mesh, inst_id, frame_ids, opts["fg_motion"]
        )
    return meshes_rest, motion_tuples


def export(opts):
    from lab4d_tpu.engine.trainer import Trainer
    from lab4d_tpu.utils.io import make_save_dir

    if opts.get("use_cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    (model, params, geo_state, proxy, data_info, _) = (
        Trainer.construct_test_model(opts)
    )
    save_dir = make_save_dir(opts, sub_dir="export_%04d" % opts["inst_id"])
    meshes_rest, motion_tuples = extract_motion_params(
        model, params, geo_state, opts, data_info
    )
    save_motion_params(meshes_rest, motion_tuples, save_dir)
    print("Saved to %s" % save_dir)


def main_fn(_):
    export(get_config())


def main():
    app.run(main_fn)


if __name__ == "__main__":
    main()
