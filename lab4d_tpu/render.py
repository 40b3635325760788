"""Rendering CLI: novel-view / reference-view video rendering from a
fitted checkpoint.

Parity: lab4d/render.py — same flags (inst_id, render_res, viewpoint in
{ref, rot-<elev>-<deg>, bev-<elev>}, freeze_id, num_frames, noskip) and
mp4 outputs under logdir/<seq>-<log>/renderings_<inst>/<viewpoint>/.
"""

import os
import sys
import time

import numpy as np
from absl import app, flags

cwd = os.getcwd()
if cwd not in sys.path:
    sys.path.insert(0, cwd)

from lab4d_tpu.config import get_config


class RenderFlags:
    flags.DEFINE_integer("inst_id", 0, "video/instance id")
    flags.DEFINE_integer("render_res", 128, "rendering resolution")
    flags.DEFINE_string(
        "viewpoint", "ref", "camera viewpoint, {ref, rot-elev-deg, bev-elev}"
    )
    flags.DEFINE_integer("freeze_id", -1, "freeze frame id to render, -1=off")
    flags.DEFINE_integer("num_frames", -1, "frames to render if freeze_id used")
    flags.DEFINE_bool("noskip", False, "render all frames skipped by flow")
    flags.DEFINE_string(
        "render_keys", "",
        "comma-separated channel subset to render (e.g. rgb,depth,mask,"
        "normal); '' renders every channel. Restricting channels skips "
        "their producers on-device (feature/vis MLPs, cycle warp, the "
        "normal-gradient pass) and shrinks the device->host readback",
    )
    flags.DEFINE_integer(
        "eval_topk", 8,
        "per-ray sample budget for the heavy eval channels: density and "
        "the integration weights still use all 64 union samples, heavy "
        "heads (rgb/vis/feature/normal vjp/cycle) run only at the top-k "
        "weighted samples. 0 = exact every-sample evaluation (the "
        "reference's behavior). Approximation error is bounded by the "
        "dropped integration mass (see nerf._eval_topk)",
    )


def construct_batch_from_opts(opts, model, params, geo_state, proxy, data_info):
    """Build the render batch for the selected viewpoint (render.py:50-176)."""
    import jax.numpy as jnp

    from lab4d_tpu.dataloader import data_utils
    from lab4d_tpu.utils import cam_traj as C
    from lab4d_tpu.utils.geom import K2inv, K2mat, mat2K

    video_id = opts.get("motion_id", opts["inst_id"])
    raw_size = data_info["raw_size"][video_id]
    vid_length = data_utils.get_vid_length(video_id, data_info)
    frame_info = data_info["frame_info"]

    if opts["freeze_id"] == -1:
        if opts["noskip"]:
            frameid_sub = np.arange(vid_length)
        else:
            offset = frame_info.frame_offset
            frameid = np.asarray(
                frame_info.frame_mapping[offset[video_id] : offset[video_id + 1]]
            )
            frameid_sub = frameid - frame_info.frame_offset_raw[video_id]
    elif 0 <= opts["freeze_id"] < vid_length:
        num_frames = (
            vid_length if opts["num_frames"] <= 0 else opts["num_frames"]
        )
        frameid_sub = np.asarray([opts["freeze_id"]] * num_frames)
    else:
        raise ValueError("frame id %d out of range" % opts["freeze_id"])
    render_length = len(frameid_sub)
    frameid = frameid_sub + frame_info.frame_offset_raw[video_id]

    # cameras / intrinsics / aabb from the fitted model
    field2cam_fr = model.apply(
        {"params": params},
        jnp.asarray(frameid),
        method=lambda m, fid: m.fields.get_cameras(fid),
    )
    intrinsics_fr = model.apply(
        {"params": params},
        jnp.asarray(frameid),
        method=lambda m, fid: m.intrinsics.get_vals(fid),
    )
    logscales = model.apply(
        {"params": params}, method=lambda m: m.fields.get_logscales()
    )
    field2cam_fr = {k: np.asarray(v) for k, v in field2cam_fr.items()}
    intrinsics_fr = np.asarray(intrinsics_fr)
    aabb = {
        cate: np.asarray(geo_state[cate]["aabb"]) / np.asarray(logscales[cate]).item(0)
        for cate in geo_state
    }

    if opts["viewpoint"] == "ref":
        field2cam = None
        crop2raw = np.zeros((render_length, 4))
        crop2raw[:, 0] = raw_size[1] / opts["render_res"]
        crop2raw[:, 1] = raw_size[0] / opts["render_res"]
        camera_int = mat2K(
            K2inv(jnp.asarray(crop2raw)) @ K2mat(jnp.asarray(intrinsics_fr))
        )
        camera_int = np.asarray(camera_int)
        crop2raw = None
    elif opts["viewpoint"].startswith("rot"):
        elev, max_angle = [int(v) for v in opts["viewpoint"].split("-")[1:]]
        obj_size = (aabb["fg"][1] - aabb["fg"][0]).max()
        traj = C.get_rotating_cam(
            render_length, distance=obj_size * 2.5, max_angle=max_angle
        )
        elev_mat = C.get_object_to_camera_matrix(elev, [1, 0, 0], 0)[None]
        field2cam = C.create_field2cam(traj @ elev_mat, field2cam_fr.keys())
        camera_int = np.zeros((render_length, 4))
        camera_int[:, :2] = opts["render_res"] * 2 * 0.8
        camera_int[:, 2:] = opts["render_res"] / 2
        raw_size = (640, 640)
        crop2raw = None
    elif opts["viewpoint"].startswith("bev"):
        elev = int(opts["viewpoint"].split("-")[1])
        if "bg" in field2cam_fr:
            center_to_bev = C.get_object_to_camera_matrix(elev, [1, 0, 0], 0)[None]
            camt0_to_center = np.eye(4)
            camt0_to_center[2, 3] = -field2cam_fr["bg"][0, 2, 3]
            camt0_to_bev = (
                np.linalg.inv(camt0_to_center) @ center_to_bev @ camt0_to_center
            )
            bg2bev = camt0_to_bev @ field2cam_fr["bg"][:1]
            bg2bev[..., 2, 3] *= 3
            field2cam = {"bg": np.tile(bg2bev, (render_length, 1, 1))}
            if "fg" in field2cam_fr:
                camt2bg = np.linalg.inv(field2cam_fr["bg"])
                field2cam["fg"] = field2cam["bg"] @ camt2bg @ field2cam_fr["fg"]
        elif "fg" in field2cam_fr:
            field2cam = {"fg": C.get_bev_cam(field2cam_fr["fg"], elev=elev)}
        else:
            raise NotImplementedError
        camera_int = np.zeros((render_length, 4))
        camera_int[:, :2] = opts["render_res"] * 2
        camera_int[:, 2:] = opts["render_res"] / 2
        raw_size = (640, 640)
        crop2raw = None
    else:
        raise ValueError("Unknown viewpoint %s" % opts["viewpoint"])

    batch = C.construct_batch(
        inst_id=opts["inst_id"],
        frameid_sub=frameid_sub,
        eval_res=opts["render_res"],
        field2cam=field2cam,
        camera_int=camera_int,
        crop2raw=crop2raw,
    )
    return batch, raw_size


def render_batch(model, params, batch, geo_state, categories, chunk=None,
                 keys=None):
    """Jit-render the batch frame by frame, `chunk` rays per jit call
    (model.evaluate, model.py:162-207, chunking model.py:259-326): a full
    256^2 deformable frame in one call needs >16 GB of HBM activations
    (skinning + two-pass sampling at 64 samples/ray), so rays are
    streamed through one fixed-shape compiled program; mask-blended.
    chunk=None picks the measured v5e optimum for the active eval mode:
    2048 under weight-ranked eval (topk heavy heads are 4-8x lighter per
    chunk; @512^2 skel-quad topk=8: 2048=241, 1024=248 ms/frame,
    topk=16: 2048=344, 1024=356, 512=359) vs 1024 for the exact
    every-sample eval (@512^2: 1024=845, 2048=877, 4096=959 ms —
    smaller chunks relieve HBM pressure from the normal-gradient
    pass; 2026-08-19 window: 512=506)."""
    import jax
    import jax.numpy as jnp

    if chunk is None:
        from lab4d_tpu.nnutils.nerf import _eval_topk

        chunk = 2048 if _eval_topk() is not None else 1024

    geo = {
        cate: {
            "aabb": jnp.asarray(geo_state[cate]["aabb"]),
            "near_far_table": jnp.asarray(geo_state[cate]["near_far"]),
            "proxy_corners": jnp.asarray(geo_state[cate]["corners"]),
        }
        for cate in categories
    }

    @jax.jit
    def prep_one(params, sub):
        return model.apply(
            {"params": params}, sub, method=model.prepare_eval_samples
        )

    @jax.jit
    def render_frame(params, samples, hxy_chunks):
        """All chunks of one frame in ONE dispatch: the per-chunk Python
        loop costs ~4.5 ms/call through a tunneled TPU (dispatch floor),
        which dominates at 512^2 (256 chunks). lax.map keeps activations
        chunk-sized (a whole 256^2 deformable frame in one call needs
        >16 GB of HBM), while XLA sees a single program per frame."""

        def body(hxy_c):
            samples_c = {
                cate: {**samples[cate], "hxy": hxy_c} for cate in samples
            }
            out = model.apply(
                {"params": params}, samples_c, sched=None,
                method=model.evaluate_rays,
            )
            if keys is not None:
                # drop unrequested channels on-device: the readback, not
                # compute, dominates frame latency on slow host links
                # (mask blending already happened inside evaluate_rays,
                # so an unrequested mask need not be read back)
                out = {k: v for k, v in out.items() if k in keys}
            # halve the device->host bytes: these channels feed mp4/png
            # colorization only, and f16 keeps ~3 decimal digits — the
            # readback (not compute) dominates frame latency on slow
            # host links (measured 6.1 s/frame vs 0.24 s device compute
            # through a tunneled TPU at ~2.5 MB/s D2H)
            return jax.tree.map(lambda a: a.astype(jnp.float16), out)

        return jax.lax.map(body, hxy_chunks)

    n_frames = len(batch["frameid_sub"])
    rendered_all = {}
    start = time.time()

    def collect(chunks, n_chunks, csize, npix):
        out = {
            k: v.transpose(1, 0, 2, *range(3, v.ndim)).reshape(
                1, n_chunks * csize, *v.shape[3:]
            )[:, :npix]
            for k, v in chunks.items()
            if v.ndim >= 4
        }
        res = int(np.sqrt(npix))
        for k, v in out.items():
            img = v[0].reshape(res, res, -1)
            rendered_all.setdefault(k, []).append(img)

    # software pipeline: dispatch frame i+1 before reading back frame i,
    # so the (slow) device->host transfer overlaps the next frame's
    # compute — dispatch is async, device_get is the only sync point
    pending = None
    for i in range(n_frames):
        sub = {}
        for k, v in batch.items():
            if isinstance(v, dict):
                sub[k] = {k2: v2[i : i + 1] for k2, v2 in v.items()}
            else:
                sub[k] = v[i : i + 1]
        sub["geo"] = geo
        npix = sub["hxy"].shape[1]
        csize = min(chunk, npix)
        pad = (-npix) % csize
        hxy_all = np.asarray(sub["hxy"])  # pad on host, not on device
        if pad:
            hxy_all = np.concatenate(
                [hxy_all, np.tile(hxy_all[:, -1:], (1, pad, 1))], axis=1
            )
        n_chunks = (npix + pad) // csize
        hxy_chunks = hxy_all.reshape(1, n_chunks, csize, 3).transpose(
            1, 0, 2, 3
        )
        samples = prep_one(params, sub)  # per-frame cameras/FK, once
        fut = render_frame(params, samples, jnp.asarray(hxy_chunks))
        if pending is not None:
            collect(jax.device_get(pending[0]), *pending[1:])
        pending = (fut, n_chunks, csize, npix)
    if pending is not None:
        collect(jax.device_get(pending[0]), *pending[1:])
    print("rendering time: %.3f s (%d frames)" % (time.time() - start, n_frames))

    rendered = {k: np.stack(v) for k, v in rendered_all.items()}
    # mask blending (ref model.py:201-206) happens ON DEVICE in
    # evaluate_rays — blending again here would square the mask
    return rendered


def render(opts, construct_batch_func=construct_batch_from_opts):
    from lab4d_tpu.engine.trainer import Trainer
    from lab4d_tpu.utils.io import make_save_dir, save_rendered

    if opts.get("use_cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    keys = None
    if opts.get("render_keys"):
        keys = frozenset(
            s.strip() for s in opts["render_keys"].split(",") if s.strip()
        )
        # the eval pass reads this at trace time to skip the producers of
        # unrequested channels (nerf._eval_channels)
        os.environ["LAB4D_EVAL_CHANNELS"] = ",".join(sorted(keys))
    if opts.get("eval_topk") is not None and int(opts["eval_topk"]) > 0:
        os.environ["LAB4D_EVAL_TOPK"] = str(int(opts["eval_topk"]))
    else:
        os.environ.pop("LAB4D_EVAL_TOPK", None)

    (model, params, geo_state, proxy, data_info, _) = (
        Trainer.construct_test_model(opts)
    )
    batch, raw_size = construct_batch_func(
        opts, model, params, geo_state, proxy, data_info
    )
    save_dir = make_save_dir(
        opts, sub_dir="renderings_%04d/%s" % (opts["inst_id"], opts["viewpoint"])
    )
    categories = tuple(geo_state.keys())
    rendered = render_batch(
        model, params, batch, geo_state, categories, keys=keys
    )
    save_rendered(rendered, save_dir, raw_size, data_info["apply_pca_fn"])
    print("Saved to %s" % save_dir)


def main_fn(_):
    opts = get_config()
    render(opts)


def main():
    app.run(main_fn)


if __name__ == "__main__":
    main()
