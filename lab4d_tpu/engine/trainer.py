"""Round-based trainer: jit-compiled train step over a device mesh,
host-maintained geometry state, prior-fit initialization, checkpointing
with loss-spike rollback.

Parity: lab4d/engine/trainer.py. The DDP/NCCL stack is replaced by a
single jitted train step whose batch is sharded over the mesh's "data"
axis (XLA inserts the gradient psum); params are replicated.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from functools import partial
from typing import Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax
from flax import serialization
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lab4d_tpu.dataloader import data_utils
from lab4d_tpu.parallel import mesh_utils
from lab4d_tpu.engine import init_utils
from lab4d_tpu.engine.model import DVRModel
from lab4d_tpu.engine.schedules import compute_sched
from lab4d_tpu.meshlib import Mesh as TriMesh, load_obj, uv_sphere
from lab4d_tpu.meshlib.marching import marching_cubes
from lab4d_tpu.meshlib.sdf import MeshSDF
from lab4d_tpu.nnutils.embedding import FrameInfo
from lab4d_tpu.nnutils.intrinsics import intrinsics_base_init
from lab4d_tpu.nnutils.pose import camera_base_quat_init
from lab4d_tpu.utils.geom import get_near_far
from lab4d_tpu.utils.quat import quaternion_translation_to_se3

_EXPLICIT_PARAM_NAMES = (
    "logibeta", "logsigma", "logscale", "log_gauss", "base_quat",
    "base_logfocal", "base_ppoint", "shift",
)

_LOSS_WEIGHT_NAMES = (
    "mask_wt", "rgb_wt", "depth_wt", "flow_wt", "vis_wt", "feature_wt",
    "feat_reproj_wt", "reg_visibility_wt", "reg_eikonal_wt",
    "reg_deform_cyc_wt", "reg_delta_skin_wt", "reg_skin_entropy_wt",
    "reg_gauss_skin_wt", "reg_cam_prior_wt", "reg_skel_prior_wt",
    "reg_gauss_mask_wt", "reg_soft_deform_wt",
)

_INIT_SCALE = {"fg": 0.2, "bg": 0.1}


def param_labels(params, freeze_bone_len: bool = False):
    """Label each param leaf: 'explicit' (10x lr, trainer.py:122-148),
    'frozen' (bone length freeze) or 'base'."""
    flat = flax.traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        if freeze_bone_len and "log_bone_len" in path:
            labels[path] = "frozen"
        elif path[-1] in _EXPLICIT_PARAM_NAMES or (
            len(path) > 1 and path[-2] in _EXPLICIT_PARAM_NAMES
        ):
            labels[path] = "explicit"
        else:
            labels[path] = "base"
    return flax.traverse_util.unflatten_dict(labels)


class ClipState(NamedTuple):
    grad_norm: jnp.ndarray  # pre-clip global norm of the last update


def clip_with_norm(max_norm: float) -> optax.GradientTransformation:
    """Reference-parity large-gradient handling, with the pre-check
    global norm exposed in the state so the train step can log it
    without a second ~100-leaf optax.global_norm reduce pass.

    The reference does NOT take clipped steps: check_grad
    (ref trainer.py:581-604) zeroes the gradients whenever their global
    norm exceeds the threshold (and additionally restores a two-round-old
    snapshot once one exists) — so a spiking step is SKIPPED, not
    shrunk. Round-4 shipped `scale = max_norm/gnorm` clipping here and
    it measurably destabilized matched-budget training vs the reference
    (60-step synthetic comparison: ours dipped to 9.3 dB / ended -3.0 dB
    behind; with skip semantics the dip matches — psnr_compare.json).
    Non-finite norms also skip (safer than the reference, whose
    `nan > thresh` comparison is False and lets NaN grads through).

    "Skip" matches the reference exactly, including its imperfection:
    AdamW downstream still sees the zeroed update, so momentum decays
    and continues to move params, and decoupled weight decay applies —
    identical to torch AdamW stepping on zeroed grads after the
    reference's optimizer.zero_grad(). The reference's additional
    restore-from-two-rounds-ago on a spike lives in Trainer.check_grad
    (it reads this transform's grad_norm from the optimizer state)."""

    def init_fn(params):
        del params
        return ClipState(grad_norm=jnp.zeros((), jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        gnorm = optax.global_norm(updates)
        ok = gnorm < max_norm  # False for spikes AND non-finite norms
        return (
            # where, not multiply: nan * 0.0 would leak the NaN through
            jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)),
                         updates),
            ClipState(grad_norm=gnorm),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def onecycle_linear(step, total_steps, peak, pct_start, div_factor,
                    final_div_factor):
    """Linear one-cycle schedule matching torch OneCycleLR(anneal='linear')
    (trainer.py:191-210)."""
    warm = max(int(pct_start * total_steps), 1)
    init = peak / div_factor
    final = init / final_div_factor
    up = init + (peak - init) * jnp.minimum(step, warm) / warm
    down = peak + (final - peak) * jnp.clip(
        (step - warm) / max(total_steps - warm, 1), 0.0, 1.0
    )
    return jnp.where(step < warm, up, down)


class Trainer:
    """Train and evaluate a lab4d_tpu model."""

    def __init__(self, opts: Dict):
        is_resumed = opts["load_path"] != ""
        if opts.get("profile"):
            opts = dict(opts, iters_per_round=10)
        self.opts = opts

        self.define_dataset()
        self.trainer_init()
        self.define_model()
        self.optimizer_init(is_resumed=is_resumed)
        if is_resumed:
            self.load_checkpoint_train()

    # ----------------------------------------------------------------- setup

    def trainer_init(self):
        opts = self.opts
        logname = "%s-%s" % (opts["seqname"], opts["logname"])
        self.save_dir = os.path.join(opts["logroot"], logname)
        os.makedirs(self.save_dir, exist_ok=True)
        self.log = _make_logger(self.save_dir)
        self.current_steps = 0
        self.current_round = 0
        total_eval = max(self.data_info["frame_info"].num_frames - 1, 1)
        self.eval_fid = np.linspace(0, total_eval - 1, 9).astype(int)

    def define_dataset(self):
        opts = self.opts
        self.datasets = data_utils.config_to_datasets(opts)
        self.eval_datasets = data_utils.config_to_datasets(opts, is_eval=True)
        self.data_info = data_utils.get_data_info(self.eval_datasets)

        devices = jax.devices()
        num_shards = min(opts.get("ngpu", 1), len(devices))
        # category-model scale-out (ref docs/source/tutorials/
        # category_model.rst:41): split the mesh into ("data","video") and
        # shard per-video parameter tables + the pixel stream over "video"
        num_vids = self.data_info["frame_info"].num_vids
        num_video = opts.get("video_shards", 1)
        if num_video > 1 and (
            num_shards % num_video != 0 or num_vids % num_video != 0
        ):
            print(
                f"[warn] video_shards={num_video} does not divide "
                f"ngpu={num_shards} and num_vids={num_vids}; "
                "falling back to pure data parallelism"
            )
            num_video = 1
        self.num_video_shards = num_video
        self.num_data_shards = num_shards // num_video
        imgs_per_batch = opts["imgs_per_gpu"] * num_shards
        self.trainloader = data_utils.TrainBatchLoader(
            self.datasets,
            imgs_per_batch=imgs_per_batch,
            num_workers=opts.get("num_workers", 2),
            total_shards=num_shards,
            video_shards=num_video,
        )
        self.total_steps = opts["num_rounds"] * opts["iters_per_round"]

    def define_model(self):
        opts = self.opts
        info = self.data_info
        frame_info: FrameInfo = info["frame_info"]
        num_inst = (
            1 if opts["single_inst"] else frame_info.num_vids
        )

        self.model = DVRModel(
            frame_info=frame_info,
            field_type=opts["field_type"],
            fg_motion=opts["fg_motion"],
            num_inst=num_inst,
            train_res=opts["train_res"],
            intrinsics_init=_expand_intrinsics(info),
            rtmat_fg=info["rtmat"][info["vis_info"]["fg"]],
            rtmat_bg=info["rtmat"][info["vis_info"]["bg"]],
            joint_angles_init=info.get("joint_angles"),
            loss_weights=tuple(
                (k, self.opts[k]) for k in _LOSS_WEIGHT_NAMES if k in self.opts
            ),
        )
        self.categories = (
            ("fg", "bg") if opts["field_type"] == "comp" else (opts["field_type"],)
        )

        # proxy geometry + geo state
        self.proxy = {}
        self.geo_state = {}
        for cate in self.categories:
            self.proxy[cate] = self._init_proxy(cate)
        # params init with a dummy batch
        batch = self._dummy_batch()
        rngs = {
            "params": jax.random.PRNGKey(0),
            "aux": jax.random.PRNGKey(1),
            "swap": jax.random.PRNGKey(2),
        }
        sched = compute_sched(0)
        self.params = jax.jit(
            self.model.init, static_argnames=("train",)
        )(rngs, batch, sched, train=True)["params"]

        self.mlp_init()
        for cate in self.categories:
            self._reset_geo_state(cate, beta=0.0)

        # rollback caches (2 rounds deep, trainer.py:117-120)
        self.model_cache = [None, None]
        self.opt_cache = [None, None]

    def _init_proxy(self, cate: str) -> TriMesh:
        """Initial proxy mesh: the scaled TSDF mesh for bg and RIGID fg
        (nerf.py:240-249 — real object scale), the small sphere only for
        articulated fg (deformable.py:86-93). The reference loads the
        TSDF mesh for rigid fg, so its geometry_init distills the real
        object shape and its initial aabb/near-far start at object scale;
        starting from the 0.12 sphere (the pre-round-4 behavior) seeds
        them ~2x too small and the EMA'd aabb lags the trained geometry
        for several rounds (scripts/compare_reference_psnr.py)."""
        if cate == "bg" or self.opts["fg_motion"] == "rigid":
            path = self.data_info["geom_path"][
                self.data_info["vis_info"][cate]
            ]
            mesh = load_obj(path)
            mesh.apply_scale(_INIT_SCALE[cate])
            return mesh
        return uv_sphere(radius=0.12, count=[4, 4])

    def _geo_for_batch(self):
        return {
            cate: {
                "aabb": jnp.asarray(self.geo_state[cate]["aabb"]),
                "near_far_table": jnp.asarray(
                    self.geo_state[cate]["near_far"]
                ),
                "proxy_corners": jnp.asarray(
                    self.geo_state[cate]["corners"]
                ),
            }
            for cate in self.categories
        }

    def _reset_geo_state(self, cate: str, beta: float = 0.0):
        """aabb from proxy bounds; near-far from proxy verts + cameras
        (nerf.py:344-376). beta = EMA factor toward previous value."""
        mesh = self.proxy[cate]
        bounds = mesh.bounds
        if bounds is None:
            bounds = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
        prev = self.geo_state.get(cate)
        aabb = bounds.astype(np.float32)
        if prev is not None and beta > 0:
            aabb = prev["aabb"] * beta + aabb * (1 - beta)

        # camera poses for all filtered frames -> near far
        quat, trans = jax.device_get(
            self._apply_field_method(cate, "camera_vals")
        )
        # host-side geometry on the LOCAL cpu backend: eager jnp on a
        # remote TPU dispatches op-by-op over the wire, and the ragged
        # vertex count would recompile a jit every round
        with jax.default_device(jax.devices("cpu")[0]):
            rtmat = np.asarray(
                quaternion_translation_to_se3(
                    jnp.asarray(quat), jnp.asarray(trans)
                )
            )
            near_far_frames = np.asarray(
                get_near_far(jnp.asarray(mesh.vertices, jnp.float32), rtmat)
            )
        nraw = self.data_info["frame_info"].num_frames_raw
        mapping = self.data_info["frame_info"].frame_mapping
        near_far = (
            prev["near_far"].copy()
            if prev is not None
            else np.tile(np.array([0.01, 10.0], np.float32), (nraw, 1))
        )
        near_far[mapping] = (
            near_far[mapping] * beta + near_far_frames * (1 - beta)
            if prev is not None and beta > 0
            else near_far_frames
        )
        self.geo_state[cate] = {
            "aabb": aabb,
            "near_far": near_far.astype(np.float32),
            "corners": mesh.corners().astype(np.float32),
        }

    def _apply_field_method(self, cate, what, *args):
        """Host-side helpers bound to a field submodule. Jitted and cached
        per (cate, what): eager module application dispatches each op
        individually, which is unusably slow on a remote TPU (a 64^3 SDF
        grid eval took ~7 s/round eager vs ~0.5 s jitted)."""
        if not hasattr(self, "_field_method_jit"):
            self._field_method_jit = {}
        key = (cate, what)
        if key not in self._field_method_jit:
            model = self.model
            if what == "camera_vals":
                fn = lambda m: m.fields.field_params[cate].camera_mlp.get_vals()
                jfn = jax.jit(
                    lambda p: model.apply({"params": p}, method=fn)
                )
            elif what == "sdf_grid":
                # f16 readback: sdf values only place marching-cubes
                # vertices (~0.1% of a cell at f16 precision); the grid
                # transfer, not compute, dominates geo upkeep on slow
                # host links
                fn = lambda m, pts: m.fields.field_params[cate].forward(
                    pts, inst_id=None, get_density=False
                )
                jfn = jax.jit(
                    lambda p, pts: model.apply(
                        {"params": p}, pts, method=fn
                    ).astype(jnp.float16)
                )
            elif what == "vis_grid":
                # only the sign is consumed (visibility mask) -> int8
                fn = lambda m, pts: m.fields.field_params[cate].vis_mlp(
                    pts, inst_id=None
                )
                jfn = jax.jit(
                    lambda p, pts: (
                        model.apply({"params": p}, pts, method=fn) > 0
                    ).astype(jnp.int8)
                )
            else:
                raise ValueError(what)
            self._field_method_jit[key] = jfn
        return self._field_method_jit[key](self.params, *args)

    def _dummy_batch(self):
        opts = self.opts
        M, N = 2, 4
        nraw = self.data_info["frame_info"].num_frames_raw
        rng = np.random.default_rng(0)
        geo = {}
        for cate in self.categories:
            geo[cate] = {
                "aabb": jnp.asarray([[-0.2] * 3, [0.2] * 3], jnp.float32),
                "near_far_table": jnp.tile(
                    jnp.asarray([0.1, 1.0], jnp.float32), (nraw, 1)
                ),
                "proxy_corners": jnp.asarray(
                    rng.standard_normal((8, 3)), jnp.float32
                ),
            }
        batch = {
            "rgb": np.zeros((M, 2, N, 3), np.float32),
            "mask": np.zeros((M, 2, N, 1), np.float32),
            "depth": np.zeros((M, 2, N, 1), np.float32),
            "feature": np.zeros((M, 2, N, 16), np.float32),
            "flow": np.zeros((M, 2, N, 2), np.float32),
            "flow_uct": np.zeros((M, 2, N, 1), np.float32),
            "vis2d": np.ones((M, 2, N, 1), np.float32),
            "crop2raw": np.ones((M, 2, 4), np.float32),
            "is_detected": np.ones((M, 2), np.float32),
            "dataid": np.zeros((M, 2), np.int32),
            "frameid_sub": np.zeros((M, 2), np.int32),
            "hxy": np.ones((M, 2, N, 3), np.float32),
        }
        batch = jax.tree.map(jnp.asarray, batch)
        batch["geo"] = geo
        return batch

    # ------------------------------------------------------------- mlp init

    def mlp_init(self):
        """Initialize cameras / intrinsics / geometry from priors
        (trainer.py:88-94 + nerf.py:232-238)."""
        info = self.data_info
        frame_info = info["frame_info"]
        params = flax.core.unfreeze(self.params)
        flat = flax.traverse_util.flatten_dict(params)

        # 1. overwrite base params from priors (host)
        base_logfocal, base_ppoint = intrinsics_base_init(
            _expand_intrinsics(info), frame_info
        )
        for path in list(flat):
            spath = "/".join(path)
            if spath == "intrinsics/base_logfocal":
                flat[path] = jnp.asarray(base_logfocal)
            if spath == "intrinsics/base_ppoint":
                flat[path] = jnp.asarray(base_ppoint)
        for cate in self.categories:
            rtmat = np.array(
                info["rtmat"][info["vis_info"][cate]], dtype=np.float32
            )
            rtmat[..., :3, 3] *= _INIT_SCALE[cate]
            bq = camera_base_quat_init(rtmat, frame_info)
            for path in list(flat):
                if (
                    f"field_params_{cate}" in "/".join(path)
                    and path[-1] == "base_quat"
                ):
                    flat[path] = jnp.asarray(bq)
        params = flax.traverse_util.unflatten_dict(flat)

        # 2. fit camera MLPs + intrinsics to priors
        def cam_loss(p):
            return self.model.apply(
                {"params": p}, method=lambda m: m.fields.cam_prior_loss()
            )

        params = init_utils.fit_until_converged(
            cam_loss, params, tol=1e-4, log_name="camera"
        )

        def intr_loss(p):
            return self.model.apply(
                {"params": p},
                method=lambda m: m.intrinsics.compute_distance_to_prior(),
            )

        params = init_utils.fit_until_converged(
            intr_loss, params, tol=1.0, log_name="intrinsics"
        )

        # 3. skeleton joint-angle fit if priors available
        if info.get("joint_angles") is not None and self.opts[
            "fg_motion"
        ].startswith(("skel", "comp")):
            def skel_loss(p):
                return self.model.apply(
                    {"params": p},
                    method=lambda m: m.fields.field_params[
                        "fg"
                    ].warp.articulation.prior_fit_loss(),
                )

            params = init_utils.fit_until_converged(
                skel_loss, params, tol=1e-4, log_name="skeleton"
            )

        # 4. geometry distillation from proxy SDF
        self.params = params
        pools = self._build_geometry_pools(
            num_steps=self.opts.get("geo_init_steps", 500)
        )
        self.params = init_utils.fit_geometry(self.model, self.params, pools)

    def _build_geometry_pools(self, num_steps=500, nsample=256):
        """Host-side sample pools for SDF distillation."""
        rng = np.random.default_rng(0)
        num_inst = self.model.num_inst
        pools = {}
        for cate in self.categories:
            mesh = self.proxy[cate]
            bounds = mesh.bounds
            size = bounds[1] - bounds[0]
            lo = bounds[0] - size * 0.25
            hi = bounds[1] + size * 0.25
            pts = rng.uniform(
                lo, hi, size=(num_steps, nsample, 3)
            ).astype(np.float32)
            if cate == "bg":
                sdf_fn = MeshSDF(mesh)
                sdf_gt = sdf_fn(pts.reshape(-1, 3)).reshape(
                    num_steps, nsample, 1
                )
            elif self.opts["fg_motion"].startswith(("skel", "comp")):
                sdf_gt = self._gauss_sdf(pts.reshape(-1, 3)).reshape(
                    num_steps, nsample, 1
                )
            else:
                # sphere of radius 0.1 (deformable.py:102-107)
                sdf_gt = (
                    np.linalg.norm(pts, axis=-1, keepdims=True) - 0.1
                ).astype(np.float32)
            inst_id = rng.integers(
                0, num_inst, size=(num_steps, nsample)
            ).astype(np.int32)
            pools[cate] = {
                "pts": jnp.asarray(pts),
                "sdf_gt": jnp.asarray(sdf_gt),
                "inst_id": jnp.asarray(inst_id),
            }
        return pools

    def _gauss_sdf(self, pts):
        fn = lambda m, p: m.fields.field_params["fg"].warp.get_gauss_sdf(p)
        out = self.model.apply(
            {"params": self.params}, jnp.asarray(pts), method=fn
        )
        return np.asarray(out)

    # ------------------------------------------------------------- optimizer

    def optimizer_init(self, is_resumed: bool = False):
        opts = self.opts
        lr_base = opts["learning_rate"]
        if is_resumed:
            div_factor, final_div_factor, pct_start = 1.0, 5.0, 0.0
        else:
            div_factor, final_div_factor = 25.0, 1.0
            pct_start = 2.0 / opts["num_rounds"]

        def make_sched(peak):
            return partial(
                onecycle_linear,
                total_steps=self.total_steps,
                peak=peak,
                pct_start=pct_start,
                div_factor=div_factor,
                final_div_factor=final_div_factor,
            )

        def make_adamw(peak):
            return optax.adamw(
                make_sched(peak), b1=0.9, b2=0.999, weight_decay=1e-4
            )

        labels = param_labels(
            self.params, freeze_bone_len=opts.get("freeze_bone_len", False)
        )
        # clip_with_norm exposes the pre-clip global norm in its state so
        # the train step logs it without a second ~100-leaf global_norm
        # pass. (A flat-vector AdamW over one concatenated param vector
        # was built and measured SLOWER by 2.5 ms/step: reshaping ~100
        # (8,128)-tiled leaves to 1-D costs a relayout copy each way —
        # docs/performance.md.)
        self.tx = optax.chain(
            clip_with_norm(5.0),
            optax.multi_transform(
                {
                    "base": make_adamw(lr_base),
                    "explicit": make_adamw(lr_base * 10),
                    "frozen": optax.set_to_zero(),
                },
                labels,
            ),
        )
        self._build_train_step()

    def _build_train_step(self):
        """Jit the train step over a ("data","video") device mesh.

        Parallelism layout (replaces DDP, ref trainer.py:110-115):
          * batch leading axis sharded over both mesh axes (DP over rays)
          * per-video parameter tables (instance codes, camera base
            rotations, intrinsics base values) sharded over "video";
            everything else replicated
          * gradients reduced by XLA psum (implicit in the jit partition)
        Optimizer moments inherit their parameter's sharding because
        optax's zeros_like runs on the already-placed params.
        """
        model, tx = self.model, self.tx
        total_shards = self.num_data_shards * self.num_video_shards
        self.mesh = mesh_utils.make_mesh(
            self.num_data_shards,
            self.num_video_shards,
            jax.devices()[:total_shards],
        )

        def train_step(params, opt_state, batch, step, rng):
            sched = compute_sched(step)
            r_aux, r_swap = jax.random.split(rng)

            def loss_fn(p):
                loss_dict = model.apply(
                    {"params": p},
                    batch,
                    sched,
                    train=True,
                    rngs={"aux": r_aux, "swap": r_swap},
                )
                return sum(jax.tree.leaves(loss_dict)), loss_dict

            (total, loss_dict), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            loss_dict["total"] = total
            # pre-clip global norm computed once, inside clip_with_norm
            loss_dict["grad_norm"] = new_opt_state[0].grad_norm
            return new_params, new_opt_state, loss_dict

        if total_shards > 1:
            num_vids = self.data_info["frame_info"].num_vids
            param_sh = mesh_utils.param_shardings(
                self.mesh, self.params, num_vids
            )
            self.params = jax.device_put(self.params, param_sh)
            self.opt_state = mesh_utils.init_opt_state(tx, self.params, self.mesh)
            opt_sh = jax.tree.map(lambda x: x.sharding, self.opt_state)
            self._param_sh, self._opt_sh = param_sh, opt_sh
            repl = mesh_utils.replicated(self.mesh)
            self._train_step = jax.jit(
                train_step,
                donate_argnums=(0, 1),
                in_shardings=(param_sh, opt_sh, None, None, None),
                out_shardings=(param_sh, opt_sh, repl),
            )
            self._batch_sharding = mesh_utils.batch_sharding(self.mesh)
        else:
            self.opt_state = tx.init(self.params)
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
            self._batch_sharding = None

    # ---------------------------------------------------------------- train

    def train(self):
        opts = self.opts
        self.save_checkpoint(round_count=self.current_round)
        self.trainloader.start()
        for round_count in range(
            self.current_round, self.current_round + opts["num_rounds"]
        ):
            start = time.time()
            self.run_one_round(round_count)
            print(
                f"Round {round_count:03d}: time={time.time() - start:.3f}s",
                flush=True,
            )
        self.trainloader.stop()

    def run_one_round(self, round_count):
        times = {}

        def timed(name, fn):
            t0 = time.time()
            out = fn()
            times[name] = time.time() - t0
            return out

        try:
            timed("eval", self.model_eval)
        except Exception as e:  # eval must not kill training
            print(f"[warn] eval failed: {e}")
        timed("geo", self.update_geometry_aux)
        timed(
            "export",
            lambda: self.export_geometry_aux(
                "%s/%03d" % (self.save_dir, round_count)
            ),
        )
        timed("train", lambda: self.train_one_round(round_count))
        self.current_round += 1
        timed(
            "ckpt",
            lambda: self.save_checkpoint(round_count=self.current_round),
        )
        print(
            "  " + " ".join(f"{k}={v:.1f}s" for k, v in times.items()),
            flush=True,
        )

    def train_one_round(self, round_count):
        opts = self.opts
        geo = self._geo_for_batch()
        # device->host readbacks are batched: each blocking scalar fetch is
        # a full round-trip (hundreds of ms through a tunneled TPU), so
        # grad-norm checks and loss logging drain every `drain_every` steps
        # in ONE device_get. The rollback consequently trails a spike by up
        # to 10 steps — equivalent recovery: the cache it restores is two
        # ROUNDS old either way (trainer.py:581-604).
        drain_every = 10
        pending = []  # [(step, grad_norm_dev, loss_dict_dev | None)]

        def drain():
            if not pending:
                return
            gns, lds = jax.device_get(
                ([p[1] for p in pending], [p[2] for p in pending])
            )
            for (step, _, _), gn, ld in zip(pending, gns, lds):
                self.check_grad(gn)
                if ld is not None:
                    self.log.scalars(
                        {k: float(v) for k, v in ld.items()}, step
                    )
            pending.clear()

        for i in range(opts["iters_per_round"]):
            batch_np = self.trainloader.next_batch()
            if self._batch_sharding is not None:
                batch = {
                    k: jax.device_put(v, self._batch_sharding)
                    for k, v in batch_np.items()
                }
            else:
                batch = jax.device_put(batch_np)
            batch["geo"] = geo
            rng = jax.random.fold_in(
                jax.random.PRNGKey(42), self.current_steps
            )
            self.params, self.opt_state, loss_dict = self._train_step(
                self.params,
                self.opt_state,
                batch,
                jnp.asarray(self.current_steps, jnp.float32),
                rng,
            )
            pending.append((
                self.current_steps,
                loss_dict["grad_norm"],
                loss_dict if self.current_steps % 10 == 0 else None,
            ))
            if len(pending) >= drain_every:
                drain()
            self.current_steps += 1
        drain()

    def check_grad(self, grad_norm, thresh: float = 5.0):
        """Loss-spike rollback (trainer.py:581-604): if the grad norm spikes
        (or goes non-finite), restore model+optimizer from two rounds ago.

        Grad norms are drained in batches (see train_one_round), so the
        check trails the corresponding update by up to 10 steps; the
        restore point is a two-round-old snapshot either way.
        """
        grad_norm = float(grad_norm)
        bad = (grad_norm > thresh) or not np.isfinite(grad_norm)
        if bad and self.model_cache[0] is not None:
            print(
                f"large grad: {grad_norm:.2f}, resume from cached weights"
            )
            # jnp.copy, NOT asarray: the cache holds device arrays and
            # asarray would alias them — the next donated train step
            # would delete the cache's buffers, so a second spike in the
            # same round would read deleted arrays
            self.params = jax.tree.map(jnp.copy, self.model_cache[0])
            self.opt_state = jax.tree.map(jnp.copy, self.opt_cache[0])

    # ------------------------------------------------------ geometry upkeep

    def update_geometry_aux(self):
        """Marching-cubes proxy refresh + aabb/near-far EMA
        (multifields.py:129-134)."""
        for cate in self.categories:
            mesh = self.extract_canonical_mesh(cate, use_extend_aabb=True)
            if not mesh.is_empty:
                self.proxy[cate] = mesh
            self._reset_geo_state(cate, beta=0.9)

    def extract_canonical_mesh(
        self, cate, grid_size=64, level=0.005, use_visibility=True,
        use_extend_aabb=True, inst_id=None,
    ):
        aabb = self.geo_state[cate]["aabb"]
        if use_extend_aabb:
            size = aabb[1] - aabb[0]
            aabb = np.stack([aabb[0] - 0.5 * size, aabb[1] + 0.5 * size])
        sdf_fn = lambda pts: np.asarray(
            self._apply_field_method(cate, "sdf_grid", jnp.asarray(pts))
        ).astype(np.float32)
        vis_fn = (
            (lambda pts: np.asarray(
                self._apply_field_method(cate, "vis_grid", jnp.asarray(pts))
            ) > 0)
            if use_visibility
            else None
        )
        return marching_cubes(
            sdf_fn,
            aabb,
            visibility_func=vis_fn,
            grid_size=grid_size,
            level=level,
            apply_connected_component=(cate == "fg"),
        )

    def export_geometry_aux(self, path):
        for cate in self.categories:
            try:
                self.proxy[cate].export(f"{path}-{cate}-proxy.obj")
            except Exception as e:
                print(f"[warn] proxy export failed: {e}")

    # ----------------------------------------------------------------- eval

    def model_eval(self):
        """Render eval frames, log image grids + quantitative metrics
        (trainer.py:400-411; PSNR/SSIM/depth are additions — the reference
        publishes no in-repo eval metrics)."""
        rendered, ref = self.render_frames(self.eval_fid, return_ref=True)
        self.log.images(rendered, self.current_round)
        try:
            self.log.scalars(
                self.compute_eval_metrics(rendered, ref), self.current_round
            )
        except Exception as e:
            print(f"[warn] eval metrics failed: {e}")

    @staticmethod
    def compute_eval_metrics(rendered, ref):
        from lab4d_tpu.utils.metrics import depth_error, psnr, ssim

        out = {}
        mask = ref.get("mask")
        mask = None if mask is None else mask[..., 0] > 0.5
        if "rgb" in rendered and "rgb" in ref:
            out["eval/psnr"] = psnr(rendered["rgb"], ref["rgb"], mask=mask)
            out["eval/ssim"] = float(
                np.mean(
                    [ssim(p, t) for p, t in zip(rendered["rgb"], ref["rgb"])]
                )
            )
        if "depth" in rendered and "depth" in ref:
            out["eval/depth_err"] = depth_error(
                rendered["depth"], ref["depth"], mask=mask
            )
        return out

    def render_frames(self, fids, render_res: Optional[int] = None,
                      return_ref: bool = False):
        opts = self.opts
        res = render_res or opts["eval_res"]
        geo = self._geo_for_batch()

        hxy = _xy_grid(res)
        if not hasattr(self, "_eval_render"):
            model = self.model

            def eval_prep(params, batch):
                return model.apply(
                    {"params": params}, batch,
                    method=model.prepare_eval_samples,
                )

            def eval_rays(params, samples, hxy_c):
                samples_c = {
                    cate: {**samples[cate], "hxy": hxy_c}
                    for cate in samples
                }
                return model.apply(
                    {"params": params}, samples_c, sched=None,
                    method=model.evaluate_rays,
                )

            self._eval_prep = jax.jit(eval_prep)
            self._eval_render = jax.jit(eval_rays)

        import cv2

        out = {}
        refs = {}
        # rays per evaluate_rays call. Capped at 8192: the single-call
        # whole-frame eval graph MISCOMPILES on the tunneled TPU at
        # >=16384 rays (diagonal-streak garbage renders, mask mean 0.60
        # vs 0.21; the identical program is correct on CPU and correct
        # on TPU when chunked — round-5 debug, docs/qa.md). Chunking
        # also bounds eval VMEM at high render_res. The per-frame
        # camera/FK prep runs ONCE per frame (prepare_eval_samples),
        # not per chunk, mirroring render.py's prep/render split.
        chunk = min(res * res, 8192)
        for fid in fids:
            pair = data_utils.load_eval_frame(
                self.eval_datasets, int(fid), self.data_info
            )
            crop2raw = pair["crop2raw"][:1].copy()
            crop2raw[:, :2] *= opts["train_res"] / res
            batch = {
                "dataid": jnp.asarray(pair["dataid"][:1].astype(np.int32)),
                "frameid_sub": jnp.asarray(
                    pair["frameid_sub"][:1].astype(np.int32)
                ),
                "crop2raw": jnp.asarray(crop2raw),
                # prep consumes hxy only to size per-ray outputs; pass
                # one chunk's worth so shapes match the streaming calls
                "hxy": jnp.asarray(hxy[None, :chunk]),
                "geo": geo,
            }
            samples = self._eval_prep(self.params, batch)
            parts = []
            for i in range(0, res * res, chunk):
                parts.append(jax.device_get(  # ONE host transfer per chunk
                    self._eval_render(
                        self.params, samples,
                        jnp.asarray(hxy[None, i : i + chunk]),
                    )
                ))
            rendered = {
                k: (
                    np.concatenate([p[k] for p in parts], axis=1)
                    if parts[0][k].ndim >= 3 else parts[0][k]
                )
                for k in parts[0]
            }
            for k, v in rendered.items():
                if v.ndim < 3:
                    continue
                img = v[0].reshape(res, res, -1)
                out.setdefault(k, []).append(img)
            if return_ref:
                for k in ("rgb", "depth", "mask"):
                    if k not in pair:
                        continue
                    img = np.asarray(pair[k][0], np.float32)
                    if img.ndim == 2:  # flattened (N, C) full image
                        side = int(np.sqrt(img.shape[0]))
                        img = img.reshape(side, side, -1)
                    side = img.shape[0]
                    if side != res:
                        img = cv2.resize(
                            img, (res, res),
                            interpolation=cv2.INTER_NEAREST
                            if k == "mask" else cv2.INTER_LINEAR,
                        ).reshape(res, res, -1)
                    refs.setdefault(k, []).append(img)
        out = {k: np.stack(v) for k, v in out.items()}
        if return_ref:
            return out, {k: np.stack(v) for k, v in refs.items()}
        return out

    # ----------------------------------------------------------- checkpoint

    def save_checkpoint(self, round_count):
        opts = self.opts
        self.model_cache[0] = self.model_cache[1]
        self.opt_cache[0] = self.opt_cache[1]
        # rollback cache stays ON DEVICE: jnp.copy is an HBM copy (the
        # step donates its input buffers, so references alone won't do),
        # while np.asarray would round-trip the full train state to the
        # host every round (~14 s/round through a tunneled TPU). Only
        # actual disk saves below pay the device->host readback.
        self.model_cache[1] = jax.tree.map(jnp.copy, self.params)
        self.opt_cache[1] = jax.tree.map(jnp.copy, self.opt_state)

        if round_count % opts["save_freq"] == 0:
            path = "%s/ckpt_%04d.flax" % (self.save_dir, round_count)
            # msgpack checkpoint (no pickle: safe to load, stable across
            # refactors). Optimizer state IS saved — the reference stores
            # it too (trainer.py:276-285); resuming mid-run keeps Adam
            # moments instead of restarting them against a resumed LR.
            payload = {
                "manifest": {
                    "format": 1,
                    "current_steps": int(self.current_steps),
                    "current_round": int(self.current_round),
                },
                "model": jax.tree.map(np.asarray, self.model_cache[1]),
                "opt_state": jax.tree.map(
                    np.asarray, serialization.to_state_dict(self.opt_cache[1])
                ),
                "geo_state": jax.tree.map(np.asarray, self.geo_state),
                "proxy": {
                    c: {
                        "vertices": np.asarray(m.vertices, np.float32),
                        "faces": np.asarray(m.faces, np.int32),
                    }
                    for c, m in self.proxy.items()
                },
            }
            with open(path, "wb") as f:
                f.write(serialization.msgpack_serialize(payload))
            shutil.copy(path, "%s/ckpt_latest.flax" % self.save_dir)
            print(f"saved checkpoint round {round_count}")

    @staticmethod
    def load_checkpoint(load_path: str):
        with open(load_path, "rb") as f:
            ckpt = serialization.msgpack_restore(f.read())
        # flatten the manifest for callers (back-compat with the old keys)
        ckpt.update(ckpt.get("manifest", {}))
        return ckpt

    def load_checkpoint_train(self):
        ckpt = self.load_checkpoint(self.opts["load_path"])
        self.params = _merge_params(self.params, ckpt["model"])
        if not self.opts["reset_steps"]:
            self.current_steps = int(ckpt["current_steps"])
            self.current_round = int(ckpt["current_round"])
        self._restore_opt_state(ckpt.get("opt_state"))
        for cate, pm in ckpt.get("proxy", {}).items():
            if cate in self.categories:
                self.proxy[cate] = TriMesh(pm["vertices"], pm["faces"])
        for cate in self.categories:
            self._reset_geo_state(cate, beta=0.0)
        if self._batch_sharding is not None:
            # loaded leaves are host arrays: re-place on the mesh
            self.params = jax.device_put(self.params, self._param_sh)
            self.opt_state = jax.device_put(self.opt_state, self._opt_sh)

    def _restore_opt_state(self, loaded) -> bool:
        """Restore optimizer moments when the architecture matches exactly
        (every leaf present with the same shape); otherwise keep the fresh
        init — a transfer/architecture-delta load starts Adam from zero,
        matching the reference's opt-in behavior (trainer.py:303-308)."""
        if loaded is None:
            return False
        current = serialization.to_state_dict(self.opt_state)
        cur_flat = flax.traverse_util.flatten_dict(current)
        new_flat = flax.traverse_util.flatten_dict(loaded)
        # checkpoints written before clip_with_norm replaced
        # optax.clip_by_global_norm lack its scalar grad_norm leaf;
        # backfill zeros rather than discarding all Adam moments
        missing = set(cur_flat) - set(new_flat)
        if missing and all(
            k[-1] == "grad_norm" and np.shape(cur_flat[k]) == ()
            for k in missing
        ):
            for k in missing:
                new_flat[k] = np.zeros((), np.float32)
            loaded = flax.traverse_util.unflatten_dict(new_flat)
        if set(cur_flat) != set(new_flat) or any(
            np.shape(cur_flat[k]) != np.shape(new_flat[k]) for k in cur_flat
        ):
            print("[warn] optimizer state mismatch; Adam moments reset")
            return False
        self.opt_state = serialization.from_state_dict(self.opt_state, loaded)
        return True

    # -------------------------------------------------------- test-time use

    @staticmethod
    def construct_test_model(opts):
        """Build a model + load a checkpoint at test time
        (trainer.py:545-579)."""
        eval_datasets = data_utils.config_to_datasets(opts, is_eval=True)
        data_info = data_utils.get_data_info(eval_datasets)
        frame_info = data_info["frame_info"]

        model = DVRModel(
            frame_info=frame_info,
            field_type=opts["field_type"],
            fg_motion=opts["fg_motion"],
            num_inst=1 if opts["single_inst"] else frame_info.num_vids,
            train_res=opts["train_res"],
            intrinsics_init=_expand_intrinsics(data_info),
            rtmat_fg=data_info["rtmat"][data_info["vis_info"]["fg"]],
            rtmat_bg=data_info["rtmat"][data_info["vis_info"]["bg"]],
            loss_weights=tuple(
                (k, opts[k]) for k in _LOSS_WEIGHT_NAMES if k in opts
            ),
        )
        logname = "%s-%s" % (opts["seqname"], opts["logname"])
        load_path = "%s/%s/ckpt_%s.flax" % (
            opts["logroot"], logname, opts["load_suffix"],
        )
        ckpt = Trainer.load_checkpoint(load_path)
        params = ckpt["model"]
        geo_state = ckpt["geo_state"]
        proxy = {
            c: TriMesh(pm["vertices"], pm["faces"])
            for c, pm in ckpt["proxy"].items()
        }
        return model, params, geo_state, proxy, data_info, eval_datasets


# --------------------------------------------------------------------- misc


def _expand_intrinsics(info):
    return np.asarray(info["intrinsics"], dtype=np.float32)


def _xy_grid(res: int) -> np.ndarray:
    x, y = np.meshgrid(np.arange(res), np.arange(res), indexing="xy")
    return np.stack(
        [x.reshape(-1), y.reshape(-1), np.ones(res * res)], -1
    ).astype(np.float32)


def _merge_params(params, loaded):
    """strict=False load: overwrite leaves present in both trees.

    Checkpoint-transfer surgery (parity: torch_utils.py:66-113): when a
    per-video table (instance codes, per-video base rotations/focals)
    disagrees on the video count, the loaded rows are mean-compressed and
    broadcast into the new table — a category checkpoint then seeds a
    new capture with its average morphology/appearance.
    """
    flat_p = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    flat_l = flax.traverse_util.flatten_dict(loaded)
    for k, v in flat_l.items():
        if k not in flat_p:
            continue
        v = jnp.asarray(v)
        if flat_p[k].shape == v.shape:
            flat_p[k] = v
        elif (
            v.ndim == flat_p[k].ndim
            and v.ndim >= 1
            and v.shape[1:] == flat_p[k].shape[1:]
            and any(t in k for t in ("inst_embedding", "base_quat",
                                     "base_logfocal", "base_ppoint",
                                     "base_trans"))
        ):
            mean = v.mean(0, keepdims=True)
            flat_p[k] = jnp.broadcast_to(mean, flat_p[k].shape)
    return flax.traverse_util.unflatten_dict(flat_p)


class _make_logger:
    """Scalar/image logger: JSONL always; TensorBoard if available."""

    def __init__(self, save_dir):
        self.save_dir = save_dir
        self.jsonl = open(os.path.join(save_dir, "metrics.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(save_dir)
        except Exception:
            self.tb = None

    def scalars(self, d: Dict[str, float], step: int):
        self.jsonl.write(json.dumps({"step": step, **d}) + "\n")
        self.jsonl.flush()
        if self.tb:
            for k, v in d.items():
                self.tb.add_scalar(k, v, step)

    def images(self, rendered: Dict[str, np.ndarray], step: int):
        if not self.tb:
            return
        from lab4d_tpu.utils.vis import img2color, make_image_grid

        for k, v in rendered.items():
            try:
                grid = make_image_grid(v)
                img = img2color(k, grid)
                self.tb.add_image(
                    "img_" + k, img, step, dataformats="HWC"
                )
            except Exception:
                pass
