"""Static VolSDF neural field (flax).

Parity target: lab4d/nnutils/nerf.py:35-1007. Key design deltas for TPU:
- Pure functional: annealing alpha / beta_prob arrive in a `sched` dict of
  traced scalars; aabb / per-frame near-far / proxy corners arrive in the
  samples_dict (host-maintained "geometry state"), not module buffers.
- Eikonal gradients use jax.grad of the summed SDF (per-point gradients
  fall out since the SDF is pointwise); double-backward through this is
  handled by ordinary jax autodiff, replacing the reference's custom CUDA
  double-backward kernels (third_party/quaternion/).
- No data-dependent control flow: the valid-idx compaction of
  nerf.py:782-818 is replaced by dense masked evaluation, and the
  eikonal subsampling (nerf.py:416-453) uses a static-size random gather.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from lab4d_tpu.nnutils.appearance import AppearanceEmbedding
from lab4d_tpu.nnutils.base import CondMLP, embed_cond_mlp
from lab4d_tpu.nnutils.linear import TorchDense
from lab4d_tpu.nnutils.embedding import FrameInfo, PosEmbedding
from lab4d_tpu.nnutils.pose import CameraMLP
from lab4d_tpu.nnutils.visibility import VisField
from lab4d_tpu.ops.renderer import (
    compute_weights,
    permutation_gather,
    sample_cam_rays,
    sample_pdf,
)
from lab4d_tpu.utils.geom import (
    Kmatinv,
    apply_se3mat,
    extend_aabb,
    get_near_far,
    pinhole_projection,
)
from lab4d_tpu.utils.quat import (
    quaternion_translation_inverse,
    quaternion_translation_to_se3,
)


def flip_pair(x):
    """Swap consecutive pair entries along the leading axis:
    [x0, x1, x2, x3, ...] -> [x1, x0, x3, x2, ...] (nerf.py:929-946)."""
    if isinstance(x, (tuple, list)):
        return type(x)(flip_pair(v) for v in x)
    if isinstance(x, dict):
        return {k: flip_pair(v) for k, v in x.items()}
    if x.shape[0] < 2:
        return x
    return x.reshape((x.shape[0] // 2, 2) + x.shape[1:])[:, ::-1].reshape(x.shape)


def _eval_merged_enabled() -> bool:
    """The merged two-pass eval path (query_field_eval) shares one primal
    evaluation between the coarse and importance passes and merges the
    halves by depth sort. With the sort applied as a one-hot permutation
    MATMUL it is the fastest eval path measured on v5e: 236 ms/frame
    @256^2 skel-quad chunk 1024 vs 329 ms for resample-and-reevaluate.
    (The original take_along_axis merge was 604 ms — a batched gather
    over ~35 channels lowers to serial dynamic-slices on TPU; see
    query_field_eval.) Default ON; LAB4D_EVAL_MERGED=0 restores the
    two-evaluation path for A/B (docs/performance.md)."""
    import os

    return os.environ.get("LAB4D_EVAL_MERGED", "1") == "1"


def _eval_topk():
    """Per-ray sample budget for the HEAVY eval channels (LAB4D_EVAL_TOPK,
    int; unset/0 = exact all-sample evaluation).

    When set to K, rendering still computes density and the volume
    integration weights from ALL n_depth union samples (so the mask —
    total integration mass — and the importance distribution are exact;
    depth integrates over the K selected samples and is exact only where
    weights concentrate), but evaluates the expensive
    per-sample channels — rgb, vis, feature, the normal/eikonal SDF vjp,
    the cycle warp — only at the K highest-weight samples of each ray.
    The selected weights are renormalized to each ray's exact total
    integration mass and the returned per-sample density is re-solved so
    that re-integrating the K samples reproduces those weights exactly;
    the only approximation is that channel VALUES come from the K
    most-weighted samples (measured on the 2-round synthetic checkpoint,
    a worst case with diffuse weights: rgb PSNR vs exact = 59.9 dB at
    K=8, 61.8 at K=12, 64.3 at K=16, identical masks; and on a CONVERGED
    20-round adversarial-scene checkpoint via scripts/perf/
    topk_fidelity.py: K=8 vs exact rgb 39.7 dB, mask max err 6e-5,
    depth median err 2e-4, and quality-vs-GT cost 0.05 dB — exact
    21.04 dB vs topk 20.99; see docs/performance.md). The render CLI
    defaults to K=8;
    LAB4D_EVAL_TOPK=0 restores the reference's every-sample evaluation
    (lab4d nerf.py:686-738)."""
    v = os.environ.get("LAB4D_EVAL_TOPK", "").strip()
    if not v:
        return None
    k = int(v)
    return k if k > 0 else None


def _eval_channels():
    """Optional rendered-channel subset (LAB4D_EVAL_CHANNELS: comma list,
    unset/"" = all channels). Set by `render.py --render_keys`: the eval
    pass then skips the producers of unrequested channels — the feature
    MLP, the vis MLP, the cycle-consistency warp, and (biggest) the
    normal/eikonal SDF-gradient vjp — while keeping every produced
    channel bit-identical to the full pass. Returns None (= all) or a
    frozenset of keys."""
    import os

    v = os.environ.get("LAB4D_EVAL_CHANNELS", "").strip()
    if not v:
        return None
    return frozenset(s.strip() for s in v.split(",") if s.strip())


def _eval_wants(*keys) -> bool:
    ch = _eval_channels()
    return ch is None or any(k in ch for k in keys)


class NeRF(nn.Module):
    """A static SDF + appearance field with camera/visibility submodules."""

    category: str  # "fg" or "bg"
    frame_info: FrameInfo = None
    rtmat_init: np.ndarray = None  # (M,4,4) camera prior, field units
    num_inst: int = 1
    D: int = 5
    W: int = 128
    num_freq_xyz: int = 10
    num_freq_dir: int = 4
    appr_channels: int = 32
    appr_num_freq_t: int = 6
    inst_channels: int = 32
    skips: tuple = (4,)
    init_beta: float = 0.1
    init_scale: float = 0.1
    color_act: bool = True
    feature_channels: int = 16
    # True: scatter the subsampled train-time eikonal back into a dense
    # (M,N,D,1) tensor (required when compose_fields packs several fields
    # into one sample axis — comp configs). False: return the compact
    # (S,D,1) values directly; the loss (a nonzero-mean) is identical and
    # the dense zeros/scatter/broadcast traffic (~0.6 ms/step on v5e)
    # disappears.
    eikonal_dense: bool = False

    def setup(self):
        self.pos_embedding = PosEmbedding(3, self.num_freq_xyz)
        self.dir_embedding = PosEmbedding(3, self.num_freq_dir)

        self.basefield = CondMLP(
            num_inst=self.num_inst,
            D=self.D,
            W=self.W,
            inst_channels=self.inst_channels,
            out_channels=self.W,
            skips=self.skips,
            final_act=True,
        )
        self.pos_embedding_color = PosEmbedding(3, self.num_freq_xyz + 2)
        self.colorfield = CondMLP(
            num_inst=self.num_inst,
            D=2,
            W=self.W,
            inst_channels=self.inst_channels,
            out_channels=self.W,
            skips=self.skips,
            final_act=True,
        )
        if self.appr_channels > 0:
            self.appr_embedding = AppearanceEmbedding(
                frame_info=self.frame_info,
                appr_channels=self.appr_channels,
                num_freq_t=self.appr_num_freq_t,
            )
        self.sdf_head = TorchDense(1)
        self.rgb_head = [TorchDense(self.W // 2), TorchDense(3)]

        self.logibeta = self.param(
            "logibeta",
            lambda k, s: jnp.full(s, -np.log(self.init_beta)),
            (1,),
        )
        self.logscale = self.param(
            "logscale", lambda k, s: jnp.full(s, np.log(self.init_scale)), (1,)
        )
        self.camera_mlp = CameraMLP(
            frame_info=self.frame_info, rtmat_init=self.rtmat_init
        )
        self.vis_mlp = VisField(num_inst=self.num_inst)

    # ------------------------------------------------------------------ core

    def forward(
        self,
        xyz,
        dir=None,
        frame_id=None,
        inst_id=None,
        get_density: bool = True,
        sched: Optional[Dict] = None,
        train: bool = False,
        fused: Optional[bool] = None,
    ):
        """Evaluate the field at canonical points (nerf.py:167-215).

        Returns density (VolSDF Laplace-CDF of the SDF) or raw SDF, plus RGB
        if `dir` is given.
        """
        alpha = None if sched is None else sched.get("alpha")
        beta_prob = None if sched is None else sched.get("beta_prob")
        xyz_feat = embed_cond_mlp(
            self.basefield, self.pos_embedding, xyz, alpha=alpha,
            inst_id=inst_id, beta_prob=beta_prob, train=train, fused=fused,
        )

        sdf = self.sdf_head(xyz_feat)  # negative inside
        if get_density:
            ibeta = jnp.exp(self.logibeta)
            # VolSDF: sigma = ibeta * Psi_beta(-sdf), Laplace CDF form
            density = (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) * ibeta)) * ibeta
            out = density
        else:
            out = sdf

        if dir is not None:
            dir_embed = self.dir_embedding(dir, alpha=None)
            if self.appr_channels > 0:
                appr = self.appr_embedding.get_vals(frame_id)
                appr = appr.reshape(
                    appr.shape[:1] + (1,) * (dir_embed.ndim - 2) + appr.shape[-1:]
                )
                appr = jnp.broadcast_to(
                    appr, dir_embed.shape[:-1] + appr.shape[-1:]
                )
                appr_embed = jnp.concatenate([dir_embed, appr], axis=-1)
            else:
                appr_embed = dir_embed

            xyz_feat = xyz_feat + embed_cond_mlp(
                self.colorfield, self.pos_embedding_color, xyz, alpha=alpha,
                inst_id=inst_id, beta_prob=beta_prob, train=train,
                fused=fused,
            )
            rgb = self.rgb_head[1](
                nn.relu(self.rgb_head[0](jnp.concatenate([xyz_feat, appr_embed], -1)))
            )
            if self.color_act:
                rgb = jax.nn.sigmoid(rgb)
            return rgb, out
        return out

    def sdf_fn(self, xyz, inst_id=None, sched=None):
        return self.forward(xyz, inst_id=inst_id, get_density=False, sched=sched)

    def query_all_heads(self, xyz, dir, frame_id, inst_id, sched, train):
        """Hook for the multi-head fused field kernel (FeatureNeRF);
        None = use the per-module path."""
        return None

    # NOTE: a fused warp+field megakernel (skinning warp as an in-kernel
    # prologue to the field heads) was built and measured in round 3 and
    # DELETED: the warp tile's quaternion math is Mosaic-hostile (fused
    # fwd 8.95 ms vs 5.81 + ~1.3 separate; the warp-only backward kernel
    # ran at 11.9 ms standalone vs ~2.7 in XLA), and VMEM pressure forced
    # 512/256-point tiles. The warp stays in XLA where it is matmul-form
    # and fuses well; see docs/performance.md "Fused warp+field kernel".

    # ----------------------------------------------------------- ray queries

    def get_samples(self, Kinv, batch, train: bool = True):
        """Assemble per-ray metadata incl. camera pose and near-far
        (nerf.py:530-578).

        batch must carry "hxy", "frameid", "dataid", and the geometry state
        "near_far_table" (Nraw,2) [train] or "proxy_corners" (8,3) [eval];
        optional "field2cam" (N,7) overrides the camera MLP.
        """
        frame_id = batch["frameid"]
        inst_id = batch["dataid"]

        if "field2cam" in batch:
            f2c = batch["field2cam"]
            field2cam = (f2c[..., :4], f2c[..., 4:] * jnp.exp(self.logscale))
        else:
            field2cam = self.camera_mlp.get_vals(frame_id)

        if train:
            near_far = batch["near_far_table"][frame_id]
        else:
            corners = batch["proxy_corners"]
            field2cam_mat = quaternion_translation_to_se3(field2cam[0], field2cam[1])
            near_far = get_near_far(corners, field2cam_mat, tol_fac=1.5)

        samples_dict = {
            "Kinv": Kinv,
            "field2cam": field2cam,
            "frame_id": frame_id,
            "inst_id": inst_id,
            "near_far": near_far,
            "hxy": batch["hxy"],
        }
        if "feature" in batch:
            samples_dict["feature"] = batch["feature"]
        if "aabb" in batch:
            samples_dict["aabb"] = batch["aabb"]
        return samples_dict

    def query_field(self, samples_dict, sched=None, train=True, flow_thresh=None):
        """Full per-ray pipeline: sample -> backward warp -> field eval ->
        flow/cycle/eikonal (nerf.py:580-684)."""
        if not train and _eval_merged_enabled():
            return self.query_field_eval(samples_dict, sched=sched)
        Kinv = samples_dict["Kinv"]
        field2cam = samples_dict["field2cam"]
        frame_id = samples_dict["frame_id"]
        inst_id = samples_dict["inst_id"]
        near_far = samples_dict["near_far"]
        hxy = samples_dict["hxy"]

        if train:
            xyz_cam, dir_cam, deltas, depth = sample_cam_rays(
                hxy, Kinv, near_far, perturb=False
            )
        else:
            xyz_cam, dir_cam, deltas, depth = self.importance_sampling(
                hxy, Kinv, near_far, field2cam, frame_id, inst_id, samples_dict,
                sched=sched,
            )

        backwarp_dict = self.backward_warp(
            xyz_cam, dir_cam, field2cam, frame_id, inst_id, samples_dict=samples_dict
        )
        xyz = backwarp_dict["xyz"]
        dir = backwarp_dict["dir"]
        xyz_t = backwarp_dict["xyz_t"]

        feat_dict = self.query_all_heads(
            xyz, dir, frame_id, inst_id, sched, train
        )
        if feat_dict is None:
            # eval: force the jnp path end-to-end — pallas calls are
            # fusion boundaries that cost more than they save here (see
            # query_all_heads' train gate)
            fuse = None if train else False
            vis_score = self.vis_mlp(xyz, inst_id=inst_id, fused=fuse)
            feat_dict = self.query_nerf(
                xyz, dir, frame_id, inst_id, sched, train, fused=fuse
            )
            feat_dict["vis"] = vis_score

        if not train:
            # dense-masked analog of the reference's valid-idx sparsification
            # (nerf.py:496-528): zero density outside the (extended) canonical
            # aabb so the untrained exterior of the MLP cannot contribute.
            # EVAL-ONLY, like the reference (its query_field sets
            # valid_idx = None while self.training, nerf.py:633-636) —
            # applying it at train was measured to HURT (4-round synthetic
            # PSNR 8.9 vs 12.8): the hard clip blocks density gradients
            # outside the still-small early aabb.
            valid = self.get_valid_mask(xyz, xyz_t, samples_dict)
            if valid is not None:
                for k in ("density", f"density_{self.category}"):
                    feat_dict[k] = feat_dict[k] * valid[..., None]

        if train:
            samples_dict = self.prepare_forward_warp(xyz, inst_id, samples_dict)
            flow_dict, cyc_dict = self.compute_flow_cycle(
                hxy, xyz, xyz_t, frame_id, inst_id, field2cam, Kinv,
                samples_dict, flow_thresh=flow_thresh,
            )
            feat_dict.update(flow_dict)
        else:
            cyc_dict = self.cycle_loss(
                xyz, xyz_t, frame_id, inst_id, samples_dict=samples_dict,
                train=train,
            )
        for k in cyc_dict:
            if k in backwarp_dict:
                feat_dict[k] = (cyc_dict[k] + backwarp_dict[k]) / 2
            else:
                feat_dict[k] = cyc_dict[k]

        jacob_dict = self.compute_jacobian(
            xyz, xyz_cam, dir_cam, field2cam, frame_id, inst_id, samples_dict,
            sched, train,
        )
        feat_dict.update(jacob_dict)

        feat_dict["xyz"] = xyz
        feat_dict["xyz_cam"] = xyz_cam
        feat_dict["depth"] = depth / jnp.exp(self.logscale)  # world units

        aux_dict = {}
        return feat_dict, deltas, aux_dict

    # ------------------------------------------------- merged two-pass eval

    def eval_extra_heads(self, xyz):
        """Per-sample channels subclasses add at eval (FeatureNeRF: the
        canonical feature head)."""
        return {}

    def eval_pass(
        self, xyz_cam, dir_cam, field2cam, frame_id, inst_id, samples_dict,
        sched=None,
    ):
        """Evaluate ALL per-sample eval channels (heads + camera-space
        normals) at the given camera points, in one warp+MLP primal.

        The SDF gradient comes from a vjp around warp+basefield whose
        primal is shared (by CSE) with the head evaluation — no separate
        normal pass re-running the field (nerf.py:455-493).

        When a channel subset is requested (`render.py --render_keys`,
        see _eval_channels) the producers of unrequested channels are
        skipped at trace time; produced channels are unchanged."""
        eikonal = normal = None
        if _eval_wants("normal", "eikonal"):

            def warp_sdf(pts_cam):
                bw = self.backward_warp(
                    pts_cam, dir_cam, field2cam, frame_id, inst_id,
                    samples_dict=samples_dict,
                )
                sdf = self.forward(
                    bw["xyz"], inst_id=inst_id, get_density=False,
                    sched=sched, fused=False,
                )
                return sdf, bw

            # reverse-mode: one cotangent sweep. The forward-mode
            # alternative (jax.linearize + 3 unit-tangent JVP passes) was
            # built and measured in round 4: numerically identical
            # (rel diff 2.6e-6) but 766.9 ms/frame vs 523.3 @512^2 full
            # channels on v5e — 3 tangent passes through warp+field cost
            # ~3x the linear FLOPs of the single transpose sweep.
            sdf, sdf_vjp, backwarp_dict = jax.vjp(
                warp_sdf, xyz_cam, has_aux=True
            )
            g = sdf_vjp(jnp.ones_like(sdf))[0]
            from lab4d_tpu.utils.geom import safe_norm

            gnorm = safe_norm(g)
            eikonal = (gnorm - 1.0) ** 2
            normal = g / jnp.maximum(gnorm, 1e-6)
            normal = normal * jnp.asarray([1.0, -1.0, -1.0])  # ECON convention
        else:
            backwarp_dict = self.backward_warp(
                xyz_cam, dir_cam, field2cam, frame_id, inst_id,
                samples_dict=samples_dict,
            )

        xyz = backwarp_dict["xyz"]
        dir = backwarp_dict["dir"]
        xyz_t = backwarp_dict["xyz_t"]

        out = self.query_nerf(
            xyz, dir, frame_id, inst_id, sched, train=False, fused=False
        )
        if _eval_wants("vis"):
            out["vis"] = self.vis_mlp(xyz, inst_id=inst_id, fused=False)
        if _eval_wants("feature"):
            out.update(self.eval_extra_heads(xyz))

        # unmasked density drives the importance pdf (parity with
        # importance_sampling's coarse pass, which never masked)
        out["density_raw"] = out["density"]
        valid = self.get_valid_mask(xyz, xyz_t, samples_dict)
        if valid is not None:
            for k in ("density", f"density_{self.category}"):
                out[k] = out[k] * valid[..., None]

        if _eval_wants("cyc_dist"):
            cyc_dict = self.cycle_loss(
                xyz, xyz_t, frame_id, inst_id, samples_dict=samples_dict,
                train=False,
            )
            for k in cyc_dict:
                if k in backwarp_dict:
                    out[k] = (cyc_dict[k] + backwarp_dict[k]) / 2
                else:
                    out[k] = cyc_dict[k]

        if normal is not None:
            out["eikonal"] = eikonal
            out["normal"] = normal
        # xyz/xyz_cam are free byproducts (needed internally, e.g. by the
        # gauss-density head); unrequested ones are dropped at readback
        # (render.render_batch), not here
        out["xyz"] = xyz
        out["xyz_cam"] = xyz_cam
        return out

    def query_field_eval(self, samples_dict, sched=None, n_depth: int = 64):
        """Two-pass importance rendering without recomputation: each pass
        evaluates every per-sample channel at its own half of the samples
        and the halves are merged by depth sort. Mathematically identical
        to importance_sampling + a full second evaluation (the union
        points are the same), but the coarse warp+basefield work is never
        thrown away — it was previously re-run inside the fine pass
        (nerf.py:686-738)."""
        K = _eval_topk()
        if K is not None and K < n_depth:
            return self.query_field_eval_topk(
                samples_dict, sched=sched, n_depth=n_depth, topk=K
            )
        Kinv = samples_dict["Kinv"]
        field2cam = samples_dict["field2cam"]
        frame_id = samples_dict["frame_id"]
        inst_id = samples_dict["inst_id"]
        near_far = samples_dict["near_far"]
        hxy = samples_dict["hxy"]
        half = n_depth // 2

        xyz_cam1, dir_cam1, deltas1, depth1 = sample_cam_rays(
            hxy, Kinv, near_far, perturb=False, n_depth=half
        )
        out1 = self.eval_pass(
            xyz_cam1, dir_cam1, field2cam, frame_id, inst_id, samples_dict,
            sched,
        )

        weights, _ = compute_weights(out1.pop("density_raw"), deltas1)
        depth_mid = 0.5 * (depth1[:, :, :-1] + depth1[:, :, 1:])
        R = depth1.shape[0] * depth1.shape[1]
        depth_fine = sample_pdf(
            depth_mid.reshape(R, half - 1),
            weights.reshape(R, half)[:, 1:-1],
            half,
            det=True,
        )
        depth_fine = jax.lax.stop_gradient(depth_fine).reshape(depth1.shape)

        xyz_cam2, dir_cam2, _, depth2 = sample_cam_rays(
            hxy, Kinv, near_far, depth=depth_fine, perturb=False
        )
        out2 = self.eval_pass(
            xyz_cam2, dir_cam2, field2cam, frame_id, inst_id, samples_dict,
            sched,
        )
        out2.pop("density_raw")

        # merge the halves by depth order: ALL channels packed into one
        # tensor, sorted with one permutation matmul (permutation_gather
        # — batched multi-channel take_along_axis is a TPU slow path)
        depth_all = jnp.concatenate([depth1, depth2], axis=2)  # (M,N,D,1)
        order = jnp.argsort(depth_all[..., 0], axis=-1)  # (M,N,D)

        keys = list(out1.keys())
        widths = [out1[k].shape[-1] for k in keys]
        packed = jnp.concatenate(
            [jnp.concatenate([out1[k], out2[k]], axis=2) for k in keys]
            + [depth_all],
            axis=-1,
        )  # (M,N,D,sumC+1)
        packed_s = permutation_gather(order, packed)
        feat_dict = {}
        off = 0
        for k, w in zip(keys, widths):
            feat_dict[k] = packed_s[..., off : off + w]
            off += w
        depth_s = packed_s[..., off:]

        # deltas of the sorted union (sample_cam_rays convention)
        raydir = jnp.einsum("mni,mji->mnj", hxy, Kinv)
        dir_norm = jnp.linalg.norm(raydir, axis=-1, keepdims=True)
        deltas = depth_s[:, :, 1:] - depth_s[:, :, :-1]
        deltas = jnp.concatenate([deltas, deltas[:, :, -1:]], axis=2)
        deltas = deltas * dir_norm[:, :, None, :]

        feat_dict["depth"] = depth_s / jnp.exp(self.logscale)  # world units
        return feat_dict, deltas, {}

    def query_field_eval_topk(self, samples_dict, sched=None,
                              n_depth: int = 64, topk: int = 16):
        """Weight-ranked eval (see _eval_topk): exact density/weights from
        all n_depth union samples, heavy channels at the top-k weighted
        samples per ray only.

        Profile rationale (v5e, 512^2 skel-quad, docs/performance.md): the
        exact merged eval spends most of its frame in per-sample head work
        + the 36-channel depth-sort merge, while matmuls are 24 ms — this
        path cuts the heavy per-sample work ~4x and sorts only
        density+depth (2 channels). The density returned for the selected
        samples is re-solved from the true union weights, so
        compute_weights over the K samples reproduces those weights
        bit-exactly; dropped mass (the tail of the weight distribution) is
        the entire approximation."""
        Kinv = samples_dict["Kinv"]
        field2cam = samples_dict["field2cam"]
        frame_id = samples_dict["frame_id"]
        inst_id = samples_dict["inst_id"]
        near_far = samples_dict["near_far"]
        hxy = samples_dict["hxy"]
        half = n_depth // 2

        def cheap_density(xyz_cam, dir_cam):
            """Warp + base field only (the reference's coarse-pass cost)."""
            bw = self.backward_warp(
                xyz_cam, dir_cam, field2cam, frame_id, inst_id,
                samples_dict=samples_dict,
            )
            dens_raw = self.forward(
                bw["xyz"], inst_id=inst_id, get_density=True, sched=sched,
                fused=False,
            )
            valid = self.get_valid_mask(bw["xyz"], bw["xyz_t"], samples_dict)
            dens = dens_raw if valid is None else dens_raw * valid[..., None]
            return dens_raw, dens

        xyz_cam1, dir_cam1, deltas1, depth1 = sample_cam_rays(
            hxy, Kinv, near_far, perturb=False, n_depth=half
        )
        dens1_raw, dens1 = cheap_density(xyz_cam1, dir_cam1)

        # fine depths from the raw coarse pdf (parity with the exact path)
        w1, _ = compute_weights(dens1_raw, deltas1)
        depth_mid = 0.5 * (depth1[:, :, :-1] + depth1[:, :, 1:])
        R = depth1.shape[0] * depth1.shape[1]
        depth_fine = sample_pdf(
            depth_mid.reshape(R, half - 1),
            w1.reshape(R, half)[:, 1:-1],
            half,
            det=True,
        )
        depth_fine = jax.lax.stop_gradient(depth_fine).reshape(depth1.shape)

        xyz_cam2, dir_cam2, _, depth2 = sample_cam_rays(
            hxy, Kinv, near_far, depth=depth_fine, perturb=False
        )
        _, dens2 = cheap_density(xyz_cam2, dir_cam2)

        # sorted union (2 channels only: masked density + depth)
        depth_all = jnp.concatenate([depth1, depth2], axis=2)  # (M,N,D,1)
        dens_all = jnp.concatenate([dens1, dens2], axis=2)
        order = jnp.argsort(depth_all[..., 0], axis=-1)
        packed_s = permutation_gather(
            order, jnp.concatenate([dens_all, depth_all], axis=-1)
        )
        dens_s, depth_s = packed_s[..., :1], packed_s[..., 1:]

        raydir = jnp.einsum("mni,mji->mnj", hxy, Kinv)
        dir_norm = jnp.linalg.norm(raydir, axis=-1, keepdims=True)
        deltas_s = depth_s[:, :, 1:] - depth_s[:, :, :-1]
        deltas_s = jnp.concatenate([deltas_s, deltas_s[:, :, -1:]], axis=2)
        deltas_s = deltas_s * dir_norm[:, :, None, :]

        w_all, _ = compute_weights(dens_s, deltas_s)  # (M,N,D) true weights

        # top-k by weight, re-sorted to depth order
        _, idx = jax.lax.top_k(w_all, topk)  # (M,N,K)
        idx = jnp.sort(idx, axis=-1)
        w_sel = jnp.take_along_axis(w_all, idx, axis=-1)
        depth_sel = jnp.take_along_axis(depth_s[..., 0], idx, axis=-1)[..., None]
        deltas_sel = jnp.take_along_axis(deltas_s[..., 0], idx, axis=-1)[..., None]
        # renormalize so each ray keeps its EXACT total integration mass:
        # mask (= sum w) and the channel scale stay exact even when the
        # weight distribution is diffuse (underfit models spread mass over
        # more than K samples); the approximation is then purely "channel
        # values come from the K most-weighted samples"
        mass_all = jnp.sum(w_all, axis=-1, keepdims=True)
        mass_sel = jnp.sum(w_sel, axis=-1, keepdims=True)
        w_sel = w_sel * (mass_all / jnp.maximum(mass_sel, 1e-6))
        w_sel = jax.lax.stop_gradient(w_sel)
        depth_sel = jax.lax.stop_gradient(depth_sel)

        # heavy pass: every eval channel, K samples per ray
        xyz_cam_sel, dir_cam_sel, _, _ = sample_cam_rays(
            hxy, Kinv, near_far, depth=depth_sel, perturb=False
        )
        out = self.eval_pass(
            xyz_cam_sel, dir_cam_sel, field2cam, frame_id, inst_id,
            samples_dict, sched,
        )
        out.pop("density_raw")

        # re-solve per-sample density so that compute_weights over the K
        # selected samples reproduces w_sel exactly: alpha_k solves
        # w_k = alpha_k * prod_{l<k}(1 - alpha_l) given the selected set
        cum_excl = jnp.cumsum(w_sel, axis=-1) - w_sel
        alpha = w_sel / jnp.maximum(1.0 - cum_excl, 1e-6)
        alpha = jnp.clip(alpha, 0.0, 1.0 - 1e-6)
        dens_sel = -jnp.log1p(-alpha)[..., None] / jnp.maximum(
            deltas_sel, 1e-12
        )
        for k in ("density", f"density_{self.category}"):
            out[k] = dens_sel
        out["depth"] = depth_sel / jnp.exp(self.logscale)  # world units
        return out, deltas_sel, {}

    def get_valid_mask(self, xyz, xyz_t, samples_dict):
        """(M,N,D) float mask of samples inside the extended canonical aabb;
        for articulated fields also bounds time-t points by the bone aabb
        (nerf.py:496-528). Background fields are unmasked."""
        if self.category == "bg" or "aabb" not in samples_dict:
            return None
        from lab4d_tpu.utils.geom import check_inside_aabb
        from lab4d_tpu.utils.quat import (
            dual_quaternion_to_quaternion_translation,
        )

        aabb = extend_aabb(samples_dict["aabb"])
        valid = check_inside_aabb(xyz, aabb)
        if "t_articulation" in samples_dict:
            t_bones = dual_quaternion_to_quaternion_translation(
                samples_dict["t_articulation"]
            )[1][0]
            t_aabb = jnp.stack([t_bones.min(0), t_bones.max(0)], 0)
            t_aabb = extend_aabb(t_aabb, factor=1.0)
            valid = valid & check_inside_aabb(xyz_t, t_aabb)
        return valid.astype(xyz.dtype)

    def importance_sampling(
        self, hxy, Kinv, near_far, field2cam, frame_id, inst_id, samples_dict,
        n_depth: int = 64, sched=None,
    ):
        """Two-pass coarse-to-fine depth sampling for rendering
        (nerf.py:686-738); deterministic inverse-CDF (det), no grad."""
        xyz_cam, dir_cam, deltas, depth = sample_cam_rays(
            hxy, Kinv, near_far, perturb=False, n_depth=n_depth // 2
        )
        xyz = self.backward_warp(
            xyz_cam, dir_cam, field2cam, frame_id, inst_id, samples_dict
        )["xyz"]
        density = self.forward(
            xyz, frame_id=frame_id, inst_id=inst_id, sched=sched,
            fused=False,  # eval-only pass; keep the graph fusible
        )
        weights, _ = compute_weights(density, deltas)

        depth_mid = 0.5 * (depth[:, :, :-1] + depth[:, :, 1:])
        R = depth.shape[0] * depth.shape[1]
        depth_mid2 = depth_mid.reshape(R, n_depth // 2 - 1)
        weights2 = weights.reshape(R, n_depth // 2)
        depth_fine = sample_pdf(depth_mid2, weights2[:, 1:-1], n_depth // 2, det=True)
        depth_fine = jax.lax.stop_gradient(depth_fine).reshape(depth.shape)
        depth_all = jnp.sort(jnp.concatenate([depth, depth_fine], axis=2), axis=2)
        return sample_cam_rays(hxy, Kinv, near_far, depth=depth_all, perturb=False)

    def query_nerf(self, xyz, dir, frame_id, inst_id, sched=None, train=True,
                   fused=None):
        """Dense field evaluation; the valid-idx sparsification of the
        reference (nerf.py:769-819) is intentionally dropped — masked dense
        compute is faster on TPU than gather/scatter compaction.

        Points are flattened to (M, N*D, 3) for the MLP chain: keeping the
        per-point tensors 2-D-ish avoids XLA relayout copies between the
        embeddings and the fused kernels (profiled at ~14 ms/step on the
        4-D layout)."""
        lead = xyz.shape[:-1]
        M = xyz.shape[0]
        xyz_f = xyz.reshape(M, -1, 3)
        dir_f = dir.reshape(M, -1, 3) if dir is not None else None
        rgb, density = self.forward(
            xyz_f, dir=dir_f, frame_id=frame_id, inst_id=inst_id, sched=sched,
            train=train, fused=fused,
        )
        rgb = rgb.reshape(lead + rgb.shape[-1:])
        density = density.reshape(lead + density.shape[-1:])
        return {"rgb": rgb, "density": density, f"density_{self.category}": density}

    # -------------------------------------------------------------- warping

    @staticmethod
    def cam_to_field(xyz_cam, dir_cam, field2cam):
        """Rays from camera SE(3) to object SE(3) (nerf.py:821-844)."""
        cam2field = quaternion_translation_inverse(field2cam[0], field2cam[1])
        q = cam2field[0][:, None, None]
        t = cam2field[1][:, None, None]
        xyz = apply_se3mat((q, t), xyz_cam)
        dir = apply_se3mat((q, jnp.zeros_like(t)), dir_cam)
        return xyz, dir

    @staticmethod
    def field_to_cam(xyz, field2cam):
        q = field2cam[0][:, None, None]
        t = field2cam[1][:, None, None]
        return apply_se3mat((q, t), xyz)

    def backward_warp(
        self, xyz_cam, dir_cam, field2cam, frame_id, inst_id, samples_dict=None
    ):
        xyz, dir = self.cam_to_field(xyz_cam, dir_cam, field2cam)
        return {"xyz": xyz, "dir": dir, "xyz_t": xyz}

    def prepare_forward_warp(self, xyz, inst_id, samples_dict):
        """Hook: subclasses may precompute forward-warp state shared by the
        flow and cycle paths (no-op for rigid fields)."""
        return samples_dict

    def forward_warp(self, xyz, field2cam, frame_id, inst_id, samples_dict=None):
        return self.field_to_cam(xyz, field2cam)

    # ------------------------------------------------------------- sub-terms

    def compute_flow(
        self, hxy, xyz, frame_id, inst_id, field2cam, Kinv, samples_dict,
        flow_thresh=None,
    ):
        """Flow proposal: re-articulate canonical points into the *paired*
        frame's camera and project (nerf.py:948-997)."""
        frame_id_next = flip_pair(frame_id)
        field2cam_next = (flip_pair(field2cam[0]), flip_pair(field2cam[1]))
        Kinv_next = flip_pair(Kinv)
        samples_dict_next = flip_pair(
            {k: v for k, v in samples_dict.items() if k in
             ("t_articulation", "rest_articulation")}
        )
        if "fwd_skin" in samples_dict:
            # skin weights live at the (unflipped) canonical points and are
            # computed from the rest articulation + mean time embedding,
            # which are identical within a pair — valid for the flipped
            # target frame without reordering
            samples_dict_next["fwd_skin"] = samples_dict["fwd_skin"]

        xyz_cam_next = self.forward_warp(
            xyz, field2cam_next, frame_id_next, inst_id,
            samples_dict=samples_dict_next,
        )
        Kmat_next = Kmatinv(Kinv_next)
        hxy_next = pinhole_projection(Kmat_next, xyz_cam_next)

        flow = (hxy_next - hxy[:, :, None])[..., :2]
        xyz_valid = xyz_cam_next[..., -1:] > 1e-6
        if flow_thresh is not None:
            mag = jnp.linalg.norm(flow, axis=-1, keepdims=True)
            xyz_valid = xyz_valid & (mag < float(flow_thresh))
        flow = jnp.concatenate([flow, xyz_valid.astype(flow.dtype)], axis=-1)
        return {"flow": flow}

    def cycle_loss(self, xyz, xyz_t, frame_id, inst_id, samples_dict=None, train=True):
        zeros = jnp.zeros_like(xyz[..., :1])
        return {"cyc_dist": zeros, "delta_skin": zeros, "skin_entropy": zeros}

    def compute_flow_cycle(
        self, hxy, xyz, xyz_t, frame_id, inst_id, field2cam, Kinv,
        samples_dict, flow_thresh=None,
    ):
        """Training-time flow proposal + cycle loss. The base implementation
        just runs the two sub-terms; Deformable overrides it to share one
        stacked blend-skinning pass between them (they warp the same
        canonical points with the same skin weights)."""
        flow_dict = self.compute_flow(
            hxy, xyz, frame_id, inst_id, field2cam, Kinv, samples_dict,
            flow_thresh=flow_thresh,
        )
        cyc_dict = self.cycle_loss(
            xyz, xyz_t, frame_id, inst_id, samples_dict=samples_dict,
            train=True,
        )
        return flow_dict, cyc_dict

    def compute_eikonal(self, xyz, inst_id=None, sample_ratio=16, sched=None):
        """Subsampled eikonal loss in canonical space (nerf.py:416-453).

        Static-size random ray gather -> grad of pointwise SDF. With
        eikonal_dense the values are scattered back into dense zeros (the
        reference layout); otherwise the compact (S, D, 1) tensor is
        returned — render_pixel mean-reduces the trailing axes and the
        nonzero-mean loss reducer divides by the same S sampled rays
        either way, so the loss value is unchanged.
        """
        M, N, Dd, _ = xyz.shape
        sample_size = max(1, (M * N) // sample_ratio)
        xyz_flat = xyz.reshape(M * N, Dd, 3)
        if inst_id is not None:
            inst_flat = jnp.broadcast_to(inst_id[:, None], (M, N)).reshape(-1)
        else:
            inst_flat = None

        rng = self.make_rng("aux")
        idx = jax.random.choice(rng, M * N, (sample_size,), replace=False)
        xyz_s = jax.lax.stop_gradient(xyz_flat[idx])
        inst_s = None if inst_flat is None else inst_flat[idx]

        def sdf_sum(pts):
            return self.forward(
                pts, inst_id=inst_s, get_density=False, sched=sched,
                fused=False,  # double-backward path
            ).sum()

        g = jax.grad(sdf_sum)(xyz_s)  # (S, D, 3)
        from lab4d_tpu.utils.geom import safe_norm

        eik = (safe_norm(g, keepdims=False) - 1.0) ** 2  # (S, D)
        if self.eikonal_dense:
            out = jnp.zeros((M * N, Dd)).at[idx].set(eik)
            return out.reshape(M, N, Dd, 1)
        return eik[..., None]  # (S, D, 1)

    def compute_normal(
        self, xyz_cam, dir_cam, field2cam, frame_id, inst_id, samples_dict,
        sched=None,
    ):
        """Eikonal + normals in camera space for rendering (nerf.py:455-493)."""

        def sdf_sum(pts_cam):
            xyz = self.backward_warp(
                pts_cam, dir_cam, field2cam, frame_id, inst_id, samples_dict
            )["xyz"]
            # jnp twin, not the fused kernel: only the input grad is needed
            # here, but the pallas VJP always accumulates weight grads too
            # (small bwd tiles + accumulators) — measured 89 ms vs 20 ms
            # per 8k-ray eval chunk on v5e
            return self.forward(
                xyz, inst_id=inst_id, get_density=False, sched=sched,
                fused=False,
            ).sum()

        g = jax.grad(sdf_sum)(xyz_cam)
        from lab4d_tpu.utils.geom import safe_norm

        gnorm = safe_norm(g)
        eikonal = (gnorm - 1.0) ** 2
        normal = g / jnp.maximum(gnorm, 1e-6)
        normal = normal * jnp.asarray([1.0, -1.0, -1.0])  # ECON convention
        return eikonal, normal

    def compute_jacobian(
        self, xyz, xyz_cam, dir_cam, field2cam, frame_id, inst_id, samples_dict,
        sched=None, train=True,
    ):
        if train:
            return {"eikonal": self.compute_eikonal(xyz, inst_id=inst_id, sched=sched)}
        eik, normal = self.compute_normal(
            xyz_cam, dir_cam, field2cam, frame_id, inst_id, samples_dict, sched
        )
        return {"eikonal": eik, "normal": normal}

    # ------------------------------------------------------------ reg losses

    def sample_points_aabb(self, rng, aabb, nsample: int, extend_factor=1.0):
        aabb = extend_aabb(aabb, factor=extend_factor)
        u = jax.random.uniform(rng, (nsample, 3))
        return aabb[0] + u * (aabb[1] - aabb[0])

    def visibility_decay_loss(self, aabb, nsample: int = 512):
        """Push visibility down at random points (nerf.py:397-414)."""
        r1, r2 = jax.random.split(self.make_rng("aux"))
        pts = self.sample_points_aabb(r1, aabb, nsample)
        inst_id = jax.random.randint(r2, (nsample,), 0, self.num_inst)
        vis = self.vis_mlp(pts, inst_id=inst_id)
        return -jax.nn.log_sigmoid(-vis).mean()

    def cam_prior_loss(self):
        return self.camera_mlp.compute_distance_to_prior()

    def gauss_skin_consistency_loss(self, aabb, sched=None):
        return jnp.zeros(())

    def soft_deform_loss(self, aabb, sched=None):
        return jnp.zeros(())

    def skel_prior_loss(self):
        return jnp.zeros(())
