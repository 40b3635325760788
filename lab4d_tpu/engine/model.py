"""Top-level DVR model (flax): fields container + intrinsics, forward pass
and loss assembly.

Parity: lab4d/engine/model.py (dvr_model). The forward is a pure function
of (params, batch, sched, rngs); geometry state (aabb / near-far / proxy
corners) is carried in batch["geo"], maintained host-side by the Trainer.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from lab4d_tpu.nnutils.embedding import FrameInfo
from lab4d_tpu.nnutils.intrinsics import IntrinsicsMLP
from lab4d_tpu.nnutils.multifields import MultiFields
from lab4d_tpu.ops.renderer import render_pixel
from lab4d_tpu.utils.geom import K2inv, K2mat
from lab4d_tpu.utils.loss import nonzero_mean


def _safe_norm(d, eps=1e-12):
    """L2 norm over the last axis with a subgradient-safe epsilon (torch
    .norm in the reference has the same nan-at-zero hazard; masked pixels
    can hit exact zeros here)."""
    return jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True) + eps)

# reconstruction loss weights read from config (flag name -> key)
_LOSS_WEIGHT_KEYS = [
    "mask_wt", "rgb_wt", "depth_wt", "flow_wt", "vis_wt", "feature_wt",
    "feat_reproj_wt", "reg_visibility_wt", "reg_eikonal_wt",
    "reg_deform_cyc_wt", "reg_delta_skin_wt", "reg_skin_entropy_wt",
    "reg_gauss_skin_wt", "reg_cam_prior_wt", "reg_skel_prior_wt",
    "reg_gauss_mask_wt", "reg_soft_deform_wt",
]


class DVRModel(nn.Module):
    """Differentiable volume rendering model over one or two neural fields."""

    frame_info: FrameInfo = None
    field_type: str = "fg"
    fg_motion: str = "rigid"
    num_inst: int = 1
    train_res: int = 256
    intrinsics_init: np.ndarray = None  # (M,4)
    rtmat_fg: np.ndarray = None
    rtmat_bg: np.ndarray = None
    joint_angles_init: Optional[np.ndarray] = None
    loss_weights: tuple = ()  # tuple of (name, value) from config

    def setup(self):
        self.fields = MultiFields(
            frame_info=self.frame_info,
            field_type=self.field_type,
            fg_motion=self.fg_motion,
            num_inst=self.num_inst,
            rtmat_fg=self.rtmat_fg,
            rtmat_bg=self.rtmat_bg,
            joint_angles_init=self.joint_angles_init,
        )
        self.intrinsics = IntrinsicsMLP(
            frame_info=self.frame_info,
            intrinsics_init=self.intrinsics_init,
            num_freq_t=0,
        )

    # --------------------------------------------------------------- helpers

    def process_frameid(self, batch):
        offset = jnp.asarray(self.frame_info.frame_offset_raw)
        batch["frameid"] = batch["frameid_sub"] + offset[batch["dataid"]]
        return batch

    @staticmethod
    def reshape_batch(batch):
        """Merge the (M, 2, ...) pair dim into the batch dim -> (2M, ...)."""
        out = {}
        for k, v in batch.items():
            if isinstance(v, dict):
                out[k] = DVRModel.reshape_batch(v)
            elif hasattr(v, "ndim") and v.ndim >= 2:
                out[k] = v.reshape((-1,) + v.shape[2:])
            else:
                out[k] = v
        return out

    # --------------------------------------------------------------- forward

    def __call__(self, batch, sched, train: bool = True):
        """Training forward: returns the loss dict (model.py:52-75)."""
        config = dict(self.loss_weights)
        batch = dict(batch)
        geo = batch.pop("geo")
        batch = self.process_frameid(batch)
        batch = self.reshape_batch(batch)
        batch["geo"] = geo
        results = self.render(
            batch, sched=sched, train=train, flow_thresh=self.train_res
        )
        return self.compute_loss(batch, results, config, sched)

    def render(self, batch, sched=None, train: bool = True, flow_thresh=None):
        samples_dict = self.get_samples(batch, train=train)
        return self.render_samples(
            samples_dict, sched=sched, train=train, flow_thresh=flow_thresh
        )

    def render_samples(
        self, samples_dict, sched=None, train: bool = True, flow_thresh=None
    ):
        multifields_dict, deltas_dict, aux_dict = self.fields.query_multifields(
            samples_dict, sched=sched, train=train, flow_thresh=flow_thresh
        )
        field_dict, deltas = self.fields.compose_fields(
            multifields_dict, deltas_dict
        )
        rendered = render_pixel(field_dict, deltas)
        if len(multifields_dict) == 1:
            # single field: composition is identity, the per-category
            # render would recompute the exact same integration
            aux_dict[next(iter(multifields_dict))].update(rendered)
        else:
            for cate in multifields_dict:
                rendered_cate = render_pixel(
                    multifields_dict[cate], deltas_dict[cate]
                )
                aux_dict[cate].update(rendered_cate)

        if "fg" in aux_dict and "xyz_matches" in aux_dict["fg"]:
            rendered["xyz_matches"] = aux_dict["fg"]["xyz_matches"]
            rendered["xyz_reproj"] = aux_dict["fg"]["xyz_reproj"]
        return {"rendered": rendered, "aux_dict": aux_dict}

    def get_samples(self, batch, train: bool = True):
        if "Kinv" in batch:
            Kinv = batch["Kinv"]
        else:
            Kmat = self.intrinsics.get_vals(batch["frameid"])
            Kinv = K2inv(Kmat) @ K2mat(batch["crop2raw"])
        return self.fields.get_samples(Kinv, batch, train=train)

    # ---------------------------------------------------------------- losses

    @staticmethod
    def get_mask_balance_wt(mask, vis2d, is_detected):
        """Balance positive/negative mask pixels (model.py:401-422)."""
        mask = mask.astype(jnp.float32)
        vis2d = vis2d.astype(jnp.float32) * is_detected.astype(jnp.float32)[
            :, None, None
        ]
        in_vis = vis2d > 0
        pos = jnp.sum(mask * in_vis)
        neg = jnp.sum((1 - mask) * in_vis)
        total = jnp.sum(vis2d)
        pos_wt = total / jnp.maximum(pos, 1e-6)
        neg_wt = total / jnp.maximum(neg, 1e-6)
        balanced = 0.5 * pos_wt * mask + 0.5 * neg_wt * (1 - mask)
        usable = (pos > 0) & (neg > 0)
        return jnp.where(usable, balanced, jnp.ones_like(balanced))

    def compute_loss(self, batch, results, config, sched):
        loss_dict = {}
        self._recon_loss(loss_dict, results, batch, config)
        self._mask_losses(loss_dict, batch, config)
        self._reg_loss(loss_dict, results, batch, sched)
        return self._apply_loss_weights(loss_dict, config, sched)

    def _recon_loss(self, loss_dict, results, batch, config):
        """model.py:424-501."""
        rendered = results["rendered"]
        aux_dict = results["aux_dict"]
        ft = self.field_type

        if ft == "fg":
            rendered_fg_mask = rendered["mask"]
        elif ft == "comp":
            rendered_fg_mask = rendered["mask_fg"]
        else:
            rendered_fg_mask = None

        mask_balance_wt = self.get_mask_balance_wt(
            batch["mask"], batch["vis2d"], batch["is_detected"]
        )
        gt_mask = batch["mask"].astype(jnp.float32)
        if ft == "bg":
            loss_dict["mask"] = (rendered["mask"] - 1.0) ** 2
        elif ft == "fg":
            loss_dict["mask"] = (rendered_fg_mask - gt_mask) ** 2 * mask_balance_wt
        elif ft == "comp":
            loss_dict["mask"] = (
                (rendered_fg_mask - gt_mask) ** 2 * mask_balance_wt
                + (rendered["mask"] - 1.0) ** 2
            )

        if ft in ("fg", "comp") and "feature" in aux_dict["fg"]:
            loss_dict["feature"] = _safe_norm(
                aux_dict["fg"]["feature"] - batch["feature"]
            )
        if ft in ("fg", "comp") and "xy_reproj" in aux_dict["fg"]:
            loss_dict["feat_reproj"] = _safe_norm(
                aux_dict["fg"]["xy_reproj"] - batch["hxy"][..., :2]
            )

        loss_dict["rgb"] = (rendered["rgb"] - batch["rgb"]) ** 2
        loss_dict["depth"] = _safe_norm(rendered["depth"] - batch["depth"])
        if "flow" in rendered:
            loss_dict["flow"] = _safe_norm(rendered["flow"] - batch["flow"])
            loss_dict["flow"] = loss_dict["flow"] * (
                batch["flow_uct"] > 0
            ).astype(jnp.float32)

        # visibility, bg down-weighted 100x
        vis_loss = 0.0
        for cate in aux_dict:
            v = aux_dict[cate]["vis"]
            if cate == "bg":
                v = v * 0.01
            vis_loss = vis_loss + v
        loss_dict["vis"] = vis_loss

        if "gauss_mask" in aux_dict.get("fg", {}):
            loss_dict["reg_gauss_mask"] = (
                aux_dict["fg"]["gauss_mask"]
                - jax.lax.stop_gradient(rendered_fg_mask)
            ) ** 2

    def _reg_loss(self, loss_dict, results, batch, sched):
        """model.py:503-526."""
        rendered = results["rendered"]
        aux_dict = results["aux_dict"]
        aabbs = {cate: batch["geo"][cate]["aabb"] for cate in batch["geo"]}
        loss_dict["reg_visibility"] = self.fields.visibility_decay_loss(aabbs)
        loss_dict["reg_eikonal"] = rendered["eikonal"]
        if "fg" in aux_dict:
            loss_dict["reg_deform_cyc"] = aux_dict["fg"]["cyc_dist"]
            if "delta_skin" in aux_dict["fg"]:
                loss_dict["reg_delta_skin"] = aux_dict["fg"]["delta_skin"]
            loss_dict["reg_skin_entropy"] = aux_dict["fg"]["skin_entropy"]
        loss_dict["reg_soft_deform"] = self.fields.soft_deform_loss(
            aabbs, sched=sched
        )
        loss_dict["reg_gauss_skin"] = self.fields.gauss_skin_consistency_loss(
            aabbs, sched=sched
        )
        loss_dict["reg_cam_prior"] = self.fields.cam_prior_loss()
        loss_dict["reg_skel_prior"] = self.fields.skel_prior_loss()

    def _mask_losses(self, loss_dict, batch, config):
        """Apply segmentation masks on dense losses (model.py:528-582)."""
        keys_ignore_masking = ["reg_gauss_mask"]
        keys_allpix = ["mask"]
        keys_fg = ["feature", "feat_reproj"]
        keys_type_specific = ["rgb", "depth", "flow", "vis"]

        vis2d = batch["vis2d"].astype(jnp.float32)
        maskfg = batch["mask"].astype(jnp.float32)
        if self.field_type == "bg":
            mask = (1 - maskfg) * vis2d
        elif self.field_type == "fg":
            mask = maskfg * vis2d
        else:
            mask = vis2d

        for k, v in loss_dict.items():
            if k.startswith("reg_") and k not in keys_ignore_masking:
                continue
            if k in keys_ignore_masking:
                continue
            elif k in keys_allpix:
                loss_dict[k] = v * vis2d
            elif k in keys_fg:
                loss_dict[k] = v * maskfg
            elif k in keys_type_specific:
                loss_dict[k] = v * mask
            else:
                raise ValueError(f"loss {k} not defined")

        is_det = batch["is_detected"].astype(jnp.float32)[:, None, None]
        for k in ("mask", "feature", "feat_reproj"):
            if k in loss_dict:
                loss_dict[k] = loss_dict[k] * is_det

    def _apply_loss_weights(self, loss_dict, config, sched):
        """Nonzero-mean reduce + apply (scheduled) weights
        (model.py:584-611)."""
        px_unit_keys = ("flow", "feat_reproj")
        sched_factors = {
            "reg_cam_prior": sched["reg_cam_prior_factor"],
            "reg_eikonal": sched["reg_eikonal_factor"],
            "reg_skel_prior": sched["reg_skel_prior_factor"],
            "reg_gauss_mask": sched["reg_gauss_mask_factor"],
        }
        out = {}
        for k, v in loss_dict.items():
            v = nonzero_mean(v)
            if k in px_unit_keys:
                v = v / self.train_res
            wt_name = k + "_wt"
            if wt_name in config:
                v = v * config[wt_name]
            if k in sched_factors:
                v = v * sched_factors[k]
            out[k] = v
        return out

    # ------------------------------------------------------------ eval entry

    def evaluate_chunk(self, batch, sched=None):
        """Render a chunk of rays for evaluation (no losses)."""
        samples_dict = self.prepare_eval_samples(batch)
        return self.evaluate_rays(samples_dict, sched=sched)

    def prepare_eval_samples(self, batch):
        """Per-frame half of eval: frameid resolve, camera/intrinsics MLPs,
        FK articulations, near-far from proxy corners. All outputs are
        small per-frame tensors, so callers can run this ONCE per frame and
        stream ray chunks through evaluate_rays — the camera/FK chain is
        ~7 ms of tiny-op overhead per jit call on v5e, pure waste when
        repeated for every chunk of the same frame."""
        batch = dict(batch)
        geo = batch.pop("geo")
        batch = self.process_frameid(batch)
        batch["geo"] = geo
        return self.get_samples(batch, train=False)

    def evaluate_rays(self, samples_dict, sched=None):
        """Per-chunk half of eval: render the rays in samples_dict[cate]
        ["hxy"] (set by the caller per chunk) against prepared samples.

        Every non-mask channel is blended with the rendered mask
        (render * mask + 0 * (1-mask)) exactly like the reference's
        evaluate (ref model.py:201-206) — without it, low-opacity pixels
        report the weight-NORMALIZED channel value (integrate divides by
        the ray's total mass) instead of the black-composited one, and
        eval PSNR/depth read ~unattenuated field values (measured 4 dB
        init-PSNR discrepancy vs the reference on the synthetic scene)."""
        results = self.render_samples(samples_dict, sched=sched, train=False)
        rendered = results["rendered"]
        mask = rendered.get("mask")
        if mask is not None:

            def blend(v):
                # some channels are (M,N) not (M,N,C) (e.g. eikonal mean)
                m = mask if v.ndim == mask.ndim else mask[..., 0]
                return v * m

            rendered = {
                k: v if "mask" in k else blend(v)
                for k, v in rendered.items()
            }
        return rendered
