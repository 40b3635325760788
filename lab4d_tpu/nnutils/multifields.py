"""Container of neural fields with depth-composition (flax).

Parity: lab4d/nnutils/multifields.py. Field dict structure is static per
config ("fg", "bg", or both for "comp"), so all branching resolves at
trace time.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from lab4d_tpu.nnutils.deformable import Deformable
from lab4d_tpu.nnutils.embedding import FrameInfo
from lab4d_tpu.nnutils.nerf import NeRF
from lab4d_tpu.utils.quat import quaternion_translation_to_se3


class MultiFields(nn.Module):
    """Dict-of-fields container ("fg" -> Deformable, "bg" -> NeRF).

    Args follow reference multifields.py:31-99: fg uses no directional
    encoding, appearance codes, init_scale=0.2; bg uses num_freq_xyz=6,
    no appearance, init_scale=0.1.
    """

    frame_info: FrameInfo = None
    field_type: str = "fg"  # "fg" | "bg" | "comp"
    fg_motion: str = "rigid"
    num_inst: int = 1
    # camera priors per category, field units NOT yet applied
    rtmat_fg: np.ndarray = None  # (M,4,4)
    rtmat_bg: np.ndarray = None
    joint_angles_init: Optional[np.ndarray] = None

    def setup(self):
        fields = {}
        if self.field_type in ("fg", "comp"):
            rtmat = np.array(self.rtmat_fg)
            rtmat[..., :3, 3] *= 0.2  # init_scale, nerf.py:151
            fields["fg"] = Deformable(
                category="fg",
                fg_motion=self.fg_motion,
                frame_info=self.frame_info,
                rtmat_init=rtmat,
                num_inst=self.num_inst,
                # reference fg Deformable keeps the NeRF defaults D=5 W=128
                # (multifields.py:77-84, nerf.py:65-66)
                D=5,
                W=128,
                num_freq_dir=-1,
                appr_channels=32,
                init_scale=0.2,
                joint_angles_init=self.joint_angles_init,
                # comp packs fg+bg along one sample axis, so the eikonal
                # channel must stay at dense (M,N,D,1) sample resolution
                eikonal_dense=self.field_type == "comp",
            )
        if self.field_type in ("bg", "comp"):
            rtmat = np.array(self.rtmat_bg)
            rtmat[..., :3, 3] *= 0.1
            fields["bg"] = NeRF(
                category="bg",
                frame_info=self.frame_info,
                rtmat_init=rtmat,
                num_inst=1,
                D=5,
                W=128,
                num_freq_xyz=6,
                num_freq_dir=0,
                appr_channels=0,
                init_scale=0.1,
                eikonal_dense=self.field_type == "comp",
            )
        self.field_params = fields

    @property
    def categories(self):
        if self.field_type == "comp":
            return ("fg", "bg")
        return (self.field_type,)

    # ------------------------------------------------------------- sampling

    def get_samples(self, Kinv, batch, train: bool = True):
        """Per-field time-dependent camera/articulation params
        (multifields.py:286-307)."""
        samples_dict = {}
        for cate in self.categories:
            batch_sub = dict(batch)
            if "field2cam" in batch:
                batch_sub["field2cam"] = batch["field2cam"][cate]
            if "geo" in batch:
                geo = batch["geo"][cate]
                batch_sub.update(geo)
                batch_sub.pop("geo", None)
            samples_dict[cate] = self.field_params[cate].get_samples(
                Kinv, batch_sub, train=train
            )
        return samples_dict

    def query_multifields(self, samples_dict, sched=None, train=True, flow_thresh=None):
        multifields_dict, deltas_dict, aux_dict = {}, {}, {}
        for cate in self.categories:
            (
                multifields_dict[cate],
                deltas_dict[cate],
                aux_dict[cate],
            ) = self.field_params[cate].query_field(
                samples_dict[cate], sched=sched, train=train,
                flow_thresh=flow_thresh,
            )
            if train:
                # no training loss consumes the integrated xyz/xyz_cam
                # channels (they exist for eval readouts); leaving them in
                # rides 6 dead sample-resolution channels through the
                # packed integrate einsum, its backward split and the
                # layout copies around them (~1 ms/step on v5e).
                # DIVERGENCE from the reference: its trainer keeps
                # rendered["xyz"]/["xyz_cam"] at train time only to feed
                # trainer.visualize_matches (ref trainer.py:408-410) — a
                # debug visualization this repo doesn't have. A port of
                # that feature must re-enable these channels here.
                multifields_dict[cate].pop("xyz", None)
                multifields_dict[cate].pop("xyz_cam", None)
        return multifields_dict, deltas_dict, aux_dict

    @staticmethod
    def compose_fields(multifields_dict, deltas_dict):
        """Concat fields along the sample dim and depth-sort
        (multifields.py:339-398). Static-shape: the sort permutation is a
        dense argsort over sum(D) samples."""
        cates = list(multifields_dict.keys())
        all_keys = sorted({k for d in multifields_dict.values() for k in d})

        field_dict = {}
        for k in all_keys:
            vals = []
            ref = next(d[k] for d in multifields_dict.values() if k in d)
            for cate in cates:
                v = multifields_dict[cate].get(k)
                vals.append(jnp.zeros_like(ref) if v is None else v)
            field_dict[k] = jnp.concatenate(vals, axis=2)
        deltas = jnp.concatenate([deltas_dict[c] for c in cates], axis=2)

        if len(cates) > 1:
            # depth-sort every channel at once with one permutation
            # matmul (permutation_gather — batched multi-channel
            # take_along_axis is a TPU slow path)
            from lab4d_tpu.ops.renderer import permutation_gather

            order = jnp.argsort(field_dict["depth"][..., 0], axis=-1)
            keys = list(field_dict.keys())
            widths = [field_dict[k].shape[-1] for k in keys]
            packed = jnp.concatenate(
                [field_dict[k] for k in keys] + [deltas], axis=-1
            )
            packed = permutation_gather(order, packed)
            off = 0
            for k, w in zip(keys, widths):
                field_dict[k] = packed[..., off : off + w]
                off += w
            deltas = packed[..., off:]
        return field_dict, deltas

    # ------------------------------------------------------------- reg terms

    def visibility_decay_loss(self, aabbs):
        loss = 0.0
        for cate in self.categories:
            loss = loss + self.field_params[cate].visibility_decay_loss(aabbs[cate])
        return loss

    def gauss_skin_consistency_loss(self, aabbs, sched=None):
        loss = jnp.zeros(())
        for cate in self.categories:
            loss = loss + self.field_params[cate].gauss_skin_consistency_loss(
                aabbs[cate], sched=sched
            )
        return loss

    def soft_deform_loss(self, aabbs, sched=None):
        loss = jnp.zeros(())
        for cate in self.categories:
            loss = loss + self.field_params[cate].soft_deform_loss(
                aabbs[cate], sched=sched
            )
        return loss

    def cam_prior_loss(self):
        loss = 0.0
        for cate in self.categories:
            loss = loss + self.field_params[cate].cam_prior_loss()
        return loss

    def skel_prior_loss(self):
        loss = jnp.zeros(())
        for cate in self.categories:
            loss = loss + self.field_params[cate].skel_prior_loss()
        return loss

    # ---------------------------------------------------------------- misc

    def get_cameras(self, frame_id=None):
        """World-unit cameras per field (multifields.py:400-411)."""
        field2cam = {}
        for cate in self.categories:
            field = self.field_params[cate]
            quat, trans = field.camera_mlp.get_vals(frame_id)
            trans = trans / jnp.exp(field.logscale)
            field2cam[cate] = quaternion_translation_to_se3(quat, trans)
        return field2cam

    def get_aabb_scaled(self, aabbs):
        """aabb in world units per field (multifields.py:413-422)."""
        out = {}
        for cate in self.categories:
            out[cate] = aabbs[cate] / jnp.exp(self.field_params[cate].logscale)
        return out

    def get_logscales(self):
        return {
            cate: jnp.exp(self.field_params[cate].logscale)
            for cate in self.categories
        }
