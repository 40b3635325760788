"""Feature-rendering NeRF with global matching (flax).

Parity: lab4d/nnutils/feature.py. The canonical feature field enables a
soft-argmax global match between pixel DINO features and canonical points,
reprojected for the feat_reproj loss.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from lab4d_tpu.nnutils.base import BaseMLP
from lab4d_tpu.nnutils.embedding import PosEmbedding
from lab4d_tpu.nnutils.nerf import NeRF
from lab4d_tpu.utils.geom import Kmatinv, pinhole_projection


class FeatureNeRF(NeRF):
    """NeRF + 16-channel normalized canonical feature field."""

    def setup(self):
        super().setup()
        self.feat_pos_embedding = PosEmbedding(3, 6)
        self.feature_field = BaseMLP(
            D=5, W=128, out_channels=self.feature_channels, skips=(4,)
        )
        self.logsigma = self.param("logsigma", nn.initializers.zeros, (1,))

    def query_all_heads(self, xyz, dir, frame_id, inst_id, sched, train):
        """Single-pass field evaluation through the multi-head Pallas
        kernel (ops/field_kernel.py): sdf/rgb/vis/feature from one tile
        sweep. Applies on the training path of single-instance fg fields
        (constant codes fold into biases; the appearance code is the only
        per-pair conditioning and rides the kernel's per-tile row)."""
        from lab4d_tpu.nnutils.base import _fused_enabled

        if not train:
            # measured on v5e (skel-quad eval, 256^2, chunk 2048): all-XLA
            # eval renders at 308 ms/frame vs 685 ms through the kernel —
            # the pallas call is a fusion boundary that forces the warp/
            # normal-gradient consumers around it to materialize their
            # operands in HBM. Training keeps the kernel (it wins there:
            # the backward's weight-grad accumulation amortizes it)
            return None
        if not self.field_kernel_ok(xyz):
            return None
        from lab4d_tpu.ops.field_kernel import (
            MAX_TILE, _pick_tile, fused_nerf_heads,
        )

        M, N, D = xyz.shape[:3]
        spp = N * D
        if _pick_tile(spp, MAX_TILE) is None:
            return None

        x2 = xyz.reshape(-1, 3)
        nets, cfg, appr, win_b, win_c, ibeta = self.pack_field_nets(
            x2, frame_id, inst_id, sched, train, M
        )
        density, rgb, vis, feature = fused_nerf_heads(
            x2, None, appr, win_b, win_c, nets, ibeta, cfg, spp
        )

        # the kernel emits final quantities: VolSDF density, sigmoid rgb,
        # L2-normalized features — as separate (P, C) outputs, so these
        # reshapes are free bitcasts
        lead = xyz.shape[:-1]
        density = density.reshape(lead + (1,))
        rgb = rgb.reshape(lead + (3,))
        vis = vis.reshape(lead + (1,))
        feature = feature.reshape(lead + (self.feature_channels,))
        out = {
            "rgb": rgb,
            "density": density,
            f"density_{self.category}": density,
            "vis": vis,
            "feature": feature,
        }
        return out

    def field_kernel_ok(self, xyz) -> bool:
        """Static eligibility of the multi-head field kernel: fused MLPs
        on, single instance (codes fold into biases), appearance rows as
        the only per-pair conditioning, no direction PE, sigmoid rgb, a
        shared frequency ladder across the xyz embeddings."""
        from lab4d_tpu.nnutils.base import _fused_enabled

        if not (
            _fused_enabled()
            and self.num_inst == 1
            and self.appr_channels > 0
            and self.num_freq_dir == -1
            and self.color_act  # sigmoid is baked into the kernel
            and xyz.ndim == 4
        ):
            return False
        # all xyz embeddings must share one frequency ladder (prefixes of
        # the color bands)
        fb_c = self.pos_embedding_color.freq_bands
        for pe in (self.pos_embedding, self.vis_mlp.pos_embedding,
                   self.feat_pos_embedding):
            n = pe.n_freqs
            if n <= 0 or n > len(fb_c) or not np.allclose(
                pe.freq_bands, fb_c[:n]
            ):
                return False
        return True

    def pack_field_nets(self, x2, frame_id, inst_id, sched, train, M):
        """Assemble (nets, cfg, appr_rows, win_b, win_c, ibeta) for the
        field megakernel: const-folded weight/bias lists per head plus the
        static FieldCfg (caller must have checked field_kernel_ok)."""
        from lab4d_tpu.ops.field_kernel import FieldCfg

        alpha = None if sched is None else sched.get("alpha")
        beta_prob = None if sched is None else sched.get("beta_prob")
        fb_c = self.pos_embedding_color.freq_bands

        def params_of(cond_mlp, pe, use_alpha=True):
            return cond_mlp(
                x2, inst_id, beta_prob=beta_prob, train=train,
                pe_spec=pe.pe_spec(alpha if use_alpha else None),
                return_params=True,
            )

        base_w, base_b = params_of(self.basefield, self.pos_embedding)
        color_w, color_b = params_of(self.colorfield, self.pos_embedding_color)
        vis_w, vis_b = params_of(
            self.vis_mlp.basefield, self.vis_mlp.pos_embedding, use_alpha=False
        )
        feat_w, feat_b = self.feature_field(
            x2, pe_spec=self.feat_pos_embedding.pe_spec(None),
            return_params=True,
        )

        # declare + fetch the head params (dummy rows keep init consistent)
        _ = self.sdf_head(jnp.zeros((1, self.W)))
        _ = self.rgb_head[0](jnp.zeros((1, self.W + self.appr_channels)))
        _ = self.rgb_head[1](jnp.zeros((1, self.W // 2)))
        sdf_p = self.sdf_head.variables["params"]
        r1_p = self.rgb_head[0].variables["params"]
        r2_p = self.rgb_head[1].variables["params"]

        def interleave(ws, bs):
            out = []
            for w, b in zip(ws, bs):
                out += [w, b.reshape(1, -1)]
            return out

        nets = dict(
            base=interleave(base_w, base_b),
            sdf=[sdf_p["kernel"], sdf_p["bias"].reshape(1, -1)],
            color=interleave(color_w, color_b),
            rgb1=[r1_p["kernel"], r1_p["bias"].reshape(1, -1)],
            rgb2=[r2_p["kernel"], r2_p["bias"].reshape(1, -1)],
            vis=interleave(vis_w, vis_b),
            feat=interleave(feat_w, feat_b),
        )
        cfg = FieldCfg(
            freqs=tuple(float(f) for f in fb_c),
            nf_base=self.pos_embedding.n_freqs,
            nf_color=self.pos_embedding_color.n_freqs,
            nf_vis=self.vis_mlp.pos_embedding.n_freqs,
            nf_feat=self.feat_pos_embedding.n_freqs,
            skips_base=tuple(self.skips),
            skips_color=tuple(self.skips),
            skips_vis=(4,),
            skips_feat=(4,),
        )
        appr = self.appr_embedding.get_vals(frame_id).reshape(M, -1)
        win_b = self.pos_embedding.get_window(alpha)
        win_c = self.pos_embedding_color.get_window(alpha)
        ibeta = jnp.exp(self.logibeta).reshape(1, 1)
        return nets, cfg, appr, win_b, win_c, ibeta

    def query_field(self, samples_dict, sched=None, train=True, flow_thresh=None):
        feat_dict, deltas, aux_dict = super().query_field(
            samples_dict, sched=sched, train=train, flow_thresh=flow_thresh
        )
        xyz = feat_dict["xyz"]
        from lab4d_tpu.nnutils.nerf import _eval_wants

        if "feature" not in feat_dict and (train or _eval_wants("feature")):
            # fused path computed it already; at eval the channel subset
            # may skip the feature head outright (nerf._eval_channels)
            feat_dict.update(self.compute_feat(xyz, fused=None if train else False))
        if train:
            if "feature" in samples_dict and "feature" in feat_dict:
                xyz_matches = self.global_match(samples_dict["feature"], xyz)
                xy_reproj, xyz_reproj = self.forward_project(
                    xyz_matches,
                    samples_dict["field2cam"],
                    samples_dict["Kinv"],
                    samples_dict["frame_id"],
                    samples_dict["inst_id"],
                    samples_dict=samples_dict,
                )
                aux_dict["xyz_matches"] = xyz_matches
                aux_dict["xyz_reproj"] = xyz_reproj
                aux_dict["xy_reproj"] = xy_reproj
        return feat_dict, deltas, aux_dict

    def eval_extra_heads(self, xyz):
        """Canonical feature channel for the merged two-pass eval path."""
        return self.compute_feat(xyz, fused=False)

    def compute_feat(self, xyz, fused=None):
        """Normalized canonical feature at points (feature.py:136-150)."""
        spec = self.feat_pos_embedding.pe_spec(None)
        if spec is None:
            feat = self.feature_field(self.feat_pos_embedding(xyz), fused=fused)
        else:
            feat = self.feature_field(xyz, pe_spec=spec, fused=fused)
        from lab4d_tpu.utils.geom import safe_norm

        feat = feat / jnp.maximum(safe_norm(feat), 1e-6)
        return {"feature": feat}

    def global_match(
        self, feat_px, xyz_canonical, num_candidates: int = 1024
    ):
        """Soft-argmax match of pixel features against a random subset of
        canonical samples (feature.py:152-199).

        The candidate features are RE-EVALUATED through the feature MLP at
        the k subsampled points rather than gathered from the full (P, 16)
        field output: identical values and parameter gradients (same
        function at the same points), but the backward becomes a 1024-row
        MLP pass instead of a scatter-add into a dense 262k x 16 zero
        buffer routed through the field kernel's cotangent (measured
        ~0.6 ms/step of broadcast+scatter+relayout traffic)."""
        shape = feat_px.shape
        C = shape[-1]
        feat_px = feat_px.reshape(-1, C)
        xyz_canonical = xyz_canonical.reshape(-1, 3)

        total = xyz_canonical.shape[0]
        k = min(num_candidates, total)
        # with-replacement draw: choice(replace=False) sorts all `total`
        # keys (~0.5 ms/step at 262k points); duplicate candidates merely
        # double-count a support point in the soft-argmax (k << total, so
        # collisions are rare and harmless)
        idx = jax.random.randint(self.make_rng("aux"), (k,), 0, total)
        xyz_c = xyz_canonical[idx]
        feat_c = self.compute_feat(xyz_c, fused=False)["feature"]

        score = feat_px @ feat_c.T * jnp.exp(self.logsigma)
        prob = jax.nn.softmax(score, axis=-1)
        xyz_matched = prob @ xyz_c
        return xyz_matched.reshape(shape[:-1] + (3,))

    def forward_project(
        self, xyz, field2cam, Kinv, frame_id, inst_id, samples_dict=None
    ):
        """Re-articulate matched canonical points into camera and project
        (feature.py:201-226)."""
        xyz = xyz[:, :, None]  # (M, N, 1, 3)
        xyz_cam = self.forward_warp(
            xyz, field2cam, frame_id, inst_id, samples_dict=samples_dict
        )
        xyz_cam = xyz_cam[:, :, 0]
        Kmat = Kmatinv(Kinv)
        xy_reproj = pinhole_projection(Kmat, xyz_cam)[..., :2]
        return xy_reproj, xyz_cam
