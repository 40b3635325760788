"""Feature-rendering NeRF with global matching (flax).

Parity: lab4d/nnutils/feature.py. The canonical feature field enables a
soft-argmax global match between pixel DINO features and canonical points,
reprojected for the feat_reproj loss.
"""

from __future__ import annotations

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

    def query_field(self, samples_dict, sched=None, train=True, flow_thresh=None):
        feat_dict, deltas, aux_dict = super().query_field(
            samples_dict, sched=sched, train=train, flow_thresh=flow_thresh
        )
        if train:
            xyz = feat_dict["xyz"]
            feat_dict.update(self.compute_feat(xyz))
            if "feature" in samples_dict and "feature" in feat_dict:
                xyz_matches = self.global_match(
                    samples_dict["feature"], feat_dict["feature"], xyz
                )
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

    def compute_feat(self, xyz):
        """Normalized canonical feature at points (feature.py:136-150)."""
        spec = self.feat_pos_embedding.pe_spec(None)
        if spec is None:
            feat = self.feature_field(self.feat_pos_embedding(xyz))
        else:
            feat = self.feature_field(xyz, pe_spec=spec)
        from lab4d_tpu.utils.geom import safe_norm

        feat = feat / jnp.maximum(safe_norm(feat), 1e-6)
        return {"feature": feat}

    def global_match(
        self, feat_px, feat_canonical, xyz_canonical, num_candidates: int = 1024
    ):
        """Soft-argmax match of pixel features against a random subset of
        canonical samples (feature.py:152-199)."""
        shape = feat_px.shape
        C = shape[-1]
        feat_px = feat_px.reshape(-1, C)
        feat_canonical = feat_canonical.reshape(-1, C)
        xyz_canonical = xyz_canonical.reshape(-1, 3)

        total = feat_canonical.shape[0]
        k = min(num_candidates, total)
        idx = jax.random.choice(self.make_rng("aux"), total, (k,), replace=False)
        feat_c = feat_canonical[idx]
        xyz_c = xyz_canonical[idx]

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
