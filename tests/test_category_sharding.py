"""Category-model scale-out: train a 4-video model through the real
Trainer on a ("data","video") = (4,2) virtual-CPU mesh and assert the
per-video parameter tables stay sharded over "video".

Parity target: the reference's category config (48 videos over 7 GPUs,
docs/source/tutorials/category_model.rst:41) where per-video instance
codes / camera tables / pixel streams live on their video's GPU
(lab4d/nnutils/embedding.py:230-294).
"""

import os
import sys

import numpy as np
import jax
import pytest
from jax.sharding import PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lab4d_tpu.parallel import mesh_utils


def _default_opts():
    from absl import flags

    import lab4d_tpu.config  # noqa: F401  (registers flags)
    import lab4d_tpu.render  # noqa: F401

    if not flags.FLAGS.is_parsed():
        flags.FLAGS(["test"])
    from lab4d_tpu.config import get_config

    return get_config()


@pytest.fixture(scope="module")
def category_trainer(tmp_path_factory):
    from tests.synthetic import make_synthetic_dataset
    from lab4d_tpu.engine.trainer import Trainer

    work = str(tmp_path_factory.mktemp("category"))
    make_synthetic_dataset(
        f"{work}/database", seqname="catsim", num_vids=4, num_frames=8, res=64
    )
    opts = _default_opts()
    opts.update(
        seqname="catsim",
        logname="cat",
        fg_motion="bob",
        field_type="fg",
        single_inst=False,
        train_res=64,
        eval_res=16,
        num_rounds=1,
        iters_per_round=2,
        imgs_per_gpu=1,
        pixels_per_image=4,
        ngpu=8,
        video_shards=2,
        num_workers=1,
        save_freq=1,
        geo_init_steps=50,
        database_root=f"{work}/database",
        logroot=f"{work}/logdir",
    )
    return Trainer(opts)


class TestCategoryModelSharding:
    def test_mesh_is_4x2(self, category_trainer):
        t = category_trainer
        assert t.mesh.shape == {"data": 4, "video": 2}

    def test_per_video_tables_sharded(self, category_trainer):
        import flax

        t = category_trainer
        flat = flax.traverse_util.flatten_dict(t.params)
        sharded = {
            "/".join(k): v
            for k, v in flat.items()
            if getattr(v.sharding, "spec", None) == P("video")
        }
        # camera base rotations, intrinsics bases and instance codes
        assert any("base_quat" in k for k in sharded), sharded.keys()
        assert any("base_logfocal" in k for k in sharded)
        assert any("inst_embedding" in k for k in sharded)
        for k, v in sharded.items():
            assert v.shape[0] == 4, (k, v.shape)  # num_vids rows
        # everything else replicated
        repl = [
            k for k, v in flat.items()
            if getattr(v.sharding, "spec", None) == P()
        ]
        assert len(repl) + len(sharded) == len(flat)

    def test_pixel_stream_groups_by_video_shard(self, category_trainer):
        t = category_trainer
        rng = np.random.default_rng(0)
        batch = t.trainloader._make_batch(rng)
        dataid = batch["dataid"]  # (M, 2)
        M = dataid.shape[0]
        m = M // 8  # 8 shards
        for j in range(8):
            block = dataid[j * m:(j + 1) * m]
            assert np.all(block % 2 == j % 2), (j, block)

    @pytest.mark.slow
    def test_one_training_round_keeps_sharding(self, category_trainer):
        t = category_trainer
        t.trainloader.start()
        try:
            t.train_one_round(0)
        finally:
            t.trainloader.stop()
        import flax

        flat = flax.traverse_util.flatten_dict(t.params)
        base_quat = [
            v for k, v in flat.items() if k[-1] == "base_quat"
        ]
        assert base_quat and all(
            v.sharding.spec == P("video") for v in base_quat
        )
        # optimizer moments for sharded params are sharded too
        opt_leaves = jax.tree.leaves(t.opt_state)
        assert any(
            getattr(x.sharding, "spec", None) == P("video")
            for x in opt_leaves
            if hasattr(x, "sharding")
        )
