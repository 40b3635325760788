"""Dataloader tests on the synthetic dataset: on-disk contract, native vs
numpy path equivalence, metadata aggregation."""

import os

import numpy as np
import pytest

from lab4d_tpu.dataloader import data_utils


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from tests.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("db")
    make_synthetic_dataset(
        str(root), seqname="synth", num_vids=2, num_frames=12, res=32
    )
    return str(root)


@pytest.fixture(scope="module")
def datasets(dataset_dir):
    opts = dict(
        seqname="synth", data_prefix="crop", train_res=32,
        feature_type="dinov2", pixels_per_image=8, database_root=dataset_dir,
    )
    return data_utils.config_to_datasets(opts)


class TestVidData:
    def test_shapes(self, datasets):
        ds = datasets[0]
        pair = ds.load_pair(0)
        assert pair["rgb"].shape == (2, 8, 3)
        assert pair["mask"].shape == (2, 8, 1)
        assert pair["flow"].shape == (2, 8, 2)
        assert pair["feature"].shape == (2, 8, 16)
        assert pair["hxy"].shape == (2, 8, 3)
        assert pair["crop2raw"].shape == (2, 4)

    def test_native_matches_numpy_path(self, datasets, monkeypatch):
        from lab4d_tpu import native

        if native.get_lib() is None:
            pytest.skip("native sampler unavailable")
        ds = datasets[0]

        # deterministic delta and pixel draws
        monkeypatch.setattr(ds, "sample_delta", lambda idx: 1)
        fixed_xy = np.stack(
            [np.arange(8) % ds.img_size[1], np.arange(8) // 2], -1
        ).astype(np.int64)
        monkeypatch.setattr(ds, "sample_xy", lambda: fixed_xy)

        batch = ds.load_pairs_batch([0, 3, 5])
        singles = [ds.load_pair(i) for i in (0, 3, 5)]
        for k in batch:
            want = np.stack([s[k] for s in singles])
            np.testing.assert_allclose(
                np.asarray(batch[k], np.float32),
                np.asarray(want, np.float32),
                atol=1e-3,
                err_msg=k,
            )

    def test_flow_consistency(self, datasets):
        """Synthetic flow must map pixel (x,y) of frame t near the projection
        of the same surface point in frame t+1 (sanity of the generator)."""
        ds = datasets[0]
        pair = ds.load_pair(0)
        # flow_uct > 0 marks on-object pixels
        valid = pair["flow_uct"][0, :, 0] > 0
        if valid.sum() == 0:
            pytest.skip("no object pixels drawn")
        mag = np.linalg.norm(pair["flow"][0][valid], axis=-1)
        assert np.isfinite(mag).all()
        assert mag.max() < ds.img_size[0]


class TestDataInfo:
    def test_aggregation(self, datasets):
        info = data_utils.get_data_info(datasets)
        fi = info["frame_info"]
        assert fi.num_vids == 2
        assert fi.num_frames == 24
        assert info["intrinsics"].shape == (24, 4)
        assert info["rtmat"].shape[0] == 2  # bg, fg
        assert os.path.exists(info["geom_path"][0])

    def test_batch_loader(self, datasets):
        loader = data_utils.TrainBatchLoader(
            datasets, imgs_per_batch=6, num_workers=1
        )
        try:
            batch = loader.next_batch()
            assert batch["rgb"].shape == (6, 2, 8, 3)
            assert batch["dataid"].shape == (6, 2)
            assert set(np.unique(batch["dataid"])) <= {0, 1}
        finally:
            loader.stop()
