"""Checkpoint format: msgpack (no pickle), optimizer state included,
Adam moments survive a save/load round-trip (ref trainer.py:255-309).
"""

import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_category_sharding import _default_opts


@pytest.fixture(scope="module")
def small_trainer(tmp_path_factory):
    from tests.synthetic import make_synthetic_dataset
    from lab4d_tpu.engine.trainer import Trainer

    work = str(tmp_path_factory.mktemp("ckpt"))
    make_synthetic_dataset(
        f"{work}/database", seqname="cksim", num_vids=1, num_frames=8, res=64
    )
    opts = _default_opts()
    opts.update(
        seqname="cksim", logname="ck", fg_motion="rigid", field_type="fg",
        train_res=64, eval_res=16, num_rounds=1, iters_per_round=2,
        imgs_per_gpu=2, pixels_per_image=4, ngpu=1, num_workers=1,
        save_freq=1,
        geo_init_steps=50, database_root=f"{work}/database",
        logroot=f"{work}/logdir",
    )
    t = Trainer(opts)
    t.trainloader.start()
    try:
        t.train_one_round(0)
    finally:
        t.trainloader.stop()
    t.save_checkpoint(0)
    return t, work


def test_checkpoint_is_msgpack_not_pickle(small_trainer):
    t, work = small_trainer
    path = f"{t.save_dir}/ckpt_0000.flax"
    head = open(path, "rb").read(2)
    # pickle protocol 2+ starts with b'\\x80'; msgpack maps start 0x8x/0xde
    assert head[0] != 0x80 or head[1] < 2, "looks like a pickle"
    from flax import serialization

    ckpt = serialization.msgpack_restore(open(path, "rb").read())
    assert {"manifest", "model", "opt_state", "geo_state", "proxy"} <= set(
        ckpt
    )


def test_adam_moments_round_trip(small_trainer):
    from flax import serialization
    from lab4d_tpu.engine.trainer import Trainer

    t, work = small_trainer
    ckpt = Trainer.load_checkpoint(f"{t.save_dir}/ckpt_0000.flax")
    # saved moments equal the trainer's cached opt state, leaf for leaf
    want = jax.tree.map(
        np.asarray, serialization.to_state_dict(t.opt_cache[1])
    )
    import flax as flax_mod

    want_flat = flax_mod.traverse_util.flatten_dict(want)
    got_flat = flax_mod.traverse_util.flatten_dict(ckpt["opt_state"])
    assert set(want_flat) == set(got_flat)
    mu_keys = [k for k in want_flat if "mu" in k]
    assert mu_keys, "no Adam first-moment leaves found"
    nonzero = 0
    for k in want_flat:
        np.testing.assert_array_equal(want_flat[k], got_flat[k])
        if "mu" in k and np.any(np.asarray(want_flat[k]) != 0):
            nonzero += 1
    assert nonzero > 0, "all first moments are zero — nothing was trained"

    # restoring into a perturbed live opt state brings the moments back
    orig = jax.tree.map(np.asarray, t.opt_state)
    t.opt_state = jax.tree.map(lambda x: x + 1.0 if x.dtype.kind == "f" else x,
                               t.opt_state)
    assert t._restore_opt_state(ckpt["opt_state"])
    cached = serialization.to_state_dict(t.opt_cache[1])
    now = serialization.to_state_dict(t.opt_state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        cached, now,
    )
    t.opt_state = jax.device_put(orig)


def test_restore_opt_state_rejects_mismatch(small_trainer):
    from flax import serialization

    t, work = small_trainer
    loaded = jax.tree.map(
        np.asarray, serialization.to_state_dict(t.opt_cache[1])
    )
    import flax as flax_mod

    flat = flax_mod.traverse_util.flatten_dict(loaded)
    k0 = next(k for k in flat if np.ndim(flat[k]) >= 1)
    flat[k0] = np.zeros(np.shape(flat[k0]) + (2,), np.float32)  # wrong shape
    bad = flax_mod.traverse_util.unflatten_dict(flat)
    assert not t._restore_opt_state(bad)
    assert not t._restore_opt_state(None)


def test_construct_test_model_reads_new_format(small_trainer):
    from lab4d_tpu.engine.trainer import Trainer

    t, work = small_trainer
    opts = dict(t.opts, load_suffix="latest")
    model, params, geo_state, proxy, data_info, _ = (
        Trainer.construct_test_model(opts)
    )
    assert "fg" in proxy and proxy["fg"].vertices.shape[1] == 3
    leaves = jax.tree.leaves(params)
    assert leaves and all(np.all(np.isfinite(x)) for x in leaves)
