"""Tests for the visualization / packaging / regression tooling."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_rasterizer_sphere_coverage():
    from lab4d_tpu.meshlib import uv_sphere
    from lab4d_tpu.utils.raster import look_at, render_mesh

    m = uv_sphere(radius=0.5, count=[16, 16])
    K = np.array([128.0, 128.0, 64.0, 64.0])
    img = render_mesh(
        np.asarray(m.vertices), np.asarray(m.faces),
        look_at([0, 0, -2.0]), K, res=128,
    )
    assert img.shape == (128, 128, 3)
    covered = img.mean(-1) < 0.95
    # projected sphere radius = f * r / d = 128*0.5/2 = 32 px -> area ~ pi*32^2
    frac = covered.mean()
    assert 0.15 < frac < 0.25
    # center is lit, corners are background
    assert img[64, 64].mean() < 0.95
    assert img[2, 2].mean() > 0.99


def test_render_intermediate(tmp_path):
    from lab4d_tpu.meshlib import uv_sphere
    from scripts.render_intermediate import render_intermediate

    run_dir = str(tmp_path)
    for r in range(3):
        uv_sphere(radius=0.3 + 0.1 * r, count=[8, 8]).export(
            f"{run_dir}/{r:03d}-fg-proxy.obj"
        )
    frames = render_intermediate(run_dir, "fg", res=96)
    assert len(frames) == 3
    assert frames[0].shape == (96, 96, 3)


def test_create_collage(tmp_path):
    import imageio

    from scripts.create_collage import create_collage

    for k in range(3):
        d = tmp_path / f"clip{k}"
        d.mkdir()
        for t in range(4):
            imageio.imwrite(
                str(d / f"{t:05d}.png"),
                np.full((32, 32, 3), 50 * k + 10 * t, np.uint8),
            )
    out = create_collage(str(tmp_path / "clip*"), str(tmp_path / "out.mp4"))
    assert out is not None


def test_compute_diff(tmp_path):
    from scripts.compute_diff import compute_diff

    a, b = tmp_path / "a", tmp_path / "b"
    (a / "sub").mkdir(parents=True)
    (b / "sub").mkdir(parents=True)
    np.save(a / "sub" / "x.npy", np.ones(4))
    np.save(b / "sub" / "x.npy", np.ones(4))
    assert compute_diff(str(a), str(b)) == []
    np.save(b / "sub" / "x.npy", np.ones(4) * 2)
    np.save(b / "sub" / "y.npy", np.ones(4))
    fails = compute_diff(str(a), str(b))
    assert len(fails) == 2


def test_browser_index(tmp_path, monkeypatch):
    import imageio

    from browser.app import build_index

    d = tmp_path / "logdir" / "run1"
    d.mkdir(parents=True)
    imageio.mimwrite(str(d / "rgb.gif"), [np.zeros((8, 8, 3), np.uint8)] * 2)
    page = build_index(str(tmp_path))
    assert "rgb.gif" in page and "<html" in page


def test_zip_tools(tmp_path, monkeypatch):
    from scripts.zip_logdir import zip_logdir

    run = tmp_path / "logdir" / "seq-run"
    run.mkdir(parents=True)
    (run / "opts.log").write_text("--seqname=seq")
    monkeypatch.chdir(tmp_path)
    out = zip_logdir(str(run), str(tmp_path / "out.zip"))
    import zipfile

    assert zipfile.ZipFile(out).namelist() == ["seq-run/opts.log"]


def test_config_hier_validation():
    """config_hier is wired into get_config(): schema validation rejects
    bad enum values, wrong types, and non-positive sizes."""
    import pytest

    from lab4d_tpu.config_hier import Config, validate

    good = Config().to_opts()
    validate(good)  # defaults are legal
    with pytest.raises(ValueError):
        validate(dict(good, field_type="nope"))
    with pytest.raises(ValueError):
        validate(dict(good, fg_motion="wiggle"))
    validate(dict(good, fg_motion="skel-quad"))
    validate(dict(good, fg_motion="comp_skel-human_dense"))
    with pytest.raises(ValueError):
        validate(dict(good, num_rounds=0))
    with pytest.raises(TypeError):
        validate(dict(good, train_res="big"))
    missing = dict(good)
    del missing["ngpu"]
    with pytest.raises(ValueError):
        validate(missing)
    # json round-trip preserves values
    cfg = Config.from_opts(dict(good, ngpu=4, video_shards=2))
    back = Config.from_json(cfg.to_json()).to_opts()
    assert back["ngpu"] == 4 and back["video_shards"] == 2


def test_browser_mesh_viewer(tmp_path):
    """The /viewer and /mesh.png routes: obj discovery, server-side
    rasterization, and path-traversal rejection."""
    from browser.app import build_index, render_mesh_png, _safe_rel
    from lab4d_tpu.meshlib import Mesh

    exp = tmp_path / "logdir" / "seq-run" / "export_0000"
    exp.mkdir(parents=True)
    # a tetrahedron obj
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    Mesh(verts, faces).export(str(exp / "fg-00000.obj"))

    page = build_index(str(tmp_path))
    assert "/viewer?dir=" in page and "export_0000" in page

    png = render_mesh_png(str(exp / "fg-00000.obj"), az_deg=30, res=64)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    import io

    from PIL import Image

    img = np.asarray(Image.open(io.BytesIO(png)))
    assert img.shape == (64, 64, 3)
    assert (img[..., 0] < 250).sum() > 10  # mesh actually drawn

    assert _safe_rel(str(tmp_path), "../../etc/passwd") is None
    assert _safe_rel(str(tmp_path), "logdir/seq-run") is not None
