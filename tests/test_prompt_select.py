"""Text-prompt object selection (preprocess/backends/prompt_select.py).

Multi-object scene: two colored balls orbiting; the prompt must pick the
right one through the REAL run_segmentation entry (the same Annotations
npy files training's crop/packing stage consumes — covered e2e by
tests/test_preprocess_e2e.py). Parity target: the reference's
GroundingDINO prompt path (scripts/run_preprocess.py:25-38)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _render_two_balls(num_frames=6, res=96):
    """Red ball (left, larger) + blue ball (right, smaller) on a dim gray
    background, both bobbing so flow/tracking has motion. Returns
    (frames uint8, gt_red bool, gt_blue bool)."""
    frames, gt_red, gt_blue = [], [], []
    yy, xx = np.mgrid[0:res, 0:res]
    for t in range(num_frames):
        ph = 2 * np.pi * t / num_frames
        img = np.full((res, res, 3), 40, np.uint8)
        # shaded background texture (keeps grabcut honest)
        img[..., :] += (10 * np.sin(xx / 17.0 + ph)).astype(np.uint8)[..., None]
        red_c = (res * 0.30 + 3 * np.sin(ph), res * 0.5 + 3 * np.cos(ph))
        blue_c = (res * 0.72 + 3 * np.cos(ph), res * 0.45 + 3 * np.sin(ph))
        rm = (xx - red_c[0]) ** 2 + (yy - red_c[1]) ** 2 < (res * 0.14) ** 2
        bm = (xx - blue_c[0]) ** 2 + (yy - blue_c[1]) ** 2 < (res * 0.09) ** 2
        img[rm] = (210, 40, 35)
        img[bm] = (35, 60, 205)
        frames.append(img)
        gt_red.append(rm)
        gt_blue.append(bm)
    return frames, gt_red, gt_blue


def _iou(a, b):
    return np.logical_and(a, b).sum() / max(np.logical_or(a, b).sum(), 1)


@pytest.fixture()
def threshold_backend(monkeypatch):
    """Deterministic base segmentation (bright-vs-gray threshold) so the
    tests exercise run_segmentation's prompt plumbing + the selector, not
    the neural backend's generalization to this synthetic scene."""
    import preprocess.backends.seg_backends as sb

    def segment_video_threshold(frames):
        out = []
        for f in frames:
            sat = f.astype(np.int32)
            spread = sat.max(-1) - sat.min(-1)  # colored pixels
            out.append((spread > 60).astype(np.int8))
        return out

    monkeypatch.setattr(sb, "pick_seg_backend", lambda: "grabcut")
    monkeypatch.setattr(sb, "segment_video_grabcut", segment_video_threshold)


def _write_scene(tmp_path, frames):
    seq = "promptsim-0000"
    img_dir = tmp_path / "processed" / "JPEGImages" / "Full-Resolution" / seq
    os.makedirs(img_dir)
    for i, f in enumerate(frames):
        cv2.imwrite(str(img_dir / f"{i:05d}.jpg"), f[..., ::-1])
    return seq, str(tmp_path / "processed")


@pytest.mark.parametrize(
    "prompt,want",
    [
        ("a red ball", "red"),
        ("the blue object", "blue"),
        ("small ball on the right", "blue"),
        ("the large object on the left", "red"),
    ],
)
def test_prompt_picks_the_right_object(tmp_path, threshold_backend, prompt,
                                       want):
    from preprocess.backends.seg_backends import run_segmentation

    frames, gt_red, gt_blue = _render_two_balls()
    seq, outdir = _write_scene(tmp_path, frames)

    run_segmentation(seq, outdir, text_prompt=prompt)

    gt = gt_red if want == "red" else gt_blue
    other = gt_blue if want == "red" else gt_red
    ious, ious_other = [], []
    for i in range(len(frames)):
        m = np.load(f"{outdir}/Annotations/Full-Resolution/{seq}/{i:05d}.npy")
        ious.append(_iou(m > 0, gt[i]))
        ious_other.append(_iou(m > 0, other[i]))
    assert np.mean(ious) > 0.7, (prompt, np.mean(ious))
    assert np.mean(ious_other) < 0.2, (prompt, np.mean(ious_other))


def test_empty_prompt_keeps_all_foreground(tmp_path, threshold_backend):
    """No prompt = current behavior: the full foreground mask survives."""
    from preprocess.backends.seg_backends import run_segmentation

    frames, gt_red, gt_blue = _render_two_balls()
    seq, outdir = _write_scene(tmp_path, frames)
    run_segmentation(seq, outdir)
    m = np.load(f"{outdir}/Annotations/Full-Resolution/{seq}/00000.npy")
    both = np.logical_or(gt_red[0], gt_blue[0])
    assert _iou(m > 0, both) > 0.5


def test_category_word_falls_back_to_dominant_object(tmp_path,
                                                     threshold_backend):
    """A pure category word ("cat") matches no grammar attribute; the
    selector must fall back to the dominant (most persistent + largest)
    track — here the red ball — instead of presence-only scoring.
    Mirrors the reference's GroundingDINO single-subject behavior."""
    from preprocess.backends.prompt_select import parse_prompt
    from preprocess.backends.seg_backends import run_segmentation

    spec = parse_prompt("cat")
    assert spec["category_fallback"] is True
    assert parse_prompt("the red ball")["category_fallback"] is False
    assert parse_prompt("")["category_fallback"] is False

    frames, gt_red, gt_blue = _render_two_balls()
    seq, outdir = _write_scene(tmp_path, frames)
    run_segmentation(seq, outdir, text_prompt="cat")

    ious, ious_blue = [], []
    for i in range(len(frames)):
        m = np.load(f"{outdir}/Annotations/Full-Resolution/{seq}/{i:05d}.npy")
        ious.append(_iou(m > 0, gt_red[i]))
        ious_blue.append(_iou(m > 0, gt_blue[i]))
    assert np.mean(ious) > 0.7, np.mean(ious)
    assert np.mean(ious_blue) < 0.2, np.mean(ious_blue)
