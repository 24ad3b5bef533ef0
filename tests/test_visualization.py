"""Visualization utils: deterministic pixel semantics for the agreement
coloring / point painting (``func_2d/utils.py:381-441``) and smoke tests that
the figure dumps write files."""

import numpy as np

from medsam2_tpu.utils import visualization as viz


def test_compare_color_quadrants():
    pred = np.zeros((4, 4), np.float32)
    gt = np.zeros((4, 4), np.float32)
    pred[0, 0] = 1            # FP -> red
    gt[1, 1] = 1              # FN -> blue
    pred[2, 2] = gt[2, 2] = 1  # TP -> green
    out = viz.compare_color(pred, gt)
    assert out.shape == (4, 4, 3) and out.dtype == np.uint8
    assert tuple(out[0, 0]) == (255, 0, 0)
    assert tuple(out[1, 1]) == (0, 0, 255)
    assert tuple(out[2, 2]) == (0, 255, 0)
    assert tuple(out[3, 3]) == (0, 0, 0)


def test_compare_color_accepts_leading_dims():
    # torch-shaped [1, 1, H, W] inputs squeeze like the reference's [0, 0] index
    pred = np.ones((1, 1, 3, 3))
    gt = np.ones((1, 1, 3, 3))
    assert (viz.compare_color(pred, gt) == (0, 255, 0)).all(axis=-1).all()


def test_draw_points_disc_and_clipping():
    img = np.zeros((16, 16, 3), np.uint8)
    out = viz.draw_points(img, np.array([[8.0, 8.0]]), radius=2)
    assert tuple(out[8, 8]) == (255, 255, 255)      # center (y=8, x=8)
    assert tuple(out[8, 10]) == (255, 255, 255)     # radius reaches +/-2
    assert tuple(out[8, 11]) == (0, 0, 0)
    assert tuple(out[11, 11]) == (0, 0, 0)          # corner outside disc
    # off-image point is skipped, near-edge point is clipped not wrapped
    out2 = viz.draw_points(img, np.array([[40.0, 8.0], [0.0, 0.0]]), radius=3)
    assert tuple(out2[0, 0]) == (255, 255, 255)
    assert out2[:, 13:].sum() == 0


def test_vis_dumps_write_files(tmp_path):
    img = np.random.default_rng(0).random((12, 12, 3)).astype(np.float32)
    pred = np.zeros((12, 12)); pred[3:6, 3:6] = 1
    gt = np.zeros((12, 12)); gt[4:7, 4:7] = 1
    pts = np.array([[5.0, 5.0]])
    p1 = tmp_path / "cmp.png"
    viz.vis_compare_point(pred, gt, pts, str(p1))
    assert p1.exists() and p1.stat().st_size > 0
    p2 = tmp_path / "img.png"
    viz.vis_image(img, pred, gt, str(p2), points=pts)
    assert p2.exists() and p2.stat().st_size > 0
    p3 = tmp_path / "inst.png"
    viz.vis_inst_image(img, (pred * 2).astype(int), str(p3))
    assert p3.exists() and p3.stat().st_size > 0
