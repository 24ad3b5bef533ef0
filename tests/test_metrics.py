"""Metric tests: known-value cases + invariances."""

import numpy as np
import pytest

from medsam2_tpu.metrics import instance as mi
from medsam2_tpu.metrics import detection as md
from medsam2_tpu.metrics.segmentation import eval_seg


def two_inst_map():
    m = np.zeros((32, 32), np.int32)
    m[2:10, 2:10] = 1
    m[20:30, 20:30] = 2
    return m


def test_perfect_prediction_scores():
    t = two_inst_map()
    assert mi.get_fast_aji(t, t) == pytest.approx(1.0)
    assert mi.get_fast_aji_plus(t, t) == pytest.approx(1.0)
    (dq, sq, pq), pairs = mi.get_fast_pq(t, t)
    assert (dq, sq, pq) == (pytest.approx(1.0),) * 3
    assert mi.get_fast_dice_2(t, t) == pytest.approx(1.0)
    assert mi.get_dice_1(t, t) == pytest.approx(1.0)


def test_aji_partial_overlap():
    t = two_inst_map()
    p = np.zeros_like(t)
    p[2:10, 2:10] = 5          # exact match of inst 1 (odd id: remap-insensitive)
    p[20:30, 20:26] = 9        # 60% cover of inst 2
    aji = mi.get_fast_aji(t, mi.remap_label(p))
    # inter = 64 + 60 ; union = 64 + 100
    assert aji == pytest.approx((64 + 60) / (64 + 100))
    (dq, sq, pq), _ = mi.get_fast_pq(t, mi.remap_label(p))
    assert dq == pytest.approx(1.0)          # both IoU > 0.5
    assert sq == pytest.approx((1.0 + 0.6) / 2)


def test_aji_false_positive_penalty():
    t = two_inst_map()
    p = t.copy()
    p[12:16, 12:16] = 3  # spurious instance
    aji = mi.get_fast_aji(t, p)
    assert aji == pytest.approx(164 / (164 + 16))
    (dq, sq, pq), _ = mi.get_fast_pq(t, p)
    assert dq == pytest.approx(2 / (2 + 0.5))


def test_aji_plus_beats_aji_on_greedy_trap():
    # GT: one big instance. Pred: two instances, the greedy pick suboptimal
    t = np.zeros((16, 16), np.int32)
    t[0:8, :] = 1
    t[9:16, :] = 2
    p = np.zeros_like(t)
    p[0:10, :] = 1   # overlaps both GT 1 (fully) and GT 2 (1 row)
    p[10:16, :] = 2
    aji = mi.get_fast_aji(t, p)
    ajip = mi.get_fast_aji_plus(t, p)
    assert ajip >= aji


def test_remap_label():
    p = np.zeros((8, 8), np.int32)
    p[0:2, 0:2] = 7
    p[4:8, 4:8] = 3
    r = mi.remap_label(p, by_size=True)
    assert set(np.unique(r)) == {0, 1, 2}
    assert (r == 1).sum() == 16  # largest got id 1
    assert (r == 2).sum() == 4


def test_pair_coordinates():
    a = np.array([[0, 0], [10, 10], [30, 30]], float)
    b = np.array([[1, 1], [11, 10], [100, 100]], float)
    pairing, ua, ub = mi.pair_coordinates(a, b, radius=5)
    assert len(pairing) == 2
    assert 2 in ua and 2 in ub


def test_eval_seg_known_value():
    pred = np.zeros((1, 1, 8, 8), np.float32)
    pred[0, 0, :4] = 1.0
    gt = np.zeros((1, 1, 8, 8), np.float32)
    gt[0, 0, :4] = 1.0
    iou, dice = eval_seg(pred, gt, thresholds=(0.5,))
    assert iou == pytest.approx(1.0, abs=1e-4)
    assert dice == pytest.approx(1.0, abs=1e-3)
    # half overlap
    gt2 = np.zeros_like(gt)
    gt2[0, 0, 2:6] = 1.0
    iou2, dice2 = eval_seg(pred, gt2, thresholds=(0.5,))
    assert iou2 == pytest.approx(1 / 3, abs=1e-4)
    assert dice2 == pytest.approx(0.5, abs=1e-3)


def test_eval_map_perfect_and_miss():
    gt = [np.array([[10, 10], [50, 50]], float)]
    det_perfect = [np.array([[10, 11, 0.9], [49, 50, 0.8]], float)]
    ap, res = md.eval_map(det_perfect, gt, dis_thr=20)
    assert ap == pytest.approx(1.0)
    assert res["f1"] == pytest.approx(1.0)

    det_half = [np.array([[10, 11, 0.9], [200, 200, 0.8]], float)]
    ap2, res2 = md.eval_map(det_half, gt, dis_thr=20)
    assert ap2 == pytest.approx(0.5)
    assert res2["num_gts"] == 2


def test_eval_map_score_ordering_matters():
    gt = [np.array([[10, 10]], float)]
    # two dets near the same gt: higher-scored one claims it, other is FP
    det = [np.array([[10, 10, 0.5], [12, 10, 0.9]], float)]
    tp, fp = md.tpfp_points(det[0], gt[0], 20)
    assert tp[1] == 1 and fp[0] == 1


def test_average_precision_modes():
    rec = np.array([0.25, 0.5, 0.75, 1.0])
    prec = np.array([1.0, 1.0, 0.75, 0.5])
    ap_area = md.average_precision(rec, prec, "area")
    ap_11 = md.average_precision(rec, prec, "11points")
    assert 0 < ap_11 <= 1 and 0 < ap_area <= 1
