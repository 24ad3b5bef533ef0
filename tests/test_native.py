"""Native C++ kernel tests: build, parity with numpy implementations, and
integration through the public entry points."""

import numpy as np
import pytest

from medsam2_tpu import native
from medsam2_tpu.postproc import amg_utils as amg


pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="no C++ toolchain available")


def test_rle_native_matches_python(rng):
    mask = rng.random((23, 17)) > 0.5
    ref = amg.mask_to_rle(mask[None])[0]
    got = native.rle_encode(mask)
    assert got == ref["counts"]
    back = native.rle_decode(got, 23, 17)
    np.testing.assert_array_equal(back, mask)


def test_native_nms_matches_numpy(rng):
    from medsam2_tpu.ops import nms
    boxes = rng.uniform(0, 50, (40, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 25, (40, 2))
    scores = rng.random(40).astype(np.float32)
    native_keep = native.greedy_nms(boxes, scores, 0.5)
    # numpy reference (bypass the native fast path)
    order = np.argsort(-scores, kind="stable")
    iou = nms._iou_matrix_np(boxes)
    keep, sup = [], np.zeros(len(boxes), bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        sup |= iou[i] > 0.5
        sup[i] = True
    np.testing.assert_array_equal(native_keep, keep)


def test_native_point_nms(rng):
    pts = rng.uniform(0, 100, (30, 2)).astype(np.float32)
    scores = rng.random(30).astype(np.float32)
    kept = native.point_nms(pts, scores, 10.0)
    # every kept pair is >= 10 apart; kept in descending score order
    d = np.linalg.norm(pts[kept][:, None] - pts[kept][None], axis=-1)
    off_diag = d[~np.eye(len(kept), dtype=bool)]
    assert (off_diag >= 10.0).all()
    assert (np.diff(scores[kept]) <= 1e-6).all()


def test_native_instance_overlap(rng):
    t = np.zeros((40, 40), np.int32)
    p = np.zeros((40, 40), np.int32)
    t[2:12, 2:12] = 1
    t[20:35, 20:35] = 2
    p[4:14, 2:12] = 1
    p[20:30, 20:30] = 2
    inter, ta, pa = native.instance_overlap(t, p, 2, 2)
    assert ta.tolist() == [100, 225]
    assert pa.tolist() == [100, 100]
    assert inter[0, 0] == 80  # 8x10 overlap
    assert inter[1, 1] == 100


def test_instance_metrics_use_native(rng):
    """AJI through the public entry point still matches the hand value."""
    from medsam2_tpu.metrics.instance import get_fast_aji
    t = np.zeros((32, 32), np.int32)
    t[2:10, 2:10] = 1
    p = np.zeros_like(t)
    p[2:10, 2:10] = 1
    p[20:24, 20:24] = 2
    assert get_fast_aji(t, p) == pytest.approx(64 / (64 + 16))
