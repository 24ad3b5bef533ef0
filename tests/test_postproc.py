"""Postproc tests: CCL vs scipy, RLE round trip, boxes, NMS, AMG smoke."""

import numpy as np
import pytest
import scipy.ndimage
import jax
import jax.numpy as jnp

from medsam2_tpu.ops import connected_components as ccl
from medsam2_tpu.ops import nms
from medsam2_tpu.postproc import amg_utils as amg


def random_blobs(rng, h=64, w=64, p=0.35):
    return (rng.random((h, w)) < p)


def test_connected_components_vs_scipy(rng):
    masks = np.stack([random_blobs(rng) for _ in range(3)])
    labels, areas = ccl.connected_components(jnp.asarray(masks))
    labels, areas = np.asarray(labels), np.asarray(areas)
    structure = np.ones((3, 3), int)  # 8-connectivity
    for b in range(3):
        ref_labels, n = scipy.ndimage.label(masks[b], structure=structure)
        # same partition: our labels constant on each scipy component, distinct
        # across touching components
        for comp in range(1, n + 1):
            vals = np.unique(labels[b][ref_labels == comp])
            assert len(vals) == 1 and vals[0] > 0, f"component {comp} split"
        # distinct components -> distinct labels
        reps = [labels[b][ref_labels == comp].flat[0] for comp in range(1, n + 1)]
        assert len(set(reps)) == n
        # areas match
        ref_areas = scipy.ndimage.sum_labels(masks[b], ref_labels, range(1, n + 1))
        for comp in range(1, n + 1):
            got_area = np.unique(areas[b][ref_labels == comp])
            assert got_area.tolist() == [ref_areas[comp - 1]]
        assert np.all(labels[b][~masks[b]] == 0)


def test_fill_holes():
    m = -np.ones((1, 1, 16, 16), np.float32)
    m[0, 0, 4:12, 4:12] = 1.0
    m[0, 0, 7:9, 7:9] = -1.0  # 4px hole
    filled = np.asarray(ccl.fill_holes_in_mask_scores(jnp.asarray(m), max_area=8))
    assert np.all(filled[0, 0, 7:9, 7:9] == 0.1)   # hole filled
    assert np.all(filled[0, 0, :3, :3] == -1.0)    # big background untouched


def test_remove_small_regions():
    m = np.zeros((32, 32), bool)
    m[4:20, 4:20] = True
    m[28:30, 28:30] = True  # small island (4 px)
    out, changed = ccl.remove_small_regions(jnp.asarray(m), 8, "islands")
    out = np.asarray(out)
    assert bool(changed)
    assert not out[28:30, 28:30].any()
    assert out[4:20, 4:20].all()

    h = m.copy()
    h[10:12, 10:12] = False  # small hole
    out, changed = ccl.remove_small_regions(jnp.asarray(h), 8, "holes")
    assert bool(changed) and np.asarray(out)[10:12, 10:12].all()


def test_rle_roundtrip(rng):
    masks = np.stack([random_blobs(rng, 24, 17) for _ in range(4)])
    rles = amg.mask_to_rle(masks)
    for i, rle in enumerate(rles):
        back = amg.rle_to_mask(rle)
        np.testing.assert_array_equal(back, masks[i])
        assert amg.area_from_rle(rle) == masks[i].sum()


def test_batched_mask_to_box():
    m = np.zeros((2, 16, 20), bool)
    m[0, 3:9, 5:15] = True
    boxes = amg.batched_mask_to_box(m)
    np.testing.assert_array_equal(boxes[0], [5, 3, 14, 8])
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])  # empty


def test_stability_score():
    logits = np.full((1, 8, 8), -5.0, np.float32)
    logits[0, 2:6, 2:6] = 5.0
    s = np.asarray(amg.calculate_stability_score(logits, 0.0, 1.0))
    assert s[0] == pytest.approx(1.0)
    # borderline values reduce stability
    logits[0, 0:2, :] = 0.5
    s2 = np.asarray(amg.calculate_stability_score(logits, 0.0, 1.0))
    assert s2[0] < 1.0


def brute_force_nms(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep, sup = [], np.zeros(len(boxes), bool)
    iou = nms._iou_matrix_np(boxes)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        for j in order:
            if iou[i, j] > thr:
                sup[j] = True
    return np.asarray(keep)


def test_nms_np_and_jax_agree(rng):
    boxes = rng.uniform(0, 50, (30, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 30, (30, 2))
    scores = rng.random(30).astype(np.float32)
    keep_np = nms.nms_np(boxes, scores, 0.5)
    np.testing.assert_array_equal(keep_np, brute_force_nms(boxes, scores, 0.5))
    keep_mask = np.asarray(nms.nms_jax(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    np.testing.assert_array_equal(np.sort(keep_np), np.nonzero(keep_mask)[0])


def test_point_nms(rng):
    pts = np.array([[0, 0], [1, 1], [10, 10], [10.5, 10.5]], np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.95], np.float32)
    keep = nms.point_nms_np(pts, scores, dist_threshold=3.0)
    np.testing.assert_array_equal(np.sort(keep), [0, 3])


def test_amg_multi_crop_layers():
    """crop_n_layers=1: per-crop processing, uncropping, cross-crop NMS."""
    from tests.test_predictors import TINY
    from medsam2_tpu.core.sam2_model import sam2_init
    from medsam2_tpu.api.automatic_mask_generator import SAM2AutomaticMaskGenerator

    params = sam2_init(jax.random.PRNGKey(5), TINY)
    gen = SAM2AutomaticMaskGenerator(
        params, TINY, points_per_side=2, points_per_batch=4,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
        crop_n_layers=1, crop_overlap_ratio=0.25)
    img = np.zeros((96, 96, 3), np.uint8)
    img[30:66, 30:66] = 200
    records = gen.generate(img)
    assert isinstance(records, list)
    for r in records[:3]:
        assert r["segmentation"].shape == (96, 96)
        # crop boxes recorded in xywh
        assert len(r["crop_box"]) == 4


def test_hiera_preset_schedules():
    from medsam2_tpu.configs import sam2_hiera_b_plus, sam2_hiera_l
    bp = sam2_hiera_b_plus()
    assert bp.trunk.channel_list == (896, 448, 224, 112)
    assert bp.trunk.depth == 24
    lg = sam2_hiera_l()
    assert lg.trunk.channel_list == (1152, 576, 288, 144)
    assert lg.trunk.depth == 48
    # schedules are internally consistent with the neck
    for cfg in (bp, lg):
        assert tuple(cfg.neck.backbone_channel_list) == cfg.trunk.channel_list
        sched = cfg.trunk.block_schedule()
        assert sched[0]["dim"] == cfg.trunk.embed_dim
        assert sched[-1]["dim_out"] == cfg.trunk.channel_list[0]


def test_amg_m2m_refinement():
    from tests.test_predictors import TINY
    from medsam2_tpu.core.sam2_model import sam2_init
    from medsam2_tpu.api.automatic_mask_generator import SAM2AutomaticMaskGenerator

    params = sam2_init(jax.random.PRNGKey(3), TINY)
    gen = SAM2AutomaticMaskGenerator(
        params, TINY, points_per_side=2, points_per_batch=4,
        pred_iou_thresh=0.0, stability_score_thresh=0.0, use_m2m=True)
    img = np.zeros((64, 64, 3), np.uint8)
    img[20:44, 20:44] = 180
    records = gen.generate(img)
    assert isinstance(records, list)


def test_flash_attention_d96_padding(rng):
    """Head-dim padding path (Hiera global blocks, d=96) vs XLA."""
    import functools
    from jax.experimental import pallas as pl
    from medsam2_tpu.ops import attention as attn_mod

    q = jnp.asarray(rng.standard_normal((1, 2, 64, 96)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 160, 96)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 160, 96)).astype(np.float32))
    orig = pl.pallas_call
    with jax.disable_jit():
        try:
            pl.pallas_call = functools.partial(orig, interpret=True)
            got = np.asarray(attn_mod.flash_attention(q, k, v, block_q=32, block_k=64))
        finally:
            pl.pallas_call = orig
    want = np.asarray(attn_mod.sdpa_xla(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_flash_attention_low_rank_values(rng):
    """Dv != D path (raw 64-dim memory values under a 256-dim QK) vs XLA."""
    import functools
    from jax.experimental import pallas as pl
    from medsam2_tpu.ops import attention as attn_mod

    q = jnp.asarray(rng.standard_normal((1, 1, 64, 256)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, 160, 256)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 1, 160, 64)).astype(np.float32))
    mask = jnp.asarray(rng.random(160) > 0.3)[None]
    orig = pl.pallas_call
    with jax.disable_jit():
        try:
            pl.pallas_call = functools.partial(orig, interpret=True)
            got = np.asarray(attn_mod.flash_attention(
                q, k, v, kv_mask=mask, block_q=32, block_k=64))
        finally:
            pl.pallas_call = orig
    want = np.asarray(attn_mod.sdpa_xla(q, k, v, kv_mask=mask))
    assert got.shape == (1, 1, 64, 64)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_rope_attn_factored_values_match_explicit(rng):
    """The low-rank value path ((P @ v) W_v + b) == projecting values up
    front, for the memory cross-attention geometry (kv_in=16 < head_dim=32)."""
    from medsam2_tpu.core import layers
    from medsam2_tpu.core.transformer import attn_init, rope_attn_apply
    from medsam2_tpu.ops.attention import attention

    p = attn_init(jax.random.PRNGKey(0), 32, 1, kv_in_dim=16)
    q = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 40, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 40, 16)).astype(np.float32))
    mask = jnp.asarray(rng.random((2, 40)) > 0.25)
    mask = mask.at[:, :8].set(True)

    got = rope_attn_apply(p, q, k, v, 1, q_hw=(4, 4), rope_k_repeat=True,
                          num_k_exclude_rope=8, kv_mask=mask)

    # explicit: project v up front, then run with an identity v_proj (v_in ==
    # head_dim disables the factorized path)
    vp_full = layers.linear_apply(p["v_proj"], v)
    # rebuild by temporarily raising kv_in so factor_v is False
    import copy
    p2 = copy.deepcopy(p)
    p2["v_proj"] = {"w": jnp.eye(32, dtype=jnp.float32)}
    want = rope_attn_apply(p2, q, k, vp_full, 1, q_hw=(4, 4), rope_k_repeat=True,
                           num_k_exclude_rope=8, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_automatic_mask_generator_smoke():
    from tests.test_predictors import TINY
    from medsam2_tpu.core.sam2_model import sam2_init
    from medsam2_tpu.api.automatic_mask_generator import SAM2AutomaticMaskGenerator

    params = sam2_init(jax.random.PRNGKey(0), TINY)
    gen = SAM2AutomaticMaskGenerator(
        params, TINY, points_per_side=4, points_per_batch=16,
        pred_iou_thresh=0.0, stability_score_thresh=0.0)
    img = np.zeros((64, 64, 3), np.uint8)
    img[16:48, 16:48] = 200
    records = gen.generate(img)
    assert isinstance(records, list)
    for r in records[:3]:
        assert set(r) >= {"segmentation", "area", "bbox", "predicted_iou",
                          "point_coords", "stability_score", "crop_box"}
        assert r["segmentation"].shape == (64, 64)
        assert r["area"] == r["segmentation"].sum()


def test_amg_device_scoring_matches_host_helpers(rng):
    """_score_and_pack_masks == the host-side amg_utils pipeline: stability,
    boxes, and the bit-packed thresholded masks."""
    from medsam2_tpu.api.automatic_mask_generator import _score_and_pack_masks
    from medsam2_tpu.postproc import amg_utils as amg

    B, M, h = 3, 2, 16
    out_hw = (40, 40)
    low = jnp.asarray(rng.standard_normal((B, M, h, h)).astype(np.float32) * 4)
    ious = jnp.asarray(rng.random((B, M)).astype(np.float32))

    iou_f, stab, boxes, packed = _score_and_pack_masks(
        low, ious, out_hw=out_hw, mask_threshold=0.0, stability_offset=1.0)

    from medsam2_tpu.core import layers
    up = layers.interpolate(
        jnp.transpose(low, (0, 2, 3, 1)), out_hw, method="bilinear")
    up = np.asarray(jnp.transpose(up, (0, 3, 1, 2))).reshape(B * M, *out_hw)
    want_stab = np.asarray(amg.calculate_stability_score(up, 0.0, 1.0))
    want_bin = up > 0.0
    want_boxes = amg.batched_mask_to_box(want_bin)

    np.testing.assert_array_equal(np.asarray(iou_f), np.asarray(ious).reshape(-1))
    np.testing.assert_allclose(np.asarray(stab), want_stab, atol=1e-6)
    np.testing.assert_allclose(np.asarray(boxes), want_boxes.astype(np.float32))
    got_bin = np.unpackbits(np.asarray(packed), axis=-1,
                            count=out_hw[1]).astype(bool)
    np.testing.assert_array_equal(got_bin, want_bin)


def test_flash_block_selection():
    """Measured-on-v5e block choices: tall-q for long kv, doubled kv block only
    for low-rank 2-byte values (the dv256/f32 variants OOM VMEM there)."""
    from medsam2_tpu.ops.attention import _flash_blocks

    assert _flash_blocks(4096, 28736, dv=64, itemsize=2) == (2048, 1024)
    assert _flash_blocks(4096, 28736, dv=64, itemsize=4) == (2048, 512)
    assert _flash_blocks(4096, 28736, dv=256, itemsize=2) == (2048, 512)
    assert _flash_blocks(4096, 4096) == (512, 1024)   # square self/global attn
    # blocks clamp to the 512-aligned sequence length (512-px streaming shape)
    assert _flash_blocks(1024, 7232, dv=64, itemsize=2) == (1024, 1024)
    assert _flash_blocks(1024, 1024) == (512, 1024)
    assert _flash_blocks(256, 512) == (512, 512)


@pytest.mark.parametrize("bwd", ["xla", "pallas"])
def test_flash_attention_gradients_match_xla(rng, monkeypatch, bwd):
    """custom_vjp (XLA kv-chunked recompute AND the two-pass Pallas kernels)
    == autodiff through the math SDPA, including kv masking and the low-rank
    Dv != D path at odd (non-512-aligned) block geometries."""
    import functools
    from jax.experimental import pallas as pl
    from medsam2_tpu.ops import attention as am

    monkeypatch.setenv("MEDSAM2_FLASH_BWD", bwd)
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        for (B, H, Nq, Nk, D, Dv) in [(1, 1, 64, 160, 96, 96),
                                      (1, 2, 32, 96, 32, 16)]:
            q = jnp.asarray(rng.standard_normal((B, H, Nq, D)).astype(np.float32))
            k = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
            v = jnp.asarray(rng.standard_normal((B, H, Nk, Dv)).astype(np.float32))
            mask = jnp.asarray(rng.random((B, Nk)) > 0.3)
            with jax.disable_jit():
                def loss_flash(q, k, v):
                    return jnp.sum(jnp.sin(am.flash_attention(
                        q, k, v, kv_mask=mask, block_q=32, block_k=64)))

                def loss_xla(q, k, v):
                    return jnp.sum(jnp.sin(am.sdpa_xla(q, k, v, kv_mask=mask)))

                g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
                g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
            for a, b in zip(g1, g2):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=2e-5)
    finally:
        pl.pallas_call = orig
