"""Tests for the fixed-shape memory bank (vs the reference's dict-based
selection logic re-derived as a python oracle) and memory attention masking."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import MemoryAttentionConfig
from medsam2_tpu.core import memory as mem
from medsam2_tpu.state import memory_bank as mb


def small_spec(num_maskmem=3, max_cond=2, r=1, max_ptrs=4):
    return mb.BankSpec(
        num_maskmem=num_maskmem, max_cond_frames=max_cond, mem_spatial=4,
        mem_dim=2, hidden_dim=4, max_obj_ptrs=max_ptrs, temporal_stride=r)


def oracle_noncond_targets(frame_idx, num_maskmem, r, reverse=False):
    """Reference arithmetic, sam2_base.py:535-558, as a plain python loop."""
    out = []
    for t_pos in range(1, num_maskmem):
        t_rel = num_maskmem - t_pos
        if t_rel == 1:
            prev = frame_idx + t_rel if reverse else frame_idx - t_rel
        else:
            if not reverse:
                prev = ((frame_idx - 2) // r) * r - (t_rel - 2) * r
            else:
                prev = -(-(frame_idx + 2) // r) * r + (t_rel - 2) * r
        out.append(prev)
    return out


@pytest.mark.parametrize("r", [1, 2, 3])
@pytest.mark.parametrize("frame_idx", [2, 5, 9, 17])
def test_noncond_target_arithmetic(r, frame_idx):
    spec = small_spec(num_maskmem=5, r=r)
    got = np.asarray(mb._noncond_target_frames(spec, jnp.int32(frame_idx), False))
    want = oracle_noncond_targets(frame_idx, 5, r)
    np.testing.assert_array_equal(got, want)
    got_rev = np.asarray(mb._noncond_target_frames(spec, jnp.int32(frame_idx), True))
    want_rev = oracle_noncond_targets(frame_idx, 5, r, reverse=True)
    np.testing.assert_array_equal(got_rev, want_rev)


def write_frames(spec, bank, frames, cond_frames):
    for f in frames:
        feats = jnp.full((1, spec.mem_spatial, spec.mem_dim), float(f))
        ptr = jnp.full((1, spec.hidden_dim), float(f))
        bank = mb.write_bank(spec, bank, f, feats, ptr, is_cond=(f in cond_frames))
    return bank


def decode_read(spec, bank, frame_idx, tpos, num_frames=2 ** 30):
    spatial_pos = jnp.zeros((spec.mem_spatial, spec.mem_dim))
    memory, pos, valid, nptr, _ = mb.read_bank(
        spec, bank, frame_idx, tpos, spatial_pos, num_frames=num_frames)
    P = spec.mem_spatial
    frames = []
    for s in range(spec.num_frames_attended):
        sl = slice(s * P, (s + 1) * P)
        if bool(valid[0, sl.start]):
            frames.append((float(memory[0, sl.start, 0]),   # stored frame id
                           float(pos[0, sl.start, 0])))      # tpos embedding value
    ptr_region = memory[0, spec.num_spatial_tokens:]
    ptr_valid = valid[0, spec.num_spatial_tokens:]
    tok = spec.tokens_per_ptr
    ptrs = [float(ptr_region[i * tok, 0]) for i in range(spec.num_ptr_slots)
            if bool(ptr_valid[i * tok])]
    return frames, ptrs


def test_bank_selection_r1():
    spec = small_spec(num_maskmem=3, max_cond=2, r=1, max_ptrs=4)
    bank = mb.init_bank(spec, 1)
    # tpos embedding: value = slot index, distinguishable
    tpos = jnp.arange(spec.num_maskmem, dtype=jnp.float32)[:, None] * jnp.ones((1, spec.mem_dim))
    bank = write_frames(spec, bank, range(6), cond_frames={0})

    frames, ptrs = decode_read(spec, bank, 6, tpos)
    # cond frame 0 at t_pos=0 -> embedding index num_maskmem-1 = 2
    # non-cond: t_pos=1 -> frame 4 (emb idx 1), t_pos=2 -> frame 5 (emb idx 0)
    assert sorted(frames) == [(0.0, 2.0), (4.0, 1.0), (5.0, 0.0)]
    # pointers: cond 0 + frames 5, 4, 3 (t_diff 1..3)
    assert sorted(ptrs) == [0.0, 3.0, 4.0, 5.0]


def test_bank_selection_early_frame():
    spec = small_spec(num_maskmem=3, max_cond=2, r=1, max_ptrs=4)
    bank = mb.init_bank(spec, 1)
    tpos = jnp.arange(spec.num_maskmem, dtype=jnp.float32)[:, None] * jnp.ones((1, spec.mem_dim))
    bank = write_frames(spec, bank, [0], cond_frames={0})
    frames, ptrs = decode_read(spec, bank, 1, tpos)
    # only the cond frame exists; frame -1 / 0 non-cond slots are invalid
    assert frames == [(0.0, 2.0)]
    assert ptrs == [0.0]  # cond ptr only; ring empty


def test_bank_ptr_dedupe_and_window():
    spec = small_spec(num_maskmem=3, max_cond=2, r=1, max_ptrs=3)
    bank = mb.init_bank(spec, 1)
    tpos = jnp.zeros((spec.num_maskmem, spec.mem_dim))
    # frame 3 is cond AND within the ptr window of frame 4 -> must not duplicate
    bank = write_frames(spec, bank, [0, 1, 2], cond_frames={0})
    bank = write_frames(spec, bank, [3], cond_frames={3})
    frames, ptrs = decode_read(spec, bank, 4, tpos)
    assert len(ptrs) == len(set(ptrs))
    assert set(ptrs) <= {0.0, 1.0, 2.0, 3.0}
    assert len(ptrs) <= spec.max_obj_ptrs


def test_bank_num_frames_bound():
    spec = small_spec(num_maskmem=3, max_cond=1, r=1, max_ptrs=4)
    bank = mb.init_bank(spec, 1)
    tpos = jnp.zeros((spec.num_maskmem, spec.mem_dim))
    bank = write_frames(spec, bank, [0, 1, 2], cond_frames={0})
    # num_frames=3 restricts ptr window (reference: min(num_frames, max_obj_ptrs))
    _, ptrs = decode_read(spec, bank, 2, tpos, num_frames=3)
    assert set(ptrs) == {0.0, 1.0}


def test_cond_overflow_keeps_closest():
    """Cond writes beyond capacity evict the slot farthest from the new frame
    (the retained set = ``select_closest_cond_frames`` anchored at the newest
    prompt, ``sam2_utils.py:15-57``) instead of clobbering the last slot."""
    spec = small_spec(num_maskmem=3, max_cond=2, max_ptrs=4)
    bank = mb.init_bank(spec, 1)
    bank = write_frames(spec, bank, [0], cond_frames={0})
    bank = write_frames(spec, bank, [10], cond_frames={10})
    bank = write_frames(spec, bank, [12], cond_frames={12})
    stored = set(np.asarray(bank["cond_frame_idx"][0]).tolist())
    assert stored == {10, 12}


def test_cond_reprompt_overwrites_its_slot():
    spec = small_spec(num_maskmem=3, max_cond=2, max_ptrs=4)
    bank = mb.init_bank(spec, 1)
    bank = write_frames(spec, bank, [0], cond_frames={0})
    bank = write_frames(spec, bank, [5], cond_frames={5})
    # re-prompt frame 0: must reuse frame 0's slot, not evict frame 5
    feats = jnp.full((1, spec.mem_spatial, spec.mem_dim), 99.0)
    ptr = jnp.full((1, spec.hidden_dim), 99.0)
    bank = mb.write_bank(spec, bank, 0, feats, ptr, is_cond=True)
    stored = sorted(np.asarray(bank["cond_frame_idx"][0]).tolist())
    assert stored == [0, 5]
    slot0 = int(np.asarray(jnp.argmax(bank["cond_frame_idx"][0] == 0)))
    assert float(bank["cond_feats"][0, slot0, 0, 0]) == 99.0


def test_ptr_tdiff_matches_pointer_distances():
    spec = small_spec(num_maskmem=3, max_cond=2, max_ptrs=4)
    bank = mb.init_bank(spec, 1)
    bank = write_frames(spec, bank, range(6), cond_frames={0})
    spatial_pos = jnp.zeros((spec.mem_spatial, spec.mem_dim))
    tpos = jnp.zeros((spec.num_maskmem, spec.mem_dim))
    memory, _, valid, _, tdiff = mb.read_bank(spec, bank, 6, tpos, spatial_pos)
    tok = spec.tokens_per_ptr
    for s in range(spec.num_ptr_slots):
        if bool(valid[0, spec.num_spatial_tokens + s * tok]):
            frame = float(memory[0, spec.num_spatial_tokens + s * tok, 0])
            assert int(tdiff[0, s]) == abs(6 - int(frame))


def test_memory_attention_mask_invariance(rng):
    """Garbage in masked memory slots must not change the output."""
    cfg = MemoryAttentionConfig(d_model=32, num_layers=2, dim_feedforward=64,
                                kv_in_dim=8, rope_feat_sizes=(4, 4))
    params = mem.memory_attention_init(jax.random.PRNGKey(0), cfg)
    B, N, M = 1, 16, 24  # 16 q tokens (4x4), 2 frames of 8? -> use spatial 16*1 + 8 ptr
    curr = jnp.asarray(rng.standard_normal((B, N, 32)).astype(np.float32))
    curr_pos = jnp.asarray(rng.standard_normal((B, N, 32)).astype(np.float32))
    memory = jnp.asarray(rng.standard_normal((B, 2 * N + 8, 8)).astype(np.float32))
    mpos = jnp.asarray(rng.standard_normal((B, 2 * N + 8, 8)).astype(np.float32))
    valid = jnp.ones((B, 2 * N + 8), bool)
    valid = valid.at[:, N:2 * N].set(False)  # second frame invalid
    valid = valid.at[:, 2 * N + 4:].set(False)  # half the ptr tokens invalid

    out1 = mem.memory_attention_apply(params, cfg, curr, memory, curr_pos, mpos,
                                      q_hw=(4, 4), num_obj_ptr_tokens=8, kv_mask=valid)
    garbage = memory.at[:, N:2 * N].set(1e3).at[:, 2 * N + 4:].set(-1e3)
    out2 = mem.memory_attention_apply(params, cfg, curr, garbage, curr_pos, mpos,
                                      q_hw=(4, 4), num_obj_ptr_tokens=8, kv_mask=valid)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_memory_encoder_shapes(rng):
    from medsam2_tpu.configs import MemoryEncoderConfig
    cfg = MemoryEncoderConfig()
    params = mem.memory_encoder_init(jax.random.PRNGKey(1), cfg)
    pix = jnp.asarray(rng.standard_normal((2, 4, 4, 256)).astype(np.float32))
    masks = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    feats, pos = mem.memory_encoder_apply(params, cfg, pix, masks)
    assert feats.shape == (2, 4, 4, 64)
    assert pos.shape == (4, 4, 64)


def test_kcache_layer_equivalence(rng):
    """The roped-key cache path (write-time projected+rotated memory keys +
    session-static positional keys) must reproduce the direct path:
    rope(Wk(mem + pos) + b) == rope(Wk mem) + rope(Wk pos + b) by linearity of
    the rotation."""
    cfg = MemoryAttentionConfig(d_model=32, num_layers=2, dim_feedforward=64,
                                kv_in_dim=8, rope_feat_sizes=(4, 4))
    params = mem.memory_attention_init(jax.random.PRNGKey(0), cfg)
    B, N = 1, 16  # 4x4 q grid
    Fa, P = 2, N  # two memory frames of P spatial tokens
    n_ptr = 8
    curr = jnp.asarray(rng.standard_normal((B, N, 32)).astype(np.float32))
    curr_pos = jnp.asarray(rng.standard_normal((B, N, 32)).astype(np.float32))
    mem_sp = jnp.asarray(rng.standard_normal((B, Fa, P, 8)).astype(np.float32))
    pos_sp = jnp.asarray(rng.standard_normal((Fa, P, 8)).astype(np.float32))
    ptr = jnp.asarray(rng.standard_normal((B, n_ptr, 8)).astype(np.float32))
    memory = jnp.concatenate([mem_sp.reshape(B, Fa * P, 8), ptr], axis=1)
    mpos = jnp.concatenate(
        [jnp.broadcast_to(pos_sp.reshape(1, Fa * P, 8), (B, Fa * P, 8)),
         jnp.zeros((B, n_ptr, 8))], axis=1)
    valid = jnp.ones((B, Fa * P + n_ptr), bool)

    direct = mem.memory_attention_apply(
        params, cfg, curr, memory, curr_pos, mpos,
        q_hw=(4, 4), num_obj_ptr_tokens=n_ptr, kv_mask=valid)

    # cache halves, fp32 so the comparison is tight
    mem_part = jnp.stack(
        [mem.precompute_memory_kcache(params, cfg, mem_sp[:, f], (4, 4),
                                      dtype=jnp.float32)
         for f in range(Fa)], axis=1)                     # [B, Fa, L, P, C]
    pos_part = mem.precompute_pos_kcache(params, cfg, pos_sp, (4, 4),
                                         dtype=jnp.float32)  # [Fa, L, P, C]
    cached = mem.memory_attention_apply(
        params, cfg, curr, memory, curr_pos, mpos,
        q_hw=(4, 4), num_obj_ptr_tokens=n_ptr, kv_mask=valid,
        k_cache=(mem_part, pos_part))
    np.testing.assert_allclose(np.asarray(cached), np.asarray(direct),
                               rtol=2e-4, atol=2e-5)


def test_kv_cached_attention_kernel_parity(rng):
    """The storage-order Pallas kernel (interpret mode) must match the XLA
    assembly fallback exactly: same storage-order kv, per-slot pos rows via
    scalar-prefetch indices, masked stale slots, and the object-pointer tail
    block."""
    from medsam2_tpu.ops.attention import kv_cached_attention

    B, F, L, P, C = 2, 4, 2, 16, 8
    Rr, Dv, Nq, Nptr = 5, 4, 16, 4
    f32 = np.float32
    q = jnp.asarray(rng.standard_normal((B, Nq, C)).astype(f32))
    kcache = jnp.asarray(rng.standard_normal((B, F, L, P, C)).astype(f32))
    pos_rows = jnp.asarray(rng.standard_normal((Rr, L, P, C)).astype(f32))
    row_of_slot = jnp.asarray(np.array([0, 3, 1, 4], np.int32))
    ptr_k = jnp.asarray(rng.standard_normal((B, Nptr, C)).astype(f32))
    v_slots = jnp.asarray(rng.standard_normal((B, F, P, Dv)).astype(f32))
    ptr_v = jnp.asarray(rng.standard_normal((B, Nptr, Dv)).astype(f32))
    # slot 2 fully masked for batch 0; assorted ptr masking
    mask = np.ones((B, F * P + Nptr), bool)
    mask[0, 2 * P:3 * P] = False
    mask[0, F * P + 2:] = False
    mask[1, F * P:] = False      # ptr block fully masked (skip path)
    mask = jnp.asarray(mask)

    for layer in range(L):
        ref = kv_cached_attention(q, kcache, pos_rows, row_of_slot, ptr_k,
                                  v_slots, ptr_v, mask, layer, force="xla")
        got = kv_cached_attention(q, kcache, pos_rows, row_of_slot, ptr_k,
                                  v_slots, ptr_v, mask, layer,
                                  force="interpret")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)


def test_kv_cached_attention_kernel_multiblock(rng):
    """Multi-block grid coverage for the storage-order kernel: several kv
    blocks per slot (ppb > 1), several q blocks, and a ptr tail narrower than
    the block — the index arithmetic the single-block parity test never hits."""
    from medsam2_tpu.ops.attention import kv_cached_attention

    B, F, L, P, C = 1, 3, 1, 32, 8
    Rr, Dv, Nq, Nptr = 4, 4, 16, 3
    f32 = np.float32
    q = jnp.asarray(rng.standard_normal((B, Nq, C)).astype(f32))
    kcache = jnp.asarray(rng.standard_normal((B, F, L, P, C)).astype(f32))
    pos_rows = jnp.asarray(rng.standard_normal((Rr, L, P, C)).astype(f32))
    row_of_slot = jnp.asarray(np.array([2, 0, 3], np.int32))
    ptr_k = jnp.asarray(rng.standard_normal((B, Nptr, C)).astype(f32))
    v_slots = jnp.asarray(rng.standard_normal((B, F, P, Dv)).astype(f32))
    ptr_v = jnp.asarray(rng.standard_normal((B, Nptr, Dv)).astype(f32))
    mask = np.ones((B, F * P + Nptr), bool)
    mask[0, P:2 * P] = False          # slot 1 stale
    mask[0, F * P + 1] = False        # one ptr token masked
    mask = jnp.asarray(mask)

    ref = kv_cached_attention(q, kcache, pos_rows, row_of_slot, ptr_k,
                              v_slots, ptr_v, mask, 0, force="xla")
    got = kv_cached_attention(q, kcache, pos_rows, row_of_slot, ptr_k,
                              v_slots, ptr_v, mask, 0, block_q=8, block_k=8,
                              force="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_kv_cached_attention_adaptive_blocks(rng):
    """P with no power-of-two divisor at the requested block size (the 768-px
    bank shape is P=2304): the kernel must pick the largest aligned divisor
    instead of silently falling back to XLA."""
    from medsam2_tpu.ops.attention import kv_cached_attention

    B, F, L, P, C = 1, 2, 1, 24, 8
    Rr, Dv, Nq, Nptr = 3, 4, 24, 2
    f32 = np.float32
    q = jnp.asarray(rng.standard_normal((B, Nq, C)).astype(f32))
    kcache = jnp.asarray(rng.standard_normal((B, F, L, P, C)).astype(f32))
    pos_rows = jnp.asarray(rng.standard_normal((Rr, L, P, C)).astype(f32))
    row_of_slot = jnp.asarray(np.array([1, 2], np.int32))
    ptr_k = jnp.asarray(rng.standard_normal((B, Nptr, C)).astype(f32))
    v_slots = jnp.asarray(rng.standard_normal((B, F, P, Dv)).astype(f32))
    ptr_v = jnp.asarray(rng.standard_normal((B, Nptr, Dv)).astype(f32))
    mask = np.ones((B, F * P + Nptr), bool)
    mask[0, P + 5:P + 11] = False
    mask = jnp.asarray(mask)

    ref = kv_cached_attention(q, kcache, pos_rows, row_of_slot, ptr_k,
                              v_slots, ptr_v, mask, 0, force="xla")
    # block 16 does not divide P=24 -> adaptive choice must land on 8
    got = kv_cached_attention(q, kcache, pos_rows, row_of_slot, ptr_k,
                              v_slots, ptr_v, mask, 0, block_q=16, block_k=16,
                              force="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
