"""Fixed-shape temporal memory bank — the XLA-native replacement for the
reference's dict-driven inference state.

The reference keeps ``output_dict = {cond_frame_outputs: {t: ...},
non_cond_frame_outputs: {t: ...}}`` and selects memories with host-side Python
(``sam2_base.py:494-663``, ``sam2_video_predictor.py:72-101``). On TPU that
becomes a pytree of fixed-shape ring buffers carried through ``lax.scan``:

- conditioning memories: append-once slots [B, Mc, P, D] (prompted frames),
- non-conditioning memories: ring of the last R frames, slot = t % R,
- object pointers: cond slots + a ring of the last (max_obj_ptrs - 1) frames,

each with stored frame indices and validity masks. Readout reproduces the
reference's t_pos/stride-r selection arithmetic (``sam2_base.py:529-564``)
as gathers; correctness does not depend on token ordering because memory
attention is permutation-invariant given per-token positional embeddings
(spatial RoPE tables tile identically per frame; t_pos embeddings travel with
their slots; pointer tokens are RoPE-excluded).

Capacity caps (vs the reference's unbounded dicts): ``max_cond_frames`` bounds
prompted frames per propagation (the reference grows memory without bound as
prompts accumulate — at 8 prompts + 6 recent frames the attention already spans
~57k tokens at 1024 px). Cond writes beyond the cap evict the slot *farthest*
from the new frame, so the retained set matches the reference's
``select_closest_cond_frames`` (``sam2_utils.py:15-57``) with the current frame
as the anchor. The video predictor sizes ``max_cond_frames`` to the session's
actual prompt count, so memory attention never pays for unused cond kv slots.

Object pointers are NOT capped at ``max_obj_ptrs``: the reference appends all
selected cond-frame pointers *plus* up to ``min(num_frames, max_obj_ptrs) - 1``
recent non-cond pointers (``sam2_base.py:583-635``), so pointer slots here are
``max_cond_frames + max_obj_ptrs - 1`` with validity masks.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config


@dataclasses.dataclass(frozen=True)
class BankSpec:
    """Static geometry of the memory bank."""

    num_maskmem: int          # total frames attended (1 current-adjacent + 6 past)
    max_cond_frames: int      # static cap on conditioning (prompted) frames
    mem_spatial: int          # P: tokens per memory frame (H*W of memory features)
    mem_dim: int              # D: memory channel dim (64)
    hidden_dim: int           # C: obj ptr dim (256)
    max_obj_ptrs: int         # max pointers in cross-attention (16)
    temporal_stride: int = 1  # the `r` eval stride

    @classmethod
    def from_config(cls, cfg: SAM2Config, max_cond_frames: int = 8):
        # Honor ``max_cond_frames_in_attn`` (the reference's top-k closest
        # cond-frame cap at attention time, ``sam2_base.py:516-528``): with the
        # closest-to-current eviction policy in :func:`write_bank`, a bank
        # capped at that many cond slots retains exactly the frames
        # ``select_closest_cond_frames`` would select.
        if cfg.max_cond_frames_in_attn >= 0:
            max_cond_frames = max(1, min(max_cond_frames,
                                         cfg.max_cond_frames_in_attn))
        s = cfg.image_size // cfg.backbone_stride
        return cls(
            num_maskmem=cfg.num_maskmem,
            max_cond_frames=max_cond_frames,
            mem_spatial=s * s,
            mem_dim=cfg.mem_dim,
            hidden_dim=cfg.hidden_dim,
            max_obj_ptrs=cfg.max_obj_ptrs_in_encoder,
            temporal_stride=cfg.memory_temporal_stride_for_eval,
        )

    @property
    def noncond_ring(self) -> int:
        # Must hold every frame the stride-r selection can reach back to:
        # t_pos=1 reaches (num_maskmem - 2) * r + 1 frames back (+ slack for t-1).
        return max((self.num_maskmem - 2) * self.temporal_stride + 2, self.num_maskmem - 1)

    @property
    def ptr_ring(self) -> int:
        return max(self.max_obj_ptrs - 1, 1)

    @property
    def num_frames_attended(self) -> int:
        return self.max_cond_frames + self.num_maskmem - 1

    @property
    def num_spatial_tokens(self) -> int:
        return self.num_frames_attended * self.mem_spatial

    @property
    def tokens_per_ptr(self) -> int:
        return self.hidden_dim // self.mem_dim

    @property
    def num_ptr_slots(self) -> int:
        # all cond pointers + up to (max_obj_ptrs - 1) recent non-cond pointers
        # (the reference has no total cap, sam2_base.py:594-612)
        return self.max_cond_frames + self.max_obj_ptrs - 1

    @property
    def num_ptr_tokens(self) -> int:
        return self.num_ptr_slots * self.tokens_per_ptr

    @property
    def total_tokens(self) -> int:
        return self.num_spatial_tokens + self.num_ptr_tokens


def init_bank(spec: BankSpec, batch: int, dtype=jnp.float32,
              kcache_shape: Tuple[int, int] = (0, 0),
              kcache_dtype=jnp.bfloat16):
    """Empty bank pytree for ``batch`` objects.

    ``kcache_shape`` = (num_layers, d_model): when non-zero, the bank also
    carries per-slot *roped-key caches* — the memory part of each
    cross-attention layer's k tensor, projected + RoPE-rotated once at write
    time (:func:`medsam2_tpu.core.memory.precompute_memory_kcache`) instead of
    re-computed over the whole ~29k-token memory every tracked frame."""
    B = batch
    bank = {
        "cond_feats": jnp.zeros((B, spec.max_cond_frames, spec.mem_spatial, spec.mem_dim), dtype),
        "cond_frame_idx": -jnp.ones((B, spec.max_cond_frames), jnp.int32),
        "cond_obj_ptr": jnp.zeros((B, spec.max_cond_frames, spec.hidden_dim), dtype),
        "cond_count": jnp.zeros((B,), jnp.int32),
        "noncond_feats": jnp.zeros((B, spec.noncond_ring, spec.mem_spatial, spec.mem_dim), dtype),
        "noncond_frame_idx": -jnp.ones((B, spec.noncond_ring), jnp.int32),
        "ptr_ring": jnp.zeros((B, spec.ptr_ring, spec.hidden_dim), dtype),
        "ptr_frame_idx": -jnp.ones((B, spec.ptr_ring), jnp.int32),
    }
    L, C = kcache_shape
    if L > 0:
        # One unified buffer in STORAGE order: slots [0, Mc) are cond frames,
        # slots [Mc, Mc+R) the non-cond ring. Attention consumes it in this
        # order directly (permutation-invariance: each slot carries its own
        # positional row + validity), so readout never gathers/reorders the
        # ~60 MB cache — see :func:`kv_storage_layout`.
        bank["kcache"] = jnp.zeros(
            (B, spec.max_cond_frames + spec.noncond_ring, L, spec.mem_spatial, C),
            kcache_dtype)
    return bank


def write_bank(spec: BankSpec, bank, frame_idx, maskmem_feats, obj_ptr, is_cond: bool,
               kcache=None):
    """Store a frame's memory. ``frame_idx`` scalar int32 (same for the batch);
    ``maskmem_feats`` [B, P, D]; ``obj_ptr`` [B, C]; ``is_cond`` static;
    ``kcache`` [B, L, P, d_model] optional roped-key cache for this frame
    (required iff the bank was built with one)."""
    if ("kcache" in bank) != (kcache is not None):
        raise ValueError("bank kcache presence and write kcache argument disagree")
    bank = dict(bank)
    frame_idx = jnp.asarray(frame_idx, jnp.int32)
    if is_cond:
        # Slot choice: re-prompting a stored frame overwrites its slot; else
        # fill an empty slot; else evict the slot farthest from the new frame
        # (keeps the closest-to-current cond frames, matching the selection of
        # ``select_closest_cond_frames``, sam2_utils.py:15-57).
        stored = bank["cond_frame_idx"][0]
        big = jnp.iinfo(jnp.int32).max
        key = jnp.where(stored == frame_idx, big,
                        jnp.where(stored < 0, big - 1, jnp.abs(stored - frame_idx)))
        slot = jnp.argmax(key)
        bank["cond_feats"] = jax.lax.dynamic_update_index_in_dim(
            bank["cond_feats"], maskmem_feats.astype(bank["cond_feats"].dtype), slot, 1)
        bank["cond_frame_idx"] = jax.lax.dynamic_update_index_in_dim(
            bank["cond_frame_idx"], jnp.full((bank["cond_frame_idx"].shape[0],), frame_idx), slot, 1)
        bank["cond_obj_ptr"] = jax.lax.dynamic_update_index_in_dim(
            bank["cond_obj_ptr"], obj_ptr.astype(bank["cond_obj_ptr"].dtype), slot, 1)
        bank["cond_count"] = jnp.minimum(bank["cond_count"] + 1, spec.max_cond_frames)
        if kcache is not None:
            bank["kcache"] = jax.lax.dynamic_update_index_in_dim(
                bank["kcache"], kcache.astype(bank["kcache"].dtype), slot, 1)
    else:
        slot = jnp.remainder(frame_idx, spec.noncond_ring)
        bank["noncond_feats"] = jax.lax.dynamic_update_index_in_dim(
            bank["noncond_feats"], maskmem_feats.astype(bank["noncond_feats"].dtype), slot, 1)
        if kcache is not None:
            bank["kcache"] = jax.lax.dynamic_update_index_in_dim(
                bank["kcache"], kcache.astype(bank["kcache"].dtype),
                spec.max_cond_frames + slot, 1)
        bank["noncond_frame_idx"] = jax.lax.dynamic_update_index_in_dim(
            bank["noncond_frame_idx"], jnp.full((bank["noncond_frame_idx"].shape[0],), frame_idx), slot, 1)
        pslot = jnp.remainder(frame_idx, spec.ptr_ring)
        bank["ptr_ring"] = jax.lax.dynamic_update_index_in_dim(
            bank["ptr_ring"], obj_ptr.astype(bank["ptr_ring"].dtype), pslot, 1)
        bank["ptr_frame_idx"] = jax.lax.dynamic_update_index_in_dim(
            bank["ptr_frame_idx"], jnp.full((bank["ptr_frame_idx"].shape[0],), frame_idx), pslot, 1)
    return bank


def clear_noncond_window(bank, center: int, radius: int):
    """Invalidate every non-cond memory (feature ring + pointer ring) whose
    stored frame index lies in ``[center - radius, center + radius]`` — the
    ring-buffer equivalent of the reference's
    ``_clear_non_cond_mem_around_input``
    (``sam2_video_predictor.py:1424-1440``), which pops those frames from its
    persistent dict so later readouts skip them (the stride-r target
    arithmetic is unchanged; missing frames simply aren't attended,
    ``sam2_base.py:558-568``). Setting the stored index to -1 makes every
    readout's ``stored == target`` validity test fail for those slots; stale
    feature/kcache payloads stay in place but masked. Cond memories are
    untouched (the reference only pops ``non_cond_frame_outputs``)."""
    bank = dict(bank)
    for key in ("noncond_frame_idx", "ptr_frame_idx"):
        stored = bank[key]
        hit = (stored >= center - radius) & (stored <= center + radius)
        bank[key] = jnp.where(hit, jnp.int32(-1), stored)
    return bank


def _noncond_target_frames(spec: BankSpec, frame_idx, track_in_reverse: bool):
    """The reference's stride-r previous-frame arithmetic (``sam2_base.py:535-558``)
    for t_pos = 1..num_maskmem-1, vectorized. Returns [num_maskmem-1] int32."""
    r = spec.temporal_stride
    t_pos = jnp.arange(1, spec.num_maskmem, dtype=jnp.int32)
    t_rel = spec.num_maskmem - t_pos
    if not track_in_reverse:
        last = frame_idx - 1
        strided = ((frame_idx - 2) // r) * r - (t_rel - 2) * r
    else:
        last = frame_idx + 1
        strided = -((-(frame_idx + 2)) // r) * r + (t_rel - 2) * r
    return jnp.where(t_rel == 1, last, strided)


def read_kcache(spec: BankSpec, bank, frame_idx,
                track_in_reverse: bool = False) -> jnp.ndarray:
    """Gather the roped-key cache in read order (cond slots first, then the
    stride-r non-cond targets — the same slot arithmetic as
    :func:`read_bank`). Returns [B, Fa, L, P, C]. Invalid/stale slots carry
    stale-but-finite values; the attention kv mask from :func:`read_bank`
    excludes them."""
    frame_idx = jnp.asarray(frame_idx, jnp.int32)
    targets = _noncond_target_frames(spec, frame_idx, track_in_reverse)
    slots = jnp.remainder(jnp.clip(targets, 0, None), spec.noncond_ring)
    Mc = spec.max_cond_frames
    nc = jnp.take(bank["kcache"], Mc + slots, axis=1)
    return jnp.concatenate([bank["kcache"][:, :Mc], nc], axis=1)


def kv_storage_layout(spec: BankSpec, bank, frame_idx,
                      track_in_reverse: bool = False):
    """Storage-order attention metadata: instead of gathering the ~60 MB
    roped-key cache into recency order every frame (:func:`read_kcache`),
    attention consumes the bank buffer AS STORED and this function supplies,
    per storage slot, (a) which session-static positional row it carries and
    (b) whether it is attended at all. Attention over a kv set is invariant to
    slot order given per-slot positions + validity masks.

    Returns (row_of_slot [F_tot] int32 into the ``pos_kcache`` rows,
    slot_valid [B, F_tot] bool). F_tot = max_cond_frames + noncond_ring.
    Row/validity arithmetic is the same target-frame selection
    (``sam2_base.py:529-564``) as :func:`read_bank`; a ring slot is valid iff
    the frame it currently holds is one of the stride-r targets. Rows are
    shared across the batch (frames are written batch-uniformly).
    """
    frame_idx = jnp.asarray(frame_idx, jnp.int32)
    Mc = spec.max_cond_frames
    targets = _noncond_target_frames(spec, frame_idx, track_in_reverse)  # [F]
    stored = bank["noncond_frame_idx"]                                   # [B, R]
    eq = (stored[:, :, None] == targets[None, None, :]) & (targets >= 0)[None, None, :]
    ring_valid = jnp.any(eq, axis=-1)                                    # [B, R]
    # row of ring slot s = Mc + (index of the target it matches); clamped row
    # for invalid slots is harmless (masked out).
    ring_row = Mc + jnp.argmax(eq[0], axis=-1).astype(jnp.int32)         # [R]
    cond_valid = bank["cond_frame_idx"] >= 0                             # [B, Mc]
    row_of_slot = jnp.concatenate(
        [jnp.arange(Mc, dtype=jnp.int32), ring_row])
    slot_valid = jnp.concatenate([cond_valid, ring_valid], axis=1)
    return row_of_slot, slot_valid


def pos_kcache_rows(spec: BankSpec, maskmem_tpos_enc: jnp.ndarray,
                    spatial_pos: jnp.ndarray) -> jnp.ndarray:
    """The per-read-order-slot positional rows [Fa, P, mem_dim] whose roped
    projection is the session-static half of the k cache: spatial sine pos +
    the slot's t_pos embedding (t_pos assignment per read position is static —
    cond slots use index num_maskmem-1, non-cond position j uses
    ``num_maskmem - j - 2``; cf. :func:`read_bank`)."""
    D = spec.mem_dim
    cond_tpos = maskmem_tpos_enc[spec.num_maskmem - 1]
    tpos_idx = spec.num_maskmem - jnp.arange(1, spec.num_maskmem) - 1
    nc_tpos = maskmem_tpos_enc[tpos_idx]
    tpos = jnp.concatenate(
        [jnp.broadcast_to(cond_tpos[None], (spec.max_cond_frames, D)), nc_tpos],
        axis=0)                                                  # [Fa, D]
    return spatial_pos[None, :, :] + tpos[:, None, :]


def read_ptrs(
    spec: BankSpec,
    bank,
    frame_idx,
    track_in_reverse: bool = False,
    obj_ptrs_in_past_only: bool = False,
    num_frames: int = 2 ** 30,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Object-pointer readout (``sam2_base.py:583-635``): all cond pointers +
    up to min(num_frames, max_obj_ptrs) - 1 recent non-cond pointers, split
    into mem_dim tokens. Returns (ptr_tokens [B, Nt, D], ptr_token_valid
    [B, Nt] bool, ptr_tdiff [B, num_ptr_slots] int32)."""
    B = bank["cond_obj_ptr"].shape[0]
    D = spec.mem_dim
    frame_idx = jnp.asarray(frame_idx, jnp.int32)
    # cond pointers (optionally only past frames, sam2_base.py:587-594)
    cond_ptr_valid = bank["cond_frame_idx"] >= 0
    if obj_ptrs_in_past_only:
        if track_in_reverse:
            cond_ptr_valid = cond_ptr_valid & (bank["cond_frame_idx"] >= frame_idx)
        else:
            cond_ptr_valid = cond_ptr_valid & (bank["cond_frame_idx"] <= frame_idx)
    # non-cond pointers from the last min(num_frames, max_obj_ptrs) - 1 frames
    # (the reference loop range, sam2_base.py:585,604-612; num_frames is static)
    eff_max_ptrs = min(int(num_frames), spec.max_obj_ptrs)
    t_diff = jnp.arange(1, spec.max_obj_ptrs, dtype=jnp.int32)
    ptr_targets = frame_idx + t_diff if track_in_reverse else frame_idx - t_diff
    ptr_in_range = (ptr_targets >= 0) & (ptr_targets < num_frames) & (t_diff < eff_max_ptrs)
    pslots = jnp.remainder(jnp.clip(ptr_targets, 0, None), spec.ptr_ring)
    ring_ptrs = jnp.take(bank["ptr_ring"], pslots, axis=1)           # [B, F-1, C]
    ring_stored = jnp.take(bank["ptr_frame_idx"], pslots, axis=1)
    ring_valid = (ring_stored == ptr_targets[None, :]) & ptr_in_range[None, :]
    # A frame can be both cond and in the ptr window; the reference takes the
    # cond pointer and skips the dict fallback — dedupe by masking ring hits
    # that match any valid cond frame index.
    dup = (ring_stored[:, :, None] == bank["cond_frame_idx"][:, None, :]) & cond_ptr_valid[:, None, :]
    ring_valid = ring_valid & ~jnp.any(dup, axis=-1)

    # All cond pointers + ring pointers (the reference has no total cap).
    all_ptrs = jnp.concatenate([bank["cond_obj_ptr"], ring_ptrs], axis=1)  # [B, Np, C]
    all_valid = jnp.concatenate([cond_ptr_valid, ring_valid], axis=1)      # [B, Np]
    all_t = jnp.concatenate([bank["cond_frame_idx"], ring_stored], axis=1)
    ptr_tdiff = jnp.where(all_valid, jnp.abs(all_t - frame_idx), 0)        # [B, Np]

    tok = spec.tokens_per_ptr
    ptr_tokens = all_ptrs.reshape(B, spec.num_ptr_slots, tok, D).reshape(
        B, spec.num_ptr_tokens, D)
    ptr_token_valid = jnp.repeat(all_valid, tok, axis=1)
    return ptr_tokens, ptr_token_valid, ptr_tdiff


def read_bank(
    spec: BankSpec,
    bank,
    frame_idx,
    maskmem_tpos_enc: jnp.ndarray,   # [num_maskmem, D] learned temporal embeddings
    spatial_pos: jnp.ndarray,        # [P, D] sine pos enc of memory features
    track_in_reverse: bool = False,
    obj_ptrs_in_past_only: bool = False,
    num_frames: int = 2 ** 30,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, int, jnp.ndarray]:
    """Assemble the fixed-shape memory for cross-attention at ``frame_idx``.

    Returns (memory [B, T, D], memory_pos [B, T, D], valid [B, T] bool,
    num_obj_ptr_tokens static int, ptr_tdiff [B, num_ptr_slots] int32 — the
    per-pointer |t - frame_idx| used by the optional obj-ptr temporal sine
    encoding, ``sam2_base.py:600-634``). T = spec.total_tokens.
    """
    B = bank["cond_feats"].shape[0]
    P, D = spec.mem_spatial, spec.mem_dim
    frame_idx = jnp.asarray(frame_idx, jnp.int32)

    # --- conditioning frames (t_pos = 0) ---
    cond_valid = bank["cond_frame_idx"] >= 0                         # [B, Mc]
    cond_feats = bank["cond_feats"]                                  # [B, Mc, P, D]
    cond_tpos = maskmem_tpos_enc[spec.num_maskmem - 1]               # [D]

    # --- non-conditioning frames (t_pos = 1..num_maskmem-1) ---
    targets = _noncond_target_frames(spec, frame_idx, track_in_reverse)  # [F]
    slots = jnp.remainder(jnp.clip(targets, 0, None), spec.noncond_ring)
    nc_feats = jnp.take(bank["noncond_feats"], slots, axis=1)        # [B, F, P, D]
    stored = jnp.take(bank["noncond_frame_idx"], slots, axis=1)      # [B, F]
    nc_valid = (stored == targets[None, :]) & (targets[None, :] >= 0)
    # t_pos k gets embedding [num_maskmem - k - 1] (sam2_base.py:577-579)
    tpos_idx = spec.num_maskmem - jnp.arange(1, spec.num_maskmem) - 1
    nc_tpos = maskmem_tpos_enc[tpos_idx]                             # [F, D]

    feats = jnp.concatenate([cond_feats, nc_feats], axis=1)          # [B, Fa, P, D]
    frame_valid = jnp.concatenate([cond_valid, nc_valid], axis=1)    # [B, Fa]
    tpos = jnp.concatenate(
        [jnp.broadcast_to(cond_tpos[None], (spec.max_cond_frames, D)), nc_tpos], axis=0
    )                                                                # [Fa, D]

    Fa = spec.num_frames_attended
    memory_sp = feats.reshape(B, Fa * P, D)
    pos_sp = (spatial_pos[None, :, :] + tpos[:, None, :]).reshape(1, Fa * P, D)
    pos_sp = jnp.broadcast_to(pos_sp, (B, Fa * P, D)).astype(memory_sp.dtype)
    valid_sp = jnp.repeat(frame_valid, P, axis=1)

    # --- object pointers ---
    ptr_tokens, ptr_token_valid, ptr_tdiff = read_ptrs(
        spec, bank, frame_idx, track_in_reverse=track_in_reverse,
        obj_ptrs_in_past_only=obj_ptrs_in_past_only, num_frames=num_frames)
    ptr_pos = jnp.zeros((B, spec.num_ptr_tokens, D), memory_sp.dtype)

    memory = jnp.concatenate([memory_sp, ptr_tokens.astype(memory_sp.dtype)], axis=1)
    memory_pos = jnp.concatenate([pos_sp, ptr_pos], axis=1)
    valid = jnp.concatenate([valid_sp, ptr_token_valid], axis=1)
    return memory, memory_pos, valid, spec.num_ptr_tokens, ptr_tdiff
