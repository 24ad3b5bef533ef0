"""Fixed-slot similarity-addressed memory bank — the 2D training scheme's
replacement for temporal memory (reference: ``func_2d/function.py:87-243``).

Semantics reproduced:
- **Read** (``:92-125``): L2-normalize stored image embeddings and the current
  batch's embeddings, softmax the cosine similarities over bank slots, sample
  ``num_samples`` slots per batch item (categorical with replacement), and
  concatenate the sampled memory features as the cross-attention memory.
- **Write** (``:204-243``): while not full, append each batch item; when full, for
  each item find the bank entry least similar to the new feature
  (min-similarity index), then that entry's most similar *other* entry
  (max-similarity index); replace the latter iff the new feature is less
  similar than that internal pair AND the new IoU is within 0.1 of the
  replaced entry's ("soft IoU" rule).

TPU redesign: K static slots with a validity mask; the write loop runs as a
``lax.fori_loop`` over the batch; the multinomial needs an explicit PRNG key.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def init_similarity_bank(num_slots: int, mem_spatial: int, mem_dim: int,
                         embed_dim: int, dtype=jnp.float32):
    K = num_slots
    return {
        "feats": jnp.zeros((K, mem_spatial, mem_dim), dtype),
        "iou": jnp.zeros((K,), jnp.float32),
        "embeds": jnp.zeros((K, embed_dim), dtype),
        "valid": jnp.zeros((K,), bool),
    }


def similarity_logits(bank, cur_embeds: jnp.ndarray) -> jnp.ndarray:
    """Cosine-similarity sampling logits over bank slots (``:101-109``):
    softmax of these == the reference's ``F.softmax(mm(norms), dim=1)``
    multinomial weights. Invalid slots get -inf."""
    eps = 1e-12
    bank_norm = bank["embeds"] / jnp.maximum(
        jnp.linalg.norm(bank["embeds"], axis=1, keepdims=True), eps)
    cur_norm = cur_embeds / jnp.maximum(
        jnp.linalg.norm(cur_embeds, axis=1, keepdims=True), eps)
    sim = cur_norm @ bank_norm.T  # [B, K]
    return jnp.where(bank["valid"][None, :], sim, -jnp.inf)


def read_similarity_bank(bank, cur_embeds: jnp.ndarray, key,
                         num_samples: int,
                         indices: jnp.ndarray | None = None,
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample memories for each batch item.

    cur_embeds: [B, E] flattened current image embeddings.
    ``indices`` [B, num_samples] overrides the categorical draw (used by the
    executed-reference differential to force the torch multinomial's draws).
    Returns (memory [B, num_samples * P, D], slot indices [B, num_samples]).
    """
    logits = similarity_logits(bank, cur_embeds)
    if indices is None:
        idx = jax.random.categorical(key, logits, axis=-1,
                                     shape=(num_samples, cur_embeds.shape[0])).T  # [B, S]
    else:
        idx = indices
    mem = bank["feats"][idx]  # [B, S, P, D]
    B, S, P, D = mem.shape
    return mem.reshape(B, S * P, D), idx


def write_similarity_bank(bank, feats: jnp.ndarray, iou: jnp.ndarray,
                          embeds: jnp.ndarray, bank_size: int | None = None):
    """Insert/replace a batch of memories. feats [B, P, D]; iou scalar (the
    reference stores the batch-mean IoU for every entry, ``:209``);
    embeds [B, E].

    ``bank_size`` is the reference's *logical* ``args.memory_bank_size``
    threshold (default: the static slot count K). The reference checks
    ``len(bank) < memory_bank_size`` ONCE per step and then appends the whole
    batch (``function.py:204-210``), so the bank can overshoot the nominal
    size by up to B-1 and then stays there; callers that want exact parity at
    non-divisible batch sizes allocate ``K = B * ceil(size / B)`` static slots
    and pass ``bank_size=size``."""
    eps = 1e-12
    B = feats.shape[0]
    K = bank["feats"].shape[0]
    size = K if bank_size is None else min(bank_size, K)
    # batch-level append/replace decision, taken before the batch loop
    append_mode = jnp.sum(bank["valid"].astype(jnp.int32)) < size

    def body(i, bank):
        count = jnp.sum(bank["valid"].astype(jnp.int32))
        new_feat = feats[i]
        new_flat = new_feat.reshape(-1)
        new_norm = new_flat / jnp.maximum(jnp.linalg.norm(new_flat), eps)

        bank_flat = bank["feats"].reshape(K, -1)
        bank_norm = bank_flat / jnp.maximum(
            jnp.linalg.norm(bank_flat, axis=1, keepdims=True), eps)
        pair_sim = bank_norm @ bank_norm.T
        pair_sim = jnp.where(jnp.eye(K, dtype=bool), -jnp.inf, pair_sim)
        pair_sim = jnp.where(bank["valid"][None, :] & bank["valid"][:, None],
                             pair_sim, -jnp.inf)

        new_sim = bank_norm @ new_norm  # [K]
        new_sim_masked = jnp.where(bank["valid"], new_sim, jnp.inf)
        min_idx = jnp.argmin(new_sim_masked)
        max_idx = jnp.argmax(pair_sim[min_idx])

        should_replace = (
            (new_sim_masked[min_idx] < pair_sim[min_idx, max_idx])
            & (iou > bank["iou"][max_idx] - 0.1)
        )
        # append while in (pre-batch) append mode, else the replacement
        # target (if allowed); count is capped by K static slots
        slot = jnp.where(append_mode, jnp.minimum(count, K - 1), max_idx)
        do_write = (append_mode & (count < K)) | ((~append_mode) & should_replace)

        def write(bank):
            return {
                "feats": jax.lax.dynamic_update_index_in_dim(
                    bank["feats"], new_feat.astype(bank["feats"].dtype), slot, 0),
                "iou": jax.lax.dynamic_update_index_in_dim(
                    bank["iou"], jnp.float32(iou), slot, 0),
                "embeds": jax.lax.dynamic_update_index_in_dim(
                    bank["embeds"], embeds[i].astype(bank["embeds"].dtype), slot, 0),
                "valid": bank["valid"].at[slot].set(True),
            }

        return jax.lax.cond(do_write, write, lambda b: dict(b), bank)

    return jax.lax.fori_loop(0, B, body, dict(bank))
