"""Differential test of the 2D similarity bank against the *executed*
reference memory-bank logic (``func_2d/function.py:87-125`` read and
``:204-243`` write), lifted verbatim as the torch oracle below (the loop is
inlined in the reference's train/validation engines, so it cannot be invoked
in isolation; ``_ref_write``/``_ref_read`` are its tensor ops line for line,
with ``.cuda()`` dropped).

Pins, over N random steps at the reference's overshooting batch-append
semantics (the ``len(bank) < memory_bank_size`` check runs once per step and
then the whole batch appends, so the bank grows to ``B * ceil(size/B)``):

- write policy: bank contents (feats/iou/embeds multiset) match exactly after
  every step, including the min-similarity/max-similarity replacement rule
  and the soft-IoU gate;
- read policy: the multinomial sampling distribution matches exactly, and the
  assembled memory tensor matches exactly under forced (shared) draws.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from medsam2_tpu.state import similarity_bank as sb  # noqa: E402


# ---------------------------------------------------------------------------
# Reference oracle: func_2d/function.py:87-125 (read) and :204-243 (write)
# ---------------------------------------------------------------------------


def _ref_read_probs(memory_bank_list, vision_feats_flat):
    """``function.py:92-110``: softmax multinomial weights over bank entries.
    vision_feats_flat: [B, E]."""
    to_cat_image_embed = [element[3] for element in memory_bank_list]
    image_embed_stack_ori = torch.stack(to_cat_image_embed)
    image_embed_stack_ori = F.normalize(image_embed_stack_ori, p=2, dim=1)
    vision_feats_temp = F.normalize(vision_feats_flat, p=2, dim=1)
    similarity_scores = torch.mm(image_embed_stack_ori, vision_feats_temp.t()).t()
    return F.softmax(similarity_scores, dim=1)


def _ref_read_memory(memory_bank_list, sampled_indices):
    """``function.py:95-118``: assemble the sampled memory (seq-first
    [S*P, B, D])."""
    to_cat_memory = [element[0].flatten(2).permute(2, 0, 1)
                     for element in memory_bank_list]
    memory_stack_ori = torch.stack(to_cat_memory, dim=0)
    memory_stack_ori_new = memory_stack_ori[sampled_indices].squeeze(3).permute(1, 2, 0, 3)
    memory = memory_stack_ori_new.reshape(
        -1, memory_stack_ori_new.size(2), memory_stack_ori_new.size(3))
    return memory


def _ref_write(memory_bank_list, maskmem_features, maskmem_pos_enc,
               iou_predictions, image_embed, memory_bank_size):
    """``function.py:204-243`` verbatim (the validation engine at ``:527-566``
    is the same code with an extra similarity recompute)."""
    if len(memory_bank_list) < memory_bank_size:
        for batch in range(maskmem_features.size(0)):
            memory_bank_list.append([(maskmem_features[batch].unsqueeze(0)).detach(),
                                     (maskmem_pos_enc[batch].unsqueeze(0)).detach(),
                                     iou_predictions,
                                     image_embed[batch].reshape(-1).detach()])
    else:
        for batch in range(maskmem_features.size(0)):
            memory_bank_maskmem_features_flatten = [
                element[0].reshape(-1) for element in memory_bank_list]
            memory_bank_maskmem_features_flatten = torch.stack(
                memory_bank_maskmem_features_flatten)

            memory_bank_maskmem_features_norm = F.normalize(
                memory_bank_maskmem_features_flatten, p=2, dim=1)
            current_similarity_matrix = torch.mm(
                memory_bank_maskmem_features_norm,
                memory_bank_maskmem_features_norm.t())

            current_similarity_matrix_no_diag = current_similarity_matrix.clone()
            diag_indices = torch.arange(current_similarity_matrix_no_diag.size(0))
            current_similarity_matrix_no_diag[diag_indices, diag_indices] = float('-inf')

            single_key_norm = F.normalize(
                maskmem_features[batch].reshape(-1), p=2, dim=0).unsqueeze(1)
            similarity_scores = torch.mm(
                memory_bank_maskmem_features_norm, single_key_norm).squeeze()
            min_similarity_index = torch.argmin(similarity_scores)
            max_similarity_index = torch.argmax(
                current_similarity_matrix_no_diag[min_similarity_index])

            if similarity_scores[min_similarity_index] < \
                    current_similarity_matrix_no_diag[min_similarity_index][max_similarity_index]:
                if iou_predictions > memory_bank_list[max_similarity_index][2] - 0.1:
                    memory_bank_list.pop(max_similarity_index)
                    memory_bank_list.append([(maskmem_features[batch].unsqueeze(0)).detach(),
                                             (maskmem_pos_enc[batch].unsqueeze(0)).detach(),
                                             iou_predictions,
                                             image_embed[batch].reshape(-1).detach()])
    return memory_bank_list


# ---------------------------------------------------------------------------


def _our_bank_entries(bank):
    """(feats [P, D], iou, embed) tuples for valid slots."""
    valid = np.asarray(bank["valid"])
    feats = np.asarray(bank["feats"])
    ious = np.asarray(bank["iou"])
    embeds = np.asarray(bank["embeds"])
    return [(feats[i], float(ious[i]), embeds[i]) for i in np.where(valid)[0]]


def _match_ref_to_ours(memory_bank_list, bank):
    """Map reference entry index -> our slot index by exact embed identity."""
    our_embeds = np.asarray(bank["embeds"])
    valid = np.asarray(bank["valid"])
    mapping = []
    for element in memory_bank_list:
        e = element[3].numpy()
        hits = np.where(valid & np.all(our_embeds == e, axis=1))[0]
        assert len(hits) == 1, "bank contents diverged (embed not found once)"
        mapping.append(int(hits[0]))
    return np.asarray(mapping)


@pytest.mark.parametrize("B,size,steps", [(3, 4, 6), (2, 4, 5)])
def test_similarity_bank_differential(B, size, steps):
    D, H, W, E = 8, 4, 4, 32
    P = H * W
    rng = np.random.default_rng(0)
    K = B * int(np.ceil(size / B))  # the reference's overshoot ceiling

    memory_bank_list = []
    bank = sb.init_similarity_bank(K, P, D, E)
    pos_enc = torch.zeros(B, D, H, W)  # shared across entries (``:200-202``)

    for step in range(steps):
        feats_t = torch.from_numpy(
            rng.standard_normal((B, D, H, W)).astype(np.float32))
        iou = float(np.float32(rng.uniform(0.3, 1.0)))  # fp32-exact on both sides
        embeds_t = torch.from_numpy(
            rng.standard_normal((B, E)).astype(np.float32))

        # --- read differential (before writing, when the bank is non-empty) ---
        if memory_bank_list:
            cur = torch.from_numpy(rng.standard_normal((B, E)).astype(np.float32))
            ref_probs = _ref_read_probs(memory_bank_list, cur)
            mapping = _match_ref_to_ours(memory_bank_list, bank)

            logits = sb.similarity_logits(bank, jnp.asarray(cur.numpy()))
            our_probs_full = np.asarray(jax.nn.softmax(logits, axis=-1))
            # compare in reference entry order (our extra slots are invalid ->
            # probability 0 and excluded by the -inf mask)
            our_probs = our_probs_full[:, mapping]
            np.testing.assert_allclose(our_probs, ref_probs.numpy(),
                                       rtol=1e-5, atol=1e-6)
            assert np.allclose(our_probs_full.sum(axis=1), 1.0, atol=1e-5)

            # forced shared draws through both read paths
            S = B  # the reference samples num_samples=B per item (:110)
            ref_idx = torch.from_numpy(
                rng.integers(0, len(memory_bank_list), size=(B, S)))
            ref_mem = _ref_read_memory(memory_bank_list, ref_idx)  # [S*P, B, D]
            our_idx = jnp.asarray(mapping[ref_idx.numpy()])
            our_mem, _ = sb.read_similarity_bank(
                bank, jnp.asarray(cur.numpy()), None, S, indices=our_idx)
            # ref entry feats are [D, H, W]; ours are position-major [P, D]
            ref_mem_bfirst = ref_mem.permute(1, 0, 2).numpy()  # [B, S*P, D]
            np.testing.assert_array_equal(np.asarray(our_mem), ref_mem_bfirst)

        # --- write step on both sides ---
        memory_bank_list = _ref_write(memory_bank_list, feats_t, pos_enc,
                                      iou, embeds_t, size)
        feats_ours = jnp.asarray(
            feats_t.permute(0, 2, 3, 1).reshape(B, P, D).numpy())
        bank = sb.write_similarity_bank(bank, feats_ours, jnp.float32(iou),
                                        jnp.asarray(embeds_t.numpy()),
                                        bank_size=size)

        # --- bank contents match as a multiset, exactly ---
        assert len(memory_bank_list) == len(_our_bank_entries(bank))
        mapping = _match_ref_to_ours(memory_bank_list, bank)
        assert len(set(mapping.tolist())) == len(mapping)
        for j, element in enumerate(memory_bank_list):
            s = mapping[j]
            ref_feat = element[0][0].permute(1, 2, 0).reshape(P, D).numpy()
            np.testing.assert_array_equal(
                np.asarray(bank["feats"][s]), ref_feat)
            assert float(bank["iou"][s]) == pytest.approx(float(element[2]), abs=0)

    # the overshoot quirk is actually exercised: bank grew past `size`
    if size % B:
        assert len(memory_bank_list) > size
