"""Joint prompter + SAM2 nuclei training recipe — the TPU-native ``train_2d.py``
engine for MoNuSeg/CPM (reference: ``func_2d/function.py:27-266``, ``train_2d.py``).

Flow per batch: DPA-P2PNet predicts cell points -> predicted coords snap to the
chosen GT cell points (``find_nearest_points``, ``func_2d/function.py:680-703``)
-> SAM2 encodes the images, conditions on the cross-image similarity bank,
decodes one mask per cell (static ``image_indices`` gather replacing
``cell_nums`` repeat_interleave) -> memory encoder + bank write -> DETR
criterion (Hungarian host callback) + SAM mask losses -> joint AdamW with
prompter grad clipping.

Static shapes: cells are padded to ``max_cells`` per image with a validity
mask (the reference subsamples to <=150 cells per image anyway,
``func_2d/monuseg.py:123-137``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medsam2_tpu.configs import SAM2Config
from medsam2_tpu.core import layers, sam2_model
from medsam2_tpu.prompter.criterion import CriterionConfig, criterion_losses, mask_iou_loss
from medsam2_tpu.prompter.dpa_p2pnet import PrompterConfig, prompter_apply
from medsam2_tpu.prompter.matcher import MatcherConfig, hungarian_match
from medsam2_tpu.state import similarity_bank as sb
from medsam2_tpu.train.recipe_2d import Recipe2DConfig, encode_and_condition


@dataclasses.dataclass(frozen=True)
class NucleiRecipeConfig:
    prompter: PrompterConfig = PrompterConfig()
    matcher: MatcherConfig = MatcherConfig()
    criterion: CriterionConfig = CriterionConfig()
    memory_bank_size: int = 16
    max_cells: int = 64           # static per-image cell-slot cap
    lr: float = 1e-4
    weight_decay: float = 1e-4
    clip_grad: float = 0.1        # prompter grads only (func_2d/function.py:257-258)
    out_size: int = 256


def find_nearest_points(pred_coords: jnp.ndarray, gt_points: jnp.ndarray,
                        gt_valid: jnp.ndarray) -> jnp.ndarray:
    """For each chosen GT cell point, the nearest predicted coordinate
    (``func_2d/function.py:680-703``). [B, N, 2] x [B, M, 2] -> [B, M, 2]."""
    d = jnp.linalg.norm(
        pred_coords[:, None, :, :].astype(jnp.float32)
        - gt_points[:, :, None, :].astype(jnp.float32), axis=-1)  # [B, M, N]
    idx = jnp.argmin(d, axis=-1)
    nearest = jnp.take_along_axis(
        pred_coords, idx[..., None], axis=1)
    return jnp.where(gt_valid[..., None], nearest, 0.0)


def forward_nuclei(params, cfg: SAM2Config, rcfg: NucleiRecipeConfig, batch,
                   bank, key, bank_nonempty: bool, dropout_key=None):
    """Joint forward. batch:
      images       [B, S, S, 3]
      gt_points    [B, M, 2]   chosen cell centers (prefix-valid padding)
      gt_labels    [B, M]
      gt_valid     [B, M]
      gt_cell_masks [B, M, out, out]  per-cell binary masks
      gt_semantic  [B, S, S]
    Returns (prompter outputs, per-cell SAM logits [B, M, out, out], iou [B, M],
    nearest prompt points, new bank)."""
    B, S = batch["images"].shape[0], cfg.image_size
    M = rcfg.max_cells

    # dropout streams: [0] prompter heads, [1] memory attention. The
    # precompute matcher path re-derives stream [0] with the same split so the
    # Hungarian match sees the exact coords the grad step recomputes.
    dkp = dkm = None
    if dropout_key is not None:
        dkp, dkm = jax.random.split(dropout_key)
    outputs, _ = prompter_apply(
        params["prompter"], rcfg.prompter, batch["images"], None,
        dropout_key=dkp)

    nearest = find_nearest_points(outputs["pred_coords"], batch["gt_points"],
                                  batch["gt_valid"])
    nearest = jax.lax.stop_gradient(nearest)

    k1, _ = jax.random.split(key)
    image_embed, high_res, vision_feats = encode_and_condition(
        params["sam2"], cfg, batch["images"], bank, k1, bank_nonempty, B,
        dropout_key=dkm)

    # per-cell prompts: flatten [B, M] cells -> rows with image_indices.
    # Point labels are the 0-based cell CLASS, exactly as the reference feeds
    # them: train_sam passes labels_choose = type-1 = 0 for single-class
    # nuclei straight into the prompt encoder (func_2d/function.py:64,144;
    # monuseg.py:116), and validation hardcodes torch.zeros (:416) — i.e. the
    # model trains and evals with the NEGATIVE-point embedding. Preserved for
    # reference-checkpoint compatibility.
    coords = nearest.reshape(B * M, 1, 2)
    labels = jnp.where(batch["gt_valid"].reshape(B * M),
                       batch["gt_labels"].reshape(B * M).astype(jnp.int32),
                       -1)[:, None]
    sparse, dense = sam2_model.prompt_encoder.prompt_encoder_apply(
        params["sam2"]["sam_prompt_encoder"], cfg, points=(coords, labels))
    sparse = jax.lax.stop_gradient(sparse)
    dense = jax.lax.stop_gradient(dense)
    image_pe = sam2_model.prompt_encoder.get_dense_pe(
        params["sam2"]["sam_prompt_encoder"], cfg)
    image_indices = jnp.repeat(jnp.arange(B), M)

    low_res, ious, _, _ = sam2_model.mask_decoder.mask_decoder_apply(
        params["sam2"]["sam_mask_decoder"], cfg, image_embed, image_pe,
        sparse, dense, multimask_output=False, high_res_features=high_res,
        image_indices=image_indices,
    )
    pred_cells = layers.interpolate(
        low_res.astype(jnp.float32).transpose(0, 2, 3, 1),
        (rcfg.out_size, rcfg.out_size), method="bilinear")[..., 0]
    pred_cells = pred_cells.reshape(B, M, rcfg.out_size, rcfg.out_size)
    iou_cells = ious[:, 0].reshape(B, M)

    # memory write: union of per-cell positive masks per image
    valid = batch["gt_valid"][..., None, None]
    union = jnp.max(jnp.where(valid, pred_cells, -jnp.inf), axis=1)
    binary = (union > 0).astype(jnp.float32)[..., None]
    binary = layers.interpolate(binary, (S, S), method="bilinear")
    maskmem_features, _ = sam2_model.encode_new_memory(
        params["sam2"], cfg, vision_feats[-1],
        binary.transpose(0, 3, 1, 2), is_mask_from_pts=True)
    mean_iou = jnp.sum(jnp.where(batch["gt_valid"], iou_cells, 0.0)) / jnp.maximum(
        jnp.sum(batch["gt_valid"]), 1)
    bank = sb.write_similarity_bank(
        bank, jax.lax.stop_gradient(maskmem_features),
        jax.lax.stop_gradient(mean_iou),
        jax.lax.stop_gradient(image_embed.reshape(B, -1).astype(jnp.float32)))

    return outputs, pred_cells, iou_cells, nearest, bank


def make_train_step_nuclei(cfg: SAM2Config, rcfg: NucleiRecipeConfig, tx,
                           matcher_mode: str = "auto"):
    """``matcher_mode``: 'callback' runs the scipy assignment as a
    jax.pure_callback inside the jitted step; 'precompute' runs a jitted
    prompter forward, matches on the host, and feeds the indices into the
    jitted grad step (exact, for backends without host-callback support —
    the axon TPU tunnel raises UNIMPLEMENTED on pure_callback); 'auto' probes
    the backend once."""
    if matcher_mode == "auto":
        from medsam2_tpu.prompter.matcher import backend_supports_callbacks
        matcher_mode = "callback" if backend_supports_callbacks() else "precompute"
    assert matcher_mode in ("callback", "precompute")

    def loss_fn(params, batch, bank, key, bank_nonempty, precomputed_idx=None,
                dropout_key=None):
        outputs, pred_cells, iou_cells, _, bank = forward_nuclei(
            params, cfg, rcfg, batch, bank, key, bank_nonempty,
            dropout_key=dropout_key)

        if precomputed_idx is None:
            src_idx = hungarian_match(
                rcfg.matcher, outputs["pred_coords"], outputs["pred_logits"],
                batch["gt_points"], batch["gt_labels"], batch["gt_valid"])
        else:
            src_idx = precomputed_idx

        B, M = iou_cells.shape
        flat_pred = pred_cells.reshape(B * M, rcfg.out_size, rcfg.out_size)
        flat_gt = batch["gt_cell_masks"].reshape(B * M, rcfg.out_size, rcfg.out_size)
        vmask = batch["gt_valid"].reshape(B * M)
        # restrict SAM losses to valid cells: padding rows get pred=-1e9
        # (sigmoid EXACTLY 0 in fp32) and gt=0, so they contribute exactly
        # nothing to the pooled dice, zero focal elements, and a soft-IoU of
        # (0+1e-7)/(0+1e-7)=1 that cancels the pinned pred_iou=1 in the MSE
        flat_pred = jnp.where(vmask[:, None, None], flat_pred, -1e9)
        flat_gt = jnp.where(vmask[:, None, None], flat_gt, 0.0)
        flat_iou = jnp.where(vmask, iou_cells.reshape(B * M), 1.0)

        losses = criterion_losses(
            rcfg.criterion, outputs,
            batch["gt_points"], batch["gt_labels"], batch["gt_valid"],
            batch["gt_semantic"], src_idx,
            flat_pred, flat_iou, flat_gt)
        # renormalize the per-cell MEAN losses by the valid fraction so padding
        # slots don't dilute them (the reference averages over real cells);
        # the pooled dice (loss_focal) needs no renorm — exact-zero padding
        # rows drop out of its batch-pooled sums entirely
        valid_frac = jnp.maximum(jnp.mean(vmask.astype(jnp.float32)), 1e-6)
        for k in ("loss_dice", "loss_iou"):
            losses[k] = losses[k] / valid_frac
        total = sum(losses.values())
        metrics = {**{k: v for k, v in losses.items()}, "loss": total}
        # mask-head SyncBatchNorm batch stats (bn mode): surfaced so grad_step
        # can EMA-update the running stats (torch momentum 0.1) post-optimizer
        bn_stats = outputs.get("mask_bn_stats")
        return total, (bank, metrics, bn_stats)

    def grad_step(params, opt_state, batch, bank, key, bank_nonempty: bool,
                  precomputed_idx, dropout_key=None):
        (loss, (bank, metrics, bn_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, bank, key, bank_nonempty,
                                   precomputed_idx, dropout_key)
        if rcfg.clip_grad > 0:
            gnorm = optax.global_norm(grads["prompter"])
            scale = jnp.minimum(1.0, rcfg.clip_grad / jnp.maximum(gnorm, 1e-9))
            grads = dict(grads)
            grads["prompter"] = jax.tree_util.tree_map(
                lambda g: g * scale, grads["prompter"])
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if bn_stats is not None:
            # running stats are not trained (zero grad; the optimizer output
            # for them is overwritten here): rs = (1-m)*rs + m*batch, m=0.1
            bn = params["prompter"]["mask_head"]["bn"]
            mom = 0.1
            params["prompter"]["mask_head"]["bn"] = {
                **bn,
                "mean": (1 - mom) * bn["mean"] + mom * bn_stats["mean"],
                "var": (1 - mom) * bn["var"] + mom * bn_stats["var"],
            }
        return params, opt_state, bank, metrics

    # Both modes return a ready-to-call step (already jitted internally) —
    # do NOT wrap the result in jax.jit again.
    if matcher_mode == "callback":
        jitted = jax.jit(functools.partial(grad_step, precomputed_idx=None),
                         static_argnames=("bank_nonempty",))

        def train_step(params, opt_state, batch, bank, key, bank_nonempty: bool):
            # the reference trains with dropout 0.1 active in memory attention
            # and the prompter head MLPs; streams split off the step key
            key, dk = jax.random.split(key)
            return jitted(params, opt_state, batch, bank, key,
                          bank_nonempty=bank_nonempty, dropout_key=dk)
        return train_step

    # precompute mode: jitted prompter forward -> host Hungarian -> jitted grad
    from medsam2_tpu.prompter.dpa_p2pnet import prompter_apply
    from medsam2_tpu.prompter.matcher import hungarian_match_host

    prompter_fwd = jax.jit(
        lambda params, images, dkp: prompter_apply(
            params["prompter"], rcfg.prompter, images, None, dropout_key=dkp)[0])
    grad_step_jit = jax.jit(grad_step, static_argnames=("bank_nonempty",))

    def train_step(params, opt_state, batch, bank, key, bank_nonempty: bool):
        key, dk = jax.random.split(key)
        # same split as forward_nuclei, so the match forward reproduces the
        # grad step's dropout pattern exactly
        dkp, _ = jax.random.split(dk)
        outputs = prompter_fwd(params, batch["images"], dkp)
        src_idx = hungarian_match_host(
            rcfg.matcher, np.asarray(outputs["pred_coords"]),
            np.asarray(outputs["pred_logits"]), np.asarray(batch["gt_points"]),
            np.asarray(batch["gt_labels"]), np.asarray(batch["gt_valid"]))
        return grad_step_jit(params, opt_state, batch, bank, key, bank_nonempty,
                             jnp.asarray(src_idx), dropout_key=dk)

    return train_step


def init_joint_params(key, cfg: SAM2Config, rcfg: NucleiRecipeConfig):
    k1, k2 = jax.random.split(key)
    from medsam2_tpu.prompter.dpa_p2pnet import prompter_init
    return {
        "sam2": sam2_model.sam2_init(k1, cfg),
        "prompter": prompter_init(k2, rcfg.prompter),
    }


def make_optimizer_nuclei(rcfg: NucleiRecipeConfig):
    """Joint AdamW over prompter + SAM (``train_2d.py:42-47``), with two
    torch-faithful exclusions: the prompt encoder — the engine only ever
    calls it under ``torch.no_grad`` (``func_2d/function.py:140-152``), so
    its params never receive gradients NOR AdamW weight decay in the
    reference (torch skips grad-None params entirely) — and the mask head's
    BN running stats, which are torch *buffers* updated by the forward-pass
    EMA, never by the optimizer."""
    def label_fn(params):
        def lab(path, _):
            keys = [getattr(p, "key", None) for p in path]
            if "sam_prompt_encoder" in keys:
                return "frozen"
            if "bn" in keys and keys[-1] in ("mean", "var"):
                return "frozen"
            return "train"
        return jax.tree_util.tree_map_with_path(lab, params)
    return optax.multi_transform(
        {"train": optax.adamw(rcfg.lr, weight_decay=rcfg.weight_decay),
         "frozen": optax.set_to_zero()},
        label_fn)
