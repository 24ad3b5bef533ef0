"""3D (CT-as-video) training recipe — the TPU-native ``train_3d.py`` engine.

Reference semantics (``func_3d/function.py:50-196``, ``train_3d.py:34-54``):
prompt every ``prompt_freq``-th frame for every object (bbox/click; missing
object => zero-mask prompt), propagate through the memory system, then
BCEWithLogits(pos_weight=2) per (frame, object) split into *prompt* vs
*non-prompt* losses; two Adam optimizers — mask decoder at 1e-4 stepped with
d(prompt + non_prompt) (the reference's accumulated grads at ``optimizer1.step``),
memory path (obj_ptr_proj, memory encoder/attention, mask_downsample) at 1e-8
with d(non_prompt) only (``:182-191``).

TPU redesign: the whole volume pipeline is one pure function — preflight over
static prompt frames, ``lax.scan`` (rematerialized) over the remaining frames —
vmapped over a volume batch and differentiated with a single forward + two
vjp pulls (replacing ``retain_graph=True`` double-backward).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from medsam2_tpu.configs import SAM2Config
from medsam2_tpu.core import sam2_model
from medsam2_tpu.state import memory_bank as mb
from medsam2_tpu.train.losses import bce_with_logits
from medsam2_tpu.api.video_predictor import _encode_frame, _expand_to_objects, _prompt_step


@dataclasses.dataclass(frozen=True)
class Recipe3DConfig:
    video_length: int = 8
    prompt_freq: int = 2
    num_objects: int = 2          # static object slots (pad with zero-mask objects)
    lr_sam: float = 1e-4
    lr_mem: float = 1e-8
    pos_weight: float = 2.0
    max_cond_frames: int = 8
    # multimask on prompt frames: True for single-click prompting, False for
    # bbox (2 points) — mirrors SAM2Base._use_multimask with the preset limits
    multimask_for_prompts: bool = False
    # scan-body rematerialization: "enc_saved" saves the (frozen) encoder's
    # output features by name so the backward never re-runs or differentiates
    # the trunk (the reference's optimizers only train the mask decoder and
    # the memory path, train_3d.py:34-46); "full" is the blanket-checkpoint
    # fallback that recomputes the whole body.
    remat: str = "enc_saved"
    # vmap the two cotangent pulls so the backward's remat recompute is shared
    # (the recompute depends only on primals). Measured NEGATIVE on the v5e
    # chip: train_3d @1024 0.171 -> 0.405 s/step — the batched transposed ops
    # (grouped-conv weight cotangents especially) lower far worse than running
    # the pull twice, so the default is the classic two-pull. Also
    # incompatible with sharded params (jax's grouped-conv batching rule
    # raises NotImplementedError under vmap + GSPMD out_sharding). None =
    # two-pull everywhere; True opts in for experiments (parity-tested).
    fused_cotangent_pull: Optional[bool] = None
    # Roped-key cache during training: project + RoPE memory keys once at
    # bank-write time instead of over the whole ~29k-token memory every
    # tracked frame (the measured inference win: mem-attn 3.66 -> 2.57
    # ms/frame @1024). Exact math — k-projection and RoPE are applied per
    # memory token either way, and the positional half is computed inside the
    # loss so memory-attention weight grads stay complete. None = env
    # ``MEDSAM2_TRAIN_KCACHE`` (default off until slope-timed on device:
    # the backward trades the per-frame projection transpose for
    # gather/scatter transposes over the cache buffer).
    use_kcache: Optional[bool] = None

    def kcache_enabled(self) -> bool:
        if self.use_kcache is not None:
            return self.use_kcache
        import os
        return os.environ.get("MEDSAM2_TRAIN_KCACHE", "0") == "1"

    @property
    def prompt_frames(self) -> Tuple[int, ...]:
        return tuple(range(0, self.video_length, self.prompt_freq))


def _param_labels(params, cfg: SAM2Config):
    """Label each leaf 'sam' (mask decoder), 'mem' (memory path) or 'frozen',
    matching the reference param groups (train_3d.py:34-46)."""
    def label_tree(tree, label):
        return jax.tree_util.tree_map(lambda _: label, tree)

    labels = {k: label_tree(v, "frozen") for k, v in params.items()}
    labels["sam_mask_decoder"] = label_tree(params["sam_mask_decoder"], "sam")
    for k in ("obj_ptr_proj", "memory_encoder", "memory_attention", "mask_downsample"):
        if k in params:
            labels[k] = label_tree(params[k], "mem")
    return labels


def make_optimizers(params, cfg: SAM2Config, rcfg: Recipe3DConfig):
    labels = _param_labels(params, cfg)
    tx = optax.multi_transform(
        {
            "sam": optax.adam(rcfg.lr_sam, b1=0.9, b2=0.999, eps=1e-8),
            "mem": optax.adam(rcfg.lr_mem, b1=0.9, b2=0.999, eps=1e-8),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    return tx, labels


def volume_losses(params, cfg: SAM2Config, spec: mb.BankSpec, rcfg: Recipe3DConfig,
                  batch: Dict, dropout_key=None, per_frame: bool = False):
    """Losses for ONE volume. ``dropout_key`` activates the memory-attention
    training dropout (reference trains with rate 0.1, memory_attention.py:33-99);
    None = deterministic. ``per_frame=True`` additionally returns the raw
    per-(frame, object) BCE matrices ([n_prompt, O], [T - n_prompt, O]) — the
    reference engine's individual ``obj_loss`` values
    (``func_3d/function.py:166-172``), used by the executed-reference
    training differential.

    batch (single volume):
      images        [T, S, S, 3]  normalized
      gt_masks      [T, O, S, S]  float 0/1
      prompt_coords [F, O, P, 2]  model-space (x, y)
      prompt_labels [F, O, P]     int (-1 pad; 2/3 for bbox corners)
      prompt_use_mask [F, O]      bool: True = zero-mask prompt fallback
      obj_valid     [O]           bool: real object vs padding slot

    Returns (prompt_loss, non_prompt_loss) scalars.
    """
    T = rcfg.video_length
    O = rcfg.num_objects
    prompt_frames = rcfg.prompt_frames
    images = batch["images"]
    gt = batch["gt_masks"]
    obj_valid = batch["obj_valid"].astype(jnp.float32)  # [O]
    S = cfg.image_size

    kshape = (sam2_model.kcache_shape(cfg) if rcfg.kcache_enabled() else (0, 0))
    bank = mb.init_bank(spec, O, kcache_shape=kshape,
                        kcache_dtype=sam2_model.kcache_dtype(cfg))
    # The positional half of the roped-key cache depends on trainable
    # memory-attention weights, so it is computed INSIDE the loss (hoisted out
    # of the frame scan, but inside the grad) — dL/dW_k keeps its positional
    # contribution and the cache is never stale across optimizer steps.
    pos_kcache = (sam2_model.make_pos_kcache(params, cfg, spec)
                  if kshape[0] > 0 else None)

    def frame_loss(high_res_masks, frame_gt):
        # high_res_masks [O, 1, S, S] logits; frame_gt [O, S, S] -> per-obj [O]
        per = bce_with_logits(high_res_masks[:, 0], frame_gt, rcfg.pos_weight)
        return per.mean(axis=(1, 2)) * obj_valid  # [O]

    # --- preflight: prompt frames (cond memories) ---
    prompt_frame_losses = []
    for i, f in enumerate(prompt_frames):
        out, bank = _prompt_step(
            params, images, bank, jnp.int32(f),
            batch["prompt_coords"][i], batch["prompt_labels"][i],
            jnp.zeros((O, S, S, 1), jnp.float32),
            batch["prompt_use_mask"][i],
            cfg=cfg, spec=spec, multimask_output=rcfg.multimask_for_prompts,
            is_eval=False,
            num_frames=T,
        )
        prompt_frame_losses.append(frame_loss(out["pred_masks_high_res"], gt[f]))
    per_prompt = jnp.stack(prompt_frame_losses)          # [n_prompt, O]
    prompt_loss = jnp.sum(per_prompt)

    # --- scan over non-prompt frames ---
    non_prompt_frames = [t for t in range(T) if t not in prompt_frames]
    if non_prompt_frames:
        frame_ids = jnp.asarray(non_prompt_frames, jnp.int32)
        gt_np = gt[jnp.asarray(non_prompt_frames)]
        from medsam2_tpu.core.hiera import _get_pos_embed
        trunk_pe = _get_pos_embed(params["image_encoder"]["trunk"], S // 4, S // 4)
        if dropout_key is not None:
            frame_keys = jax.random.split(dropout_key, len(non_prompt_frames))
        else:
            # dummy keys carried through the scan but never used
            frame_keys = jnp.zeros((len(non_prompt_frames), 2), jnp.uint32)

        def body(bank, xs):
            frame_idx, frame_gt, fkey = xs
            frame = jax.lax.dynamic_index_in_dim(images, frame_idx, 0, keepdims=True)
            feats, pos = _encode_frame(params, frame, cfg=cfg,
                                       trunk_pos_embed=trunk_pe)
            # Name the encoder outputs so the "enc_saved" remat policy keeps
            # them: the trunk is frozen (no grads flow into it), so with its
            # outputs saved the backward's recompute DCEs the encoder away
            # entirely instead of re-running 55% of the forward.
            from jax.ad_checkpoint import checkpoint_name
            feats = [checkpoint_name(f, "enc_feats") for f in feats]
            pos = [checkpoint_name(p, "enc_feats") for p in pos]
            feats, pos = _expand_to_objects(feats, pos, O)
            out, bank = sam2_model.track_step(
                params, cfg, spec, bank, frame_idx,
                is_init_cond_frame=False,
                current_vision_feats=feats, current_vision_pos=pos,
                multimask_output=sam2_model.use_multimask(cfg, False, 0),
                run_mem_encoder=True, is_cond_frame=False,
                num_frames=T, is_eval=False,
                dropout_key=fkey if dropout_key is not None else None,
                pos_kcache=pos_kcache,
            )
            return bank, frame_loss(out["pred_masks_high_res"], frame_gt)

        if rcfg.remat == "enc_saved":
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.save_only_these_names("enc_feats"),
            )
        elif rcfg.remat == "full":
            body = jax.checkpoint(body)
        elif rcfg.remat != "none":
            raise ValueError(f"unknown remat policy {rcfg.remat!r}")
        _, per_nonprompt = jax.lax.scan(body, bank, (frame_ids, gt_np, frame_keys))
        non_prompt_loss = jnp.sum(per_nonprompt)         # [T - n_prompt, O]
    else:
        per_nonprompt = jnp.zeros((0, O))
        non_prompt_loss = jnp.asarray(0.0)

    # normalizations (func_3d/function.py:170-173)
    n_obj = jnp.maximum(jnp.sum(obj_valid), 1.0)
    prompt_loss = prompt_loss / (len(prompt_frames) * n_obj)
    if non_prompt_frames:
        non_prompt_loss = non_prompt_loss / (len(non_prompt_frames) * n_obj)
    if per_frame:
        return prompt_loss, non_prompt_loss, per_prompt, per_nonprompt
    return prompt_loss, non_prompt_loss


def make_train_step(cfg: SAM2Config, rcfg: Recipe3DConfig, tx):
    """Build the jittable train step over a volume batch.

    batch arrays carry a leading volume axis [Bv, ...]; the step vmaps the
    volume pipeline, pulls two vjp cotangents (prompt / non-prompt) through a
    single forward, and applies the two-group optimizer update.
    """
    spec = mb.BankSpec.from_config(cfg, max_cond_frames=rcfg.max_cond_frames)
    # Param groups the optimizers actually step (reference train_3d.py:34-46).
    # Everything else is frozen: stop_gradient at the top so the backward has
    # no cotangent path through the image encoder at all — together with the
    # "enc_saved" remat policy this DCEs the trunk out of the backward pass
    # (instead of recomputing ~55% of the forward per scan step).
    trainable = {"sam_mask_decoder", "obj_ptr_proj", "memory_encoder",
                 "memory_attention", "mask_downsample"}
    fused_pull = bool(rcfg.fused_cotangent_pull)

    def losses_fn(params, batch, key=None):
        params = {k: (v if k in trainable else jax.lax.stop_gradient(v))
                  for k, v in params.items()}
        if key is not None:
            n_vol = jax.tree_util.tree_leaves(batch)[0].shape[0]
            vol_keys = jax.random.split(key, n_vol)
            per_vol = jax.vmap(
                lambda b, k: volume_losses(params, cfg, spec, rcfg, b,
                                           dropout_key=k),
            )(batch, vol_keys)
        else:
            per_vol = jax.vmap(
                lambda b: volume_losses(params, cfg, spec, rcfg, b), in_axes=(0,)
            )(batch)
        prompt_loss = jnp.mean(per_vol[0])
        non_prompt_loss = jnp.mean(per_vol[1])
        return prompt_loss, non_prompt_loss

    def train_step(params, opt_state, batch, key=None):
        """``key``: optional PRNG key enabling memory-attention dropout for
        this step (the reference trains with dropout 0.1 active); omit for a
        deterministic step."""
        (prompt_loss, non_prompt_loss), vjp_fn = jax.vjp(
            lambda p: losses_fn(p, batch, key), params)
        # reference grad flow: optimizer2 (mem) sees only d(non_prompt);
        # optimizer1 (decoder) steps on accumulated d(prompt) + d(non_prompt)
        if fused_pull:
            # vmap the two cotangent pulls: the backward's remat recompute
            # depends only on the primals (not the cotangent), so vmap leaves
            # it unbatched and shared — only the transposed ops run twice.
            cp = jnp.asarray([0.0, 1.0], prompt_loss.dtype)
            cn = jnp.asarray([1.0, 1.0], non_prompt_loss.dtype)
            g = jax.vmap(lambda a, b: vjp_fn((a, b))[0])(cp, cn)
            grads = {}
            for k in params:
                lane = 1 if k == "sam_mask_decoder" else 0
                grads[k] = jax.tree_util.tree_map(lambda x: x[lane], g[k])
        else:
            one = jnp.ones_like(non_prompt_loss)
            g_np = vjp_fn((jnp.zeros_like(prompt_loss), one))[0]
            g_total = vjp_fn((jnp.ones_like(prompt_loss), one))[0]
            grads = {k: (g_total[k] if k == "sam_mask_decoder" else g_np[k])
                     for k in params}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": prompt_loss + non_prompt_loss,
            "prompt_loss": prompt_loss,
            "non_prompt_loss": non_prompt_loss,
        }
        return params, opt_state, metrics

    return train_step


def prompts_from_bbox(bboxes, valid, num_points: int):
    """bbox [..., 4] xyxy (+ validity) -> padded corner-point prompts.

    Returns (coords [..., P, 2], labels [..., P]) with labels 2/3 on the two
    corner slots and -1 padding; invalid entries are all-padding (the caller
    marks them ``use_mask`` for the zero-mask fallback)."""
    *lead, _ = bboxes.shape
    P = num_points
    coords = jnp.zeros((*lead, P, 2), jnp.float32)
    coords = coords.at[..., 0, :].set(bboxes[..., 0:2])
    coords = coords.at[..., 1, :].set(bboxes[..., 2:4])
    labels = -jnp.ones((*lead, P), jnp.int32)
    labels = labels.at[..., 0].set(2).at[..., 1].set(3)
    labels = jnp.where(valid[..., None], labels, -1)
    return coords, labels
