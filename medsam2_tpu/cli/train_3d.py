"""3D (BTCV/AMOS CT-as-video) training CLI — the TPU-native ``train_3d.py``
(reference: ``train_3d.py`` + ``func_3d/function.py``).

Builds the model from a preset, optionally loads released SAM2 weights through
the torch->JAX converter, trains with the two-optimizer recipe over a (possibly
sharded) volume batch, validates with the video predictor + threshold-averaged
IoU/Dice, and writes orbax checkpoints each epoch.
"""

from __future__ import annotations

import time
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.checkpoint.store import load_params, save_checkpoint
from medsam2_tpu.cli.cfg import parse_args
from medsam2_tpu.configs import get_config
from medsam2_tpu.core.sam2_model import sam2_init
from medsam2_tpu.data.btcv import BTCV, AMOS, pack_to_recipe_batch
from medsam2_tpu.data.loader import DataLoader
from medsam2_tpu.data.synthetic import synthetic_volume
from medsam2_tpu.metrics.segmentation import eval_seg
from medsam2_tpu.train import recipe_3d
from medsam2_tpu.utils.logging_utils import (
    MetricLogger, Profiler, ScalarWriter, create_logger, set_log_dir)


class SyntheticVolumes:
    def __init__(self, args, n=8):
        self.args = args
        self.n = n
        self.rng = np.random.default_rng(args.seed)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return synthetic_volume(self.rng, T=self.args.video_length,
                                size=self.args.image_size,
                                num_objects=self.args.max_objects,
                                prompt=self.args.prompt)


def build_dataset(args, mode: str):
    if args.dataset == "synthetic" or args.data_path is None:
        return SyntheticVolumes(args)
    # btcv_nifti/amos_nifti: raw NIfTI distributions (imagesTr/labelsTr
    # .nii.gz), decoded by the dependency-free reader in data/nifti.py
    from medsam2_tpu.data.nifti import NiftiVolumes

    cls = {"btcv": BTCV, "amos": AMOS,
           "btcv_nifti": NiftiVolumes, "amos_nifti": NiftiVolumes}[args.dataset]
    return cls(args.data_path, mode=mode, image_size=args.image_size,
               video_length=args.video_length if mode == "Training" else None,
               prompt=args.prompt, seed=args.seed)


def _bce_pos_weight2(logits: np.ndarray, targets: np.ndarray) -> float:
    """Mean BCE-with-logits at pos_weight=2 — the reference's validation
    ``lossfunc = criterion_G`` (``func_3d/function.py:14,208,300``), computed
    stably in float64 on the host."""
    x = np.asarray(logits, np.float64)
    y = np.asarray(targets, np.float64)
    sp_neg = np.logaddexp(0.0, -x)  # -log sigmoid(x)
    sp_pos = np.logaddexp(0.0, x)   # -log(1 - sigmoid(x))
    return float((2.0 * y * sp_neg + (1.0 - y) * sp_pos).mean())


def validation_sam(args, cfg, params, val_loader, logger,
                   sample_dir: str = None) -> Dict[str, float]:
    """Validation loop (``func_3d/function.py:198-314``): prompt every
    prompt_freq-th frame, propagate from frame 0, threshold-averaged IoU/Dice
    plus the BCE(pos_weight=2) validation loss. Each volume's sums are
    normalized by its own ``len(frame_id) * len(obj_list)`` before the
    over-loader mean (``function.py:300-306`` — NOT a global per-pair mean),
    and the loader-length denominator counts skipped no-object packs
    (``n_val = len(val_loader)``, ``function.py:202``). Optional per-frame
    figure dumps under ``sample_dir`` when ``-vis`` is set
    (``function.py:288-298``)."""
    from medsam2_tpu.api.video_predictor import SAM2VideoPredictor

    pred = SAM2VideoPredictor(params, cfg)
    tot_iou, tot_dice, tot_loss, n_val = 0.0, 0.0, 0.0, 0
    for batch in val_loader:
        # n_val counts BATCHES (the reference's ``n_val = len(val_loader)``,
        # func_3d/function.py:202), not samples — they coincide at the
        # reference's val batch_size=1 but diverge otherwise.
        n_val += 1
        for sample in batch:
            imgs = sample["image"]  # [T, 3, S, S]
            T = imgs.shape[0]
            obj_ids = sorted({o for t in sample["label"] for o in sample["label"][t]})
            if not obj_ids:
                continue
            state = pred.val_init_state(imgs)
            for t in range(0, T, args.prompt_freq):
                for obj in obj_ids:
                    if "pt" in sample and obj in sample["pt"].get(t, {}):
                        pred.add_new_points(
                            state, t, obj, sample["pt"][t][obj][None],
                            np.array([sample["p_label"][t][obj]]),
                            normalize_coords=False)
                    elif "bbox" in sample and obj in sample.get("bbox", {}).get(t, {}):
                        box = sample["bbox"][t][obj]
                        if not np.any(np.isnan(box)):
                            from medsam2_tpu.data.prompts import bbox_to_xyxy
                            pred.add_new_bbox(state, t, obj, bbox_to_xyxy(box),
                                              normalize_coords=False)
                        else:
                            pred.add_new_mask(state, t, obj,
                                              np.zeros(imgs.shape[2:], np.float32))
                    else:
                        pred.add_new_mask(state, t, obj,
                                          np.zeros(imgs.shape[2:], np.float32))
            name = sample["image_meta_dict"]["filename_or_obj"]
            vol_iou, vol_dice, vol_loss, pairs = 0.0, 0.0, 0.0, 0
            for frame_idx, ids, masks in pred.propagate_in_video(
                    state, start_frame_idx=0):
                masks = np.asarray(masks, np.float32)  # [O, 1, H, W]
                for oi, obj in enumerate(ids):
                    gt = sample["label"].get(frame_idx, {}).get(obj)
                    gt = gt.astype(np.float32) if gt is not None else np.zeros(
                        masks.shape[2:], np.float32)[None]
                    vol_loss += _bce_pos_weight2(masks[oi:oi + 1], gt[None])
                    iou, dice = eval_seg(masks[oi:oi + 1], gt[None],
                                         (0.1, 0.3, 0.5, 0.7, 0.9))
                    vol_iou += iou
                    vol_dice += dice
                    pairs += 1
                    if args.vis and sample_dir is not None:
                        import os
                        from medsam2_tpu.utils.visualization import vis_image
                        # the reference thresholds RAW LOGITS at 0.5 — the
                        # sigmoid is commented out (func_3d/function.py:291)
                        vis_image(imgs[frame_idx], masks[oi, 0] > 0.5, gt[0],
                                  os.path.join(sample_dir, str(name), str(frame_idx),
                                               f"{obj}.png"))
            pred.reset_state(state)
            if pairs:
                tot_iou += vol_iou / pairs
                tot_dice += vol_dice / pairs
                tot_loss += vol_loss / pairs
    d = max(n_val, 1)
    return {"loss": tot_loss / d, "iou": tot_iou / d, "dice": tot_dice / d}


def main(argv=None):
    args = parse_args(argv)
    cfg = get_config(args.sam_config, image_size=args.image_size)
    rcfg = recipe_3d.Recipe3DConfig(
        video_length=args.video_length,
        prompt_freq=args.prompt_freq,
        num_objects=args.max_objects,
        lr_sam=args.lr,
        multimask_for_prompts=(args.prompt == "click"),
    )

    paths = set_log_dir(args.logdir, args.exp_name)
    logger = create_logger(paths["log_path"])
    logger.info(vars(args))

    key = jax.random.PRNGKey(args.seed)
    ckpt = args.weights or args.pretrain or args.sam_ckpt
    if ckpt:
        params = load_params(ckpt, cfg)
        logger.info(f"loaded checkpoint {ckpt}")
    else:
        params = sam2_init(key, cfg)
        logger.info("random init (no -sam_ckpt given)")

    tx, _ = recipe_3d.make_optimizers(params, cfg, rcfg)
    opt_state = tx.init(params)
    start_epoch = 0
    if args.resume:
        from medsam2_tpu.checkpoint.store import restore_checkpoint
        state = restore_checkpoint(
            args.resume, template={"params": params, "opt_state": opt_state,
                                   "epoch": 0})
        params = state["params"]
        opt_state = state["opt_state"]
        start_epoch = int(state["epoch"]) + 1
        logger.info(f"resumed from {args.resume} at epoch {start_epoch}")
    # donate params/opt_state (the loop reassigns both) so the Adam update
    # runs in place — halves the train step's parameter-state footprint
    train_step = jax.jit(recipe_3d.make_train_step(cfg, rcfg, tx),
                         donate_argnums=(0, 1))

    mesh = None
    if args.distributed != "none" and len(jax.devices()) > 1:
        from medsam2_tpu.parallel import mesh as pmesh
        model_axis = 1
        if "x" in args.distributed:
            model_axis = int(args.distributed.split("x")[1])
        mesh = pmesh.make_mesh(model_axis=model_axis)
        params = pmesh.shard_params(params, mesh)
        opt_state = tx.init(params)
        logger.info(f"mesh: {dict(mesh.shape)}")

    def collate(samples: List[Dict]):
        return pack_to_recipe_batch(samples, args.video_length, args.max_objects,
                                    args.prompt_freq, args.image_size)

    train_ds = build_dataset(args, "Training")
    val_ds = build_dataset(args, "Test" if args.dataset != "synthetic" else "Training")
    train_loader = DataLoader(train_ds, batch_size=args.b, shuffle=True,
                              collate_fn=collate, seed=args.seed)
    val_loader = DataLoader(val_ds, batch_size=1, num_workers=0)

    profiler = Profiler(paths["log_path"]) if args.profile else None
    writer = ScalarWriter(paths["log_path"])
    ml = MetricLogger()
    ema = None
    if args.model_ema:
        from medsam2_tpu.utils.logging_utils import EMA
        ema = EMA(params, decay=args.model_ema_decay)

    if args.eval:
        metrics = validation_sam(args, cfg, params, val_loader, logger,
                                 sample_dir=paths["sample_path"])
        logger.info(f"eval: {metrics}")
        return metrics

    context = mesh if mesh is not None else _nullcontext()
    with context:
        from medsam2_tpu.data.loader import device_prefetch
        for epoch in range(start_epoch, args.epochs):
            t0 = time.time()
            batches = train_loader if mesh is not None else device_prefetch(
                iter(train_loader))
            for i, batch in enumerate(batches):
                if args.steps_per_epoch and i >= args.steps_per_epoch:
                    break
                if mesh is not None:
                    from medsam2_tpu.parallel import mesh as pmesh
                    batch = jax.tree_util.tree_map(jnp.asarray, batch)
                    batch = pmesh.shard_batch(batch, mesh)
                # dropout active during training (the reference trains with
                # memory-attention dropout 0.1)
                key, dk = jax.random.split(key)
                params, opt_state, metrics = train_step(params, opt_state,
                                                        batch, dk)
                if ema is not None and i % args.model_ema_steps == 0:
                    ema.update(params)
                scalars = {k: float(v) for k, v in metrics.items()}
                ml.update(**scalars)
                if profiler:
                    profiler.step()
                if i % args.print_freq == 0:
                    logger.info(f"epoch {epoch} step {i}: {ml}")
                writer.add_scalars({f"train/{k}": v for k, v in scalars.items()},
                                   step=epoch * 10 ** 6 + i)
            logger.info(f"epoch {epoch} trained in {time.time() - t0:.1f}s: {ml}")
            writer.add_scalars(
                {f"train_epoch/{k}": m.global_avg for k, m in ml.meters.items()},
                step=epoch)

            # val_freq <= 0 validates only on the final epoch
            if ((args.val_freq > 0 and epoch % args.val_freq == 0)
                    or epoch == args.epochs - 1):
                metrics = validation_sam(args, cfg, params, val_loader, logger,
                                         sample_dir=paths["sample_path"])
                logger.info(f"epoch {epoch} val: {metrics}")
                writer.add_scalars(
                    {f"val/{k}": float(v) for k, v in metrics.items()
                     if np.isscalar(v) or getattr(v, "ndim", 1) == 0},
                    step=epoch)
                state_to_save = {"params": params, "opt_state": opt_state,
                                 "epoch": epoch}
                if ema is not None:
                    state_to_save["ema_params"] = ema.params
                save_checkpoint(paths["ckpt_path"], state_to_save, epoch)
    if profiler:
        profiler.close()
    writer.close()
    return params


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
