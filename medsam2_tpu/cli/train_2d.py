"""2D training CLI — the TPU-native ``train_2d.py``.

Two workloads by ``-dataset``:
- ``refuge``: SAM-only click training with the similarity memory bank
  (recipe_2d) + threshold-averaged IoU/Dice validation.
- ``monuseg`` / ``cpm``: joint DPA-P2PNet prompter + SAM2 training
  (recipe_nuclei, replacing the reference's missing external mmengine
  ``args.py`` with CLI flags) + instance metrics (Dice/AJI/PQ) validation.
``synthetic`` runs either recipe on generated data (-net sam2 => refuge-style,
-net prompter => nuclei-style).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.checkpoint.store import load_params, save_checkpoint
from medsam2_tpu.cli.cfg import parse_args
from medsam2_tpu.configs import get_config
from medsam2_tpu.core.sam2_model import sam2_init
from medsam2_tpu.data.loader import DataLoader
from medsam2_tpu.data.monuseg import MONUSEG, CPM, pack_nuclei_batch
from medsam2_tpu.data.refuge import REFUGE, pack_refuge_batch
from medsam2_tpu.data.synthetic import synthetic_fundus, synthetic_nuclei
from medsam2_tpu.metrics.instance import get_dice_1, get_fast_aji, get_fast_pq, remap_label
from medsam2_tpu.metrics.segmentation import eval_seg
from medsam2_tpu.state import similarity_bank as sb
from medsam2_tpu.train import recipe_2d, recipe_nuclei
from medsam2_tpu.utils.logging_utils import (
    MetricLogger, ScalarWriter, create_logger, set_log_dir)


class SyntheticDataset:
    def __init__(self, args, kind: str, n=16):
        self.args = args
        self.kind = kind
        self.n = n
        self.rng = np.random.default_rng(args.seed)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.kind == "refuge":
            return synthetic_fundus(self.rng, self.args.image_size)
        return synthetic_nuclei(self.rng, self.args.image_size)


def _bank_for(cfg, size: int):
    P = cfg.sam_image_embedding_size ** 2
    return sb.init_similarity_bank(size, P, cfg.mem_dim, P * cfg.hidden_dim)


def train_refuge(args, cfg, logger, paths):
    rcfg = recipe_2d.Recipe2DConfig(
        memory_bank_size=args.memory_bank_size, lr=args.lr,
        out_size=args.out_size, clip_grad=args.clip_grad)
    key = jax.random.PRNGKey(args.seed)
    ckpt = args.weights or args.pretrain or args.sam_ckpt
    params = load_params(ckpt, cfg) if ckpt else sam2_init(key, cfg)
    tx = recipe_2d.make_optimizer_2d(rcfg)
    opt_state = tx.init(params)
    # donate params/opt_state/bank: every caller reassigns them, so XLA can
    # apply the optimizer (and bank writes) in place instead of allocating
    # fresh buffers each step
    step = jax.jit(recipe_2d.make_train_step_2d(cfg, rcfg, tx),
                   static_argnames=("bank_nonempty",),
                   donate_argnums=(0, 1, 3))

    if args.dataset == "synthetic" or args.data_path is None:
        train_ds = SyntheticDataset(args, "refuge")
        val_ds = train_ds
    else:
        train_ds = REFUGE(args.data_path, "Training", args.image_size, args.out_size,
                          seed=args.seed)
        val_ds = REFUGE(args.data_path, "Test", args.image_size, args.out_size)

    collate = lambda s: pack_refuge_batch(s, args.image_size, args.out_size)
    loader = DataLoader(train_ds, batch_size=args.b, shuffle=True, collate_fn=collate,
                        seed=args.seed)
    bank = _bank_for(cfg, rcfg.memory_bank_size)
    ml = MetricLogger()
    writer = ScalarWriter(paths["log_path"])
    any_written = False
    best_dice = 0.0
    for epoch in range(args.epochs):
        t0 = time.time()
        for i, batch in enumerate(loader):
            if args.steps_per_epoch and i >= args.steps_per_epoch:
                break
            key, sub = jax.random.split(key)
            batch = jax.tree_util.tree_map(jnp.asarray, batch)
            params, opt_state, bank, metrics = step(
                params, opt_state, batch, bank, sub, bank_nonempty=any_written)
            any_written = True
            ml.update(**{k: float(v) for k, v in metrics.items()})
        logger.info(f"epoch {epoch} in {time.time() - t0:.1f}s: {ml}")
        writer.add_scalars(
            {f"train/{k}": m.global_avg for k, m in ml.meters.items()}, epoch)
        if ((args.val_freq > 0 and epoch % args.val_freq == 0)
                or epoch == args.epochs - 1):
            iou, dice = validate_refuge(args, cfg, rcfg, params, val_ds, bank)
            logger.info(f"epoch {epoch} val iou={iou:.4f} dice={dice:.4f}")
            writer.add_scalars({"val/iou": iou, "val/dice": dice}, epoch)
            if dice > best_dice:
                best_dice = dice
                save_checkpoint(paths["ckpt_path"],
                                {"params": params, "epoch": epoch}, epoch)
    return params


def validate_refuge(args, cfg, rcfg, params, val_ds, bank):
    fwd = jax.jit(
        lambda p, im, c, l, b, k: recipe_2d.forward_2d(
            p, cfg, rcfg, im, c, l, b, k, bank_nonempty=True, is_eval=True)[0])
    # full test set by default (the reference iterates the whole loader,
    # train_2d.py:155-164); -val_max_samples caps it for smoke runs
    tot_iou = tot_dice = n = 0.0
    key = jax.random.PRNGKey(0)
    cap = int(getattr(args, "val_max_samples", 0) or 0)
    n_val = len(val_ds) if cap <= 0 else min(len(val_ds), cap)
    for i in range(n_val):
        s = val_ds[i]
        batch = pack_refuge_batch([s], args.image_size, args.out_size)
        key, sub = jax.random.split(key)
        pred = fwd(params, jnp.asarray(batch["images"]), jnp.asarray(batch["coords"]),
                   jnp.asarray(batch["labels"]), bank, sub)
        iou, dice = eval_seg(np.asarray(pred)[:, None], batch["gt_masks"][:, None],
                             (0.1, 0.3, 0.5, 0.7, 0.9))
        tot_iou += iou
        tot_dice += dice
        n += 1
    return tot_iou / max(n, 1), tot_dice / max(n, 1)


def train_nuclei(args, cfg, logger, paths):
    from medsam2_tpu.prompter.dpa_p2pnet import PrompterConfig

    rcfg = recipe_nuclei.NucleiRecipeConfig(
        prompter=PrompterConfig(backbone="resnet50"),
        memory_bank_size=args.memory_bank_size,
        max_cells=args.max_cells, lr=args.lr, out_size=args.out_size,
        clip_grad=args.clip_grad)
    key = jax.random.PRNGKey(args.seed)
    params = recipe_nuclei.init_joint_params(key, cfg, rcfg)
    if args.sam_ckpt:
        params["sam2"] = load_params(args.sam_ckpt, cfg)
    tx = recipe_nuclei.make_optimizer_nuclei(rcfg)
    opt_state = tx.init(params)
    step = recipe_nuclei.make_train_step_nuclei(cfg, rcfg, tx)  # jitted inside

    if args.dataset == "synthetic" or args.data_path is None:
        train_ds = SyntheticDataset(args, "nuclei")
        val_ds = train_ds
    else:
        cls = {"monuseg": MONUSEG, "cpm": CPM}[args.dataset]
        train_ds = cls(args.data_path, "train", args.image_size, args.out_size,
                       seed=args.seed, augment=bool(getattr(args, "augment", 1)))
        val_ds = cls(args.data_path, "test", args.image_size, args.out_size)

    collate = lambda s: pack_nuclei_batch(s, args.image_size, args.out_size,
                                          args.max_cells)
    loader = DataLoader(train_ds, batch_size=args.b, shuffle=True, collate_fn=collate,
                        seed=args.seed)
    bank = _bank_for(cfg, rcfg.memory_bank_size)
    args._sample_dir = paths.get("sample_path")  # for -vis eval dumps
    ml = MetricLogger()
    writer = ScalarWriter(paths["log_path"])
    any_written = False
    best = 0.0
    best_aji = 0.0
    for epoch in range(args.epochs):
        t0 = time.time()
        for i, batch in enumerate(loader):
            if args.steps_per_epoch and i >= args.steps_per_epoch:
                break
            key, sub = jax.random.split(key)
            batch = jax.tree_util.tree_map(jnp.asarray, batch)
            params, opt_state, bank, metrics = step(
                params, opt_state, batch, bank, sub, bank_nonempty=any_written)
            any_written = True
            ml.update(**{k: float(v) for k, v in metrics.items()})
        logger.info(f"epoch {epoch} in {time.time() - t0:.1f}s: {ml}")
        writer.add_scalars(
            {f"train/{k}": m.global_avg for k, m in ml.meters.items()}, epoch)
        if ((args.val_freq > 0 and epoch % args.val_freq == 0)
                or epoch == args.epochs - 1):
            scores = validate_nuclei(args, cfg, rcfg, params, val_ds, bank, key)
            logger.info(f"epoch {epoch} val: {scores}")
            writer.add_scalars({f"val/{k}": float(v) for k, v in scores.items()},
                               epoch)
            # the reference keeps SEPARATE best-Dice and best-AJI checkpoints
            # (train_2d.py:173-179, base_dice_epoch.pth / base_aji_epoch.pth)
            if scores["dice1"] > best:
                best = scores["dice1"]
                save_checkpoint(paths["ckpt_path"],
                                {"params": params, "epoch": epoch}, epoch,
                                name="best_dice")
            if scores["aji"] > best_aji:
                best_aji = scores["aji"]
                save_checkpoint(paths["ckpt_path"],
                                {"params": params, "epoch": epoch}, epoch,
                                name="best_aji")
    return params


def validate_nuclei(args, cfg, rcfg, params, val_ds, bank, key) -> Dict[str, float]:
    """Full-image nuclei eval over the ENTIRE test set (the reference iterates
    the full test loader, ``func_2d/function.py:268-678``): decode per-cell
    masks at GT points, paint an instance map, score the reference's metric
    set Dice1/Dice2/AJI/AJI+/DQ/SQ/PQ. ``-val_max_samples N`` caps the count
    for smoke runs (0 = all). (The sliding-window crop inference engine is in
    ``medsam2_tpu/api/nuclei_inference.py``.)"""
    from medsam2_tpu.api.nuclei_inference import predict_instances
    from medsam2_tpu.metrics.instance import get_fast_aji_plus, get_fast_dice_2

    tot = {"dice1": 0.0, "dice2": 0.0, "aji": 0.0, "aji_plus": 0.0,
           "dq": 0.0, "sq": 0.0, "pq": 0.0}
    n = 0
    cap = int(getattr(args, "val_max_samples", 0) or 0)
    n_val = len(val_ds) if cap <= 0 else min(len(val_ds), cap)
    for i in range(n_val):
        s = val_ds[i]
        inst_map = s.get("inst_map")
        if inst_map is None:
            continue
        key, sub = jax.random.split(key)
        pred_inst = predict_instances(
            params, cfg, rcfg, s, bank, sub,
            filtering=bool(getattr(args, "point_filtering", False)))
        gt = remap_label(inst_map)
        pr = remap_label(pred_inst)
        if getattr(args, "vis", False):
            # agreement map + GT prompt points, as the reference's nuclei eval
            # dumps per image (func_2d/function.py:663-665)
            from medsam2_tpu.utils.visualization import (vis_compare_point,
                                                         vis_inst_image)
            sample_dir = getattr(args, "_sample_dir", None)
            if sample_dir:
                pts = s.get("points_all")
                vis_compare_point(pr > 0, gt > 0, pts,
                                  os.path.join(sample_dir, f"val{i}_compare.png"))
                vis_inst_image(s["image"], pr,
                               os.path.join(sample_dir, f"val{i}_inst.png"))
        tot["dice1"] += get_dice_1(gt, pr)
        tot["dice2"] += get_fast_dice_2(gt, pr) if gt.max() and pr.max() else 0.0
        if gt.max() and pr.max():
            tot["aji"] += get_fast_aji(gt, pr)
            tot["aji_plus"] += get_fast_aji_plus(gt, pr)
        (dq, sq, pq), _ = get_fast_pq(gt, pr)
        tot["dq"] += dq
        tot["sq"] += sq
        tot["pq"] += pq
        n += 1
    return {k: v / max(n, 1) for k, v in tot.items()}


def main(argv=None):
    args = parse_args(argv)
    if args.dataset in ("refuge",):
        workload = "refuge"
    elif args.dataset in ("monuseg", "cpm"):
        workload = "nuclei"
    else:
        workload = "nuclei" if args.net == "prompter" else "refuge"

    dense = 16 if workload == "nuclei" and args.image_size == 256 else None
    cfg = get_config(args.sam_config, image_size=args.image_size,
                     dense_embed_size=dense)
    paths = set_log_dir(args.logdir, args.exp_name)
    logger = create_logger(paths["log_path"])
    logger.info(vars(args))
    if workload == "refuge":
        return train_refuge(args, cfg, logger, paths)
    return train_nuclei(args, cfg, logger, paths)


if __name__ == "__main__":
    main()
