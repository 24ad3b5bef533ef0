"""Golden-tensor dump tool (SURVEY.md §7.1 item 4).

Given SAM2 params (converted from a released ``sam2_hiera_t/s.pt`` or random),
runs each core module on fixed synthetic inputs and dumps inputs + outputs to
an ``.npz``. Use cases:

- cross-round parity pinning: after a refactor, re-run and diff against the
  stored goldens (``compare_goldens``);
- cross-framework parity: an environment with the reference PyTorch model can
  feed the same inputs (stored in the npz) through torch and diff outputs.

CLI: ``python -m medsam2_tpu.checkpoint.goldens out.npz [--ckpt path] [--preset sam2_hiera_t]``
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import get_config
from medsam2_tpu.core import sam2_model
from medsam2_tpu.core.hiera import hiera_apply
from medsam2_tpu.core.image_encoder import fpn_neck_apply
from medsam2_tpu.core.memory import memory_attention_apply, memory_encoder_apply


def dump_goldens(params, cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    S = cfg.image_size
    out: Dict[str, np.ndarray] = {"image_size": np.asarray(S)}

    # full image encoder
    img = rng.standard_normal((1, S, S, 3)).astype(np.float32)
    out["in_image"] = img
    backbone = sam2_model.forward_image(params, cfg, jnp.asarray(img))
    for i, f in enumerate(backbone["backbone_fpn"]):
        out[f"out_backbone_fpn_{i}"] = np.asarray(f, np.float32)
    out["out_vision_features"] = np.asarray(backbone["vision_features"], np.float32)

    # prompt encoder + SAM heads with a fixed click
    coords = np.array([[[S * 0.5, S * 0.4]]], np.float32)
    labels = np.array([[1]], np.int32)
    out["in_point_coords"] = coords
    out["in_point_labels"] = labels
    feats, pos, _ = sam2_model.prepare_backbone_features(cfg, backbone)
    image_embed = feats[-1]
    B, h, w, C = image_embed.shape
    image_embed = (image_embed.reshape(B, h * w, C)
                   + params["no_mem_embed"].astype(image_embed.dtype)).reshape(B, h, w, C)
    heads = sam2_model.forward_sam_heads(
        params, cfg, image_embed,
        point_inputs={"point_coords": jnp.asarray(coords), "point_labels": jnp.asarray(labels)},
        high_res_features=feats[:-1], multimask_output=True)
    out["out_low_res_multimasks"] = np.asarray(heads.low_res_multimasks, np.float32)
    out["out_ious"] = np.asarray(heads.ious, np.float32)
    out["out_obj_ptr"] = np.asarray(heads.obj_ptr, np.float32)
    out["out_object_score_logits"] = np.asarray(heads.object_score_logits, np.float32)

    # memory encoder on the best mask
    mem_feats, _ = sam2_model.encode_new_memory(
        params, cfg, feats[-1], heads.high_res_masks, is_mask_from_pts=True)
    out["out_maskmem_features"] = np.asarray(mem_feats, np.float32)
    return out


def compare_goldens(a: Dict[str, np.ndarray], b: Dict[str, np.ndarray],
                    atol: float = 1e-3) -> Dict[str, float]:
    """Max abs diff per shared output key; raises on mismatch beyond atol."""
    diffs = {}
    for k in a:
        if not k.startswith("out_") or k not in b:
            continue
        d = float(np.max(np.abs(np.asarray(a[k]) - np.asarray(b[k]))))
        diffs[k] = d
        if d > atol:
            raise AssertionError(f"golden mismatch at {k}: max abs diff {d}")
    return diffs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output .npz path")
    ap.add_argument("--ckpt", default=None, help="torch .pt or orbax checkpoint")
    ap.add_argument("--preset", default="sam2_hiera_t")
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = get_config(args.preset, image_size=args.image_size)
    if args.ckpt:
        from medsam2_tpu.checkpoint.store import load_params

        params = load_params(args.ckpt, cfg)
    else:
        params = sam2_model.sam2_init(jax.random.PRNGKey(args.seed), cfg)
    goldens = dump_goldens(params, cfg, args.seed)
    np.savez_compressed(args.out, **goldens)
    print(f"wrote {len(goldens)} arrays to {args.out}")


if __name__ == "__main__":
    main()
