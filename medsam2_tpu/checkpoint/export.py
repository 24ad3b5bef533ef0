"""Export our params back to a reference-format torch ``.pt`` checkpoint, so
models trained here can be loaded by the PyTorch Medical-SAM2/SAM2 stack
(``build_sam._load_checkpoint`` expects ``{"model": state_dict}``).

CLI: ``python -m medsam2_tpu.checkpoint.export <orbax_dir_or_step> <out.pt> [--preset ...]``
"""

from __future__ import annotations

import argparse


def export_to_torch(params, cfg, out_path: str) -> None:
    import torch

    from medsam2_tpu.checkpoint.convert import export_state_dict

    sd = export_state_dict(params, cfg)
    torch_sd = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    torch.save({"model": torch_sd}, out_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="orbax checkpoint dir (or step dir)")
    ap.add_argument("out", help="output .pt path")
    ap.add_argument("--preset", default="sam2_hiera_s")
    ap.add_argument("--image_size", type=int, default=1024)
    args = ap.parse_args()

    from medsam2_tpu.configs import get_config
    from medsam2_tpu.checkpoint.store import load_params

    cfg = get_config(args.preset, image_size=args.image_size)
    params = load_params(args.checkpoint, cfg)
    export_to_torch(params, cfg, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
