"""CLI argument surface — flag-compatible with the reference ``cfg.py`` so the
README commands (``python train_2d.py -net sam2 ...``, ``train_3d.py``) run
unchanged, plus TPU-specific additions (mesh shape, synthetic-data fallback)."""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--seed', default=42, type=int)
    parser.add_argument('-print_freq', type=int, default=100, help='print_freq')
    parser.add_argument('--model_ema_steps', type=int, default=1,
                        help='iterations between EMA model updates')
    parser.add_argument('--model-ema', action='store_true',
                        help='track an exponential moving average of params')
    parser.add_argument('--model-ema-decay', type=float, default=0.99)
    parser.add_argument('--clip-grad', type=float, default=0.1,
                        help='Clip gradient norm (default: 0.1)')
    parser.add_argument('--overlap', default=64, type=int, help='overlapping pixels')
    parser.add_argument('--crop_size', default=256, type=int,
                        help='sliding-window crop size')
    parser.add_argument('--eval', action='store_true')
    parser.add_argument('-net', type=str, default='sam2', help='net type')
    parser.add_argument('-encoder', type=str, default='vit_b', help='encoder type')
    parser.add_argument('-exp_name', default='medsam2_tpu', type=str)
    parser.add_argument('-vis', type=lambda s: s not in ('0', 'False', 'false'),
                        default=False, help='visualisation during validation')
    parser.add_argument('-train_vis', type=lambda s: s not in ('0', 'False', 'false'),
                        default=False)
    parser.add_argument('-prompt', type=str, default='click',
                        help='type of prompt, bbox or click')
    parser.add_argument('-prompt_freq', type=int, default=2,
                        help='frequency of giving prompt in 3D images')
    parser.add_argument('-augment', type=int, default=1,
                        help='nuclei training augmentation (crop/flip/rot90/'
                             'color jitter) on=1 / off=0')
    parser.add_argument('-pretrain', type=str, default=None,
                        help='path of pretrain weights (torch .pt or orbax dir)')
    parser.add_argument('-val_freq', type=int, default=3)
    parser.add_argument('-val_max_samples', type=int, default=0,
                        help='cap validation to N samples for smoke runs; '
                             '0 = the full test set (the reference protocol, '
                             'train_2d.py:155-164)')
    parser.add_argument('-gpu', type=bool, default=True)      # accepted, unused (TPU)
    parser.add_argument('-gpu_device', type=int, default=0)   # accepted, unused (TPU)
    parser.add_argument('-image_size', type=int, default=1024)
    parser.add_argument('-out_size', type=int, default=1024, help='output size')
    parser.add_argument('-distributed', default='none', type=str,
                        help="'none' or 'data[:model]' mesh spec, e.g. 'data' or '4x2'")
    parser.add_argument('-dataset', default='btcv', type=str,
                        help='btcv | amos | refuge | monuseg | cpm | synthetic')
    parser.add_argument('-sam_ckpt', type=str, default=None,
                        help='SAM2 checkpoint (.pt torch or orbax dir); None = random init')
    parser.add_argument('-sam_config', type=str, default='sam2_hiera_s')
    parser.add_argument('-video_length', type=int, default=8)
    parser.add_argument('-b', type=int, default=1, help='batch size')
    parser.add_argument('-lr', type=float, default=1e-4)
    parser.add_argument('-weights', type=str, default=None,
                        help='weights file for evaluation')
    parser.add_argument('-multimask_output', type=int, default=1)
    parser.add_argument('-memory_bank_size', type=int, default=16)
    parser.add_argument('-data_path', type=str, default=None,
                        help='dataset root; None with -dataset synthetic uses generators')
    # TPU-specific
    parser.add_argument('-epochs', type=int, default=100)
    parser.add_argument('-max_objects', type=int, default=2,
                        help='static object slots for the 3D recipe')
    parser.add_argument('-max_cells', type=int, default=64,
                        help='static cell slots for the nuclei recipe')
    parser.add_argument('-steps_per_epoch', type=int, default=0,
                        help='cap steps per epoch (0 = full dataset)')
    parser.add_argument('-point_filtering', action='store_true',
                        help='nuclei eval: keep only prompter points whose '
                             'pixel is positive in the semantic mask (the '
                             "reference's cfgs.test.filtering, "
                             'modeling/utils.py:423-427)')
    parser.add_argument('-profile', action='store_true',
                        help='capture a jax.profiler trace of the first steps')
    parser.add_argument('-logdir', type=str, default='logs')
    parser.add_argument('-resume', type=str, default=None,
                        help='checkpoint dir to resume training from (params + '
                             'optimizer state + epoch)')
    return parser.parse_args(argv)
