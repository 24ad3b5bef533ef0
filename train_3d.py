#!/usr/bin/env python3
"""Root entry point matching the reference README command
(``python train_3d.py -net sam2 -exp_name BTCV ...``, README.md:64)."""

from medsam2_tpu.cli.train_3d import main

if __name__ == "__main__":
    main()
