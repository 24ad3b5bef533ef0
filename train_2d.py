#!/usr/bin/env python3
"""Root entry point matching the reference README command
(``python train_2d.py -net sam2 -exp_name REFUGE ...``, README.md:51)."""

from medsam2_tpu.cli.train_2d import main

if __name__ == "__main__":
    main()
