#!/usr/bin/env python3
"""Finetune CroCo on stereo matching or optical flow
(ref croco/stereoflow/train.py CLI)."""
from spann3r_tpu.stereoflow.driver import get_args_parser, main

if __name__ == "__main__":
    main(get_args_parser().parse_args())
