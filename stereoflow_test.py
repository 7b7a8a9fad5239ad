#!/usr/bin/env python3
"""Evaluate a finetuned stereo/flow model with tiled inference
(ref croco/stereoflow/test.py CLI)."""
from spann3r_tpu.stereoflow.driver import get_test_args_parser, test_main

if __name__ == "__main__":
    test_main(get_test_args_parser().parse_args())
