"""Training entry shim (ref train.py:1-6)."""
import argparse

from spann3r_tpu.training import get_args_parser, train

if __name__ == "__main__":
    parser = argparse.ArgumentParser("Spann3R-TPU training",
                                     parents=[get_args_parser()])
    train(parser.parse_args())
