"""CroCo pretraining entry point (ref croco/pretrain.py:249-254)."""
from spann3r_tpu.pretraining import get_args_parser, main

if __name__ == "__main__":
    main(get_args_parser().parse_args())
