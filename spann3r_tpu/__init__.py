"""spann3r_tpu — TPU-native incremental dense 3D reconstruction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
HengyiWang/spann3r (Spann3R, arXiv 2408.16061): DUSt3R two-view pointmap
regression wrapped in a spatial memory for streaming multi-frame
reconstruction, plus training, evaluation and serving stacks.
"""
__version__ = "0.1.0"
