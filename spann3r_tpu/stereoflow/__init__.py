"""Stereo-matching / optical-flow downstream task family (ref
croco/stereoflow/): CroCo binocular finetuning with a pixelwise DPT head,
Laplacian confidence losses, tiled high-resolution inference, the stereo /
flow dataset zoo, and train/test drivers (stereoflow_train.py,
stereoflow_test.py at the repo root).

TPU-native layout: NHWC activations, pure apply fns over pytree params,
jit-compiled train/tile steps; predictions are (B, H, W, C) with
C = 1 (disparity) / 2 (flow) (+1 confidence channel when the criterion
carries one), matching the reference's B x C x H x W contract transposed.
"""
from .head import init_pixelwise_dpt, pixelwise_dpt_apply  # noqa: F401
from .criterion import (build_criterion, stereo_metrics,  # noqa: F401
                        flow_metrics, StereoDatasetMetrics,
                        FlowDatasetMetrics)
from .tiling import tiled_pred, tile_slices  # noqa: F401
