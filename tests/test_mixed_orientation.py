"""Mixed portrait/landscape batch handling (transpose_to_landscape port)."""
import jax
import numpy as np
import pytest

from spann3r_tpu.config import DUSt3RConfig, FP32, ViTConfig
from spann3r_tpu.models import dust3r as d3


def cfg():
    return DUSt3RConfig(img_size=(48, 32), patch_size=16,
                        enc=ViTConfig(dim=64, depth=2, num_heads=4),
                        dec=ViTConfig(dim=48, depth=12, num_heads=4),
                        head_type="linear")


def test_mixed_batch_matches_groupwise(rng):
    c = cfg()
    params = d3.init_dust3r(jax.random.PRNGKey(0), c)
    # stored landscape layout (32 x 48); samples 0,2 landscape, 1 portrait
    imgs1 = rng.standard_normal((3, 32, 48, 3)).astype(np.float32)
    imgs2 = rng.standard_normal((3, 32, 48, 3)).astype(np.float32)
    shapes = np.array([[32, 48], [48, 32], [32, 48]], np.int32)

    r1, r2 = d3.forward_mixed(params, imgs1, imgs2, shapes, shapes, c, FP32)
    assert r1["pts3d"].shape == (3, 32, 48, 3)

    # landscape samples == direct landscape forward
    dl1, dl2 = d3.forward(params, imgs1[[0, 2]], imgs2[[0, 2]], c, FP32)
    np.testing.assert_allclose(r1["pts3d"][[0, 2]], np.asarray(dl1["pts3d"]),
                               rtol=1e-5, atol=1e-5)

    # portrait sample == transposed forward of the transposed image
    p1 = imgs1[1:2].swapaxes(1, 2)
    p2 = imgs2[1:2].swapaxes(1, 2)
    dp1, dp2 = d3.forward(params, p1, p2, c, FP32)
    np.testing.assert_allclose(r1["pts3d"][1],
                               np.asarray(dp1["pts3d"])[0].swapaxes(0, 1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        r2["pts3d_in_other_view"][1],
        np.asarray(dp2["pts3d_in_other_view"])[0].swapaxes(0, 1),
        rtol=1e-5, atol=1e-5)
