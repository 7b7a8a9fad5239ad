"""ColorJitter parity vs torchvision semantics (the reference trains with
tvf.ColorJitter(0.5, 0.5, 0.5, 0.1) + ImgNorm,
dust3r/datasets/utils/transforms.py:11).

torchvision is not installed in this image, so the oracle re-derives the
torchvision PIL-backend formulas independently (ImageEnhance for
brightness/contrast/saturation — torchvision F_pil literally calls these —
and the uint8-wraparound HSV shift for hue, transforms/functional_pil.py).
If torchvision IS importable, the same assertions run bit-exact against it.
"""
import numpy as np
import PIL.Image
import pytest
import torch

from spann3r_tpu.datasets.base import (ColorJitter, adjust_brightness,
                                       adjust_contrast, adjust_hue,
                                       adjust_saturation, img_norm)

try:
    import torchvision.transforms.functional as TF
    HAS_TV = True
except ImportError:
    TF = None
    HAS_TV = False


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(3)
    return PIL.Image.fromarray(
        (rng.random((48, 64, 3)) * 255).astype(np.uint8))


def oracle_hue(image, factor):
    """torchvision F_pil.adjust_hue, transcribed from its documented
    algorithm: split PIL-HSV, np_h += np.uint8(factor*255) with C overflow,
    merge, convert back to RGB."""
    h, s, v = image.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    with np.errstate(over="ignore"):
        # C-style cast: truncate toward zero, wrap mod 256 (negative factors
        # land on 256 - |shift|), then uint8 overflow add
        np_h += np.array(factor * 255).astype(np.uint8)
    return PIL.Image.merge(
        "HSV", (PIL.Image.fromarray(np_h, "L"), s, v)).convert("RGB")


@pytest.mark.parametrize("factor", [-0.1, -0.05, 0.0, 0.049, 0.1])
def test_hue_matches_torchvision_formula(image, factor):
    got = np.asarray(adjust_hue(image, factor))
    np.testing.assert_array_equal(got, np.asarray(oracle_hue(image, factor)))
    if HAS_TV:
        np.testing.assert_array_equal(got,
                                      np.asarray(TF.adjust_hue(image, factor)))


@pytest.mark.skipif(not HAS_TV, reason="torchvision not installed; "
                    "b/c/s ops ARE ImageEnhance in torchvision's PIL backend")
@pytest.mark.parametrize("factor", [0.5, 0.73, 1.0, 1.31, 1.5])
def test_bcs_ops_bit_exact_vs_torchvision(image, factor):
    for ours, theirs in [(adjust_brightness, TF.adjust_brightness),
                         (adjust_contrast, TF.adjust_contrast),
                         (adjust_saturation, TF.adjust_saturation)]:
        np.testing.assert_array_equal(np.asarray(ours(image, factor)),
                                      np.asarray(theirs(image, factor)))


def test_bcs_blend_semantics(image):
    """The three enhance ops are linear blends toward black / mean-gray /
    grayscale (what torchvision's _blend computes); spot-check endpoints and
    the blend identity at uint8 precision."""
    arr = np.asarray(image, np.float32)
    # factor 0 endpoints
    assert np.asarray(adjust_brightness(image, 0.0)).max() == 0
    gray = np.asarray(image.convert("L"), np.float32)
    cm = np.asarray(adjust_contrast(image, 0.0), np.float32)
    assert np.unique(cm).size == 1
    assert abs(cm.mean() - round(gray.mean() + 1e-9)) <= 1.0
    sat0 = np.asarray(adjust_saturation(image, 0.0), np.float32)
    np.testing.assert_allclose(sat0[..., 0], sat0[..., 1], atol=1)
    # factor 1 is identity
    for op in (adjust_brightness, adjust_contrast, adjust_saturation):
        np.testing.assert_array_equal(np.asarray(op(image, 1.0)), arr)
    # mid-blend: brightness(f) == round(f * img) clipped
    got = np.asarray(adjust_brightness(image, 0.4), np.float32)
    want = np.clip(np.round(arr * 0.4 - 1e-6), 0, 255)
    assert np.abs(got - want).max() <= 1.0


def test_composed_pipeline_and_imgnorm(image):
    """apply() composes the ops in the given order; img_norm matches
    ToTensor + Normalize(0.5, 0.5) (verified against torch)."""
    order = [2, 0, 3, 1]
    b, c, s, h = 1.37, 0.62, 1.18, -0.083
    ref = image
    for idx in order:
        ref = [adjust_brightness, adjust_contrast,
               adjust_saturation, adjust_hue][idx](ref, [b, c, s, h][idx])
    got = ColorJitter.apply(image, order, b, c, s, h)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    t = torch.from_numpy(np.asarray(got)).permute(2, 0, 1).float() / 255.0
    want = ((t - 0.5) / 0.5).permute(1, 2, 0).numpy()
    np.testing.assert_allclose(img_norm(got), want, atol=1e-6)


def test_call_draws_valid_params_and_randomizes_order(image):
    cj = ColorJitter(rng=np.random.default_rng(0))
    orders = set()
    for _ in range(50):
        order, b, c, s, h = cj.get_params()
        assert sorted(order.tolist()) == [0, 1, 2, 3]
        assert 0.5 <= b <= 1.5 and 0.5 <= c <= 1.5 and 0.5 <= s <= 1.5
        assert -0.1 <= h <= 0.1
        orders.add(tuple(order.tolist()))
    assert len(orders) > 5  # order really is randomized per call
    out = cj(image)
    assert out.shape == (48, 64, 3) and out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0
