"""Zero-valid-mask edges of the masked statistics (torch nan-op semantics:
an all-NaN slice yields NaN, never a silent finfo.max sentinel)."""
import numpy as np
import torch

from spann3r_tpu.utils.masked import masked_mean, masked_median, masked_quantile


def test_masked_median_empty_slice_is_nan():
    x = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32)
    mask = np.array([[True, True, False], [False, False, False]])
    out = np.asarray(masked_median(x, mask, axis=-1))
    assert out[0] == 1.0  # lower-middle of [1,2], torch.nanmedian semantics
    assert np.isnan(out[1])


def test_masked_quantile_empty_slice_is_nan():
    x = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32)
    mask = np.array([[True, True, True], [False, False, False]])
    out = np.asarray(masked_quantile(x, mask, 0.5, axis=-1))
    assert abs(out[0] - 2.0) < 1e-6
    assert np.isnan(out[1])


def test_masked_stats_match_torch_nan_ops():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    mask = rng.random((4, 64)) > 0.4
    mask[2] = False  # one all-invalid row
    xt = torch.tensor(np.where(mask, x, np.nan))
    ref_med = xt.nanmedian(dim=-1).values.numpy()
    ref_q = np.asarray(torch.nanquantile(xt.double(), 0.3, dim=-1), np.float32)
    got_med = np.asarray(masked_median(x, mask, axis=-1))
    got_q = np.asarray(masked_quantile(x, mask, 0.3, axis=-1))
    np.testing.assert_allclose(got_med[mask.any(-1)], ref_med[mask.any(-1)],
                               rtol=1e-6)
    np.testing.assert_allclose(got_q[mask.any(-1)], ref_q[mask.any(-1)],
                               rtol=1e-4, atol=1e-5)
    assert np.isnan(got_med[2]) and np.isnan(ref_med[2])
    assert np.isnan(got_q[2])


def test_all_invalid_frames_contribute_zero_loss():
    """Frames with zero valid pixels contribute 0 to the training loss —
    reference ConfLoss_t semantics (spann3r/loss.py:284: the masked
    selection is empty, so `conf_loss.mean() if numel > 0 else 0`).  The
    fail-loudly NaN behaviour lives in the EVAL alignment path
    (masked_median/masked_quantile, tested above), where silently
    substituting finfo.max would corrupt chamfer numbers."""
    import jax.numpy as jnp
    from spann3r_tpu import losses as L

    t, b, h, w = 3, 1, 4, 4
    rng = np.random.default_rng(1)
    gts = {"pts3d": jnp.asarray(rng.standard_normal((t, b, h, w, 3)) + 2,
                                jnp.float32),
           "valid_mask": jnp.zeros((t, b, h, w), bool),  # nothing valid
           "camera_pose": jnp.broadcast_to(jnp.eye(4), (t, b, 4, 4))}
    preds = {"pts3d_1": jnp.ones((t - 1, b, h, w, 3), jnp.float32),
             "pts3d_2": jnp.ones((t - 1, b, h, w, 3), jnp.float32),
             "conf_1": jnp.ones((t - 1, b, h, w), jnp.float32) + 1,
             "conf_2": jnp.ones((t - 1, b, h, w), jnp.float32) + 1}
    loss, _, _ = L.conf_loss_t(gts, preds, alpha=0.4, norm_mode=True)
    assert float(loss) == 0.0
