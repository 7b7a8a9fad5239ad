"""Two-view (pairwise) loss + scaling parity vs reference dust3r/losses.py."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from spann3r_tpu import losses as L

from .conftest import requires_reference

B, H, W = 2, 8, 12


def _pose(rng):
    p = np.eye(4, dtype=np.float32)
    p[:3, :3] = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    p[:3, 3] = rng.standard_normal(3)
    return p


def _views(rng):
    mk = lambda: {
        "pts3d": rng.standard_normal((B, H, W, 3)).astype(np.float32) + 2.0,
        "valid_mask": rng.random((B, H, W)) > 0.3,
        "camera_pose": np.stack([_pose(rng) for _ in range(B)]),
    }
    gt1, gt2 = mk(), mk()
    pred1 = {"pts3d": rng.standard_normal((B, H, W, 3)).astype(np.float32) + 2,
             "conf": 1 + np.exp(rng.standard_normal((B, H, W)).astype(np.float32))}
    pred2 = {"pts3d_in_other_view":
             rng.standard_normal((B, H, W, 3)).astype(np.float32) + 2,
             "conf": 1 + np.exp(rng.standard_normal((B, H, W)).astype(np.float32))}
    return gt1, gt2, pred1, pred2


def _t(d):
    import torch
    return {k: torch.from_numpy(v) if isinstance(v, np.ndarray) else v
            for k, v in d.items()}


@requires_reference
def test_conf_loss_pair_parity(rng):
    import torch
    from dust3r.losses import L21, ConfLoss, Regr3D

    gt1, gt2, pred1, pred2 = _views(rng)
    crit = ConfLoss(Regr3D(L21, norm_mode="avg_dis"), alpha=0.2)
    with torch.no_grad():
        ref_loss, _ = crit.compute_loss(_t(gt1), _t(gt2), _t(pred1), _t(pred2))

    j = lambda d: {k: jnp.asarray(v) for k, v in d.items()}
    loss, _ = L.conf_loss_pair(j(gt1), j(gt2), j(pred1), j(pred2), alpha=0.2)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)


@requires_reference
@pytest.mark.parametrize("mode", ["avg", "median", "weiszfeld_stop_grad"])
def test_find_opt_scaling_parity(rng, mode):
    import torch
    from dust3r.inference import find_opt_scaling

    gt1 = rng.standard_normal((B, H, W, 3)).astype(np.float32) + 2
    gt2 = rng.standard_normal((B, H, W, 3)).astype(np.float32) + 2
    pr1 = gt1 * 1.7 + 0.05 * rng.standard_normal((B, H, W, 3)).astype(np.float32)
    pr2 = gt2 * 1.7 + 0.05 * rng.standard_normal((B, H, W, 3)).astype(np.float32)
    v1 = rng.random((B, H, W)) > 0.2
    v2 = rng.random((B, H, W)) > 0.2

    with torch.no_grad():
        ref = find_opt_scaling(torch.from_numpy(gt1), torch.from_numpy(gt2),
                               torch.from_numpy(pr1), torch.from_numpy(pr2),
                               fit_mode=mode,
                               valid1=torch.from_numpy(v1),
                               valid2=torch.from_numpy(v2)).numpy()
    ours = L.find_opt_scaling(jnp.asarray(gt1), jnp.asarray(gt2),
                              jnp.asarray(pr1), jnp.asarray(pr2),
                              fit_mode=mode, valid1=jnp.asarray(v1),
                              valid2=jnp.asarray(v2))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3)


def test_sincos_pos_embed_matches_reference_shape():
    from spann3r_tpu.models.vit import get_2d_sincos_pos_embed
    emb = get_2d_sincos_pos_embed(64, 4)
    assert emb.shape == (16, 64)
    emb_cls = get_2d_sincos_pos_embed(64, 4, n_cls_token=1)
    assert emb_cls.shape == (17, 64)
    np.testing.assert_allclose(np.asarray(emb_cls[0]), 0.0)


@requires_reference
def test_sincos_pos_embed_parity():
    from models.pos_embed import get_2d_sincos_pos_embed as ref_fn
    from spann3r_tpu.models.vit import get_2d_sincos_pos_embed
    np.testing.assert_allclose(np.asarray(get_2d_sincos_pos_embed(32, 7)),
                               ref_fn(32, 7), rtol=1e-6)
