"""test_one_epoch observability: PLY dumps + per-detail loss meters
(ref spann3r/training.py:126-149 dumps the first ~100 eval recons and
tracks a meter per loss component)."""
import glob
import os.path as osp

import jax
import numpy as np

from spann3r_tpu import training as tr
from spann3r_tpu.config import DUSt3RConfig, FP32, Spann3RConfig, ViTConfig
from spann3r_tpu.models import spann3r as sp

HW = (32, 32)
T = 3


def tiny_cfg():
    return Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=HW, patch_size=16,
                            enc=ViTConfig(dim=64, depth=2, num_heads=4),
                            dec=ViTConfig(dim=48, depth=12, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=64, value_enc_heads=4,
        attn_head_in=64 + 48, attn_head_out=64)


class SynthViews:
    """4 items, each a T-frame view list (the dataset contract)."""

    def __init__(self):
        rng = np.random.default_rng(0)
        self.items = []
        for _ in range(4):
            views = []
            for _ in range(T):
                views.append({
                    "img": rng.standard_normal((*HW, 3)).astype(np.float32) * 0.3,
                    "pts3d": rng.standard_normal((*HW, 3)).astype(np.float32) + 2.0,
                    "valid_mask": np.ones(HW, bool),
                    "camera_pose": np.eye(4, dtype=np.float32),
                })
            self.items.append(views)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_eval_epoch_dumps_plys_and_detail_meters(tmp_path):
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    eval_step = tr.make_eval_step(cfg, FP32)

    stats = tr.test_one_epoch(eval_step, params, SynthViews(), batch_size=2,
                              output_dir=str(tmp_path), epoch=3, max_ply=3)

    assert np.isfinite(stats["loss_avg"]) and np.isfinite(stats["loss_med"])
    # per-detail meters beyond the aggregate (ref training.py:139-147)
    detail_keys = [k for k in stats if k not in ("loss_avg", "loss_med")]
    assert detail_keys, stats
    assert all(np.isfinite(stats[k]) for k in detail_keys)

    plys = sorted(glob.glob(osp.join(str(tmp_path), "eval_ply", "*.ply")))
    assert len(plys) == 3, plys
    assert all("epoch003" in osp.basename(p) for p in plys)
    from spann3r_tpu.utils.export import read_ply
    pts, cols = read_ply(plys[0])
    assert pts.ndim == 2 and pts.shape[1] == 3
    assert len(pts) > 0 and np.isfinite(pts).all()
    assert cols.min() >= 0 and cols.max() <= 255


def test_eval_epoch_handles_resized_dataset(tmp_path):
    """Regression: a '2 @ ds' test set must get set_epoch() before indexing
    (found by a real-TPU driver run; ref training.py:107-110)."""
    from spann3r_tpu.datasets.base import ResizedDataset

    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    eval_step = tr.make_eval_step(cfg, FP32)
    ds = ResizedDataset(2, SynthViews())
    stats = tr.test_one_epoch(eval_step, params, ds, batch_size=1,
                              output_dir=None, epoch=0)
    assert np.isfinite(stats["loss_avg"])
