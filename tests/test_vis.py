"""Visualization smoke tests (matplotlib fallbacks; open3d absent here)."""
import os
import os.path as osp

import numpy as np

from spann3r_tpu.tools.vis import (pts_to_hsv_image, render_frames,
                                   render_turntable, vis_pred_and_imgs)


def test_vis_pred_and_imgs_writes_artifacts(tmp_path, rng):
    t, h, w = 3, 16, 20
    pts = rng.standard_normal((t, h, w, 3)).astype(np.float32)
    imgs = rng.random((t, h, w, 3)).astype(np.float32)
    conf = rng.random((t, h, w)).astype(np.float32)
    vis_pred_and_imgs(pts, str(tmp_path), images_all=imgs, conf_all=conf,
                      save_video=False)
    assert len(os.listdir(tmp_path / "pts")) == t
    assert len(os.listdir(tmp_path / "imgs")) == t
    assert len(os.listdir(tmp_path / "confs")) == t


def test_turntable_render(tmp_path, rng):
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    cols = rng.random((500, 3)).astype(np.float32)
    render_turntable(pts, cols, str(tmp_path / "render"), n_views=2,
                     image_size=64)
    assert len(os.listdir(tmp_path / "render")) == 2


def test_render_frames_fallback(tmp_path, rng):
    t, h, w = 2, 8, 8
    pts = rng.standard_normal((t, h, w, 3)).astype(np.float32)
    imgs = rng.random((t, h, w, 3)).astype(np.float32)
    mask = np.ones((t, h, w), bool)
    render_frames(pts, imgs, None, str(tmp_path), mask=mask)
    assert os.path.isdir(tmp_path / "render")


def test_hsv_image_range(rng):
    img = pts_to_hsv_image(rng.standard_normal((8, 8, 3)))
    assert img.min() >= 0 and img.max() <= 1
