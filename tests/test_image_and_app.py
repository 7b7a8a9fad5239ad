"""utils/image load_images resize rules + app headless reconstruction."""
import os
import os.path as osp

import jax
import numpy as np
import pytest

from spann3r_tpu.utils.image import imread_cv2, load_images, rgb


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("li")
    rng = np.random.default_rng(0)
    cv2.imwrite(str(d / "a.jpg"),
                (rng.random((480, 640, 3)) * 255).astype(np.uint8))
    cv2.imwrite(str(d / "b.png"),
                (rng.random((640, 480, 3)) * 255).astype(np.uint8))
    return str(d)


def test_load_images_224_center_crop(img_dir):
    views = load_images(img_dir, size=224)
    assert len(views) == 2
    for v in views:
        assert v["img"].shape == (1, 224, 224, 3)
        assert tuple(v["true_shape"][0]) == (224, 224)
        assert -1.01 <= v["img"].min() and v["img"].max() <= 1.01


def test_load_images_512_multiple_of_16(img_dir):
    views = load_images(img_dir, size=512)
    for v in views:
        _, h, w, _ = v["img"].shape
        assert h % 16 == 0 and w % 16 == 0
        assert max(h, w) <= 512


def test_imread_and_rgb_roundtrip(img_dir):
    arr = imread_cv2(osp.join(img_dir, "a.jpg"))
    assert arr.dtype == np.uint8 and arr.shape[2] == 3
    norm = (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
    back = rgb(norm)
    np.testing.assert_allclose(back, arr / 255.0, atol=1e-2)


def test_app_reconstruct_headless(img_dir, tmp_path, monkeypatch, rng):
    """app.reconstruct on a frame DIRECTORY (ffmpeg-free path) -> GLB."""
    import app as app_mod
    import demo as demo_cli
    from spann3r_tpu.config import (DUSt3RConfig, FP32, Spann3RConfig,
                                    ViTConfig)
    from spann3r_tpu.models import spann3r as sp
    import cv2

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(3):
        cv2.imwrite(str(frames / f"{i:03d}.jpg"),
                    (rng.random((96, 128, 3)) * 255).astype(np.uint8))

    cfg = Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=(32, 32), patch_size=16,
                            enc=ViTConfig(dim=64, depth=2, num_heads=4),
                            dec=ViTConfig(dim=48, depth=12, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=64, value_enc_heads=4,
        attn_head_in=64 + 48, attn_head_out=64)
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    monkeypatch.setattr(demo_cli, "load_model",
                        lambda args: (params, cfg, FP32))

    from spann3r_tpu.utils.export import read_glb

    # default = triangle-mesh GLB (ref app.py as_pointcloud default False)
    glb = app_mod.reconstruct(str(frames), conf_thresh=0.0, kf_every=1,
                              resolution=32, out_dir=str(tmp_path / "out"))
    assert osp.exists(glb)
    mesh = read_glb(glb)
    n_verts = 3 * 32 * 32  # 3 frames of 32x32 pointmaps
    assert mesh["positions"].shape == (n_verts, 3)
    assert mesh["colors"].shape == (n_verts, 3)
    faces = mesh["indices"]
    assert len(faces) == 3 * 31 * 31 * 2  # 2 tris per valid pixel quad
    assert faces.max() < n_verts
    assert mesh["json"]["materials"][0]["doubleSided"] is True

    # pointcloud mode
    glb_pc = app_mod.reconstruct(str(frames), conf_thresh=0.0, kf_every=1,
                                 as_pointcloud=True, resolution=32,
                                 out_dir=str(tmp_path / "out_pc"))
    pc = read_glb(glb_pc)
    assert pc["indices"] is None
    assert pc["json"]["meshes"][0]["primitives"][0]["mode"] == 0
    assert len(pc["positions"]) == n_verts  # conf_thresh 0 keeps everything
