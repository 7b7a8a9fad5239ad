"""Sky segmentation, camera frusta, and GLB scene assembly
(ref dust3r/viz.py:118-155, 192-258, 284-321)."""
import numpy as np

from spann3r_tpu.utils.export import read_glb
from spann3r_tpu.utils.viz3d import (SceneViz, auto_cam_size,
                                     camera_frustum_mesh, segment_sky)


def synth_sky_image(h=120, w=160):
    """Top half: bright blue sky; bottom half: dark textured ground."""
    img = np.zeros((h, w, 3), np.uint8)
    img[:h // 2] = (135, 180, 235)  # light blue RGB
    rng = np.random.default_rng(0)
    img[h // 2:] = rng.integers(20, 90, (h - h // 2, w, 3))
    return img


def test_segment_sky_finds_the_sky():
    img = synth_sky_image()
    mask = segment_sky(img)
    h = img.shape[0]
    assert mask[:h // 2 - 4].mean() > 0.9          # sky rows detected
    assert mask[h // 2 + 4:].mean() < 0.05          # ground rows clean
    # float input path agrees
    mask_f = segment_sky(img.astype(np.float32) / 255.0)
    assert (mask == mask_f).mean() > 0.99


def test_segment_sky_no_sky_is_empty():
    rng = np.random.default_rng(1)
    img = rng.integers(10, 80, (60, 80, 3)).astype(np.uint8)
    assert segment_sky(img).sum() == 0


def test_camera_frustum_mesh_valid():
    pose = np.eye(4)
    pose[:3, 3] = [1.0, 2.0, 3.0]
    m = camera_frustum_mesh(pose, focal=100.0, imsize=(64, 48),
                            color=(255, 0, 0), cam_size=0.5)
    v, f = m["vertices"], m["faces"]
    assert f.max() < len(v) and len(f) == 8 * 6     # 8 edges x 6 tris
    assert np.isfinite(v).all()
    # apex edges start at the optical center
    assert np.linalg.norm(v - pose[:3, 3], axis=1).min() < 0.1
    # base sits ~depth along +z (CV convention): depth = f*sw/H
    depth = 100.0 * 0.5 / 48
    assert abs(v[:, 2].max() - (3.0 + depth)) < 0.1
    assert (m["vertex_colors"][:, 0] == 1.0).all()


def test_sceneviz_glb_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    cols = rng.random((100, 3)).astype(np.float32)
    mask = np.arange(100) % 2 == 0

    viz = SceneViz()
    viz.add_pointcloud(pts, cols, mask=mask)
    viz.add_camera(np.eye(4), focal=50.0, imsize=(32, 32),
                   color=(0, 255, 0), cam_size=0.2)
    path = str(tmp_path / "scene.glb")
    viz.save_glb(path)

    out = read_glb(path)
    prims = out["primitives"]
    modes = sorted(p["mode"] for p in prims)
    assert modes == [0, 4]                          # POINTS + TRIANGLES
    pc = next(p for p in prims if p["mode"] == 0)
    tri = next(p for p in prims if p["mode"] == 4)
    assert len(pc["positions"]) == mask.sum()
    np.testing.assert_allclose(pc["positions"], pts[mask], rtol=1e-6)
    np.testing.assert_allclose(pc["colors"], cols[mask], atol=1 / 255)
    assert tri["indices"].max() < len(tri["positions"])


def test_aligner_mask_sky_and_show(tmp_path):
    """GlobalAligner.mask_sky zeroes sky conf; show() writes a GLB scene
    (ref base_opt.py:320-343)."""
    from spann3r_tpu.models.global_align import global_aligner

    h, w, n = 24, 32, 2
    rng = np.random.default_rng(3)
    pred = rng.standard_normal((2, h, w, 3)).astype(np.float32) + 3.0
    conf = np.full((2, h, w), 5.0, np.float32)
    out = {
        "view1": {"idx": [0, 1]}, "view2": {"idx": [1, 0]},
        "pred1": {"pts3d": pred.copy(), "conf": conf.copy()},
        "pred2": {"pts3d_in_other_view": pred.copy(), "conf": conf.copy()},
    }
    al = global_aligner(out)
    imgs = [synth_sky_image(h, w).astype(np.float32) / 255.0
            for _ in range(n)]
    masked = al.mask_sky(imgs)
    # sky zeroes the per-image MASK confidence (ref base_opt.py:320-326),
    # never the edge weights conf_i/conf_j that feed the energy through log
    np.testing.assert_array_equal(masked.conf_i[0], al.conf_i[0])
    m = masked.get_masks()
    assert not m[0][:h // 2 - 4].any()                  # sky masked out
    assert m[0][h // 2 + 4:].all()                      # ground kept
    assert al.get_masks()[0].all()                      # original untouched

    assert auto_cam_size(al.get_im_poses()) >= 0.0
    path = masked.show(imgs=imgs, path=str(tmp_path / "al.glb"))
    out_glb = read_glb(path)
    assert any(p["mode"] == 0 for p in out_glb["primitives"])
    assert any(p["mode"] == 4 for p in out_glb["primitives"])


def test_add_cameras_accepts_numpy_colors():
    """Regression: numpy color rows must not hit `or` truthiness (the
    reference SceneViz.add_cameras indexes a to_numpy(colors) array)."""
    import numpy as np

    poses = np.stack([np.eye(4, dtype=np.float32)] * 3)
    poses[:, 0, 3] = [0.0, 0.5, 1.0]
    viz = SceneViz()
    viz.add_cameras(poses, focals=[100.0] * 3,
                    colors=np.array([[255, 0, 0]] * 3, np.uint8),
                    cam_size=0.1)
    viz.add_cameras(poses, focals=[100.0] * 3, cam_size=0.1)  # default colors
    assert len(viz._meshes) == 6


def test_auto_cam_size_median_pairwise():
    """Matches ref dust3r/viz.py:114-115: 0.1 * median pairwise distance —
    robust to one far-outlier camera (a bbox diagonal is not)."""
    import numpy as np

    poses = np.stack([np.eye(4, dtype=np.float32)] * 4)
    poses[:, :3, 3] = [[0, 0, 0], [1, 0, 0], [0, 1, 0], [100, 0, 0]]
    from scipy.spatial.distance import pdist
    expect = 0.1 * np.median(pdist(poses[:, :3, 3]))
    assert abs(auto_cam_size(poses) - expect) < 1e-6
