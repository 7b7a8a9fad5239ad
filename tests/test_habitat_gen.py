"""Multiview habitat_gen pipeline: quaternions, camera geometry (verified
against the exact ray-cast room), covisibility, generator sampling,
generation/regeneration/packing scripts, and the habitat consumer dataset
reading the generated output."""
import json
import os
import os.path as osp

import numpy as np
import pytest

from spann3r_tpu.habitat_gen import (BoxRoomBackend, MultiviewSceneGenerator,
                                     quat)
from spann3r_tpu.habitat_gen import geometry as G
from spann3r_tpu.habitat_gen import scripts as S


def test_quaternion_helpers():
    rng = np.random.default_rng(0)
    for _ in range(10):
        v = rng.standard_normal(3)
        q = quat.from_rotation_vector(v)
        R = quat.as_rotation_matrix(q)
        # orthonormal, det +1
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) > 0
        # roundtrip through from_rotation_matrix (sign-insensitive)
        q2 = quat.from_rotation_matrix(R)
        assert min(np.abs(q2 - q).max(), np.abs(q2 + q).max()) < 1e-9
        # composition == matrix product
        w = rng.standard_normal(3)
        q3 = quat.multiply(q, quat.from_rotation_vector(w))
        np.testing.assert_allclose(
            quat.as_rotation_matrix(q3),
            R @ quat.as_rotation_matrix(quat.from_rotation_vector(w)),
            atol=1e-12)


def test_pointcloud_roundtrip_against_box_renderer():
    """Unprojecting the box room's exact depths must land every point on a
    wall plane of the room (validates intrinsics + conventions together)."""
    backend = BoxRoomBackend(resolution=(32, 40), hfov=70.0,
                             size=(6.0, 3.0, 8.0), seed=0)
    pos = np.array([2.0, 1.5, -3.0])
    ori = quat.multiply(
        quat.from_rotation_vector(0.7 * G.UP),
        quat.from_rotation_vector(0.2 * G.RIGHT))
    obs = backend.render(pos, ori)
    assert obs["depth"].min() > 0
    cloud = G.compute_pointcloud(obs["depth"], 70.0, pos, ori)
    assert cloud.shape == (32 * 40, 3)
    lo = np.array([0.0, 0.0, -8.0])
    hi = np.array([6.0, 3.0, 0.0])
    # inside the box...
    assert (cloud >= lo - 1e-4).all() and (cloud <= hi + 1e-4).all()
    # ...and each point ON one of the six wall planes
    dist_to_wall = np.minimum(np.abs(cloud - lo), np.abs(cloud - hi)).min(1)
    assert dist_to_wall.max() < 1e-4


def test_look_at_points_camera_at_center():
    eye = np.array([1.0, 1.0, -1.0])
    center = np.array([4.0, 1.5, -5.0])
    q, t = G.look_at_for_habitat(eye, center, G.UP)
    R_cam2world, t_cam2world = G.compute_camera_pose_opencv_convention(t, q)
    z_axis = R_cam2world[:, 2]  # OpenCV camera looks along +z
    want = (center - eye) / np.linalg.norm(center - eye)
    np.testing.assert_allclose(z_axis, want, atol=1e-10)
    np.testing.assert_allclose(t_cam2world, eye, atol=1e-12)


def test_overlaps_counts():
    rng = np.random.default_rng(1)
    a = rng.random((200, 3))
    b = np.concatenate([a[:120] + 1e-4, rng.random((80, 3)) + 10.0])
    # threshold well below the typical nearest-neighbor spacing of 200
    # uniform points in the unit cube, so only the planted matches count
    out = G.compute_pointcloud_overlaps(a, b, 1e-3, compute_symmetric=True)
    assert out["intersection1"] == 120 and out["intersection2"] == 120
    assert out["size1"] == 200 and out["size2"] == 200


def _tiny_generator(**kw):
    defaults = dict(scene="__boxroom__", resolution=(24, 32), views_count=3,
                    hfov=70, size=5, minimum_covisibility=0.2, seed=0)
    defaults.update(kw)
    gen = MultiviewSceneGenerator(**defaults)
    # the box room is fully valid everywhere; loosen nothing else
    return gen


def test_generator_samples_covisible_tuples():
    gen = _tiny_generator()
    data = gen[0]
    n = gen.views_count
    assert len(data["observations"]) == n
    assert data["positions"].shape == (n, 3)
    assert data["orientations"].shape == (n, 4)
    assert data["pairwise_visibility_ratios"].shape == (n, n)
    # secondary views meet the covisibility threshold vs the reference view
    assert (data["covisibility_ratios"][1:] >= gen.minimum_covisibility).all()
    # every observation carries camera parameters
    for obs in data["observations"]:
        assert obs["camera_intrinsics"].shape == (3, 3)
        assert obs["R_cam2world"].shape == (3, 3)
    # valid fractions are 1.0 in a closed room
    np.testing.assert_allclose(data["valid_fractions"], 1.0)
    # pairwise visibility in [0, 1], symmetric structure filled
    pv = data["pairwise_visibility_ratios"]
    assert ((pv >= 0) & (pv <= 1.0 + 1e-9)).all()


def test_generator_seeded_determinism():
    d1 = _tiny_generator(seed=7)[0]
    d2 = _tiny_generator(seed=7)[0]
    np.testing.assert_array_equal(d1["positions"], d2["positions"])
    np.testing.assert_array_equal(d1["orientations"], d2["orientations"])


def test_spiral_trajectory():
    gen = _tiny_generator()
    images, is_valid = gen.generate_random_spiral_trajectory(images_count=6)
    assert len(images) == 6 and len(is_valid) == 6
    assert images[0].shape == (24, 32, 3)


@pytest.fixture()
def generated_scene(tmp_path):
    out = str(tmp_path / "boxroom_out")
    S.generate_multiview_images_for_scene(
        scene_dataset_config_file="", scene="__boxroom__", navmesh="",
        output_dir=out, views_count=3, size=3, generate_depth=True,
        resolution=(24, 32), hfov=70, minimum_covisibility=0.2, seed=0)
    return out


def test_generate_script_output_layout(generated_scene):
    out = generated_scene
    meta = json.load(open(osp.join(out, "metadata.json")))
    assert len(meta["multiviews"]) == 3
    for idx_label in meta["multiviews"]:
        for i in (1, 2, 3):
            stem = osp.join(out, f"{idx_label}_{i}")
            assert osp.isfile(stem + ".jpeg")
            assert (osp.isfile(stem + "_depth.exr")
                    or osp.isfile(stem + "_depth.npy"))
            cam = json.load(open(stem + "_camera_params.json"))
            assert set(cam) == {"camera_intrinsics", "R_cam2world",
                                "t_cam2world"}


def test_generate_script_resume(generated_scene):
    """Resume semantics (ref generate_multiview_images.py:48-66): identical
    params resume from the metadata file (no-op when complete); truncated
    metadata regenerates only the missing indices; changed params assert."""
    out = generated_scene
    kw = dict(scene_dataset_config_file="", scene="__boxroom__", navmesh="",
              output_dir=out, views_count=3, generate_depth=True,
              resolution=(24, 32), hfov=70, minimum_covisibility=0.2, seed=0,
              exist_ok=True)
    # complete run + same params -> "Generation already done", unchanged
    S.generate_multiview_images_for_scene(size=3, **kw)
    meta_file = osp.join(out, "metadata.json")
    meta = json.load(open(meta_file))
    assert len(meta["multiviews"]) == 3

    # truncate the metadata to 1 multiview: resume regenerates 1..2
    meta["multiviews"] = {"00000000": meta["multiviews"]["00000000"]}
    json.dump(meta, open(meta_file, "w"))
    S.generate_multiview_images_for_scene(size=3, **kw)
    meta = json.load(open(meta_file))
    assert sorted(meta["multiviews"]) == ["00000000", "00000001", "00000002"]

    # changed size is a template mismatch: asserts, like the reference
    with pytest.raises(AssertionError):
        S.generate_multiview_images_for_scene(size=5, **kw)


def test_pack_and_regenerate(generated_scene, tmp_path):
    """pack_metadata_files genericizes paths; regeneration from the packed
    metadata reproduces the images bit-for-bit (same poses, deterministic
    renderer)."""
    packed = str(tmp_path / "packed")
    counts = S.pack_metadata_files(
        generated_scene, packed,
        scenes_dataset_paths={"boxkey": "__boxroom__"})
    assert counts == {"boxkey": 3}
    packed_meta_file = osp.join(packed, "metadata.json")
    packed_meta = json.load(open(packed_meta_file))
    assert packed_meta["scene"].startswith("boxkey")

    regen = str(tmp_path / "regen")
    S.generate_multiview_images_from_metadata(
        packed_meta_file, regen,
        scene_datasets_paths={"boxkey": "__boxroom__"},
        overload_params={"seed": 0})
    import PIL.Image
    for idx_label in packed_meta["multiviews"]:
        a = np.asarray(PIL.Image.open(
            osp.join(generated_scene, f"{idx_label}_1.jpeg")))
        b = np.asarray(PIL.Image.open(
            osp.join(regen, f"{idx_label}_1.jpeg")))
        np.testing.assert_array_equal(a, b)


def test_commandlines_from_metadata_files(generated_scene, tmp_path):
    """Batch-regeneration driver (ref generate_from_metadata_files.py):
    one commandline per metadata.json, skipping already-done outputs."""
    tree = str(tmp_path / "tree")
    os.makedirs(osp.join(tree, "sceneA"))
    os.symlink(osp.join(generated_scene, "metadata.json"),
               osp.join(tree, "sceneA", "metadata.json"))
    out = str(tmp_path / "regen_all")
    lines = S.commandlines_from_metadata_files(tree, out, prefix="env X=1 ")
    assert len(lines) == 1
    assert lines[0].startswith("env X=1 python -m "
                               "spann3r_tpu.habitat_gen.scripts")
    assert "--from_metadata" in lines[0] and osp.join(out, "sceneA") in lines[0]
    # done outputs are skipped
    os.makedirs(osp.join(out, "sceneA"))
    open(osp.join(out, "sceneA", "metadata.json"), "w").write("{}")
    assert S.commandlines_from_metadata_files(tree, out) == []


def test_generated_output_feeds_habitat_consumer(generated_scene, tmp_path):
    """The generator's output directory is a valid scene for the training
    consumer datasets/habitat.py (5-frame layout -> use 3 here)."""
    from spann3r_tpu.datasets.habitat import habitat
    root = str(tmp_path / "habroot" / "boxds")
    os.makedirs(root)
    os.symlink(generated_scene, osp.join(root, "scene0"))
    ds = habitat(num_seq=3, num_frames=3, split="train",
                 ROOT=str(tmp_path / "habroot"), resolution=(32, 16))
    views = ds[0]
    assert len(views) == 3
    for v in views:
        assert v["img"].shape[-3:-1] == (16, 32)
        assert np.isfinite(v["camera_pose"]).all()
