"""Dataset pipeline tests on a synthetic on-disk 7-Scenes-format scene."""
import os
import os.path as osp

import numpy as np
import pytest

from spann3r_tpu.datasets import build_dataset, make_sampler
from spann3r_tpu.datasets.loader import DataLoader, collate_views
from spann3r_tpu.datasets.sampler import BatchedRandomSampler


@pytest.fixture(scope="module")
def seven_scenes_root(tmp_path_factory):
    """Synthesize a tiny 7-Scenes-format scene: color/depth/pose per frame."""
    import cv2

    root = tmp_path_factory.mktemp("7scenes")
    scene = root / "chess" / "seq-01"
    scene.mkdir(parents=True)
    (root / "chess" / "TestSplit.txt").write_text("sequence1\n")
    rng = np.random.default_rng(0)
    for i in range(8):
        img = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(scene / f"frame-{i:06d}.color.png"), img)
        depth = (rng.random((480, 640)) * 3000 + 500).astype(np.uint16)
        cv2.imwrite(str(scene / f"frame-{i:06d}.depth.proj.png"), depth)
        pose = np.eye(4)
        pose[:3, 3] = [i * 0.1, 0, 0]
        np.savetxt(str(scene / f"frame-{i:06d}.pose.txt"), pose)
    return str(root)


def test_seven_scenes_contract(seven_scenes_root):
    ds = build_dataset(
        f"SevenScenes(split='test', ROOT='{seven_scenes_root}', "
        f"resolution=224, full_video=True, kf_every=2, seed=777)")
    views = ds[0]
    assert len(views) == 4  # 8 frames, kf_every=2
    v = views[0]
    assert v["img"].shape == (224, 224, 3) and v["img"].dtype == np.float32
    assert -1.01 <= v["img"].min() and v["img"].max() <= 1.01
    assert v["pts3d"].shape == (224, 224, 3)
    assert v["valid_mask"].shape == (224, 224)
    assert v["valid_mask"].any()
    assert v["camera_pose"].shape == (4, 4)
    # depth>0 pixels project to finite pts3d with z == depth in cam frame
    k = v["camera_intrinsics"]
    assert k[0, 0] > 0 and abs(k[0, 2] - 112) < 60


def test_dataset_algebra(seven_scenes_root):
    expr = (f"4 @ SevenScenes(split='test', ROOT='{seven_scenes_root}', "
            f"resolution=224, full_video=True, kf_every=4, seed=1) + "
            f"2 * SevenScenes(split='test', ROOT='{seven_scenes_root}', "
            f"resolution=224, full_video=True, kf_every=4, seed=1)")
    ds = build_dataset(expr)
    ds.set_epoch(0)
    assert len(ds) == 4 + 2
    views = ds[5]
    assert len(views) == 2


def test_algebra_parser_rejects_arbitrary_code():
    with pytest.raises(ValueError):
        build_dataset("__import__('os').system('true')")
    with pytest.raises((ValueError, AssertionError)):
        build_dataset("print(1)")


def test_batched_sampler_sharding():
    total = 64
    batch = 4
    all_idxs = []
    for rank in range(4):
        s = BatchedRandomSampler(total, batch, pool_size=3, world_size=4,
                                 rank=rank)
        s.set_epoch(3)
        idxs = list(s)
        # same feat idx within each batch
        for i in range(0, len(idxs), batch):
            feats = {f for _, f in idxs[i:i + batch]}
            assert len(feats) == 1
        all_idxs.extend(i for i, _ in idxs)
    assert sorted(all_idxs) == list(range(total))  # exact partition


def test_loader_collation(seven_scenes_root):
    ds = build_dataset(
        f"4 @ SevenScenes(split='test', ROOT='{seven_scenes_root}', "
        f"resolution=224, full_video=True, kf_every=4, seed=5)")
    ds.set_epoch(0)
    loader = DataLoader(ds, batch_size=2, num_workers=1)
    batch = next(iter(loader))
    t, b = batch["img"].shape[:2]
    assert (t, b) == (2, 2)
    assert batch["img"].shape == (2, 2, 224, 224, 3)
    assert batch["pts3d"].shape == (2, 2, 224, 224, 3)
    assert batch["valid_mask"].dtype == bool
    assert batch["camera_pose"].shape == (2, 2, 4, 4)
