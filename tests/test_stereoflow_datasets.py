"""Stereoflow IO formats, dataset machinery, augmentor, and the
train/test drivers end-to-end on synthetic trees."""
import os
import os.path as osp
import pickle

import numpy as np
import pytest
from PIL import Image

from spann3r_tpu.stereoflow import datasets as sfd
from spann3r_tpu.stereoflow import io as sfio

from .conftest import requires_reference


# ------------------------------ IO formats ------------------------------

def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for shape in [(6, 8), (6, 8, 3)]:
        arr = rng.standard_normal(shape).astype(np.float32)
        f = str(tmp_path / "x.pfm")
        sfio.write_pfm(f, arr)
        back, scale = sfio.read_pfm(f)
        np.testing.assert_array_equal(back, arr)


@requires_reference
def test_pfm_matches_reference_reader(tmp_path):
    from .conftest import stub_optional_ref_deps
    stub_optional_ref_deps()
    from stereoflow.datasets_stereo import _read_pfm
    rng = np.random.default_rng(1)
    arr = rng.random((5, 7)).astype(np.float32) + 0.5
    f = str(tmp_path / "x.pfm")
    sfio.write_pfm(f, arr)
    ref, _ = _read_pfm(f)
    np.testing.assert_array_equal(ref, arr)


def test_flo_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    flow = rng.standard_normal((5, 9, 2)).astype(np.float32)
    f = str(tmp_path / "x.flo")
    sfio.write_flo(f, flow)
    np.testing.assert_array_equal(sfio.read_flo(f), flow)
    with pytest.raises(ValueError):
        sfio.read_flo(str(tmp_path / "missing.txt"))


def test_kitti_flow_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    flow = (rng.standard_normal((6, 8, 2)) * 10).astype(np.float32)
    flow = np.round(flow * 64) / 64  # representable in the uint16 encoding
    f = str(tmp_path / "x.png")
    sfio.write_kitti_flow(f, flow)
    back = sfio.read_kitti_flow(f)
    np.testing.assert_allclose(back, flow, atol=1 / 64)


def test_png_disp_invalid_to_inf(tmp_path):
    disp = np.array([[0, 256], [512, 1024]], np.uint16)
    f = str(tmp_path / "d.png")
    Image.fromarray(disp).save(f)
    out = sfio.read_kitti_disp(f)
    assert np.isinf(out[0, 0])
    np.testing.assert_allclose(out[0, 1], 1.0)


def test_flow_to_color_and_vis_disparity():
    rng = np.random.default_rng(4)
    flow = rng.standard_normal((8, 8, 2)).astype(np.float32)
    img = sfio.flow_to_color(flow)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    d = sfio.vis_disparity(rng.random((8, 8)).astype(np.float32))
    assert d.shape == (8, 8, 3)


@requires_reference
def test_flow_to_color_parity():
    from .conftest import stub_optional_ref_deps
    stub_optional_ref_deps()
    from stereoflow.datasets_flow import flowToColor
    rng = np.random.default_rng(5)
    flow = (rng.standard_normal((10, 12, 2)) * 3).astype(np.float32)
    ours = sfio.flow_to_color(flow.copy(), maxflow=4.0)
    ref = flowToColor(flow.copy(), maxflow=4.0)
    np.testing.assert_array_equal(ours, ref)


# --------------------------- synthetic trees ---------------------------

def _write_img(path, rng, hw=(40, 80)):
    os.makedirs(osp.dirname(path), exist_ok=True)
    arr = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture()
def sceneflow_tree(tmp_path_factory):
    """Mini SceneFlow-layout tree + a hand-written split cache (the real
    _build_cache asserts the official pair counts, so tests inject the
    cache the way a preparation run would)."""
    root = tmp_path_factory.mktemp("sceneflow")
    rng = np.random.default_rng(0)
    pairs = []
    for i in range(4):
        rel = f"Driving/frames_finalpass/sc/fwd/15mm/left/{i:04d}.png"
        _write_img(str(root / rel), rng)
        _write_img(str(root / rel.replace("/left/", "/right/")), rng)
        dpath = root / (rel.replace("/frames_finalpass/", "/disparity/")
                        [:-4] + ".pfm")
        os.makedirs(osp.dirname(str(dpath)), exist_ok=True)
        disp = (rng.random((40, 80)).astype(np.float32) * 10 + 0.5)
        sfio.write_pfm(str(dpath), disp)
        pairs.append(rel)
    cache = tmp_path_factory.mktemp("cache_stereo")
    with open(cache / "SceneFlow.pkl", "wb") as f:
        pickle.dump({"train_finalpass": pairs,
                     "test_finalpass": pairs[2:]}, f)
    return str(root), str(cache), pairs


@pytest.fixture()
def chairs_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("chairs")
    rng = np.random.default_rng(1)
    pairs = []
    for i in range(1, 5):
        p = f"{i:05d}"
        _write_img(str(root / "data" / (p + "_img1.ppm")), rng)
        _write_img(str(root / "data" / (p + "_img2.ppm")), rng)
        flow = rng.standard_normal((40, 80, 2)).astype(np.float32)
        sfio.write_flo(str(root / "data" / (p + "_flow.flo")), flow)
        pairs.append(p)
    cache = tmp_path_factory.mktemp("cache_flow")
    with open(cache / "FlyingChairs.pkl", "wb") as f:
        pickle.dump({"train": pairs, "val": pairs[2:]}, f)
    return str(root), str(cache), pairs


@pytest.fixture(autouse=True)
def _reset_roots():
    yield
    sfd.ROOT_OVERRIDES.clear()
    sfd.CACHE_DIR = None


# ------------------------------ datasets ------------------------------

def test_sceneflow_dataset(sceneflow_tree):
    root, cache, pairs = sceneflow_tree
    sfd.ROOT_OVERRIDES["SceneFlow"] = root
    sfd.CACHE_DIR = cache
    ds = sfd.SceneFlowDataset(split="train_finalpass")
    assert len(ds) == 4
    img1, img2, gt, name = ds[0]
    assert img1.shape == (40, 80, 3) and img1.dtype == np.float32
    assert gt.shape == (40, 80, 1) and np.isfinite(gt).all()
    # in1k normalization (ref datasets_stereo.py:41-47)
    raw = np.asarray(Image.open(osp.join(root, pairs[0])),
                     np.float32) / 255.0
    np.testing.assert_allclose(
        img1, (raw - sfd.IN1K_MEAN) / sfd.IN1K_STD, rtol=1e-5, atol=1e-6)

    # dataset algebra: N * ds and ds + ds (ref __rmul__ / ConcatDataset)
    assert len(2 * sfd.SceneFlowDataset(split="train_finalpass")) == 8
    cat = (sfd.SceneFlowDataset(split="train_finalpass")
           + sfd.SceneFlowDataset(split="test_finalpass"))
    assert len(cat) == 6
    assert "SceneFlowDataset" in repr(cat)


def test_sceneflow_augmentor_crop(sceneflow_tree):
    root, cache, _ = sceneflow_tree
    sfd.ROOT_OVERRIDES["SceneFlow"] = root
    sfd.CACHE_DIR = cache
    ds = sfd.SceneFlowDataset(split="train_finalpass", augmentor=True,
                              crop_size=(32, 48), seed=0)
    for i in range(len(ds)):
        img1, img2, gt, _ = ds[i]
        assert img1.shape == (32, 48, 3) and img2.shape == (32, 48, 3)
        assert gt.shape == (32, 48, 1)
        valid = gt[np.isfinite(gt)]
        assert (valid > 0).all()  # disparity stays positive under scale


def test_flyingchairs_dataset(chairs_tree):
    root, cache, _ = chairs_tree
    sfd.ROOT_OVERRIDES["FlyingChairs"] = root
    sfd.CACHE_DIR = cache
    ds = sfd.FlyingChairsDataset(split="train")
    assert len(ds) == 4
    img1, img2, gt, name = ds[0]
    assert gt.shape == (40, 80, 2)

    aug = sfd.FlyingChairsDataset(split="train", augmentor=True,
                                  crop_size=(32, 48), seed=0)
    img1, img2, gt, _ = aug[0]
    assert img1.shape == (32, 48, 3) and gt.shape == (32, 48, 2)


def test_dataset_string_parsers(sceneflow_tree, chairs_tree):
    sroot, scache, _ = sceneflow_tree
    froot, fcache, _ = chairs_tree
    sfd.ROOT_OVERRIDES["SceneFlow"] = sroot
    sfd.CACHE_DIR = scache
    ds = sfd.get_train_dataset_stereo(
        "2 * SceneFlow(split='train_finalpass') + "
        "SceneFlow(split='test_finalpass')", crop_size=(32, 48))
    assert len(ds) == 8 + 2
    sub = ds.datasets[0]
    assert sub.augmentor is not None and sub.crop_size == (32, 48)
    vals = sfd.get_test_datasets_stereo("SceneFlow(split='test_finalpass')")
    assert len(vals) == 1 and vals[0].augmentor is None

    sfd.ROOT_OVERRIDES["FlyingChairs"] = froot
    sfd.CACHE_DIR = fcache
    fds = sfd.get_train_dataset_flow("FlyingChairs(split='train')",
                                     crop_size=(32, 48))
    assert fds.augmentor is not None

    with pytest.raises(ValueError):
        sfd.get_test_datasets_stereo("__import__('os')(split='x')")


def test_flow_augmentor_flip_signs():
    """h-flip negates u, v-flip negates v (ref augmentor.py:256-263)."""
    from spann3r_tpu.stereoflow.augmentor import FlowAugmentor
    rng_img = np.random.default_rng(0)
    img = rng_img.integers(0, 255, (40, 80, 3), dtype=np.uint8)
    flow = np.stack([np.full((40, 80), 3.0), np.full((40, 80), -2.0)],
                    -1).astype(np.float32)
    aug = FlowAugmentor((32, 48), spatial_aug_prob=0.0, h_flip_prob=1.0,
                        v_flip_prob=1.0, asymmetric_color_aug_prob=0.0,
                        rng=np.random.default_rng(0))
    _, _, out = aug.spatial_transform(img, img, flow, "X")
    np.testing.assert_allclose(out[..., 0], -3.0)
    np.testing.assert_allclose(out[..., 1], 2.0)


def test_flow_augmentor_sparse_resize_keeps_invalid():
    from spann3r_tpu.stereoflow.augmentor import FlowAugmentor
    aug = FlowAugmentor((8, 8), rng=np.random.default_rng(0))
    flow = np.full((10, 10, 2), np.inf, np.float32)
    flow[5, 5] = (1.0, 2.0)
    out = aug._resize_flow(flow, 2.0, 2.0)
    assert out.shape == (20, 20, 2)
    assert np.isinf(out).sum() > 0
    finite = np.argwhere(np.isfinite(out[..., 0]))
    assert len(finite) == 1
    np.testing.assert_allclose(out[tuple(finite[0])], (2.0, 4.0))


# ------------------------------- drivers -------------------------------

def test_stereoflow_train_and_test_drivers(sceneflow_tree, tmp_path):
    from spann3r_tpu.stereoflow.driver import (get_args_parser,
                                               get_test_args_parser, main,
                                               test_main)
    root, cache, _ = sceneflow_tree
    sfd.ROOT_OVERRIDES["SceneFlow"] = root
    sfd.CACHE_DIR = cache
    out = str(tmp_path / "run")
    args = get_args_parser().parse_args([
        "stereo", "--output_dir", out,
        "--model", "CroCoNet(enc_embed_dim=64, enc_depth=2, enc_num_heads=4,"
        " dec_embed_dim=48, dec_depth=2, dec_num_heads=4)",
        "--dataset", "SceneFlow(split='train_finalpass')",
        "--val_dataset", "SceneFlow(split='test_finalpass')",
        "--crop", "32", "48", "--batch_size", "2", "--epochs", "1",
        "--fp32", "--tile_batch", "2"])
    res = main(args)
    assert np.isfinite(res["last_train"]["loss"])
    assert os.path.isfile(os.path.join(out, "log.txt"))
    assert os.path.isdir(os.path.join(out, "checkpoints",
                                      "checkpoint-last"))
    assert np.isfinite(res["best"])  # val ran and produced the bestmetric

    targs = get_test_args_parser().parse_args([
        "--model", out, "--dataset", "SceneFlow(split='test_finalpass')",
        "--tile_batch", "2", "--fp32",
        "--save", "metrics", "pred", "visu"])
    results = test_main(targs)
    (dname, metrics), = results.items()
    assert "bad@1.0" in metrics and np.isfinite(metrics["L1err"])
    outdirs = [d for d in os.listdir(out) if d.startswith("SceneFlowDataset")]
    assert outdirs, os.listdir(out)
    found = []
    for r, _, files in os.walk(os.path.join(out, outdirs[0])):
        found += files
    assert any(f.endswith("_pred.npy") for f in found)
    assert any(f.endswith("_pred.png") for f in found)
    assert "metrics.pkl" in found
