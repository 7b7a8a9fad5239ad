"""CroCo pretraining driver + pairs dataset (ref croco/pretrain.py,
croco/datasets/pairs_dataset.py file contracts)."""
import json
import os
import os.path as osp

import numpy as np
import PIL.Image
import pytest

from spann3r_tpu.datasets.pairs import (PairsDataset, PairTransforms,
                                        dnames_to_image_pairs,
                                        load_pairs_from_list_file,
                                        parse_and_cache_all_pairs)
from spann3r_tpu.pretraining import (get_args_parser, main,
                                     parse_croco_model)


@pytest.fixture(scope="module")
def habitat_root(tmp_path_factory):
    """Synthetic habitat_release tree: scene dirs of *_1.jpeg/*_2.jpeg."""
    root = tmp_path_factory.mktemp("pretrain_data")
    rng = np.random.default_rng(0)
    scene = root / "habitat_release" / "sceneA"
    scene.mkdir(parents=True)
    for i in range(6):
        for s in (1, 2):
            arr = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
            PIL.Image.fromarray(arr).save(scene / f"pair{i:03d}_{s}.jpeg")
    # a val subtree that must be EXCLUDED from the cache (ref :50)
    val = root / "habitat_release" / "val_scenes"
    val.mkdir()
    PIL.Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(
        val / "bad_1.jpeg")
    PIL.Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(
        val / "bad_2.jpeg")
    return str(root)


def _ensure_cache(root):
    cache = osp.join(root, "habitat_release", "pairs.txt")
    if not osp.isfile(cache):
        parse_and_cache_all_pairs("habitat_release", root)
    return cache


def test_parse_and_cache_pairs(habitat_root):
    cache = osp.join(habitat_root, "habitat_release", "pairs.txt")
    if osp.isfile(cache):
        os.remove(cache)  # make this test order-independent
    cache = parse_and_cache_all_pairs("habitat_release", habitat_root)
    lines = open(cache).read().strip().splitlines()
    assert len(lines) == 6  # val subtree excluded
    assert all("val" not in l for l in lines)
    pairs = dnames_to_image_pairs("habitat_release", habitat_root)
    assert len(pairs) == 6
    assert all(osp.isfile(a) and osp.isfile(b) for a, b in pairs)
    # re-caching refuses to clobber (ref :46)
    with pytest.raises(FileExistsError):
        parse_and_cache_all_pairs("habitat_release", habitat_root)


def test_list_file_contract(tmp_path):
    d = tmp_path / "MegaDepth_crops"
    d.mkdir()
    (d / "listing.txt").write_text("# comment\nfoo\nbar\n")
    pairs = load_pairs_from_list_file(str(d / "listing.txt"), root=str(d))
    assert pairs == [(str(d / "foo_1.jpg"), str(d / "foo_2.jpg")),
                     (str(d / "bar_1.jpg"), str(d / "bar_2.jpg"))]


def test_pairs_dataset_and_transforms(habitat_root):
    _ensure_cache(habitat_root)
    ds = PairsDataset("habitat_release", trfs="crop32+acolor",
                      data_dir=habitat_root, seed=0)
    assert len(ds) == 6
    im1, im2 = ds[0]
    assert im1.shape == im2.shape == (32, 32, 3)
    assert im1.dtype == np.float32
    # ImageNet normalization -> roughly centered
    assert abs(float(im1.mean())) < 3.0
    # crops and jitter are independent per image (asymmetric)
    assert not np.allclose(im1, im2)


def test_pair_transforms_unknown_aug():
    with pytest.raises(NotImplementedError):
        PairTransforms("crop32+warp")


def test_parse_croco_model():
    cfg, ratio = parse_croco_model("CroCoNet()")
    assert cfg.enc.dim == 768 and cfg.enc.depth == 12
    assert cfg.dec.dim == 512 and cfg.dec.depth == 8
    assert cfg.dec.num_heads == 16 and ratio == 0.9
    cfg, ratio = parse_croco_model(
        "CroCoNet(enc_embed_dim=64, enc_depth=2, enc_num_heads=4, "
        "dec_embed_dim=48, dec_depth=2, dec_num_heads=4, img_size=32, "
        "mask_ratio=0.75, pos_embed='RoPE100')")
    assert cfg.enc.dim == 64 and cfg.img_size == (32, 32)
    assert ratio == 0.75 and cfg.enc.rope_base == 100.0
    with pytest.raises(ValueError):
        parse_croco_model("__import__('os').system('true')")
    with pytest.raises(ValueError):
        parse_croco_model("CroCoNet(bogus_kwarg=1)")


def test_pair_loader_equal_batches_across_ranks():
    """Every rank must yield exactly len(loader) batches even when world
    doesn't divide the dataset size — a rank with one extra batch enters a
    collective train step its peers never join (multihost deadlock).  The
    union of sampled items must stay duplicate-free."""
    from spann3r_tpu.pretraining import PairLoader

    class _Items:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            a = np.full((2, 2, 3), i, np.float32)
            return a, a + 100

    for n, bs, world in ((11, 2, 2), (5, 2, 8), (16, 3, 4)):
        ds = _Items(n)
        loaders = [PairLoader(ds, bs, seed=0, world=world, rank=r)
                   for r in range(world)]
        expect = n // (bs * world)
        seen = []
        for ld in loaders:
            batches = list(ld)
            assert len(batches) == expect == len(ld)
            for a, _b in batches:
                seen.extend(int(v) for v in a[:, 0, 0, 0])
        assert len(seen) == len(set(seen)) == expect * bs * world


def test_pretrain_driver_end_to_end(habitat_root, tmp_path):
    """Two epochs of the full driver on the synthetic pairs: finite loss,
    checkpoint-last written, JSONL log, auto-resume path."""
    _ensure_cache(habitat_root)
    args = get_args_parser().parse_args([])
    args.model = ("CroCoNet(enc_embed_dim=64, enc_depth=2, enc_num_heads=4, "
                  "dec_embed_dim=48, dec_depth=2, dec_num_heads=4, "
                  "img_size=32, mask_ratio=0.75)")
    args.dataset = "habitat_release"
    args.transforms = "crop32+acolor"
    args.data_dir = habitat_root
    args.batch_size = 2
    args.epochs = 4
    args.max_epoch = 2
    args.warmup_epochs = 1
    args.amp = 0
    args.num_workers = 0
    args.print_freq = 1
    args.keep_freq = 0
    args.output_dir = str(tmp_path / "pre")
    out = main(args)
    assert np.isfinite(out["train_loss"])
    assert out["epoch"] == 1

    log = [json.loads(l) for l in open(osp.join(args.output_dir, "log.txt"))]
    assert [l["epoch"] for l in log] == [0, 1]
    ckpts = os.listdir(osp.join(args.output_dir, "checkpoints"))
    assert any("checkpoint-last" in c for c in ckpts)

    # auto-resume: restarts at epoch 2 == max_epoch -> no new epochs run
    out2 = main(args)
    assert out2["epoch"] == 1  # unchanged trailing stats

    # accumulation variant runs too
    args.accum_iter = 2
    args.max_epoch = 3
    out3 = main(args)
    assert np.isfinite(out3["train_loss"])


def test_pretrain_step_nonfinite_gate():
    """A non-finite batch must be an on-device no-op: params and optimizer
    state unchanged (gated_update in make_pretrain_step).  The host's
    finiteness abort runs one step late (lagged check in main()), so
    without this gate a nan step could reach the weights first (the
    reference instead syncs + exits every iter, ref croco/pretrain.py:220-222)."""
    import jax
    import jax.numpy as jnp

    from spann3r_tpu.models import croco_pretrain as cp
    from spann3r_tpu.pretraining import (make_pretrain_optimizer,
                                         make_pretrain_step)
    from spann3r_tpu.config import FP32

    cfg, ratio = parse_croco_model(
        "CroCoNet(enc_embed_dim=64, enc_depth=2, enc_num_heads=4, "
        "dec_embed_dim=48, dec_depth=2, dec_num_heads=4, img_size=32)")
    params = cp.init_croco(jax.random.PRNGKey(0), cfg)
    opt = make_pretrain_optimizer(0.05)
    opt_state = opt.init(params)
    step, grad_step, apply_step = make_pretrain_step(cfg, ratio, FP32, opt)

    rng = np.random.default_rng(0)
    good = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32) * .3
    bad = good.at[0, 0, 0, 0].set(jnp.nan)

    params, opt_state, loss = step(params, opt_state, good, good,
                                   jax.random.PRNGKey(1), jnp.float32(1e-4))
    assert np.isfinite(float(loss))
    import numpy as _np
    snap = jax.tree.map(_np.asarray, (params, opt_state))

    params, opt_state, loss = step(params, opt_state, bad, good,
                                   jax.random.PRNGKey(2), jnp.float32(1e-4))
    assert not np.isfinite(float(loss))  # host still observes the bad loss
    for a, b in zip(jax.tree.leaves(snap),
                    jax.tree.leaves(jax.tree.map(_np.asarray,
                                                 (params, opt_state)))):
        np.testing.assert_array_equal(a, b)

    # accumulation path: nan micro-batch adds nothing
    zeros = jax.tree.map(jnp.zeros_like, params)
    acc, l1 = grad_step(params, zeros, good, good, jax.random.PRNGKey(3),
                        jnp.float32(0.5))
    snap_acc = jax.tree.map(_np.asarray, acc)
    acc, l2 = grad_step(params, acc, bad, good, jax.random.PRNGKey(4),
                        jnp.float32(0.5))
    assert not np.isfinite(float(l2))
    for a, b in zip(jax.tree.leaves(snap_acc),
                    jax.tree.leaves(jax.tree.map(_np.asarray, acc))):
        np.testing.assert_array_equal(a, b)
