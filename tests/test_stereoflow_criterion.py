"""Stereo/flow criterion + tiling parity vs reference
croco/stereoflow/{criterion,engine}.py."""
import numpy as np
import pytest

from spann3r_tpu.stereoflow import criterion as C
from spann3r_tpu.stereoflow import tiling as T

from .conftest import requires_reference


def _rand_gt(rng, b, h, w, c, invalid_frac=0.3, big_frac=0.1):
    gt = rng.standard_normal((b, h, w, c)).astype(np.float32) * 5
    inv = rng.random((b, h, w)) < invalid_frac
    gt[inv] = np.inf
    big = rng.random((b, h, w)) < big_frac
    gt[big & ~inv] *= 100.0
    return gt


def _to_torch(x):
    import torch
    return torch.from_numpy(np.ascontiguousarray(x)).permute(0, 3, 1, 2)


@requires_reference
@pytest.mark.parametrize("c", [1, 2])
@pytest.mark.parametrize("spec,ref_name", [
    ("L1Loss()", "L1Loss"),
    ("L1Loss(max_gtnorm=50)", "L1Loss"),
    ("LaplacianLoss()", "LaplacianLoss"),
    ("LaplacianLossBounded()", "LaplacianLossBounded"),
    ("LaplacianLossBounded2()", "LaplacianLossBounded2"),
    ("LaplacianLossBounded2(max_gtnorm=50, a=2.0, b=4.0)",
     "LaplacianLossBounded2"),
])
def test_criterion_parity(spec, ref_name, c):
    import ast
    from stereoflow import criterion as refC
    rng = np.random.default_rng(0)
    gt = _rand_gt(rng, 2, 8, 10, c)
    pred = rng.standard_normal(gt.shape).astype(np.float32)
    conf = rng.standard_normal(gt.shape[:3]).astype(np.float32)

    ours = C.build_criterion(spec)
    node = ast.parse(spec, mode="eval").body
    kwargs = {k.arg: ast.literal_eval(k.value) for k in node.keywords}
    ref = getattr(refC, ref_name)(**kwargs)

    if ours.with_conf:
        got = float(ours(pred, gt, conf))
        import torch
        want = float(ref(_to_torch(pred), _to_torch(gt),
                         torch.from_numpy(conf)[:, None]))
    else:
        got = float(ours(pred, gt))
        want = float(ref(_to_torch(pred), _to_torch(gt)))
    assert ours.with_conf == ref.with_conf
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@requires_reference
@pytest.mark.parametrize("c", [1, 2])
def test_batch_metrics_parity(c):
    from stereoflow import criterion as refC
    rng = np.random.default_rng(1)
    gt = _rand_gt(rng, 3, 9, 11, c)
    pred = rng.standard_normal(gt.shape).astype(np.float32)
    if c == 1:
        got = {k: float(v) for k, v in C.stereo_metrics(pred, gt).items()}
        ref = refC.StereoMetrics()(_to_torch(pred), _to_torch(gt))
    else:
        got = {k: float(v) for k, v in C.flow_metrics(pred, gt).items()}
        ref = refC.FlowMetrics()(_to_torch(pred), _to_torch(gt))
    assert set(got) == set(float_map := {k: float(v) for k, v in ref.items()})
    for k in got:
        np.testing.assert_allclose(got[k], float_map[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)


@requires_reference
@pytest.mark.parametrize("c,cls_name", [(1, "StereoDatasetMetrics"),
                                        (2, "FlowDatasetMetrics")])
def test_dataset_metrics_parity(c, cls_name):
    from stereoflow import criterion as refC
    rng = np.random.default_rng(2)
    ours = getattr(C, cls_name)()
    ref = getattr(refC, cls_name)()
    ours.reset()
    ref.reset()
    for _ in range(3):
        gt = _rand_gt(rng, 1, 12, 14, c)
        pred = rng.standard_normal(gt.shape).astype(np.float32)
        ours.add_batch(pred, gt)
        ref.add_batch(_to_torch(pred), _to_torch(gt))
    got, want = ours.get_results(), ref.get_results()
    assert set(got) == set(want)
    for k in got:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)


@requires_reference
@pytest.mark.parametrize("c,cls_name", [(1, "StereoDatasetMetrics"),
                                        (2, "FlowDatasetMetrics")])
def test_dataset_metrics_spring_supersampled(c, cls_name):
    """2x-supersampled gt path (ref criterion.py:156-162 min over phases)."""
    from stereoflow import criterion as refC
    rng = np.random.default_rng(3)
    ours = getattr(C, cls_name)()
    ref = getattr(refC, cls_name)()
    ours.reset()
    ref.reset()
    gt = _rand_gt(rng, 1, 16, 20, c)
    pred = rng.standard_normal((1, 8, 10, c)).astype(np.float32)
    ours.add_batch(pred, gt)
    ref.add_batch(_to_torch(pred), _to_torch(gt))
    got, want = ours.get_results(), ref.get_results()
    for k in got:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)


def test_tile_slices_match_reference_formula():
    # ref engine.py:268-271
    for total, window, overlap in [(100, 40, 0.5), (352, 352, 0.7),
                                   (705, 352, 0.7), (1024, 704, 0.9)]:
        sl = T.tile_slices(total, window, overlap)
        num = 1 + int(np.ceil((total - window) / ((1 - overlap) * window)))
        offs = np.linspace(0, total - window, num).round().astype(int)
        assert [s.start for s in sl] == list(offs)
        assert all(s.stop - s.start == window for s in sl)
        assert sl[-1].stop == total


@requires_reference
@pytest.mark.parametrize("with_conf", [True, False])
def test_tiled_pred_parity(with_conf):
    """Chunk-batched tiling must equal the reference's per-tile loop.
    Model: a deterministic function of the two crops."""
    import torch
    # the reference engine imports torchvision at module level but never
    # touches it inside tiled_pred; torchvision is not in this image —
    # use the shared self-healing stub so this test can't leave a partial
    # module behind for later reference imports
    from .conftest import stub_optional_ref_deps
    stub_optional_ref_deps()
    from stereoflow.engine import tiled_pred as ref_tiled

    Cc = 2
    crop = (16, 24)

    def model_np(a, b):  # (B,h,w,3) NHWC -> (B,h,w,C+conf)
        base = a[..., :Cc] * 2.0 - b[..., :Cc]
        conf = (a[..., 2:3] - b[..., 2:3]) * 0.5
        return np.concatenate([base, conf], -1) if with_conf else base

    class TorchModel(torch.nn.Module):
        def forward(self, x1, x2):
            o = model_np(x1.permute(0, 2, 3, 1).numpy(),
                         x2.permute(0, 2, 3, 1).numpy())
            return torch.from_numpy(o).permute(0, 3, 1, 2)

        class head:
            num_channels = Cc + int(with_conf)

    rng = np.random.default_rng(4)
    img1 = rng.standard_normal((2, 24, 40, 3)).astype(np.float32)
    img2 = rng.standard_normal((2, 24, 40, 3)).astype(np.float32)
    gt = _rand_gt(rng, 2, 24, 40, Cc)

    ours = C.build_criterion("LaplacianLossBounded()" if with_conf
                             else "L1Loss()")
    pred, loss, conf = T.tiled_pred(
        lambda a, b: model_np(a, b), ours, img1, img2, gt, crop=crop,
        overlap=0.5, conf_mode="conf_expsigmoid_10_5", with_conf=with_conf,
        tile_batch=3)

    if with_conf:  # the reference loop requires a conf channel
        t1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
        t2 = torch.from_numpy(img2).permute(0, 3, 1, 2)
        tg = torch.from_numpy(gt).permute(0, 3, 1, 2)
        from stereoflow import criterion as refC
        refcrit = refC.LaplacianLossBounded()
        rpred, rloss, rc = ref_tiled(TorchModel(), refcrit, t1, t2, tg,
                                     overlap=0.5, crop=crop,
                                     conf_mode="conf_expsigmoid_10_5",
                                     with_conf=True)
        np.testing.assert_allclose(
            pred, rpred.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(conf, rc.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(loss, float(rloss), rtol=1e-4, atol=1e-5)
    else:
        assert pred.shape == (2, 24, 40, Cc) and np.isfinite(pred).all()


@requires_reference
def test_tiled_pred_upscale_path_shapes():
    """Image smaller than the tile: upscale + predict + downscale
    (ref engine.py:196-204, 258-259)."""
    Cc = 1

    def model_np(a, b):
        return np.concatenate([a[..., :1] - b[..., :1], a[..., 1:2]], -1)

    rng = np.random.default_rng(5)
    img1 = rng.standard_normal((1, 10, 12, 3)).astype(np.float32)
    img2 = rng.standard_normal((1, 10, 12, 3)).astype(np.float32)
    pred, loss, conf = T.tiled_pred(
        model_np, None, img1, img2, None, crop=(16, 16), overlap=0.5,
        with_conf=True, num_channels=Cc, tile_batch=2)
    assert pred.shape == (1, 10, 12, 1)
    assert loss is None and np.isfinite(pred).all()
