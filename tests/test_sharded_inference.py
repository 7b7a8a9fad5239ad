"""Multi-stream serving under data-parallel sharding: the chunked video
scan over B independent streams sharded across the device mesh must produce
exactly the per-stream results of unsharded single-stream runs
(ref spann3r/model.py:473-539 — each stream carries its own memory; batching
and sharding are TPU-serving extras that must not couple streams)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from spann3r_tpu.config import FP32, DUSt3RConfig, Spann3RConfig, ViTConfig
from spann3r_tpu.models import spann3r as sp
from spann3r_tpu.models.spann3r import init_video_carry, scan_video_chunk
from spann3r_tpu.parallel import mesh as pmesh

HW = (32, 32)
T, B = 6, 4


def tiny_cfg():
    return Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=HW, patch_size=16,
                            enc=ViTConfig(dim=64, depth=2, num_heads=4),
                            dec=ViTConfig(dim=48, depth=12, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=64, value_enc_heads=4,
        attn_head_in=64 + 48, attn_head_out=64)


def _carry_shardings(carry, mesh):
    """Shard every per-stream (leading batch) array over 'data'; scalars
    (have_prev/have_key flags) replicated."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, P("data") if np.ndim(x) >= 1 else P()),
        carry)


def test_sharded_multistream_scan_matches_single_stream(rng):
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    frames = rng.standard_normal((T, B, *HW, 3)).astype(np.float32) * 0.3
    valid = jnp.ones(T, bool)

    # single-stream references (unsharded, one stream at a time)
    refs = []
    for b in range(B):
        carry = init_video_carry(cfg, HW, 1, FP32)
        _, ys = jax.jit(lambda p, c, im, v: scan_video_chunk(
            p, cfg, c, im, v, HW, FP32))(params, carry,
                                         jnp.asarray(frames[:, b:b + 1]),
                                         valid)
        refs.append(jax.tree.map(np.asarray, ys))

    # batched scan with streams sharded over the 'data' mesh axis
    mesh = pmesh.make_mesh_for_batch(B)
    assert mesh.shape["data"] == B  # one stream per device
    carry = init_video_carry(cfg, HW, B, FP32)
    carry = jax.device_put(carry, _carry_shardings(carry, mesh))
    imgs = jax.device_put(jnp.asarray(frames),
                          NamedSharding(mesh, P(None, "data")))
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    out_carry, ys = jax.jit(lambda p, c, im, v: scan_video_chunk(
        p, cfg, c, im, v, HW, FP32))(params_r, carry, imgs, valid)
    ys = jax.tree.map(np.asarray, ys)

    for b in range(B):
        np.testing.assert_allclose(ys["pts3d"][:, b:b + 1],
                                   refs[b]["pts3d"], atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(ys["conf"][:, b:b + 1],
                                   refs[b]["conf"], atol=2e-4, rtol=1e-4)
        np.testing.assert_array_equal(ys["emitted"], refs[b]["emitted"])

    # deferred res2 head on the sharded carry matches per-stream heads
    res2 = jax.jit(lambda p, hs: sp.head2_from_hooks(p, cfg, hs, HW, FP32))(
        params_r, out_carry[3])
    for b in range(B):
        carry1 = init_video_carry(cfg, HW, 1, FP32)
        c1, _ = jax.jit(lambda p, c, im, v: scan_video_chunk(
            p, cfg, c, im, v, HW, FP32))(params, carry1,
                                         jnp.asarray(frames[:, b:b + 1]),
                                         valid)
        r1 = jax.jit(lambda p, hs: sp.head2_from_hooks(p, cfg, hs, HW, FP32))(
            params, c1[3])
        np.testing.assert_allclose(np.asarray(res2["pts3d"])[b:b + 1],
                                   np.asarray(r1["pts3d"]), atol=2e-4,
                                   rtol=1e-4)


def test_engine_multistream_batch_equals_loop(rng):
    """InferenceEngine.run_video with B streams == B separate runs."""
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(1), cfg)
    frames = rng.standard_normal((T, B, *HW, 3)).astype(np.float32) * 0.3

    eng = sp.InferenceEngine(params, cfg, HW, FP32, batch=B)
    preds_b = eng.run_video(frames, chunk=3)

    for b in range(B):
        eng1 = sp.InferenceEngine(params, cfg, HW, FP32, batch=1)
        preds_1 = eng1.run_video(frames[:, b:b + 1], chunk=3)
        assert len(preds_b) == len(preds_1)
        for pb, p1 in zip(preds_b, preds_1):
            key = "pts3d" if "pts3d" in pb else "pts3d_in_other_view"
            np.testing.assert_allclose(pb[key][b:b + 1], p1[key],
                                       atol=2e-4, rtol=1e-4)
