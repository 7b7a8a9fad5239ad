"""Trainer smoke tests: jitted sharded train step on the 8-device CPU mesh,
schedule parity, checkpoint round-trip."""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu import training as tr
from spann3r_tpu.config import (DUSt3RConfig, FP32, Spann3RConfig, ViTConfig)
from spann3r_tpu.models import spann3r as sp
from spann3r_tpu.parallel import mesh as pmesh

HW = (32, 32)
T, B = 3, 8


def tiny_cfg():
    return Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=HW, patch_size=16,
                            enc=ViTConfig(dim=64, depth=2, num_heads=4),
                            dec=ViTConfig(dim=48, depth=12, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=64, value_enc_heads=4,
        attn_head_in=64 + 48, attn_head_out=64)


def synth_batch(rng):
    return {
        "img": rng.standard_normal((T, B, *HW, 3)).astype(np.float32) * 0.3,
        "pts3d": rng.standard_normal((T, B, *HW, 3)).astype(np.float32) + 2.0,
        "valid_mask": np.ones((T, B, *HW), dtype=bool),
        "camera_pose": np.broadcast_to(np.eye(4, dtype=np.float32),
                                       (T, B, 4, 4)).copy(),
    }


def test_sharded_train_step_runs_and_updates(rng):
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    opt = tr.make_optimizer(0.05)
    opt_state = opt.init(params)
    step = tr.make_train_step(cfg, FP32, opt, remat=True)

    mesh = pmesh.make_mesh(model=1)
    assert mesh.shape["data"] == 8
    batch = pmesh.shard_batch(mesh, synth_batch(rng))

    p0 = np.asarray(params["attn_head_1"]["fc1"]["w"])  # copy: params donated
    losses = []
    for i in range(3):
        params, opt_state, metrics = step(params, opt_state, batch,
                                          jax.random.PRNGKey(i),
                                          jnp.float32(1e-4), jnp.float32(0.4))
        losses.append(float(metrics["loss"]))
    assert all(math.isfinite(l) for l in losses)
    assert float(jnp.abs(params["attn_head_1"]["fc1"]["w"] - p0).max()) > 0
    # optimizing on the same batch should reduce the loss
    assert losses[-1] < losses[0]


def test_fused_optimizer_matches_optax(rng):
    """make_optimizer's fused single-pass update must match the equivalent
    optax.chain(clip_by_global_norm, scale_by_adam, add_decayed_weights)
    step-for-step (same math the reference gets from torch.AdamW + clip,
    croco/utils/misc.py + spann3r/train launcher)."""
    import optax
    wd = 0.05
    params = {"w": jnp.asarray(rng.standard_normal((8, 16)), jnp.float32),
              "b": jnp.asarray(rng.standard_normal((16,)), jnp.float32)}
    ref_opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.scale_by_adam(b1=0.9, b2=0.95),
        optax.add_decayed_weights(wd, mask=tr.decay_mask))
    fused_opt = tr.make_optimizer(wd)
    ref_state, fused_state = ref_opt.init(params), fused_opt.init(params)
    ref_p = fused_p = params
    for i in range(5):
        # alternate big grads (clip active: gnorm >> 1) and small (inactive)
        scale = 100.0 if i % 2 == 0 else 1e-3
        grads = jax.tree.map(
            lambda p: jnp.asarray(rng.standard_normal(p.shape),
                                  jnp.float32) * scale, ref_p)
        ru, ref_state = ref_opt.update(grads, ref_state, ref_p)
        fu, fused_state = fused_opt.update(grads, fused_state, fused_p)
        ref_p = optax.apply_updates(ref_p, jax.tree.map(lambda u: -1e-3 * u, ru))
        fused_p = optax.apply_updates(fused_p, jax.tree.map(lambda u: -1e-3 * u, fu))
        for a, b in zip(jax.tree.leaves(ref_p), jax.tree.leaves(fused_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
    # moments match too
    np.testing.assert_allclose(np.asarray(ref_state[1].mu["w"]),
                               np.asarray(fused_state.mu["w"]),
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ref_state[1].nu["b"]),
                               np.asarray(fused_state.nu["b"]),
                               rtol=1e-5, atol=1e-9)
    assert int(fused_state.count) == 5

    # bf16 moment storage: same trajectory within bf16 tolerance
    bf16_opt = tr.make_optimizer(wd, moment_dtype=jnp.bfloat16)
    st = bf16_opt.init(params)
    assert st.mu["w"].dtype == jnp.bfloat16
    u, st = bf16_opt.update(jax.tree.map(jnp.ones_like, params), st, params)
    for a, b in zip(jax.tree.leaves(u), jax.tree.leaves(params)):
        assert a.dtype == b.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(a)))


def test_schedules_match_reference_formulas():
    # lr: warmup then half-cosine (ref croco/utils/misc.py:464-479)
    assert tr.lr_at(0, 1e-4, 1e-6, 10, 100) == 0
    assert abs(tr.lr_at(5, 1e-4, 1e-6, 10, 100) - 5e-5) < 1e-12
    assert abs(tr.lr_at(10, 1e-4, 1e-6, 10, 100) - 1e-4) < 1e-12
    assert abs(tr.lr_at(100, 1e-4, 1e-6, 10, 100) - 1e-6) < 1e-12
    # active_ratio (ref spann3r/training.py:191-196)
    assert tr.active_ratio_at(0, 100) == 0
    assert tr.active_ratio_at(50, 100) == 1.0
    assert tr.active_ratio_at(75, 100) == 1.0
    assert abs(tr.active_ratio_at(90, 100) - 0.4) < 1e-9 or \
        tr.active_ratio_at(90, 100) == 0.5
    assert tr.active_ratio_at(100, 100) == 0.5
    # alpha c2f (ref training.py:410-412)
    assert tr.alpha_at(0, 120) == 0.4
    assert abs(tr.alpha_at(90, 120) - 0.3) < 1e-9
    assert abs(tr.alpha_at(120, 120) - 0.2) < 1e-9


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    opt = tr.make_optimizer(0.05)
    opt_state = opt.init(params)
    mgr = tr.CheckpointManager(str(tmp_path))
    mgr.save("last", params, opt_state, 7, 1.5)
    restored = mgr.restore("last", {"params": params, "opt_state": opt_state,
                                    "epoch": np.array(0, np.int32),
                                    "best": np.array(0, np.float32)})
    assert int(restored["epoch"]) == 7
    assert float(restored["best"]) == 1.5
    old = jax.tree.leaves(params)[0]
    new = jax.tree.leaves(restored["params"])[0]
    np.testing.assert_array_equal(np.asarray(old), np.asarray(new))


class _ListDataset:
    """Minimal eval dataset: items are lists of T view dicts."""

    def __init__(self, n, rng):
        self.items = []
        for _ in range(n):
            views = []
            for _t in range(T):
                views.append({
                    "img": rng.standard_normal((*HW, 3)).astype(np.float32) * 0.3,
                    "pts3d": rng.standard_normal((*HW, 3)).astype(np.float32) + 2.0,
                    "valid_mask": np.ones(HW, dtype=bool),
                    "camera_pose": np.eye(4, dtype=np.float32),
                })
            self.items.append(views)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_eval_epoch_rank_sharded_matches_unsharded(rng, monkeypatch):
    """test_one_epoch with a 2-rank strided shard + allgather merge must
    reproduce the single-host stats exactly (strided partition covers the
    set with no overlap; the merge re-aggregates losses and detail sums)."""
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    eval_step = tr.make_eval_step(cfg, FP32)
    ds = _ListDataset(5, rng)

    stats_ref = tr.test_one_epoch(eval_step, params, ds, 1, max_ply=0)
    assert stats_ref and math.isfinite(stats_ref["loss_avg"])

    # emulate 2 hosts: capture each rank's local results, then run the real
    # merge with a scripted gather that stacks the two ranks' arrays
    captured = []
    real_merge = tr._merge_eval_stats
    monkeypatch.setattr(tr, "_merge_eval_stats",
                        lambda losses, details, world, gather_fn=None:
                        captured.append((list(losses), dict(details))) or {})
    monkeypatch.setattr(tr.jax, "process_count", lambda: 2)
    for rank_v in (0, 1):
        monkeypatch.setattr(tr.jax, "process_index", lambda r=rank_v: r)
        tr.test_one_epoch(eval_step, params, ds, 1, max_ply=0)
    monkeypatch.undo()
    assert len(captured) == 2
    (l0, d0), (l1, d1) = captured
    # strided partition: rank 0 gets items 0,2,4; rank 1 gets 1,3
    assert len(l0) == 3 and len(l1) == 2

    merged = real_merge(l0, d0, world=2,
                        gather_fn=_scripted_gather(l1, d1))
    assert set(merged) == set(stats_ref)
    for k in stats_ref:
        np.testing.assert_allclose(merged[k], stats_ref[k], rtol=1e-6,
                                   err_msg=k)


def _scripted_gather(other_losses, other_details):
    """Emulates process_allgather for a 2-rank merge: supplies the OTHER
    rank's contribution per collective, in _merge_eval_stats' fixed call
    order (batch counts, padded losses, name count, encoded names, detail
    sums).  Tracks the call count so tests can assert both ranks enter the
    same number of collectives (the multihost deadlock invariant)."""
    onames = sorted(other_details)
    state = {"calls": 0}

    def gather(x):
        x = np.asarray(x)
        i = state["calls"]
        state["calls"] += 1
        if i == 0:                                    # per-rank batch counts
            other = np.asarray([len(other_losses)], np.int32)
        elif i == 1:                                  # NaN-padded losses
            other = np.full_like(x, np.nan)
            other[:len(other_losses)] = other_losses
        elif i == 2:                                  # per-rank name counts
            other = np.asarray([len(onames)], np.int32)
        elif i == 3:                                  # uint8-encoded names
            other = np.zeros_like(x)
            for j, k in enumerate(onames):
                kb = k.encode()[:x.shape[1]]
                other[j, :len(kb)] = np.frombuffer(kb, np.uint8)
        else:                                         # zero-padded sums
            other = np.zeros_like(x)
            for j, k in enumerate(onames):
                other[j] = other_details[k]
        return np.stack([x, other])

    gather.state = state
    return gather


def test_eval_merge_empty_shard_rank():
    """An empty eval shard (more hosts than eval items) must still enter
    every collective — gating a gather on rank-local state deadlocks the
    other ranks.  Both sides of a 2-rank merge where rank 1 saw nothing
    must make the SAME number of gather calls and produce the stats of the
    non-empty rank alone."""
    losses0, details0 = [0.5, 1.5], {"la": 2.0, "lb": 4.0}

    g0 = _scripted_gather([], {})
    merged0 = tr._merge_eval_stats(list(losses0), dict(details0), world=2,
                                   gather_fn=g0)
    g1 = _scripted_gather(losses0, details0)
    merged1 = tr._merge_eval_stats([], {}, world=2, gather_fn=g1)

    assert g0.state["calls"] == g1.state["calls"]  # lockstep collectives
    for merged in (merged0, merged1):
        np.testing.assert_allclose(merged["loss_avg"], 1.0)
        np.testing.assert_allclose(merged["la"], 1.0)   # 2.0 / 2 batches
        np.testing.assert_allclose(merged["lb"], 2.0)


def test_train_step_t10(rng):
    """The reference fine-tunes on 10-frame clips (--num_frames 10,
    ref spann3r/training.py:49): the training scan + memory capacity
    (t-1)*P + sequence loss must hold up at T=10."""
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    opt = tr.make_optimizer(0.05)
    opt_state = opt.init(params)
    step = tr.make_train_step(cfg, FP32, opt, remat=True)
    t10, b = 10, 2
    batch = {
        "img": rng.standard_normal((t10, b, *HW, 3)).astype(np.float32) * 0.3,
        "pts3d": rng.standard_normal((t10, b, *HW, 3)).astype(np.float32) + 2.0,
        "valid_mask": np.ones((t10, b, *HW), dtype=bool),
        "camera_pose": np.broadcast_to(np.eye(4, dtype=np.float32),
                                       (t10, b, 4, 4)).copy(),
    }
    params, opt_state, metrics = step(params, opt_state, batch,
                                      jax.random.PRNGKey(1),
                                      jnp.float32(1e-4), jnp.float32(0.4))
    assert math.isfinite(float(metrics["loss"]))
    # 9 pair predictions stacked over time
    preds = sp.forward_train(params, jnp.transpose(
        jnp.asarray(batch["img"]), (1, 0, 2, 3, 4)), cfg, FP32, remat=False)
    assert preds["pts3d_1"].shape[0] == t10 - 1


def test_remat_scan_matches_default(rng):
    """SPANN3R_REMAT_SCAN (checkpoint the whole pair-step scan body) must be
    numerics-neutral: same loss and same gradients as the default."""
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(rng.standard_normal((2, 3, *HW, 3)), jnp.float32) * .3

    def loss(p, remat_scan):
        out = sp.forward_train(p, frames, cfg, FP32, rng=None, remat=True,
                               remat_scan=remat_scan)
        return jnp.mean(jnp.square(out["pts3d_1"])) + jnp.mean(out["conf_2"])

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_no_remat_enc_matches_default(rng, monkeypatch):
    """SPANN3R_NO_REMAT_ENC (keep encoder activations resident; backward
    skips the encoder recompute) must be numerics-neutral.  On CPU this
    compiles and matches; on the real chip the remote-compile helper
    crashes for this program at every batch size tried (B=2 and B=4 @224,
    so not device OOM) — the measured reject is recorded in PERF.md and
    tools/train_ablate.py's 'encsave' variant."""
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(rng.standard_normal((2, 3, *HW, 3)), jnp.float32) * .3

    def loss(p):
        out = sp.forward_train(p, frames, cfg, FP32, rng=None, remat=True)
        return jnp.mean(jnp.square(out["pts3d_1"])) + jnp.mean(out["conf_2"])

    monkeypatch.delenv("SPANN3R_NO_REMAT_ENC", raising=False)
    l0, g0 = jax.value_and_grad(loss)(params)
    monkeypatch.setenv("SPANN3R_NO_REMAT_ENC", "1")
    l1, g1 = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("policy", ["dots", "attn", "nomlp"])
def test_remat_policy_matches_default(rng, policy, monkeypatch):
    """Selective SPANN3R_REMAT_POLICY values (what the backward may reuse
    instead of recomputing; models/vit._remat_policy) must be
    numerics-neutral: the policy changes residency/recompute scheduling
    only, never values or gradients."""
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(rng.standard_normal((2, 3, *HW, 3)), jnp.float32) * .3

    def loss(p):
        out = sp.forward_train(p, frames, cfg, FP32, rng=None, remat=True)
        return jnp.mean(jnp.square(out["pts3d_1"])) + jnp.mean(out["conf_2"])

    monkeypatch.delenv("SPANN3R_REMAT_POLICY", raising=False)
    l0, g0 = jax.value_and_grad(loss)(params)
    monkeypatch.setenv("SPANN3R_REMAT_POLICY", policy)
    l1, g1 = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_unroll_tscan_matches_default(rng, monkeypatch):
    """The T-scan unroll (lax.scan unroll of the pair-step loop — the
    DEFAULT for T-1 <= 4 since r5, SPANN3R_UNROLL_TSCAN=1 opts back into
    the rolled loop) must be numerics-neutral: same outputs and same
    gradients as the rolled scan."""
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(rng.standard_normal((2, 3, *HW, 3)), jnp.float32) * .3

    def loss(p):
        out = sp.forward_train(p, frames, cfg, FP32, rng=None, remat=True)
        return jnp.mean(jnp.square(out["pts3d_1"])) + jnp.mean(out["conf_2"])

    monkeypatch.setenv("SPANN3R_UNROLL_TSCAN", "1")  # rolled reference
    l0, g0 = jax.value_and_grad(loss)(params)
    monkeypatch.delenv("SPANN3R_UNROLL_TSCAN", raising=False)  # t-1=2 unroll
    l1, g1 = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grads_bf16_matches_default(rng):
    """SPANN3R_GRADS_BF16 (bf16 working params + bf16 grads, fp32 master —
    training.work_params): the forward is BIT-identical to the default
    BF16 path (default casts each fp32 weight to bf16 at use; the work
    copy pre-rounds once to the same values, and head params stay fp32
    in both), so the loss must match exactly; gradients/updates differ
    only by bf16 rounding of the grads."""
    from spann3r_tpu.config import BF16

    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    batch = {k: jnp.asarray(v) for k, v in synth_batch(rng).items()}
    opt = tr.make_optimizer(0.05)

    # the work copy keeps heads fp32 and rounds everything else
    wp = tr.work_params(params, BF16)
    head_dts = {l.dtype for l in jax.tree.leaves(
        {k: wp["dust3r"][k] for k in ("head1", "head2")})}
    assert all(d == jnp.float32 for d in head_dts), head_dts
    rest = {l.dtype for l in jax.tree.leaves(wp["value_encoder"])}
    assert all(d == jnp.bfloat16 for d in rest), rest

    outs = {}
    for flag in (False, True):
        p = jax.tree.map(jnp.copy, params)   # steps donate their inputs
        st = opt.init(p)
        step = tr.make_train_step(cfg, BF16, opt, remat=True,
                                  grads_bf16=flag)
        p, st, m = step(p, st, batch, jax.random.PRNGKey(1),
                        jnp.float32(1e-4), jnp.float32(0.4))
        outs[flag] = (p, m)

    m0, m1 = outs[False][1], outs[True][1]
    # identical forward -> identical loss
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-6)
    # grad norm within bf16 rounding of the fp32-grads value
    np.testing.assert_allclose(float(m0["grad_norm"]),
                               float(m1["grad_norm"]), rtol=2e-2)
    # compare the applied UPDATE vectors in relative L2 per leaf —
    # elementwise comparison after Adam is meaningless (m/sqrt(v) is a
    # sign-like transform: coordinates with near-zero grads legitimately
    # flip under bf16 grad rounding); the update DIRECTION must agree
    for (a, b, p) in zip(jax.tree.leaves(outs[False][0]),
                         jax.tree.leaves(outs[True][0]),
                         jax.tree.leaves(params)):
        assert a.dtype == b.dtype == jnp.float32  # master stays fp32
        u0 = np.asarray(a, np.float64) - np.asarray(p, np.float64)
        u1 = np.asarray(b, np.float64) - np.asarray(p, np.float64)
        n0 = np.linalg.norm(u0)
        assert np.linalg.norm(u0 - u1) <= 0.35 * n0 + 1e-7 * u0.size ** .5, \
            (n0, np.linalg.norm(u0 - u1))


def test_optimizer_nonfinite_gate(rng):
    """A non-finite gradient step must be a no-op ON DEVICE: params update
    zero, Adam moments and the bias-correction count unchanged.  train()'s
    lagged host abort relies on this no-poison guarantee (the reference
    instead syncs the loss to the host and sys.exits every iteration,
    ref spann3r/training.py:222-224)."""
    import optax
    opt = tr.make_optimizer(0.05)
    params = {"w": jnp.asarray(rng.standard_normal((8, 16)), jnp.float32),
              "b": jnp.asarray(rng.standard_normal((16,)), jnp.float32)}
    state = opt.init(params)

    # one finite step to make the moments non-trivial
    g = jax.tree.map(lambda p: jnp.ones_like(p) * 0.1, params)
    u, state = opt.update(g, state, params)
    params = optax.apply_updates(params, jax.tree.map(lambda x: -1e-3 * x, u))
    snap = jax.tree.map(np.asarray, (params, state.mu, state.nu))
    count0 = int(state.count)

    for bad in (jnp.nan, jnp.inf, -jnp.inf):
        gbad = {"w": jnp.full((8, 16), bad, jnp.float32),
                "b": jnp.ones((16,), jnp.float32)}  # one finite leaf too
        u, state = opt.update(gbad, state, params)
        params = optax.apply_updates(params,
                                     jax.tree.map(lambda x: -1e-3 * x, u))
        for a, b in zip(jax.tree.leaves(snap),
                        jax.tree.leaves(jax.tree.map(
                            np.asarray, (params, state.mu, state.nu)))):
            np.testing.assert_array_equal(a, b)
        assert int(state.count) == count0  # step never happened

    # and a following finite step still works
    u, state = opt.update(g, state, params)
    assert int(state.count) == count0 + 1
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(u))
    assert float(jnp.abs(u["w"]).max()) > 0


def test_train_step_nonfinite_batch_no_poison(rng):
    """End-to-end through the real jitted train step: a batch that produces
    non-finite gradients leaves params bit-identical; training then recovers
    on the next good batch."""
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    opt = tr.make_optimizer(0.05)
    opt_state = opt.init(params)
    step = tr.make_train_step(cfg, FP32, opt, remat=True)
    mesh = pmesh.make_mesh(model=1)

    good = pmesh.shard_batch(mesh, synth_batch(rng))
    bad_np = synth_batch(rng)
    bad_np["pts3d"][0, 0, 0, 0, 0] = np.inf  # poisons loss + grads
    bad = pmesh.shard_batch(mesh, bad_np)

    params, opt_state, _ = step(params, opt_state, good,
                                jax.random.PRNGKey(0),
                                jnp.float32(1e-4), jnp.float32(0.4))
    snap = jax.tree.map(np.asarray, params)

    params, opt_state, metrics = step(params, opt_state, bad,
                                      jax.random.PRNGKey(1),
                                      jnp.float32(1e-4), jnp.float32(0.4))
    assert not math.isfinite(float(metrics["loss"]))  # host still sees it
    for a, b in zip(jax.tree.leaves(snap),
                    jax.tree.leaves(jax.tree.map(np.asarray, params))):
        np.testing.assert_array_equal(a, b)

    params, opt_state, metrics = step(params, opt_state, good,
                                      jax.random.PRNGKey(2),
                                      jnp.float32(1e-4), jnp.float32(0.4))
    assert math.isfinite(float(metrics["loss"]))
    assert float(jnp.abs(params["attn_head_1"]["fc1"]["w"]
                         - snap["attn_head_1"]["fc1"]["w"]).max()) > 0


def test_accum_grad_step_skips_nonfinite_microbatch(rng):
    """With gradient accumulation, a non-finite micro-batch contributes
    nothing to the accumulator (instead of poisoning the whole accumulation
    window)."""
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    opt = tr.make_optimizer(0.05)
    _, grad_step, _ = tr.make_accum_train_step(cfg, FP32, opt, accum_iter=2)
    mesh = pmesh.make_mesh(model=1)

    good = pmesh.shard_batch(mesh, synth_batch(rng))
    bad_np = synth_batch(rng)
    bad_np["pts3d"][:] = np.nan
    bad = pmesh.shard_batch(mesh, bad_np)

    zeros = jax.tree.map(jnp.zeros_like, params)
    acc, _ = grad_step(params, zeros, good, jax.random.PRNGKey(0),
                       jnp.float32(0.4))
    snap = jax.tree.map(np.asarray, acc)
    acc, metrics = grad_step(params, acc, bad, jax.random.PRNGKey(1),
                             jnp.float32(0.4))
    assert not math.isfinite(float(metrics["loss"]))
    for a, b in zip(jax.tree.leaves(snap),
                    jax.tree.leaves(jax.tree.map(np.asarray, acc))):
        np.testing.assert_array_equal(a, b)
