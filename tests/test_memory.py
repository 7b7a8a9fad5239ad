"""Behavioural parity of the fixed-capacity memory vs the reference
SpatialMemory (spann3r/model.py:11-210): read, write, dedup, spill, prune."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.config import MemoryConfig
from spann3r_tpu.models import memory as M
from spann3r_tpu.ops.layers import init_layer_norm

from .conftest import requires_reference

D = 32     # token dim
P = 8      # tokens per frame
B = 1


def _norms():
    return {"norm_q": init_layer_norm(D), "norm_k": init_layer_norm(D),
            "norm_v": init_layer_norm(D)}


def _ref_memory(cfg: MemoryConfig):
    import torch
    from spann3r.model import SpatialMemory

    eye = torch.nn.LayerNorm(D, eps=1e-6).eval()  # default init == ours
    return SpatialMemory(eye, eye, eye, mem_dropout=None,
                         long_mem_size=cfg.long_mem_size,
                         work_mem_size=cfg.work_mem_size,
                         attn_thresh=cfg.attn_thresh,
                         sim_thresh=cfg.sim_thresh)


def _frames(rng, n, scale=1.0):
    return [rng.standard_normal((B, P, D)).astype(np.float32) * scale
            for _ in range(n)]


@requires_reference
def test_read_write_parity_no_prune(rng):
    """Plain add + read sequence (training semantics, attn_thresh=0)."""
    import torch

    cfg = MemoryConfig(long_mem_size=4000, work_mem_size=5, attn_thresh=0.0,
                       sim_thresh=1.0)  # sim_thresh=1.0 disables dedup in ref
    ref = _ref_memory(cfg)
    norms = _norms()
    state = M.init_memory(B, 128, D, dtype=jnp.float32)

    ks = _frames(rng, 6)
    vs = _frames(rng, 6)
    qs = _frames(rng, 6)

    for t in range(6):
        ref.add_mem(torch.from_numpy(ks[t]), torch.from_numpy(vs[t]))
        state = M.add_mem(state, jnp.asarray(ks[t]), jnp.asarray(vs[t]))

        ref_out = ref.memory_read(torch.from_numpy(qs[t]), res=True).detach().numpy()
        ours, state = M.memory_read(norms, state, jnp.asarray(qs[t]),
                                    attn_thresh=0.0)
        np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=2e-4, atol=2e-4)

    n = int(state.size[0])
    np.testing.assert_allclose(np.asarray(state.attn[:, :n]),
                               ref.mem_attn[..., 0].detach().numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(state.count[:, :n]),
                               ref.mem_count[..., 0].detach().numpy(), rtol=1e-6)


@requires_reference
def test_add_mem_check_dedup_and_spill(rng):
    """Eval semantics: duplicate frames are skipped; wm/lm counters track."""
    import torch

    cfg = MemoryConfig(long_mem_size=4000, work_mem_size=2, attn_thresh=5e-4,
                       sim_thresh=0.95)
    ref = _ref_memory(cfg)
    norms = _norms()
    state = M.init_memory(B, 128, D, dtype=jnp.float32)

    ks = _frames(rng, 5)
    vs = _frames(rng, 5)
    # frame 2 nearly duplicates frame 1 -> must be deduped
    ks[2] = ks[1] + 1e-4 * rng.standard_normal((B, P, D)).astype(np.float32)

    for t in range(5):
        ref.add_mem_check(torch.from_numpy(ks[t]), torch.from_numpy(vs[t]))
        state = M.add_mem_check(state, jnp.asarray(ks[t]), jnp.asarray(vs[t]),
                                cfg)
        assert int(state.size[0]) == ref.mem_k.shape[1], f"size diverged at t={t}"
        assert int(state.wm[0]) == ref.wm and int(state.lm[0]) == ref.lm

    n = int(state.size[0])
    np.testing.assert_allclose(np.asarray(state.k[:, :n]), ref.mem_k.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


@requires_reference
def test_prune_parity(rng):
    """Usage-based pruning with age protection (ref model.py:185-210)."""
    import torch

    # Budgets chosen so that when pruning triggers most slots are OLDER than
    # the protection age and carry real-valued (tie-free) usage weights — with
    # every slot protected the reference's kept-set is itself arbitrary
    # (torch.topk over all-equal 1e8 weights). protect_age must equal
    # work_mem_size+5 to match the reference's hard-coded rule (model.py:188).
    cfg = MemoryConfig(long_mem_size=14 * P, work_mem_size=2, attn_thresh=0.0,
                       sim_thresh=1.0, prune_protect_age=7)
    ref = _ref_memory(cfg)
    norms = _norms()
    state = M.init_memory(B, 256, D, dtype=jnp.float32)

    nframes = 22
    ks, vs, qs = _frames(rng, nframes), _frames(rng, nframes), _frames(rng, nframes)

    import spann3r.model as ref_mod
    for t in range(nframes):
        # interleave reads so attention stats (prune weights) are nonzero
        if t > 0:
            ref.memory_read(torch.from_numpy(qs[t]), res=True)
            _, state = M.memory_read(norms, state, jnp.asarray(qs[t]),
                                     attn_thresh=0.0)
        ref.add_mem_check(torch.from_numpy(ks[t]), torch.from_numpy(vs[t]))
        state = M.add_mem_check(state, jnp.asarray(ks[t]), jnp.asarray(vs[t]), cfg)

        assert int(state.size[0]) == ref.mem_k.shape[1], f"size diverged at t={t}"
        n = int(state.size[0])
        # torch.topk returns TIES (protected slots, all weight 1e8) in
        # arbitrary heap order; lax.top_k is stable (chronological). The kept
        # SET is the semantic contract — compare banks as sorted row-sets.
        ours_k = np.asarray(state.k[0, :n])
        ref_k = ref.mem_k.detach().numpy()[0]
        np.testing.assert_allclose(ours_k[np.lexsort(ours_k.T)],
                                   ref_k[np.lexsort(ref_k.T)],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.sort(np.asarray(state.count[0, :n])),
                                   np.sort(ref.mem_count[:, :, 0].detach().numpy()[0]),
                                   rtol=1e-6)


def test_multi_stream_independent_decisions(rng):
    """B=2 streams with diverging dedup decisions must match two separate
    B=1 runs exactly (per-stream counters)."""
    cfg = MemoryConfig(long_mem_size=4 * P, work_mem_size=2, attn_thresh=5e-4,
                       sim_thresh=0.95, prune_protect_age=2)
    frames_a = [rng.standard_normal((1, P, D)).astype(np.float32)
                for _ in range(8)]
    frames_b = [rng.standard_normal((1, P, D)).astype(np.float32)
                for _ in range(8)]
    # stream A gets a near-duplicate at t=3 (deduped), stream B does not
    frames_a[3] = frames_a[2] + 1e-5

    norms = _norms()
    joint = M.init_memory(2, 128, D, dtype=jnp.float32)
    solo_a = M.init_memory(1, 128, D, dtype=jnp.float32)
    solo_b = M.init_memory(1, 128, D, dtype=jnp.float32)
    for t in range(8):
        fa, fb = jnp.asarray(frames_a[t]), jnp.asarray(frames_b[t])
        fj = jnp.concatenate([fa, fb])
        _, joint = M.memory_read(norms, joint, fj, attn_thresh=cfg.attn_thresh)
        joint = M.add_mem_check(joint, fj, fj, cfg)
        _, solo_a = M.memory_read(norms, solo_a, fa, attn_thresh=cfg.attn_thresh)
        solo_a = M.add_mem_check(solo_a, fa, fa, cfg)
        _, solo_b = M.memory_read(norms, solo_b, fb, attn_thresh=cfg.attn_thresh)
        solo_b = M.add_mem_check(solo_b, fb, fb, cfg)

    assert int(joint.size[0]) == int(solo_a.size[0])
    assert int(joint.size[1]) == int(solo_b.size[0])
    assert int(joint.size[0]) != int(joint.size[1])  # decisions diverged
    for sel, solo in ((0, solo_a), (1, solo_b)):
        n = int(solo.size[0])
        np.testing.assert_allclose(np.asarray(joint.k[sel, :n]),
                                   np.asarray(solo.k[0, :n]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(joint.attn[sel, :n]),
                                   np.asarray(solo.attn[0, :n]),
                                   rtol=1e-4, atol=1e-5)


def test_memory_ops_jit_and_scan():
    """All memory ops compile under jit with static shapes."""
    cfg = MemoryConfig(long_mem_size=4 * P, work_mem_size=2)
    norms = _norms()
    state = M.init_memory(B, 128, D, dtype=jnp.float32)

    @jax.jit
    def step(state, kv):
        k, v = kv
        out, state = M.memory_read(norms, state, k, attn_thresh=cfg.attn_thresh)
        state = M.add_mem_check(state, k, v, cfg)
        return state, out

    key = jax.random.PRNGKey(0)
    for t in range(8):
        k = jax.random.normal(jax.random.fold_in(key, t), (B, P, D))
        state, out = step(state, (k, k))
        assert bool(jnp.isfinite(out).all())
    assert int(state.size[0]) <= 128
