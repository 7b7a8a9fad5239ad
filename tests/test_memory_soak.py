"""Long-horizon memory soak: hundreds of frames through many prune cycles.

The reference reconstructs arbitrarily long videos by pruning the bank
whenever the long-term budget overflows (spann3r/model.py:130-143,185-210).
tests/test_memory.py pins one prune cycle; these tests pin the LONG-RUN
behaviour — accumulated-attention/age drift across >=10 prunes, and the
long_mem_size=0 pure sliding-window path — step by step against the actual
torch SpatialMemory.
"""
import jax.numpy as jnp
import numpy as np

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


def _sorted_rows(a: np.ndarray) -> np.ndarray:
    return a[np.lexsort(a.T)]


@requires_reference
def test_soak_many_prune_cycles(rng):
    """220 eval-mode frames with interleaved reads through >=10 prune cycles:
    bank kept-set, per-slot age/attention statistics and read outputs stay in
    lockstep with the reference (no drift accumulation).

    sim_thresh=1.0 disables dedup: after a prune the reference's topk places
    TIED protected slots in arbitrary heap order while ours is chronological
    (documented deviation), so the working-memory window CONTENTS can differ
    between implementations — with dedup off the window is never read and
    the bank set-semantics are the whole contract.
    """
    import torch

    cfg = MemoryConfig(long_mem_size=14 * P, work_mem_size=2, attn_thresh=5e-4,
                       sim_thresh=1.0, prune_protect_age=7)
    ref = _ref_memory(cfg)
    norms = _norms()
    capacity = cfg.capacity(P)
    state = M.init_memory(B, capacity, D, dtype=jnp.float32)

    nframes = 220
    prunes = 0
    prev_ref_slots = 0
    for t in range(nframes):
        k = rng.standard_normal((B, P, D)).astype(np.float32)
        v = rng.standard_normal((B, P, D)).astype(np.float32)
        q = rng.standard_normal((B, P, D)).astype(np.float32)
        if t > 0:
            ref_out = ref.memory_read(torch.from_numpy(q),
                                      res=True).detach().numpy()
            ours, state = M.memory_read(norms, state, jnp.asarray(q),
                                        attn_thresh=cfg.attn_thresh)
            np.testing.assert_allclose(np.asarray(ours), ref_out,
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"read diverged at frame {t}")
        ref.add_mem_check(torch.from_numpy(k), torch.from_numpy(v))
        state = M.add_mem_check(state, jnp.asarray(k), jnp.asarray(v), cfg)

        ref_slots = ref.mem_k.shape[1]
        if ref_slots < prev_ref_slots + P:
            prunes += 1
        prev_ref_slots = ref_slots

        n = int(state.size[0])
        assert n == ref_slots, f"size diverged at frame {t}"
        assert int(state.wm[0]) == ref.wm and int(state.lm[0]) == ref.lm
        ours_k = np.asarray(state.k[0, :n])
        ref_k = ref.mem_k.detach().numpy()[0]
        np.testing.assert_allclose(_sorted_rows(ours_k), _sorted_rows(ref_k),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"bank kept-set diverged at {t}")
        # age + accumulated-attention statistics (the prune weights): sorted
        # per-slot comparison — these drive EVERY future prune decision, so
        # any drift compounds
        np.testing.assert_allclose(
            np.sort(np.asarray(state.count[0, :n])),
            np.sort(ref.mem_count[:, :, 0].detach().numpy()[0]),
            rtol=1e-6, err_msg=f"slot ages diverged at {t}")
        np.testing.assert_allclose(
            np.sort(np.asarray(state.attn[0, :n])),
            np.sort(ref.mem_attn[:, :, 0].detach().numpy()[0]),
            rtol=2e-3, atol=2e-4,
            err_msg=f"accumulated attention diverged at {t}")

    assert prunes >= 10, f"only {prunes} prune cycles exercised"
    assert int(state.size[0]) <= capacity


@requires_reference
def test_soak_sliding_window(rng):
    """long_mem_size=0 sliding-window path over 120 frames WITH dedup:
    exact step-by-step parity including bank order, dedup decisions against
    injected near-duplicates, and read outputs (ref model.py:131-137 evicts
    the oldest frame; chronological order is preserved so the working
    window — and therefore check_sim — is identical in both)."""
    import torch

    cfg = MemoryConfig(long_mem_size=0, work_mem_size=5, attn_thresh=5e-4,
                       sim_thresh=0.95)
    ref = _ref_memory(cfg)
    norms = _norms()
    capacity = -(-((cfg.work_mem_size + 1) * P) // 128) * 128
    state = M.init_memory(B, capacity, D, dtype=jnp.float32)

    nframes = 120
    last_k = None
    for t in range(nframes):
        k = rng.standard_normal((B, P, D)).astype(np.float32)
        if t % 7 == 3 and last_k is not None:  # periodic near-duplicate
            k = last_k + 1e-4 * rng.standard_normal((B, P, D)).astype(np.float32)
        last_k = k
        v = rng.standard_normal((B, P, D)).astype(np.float32)
        q = rng.standard_normal((B, P, D)).astype(np.float32)

        if t > 0:
            ref_out = ref.memory_read(torch.from_numpy(q),
                                      res=True).detach().numpy()
            ours, state = M.memory_read(norms, state, jnp.asarray(q),
                                        attn_thresh=cfg.attn_thresh)
            np.testing.assert_allclose(np.asarray(ours), ref_out,
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"read diverged at frame {t}")

        ref.add_mem_check(torch.from_numpy(k), torch.from_numpy(v))
        state = M.add_mem_check(state, jnp.asarray(k), jnp.asarray(v), cfg)
        n = int(state.size[0])
        assert n == ref.mem_k.shape[1], f"size diverged at frame {t}"
        assert int(state.wm[0]) == ref.wm, f"wm diverged at frame {t}"
        # exact ORDERED parity: the sliding window never reorders slots
        np.testing.assert_allclose(np.asarray(state.k[0, :n]),
                                   ref.mem_k.detach().numpy()[0],
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"bank diverged at frame {t}")
        np.testing.assert_allclose(
            np.asarray(state.attn[0, :n]),
            ref.mem_attn[:, :, 0].detach().numpy()[0],
            rtol=2e-3, atol=2e-4,
            err_msg=f"attention stats diverged at frame {t}")

    # window saturated: dedup + oldest-frame eviction decisions were matched
    # step-by-step by the ordered-bank assertions above
    assert int(state.size[0]) == cfg.work_mem_size * P
    assert ref.mem_k.shape[1] == cfg.work_mem_size * P
