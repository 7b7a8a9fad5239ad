"""Worker process for tests/test_multiprocess.py — a REAL 2-process
jax.distributed run on CPU (gloo collectives).

Exercises, with world > 1 for the first time off-hardware:
  - jax.distributed.initialize + a ('data','model') mesh spanning processes
  - rank-local batches assembled into global arrays (parallel/mesh.py
    shard_batch make_array_from_process_local_data path)
  - the jitted sharded train step (XLA cross-process grad all-reduce)
  - rank-sharded eval + padded-allgather merge (training.py
    test_one_epoch/_merge_eval_stats — the d692745 deadlock class)
  - COLLECTIVE orbax checkpoint save/restore (rank-0-only saves deadlock)

Ref surface: the reference's NCCL DDP init/teardown
(/root/reference/croco/utils/misc.py:222-259).

Usage: mp_worker.py <rank> <nproc> <port> <outdir>
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    rank, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    # shutdown_timeout_seconds: the two workers time-share ONE host core
    # with whatever else runs on this box, so at interpreter exit the ranks
    # can be skewed by minutes (observed: shutdown barrier DEADLINE_EXCEEDED
    # at the 300 s default killing an otherwise-passing run).  The parent
    # test enforces its own overall timeout.
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=rank,
                               shutdown_timeout_seconds=1200)
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.experimental.multihost_utils import process_allgather

    from spann3r_tpu import training as tr
    from spann3r_tpu.config import (DUSt3RConfig, FP32, Spann3RConfig,
                                    ViTConfig)
    from spann3r_tpu.datasets import build_dataset, make_sampler
    from spann3r_tpu.datasets.loader import DataLoader
    from spann3r_tpu.models import spann3r as sp
    from spann3r_tpu.parallel import mesh as pmesh

    # depth kept minimal: the multi-process paths under test (mesh,
    # collectives, eval merge, collective checkpoint) are depth-independent,
    # and two processes share ONE host core here — compile time is the
    # test's wall-clock budget
    cfg = Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=(32, 32), patch_size=16,
                            enc=ViTConfig(dim=64, depth=2, num_heads=4),
                            dec=ViTConfig(dim=48, depth=2, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=64, value_enc_heads=4,
        attn_head_in=64 + 48, attn_head_out=64)

    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    opt = tr.make_optimizer(0.05)
    opt_state = opt.init(params)
    step = tr.make_train_step(cfg, FP32, opt, remat=False)

    mesh = pmesh.make_mesh(model=1)  # data axis = all 4 global devices
    ds = build_dataset("SynthRoom(num_seq=8, num_frames=3, resolution=32, "
                       "seq_len=8, seed=11)")
    sampler = make_sampler(ds, batch_size=2, world_size=nproc, rank=rank)
    sampler.set_epoch(0)
    loader = DataLoader(ds, 2, sampler=sampler, num_workers=1)

    losses = []
    for i, batch in enumerate(loader):
        sharded = pmesh.shard_batch(mesh, batch)  # local (T,2,..) -> global (T,4,..)
        params, opt_state, metrics = step(
            params, opt_state, sharded, jax.random.PRNGKey(i),
            jnp.float32(1e-4), jnp.float32(0.4))
        losses.append(float(metrics["loss"]))
        if i >= 1:
            break

    # replicated params must be IDENTICAL on every process after sharded
    # steps (the DDP invariant the reference gets from NCCL broadcast+allreduce)
    fp = float(optax.global_norm(params))
    fps = np.asarray(process_allgather(np.asarray([fp], np.float64))).ravel()

    # rank-sharded eval with the real cross-process allgather merge; the
    # 5-item set splits 3/2 so the ragged-padding path runs
    eval_ds = build_dataset("SynthRoom(num_seq=5, num_frames=3, "
                            "resolution=32, seq_len=8, scene_seed=3, "
                            "seed=777)")
    eval_step = tr.make_eval_step(cfg, FP32)
    stats = tr.test_one_epoch(eval_step, params, eval_ds, 1)

    # COLLECTIVE checkpoint save (every rank enters), then restore
    mgr = tr.CheckpointManager(outdir)
    mgr.save("last", params, opt_state, 3, 1.25)
    restored = mgr.restore("last", {"params": params, "opt_state": opt_state,
                                    "epoch": np.array(0, np.int32),
                                    "best": np.array(0, np.float32)})
    assert int(restored["epoch"]) == 3

    result = {"rank": rank, "losses": losses,
              "fingerprints": fps.tolist(), "eval": stats,
              "epoch": int(restored["epoch"]),
              "best": float(restored["best"])}
    with open(os.path.join(outdir, f"result_{rank}.json"), "w") as f:
        json.dump(result, f)
    print("WORKER_OK", rank, flush=True)


if __name__ == "__main__":
    main()
