"""Synthetic convergence gate: prove the training system LEARNS.

The reference's only end-to-end training evidence is "eval chamfer
improves and the best checkpoint is kept"
(/root/reference/spann3r/training.py:94-168, 377-405) on real datasets
that are not present in this image.  This gate reproduces that evidence
chain on procedural SynthRoom scenes (datasets/synth.py): run the REAL
`training.train()` recipe (curriculum, alpha-c2f, per-iter LR schedule,
optional accumulation / remat_scan) from random init, and require that

  1. held-out eval loss (test_one_epoch protocol) drops, and
  2. reconstruction chamfer through the REAL inference + alignment
     pipeline (tools/eval_pipeline.evaluate_scene, the eval.py protocol)
     drops,

by a stated margin.  tools/convergence_gate.py runs this on the TPU and
records the artifact; tests/test_convergence.py runs a miniature on CPU.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np


def synth_chamfer(params, cfg, prec, dataset, n_scenes: Optional[int] = None,
                  offline: bool = False) -> Dict[str, float]:
    """Masked accuracy/completion of full-pipeline reconstructions over the
    first `n_scenes` items of a full-video dataset (eval.py:167-197 metric
    protocol, without the ICP refinement — random-init clouds are too far
    from GT for ICP to be meaningful, and the gate measures the *change*)."""
    from ..datasets.loader import collate_views
    from .eval_pipeline import evaluate_scene
    from .eval_recon import accuracy, completion

    n = len(dataset) if n_scenes is None else min(n_scenes, len(dataset))
    accs, comps = [], []
    for i in range(n):
        batch = collate_views([dataset[i]])
        pts, gts, masks, _, _, _, _, _ = evaluate_scene(
            params, cfg, prec, batch, offline=offline)
        m = np.asarray(masks) > 0
        acc, _ = accuracy(gts[m].reshape(-1, 3), pts[m].reshape(-1, 3))
        comp, _ = completion(gts[m].reshape(-1, 3), pts[m].reshape(-1, 3))
        accs.append(acc)
        comps.append(comp)
    return {"acc": float(np.mean(accs)), "comp": float(np.mean(comps)),
            "chamfer": float((np.mean(accs) + np.mean(comps)) / 2.0),
            "n_scenes": n}


def _read_curve(output_dir: str) -> list:
    path = os.path.join(output_dir, "log.txt")
    if not os.path.exists(path):
        return []
    curve = []
    with open(path) as f:
        for line in f:
            try:
                curve.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return curve


def _kill_resume_drill(args, child_cmd, kill_epoch: int,
                       mid_epoch_wait: float = 15.0) -> Dict[str, Any]:
    """Run the training child process and SIGKILL it mid-epoch
    `kill_epoch`, so the parent's subsequent tr.train() call exercises the
    real auto-resume path (ref training.py:377-405 load-last semantics).

    The top-of-epoch log line for `kill_epoch` is written AFTER the
    checkpoint-last save for kill_epoch-1 (training.py epoch loop order),
    so once it appears the child is provably inside epoch `kill_epoch`
    with a resumable checkpoint on disk; we then wait a beat so the kill
    lands mid-epoch, not on the boundary."""
    import signal
    import subprocess
    import time

    log_path = os.path.join(args.output_dir, "log.txt")

    def _top_of_epoch_seen(epoch: int) -> bool:
        if not os.path.exists(log_path):
            return False
        for line in open(log_path):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            # top-of-epoch stats line (no train_loss key) vs epoch-end
            # train summary
            if d.get("epoch") == epoch and "train_loss" not in d:
                return True
        return False

    proc = subprocess.Popen(child_cmd)
    t0 = time.time()
    try:
        while not _top_of_epoch_seen(kill_epoch):
            if proc.poll() is not None:
                raise RuntimeError(
                    f"training child exited (rc={proc.returncode}) before "
                    f"epoch {kill_epoch} was reached — cannot drill resume")
            time.sleep(2.0)
        time.sleep(mid_epoch_wait)  # land the kill mid-epoch
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    return {"kill_epoch": kill_epoch, "child_wall_s": time.time() - t0,
            "child_rc": proc.returncode}


def run_gate(args, model_cfg, chamfer_expr: str,
             n_chamfer_scenes: int = 4,
             artifact_path: Optional[str] = None,
             kill_resume: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Eval-before -> train (real driver) -> eval-after.  Returns (and
    optionally writes) the gate artifact with before/after eval stats,
    before/after chamfer, and the per-epoch eval curve from log.txt.

    kill_resume={'cmd': [...], 'epoch': K} additionally runs the training
    start in a subprocess, SIGKILLs it mid-epoch K, and lets the in-process
    tr.train() auto-resume from checkpoint-last — the artifact then records
    the resume boundary and asserts the train-loss curve is continuous
    across it."""
    import jax
    import jax.numpy as jnp

    from .. import training as tr
    from ..config import BF16, Precision
    from ..datasets import build_dataset
    from ..models import spann3r as sp

    # The drill runs FIRST, before this process touches any device: on the
    # single-chip TPU (axon tunnel) two live JAX clients contend for the
    # chip, so the child must own it alone until it is killed.  params0 is
    # deterministic from the seed, so the before-eval below is unaffected
    # by computing it after the drill.
    drill = None
    if kill_resume:
        drill = _kill_resume_drill(args, kill_resume["cmd"],
                                   kill_resume["epoch"],
                                   kill_resume.get("mid_epoch_wait", 15.0))

    prec = BF16 if args.bf16 else Precision(compute_dtype=jnp.float32)
    params0 = sp.init_spann3r(jax.random.PRNGKey(args.seed), model_cfg)

    eval_step = tr.make_eval_step(model_cfg, prec)
    test_ds = build_dataset(args.test_dataset)
    if hasattr(test_ds, "set_epoch"):
        test_ds.set_epoch(0)
    before_eval = tr.test_one_epoch(eval_step, params0, test_ds,
                                    args.batch_size_test, output_dir=None)

    chamfer_ds = build_dataset(chamfer_expr)
    before_chamfer = synth_chamfer(params0, model_cfg, prec, chamfer_ds,
                                   n_chamfer_scenes)
    del params0

    # with kill_resume this auto-resumes from the killed child's
    # checkpoint-last (training.py restore("last") path)
    result = tr.train(args, model_cfg=model_cfg)
    params1 = result["params"]

    after_eval = tr.test_one_epoch(eval_step, params1, test_ds,
                                   args.batch_size_test, output_dir=None)
    after_chamfer = synth_chamfer(params1, model_cfg, prec, chamfer_ds,
                                  n_chamfer_scenes)

    artifact = {
        "train_dataset": args.train_dataset,
        "test_dataset": args.test_dataset,
        "chamfer_dataset": chamfer_expr,
        "epochs": args.epochs, "batch_size": args.batch_size,
        "accum_iter": args.accum_iter, "remat_scan": bool(args.remat_scan),
        "lr": args.lr, "alpha_c2f": bool(args.alpha_c2f),
        "bf16": bool(args.bf16),
        # precision deviations active during the gated run (training.py
        # reads these at step-build time)
        "adam_bf16": os.environ.get("SPANN3R_ADAM_BF16", "") == "1",
        "grads_bf16": os.environ.get("SPANN3R_GRADS_BF16", "") == "1",
        "before": {"eval": before_eval, "chamfer": before_chamfer},
        "after": {"eval": after_eval, "chamfer": after_chamfer},
        "curve": _read_curve(args.output_dir),
        "eval_improved": after_eval.get("loss_med", np.inf)
        < before_eval.get("loss_med", np.inf),
        "chamfer_improved": after_chamfer["chamfer"]
        < before_chamfer["chamfer"],
    }

    # schedule coverage + resume-boundary continuity from the train-loss
    # curve (training.py writes per-epoch {'epoch','train_loss','alpha',
    # 'active_ratio'} summary lines)
    train_curve = [d for d in artifact["curve"] if "train_loss" in d]
    if train_curve:
        alphas = [d["alpha"] for d in train_curve]
        ars = [d["active_ratio"] for d in train_curve]
        artifact["schedule"] = {
            "alpha_per_epoch": alphas, "active_ratio_per_epoch": ars,
            "alpha_c2f_kink_crossed": min(alphas) < max(alphas),
            "active_ratio_decay_crossed": len(ars) > 1
            and ars[-1] < max(ars),
        }
    if drill:
        k = drill["kill_epoch"]
        losses = {d["epoch"]: d["train_loss"] for d in train_curve}
        pre, post = losses.get(k - 1), losses.get(k)
        drill["loss_before_kill"] = pre
        drill["loss_after_resume"] = post
        drill["loss_at_start"] = train_curve[0]["train_loss"] \
            if train_curve else None
        # continuity: the first post-resume epoch must continue the
        # descent, not restart anywhere near the from-scratch loss
        drill["curve_continuous"] = (
            pre is not None and post is not None
            and post < pre * 1.5
            and post < drill["loss_at_start"] * 0.8)
        artifact["kill_resume"] = drill
    if artifact_path:
        os.makedirs(os.path.dirname(os.path.abspath(artifact_path)),
                    exist_ok=True)
        with open(artifact_path, "w") as f:
            json.dump(artifact, f, indent=1, default=float)
    return artifact
