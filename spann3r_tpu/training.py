"""Training loop (TPU rebuild of spann3r/training.py + croco/utils/misc.py).

One jitted train step over a ('data','model') mesh: forward_train scan ->
conf_loss_t -> grads -> optax AdamW(0.9, 0.95) with decay/no-decay masking,
global-norm clip 1.0 and per-iteration warmup+half-cosine LR.  The gradient
all-reduce is emitted by XLA from the batch sharding (the reference's DDP).

Schedules kept from the reference:
  - per-iter LR: linear warmup then half-cosine to min_lr (misc.py:464-479)
  - frame-spacing curriculum: active_ratio ramps 0->1, decays to 0.5 after
    75% of training (training.py:191-196)
  - alpha coarse-to-fine: ConfLoss alpha 0.4 -> 0.2 linearly over the second
    half (training.py:410-412)
Checkpointing via orbax: last/best/periodic + auto-resume (training.py:377-405).
"""
from __future__ import annotations

import argparse
import functools
import json
import math
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import losses
from .config import BF16, Precision, Spann3RConfig
from .datasets import build_dataset, make_sampler
from .datasets.loader import DataLoader
from .models import spann3r as sp
from .parallel import mesh as pmesh


# Abort after this many CONSECUTIVE steps whose update the on-device
# non-finite-gradient gate suppressed while the loss stayed finite (see
# make_optimizer); otherwise such a run would freeze silently.
MAX_SUPPRESSED_STEPS = int(os.environ.get("SPANN3R_MAX_SUPPRESSED_STEPS", 25))


# ---------------------------------------------------------------------------
# args
# ---------------------------------------------------------------------------

def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Spann3R-TPU training", add_help=False)
    p.add_argument("--dust3r_ckpt", default=None,
                   help="path to DUSt3R .pth to warm-start from")
    p.add_argument("--pretrained", default=None,
                   help="path of a starting spann3r checkpoint (.pth or orbax)")
    p.add_argument("--resolution", default=224, type=int)
    p.add_argument("--num_frames", default=5, type=int)
    p.add_argument("--head_type", default="dpt", choices=["dpt", "linear"])
    p.add_argument("--train_criterion_alpha", default=0.4, type=float)
    p.add_argument("--train_dataset", default=None, type=str,
                   help="dataset-algebra expression (see datasets/__init__.py)")
    p.add_argument("--test_dataset", default=None, type=str)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--batch_size", default=2, type=int,
                   help="per-host batch size")
    p.add_argument("--batch_size_test", default=1, type=int)
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--epochs", default=120, type=int)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--lr", default=5e-5, type=float)
    p.add_argument("--blr", default=1.5e-4, type=float)
    p.add_argument("--min_lr", default=1e-6, type=float)
    p.add_argument("--warmup_epochs", default=10, type=int)
    p.add_argument("--alpha_c2f", default=1, type=int)
    p.add_argument("--num_workers", default=2, type=int)
    p.add_argument("--eval_freq", default=1, type=int)
    p.add_argument("--save_freq", default=1, type=int)
    p.add_argument("--keep_freq", default=10, type=int)
    p.add_argument("--print_freq", default=20, type=int)
    p.add_argument("--output_dir", default="./output/train", type=str)
    p.add_argument("--model_axis", default=1, type=int,
                   help="tensor-parallel axis size of the device mesh")
    p.add_argument("--tp_min_dim", default=1024, type=int,
                   help="smallest weight last-dim sharded over 'model'")
    p.add_argument("--fsdp", default=0, type=int,
                   help="ZeRO-3-style: also shard big weights + Adam moments "
                        "over the 'data' axis (parallel/mesh.py)")
    p.add_argument("--bf16", default=1, type=int)
    p.add_argument("--remat", default=1, type=int)
    p.add_argument("--remat_scan", default=0, type=int,
                   help="also checkpoint the whole pair-step scan body "
                        "(needed for B=4 x T=10 @224 on 16 GB; see PERF.md)")
    p.add_argument("--profile_dir", default=None, type=str,
                   help="write a jax.profiler trace of the first train steps")
    return p


# ---------------------------------------------------------------------------
# schedules (ref croco/utils/misc.py:464-479, spann3r/training.py:191-196)
# ---------------------------------------------------------------------------

def lr_at(epoch_f: float, lr: float, min_lr: float, warmup_epochs: float,
          epochs: float) -> float:
    if epoch_f < warmup_epochs:
        return lr * epoch_f / max(warmup_epochs, 1e-8)
    t = (epoch_f - warmup_epochs) / max(epochs - warmup_epochs, 1e-8)
    return min_lr + (lr - min_lr) * 0.5 * (1.0 + math.cos(math.pi * t))


def active_ratio_at(epoch: int, epochs: int) -> float:
    r = epoch / epochs
    if r < 0.75:
        return min(1.0, r * 2.0)
    return max(0.5, 1.0 - (r - 0.75) / 0.25)


def alpha_at(epoch: int, epochs: int, alpha_init: float = 0.4,
             c2f: bool = True) -> float:
    if not c2f:
        return alpha_init
    return alpha_init - 0.2 * max((epoch - 0.5 * epochs) / (0.5 * epochs), 0.0)


# ---------------------------------------------------------------------------
# optimizer
# ---------------------------------------------------------------------------

def decay_mask(params):
    """Weight decay only on >=2-D weights (ref misc.py:420-426: no decay for
    1-D params and biases)."""
    return jax.tree.map(lambda x: x.ndim > 1, params)


def layer_lr_scales(params, enc_depth: int, dec_depth: int,
                    layer_decay: float):
    """Pytree of per-leaf LR multipliers implementing the reference's
    layer-decay param groups (croco/utils/misc.py:385-460).

    The reference buckets named parameters into per-layer optimizer groups
    with lr_scale = layer_decay ** (num_layers + 1 - layer_id), where
    layer_id is 0 for patch/pos embeds and tokens, i+1 for encoder block i,
    enc_depth for decoder_embed/enc_norm, enc_depth+i+1 for decoder block i,
    enc_depth+dec_depth for dec_norm and num_layers+1 for heads
    (misc.py:385-402).  Our block stacks are scan-stacked on axis 0, so the
    per-layer scales become a (depth, 1, ..., 1) multiplier column per leaf
    — one elementwise multiply instead of N param groups.  Multiply into
    the (already lr-scaled) updates: u *= scale.
    """
    assert layer_decay == 1.0 or 0.0 < layer_decay < 1.0
    num_layers = enc_depth + dec_depth

    def scale(layer_id: int) -> float:
        return layer_decay ** (num_layers + 1 - layer_id)

    def const(sub, layer_id: int):
        return jax.tree.map(lambda x: jnp.full((), scale(layer_id),
                                               jnp.float32), sub)

    def stacked(sub, depth: int, first_id: int):
        col = jnp.asarray([scale(first_id + i) for i in range(depth)],
                          jnp.float32)

        def per_leaf(x):
            assert x.shape[0] == depth, (x.shape, depth)
            return col.reshape((depth,) + (1,) * (x.ndim - 1))

        return jax.tree.map(per_leaf, sub)

    out = {}
    for key, sub in params.items():
        if key in ("patch_embed", "pos_embed", "cls_token", "mask_token",
                   "global_tokens"):
            out[key] = const(sub, 0)
        elif key == "enc_blocks":
            out[key] = stacked(sub, enc_depth, 1)
        elif key in ("decoder_embed", "enc_norm"):
            out[key] = const(sub, enc_depth)
        elif key == "dec_blocks":
            out[key] = stacked(sub, dec_depth, enc_depth + 1)
        elif key == "dec_norm":
            out[key] = const(sub, num_layers)
        elif key == "prediction_head" or key.startswith("head"):
            out[key] = const(sub, num_layers + 1)
        else:  # the reference raises too (misc.py:402)
            raise NotImplementedError(f"layer-decay id for {key!r}")
    return out


def _global_norm_f32(grads) -> jax.Array:
    """Global L2 norm with fp32 accumulation regardless of leaf dtype.

    optax.global_norm reduces in the leaf dtype — fine for fp32 grads,
    but under SPANN3R_GRADS_BF16 the grads arrive in bf16 and a bf16
    sum-of-squares over ~700M coordinates is too coarse for the clip
    threshold.  The upcast fuses into the reduce (no extra pass)."""
    return jnp.sqrt(sum(
        jnp.sum(jnp.square(g.astype(jnp.float32)))
        for g in jax.tree.leaves(grads)))


def work_params(params, prec: Precision):
    """bf16 working copy of the fp32 master params for forward/backward
    (SPANN3R_GRADS_BF16=1).

    Differentiating w.r.t. this copy makes every gradient flow in bf16:
    the scan-transpose traffic that dominates the train-step residue —
    dynamic-update-slice writes into the stacked per-block grad buffers
    and the shared-weight accumulation adds across the T-frame scan,
    ~30 ms/step of fp32 HBM traffic at B=4 T=5 @224 (PERF.md r5 trace) —
    is halved, as are the param reads of the forward + remat recompute +
    backward.  The fp32 master is only touched by the optimizer, whose
    per-coordinate math stays fp32 (make_optimizer upcasts in registers).

    Head params stay fp32: the heads compute in prec.head_dtype (fp32 by
    contract, config.BF16), so rounding their weights would quantize the
    one subgraph the precision policy deliberately keeps exact.

    The reference has no analogue (torch autocast keeps fp32 grads,
    croco/utils/misc.py NativeScaler); this is a documented TPU-native
    deviation — the train() default for bf16 training (SPANN3R_GRADS_BF16=0
    opts out; library fns default OFF unless the env var is set),
    convergence-gated incl. a kill/auto-resume boundary
    (tests/data/convergence_gate_r5_deep.json)."""
    if prec.compute_dtype != jnp.bfloat16:
        return params

    def cast_tree(t):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, t)

    out = {k: cast_tree(v) for k, v in params.items() if k != "dust3r"}
    out["dust3r"] = {k: (v if k in ("head1", "head2") else cast_tree(v))
                     for k, v in params["dust3r"].items()}
    return out


def _grads_bf16_default() -> bool:
    # read once at step-BUILD time (not trace time): callers set the env
    # var before make_train_step, same contract as SPANN3R_REMAT_POLICY
    return os.environ.get("SPANN3R_GRADS_BF16", "0") == "1"


def make_optimizer(weight_decay: float,
                   moment_dtype=None) -> optax.GradientTransformation:
    """AdamW(0.9, 0.95) + global-norm clip 1.0; LR injected per step.

    Single fused per-leaf pass (clip scale -> moment update -> bias-corrected
    Adam direction -> weight decay) instead of an optax.chain of four
    transforms: the chain is mathematically identical but materializes the
    intermediate update pytree between stages; one tree pass hands XLA the
    whole elementwise chain to fuse, so each leaf is read once and the Adam
    state written once (the update is HBM-bandwidth-bound: ~19 GB of moment
    + param traffic per step at ViT-L scale).  Numerics bit-match the optax
    chain (tests/test_training.py::test_fused_optimizer_matches_optax).

    moment_dtype=jnp.bfloat16 (the train() default for bf16 training since
    r5, SPANN3R_ADAM_BF16=0 opts out) stores Adam mu/nu in bf16 — compute
    stays fp32 — halving moment traffic and residency.  A documented
    deviation: the reference's torch.AdamW keeps fp32 state
    (croco/utils/misc.py uses the default AdamW); convergence-gated
    through the full recipe (tests/data/convergence_gate_r5_deep.json).

    Non-finite safety gate: when the global grad norm is inf/nan the whole
    update is suppressed ON DEVICE — params, moments and the bias-correction
    count are left exactly as they were (the step never happened).  The
    reference gets the equivalent guarantee by syncing the loss to the host
    EVERY iteration and sys.exit-ing before the next optimizer step
    (spann3r/training.py:222-224) — a per-step device->host sync that
    serializes dispatch (measured ~38 ms/step here, PERF.md "pipelined").
    With the on-device gate the host can check finiteness one step late,
    keeping the dispatch queue full, and a poisoned update still can never
    reach the weights.  Costs one fused select per leaf (bandwidth-free)."""
    b1, b2, eps, max_norm = 0.9, 0.95, 1e-8, 1.0

    def init_fn(params):
        zeros = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=moment_dtype or p.dtype), params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=zeros,
            nu=jax.tree.map(jnp.copy, zeros))

    def update_fn(grads, state, params):
        gnorm = _global_norm_f32(grads)
        finite = jnp.isfinite(gnorm)
        # optax.clip_by_global_norm semantics: scale only when gnorm >= max
        scale = jnp.where(gnorm < max_norm, 1.0, max_norm / gnorm)
        count = state.count + finite.astype(state.count.dtype)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        mask = decay_mask(params)

        def leaf(g, m, v, p, decayed):
            g = g * scale
            gf = g.astype(jnp.float32)
            mf, vf = m.astype(jnp.float32), v.astype(jnp.float32)
            m2 = b1 * mf + (1.0 - b1) * gf
            v2 = b2 * vf + (1.0 - b2) * jnp.square(gf)
            u = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
            if decayed:
                u = u + weight_decay * p.astype(jnp.float32)
            # non-finite gate: zero update, moments unchanged (see docstring)
            u = jnp.where(finite, u, 0.0)
            m2 = jnp.where(finite, m2, mf)
            v2 = jnp.where(finite, v2, vf)
            # updates in the PARAM dtype: under SPANN3R_GRADS_BF16 the
            # grads are bf16 but the update must not round before it hits
            # the fp32 master params
            return (u.astype(p.dtype), m2.astype(m.dtype), v2.astype(v.dtype))

        out = jax.tree.map(leaf, grads, state.mu, state.nu, params, mask)
        updates = jax.tree.map(lambda o: o[0], out,
                               is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree.map(lambda o: o[1], out,
                          is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree.map(lambda o: o[2], out,
                          is_leaf=lambda x: isinstance(x, tuple))
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_train_step(cfg: Spann3RConfig, prec: Precision, opt, remat: bool = True,
                    fix_first: bool = False, param_shardings=None,
                    remat_scan: Optional[bool] = None,
                    grads_bf16: Optional[bool] = None):
    """Returns jitted train_step(params, opt_state, batch, rng, lr, alpha).

    `param_shardings` (a pytree of NamedSharding matching params) pins the
    updated params back onto the ('data','model') mesh layout so tensor-
    parallel weight shards stay put across steps (the reference's scaling
    analogue is DDP, spann3r/training.py:322-325; tp is TPU-native extra).

    `grads_bf16` (default: SPANN3R_GRADS_BF16 env, read at build time)
    differentiates w.r.t. a bf16 working copy of the params — see
    work_params for the precision contract and the traffic it saves."""
    if grads_bf16 is None:
        grads_bf16 = _grads_bf16_default()

    def loss_fn(wp, batch, rng, alpha):
        frames = jnp.transpose(batch["img"], (1, 0, 2, 3, 4))  # (B,T,H,W,3)
        preds = sp.forward_train(wp, frames, cfg, prec, rng=rng,
                                 remat=remat, remat_scan=remat_scan)
        gts = {"pts3d": batch["pts3d"],
               "valid_mask": batch["valid_mask"],
               "camera_pose": batch["camera_pose"]}
        loss, details, factor_loss = losses.conf_loss_t(
            gts, preds, alpha=alpha, norm_mode=True, fix_first=fix_first)
        total = loss + factor_loss  # (ref training.py:217-218)
        return total, details

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng, lr, alpha):
        wp = work_params(params, prec) if grads_bf16 else params
        (loss, details), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            wp, batch, rng, alpha)
        gnorm = _global_norm_f32(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)  # lr injection
        params = optax.apply_updates(params, updates)
        if param_shardings is not None:
            params = jax.lax.with_sharding_constraint(params, param_shardings)
        metrics = dict(details, loss=loss, grad_norm=gnorm)
        return params, opt_state, metrics

    return train_step


def make_accum_train_step(cfg: Spann3RConfig, prec: Precision, opt,
                          accum_iter: int, remat: bool = True,
                          fix_first: bool = False, param_shardings=None,
                          remat_scan: Optional[bool] = None,
                          grads_bf16: Optional[bool] = None):
    """Gradient-accumulation variant (ref training.py:226-231 accum_iter):
    grad_step accumulates scaled grads; apply_step runs the optimizer."""
    if grads_bf16 is None:
        grads_bf16 = _grads_bf16_default()
    base = make_train_step(cfg, prec, opt, remat, fix_first, param_shardings,
                           remat_scan, grads_bf16=grads_bf16)
    if accum_iter <= 1:
        return base, None, None

    def loss_fn(wp, batch, rng, alpha):
        frames = jnp.transpose(batch["img"], (1, 0, 2, 3, 4))
        preds = sp.forward_train(wp, frames, cfg, prec, rng=rng,
                                 remat=remat, remat_scan=remat_scan)
        gts = {k: batch[k] for k in ("pts3d", "valid_mask", "camera_pose")}
        loss, details, factor_loss = losses.conf_loss_t(
            gts, preds, alpha=alpha, norm_mode=True, fix_first=fix_first)
        return loss + factor_loss, details

    @functools.partial(jax.jit, donate_argnums=(1,))
    def grad_step(params, grad_acc, batch, rng, alpha):
        # under grads_bf16 the per-microbatch grads flow in bf16 but the
        # ACCUMULATOR stays fp32 (grad_acc is zeros_like(params), fp32):
        # summing accum_iter microbatches in bf16 would compound rounding
        wp = work_params(params, prec) if grads_bf16 else params
        (loss, details), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            wp, batch, rng, alpha)
        # non-finite micro-batches contribute nothing to the accumulator
        # (same on-device no-poison guarantee as make_optimizer's gate)
        ok = jnp.isfinite(_global_norm_f32(grads))
        grad_acc = jax.tree.map(
            lambda a, g: a + jnp.where(ok, g.astype(a.dtype), 0.0)
            / accum_iter,
            grad_acc, grads)
        return grad_acc, dict(details, loss=loss)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def apply_step(params, opt_state, grad_acc, lr):
        gnorm = _global_norm_f32(grad_acc)
        updates, opt_state = opt.update(grad_acc, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        if param_shardings is not None:
            params = jax.lax.with_sharding_constraint(params, param_shardings)
        zeros = jax.tree.map(jnp.zeros_like, updates)
        return params, opt_state, zeros, gnorm

    return None, grad_step, apply_step


def make_eval_step(cfg: Spann3RConfig, prec: Precision, alpha: float = 0.4):
    @jax.jit
    def eval_step(params, batch):
        frames = jnp.transpose(batch["img"], (1, 0, 2, 3, 4))
        preds = sp.forward_train(params, frames, cfg, prec, rng=None,
                                 remat=False)
        gts = {"pts3d": batch["pts3d"],
               "valid_mask": batch["valid_mask"],
               "camera_pose": batch["camera_pose"]}
        loss, details, _ = losses.conf_loss_t(gts, preds, alpha=alpha,
                                              norm_mode=True)
        # preds returned for eval-time PLY dumps; device->host transfer only
        # happens if the caller actually materializes them
        return loss, details, preds

    return eval_step


# ---------------------------------------------------------------------------
# checkpointing (orbax)
# ---------------------------------------------------------------------------

class CheckpointManager:
    """last/best/periodic checkpoints + auto-resume (ref training.py:377-405,
    croco misc.save_model/load_model)."""

    def __init__(self, output_dir: str):
        import orbax.checkpoint as ocp
        self.dir = os.path.abspath(os.path.join(output_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.dir, f"checkpoint-{name}")

    def save(self, name: str, params, opt_state, epoch: int, best: float):
        import orbax.checkpoint as ocp
        state = {"params": params, "opt_state": opt_state,
                 "epoch": np.array(epoch, np.int32), "best": np.array(best, np.float32)}
        path = self._path(name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, name: str, template) -> Optional[Dict[str, Any]]:
        path = self._path(name)
        if not os.path.exists(path):
            return None
        return self._ckptr.restore(path, template)

    def has(self, name: str) -> bool:
        return os.path.exists(self._path(name))


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def train(args, model_cfg: Optional[Spann3RConfig] = None) -> Dict[str, Any]:
    """Run the full training recipe.  `model_cfg` overrides the model
    architecture (the CLI always trains the production ViT-L config built
    from --resolution/--head_type); the synthetic convergence gate and
    tests inject tiny configs through it."""
    pmesh.init_distributed()
    rank = jax.process_index()
    world = jax.process_count()
    os.makedirs(args.output_dir, exist_ok=True)

    prec = BF16 if args.bf16 else Precision(compute_dtype=jnp.float32)
    from .config import DUSt3RConfig
    cfg = model_cfg if model_cfg is not None else Spann3RConfig(
        dust3r=DUSt3RConfig(
            img_size=(args.resolution, args.resolution),
            head_type=args.head_type))

    mesh = pmesh.make_mesh_for_batch(args.batch_size, model=args.model_axis)
    print(f"mesh: {mesh}; process {rank}/{world}")

    # datasets
    train_ds = build_dataset(args.train_dataset)
    test_dss = {}
    if args.test_dataset:
        for expr in args.test_dataset.split("+"):
            test_dss[expr.strip().split("(")[0]] = build_dataset(expr)

    sampler = make_sampler(train_ds, args.batch_size, world_size=world, rank=rank)
    loader = DataLoader(train_ds, args.batch_size, sampler=sampler,
                        num_workers=args.num_workers)

    # model init / warm start
    key = jax.random.PRNGKey(args.seed)
    params = sp.init_spann3r(key, cfg)
    if args.dust3r_ckpt:
        from .utils.torch_ckpt import load_dust3r_checkpoint
        params["dust3r"] = load_dust3r_checkpoint(args.dust3r_ckpt, cfg.dust3r)
        # the pointmap patch-embed starts as a copy of the image patch-embed
        # (ref spann3r/model.py:240-242)
        if "pos_patch_embed" in params:
            params["pos_patch_embed"] = jax.tree.map(
                lambda x: x, params["dust3r"]["patch_embed"])
    # bf16 Adam moments + bf16 grads/working-params are the DEFAULT for
    # bf16 training since r5: both are documented deviations (fp32 master
    # params; see make_optimizer and work_params), parity-tested, and
    # convergence-gated together through the full train() recipe incl. a
    # kill/auto-resume boundary (tests/data/convergence_gate_r5_deep.json;
    # 309.6 -> 263.8 ms/step at B=4 T=5 @224, PERF.md r5). Opt out with
    # SPANN3R_ADAM_BF16=0 / SPANN3R_GRADS_BF16=0. fp32 training keeps
    # fp32 state and grads.
    def _flag(name):
        v = os.environ.get(name)
        return bool(args.bf16) if v is None else v == "1"
    adam_bf16 = _flag("SPANN3R_ADAM_BF16")
    grads_bf16 = _flag("SPANN3R_GRADS_BF16")
    opt = make_optimizer(args.weight_decay,
                         moment_dtype=jnp.bfloat16 if adam_bf16 else None)

    if args.pretrained:
        if args.pretrained.endswith(".pth"):
            from .utils.torch_ckpt import load_spann3r_checkpoint
            params = load_spann3r_checkpoint(args.pretrained, cfg)
        elif os.path.isdir(args.pretrained):
            # warm start = params only; the optimizer restarts fresh
            # (ref croco misc.load_model: model.load_state_dict, then a new
            # optimizer unless --resume)
            import orbax.checkpoint as ocp
            # abstract template: avoid materializing a throwaway Adam state
            # (2x params of fp32) just to describe the restore structure
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                {"params": params,
                 "opt_state": jax.eval_shape(opt.init, params),
                 "epoch": np.array(0, np.int32),
                 "best": np.array(np.inf, np.float32)})
            restored = ocp.StandardCheckpointer().restore(
                os.path.abspath(args.pretrained), abstract)
            params = restored["params"]
            print(f"warm-started params from orbax {args.pretrained}")
        else:
            raise FileNotFoundError(
                f"--pretrained {args.pretrained}: expected a .pth file or an "
                f"orbax checkpoint directory")

    # tensor-parallel layout: shard the big weights over 'model', replicate
    # the rest; opt.init on sharded params inherits the same layout
    param_shardings = pmesh.param_sharding(mesh, params,
                                           min_dim=args.tp_min_dim,
                                           fsdp=bool(args.fsdp))
    params = jax.tree.map(jax.device_put, params, param_shardings)
    if args.model_axis > 1 or args.fsdp:
        from jax.sharding import PartitionSpec
        n_sharded = sum(jax.tree.leaves(jax.tree.map(
            lambda sh: sh.spec != PartitionSpec(), param_shardings)))
        print(f"sharded params: {n_sharded} weight tensors "
              f"(model axis {args.model_axis}, fsdp={bool(args.fsdp)})")
    opt_state = opt.init(params)

    ckpt = CheckpointManager(args.output_dir)
    start_epoch, best_so_far = 0, float("inf")
    restored = ckpt.restore("last", {"params": params, "opt_state": opt_state,
                                     "epoch": np.array(0, np.int32),
                                     "best": np.array(np.inf, np.float32)})
    if restored is not None:
        params = jax.tree.map(jax.device_put, restored["params"],
                              param_shardings)
        opt_state = restored["opt_state"]
        start_epoch = int(restored["epoch"]) + 1
        best_so_far = float(restored["best"])
        print(f"auto-resumed from epoch {start_epoch}")

    eff_batch = args.batch_size * args.accum_iter * world
    if args.lr is None:
        args.lr = args.blr * eff_batch / 256

    train_step, grad_step, apply_step = make_accum_train_step(
        cfg, prec, opt, args.accum_iter, remat=bool(args.remat),
        param_shardings=param_shardings,
        remat_scan=bool(args.remat_scan) or None,
        grads_bf16=grads_bf16)
    eval_step = make_eval_step(cfg, prec)
    grad_acc = (jax.tree.map(jnp.zeros_like, params)
                if args.accum_iter > 1 else None)

    if rank == 0:
        snapshot_sources(args.output_dir)

    writer = None
    if rank == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(log_dir=args.output_dir)
        except ImportError:
            pass

    log_path = os.path.join(args.output_dir, "log.txt")
    rng = jax.random.PRNGKey(args.seed + rank)

    steps_per_epoch = max(len(loader), 1)
    t0 = time.time()
    last_loss = float("nan")
    # Streak of consecutive on-device-suppressed updates (non-finite grads
    # while the loss stays finite, e.g. bf16 backward overflow). The lagged
    # loss check alone would never fire then — training would freeze
    # silently, every update a no-op — so abort after a bounded streak.
    suppressed_streak = {"n": 0}
    for epoch in range(start_epoch, args.epochs + 1):
        # ---- eval + checkpointing cadence (ref training.py:377-405) ----
        test_stats = {}
        if epoch > 0 and args.eval_freq > 0 and epoch % args.eval_freq == 0:
            for name, tds in test_dss.items():
                test_stats[name] = test_one_epoch(
                    eval_step, params, tds, args.batch_size_test,
                    output_dir=args.output_dir, epoch=epoch)
                med = test_stats[name].get("loss_med", float("inf"))
                if med < best_so_far:
                    best_so_far = med
                    # checkpoint saves are COLLECTIVE: orbax barriers across
                    # processes, so every rank must enter (a rank-0-only
                    # save deadlocks at world>1 — tests/test_multiprocess.py;
                    # orbax writes each shard from the process that owns it)
                    ckpt.save("best", params, opt_state, epoch - 1,
                              best_so_far)
        if epoch > start_epoch:
            if args.save_freq and (epoch % args.save_freq == 0
                                   or epoch == args.epochs):
                ckpt.save("last", params, opt_state, epoch - 1, best_so_far)
            if args.keep_freq and epoch % args.keep_freq == 0:
                ckpt.save(str(epoch), params, opt_state, epoch - 1, best_so_far)

        if rank == 0:
            stats = {f"test_{k}_{k2}": float(v2) for k, v in test_stats.items()
                     for k2, v2 in v.items()}
            with open(log_path, "a") as f:
                f.write(json.dumps(dict(epoch=epoch, **stats)) + "\n")

        if epoch >= args.epochs:
            break

        # ---- curriculum ----
        alpha = alpha_at(epoch, args.epochs, args.train_criterion_alpha,
                         bool(args.alpha_c2f))
        active_ratio = active_ratio_at(epoch, args.epochs)
        train_ds.set_epoch(epoch)
        train_ds.set_ratio(active_ratio)
        sampler.set_epoch(epoch)

        # ---- one epoch ----
        from .utils.metrics import MetricLogger
        logger = MetricLogger()
        if args.profile_dir and epoch == start_epoch:
            jax.profiler.start_trace(args.profile_dir)

        # Lagged finiteness check: the reference fetches the loss to the host
        # EVERY iteration and aborts immediately (ref training.py:222-224).
        # A per-step fetch blocks until the step completes, so the dispatch
        # queue drains and the device idles one host round-trip per step
        # (~38 ms here — PERF.md "pipelined", measured).  Instead the
        # optimizer suppresses non-finite updates ON DEVICE (make_optimizer),
        # and the host checks the PREVIOUS step's loss after enqueueing the
        # current one: params can never be poisoned, the abort fires at most
        # one iteration late, and steps dispatch back-to-back.
        pending = None  # (iteration, loss, grad_norm) of the prior step

        def check_pending(p):
            it_prev, dev_loss, dev_gnorm = p
            loss_f = float(dev_loss)
            if not math.isfinite(loss_f):
                raise RuntimeError(
                    f"non-finite loss {loss_f} at epoch {epoch} it {it_prev} "
                    "(update suppressed on device; detected one step late — "
                    "one additional finite step may have applied after it)")
            # finite loss but non-finite grads: the gate suppressed the
            # update; a persistent streak means training is silently frozen
            if not math.isfinite(float(dev_gnorm)):
                suppressed_streak["n"] += 1
                if suppressed_streak["n"] >= MAX_SUPPRESSED_STEPS:
                    raise RuntimeError(
                        f"{suppressed_streak['n']} consecutive non-finite-"
                        f"gradient steps (loss finite, last {loss_f}) up to "
                        f"epoch {epoch} it {it_prev}: every update was "
                        "suppressed by the on-device gate; aborting instead "
                        "of training in place")
            else:
                suppressed_streak["n"] = 0
            return loss_f

        for it, batch in enumerate(loader):
            epoch_f = epoch + it / steps_per_epoch
            lr = lr_at(epoch_f, args.lr, args.min_lr, args.warmup_epochs,
                       args.epochs)
            rng, step_rng = jax.random.split(rng)
            sharded = pmesh.shard_batch(mesh, batch)
            if args.accum_iter > 1:
                grad_acc, metrics = grad_step(params, grad_acc, sharded,
                                              step_rng, jnp.float32(alpha))
                metrics = dict(metrics, grad_norm=0.0)
                if (it + 1) % args.accum_iter == 0:
                    params, opt_state, grad_acc, gnorm = apply_step(
                        params, opt_state, grad_acc, jnp.float32(lr))
                    metrics["grad_norm"] = gnorm
            else:
                params, opt_state, metrics = train_step(
                    params, opt_state, sharded, step_rng,
                    jnp.float32(lr), jnp.float32(alpha))

            # check step N-1's loss AFTER enqueueing step N (see above)
            if pending is not None:
                last_loss = check_pending(pending)
            pending = (it, metrics["loss"], metrics["grad_norm"])

            if it % args.print_freq == 0:
                m = {k: float(v) for k, v in metrics.items()}
                logger.update(loss=m["loss"], grad_norm=m["grad_norm"], lr=lr)
                print(f"E{epoch} it{it}/{steps_per_epoch} "
                      f"loss={m['loss']:.4f} lr={lr:.2e} "
                      f"gnorm={m['grad_norm']:.2f} ar={active_ratio:.2f} "
                      f"alpha={alpha:.2f}")
                if writer is not None:
                    step1000 = int(epoch_f * 1000)
                    writer.add_scalar("train_loss", m["loss"], step1000)
                    writer.add_scalar("train_lr", lr, step1000)
                    writer.add_scalar("active_ratio", active_ratio, step1000)

        # flush the last step's lagged finiteness check before epoch wrap-up
        if pending is not None:
            last_loss = check_pending(pending)

        # cross-host metric sync + epoch summary (ref misc.py:119-121,
        # training.py:257-259 "Averaged stats")
        if args.profile_dir and epoch == start_epoch:
            jax.profiler.stop_trace()
        logger.synchronize_between_processes()
        print(f"E{epoch} averaged stats: {logger}")
        if rank == 0 and logger.meters["loss"].count > 0:
            # per-epoch train summary in log.txt (ref croco/utils/misc.py
            # log_stats: {'train_loss', 'train_lr', 'epoch'} JSONL); alpha /
            # active_ratio recorded so schedule transitions are visible in
            # the curve (convergence-gate continuity checks read these)
            with open(log_path, "a") as f:
                f.write(json.dumps({
                    "epoch": epoch,
                    "train_loss": logger.meters["loss"].global_avg,
                    "train_lr": logger.meters["lr"].global_avg,
                    "alpha": alpha, "active_ratio": active_ratio}) + "\n")

    print(f"Training done in {time.time() - t0:.0f}s")
    # final state returned for callers/tests; the CLI ignores it
    return {"params": params, "opt_state": opt_state,
            "param_shardings": param_shardings, "best": best_so_far,
            "last_loss": last_loss}


def snapshot_sources(output_dir: str) -> None:
    """Copy the package + entry scripts into output/recording/ so every run
    records the exact code it trained with (ref spann3r/training.py:360-371,
    which snapshots croco/dust3r/spann3r sources + the launch script)."""
    import shutil
    rec = os.path.join(output_dir, "recording")
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(pkg_root)
    dst_pkg = os.path.join(rec, "spann3r_tpu")
    if os.path.exists(dst_pkg):
        shutil.rmtree(dst_pkg)
    shutil.copytree(pkg_root, dst_pkg,
                    ignore=shutil.ignore_patterns("__pycache__", "*.so",
                                                  "*.pyc", "build"))
    for script in ("train.py", "demo.py", "eval.py", "app.py", "bench.py"):
        src = os.path.join(repo_root, script)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(rec, script))


def _dump_eval_plys(out_dir: str, epoch: int, batch, preds, start_idx: int,
                    max_ply: int) -> int:
    """Write per-sequence predicted pointmaps as colored PLYs for eyeballing
    (ref spann3r/training.py:126-149 dumps the first ~100 eval recons).
    Returns how many were written."""
    from .utils.export import write_ply
    # target-frame predictions cover frames 1..T-1 in frame-0 coords
    pts = np.asarray(preds["pts3d_2"], np.float32)   # (T-1,B,H,W,3)
    conf = np.asarray(preds["conf_2"], np.float32)   # (T-1,B,H,W)
    imgs = np.asarray(batch["img"], np.float32)[1:]  # (T-1,B,H,W,3) in [-1,1]
    b = pts.shape[1]
    written = 0
    for j in range(b):
        idx = start_idx + j
        if idx >= max_ply:
            break
        keep = (conf[:, j] > 1.001).reshape(-1)
        p = pts[:, j].reshape(-1, 3)[keep]
        c = (imgs[:, j].reshape(-1, 3)[keep] + 1.0) / 2.0
        write_ply(os.path.join(out_dir, f"epoch{epoch:03d}_{idx:03d}.ply"),
                  p, c)
        written += 1
    return written


def _eval_rank_indices(n: int, world: int, rank: int) -> list:
    """Strided deterministic partition of the eval set: rank r evaluates
    items r, r+world, r+2*world, ...  The union over ranks is exactly
    range(n) with no overlap, so merged stats equal the unsharded run."""
    return list(range(rank, n, world))


def _merge_eval_stats(losses_all, detail_sums, world: int,
                      gather_fn=None) -> Dict[str, float]:
    """Cross-host merge of per-rank eval results into global stats.

    losses_all: this rank's per-batch losses; detail_sums: this rank's
    summed per-detail values.  gather_fn(np_array) -> (world, ...) stacked
    array (defaults to multihost process_allgather); injectable so the
    merge is testable on a single process."""
    if world > 1:
        if gather_fn is None:
            from jax.experimental.multihost_utils import process_allgather
            gather_fn = process_allgather
        # ragged per-rank batch counts: NaN-pad losses to a common width
        # agreed via a gathered count
        counts = np.asarray(gather_fn(np.asarray([len(losses_all)],
                                                 np.int32))).ravel()
        width = int(counts.max()) if counts.size else 0
        pad = np.full(max(1, width), np.nan, np.float32)
        pad[:len(losses_all)] = losses_all
        gathered = np.asarray(gather_fn(pad)).ravel()
        losses_all = gathered[np.isfinite(gathered)].tolist()
        # Detail merge must be UNCONDITIONAL: a rank whose eval shard is
        # empty (n < world) has detail_sums == {} — gating the gathers on a
        # rank-local `if names` would leave that rank out of a collective
        # its peers enter, deadlocking eval.  Width and names are agreed
        # via gathers; empty ranks contribute zeros.  Non-empty ranks all
        # share the same key set (fixed by the loss fn), so sorted order
        # aligns columns.
        names = sorted(detail_sums)
        n_names = np.asarray(gather_fn(np.asarray([len(names)],
                                                  np.int32))).ravel()
        nw = int(n_names.max()) if n_names.size else 0
        enc = np.zeros((max(1, nw), 48), np.uint8)
        for i, k in enumerate(names):
            kb = k.encode()[:48]
            enc[i, :len(kb)] = np.frombuffer(kb, np.uint8)
        enc_all = np.asarray(gather_fn(enc)).reshape(world, max(1, nw), 48)
        vals = np.zeros(max(1, nw), np.float32)
        for i, k in enumerate(names):
            vals[i] = detail_sums[k]
        summed = np.asarray(gather_fn(vals)).reshape(world, -1).sum(0)
        if nw:
            src = int(np.argmax(n_names))  # a rank with the full key set
            names_g = [bytes(row[row != 0]).decode()
                       for row in enc_all[src, :int(n_names[src])]]
            detail_sums = dict(zip(names_g, summed[:len(names_g)].tolist()))
    if not losses_all:
        return {}
    stats = {"loss_avg": float(np.mean(losses_all)),
             "loss_med": float(np.median(losses_all))}
    n = max(len(losses_all), 1)
    stats.update({k: v / n for k, v in detail_sums.items()})
    return stats


def test_one_epoch(eval_step, params, dataset, batch_size: int,
                   output_dir: Optional[str] = None, epoch: int = 0,
                   max_ply: int = 10, gather_fn=None) -> Dict[str, float]:
    """Seeded held-out eval tracking mean + median loss plus per-detail loss
    meters, all-reduced across hosts; optionally dumps the first `max_ply`
    reconstructions as PLYs (ref training.py:94-168, misc.py:45-56).

    The eval set is rank-sharded (strided partition): each host walks only
    its slice and the per-batch losses / detail sums are allgathered, so
    the merged stats equal the single-host run while the wall time divides
    by the host count."""
    if hasattr(dataset, "set_epoch"):
        # epoch-resized ("N @ ds") eval sets resample per epoch; eval
        # datasets carry a fixed seed so the selection stays deterministic
        # (ref training.py:107-110)
        dataset.set_epoch(epoch)
    world = jax.process_count()
    rank = jax.process_index()
    sampler = _eval_rank_indices(len(dataset), world, rank)
    loader = DataLoader(dataset, batch_size, sampler=sampler, num_workers=1)
    losses_all = []
    detail_sums: Dict[str, float] = {}
    ply_dir = None
    if output_dir is not None and rank == 0 and max_ply > 0:
        ply_dir = os.path.join(output_dir, "eval_ply")
        os.makedirs(ply_dir, exist_ok=True)
    n_ply = 0
    for batch in loader:
        loss, details, preds = eval_step(params, batch)
        losses_all.append(float(loss))
        for k, v in details.items():
            detail_sums[k] = detail_sums.get(k, 0.0) + float(v)
        if ply_dir is not None and n_ply < max_ply:
            n_ply += _dump_eval_plys(ply_dir, epoch, batch, preds, n_ply,
                                     max_ply)
    return _merge_eval_stats(losses_all, detail_sums, world, gather_fn)
