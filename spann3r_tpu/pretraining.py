"""CroCo masked cross-view pretraining driver (TPU rebuild of
croco/pretrain.py:37-254).

One jitted train step over the ('data',) mesh: croco_forward (exact-count
masking, static shapes) -> MaskedMSE -> AdamW(0.9, 0.95) with bias/norm
decay masking and the reference's per-iteration warmup+half-cosine LR
(adjust_learning_rate, croco/utils/misc.py:464-479; cosine horizon =
--epochs while training stops at --max_epoch, exactly like the reference).
Gradient all-reduce is emitted by XLA from the batch sharding (the
reference's DDP).  Checkpoints via orbax (last/keep + auto-resume).
"""
from __future__ import annotations

import argparse
import ast
import functools
import json
import math
import os
import sys
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .config import BF16, DUSt3RConfig, Precision
from .datasets.pairs import PairsDataset
from .models import croco_pretrain as cp
from .models.croco_downstream import cfg_from_croco_kwargs
from .parallel import mesh as pmesh
from .training import CheckpointManager, decay_mask, lr_at


def get_args_parser() -> argparse.ArgumentParser:
    """Mirrors ref croco/pretrain.py:37-70."""
    p = argparse.ArgumentParser("CroCo pre-training", add_help=False)
    p.add_argument("--model", default="CroCoNet()", type=str,
                   help="model string, e.g. CroCoNet(enc_embed_dim=1024)")
    p.add_argument("--norm_pix_loss", default=1, type=int, choices=[0, 1])
    p.add_argument("--dataset", default="habitat_release", type=str)
    p.add_argument("--transforms", default="crop224+acolor", type=str)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--epochs", default=800, type=int,
                   help="cosine-schedule horizon")
    p.add_argument("--max_epoch", default=400, type=int,
                   help="stop training at this epoch")
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--layer_decay", default=1.0, type=float,
                   help="per-layer LR decay (croco/utils/misc.py:404-460; "
                        "1.0 = off, the reference pretrain default)")
    p.add_argument("--lr", default=None, type=float)
    p.add_argument("--blr", default=1.5e-4, type=float)
    p.add_argument("--min_lr", default=0.0, type=float)
    p.add_argument("--warmup_epochs", default=40, type=int)
    p.add_argument("--amp", default=1, type=int, choices=[0, 1],
                   help="bf16 compute (AMP analogue)")
    p.add_argument("--num_workers", default=2, type=int)
    p.add_argument("--save_freq", default=1, type=int)
    p.add_argument("--keep_freq", default=20, type=int)
    p.add_argument("--print_freq", default=20, type=int)
    p.add_argument("--output_dir", default="./output/", type=str)
    p.add_argument("--data_dir", default="./data/", type=str)
    return p


def parse_croco_model(model_str: str) -> Tuple[DUSt3RConfig, float]:
    """Safely parse 'CroCoNet(k=v, ...)' into (DUSt3RConfig, mask_ratio) —
    keyword literals only, no eval (the reference eval()s the string,
    croco/pretrain.py:122)."""
    node = ast.parse(model_str, mode="eval").body
    if not (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
            and node.func.id == "CroCoNet" and not node.args):
        raise ValueError(f"expected 'CroCoNet(<kwargs>)', got {model_str!r}")
    kw = {k.arg: ast.literal_eval(k.value) for k in node.keywords}
    img_size = kw.pop("img_size", 224)
    if isinstance(img_size, int):
        img_size = (img_size, img_size)
    mask_ratio = kw.pop("mask_ratio", 0.9)
    cfg = cfg_from_croco_kwargs(kw, img_size)
    return cfg, float(mask_ratio)


def make_pretrain_optimizer(weight_decay: float) -> optax.GradientTransformation:
    """AdamW(0.9, 0.95), no grad clipping (the reference's NativeScaler is
    called without clip_grad, croco/pretrain.py:225-227); LR injected per
    step like training.make_optimizer."""
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.95),
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
    )


def make_pretrain_step(cfg: DUSt3RConfig, mask_ratio: float, prec: Precision,
                       opt, norm_pix_loss: bool = True, lr_scales=None):
    """Jitted step(params, opt_state, img1, img2, rng, lr) -> (..., loss).

    `lr_scales` (optional pytree matching params) applies the reference's
    layer-decay per-group lr scaling (croco/utils/misc.py:404-460) as one
    elementwise multiply — see training.layer_lr_scales."""

    def scaled(updates, lr):
        if lr_scales is None:
            return jax.tree.map(lambda u: -lr * u, updates)
        return jax.tree.map(lambda u, s: -lr * s * u, updates, lr_scales)

    def loss_fn(params, img1, img2, rng):
        b = img1.shape[0]
        n = ((cfg.img_size[0] // cfg.patch_size)
             * (cfg.img_size[1] // cfg.patch_size))
        mask = cp.random_mask(rng, b, n, mask_ratio)
        pred, mask, target = cp.croco_forward(params, img1, img2, mask, cfg,
                                              mask_ratio, prec)
        return cp.masked_mse(pred, mask, target, norm_pix_loss=norm_pix_loss)

    def gated_update(grads, opt_state, params, lr):
        """opt.update with an on-device non-finite gate: if the global grad
        norm is inf/nan the update is zeroed and the optimizer state kept
        unchanged, so a bad step can never poison params/moments even though
        the host checks the loss one step late (the reference instead syncs
        + sys.exits every iteration, ref pretrain.py:220-222; see
        training.make_optimizer for the measured cost of that sync)."""
        finite = jnp.isfinite(optax.global_norm(grads))
        updates, new_state = opt.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: jnp.where(finite, u, 0.0), updates)
        new_state = jax.tree.map(lambda n, o: jnp.where(finite, n, o),
                                 new_state, opt_state)
        return scaled(updates, lr), new_state

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, img1, img2, rng, lr):
        loss, grads = jax.value_and_grad(loss_fn)(params, img1, img2, rng)
        updates, opt_state = gated_update(grads, opt_state, params, lr)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @functools.partial(jax.jit, donate_argnums=(1,))
    def grad_step(params, grad_acc, img1, img2, rng, inv_accum):
        loss, grads = jax.value_and_grad(loss_fn)(params, img1, img2, rng)
        # non-finite micro-batches contribute nothing (see gated_update)
        ok = jnp.isfinite(optax.global_norm(grads))
        grad_acc = jax.tree.map(
            lambda a, g: a + jnp.where(ok, g, 0.0) * inv_accum,
            grad_acc, grads)
        return grad_acc, loss

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def apply_step(params, opt_state, grad_acc, lr):
        updates, opt_state = gated_update(grad_acc, opt_state, params, lr)
        params = optax.apply_updates(params, updates)
        return params, opt_state, jax.tree.map(jnp.zeros_like, grad_acc)

    return step, grad_step, apply_step


class PairLoader:
    """Shuffled, rank-sharded, drop-last batch iterator over a PairsDataset
    (the reference's DistributedSampler + DataLoader glue,
    croco/pretrain.py:133-149)."""

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 world: int = 1, rank: int = 0):
        self.ds = dataset
        self.bs = batch_size
        self.seed = seed
        self.world = world
        self.rank = rank
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.ds) // (self.bs * self.world)

    def __iter__(self):
        order = np.random.default_rng(self.seed + self.epoch).permutation(
            len(self.ds))
        # Truncate every rank's strided shard to exactly len(self) batches:
        # shard sizes differ by 1 when world doesn't divide len(ds), and a
        # rank running one more collective step than its peers deadlocks the
        # global-mesh train step (torch's DistributedSampler pads for the
        # same reason; equal-count truncation keeps drop-last semantics).
        order = order[self.rank::self.world][:len(self) * self.bs]
        for s in range(0, len(order) - self.bs + 1, self.bs):
            items = [self.ds[int(i)] for i in order[s:s + self.bs]]
            yield (np.stack([a for a, _ in items]),
                   np.stack([b for _, b in items]))


def main(args) -> Dict[str, float]:
    pmesh.init_distributed()
    rank, world = jax.process_index(), jax.process_count()
    os.makedirs(args.output_dir, exist_ok=True)

    cfg, mask_ratio = parse_croco_model(args.model)
    prec = BF16 if args.amp else Precision(compute_dtype=jnp.float32)

    dataset = PairsDataset(args.dataset, trfs=args.transforms,
                           data_dir=args.data_dir, seed=args.seed + rank)
    loader = PairLoader(dataset, args.batch_size, seed=args.seed,
                        world=world, rank=rank)

    eff_batch = args.batch_size * args.accum_iter * world
    if args.lr is None:
        args.lr = args.blr * eff_batch / 256

    mesh = pmesh.make_mesh_for_batch(args.batch_size)
    from jax.sharding import NamedSharding, PartitionSpec as P
    batch_sh = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    params = jax.device_put(cp.init_croco(jax.random.PRNGKey(args.seed), cfg),
                            replicated)
    opt = make_pretrain_optimizer(args.weight_decay)
    opt_state = opt.init(params)
    lr_scales = None
    if getattr(args, "layer_decay", 1.0) < 1.0:
        from .training import layer_lr_scales
        lr_scales = layer_lr_scales(params, cfg.enc.depth, cfg.dec.depth,
                                    args.layer_decay)
    step, grad_step, apply_step = make_pretrain_step(
        cfg, mask_ratio, prec, opt, norm_pix_loss=bool(args.norm_pix_loss),
        lr_scales=lr_scales)
    grad_acc = (jax.tree.map(jnp.zeros_like, params)
                if args.accum_iter > 1 else None)

    ckpt = CheckpointManager(args.output_dir)
    start_epoch = 0
    restored = ckpt.restore("last", {"params": params, "opt_state": opt_state,
                                     "epoch": np.array(0, np.int32),
                                     "best": np.array(np.inf, np.float32)})
    if restored is not None:
        params = jax.device_put(restored["params"], replicated)
        opt_state = jax.device_put(restored["opt_state"], replicated)
        start_epoch = int(restored["epoch"]) + 1
        print(f"auto-resumed from epoch {start_epoch}")

    writer = None
    if rank == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(log_dir=args.output_dir)
        except ImportError:
            pass
    log_path = os.path.join(args.output_dir, "log.txt")
    rng = jax.random.PRNGKey(args.seed + rank)

    t0 = time.time()
    steps_per_epoch = max(len(loader), 1)
    # when resuming at/after max_epoch no epoch runs; report the resume point
    last_stats: Dict[str, float] = {"train_loss": float("nan"),
                                    "epoch": start_epoch - 1}
    for epoch in range(start_epoch, args.max_epoch):
        loader.set_epoch(epoch)
        losses = []

        # lagged finiteness check (see training.train): the update is gated
        # on device (make_pretrain_step.gated_update), so the host fetches
        # step N-1's loss after enqueueing step N instead of blocking on
        # every step like the reference (ref pretrain.py:220-222)
        pending = None

        def check_pending(p):
            it_prev, dev_loss = p
            loss_f = float(dev_loss)
            if not math.isfinite(loss_f):
                print(f"Loss is {loss_f} at it {it_prev} (update suppressed "
                      f"on device), stopping training")
                sys.exit(1)
            return loss_f

        for it, (img1, img2) in enumerate(loader):
            epoch_f = epoch + it / steps_per_epoch
            lr = lr_at(epoch_f, args.lr, args.min_lr, args.warmup_epochs,
                       args.epochs)
            rng, step_rng = jax.random.split(rng)
            img1 = jax.device_put(img1, batch_sh)
            img2 = jax.device_put(img2, batch_sh)
            if args.accum_iter > 1:
                grad_acc, loss = grad_step(params, grad_acc, img1, img2,
                                           step_rng,
                                           jnp.float32(1.0 / args.accum_iter))
                if (it + 1) % args.accum_iter == 0:
                    params, opt_state, grad_acc = apply_step(
                        params, opt_state, grad_acc, jnp.float32(lr))
            else:
                params, opt_state, loss = step(params, opt_state, img1, img2,
                                               step_rng, jnp.float32(lr))
            if pending is not None:
                losses.append(check_pending(pending))
            pending = (it, loss)
            if it % args.print_freq == 0:
                loss_f = float(loss)  # periodic sync only
                print(f"E{epoch} it{it}/{steps_per_epoch} "
                      f"loss={loss_f:.4f} lr={lr:.2e}")
                if writer is not None:
                    step1000 = int(epoch_f * 1000)
                    writer.add_scalar("train_loss", loss_f, step1000)
                    writer.add_scalar("lr", lr, step1000)

        # flush the last step's lagged check before epoch wrap-up
        if pending is not None:
            losses.append(check_pending(pending))

        if rank == 0 and args.save_freq and epoch % args.save_freq == 0:
            ckpt.save("last", params, opt_state, epoch, float("inf"))
        if rank == 0 and args.keep_freq and epoch % args.keep_freq == 0 \
                and (epoch > 0 or args.max_epoch == 1):
            ckpt.save(str(epoch), params, opt_state, epoch, float("inf"))

        last_stats = {"train_loss": float(np.mean(losses)) if losses
                      else float("nan"), "epoch": epoch}
        if rank == 0:
            with open(log_path, "a") as f:
                f.write(json.dumps(last_stats) + "\n")

    print(f"Training time {time.time() - t0:.0f}s")
    return {"params": params, "opt_state": opt_state, **last_stats}
