"""Training and validation loops for stereo/flow finetuning.

Reference: croco/stereoflow/engine.py (train_one_epoch,
validate_one_epoch) and stereoflow/train.py's model/optimizer assembly.
TPU-native: one donated jit step fusing forward+backward+AdamW with the
per-iteration cosine LR injected as a scalar; batch metrics computed
on-device inside the same program; validation drives the chunk-batched
tiled_pred.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import BF16, DUSt3RConfig, Precision
from ..models.croco_downstream import (cfg_from_croco_kwargs,
                                       downstream_binocular)
from ..models.croco_pretrain import init_croco
from ..training import decay_mask, lr_at
from ..utils.metrics import MetricLogger, SmoothedValue
from .criterion import flow_metrics, stereo_metrics
from .head import init_pixelwise_dpt, pixelwise_dpt_apply
from .tiling import tiled_pred


def cfg_from_croco_args(kw: Dict, crop_hw: Tuple[int, int]) -> DUSt3RConfig:
    """CroCoNet ckpt kwargs -> DUSt3RConfig with img_size forced to the
    training crop (ref stereoflow/train.py:109-112).  The kwargs->config
    mapping itself lives in models.croco_downstream.cfg_from_croco_kwargs
    (shared with pretraining.parse_croco_model).

    NOTE: the reference interpolates stored cosine pos embeds to the new
    crop (train.py:122 interpolate_pos_embed); here sincos embeds are
    computed per grid size on the fly, so no interpolation step exists."""
    kw = dict(kw)
    kw.pop("img_size", None)
    kw.pop("mask_ratio", None)
    return cfg_from_croco_kwargs(kw, tuple(crop_hw))


def init_stereoflow(key, cfg: DUSt3RConfig, num_channels: int):
    """(params, hooks): croco backbone (no pretrain head) + pixelwise DPT
    task head — the model stereoflow/train.py:116-124 assembles."""
    k1, k2 = jax.random.split(key)
    croco = init_croco(k1, cfg)
    croco.pop("mask_token", None)
    croco.pop("prediction_head", None)
    head, hooks = init_pixelwise_dpt(k2, cfg, num_channels)
    return {"croco": croco, "head": head}, hooks


def make_forward(cfg: DUSt3RConfig, hooks: List[int],
                 prec: Precision = BF16):
    """(params, img1, img2) -> (B, H, W, num_channels) raw map."""

    def forward(params, img1, img2):
        def head_fn(states, img_hw):
            return pixelwise_dpt_apply(params["head"], states, img_hw,
                                       hooks, cfg.patch_size)

        return downstream_binocular(params["croco"], img1, img2, cfg,
                                    head_fn, prec=prec)

    return forward


def make_optimizer(weight_decay: float) -> optax.GradientTransformation:
    """AdamW(0.9, 0.95) with wd masked off 1-D params
    (ref stereoflow/train.py:68+140: get_parameter_groups + AdamW)."""
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.95),
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
    )


def split_prediction_conf(out: jax.Array, with_conf: bool):
    """(B,H,W,C[+1]) -> (pred, conf | None) (ref engine.py:18-23)."""
    if not with_conf:
        return out, None
    return out[..., :-1], out[..., -1]


def make_train_step(cfg: DUSt3RConfig, hooks: List[int], criterion, task: str,
                    opt: optax.GradientTransformation,
                    prec: Precision = BF16):
    """Donated jit step: grads + AdamW update + batch metrics in ONE
    program (the reference's amp autocast + loss_scaler + metrics calls,
    engine.py:61-86)."""
    forward = make_forward(cfg, hooks, prec)
    metrics_fn = stereo_metrics if task == "stereo" else flow_metrics

    def loss_fn(params, img1, img2, gt):
        out = forward(params, img1, img2)
        pred, conf = split_prediction_conf(out, criterion.with_conf)
        loss = (criterion(pred, gt, conf) if criterion.with_conf
                else criterion(pred, gt))
        return loss, pred

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, img1, img2, gt, lr):
        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, img1, img2, gt)
        updates, opt_state = opt.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        bm = metrics_fn(jax.lax.stop_gradient(pred), gt)
        return params, opt_state, loss, bm

    return step


def iterate_batches(dataset, batch_size: int, rng: np.random.Generator,
                    drop_last: bool = True):
    """Shuffled minibatches of stacked NHWC arrays (the reference's
    RandomSampler + default collate, train.py:183-189)."""
    order = rng.permutation(len(dataset))
    n_full = len(order) // batch_size
    end = n_full * batch_size if drop_last else len(order)
    for s in range(0, end, batch_size):
        idx = order[s:s + batch_size]
        items = [dataset[int(i)] for i in idx]
        img1 = np.stack([it[0] for it in items])
        img2 = np.stack([it[1] for it in items])
        gt = np.stack([it[2] for it in items])
        yield img1, img2, gt, [it[3] for it in items]


def train_one_epoch(params, opt_state, step_fn, dataset, args, epoch: int,
                    rng: np.random.Generator, log_writer=None,
                    print_freq: int = 20) -> Tuple:
    """ref engine.py:25-103: per-iteration cosine LR, metric logging,
    non-finite loss abort."""
    metric_logger = MetricLogger(delimiter="  ")
    metric_logger.add_meter("lr", SmoothedValue(window_size=1,
                                                fmt="{value:.6f}"))
    header = f"Epoch: [{epoch}]"

    if args.img_per_epoch:
        iter_per_epoch = -(-args.img_per_epoch // args.batch_size)
    else:
        iter_per_epoch = len(dataset) // args.batch_size

    batches = iterate_batches(dataset, args.batch_size, rng)
    for it, (img1, img2, gt, _names) in enumerate(
            metric_logger.log_every(batches, print_freq, header)):
        if it >= iter_per_epoch:
            break
        lr = lr_at(it / iter_per_epoch + epoch, args.lr, args.min_lr,
                   args.warmup_epochs, args.epochs)
        params, opt_state, loss, bm = step_fn(
            params, opt_state, jnp.asarray(img1), jnp.asarray(img2),
            jnp.asarray(gt), jnp.float32(lr))
        loss_value = float(loss)
        if not np.isfinite(loss_value):
            raise FloatingPointError(
                f"Loss is {loss_value}, stopping training")
        metric_logger.update(loss=loss_value, lr=lr)
        metric_logger.update(**{k: float(v) for k, v in bm.items()})
        if log_writer is not None and (
                (it + 1) % args.tboard_log_step == 0
                or it == iter_per_epoch - 1):
            epoch_1000x = int((it / iter_per_epoch + epoch) * 1000)
            log_writer.add_scalar("train/loss", loss_value, epoch_1000x)
            log_writer.add_scalar("lr", lr, epoch_1000x)
            for k, v in bm.items():
                log_writer.add_scalar("train/" + k, float(v), epoch_1000x)

    print("Averaged stats:", metric_logger)
    stats = {k: meter.global_avg for k, meter in metric_logger.meters.items()}
    return params, opt_state, stats


def validate_one_epoch(params, cfg: DUSt3RConfig, hooks: List[int],
                       criterion, task: str, datasets, args, epoch: int,
                       prec: Precision = BF16, log_writer=None
                       ) -> Dict[str, float]:
    """ref engine.py:105-160: tiled prediction per val dataset, Spring gt
    4-phase averaging, loss + batch metrics per sample."""
    forward = jax.jit(make_forward(cfg, hooks, prec))
    metrics_fn = stereo_metrics if task == "stereo" else flow_metrics
    crop = tuple(args.crop)

    results = {}
    dnames = []
    bm_keys = []
    for dataset in datasets:
        dname = str(dataset)
        dnames.append(dname)
        ml = MetricLogger(delimiter="  ")
        for i in range(len(dataset)):
            img1, img2, gt, _name = dataset[i]
            img1, img2 = img1[None], img2[None]
            gt = gt[None]
            if dname.startswith("Spring"):
                assert gt.shape[1] == img1.shape[1] * 2
                gt = (gt[:, 0::2, 0::2] + gt[:, 0::2, 1::2]
                      + gt[:, 1::2, 0::2] + gt[:, 1::2, 1::2]) / 4.0
            pred, tiled_loss, c = tiled_pred(
                lambda a, b: forward(params, jnp.asarray(a), jnp.asarray(b)),
                criterion, img1, img2, gt, conf_mode=args.tile_conf_mode,
                overlap=args.val_overlap, crop=crop,
                with_conf=criterion.with_conf,
                tile_batch=getattr(args, "tile_batch", 8))
            bm = metrics_fn(jnp.asarray(pred), jnp.asarray(gt))
            loss = (criterion(pred, gt, c) if criterion.with_conf
                    else criterion(pred, gt))
            ml.update(loss_tiled=tiled_loss, loss=float(loss))
            ml.update(**{f"{dname}_{k}": float(v) for k, v in bm.items()})
            bm_keys = list(bm.keys())
        results.update({k: meter.global_avg for k, meter in ml.meters.items()})

    if len(dnames) > 1:
        for k in bm_keys:
            results["AVG_" + k] = sum(
                results[f"{d}_{k}"] for d in dnames) / len(dnames)
    if log_writer is not None:
        epoch_1000x = int((1 + epoch) * 1000)
        for k, v in results.items():
            log_writer.add_scalar("val/" + k, v, epoch_1000x)
    print("Averaged stats:", results)
    return results
