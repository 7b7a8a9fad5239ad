"""Masked cross-view completion demo (ref croco/demo.py:10-55).

Loads an image pair, runs CroCoNet masked completion on image 1 with
image 2 as the reference view, and writes a 4-panel visualization PNG
[reference | masked input | reconstruction | input] per batch row —
the same panel order and per-patch mean/var denormalization as the
reference (croco/demo.py:33-48; the prediction is trained with
norm_pix_loss, so RGB is recovered from each patch's own statistics).

Without --ckpt the model runs with random weights (the reconstruction
is noise but the pipeline — masking, gather/scatter decode, unpatchify,
denorm — is exercised end to end), mirroring how demo.py behaves when
the Spann3R checkpoint is absent.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import PIL.Image

from spann3r_tpu.datasets.pairs import IMAGENET_MEAN, IMAGENET_STD
from spann3r_tpu.models import croco_pretrain as cp
from spann3r_tpu.pretraining import make_pretrain_optimizer, parse_croco_model
from spann3r_tpu.training import CheckpointManager


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("CroCo masked-completion demo")
    p.add_argument("--img1", required=True, help="image to mask+reconstruct")
    p.add_argument("--img2", required=True, help="reference view")
    p.add_argument("--model", default="CroCoNet()", type=str,
                   help="CroCoNet(...) model string (pretrain.py --model)")
    p.add_argument("--ckpt", default=None, type=str,
                   help="pretrain.py output dir holding checkpoint-last")
    p.add_argument("--output", default="demo_output.png", type=str)
    p.add_argument("--seed", default=0, type=int)
    return p


def _load_image(path: str, size) -> np.ndarray:
    """ImageNet-normalized (H, W, 3) float32 (ref croco/demo.py:14-20)."""
    img = PIL.Image.open(path).convert("RGB").resize(
        (size[1], size[0]), PIL.Image.Resampling.LANCZOS)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def run_demo(img1: np.ndarray, img2: np.ndarray, model: str = "CroCoNet()",
             ckpt: str | None = None, seed: int = 0) -> np.ndarray:
    """Returns the visualization as (B*H, 4*W, 3) uint8."""
    cfg, mask_ratio = parse_croco_model(model)
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    b, h, w, _ = img1.shape

    params = cp.init_croco(jax.random.PRNGKey(seed), cfg)
    if ckpt is not None:
        opt = make_pretrain_optimizer(0.05)
        restored = CheckpointManager(ckpt).restore(
            "last", {"params": params, "opt_state": opt.init(params),
                     "epoch": np.array(0, np.int32),
                     "best": np.array(np.inf, np.float32)})
        if restored is None:
            raise FileNotFoundError(f"no checkpoint-last under {ckpt}")
        params = restored["params"]
    else:
        print("WARNING: no --ckpt; running with RANDOM weights "
              "(reconstruction will be noise)")

    n_patches = (h // cfg.patch_size) * (w // cfg.patch_size)
    mask = cp.random_mask(jax.random.PRNGKey(seed + 1), b, n_patches,
                          mask_ratio)

    # one jitted program: eager dispatch through a remote TPU tunnel costs
    # a round-trip per op, which dwarfs this model's compute
    @jax.jit
    def fwd(params, img1, img2, mask):
        pred, mask, _ = cp.croco_forward(params, img1, img2, mask, cfg,
                                         mask_ratio)
        # norm-pix denorm from the input's own per-patch stats (demo.py:33-37)
        patches = cp.patchify(img1, cfg.patch_size)
        mean = patches.mean(axis=-1, keepdims=True)
        var = patches.var(axis=-1, keepdims=True)
        return cp.unpatchify(pred * jnp.sqrt(var + 1e-6) + mean,
                             cfg.patch_size, h, w)

    decoded = fwd(params, jnp.asarray(img1), jnp.asarray(img2), mask)

    # per-pixel mask image from the patch mask (demo.py:42-43), on host
    p = cfg.patch_size
    mask_np = np.asarray(mask).reshape(b, h // p, w // p)
    mask_img = np.repeat(np.repeat(mask_np, p, axis=1), p, axis=2)[..., None]

    def to_rgb(x):
        x = np.asarray(x, np.float32) * IMAGENET_STD + IMAGENET_MEAN
        return np.clip(x, 0.0, 1.0)

    input_rgb = to_rgb(img1)
    panels = [to_rgb(img2), (1 - np.asarray(mask_img)) * input_rgb,
              to_rgb(decoded), input_rgb]
    vis = np.concatenate(panels, axis=2)          # (B, H, 4W, 3)
    vis = vis.reshape(b * h, 4 * w, 3)            # rows stacked (demo.py:46-48)
    return (vis * 255).round().astype(np.uint8)


def main(args=None):
    args = get_args_parser().parse_args(args)
    cfg, _ = parse_croco_model(args.model)
    img1 = _load_image(args.img1, cfg.img_size)
    img2 = _load_image(args.img2, cfg.img_size)
    vis = run_demo(img1, img2, args.model, args.ckpt, args.seed)
    out_dir = os.path.dirname(args.output)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    PIL.Image.fromarray(vis).save(args.output)
    print("Visualization saved in " + args.output)


if __name__ == "__main__":
    main()
