"""Torch .pth checkpoint ingestion -> JAX param pytrees.

Loads the published DUSt3R / Spann3R state_dicts (ref naming from
dust3r/model.py, spann3r/model.py, croco/models/*) and re-lays them out for
this framework:
  - nn.Linear (out,in) -> {'w': (in,out), 'b': (out,)}
  - LayerNorm  -> {'scale', 'bias'}
  - Conv2d OIHW -> HWIO
  - ConvTranspose2d (in,out,kh,kw) -> HWIO with spatial flip (we call
    lax.conv_transpose with transpose_kernel=False, which does not flip)
  - per-depth block params stacked along a leading axis for lax.scan
Handles the reference's dec_blocks -> dec_blocks2 duplication rule
(dust3r/model.py:94-101).

Also provides the reverse mapping for state_dict-shaped numpy dicts so tests
can round-trip randomly-initialised reference modules through the converter.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DUSt3RConfig, Spann3RConfig


import re

# Keys present in published checkpoints that the converter intentionally
# does not materialize:
#  - scratch.layer_rn.N.weight: the reference DPT scratch registers the
#    SAME conv tensors twice (nn.ModuleList aliasing layer{N+1}_rn,
#    ref croco/models/dpt_block.py:70-74) — duplicates, not information
#  - mask_token: CroCo masked-pretraining token carried along by
#    AsymmetricCroCo3DStereo but never used in DUSt3R inference/training
#    (ref dust3r/model.py:107 lists it only for param-group bookkeeping)
_ALIAS_OR_VESTIGIAL = (
    re.compile(r"\.scratch\.layer_rn\.\d+\.weight$"),
    re.compile(r"(^|\.)mask_token$"),
)


def is_alias_or_vestigial_key(key: str) -> bool:
    return any(p.search(key) for p in _ALIAS_OR_VESTIGIAL)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pth file into {key: float32 ndarray} without keeping
    torch tensors alive. Requires torch (CPU) at call time only."""
    import torch  # local import: torch is only needed for ingestion

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    # DDP-saved checkpoints prefix every key with "module."; fp16/bf16
    # tensors are upcast by .float()
    return {(k[len("module."):] if k.startswith("module.") else k):
            v.detach().cpu().float().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


# ---------------------------------------------------------------------------
# leaf transforms
# ---------------------------------------------------------------------------

# Forward converters build NUMPY pytrees — conversion is pure host work
# and stays off-device; the load_* entry points place the finished tree
# with one jax.device_put (callers that need a sharded layout can pass
# the same tree to device_put with NamedShardings instead). jit also
# accepts numpy leaves directly, so convert_* results are usable as-is.
# (Measured on the tunneled v5e the wall time is transfer-bandwidth-bound
# either way — ~50 MB/s for 2.6 GB — batching vs per-leaf is a wash.)

def _lin(sd, prefix) -> Dict[str, Any]:
    p = {"w": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    p["b"] = np.asarray(sd[prefix + ".bias"]) if prefix + ".bias" in sd else None
    return p


def _ln(sd, prefix) -> Dict[str, Any]:
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _conv(sd, prefix) -> Dict[str, Any]:
    w = sd[prefix + ".weight"]  # (O, I, kh, kw)
    p = {"w": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
    p["b"] = np.asarray(sd[prefix + ".bias"]) if prefix + ".bias" in sd else None
    return p


def _deconv(sd, prefix) -> Dict[str, Any]:
    w = sd[prefix + ".weight"]  # (I, O, kh, kw)
    w = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]  # HWIO, spatially flipped
    p = {"w": np.ascontiguousarray(w)}
    p["b"] = np.asarray(sd[prefix + ".bias"]) if prefix + ".bias" in sd else None
    return p


def _block(sd, prefix) -> Dict[str, Any]:
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "attn": {"qkv": _lin(sd, f"{prefix}.attn.qkv"),
                 "proj": _lin(sd, f"{prefix}.attn.proj")},
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": {"fc1": _lin(sd, f"{prefix}.mlp.fc1"),
                "fc2": _lin(sd, f"{prefix}.mlp.fc2")},
    }


def _decoder_block(sd, prefix) -> Dict[str, Any]:
    p = _block(sd, prefix)
    p["cross_attn"] = {
        "projq": _lin(sd, f"{prefix}.cross_attn.projq"),
        "projk": _lin(sd, f"{prefix}.cross_attn.projk"),
        "projv": _lin(sd, f"{prefix}.cross_attn.projv"),
        "proj": _lin(sd, f"{prefix}.cross_attn.proj"),
    }
    p["norm3"] = _ln(sd, f"{prefix}.norm3")
    p["norm_y"] = _ln(sd, f"{prefix}.norm_y")
    return p


def _stack(blocks) -> Dict[str, Any]:
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *blocks)


def _count_depth(sd: Mapping[str, Any], prefix: str) -> int:
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.")
    idxs = {int(m.group(1)) for k in sd if (m := pat.match(k))}
    return max(idxs) + 1 if idxs else 0


def _block_stack(sd, prefix, decoder=False) -> Dict[str, Any]:
    depth = _count_depth(sd, prefix)
    fn = _decoder_block if decoder else _block
    return _stack([fn(sd, f"{prefix}.{i}") for i in range(depth)])


def _dpt_head(sd, prefix) -> Dict[str, Any]:
    p = {
        "act0_conv": _conv(sd, f"{prefix}.act_postprocess.0.0"),
        "act0_deconv": _deconv(sd, f"{prefix}.act_postprocess.0.1"),
        "act1_conv": _conv(sd, f"{prefix}.act_postprocess.1.0"),
        "act1_deconv": _deconv(sd, f"{prefix}.act_postprocess.1.1"),
        "act2_conv": _conv(sd, f"{prefix}.act_postprocess.2.0"),
        "act3_conv": _conv(sd, f"{prefix}.act_postprocess.3.0"),
        "act3_conv2": _conv(sd, f"{prefix}.act_postprocess.3.1"),
        "head_conv1": _conv(sd, f"{prefix}.head.0"),
        "head_conv2": _conv(sd, f"{prefix}.head.2"),
        "head_conv3": _conv(sd, f"{prefix}.head.4"),
    }
    for i in range(4):
        p[f"rn{i}"] = _conv(sd, f"{prefix}.scratch.layer{i + 1}_rn")
        rf = f"{prefix}.scratch.refinenet{i + 1}"
        p[f"refine{i + 1}"] = {
            "res1": {"conv1": _conv(sd, f"{rf}.resConfUnit1.conv1"),
                     "conv2": _conv(sd, f"{rf}.resConfUnit1.conv2")},
            "res2": {"conv1": _conv(sd, f"{rf}.resConfUnit2.conv1"),
                     "conv2": _conv(sd, f"{rf}.resConfUnit2.conv2")},
            "out_conv": _conv(sd, f"{rf}.out_conv"),
        }
    return p


def _head(sd, prefix, cfg: DUSt3RConfig) -> Dict[str, Any]:
    if cfg.head_type == "dpt":
        return _dpt_head(sd, f"{prefix}.dpt")
    return {"proj": _lin(sd, f"{prefix}.proj")}


# ---------------------------------------------------------------------------
# model-level converters
# ---------------------------------------------------------------------------

def convert_dust3r(sd: Mapping[str, np.ndarray], cfg: DUSt3RConfig) -> Dict[str, Any]:
    """state_dict of AsymmetricCroCo3DStereo -> dust3r param pytree."""
    sd = dict(sd)
    # second decoder falls back to the first if absent (dust3r/model.py:94-101)
    if not any(k.startswith("dec_blocks2") for k in sd):
        for k in list(sd):
            if k.startswith("dec_blocks."):
                sd[k.replace("dec_blocks.", "dec_blocks2.", 1)] = sd[k]
    return {
        "patch_embed": {"proj": _conv(sd, "patch_embed.proj")},
        "enc_blocks": _block_stack(sd, "enc_blocks"),
        "enc_norm": _ln(sd, "enc_norm"),
        "decoder_embed": _lin(sd, "decoder_embed"),
        "dec_blocks": _block_stack(sd, "dec_blocks", decoder=True),
        "dec_blocks2": _block_stack(sd, "dec_blocks2", decoder=True),
        "dec_norm": _ln(sd, "dec_norm"),
        "head1": _head(sd, "downstream_head1", cfg),
        "head2": _head(sd, "downstream_head2", cfg),
    }


def convert_croco(sd: Mapping[str, np.ndarray],
                  with_pretrain_head: bool = False) -> Dict[str, Any]:
    """state_dict of CroCoNet (or a CroCoDownstream* minus its task head)
    -> croco_pretrain param pytree (ref croco/models/croco.py module names).

    Pretrain-only leaves (mask_token, prediction_head) are included only
    when with_pretrain_head and present — downstream models register
    neither (ref croco_downstream.py:40-55)."""
    p = {
        "patch_embed": {"proj": _conv(sd, "patch_embed.proj")},
        "enc_blocks": _block_stack(sd, "enc_blocks"),
        "enc_norm": _ln(sd, "enc_norm"),
        "decoder_embed": _lin(sd, "decoder_embed"),
        "dec_blocks": _block_stack(sd, "dec_blocks", decoder=True),
        "dec_norm": _ln(sd, "dec_norm"),
    }
    if with_pretrain_head:
        if "mask_token" in sd:
            p["mask_token"] = np.asarray(sd["mask_token"])
        if "prediction_head.weight" in sd:
            p["prediction_head"] = _lin(sd, "prediction_head")
    return p


def convert_spann3r(sd: Mapping[str, np.ndarray], cfg: Spann3RConfig) -> Dict[str, Any]:
    """state_dict of the full Spann3R nn.Module -> spann3r param pytree."""
    dust3r_sd = {k[len("dust3r."):]: v for k, v in sd.items()
                 if k.startswith("dust3r.")}
    p = {
        "dust3r": convert_dust3r(dust3r_sd, cfg.dust3r),
        "value_encoder": _block_stack(sd, "value_encoder"),
        "value_norm": _ln(sd, "value_norm"),
        "value_out": _lin(sd, "value_out"),
        "norm_q": _ln(sd, "norm_q"),
        "norm_k": _ln(sd, "norm_k"),
        "norm_v": _ln(sd, "norm_v"),
        "attn_head_1": {"fc1": _lin(sd, "attn_head_1.0"),
                        "fc2": _lin(sd, "attn_head_1.2")},
        "attn_head_2": {"fc1": _lin(sd, "attn_head_2.0"),
                        "fc2": _lin(sd, "attn_head_2.2")},
    }
    if not cfg.use_feat:
        p["pos_patch_embed"] = {"proj": _conv(sd, "pos_patch_embed.proj")}
    return p


def load_dust3r_checkpoint(path: str, cfg: DUSt3RConfig) -> Dict[str, Any]:
    return jax.device_put(convert_dust3r(load_torch_state_dict(path), cfg))


# ---------------------------------------------------------------------------
# reverse conversion: param pytree -> reference-named state_dict (numpy)
# ---------------------------------------------------------------------------

def _r_lin(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["w"]).T
    if p.get("b") is not None:
        sd[prefix + ".bias"] = np.asarray(p["b"])


def _r_ln(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _r_conv(sd, prefix, p):
    sd[prefix + ".weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
    if p.get("b") is not None:
        sd[prefix + ".bias"] = np.asarray(p["b"])


def _r_deconv(sd, prefix, p):
    w = np.asarray(p["w"])[::-1, ::-1]  # undo the conv_transpose flip
    sd[prefix + ".weight"] = np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))
    if p.get("b") is not None:
        sd[prefix + ".bias"] = np.asarray(p["b"])


def _r_block(sd, prefix, p, decoder=False):
    _r_ln(sd, f"{prefix}.norm1", p["norm1"])
    _r_lin(sd, f"{prefix}.attn.qkv", p["attn"]["qkv"])
    _r_lin(sd, f"{prefix}.attn.proj", p["attn"]["proj"])
    _r_ln(sd, f"{prefix}.norm2", p["norm2"])
    _r_lin(sd, f"{prefix}.mlp.fc1", p["mlp"]["fc1"])
    _r_lin(sd, f"{prefix}.mlp.fc2", p["mlp"]["fc2"])
    if decoder:
        for k in ("projq", "projk", "projv", "proj"):
            _r_lin(sd, f"{prefix}.cross_attn.{k}", p["cross_attn"][k])
        _r_ln(sd, f"{prefix}.norm3", p["norm3"])
        _r_ln(sd, f"{prefix}.norm_y", p["norm_y"])


def _r_block_stack(sd, prefix, stacked, decoder=False):
    depth = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(depth):
        blk = jax.tree.map(lambda x: x[i], stacked)
        _r_block(sd, f"{prefix}.{i}", blk, decoder)


def _r_dpt_head(sd, prefix, p):
    _r_conv(sd, f"{prefix}.act_postprocess.0.0", p["act0_conv"])
    _r_deconv(sd, f"{prefix}.act_postprocess.0.1", p["act0_deconv"])
    _r_conv(sd, f"{prefix}.act_postprocess.1.0", p["act1_conv"])
    _r_deconv(sd, f"{prefix}.act_postprocess.1.1", p["act1_deconv"])
    _r_conv(sd, f"{prefix}.act_postprocess.2.0", p["act2_conv"])
    _r_conv(sd, f"{prefix}.act_postprocess.3.0", p["act3_conv"])
    _r_conv(sd, f"{prefix}.act_postprocess.3.1", p["act3_conv2"])
    _r_conv(sd, f"{prefix}.head.0", p["head_conv1"])
    _r_conv(sd, f"{prefix}.head.2", p["head_conv2"])
    _r_conv(sd, f"{prefix}.head.4", p["head_conv3"])
    for i in range(4):
        _r_conv(sd, f"{prefix}.scratch.layer{i + 1}_rn", p[f"rn{i}"])
        rf = f"{prefix}.scratch.refinenet{i + 1}"
        q = p[f"refine{i + 1}"]
        _r_conv(sd, f"{rf}.resConfUnit1.conv1", q["res1"]["conv1"])
        _r_conv(sd, f"{rf}.resConfUnit1.conv2", q["res1"]["conv2"])
        _r_conv(sd, f"{rf}.resConfUnit2.conv1", q["res2"]["conv1"])
        _r_conv(sd, f"{rf}.resConfUnit2.conv2", q["res2"]["conv2"])
        _r_conv(sd, f"{rf}.out_conv", q["out_conv"])


def to_torch_state_dict_dust3r(params, cfg: DUSt3RConfig) -> Dict[str, np.ndarray]:
    """dust3r pytree -> reference-named numpy state_dict (for torch.save)."""
    sd: Dict[str, np.ndarray] = {}
    _r_conv(sd, "patch_embed.proj", params["patch_embed"]["proj"])
    _r_block_stack(sd, "enc_blocks", params["enc_blocks"])
    _r_ln(sd, "enc_norm", params["enc_norm"])
    _r_lin(sd, "decoder_embed", params["decoder_embed"])
    _r_block_stack(sd, "dec_blocks", params["dec_blocks"], decoder=True)
    _r_block_stack(sd, "dec_blocks2", params["dec_blocks2"], decoder=True)
    _r_ln(sd, "dec_norm", params["dec_norm"])
    for num in (1, 2):
        if cfg.head_type == "dpt":
            _r_dpt_head(sd, f"downstream_head{num}.dpt", params[f"head{num}"])
        else:
            _r_lin(sd, f"downstream_head{num}.proj",
                   params[f"head{num}"]["proj"])
    return sd


def to_torch_state_dict_spann3r(params, cfg: Spann3RConfig) -> Dict[str, np.ndarray]:
    sd = {f"dust3r.{k}": v for k, v in
          to_torch_state_dict_dust3r(params["dust3r"], cfg.dust3r).items()}
    _r_block_stack(sd, "value_encoder", params["value_encoder"])
    _r_ln(sd, "value_norm", params["value_norm"])
    _r_lin(sd, "value_out", params["value_out"])
    for k in ("norm_q", "norm_k", "norm_v"):
        _r_ln(sd, k, params[k])
    for num in (1, 2):
        _r_lin(sd, f"attn_head_{num}.0", params[f"attn_head_{num}"]["fc1"])
        _r_lin(sd, f"attn_head_{num}.2", params[f"attn_head_{num}"]["fc2"])
    if "pos_patch_embed" in params:
        _r_conv(sd, "pos_patch_embed.proj", params["pos_patch_embed"]["proj"])
    return sd


def load_spann3r_checkpoint(path: str, cfg: Spann3RConfig) -> Dict[str, Any]:
    return jax.device_put(convert_spann3r(load_torch_state_dict(path), cfg))
