"""Primitive NN layers as pure functions over param pytrees.

Conventions (chosen for clean torch-checkpoint conversion AND TPU layouts):
  - Linear params: {'w': (in, out), 'b': (out,)}  (torch (out,in) is transposed
    by the converter in utils/torch_ckpt.py).
  - LayerNorm params: {'scale': (d,), 'bias': (d,)} with eps passed at call.
  - Conv2d params: {'w': (kh, kw, cin, cout) HWIO, 'b': (cout,)}; activations
    are NHWC (TPU-native), unlike the reference's NCHW.

All matmuls go through `dot` which sets preferred_element_type=float32 so the
MXU accumulates in fp32 even when activations are bf16.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name


def dot(x: jax.Array, w: jax.Array) -> jax.Array:
    return jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _int8_act_min_rows() -> int:
    """0 disables the int8 activation path (default); read at trace time
    like the remat-policy env vars.

    CONTRACT for writers of SPANN3R_INT8_ACT (bench/demo/eval/int8_gate):
    set it BEFORE the first jit trace of a quantized-params program — jit
    caches key on shapes/dtypes, not env vars, so a later flip silently
    no-ops on already-traced programs."""
    import os
    n = int(os.environ.get("SPANN3R_INT8_ACT", "0"))
    return 1024 if n == 1 else n  # SPANN3R_INT8_ACT=<n> sets a custom floor


def linear(p, x: jax.Array) -> jax.Array:
    if "w_q" in p:
        rows = int(np.prod(x.shape[:-1]))  # static under jit
        min_rows = _int8_act_min_rows()
        if min_rows and rows >= min_rows:
            # int8 x int8 -> int32 on the MXU (~1.4x bf16 throughput on
            # v5e at large shapes, PERF.md): dynamic per-row symmetric
            # activation quantization against the per-output-channel
            # weight scales from ops/quant.py.  Only taken for big
            # batched matmuls (rows >= min_rows): at B=1 decode shapes
            # the step is weight-load-bound (int8 weights already cover
            # it) and the VPU quantize work would dominate.  Serving
            # only — the int8 dot has no gradient.
            xf = x.astype(jnp.float32)
            xs = jnp.maximum(
                jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
            xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
            o = jax.lax.dot_general(
                xq, p["w_q"],
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (o.astype(jnp.float32) * xs
                 * p["w_scale"].astype(jnp.float32)).astype(x.dtype)
            if p.get("b") is not None:
                y = y + p["b"].astype(x.dtype)
            return y
        # int8 weight-only serving (ops/quant.py): dequant fuses into the
        # matmul's operand load; weight HBM traffic halves vs bf16
        w = p["w_q"].astype(x.dtype) * p["w_scale"].astype(x.dtype)
    else:
        w = p["w"].astype(x.dtype)
    y = dot(x, w)
    if p.get("b") is not None:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm(p, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    # reference LayerNorm runs in fp32 under AMP; normalize in fp32 for parity
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    # torch nn.GELU default is the exact erf formulation
    return jax.nn.gelu(x, approximate=False)


def mlp(p, x: jax.Array) -> jax.Array:
    """Transformer MLP: fc1 -> GELU -> fc2 (ref croco/models/blocks.py:58-79).

    The 4x-width hidden activations are checkpoint-named so selective
    remat policies (models/vit._remat_policy) can exclude exactly these —
    they dominate per-block activation memory; recomputing them costs one
    matmul.  Names are inert without a names-aware policy."""
    pre = checkpoint_name(linear(p["fc1"], x), "mlp_pre")
    return linear(p["fc2"], checkpoint_name(gelu(pre), "mlp_hidden"))


def conv2d(p, x: jax.Array, stride: int = 1, padding="SAME") -> jax.Array:
    """NHWC conv with HWIO kernel."""
    # no preferred_element_type here: its transpose rule rejects mixed
    # bf16/f32 cotangents, and the TPU MXU accumulates bf16 convs in fp32
    # at the hardware level regardless
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if p.get("b") is not None:
        y = y + p["b"].astype(x.dtype)
    return y


def conv2d_transpose(p, x: jax.Array, stride: int) -> jax.Array:
    """NHWC transposed conv, kernel (kh, kw, cin, cout), matching
    torch ConvTranspose2d(k=stride, s=stride) semantics (non-overlapping)."""
    y = jax.lax.conv_transpose(
        x, p["w"].astype(x.dtype),
        strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if p.get("b") is not None:
        y = y + p["b"].astype(x.dtype)
    return y


def _interp_matrix(osz: int, isz: int, align_corners: bool) -> np.ndarray:
    """(osz, isz) bilinear interpolation matrix with torch F.interpolate's
    source-coordinate conventions (align_corners or half-pixel)."""
    if align_corners and osz > 1:
        c = np.arange(osz, dtype=np.float64) * ((isz - 1) / (osz - 1))
    else:
        c = np.clip((np.arange(osz, dtype=np.float64) + 0.5) * (isz / osz)
                    - 0.5, 0.0, isz - 1)
    i0 = np.clip(np.floor(c).astype(np.int64), 0, isz - 1)
    i1 = np.minimum(i0 + 1, isz - 1)
    w = (c - i0).astype(np.float32)
    m = np.zeros((osz, isz), np.float32)
    np.add.at(m, (np.arange(osz), i0), 1.0 - w)
    np.add.at(m, (np.arange(osz), i1), w)
    return m


def interpolate_bilinear(x: jax.Array, out_hw: tuple[int, int],
                         align_corners: bool = True) -> jax.Array:
    """Bilinear resize of NHWC maps replicating torch F.interpolate semantics.

    The DPT fusion blocks use align_corners=True (ref croco/models/dpt_block.py:215),
    which jax.image.resize does not implement.  TPU-first formulation:
    separable interpolation as two small MATMULS (out = Wy @ x @ Wx^T per
    channel) instead of gathers — gathers and especially their scatter-add
    transpose are slow on TPU, and as matmuls both forward and backward
    ride the MXU (profiled 67 ms/step of gather time in the B=4 training
    step before this change).  Weights are identical to the gather
    formulation, so numerics match to fp32 reassociation.
    """
    _, h, w, _ = x.shape
    oh, ow = out_hw
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    wy = jnp.asarray(_interp_matrix(oh, h, align_corners))
    wx = jnp.asarray(_interp_matrix(ow, w, align_corners))
    out = jnp.einsum("iy,byxc->bixc", wy, xf)
    out = jnp.einsum("jx,bixc->bijc", wx, out)
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# initializers (match torch defaults used by the reference)
# ---------------------------------------------------------------------------

def _xavier_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def init_linear(key, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32):
    # reference initializes every nn.Linear with xavier_uniform + zero bias
    # (croco/models/croco.py:119-124)
    p = {"w": _xavier_uniform(key, (d_in, d_out), d_in, d_out, dtype)}
    p["b"] = jnp.zeros((d_out,), dtype) if bias else None
    return p


def init_layer_norm(d: int, dtype=jnp.float32):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_mlp(key, d: int, hidden: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, d, hidden, dtype=dtype),
            "fc2": init_linear(k2, hidden, d, dtype=dtype)}


def init_conv2d(key, kh: int, kw: int, cin: int, cout: int, bias: bool = True,
                dtype=jnp.float32, xavier_flat: bool = False):
    if xavier_flat:
        # patch-embed init flattens the kernel (croco/models/blocks.py:238-240)
        fan_in, fan_out = kh * kw * cin, cout
    else:
        fan_in, fan_out = kh * kw * cin, kh * kw * cout
    p = {"w": _xavier_uniform(key, (kh, kw, cin, cout), fan_in, fan_out, dtype)}
    p["b"] = jnp.zeros((cout,), dtype) if bias else None
    return p
