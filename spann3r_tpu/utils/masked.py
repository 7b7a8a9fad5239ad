"""Masked replacements for torch nan-statistics (nanmedian/nanquantile/nanmean).

JAX has no nan-median over masked subsets with dynamic counts; these use the
sort-and-index trick with +inf padding so shapes stay static under jit.
Semantics match torch: nanmedian returns the LOWER middle element
(index (n-1)//2 of the sorted valid values)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(x: jax.Array, mask: jax.Array, axis=None, keepdims=False) -> jax.Array:
    """Mean of x where mask.  Zero valid elements -> NaN, matching torch's
    `x[mask].mean()` on an empty selection, so an all-invalid frame aborts
    training via the per-step finiteness check instead of learning from 0."""
    m = mask.astype(x.dtype)
    num = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    den = jnp.sum(m, axis=axis, keepdims=keepdims)
    return jnp.where(den > 0, num / jnp.clip(den, 1e-8),
                     jnp.asarray(jnp.nan, x.dtype))


def masked_median(x: jax.Array, mask: jax.Array, axis: int = -1) -> jax.Array:
    """Median of x where mask, along `axis` (torch.nanmedian semantics).

    A slice with zero valid elements yields NaN — matching torch.nanmedian on
    an all-NaN row — so an all-invalid frame fails loudly downstream instead
    of silently injecting finfo.max into shift/scale alignment."""
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    filled = jnp.where(mask, x, big)
    srt = jnp.sort(filled, axis=axis)
    n_valid = jnp.sum(mask, axis=axis).astype(jnp.int32)
    idx = jnp.maximum((n_valid - 1) // 2, 0)
    med = jnp.take_along_axis(srt, jnp.expand_dims(idx, axis),
                              axis=axis).squeeze(axis)
    return jnp.where(n_valid > 0, med, jnp.asarray(jnp.nan, x.dtype))


def masked_quantile(x: jax.Array, mask: jax.Array, q: float, axis: int = -1) -> jax.Array:
    """Linear-interpolated quantile of masked values (torch.nanquantile)."""
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    filled = jnp.where(mask, x, big)
    srt = jnp.sort(filled, axis=axis)
    n_valid = jnp.sum(mask, axis=axis).astype(jnp.float32)
    pos = q * (n_valid - 1.0)
    lo = jnp.clip(jnp.floor(pos), 0).astype(jnp.int32)
    hi = jnp.clip(jnp.ceil(pos), 0).astype(jnp.int32)
    frac = (pos - lo.astype(jnp.float32)).astype(x.dtype)
    v_lo = jnp.take_along_axis(srt, jnp.expand_dims(lo, axis), axis=axis).squeeze(axis)
    v_hi = jnp.take_along_axis(srt, jnp.expand_dims(hi, axis), axis=axis).squeeze(axis)
    out = v_lo + (v_hi - v_lo) * frac
    # zero-valid slice -> NaN (torch.nanquantile on all-NaN input)
    return jnp.where(n_valid > 0, out, jnp.asarray(jnp.nan, x.dtype))
