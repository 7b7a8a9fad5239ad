"""Host/device pytree transfer helpers (contract from dust3r/utils/device.py).

todevice/to_numpy/to_cpu recursive converters and concat-collation over
lists of dicts — torch-free equivalents used by the serving glue.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np


def todevice(tree: Any, sharding=None) -> Any:
    """Recursively move numpy leaves to the default device (or sharding)."""
    def put(x):
        if isinstance(x, (np.ndarray, np.generic)):
            return jax.device_put(x, sharding)
        return x

    return jax.tree.map(put, tree)


def to_numpy(tree: Any) -> Any:
    """Recursively fetch jax arrays to host numpy."""
    def get(x):
        if isinstance(x, jax.Array):
            return np.asarray(x)
        return x

    return jax.tree.map(get, tree)


to_cpu = to_numpy  # alias (the reference distinguishes cuda->cpu tensors)


def collate_with_cat(items, lists: bool = False):
    """Concatenate a list of result dicts along axis 0
    (ref dust3r/utils/device.py:47-76)."""
    if lists:
        out = []
        for it in items:
            out += it if isinstance(it, list) else [it]
        return out
    first = items[0]
    if isinstance(first, dict):
        return {k: collate_with_cat([it[k] for it in items]) for k in first}
    if isinstance(first, (np.ndarray, jax.Array)):
        return np.concatenate([np.asarray(it) for it in items], axis=0)
    if isinstance(first, (list, tuple)):
        merged = []
        for it in items:
            merged += list(it)
        return type(first)(merged)
    return items
