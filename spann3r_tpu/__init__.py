"""spann3r_tpu — TPU-native incremental dense 3D reconstruction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
HengyiWang/spann3r (Spann3R, arXiv 2408.16061): DUSt3R two-view pointmap
regression wrapped in a spatial memory for streaming multi-frame
reconstruction, plus training, evaluation and serving stacks.

Quick start::

    from spann3r_tpu import Spann3RConfig, reconstruct_video
    from spann3r_tpu.utils.torch_ckpt import load_spann3r_checkpoint

    cfg = Spann3RConfig()
    params = load_spann3r_checkpoint("spann3r.pth", cfg)
    preds, order, fps = reconstruct_video(params, cfg, frames)  # (T,1,H,W,3)
"""
__version__ = "0.1.0"


def _enable_persistent_compile_cache():
    """Turn on JAX's on-disk compilation cache for every entry point.

    The big chunked-scan programs take 1-2 min to compile through the
    remote-compile tunnel; the persistent cache makes every repeat
    invocation of demo/eval/bench/train start warm (measured 0.71 s ->
    0.05 s across processes on the tunneled v5e). Only compiles over
    jax's default 1 s threshold are written, so tiny test programs don't
    churn the disk.

    Opt out with SPANN3R_COMPILE_CACHE=0; an explicit
    JAX_COMPILATION_CACHE_DIR (env or jax.config) wins over our default
    of ~/.cache/spann3r_tpu/xla_cache.

    CPU caveat: XLA:CPU cache entries embed AOT machine code specialized to
    the *compiling* host's CPU features, and the cache key does NOT include
    those features — an entry written on a different machine (e.g. a baked
    image cache) loads here with "could lead to execution errors such as
    SIGILL" warnings. CPU runs (tests, the multichip dryrun) therefore get a
    per-host-fingerprint subdirectory: same-machine reuse keeps working,
    foreign entries become unreachable. Accelerator entries are ISA-stable
    across hosts and share the main directory.
    """
    import os
    val = os.environ.get("SPANN3R_COMPILE_CACHE", "")
    if val == "0" or os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir:
            return
        path = val
        if not path:
            path = os.path.join(
                os.path.expanduser("~"), ".cache", "spann3r_tpu", "xla_cache")
            platforms = (jax.config.jax_platforms
                         or os.environ.get("JAX_PLATFORMS", ""))
            preferred = platforms.split(",")[0].strip()
            if preferred in ("", "cpu"):  # cpu run, or unknown -> assume cpu
                path = os.path.join(path, "cpu-" + _host_fingerprint())
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:  # pragma: no cover - very old jax / readonly config
        pass


def _host_fingerprint():
    """Short stable hash of this host's CPU feature set (see CPU caveat)."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            lines = {ln.strip() for ln in f
                     if ln.startswith(("flags", "model name"))}
        blob = "\n".join(sorted(lines))
    except OSError:  # pragma: no cover - non-Linux
        import platform
        blob = platform.processor() + platform.machine()
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


_enable_persistent_compile_cache()

from .api import reconstruct_video
from .config import (BF16, BF16_FAST, FP32, DUSt3RConfig, MemoryConfig,
                     Precision, Spann3RConfig)

__all__ = [
    "reconstruct_video", "Spann3RConfig", "DUSt3RConfig", "MemoryConfig",
    "Precision", "BF16", "BF16_FAST", "FP32",
]
