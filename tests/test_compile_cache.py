"""Persistent XLA compile-cache wiring (spann3r_tpu.__init__).

The package enables jax's on-disk compilation cache on import so the
1-2 min chunked-scan compiles are paid once per machine, not per
process. These tests pin the override precedence in fresh interpreters
(the config is sticky per-process, so in-process checks can't see the
default path once the suite's conftest has imported jax).
"""
import os
import subprocess
import sys

SNIPPET = "import spann3r_tpu, jax; print(jax.config.jax_compilation_cache_dir)"
# How every CPU run in this repo opts in (tests/conftest.py, dryrun_multichip):
# a config update BEFORE the package import. The image's sitecustomize forces
# jax_platforms='axon,cpu' (env JAX_PLATFORMS is ignored), so env alone can't
# select CPU here.
CPU_SNIPPET = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
               + SNIPPET)


def _run(env_extra, snippet=SNIPPET):
    env = {k: v for k, v in os.environ.items()
           if k not in ("SPANN3R_COMPILE_CACHE", "JAX_COMPILATION_CACHE_DIR")}
    env.update(env_extra)
    out = subprocess.run([sys.executable, "-c", snippet], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    return out.stdout.strip().splitlines()[-1]


def test_default_cache_dir():
    # accelerator-preferred run (this image: JAX_PLATFORMS=axon) -> shared dir
    assert _run({}).endswith(os.path.join(".cache", "spann3r_tpu", "xla_cache"))


def test_cpu_runs_get_host_fingerprint_subdir():
    # XLA:CPU cache entries embed host-specific AOT code but the cache key
    # omits host CPU features, so a shared dir can serve foreign-machine
    # entries (SIGILL risk). CPU-preferred runs must land in a per-host
    # subdirectory of the default path.
    got = _run({}, CPU_SNIPPET)
    base = os.path.join(".cache", "spann3r_tpu", "xla_cache", "cpu-")
    assert base in got and len(got.rsplit("cpu-", 1)[1]) == 12, got
    # and it is stable across processes on the same host
    assert _run({}, CPU_SNIPPET) == got


def test_explicit_path_not_fingerprinted_on_cpu():
    assert _run({"SPANN3R_COMPILE_CACHE": "/tmp/custom_cache"}, CPU_SNIPPET) \
        == "/tmp/custom_cache"


def test_opt_out():
    assert _run({"SPANN3R_COMPILE_CACHE": "0"}) == "None"


def test_explicit_dirs_win():
    assert _run({"JAX_COMPILATION_CACHE_DIR": "/tmp/explicit_cache"}) \
        == "/tmp/explicit_cache"
    assert _run({"SPANN3R_COMPILE_CACHE": "/tmp/custom_cache"}) \
        == "/tmp/custom_cache"
