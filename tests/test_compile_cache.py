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


def _run(env_extra):
    env = {k: v for k, v in os.environ.items()
           if k not in ("SPANN3R_COMPILE_CACHE", "JAX_COMPILATION_CACHE_DIR")}
    env.update(env_extra)
    out = subprocess.run([sys.executable, "-c", SNIPPET], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    return out.stdout.strip().splitlines()[-1]


def test_default_cache_dir():
    assert _run({}).endswith(os.path.join(".cache", "spann3r_tpu", "xla_cache"))


def test_opt_out():
    assert _run({"SPANN3R_COMPILE_CACHE": "0"}) == "None"


def test_explicit_dirs_win():
    assert _run({"JAX_COMPILATION_CACHE_DIR": "/tmp/explicit_cache"}) \
        == "/tmp/explicit_cache"
    assert _run({"SPANN3R_COMPILE_CACHE": "/tmp/custom_cache"}) \
        == "/tmp/custom_cache"
