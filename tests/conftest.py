"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax initializes a backend. Multi-chip sharding
logic is validated on these virtual devices; real-TPU benchmarks live in
bench.py, not the test suite.
"""
import os
import sys

# This environment pre-imports jax (sitecustomize) with JAX_PLATFORMS=axon,
# so plain env vars are too late — use jax.config before any backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import pytest  # noqa: E402


def _add_reference_paths():
    """The reference repo (read-only) serves as a numerical test oracle."""
    for p in (REF, os.path.join(REF, "croco")):
        if os.path.isdir(p) and p not in sys.path:
            sys.path.append(p)


_add_reference_paths()


def _pin_repo_modules():
    """Top-level names like `demo` also exist in the reference's croco dir
    (appended to sys.path above); pin OUR modules in sys.modules so import
    order inside tests can never pick up the reference's."""
    import importlib.util

    for name in ("demo", "eval", "app", "train"):
        path = os.path.join(REPO, f"{name}.py")
        if name in sys.modules or not os.path.exists(path):
            continue
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)


_pin_repo_modules()


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(0)


def has_reference():
    return os.path.isdir(REF)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted")


def stub_optional_ref_deps():
    """Insert inert torchvision/h5py modules so reference modules that
    import them at top level (croco/stereoflow/*, dust3r/viz.py) can load;
    the parity tests only touch code paths that never call into these.

    Self-healing: if a partial torchvision stub is already in sys.modules
    (an earlier test in the same process installed one), the missing
    submodules/attributes are filled in rather than skipped — otherwise
    `import torchvision.transforms.functional` fails for every later test
    (this ordering flake bit the full-suite run once)."""
    import types

    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tr = (sys.modules.get("torchvision.transforms")
          or getattr(tv, "transforms", None)
          or types.ModuleType("torchvision.transforms"))
    fn = (sys.modules.get("torchvision.transforms.functional")
          or getattr(tr, "functional", None)
          or types.ModuleType("torchvision.transforms.functional"))
    for name, val in (("ColorJitter", lambda *a, **k: None),
                      ("Compose", lambda fns: fns),
                      ("ToTensor", lambda *a, **k: None),
                      ("Normalize", lambda *a, **k: None)):
        if not hasattr(tr, name):
            setattr(tr, name, val)
    tr.functional = fn
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = fn
    if "h5py" not in sys.modules:
        h5 = types.ModuleType("h5py")

        def _no_h5py(*a, **k):
            raise ImportError("h5py stub (not installed in this image)")

        h5.File = _no_h5py
        sys.modules["h5py"] = h5
