"""Test config: run JAX on a virtual 8-device CPU mesh.

The reference has no tests (SURVEY.md §4); this suite is ours. Multi-device
code paths are exercised without TPUs via
``--xla_force_host_platform_device_count`` (SURVEY.md §4 implication note).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

import jax
import pytest

# The axon sitecustomize force-registers the TPU backend at interpreter
# startup (JAX_PLATFORMS=axon in the ambient env), so env vars alone don't
# stick — use the config API to pin tests to the virtual 8-device CPU mesh.
# EMVM_TPU_TESTS=1 keeps the real TPU backend instead, for the `-m tpu`
# on-chip kernel suite (run it ALONE: `EMVM_TPU_TESTS=1 pytest -m tpu`).
if not os.environ.get("EMVM_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

# XLA CPU compiles are slow (the full train step takes minutes); persist
# compiled programs so repeat test runs are fast.
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

REFERENCE = pathlib.Path("/root/reference")


def has_reference() -> bool:
    return REFERENCE.is_dir()


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted")
