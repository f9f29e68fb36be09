"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's plan: multi-device logic is tested with
``xla_force_host_platform_device_count`` instead of a real multi-chip TPU.

NOTE: the sandbox's sitecustomize imports jax at interpreter startup and
registers the 'axon' TPU backend, so env vars alone are read too early —
we must also flip ``jax.config`` after import.
"""
import os

#: AXIALVS_TEST_TPU=1 keeps the real backend so the TPU-gated Pallas
#: parity tests (tests/test_convnext_pallas.py) can run on the chip:
#:   AXIALVS_TEST_TPU=1 pytest tests/test_convnext_pallas.py -q
#: (serialize with anything else that owns the single TPU process slot)
_ON_TPU = os.environ.get("AXIALVS_TEST_TPU") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _ON_TPU and "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
# persistent compile cache: this sandbox has ONE CPU core; without it every
# test process re-traces and re-compiles identical programs
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
