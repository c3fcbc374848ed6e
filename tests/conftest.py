"""Test environment: force CPU backend with 8 virtual devices.

The honest analog of the reference v8's adapt-to-`cudaGetDeviceCount` trick
(core.cu:865-870): mesh/sharding tests run on a virtual 8-device CPU mesh so
multi-chip code paths are exercised without TPU hardware (SURVEY.md §4).
Must run before the first `import jax` anywhere in the test session.
"""

import os

# On the axon image a sitecustomize imports jax and registers the TPU
# backend at interpreter startup, so env vars set here are too late for
# jax's import-time config. Backend *initialization* is still lazy though:
# flipping jax_platforms via jax.config before the first device use, plus
# XLA_FLAGS in the environment (read at CPU-client creation), reliably
# lands on cpu with 8 virtual devices.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np
import pytest

from tpu_knn.harness.generator import TA_SHAPES, ta_sample_stream


@pytest.fixture(scope="module", autouse=True)
def _drop_compiled_executables():
    """Clear jit caches after every test module.

    Each XLA:CPU executable holds anonymous mmap regions (JIT code +
    data pages) that are only released when the executable is freed; a
    full-suite run accumulates >60k mappings and segfaults INSIDE an XLA
    compile when the kernel's vm.max_map_count (default 65530) is hit —
    observed at ~80% of the suite, in whatever compile happened to run
    there (r3: v5's dma_knn). Within-module caching (parametrized tests
    re-hitting one build) is preserved; cross-module reuse is rare and
    recompiles are cheap next to the crash."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def ta_datasets():
    """The 8 TA datasets with their glibc-rand-exact inputs, as a list of
    ((k, m, n), search, ref)."""
    return list(ta_sample_stream())


@pytest.fixture(scope="session")
def golden():
    """Parsed /root/reference/results.csv: per TA dataset, (indices (m,) i64,
    distances (m,) f64) — odd lines indices, even lines sqrt distances."""
    path = "/root/reference/results.csv"
    if not os.path.exists(path):
        pytest.skip("reference results.csv not available")
    with open(path) as f:
        lines = [ln.strip().rstrip(",") for ln in f if ln.strip()]
    assert len(lines) == 2 * len(TA_SHAPES)
    out = []
    for i in range(len(TA_SHAPES)):
        idx = np.array([int(x) for x in lines[2 * i].split(",")], dtype=np.int64)
        dist = np.array([float(x) for x in lines[2 * i + 1].split(",")], dtype=np.float64)
        out.append((idx, dist))
    return out
