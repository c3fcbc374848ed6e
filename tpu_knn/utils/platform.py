"""Backend detection.

Pallas TPU kernels run compiled on TPU and in interpreter mode everywhere
else (CPU tests, the driver's virtual-device mesh). Version implementations
consult `interpret_mode()` at trace time so the same code path is exercised
on both backends.
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=None)
def default_backend() -> str:
    import jax

    return jax.default_backend()


def on_tpu() -> bool:
    return default_backend() == "tpu"


def interpret_mode() -> bool:
    """True when Pallas kernels must run under the interpreter (non-TPU)."""
    return not on_tpu()


def virtual_cpu_mesh_env(n_devices: int, base_env=None) -> dict:
    """Child-process environment for an ``n_devices`` virtual CPU mesh.

    The env-var-only route is a trap on this image (a sitecustomize
    imports jax at interpreter startup), so self-provisioning code
    re-executes in a child with (a) the TPU plugin registration disabled
    (PALLAS_AXON_POOL_IPS cleared), (b) JAX_PLATFORMS=cpu, and (c) the
    host-platform device count forced via XLA_FLAGS — the child must
    still flip ``jax.config jax_platforms`` before first device use.
    Shared by __graft_entry__.dryrun_multichip and scripts/mesh_scaling.py
    so the workaround has exactly one definition.
    """
    import os

    env = dict(os.environ if base_env is None else base_env)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    return env
