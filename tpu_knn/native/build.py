"""On-demand build of the native host library.

The reference builds its native code with CMake+nvcc (-Ofast -fopenmp,
sources/CMakeLists.txt:4-6); here a single g++ invocation produces a shared
library loaded via ctypes. Rebuilds automatically when the source changes
(content hash in the artifact name); safe under concurrent callers (build to
a temp name, atomic rename).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "src", "tpuknn_native.cc")


def _pick_cache_dir() -> str:
    """Build-artifact directory: prefer the in-package `_build` (shared by
    all users of a writable checkout), but a wheel installed into a
    read-only site-packages (system/root install, immutable container)
    must not fail on first native use — fall back to a per-user XDG cache
    keyed by the same content+toolchain hash."""
    pkg = os.path.join(os.path.dirname(__file__), "_build")
    try:
        os.makedirs(pkg, exist_ok=True)
        probe = tempfile.mkstemp(dir=pkg)
        os.close(probe[0])
        os.unlink(probe[1])
        return pkg
    except OSError:
        base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
            os.path.expanduser("~"), ".cache")
        user = os.path.join(base, "tpu-knn")
        os.makedirs(user, exist_ok=True)
        return user


_CACHE_DIR = _pick_cache_dir()

CXX = os.environ.get("CXX", "g++")
# -ffp-contract=off: no FMA contraction, so the oracle's float32 rounding is
# bit-identical to the NumPy reference implementation (the correctness bar
# here is bit-exactness with v0 semantics, stricter than the reference's
# -Ofast build).
CXXFLAGS = ["-O3", "-march=native", "-ffp-contract=off", "-fopenmp", "-shared", "-fPIC", "-std=c++17"]


def _toolchain_id() -> bytes:
    """Machine + compiler identity: -march=native binaries must never be
    reused across hosts (a foreign ISA would SIGILL on first call)."""
    import platform

    try:
        ver = subprocess.run([CXX, "-dumpfullversion"], capture_output=True,
                             text=True).stdout.strip()
    except OSError:
        ver = "unknown"
    return f"{platform.machine()}|{platform.node()}|{CXX}|{ver}".encode()


def lib_path() -> str:
    with open(_SRC, "rb") as f:
        payload = f.read() + " ".join(CXXFLAGS).encode() + _toolchain_id()
    digest = hashlib.sha256(payload).hexdigest()[:16]
    return os.path.join(_CACHE_DIR, f"libtpuknn_{digest}.so")


def build(force: bool = False) -> str:
    """Compile (if needed) and return the shared library path."""
    out = lib_path()
    if not force and os.path.exists(out):
        return out
    os.makedirs(_CACHE_DIR, exist_ok=True)
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_CACHE_DIR)
    os.close(fd)
    try:
        subprocess.run(
            [CXX, *CXXFLAGS, _SRC, "-o", tmp],
            check=True,
            capture_output=True,
            text=True,
        )
        os.replace(tmp, out)
    except subprocess.CalledProcessError as e:
        raise RuntimeError(f"native build failed:\n{e.stderr}") from e
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return out
