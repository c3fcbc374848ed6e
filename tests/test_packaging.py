"""Packaging conformance: the wheel metadata must keep shipping the
native translation unit and a working console-script target.

The reference distributes via a CMake tree (sources/CMakeLists.txt);
this package distributes as a standard wheel (pyproject.toml) whose
native .cc rides as package data and compiles per-host on first use
(tpu_knn/native/build.py) — these tests pin that contract so a
refactor can't silently drop the source from the wheel.
"""

import os

try:
    import tomllib  # stdlib on >=3.11
except ImportError:  # pragma: no cover - pyproject allows 3.10
    import pytest

    tomllib = pytest.importorskip(
        "tomli", reason="tomllib needs Python >=3.11 (or the tomli backport)")

import tpu_knn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_pyproject_parses_and_names_the_package():
    meta = _load_pyproject()
    assert meta["project"]["name"] == "tpu-knn"
    assert meta["project"]["version"] == tpu_knn.__version__


def test_console_script_target_is_importable():
    meta = _load_pyproject()
    target = meta["project"]["scripts"]["tpu-knn-harness"]
    mod_name, func_name = target.split(":")
    import importlib

    mod = importlib.import_module(mod_name)
    assert callable(getattr(mod, func_name))


def test_native_source_ships_as_package_data():
    meta = _load_pyproject()
    patterns = meta["tool"]["setuptools"]["package-data"]["tpu_knn.native"]
    assert "src/*.cc" in patterns
    import tpu_knn.native.build as b

    # The declared data file is the one build.py compiles.
    assert os.path.exists(b._SRC)
    assert b._SRC.endswith(os.path.join("src", "tpuknn_native.cc"))
