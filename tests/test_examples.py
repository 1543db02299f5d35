"""The examples/ scripts run end-to-end (they double as integration
tests: each asserts its own accuracy internally)."""

import runpy
import sys

import pytest


def _run(path, argv):
    old = sys.argv
    sys.argv = [str(path)] + argv
    try:
        runpy.run_path(str(path), run_name="__main__")
    finally:
        sys.argv = old


def test_demo_spectral_sr(tmp_path, repo_root):
    _run(repo_root / "examples" / "demo_spectral_sr.py", [str(tmp_path)])


def test_demo_multichip(repo_root, eight_devices):
    _run(repo_root / "examples" / "demo_multichip.py", ["8"])
