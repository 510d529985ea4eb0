"""The notebook-equivalent scripts at least compile and show help."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import py_compile
import pytest


@pytest.mark.parametrize("script", [
    "notebooks/render_decomposition.py",
    "notebooks/appearance_interpolation.py",
    "tools/gen_nerf_tsv.py",
    "tools/save_weights_only.py",
    "tools/build_native.py",
    "prepare_phototourism.py",
    "train.py",
    "eval.py",
    "bench.py",
    "__graft_entry__.py",
])
def test_script_compiles(script):
    py_compile.compile(os.path.join(REPO, script), doraise=True)


@pytest.mark.parametrize("script,flag", [
    ("notebooks/render_decomposition.py", "--help"),
    ("notebooks/appearance_interpolation.py", "--help"),
])
def test_script_help(script, flag):
    r = subprocess.run([sys.executable, os.path.join(REPO, script), flag],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "usage" in r.stdout.lower()
