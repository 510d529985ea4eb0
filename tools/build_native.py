"""Build the native helpers (csrc/) into nerf_fl_tpu/data/_native/.

Usage: python tools/build_native.py
The framework works without this (pure-Python fallbacks); building it
accelerates COLMAP parsing on production-scale phototourism scenes.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "nerf_fl_tpu", "data", "_native")


def build():
    os.makedirs(OUT_DIR, exist_ok=True)
    src = os.path.join(REPO, "csrc", "colmap_fast.c")
    out = os.path.join(OUT_DIR, "libcolmap_fast.so")
    cmd = ["cc", "-O3", "-shared", "-fPIC", "-o", out, src]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    print("built", out)
    return out


if __name__ == "__main__":
    build()
