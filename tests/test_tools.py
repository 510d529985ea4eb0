"""Tests for the offline tools (tsv generator, checkpoint stripper)."""
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from nerf_fl_tpu.training import checkpoints
from tests.fixtures import make_phototourism_scene


def test_gen_nerf_tsv(tmp_path):
    root = str(tmp_path / "scene")
    make_phototourism_scene(root, n_images=5, size=16)
    out = str(tmp_path / "gen.tsv")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/gen_nerf_tsv.py"),
         "--root_dir", root, "--out", out, "--n_test", "1"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    lines = open(out).read().strip().split("\n")
    assert lines[0] == "filename\tid\tsplit\tdataset"
    assert len(lines) == 6
    rows = [ln.split("\t") for ln in lines[1:]]
    assert sum(1 for row in rows if row[2] == "test") == 1
    # ids come from images.bin (sparse ints)
    assert all(int(row[1]) > 0 for row in rows)


def test_save_weights_only(tmp_path):
    import jax
    from nerf_fl_tpu.render import RenderConfig
    from nerf_fl_tpu.training.system import build_params
    from nerf_fl_tpu.training.optimizers import build_optimizer
    import types

    cfg = RenderConfig(N_samples=8, N_importance=8)
    params = build_params(jax.random.PRNGKey(0), cfg, 4)
    h = types.SimpleNamespace(optimizer="adam", lr=1e-3, momentum=0.9,
                              weight_decay=0.0)
    tx = build_optimizer(h)
    full = str(tmp_path / "full.ckpt")
    checkpoints.save_checkpoint(full, params, tx.init(params), epoch=2)

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/save_weights_only.py"),
         "--ckpt_path", full],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    slim_path = str(tmp_path / "full_weights.ckpt")
    assert os.path.exists(slim_path)
    assert os.path.getsize(slim_path) < os.path.getsize(full)
    slim = checkpoints.load_checkpoint(slim_path)
    assert "opt_state" not in slim and "state_dict" in slim
    # weights intact: submodule loading still works
    loaded = checkpoints.load_ckpt(params["nerf_coarse"], slim_path,
                                   "nerf_coarse")
    np.testing.assert_array_equal(
        np.asarray(loaded["xyz"][0]["w"]),
        np.asarray(params["nerf_coarse"]["xyz"][0]["w"]))


def test_scale_stress_machinery(tmp_path):
    """tools/scale_stress.py end to end at the smoke preset: synthetic
    COLMAP scene with three distinct camera resolutions -> ray cache ->
    --use_cache training -> per-image-K val render, artifact written.
    (The brandenburg-shaped `full` preset is the device run recorded in
    docs/PERF.md; this pins the machinery.)"""
    import json

    out = tmp_path / "SCALE_STRESS.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/scale_stress.py"),
         "--preset", "smoke", "--workdir", str(tmp_path / "ws"),
         "--out", str(out)],
        capture_output=True, text=True, timeout=1800, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    res = json.loads(out.read_text())
    assert res["cache_build_s"] > 0
    assert res["train_wall_s"] > 0
    assert res["train_peak_rss_mb"] > 0
    assert res["train_rays_per_sec"] and res["train_rays_per_sec"] > 0
    assert res["eval_psnr"] is not None and res["eval_psnr"] > 5
