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
    "notebooks/psnr_regression.py",
    "notebooks/test_nerfa_color.py",
    "notebooks/test_nerfu_occ.py",
    "notebooks/test_nerfw_all.py",
    "notebooks/test_phototourism.py",
    "tools/gen_nerf_tsv.py",
    "tools/save_weights_only.py",
    "tools/build_native.py",
    "tools/make_fixture.py",
    "tools/profile_trace.py",
    "tools/quality_gate.py",
    "tools/scale_stress.py",
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


def test_psnr_regression_flow(blender_scene, tmp_path):
    """The notebook-parity regression runs end to end on a tiny NeRF-W
    checkpoint: per-image PSNRs printed, grids + decomposition saved."""
    import types

    import jax
    import numpy as np

    sys.path.insert(0, os.path.join(REPO, "notebooks"))
    import test_nerfw_all  # noqa: E402

    from nerf_fl_tpu.render import RenderConfig
    from nerf_fl_tpu.training import checkpoints
    from nerf_fl_tpu.training.system import build_params

    cfg = RenderConfig(N_samples=8, N_importance=8, encode_a=True,
                       encode_t=True)
    params = build_params(jax.random.PRNGKey(0), cfg, 8)
    ckpt = os.path.join(tmp_path, "tiny.ckpt")
    checkpoints.save_checkpoint(ckpt, params)

    out = os.path.join(tmp_path, "reg")
    report = test_nerfw_all.main([
        '--root_dir', blender_scene, '--img_wh', '40', '40',
        '--N_samples', '8', '--N_importance', '8', '--N_vocab', '8',
        '--chunk', '4096', '--ckpt_path', ckpt, '--out', out])
    assert any(k.startswith('test_train[1]') for k in report)
    assert any(k.startswith('val[0]') for k in report)
    assert all(np.isfinite(v) for v in report.values())
    assert os.path.exists(os.path.join(out,
                                       'test_train_1_gt_pred_depth.png'))
    assert os.path.exists(os.path.join(out,
                                       'test_train_1_decomposition.png'))


def test_psnr_regression_phototourism(tmp_path):
    """The phototourism family wrapper runs on a COLMAP fixture scene."""
    import jax
    import numpy as np

    import importlib.util

    # load by path: the wrapper shares its name with this very test module
    # family, so a bare import would hit the pytest-cached tests module
    sys.path.insert(0, os.path.join(REPO, "notebooks"))
    spec = importlib.util.spec_from_file_location(
        "nb_test_phototourism",
        os.path.join(REPO, "notebooks", "test_phototourism.py"))
    test_phototourism = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(test_phototourism)
    from tests.fixtures import make_phototourism_scene  # noqa: E402

    from nerf_fl_tpu.render import RenderConfig
    from nerf_fl_tpu.training import checkpoints
    from nerf_fl_tpu.training.system import build_params

    root = os.path.join(tmp_path, "tour")
    make_phototourism_scene(root, n_images=5, size=24)
    cfg = RenderConfig(N_samples=8, N_importance=8, encode_a=True,
                       encode_t=True)
    params = build_params(jax.random.PRNGKey(0), cfg, 40)
    ckpt = os.path.join(tmp_path, "tiny.ckpt")
    checkpoints.save_checkpoint(ckpt, params)

    out = os.path.join(tmp_path, "reg")
    report = test_phototourism.main([
        '--root_dir', root, '--img_downscale', '1', '--N_samples', '8',
        '--N_importance', '8', '--N_vocab', '40', '--chunk', '4096',
        '--train_views', '1', '--val_views', '0',
        '--ckpt_path', ckpt, '--out', out])
    assert report and all(np.isfinite(v) for v in report.values())


def test_compile_cache_key_is_dir_independent(tmp_path):
    """enable_compile_cache must yield cache keys that do NOT depend on the
    cache directory path.  Round-4 root cause: jax's default
    xla_gpu_per_fusion_autotune_cache_dir embeds the cache dir into the
    hashed debug_options, so entries rebuilt in a staging dir (the round-3
    fresh-dir recipe) could never hit when read from .jax_bench_cache —
    same program, different key, 30-400 s cold remote compile, rc=124."""
    import json

    prog = (
        "import sys\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from nerf_fl_tpu.utils.compile_cache import enable_compile_cache\n"
        "assert enable_compile_cache(sys.argv[1])\n"
        "import jax.numpy as jnp\n"
        "x = jnp.ones((4, 4))\n"
        "import jax._src.compiler as compiler\n"
        "class Abort(Exception):\n"
        "    pass\n"
        "def spy(module_name, cache_key, *a, **k):\n"
        "    print('KEY=' + cache_key)\n"
        "    raise Abort\n"
        "compiler._cache_read = spy\n"
        "try:\n"
        "    jax.jit(lambda v: v * 3 + 1)(x)\n"
        "except Abort:\n"
        "    pass\n"
    )
    keys = []
    for d in ("cc_a", "cc_b"):
        r = subprocess.run([sys.executable, "-c", prog, str(tmp_path / d)],
                           capture_output=True, text=True, timeout=300,
                           cwd=REPO)
        assert r.returncode == 0, r.stderr[-2000:]
        ks = [ln for ln in r.stdout.splitlines() if ln.startswith("KEY=")]
        assert ks, r.stdout + r.stderr[-2000:]
        keys.append(ks[-1])
    assert keys[0] == keys[1], keys


def test_bench_smoke_emits_json(tmp_path):
    """`python bench.py` must emit one parseable JSON line with the driver
    contract fields even at tiny settings — the round-2 BENCH artifact was
    lost to a harness timeout, so the harness itself is under test.  Runs
    on the CPU backend (BENCH_PLATFORM) with a throwaway compile cache so
    the shipped pre-warmed TPU cache is untouched."""
    import json

    env = dict(os.environ,
               BENCH_PLATFORM="cpu",
               BENCH_COMPILE_CACHE=str(tmp_path / "cache"),
               BENCH_BUDGET_S="420",
               BENCH_BATCH="128",
               BENCH_STEPS="8",
               BENCH_SPE="2",
               BENCH_POOL_SPE="2")
    # generous hard kill: bench's stage 1 (compile+warmup+first window) has
    # no internal budget guard, and CPU compile time varies with host load
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=900,
                       cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 1, r.stdout
    res = json.loads(lines[0])
    assert res["unit"] == "rays/s/chip"
    assert res["value"] > 0
    assert "b128" in res["metric"]
    assert res["vs_baseline"] > 0
    assert res["windows"]
    # audit schema (VERDICT r3 item 9): wall step ms always present and
    # consistent with the rate; traced device fields only when the trace
    # stage succeeded on this backend (then they must be sane)
    assert res["wall_step_ms"] > 0
    assert abs(res["wall_step_ms"] - 1000 * 128 / res["value"]) < 1e-6
    if "device_step_ms" in res:
        assert res["device_step_ms"] > 0
        assert res["device_frac_of_wall"] > 0
    if "mfu_pct_est" in res:
        assert 0 < res["mfu_pct_est"] <= 100

    # BENCH_CACHE_CHECK (VERDICT r4 item 2): against the cache the run
    # just populated, every live program's key must be PRESENT (this also
    # proves abstract-aval lowering reproduces the real run's cache keys);
    # against an empty dir, every key must be MISSING — and fast, because
    # the check never compiles.
    env_check = dict(env, BENCH_CACHE_CHECK="1")
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=600,
                       cwd=REPO, env=env_check)
    assert r.returncode == 0, r.stdout + r.stderr[-3000:]
    rep = json.loads([ln for ln in r.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert rep["pass"] is True
    stages = {p["stage"] for p in rep["programs"]}
    assert stages == {"stage1_k1", "stage2_k2", "stage3_pool_k2"}, stages

    env_check["BENCH_COMPILE_CACHE"] = str(tmp_path / "empty_cache")
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=600,
                       cwd=REPO, env=env_check)
    assert r.returncode == 1, r.stdout + r.stderr[-3000:]
    rep = json.loads([ln for ln in r.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert rep["pass"] is False
    assert all(p.get("present") is False for p in rep["programs"])


def test_make_fixture_cli_produces_loadable_scene(tmp_path):
    """tools/make_fixture.py output must load through the real Blender
    dataset (the README quickstart path)."""
    root = str(tmp_path / "scene")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_fixture.py"),
         root, "--train", "3", "--val", "1", "--test", "1",
         "--size", "32", "--texture"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    from nerf_fl_tpu.data import dataset_dict
    ds = dataset_dict["blender"](root, "train", img_wh=(32, 32))
    assert len(ds.all_rays) == 3 * 32 * 32
    val = dataset_dict["blender"](root, "val", img_wh=(32, 32))
    s = val[0]
    assert s["rays"].shape == (32 * 32, 8)
