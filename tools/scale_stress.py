"""Brandenburg-shaped scale stress (VERDICT r3 item 6).

The reference's headline phototourism run is brandenburg_gate: ~1363
train images at heterogeneous resolutions, N_vocab 1500, trained from a
prepared ray cache (reference prepare_phototourism.py:18-50,
datasets/phototourism.py:18-253).  No real dataset exists in this
environment, so this tool builds a synthetic COLMAP reconstruction with
the same *shape* — hundreds to 1500 images cycling several distinct
camera resolutions — and pushes it through the exact user pipeline:

  1. nerf_fl_tpu.data.synthetic.make_phototourism_scene  (scene gen)
  2. prepare_phototourism.py                              (ray cache)
  3. train.py --dataset_name phototourism --use_cache     (memmap feed)
  4. eval.py --split val                                  (per-image K)

and records startup time, cache-build time, peak host RSS of the train
process, and steady training rays/s into SCALE_STRESS.json.

Presets:
  smoke  12 images, 3 sizes, CPU — the machinery test tier (seconds).
  full   1363 images at 4 sizes (brandenburg train-set count), device.

Usage: python tools/scale_stress.py --preset full --epochs 1
"""
import argparse
import json
import os
import re
import resource
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)

PRESETS = {
    # machinery tier: proves the pipeline plumbing, not the scale
    "smoke": dict(n_images=12, sizes=[40, 32, 24], downscale=1,
                  batch=256, epochs=1, samples=(8, 8), vocab=100,
                  dtype="float32", platform="cpu", spe=1),
    # brandenburg shape: 1363 images (the reference scene's train count),
    # 4 distinct camera resolutions, N_vocab 1500, bf16 fast path
    "full": dict(n_images=1363, sizes=[504, 376, 300, 600], downscale=2,
                 batch=1024, epochs=1, samples=(64, 64), vocab=1500,
                 dtype="bfloat16", platform=None, spe=8),
}

T0 = time.perf_counter()


def log(msg):
    print(f"[scale_stress +{time.perf_counter() - T0:7.1f}s] {msg}",
          flush=True)


def run_timed(cmd, logfile, platform=None, cwd=_REPO, timeout=7200):
    """Run a pipeline stage; return (wall_s, peak_child_rss_mb).

    RSS via resource.getrusage(RUSAGE_CHILDREN) deltas — ru_maxrss is a
    high-water mark over ALL reaped children, so it is only attributable
    to this stage when it INCREASES (the train stage dominates, which is
    the one we care about)."""
    env = dict(os.environ)
    if platform:
        env["NERF_FL_TPU_PLATFORM"] = platform
    t0 = time.perf_counter()
    with open(logfile, "w") as f:
        p = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                           cwd=cwd, env=env, timeout=timeout)
    wall = time.perf_counter() - t0
    if p.returncode != 0:
        tail = open(logfile).read()[-3000:]
        raise RuntimeError(f"rc={p.returncode}: {' '.join(cmd)}\n{tail}")
    rss_mb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1024.0
    return wall, rss_mb


def parse_last_rays_per_sec(logfile):
    txt = open(logfile).read()
    m = re.findall(r"step \d+ ([\d,]+) rays/s", txt)
    return float(m[-1].replace(",", "")) if m else None


def parse_mean_psnr(logfile):
    m = re.findall(r"Mean PSNR : ([0-9.]+)", open(logfile).read())
    return float(m[-1]) if m else None


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", choices=sorted(PRESETS), default="smoke")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    p = PRESETS[args.preset]
    if args.epochs:
        p = dict(p, epochs=args.epochs)
    ws = args.workdir or f"/tmp/scale_stress_{args.preset}"
    os.makedirs(ws, exist_ok=True)
    out_json = args.out or os.path.join(_REPO, "SCALE_STRESS.json")
    root = os.path.join(ws, "scene")
    result = {"preset": args.preset, "n_images": p["n_images"],
              "sizes": p["sizes"], "N_vocab": p["vocab"]}

    # 1. scene generation (cached across re-runs)
    if not os.path.exists(os.path.join(root, "minitour.tsv")):
        log(f"generating {p['n_images']}-image COLMAP scene, "
            f"sizes {p['sizes']}")
        sys.path.insert(0, _REPO)
        from nerf_fl_tpu.data.synthetic import make_phototourism_scene
        t0 = time.perf_counter()
        make_phototourism_scene(root, n_images=p["n_images"],
                                sizes=p["sizes"])
        result["scene_gen_s"] = round(time.perf_counter() - t0, 1)
        log(f"scene generated in {result['scene_gen_s']}s")
    else:
        log("scene exists, skipping generation")

    # 2. ray-cache build (the reference's prepare_phototourism.py step)
    cache_marker = os.path.join(root, f"cache/rays{p['downscale']}.npy")
    if not os.path.exists(cache_marker):
        log("building ray cache (prepare_phototourism.py)")
        wall, _ = run_timed(
            [sys.executable, os.path.join(_REPO, "prepare_phototourism.py"),
             "--root_dir", root, "--img_downscale", str(p["downscale"])],
            os.path.join(ws, "prepare.log"), platform=p["platform"])
        result["cache_build_s"] = round(wall, 1)
        log(f"cache built in {wall:.1f}s")
    else:
        log("ray cache exists, skipping build")

    # 3. training from the memmap'd cache
    ck = os.path.join(ws, "ckpts")
    log(f"training {p['epochs']} epoch(s), batch {p['batch']}, "
        f"N_vocab {p['vocab']}")
    train_log = os.path.join(ws, "train.log")
    wall, rss = run_timed(
        [sys.executable, os.path.join(_REPO, "train.py"),
         "--dataset_name", "phototourism", "--root_dir", root,
         "--use_cache", "--img_downscale", str(p["downscale"]),
         "--N_vocab", str(p["vocab"]), "--encode_a", "--encode_t",
         "--beta_min", "0.1",
         "--N_samples", str(p["samples"][0]),
         "--N_importance", str(p["samples"][1]),
         "--compute_dtype", p["dtype"], "--noise_std", "0",
         "--num_epochs", str(p["epochs"]), "--batch_size", str(p["batch"]),
         "--steps_per_execution", str(p["spe"]),
         "--optimizer", "adam", "--lr", "5e-4", "--lr_scheduler", "cosine",
         "--save_path", ck, "--exp_name", "stress",
         "--refresh_every", "50"],
        train_log, platform=p["platform"])
    result["train_wall_s"] = round(wall, 1)
    result["train_peak_rss_mb"] = round(rss, 1)
    result["train_rays_per_sec"] = parse_last_rays_per_sec(train_log)
    log(f"train: {wall:.1f}s wall, peak RSS {rss:.0f} MB, "
        f"{result['train_rays_per_sec']} rays/s")

    # 4. val eval — renders through the per-image-K path (every image
    # carries its own intrinsics and size; the val camera's resolution
    # differs from the first train camera's).  The `test` split is the
    # GT-less brandenburg dolly path (eval.py, reference eval.py:169-183)
    # so val is the split that yields a PSNR here.
    ckpt = os.path.join(ck, "stress", f"epoch={p['epochs'] - 1}.ckpt")
    eval_log = os.path.join(ws, "eval.log")
    log("eval (val split, per-image K)")
    wall, _ = run_timed(
        [sys.executable, os.path.join(_REPO, "eval.py"),
         "--dataset_name", "phototourism", "--root_dir", root,
         "--use_cache", "--img_downscale", str(p["downscale"]),
         "--N_vocab", str(p["vocab"]), "--encode_a", "--encode_t",
         "--beta_min", "0.1",
         "--N_samples", str(p["samples"][0]),
         "--N_importance", str(p["samples"][1]),
         "--compute_dtype", p["dtype"],
         "--split", "val", "--ckpt_path", ckpt,
         "--scene_name", "stress"],
        eval_log, platform=p["platform"], cwd=ws)
    result["eval_wall_s"] = round(wall, 1)
    result["eval_psnr"] = parse_mean_psnr(eval_log)
    result["total_wall_s"] = round(time.perf_counter() - T0, 1)
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    log(f"done — wrote {out_json}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
