"""Eval-render throughput: full 400^2 NeRF-W frame at test time (the
reference's eval.py workload), honest sync via readback.

Run: nohup python experiments/eval_fps.py > experiments/eval_fps.log 2>&1 &
"""
import json
import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")
from nerf_fl_tpu.render import RenderConfig  # noqa: E402
from nerf_fl_tpu.training.system import build_params, render_chunked  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    cfg = RenderConfig(N_samples=64, N_importance=64, encode_a=True,
                       encode_t=True, beta_min=0.1, white_back=True,
                       perturb=0.0, noise_std=0.0, compute_dtype="bfloat16")
    params = build_params(jax.random.PRNGKey(0), cfg, 1500)
    n = 400 * 400
    o = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((n, 1), 2, np.float32),
                           np.full((n, 1), 6, np.float32)], 1)
    ts = np.full(n, 7, np.int32)
    keys = ("rgb_fine", "depth_fine", "rgb_fine_static",
            "rgb_fine_transient", "beta")

    def frame():
        return render_chunked(params, rays, ts, cfg, chunk=32 * 1024,
                              test_time=True, keys=keys)

    res = frame()  # compile
    assert res["rgb_fine"].shape == (n, 3)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        frame()
        times.append(time.perf_counter() - t0)
    sec = sorted(times)[2]
    out = {"eval_seconds_per_400p_nerfw_frame": round(sec, 3),
           "eval_fps_400p": round(1.0 / sec, 3),
           "eval_rays_per_sec": round(n / sec, 1)}
    print(json.dumps(out))
    with open("experiments/eval_fps_results.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
