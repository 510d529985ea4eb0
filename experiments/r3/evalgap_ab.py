"""Where does eval's ~0.3 s/frame over the isolated renderer go?

Pipelines 8 consecutive 400^2 NeRF-W frames exactly like eval.py
(render_chunked_async, dispatch frame i+1 before draining frame i) in
three variants:
  host_np   — rays arrive as host numpy per frame (eval.py today)
  device    — rays pre-uploaded to HBM before the loop (isolates the
              per-frame ~5.8 MB host->device transfer on the tunnel)
  sync      — plain render_chunked per frame (the multimp baseline)

Run: nohup python experiments/r3/evalgap_ab.py > experiments/r3/evalgap_ab.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerf_fl_tpu.utils.compile_cache import enable_compile_cache  # noqa
enable_compile_cache()

from nerf_fl_tpu.core.rays import get_ray_directions, get_rays  # noqa
from nerf_fl_tpu.render import RenderConfig  # noqa: E402
from nerf_fl_tpu.training.system import (build_params, render_chunked,  # noqa
                                         render_chunked_async)

# 512x320 = 5 x 32768 exactly: no tail padding, so the device-resident
# variant never round-trips through numpy's pad path
W, H = 512, 320
N_FRAMES = 8
KEYS = ["rgb_fine", "depth_fine"]


def frame_rays(i):
    focal = 0.5 * W / np.tan(0.4)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    th = 0.3 * i
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[:, 3] = [4 * np.sin(th), 4 * np.cos(th), 1.0]
    dirs = get_ray_directions(H, W, K)
    o, d = get_rays(np.asarray(dirs).reshape(-1, 3),
                    np.broadcast_to(c2w, (H * W, 3, 4)))
    return np.concatenate(
        [np.asarray(o), np.asarray(d),
         np.full((H * W, 1), 2, np.float32),
         np.full((H * W, 1), 6, np.float32)], 1)


def main():
    cfg = RenderConfig(N_samples=64, N_importance=64, encode_a=True,
                       encode_t=True, beta_min=0.1, white_back=False,
                       perturb=0.0, noise_std=0.0, compute_dtype="bfloat16")
    params = build_params(jax.random.PRNGKey(0), cfg, 1500)
    frames = [frame_rays(i) for i in range(N_FRAMES)]
    ts = np.zeros(H * W, np.int32)
    # warm the program
    render_chunked(params, frames[0], ts, cfg, test_time=True, keys=KEYS)

    def run_async(ray_list, ts_arg):
        t0 = time.perf_counter()
        prev = None
        for r in ray_list:
            fin = render_chunked_async(params, r, ts_arg, cfg,
                                       test_time=True, keys=KEYS)
            if prev is not None:
                res = prev()
                assert np.isfinite(res["rgb_fine"]).all()
            prev = fin
        res = prev()
        assert np.isfinite(res["rgb_fine"]).all()
        return (time.perf_counter() - t0) / len(ray_list)

    def run_sync(ray_list, ts_arg):
        t0 = time.perf_counter()
        for r in ray_list:
            res = render_chunked(params, r, ts_arg, cfg, test_time=True,
                                 keys=KEYS)
            assert np.isfinite(res["rgb_fine"]).all()
        return (time.perf_counter() - t0) / len(ray_list)

    for trial in range(2):
        s = run_sync(frames, ts)
        a = run_async(frames, ts)
        dev_frames = [jnp.asarray(f) for f in frames]
        jax.block_until_ready(dev_frames)
        ad = run_async(dev_frames, jnp.asarray(ts))
        print(f"trial {trial}: sync {s:.3f} s/frame | async host-np "
              f"{a:.3f} | async device-resident {ad:.3f}", flush=True)


if __name__ == "__main__":
    main()
