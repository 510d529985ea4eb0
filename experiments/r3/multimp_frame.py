"""Multi-megapixel eval-scale demonstration (VERDICT r2 item 4).

Renders one 2048x1536 (3.1 MP) NeRF-W frame — the shape class of
phototourism img_downscale=1 eval — through render_chunked on device,
proving the bounded in-flight window holds at ~103 chunks/frame, and
times a 400^2 frame for the eval-path s/frame numbers.

Run: nohup python experiments/r3/multimp_frame.py > experiments/r3/multimp_frame.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

from nerf_fl_tpu.utils.compile_cache import enable_compile_cache  # noqa
enable_compile_cache()

from nerf_fl_tpu.core.rays import get_ray_directions, get_rays  # noqa: E402
from nerf_fl_tpu.render import RenderConfig  # noqa: E402
from nerf_fl_tpu.training.system import build_params, render_chunked  # noqa


def frame_rays(W, H):
    focal = 0.5 * W / np.tan(0.4)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[:, 3] = [0, 0, 4.0]
    dirs = get_ray_directions(H, W, K)
    o, d = get_rays(np.asarray(dirs).reshape(-1, 3),
                    np.broadcast_to(c2w, (H * W, 3, 4)))
    rays = np.concatenate(
        [np.asarray(o), np.asarray(d),
         np.full((H * W, 1), 2, np.float32),
         np.full((H * W, 1), 6, np.float32)], 1)
    return rays, np.zeros(H * W, np.int32)


def main():
    cfg = RenderConfig(N_samples=64, N_importance=64, encode_a=True,
                       encode_t=True, beta_min=0.1, white_back=False,
                       perturb=0.0, noise_std=0.0,
                       compute_dtype="bfloat16")
    params = build_params(jax.random.PRNGKey(0), cfg, 1500)
    chunk = 32768  # eval.py's power-of-two clamp for 192 samples/ray
    wanted = ["rgb_fine", "depth_fine"]

    for (W, H) in ((400, 400), (2048, 1536)):
        rays, ts = frame_rays(W, H)
        n_chunks = -(-len(rays) // chunk)
        # warm (compile once for the chunk shape)
        if (W, H) == (400, 400):
            render_chunked(params, rays[:chunk], ts[:chunk], cfg,
                           chunk=chunk, test_time=True, keys=wanted)
        for trial in range(2):
            t0 = time.perf_counter()
            res = render_chunked(params, rays, ts, cfg, chunk=chunk,
                                 test_time=True, keys=wanted, inflight=4)
            dt = time.perf_counter() - t0
            rgb = res["rgb_fine"]
            assert rgb.shape == (H * W, 3), rgb.shape
            assert np.isfinite(rgb).all()
            print(f"{W}x{H} ({W*H/1e6:.1f} MP, {n_chunks} chunks): "
                  f"{dt:.2f} s/frame ({W*H/dt/1e3:,.0f} krays/s)",
                  flush=True)


if __name__ == "__main__":
    main()
