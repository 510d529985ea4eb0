"""Trace 3 test-time frames through render_chunked and print wall vs
device-op totals (run trace_attr on the dir for per-op detail).

Run: nohup python experiments/trace_eval.py > experiments/trace_eval.log 2>&1 &
"""
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_fl_tpu.render import RenderConfig
from nerf_fl_tpu.training.system import build_params, render_chunked

OUT = "experiments/trace_eval_dir"

cfg = RenderConfig(N_samples=64, N_importance=64, encode_a=True,
                   encode_t=True, beta_min=0.1, white_back=True,
                   perturb=0.0, noise_std=0.0, compute_dtype="float32")
params = build_params(jax.random.PRNGKey(0), cfg, 64)

rng = np.random.default_rng(0)
n = 160_000  # one 400^2 frame
o = rng.normal(0, 1, (n, 3)).astype(np.float32)
d = rng.normal(0, 1, (n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays = np.concatenate([o, d, np.full((n, 1), 2, np.float32),
                       np.full((n, 1), 6, np.float32)], 1)
ts = rng.integers(0, 64, n).astype(np.int32)

kw = dict(chunk=30720, test_time=True, keys=("rgb_fine", "depth_fine"))

t0 = time.perf_counter()
render_chunked(params, rays, ts, cfg, **kw)  # warm/compile
print(f"warm frame {time.perf_counter() - t0:.2f}s", flush=True)

for tag in ("a", "b"):
    t0 = time.perf_counter()
    render_chunked(params, rays, ts, cfg, **kw)
    print(f"frame {tag}: {time.perf_counter() - t0:.3f}s", flush=True)

jax.profiler.start_trace(OUT)
t0 = time.perf_counter()
for _ in range(3):
    render_chunked(params, rays, ts, cfg, **kw)
wall = time.perf_counter() - t0
jax.profiler.stop_trace()
print(f"3 traced frames: wall {wall:.3f}s ({wall / 3:.3f}s/frame)", flush=True)
