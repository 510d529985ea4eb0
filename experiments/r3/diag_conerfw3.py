"""Sweep all 40 trained appearance codes at one test pose of qm8_co_nerfw.

If SOME code renders the test side correctly, the per-view color transforms
were absorbed into the codes entangled with geometry (factorization failure);
if NO code does, the static field itself has wrong colors on that side.
"""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')

from nerf_fl_tpu.data import dataset_dict
from nerf_fl_tpu.training import checkpoints
from nerf_fl_tpu.training.system import render_chunked, build_params
from nerf_fl_tpu.render.renderer import RenderConfig


def psnr(a, b):
    return -10.0 * np.log10(np.mean((a - b) ** 2) + 1e-12)


cfg = RenderConfig(N_samples=64, N_importance=64, N_emb_xyz=10, N_emb_dir=4,
                   encode_a=True, encode_t=True, N_a=48, N_tau=16,
                   beta_min=0.1, perturb=0.0, noise_std=0.0,
                   white_back=True, compute_dtype='bfloat16')
params = build_params(jax.random.PRNGKey(0), cfg, 100)
for name in list(params):
    params[name] = checkpoints.load_ckpt(
        params[name], '/tmp/qm_ckpts800/qm8_co_nerfw/epoch=9.ckpt', name)

SUB = 32
ds = dataset_dict['blender']('/tmp/qm_scene800', 'test', img_wh=(200, 200))
s = ds[0]
rays = np.asarray(s['rays'])[::SUB]
gt = np.asarray(s['rgbs'])[::SUB]
obj = gt.min(-1) < 0.9

rows = []
for a_id in range(40):
    ts = np.full(len(rays), a_id, np.int32)
    r = render_chunked(params, rays, ts, cfg, chunk=4096, test_time=True,
                       output_transient=False)
    img = np.clip(np.asarray(r['rgb_fine'], np.float32), 0, 1)
    p = psnr(gt, img)
    rows.append((a_id, p, img[obj].mean(0)))
    print(f"a_id={a_id:2d}: PSNR {p:6.2f} obj rgb {img[obj].mean(0)}",
          flush=True)
best = max(rows, key=lambda r: r[1])
print(f"BEST: a_id={best[0]} PSNR {best[1]:.2f} (gt obj rgb {gt[obj].mean(0)})")
