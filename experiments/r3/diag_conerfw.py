"""Diagnose the qm8_co_nerfw collapse: on CPU, render a 1/16 pixel subsample
of one test view of the epoch=9 checkpoint (a) static-only with appearance
ids 0..2, (b) decomposed static/transient/beta at a TRAIN view, to see which
head absorbed the scene."""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')

from nerf_fl_tpu.data import dataset_dict
from nerf_fl_tpu.training import checkpoints
from nerf_fl_tpu.training.system import render_chunked, build_params
from nerf_fl_tpu.render.renderer import RenderConfig

CKPT = sys.argv[1] if len(sys.argv) > 1 else \
    '/tmp/qm_ckpts800/qm8_co_nerfw/epoch=9.ckpt'
SCENE = sys.argv[2] if len(sys.argv) > 2 else '/tmp/qm_scene800'
cfg = RenderConfig(N_samples=64, N_importance=64, N_emb_xyz=10, N_emb_dir=4,
                   encode_a=True, encode_t=True, N_a=48, N_tau=16,
                   beta_min=0.1, perturb=0.0, noise_std=0.0,
                   white_back=True, compute_dtype='bfloat16')
params = build_params(jax.random.PRNGKey(0), cfg, 100)
for name in list(params):
    params[name] = checkpoints.load_ckpt(params[name], CKPT, name)


def psnr(a, b):
    return -10.0 * np.log10(np.mean((a - b) ** 2) + 1e-12)


SUB = 16
ds = dataset_dict['blender'](SCENE, 'test', img_wh=(200, 200))
s = ds[0]
rays = np.asarray(s['rays'])[::SUB]
gt = np.asarray(s['rgbs'])[::SUB]

for a_id in range(3):
    ts = np.full(len(rays), a_id, np.int32)
    r = render_chunked(params, rays, ts, cfg, chunk=4096, test_time=True,
                       output_transient=False)
    img = np.clip(np.asarray(r['rgb_fine'], np.float32), 0, 1)
    print(f"a_id={a_id}: test PSNR {psnr(gt, img):.2f} "
          f"mean rgb {img.mean(0)} (gt mean {gt.mean(0)})", flush=True)

# decomposition at a train view (id 3, perturbed)
ds_tr = dataset_dict['blender'](SCENE, 'test_train',
                                img_wh=(200, 200),
                                perturbation=['color', 'occ'])
st = ds_tr[3]
rays_t = np.asarray(st['rays'])[::SUB]
ts_t = np.asarray(st['ts'])[::SUB]
gt_t = np.asarray(st['rgbs'])[::SUB]
r = render_chunked(params, rays_t, ts_t, cfg, chunk=4096, test_time=True,
                   output_transient=True)
for k in sorted(r):
    v = np.asarray(r[k], np.float32)
    print(f"train view 3 {k}: mean {v.mean():.4f} max {v.max():.4f}", flush=True)
comb = np.clip(np.asarray(r['rgb_fine'], np.float32), 0, 1)
print(f"train view 3 combined PSNR vs perturbed GT: {psnr(gt_t, comb):.2f}")
