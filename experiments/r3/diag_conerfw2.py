"""Second diagnostic for the qm8_co_nerfw test-time collapse.

Questions:
1. Is embedding_a[0] degenerate (near-init / outlier norm) in co_nerfw vs
   color_nerfa?
2. At a test view with a_id=0, is the STATIC geometry intact (opacity) and
   only the color off, or does geometry collapse too?
3. What does the model render at a TRAIN view (view 0, clean, ts=0)
   static-only vs the clean GT?  If view 0 renders clean at its own pose but
   the test pose doesn't, the embedding is fine and the static field has
   entangled appearance with view direction.
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


def load(ckpt, cfg):
    params = build_params(jax.random.PRNGKey(0), cfg, 100)
    for name in list(params):
        params[name] = checkpoints.load_ckpt(params[name], ckpt, name)
    return params


def psnr(a, b):
    return -10.0 * np.log10(np.mean((a - b) ** 2) + 1e-12)


cfg_w = RenderConfig(N_samples=64, N_importance=64, N_emb_xyz=10, N_emb_dir=4,
                     encode_a=True, encode_t=True, N_a=48, N_tau=16,
                     beta_min=0.1, perturb=0.0, noise_std=0.0,
                     white_back=True, compute_dtype='bfloat16')
cfg_a = RenderConfig(N_samples=64, N_importance=64, N_emb_xyz=10, N_emb_dir=4,
                     encode_a=True, encode_t=False, N_a=48,
                     perturb=0.0, noise_std=0.0,
                     white_back=True, compute_dtype='bfloat16')

pw = load('/tmp/qm_ckpts800/qm8_co_nerfw/epoch=9.ckpt', cfg_w)
pa = load('/tmp/qm_ckpts800/qm8_color_nerfa/epoch=9.ckpt', cfg_a)

# --- 1. embedding table geometry -------------------------------------------
for tag, params in (('co_nerfw', pw), ('color_nerfa', pa)):
    emb = None
    for name, tree in params.items():
        flat = jax.tree_util.tree_leaves_with_path(tree)
        for path, leaf in flat:
            p = jax.tree_util.keystr(path)
            if 'embedding_a' in p or ('a' == p.strip("'[]") and leaf.ndim == 2):
                emb = np.asarray(leaf, np.float32)
                print(f"{tag}: found {name}{p} shape {emb.shape}")
    if emb is None:
        # fallback: print the param tree structure
        for name, tree in params.items():
            print(tag, name, jax.tree_util.tree_map(lambda x: x.shape, tree))
        continue
    norms = np.linalg.norm(emb, axis=-1)
    print(f"{tag}: |emb| mean(1..39)={norms[1:40].mean():.3f} "
          f"|emb0|={norms[0]:.3f} |emb(40..)| (untrained)={norms[40:].mean():.3f}")
    # cosine of emb0 vs mean trained embedding
    m = emb[1:40].mean(0)
    c = emb[0] @ m / (np.linalg.norm(emb[0]) * np.linalg.norm(m) + 1e-9)
    print(f"{tag}: cos(emb0, mean emb1..39) = {c:.3f}")

# --- 2/3. renders ----------------------------------------------------------
SUB = 16
ds_test = dataset_dict['blender']('/tmp/qm_scene800', 'test', img_wh=(200, 200))
s = ds_test[0]
rays = np.asarray(s['rays'])[::SUB]
gt = np.asarray(s['rgbs'])[::SUB]
ts0 = np.zeros(len(rays), np.int32)

r = render_chunked(pw, rays, ts0, cfg_w, chunk=4096, test_time=True,
                   output_transient=False)
img = np.clip(np.asarray(r['rgb_fine'], np.float32), 0, 1)
op = np.asarray(r['opacity_fine'], np.float32) if 'opacity_fine' in r else None
print(f"co_nerfw test a0: PSNR {psnr(gt, img):.2f} "
      f"opacity mean {op.mean() if op is not None else 'n/a'}")
obj = gt.min(-1) < 0.9  # object pixels (non-white GT)
print(f"  object px: ours mean {img[obj].mean(0)} vs gt {gt[obj].mean(0)}")
print(f"  bg px: ours mean {img[~obj].mean(0)} vs gt {gt[~obj].mean(0)}")

# train view 0 (clean, ts=0) static-only, same model
ds_tr = dataset_dict['blender']('/tmp/qm_scene800', 'test_train',
                                img_wh=(200, 200), perturbation=['color', 'occ'])
st = ds_tr[0]
rays0 = np.asarray(st['rays'])[::SUB]
gt0 = np.asarray(st['rgbs'])[::SUB]
r0 = render_chunked(pw, rays0, np.zeros(len(rays0), np.int32), cfg_w,
                    chunk=4096, test_time=True, output_transient=False)
img0 = np.clip(np.asarray(r0['rgb_fine'], np.float32), 0, 1)
obj0 = gt0.min(-1) < 0.9
print(f"co_nerfw TRAIN view0 (clean) a0 static: PSNR {psnr(gt0, img0):.2f}")
print(f"  object px: ours mean {img0[obj0].mean(0)} vs gt {gt0[obj0].mean(0)}")

# same for color_nerfa for contrast
ra = render_chunked(pa, rays, ts0, cfg_a, chunk=4096, test_time=True,
                    output_transient=False)
imga = np.clip(np.asarray(ra['rgb_fine'], np.float32), 0, 1)
print(f"color_nerfa test a0: PSNR {psnr(gt, imga):.2f}")
print(f"  object px: ours mean {imga[obj].mean(0)} vs gt {gt[obj].mean(0)}")
