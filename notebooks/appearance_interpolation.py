"""Appearance-embedding interpolation sweep — script equivalent of the
reference's test_phototourism.ipynb cells 10-12: render one view under a
linear interpolation between two training images' appearance embeddings,
using the renderer's `a_embedded` override (reference rendering.py:276-280).

Example:
  python notebooks/appearance_interpolation.py --root_dir <brandenburg> \
      --dataset_name phototourism --img_downscale 8 --idx 0 \
      --id_a 1123 --id_b 278 --frames 8 \
      --N_importance 64 --encode_a --encode_t --N_vocab 1500 \
      --ckpt_path ckpts/brandenburg/epoch=19.ckpt --out interp
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import imageio
    import jax
    import jax.numpy as jnp

    import eval as eval_cli
    from nerf_fl_tpu.data import dataset_dict
    from nerf_fl_tpu.render import render_rays

    p = argparse.ArgumentParser()
    p.add_argument('--root_dir', required=True)
    p.add_argument('--dataset_name', default='phototourism',
                   choices=['blender', 'phototourism'])
    p.add_argument('--split', default='test_train')
    p.add_argument('--idx', type=int, default=0)
    p.add_argument('--id_a', type=int, required=True,
                   help='first appearance id (image id / frame index)')
    p.add_argument('--id_b', type=int, required=True,
                   help='second appearance id')
    p.add_argument('--frames', type=int, default=8)
    p.add_argument('--img_wh', nargs='+', type=int, default=[200, 200])
    p.add_argument('--img_downscale', type=int, default=8)
    p.add_argument('--N_emb_xyz', type=int, default=10)
    p.add_argument('--N_emb_dir', type=int, default=4)
    p.add_argument('--N_samples', type=int, default=64)
    p.add_argument('--N_importance', type=int, default=64)
    p.add_argument('--use_disp', action='store_true')
    p.add_argument('--N_vocab', type=int, default=1500)
    p.add_argument('--encode_a', action='store_true', default=True)
    p.add_argument('--N_a', type=int, default=48)
    p.add_argument('--encode_t', action='store_true')
    p.add_argument('--N_tau', type=int, default=16)
    p.add_argument('--beta_min', type=float, default=0.1)
    p.add_argument('--refine_pose', action='store_true')
    p.add_argument('--chunk', type=int, default=32 * 1024)
    p.add_argument('--ckpt_path', required=True)
    p.add_argument('--compute_dtype', default='float32')
    p.add_argument('--out', default='interp')
    args = p.parse_args()

    kwargs = {'root_dir': args.root_dir, 'split': args.split}
    if args.dataset_name == 'blender':
        kwargs['img_wh'] = tuple(args.img_wh)
    else:
        kwargs['img_downscale'] = args.img_downscale
    dataset = dataset_dict[args.dataset_name](**kwargs)
    cfg, params = eval_cli.build_eval_state(args)
    from dataclasses import replace as _replace
    cfg = _replace(cfg, white_back=dataset.white_back)

    sample = dataset[args.idx]
    rays, ts = sample['rays'], sample['ts']
    if 'img_wh' in sample:
        w, h = (int(x) for x in sample['img_wh'])
    else:
        w, h = args.img_wh

    table = params['embedding_a']
    emb_a = np.asarray(table[args.id_a])
    emb_b = np.asarray(table[args.id_b])

    cfg = cfg.eval_variant()
    fn = jax.jit(lambda p, r, t, a: render_rays(
        p, r, t, None, cfg, test_time=True, output_transient=False,
        a_embedded=a))

    os.makedirs(args.out, exist_ok=True)
    imgs = []
    chunk = args.chunk
    for f in range(args.frames):
        alpha = f / max(args.frames - 1, 1)
        emb = (1 - alpha) * emb_a + alpha * emb_b
        parts = []
        for i in range(0, len(rays), chunk):
            r = jnp.asarray(rays[i:i + chunk])
            t = jnp.asarray(ts[i:i + chunk])
            a = jnp.broadcast_to(jnp.asarray(emb), (len(r), len(emb)))
            parts.append(np.asarray(fn(params, r, t, a)['rgb_fine']))
        img = np.clip(np.concatenate(parts).reshape(h, w, 3), 0, 1)
        img8 = (img * 255).astype(np.uint8)
        imgs.append(img8)
        imageio.imwrite(os.path.join(args.out, f'interp_{f:02d}.png'), img8)
    imageio.mimsave(os.path.join(args.out, 'interp.gif'), imgs, fps=4)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
