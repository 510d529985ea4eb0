"""Render GT | prediction | depth (+ static/transient decomposition for
NeRF-W checkpoints) for one view — script equivalent of the reference's
test_nerf*_*.ipynb golden notebooks.

Example:
  python notebooks/render_decomposition.py --root_dir <lego> \
      --dataset_name blender --img_wh 200 200 --split val --idx 0 \
      --N_importance 64 --encode_a --encode_t --N_vocab 100 \
      --ckpt_path ckpts/exp/epoch=19.ckpt --out out_decomp
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import imageio

    import eval as eval_cli
    from nerf_fl_tpu.data import dataset_dict
    from nerf_fl_tpu.training.metrics import psnr as psnr_fn
    from nerf_fl_tpu.training.system import render_chunked
    from nerf_fl_tpu.utils.visualization import visualize_depth

    p = argparse.ArgumentParser()
    p.add_argument('--root_dir', required=True)
    p.add_argument('--dataset_name', default='blender',
                   choices=['blender', 'phototourism'])
    p.add_argument('--split', default='val')
    p.add_argument('--idx', type=int, default=0)
    p.add_argument('--img_wh', nargs='+', type=int, default=[200, 200])
    p.add_argument('--img_downscale', type=int, default=2)
    p.add_argument('--N_emb_xyz', type=int, default=10)
    p.add_argument('--N_emb_dir', type=int, default=4)
    p.add_argument('--N_samples', type=int, default=64)
    p.add_argument('--N_importance', type=int, default=64)
    p.add_argument('--use_disp', action='store_true')
    p.add_argument('--N_vocab', type=int, default=100)
    p.add_argument('--encode_a', action='store_true')
    p.add_argument('--N_a', type=int, default=48)
    p.add_argument('--encode_t', action='store_true')
    p.add_argument('--N_tau', type=int, default=16)
    p.add_argument('--beta_min', type=float, default=0.1)
    p.add_argument('--refine_pose', action='store_true')
    p.add_argument('--chunk', type=int, default=32 * 1024)
    p.add_argument('--ckpt_path', required=True)
    p.add_argument('--compute_dtype', default='float32')
    p.add_argument('--out', default='decomposition')
    args = p.parse_args()

    kwargs = {'root_dir': args.root_dir, 'split': args.split}
    if args.dataset_name == 'blender':
        kwargs['img_wh'] = tuple(args.img_wh)
    else:
        kwargs['img_downscale'] = args.img_downscale
    dataset = dataset_dict[args.dataset_name](**kwargs)
    cfg, params = eval_cli.build_eval_state(args)
    from dataclasses import replace
    cfg = replace(cfg, white_back=dataset.white_back)

    sample = dataset[args.idx]
    res = render_chunked(params, sample['rays'], sample['ts'], cfg,
                         chunk=args.chunk, test_time=True)
    if 'img_wh' in sample:
        w, h = (int(x) for x in sample['img_wh'])
    else:
        w, h = args.img_wh

    os.makedirs(args.out, exist_ok=True)

    def save(name, img):
        imageio.imwrite(os.path.join(args.out, name),
                        (np.clip(img, 0, 1) * 255).astype(np.uint8))

    typ = 'fine' if args.N_importance > 0 else 'coarse'
    save('pred.png', res[f'rgb_{typ}'].reshape(h, w, 3))
    save('depth.png',
         visualize_depth(res[f'depth_{typ}'].reshape(h, w)).transpose(1, 2, 0))
    if 'rgbs' in sample:
        save('gt.png', sample['rgbs'].reshape(h, w, 3))
        print('PSNR:', float(psnr_fn(sample['rgbs'].reshape(h, w, 3),
                                     np.clip(res[f'rgb_{typ}'].reshape(h, w, 3),
                                             0, 1))))
    for key, name in [('rgb_fine_static', 'static.png'),
                      ('rgb_fine_transient', 'transient.png'),
                      ('depth_fine_static', None)]:
        if key in res and name:
            save(name, res[key].reshape(h, w, 3))
    print('wrote', args.out)


if __name__ == '__main__':
    main()
