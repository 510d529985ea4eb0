"""PSNR-regression flow of the reference's golden notebooks, as a script.

Reproduces test_nerfa_color / test_nerfu_occ / test_nerfw_all /
test_phototourism .ipynb (reference repo root, cells 1-12): load a trained
checkpoint per-submodule, rebuild the perturbed dataset, render chosen
test_train and val views at test time, print per-image PSNR, and save
[GT | pred | depth] grids plus the static/transient decomposition row
([static | transient | beta], reference rendering.py:192-217) for transient
models.  For perturbed blender views it also reports the masked static PSNR
against the UNPERTURBED ground truth (the notebooks' decomposition check).

The four family wrappers (test_nerfa_color.py etc.) preset the flags.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument('--root_dir', required=True)
    p.add_argument('--dataset_name', default='blender',
                   choices=['blender', 'phototourism'])
    p.add_argument('--data_perturb', nargs='+', default=[],
                   help='blender perturbations used in training '
                        '(color / occ)')
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
    p.add_argument('--chunk', type=int, default=32 * 1024)
    p.add_argument('--ckpt_path', required=True)
    p.add_argument('--train_views', nargs='+', type=int, default=[1],
                   help='test_train view indices (0 is never perturbed, '
                        'blender.py:82-84)')
    p.add_argument('--val_views', nargs='+', type=int, default=[0])
    p.add_argument('--compute_dtype', default='float32',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--out', default='psnr_regression')
    return p


def _grid(imgs):
    h = max(i.shape[0] for i in imgs)
    return np.hstack([np.pad(i, ((0, h - i.shape[0]), (0, 0), (0, 0)))
                      for i in imgs])


def render_view(params, cfg, sample, wh, chunk, transient):
    from nerf_fl_tpu.training.system import render_chunked
    keys = ['rgb_fine', 'depth_fine', 'rgb_coarse', 'depth_coarse']
    if transient:
        keys += ['rgb_fine_static', 'rgb_fine_transient', 'beta']
    res = render_chunked(params, sample['rays'], sample['ts'], cfg,
                         chunk=chunk, test_time=True, keys=keys)
    w, h = wh
    typ = 'fine' if 'rgb_fine' in res else 'coarse'
    return {k: v.reshape((h, w) + v.shape[1:]) for k, v in res.items()}, typ


def evaluate_split(args, params, cfg, split, indices, out_dir, report):
    import imageio
    from nerf_fl_tpu.data import dataset_dict
    from nerf_fl_tpu.training.metrics import psnr as psnr_fn
    from nerf_fl_tpu.utils.visualization import visualize_depth

    kwargs = {'root_dir': args.root_dir, 'split': split}
    if args.dataset_name == 'blender':
        kwargs['img_wh'] = tuple(args.img_wh)
        kwargs['perturbation'] = args.data_perturb
    else:
        kwargs['img_downscale'] = args.img_downscale
    dataset = dataset_dict[args.dataset_name](**kwargs)

    for idx in indices:
        if idx >= len(dataset):
            print(f'[skip] {split}[{idx}]: split has {len(dataset)} views')
            continue
        sample = dataset[idx]
        wh = tuple(args.img_wh) if args.dataset_name == 'blender' else \
            tuple(int(x) for x in sample['img_wh'])
        res, typ = render_view(params, cfg, sample, wh, args.chunk,
                               args.encode_t)
        w, h = wh
        gt = sample['rgbs'].reshape(h, w, 3)
        pred = np.clip(res[f'rgb_{typ}'], 0, 1)
        p = float(psnr_fn(gt, pred))
        report.append((f'{split}[{idx}] PSNR', p))
        print(f'{split}[{idx}] PSNR between GT and pred: {p:.2f}')

        depth = np.asarray(visualize_depth(
            res[f'depth_{typ}'])).transpose(1, 2, 0)
        row = [gt, pred, depth]
        imageio.imwrite(
            os.path.join(out_dir, f'{split}_{idx}_gt_pred_depth.png'),
            (np.clip(_grid(row), 0, 1) * 255).astype(np.uint8))

        if args.encode_t and 'rgb_fine_static' in res:
            static = np.clip(res['rgb_fine_static'], 0, 1)
            trans = np.clip(res['rgb_fine_transient'], 0, 1)
            beta = res['beta']
            beta_viz = np.repeat(
                ((beta - beta.min()) / max(np.ptp(beta), 1e-8))[..., None],
                3, -1)
            imageio.imwrite(
                os.path.join(out_dir, f'{split}_{idx}_decomposition.png'),
                (np.clip(_grid([static, trans, beta_viz]), 0, 1) * 255)
                .astype(np.uint8))
            if 'original_rgbs' in sample:
                # masked static PSNR vs unperturbed GT (notebook cell 6)
                ogt = sample['original_rgbs'].reshape(h, w, 3)
                mask = sample['original_valid_mask'].reshape(h, w)
                ps = float(psnr_fn(ogt, static, valid_mask=mask))
                report.append((f'{split}[{idx}] static PSNR (masked)', ps))
                print(f'{split}[{idx}] PSNR between static pred and '
                      f'unperturbed GT (masked): {ps:.2f}')


def main(argv=None):
    args = get_parser().parse_args(argv)
    import eval as eval_cli

    ns = argparse.Namespace(**vars(args))
    cfg, params = eval_cli.build_eval_state(ns)

    from dataclasses import replace
    from nerf_fl_tpu.data import dataset_dict  # noqa: F401
    white_back = args.dataset_name == 'blender'
    cfg = replace(cfg, white_back=white_back)

    os.makedirs(args.out, exist_ok=True)
    report = []
    evaluate_split(args, params, cfg, 'test_train', args.train_views,
                   args.out, report)
    evaluate_split(args, params, cfg, 'val', args.val_views, args.out,
                   report)
    print('\n== summary ==')
    for name, v in report:
        print(f'{name}: {v:.2f}')
    return dict(report)


if __name__ == '__main__':
    main()
