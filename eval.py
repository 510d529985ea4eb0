"""Evaluation / test-sequence rendering CLI (reference eval.py semantics).

Renders a whole split frame by frame through the fixed-shape chunked
renderer (test_time=True, perturb=0, noise_std=0), writes per-frame PNGs,
a gif/mp4 at 30 fps, and the mean PSNR when ground truth exists.

Improvement over the reference (SURVEY.md section 2.5.3): --refine_pose is
supported at eval — learned pose deltas are loaded from the checkpoint and
composed onto the dataset poses when rendering train-pose-based splits.
"""
import os
import time
from argparse import ArgumentParser

import numpy as np


def get_opts(argv=None):
    from nerf_fl_tpu.utils.cli import add_shared_flags
    parser = ArgumentParser()
    add_shared_flags(parser, "eval")

    parser.add_argument('--scene_name', type=str, default='test',
                        help='scene name, used as output folder name')
    parser.add_argument('--split', type=str, default='val',
                        choices=['val', 'test', 'test_train'])
    parser.add_argument('--video_format', type=str, default='gif',
                        choices=['gif', 'mp4'])
    parser.add_argument('--save_depth', default=False, action="store_true",
                        help='also save depth maps as PFM')
    parser.add_argument('--compute_ssim', default=False, action="store_true",
                        help='also report mean SSIM (the reference computes '
                             'SSIM only in its notebooks)')
    parser.add_argument('--optimize_appearance', default=False,
                        action="store_true",
                        help='NeRF-W paper eval protocol: fit each held-out '
                             'image\'s appearance embedding on its LEFT '
                             'half (weights frozen), report PSNR on the '
                             'RIGHT half (needs --encode_a and GT images; '
                             'no reference equivalent)')
    parser.add_argument('--opt_a_steps', type=int, default=100,
                        help='Adam steps for --optimize_appearance')
    parser.add_argument('--opt_a_lr', type=float, default=0.1,
                        help='Adam lr for --optimize_appearance')
    parser.add_argument('--opt_a_rays', type=int, default=4096,
                        help='left-half rays sampled for the fit')
    return parser.parse_args(argv)


def max_split_ts(dataset, split: str) -> int:
    """Largest embedding id the given split can emit, computed WITHOUT
    loading any images (val/test_train samples are lazy)."""
    if hasattr(dataset, 'img_ids'):  # phototourism: sparse COLMAP ids
        if split == 'val':
            return int(dataset.val_id)
        if split == 'test_train':
            return int(max(dataset.img_ids_train))
        return int(dataset.test_appearance_idx)
    # blender: val/test render with t=0; test_train uses the frame index.
    # llff emits t=0 for every non-train split (data/llff.py __getitem__)
    if split == 'test_train' and hasattr(dataset, 'meta'):
        return len(dataset.meta['frames']) - 1
    return 0


def build_eval_state(args):
    """Params + config rebuilt from flags, each submodule loaded by name
    (reference eval.py:126-154)."""
    import jax
    from nerf_fl_tpu.render import RenderConfig
    from nerf_fl_tpu.training import checkpoints
    from nerf_fl_tpu.training.system import build_params

    cfg = RenderConfig(
        N_samples=args.N_samples, N_importance=args.N_importance,
        use_disp=args.use_disp, perturb=0.0, noise_std=0.0,
        N_emb_xyz=args.N_emb_xyz, N_emb_dir=args.N_emb_dir,
        encode_a=args.encode_a, N_a=args.N_a,
        encode_t=args.encode_t, N_tau=args.N_tau,
        beta_min=args.beta_min, compute_dtype=args.compute_dtype,
        refine_pose=getattr(args, 'refine_pose', False),
        barf_schedule=getattr(args, 'barf_schedule', 'fork'),
        barf_epoch_start=getattr(args, 'barf_epochs', [4, 8])[0],
        barf_epoch_end=getattr(args, 'barf_epochs', [4, 8])[1],
        use_pallas={"auto": None, "on": True,
                    "off": False}[getattr(args, "use_pallas", "auto")],
        fast_trig={"auto": None, "on": True,
                   "off": False}[getattr(args, "fast_trig", "auto")],
        mlp_depth=getattr(args, "mlp_depth", 8),
        mlp_width=getattr(args, "mlp_width", 256))

    params = build_params(jax.random.PRNGKey(0), cfg, args.N_vocab)
    for name in list(params):
        params[name] = checkpoints.load_ckpt(params[name], args.ckpt_path, name)
    return cfg, params


def main(args):
    from nerf_fl_tpu.utils.compile_cache import enable_compile_cache
    from nerf_fl_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    enable_compile_cache()
    import imageio
    import jax
    from nerf_fl_tpu.data import dataset_dict
    from nerf_fl_tpu.training import checkpoints
    from nerf_fl_tpu.training.metrics import psnr as psnr_fn
    from nerf_fl_tpu.training.system import render_chunked_async

    kwargs = {'root_dir': args.root_dir, 'split': args.split}
    if args.dataset_name == 'blender':
        kwargs['img_wh'] = tuple(args.img_wh)
    elif args.dataset_name == 'llff':
        kwargs['img_wh'] = tuple(args.img_wh)
        kwargs['spheric_poses'] = args.spheric_poses
    else:
        kwargs['img_downscale'] = args.img_downscale
        kwargs['use_cache'] = args.use_cache
    dataset = dataset_dict[args.dataset_name](**kwargs)
    scene = os.path.basename(args.root_dir.strip('/'))

    cfg, params = build_eval_state(args)
    # background handling is dataset-dependent (reference eval.py:101 passes
    # dataset.white_back into render_rays)
    from dataclasses import replace as _replace
    cfg = _replace(cfg, white_back=dataset.white_back)

    mesh = None
    if getattr(args, 'num_gpus', 1) > 1:
        # data-parallel evaluation: rays shard over the 'data' mesh axis
        # (the reference's eval.py is single-GPU)
        from nerf_fl_tpu.parallel import make_mesh, place_params
        mesh = make_mesh(num_data=args.num_gpus)
        params = place_params(mesh, params)

    render_kwargs = {}
    if args.refine_pose:
        ckpt = checkpoints.load_checkpoint(args.ckpt_path)
        # a BARF model must be rendered at its checkpoint's annealing
        # state regardless of whether learned poses apply to this split:
        # early ckpts never trained the high-frequency PE channels, so
        # defaulting to epoch 0 would zero every frequency weight and a
        # trained ckpt would render garbage (for ckpts past epoch_end
        # this is the full embedding anyway)
        render_kwargs['epoch'] = float(ckpt.get('epoch', 0))
        # Compose the learned deltas onto the dataset's poses.  Learned poses
        # exist only for the cameras seen in training: phototourism indexes
        # them by tsv image order (valid for every split); for blender they
        # are per-TRAIN-frame, so only the test_train split may use them.
        if args.dataset_name in ('blender', 'llff') \
                and args.split != 'test_train':
            print(f'[eval] --refine_pose on {args.dataset_name} applies '
                  'only to --split test_train (learned poses are '
                  'per-train-frame); ignoring the pose deltas (PE still '
                  'anneals at the checkpoint epoch)')
        elif 'learn_poses' in ckpt.get('state_dict', {}):
            from nerf_fl_tpu.models.poses import all_poses
            lp = jax.tree_util.tree_map(
                np.asarray, ckpt['state_dict']['learn_poses'])
            refined = np.asarray(all_poses(lp))[:, :3]
            dataset.apply_refined_poses(refined)

    if args.dataset_name == 'phototourism' and args.split == 'test':
        # test camera + dolly path (reference eval.py:162-184)
        dataset.test_img_w, dataset.test_img_h = args.img_wh
        dataset.test_focal = dataset.test_img_w / 2 / np.tan(np.pi / 6)
        dataset.test_K = np.array(
            [[dataset.test_focal, 0, dataset.test_img_w / 2],
             [0, dataset.test_focal, dataset.test_img_h / 2],
             [0, 0, 1]])
        if scene == 'brandenburg_gate':
            dataset.test_appearance_idx = 1123  # 85572957_6053497857.jpg
            N_frames = 30 * 4
            dx = np.linspace(0, 0.03, N_frames)
            dy = np.linspace(0, -0.1, N_frames)
            dz = np.linspace(0, 0.5, N_frames)
            poses_test = np.tile(dataset.poses_dict[1123], (N_frames, 1, 1))
            poses_test[:, 0, 3] += dx
            poses_test[:, 1, 3] += dy
            poses_test[:, 2, 3] += dz
            dataset.poses_test = poses_test
        else:
            raise NotImplementedError(
                'test-path poses are hard-coded per scene; only '
                'brandenburg_gate is defined (reference eval.py:169-183)')
        render_kwargs['output_transient'] = False

    if cfg.encode_a or cfg.encode_t:
        # the same loud startup guard training runs (training/system.py):
        # embedding_lookup is a jnp.take, which CLAMPS out-of-range ids, so
        # an undersized --N_vocab would silently render every frame with the
        # last embedding row instead of crashing like the reference's CUDA
        # assert (reference README.md:124)
        from nerf_fl_tpu.models.embeddings import validate_vocab
        validate_vocab(args.N_vocab, max_split_ts(dataset, args.split))

    imgs, psnrs, ssims = [], [], []
    dir_name = f'results/{args.dataset_name}/{args.scene_name}'
    os.makedirs(dir_name, exist_ok=True)

    typ = 'fine' if args.N_importance > 0 else 'coarse'
    # fetch ONLY what this loop consumes: the keyed render prunes both the
    # device computation and the device->host payload (13 floats/ray for
    # the full test-time result set vs 3-4 here; the decomposition outputs
    # are served by notebooks/render_decomposition.py instead)
    wanted = [f'rgb_{typ}']
    if args.save_depth:
        wanted.append(f'depth_{typ}')

    # Unlike the reference (whose chunk also limits the internal MLP point
    # batches, rendering.py:119), our chunk IS the fused program size:
    # val_chunk_cap bounds the per-program sample-point count so huge
    # --chunk values can't OOM, and because training's val renders apply
    # the SAME cap, eval reuses training's compiled render program for
    # every sampling config — one big compile per model family instead of
    # two, which matters on remote-compile TPU runtimes (30-400 s/program).
    from nerf_fl_tpu.training.system import val_chunk_cap
    chunk = val_chunk_cap(args.chunk, args.N_samples, args.N_importance)
    if chunk < args.chunk:
        print(f'[eval] clamping chunk {args.chunk} -> {chunk}')
    # per-frame host work (ray generation in dataset[i], PNG encode) costs
    # as much as the render itself — overlap it: a prefetch thread builds
    # the next frame's rays while the device renders, and image writes run
    # on a small writer pool joined at the end
    from concurrent.futures import ThreadPoolExecutor
    from nerf_fl_tpu.training.system import DevicePrefetcher
    writer = ThreadPoolExecutor(max_workers=2)
    writes = []
    frames = DevicePrefetcher(iter(range(len(dataset))),
                              lambda i: dataset[i], depth=2)

    phase_s = {"drain": [], "host": []}

    def process(item):
        """Frame epilogue: drain the deferred render, then all host work
        (clip/uint8, PNG submit, PSNR/SSIM).  Called AFTER the next frame's
        chunks are dispatched, so this overlaps the device render."""
        i, sample, w, h, finish, right_mask = item
        t_p = time.perf_counter()
        results = finish()
        phase_s["drain"].append(time.perf_counter() - t_p)
        t_p = time.perf_counter()
        img_pred = np.clip(results[f'rgb_{typ}'].reshape(h, w, 3), 0, 1)
        img_pred_ = (img_pred * 255).astype(np.uint8)
        imgs.append(img_pred_)
        writes.append(writer.submit(
            imageio.imwrite, os.path.join(dir_name, f'{i:03d}.png'),
            img_pred_))
        if args.save_depth:
            from nerf_fl_tpu.data.pfm import save_pfm
            writes.append(writer.submit(
                save_pfm, os.path.join(dir_name, f'depth_{i:03d}.pfm'),
                results[f'depth_{typ}'].reshape(h, w).astype(np.float32)))

        if 'rgbs' in sample:
            img_gt = sample['rgbs'].reshape(h, w, 3)
            if right_mask is not None:
                # paper protocol: the fitted embedding never saw these pixels
                m = right_mask.reshape(h, w)
                psnrs.append(float(psnr_fn(img_gt[m], img_pred[m])))
            else:
                psnrs.append(float(psnr_fn(img_gt, img_pred)))
            if args.compute_ssim:
                from nerf_fl_tpu.training.metrics import ssim as ssim_fn
                ssims.append(float(ssim_fn(
                    img_pred.transpose(2, 0, 1)[None],
                    np.ascontiguousarray(
                        img_gt.transpose(2, 0, 1))[None])))
        phase_s["host"].append(time.perf_counter() - t_p)
        frame_marks.append(time.perf_counter())
        print(f'frame {i + 1}/{len(dataset)}', flush=True)

    prev = None
    frame_marks = [time.perf_counter()]
    # the frame loop owns two background resources (the frame prefetcher
    # thread with queued device buffers, and the PNG writer pool); an
    # exception mid-eval must release both, matching training's fit()
    # finally (training/system.py) — the original exception propagates
    try:
        for i, sample in enumerate(frames):
            if args.dataset_name == 'blender':
                w, h = args.img_wh
            else:
                w, h = (int(x) for x in sample['img_wh'])

            a_override = None
            right_mask = None
            if args.optimize_appearance and args.encode_a and 'rgbs' in sample:
                from nerf_fl_tpu.render.appearance import optimize_appearance
                # the left/right split derives pixel columns from ray index,
                # which requires raster-ordered rays (row-major, all current
                # datasets); any other order would silently fit and score on
                # wrong pixel sets
                assert len(sample['rays']) == w * h, \
                    f"raster-order assumption broken: {len(sample['rays'])} " \
                    f"rays != {w}x{h}"
                cols = np.arange(len(sample['rays'])) % w
                left = np.flatnonzero(cols < w // 2)
                right_mask = cols >= w // 2
                rng_np = np.random.default_rng(1000 + i)
                sel = rng_np.choice(left,
                                    size=min(args.opt_a_rays, len(left)),
                                    replace=False)
                a_override, fit_losses = optimize_appearance(
                    params, sample['rays'][sel], sample['ts'][sel],
                    sample['rgbs'][sel], cfg,
                    steps=args.opt_a_steps, lr=args.opt_a_lr)
                print(f'[opt_a] frame {i}: fit mse '
                      f'{float(fit_losses[0]):.4f} -> '
                      f'{float(fit_losses[-1]):.4f}', flush=True)

            finish = render_chunked_async(
                params, sample['rays'], sample['ts'], cfg, chunk=chunk,
                test_time=True, keys=wanted, mesh=mesh,
                a_override=a_override, **render_kwargs)
            if prev is not None:
                process(prev)
            prev = (i, sample, w, h, finish, right_mask)
        if prev is not None:
            process(prev)
        for f in writes:
            f.result()  # surface writer-thread errors
    finally:
        frames.close()
        writer.shutdown(wait=True, cancel_futures=True)

    if len(frame_marks) > 1:
        deltas = np.diff(frame_marks)
        total = frame_marks[-1] - frame_marks[0]
        msg = (f'[eval] {len(deltas)} frames in {total:.1f} s '
               f'({total / len(deltas):.2f} s/frame')
        if len(deltas) > 1:
            # frame 1 pays the program compile (seconds warm-cache,
            # minutes cold on this remote-compile runtime); the steady
            # rate is the honest pipeline number
            msg += f'; steady {float(np.mean(deltas[1:])):.2f} s/frame'
        # phase means exclude the first frame, whose drain carries the
        # program compile on this remote-compile runtime; with a single
        # frame there is nothing steady to report — label it honestly
        if len(phase_s["drain"]) > 1:
            msg += (f'; steady per-frame drain '
                    f'{float(np.mean(phase_s["drain"][1:])):.2f} s, '
                    f'epilogue host '
                    f'{float(np.mean(phase_s["host"][1:])):.2f} s')
        else:
            msg += (f'; frame-1 drain (incl. compile) '
                    f'{phase_s["drain"][0]:.2f} s, epilogue host '
                    f'{phase_s["host"][0]:.2f} s')
        print(msg + ')', flush=True)

    if args.dataset_name in ('blender', 'llff') or \
            (args.dataset_name == 'phototourism' and args.split == 'test'):
        path = os.path.join(dir_name, f'{args.scene_name}.{args.video_format}')
        try:
            imageio.mimsave(path, imgs, fps=30)
        except Exception as e:  # mp4 needs an ffmpeg backend
            fallback = os.path.join(dir_name, f'{args.scene_name}.gif')
            print(f'[eval] {args.video_format} writer unavailable ({e}); '
                  f'writing {fallback}')
            imageio.mimsave(fallback, imgs, fps=30)

    if ssims:
        print(f'Mean SSIM : {np.mean(ssims):.4f}')
    if psnrs:
        mean_psnr = np.mean(psnrs)
        print(f'Mean PSNR : {mean_psnr:.2f}')
        return mean_psnr
    return None


if __name__ == "__main__":
    main(get_opts())
