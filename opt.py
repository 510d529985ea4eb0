"""Training CLI flags.

Flag-for-flag surface of reference opt.py:3-109 (flags ARE the public API —
BASELINE.json north star), plus TPU-native extras at the bottom.  Every flag
shared with eval.py is declared once in nerf_fl_tpu/utils/cli.py so the two
surfaces cannot drift (the reference duplicates its parser and they do).
"""
import argparse

from nerf_fl_tpu.utils.cli import add_shared_flags


def get_parser():
    parser = argparse.ArgumentParser()
    add_shared_flags(parser, "train")

    # blender-family options
    parser.add_argument('--data_perturb', nargs="+", type=str, default=[],
                        help='synthetic-data corruptions to apply: any of "color" '
                             '(per-image color jitter) and "occ" (random '
                             'occluder stripes); empty for clean data')

    # BARF evaluation harness: inject seeded SE(3) noise into the INITIAL
    # camera poses so --refine_pose has a known error to recover (the
    # pose-noise -> recovery protocol of the BARF paper sec. 5; no
    # reference equivalent — its pose refinement ships untested)
    parser.add_argument('--pose_noise', nargs=2, type=float, default=[0, 0],
                        metavar=('ROT_DEG', 'TRANS_FRAC'),
                        help='per-camera init-pose noise: rotation sigma in '
                             'degrees and translation sigma as a fraction '
                             'of the camera distance; the clean poses are '
                             'kept for error reporting '
                             '(models/poses.py pose_errors)')
    parser.add_argument('--pose_noise_seed', type=int, default=0)
    parser.add_argument('--pose_lr_mult', type=float, default=1.0,
                        help='lr multiplier for the learned pose deltas '
                             'relative to the model lr (BARF paper sec. 5 '
                             'uses 2x: 1e-3 vs 5e-4; the reference trains '
                             'poses at the model lr, train.py:135-136)')
    parser.add_argument('--pose_warmup_epochs', type=float, default=0.0,
                        help='hold pose deltas FIXED for the first N '
                             '(fractional) epochs: during the early white-'
                             'background-collapse phase pose gradients are '
                             'noise and Adam random-walks the poses out of '
                             'the registration basin (measured 2.0 -> 5.3 '
                             'deg in 2 epochs; docs/QUALITY.md BARF '
                             'section). 0 = reference-parity behavior')

    # train-time sampling stochasticity (eval always renders perturb=0,
    # noise_std=0, matching reference eval.py test_time semantics)
    parser.add_argument('--perturb', type=float, default=1.0,
                        help='jitter amplitude for stratified depth samples (0 = deterministic)')
    parser.add_argument('--noise_std', type=float, default=1.0,
                        help='sigma-regularizing noise std (pre-activation)')

    parser.add_argument('--batch_size', type=int, default=1024,
                        help='rays per training step')
    parser.add_argument('--num_epochs', type=int, default=16,
                        help='epochs to train')

    parser.add_argument('--prefixes_to_ignore', nargs='+', type=str, default=['loss'],
                        help='parameter-name prefixes skipped when loading a stripped/partial '
                             'checkpoint')

    parser.add_argument('--optimizer', type=str, default='adam',
                        help='optimizer',
                        choices=['sgd', 'adam', 'radam', 'ranger'])
    parser.add_argument('--lr', type=float, default=5e-4,
                        help='base learning rate')
    parser.add_argument('--momentum', type=float, default=0.9,
                        help='momentum (sgd)')
    parser.add_argument('--weight_decay', type=float, default=0,
                        help='L2 weight decay')
    parser.add_argument('--lr_scheduler', type=str, default='steplr',
                        help='learning-rate schedule',
                        choices=['steplr', 'cosine', 'poly'])
    # LR warmup (active for sgd/adam)
    parser.add_argument('--warmup_multiplier', type=float, default=1.0,
                        help='target multiplier reached at the end of the warmup ramp')
    parser.add_argument('--warmup_epochs', type=int, default=0,
                        help='epochs of linear LR warmup before the schedule takes over')
    # steplr schedule
    parser.add_argument('--decay_step', nargs='+', type=int, default=[20],
                        help='epochs at which steplr multiplies the LR by decay_gamma')
    parser.add_argument('--decay_gamma', type=float, default=0.1,
                        help='steplr decay multiplier')
    # poly schedule
    parser.add_argument('--poly_exp', type=float, default=0.9,
                        help='poly schedule exponent')

    parser.add_argument('--exp_name', type=str, default='exp',
                        help='experiment name (checkpoint/log subfolder)')
    parser.add_argument('--save_path', type=str, default='./ckpts',
                        help='checkpoint output root')
    parser.add_argument('--refresh_every', type=int, default=1,
                        help='console progress-line cadence in steps (0 '
                             'disables; uses the last logged metrics, so '
                             'printing never syncs the device)')

    # ---- TPU-native extras not meaningful at eval ----
    parser.add_argument('--model_parallel', type=int, default=1,
                        help='tensor-parallel degree over the mesh "model" axis')
    parser.add_argument('--num_hosts', type=int, default=1,
                        help='processes in a multi-host job; >1 connects '
                             'jax.distributed before backend init. '
                             '--num_gpus stays the TOTAL chip count across '
                             'hosts; the batch is sharded globally and '
                             'gradients all-reduce over ICI/DCN')
    parser.add_argument('--host_index', type=int, default=0,
                        help='this process\'s index in [0, num_hosts)')
    parser.add_argument('--coordinator_address', type=str,
                        default='localhost:12321',
                        help='host:port of process 0 for jax.distributed')
    parser.add_argument('--microbatch', type=int, default=1,
                        help='accumulate the gradient over this many equal '
                             'batch slices inside the step (one optimizer '
                             'update).  Large batches regain the b1024 '
                             'program\'s VMEM-friendly compilation: b4096 '
                             'matmuls stream at ~700 GB/s monolithic vs '
                             '~1050 GB/s microbatched (docs/PERF.md)')
    parser.add_argument('--device_pool', type=str, default='auto',
                        choices=['auto', 'on', 'off'],
                        help='keep the whole training ray pool in device '
                             'HBM and draw batches on device (zero host '
                             'work per step); auto = on single-process '
                             'when the pool is <= 2 GiB')
    parser.add_argument('--steps_per_execution', type=int, default=1,
                        help='optimizer steps folded into one compiled '
                             'dispatch via lax.scan (same math up to '
                             'float32 roundoff; amortizes per-call '
                             'dispatch latency on remote/tunneled device '
                             'runtimes)')
    parser.add_argument('--seed', type=int, default=0,
                        help='PRNG seed for init, shuffling and sampling')
    parser.add_argument('--log_every', type=int, default=50,
                        help='scalar-logging period in steps')
    parser.add_argument('--profile_dir', type=str, default=None,
                        help='capture a jax.profiler trace of training steps '
                             '100-120 into this directory (TensorBoard-viewable)')

    return parser


def get_opts(argv=None):
    return get_parser().parse_args(argv)
