"""Training CLI flags.

Flag-for-flag surface of reference opt.py:3-109 (flags ARE the public API —
BASELINE.json north star), plus TPU-native extras at the bottom.
"""
import argparse


def get_parser():
    parser = argparse.ArgumentParser()

    parser.add_argument('--root_dir', type=str, required=True,
                        help='dataset root folder')
    parser.add_argument('--dataset_name', type=str, default='blender',
                        choices=['blender', 'phototourism'],
                        help='dataset family to train and validate on')
    # blender-family options
    parser.add_argument('--data_perturb', nargs="+", type=str, default=[],
                        help='synthetic-data corruptions to apply: any of "color" '
                             '(per-image color jitter) and "occ" (random '
                             'occluder stripes); empty for clean data')
    parser.add_argument('--img_wh', nargs="+", type=int, default=[800, 800],
                        help='training image resolution as WIDTH HEIGHT')
    # phototourism-family options
    parser.add_argument('--img_downscale', type=int, default=1,
                        help='phototourism image downscale factor')
    parser.add_argument('--use_cache', default=False, action="store_true",
                        help='load the prepare_phototourism.py ray cache (its img_downscale '
                             'must match)')

    # core NeRF sampling/encoding
    parser.add_argument('--N_emb_xyz', type=int, default=10,
                        help='positional-encoding frequency count for xyz')
    parser.add_argument('--N_emb_dir', type=int, default=4,
                        help='positional-encoding frequency count for view directions')
    parser.add_argument('--N_samples', type=int, default=64,
                        help='stratified samples per ray (coarse pass)')
    parser.add_argument('--N_importance', type=int, default=128,
                        help='importance samples per ray (fine pass)')
    parser.add_argument('--use_disp', default=False, action="store_true",
                        help='sample linearly in disparity instead of depth')
    parser.add_argument('--perturb', type=float, default=1.0,
                        help='jitter amplitude for stratified depth samples (0 = deterministic)')
    parser.add_argument('--noise_std', type=float, default=1.0,
                        help='sigma-regularizing noise std (pre-activation)')

    # NeRF-W (appearance/transient) options
    parser.add_argument('--N_vocab', type=int, default=100,
                        help='embedding-table size; must exceed the largest image id '
                             'in the dataset')
    parser.add_argument('--encode_a', default=False, action="store_true",
                        help='learn per-image appearance embeddings (NeRF-A)')
    parser.add_argument('--N_a', type=int, default=48,
                        help='appearance embedding width')
    parser.add_argument('--encode_t', default=False, action="store_true",
                        help='learn the transient head with uncertainty (NeRF-U)')
    parser.add_argument('--N_tau', type=int, default=16,
                        help='transient embedding width')
    parser.add_argument('--beta_min', type=float, default=0.1,
                        help='floor added to the composited uncertainty beta')

    # BARF pose refinement
    parser.add_argument('--refine_pose', default=False, action="store_true",
                        help='jointly optimize camera poses (BARF-style so(3)+t deltas '
                             'with annealed positional encoding)')

    parser.add_argument('--batch_size', type=int, default=1024,
                        help='rays per training step')
    parser.add_argument('--chunk', type=int, default=32*1024,
                        help='fixed render-chunk size for val/eval (device '
                             'batches are static-shape; training never chunks)')
    parser.add_argument('--num_epochs', type=int, default=16,
                        help='epochs to train')
    parser.add_argument('--num_gpus', type=int, default=1,
                        help='data-parallel device count (the mesh "data" axis)')

    parser.add_argument('--ckpt_path', type=str, default=None,
                        help='pretrained checkpoint path to load; "auto" '
                             'resumes from the newest epoch=N.ckpt under '
                             'save_path/exp_name (preemption-safe restarts)')
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

    # ---- TPU-native extras (not in the reference CLI) ----
    parser.add_argument('--compute_dtype', type=str, default='float32',
                        choices=['float32', 'bfloat16'],
                        help='MLP matmul dtype (bfloat16 uses the MXU at '
                             'double rate; accumulation stays float32)')
    parser.add_argument('--model_parallel', type=int, default=1,
                        help='tensor-parallel degree over the mesh "model" axis')
    parser.add_argument('--use_pallas', type=str, default='auto',
                        choices=['auto', 'on', 'off'],
                        help='fused Pallas MLP kernel (auto = backend default)')
    parser.add_argument('--fast_trig', type=str, default='auto',
                        choices=['auto', 'on', 'off'],
                        help='polynomial PE sin/cos, error ~1e-6 '
                             '(auto = on for bfloat16 compute)')
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
