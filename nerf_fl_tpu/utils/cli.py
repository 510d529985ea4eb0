"""Shared CLI flag definitions for train (opt.py) and eval (eval.py).

The reference duplicates its argparse surface between opt.py:3-109 and
eval.py:20-77 and the two drift (eval grows --scene_name/--split/
--video_format and a larger default chunk).  Our CLIs have MORE knobs, so
every flag available to both is declared exactly once here; the per-mode
differences are explicit overrides:

  * --chunk default: train 32768 (val renders), eval 131072 (the reference
    eval default is larger too, eval.py:67-68)
  * --ckpt_path: optional at train (resume path / "auto"), required at eval
  * --refine_pose / --num_gpus: same type+default, mode-specific help

tests/test_cli_flags.py asserts the two parsers agree on every shared
flag's type/choices/default so the surfaces can't drift again.
"""
from __future__ import annotations

# Each entry: (flag, kwargs, per-mode overrides).  Overrides map mode name
# ('train' | 'eval') -> kwargs replaced for that mode.
_SHARED = [
    ("--root_dir", dict(type=str, required=True,
                        help="dataset root folder"), {}),
    ("--dataset_name", dict(type=str, default="blender",
                            choices=["blender", "phototourism", "llff"],
                            help="dataset family (llff is CLI-reachable "
                                 "here, unlike the reference whose LLFF "
                                 "loader is vestigial — opt.py:8-10, "
                                 "datasets/llff.py)"), {}),
    ("--img_wh", dict(nargs="+", type=int, default=[800, 800],
                      help="image resolution as WIDTH HEIGHT"), {}),
    ("--img_downscale", dict(type=int, default=1,
                             help="phototourism image downscale factor"), {}),
    ("--use_cache", dict(default=False, action="store_true",
                         help="load the prepare_phototourism.py ray cache "
                              "(its img_downscale must match)"), {}),
    ("--spheric_poses", dict(default=False, action="store_true",
                             help="llff only: inward-facing capture — "
                                  "sample in world depth with a spheric "
                                  "test path instead of NDC + spiral"), {}),

    # core NeRF sampling/encoding
    ("--N_emb_xyz", dict(type=int, default=10,
                         help="positional-encoding frequency count for xyz"),
     {}),
    ("--N_emb_dir", dict(type=int, default=4,
                         help="positional-encoding frequency count for view "
                              "directions"), {}),
    ("--N_samples", dict(type=int, default=64,
                         help="stratified samples per ray (coarse pass)"), {}),
    ("--N_importance", dict(type=int, default=128,
                            help="importance samples per ray (fine pass)"),
     {}),
    ("--use_disp", dict(default=False, action="store_true",
                        help="sample linearly in disparity instead of depth"),
     {}),

    # NeRF-W options
    ("--N_vocab", dict(type=int, default=100,
                       help="embedding-table size; must exceed the largest "
                            "image id in the dataset"), {}),
    ("--encode_a", dict(default=False, action="store_true",
                        help="per-image appearance embeddings (NeRF-A)"), {}),
    ("--N_a", dict(type=int, default=48,
                   help="appearance embedding width"), {}),
    ("--encode_t", dict(default=False, action="store_true",
                        help="transient head with uncertainty (NeRF-U)"), {}),
    ("--N_tau", dict(type=int, default=16,
                     help="transient embedding width"), {}),
    ("--beta_min", dict(type=float, default=0.1,
                        help="floor added to the composited uncertainty "
                             "beta"), {}),

    ("--refine_pose", dict(default=False, action="store_true"),
     {"train": dict(help="jointly optimize camera poses (BARF-style "
                         "so(3)+t deltas with annealed positional "
                         "encoding)"),
      "eval": dict(help="apply learned pose deltas from the checkpoint "
                        "and render at the checkpoint's PE-annealing "
                        "epoch")}),
    ("--barf_schedule", dict(type=str, default="fork",
                             choices=["fork", "paper"],
                             help="PE-annealing rule under --refine_pose: "
                                  "'fork' reproduces reference "
                                  "nerf.py:47-59 (alpha=N/epoch vs the "
                                  "frequency VALUE 2^k — permanently "
                                  "low-passes the field, bands 4..9 never "
                                  "activate); 'paper' is BARF eq. 14 "
                                  "(linear alpha vs the frequency index), "
                                  "the rule that actually recovers pose "
                                  "noise"), {}),
    ("--barf_epochs", dict(nargs=2, type=int, default=[4, 8],
                           metavar=("START", "END"),
                           help="PE-annealing window in epochs (the "
                                "reference hardcodes 4 8 at "
                                "train.py:43-44)"), {}),

    ("--chunk", dict(type=int),
     {"train": dict(default=32 * 1024,
                    help="fixed render-chunk size for val/eval (device "
                         "batches are static-shape; training never chunks)"),
      "eval": dict(default=32 * 1024 * 4,
                   help="rays per fixed-shape render program")}),

    ("--num_gpus", dict(type=int, default=1),
     {"train": dict(help='data-parallel device count (the mesh "data" '
                         'axis)'),
      "eval": dict(help="shard each render chunk over this many chips "
                        "(data-parallel evaluation; the reference eval is "
                        "single-GPU)")}),

    ("--ckpt_path", dict(type=str),
     {"train": dict(default=None,
                    help='pretrained checkpoint path to load; "auto" '
                         'resumes from the newest epoch=N.ckpt under '
                         'save_path/exp_name (preemption-safe restarts)'),
      "eval": dict(required=True, help="checkpoint to render")}),

    # ---- TPU-native extras shared by both CLIs ----
    ("--compute_dtype", dict(type=str, default="float32",
                             choices=["float32", "bfloat16"],
                             help="MLP matmul dtype (bfloat16 uses the MXU "
                                  "at double rate; accumulation stays "
                                  "float32)"), {}),
    ("--use_pallas", dict(type=str, default="auto",
                          choices=["auto", "on", "off"],
                          help="fused Pallas MLP kernel (auto = backend "
                               "default)"), {}),
    ("--fast_trig", dict(type=str, default="auto",
                         choices=["auto", "on", "off"],
                         help="polynomial PE sin/cos, error ~1e-6 "
                              "(auto = on for bfloat16 compute)"), {}),
    ("--remat_mlp", dict(action="store_true",
                         help="jax.checkpoint the field MLP: recompute "
                              "trunk activations in the backward instead "
                              "of streaming them from HBM (A/B lever; "
                              "see docs/PERF.md round-5 remat probe)"), {}),
    ("--mlp_depth", dict(type=int, default=8,
                         help="field MLP trunk depth D (reference "
                              "nerf.py:81 constructor arg, hardcoded 8 at "
                              "its call sites; skip connection at D//2)"), {}),
    ("--mlp_width", dict(type=int, default=256,
                         help="field MLP hidden width W (reference "
                              "nerf.py:82, hardcoded 256)"), {}),
]

# --steps_per_execution is deliberately train-only: it folds K OPTIMIZER
# steps into one dispatch via lax.scan; rendering has no optimizer loop and
# eval's dispatch amortization is the chunk size itself.


def shared_flag_names():
    return [flag for flag, _, _ in _SHARED]


def add_shared_flags(parser, mode):
    """Install the shared train/eval flag surface onto ``parser``."""
    assert mode in ("train", "eval"), mode
    for flag, kwargs, overrides in _SHARED:
        kw = dict(kwargs)
        kw.update(overrides.get(mode, {}))
        parser.add_argument(flag, **kw)
    return parser
