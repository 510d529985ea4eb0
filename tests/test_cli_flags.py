"""CLI flag-surface parity: every documented reference command parses.

The reference's flags ARE its public API (SURVEY.md section 5 /
BASELINE.json north star); these are the verbatim training and eval commands
from the reference README (README.md:52-120) and BASELINE.json configs.
"""
import shlex

import pytest

import eval as eval_cli
from opt import get_opts

REFERENCE_TRAIN_COMMANDS = [
    # README.md lego recipes
    "--dataset_name blender --root_dir /d/lego --N_importance 64 "
    "--img_wh 400 400 --noise_std 0 --num_epochs 20 --batch_size 1024 "
    "--optimizer adam --lr 5e-4 --lr_scheduler cosine --exp_name exp",
    "--dataset_name blender --root_dir /d/lego --N_importance 64 "
    "--img_wh 400 400 --noise_std 0 --num_epochs 20 --batch_size 1024 "
    "--optimizer adam --lr 5e-4 --lr_scheduler cosine --exp_name exp "
    "--data_perturb color --encode_a",
    "--dataset_name blender --root_dir /d/lego --N_importance 64 "
    "--img_wh 400 400 --noise_std 0 --num_epochs 20 --batch_size 1024 "
    "--optimizer adam --lr 5e-4 --lr_scheduler cosine --exp_name exp "
    "--data_perturb occ --encode_t --beta_min 0.1",
    "--dataset_name blender --root_dir /d/lego --N_importance 64 "
    "--img_wh 400 400 --noise_std 0 --num_epochs 20 --batch_size 1024 "
    "--optimizer adam --lr 5e-4 --lr_scheduler cosine --exp_name exp "
    "--data_perturb color occ --encode_a --encode_t",
    # README.md phototourism recipe
    "--root_dir /d/brandenburg_gate --dataset_name phototourism "
    "--img_downscale 8 --use_cache --N_importance 64 --N_samples 64 "
    "--encode_a --encode_t --beta_min 0.03 --N_vocab 1500 "
    "--num_epochs 20 --batch_size 1024 --optimizer adam --lr 5e-4 "
    "--lr_scheduler cosine --exp_name brandenburg_scale8_nerfw",
    # BARF
    "--dataset_name blender --root_dir /d/lego --refine_pose "
    "--N_importance 64 --img_wh 400 400",
    # optimizer/scheduler variants
    "--root_dir /d/x --optimizer sgd --momentum 0.9 --weight_decay 1e-4 "
    "--lr_scheduler steplr --decay_step 10 20 --decay_gamma 0.5",
    "--root_dir /d/x --optimizer radam --lr_scheduler poly --poly_exp 2",
    "--root_dir /d/x --optimizer ranger --warmup_epochs 2 "
    "--warmup_multiplier 2.0",
    "--root_dir /d/x --ckpt_path ck.ckpt --prefixes_to_ignore loss model",
    "--root_dir /d/x --use_disp --perturb 0 --chunk 16384 --num_gpus 8",
]

REFERENCE_EVAL_COMMANDS = [
    "--root_dir /d/lego --dataset_name blender --scene_name lego "
    "--split test --img_wh 400 400 --N_importance 64 --ckpt_path c.ckpt",
    "--root_dir /d/brandenburg_gate --dataset_name phototourism "
    "--scene_name brandenburg_test --split test --img_wh 320 240 "
    "--img_downscale 8 --N_importance 64 --N_samples 64 --encode_a "
    "--encode_t --N_vocab 1500 --ckpt_path c.ckpt --video_format mp4",
    "--root_dir /d/x --split test_train --ckpt_path c.ckpt --chunk 65536",
    "--root_dir /d/x --split val --ckpt_path c.ckpt --use_cache",
]


@pytest.mark.parametrize("cmd", REFERENCE_TRAIN_COMMANDS)
def test_train_flags_parse(cmd):
    hp = get_opts(shlex.split(cmd))
    assert hp.root_dir


@pytest.mark.parametrize("cmd", REFERENCE_EVAL_COMMANDS)
def test_eval_flags_parse(cmd):
    args = eval_cli.get_opts(shlex.split(cmd))
    assert args.ckpt_path


def test_train_eval_flag_surfaces_cannot_drift():
    """Every shared flag must agree between the two parsers on type,
    choices and default, except the documented intentional differences
    (nerf_fl_tpu/utils/cli.py docstring): --chunk default and --ckpt_path
    requiredness.  The reference's duplicated parsers drifted; ours are
    generated from one table, and this pins the table's contract."""
    import argparse

    from nerf_fl_tpu.utils.cli import add_shared_flags, shared_flag_names
    from opt import get_parser

    t_actions = {a.option_strings[0]: a for a in get_parser()._actions
                 if a.option_strings}
    ep = argparse.ArgumentParser()
    add_shared_flags(ep, "eval")
    e_actions = {a.option_strings[0]: a for a in ep._actions
                 if a.option_strings}

    exceptions = {"--chunk": {"default"}, "--ckpt_path": {"default",
                                                          "required"}}
    shared = shared_flag_names()
    assert "--use_pallas" in shared and "--compute_dtype" in shared
    for flag in shared:
        assert flag in t_actions, f"{flag} missing from train parser"
        assert flag in e_actions, f"{flag} missing from eval parser"
        ta, ea = t_actions[flag], e_actions[flag]
        for attr in ("type", "choices", "default", "nargs", "required"):
            if attr in exceptions.get(flag, ()):
                continue
            assert getattr(ta, attr, None) == getattr(ea, attr, None), \
                f"{flag}.{attr} drifted: {getattr(ta, attr, None)} vs " \
                f"{getattr(ea, attr, None)}"


def test_eval_has_train_render_knobs():
    """VERDICT r2 weak item 6: eval must expose the perf knobs train has
    (--use_pallas; --steps_per_execution is train-only by design — it folds
    OPTIMIZER steps, and rendering has no optimizer loop)."""
    args = eval_cli.get_opts(["--root_dir", "/d", "--ckpt_path", "c.ckpt",
                              "--use_pallas", "off",
                              "--compute_dtype", "bfloat16",
                              "--fast_trig", "on"])
    assert args.use_pallas == "off"
    assert args.compute_dtype == "bfloat16"


def test_reference_defaults_preserved():
    hp = get_opts(["--root_dir", "/d"])
    # reference opt.py defaults, line for line
    assert hp.dataset_name == "blender"
    assert hp.img_wh == [800, 800]
    assert hp.N_emb_xyz == 10 and hp.N_emb_dir == 4
    assert hp.N_samples == 64 and hp.N_importance == 128
    assert hp.perturb == 1.0 and hp.noise_std == 1.0
    assert hp.N_vocab == 100 and hp.N_a == 48 and hp.N_tau == 16
    assert hp.beta_min == 0.1
    assert hp.batch_size == 1024 and hp.chunk == 32 * 1024
    assert hp.num_epochs == 16 and hp.num_gpus == 1
    assert hp.optimizer == "adam" and hp.lr == 5e-4
    assert hp.lr_scheduler == "steplr" and hp.decay_step == [20]
    assert hp.decay_gamma == 0.1 and hp.poly_exp == 0.9
    assert hp.exp_name == "exp" and hp.save_path == "./ckpts"
    assert hp.prefixes_to_ignore == ["loss"]
