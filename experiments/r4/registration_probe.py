"""Pose-registration machinery probes (CPU, ~2 min total with a cached
checkpoint; ~15 min cold).

Why these exist: the device-scale BARF curve (barf_curve.py) initially
showed "loss descends while pose error grows", which smells like a broken
pose-gradient path.  These three probes separate machinery from landscape
and pin the cause (see docs/QUALITY.md "BARF pose refinement"):

  probe=landscape   Train a tiny clean field, freeze it, render targets
                    FROM the field at the true poses (so the true pose is
                    the exact photometric optimum by construction), then
                    sweep the loss along the injected-noise direction
                    pose(s) = exp(s*xi) @ true.  Result: loss(0) == 0
                    exactly (deterministic render) and loss is monotone in
                    s — the gradient path has a proper minimum at truth.

  probe=register    Same frozen field + self-consistent targets, Adam on
                    the per-camera (r, t) deltas at FULL positional
                    encoding.  Result: loss 1.4e-3 -> 3e-4 while rotation
                    error grows 1.0 -> 2.0 deg — descent into texture-
                    aliased LOCAL minima (each camera registers
                    independently against a checkered target; at full PE
                    the photometric well at truth is narrower than 1 deg).

  probe=lowpass     Identical, but the field is rendered low-pass (BARF
                    annealing weights at alpha=2, i.e. only the lowest PE
                    band).  Result: loss -> 0 and the rotation error
                    decreases monotonically after a short transient
                    (1.02 -> 0.61 deg at it=400, still falling) — exactly
                    the coarse-to-fine mechanism BARF's schedule exists to
                    exploit, and proof the gradient machinery is correct
                    end-to-end.

Run:  python experiments/r4/registration_probe.py [landscape|register|lowpass]
"""
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
from dataclasses import replace as _rp  # noqa: E402

from opt import get_opts  # noqa: E402
from nerf_fl_tpu.models.poses import (all_poses, perturb_poses,  # noqa: E402
                                      pose_errors)
from nerf_fl_tpu.training.logging import NullLogger  # noqa: E402
from nerf_fl_tpu.training.system import (NeRFSystem,  # noqa: E402
                                         assemble_world_rays, make_train_step,
                                         render_chunked)

SCENE = os.environ.get("PROBE_SCENE", "/tmp/reg_probe_scene")
CK = os.environ.get("PROBE_CK", "/tmp/reg_probe_ck")
T0 = time.perf_counter()


def build_system():
    """Tiny clean field: 16 views, 64^2, 16+16 samples, 4x64 MLP, 6 epochs
    (auto-resumes from CK on reruns)."""
    from nerf_fl_tpu.data.synthetic import make_blender_scene
    if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
        make_blender_scene(SCENE, n_train=16, n_val=2, n_test=2, size=64,
                           texture=True)
    argv = ["--root_dir", SCENE, "--dataset_name", "blender",
            "--img_wh", "64", "64", "--N_samples", "16",
            "--N_importance", "16", "--mlp_depth", "4", "--mlp_width", "64",
            "--batch_size", "512", "--noise_std", "0", "--num_epochs", "6",
            "--lr_scheduler", "cosine",
            "--pose_noise", "1e-12", "1e-12",   # forces the camdir ray path
            "--save_path", CK, "--refresh_every", "0",
            "--ckpt_path", "auto", "--exp_name", "probe"]
    system = NeRFSystem(get_opts(argv), logger=NullLogger())
    system.setup()
    system.configure()
    system.fit()   # no-op when fully resumed
    return system


def params_at(system, poses):
    p = dict(system.params)
    lp = dict(p["learn_poses"])
    lp["init_c2w"] = jnp.asarray(np.asarray(poses, np.float32))
    lp["r"] = jnp.zeros_like(lp["r"])
    lp["t"] = jnp.zeros_like(lp["t"])
    p["learn_poses"] = lp
    return p


def render_all(system, p, cfg, anneal_ep):
    rays = jnp.asarray(np.asarray(system.train_dataset.all_rays, np.float32))
    ts = jnp.asarray(np.asarray(system.train_dataset.all_ts, np.int32))
    idmap = (jnp.asarray(system.id_to_cam)
             if system.id_to_cam is not None else None)
    world = assemble_world_rays(p, rays, ts, ray_format=system.ray_format,
                                id_to_cam=idmap)
    res = render_chunked(p, np.asarray(world), np.asarray(ts), cfg,
                         chunk=4096, test_time=False, epoch=anneal_ep,
                         rng=jax.random.PRNGKey(7), keys=("rgb_coarse",))
    return np.asarray(res["rgb_coarse"], np.float32)


def se3_interp(true, noisy, s):
    """pose(s) = exp(s * log(noisy @ inv(true))) @ true, per camera."""
    out = np.empty_like(true)
    for i in range(len(true)):
        D = noisy[i] @ np.linalg.inv(true[i])
        R = D[:3, :3]
        cos = np.clip((np.trace(R) - 1) / 2, -1, 1)
        th = np.arccos(cos)
        if th < 1e-12:
            Rs = np.eye(3)
        else:
            w = (R - R.T) / (2 * np.sin(th))
            ax = np.array([w[2, 1], w[0, 2], w[1, 0]])
            K = np.zeros((3, 3))
            K[0, 1], K[0, 2] = -ax[2], ax[1]
            K[1, 0], K[1, 2] = ax[2], -ax[0]
            K[2, 0], K[2, 1] = -ax[1], ax[0]
            Rs = (np.eye(3) + np.sin(s * th) * K
                  + (1 - np.cos(s * th)) * K @ K)
        Ds = np.eye(4)
        Ds[:3, :3] = Rs
        Ds[:3, 3] = s * D[:3, 3]
        out[i] = Ds @ true[i]
    return out


def probe_landscape(system, cfg, anneal_ep):
    true = np.asarray(system.true_poses, np.float64)
    target = render_all(system, params_at(system, true), cfg, anneal_ep)
    again = render_all(system, params_at(system, true), cfg, anneal_ep)
    print(f"determinism max|diff| = {np.abs(target - again).max()}",
          flush=True)
    noisy = perturb_poses(true, 1.0, 0.01, seed=0).astype(np.float64)
    for s in [0.0, 0.25, 0.5, 0.75, 1.0, 1.25]:
        ps = se3_interp(true, noisy, s)
        rgb = render_all(system, params_at(system, ps), cfg, anneal_ep)
        mse = float(np.mean((rgb - target) ** 2))
        r, t = pose_errors(ps, true, align=False)
        print(f"s={s:4.2f} rot {r:6.3f} deg trans {t:7.4f}  mse {mse:.3e}",
              flush=True)


def probe_register(system, cfg, anneal_ep):
    from types import SimpleNamespace
    from nerf_fl_tpu.training.optimizers import build_optimizer

    true = np.asarray(system.true_poses, np.float64)
    target = render_all(system, params_at(system, true), cfg, anneal_ep)
    noisy = perturb_poses(true, 1.0, 0.01, seed=0)
    params = params_at(system, noisy)
    r0, t0 = pose_errors(noisy, true, align=False)
    print(f"injected (raw): rot {r0:.3f} deg trans {t0:.4f}", flush=True)

    mask = jax.tree_util.tree_map(lambda _: False, params)
    mask["learn_poses"] = {k: (k in ("r", "t"))
                           for k in params["learn_poses"]}
    tx = build_optimizer(SimpleNamespace(optimizer="adam", weight_decay=0.0,
                                         momentum=0.0))
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, mask, loss_name=system.loss_name,
                           ray_format=system.ray_format,
                           id_to_cam=system.id_to_cam, donate=False)
    rays = np.asarray(system.train_dataset.all_rays, np.float32)
    ts = np.asarray(system.train_dataset.all_ts, np.int32)
    rng = jax.random.PRNGKey(0)
    B = 512
    order = np.random.default_rng(0).permutation(len(rays))
    for it in range(401):
        lo = (it * B) % (len(rays) - B)
        sel = order[lo:lo + B]
        batch = {"rays": jnp.asarray(rays[sel]), "ts": jnp.asarray(ts[sel]),
                 "rgbs": jnp.asarray(target[sel])}
        rng, sub = jax.random.split(rng)
        params, opt_state, m = step(params, opt_state, batch,
                                    jnp.float32(1e-3),
                                    jnp.float32(anneal_ep), sub)
        if it % 50 == 0:
            ref = np.asarray(all_poses(params["learn_poses"]))
            rr, tt = pose_errors(ref, true, align=False)
            ra, ta = pose_errors(ref, true, align=True)
            print(f"it {it:4d} loss {float(m['train/loss']):.5f} "
                  f"raw rot {rr:.3f} trans {tt:.4f} "
                  f"| aligned {ra:.3f}/{ta:.4f}", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "landscape"
    system = build_system()
    _, psnr, _ = system.run_validation(epoch=5, max_images=1)
    print(f"[+{time.perf_counter() - T0:.0f}s] clean field val PSNR "
          f"{psnr:.2f}", flush=True)
    # coarse-only: the nerfw loss sums coarse+fine terms against ONE
    # target, so self-consistency requires a single head.  eval_variant
    # sets perturb = noise_std = 0: every render below is deterministic.
    cfg = _rp(system.cfg.eval_variant(), N_importance=0)
    if which == "lowpass":
        # fork-rule alpha at epoch 5 is N_freqs/5 = 2: only the lowest
        # xyz band survives -> wide photometric basin
        cfg = _rp(cfg, refine_pose=True)
        anneal_ep = 5.0
    else:
        anneal_ep = 100.0   # full PE (any annealing schedule is saturated)
    if which == "landscape":
        probe_landscape(system, cfg, anneal_ep)
    else:
        probe_register(system, cfg, anneal_ep)
    print(f"[+{time.perf_counter() - T0:.0f}s] done", flush=True)


if __name__ == "__main__":
    main()
