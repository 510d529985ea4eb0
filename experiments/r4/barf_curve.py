"""BARF pose-noise -> recovery at device scale (VERDICT r3 item 3).

Three arms on the textured 800-native fixture at 200^2 / 64+64 — the
same protocol as tests/test_barf_recovery.py but at the scale the
docs/QUALITY.md table reports:

  clean       clean poses, no refinement       (upper bound)
  noisy_ctrl  sigma=3 deg rot + 2% trans noise, frozen poses (control)
  noisy_barf  same noise, --refine_pose --barf_schedule paper with
              --pose_warmup_epochs 2 (poses held until the field forms;
              without it the white-collapse phase random-walks them,
              docs/QUALITY.md BARF section)
  noisy_fork  same noise, --refine_pose with the reference's annealing
              rule (nerf.py:47-59), which permanently zeroes PE bands
              2^k >= N_freqs — documents WHY the reference never
              demonstrated its own headline feature

Prints the recovery table (aligned rot/trans error before/after, val and
test PSNR per arm) and writes experiments/r4/barf_curve.json.

Run (TPU, one process, ~30-45 min):
  nohup python experiments/r4/barf_curve.py > /tmp/barf_curve.log 2>&1 &
"""
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _REPO)

ROT_DEG, TRANS_FRAC = 3.0, 0.02
SCENE = os.environ.get("BARF_SCENE", "/tmp/barf_scene800")
CK = os.environ.get("BARF_CK", "/tmp/barf_ckpts")
EPOCHS = int(os.environ.get("BARF_EPOCHS", 20))
T0 = time.perf_counter()


def log(msg):
    print(f"[barf +{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def gauge_val_psnr(system, epoch: int, max_images: int = 2) -> float:
    """Val PSNR with the global SE(3) gauge removed (the BARF-paper eval
    convention): joint pose+scene refinement drifts the whole reconstruction
    into its own world frame, so clean-frame val cameras must be mapped into
    the refined frame (inv(T) @ c2w, T from Procrustes over the TRAIN poses)
    before rendering — raw val PSNR punishes a sharp-but-globally-shifted
    scene harder than the control's blurry-but-unshifted one."""
    import jax
    from nerf_fl_tpu.data.rays_np import get_rays
    from nerf_fl_tpu.models.poses import all_poses, gauge_transform
    from nerf_fl_tpu.training.system import render_chunked, val_chunk_cap

    refined = np.asarray(all_poses(system.params["learn_poses"]))
    T = gauge_transform(refined, system.true_poses)
    Tinv = np.linalg.inv(T)
    ds = system.val_dataset
    h = system.hparams
    psnrs = []
    for i in range(min(len(ds), max_images)):
        sample = ds[i]
        c2w = np.eye(4)
        c2w[:3, :4] = np.asarray(sample["c2w"], np.float64)
        cc = (Tinv @ c2w)[:3, :4].astype(np.float32)
        rays_o, rays_d = get_rays(ds.directions, cc)
        n_px = len(rays_o)
        rays = np.concatenate([
            rays_o, rays_d,
            np.full((n_px, 1), ds.near, np.float32),
            np.full((n_px, 1), ds.far, np.float32)], 1)
        res = render_chunked(
            system.params, rays, sample["ts"], system.cfg,
            chunk=val_chunk_cap(h.chunk, system.cfg.N_samples,
                                system.cfg.N_importance),
            test_time=False, epoch=float(epoch),
            rng=jax.random.PRNGKey(1000 + i),
            keys=("rgb_coarse", "rgb_fine"))
        typ = "fine" if "rgb_fine" in res else "coarse"
        mse = np.mean((np.asarray(res[f"rgb_{typ}"]) - sample["rgbs"]) ** 2)
        psnrs.append(-10.0 * np.log10(mse))
    return float(np.mean(psnrs))


def main():
    from nerf_fl_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from opt import get_opts
    from nerf_fl_tpu.models.poses import all_poses, pose_errors
    from nerf_fl_tpu.training.logging import NullLogger
    from nerf_fl_tpu.training.system import NeRFSystem

    if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
        log("generating 40-view textured 800-native fixture")
        from nerf_fl_tpu.data.synthetic import make_blender_scene
        make_blender_scene(SCENE, n_train=40, n_val=2, n_test=4, size=800,
                           texture=True)

    common = ["--root_dir", SCENE, "--dataset_name", "blender",
              "--img_wh", "200", "200", "--N_samples", "64",
              "--N_importance", "64", "--batch_size", "1024",
              "--noise_std", "0", "--num_epochs", str(EPOCHS),
              "--optimizer", "adam", "--lr", "5e-4",
              "--lr_scheduler", "cosine", "--compute_dtype", "bfloat16",
              "--steps_per_execution", "8",
              "--save_path", CK, "--refresh_every", "0"]
    noise = ["--pose_noise", str(ROT_DEG), str(TRANS_FRAC)]
    arms = {"clean": common + ["--exp_name", "clean"],
            "noisy_ctrl": common + noise + ["--exp_name", "noisy_ctrl"],
            "noisy_barf": common + noise + ["--refine_pose",
                                            "--barf_schedule", "paper",
                                            "--pose_warmup_epochs", "2",
                                            "--exp_name", "noisy_barf"],
            "noisy_fork": common + noise + ["--refine_pose",
                                            "--exp_name", "noisy_fork"]}

    out = {"rot_deg": ROT_DEG, "trans_frac": TRANS_FRAC, "epochs": EPOCHS,
           "recipe": "40v textured 800-native, 200^2, 64+64, b1024 bf16"}
    systems = {}
    for name, argv in arms.items():
        log(f"train {name}")
        system = NeRFSystem(get_opts(argv), logger=NullLogger())
        system.setup()
        system.configure()
        system.fit()
        _, psnr, _ = system.run_validation(epoch=EPOCHS - 1, max_images=2)
        out[name] = {"val_psnr": round(float(psnr), 2)}
        systems[name] = system
        log(f"{name}: val PSNR {psnr:.2f}")

    for arm in ("noisy_barf", "noisy_fork"):
        s = systems[arm]
        r_inj, t_inj = pose_errors(s.init_poses, s.true_poses)
        refined = np.asarray(all_poses(s.params["learn_poses"]))
        r_ref, t_ref = pose_errors(refined, s.true_poses)
        r_raw, t_raw = pose_errors(refined, s.true_poses, align=False)
        out[arm]["pose_error"] = {
            "rot_deg_injected": round(float(r_inj), 3),
            "rot_deg_refined_aligned": round(float(r_ref), 3),
            "rot_deg_refined_raw": round(float(r_raw), 3),
            "trans_injected": round(float(t_inj), 4),
            "trans_refined_aligned": round(float(t_ref), 4),
            "trans_refined_raw": round(float(t_raw), 4)}
        out[arm]["val_psnr_gauge"] = round(
            gauge_val_psnr(s, epoch=EPOCHS - 1), 2)
        log(f"{arm}: gauge-corrected val PSNR {out[arm]['val_psnr_gauge']}")
    gap = out["clean"]["val_psnr"] - out["noisy_ctrl"]["val_psnr"]
    rec = out["noisy_barf"]["val_psnr_gauge"] - out["noisy_ctrl"]["val_psnr"]
    out["psnr_gap_db"] = round(gap, 2)
    out["psnr_recovered_db"] = round(rec, 2)
    out["recovered_frac"] = round(rec / gap, 3) if gap > 0 else None
    out["wall_s"] = round(time.perf_counter() - T0, 1)

    path = os.path.join(_REPO, "experiments/r4/barf_curve.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
