"""One-command quality regression gate (VERDICT r3 item 1).

Regenerates the textured synthetic fixture, trains the 7-arm README
config matrix (reference README.md:141-173: clean / color / occ /
color+occ x {NeRF, NeRF-A, NeRF-U, NeRF-W}), evals BOTH NeRF-W
conventions (raw a_id=0 and the paper's --optimize_appearance protocol),
asserts the reference table's orderings and margins, and emits
QUALITY_GATE.json + a markdown table.

Presets:
  quick  CPU-viable reduced scale (small MLP via --mlp_depth/--mlp_width,
         64^2 train res, 16+16 samples) — the `pytest -m quality` tier.
  full   the round-3 qmt100 recipe (100 views, 200^2, 10 epochs) — TPU.
  e20    the definitive matrix (100 views, 200^2, 20 epochs = the README
         recipe scale) — TPU; reproduces docs/QUALITY.md's e20 table.

The gate is resume-friendly: arms with an existing final checkpoint skip
training, arms with a parsed "Mean PSNR" eval log skip eval — safe to
re-run after an interruption.  Everything runs through the public
train.py/eval.py CLIs, so the gate exercises the exact user path.

Usage:
  python tools/quality_gate.py --preset quick
  python tools/quality_gate.py --preset e20 --workdir /tmp/qgate_e20
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)

# Each arm: (name, data_perturb, model flags shared by train+eval).
ARMS = [
    ("clean", [], []),
    ("color_nerf", ["color"], []),
    ("color_nerfa", ["color"], ["--encode_a"]),
    ("occ_nerf", ["occ"], []),
    ("occ_nerfu", ["occ"], ["--encode_t", "--beta_min", "0.1"]),
    ("co_nerf", ["color", "occ"], []),
    ("co_nerfw", ["color", "occ"],
     ["--encode_a", "--encode_t", "--beta_min", "0.1"]),
]

PRESETS = {
    # machinery smoke (tests/test_quality_gate.py): exercises every arm,
    # both eval conventions and the JSON/markdown artifacts at seconds-per-
    # arm scale.  Margins are sentinels — 1 epoch of a 2x32 MLP at 40^2
    # proves the PLUMBING, not the science (that's `quick` and up).
    "smoke": dict(
        n_train=6, n_val=2, n_test=2, native=800, img_wh=40,
        batch=128, epochs=1, samples=(8, 8), mlp=(2, 32),
        dtype="float32", spe=1, platform="cpu",
        margins={"color_nerfa_vs_nerf": -99, "occ_nerfu_vs_nerf": -99,
                 "co_nerfw_opta_vs_nerf": -99, "clean_minus_best": -99,
                 "perturb_hurts": -99}),
    # CPU-viable: small MLP + 64^2 + 16+16 keeps one arm at minutes-scale
    # on a single core.  GATES machinery + fixture sanity (clean on top,
    # both perturbations measurably hurt the plain model); the head-vs-
    # control margins are REPORT-ONLY (None) — measured on this box
    # (docs/QUALITY.md round-4 section), NeRF-A/U score BELOW their plain
    # controls at this scale (20.09 vs 20.30 / 18.44 vs 19.79): the
    # advantages need full training scale, exactly like round 3's fixture
    # ladder showed for raw co_nerfw.  The science margins are gated by
    # the TPU presets below.
    "quick": dict(
        n_train=40, n_val=2, n_test=4, native=800, img_wh=64,
        batch=256, epochs=3, samples=(16, 16), mlp=(4, 64),
        dtype="float32", spe=1, platform="cpu",
        # (ordering assertions, min margin dB; None = report, don't gate)
        margins={"color_nerfa_vs_nerf": None, "occ_nerfu_vs_nerf": None,
                 "co_nerfw_opta_vs_nerf": None, "clean_minus_best": -0.5,
                 "perturb_hurts": 0.15}),
    # round-3 qmt100 recipe (docs/QUALITY.md): measured margins +7.4
    # (opta) / +2.6 (A) / +15 (U); assert half of each.
    "full": dict(
        n_train=100, n_val=4, n_test=8, native=800, img_wh=200,
        batch=1024, epochs=10, samples=(64, 64), mlp=(8, 256),
        dtype="bfloat16", spe=8,
        margins={"color_nerfa_vs_nerf": 1.0, "occ_nerfu_vs_nerf": 4.0,
                 "co_nerfw_opta_vs_nerf": 3.0, "clean_minus_best": -0.5}),
    # the definitive e20/t100 matrix: measured +2.95 / +15.7 / +8.7.
    "e20": dict(
        n_train=100, n_val=4, n_test=8, native=800, img_wh=200,
        batch=1024, epochs=20, samples=(64, 64), mlp=(8, 256),
        dtype="bfloat16", spe=8,
        margins={"color_nerfa_vs_nerf": 1.5, "occ_nerfu_vs_nerf": 6.0,
                 "co_nerfw_opta_vs_nerf": 4.0, "clean_minus_best": -0.5}),
}


def log(msg):
    print(f"[quality_gate +{time.perf_counter() - T0:7.1f}s] {msg}",
          flush=True)


T0 = time.perf_counter()

# honesty counters for the artifact: a resume run that re-scores parsed
# logs in seconds must be distinguishable from a fresh end-to-end run
STATS = {"arms_trained": 0, "evals_run": 0}


def git_sha():
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=_REPO, text=True).strip()
    except Exception:
        return None


def write_artifact(out_json, result):
    """Atomic write stamped with git SHA + time, so a stale PASSING
    artifact can never masquerade as current (r4 verdict item 8); the
    crash path in main() writes a pass:false artifact through here too
    (r4 weak #7: an arm crash used to leave the old artifact in place)."""
    result = dict(result, git_sha=git_sha(),
                  generated_at=time.strftime("%Y-%m-%dT%H:%M:%S%z"),
                  arms_trained=STATS["arms_trained"],
                  evals_run=STATS["evals_run"])
    tmp = out_json + ".tmp"
    with open(tmp, "w") as f:
        json.dump(result, f, indent=1)
    os.replace(tmp, out_json)


def run_cmd(cmd, logfile, timeout, platform=None, cwd=_REPO):
    env = dict(os.environ)
    if platform:  # see nerf_fl_tpu/utils/platform.py
        env["NERF_FL_TPU_PLATFORM"] = platform
    with open(logfile, "w") as f:
        p = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                           timeout=timeout, cwd=cwd, env=env)
    if p.returncode != 0:
        tail = open(logfile).read()[-2000:]
        raise RuntimeError(
            f"command failed rc={p.returncode}: {' '.join(cmd)}\n"
            f"--- log tail ({logfile}) ---\n{tail}")


def parse_psnr(logfile):
    txt = open(logfile).read()
    m = re.findall(r"Mean PSNR : ([0-9.]+)", txt)
    return float(m[-1]) if m else None


def ensure_fixture(ws, p):
    root = os.path.join(ws, "scene")
    marker = os.path.join(root, "transforms_train.json")
    if os.path.exists(marker):
        log(f"fixture exists: {root}")
        return root
    log(f"generating fixture: {p['n_train']} train views, "
        f"native {p['native']}^2, textured ball")
    sys.path.insert(0, _REPO)
    from nerf_fl_tpu.data.synthetic import make_blender_scene
    make_blender_scene(root, n_train=p["n_train"], n_val=p["n_val"],
                       n_test=p["n_test"], size=p["native"], texture=True)
    return root


def train_eval_arm(ws, scene, p, name, perturb, model_flags, timeout,
                   eval_extra=(), eval_name=None):
    """Train (if needed) and eval (if needed) one arm; return test PSNR."""
    ck = os.path.join(ws, "ckpts")
    logs = os.path.join(ws, "logs")
    os.makedirs(logs, exist_ok=True)
    eval_name = eval_name or name
    final_ckpt = os.path.join(ck, name, f"epoch={p['epochs'] - 1}.ckpt")
    common = [
        "--dataset_name", "blender", "--root_dir", scene,
        "--img_wh", str(p["img_wh"]), str(p["img_wh"]),
        "--N_samples", str(p["samples"][0]),
        "--N_importance", str(p["samples"][1]),
        "--mlp_depth", str(p["mlp"][0]), "--mlp_width", str(p["mlp"][1]),
        "--compute_dtype", p["dtype"],
    ]
    if not os.path.exists(final_ckpt):
        STATS["arms_trained"] += 1
        log(f"train {name}")
        cmd = ([sys.executable, os.path.join(_REPO, "train.py")] + common + [
            "--noise_std", "0",
            "--num_epochs", str(p["epochs"]), "--batch_size", str(p["batch"]),
            "--optimizer", "adam", "--lr", "5e-4", "--lr_scheduler", "cosine",
            "--steps_per_execution", str(p["spe"]),
            "--save_path", ck, "--exp_name", name, "--refresh_every", "0"]
            + (["--data_perturb"] + perturb if perturb else [])
            + model_flags)
        run_cmd(cmd, os.path.join(logs, f"{name}_train.log"), timeout,
                platform=p.get("platform"))
    else:
        log(f"train {name}: checkpoint exists, skipping")

    ev_log = os.path.join(logs, f"{eval_name}_eval.log")
    psnr = parse_psnr(ev_log) if os.path.exists(ev_log) else None
    if psnr is None:
        STATS["evals_run"] += 1
        log(f"eval {eval_name}")
        # eval.py writes results/<dataset>/<scene> relative to CWD (the
        # reference convention) — run it from the workdir
        cmd = ([sys.executable, os.path.join(_REPO, "eval.py")] + common + [
            "--split", "test", "--ckpt_path", final_ckpt,
            "--scene_name", eval_name] + model_flags + list(eval_extra))
        run_cmd(cmd, ev_log, timeout, platform=p.get("platform"), cwd=ws)
        psnr = parse_psnr(ev_log)
    if psnr is None:
        raise RuntimeError(f"no Mean PSNR in {ev_log}")
    log(f"  {eval_name}: test PSNR {psnr:.2f}")
    return psnr


def check_orderings(psnr, margins):
    """The reference table's orderings (reference README.md:146-173):
    clean >= every perturbed arm; each head beats its plain-NeRF control
    on the perturbation it is built for; NeRF-W via the paper protocol
    (docs/QUALITY.md: the raw a_id=0 convention needs lego-scale data).

    A margin of None means REPORT-ONLY: the value is recorded but never
    gates the run.  The quick (CPU) preset uses this for the head-vs-
    control margins — measured here (and in round 3's fixture ladder),
    the NeRF-A/U/W advantages need full training scale to emerge, so at
    CPU scale they are observability, not a contract."""
    checks = []

    def add(name, lhs, rhs, need):
        checks.append({
            "check": name, "lhs": round(lhs, 2), "rhs": round(rhs, 2),
            "margin": round(lhs - rhs, 2), "required_margin": need,
            "pass": True if need is None else bool(lhs - rhs >= need),
            "gated": need is not None})

    best_perturbed = max(v for k, v in psnr.items() if k != "clean")
    add("clean_ge_all_perturbed", psnr["clean"], best_perturbed,
        margins["clean_minus_best"])
    add("color_nerfa_gt_nerf", psnr["color_nerfa"], psnr["color_nerf"],
        margins["color_nerfa_vs_nerf"])
    add("occ_nerfu_gt_nerf", psnr["occ_nerfu"], psnr["occ_nerf"],
        margins["occ_nerfu_vs_nerf"])
    add("co_nerfw_opta_gt_nerf", psnr["co_nerfw_opta"], psnr["co_nerf"],
        margins["co_nerfw_opta_vs_nerf"])
    # perturbations must actually hurt the plain model (fixture sanity:
    # round 3's first fixture had the occluder land off-canvas)
    hurt = margins.get("perturb_hurts", 0.5)
    add("color_hurts_nerf", psnr["clean"], psnr["color_nerf"], hurt)
    add("occ_hurts_nerf", psnr["clean"], psnr["occ_nerf"], hurt)
    return checks


def markdown_table(psnr, checks, preset):
    rows = [
        ("clean", "NeRF", "clean"),
        ("color", "NeRF", "color_nerf"),
        ("color", "NeRF-A", "color_nerfa"),
        ("occ", "NeRF", "occ_nerf"),
        ("occ", "NeRF-U", "occ_nerfu"),
        ("color+occ", "NeRF", "co_nerf"),
        ("color+occ", "NeRF-W (raw a_id=0)", "co_nerfw"),
        ("color+occ", "NeRF-W (optimize_appearance)", "co_nerfw_opta"),
    ]
    out = [f"### Quality gate — preset `{preset}`", "",
           "| data | model | test PSNR |", "|---|---|---|"]
    out += [f"| {d} | {m} | {psnr[k]:.2f} |" for d, m, k in rows]
    out += ["", "| check | margin (dB) | required | pass |",
            "|---|---|---|---|"]
    for c in checks:
        need = ("—" if c["required_margin"] is None
                else f"{c['required_margin']:+.2f}")
        verdict = (("PASS" if c["pass"] else "FAIL") if c.get("gated", True)
                   else "report")
        out += [f"| {c['check']} | {c['margin']:+.2f} | {need} | "
                f"{verdict} |"]
    return "\n".join(out) + "\n"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", choices=sorted(PRESETS), default="quick")
    ap.add_argument("--workdir", default=None,
                    help="scratch dir (default /tmp/quality_gate_<preset>); "
                         "re-running resumes finished arms")
    ap.add_argument("--out", default=None,
                    help="output path for QUALITY_GATE.json "
                         "(default <repo>/QUALITY_GATE.json)")
    ap.add_argument("--arm_timeout", type=float, default=7200)
    args = ap.parse_args()

    p = PRESETS[args.preset]
    ws = args.workdir or f"/tmp/quality_gate_{args.preset}"
    os.makedirs(ws, exist_ok=True)
    out_json = args.out or os.path.join(_REPO, "QUALITY_GATE.json")

    scene = ensure_fixture(ws, p)
    psnr = {}
    try:
        for name, perturb, model_flags in ARMS:
            psnr[name] = train_eval_arm(ws, scene, p, name, perturb,
                                        model_flags, args.arm_timeout)
        # the paper-protocol arm re-evals the trained W checkpoint
        psnr["co_nerfw_opta"] = train_eval_arm(
            ws, scene, p, "co_nerfw", ["color", "occ"],
            ["--encode_a", "--encode_t", "--beta_min", "0.1"],
            args.arm_timeout, eval_extra=["--optimize_appearance"],
            eval_name="co_nerfw_opta")
    except BaseException as e:
        # a crashed run must OVERWRITE any previous (possibly passing)
        # artifact with a failing one, never leave a stale pass behind
        write_artifact(out_json, {
            "preset": args.preset, "pass": False, "error": repr(e),
            "psnr": {k: round(v, 2) for k, v in psnr.items()},
            "wall_s": round(time.perf_counter() - T0, 1), "workdir": ws})
        raise

    checks = check_orderings(psnr, p["margins"])
    ok = all(c["pass"] for c in checks)
    table = markdown_table(psnr, checks, args.preset)
    result = {
        "preset": args.preset, "pass": ok,
        "psnr": {k: round(v, 2) for k, v in psnr.items()},
        "checks": checks,
        "recipe": {k: v for k, v in p.items() if k != "margins"},
        "wall_s": round(time.perf_counter() - T0, 1),
        "workdir": ws,
    }
    write_artifact(out_json, result)
    with open(os.path.join(ws, "QUALITY_GATE.md"), "w") as f:
        f.write(table)
    print(table)
    log(f"{'PASS' if ok else 'FAIL'} — wrote {out_json}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
