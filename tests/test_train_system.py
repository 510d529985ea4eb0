"""Train-step behavior, checkpointing, and multi-device (8 virtual chips)
tests."""
import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fl_tpu.parallel import make_mesh, place_params, shard_batch
from nerf_fl_tpu.render import RenderConfig
from nerf_fl_tpu.training import checkpoints
from nerf_fl_tpu.training.optimizers import build_optimizer, make_trainable_mask
from nerf_fl_tpu.training.system import (build_params, make_train_step,
                                         render_chunked)


def hp(**kw):
    d = dict(optimizer="adam", lr=5e-4, momentum=0.9, weight_decay=0.0,
             lr_scheduler="cosine", decay_step=[20], decay_gamma=0.1,
             num_epochs=4, warmup_epochs=0, warmup_multiplier=1.0,
             poly_exp=0.9)
    d.update(kw)
    return types.SimpleNamespace(**d)


def make_batch(n=256, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((n, 1), 2, np.float32),
                           np.full((n, 1), 6, np.float32)], 1)
    return {"rays": jnp.asarray(rays),
            "ts": jnp.asarray(rng.integers(0, 4, n).astype(np.int32)),
            "rgbs": jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))}


CFG = RenderConfig(N_samples=16, N_importance=8, noise_std=0.0, perturb=1.0)


def build(cfg=CFG, refine_pose=False, init_poses=None, seed=0):
    params = build_params(jax.random.PRNGKey(seed), cfg, 16,
                          init_poses=init_poses)
    mask = make_trainable_mask(params, refine_pose)
    tx = build_optimizer(hp())
    return params, mask, tx, tx.init(params)


def test_loss_decreases():
    params, mask, tx, opt_state = build()
    step = make_train_step(CFG, tx, mask, donate=False)
    batch = make_batch()
    # fittable target: constant color per ray
    batch["rgbs"] = jnp.full_like(batch["rgbs"], 0.8)
    losses = []
    for i in range(25):
        params, opt_state, m = step(params, opt_state, batch,
                                    jnp.float32(1e-3), jnp.float32(0),
                                    jax.random.PRNGKey(i))
        losses.append(float(m["train/loss"]))
    assert losses[-1] < losses[0] * 0.5


def test_frozen_poses_stay_frozen_and_used():
    init = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    init[:, :3, 3] = np.random.default_rng(0).normal(0, 0.1, (4, 3))
    cfg = CFG
    params, mask, tx, opt_state = build(cfg, refine_pose=False,
                                        init_poses=init)
    step = make_train_step(cfg, tx, mask, ray_format="camdir", donate=False)
    # camdir batch: [dir(3), near, far]
    b = make_batch()
    rays5 = jnp.concatenate([b["rays"][:, :3], b["rays"][:, 6:8]], 1)
    batch = {"rays": rays5, "ts": b["ts"], "rgbs": b["rgbs"]}
    r0 = np.asarray(params["learn_poses"]["r"]).copy()
    for i in range(3):
        params, opt_state, _ = step(params, opt_state, batch,
                                    jnp.float32(5e-4), jnp.float32(0),
                                    jax.random.PRNGKey(i))
    np.testing.assert_array_equal(np.asarray(params["learn_poses"]["r"]), r0)
    np.testing.assert_array_equal(
        np.asarray(params["learn_poses"]["init_c2w"]), init)


def test_refine_pose_updates_poses():
    init = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    cfg = RenderConfig(N_samples=16, N_importance=8, noise_std=0.0,
                       perturb=1.0, refine_pose=True)
    params, mask, tx, opt_state = build(cfg, refine_pose=True,
                                        init_poses=init)
    step = make_train_step(cfg, tx, mask, ray_format="camdir", donate=False)
    b = make_batch()
    rays5 = jnp.concatenate([b["rays"][:, :3], b["rays"][:, 6:8]], 1)
    batch = {"rays": rays5, "ts": b["ts"], "rgbs": b["rgbs"]}
    for i in range(3):
        params, opt_state, _ = step(params, opt_state, batch,
                                    jnp.float32(5e-4), jnp.float32(6.0),
                                    jax.random.PRNGKey(i))
    assert np.abs(np.asarray(params["learn_poses"]["r"])).max() > 0
    assert np.abs(np.asarray(params["learn_poses"]["t"])).max() > 0
    np.testing.assert_array_equal(
        np.asarray(params["learn_poses"]["init_c2w"]), init)


def test_steps_per_execution_matches_sequential():
    """K scanned steps in one dispatch == K separate step calls, including a
    padded (invalid-masked) tail sub-step that must be a no-op."""
    from nerf_fl_tpu.training.system import fold_in_range, stack_batches

    params, mask, tx, opt_state = build()
    step1 = make_train_step(CFG, tx, mask, donate=False)
    stepK = make_train_step(CFG, tx, mask, donate=False,
                            steps_per_execution=4)
    batches = [make_batch(seed=s) for s in range(3)]  # 3 real, 1 padded
    lr, ep = jnp.float32(5e-4), jnp.float32(0)
    base = jax.random.PRNGKey(7)

    p1, o1 = params, opt_state
    ms = []
    for j, b in enumerate(batches):
        p1, o1, m = step1(p1, o1, b, lr, ep, jax.random.fold_in(base, 10 + j))
        ms.append(m)

    stacked, valid = stack_batches(
        [{k: np.asarray(v) for k, v in b.items()} for b in batches], 4)
    assert list(valid) == [True, True, True, False]
    rngs = fold_in_range(base, jnp.uint32(10), 4)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(rngs))[1],
        np.asarray(jax.random.key_data(jax.random.fold_in(base, 11))))
    pK, oK, mK = stepK(params, opt_state, stacked, lr, ep, rngs,
                       jnp.asarray(valid))

    # XLA fuses the scanned body differently from the standalone program, so
    # agreement is float32-roundoff-level, amplified by Adam's sqrt(v)
    # normalization over 3 steps — not bitwise
    for j, m in enumerate(ms):
        assert float(mK["train/loss"][j]) == pytest.approx(
            float(m["train/loss"]), rel=1e-5), j
    for sub in ("nerf_coarse", "nerf_fine"):
        np.testing.assert_allclose(
            np.asarray(p1[sub]["xyz"][0]["w"]),
            np.asarray(pK[sub]["xyz"][0]["w"]), atol=1e-4,
            err_msg=sub)
    # the Adam moments must also agree (the padded sub-step touched nothing)
    flat1 = jax.tree_util.tree_leaves(o1)
    flatK = jax.tree_util.tree_leaves(oK)
    for a, b in zip(flat1, flatK):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-3)


def test_microbatch_grad_accumulation_matches_full_batch():
    """--microbatch M: one optimizer update from M accumulated microbatch
    gradients must equal the full-batch update when sampling is
    deterministic (perturb=0: the only semantic difference left is RNG
    stream shape, which deterministic sampling removes)."""
    cfg = RenderConfig(N_samples=16, N_importance=8, noise_std=0.0,
                       perturb=0.0)
    params, mask, tx, opt_state = build(cfg)
    step1 = make_train_step(cfg, tx, mask, donate=False)
    step4 = make_train_step(cfg, tx, mask, donate=False, microbatch=4)
    batch = make_batch(n=512)
    lr, ep = jnp.float32(5e-4), jnp.float32(0)
    rng = jax.random.PRNGKey(5)

    p1, o1, m1 = step1(params, opt_state, batch, lr, ep, rng)
    p4, o4, m4 = step4(params, opt_state, batch, lr, ep, rng)

    # loss/psnr: mean of equal-slice means == full mean (f32 roundoff)
    assert float(m4["train/loss"]) == pytest.approx(
        float(m1["train/loss"]), rel=1e-5)
    assert float(m4["train/psnr"]) == pytest.approx(
        float(m1["train/psnr"]), rel=1e-4)
    for sub in ("nerf_coarse", "nerf_fine"):
        np.testing.assert_allclose(
            np.asarray(p1[sub]["xyz"][0]["w"]),
            np.asarray(p4[sub]["xyz"][0]["w"]), atol=2e-5, err_msg=sub)
    for a, b in zip(jax.tree_util.tree_leaves(o1),
                    jax.tree_util.tree_leaves(o4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-3)


def test_microbatch_nerfw_transient_runs():
    """With the transient head the beta-NLL's log(mean beta) is per-
    microbatch (DDP shard semantics); the step must still run and produce
    finite metrics close to the full-batch ones."""
    cfg = RenderConfig(N_samples=16, N_importance=8, noise_std=0.0,
                       perturb=0.0, encode_a=True, encode_t=True,
                       beta_min=0.1)
    params, mask, tx, opt_state = build(cfg)
    step1 = make_train_step(cfg, tx, mask, donate=False)
    step2 = make_train_step(cfg, tx, mask, donate=False, microbatch=2)
    batch = make_batch(n=256)
    lr, ep = jnp.float32(5e-4), jnp.float32(0)
    rng = jax.random.PRNGKey(6)
    _, _, m1 = step1(params, opt_state, batch, lr, ep, rng)
    _, _, m2 = step2(params, opt_state, batch, lr, ep, rng)
    assert np.isfinite(float(m2["train/loss"]))
    # Jensen gap of log(mean beta) across shards is tiny at init
    assert float(m2["train/loss"]) == pytest.approx(
        float(m1["train/loss"]), rel=1e-3)


def test_device_pool_step_matches_host_fed():
    """The device-resident-pool scanned step must reproduce host-fed
    sequential steps when handed the same ray order and RNG stream,
    including masking of the padded epoch-tail sub-step."""
    from nerf_fl_tpu.training.system import (epoch_perm,
                                             make_device_pool_step)

    B, K, n_steps = 64, 4, 3  # 3 real sub-steps, 1 masked
    params, mask, tx, opt_state = build()
    pool_b = make_batch(n=B * n_steps, seed=3)
    pool = {k: jnp.asarray(v) for k, v in pool_b.items()}

    lr, ep = jnp.float32(5e-4), jnp.float32(0)
    base = jax.random.PRNGKey(7)

    # host-fed ground truth: batches are consecutive B-row slices
    step1 = make_train_step(CFG, tx, mask, donate=False)
    p1, o1 = params, opt_state
    ms = []
    for j in range(n_steps):
        b = {k: v[j * B:(j + 1) * B] for k, v in pool.items()}
        p1, o1, m = step1(p1, o1, b, lr, ep, jax.random.fold_in(base, 10 + j))
        ms.append(m)

    # device pool with an identity permutation (padded by wraparound)
    stepP = make_device_pool_step(CFG, tx, mask, batch_size=B, donate=False,
                                  steps_per_execution=K)
    perm = jnp.arange(K * B, dtype=jnp.int32) % (n_steps * B)
    pP, oP, mP = stepP(params, opt_state, pool, perm, jnp.int32(0),
                       jnp.uint32(10), jnp.int32(n_steps), lr, ep, base)

    for j, m in enumerate(ms):
        assert float(mP["train/loss"][j]) == pytest.approx(
            float(m["train/loss"]), rel=1e-5), j
    for sub in ("nerf_coarse", "nerf_fine"):
        np.testing.assert_allclose(
            np.asarray(p1[sub]["xyz"][0]["w"]),
            np.asarray(pP[sub]["xyz"][0]["w"]), atol=1e-4, err_msg=sub)
    for a, b in zip(jax.tree_util.tree_leaves(o1),
                    jax.tree_util.tree_leaves(oP)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-3)

    # the epoch shuffle covers every pool row exactly once (+ wrap padding)
    pm = epoch_perm(0, 0, n_steps * B, K * B)
    assert pm.shape == (K * B,)
    assert sorted(np.asarray(pm)[:n_steps * B].tolist()) == \
        list(range(n_steps * B))


def test_epoch_perm_many_wrap_cycles():
    """n_padded > 2*n_pool must still return n_padded entries of exact
    whole-cycle wrap-around (regression: the old concat clipped at 2x,
    silently re-feeding the tail batch for long windows)."""
    from nerf_fl_tpu.training.system import epoch_perm

    n_pool, n_padded = 48, 48 * 5 + 7
    pm = np.asarray(epoch_perm(1, 0, n_pool, n_padded))
    assert pm.shape == (n_padded,)
    one = pm[:n_pool]
    assert sorted(one.tolist()) == list(range(n_pool))
    np.testing.assert_array_equal(pm, np.tile(one, 6)[:n_padded])


def test_epoch_perm_matches_ray_batcher_order():
    """The device pool must consume rays in EXACTLY the order the host-fed
    RayBatcher yields them for the same seed+epoch — the process-topology
    independence contract (a single-process pool run must train identically
    to a multi-process host-fed run, tests/test_multihost.py)."""
    from nerf_fl_tpu.data.sampler import RayBatcher
    from nerf_fl_tpu.training.system import epoch_perm

    n, B, seed = 640, 64, 5
    rays = np.arange(n * 8, dtype=np.float32).reshape(n, 8)
    ts = np.arange(n, dtype=np.int32)
    rgbs = np.zeros((n, 3), np.float32)
    batcher = RayBatcher(rays, ts, rgbs, batch_size=B, seed=seed)
    for epoch in (0, 3):
        pm = epoch_perm(seed, epoch, n, n)
        for j, b in enumerate(batcher.epoch(epoch)):
            np.testing.assert_array_equal(b["ts"], pm[j * B:(j + 1) * B])
    # streams must be decorrelated ACROSS runs too: the old seed+epoch
    # seeding made (seed=0, epoch=1) draw the same permutation as
    # (seed=1, epoch=0)
    assert not np.array_equal(epoch_perm(0, 1, n, n), epoch_perm(1, 0, n, n))


def test_val_chunk_cap_shared_between_train_and_eval():
    """run_validation and eval.py must compile the SAME render program:
    both route their chunk through val_chunk_cap for every sampling
    config (regression: eval's old pow2 snap produced 16384 at
    N_samples=64/N_importance=128 while training rendered at 32768)."""
    from nerf_fl_tpu.training.system import val_chunk_cap

    # the flagship 64+64 family keeps the default 32768-ray program
    assert val_chunk_cap(32 * 1024, 64, 64) == 32 * 1024
    # heavier sampling clamps BOTH paths to the same pow2 program
    assert val_chunk_cap(32 * 1024, 64, 128) == 16 * 1024
    assert val_chunk_cap(32 * 1024, 128, 128) == 16 * 1024
    # coarse-only doubles nothing and never exceeds the requested chunk
    assert val_chunk_cap(4096, 64, 0) == 4096
    # floor
    assert val_chunk_cap(32 * 1024, 4096, 4096) == 1024


def test_device_pool_dp_sharded():
    """Device-pool step over an 8-chip data mesh: pool replicated, gathered
    batch constrained to the 'data' axis; result matches single-device."""
    from nerf_fl_tpu.parallel import batch_sharding, replicated
    from nerf_fl_tpu.training.system import make_device_pool_step

    B = 128
    params, mask, tx, opt_state = build()
    pool_b = make_batch(n=B * 2, seed=4)
    lr, ep = jnp.float32(5e-4), jnp.float32(0)
    base = jax.random.PRNGKey(3)
    perm = jnp.arange(2 * B, dtype=jnp.int32)

    stepP = make_device_pool_step(CFG, tx, mask, batch_size=B, donate=False,
                                  steps_per_execution=2)
    p1, o1, m1 = stepP(params, opt_state,
                       {k: jnp.asarray(v) for k, v in pool_b.items()},
                       perm, jnp.int32(0), jnp.uint32(0), jnp.int32(2),
                       lr, ep, base)

    mesh = make_mesh()
    rep = replicated(mesh)
    pool8 = {k: jax.device_put(np.asarray(v), rep)
             for k, v in pool_b.items()}
    params8 = place_params(mesh, params)
    opt8 = tx.init(params8)
    step8 = make_device_pool_step(CFG, tx, mask, batch_size=B, donate=False,
                                  steps_per_execution=2,
                                  data_sharding=batch_sharding(mesh))
    p8, o8, m8 = step8(params8, opt8, pool8,
                       jax.device_put(perm, rep), jnp.int32(0),
                       jnp.uint32(0), jnp.int32(2), lr, ep, base)

    np.testing.assert_allclose(np.asarray(m1["train/loss"]),
                               np.asarray(m8["train/loss"]), rtol=1e-5)
    for sub in ("nerf_coarse", "nerf_fine"):
        np.testing.assert_allclose(
            np.asarray(p1[sub]["xyz"][0]["w"]),
            np.asarray(p8[sub]["xyz"][0]["w"]), atol=1e-4, err_msg=sub)


def test_multidevice_dp_matches_single_device():
    assert len(jax.devices()) == 8
    params, mask, tx, opt_state = build()
    step = make_train_step(CFG, tx, mask, donate=False)
    batch = make_batch(n=512)

    p1, o1, m1 = step(params, opt_state, batch, jnp.float32(5e-4),
                      jnp.float32(0), jax.random.PRNGKey(0))

    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    params8 = place_params(mesh, params)
    opt8 = tx.init(params8)
    batch8 = shard_batch(mesh, {k: np.asarray(v) for k, v in batch.items()})
    p2, o2, m2 = step(params8, opt8, batch8, jnp.float32(5e-4),
                      jnp.float32(0), jax.random.PRNGKey(0))

    assert float(m1["train/loss"]) == pytest.approx(float(m2["train/loss"]),
                                                    rel=1e-4)
    np.testing.assert_allclose(
        np.asarray(p1["nerf_coarse"]["xyz"][0]["w"]),
        np.asarray(p2["nerf_coarse"]["xyz"][0]["w"]), atol=1e-5)


def test_model_parallel_runs():
    mesh = make_mesh(num_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    params, mask, tx, opt_state = build()
    params_tp = place_params(mesh, params, model_parallel=True)
    # trunk weights actually sharded over 'model'
    w = params_tp["nerf_coarse"]["xyz"][1]["w"]
    assert len(w.sharding.device_set) == 8
    step = make_train_step(CFG, tx, mask, donate=False)
    batch = shard_batch(mesh, {k: np.asarray(v)
                               for k, v in make_batch(n=512).items()})
    opt_tp = tx.init(params_tp)
    p, o, m = step(params_tp, opt_tp, batch, jnp.float32(5e-4),
                   jnp.float32(0), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["train/loss"]))


def test_model_parallel_matches_single_device():
    """A TP=2 step must be numerically the single-device step — the Megatron
    layout only changes WHERE the math runs (VERDICT r1 item 6)."""
    assert len(jax.devices()) == 8
    params, mask, tx, opt_state = build()
    step = make_train_step(CFG, tx, mask, donate=False)
    batch = make_batch(n=512)

    p1, o1, m1 = step(params, opt_state, batch, jnp.float32(5e-4),
                      jnp.float32(0), jax.random.PRNGKey(0))

    mesh = make_mesh(num_model=2)
    params_tp = place_params(mesh, params, model_parallel=True)
    opt_tp = tx.init(params_tp)
    batch_tp = shard_batch(mesh, {k: np.asarray(v) for k, v in batch.items()})
    p2, o2, m2 = step(params_tp, opt_tp, batch_tp, jnp.float32(5e-4),
                      jnp.float32(0), jax.random.PRNGKey(0))

    assert float(m1["train/loss"]) == pytest.approx(float(m2["train/loss"]),
                                                    rel=1e-4)
    assert float(m1["train/psnr"]) == pytest.approx(float(m2["train/psnr"]),
                                                    rel=1e-4)
    for sub in ("nerf_coarse", "nerf_fine"):
        for i in (0, 1, 4):  # col-parallel, row-parallel and skip layers
            np.testing.assert_allclose(
                np.asarray(p1[sub]["xyz"][i]["w"]),
                np.asarray(p2[sub]["xyz"][i]["w"]), atol=2e-5,
                err_msg=f"{sub}.xyz.{i}.w")
        np.testing.assert_allclose(
            np.asarray(p1[sub]["dir"]["w"]), np.asarray(p2[sub]["dir"]["w"]),
            atol=2e-5, err_msg=f"{sub}.dir.w")


def test_checkpoint_roundtrip(tmp_path):
    params, mask, tx, opt_state = build()
    path = os.path.join(tmp_path, "test.ckpt")
    checkpoints.save_checkpoint(path, params, opt_state, epoch=3,
                                global_step=123)
    ckpt = checkpoints.load_checkpoint(path)
    assert ckpt["epoch"] == 3 and ckpt["global_step"] == 123
    from flax import serialization
    restored = serialization.from_state_dict(params, ckpt["state_dict"])
    np.testing.assert_array_equal(
        np.asarray(restored["nerf_coarse"]["xyz"][0]["w"]),
        np.asarray(params["nerf_coarse"]["xyz"][0]["w"]))


def test_submodule_extraction_and_load(tmp_path):
    params, _, _, opt_state = build()
    path = os.path.join(tmp_path, "sub.ckpt")
    checkpoints.save_checkpoint(path, params, epoch=0)
    flat = checkpoints.extract_model_state_dict(path, "nerf_coarse")
    assert "xyz.0.w" in flat and "static_sigma.b" in flat
    # ignore-prefix filtering
    flat2 = checkpoints.extract_model_state_dict(
        path, "nerf_coarse", prefixes_to_ignore=["xyz."])
    assert not any(k.startswith("xyz.") for k in flat2)
    # non-strict submodule load into a fresh tree
    fresh = build(seed=9)[0]
    loaded = checkpoints.load_ckpt(fresh["nerf_coarse"], path, "nerf_coarse")
    np.testing.assert_array_equal(
        np.asarray(loaded["xyz"][0]["w"]),
        np.asarray(params["nerf_coarse"]["xyz"][0]["w"]))


def test_load_into_nonstrict(tmp_path):
    """Whole-tree non-strict weight load (the --prefixes_to_ignore train
    path): present submodules replace, ignored prefixes and missing
    submodules keep their values."""
    params, *_ = build()
    path = os.path.join(tmp_path, "donor.ckpt")
    checkpoints.save_checkpoint(path, params)
    ckpt = checkpoints.load_checkpoint(path)
    # drop opt_state/bookkeeping to emulate a stripped/foreign ckpt
    slim = {"state_dict": ckpt["state_dict"]}

    fresh = build(seed=9)[0]
    before_dir_b = np.asarray(fresh["nerf_coarse"]["dir"]["b"]).copy()
    loaded = checkpoints.load_into(fresh, slim,
                                   prefixes_to_ignore=("loss",
                                                       "nerf_coarse.dir"))
    # non-ignored leaves replaced
    np.testing.assert_array_equal(
        np.asarray(loaded["nerf_coarse"]["xyz"][0]["w"]),
        np.asarray(params["nerf_coarse"]["xyz"][0]["w"]))
    np.testing.assert_array_equal(
        np.asarray(loaded["nerf_fine"]["static_rgb"]["w"]),
        np.asarray(params["nerf_fine"]["static_rgb"]["w"]))
    # ignored prefix untouched
    np.testing.assert_array_equal(
        np.asarray(loaded["nerf_coarse"]["dir"]["b"]), before_dir_b)
    # partial ckpt: a submodule absent from the donor keeps fresh values
    partial = {"state_dict": {"nerf_coarse": slim["state_dict"]["nerf_coarse"]}}
    loaded2 = checkpoints.load_into(build(seed=9)[0], partial)
    np.testing.assert_array_equal(
        np.asarray(loaded2["nerf_fine"]["xyz"][0]["w"]),
        np.asarray(build(seed=9)[0]["nerf_fine"]["xyz"][0]["w"]))


def test_render_chunked_inflight_window():
    """Bounding the dispatch window must not change results (VERDICT r1
    item 8: multi-megapixel frames must not pile result buffers in HBM)."""
    params, *_ = build()
    b = make_batch(n=700)
    cfg = CFG.eval_variant()
    serial = render_chunked(params, np.asarray(b["rays"]), np.asarray(b["ts"]),
                            cfg, chunk=128, test_time=True, inflight=1)
    wide = render_chunked(params, np.asarray(b["rays"]), np.asarray(b["ts"]),
                          cfg, chunk=128, test_time=True, inflight=100)
    for k in serial:
        np.testing.assert_allclose(serial[k], wide[k], atol=1e-6, err_msg=k)
        assert len(serial[k]) == 700


def test_render_chunked_async_matches_sync():
    """The deferred-readback variant must reproduce render_chunked exactly,
    including with two frames' dispatches interleaved (the eval CLI's
    frame pipeline)."""
    from nerf_fl_tpu.training.system import render_chunked_async

    params, *_ = build()
    cfg = CFG.eval_variant()
    b1, b2 = make_batch(n=300, seed=1), make_batch(n=300, seed=2)
    args1 = (np.asarray(b1["rays"]), np.asarray(b1["ts"]))
    args2 = (np.asarray(b2["rays"]), np.asarray(b2["ts"]))
    sync1 = render_chunked(params, *args1, cfg, chunk=128, test_time=True)
    sync2 = render_chunked(params, *args2, cfg, chunk=128, test_time=True)
    f1 = render_chunked_async(params, *args1, cfg, chunk=128, test_time=True)
    f2 = render_chunked_async(params, *args2, cfg, chunk=128, test_time=True)
    async1, async2 = f1(), f2()
    for k in sync1:
        np.testing.assert_allclose(sync1[k], async1[k], atol=1e-6, err_msg=k)
        np.testing.assert_allclose(sync2[k], async2[k], atol=1e-6, err_msg=k)


def test_render_chunked_sharded_matches_single_device():
    """Data-parallel eval: sharding each chunk's rays over the 'data' mesh
    axis must reproduce the single-device render exactly."""
    assert len(jax.devices()) == 8
    params, *_ = build()
    b = make_batch(n=700)
    cfg = CFG.eval_variant()
    mesh = make_mesh()
    params8 = place_params(mesh, params)
    single = render_chunked(params, np.asarray(b["rays"]),
                            np.asarray(b["ts"]), cfg, chunk=256,
                            test_time=True)
    sharded = render_chunked(params8, np.asarray(b["rays"]),
                             np.asarray(b["ts"]), cfg, chunk=256,
                             test_time=True, mesh=mesh)
    for k in single:
        np.testing.assert_allclose(single[k], sharded[k], atol=1e-5,
                                   err_msg=k)


def test_render_chunked_a_override_matches_direct():
    """render_chunked(a_override=v) must equal render_rays with the same
    vector broadcast as a_embedded (the appearance-optimization path)."""
    from nerf_fl_tpu.render import render_rays

    cfg = RenderConfig(N_samples=8, N_importance=8, noise_std=0.0,
                       perturb=0.0, encode_a=True, N_a=16)
    params = build_params(jax.random.PRNGKey(0), cfg, 8)
    b = make_batch(n=300)
    v = jax.random.normal(jax.random.PRNGKey(3), (16,))
    chunked = render_chunked(params, np.asarray(b["rays"]),
                             np.asarray(b["ts"]), cfg, chunk=128,
                             test_time=True, keys=("rgb_fine",),
                             a_override=v, rng=jax.random.PRNGKey(0))
    direct = render_rays(
        params, b["rays"][:128], b["ts"][:128],
        jax.random.fold_in(jax.random.PRNGKey(0), 0), cfg, test_time=True,
        a_embedded=jnp.broadcast_to(v, (128, 16)))
    np.testing.assert_allclose(chunked["rgb_fine"][:128],
                               np.asarray(direct["rgb_fine"]), atol=1e-5)
    # and it actually changes the output vs the embedding-table render
    plain = render_chunked(params, np.asarray(b["rays"]),
                           np.asarray(b["ts"]), cfg, chunk=128,
                           test_time=True, keys=("rgb_fine",),
                           rng=jax.random.PRNGKey(0))
    assert np.abs(plain["rgb_fine"] - chunked["rgb_fine"]).max() > 1e-4


def test_render_chunked_matches_unchunked():
    params, *_ = build()
    b = make_batch(n=300)
    cfg = CFG.eval_variant()
    full = render_chunked(params, np.asarray(b["rays"]), np.asarray(b["ts"]),
                          cfg, chunk=512, test_time=True)
    parts = render_chunked(params, np.asarray(b["rays"]), np.asarray(b["ts"]),
                           cfg, chunk=128, test_time=True)
    for k in full:
        np.testing.assert_allclose(full[k], parts[k], atol=1e-5,
                                   err_msg=k)
        assert len(full[k]) == 300
