"""NeRFSystem: model assembly, the jitted SPMD train step, chunked rendering,
and the train/val loop.

This is the L4 layer (reference train.py:33-241), restructured TPU-first:

  * ONE compiled train step serves the entire run: the LR schedule enters as
    a traced scalar, the BARF epoch as a traced scalar, and RNG as explicit
    keys — nothing recompiles across epochs.
  * Pose refinement is inside the step: per-ray c2w gathers from the learned
    pose table (batched exp-map), instead of the reference's Python dict of
    per-camera 4x4s rebuilt every step (train.py:86-96).
  * Distribution is a mesh layout (parallel/mesh.py), not a DDP wrapper: the
    batch is sharded over 'data', params replicated (or TP-sharded), and XLA
    inserts the gradient all-reduce over ICI.
  * Validation/eval renders run through fixed-shape padded chunks so a
    handful of compiled programs serve any image size.

Fixes fork regressions documented in SURVEY.md section 2.5: world-space rays
are consumed directly when pose refinement is off (the documented CLI
semantics), and the camera-direction format is used whenever poses must be
composed on device.
"""
from __future__ import annotations

import functools
import os
import queue
import sys
import threading
import time
from collections import defaultdict, deque
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.rays import get_rays
from ..data import RayBatcher, dataset_dict
from ..models import (init_embedding, init_learn_pose, init_nerf, pose_for,
                      validate_vocab)
from ..parallel import make_mesh, place_params, shard_batch
from ..render import RenderConfig, render_rays
from . import checkpoints
from .checkpoints import latest_checkpoint
from .logging import ExperimentLogger
from .losses import loss_dict
from .optimizers import (build_optimizer, lr_for_epoch, make_trainable_mask,
                         mask_updates)


# ----------------------------------------------------------------------
# assembly
# ----------------------------------------------------------------------

def config_from_hparams(hparams, white_back: bool) -> RenderConfig:
    return RenderConfig(
        N_samples=hparams.N_samples,
        N_importance=hparams.N_importance,
        use_disp=hparams.use_disp,
        perturb=hparams.perturb,
        noise_std=hparams.noise_std,
        white_back=white_back,
        N_emb_xyz=hparams.N_emb_xyz,
        N_emb_dir=hparams.N_emb_dir,
        encode_a=hparams.encode_a,
        N_a=hparams.N_a,
        encode_t=hparams.encode_t,
        N_tau=hparams.N_tau,
        beta_min=hparams.beta_min,
        refine_pose=getattr(hparams, "refine_pose", False),
        barf_schedule=getattr(hparams, "barf_schedule", "fork"),
        barf_epoch_start=getattr(hparams, "barf_epochs", [4, 8])[0],
        barf_epoch_end=getattr(hparams, "barf_epochs", [4, 8])[1],
        compute_dtype=getattr(hparams, "compute_dtype", "float32"),
        use_pallas={"auto": None, "on": True, "off": False}[
            getattr(hparams, "use_pallas", "auto")],
        fast_trig={"auto": None, "on": True, "off": False}[
            getattr(hparams, "fast_trig", "auto")],
        remat_mlp=getattr(hparams, "remat_mlp", False),
        mlp_depth=getattr(hparams, "mlp_depth", 8),
        mlp_width=getattr(hparams, "mlp_width", 256),
    )


def build_params(rng, cfg: RenderConfig, n_vocab: int,
                 init_poses: Optional[np.ndarray] = None) -> Dict[str, Any]:
    """Assemble the full parameter pytree (reference train.py:34-76, 134-135).

    Top-level keys are the submodule names used by checkpoint addressing.
    """
    keys = jax.random.split(rng, 8)
    params: Dict[str, Any] = {
        "nerf_coarse": init_nerf(keys[0], cfg.nerf_config("coarse"))}
    if cfg.N_importance > 0:
        params["nerf_fine"] = init_nerf(keys[1], cfg.nerf_config("fine"))
    if cfg.encode_a:
        params["embedding_a"] = init_embedding(keys[2], n_vocab, cfg.N_a)
    if cfg.encode_t:
        params["embedding_t"] = init_embedding(keys[3], n_vocab, cfg.N_tau)
    if init_poses is not None:
        params["learn_poses"] = init_learn_pose(len(init_poses), init_poses)
    return params


def assemble_world_rays(params, rays, ts, *, ray_format: str,
                        id_to_cam: Optional[jnp.ndarray] = None):
    """Turn a batch of stored rays into world-space 8-col rays.

    'world':  rays are already [o, d, near, far] — used directly (upstream
              semantics; the fork recomputed unconditionally, train.py:86-98).
    'camdir': rays are [cam-frame dir, near, far]; gather the (learned) pose
              per ray and rotate — the phototourism / BARF path.
    """
    if ray_format == "world":
        return rays
    ids = ts if id_to_cam is None else jnp.take(id_to_cam, ts, axis=0)
    c2ws = pose_for(params["learn_poses"], ids)[:, :3, :]
    rays_o, rays_d = get_rays(rays[:, :3], c2ws)
    return jnp.concatenate([rays_o, rays_d, rays[:, 3:5]], axis=-1)


# ----------------------------------------------------------------------
# jitted step factories
# ----------------------------------------------------------------------

def _make_step_core(cfg: RenderConfig, tx, trainable_mask, loss_name: str,
                    ray_format: str, id_to_cam, microbatch: int = 1,
                    pose_lr_mult: float = 1.0,
                    pose_warmup_epochs: float = 0.0):
    """The single-SGD-step function shared by every train-step variant:
    render -> loss -> grad -> masked optax update -> metrics.

    ``microbatch`` M > 1 accumulates the gradient over M equal slices of the
    batch inside the step (lax.scan) and applies ONE optimizer update.  Why:
    XLA compiles the b1024-shaped render so its activation tiles ride the
    VMEM prefetch strategy (matmul set ~1050 GB/s effective); at b4096 the
    same matmuls stream from HBM at ~700 GB/s (experiments/r3/trace_b*).
    Running 4x b1024-shaped microbatches recovers the fast program.  The
    accumulated gradient equals the full-batch gradient exactly for
    mean-based losses; the NerfW beta-NLL's ``log(mean beta)`` term is
    computed per microbatch (exactly the semantics of the reference's
    multi-GPU DDP, which averages per-rank shard losses, train.py:235-236).
    """
    loss_fn_named = loss_dict[loss_name]
    typ = "fine" if cfg.N_importance > 0 else "coarse"
    idmap = None if id_to_cam is None else jnp.asarray(id_to_cam, jnp.int32)

    def loss_of(p, b, r, epoch):
        rays8 = assemble_world_rays(p, b["rays"], b["ts"],
                                    ray_format=ray_format, id_to_cam=idmap)
        results = render_rays(p, rays8, b["ts"], r, cfg, epoch=epoch)
        loss_d = loss_fn_named(results, b["rgbs"])
        mse = jnp.mean((results[f"rgb_{typ}"] - b["rgbs"]) ** 2)
        return sum(loss_d.values()), (loss_d, mse)

    def grads_of(params, batch, epoch, rng):
        if microbatch <= 1:
            (loss, (loss_d, mse)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params, batch, rng, epoch)
            return grads, loss, loss_d, mse
        M = microbatch
        mb = jax.tree_util.tree_map(
            lambda x: x.reshape((M, x.shape[0] // M) + x.shape[1:]), batch)
        rngs = jax.vmap(lambda j: jax.random.fold_in(rng, j))(
            jnp.arange(M, dtype=jnp.uint32))

        def body(acc, xs):
            b, r = xs
            (l, (ld, mse)), g = jax.value_and_grad(
                loss_of, has_aux=True)(params, b, r, epoch)
            return jax.tree_util.tree_map(jnp.add, acc, g), (l, ld, mse)

        zero = jax.tree_util.tree_map(jnp.zeros_like, params)
        grads, (ls, lds, mses) = jax.lax.scan(body, zero, (mb, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / M, grads)
        return (grads, jnp.mean(ls),
                jax.tree_util.tree_map(jnp.mean, lds), jnp.mean(mses))

    scale_poses = (pose_lr_mult != 1.0 or pose_warmup_epochs > 0.0)

    def step(params, opt_state, batch, lr, epoch, rng):
        grads, loss, loss_d, mse = grads_of(params, batch, epoch, rng)
        grads = mask_updates(grads, trainable_mask)
        updates, new_opt_state = tx.update(grads, opt_state, params, lr)
        updates = mask_updates(updates, trainable_mask)
        if scale_poses and "learn_poses" in updates:
            # pose-specific lr: the reference trains pose deltas at the
            # model lr from step 0 (train.py:135-136), but during the
            # early white-background-collapse phase pose gradients are
            # pure noise and Adam's scale-invariant steps random-walk the
            # poses OUT of the coarse registration basin (measured: 2.0 ->
            # 5.3 deg in 2 epochs, experiments/r4 logs).  Warmup holds
            # poses fixed until the field forms; the multiplier mirrors
            # BARF's 2x pose lr (paper sec. 5: 1e-3 vs 5e-4).
            s = (jnp.float32(pose_lr_mult)
                 * (jnp.asarray(epoch, jnp.float32)
                    >= pose_warmup_epochs).astype(jnp.float32))
            lp = updates["learn_poses"]
            updates = {**updates,
                       "learn_poses": {**lp, "r": lp["r"] * s,
                                       "t": lp["t"] * s}}
        new_params = optax.apply_updates(params, updates)

        psnr = -10.0 * jnp.log10(mse)
        metrics = {"train/loss": loss, "train/psnr": psnr}
        for k, v in loss_d.items():
            metrics[f"train/{k}"] = v
        return new_params, new_opt_state, metrics

    return step


def make_train_step(cfg: RenderConfig, tx, trainable_mask, *,
                    loss_name: str = "nerfw", ray_format: str = "world",
                    id_to_cam: Optional[np.ndarray] = None,
                    donate: bool = True, steps_per_execution: int = 1,
                    microbatch: int = 1, pose_lr_mult: float = 1.0,
                    pose_warmup_epochs: float = 0.0):
    """Build the single jitted SPMD train step.

    With ``steps_per_execution`` K > 1 the returned function runs K optimizer
    steps per call via ``lax.scan``: it takes a batch pytree whose leaves have
    a leading K axis and a (K, ...) stack of PRNG keys, and returns metrics
    with a leading K axis.  The math is identical to K separate calls up to
    float32 roundoff (XLA fuses the scanned body differently; tested) — the
    point is ONE dispatch per K steps, which amortizes per-call dispatch
    latency (several ms through a tunneled device runtime; the reference has
    no analog because torch dispatch is per-op anyway).
    """
    step = _make_step_core(cfg, tx, trainable_mask, loss_name, ray_format,
                           id_to_cam, microbatch, pose_lr_mult,
                           pose_warmup_epochs)
    donate_args = (0, 1) if donate else ()
    if steps_per_execution <= 1:
        return jax.jit(step, donate_argnums=donate_args)

    def multi(params, opt_state, batches, lr, epoch, rngs, valid):
        def body(carry, xs):
            p, o = carry
            batch, rng, ok = xs
            p2, o2, m = step(p, o, batch, lr, epoch, rng)
            # epoch-tail groups are padded up to K with repeated batches;
            # padded sub-steps must leave params/opt_state untouched
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old)
            return (keep(p2, p), keep(o2, o)), m

        (params, opt_state), ms = jax.lax.scan(
            body, (params, opt_state), (batches, rngs, valid))
        return params, opt_state, ms

    return jax.jit(multi, donate_argnums=donate_args)


def stack_batches(batches, k: Optional[int] = None):
    """Stack a list of host batch dicts leaf-wise into one (K, ...) pytree
    for a ``steps_per_execution`` train step (one transfer, one dispatch).

    If ``k`` exceeds ``len(batches)`` the last batch is repeated to pad the
    stack; returns (stacked, valid) with ``valid`` marking real sub-steps.
    """
    k = len(batches) if k is None else k
    valid = np.arange(k) < len(batches)
    batches = list(batches) + [batches[-1]] * (k - len(batches))
    return (jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches),
            valid)


@functools.partial(jax.jit, static_argnums=2)
def fold_in_range(base, start, k: int):
    """(k,) stacked keys, bitwise equal to fold_in(base, start+j) for each j,
    in ONE dispatch instead of k."""
    return jax.vmap(lambda j: jax.random.fold_in(base, j))(
        start + jnp.arange(k, dtype=jnp.uint32))


# ----------------------------------------------------------------------
# device-resident ray pool (zero host work per step)
# ----------------------------------------------------------------------
#
# At blender scale the entire pre-baked ray buffer fits in HBM (400^2 x 100
# views ~ 0.6 GB), so the TPU-native data path is: upload the pool ONCE,
# then draw every batch ON DEVICE — a per-epoch permutation plus a
# dynamic-slice gather inside the scanned train step.  Steady-state host
# traffic per dispatch is a few scalars (i0, lr, epoch), vs K stacked
# batches (K x B x 52 bytes) for the host-fed path; through the tunneled
# runtime that per-transfer latency was the last ~0.4 ms/step of wall
# overhead on top of device time.  The reference has no analog (its
# DataLoader re-gathers on the host every step, train.py:144-149).

def epoch_perm(seed: int, epoch: int, n_pool: int,
               n_padded: int) -> np.ndarray:
    """Per-epoch batch order for the device pool: the SAME permutation the
    host-fed RayBatcher draws (``np.random.default_rng([seed, epoch])``,
    data/sampler.py), so the device-pool, host-fed, and multihost data
    paths train batch-for-batch identically for a given seed — a run's
    trajectory must not depend on which data path the process topology
    happens to pick (the e2e contract in tests/test_multihost.py).  Padded
    by whole-cycle wrap-around to ``n_padded`` so K-step groups can slice
    it without a tail branch (padded steps are masked out by ``n_steps``).
    Host-side numpy on purpose: one O(n_pool) shuffle per EPOCH amortizes
    to ~4 bytes/ray of upload vs the host-fed path's ~52 bytes/ray every
    step."""
    # seeded as the PAIR [seed, epoch] (a SeedSequence entropy list), not
    # seed+epoch: the sum made streams collide across runs (seed 0/epoch 1
    # drew the same permutation as seed 1/epoch 0)
    perm = np.random.default_rng([seed, epoch]).permutation(n_pool) \
        .astype(np.int32)
    if n_padded <= n_pool:
        return perm[:n_padded]
    return np.tile(perm, -(-n_padded // n_pool))[:n_padded]


def make_device_pool_step(cfg: RenderConfig, tx, trainable_mask, *,
                          batch_size: int, loss_name: str = "nerfw",
                          ray_format: str = "world",
                          id_to_cam: Optional[np.ndarray] = None,
                          donate: bool = True, steps_per_execution: int = 1,
                          data_sharding=None, microbatch: int = 1,
                          pose_lr_mult: float = 1.0,
                          pose_warmup_epochs: float = 0.0):
    """Train-step variant that draws batches from a device-resident pool.

    Signature of the returned function:
        fn(params, opt_state, pool, perm, i0, rng0, n_steps, lr, epoch,
           base_rng)
          pool:   {'rays','ts','rgbs'} device arrays over the FULL dataset
          perm:   (>= (i0+K)*B,) int32 epoch permutation (epoch_perm)
          i0:     int32 scalar — EPOCH-LOCAL step index of the group's first
                  sub-step (indexes perm and the n_steps validity bound)
          rng0:   uint32 scalar — GLOBAL step index of the same sub-step
                  (selects the RNG stream, cumulative across epochs)
          n_steps: int32 scalar — real steps this epoch; sub-steps with
                  epoch-local index >= n_steps leave params/opt_state
                  untouched
    RNG per sub-step is fold_in(base_rng, global_step): the same stream the
    host-fed path uses, so the two paths are step-for-step comparable.
    ``data_sharding`` (a NamedSharding over the 'data' axis) constrains the
    gathered batch so SPMD partitioning matches the host-fed shard_batch
    layout on multi-chip meshes.
    """
    step = _make_step_core(cfg, tx, trainable_mask, loss_name, ray_format,
                           id_to_cam, microbatch, pose_lr_mult,
                           pose_warmup_epochs)
    K = max(1, steps_per_execution)
    B = batch_size

    def gather(pool, idx):
        batch = {k: jnp.take(v, idx, axis=0) for k, v in pool.items()}
        if data_sharding is not None:
            batch = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, data_sharding),
                batch)
        return batch

    def run(params, opt_state, pool, perm, i0, rng0, n_steps, lr, epoch,
            base_rng):
        def body(carry, k):
            p, o = carry
            step_local = i0 + k
            idx = jax.lax.dynamic_slice(perm, (step_local * B,), (B,))
            batch = gather(pool, idx)
            rng = jax.random.fold_in(base_rng,
                                     rng0 + k.astype(jnp.uint32))
            p2, o2, m = step(p, o, batch, lr, epoch, rng)
            ok = step_local < n_steps
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old)
            return (keep(p2, p), keep(o2, o)), m

        (params, opt_state), ms = jax.lax.scan(
            body, (params, opt_state), jnp.arange(K, dtype=jnp.int32))
        return params, opt_state, ms

    # donate ONLY the carried training state — never the pool or perm
    return jax.jit(run, donate_argnums=(0, 1) if donate else ())


@functools.lru_cache(maxsize=32)
def _jitted_render(cfg: RenderConfig, test_time: bool, output_transient: bool,
                   keys, out_sharding=None, with_a_override: bool = False):
    def run(params, rays, ts, rng, epoch, a_override=None):
        a_embedded = None
        if with_a_override:
            # one (N_a,) appearance vector for the whole batch (test-time
            # appearance optimization, render/appearance.py)
            a_embedded = jnp.broadcast_to(
                a_override, (rays.shape[0], a_override.shape[-1]))
        res = render_rays(params, rays, ts, rng, cfg, epoch=epoch,
                          test_time=test_time,
                          output_transient=output_transient,
                          a_embedded=a_embedded)
        if keys is not None:
            # returning only the requested keys lets XLA dead-code-eliminate
            # the per-sample buffers (weights, transient sigmas) entirely —
            # they otherwise dominate the device->host transfer (~45 MB per
            # 32k-ray chunk, which is ~50x the pixels being rendered)
            res = {k: v for k, v in res.items() if k in keys}
        return res
    # multihost: replicate the (small) pixel outputs so every process can
    # device_get and assemble the frame
    if out_sharding is not None:
        return jax.jit(run, out_shardings=out_sharding)
    return jax.jit(run)


def val_chunk_cap(chunk: int, n_samples: int, n_importance: int) -> int:
    """Largest render chunk (power of two, >= 1024) whose per-program
    sample-point count stays under a ~6.5M budget.  Both training's val
    renders (run_validation) and eval.py route through this, so for EVERY
    sampling config they compile the SAME program — one remote compile per
    model family (30-400 s each on this runtime) instead of two, and
    neither path can OOM on huge --chunk x samples products."""
    total = n_samples * (2 if n_importance > 0 else 1) + n_importance
    cap = max(1024, 2 ** int(np.log2(6_500_000 / max(1, total))))
    return min(chunk, cap)


def render_chunked(params, rays: np.ndarray, ts: np.ndarray,
                   cfg: RenderConfig, *, chunk: int = 32 * 1024,
                   test_time: bool = True, output_transient: bool = True,
                   epoch: float = 0.0, rng=None,
                   keys=None, inflight: int = 4,
                   mesh=None, a_override=None) -> Dict[str, np.ndarray]:
    """Render arbitrarily many rays through fixed-shape compiled chunks.

    The reference chunks to avoid OOM (eval.py:80-110); here chunking also
    pins a single compiled program per chunk shape.  The tail chunk is padded
    (edge-replicated) and trimmed after.  ``keys`` (iterable of result names)
    restricts computation AND transfer to the named outputs.  At most
    ``inflight`` chunks are dispatched ahead of readback: the device pipeline
    still overlaps chunk k+1's compute with chunk k's transfer, but result
    buffers can't pile up in HBM on multi-megapixel frames (dozens of chunks
    at phototourism img_downscale 1).

    With ``mesh`` (a ('data','model') Mesh), each chunk's ray batch is
    sharded over the 'data' axis so the render program runs SPMD across the
    mesh — data-parallel evaluation the reference has no analog of (its
    eval.py is single-GPU).
    """
    return render_chunked_async(
        params, rays, ts, cfg, chunk=chunk, test_time=test_time,
        output_transient=output_transient, epoch=epoch, rng=rng, keys=keys,
        inflight=inflight, mesh=mesh, a_override=a_override)()


def render_chunked_async(params, rays: np.ndarray, ts: np.ndarray,
                         cfg: RenderConfig, *, chunk: int = 32 * 1024,
                         test_time: bool = True,
                         output_transient: bool = True,
                         epoch: float = 0.0, rng=None,
                         keys=None, inflight: int = 4,
                         mesh=None, a_override=None):
    """Dispatch a full render and defer the final readback.

    Returns a ``finish()`` callable producing render_chunked's result dict.
    Every chunk is dispatched before return (with the same bounded
    ``inflight`` drain discipline), so a caller can start the NEXT frame's
    dispatches while this frame's tail results stream back — the eval CLI
    uses this to overlap per-frame host work (drain, PNG prep, PSNR) with
    the device render of the following frame.
    """
    n = len(rays)
    nproc = jax.process_count()
    out_sh = None
    if nproc > 1:
        if mesh is None:
            raise ValueError("multihost render requires a mesh")
        from ..parallel import replicated
        out_sh = replicated(mesh)
    fn = _jitted_render(cfg, test_time, output_transient,
                        None if keys is None else frozenset(keys), out_sh,
                        a_override is not None)
    if a_override is not None:
        a_override = jnp.asarray(a_override)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    epoch = jnp.float32(epoch)
    put = jnp.asarray
    if mesh is not None and np.prod(list(mesh.shape.values())) > 1:
        from ..parallel import batch_sharding
        ndata = mesh.shape["data"]
        if chunk % ndata:
            # keep the batch axis divisible by the mesh; padding already
            # guarantees every dispatched chunk is exactly `chunk` rows
            chunk = -(-chunk // ndata) * ndata
            print(f"[render] rounding chunk up to {chunk} "
                  f"(multiple of data={ndata})")
        if nproc > 1:
            # every process holds the full chunk; hand the runtime only the
            # contiguous slice this process's devices own ('data' axis is
            # process-contiguous, parallel/multihost.py)
            from ..parallel import multihost
            if ndata % nproc:
                raise ValueError(f"data axis {ndata} not divisible by "
                                 f"{nproc} processes")
            p = jax.process_index()

            def put(x, p=p):
                lo = p * len(x) // nproc
                hi = (p + 1) * len(x) // nproc
                return multihost.global_batch(mesh, np.asarray(x[lo:hi]))
        else:
            sharding = batch_sharding(mesh)
            put = lambda x: jax.device_put(jnp.asarray(x), sharding)

    outs = defaultdict(list)
    pending: deque = deque()

    def drain_one():
        res, keep = pending.popleft()
        res = jax.device_get(res)
        for k, v in res.items():
            outs[k].append(v[:keep])

    for i in range(0, n, chunk):
        r = rays[i:i + chunk]
        t = ts[i:i + chunk]
        pad = chunk - len(r)
        if pad > 0:
            # ALWAYS pad to the fixed chunk: one compiled program serves
            # every image size, and odd shapes never reach the compiler
            # (some sizes, e.g. 4096 rays at 64+64 samples, trip an XLA
            # TPU register-allocation bug on this toolchain).
            r = np.concatenate([r, np.repeat(r[-1:], pad, 0)], 0)
            t = np.concatenate([t, np.repeat(t[-1:], pad, 0)], 0)
        args = (params, put(r), put(t), jax.random.fold_in(rng, i), epoch)
        res = fn(*args, a_override) if a_override is not None else fn(*args)
        pending.append((res, len(rays[i:i + chunk])))
        if len(pending) >= max(1, inflight):
            drain_one()

    def finish():
        while pending:
            drain_one()
        return {k: np.concatenate(v, 0) for k, v in outs.items()}

    return finish


class DevicePrefetcher:
    """Host->device feed on a worker thread (the reference runs its feed in
    DataLoader worker processes, train.py:144-149).

    Wraps an iterator of host batches; a daemon thread applies ``put``
    (e.g. shard_batch) up to ``depth`` batches ahead of the consumer, so
    host gather + transfer latency — several ms per step through a
    tunneled device runtime — overlaps the device step instead of
    serializing with it.
    """

    _END = object()

    def __init__(self, it, put, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._stop = False

        def blocking_put(item):
            # bounded put that aborts when the consumer closed us, so an
            # early consumer exit can't leave the worker parked on a full
            # queue holding device buffers alive
            while not self._stop:
                try:
                    self._q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    pass
            return False

        def work():
            try:
                for b in it:
                    if self._stop or not blocking_put(put(b)):
                        return
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                blocking_put(self._END)

        self._t = threading.Thread(target=work, daemon=True)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        b = self._q.get()
        if b is self._END:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return b

    def close(self):
        """Stop the worker and drop queued batches.

        Call on early consumer exit (exception / KeyboardInterrupt):
        without it the daemon thread keeps gathering and transferring up
        to ``depth`` batches and the queued device buffers stay retained.
        Idempotent; a no-op after normal exhaustion.
        """
        self._stop = True
        while self._t.is_alive():
            try:
                self._q.get_nowait()  # unblock a worker stuck in put()
            except queue.Empty:
                pass
            self._t.join(timeout=0.05)
        while True:  # release anything still queued
            try:
                self._q.get_nowait()
            except queue.Empty:
                return


# ----------------------------------------------------------------------
# the system
# ----------------------------------------------------------------------

class NeRFSystem:
    """End-to-end training orchestration (reference NeRFSystem,
    train.py:33-210)."""

    def __init__(self, hparams, logger: Optional[ExperimentLogger] = None):
        self.hparams = hparams
        self.logger = logger
        self.loss_name = "nerfw"
        self.global_step = 0
        self.start_epoch = 0

    # -- datasets ------------------------------------------------------
    def setup(self):
        h = self.hparams
        # --pose_noise needs the learned-pose (camdir) ray path even with
        # refinement OFF: the noisy-no-refine control arm of the BARF
        # recovery protocol trains on noisy poses with frozen deltas
        noise_on = any(getattr(h, "pose_noise", (0.0, 0.0)))
        kwargs = {"root_dir": h.root_dir}
        if h.dataset_name == "phototourism":
            kwargs["img_downscale"] = h.img_downscale
            kwargs["val_num"] = h.num_gpus
            kwargs["use_cache"] = h.use_cache
            kwargs["refine_pose"] = h.refine_pose or noise_on
        elif h.dataset_name == "blender":
            kwargs["img_wh"] = tuple(h.img_wh)
            kwargs["perturbation"] = h.data_perturb
            kwargs["refine_pose"] = h.refine_pose or noise_on
        elif h.dataset_name == "llff":
            kwargs["img_wh"] = tuple(h.img_wh)
            kwargs["spheric_poses"] = h.spheric_poses
            kwargs["val_num"] = h.num_gpus
        self.train_dataset = dataset_dict[h.dataset_name](split="train", **kwargs)
        self.val_dataset = dataset_dict[h.dataset_name](split="val", **kwargs)

        self.cfg = config_from_hparams(h, self.train_dataset.white_back)
        self.ray_format = getattr(self.train_dataset, "ray_format", "world")

        max_id = int(np.max(self.train_dataset.all_ts))
        if self.cfg.encode_a or self.cfg.encode_t:
            validate_vocab(h.N_vocab, max_id)

        # learned poses: indexed by image order; id -> index map for sparse ids
        poses = np.asarray(self.train_dataset.poses, np.float32)
        init_c2w = np.concatenate(
            [poses, np.tile(np.array([[[0, 0, 0, 1]]], np.float32),
                            (len(poses), 1, 1))], axis=1)
        self.true_poses = init_c2w
        rot_deg, trans_frac = getattr(h, "pose_noise", (0.0, 0.0))
        if rot_deg or trans_frac:
            # BARF recovery harness: seeded SE(3) noise on the INIT poses,
            # exactly representable by the learned deltas; the clean poses
            # stay in self.true_poses for pose_errors() reporting.  Only
            # meaningful on the learned-pose ray path (camdir), where
            # training rays are posed from learn_poses on device.
            if self.ray_format != "camdir":
                raise ValueError(
                    "--pose_noise requires the learned-pose ray path "
                    "(camdir); this dataset baked world-space rays that "
                    "would silently ignore the noisy poses")
            from ..models.poses import perturb_poses
            init_c2w = perturb_poses(init_c2w, rot_deg, trans_frac,
                                     seed=getattr(h, "pose_noise_seed", 0))
            from ..models.poses import pose_errors
            r0, t0 = pose_errors(init_c2w, self.true_poses)
            print(f"[pose_noise] injected rot {r0:.3f} deg / "
                  f"trans {t0:.4f} (aligned means over "
                  f"{len(init_c2w)} cams)", flush=True)
        self.init_poses = init_c2w
        ids = getattr(self.train_dataset, "img_ids", list(range(len(poses))))
        self.id_to_cam = None
        if list(ids) != list(range(len(poses))):
            idmap = np.zeros(max(max(ids), max_id) + 1, np.int32)
            for i, id_ in enumerate(ids):
                idmap[id_] = i
            self.id_to_cam = idmap

        self.batcher = RayBatcher(
            self.train_dataset.all_rays, self.train_dataset.all_ts,
            self.train_dataset.all_rgbs, h.batch_size,
            seed=getattr(h, "seed", 0),
            host_index=jax.process_index(), host_count=jax.process_count())

    # -- state ---------------------------------------------------------
    def configure(self):
        h = self.hparams
        rng = jax.random.PRNGKey(getattr(h, "seed", 0))
        needs_poses = self.ray_format == "camdir" or h.refine_pose
        self.params = build_params(
            rng, self.cfg, h.N_vocab,
            init_poses=self.init_poses if needs_poses else None)
        self.mask = make_trainable_mask(self.params, h.refine_pose)
        self.tx = build_optimizer(h)
        self.opt_state = self.tx.init(self.params)

        ckpt_path = getattr(h, "ckpt_path", None)
        if ckpt_path == "auto":
            # preemption-safe resume: pick up the newest checkpoint of this
            # experiment if any exists, else start fresh (a capability the
            # reference lacks — its resume needs an explicit path)
            ckpt_path = latest_checkpoint(
                os.path.join(h.save_path, h.exp_name))
            if ckpt_path:
                print(f"[ckpt] auto-resume from {ckpt_path}")
            else:
                print("[ckpt] auto-resume: no checkpoint found, "
                      "starting fresh")
        if ckpt_path:
            self.restore(ckpt_path)
        if jax.process_count() > 1:
            # every process resolves --ckpt_path independently (auto-resume
            # scans the local save_path); if they disagree — e.g. per-host
            # local disks where only host 0 has the checkpoint — the SPMD
            # job would silently mix parameter states.  Fail loudly instead.
            from jax.experimental import multihost_utils
            multihost_utils.assert_equal(
                np.int32([self.start_epoch, self.global_step]),
                "checkpoint resume state differs across hosts — use a "
                "shared save_path or pass an explicit --ckpt_path")

        # --num_gpus (reference flag) = data-parallel width in chips
        self.mesh = make_mesh(num_data=max(1, getattr(h, "num_gpus", 1)),
                              num_model=getattr(h, "model_parallel", 1))
        self.params = place_params(
            self.mesh, self.params,
            model_parallel=getattr(h, "model_parallel", 1) > 1)
        self.spe = max(1, getattr(h, "steps_per_execution", 1))
        mb = max(1, getattr(h, "microbatch", 1))
        if mb > 1 and h.batch_size % mb:
            raise ValueError(f"batch_size {h.batch_size} not divisible by "
                             f"--microbatch {mb}")

        # device-resident pool: zero host work per step when the whole ray
        # buffer fits in HBM (see make_device_pool_step).  'auto' enables it
        # single-process under a 2 GiB pool budget; multihost keeps the
        # host-sharded feed (each process owns a slice of every batch).
        self.device_pool = None
        dp_mode = getattr(h, "device_pool", "auto")
        pool_bytes = (self.batcher.rays.nbytes + self.batcher.ts.nbytes
                      + self.batcher.rgbs.nbytes)
        use_pool = dp_mode == "on" or (
            dp_mode == "auto" and pool_bytes <= (2 << 30))
        if use_pool and jax.process_count() > 1:
            if dp_mode == "on":
                print("[data] --device_pool on ignored: multihost feeds "
                      "host-sharded batches")
            use_pool = False
        if use_pool:
            from ..parallel import batch_sharding, replicated
            rep = replicated(self.mesh)
            pool = {"rays": np.asarray(self.batcher.rays, np.float32),
                    "ts": np.asarray(self.batcher.ts, np.int32),
                    "rgbs": np.asarray(self.batcher.rgbs, np.float32)}
            pool = {k: jax.device_put(v, rep) for k, v in pool.items()}
            self.device_pool = (pool, self.batcher.n)
            data_sh = None
            if np.prod(list(self.mesh.shape.values())) > 1:
                data_sh = batch_sharding(self.mesh)
            self.train_step = make_device_pool_step(
                self.cfg, self.tx, self.mask, batch_size=h.batch_size,
                loss_name=self.loss_name, ray_format=self.ray_format,
                id_to_cam=self.id_to_cam, steps_per_execution=self.spe,
                data_sharding=data_sh, microbatch=mb,
                pose_lr_mult=getattr(h, "pose_lr_mult", 1.0),
                pose_warmup_epochs=getattr(h, "pose_warmup_epochs", 0.0))
            print(f"[data] device-resident ray pool: "
                  f"{pool_bytes / 1e6:.0f} MB uploaded once; batches are "
                  f"drawn on device")
        else:
            self.train_step = make_train_step(
                self.cfg, self.tx, self.mask, loss_name=self.loss_name,
                ray_format=self.ray_format, id_to_cam=self.id_to_cam,
                steps_per_execution=self.spe, microbatch=mb,
                pose_lr_mult=getattr(h, "pose_lr_mult", 1.0),
                pose_warmup_epochs=getattr(h, "pose_warmup_epochs", 0.0))

    def restore(self, path: str):
        ckpt = checkpoints.load_checkpoint(path)
        if "opt_state" in ckpt:
            # our own full training checkpoint: strict resume with optimizer
            # state and step counters
            from flax import serialization
            self.params = serialization.from_state_dict(
                self.params, ckpt["state_dict"])
            self.opt_state = serialization.from_state_dict(
                self.opt_state, ckpt["opt_state"])
            self.start_epoch = int(ckpt.get("epoch", -1)) + 1
            self.global_step = int(ckpt.get("global_step", 0))
            print(f"[ckpt] restored {path} (resume at epoch "
                  f"{self.start_epoch})")
        else:
            # stripped (save_weights_only) or partial checkpoint: non-strict
            # per-submodule weight load honoring --prefixes_to_ignore
            # (reference load_ckpt, utils/__init__.py:84-88); training state
            # starts fresh
            prefixes = tuple(getattr(self.hparams, "prefixes_to_ignore",
                                     ("loss",)) or ())
            self.params = checkpoints.load_into(self.params, ckpt, prefixes)
            loaded = sorted(
                name for name in set(self.params) & set(
                    ckpt.get("state_dict", ckpt))
                if not any(name.startswith(p) for p in prefixes))
            print(f"[ckpt] loaded weights (non-strict) from {path}: "
                  f"{', '.join(loaded)}")

    def _place_batch(self, batch, axis: int = 0):
        """Host batch -> device placement: plain shard on a single process,
        global-array assembly from per-host slices on multihost."""
        if jax.process_count() > 1:
            from ..parallel import multihost
            return multihost.global_batch(self.mesh, batch, axis=axis)
        return shard_batch(self.mesh, batch, axis=axis)

    # -- validation ----------------------------------------------------
    def run_validation(self, epoch: int, max_images: Optional[int] = None):
        h = self.hparams
        n = len(self.val_dataset)
        if max_images is not None:
            n = min(n, max_images)
        losses, psnrs = [], []
        first_viz = None
        for i in range(n):
            sample = self.val_dataset[i]
            rays, ts, rgbs = sample["rays"], sample["ts"], sample["rgbs"]
            res = render_chunked(
                self.params, rays, ts, self.cfg,
                chunk=val_chunk_cap(h.chunk, self.cfg.N_samples,
                                    self.cfg.N_importance),
                test_time=False, epoch=float(epoch),
                rng=jax.random.PRNGKey(1000 + i),
                keys=("rgb_coarse", "rgb_fine", "depth_coarse", "depth_fine",
                      "beta", "transient_sigmas"),
                mesh=getattr(self, "mesh", None))
            typ = "fine" if "rgb_fine" in res else "coarse"
            loss_d = loss_dict[self.loss_name](res, rgbs)
            losses.append(float(sum(np.asarray(v) for v in loss_d.values())))
            mse = np.mean((res[f"rgb_{typ}"] - rgbs) ** 2)
            psnrs.append(-10.0 * np.log10(mse))
            if i == 0:
                if "img_wh" in sample:
                    W, H = (int(x) for x in sample["img_wh"])
                else:
                    W, H = h.img_wh
                from ..utils.visualization import visualize_depth
                img = res[f"rgb_{typ}"].reshape(H, W, 3).transpose(2, 0, 1)
                gt = rgbs.reshape(H, W, 3).transpose(2, 0, 1)
                depth = visualize_depth(res[f"depth_{typ}"].reshape(H, W))
                first_viz = np.stack([gt, np.clip(img, 0, 1), depth])
        return float(np.mean(losses)), float(np.mean(psnrs)), first_viz

    # -- the loop ------------------------------------------------------
    def fit(self):
        h = self.hparams
        is_main = jax.process_index() == 0
        if self.logger is None:
            if is_main:
                self.logger = ExperimentLogger("logs", h.exp_name)
            else:
                from .logging import NullLogger
                self.logger = NullLogger()
        ckpt_dir = os.path.join(h.save_path, h.exp_name)
        base_rng = jax.random.PRNGKey(getattr(h, "seed", 0) + 1234)

        # sanity val (Lightning num_sanity_val_steps=1, train.py:237)
        if getattr(h, "num_sanity_val_steps", 1) > 0:
            self.run_validation(self.start_epoch, max_images=1)

        # profile a ~20-step window relative to THIS run's start (steps
        # 100-120 of the run), so resumed runs trace a full window too
        profile_start = self.global_step + 100
        profile_stop = self.global_step + 120
        prof_dir = getattr(h, "profile_dir", None)
        self._prof_tracing = False
        self._prof_done = False

        def prof_before():
            if (prof_dir and not self._prof_tracing and not self._prof_done
                    and self.global_step >= profile_start):
                try:
                    jax.profiler.start_trace(prof_dir)
                    self._prof_tracing = True
                except Exception as e:  # never let tracing kill training
                    print(f"[profiler] start_trace failed: {e}")
                    self._prof_done = True

        def prof_after():
            if self._prof_tracing and self.global_step >= profile_stop:
                try:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), self.params)
                    jax.profiler.stop_trace()
                    print(f"[profiler] trace written to {prof_dir}")
                except Exception as e:
                    print(f"[profiler] stop_trace failed: {e}")
                self._prof_tracing = False
                self._prof_done = True

        # BARF paper-schedule annealing is CONTINUOUS (eq. 14 ramps alpha per
        # optimization step): each dispatch gets a fractional epoch so a band
        # fades in over ~(window/N_freqs) x steps_per_epoch steps and its
        # first-layer weights adapt as the weight grows.  Keeping the fork
        # rule per-epoch (reference semantics) makes alpha JUMP at epoch
        # boundaries — measured on device, each jump switches on bands whose
        # input weights never saw a gradient (zero input => zero grad) and
        # the loss spike collapses the field to the white-background optimum
        # (experiments/r4/barf_curve.py, docs/QUALITY.md BARF section).
        frac_anneal = (self.cfg.refine_pose
                       and self.cfg.barf_schedule == "paper")
        for epoch in range(self.start_epoch, h.num_epochs):
            lr = lr_for_epoch(h, epoch)
            lr_j = jnp.float32(lr)
            ep_j = jnp.float32(epoch)
            n_steps_epoch = max(1, self.batcher.steps_per_epoch())

            def ep_at(step_in_epoch):
                if not frac_anneal:
                    return ep_j
                return jnp.float32(epoch + step_in_epoch / n_steps_epoch)

            t0, n_rays = time.time(), 0
            spe = self.spe
            if self.device_pool is not None:
                # device-resident pool: one per-epoch on-device shuffle, then
                # each dispatch carries only scalars (make_device_pool_step)
                pool, n_pool = self.device_pool
                n_steps = self.batcher.steps_per_epoch()
                n_groups = max(1, -(-n_steps // spe))
                perm = epoch_perm(getattr(h, "seed", 0), epoch, n_pool,
                                  n_groups * spe * h.batch_size)
                if np.prod(list(self.mesh.shape.values())) > 1:
                    # pin the perm replicated like the pool; otherwise every
                    # K-step dispatch re-broadcasts it from device 0
                    from ..parallel import replicated
                    perm = jax.device_put(perm, replicated(self.mesh))
                else:
                    perm = jnp.asarray(perm)
                n_steps_j = jnp.int32(n_steps)
                feed = None

                def stepper():
                    for g0 in range(0, n_steps, spe):
                        prof_before()
                        self.params, self.opt_state, metrics = \
                            self.train_step(
                                self.params, self.opt_state, pool, perm,
                                jnp.int32(g0), jnp.uint32(self.global_step),
                                n_steps_j, lr_j, ep_at(g0), base_rng)
                        prof_after()
                        yield metrics, min(spe, n_steps - g0)
            elif spe > 1:
                # group K host batches -> one stacked transfer + ONE dispatch
                # running K optimizer steps under lax.scan (same math up to
                # float32 roundoff; amortizes per-call dispatch latency)
                ep_start = self.global_step

                def grouped(it=self.batcher.epoch(epoch), first=self.global_step):
                    buf, start = [], first
                    for b in it:
                        buf.append(b)
                        if len(buf) == spe:
                            yield buf, start, len(buf)
                            start += spe
                            buf = []
                    if buf:
                        yield buf, start, len(buf)

                def put(item):
                    bs, start, n_real = item
                    stacked, valid = stack_batches(bs, spe)
                    stacked = self._place_batch(stacked, axis=1)
                    rngs = fold_in_range(base_rng, jnp.uint32(start), spe)
                    return stacked, rngs, jnp.asarray(valid), n_real, start

                feed = DevicePrefetcher(grouped(), put)

                def stepper():
                    for stacked, rngs, valid, n_real, start in feed:
                        prof_before()
                        self.params, self.opt_state, metrics = \
                            self.train_step(self.params, self.opt_state,
                                            stacked, lr_j,
                                            ep_at(start - ep_start),
                                            rngs, valid)
                        prof_after()
                        yield metrics, n_real
            else:
                feed = DevicePrefetcher(self.batcher.epoch(epoch),
                                        self._place_batch)
                ep_start1 = self.global_step

                def stepper():
                    for batch in feed:
                        prof_before()
                        rng = jax.random.fold_in(base_rng, self.global_step)
                        self.params, self.opt_state, metrics = \
                            self.train_step(
                                self.params, self.opt_state, batch, lr_j,
                                ep_at(self.global_step - ep_start1), rng)
                        prof_after()
                        yield metrics, 1

            try:
                for metrics, n_real in stepper():
                    n_rays += h.batch_size * n_real
                    log_every = getattr(h, "log_every", 50)
                    # with K steps per dispatch, log when the executed step window
                    # [global_step, global_step + n_real) crosses a multiple
                    if (self.global_step % log_every == 0
                            or self.global_step % log_every + n_real > log_every):
                        m = {k: float(np.asarray(v).reshape(-1)[n_real - 1])
                             for k, v in jax.device_get(metrics).items()}
                        m["lr"] = lr
                        dt = time.time() - t0
                        if dt > 0:
                            m["train/rays_per_sec"] = n_rays / dt
                        # the fetched metrics row is sub-step n_real-1 of the
                        # window, so record it at that step, not window start
                        log_step = self.global_step + n_real - 1
                        self.logger.scalars(m, log_step)
                        self._last_metrics = (log_step, m)
                    refresh = getattr(h, "refresh_every", 0) or 0
                    if refresh > 0 and (self.global_step % refresh == 0
                                        or self.global_step % refresh
                                        + n_real > refresh):
                        # console progress line (reference --refresh_every,
                        # opt.py:106-107: the progress-bar refresh cadence).
                        # Reuses the most recently fetched metrics so printing
                        # never forces a device sync mid-epoch.
                        dt = time.time() - t0
                        rps = n_rays / dt if dt > 0 else 0.0
                        seen, m = getattr(self, "_last_metrics",
                                          (None, {}))
                        tail = ""
                        if seen is not None:
                            tail = (f" loss={m.get('train/loss', float('nan')):.4f}"
                                    f" psnr={m.get('train/psnr', float('nan')):.2f}"
                                    f" (step {seen})")
                        print(f"epoch {epoch} step {self.global_step} "
                              f"{rps:,.0f} rays/s{tail}",
                              end="\r" if sys.stdout.isatty() else "\n",
                              flush=True)
                    self.global_step += n_real
            finally:
                if feed is not None:
                    feed.close()

            # render the val pass at the annealing state the field was
            # actually trained at: the fork rule holds alpha(epoch) for the
            # whole epoch; the continuous paper ramp ends the epoch at
            # alpha(epoch + 1).  (Rendering one alpha step AHEAD of training
            # — the old epoch+1 for fork — scored 9.2 dB garbage at the
            # window edges: freshly switched-on bands have untrained
            # first-layer weights.  experiments/r4/barf_curve logs.)
            val_ep = epoch + 1 if frac_anneal else epoch
            val_loss, val_psnr, viz = self.run_validation(val_ep)
            self.logger.scalars(
                {"val/loss": val_loss, "val/psnr": val_psnr}, self.global_step)
            if viz is not None:
                self.logger.images("val/GT_pred_depth", viz, self.global_step)
            print(f"epoch {epoch}: lr={lr:.3e} val/loss={val_loss:.4f} "
                  f"val/psnr={val_psnr:.2f}")

            if is_main:
                checkpoints.save_checkpoint(
                    os.path.join(ckpt_dir, f"epoch={epoch}.ckpt"),
                    self.params, self.opt_state, epoch=epoch,
                    global_step=self.global_step)
        self.logger.close()


def gauge_val_psnr(system, epoch: int, max_images: int = 2, gauge=None):
    """Val PSNR with a global SE(3) gauge removed before rendering.

    Joint pose+scene refinement is defined only up to a world-frame gauge:
    if the reconstruction drifted COHERENTLY by G (every refined train pose
    ~ G @ true), clean-frame val cameras must be mapped into the refined
    frame (c2w' = inv(T) @ c2w with T = gauge_transform(refined, true)
    ~ G^-1) before rendering — the BARF-paper sec.-5 convention.  The
    composition is verified through the renderer by
    tests/test_barf_recovery.py::test_gauge_render_roundtrip (a scene
    deliberately trained in a G-drifted frame: raw val collapses, this
    function restores clean-level PSNR).

    CAVEAT (round-4 verdict weak #4, diagnosed round 5): when refinement
    leaves per-camera NOISE rather than a coherent drift (aligned ~ raw
    pose error), Procrustes fits that noise and inv(T) moves val cameras
    AWAY from the scene — the corrected score drops BELOW raw (measured
    -7.7 dB on the barf arm).  Report raw val PSNR as the headline there
    and use this as a drift diagnostic: gauge >> raw means coherent drift,
    gauge <= raw means the residual is noise, not gauge.

    Returns (mean val PSNR, T) where T maps the refined frame to the true
    frame.  ``gauge`` overrides the Procrustes estimate with a given T.
    """
    from ..data.rays_np import get_rays
    from ..models.poses import all_poses, gauge_transform

    if gauge is None:
        refined = np.asarray(all_poses(system.params["learn_poses"]))
        T = gauge_transform(refined, system.true_poses)
    else:
        T = np.asarray(gauge, np.float64)
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
    return float(np.mean(psnrs)), T
