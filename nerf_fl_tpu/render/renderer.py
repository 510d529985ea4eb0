"""The volume-rendering pipeline: one fused, jittable program per shape.

Behavioral contract follows reference models/rendering.py:49-288 (the
``render_rays`` + ``inference`` pair), with the TPU-native restructure:

  * NO chunk loops — the reference slices the (N_rays*N_samples) batch into
    Python-level chunks (rendering.py:104, 119) to bound GPU memory; here the
    entire coarse->sample_pdf->fine pass is a single XLA program with static
    shapes.  Memory is bounded by the training batch size and by fixed-size
    host-side tiling at eval time.
  * RNG (depth jitter, sigma noise, importance draws) is explicit PRNG-key
    threading instead of torch global RNG (rendering.py:30, 151, 258).
  * The coarse->fine weight handoff uses jax.lax.stop_gradient — the detach
    boundary at reference rendering.py:269-271.

Returned dict keys mirror the reference result dict so losses, metrics and
eval tooling can address results identically.
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..core import compositing, encoding, sampling
from ..models.embeddings import embedding_lookup
from ..models.mlp import NeRFConfig, apply_nerf
from ..ops.fused_mlp import fused_apply_nerf
from ..ops.sorting import rank_merge_sorted


@dataclass(frozen=True)
class RenderConfig:
    """Static render/model hyperparameters (hashable: safe under jit).

    Field names track the reference CLI flags (opt.py:25-57).
    """
    N_samples: int = 64
    N_importance: int = 0
    use_disp: bool = False
    perturb: float = 1.0
    noise_std: float = 1.0
    white_back: bool = False
    N_emb_xyz: int = 10
    N_emb_dir: int = 4
    encode_a: bool = False
    N_a: int = 48
    encode_t: bool = False
    N_tau: int = 16
    beta_min: float = 0.1
    refine_pose: bool = False       # BARF: annealed PE + learned poses
    barf_epoch_start: int = 4       # hardcoded (4, 8) in reference train.py:43-44
    barf_epoch_end: int = 8
    # "fork" = reference nerf.py:47-59 parity (permanently low-passes the
    # field — see encoding.barf_weights); "paper" = BARF eq. 14, the rule
    # that actually recovers pose noise (docs/QUALITY.md BARF section).
    barf_schedule: str = "fork"
    compute_dtype: str = "float32"  # "bfloat16" on the perf path
    use_pallas: Optional[bool] = None  # None = auto (on when running on TPU)
    fast_trig: Optional[bool] = None  # None = auto (polynomial PE on bf16)
    # jax.checkpoint the field MLP: the train step is HBM-bound (saved
    # trunk activations re-stream in backward) while the MXU sits ~33%
    # busy, so recomputing the forward inside the backward trades idle
    # FLOPs for activation traffic.  Measured round 5 (see docs/PERF.md).
    remat_mlp: bool = False
    # Field MLP size.  The reference hardcodes D=8/W=256 at its call sites
    # but they are constructor args (nerf.py:81-86); exposed here so small
    # configs (CI quality gate, capacity studies) stay on the same code path.
    mlp_depth: int = 8
    mlp_width: int = 256

    @property
    def use_fast_trig(self) -> bool:
        if self.fast_trig is not None:
            return self.fast_trig
        return self.compute_dtype == "bfloat16"

    @property
    def in_channels_xyz(self) -> int:
        return 6 * self.N_emb_xyz + 3

    @property
    def in_channels_dir(self) -> int:
        return 6 * self.N_emb_dir + 3

    def nerf_config(self, typ: str) -> NeRFConfig:
        return NeRFConfig(
            typ=typ,
            D=self.mlp_depth,
            W=self.mlp_width,
            skips=(self.mlp_depth // 2,),
            in_channels_xyz=self.in_channels_xyz,
            in_channels_dir=self.in_channels_dir,
            encode_appearance=self.encode_a,
            in_channels_a=self.N_a,
            encode_transient=self.encode_t,
            in_channels_t=self.N_tau,
            beta_min=self.beta_min,
        )

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    def eval_variant(self) -> "RenderConfig":
        """Deterministic sampling for validation/eval (reference eval.py:96-98
        passes perturb=0, noise_std=0)."""
        return replace(self, perturb=0.0, noise_std=0.0)


def _embed_xyz(cfg: RenderConfig, xyz, epoch):
    # bf16 compute: polynomial trig (error ~1e-6, below bf16 resolution)
    # replaces the VPU-bound libm sin/cos lowering — see encoding.sin_cw
    return encoding.embed(
        xyz, cfg.N_emb_xyz, barf=cfg.refine_pose, epoch=epoch,
        epoch_start=cfg.barf_epoch_start, epoch_end=cfg.barf_epoch_end,
        fast=cfg.use_fast_trig, schedule=cfg.barf_schedule)


def _embed_dir(cfg: RenderConfig, d, epoch):
    return encoding.embed(
        d, cfg.N_emb_dir, barf=cfg.refine_pose, epoch=epoch,
        epoch_start=cfg.barf_epoch_start, epoch_end=cfg.barf_epoch_end,
        fast=cfg.use_fast_trig, schedule=cfg.barf_schedule)


def _fused_ok(mcfg: NeRFConfig) -> bool:
    """Whether the Pallas fused-MLP kernel supports this architecture."""
    return (mcfg.D == 8 and mcfg.W == 256 and tuple(mcfg.skips) == (4,)
            and mcfg.in_channels_xyz <= 128
            and mcfg.in_channels_dir + mcfg.a_dim <= 128
            and mcfg.in_channels_t <= 128)


def _run_mlp(model_params, mcfg: NeRFConfig, cfg: RenderConfig, xyz,
             dirs=None, a_emb=None, t_emb=None, *, epoch=0.0,
             sigma_only=False, output_transient=False):
    """Run the field MLP over a (N_rays, S, 3) sample grid.

    Takes RAW positions/directions: the fused Pallas path computes the
    positional encoding in-kernel (ops/fused_mlp.py), the XLA path embeds
    here.  Per-ray conditioning (dirs, appearance, transient embeddings) is
    broadcast to samples; shapes are restored to (N, S, ...) on return.
    """
    N, S = xyz.shape[:2]
    flat = lambda x: x.reshape(N * S, x.shape[-1])
    per_sample = lambda x: flat(jnp.broadcast_to(x[:, None, :],
                                                 (N, S, x.shape[-1])))

    on_tpu = jax.default_backend() == "tpu"
    # auto resolves OFF until the fused kernel beats the XLA path end to end
    # on v5e (v2 measured: fwd 13.0 ms vs XLA-from-raw 9.8 ms at 524k pts —
    # in-kernel PE via f32 MXU matmuls is the current cost; see
    # experiments/fused_v2_results.json)
    use_fused = cfg.use_pallas if cfg.use_pallas is not None else False
    if use_fused and not sigma_only and _fused_ok(mcfg):
        bw_x = bw_d = None
        if cfg.refine_pose:
            bw_x = encoding.barf_weights(epoch, cfg.N_emb_xyz,
                                         cfg.barf_epoch_start,
                                         cfg.barf_epoch_end,
                                         schedule=cfg.barf_schedule)
            bw_d = encoding.barf_weights(epoch, cfg.N_emb_dir,
                                         cfg.barf_epoch_start,
                                         cfg.barf_epoch_end,
                                         schedule=cfg.barf_schedule)
        out = fused_apply_nerf(
            model_params, flat(xyz), per_sample(dirs),
            per_sample(a_emb) if a_emb is not None else None,
            per_sample(t_emb) if output_transient else None,
            output_transient=output_transient, compute_dtype=cfg.dtype,
            n_freq_xyz=cfg.N_emb_xyz, n_freq_dir=cfg.N_emb_dir,
            barf_w_xyz=bw_x, barf_w_dir=bw_d, interpret=not on_tpu)
    else:
        xyz_emb = flat(_embed_xyz(cfg, xyz, epoch))
        dir_a = None
        if not sigma_only:
            dir_emb = _embed_dir(cfg, dirs, epoch)
            parts = [dir_emb] + ([a_emb] if a_emb is not None else [])
            # stays per-RAY: apply_nerf contracts the conditioning block
            # per ray and broadcast-adds, so the (N*S, C) broadcast the
            # reference materializes (rendering.py:113-118) never hits HBM
            dir_a = jnp.concatenate(parts, axis=-1)
        def _apply(mp, xe, da, te):
            return apply_nerf(mp, mcfg, xe, da, te,
                              sigma_only=sigma_only,
                              output_transient=output_transient,
                              compute_dtype=cfg.dtype,
                              samples_per_ray=S)

        if cfg.remat_mlp:
            # full remat: save only the (much smaller) embedded inputs,
            # recompute trunk activations inside the backward.
            # prevent_cse=False: we are always under jit here, and the
            # scanned K-step program needs the recompute NOT hoisted.
            _apply = jax.checkpoint(_apply, prevent_cse=False)
        out = _apply(model_params, xyz_emb, dir_a,
                     t_emb if output_transient else None)
    return {k: v.reshape((N, S) + v.shape[1:]) for k, v in out.items()}


def render_rays(params: Dict[str, Any], rays: jnp.ndarray, ts: jnp.ndarray,
                rng, cfg: RenderConfig, *, epoch=0.0, test_time: bool = False,
                output_transient: bool = True,
                a_embedded: Optional[jnp.ndarray] = None,
                t_embedded: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """Render a batch of rays (reference rendering.py:49-288).

    Args:
      params: {'nerf_coarse', ['nerf_fine'], ['embedding_a'], ['embedding_t']}.
      rays: (N_rays, 8) = [o, d, near, far] world-space rays.
      ts: (N_rays,) int32 image ids for the embedding lookups.
      rng: PRNG key (may be None when perturb == noise_std == 0 and
        N_importance == 0 or perturb == 0).
      cfg: static RenderConfig.
      epoch: traced scalar driving BARF annealing.
      test_time: coarse pass runs sigma-only, and the static/transient
        decomposition maps are produced (rendering.py:103-111, 192-217).
      output_transient: the reference's kwargs['output_transient'] override
        (rendering.py:281) — e.g. eval.py:184 disables the transient field
        for phototourism test renders.
      a_embedded / t_embedded: (N_rays, dim) embedding overrides, the
        appearance-interpolation hook (rendering.py:276-286).

    Returns a dict keyed like the reference results dict.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k_perturb, k_noise_c, k_noise_f, k_pdf = jax.random.split(rng, 4)

    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]

    z_vals = sampling.stratified_z_vals(
        k_perturb, near, far, cfg.N_samples,
        use_disp=cfg.use_disp, perturb=cfg.perturb)
    xyz_coarse = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]

    results: Dict[str, jnp.ndarray] = {}
    ccfg = cfg.nerf_config("coarse")

    # The reference always runs the coarse model sigma-only at test time
    # (rendering.py:103-111), which leaves a coarse-only model with nothing
    # to render at eval.  Divergence: when there is no fine model, the
    # coarse pass renders fully even at test time.
    if test_time and cfg.N_importance > 0:
        out = _run_mlp(params["nerf_coarse"], ccfg, cfg, xyz_coarse,
                       epoch=epoch, sigma_only=True)
        comp = compositing.composite_static(
            z_vals, None, out["static_sigma"], noise_std=0.0,
            white_back=cfg.white_back, weights_only=True)
        results["weights_coarse"] = comp.weights
        results["opacity_coarse"] = comp.opacity
    else:
        out = _run_mlp(params["nerf_coarse"], ccfg, cfg, xyz_coarse,
                       rays_d, epoch=epoch)
        comp = compositing.composite_static(
            z_vals, out["static_rgb"], out["static_sigma"],
            noise_rng=k_noise_c, noise_std=cfg.noise_std,
            white_back=cfg.white_back)
        results["weights_coarse"] = comp.weights
        results["opacity_coarse"] = comp.opacity
        results["rgb_coarse"] = comp.rgb
        results["depth_coarse"] = comp.depth

    if cfg.N_importance == 0:
        return results

    # --- hierarchical sampling (rendering.py:267-273) ---
    z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    inner_weights = jax.lax.stop_gradient(results["weights_coarse"][:, 1:-1])
    z_fine = sampling.sample_pdf(k_pdf, z_mid, inner_weights,
                                 cfg.N_importance, det=(cfg.perturb == 0))
    # both arrays are per-row sorted (stratified z is monotone even when
    # jittered; sample_pdf emits order statistics), so the reference's full
    # sort (rendering.py:272) reduces to a rank merge — dense VPU work
    # instead of XLA's slow per-row TPU sort.
    z_vals = rank_merge_sorted(z_vals, z_fine)
    xyz_fine = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]

    fcfg = cfg.nerf_config("fine")
    a_emb = None
    if fcfg.encode_appearance:
        a_emb = a_embedded if a_embedded is not None else \
            embedding_lookup(params["embedding_a"], ts)
    do_transient = output_transient and fcfg.encode_transient
    t_emb = None
    if do_transient:
        t_emb = t_embedded if t_embedded is not None else \
            embedding_lookup(params["embedding_t"], ts)

    out = _run_mlp(params["nerf_fine"], fcfg, cfg, xyz_fine, rays_d,
                   a_emb=a_emb, t_emb=t_emb, output_transient=do_transient,
                   epoch=epoch)

    if do_transient:
        comp = compositing.composite_transient(
            z_vals, out["static_rgb"], out["static_sigma"],
            out["transient_rgb"], out["transient_sigma"], out["transient_beta"],
            beta_min=cfg.beta_min, white_back=cfg.white_back)
        results["weights_fine"] = comp.weights
        results["opacity_fine"] = comp.opacity
        results["transient_sigmas"] = out["transient_sigma"]
        results["beta"] = comp.beta
        results["_rgb_fine_static"] = comp.static_rgb
        results["_rgb_fine_transient"] = comp.transient_rgb
        results["rgb_fine"] = comp.rgb
        results["depth_fine"] = comp.depth
        if test_time:
            rgb_s, depth_s = compositing.composite_solo_field(
                z_vals, out["static_rgb"], out["static_sigma"],
                white_back=cfg.white_back, combined_opacity=comp.opacity)
            results["rgb_fine_static"] = rgb_s
            results["depth_fine_static"] = depth_s
            rgb_t, depth_t = compositing.composite_solo_field(
                z_vals, out["transient_rgb"], out["transient_sigma"],
                white_back=False)
            results["rgb_fine_transient"] = rgb_t
            results["depth_fine_transient"] = depth_t
    else:
        comp = compositing.composite_static(
            z_vals, out["static_rgb"], out["static_sigma"],
            noise_rng=k_noise_f, noise_std=cfg.noise_std,
            white_back=cfg.white_back)
        results["weights_fine"] = comp.weights
        results["opacity_fine"] = comp.opacity
        results["rgb_fine"] = comp.rgb
        results["depth_fine"] = comp.depth

    return results
