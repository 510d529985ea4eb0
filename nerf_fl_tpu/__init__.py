"""nerf_fl_tpu — a TPU-native JAX/XLA/Pallas re-implementation of the
capabilities of nmerty/nerf-fl (NeRF-W with BARF-style pose refinement).

Design stance (TPU-first, not a port):
  * pure functions over pytrees; a single jitted train step with static shapes
    (no host-side chunk loops on the training path),
  * explicit PRNG key threading instead of global RNG state,
  * SPMD over a ``jax.sharding.Mesh`` (data parallel + optional tensor
    parallel over the MLP width) with XLA collectives over ICI,
  * Pallas kernels for the fused hot path (PE -> MLP -> compositing).

Layer map (mirrors SURVEY.md section 1):
  core/      geometry + sampling + compositing primitives      (ref L0/L3)
  models/    NeRF MLP, embeddings, learned poses               (ref L2)
  render/    the fused volume-rendering pipeline               (ref L3)
  ops/       Pallas TPU kernels                                (perf path)
  data/      host-side dataset pipelines                       (ref L1)
  parallel/  mesh + sharding helpers                           (ref: DDP)
  training/  losses, metrics, optimizers, checkpoints, system  (ref L4)
"""

__version__ = "0.1.0"
