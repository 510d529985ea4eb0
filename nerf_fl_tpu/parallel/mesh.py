"""Device mesh + sharding layout for SPMD training.

The reference scales by PyTorch-Lightning DDP over NCCL (train.py:235-236);
nothing below its L4 layer is distribution-aware.  Here distribution is a
first-class layout decision handed to XLA:

  * ``data`` axis — rays are sharded on the batch dimension; gradient
    all-reduce over ICI is inserted automatically by the SPMD partitioner
    when sharded-batch grads meet replicated params.
  * ``model`` axis (optional) — tensor parallelism over the MLP width.
    Alternating column-/row-parallel layer shardings (Megatron-style) so the
    partitioner places one collective per pair of layers instead of one per
    layer.

A NeRF-W MLP is ~1.2M params, so DP is the strategy that matters; TP exists
because it is nearly free to express in this design and demonstrates the
multi-axis layout on larger variants (--model_parallel N, W >= 1024).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_data is None:
        if n % num_model:
            raise ValueError(f"{n} devices not divisible by model={num_model}")
        num_data = n // num_model
    use = num_data * num_model
    if use > n:
        platform = devices[0].platform if devices else "unknown"
        raise ValueError(
            f"requested mesh data={num_data} x model={num_model} = {use} "
            f"devices but only {n} {platform} device(s) available. "
            "Fixes: run single-chip (--num_gpus 1), or simulate chips on "
            "CPU by setting XLA_FLAGS=--xla_force_host_platform_device_"
            f"count={use} and jax.config.update('jax_platforms', 'cpu') "
            "before any JAX backend use (see tests/conftest.py).")
    dev = np.asarray(devices[:use]).reshape(num_data, num_model)
    return Mesh(dev, ("data", "model"))


def batch_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Ray-batch axis (position ``axis``) over 'data'.  The single source of
    the batch-sharding spec — train, render and multihost placement all
    route through it."""
    return NamedSharding(mesh, P(*([None] * axis + ["data"])))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: int = 0) -> Any:
    """Device-put a host batch pytree with the batch axis over 'data'.

    ``axis`` is the position of the ray-batch dimension in every leaf
    (axis=1 for the (K, B, ...) stacks used by steps_per_execution).

    On a single-device mesh this is a plain transfer: an explicit
    NamedSharding device_put costs ~3.5 ms/step through the tunneled
    runtime used here (measured, experiments/fit_overhead.py) — a 25%
    train-loop tax for a no-op sharding.
    """
    import jax.numpy as jnp
    if mesh.devices.size == 1 and mesh.devices.flat[0] == jax.devices()[0]:
        return jax.tree_util.tree_map(jnp.asarray, batch)
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def _nerf_param_spec(path_keys) -> P:
    """Tensor-parallel layout for one NeRF MLP leaf.

    Trunk layers alternate column-parallel (shard out dim) and row-parallel
    (shard in dim); heads and row-parallel biases stay replicated.
    """
    name = path_keys[-1]
    where = path_keys[:-1]
    if "xyz" in where:
        idx = next((k for k in where if isinstance(k, int)), 0)
        col = (idx % 2 == 0)  # even layers column-parallel
        if name == "w":
            return P(None, "model") if col else P("model", None)
        return P("model") if col else P()
    if "xyz_final" in where or "dir" in where:
        if name == "w":
            return P(None, "model")
        return P("model")
    return P()  # heads, embeddings, poses: replicated


def param_shardings(mesh: Mesh, params: Any, model_parallel: bool = False) -> Any:
    """NamedSharding pytree for the parameter tree.

    With model_parallel=False everything is replicated (pure DP).
    """

    def spec_for(path, leaf):
        if not model_parallel:
            return NamedSharding(mesh, P())
        keys = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
        if keys and keys[0] in ("nerf_coarse", "nerf_fine"):
            spec = _nerf_param_spec(keys[1:])
            # only shard axes that divide evenly
            ok = all(
                a is None or leaf.shape[i] % mesh.shape[a] == 0
                for i, a in enumerate(spec)
            )
            return NamedSharding(mesh, spec if ok else P())
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def place_params(mesh: Mesh, params: Any, model_parallel: bool = False) -> Any:
    shardings = param_shardings(mesh, params, model_parallel)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
