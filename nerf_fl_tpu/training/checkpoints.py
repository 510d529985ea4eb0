"""Checkpoint save/load with per-submodule addressing.

The reference stores Lightning dicts and does name-prefix surgery at load
time (utils/__init__.py:67-88: strip '{model_name}.', honor
prefixes_to_ignore, non-strict load); eval.py:131-152 loads each submodule by
name.  Here the training state is a pytree whose top-level keys ARE the
submodule names ('nerf_coarse', 'nerf_fine', 'embedding_a', 'embedding_t',
'learn_poses'), serialized to a single msgpack file via flax.serialization —
so "surgery" is a dict lookup, and the same flat-name filtering semantics are
provided for tooling parity.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    epoch: int = 0, global_step: int = 0,
                    extra: Optional[Dict] = None) -> None:
    """Write a single-file msgpack checkpoint."""
    state = {
        "state_dict": serialization.to_state_dict(_to_host(params)),
        "epoch": epoch,
        "global_step": global_step,
    }
    if opt_state is not None:
        state["opt_state"] = serialization.to_state_dict(_to_host(opt_state))
    if extra:
        state["extra"] = extra
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # atomic write: a preempted run can never leave a torn checkpoint
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(state))
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest epoch=N.ckpt in a directory, or None.

    Sorted by epoch number (not mtime: a re-saved older ckpt must not win).
    """
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(ckpt_dir):
        m = re.match(r"epoch=(\d+)\.ckpt$", name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}." if not prefix else f"{prefix}{k}."))
        return out
    if isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
        return out
    out[prefix[:-1]] = tree
    return out


def extract_model_state_dict(ckpt_path: str, model_name: str = "model",
                             prefixes_to_ignore: Sequence[str] = ()) -> Dict:
    """Flat {dotted_name: array} for one submodule, with prefix filtering —
    the semantics of reference utils/__init__.py:67-82."""
    ckpt = load_checkpoint(ckpt_path)
    sd = ckpt.get("state_dict", ckpt)
    if model_name not in sd:
        return {}
    flat = _flatten(sd[model_name])
    out = {}
    for k, v in flat.items():
        if any(k.startswith(p) for p in prefixes_to_ignore):
            print("ignore", k)
            continue
        out[k] = v
    return out


def _replace_leaves(params_sub: Any, wanted: Dict, model_name: str) -> Any:
    """Replace leaves of ``params_sub`` by flat dotted name from ``wanted``;
    absent names keep their values (non-strict)."""

    def path_name(path) -> str:
        return ".".join(str(getattr(p, "key", getattr(p, "idx", ""))) for p in path)

    def replace(path, leaf):
        name = path_name(path)
        if name in wanted:
            arr = np.asarray(wanted[name])
            if arr.shape != leaf.shape:
                raise ValueError(
                    f"shape mismatch for {model_name}.{name}: "
                    f"ckpt {arr.shape} vs model {leaf.shape}")
            return arr.astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(replace, params_sub)


def load_ckpt(params_sub: Any, ckpt_path: str, model_name: str = "model",
              prefixes_to_ignore: Sequence[str] = ()) -> Any:
    """Non-strict submodule load: leaves present in the checkpoint replace the
    corresponding leaves of ``params_sub``; missing leaves keep their values
    (reference load_ckpt, utils/__init__.py:84-88)."""
    wanted = extract_model_state_dict(ckpt_path, model_name, prefixes_to_ignore)
    if not wanted:
        return params_sub
    return _replace_leaves(params_sub, wanted, model_name)


def load_into(params: Any, ckpt: Dict,
              prefixes_to_ignore: Sequence[str] = ()) -> Any:
    """Non-strict whole-tree load from an already-read checkpoint dict.

    For every top-level submodule present in both the checkpoint's state dict
    and ``params``, replace matching leaves; everything else (missing
    submodules, missing leaves, ignored prefixes) keeps its current value.
    This is the train-path analog of reference ``load_ckpt``
    (utils/__init__.py:84-88) honoring ``--prefixes_to_ignore``
    (opt.py:70-71): it accepts stripped (save_weights_only) and partial
    checkpoints that the strict full-state resume cannot.
    """
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = dict(params)
    for name, sub in params.items():
        if name not in sd:
            continue
        if any(name.startswith(p) for p in prefixes_to_ignore):
            print("ignore submodule", name)
            continue
        flat = {}
        for k, v in _flatten(sd[name]).items():
            if any(k.startswith(p) or f"{name}.{k}".startswith(p)
                   for p in prefixes_to_ignore):
                print("ignore", f"{name}.{k}")
                continue
            flat[k] = v
        out[name] = _replace_leaves(sub, flat, name)
    return out
