"""Persistent XLA compilation cache for every CLI.

On the tunneled TPU runtime used in this environment, each program shape
remote-compiles in 30-400 s; JAX's persistent compilation cache honors that
path (measured 412.8 s -> 8.5 s for an identical program), so enabling it
by default turns the second-and-later runs of any train/eval/bench config
into second-scale startups.  Harmless elsewhere (local compiles just get
cached too).

Opt out with NERF_FL_TPU_NO_COMPILE_CACHE=1; override the location with
NERF_FL_TPU_COMPILE_CACHE=<dir>.
"""
from __future__ import annotations

import os
import sys
from typing import Optional


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Point jax at a persistent compilation cache directory.

    Must be called BEFORE the first compilation (any jit execution).
    Returns the cache dir, or None if disabled/unavailable.
    """
    if os.environ.get("NERF_FL_TPU_NO_COMPILE_CACHE"):
        return None
    path = (path or os.environ.get("NERF_FL_TPU_COMPILE_CACHE")
            or os.path.expanduser("~/.cache/nerf_fl_tpu/xla"))
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything: remote compiles are expensive at ANY size
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        try:
            # CRITICAL (round-4 BENCH-timeout root cause): jax's default
            # 'xla_gpu_per_fusion_autotune_cache_dir' embeds the cache DIR
            # PATH into debug_options, which is hashed into every cache
            # key — entries built in a staging dir (the round-3 fresh-dir
            # rebuild recipe) could therefore NEVER hit when later read
            # from .jax_bench_cache: same program, different key.  The
            # XLA-side caches this option controls are GPU-only features;
            # disabling makes keys depend only on the program + backend.
            # Verified: identical program under two cache dirs hashes to
            # the same key with "none", different keys without.
            jax.config.update("jax_persistent_cache_enable_xla_caches",
                              "none")
        except Exception:
            pass  # older jax without the option: keys were dir-free there
        return path
    except Exception as e:  # never let caching break a run
        # stderr: bench.py's driver contract is ONE JSON line on stdout
        print(f"[compile-cache] unavailable: {e}", file=sys.stderr)
        return None
