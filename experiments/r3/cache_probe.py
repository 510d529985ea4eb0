"""Probe: does jax persistent compilation cache work through the axon remote-compile path?
Compiles a tiny-but-not-trivial program twice (two processes via env flag), timing each.
"""
import os, sys, time
import jax, jax.numpy as jnp

cache_dir = "/root/repo/experiments/r3/jax_cache"
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

@jax.jit
def f(x, w1, w2):
    h = jnp.tanh(x @ w1)
    return jnp.sum(jnp.sin(h @ w2))

k = jax.random.PRNGKey(0)
x = jax.random.normal(k, (4096, 256), jnp.bfloat16)
w1 = jax.random.normal(k, (256, 256), jnp.bfloat16)
w2 = jax.random.normal(k, (256, 256), jnp.bfloat16)
t0 = time.perf_counter()
r = float(f(x, w1, w2))
dt = time.perf_counter() - t0
print(f"run={sys.argv[1] if len(sys.argv)>1 else '?'} first-call {dt:.1f}s result={r:.3f}", flush=True)
