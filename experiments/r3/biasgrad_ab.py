"""Microbench: can the per-layer bias-grad reduction (db = sum(dy, 0),
which re-reads dy from HBM after the dW matmul already read it) be fused
into the dW contraction by augmenting the x operand with a ones column?

The b1024 trace attributes ~0.3 ms/step to bias-grad loop fusions
(docs/PERF.md round-3).  Hypotheses:
  A (current): dW = x^T @ dy ; db = sum(dy, 0)     -- two reads of dy
  B: x_aug = concat([x, 1], 1); dWb = x_aug^T @ dy -- one read IF XLA
     doesn't split the concat-dot back into two dots and doesn't
     materialize x_aug (67 MB at the fine shape, which would cost MORE
     than the reduction saves)

Shapes: the fine-pass b1024 step, 131072 rows, 256 wide, bf16.

Run: nohup python experiments/r3/biasgrad_ab.py > experiments/r3/biasgrad_ab.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerf_fl_tpu.utils.compile_cache import enable_compile_cache  # noqa
enable_compile_cache()

N, W, L = 131072, 256, 8  # rows, width, layers


def bench(name, f, *args, k=30):
    np.asarray(jax.tree_util.tree_leaves(f(*args))[0]).reshape(-1)[0]
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(k):
            r = f(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[0]
        ts.append((time.perf_counter() - t0) / k)
    ms = sorted(ts)[1] * 1e3
    print(f"{name}: {ms:.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.normal(0, 1, (N, W)), jnp.bfloat16)
          for _ in range(L)]
    dys = [jnp.asarray(rng.normal(0, 1, (N, W)), jnp.bfloat16)
           for _ in range(L)]

    @jax.jit
    def variant_a(xs, dys):
        out = []
        for x, dy in zip(xs, dys):
            dw = jax.lax.dot_general(
                x, dy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db = jnp.sum(dy.astype(jnp.float32), axis=0)
            out.append((dw, db))
        return out

    @jax.jit
    def variant_b(xs, dys):
        out = []
        ones = jnp.ones((N, 1), jnp.bfloat16)
        for x, dy in zip(xs, dys):
            xa = jnp.concatenate([x, ones], axis=1)
            dwb = jax.lax.dot_general(
                xa, dy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out.append((dwb[:W], dwb[W]))
        return out

    @jax.jit
    def matmul_only(xs, dys):
        return [jax.lax.dot_general(x, dy, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for x, dy in zip(xs, dys)]

    a = bench("A: dW + separate sum(dy)", variant_a, xs, dys)
    b = bench("B: ones-augmented dot", variant_b, xs, dys)
    m = bench("matmul only (floor)", matmul_only, xs, dys)
    print(f"bias-grad overhead A: {a - m:.3f} ms over {L} layers; "
          f"B vs A: {b - a:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
