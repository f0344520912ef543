"""Probe: does int8 MXU give ~2x over bf16 on this TPU (through axon)?

Times K chained matmuls inside ONE jitted program (dispatch amortized, so
wall clock reflects device compute despite the axon tunnel). Shapes mirror
the megakernel's hot dots: M in {144, 512}, K=N=1024 and the MLP 1024x2730.

Run: python tools/int8_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])  # force
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chain_dot(dtype, acc, m, k, n, reps=400):
    """Chained A@B reps times: each iteration feeds a slice of the previous
    result back into A so XLA cannot elide iterations."""
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        a = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
        b = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
    else:
        a = jax.random.normal(key, (m, k), dtype)
        b = jax.random.normal(key, (k, n), dtype)

    @jax.jit
    def run(a, b):
        def body(i, carry):
            c = jnp.dot(carry, b[:, :k] if n >= k else b[:, :k],
                        preferred_element_type=acc)
            # renormalize back to the input dtype/range
            if dtype == jnp.int8:
                c = (c >> 7).astype(jnp.int8)
            else:
                c = c.astype(dtype) * jnp.array(0.03125, dtype)
            return c[:, :k] if c.shape[1] != k else c

        return jax.lax.fori_loop(0, reps, body, a)

    t = bench(run, a, b)
    flops = 2 * m * k * min(n, k) * reps
    return t, flops / t / 1e12


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    for m in (144, 512, 1024):
        k = n = 1024
        tb, fb = chain_dot(jnp.bfloat16, jnp.float32, m, k, n)
        ti, fi = chain_dot(jnp.int8, jnp.int32, m, k, n)
        print(f"M={m:5d} K=N=1024  bf16 {fb:7.1f} TFLOP/s   "
              f"int8 {fi:7.1f} TOP/s   ratio {fb and fi/fb:.2f}x")


if __name__ == "__main__":
    main()
