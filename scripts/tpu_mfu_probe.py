"""Calibrate peak achievable matmul throughput + step-level knob effects."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def bench_matmul(m, k, n, iters=20):
    a = jax.random.normal(jax.random.key(0), (m, k), dtype=jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (k, n), dtype=jnp.bfloat16)

    @jax.jit
    def f(a, b):
        # chain [m,k]@[k,n] then [m,n]@[n,k] pairs to amortize dispatch
        # without requiring k == n
        x = a
        for _ in range(4):
            y = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
            x = jnp.dot(y, b.T, preferred_element_type=jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    float(f(a, b))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        float(f(a, b))
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    flops = 8 * 2 * m * k * n
    print(f"matmul {m}x{k}x{n} x8: {dt*1e3:.2f}ms -> {flops/dt/1e12:.1f} TFLOPs")


for shape in [(8192, 4096, 4096), (8448, 1024, 3072), (8448, 1024, 151936 // 8)]:
    bench_matmul(*shape)
