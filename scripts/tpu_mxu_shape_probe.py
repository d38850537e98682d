"""How fast does raw XLA run the tree kernel's matmul population?

Times a batched score+cast+PV dot_general chain at EXACTLY the bound
forward's tile shapes ([512,512] score with K=dh=128; [512,128] PV with
K=bkv=512; B = active pair-tiles per h-grid row at the 2-group bench
shape) — the compiler-baseline row of the round-5 forward-floor
decomposition (docs/PERF.md). Result on v5e: ~16% of bf16 peak, i.e. the
Pallas kernel at ~46% of the same matched-FLOP roofline is ~2.8x faster
than XLA on its own matmul shapes.

Timing note: on the tunneled chip, block_until_ready on a large on-device
output does not reliably fence small programs — a scalar host readback
(float(...)) is the sync point, and each call's input is perturbed so no
layer can serve a cached result.

Reference role: FA3 forward baseline (/root/reference/run.py:130).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, N = 302, 28  # active pair-tiles per h-row x2 h-rows; calls per dispatch


def main():
    ks = jax.random.normal(jax.random.key(0), (N, B, 512, 128), jnp.bfloat16)
    qs = jax.random.normal(jax.random.key(1), (N, B, 512, 128), jnp.bfloat16)
    vs = jax.random.normal(jax.random.key(3), (N, B, 512, 128), jnp.bfloat16)

    @jax.jit
    def run(ks, qs, vs, eps):
        def one(t):
            k, q, v = t
            st = lax.dot_general(
                k, q, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            o = lax.dot_general(
                st.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return jnp.sum(o)

        return jnp.sum(lax.map(one, (ks + eps, qs, vs)))

    flops = 2 * B * 512 * 512 * 128 * 2  # score + PV per call
    float(run(ks, qs, vs, jnp.bfloat16(0)))  # compile + warm
    ts = []
    for i in range(4):
        t0 = time.time()
        float(run(ks, qs, vs, jnp.bfloat16(i * 0.001)))
        ts.append((time.time() - t0) / N)
    dt = float(np.median(ts))
    print(f"xla score+cast+pv at kernel shapes: {dt*1e3:.3f} ms/call  "
          f"{flops/dt/1e12:.1f} TF/s  {flops/dt/197e12:.1%} of bf16 peak  "
          f"(kernel-equivalent {dt*8*1e3:.1f} ms vs pallas ~3.6)")


if __name__ == "__main__":
    main()
