"""A/B the LM-head loss implementations on the real chip.

mode="vocab" (XLA vocab-chunked custom_vjp, the r4 default) vs
mode="pallas" (fused Pallas stats kernels, ops/lm_stats.py), isolated
(loss fwd+bwd only) at the bench shapes, plus grad parity between them.
docs/PERF.md context: the loss bucket ran 108 ms at 2 groups against an
81 ms 4-matmul floor; the gap is XLA's dlogits/logits HBM transients.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.models import MODEL_CONFIGS
from dynamictreeattn_tpu.ops.losses import position_stats_from_hidden

mc = MODEL_CONFIGS["qwen3-0.6b"]
d, V = mc.hidden_size, mc.vocab_size
print(jax.devices(), f"d={d} V={V}")

for n in (6656, 12800):
    h = jax.random.normal(jax.random.key(0), (n, d), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (d, V), jnp.bfloat16) * 0.02
    g_lse = jax.random.normal(jax.random.key(2), (n,), jnp.float32)
    g_ent = jax.random.normal(jax.random.key(3), (n,), jnp.float32)

    grads = {}
    for mode in ("vocab", "pallas"):
        @jax.jit
        def lg(h, w, mode=mode):
            def f(h, w):
                lse, ent = position_stats_from_hidden(h, w, mode=mode)
                return jnp.sum(g_lse * lse + g_ent * ent)
            return jax.grad(f, argnums=(0, 1))(h, w)

        grads[mode] = jax.block_until_ready(lg(h, w))

        @jax.jit
        def many(h, w, mode=mode):
            def step(c, _):
                h, w = c
                dh, dw = lg(h, w)
                return (h + 1e-6 * dh.astype(h.dtype),
                        w + 1e-6 * dw.astype(w.dtype)), None
            return jax.lax.scan(step, (h, w), None, length=10)[0]

        jax.block_until_ready(many(h, w))
        ts = []
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(many(h, w))
            ts.append(time.time() - t0)
        floor = 4 * 2 * n * d * V / 197e12 * 1e3
        ms = np.median(ts) / 10 * 1e3
        print(f"n={n} loss fwd+bwd[{mode}]: {ms:.1f} ms "
              f"(4-matmul floor {floor:.1f} ms, {floor/ms:.0%})")

    for name, a, b in zip(["dh", "dW"], grads["vocab"], grads["pallas"]):
        a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
        rel = float(np.abs(a - b).max()) / max(1e-30, float(np.abs(a).max()))
        print(f"  {name}: max_rel pallas-vs-vocab {rel:.3e}")
