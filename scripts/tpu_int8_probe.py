"""Primitive-level probe for int8 decode weights (VERDICT r4 item 8).

Rollout decode is weight-stream-bound (docs/PERF.md: 1.2 GB of bf16
weights per step incl. the 311 MB LM head → ≥2.4 ms/step HBM floor at
G=16). int8 weights would halve that stream — IF XLA actually streams the
int8 bytes and dequantizes in-register, rather than materializing a bf16
copy. This times a decode-shaped matmul chain (B=32 rows through [d,3d],
[d,d], [d,4d]x2 layers and the [d,V] LM head) three ways:

  bf16      — baseline
  int8-dot  — lax.dot_general on (bf16 x int8) with fp32 accumulation,
              per-column scales applied to the (tiny) output
  int8-deq  — jnp matmul against w_int8.astype(bf16) * scale (tests
              whether XLA fuses the dequant into the matmul operand read)

If neither int8 path beats bf16 by ~1.5x+, the full int8 decode-path
implementation is not worth building on this stack — record and move on.
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

B, d, V, L = 32, 1024, 151936, 28
key = jax.random.key(0)
x0 = jax.random.normal(key, (B, d), jnp.bfloat16)

# per-layer weights: qkv-ish [d, 3d], o [d, d], mlp up [d, 4d], down [4d, d]
shapes = [(d, 3 * d), (d, d), (d, 4 * d), (4 * d, d)]
ws, w8s, scales = [], [], []
for li in range(L):
    lw = []
    for i, s in enumerate(shapes):
        w = jax.random.normal(jax.random.key(li * 7 + i), s, jnp.bfloat16) * 0.02
        lw.append(w)
    ws.append(lw)
w_lm = jax.random.normal(jax.random.key(999), (d, V), jnp.bfloat16) * 0.02


def quantize(w):
    a = np.asarray(w, np.float32)
    s = np.abs(a).max(axis=0) / 127.0 + 1e-12
    q = np.clip(np.round(a / s), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s, jnp.float32)


wq = [[quantize(w) for w in lw] for lw in ws]
wlm_q = quantize(w_lm)


def _fit(x, w_rows):
    # keep the chain shape-consistent: slice activations down to the next
    # matmul's input width (widths cycle d -> 3d -> d -> 4d -> d)
    return x[:, :w_rows] if x.shape[1] > w_rows else x


def step_bf16(x, ws, w_lm):
    for lw in ws:
        for w in lw:
            y = jnp.dot(_fit(x, w.shape[0]), w,
                        preferred_element_type=jnp.float32)
            x = jnp.tanh(y).astype(jnp.bfloat16)
    return jnp.dot(_fit(x, d), w_lm, preferred_element_type=jnp.float32)


def step_int8_dot(x, wq, wlm_q):
    for lw in wq:
        for q, s in lw:
            y = jax.lax.dot_general(
                _fit(x, q.shape[0]), q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s[None, :]
            x = jnp.tanh(y).astype(jnp.bfloat16)
    q, s = wlm_q
    return jax.lax.dot_general(
        _fit(x, d), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * s[None, :]


def step_int8_deq(x, wq, wlm_q):
    for lw in wq:
        for q, s in lw:
            w = q.astype(jnp.bfloat16)
            y = jnp.dot(_fit(x, w.shape[0]), w,
                        preferred_element_type=jnp.float32) * s[None, :]
            x = jnp.tanh(y).astype(jnp.bfloat16)
    q, s = wlm_q
    return jnp.dot(_fit(x, d), q.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) * s[None, :]


def bench(tag, fn, *args, steps=20):
    run = jax.jit(lambda x, *a: jax.lax.scan(
        lambda c, _: (jnp.tanh(fn(c, *a)[:, :d]).astype(jnp.bfloat16), None),
        x, None, length=steps)[0])
    jax.block_until_ready(run(x0, *args))
    ts = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(run(x0, *args))
        ts.append(time.time() - t0)
    ms = np.median(ts) / steps * 1e3
    print(f"{tag:<10} {ms:7.3f} ms/step")
    return ms


total_bytes_bf16 = sum(int(np.prod(s)) for s in shapes) * L * 2 + d * V * 2
print(f"weight stream: {total_bytes_bf16 / 2**30:.2f} GiB bf16/step "
      f"(floor {total_bytes_bf16 / 819e9 * 1e3:.2f} ms at 819 GB/s)")
a = bench("bf16", step_bf16, ws, w_lm)
b = bench("int8-dot", step_int8_dot, wq, wlm_q)
c = bench("int8-deq", step_int8_deq, wq, wlm_q)
print(f"speedups: int8-dot {a/b:.2f}x  int8-deq {a/c:.2f}x")
