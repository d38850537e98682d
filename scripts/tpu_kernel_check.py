"""Quick on-TPU parity + timing check for the tree-attention kernel.

Run on the real chip (no JAX_PLATFORMS override). Compares Pallas kernel
fwd/bwd against the dense-mask jnp reference on a random packed trie.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.ops import BlockSizes, tree_attention_reference
from dynamictreeattn_tpu.ops.tree_attention import tree_attention
from helpers import random_packed

print("devices:", jax.devices())

rng = np.random.default_rng(0)
block, n, dh = 128, 1024, 128
hq, hkv = 4, 2
_, trie, packed, meta = random_packed(rng, n, block, n_seqs=64, vocab=100, max_len=256)
print(f"n_tree_tokens={packed.n_tokens} padded={n} "
      f"active_pairs={meta.n_active_pairs}/{meta.n_q_blocks * meta.n_kv_blocks}")

key = jax.random.key(0)
kq, kk, kv_, kc = jax.random.split(key, 4)
dtype = jnp.bfloat16
q = jax.random.normal(kq, (hq, n, dh), dtype=dtype)
k = jax.random.normal(kk, (hkv, n, dh), dtype=dtype)
v = jax.random.normal(kv_, (hkv, n, dh), dtype=dtype)
cot = jax.random.normal(kc, (hq, n, dh), dtype=dtype)
ld = jnp.asarray(packed.last_desc)
margs = tuple(
    jnp.asarray(x)
    for x in (meta.kv_ids, meta.kv_counts, meta.kv_types,
              meta.q_ids, meta.q_counts, meta.q_types)
)

bs = BlockSizes(block, block)


@jax.jit
def run_fwd(q, k, v):
    return tree_attention(q, k, v, ld, *margs, block_sizes=bs)


@jax.jit
def run_grads(q, k, v):
    def f(q, k, v):
        o = tree_attention(q, k, v, ld, *margs, block_sizes=bs)
        return jnp.sum((o * cot).astype(jnp.float32))

    return jax.grad(f, argnums=(0, 1, 2))(q, k, v)


t0 = time.time()
out = run_fwd(q, k, v)
out.block_until_ready()
print("fwd compile+run", time.time() - t0)

ref = tree_attention_reference(q, k, v, ld)
err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
print("fwd max abs err vs ref (bf16):", float(err))

t0 = time.time()
gk = run_grads(q, k, v)
jax.block_until_ready(gk)
print("bwd compile+run", time.time() - t0)


def ref_grads(q, k, v):
    def f(q, k, v):
        o = tree_attention_reference(q, k, v, ld)
        return jnp.sum((o * cot).astype(jnp.float32))

    return jax.grad(f, argnums=(0, 1, 2))(q, k, v)


gr = jax.jit(ref_grads)(q, k, v)
for a, b, name in zip(gk, gr, ["dq", "dk", "dv"]):
    e = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    r = float(jnp.linalg.norm(a.astype(jnp.float32) - b.astype(jnp.float32))
              / (1e-9 + jnp.linalg.norm(b.astype(jnp.float32))))
    print(f"{name}: max abs err {e:.5f}  rel fro {r:.5f}")

# fused backward kernel (one kv-major dq+dk+dv pass) vs reference grads
@jax.jit
def run_grads_fused(q, k, v):
    def f(q, k, v):
        o = tree_attention(q, k, v, ld, *margs, block_sizes=bs,
                           bwd_mode="fused")
        return jnp.sum((o * cot).astype(jnp.float32))

    return jax.grad(f, argnums=(0, 1, 2))(q, k, v)


gf = run_grads_fused(q, k, v)
for a, b, name in zip(gf, gr, ["dq", "dk", "dv"]):
    e = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    r = float(jnp.linalg.norm(a.astype(jnp.float32) - b.astype(jnp.float32))
              / (1e-9 + jnp.linalg.norm(b.astype(jnp.float32))))
    print(f"{name}[fused]: max abs err {e:.5f}  rel fro {r:.5f}")

# bound-shift softmax mode: fast path exactness + guard fallback
@jax.jit
def run_fwd_bound(q, k, v):
    return tree_attention(q, k, v, ld, *margs, block_sizes=bs,
                          softmax_mode="bound")


ob = run_fwd_bound(q, k, v)
err = jnp.max(jnp.abs(ob.astype(jnp.float32) - ref.astype(jnp.float32)))
print("fwd[bound] max abs err vs ref (bf16):", float(err))
# 30x inputs push max(C) past BOUND_SAFE_MAX: cond must take the online kernel
qb, kb = q.astype(jnp.float32) * 30, k.astype(jnp.float32) * 30
og = run_fwd_bound(qb.astype(dtype), kb.astype(dtype), v)
refg = tree_attention_reference(qb.astype(dtype), kb.astype(dtype), v, ld)
err = jnp.max(jnp.abs(og.astype(jnp.float32) - refg.astype(jnp.float32)))
print("fwd[bound, guard-fallback] max abs err vs ref:", float(err))
assert float(err) < 0.1

# timing
for fn, nm in [(run_fwd, "fwd"), (run_grads, "fwd+bwd")]:
    ts = []
    for _ in range(10):
        t0 = time.time()
        jax.block_until_ready(fn(q, k, v))
        ts.append(time.time() - t0)
    print(f"{nm}: median {np.median(ts)*1e3:.3f} ms")
print("OK")
