"""Kernel speed-of-light check (BASELINE.md): tree-attention kernel vs JAX's
official in-tree Pallas flash attention at MATCHED FLOPs (causal, same
shapes) — the tree kernel run on forest-of-chains metadata computes exactly
causal attention, so any gap is pure kernel overhead."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.ops.tree_attention import BlockSizes, tree_attention
from dynamictreeattn_tpu.tries import build_block_meta

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
HQ, HKV, DH = 16, 8, 128
BQ = BKV = 256

key = jax.random.key(0)
q = jax.random.normal(key, (HQ, N, DH), dtype=jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (HKV, N, DH), dtype=jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (HKV, N, DH), dtype=jnp.bfloat16)

# single causal chain: last_desc = N-1 everywhere
last_desc = np.full(N, N - 1, dtype=np.int32)
meta = build_block_meta(last_desc, BQ, BKV)
margs = tuple(jnp.asarray(x) for x in (
    meta.kv_ids, meta.kv_counts, meta.kv_types,
    meta.q_ids, meta.q_counts, meta.q_types))
ld = jnp.asarray(last_desc)


@jax.jit
def mine_fwd(q, k, v):
    return tree_attention(q, k, v, ld, *margs, block_sizes=BlockSizes(BQ, BKV))


@jax.jit
def mine_grad(q, k, v):
    f = lambda *a: jnp.sum(mine_fwd(*a).astype(jnp.float32) ** 2)
    return jax.grad(f, argnums=(0, 1, 2))(q, k, v)


# official kernel: jax.experimental.pallas.ops.tpu.flash_attention
from jax.experimental.pallas.ops.tpu.flash_attention import (
    flash_attention as ref_flash,
)

# it wants [b, heads, n, dh] with equal q/kv head counts -> repeat kv
g = HQ // HKV
qb = q[None]
kb = jnp.repeat(k, g, axis=0)[None]
vb = jnp.repeat(v, g, axis=0)[None]


@jax.jit
def official_fwd(qb, kb, vb):
    return ref_flash(qb, kb, vb, causal=True, sm_scale=DH**-0.5)


@jax.jit
def official_grad(qb, kb, vb):
    f = lambda *a: jnp.sum(official_fwd(*a).astype(jnp.float32) ** 2)
    return jax.grad(f, argnums=(0, 1, 2))(qb, kb, vb)


def bench(tag, fn, *args, iters=10):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    s = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))  # sync
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        s = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    print(f"{tag:28s} {dt*1e3:8.2f}ms")
    return dt


# correctness at matched math
o_mine = mine_fwd(q, k, v)
o_ref = official_fwd(qb, kb, vb)[0]
err = float(jnp.max(jnp.abs(o_mine.astype(jnp.float32) - o_ref.astype(jnp.float32))))
print(f"N={N} causal fwd max abs diff vs official: {err:.4f}")

t1 = bench("tree kernel fwd", mine_fwd, q, k, v)
t2 = bench("official flash fwd", official_fwd, qb, kb, vb)
t3 = bench("tree kernel fwd+bwd", mine_grad, q, k, v)
t4 = bench("official flash fwd+bwd", official_grad, qb, kb, vb)
print(f"fwd ratio (mine/official): {t1/t2:.2f}   fwd+bwd ratio: {t3/t4:.2f}")
