"""On-TPU check of the ring tree-attention building blocks (single chip).

One real chip can't host an sp>1 "seq" mesh, so this simulates the ring on
one device: for every (q shard, kv shard) pair it calls the SAME pair
kernels the ring op uses (_fwd/_bwd_dq/_bwd_dkv with position offsets and
build_ring_block_meta tables), combines the partials exactly like
ops/tree_attention_ring.py, and compares against the full-sequence kernel.
Everything except the ppermute dataflow (covered by the fake-mesh CPU tests)
runs on real hardware.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.ops import BlockSizes
from dynamictreeattn_tpu.ops.tree_attention import (
    _bwd_dq,
    _bwd_dkv,
    _fwd,
    tree_attention,
)
from dynamictreeattn_tpu.ops.tree_attention_ring import _combine
from dynamictreeattn_tpu.tries import build_ring_block_meta
from helpers import random_packed

print("devices:", jax.devices())

rng = np.random.default_rng(0)
sp, block, n, dh = 4, 128, 2048, 128
hq, hkv = 4, 2
group = hq // hkv
n_loc = n // sp
_, _, packed, meta_full = random_packed(rng, n, block, n_seqs=48, vocab=100, max_len=200)
rmeta = build_ring_block_meta(packed.last_desc, sp, block, block)
print(f"n={n} sp={sp} n_loc={n_loc} pair_kv_slots={rmeta.kv_ids.shape[-1]} "
      f"pair_q_slots={rmeta.q_ids.shape[-1]}")

key = jax.random.key(0)
kq, kk, kv_, kc = jax.random.split(key, 4)
dtype = jnp.bfloat16
q = jax.random.normal(kq, (hq, n, dh), dtype=dtype)
k = jax.random.normal(kk, (hkv, n, dh), dtype=dtype)
v = jax.random.normal(kv_, (hkv, n, dh), dtype=dtype)
cot = jax.random.normal(kc, (hq, n, dh), dtype=dtype)
ld2 = jnp.asarray(packed.last_desc).reshape(1, n).astype(jnp.int32)
bs = BlockSizes(block, block)
scale = dh**-0.5

# ---- oracle: full-sequence kernel fwd + grads
margs = tuple(
    jnp.asarray(x)
    for x in (meta_full.kv_ids, meta_full.kv_counts, meta_full.kv_types,
              meta_full.q_ids, meta_full.q_counts, meta_full.q_types)
)
o_full = tree_attention(q, k, v, jnp.asarray(packed.last_desc), *margs, block_sizes=bs)
g_full = jax.grad(
    lambda q, k, v: jnp.sum(
        tree_attention(q, k, v, jnp.asarray(packed.last_desc), *margs,
                       block_sizes=bs).astype(jnp.float32)
        * cot.astype(jnp.float32)
    ),
    argnums=(0, 1, 2),
)(q, k, v)

# ---- simulated ring: per-pair partials with the pair kernels
q4 = q.reshape(hkv, group, n, dh)
do4 = cot.reshape(hkv, group, n, dh)


def shard(x, a):
    return x[..., a * n_loc:(a + 1) * n_loc, :]


o_parts, lse_parts = [], []
for a in range(sp):
    o_run = jnp.zeros((hkv, group, n_loc, dh), jnp.float32)
    lse_run = jnp.full((hkv, group, n_loc), -jnp.inf, jnp.float32)
    for b in range(sp):
        offs = jnp.asarray([a * n_loc, b * n_loc], jnp.int32)
        o_i, lse_i = _fwd(
            shard(q4, a), shard(k, b), shard(v, b), ld2,
            jnp.asarray(rmeta.kv_ids[a, b]), jnp.asarray(rmeta.kv_counts[a, b]),
            jnp.asarray(rmeta.kv_types[a, b]), scale, bs, False, offs=offs,
        )
        o_run, lse_run = _combine(o_run, lse_run, o_i, lse_i)
    o_parts.append(o_run.astype(dtype))
    lse_parts.append(lse_run)
o_ring = jnp.concatenate(o_parts, axis=2).reshape(hq, n, dh)

err = float(jnp.max(jnp.abs(o_ring.astype(jnp.float32) - o_full.astype(jnp.float32))))
ref = float(jnp.max(jnp.abs(o_full.astype(jnp.float32))))
print(f"fwd  max abs diff {err:.3e} (scale {ref:.3e})")
assert err < 3e-2 * max(ref, 1.0), "ring fwd diverged"

# ---- simulated ring backward
dq_parts = []
dk_acc = [jnp.zeros((hkv, n_loc, dh), jnp.float32) for _ in range(sp)]
dv_acc = [jnp.zeros((hkv, n_loc, dh), jnp.float32) for _ in range(sp)]
for a in range(sp):
    lse_a = lse_parts[a]
    o_a = o_parts[a]
    do_a = shard(do4, a)
    di_a = jnp.sum(do_a.astype(jnp.float32) * o_a.astype(jnp.float32), axis=-1)
    dq_run = jnp.zeros((hkv, group, n_loc, dh), jnp.float32)
    for b in range(sp):
        offs = jnp.asarray([a * n_loc, b * n_loc], jnp.int32)
        dq_p = _bwd_dq(
            shard(q4, a), shard(k, b), shard(v, b), ld2,
            jnp.asarray(rmeta.kv_ids[a, b]), jnp.asarray(rmeta.kv_counts[a, b]),
            jnp.asarray(rmeta.kv_types[a, b]), do_a, lse_a, di_a,
            scale, bs, False, offs=offs,
        )
        dk_p, dv_p = _bwd_dkv(
            shard(q4, a), shard(k, b), shard(v, b), ld2,
            jnp.asarray(rmeta.q_ids[a, b]), jnp.asarray(rmeta.q_counts[a, b]),
            jnp.asarray(rmeta.q_types[a, b]), do_a, lse_a, di_a,
            scale, bs, False, offs=offs,
        )
        dq_run = dq_run + dq_p.astype(jnp.float32)
        dk_acc[b] = dk_acc[b] + dk_p.astype(jnp.float32)
        dv_acc[b] = dv_acc[b] + dv_p.astype(jnp.float32)
    dq_parts.append(dq_run)
dq_ring = jnp.concatenate(dq_parts, axis=2).reshape(hq, n, dh)
dk_ring = jnp.concatenate(dk_acc, axis=1)
dv_ring = jnp.concatenate(dv_acc, axis=1)

for name, a, b in [
    ("dq", dq_ring, g_full[0]),
    ("dk", dk_ring, g_full[1]),
    ("dv", dv_ring, g_full[2]),
]:
    a32 = jnp.asarray(a, jnp.float32)
    b32 = jnp.asarray(b, jnp.float32)
    rel = float(jnp.linalg.norm(a32 - b32) / jnp.maximum(jnp.linalg.norm(b32), 1e-9))
    print(f"bwd  {name} rel diff {rel:.3e}")
    assert rel < 3e-2, f"{name} diverged"

print("ring kernel building blocks OK on", jax.devices()[0].platform)
