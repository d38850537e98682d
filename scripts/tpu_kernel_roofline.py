"""Kernel speed-of-light check (BASELINE.md, VERDICT r02 item 1).

Two sections:

1. Per-kernel roofline table at the BENCH shape: each tree-attention kernel
   (fwd online / fwd bound / dq / dkv / fused dq+dk+dv) timed on real trie
   metadata (the 2-group tau2-16k-like workload, 13312 padded tokens), as
   a layer-count batch of calls inside one jit, against the matched-FLOP
   matmul roofline (v5e bf16 peak 197 TFLOP/s).
2. Causal parity + comparison vs JAX's official in-tree Pallas flash
   attention at matched FLOPs — the tree kernel on forest-of-chains metadata
   computes exactly causal attention, so any gap is pure kernel overhead.

Usage: python scripts/tpu_kernel_roofline.py [section1|section2|all]
Env: DTA_RF_BQ / DTA_RF_BKV block sizes (default 512/512), DTA_RF_CALLS
(default 28 = layer count), DTA_RF_PROMPTS (default 2 groups).
"""

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

import sys as _sys
import dynamictreeattn_tpu.ops.tree_attention  # noqa: F401
ta = _sys.modules["dynamictreeattn_tpu.ops.tree_attention"]
from dynamictreeattn_tpu.ops.tree_attention import BlockSizes, tree_attention
from dynamictreeattn_tpu.tries import build_block_meta

PEAK_TFLOPS = 197.0  # v5e bf16
SECTION = sys.argv[1] if len(sys.argv) > 1 else "all"
BQ = int(os.environ.get("DTA_RF_BQ", "512"))
BKV = int(os.environ.get("DTA_RF_BKV", "512"))
HB = int(os.environ.get("DTA_RF_HB", "4"))  # BlockSizes.head_block
CALLS = int(os.environ.get("DTA_RF_CALLS", "28"))
HQ, HKV, DH = 16, 8, 128
GROUP = HQ // HKV


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return float(np.median(ts))


def batch_over_calls(single):
    """Map a kernel call over CALLS stacked (q4, k, v) triples inside one
    jit — distinct inputs so XLA cannot CSE the calls."""

    @jax.jit
    def run(qs, ks, vs, *rest):
        return jax.lax.map(lambda t: single(*t, *rest), (qs, ks, vs))

    return run


def section1():
    from dynamictreeattn_tpu.data import synthetic_rollout_batch
    from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine
    from dynamictreeattn_tpu.models import MODEL_CONFIGS
    from dynamictreeattn_tpu.tries import TokenTrie

    mc = MODEL_CONFIGS["qwen3-0.6b"]
    ec = EngineConfig(block_q=BQ, block_kv=BKV, bucketing="exact")
    engine = TreeEngine(mc, ec)
    seqs, attachs = synthetic_rollout_batch(
        seed=0, n_prompts=int(os.environ.get("DTA_RF_PROMPTS", "2")),
        samples_per_prompt=16,
        prompt_len=(1024, 2048), completion_len=(128, 512), branch_prob=0.85,
    )
    batch = engine.prepare(TokenTrie(seqs, attachs))
    n = batch.n_padded
    kv_ids, kv_counts, kv_types, q_ids, q_counts, q_types = batch.meta[:6]
    ld2 = jnp.asarray(batch.packed.last_desc).reshape(1, n).astype(jnp.int32)
    active_pairs = int(jnp.sum(jnp.asarray(kv_types) > 0))
    slot_pairs = int(np.prod(kv_ids.shape))
    tslot_pairs = int(np.prod(q_ids.shape))
    print(
        f"bench shape: n={n} bq/bkv={BQ}/{BKV} active pairs={active_pairs} "
        f"(kv slots {kv_ids.shape}, waste {1 - active_pairs / slot_pairs:.0%}; "
        f"q slots {q_ids.shape}, waste {1 - active_pairs / tslot_pairs:.0%})"
    )

    key = jax.random.key(0)
    shape4 = (CALLS, HKV, GROUP, n, DH)
    qs = jax.random.normal(key, shape4, dtype=jnp.bfloat16) * 0.3
    ks = jax.random.normal(jax.random.key(1), (CALLS, HKV, n, DH), dtype=jnp.bfloat16) * 0.3
    vs = jax.random.normal(jax.random.key(2), (CALLS, HKV, n, DH), dtype=jnp.bfloat16)
    dos = jax.random.normal(jax.random.key(3), shape4, dtype=jnp.bfloat16)
    scale = DH ** -0.5
    bs = BlockSizes(BQ, BKV, head_block=HB)
    kvm = (kv_ids, kv_counts, kv_types)
    qm = (q_ids, q_counts, q_types)

    # residuals for the backward kernels (lse, di) from one forward
    o1, lse1 = ta._fwd(qs[0], ks[0], vs[0], ld2, *kvm, scale, bs, False)
    di1 = jnp.sum(dos[0].astype(jnp.float32) * o1.astype(jnp.float32), axis=-1)
    lses = jnp.broadcast_to(lse1, (CALLS,) + lse1.shape)
    dis = jnp.broadcast_to(di1, (CALLS,) + di1.shape)

    # matched-FLOP matmul rooflines: active pairs x group x (#matmuls) x
    # 2*bq*bkv*dh FLOPs, per call, x hkv heads. active_pairs already counts
    # per-(q block, kv block) over ONE head's metadata; the grid repeats it
    # for each of the HKV heads.
    base = active_pairs * HKV * GROUP * 2 * BQ * BKV * DH / (PEAK_TFLOPS * 1e12)
    roof = {"fwd_online": 2 * base, "fwd_bound": 2 * base, "dq": 3 * base,
            "dkv": 4 * base, "fused": 5 * base, "cached": 5 * base}

    runs = {}
    runs["fwd_online"] = (
        batch_over_calls(
            lambda q, k, v: ta._fwd(q, k, v, ld2, *kvm, scale, bs, False)
        ),
        (qs, ks, vs),
    )
    runs["fwd_bound"] = (
        batch_over_calls(
            lambda q, k, v: ta._fwd_bound(q, k, v, ld2, *kvm, scale, bs, False)
        ),
        (qs, ks, vs),
    )

    @jax.jit
    def run_dq(qs, ks, vs, dos, lses, dis):
        return jax.lax.map(
            lambda t: ta._bwd_dq(t[0], t[1], t[2], ld2, *kvm, t[3], t[4], t[5],
                                 scale, bs, False),
            (qs, ks, vs, dos, lses, dis),
        )

    @jax.jit
    def run_dkv(qs, ks, vs, dos, lses, dis):
        return jax.lax.map(
            lambda t: ta._bwd_dkv(t[0], t[1], t[2], ld2, *qm, t[3], t[4], t[5],
                                  scale, bs, False),
            (qs, ks, vs, dos, lses, dis),
        )

    @jax.jit
    def run_fused(qs, ks, vs, dos, lses, dis):
        return jax.lax.map(
            lambda t: ta._bwd_fused(t[0], t[1], t[2], ld2, *kvm, t[3], t[4],
                                    t[5], scale, bs, False),
            (qs, ks, vs, dos, lses, dis),
        )

    from dynamictreeattn_tpu.tries import build_bwd_cache_sched

    if len(batch.meta) > 6:
        acts, flush = batch.meta[6], batch.meta[7]
    else:
        sched = build_bwd_cache_sched(
            build_block_meta(batch.packed.last_desc, BQ, BKV), 16
        )
        acts, flush = jnp.asarray(sched.actions), jnp.asarray(sched.flush)

    @jax.jit
    def run_cached(qs, ks, vs, dos, lses, dis):
        return jax.lax.map(
            lambda t: ta._bwd_cached(t[0], t[1], t[2], ld2, *kvm, acts, flush,
                                     t[3], t[4], t[5], scale, bs, False),
            (qs, ks, vs, dos, lses, dis),
        )

    runs["dq"] = (run_dq, (qs, ks, vs, dos, lses, dis))
    runs["dkv"] = (run_dkv, (qs, ks, vs, dos, lses, dis))
    runs["fused"] = (run_fused, (qs, ks, vs, dos, lses, dis))
    runs["cached"] = (run_cached, (qs, ks, vs, dos, lses, dis))

    print(f"{'kernel':12s} {'ms/call':>9s} {'roofline':>9s} {'%':>6s}")
    for name, (fn, args) in runs.items():
        dt = timeit(fn, *args) / CALLS
        r = roof[name]
        print(f"{name:12s} {dt * 1e3:8.2f}  {r * 1e3:8.2f}  {dt and r / dt:6.1%}")


def section2():
    N = int(os.environ.get("DTA_RF_N", "8192"))
    key = jax.random.key(0)
    q = jax.random.normal(key, (HQ, N, DH), dtype=jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (HKV, N, DH), dtype=jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (HKV, N, DH), dtype=jnp.bfloat16)
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

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as ref_flash,
    )

    g = HQ // HKV
    qb = q[None]
    kb = jnp.repeat(k, g, axis=0)[None]
    vb = jnp.repeat(v, g, axis=0)[None]

    @jax.jit
    def official_fwd(qb, kb, vb):
        return ref_flash(qb, kb, vb, causal=True, sm_scale=DH ** -0.5)

    @jax.jit
    def official_grad(qb, kb, vb):
        f = lambda *a: jnp.sum(official_fwd(*a).astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(qb, kb, vb)

    o_mine = mine_fwd(q, k, v)
    o_ref = official_fwd(qb, kb, vb)[0]
    err = float(jnp.max(jnp.abs(o_mine.astype(jnp.float32) - o_ref.astype(jnp.float32))))
    print(f"N={N} causal fwd max abs diff vs official: {err:.4f}")

    t1 = timeit(mine_fwd, q, k, v, iters=10)
    t2 = timeit(official_fwd, qb, kb, vb, iters=10)
    t3 = timeit(mine_grad, q, k, v, iters=10)
    t4 = timeit(official_grad, qb, kb, vb, iters=10)
    print(f"tree kernel fwd     {t1 * 1e3:8.2f}ms   official {t2 * 1e3:8.2f}ms")
    print(f"tree kernel fwd+bwd {t3 * 1e3:8.2f}ms   official {t4 * 1e3:8.2f}ms")
    print(f"fwd ratio (mine/official): {t1 / t2:.2f}   fwd+bwd ratio: {t3 / t4:.2f}")


if SECTION in ("section1", "all"):
    section1()
if SECTION in ("section2", "all"):
    section2()
