"""Floor decomposition for the cached fused backward (r5 default bwd).

Counterpart of the forward's `tpu_fwd_variants.py` d_mxu diagnostic
(docs/PERF.md "The forward-kernel floor, decomposed"): self-contained
copies of ops/tree_attention._dqdkv_cached_kernel with pieces removed,
timed at the bench shape, to locate where the gap to the matched-FLOP
roofline (5 matmuls per active pair) actually lives.

Modes:
  full        — unmodified copy (sanity: should match the in-tree kernel)
  novpu       — WRONG RESULTS: p = st (no bias/exp/lse), ds = dp (no
                di/×p/×scale); keeps all 5 matmuls, both casts, and the
                full slot-cache DMA machinery
  novpu_nodma — WRONG RESULTS: novpu + no evict/reload/flush DMAs (slot
                cache written but never spilled) — matmuls + scratch only

Usage: python scripts/tpu_bwd_floor.py [modes...]
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import functools
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamictreeattn_tpu.ops.tree_attention import (
    MASK_VALUE,
    BlockSizes,
    cached_bwd_geometry,
)

PEAK_TFLOPS = 197.0
BQ = int(os.environ.get("DTA_RF_BQ", "512"))
BKV = int(os.environ.get("DTA_RF_BKV", "512"))
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


def _kernel(offs_ref, ids_ref, counts_ref, types_ref, sched_ref, flush_ref,
            q_ref, k_ref, v_ref, ld_ref, do_ref, lse_ref, di_ref,
            dq_ref, dk_hbm, dv_hbm, dq_scr, cache_scr, rsem, wsem,
            *, scale, block_q, block_kv, group, nq, slots, n_slots, mode):
    h = pl.program_id(0)
    i = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[i]
    typ = types_ref[i, s]
    hb = k_ref.shape[0]
    dma = mode != "novpu_nodma"
    vpu = mode == "full"

    @pl.when(s == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    @pl.when(typ > 0)
    def _compute():
        kv_id = ids_ref[i, s]
        slot = sched_ref[i, s, 0]
        fresh = sched_ref[i, s, 1]
        load = sched_ref[i, s, 2]
        evict_id = sched_ref[i, s, 3]

        if dma:
            @pl.when(evict_id >= 0)
            def _start_evict():
                off = jnp.maximum(evict_id, 0) * block_kv
                for hi in range(hb):
                    pltpu.make_async_copy(
                        cache_scr.at[slot, hi, 0],
                        dk_hbm.at[h * hb + hi, pl.ds(off, block_kv), :],
                        wsem.at[hi, 0],
                    ).start()
                    pltpu.make_async_copy(
                        cache_scr.at[slot, hi, 1],
                        dv_hbm.at[h * hb + hi, pl.ds(off, block_kv), :],
                        wsem.at[hi, 1],
                    ).start()

            def _start_reads():
                off = kv_id * block_kv
                for hi in range(hb):
                    pltpu.make_async_copy(
                        dk_hbm.at[h * hb + hi, pl.ds(off, block_kv), :],
                        cache_scr.at[slot, hi, 0],
                        rsem.at[hi, 0],
                    ).start()
                    pltpu.make_async_copy(
                        dv_hbm.at[h * hb + hi, pl.ds(off, block_kv), :],
                        cache_scr.at[slot, hi, 1],
                        rsem.at[hi, 1],
                    ).start()

            @pl.when((load == 1) & (evict_id < 0))
            def _start_load_early():
                _start_reads()

        if vpu:
            k_pos = offs_ref[1] + kv_id * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_kv, block_q), 0
            )
            q_pos = offs_ref[0] + i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_kv, block_q), 1
            )
            ld_col = jnp.expand_dims(ld_ref[0], -1)
            mask = (k_pos <= q_pos) & (q_pos <= ld_col)
            mask = mask | (typ == 2)
            bias = jnp.where(mask, 0.0, MASK_VALUE)

        accs = []
        for hi in range(hb):
            k = k_ref[hi]
            v = v_ref[hi]
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                q = q_ref[hi, gi]
                do = do_ref[hi, gi]
                st = jax.lax.dot_general(
                    k, q, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if vpu:
                    st = st * scale + bias
                    p = jnp.exp(st - lse_ref[hi, gi : gi + 1, :])
                else:
                    p = st
                dv_p = jax.lax.dot_general(
                    p.astype(do.dtype), do, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dp = jax.lax.dot_general(
                    v, do, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if vpu:
                    ds = (dp - di_ref[hi, gi : gi + 1, :]) * p * scale
                else:
                    ds = dp
                dk_p = jax.lax.dot_general(
                    ds.astype(q.dtype), q, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dq_scr[sl] += jax.lax.dot_general(
                    ds.astype(k.dtype), k, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if gi == 0:
                    dk_acc, dv_acc = dk_p, dv_p
                else:
                    dk_acc, dv_acc = dk_acc + dk_p, dv_acc + dv_p
            accs.append((dk_acc, dv_acc))

        if dma:
            @pl.when(evict_id >= 0)
            def _wait_evict():
                off = jnp.maximum(evict_id, 0) * block_kv
                for hi in range(hb):
                    pltpu.make_async_copy(
                        cache_scr.at[slot, hi, 0],
                        dk_hbm.at[h * hb + hi, pl.ds(off, block_kv), :],
                        wsem.at[hi, 0],
                    ).wait()
                    pltpu.make_async_copy(
                        cache_scr.at[slot, hi, 1],
                        dv_hbm.at[h * hb + hi, pl.ds(off, block_kv), :],
                        wsem.at[hi, 1],
                    ).wait()

            @pl.when((load == 1) & (evict_id >= 0))
            def _start_load_late():
                _start_reads()

            @pl.when(load == 1)
            def _wait_load():
                off = kv_id * block_kv
                for hi in range(hb):
                    pltpu.make_async_copy(
                        dk_hbm.at[h * hb + hi, pl.ds(off, block_kv), :],
                        cache_scr.at[slot, hi, 0],
                        rsem.at[hi, 0],
                    ).wait()
                    pltpu.make_async_copy(
                        dv_hbm.at[h * hb + hi, pl.ds(off, block_kv), :],
                        cache_scr.at[slot, hi, 1],
                        rsem.at[hi, 1],
                    ).wait()

        revisit = fresh == 0
        for hi in range(hb):
            dk_acc, dv_acc = accs[hi]
            cache_scr[slot, hi, 0] = (
                jnp.where(revisit, cache_scr[slot, hi, 0], 0.0) + dk_acc
            )
            cache_scr[slot, hi, 1] = (
                jnp.where(revisit, cache_scr[slot, hi, 1], 0.0) + dv_acc
            )

    @pl.when(s == count - 1)
    def _emit():
        for hi in range(hb):
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                dq_ref[hi, gi] = dq_scr[sl].astype(dq_ref.dtype)

    if mode != "novpu_nodma":
        @pl.when((i == nq - 1) & (s == slots - 1))
        def _flush():
            for r in range(n_slots):

                @pl.when(flush_ref[r, 1] == 1)
                def _(r=r):
                    blk = flush_ref[r, 0]
                    copies = []
                    for hi in range(hb):
                        copies.append(pltpu.make_async_copy(
                            cache_scr.at[r, hi, 0],
                            dk_hbm.at[h * hb + hi,
                                      pl.ds(blk * block_kv, block_kv), :],
                            wsem.at[hi, 0],
                        ))
                        copies.append(pltpu.make_async_copy(
                            cache_scr.at[r, hi, 1],
                            dv_hbm.at[h * hb + hi,
                                      pl.ds(blk * block_kv, block_kv), :],
                            wsem.at[hi, 1],
                        ))
                    for c in copies:
                        c.start()
                    for c in copies:
                        c.wait()


def bwd_cached_mode(q4, k, v, ld2, kv_ids, kv_counts, kv_types, actions,
                    flush, do, lse, di, scale, bs, mode):
    hkv, group, n, dh = q4.shape
    nkv = k.shape[1]
    bq, bkv = bs.block_q, bs.block_kv
    nq = n // bq
    slots = kv_ids.shape[1]
    n_slots = flush.shape[0]
    hb, _ = cached_bwd_geometry(hkv, group, bq, bkv, dh, nkv // bkv,
                                bs.head_block)
    offs = jnp.zeros((2,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(hkv // hb, nq, slots),
        in_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((1, bkv), lambda h, i, s, off, ids, *_: (0, ids[i, s])),
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((hb * group * bq, dh), jnp.float32),
            pltpu.VMEM((n_slots, hb, 2, bkv, dh), jnp.float32),
            pltpu.SemaphoreType.DMA((hb, 2)),
            pltpu.SemaphoreType.DMA((hb, 2)),
        ],
    )
    kernel = functools.partial(
        _kernel, scale=scale, block_q=bq, block_kv=bkv, group=group,
        nq=nq, slots=slots, n_slots=n_slots, mode=mode,
    )
    dq, dkf, dvf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q4.shape, q4.dtype),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 << 20,
        ),
        name=f"bwd_cached_{mode}",
    )(offs, kv_ids, kv_counts, kv_types, actions, flush,
      q4, k, v, ld2, do, lse, di)
    return dq, dkf, dvf


def main():
    from dynamictreeattn_tpu.data import synthetic_rollout_batch
    from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine
    from dynamictreeattn_tpu.models import MODEL_CONFIGS
    from dynamictreeattn_tpu.tries import TokenTrie

    mc = MODEL_CONFIGS["qwen3-0.6b"]
    ec = EngineConfig(block_q=BQ, block_kv=BKV, bucketing="exact")
    engine = TreeEngine(mc, ec)
    seqs, attachs = synthetic_rollout_batch(
        seed=0, n_prompts=2, samples_per_prompt=16,
        prompt_len=(1024, 2048), completion_len=(128, 512), branch_prob=0.85,
    )
    batch = engine.prepare(TokenTrie(seqs, attachs))
    n = batch.n_padded
    kv_ids, kv_counts, kv_types, _, _, _, actions, flush = batch.meta
    ld2 = jnp.asarray(batch.packed.last_desc).reshape(1, n).astype(jnp.int32)
    active = int(jnp.sum(jnp.asarray(kv_types) > 0))
    print(f"shape n={n} bq/bkv={BQ}/{BKV} active={active} "
          f"slots={kv_ids.shape} cache_slots={flush.shape[0]}")

    shape4 = (CALLS, HKV, GROUP, n, DH)
    qs = jax.random.normal(jax.random.key(0), shape4, jnp.bfloat16) * 0.3
    ks = jax.random.normal(jax.random.key(1), (CALLS, HKV, n, DH), jnp.bfloat16) * 0.3
    vs = jax.random.normal(jax.random.key(2), (CALLS, HKV, n, DH), jnp.bfloat16)
    dos = jax.random.normal(jax.random.key(3), shape4, jnp.bfloat16)
    lses = jax.random.normal(jax.random.key(4), (CALLS, HKV, GROUP, n), jnp.float32) + 4.0
    dis = jax.random.normal(jax.random.key(5), (CALLS, HKV, GROUP, n), jnp.float32)
    scale = DH ** -0.5
    bs = BlockSizes(BQ, BKV)
    kvm = (jnp.asarray(kv_ids), jnp.asarray(kv_counts), jnp.asarray(kv_types))
    act = jnp.asarray(actions)
    fl = jnp.asarray(flush)

    # 5 matmuls per active (pair, kv-head, q-head) tile
    roof = 5 * active * HKV * GROUP * 2 * BQ * BKV * DH / (PEAK_TFLOPS * 1e12)

    want = sys.argv[1:] or ["full", "novpu", "novpu_nodma"]
    ref = None
    print(f"{'mode':12s} {'ms/call':>8s} {'%roof':>6s}")
    for mode in want:
        def fn(q, k, v, do, lse, di, mode=mode):
            return bwd_cached_mode(q, k, v, ld2, *kvm, act, fl, do, lse, di,
                                   scale, bs, mode)

        @jax.jit
        def run(qs, ks, vs, dos, lses, dis, fn=fn):
            return jax.lax.map(lambda t: fn(*t), (qs, ks, vs, dos, lses, dis))

        t0 = time.time()
        out = run(qs, ks, vs, dos, lses, dis)
        dq0 = np.asarray(out[0][0], np.float32)
        tc = time.time() - t0
        if ref is None:
            ref = dq0
        err = float(np.max(np.abs(dq0 - ref)))
        dt = timeit(run, qs, ks, vs, dos, lses, dis) / CALLS
        print(f"{mode:12s} {dt * 1e3:8.3f} {roof / dt:6.1%}  dq_err={err:.2e} "
              f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
