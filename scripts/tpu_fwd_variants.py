"""Microbench: bound-forward kernel variants at the bench shape.

Each variant is a self-contained copy of ops/tree_attention._fwd_bound with
one structural change, timed as CALLS stacked calls inside one jit (same
harness as tpu_kernel_roofline.py) and checked against the baseline output.

Variants:
  base      — current _fwd_bound (k-major, bound shift)
  prescale  — q pre-multiplied by scale outside; no *scale VPU op in-kernel
  h2        — 2 kv heads per grid step: mask built once per 4 q-tiles,
              grid steps and padded slots halve
  h2p       — h2 + prescale
  fullskip  — typ==2 blocks take a maskless branch (no iota/compare/select)
  h{2,4,8}sw — software-pipelined: tile t+1's score matmul issued before
              tile t's exp/PV chain
  h{2,4,8}g — group-concatenated matmuls: one [bkv, group*bq] score matmul
  h4q       — q-major orientation (native PV contraction)
  d_mxu / d_noexp / d_nomask / d_mxuq — WRONG-RESULT diagnostics with VPU
              pieces removed; d_mxu (matmuls only) is the structural floor
  h4x/h8x   — exp2-fold: scale*log2(e) into q, c*log2(e), exp2 in-kernel
  h4xb      — exp2 on a bf16 tile (no f32->bf16 cast before PV)
  h4xf/h4xbf — exp2 + full-block maskless branch

Round-5 conclusion (docs/PERF.md "The forward-kernel floor, decomposed"):
every variant lands inside the ±4% run-to-run band; d_mxu shows the whole
VPU chain is ~3 points of roofline; block regeometries (DTA_RF_BQ/BKV at
1024) are absolutely slower. The kernel is at its shape-given floor.

Usage: python scripts/tpu_fwd_variants.py [names...]
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

import sys as _sys
import dynamictreeattn_tpu.ops.tree_attention  # noqa: F401
ta = _sys.modules["dynamictreeattn_tpu.ops.tree_attention"]
from dynamictreeattn_tpu.ops.tree_attention import MASK_VALUE, NUM_LANES, BlockSizes

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


# ------------------------------------------------------------------ variants


def _kernel_common(i, s, offs_ref, ids_ref, block_q, block_kv, typ, ld_ref):
    kv_id = ids_ref[i, s]
    k_pos = offs_ref[1] + kv_id * block_kv + jax.lax.broadcasted_iota(
        jnp.int32, (block_kv, block_q), 0
    )
    q_pos = offs_ref[0] + i * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_kv, block_q), 1
    )
    ld_col = jnp.expand_dims(ld_ref[0], -1)
    mask = (k_pos <= q_pos) & (q_pos <= ld_col)
    mask = mask | (typ == 2)
    return jnp.where(mask, 0.0, MASK_VALUE)


def _prescale_kernel(offs_ref, ids_ref, counts_ref, types_ref,
                     q_ref, k_ref, v_ref, ld_ref, c_ref,
                     o_ref, logl_ref, l_scr, acc_scr,
                     *, block_q, block_kv, group):
    """q arrives pre-multiplied by scale; st = k @ q'^T directly."""
    i = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[i]
    typ = types_ref[i, s]

    @pl.when(s == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(typ > 0)
    def _compute():
        bias = _kernel_common(i, s, offs_ref, ids_ref, block_q, block_kv, typ, ld_ref)
        k = k_ref[0]
        v = v_ref[0]
        for gi in range(group):
            sl = slice(gi * block_q, (gi + 1) * block_q)
            q = q_ref[0, gi]
            c_row = c_ref[0, gi : gi + 1, :]
            st = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) + bias
            p = jnp.exp(st - c_row)
            l_scr[0:1, sl] += jnp.sum(p, axis=0, keepdims=True)
            acc_scr[sl] += jax.lax.dot_general(
                p.astype(v.dtype), v, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(s == count - 1)
    def _emit():
        for gi in range(group):
            sl = slice(gi * block_q, (gi + 1) * block_q)
            l_col = jnp.transpose(l_scr[0:1, sl])
            inv = jnp.where(l_col == 0.0, 1.0, 1.0 / l_col)
            o_ref[0, gi] = (acc_scr[sl] * inv).astype(o_ref.dtype)
            logl_ref[0, gi : gi + 1] = jnp.log(jnp.maximum(l_scr[0:1, sl], 1e-30))


def fwd_prescale(q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale, bs):
    hkv, group, n, dh = q4.shape
    bq, bkv = bs.block_q, bs.block_kv
    nq = n // bq
    slots = kv_ids.shape[1]
    offs = jnp.zeros((2,), jnp.int32)
    c = ta._score_bound(q4, k, scale)
    qs = (q4.astype(jnp.float32) * scale).astype(q4.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(hkv, nq, slots),
        in_specs=[
            pl.BlockSpec((1, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((1, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((1, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((1, bkv), lambda h, i, s, off, ids, *_: (0, ids[i, s])),
            pl.BlockSpec((1, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((1, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, group * bq), jnp.float32),
            pltpu.VMEM((group * bq, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _prescale_kernel, block_q=bq, block_kv=bkv, group=group
    )
    o, logl = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q4.shape, q4.dtype),
            jax.ShapeDtypeStruct((hkv, group, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 << 20,
        ),
        name="fwd_prescale",
    )(offs, kv_ids, kv_counts, kv_types, qs, k, v, ld2, c)
    return o, c + logl


def _h2_kernel(offs_ref, ids_ref, counts_ref, types_ref,
               q_ref, k_ref, v_ref, ld_ref, c_ref,
               o_ref, logl_ref, l_scr, acc_scr,
               *, block_q, block_kv, group, hb, prescale, scale):
    """hb kv heads per grid step: shared mask, fewer grid steps."""
    i = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[i]
    typ = types_ref[i, s]

    @pl.when(s == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(typ > 0)
    def _compute():
        bias = _kernel_common(i, s, offs_ref, ids_ref, block_q, block_kv, typ, ld_ref)
        for hi in range(hb):
            k = k_ref[hi]
            v = v_ref[hi]
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                q = q_ref[hi, gi]
                c_row = c_ref[hi, gi : gi + 1, :]
                st = jax.lax.dot_general(
                    k, q, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if not prescale:
                    st = st * scale
                st = st + bias
                p = jnp.exp(st - c_row)
                l_scr[0:1, sl] += jnp.sum(p, axis=0, keepdims=True)
                acc_scr[sl] += jax.lax.dot_general(
                    p.astype(v.dtype), v, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    @pl.when(s == count - 1)
    def _emit():
        for hi in range(hb):
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                l_col = jnp.transpose(l_scr[0:1, sl])
                inv = jnp.where(l_col == 0.0, 1.0, 1.0 / l_col)
                o_ref[hi, gi] = (acc_scr[sl] * inv).astype(o_ref.dtype)
                logl_ref[hi, gi : gi + 1] = jnp.log(
                    jnp.maximum(l_scr[0:1, sl], 1e-30)
                )


def fwd_h2(q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale, bs,
           hb=2, prescale=False):
    hkv, group, n, dh = q4.shape
    bq, bkv = bs.block_q, bs.block_kv
    nq = n // bq
    slots = kv_ids.shape[1]
    offs = jnp.zeros((2,), jnp.int32)
    c = ta._score_bound(q4, k, scale)
    qin = (q4.astype(jnp.float32) * scale).astype(q4.dtype) if prescale else q4

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(hkv // hb, nq, slots),
        in_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((1, bkv), lambda h, i, s, off, ids, *_: (0, ids[i, s])),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, hb * group * bq), jnp.float32),
            pltpu.VMEM((hb * group * bq, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _h2_kernel, block_q=bq, block_kv=bkv, group=group, hb=hb,
        prescale=prescale, scale=scale,
    )
    o, logl = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q4.shape, q4.dtype),
            jax.ShapeDtypeStruct((hkv, group, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 << 20,
        ),
        name=f"fwd_h{hb}{'p' if prescale else ''}",
    )(offs, kv_ids, kv_counts, kv_types, qin, k, v, ld2, c)
    return o, c + logl


def _fullskip_kernel(offs_ref, ids_ref, counts_ref, types_ref,
                     q_ref, k_ref, v_ref, ld_ref, c_ref,
                     o_ref, logl_ref, l_scr, acc_scr,
                     *, block_q, block_kv, group, scale):
    i = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[i]
    typ = types_ref[i, s]

    @pl.when(s == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _body(bias):
        k = k_ref[0]
        v = v_ref[0]
        for gi in range(group):
            sl = slice(gi * block_q, (gi + 1) * block_q)
            q = q_ref[0, gi]
            c_row = c_ref[0, gi : gi + 1, :]
            st = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if bias is not None:
                st = st + bias
            p = jnp.exp(st - c_row)
            l_scr[0:1, sl] += jnp.sum(p, axis=0, keepdims=True)
            acc_scr[sl] += jax.lax.dot_general(
                p.astype(v.dtype), v, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(typ == 1)
    def _partial():
        kv_id = ids_ref[i, s]
        k_pos = offs_ref[1] + kv_id * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (block_kv, block_q), 0
        )
        q_pos = offs_ref[0] + i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_kv, block_q), 1
        )
        ld_col = jnp.expand_dims(ld_ref[0], -1)
        mask = (k_pos <= q_pos) & (q_pos <= ld_col)
        _body(jnp.where(mask, 0.0, MASK_VALUE))

    @pl.when(typ == 2)
    def _full():
        _body(None)

    @pl.when(s == count - 1)
    def _emit():
        for gi in range(group):
            sl = slice(gi * block_q, (gi + 1) * block_q)
            l_col = jnp.transpose(l_scr[0:1, sl])
            inv = jnp.where(l_col == 0.0, 1.0, 1.0 / l_col)
            o_ref[0, gi] = (acc_scr[sl] * inv).astype(o_ref.dtype)
            logl_ref[0, gi : gi + 1] = jnp.log(jnp.maximum(l_scr[0:1, sl], 1e-30))


def fwd_fullskip(q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale, bs):
    hkv, group, n, dh = q4.shape
    bq, bkv = bs.block_q, bs.block_kv
    nq = n // bq
    slots = kv_ids.shape[1]
    offs = jnp.zeros((2,), jnp.int32)
    c = ta._score_bound(q4, k, scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(hkv, nq, slots),
        in_specs=[
            pl.BlockSpec((1, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((1, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((1, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((1, bkv), lambda h, i, s, off, ids, *_: (0, ids[i, s])),
            pl.BlockSpec((1, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((1, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, group * bq), jnp.float32),
            pltpu.VMEM((group * bq, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fullskip_kernel, block_q=bq, block_kv=bkv, group=group, scale=scale
    )
    o, logl = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q4.shape, q4.dtype),
            jax.ShapeDtypeStruct((hkv, group, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 << 20,
        ),
        name="fwd_fullskip",
    )(offs, kv_ids, kv_counts, kv_types, q4, k, v, ld2, c)
    return o, c + logl




def _h2sw_kernel(offs_ref, ids_ref, counts_ref, types_ref,
                 q_ref, k_ref, v_ref, ld_ref, c_ref,
                 o_ref, logl_ref, l_scr, acc_scr,
                 *, block_q, block_kv, group, hb, scale):
    """h-blocked + software-pipelined: issue tile t+1's score matmul before
    tile t's exp/PV chain so MXU and VPU overlap (prescaled q)."""
    i = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[i]
    typ = types_ref[i, s]

    @pl.when(s == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(typ > 0)
    def _compute():
        bias = _kernel_common(i, s, offs_ref, ids_ref, block_q, block_kv, typ, ld_ref)
        tiles = [(hi, gi) for hi in range(hb) for gi in range(group)]

        def score(t):
            hi, gi = tiles[t]
            return jax.lax.dot_general(
                k_ref[hi], q_ref[hi, gi], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias

        def chain(t, st):
            hi, gi = tiles[t]
            tt = hi * group + gi
            sl = slice(tt * block_q, (tt + 1) * block_q)
            p = jnp.exp(st - c_ref[hi, gi : gi + 1, :])
            l_scr[0:1, sl] += jnp.sum(p, axis=0, keepdims=True)
            acc_scr[sl] += jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[tiles[t][0]],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        st_prev = score(0)
        for t in range(1, len(tiles)):
            st_cur = score(t)
            chain(t - 1, st_prev)
            st_prev = st_cur
        chain(len(tiles) - 1, st_prev)

    @pl.when(s == count - 1)
    def _emit():
        for hi in range(hb):
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                l_col = jnp.transpose(l_scr[0:1, sl])
                inv = jnp.where(l_col == 0.0, 1.0, 1.0 / l_col)
                o_ref[hi, gi] = (acc_scr[sl] * inv).astype(o_ref.dtype)
                logl_ref[hi, gi : gi + 1] = jnp.log(
                    jnp.maximum(l_scr[0:1, sl], 1e-30)
                )


def fwd_h2sw(q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale, bs, hb=2):
    hkv, group, n, dh = q4.shape
    bq, bkv = bs.block_q, bs.block_kv
    nq = n // bq
    slots = kv_ids.shape[1]
    offs = jnp.zeros((2,), jnp.int32)
    c = ta._score_bound(q4, k, scale)
    qin = (q4.astype(jnp.float32) * scale).astype(q4.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(hkv // hb, nq, slots),
        in_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((1, bkv), lambda h, i, s, off, ids, *_: (0, ids[i, s])),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, hb * group * bq), jnp.float32),
            pltpu.VMEM((hb * group * bq, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _h2sw_kernel, block_q=bq, block_kv=bkv, group=group, hb=hb, scale=scale
    )
    o, logl = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q4.shape, q4.dtype),
            jax.ShapeDtypeStruct((hkv, group, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 << 20,
        ),
        name=f"fwd_h{hb}sw",
    )(offs, kv_ids, kv_counts, kv_types, qin, k, v, ld2, c)
    return o, c + logl




def _h4diag_kernel(offs_ref, ids_ref, counts_ref, types_ref,
                   q_ref, k_ref, v_ref, ld_ref, c_ref,
                   o_ref, logl_ref, l_scr, acc_scr,
                   *, block_q, block_kv, group, hb, mode):
    """Diagnostic: h4 pipeline with pieces removed (WRONG RESULTS).

    mode: noexp (p = st-c), nomask (skip bias), mxu (no exp/mask/lsum)."""
    i = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[i]
    typ = types_ref[i, s]

    @pl.when(s == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(typ > 0)
    def _compute():
        if mode != "mxu" and mode != "nomask":
            bias = _kernel_common(i, s, offs_ref, ids_ref, block_q, block_kv,
                                  typ, ld_ref)
        else:
            bias = None
        for hi in range(hb):
            k = k_ref[hi]
            v = v_ref[hi]
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                q = q_ref[hi, gi]
                c_row = c_ref[hi, gi : gi + 1, :]
                st = jax.lax.dot_general(
                    k, q, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if bias is not None:
                    st = st + bias
                if mode == "mxu":
                    p = st
                elif mode == "noexp":
                    p = st - c_row
                else:
                    p = jnp.exp(st - c_row)
                if mode != "mxu":
                    l_scr[0:1, sl] += jnp.sum(p, axis=0, keepdims=True)
                acc_scr[sl] += jax.lax.dot_general(
                    p.astype(v.dtype), v, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    @pl.when(s == count - 1)
    def _emit():
        for hi in range(hb):
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                o_ref[hi, gi] = acc_scr[sl].astype(o_ref.dtype)
                logl_ref[hi, gi : gi + 1] = l_scr[0:1, sl]


def fwd_h4diag(q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale, bs, mode):
    hkv, group, n, dh = q4.shape
    bq, bkv = bs.block_q, bs.block_kv
    nq = n // bq
    slots = kv_ids.shape[1]
    hb = 4
    offs = jnp.zeros((2,), jnp.int32)
    c = ta._score_bound(q4, k, scale)
    qin = (q4.astype(jnp.float32) * scale).astype(q4.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(hkv // hb, nq, slots),
        in_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((1, bkv), lambda h, i, s, off, ids, *_: (0, ids[i, s])),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, hb * group * bq), jnp.float32),
            pltpu.VMEM((hb * group * bq, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _h4diag_kernel, block_q=bq, block_kv=bkv, group=group, hb=hb, mode=mode
    )
    o, logl = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q4.shape, q4.dtype),
            jax.ShapeDtypeStruct((hkv, group, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 << 20,
        ),
        name=f"fwd_h4diag_{mode}",
    )(offs, kv_ids, kv_counts, kv_types, qin, k, v, ld2, c)
    return o, logl




def _h4q_kernel(offs_ref, ids_ref, counts_ref, types_ref,
                q_ref, k_ref, v_ref, ld_ref, c_ref,
                o_ref, logl_ref, l_scr, acc_scr,
                *, block_q, block_kv, group, hb, mode):
    """q-major orientation: st=[bq,bkv]; PV is a native (1,0) contraction.

    mode "mxu": no mask/exp/lsum (WRONG RESULTS, floor diagnostic);
    mode "full": complete bound-shift forward, lane-reduce for l."""
    i = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[i]
    typ = types_ref[i, s]

    @pl.when(s == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(typ > 0)
    def _compute():
        if mode == "full":
            kv_id = ids_ref[i, s]
            q_pos = offs_ref[0] + i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0
            )
            k_pos = offs_ref[1] + kv_id * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1
            )
            ld_row = ld_ref[0][None, :]  # [1, bkv]
            mask = (k_pos <= q_pos) & (q_pos <= ld_row)
            mask = mask | (typ == 2)
            bias = jnp.where(mask, 0.0, MASK_VALUE)
        for hi in range(hb):
            k = k_ref[hi]
            v = v_ref[hi]
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                q = q_ref[hi, gi]
                st = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bq, bkv]
                if mode == "full":
                    c_col = jnp.transpose(c_ref[hi, gi : gi + 1, :])  # [bq,1]
                    p = jnp.exp(st + bias - c_col)
                    l_scr[sl] += jnp.sum(p, axis=1, keepdims=True)
                else:
                    p = st
                acc_scr[sl] += jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    @pl.when(s == count - 1)
    def _emit():
        for hi in range(hb):
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                if mode == "full":
                    l_col = l_scr[sl][:, :1]
                    inv = jnp.where(l_col == 0.0, 1.0, 1.0 / l_col)
                    o_ref[hi, gi] = (acc_scr[sl] * inv).astype(o_ref.dtype)
                    logl_ref[hi, gi : gi + 1] = jnp.transpose(
                        jnp.log(jnp.maximum(l_col, 1e-30))
                    )
                else:
                    o_ref[hi, gi] = acc_scr[sl].astype(o_ref.dtype)
                    logl_ref[hi, gi : gi + 1] = jnp.zeros_like(
                        logl_ref[hi, gi : gi + 1]
                    )


def fwd_h4q(q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale, bs, mode):
    hkv, group, n, dh = q4.shape
    bq, bkv = bs.block_q, bs.block_kv
    nq = n // bq
    slots = kv_ids.shape[1]
    hb = 4
    offs = jnp.zeros((2,), jnp.int32)
    c = ta._score_bound(q4, k, scale)
    qin = (q4.astype(jnp.float32) * scale).astype(q4.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(hkv // hb, nq, slots),
        in_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((1, bkv), lambda h, i, s, off, ids, *_: (0, ids[i, s])),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((hb * group * bq, NUM_LANES), jnp.float32),
            pltpu.VMEM((hb * group * bq, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _h4q_kernel, block_q=bq, block_kv=bkv, group=group, hb=hb, mode=mode
    )
    o, logl = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q4.shape, q4.dtype),
            jax.ShapeDtypeStruct((hkv, group, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 << 20,
        ),
        name=f"fwd_h4q_{mode}",
    )(offs, kv_ids, kv_counts, kv_types, qin, k, v, ld2, c)
    return o, c + logl




def _h4g_kernel(offs_ref, ids_ref, counts_ref, types_ref,
                q_ref, k_ref, v_ref, ld_ref, c_ref,
                o_ref, logl_ref, l_scr, acc_scr,
                *, block_q, block_kv, group, hb):
    """h-blocked + group-concatenated matmuls: per kv head the group's q
    tiles fuse into ONE [bkv, group*bq] score matmul and ONE
    [group*bq, dh] PV matmul (k-major), so the MXU sees 2x bigger ops."""
    i = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[i]
    typ = types_ref[i, s]
    gbq = group * block_q

    @pl.when(s == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(typ > 0)
    def _compute():
        bias = _kernel_common(i, s, offs_ref, ids_ref, block_q, block_kv,
                              typ, ld_ref)  # [bkv, bq]
        bias2 = pltpu.repeat(bias, group, 1)  # [bkv, group*bq]
        for hi in range(hb):
            k = k_ref[hi]
            v = v_ref[hi]
            sl = slice(hi * gbq, (hi + 1) * gbq)
            qcat = q_ref[hi].reshape(gbq, q_ref.shape[-1])
            c_row = c_ref[hi].reshape(1, gbq)
            st = jax.lax.dot_general(
                k, qcat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bkv, group*bq]
            p = jnp.exp(st + bias2 - c_row)
            l_scr[0:1, sl] += jnp.sum(p, axis=0, keepdims=True)
            acc_scr[sl] += jax.lax.dot_general(
                p.astype(v.dtype), v, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [group*bq, dh]

    @pl.when(s == count - 1)
    def _emit():
        for hi in range(hb):
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                l_col = jnp.transpose(l_scr[0:1, sl])
                inv = jnp.where(l_col == 0.0, 1.0, 1.0 / l_col)
                o_ref[hi, gi] = (acc_scr[sl] * inv).astype(o_ref.dtype)
                logl_ref[hi, gi : gi + 1] = jnp.log(
                    jnp.maximum(l_scr[0:1, sl], 1e-30)
                )


def fwd_h4g(q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale, bs, hb=4):
    hkv, group, n, dh = q4.shape
    bq, bkv = bs.block_q, bs.block_kv
    nq = n // bq
    slots = kv_ids.shape[1]
    offs = jnp.zeros((2,), jnp.int32)
    c = ta._score_bound(q4, k, scale)
    qin = (q4.astype(jnp.float32) * scale).astype(q4.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(hkv // hb, nq, slots),
        in_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((1, bkv), lambda h, i, s, off, ids, *_: (0, ids[i, s])),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, hb * group * bq), jnp.float32),
            pltpu.VMEM((hb * group * bq, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _h4g_kernel, block_q=bq, block_kv=bkv, group=group, hb=hb
    )
    o, logl = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q4.shape, q4.dtype),
            jax.ShapeDtypeStruct((hkv, group, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 << 20,
        ),
        name=f"fwd_h{hb}g",
    )(offs, kv_ids, kv_counts, kv_types, qin, k, v, ld2, c)
    return o, c + logl


_LOG2E = 1.4426950408889634


def _h4x_kernel(offs_ref, ids_ref, counts_ref, types_ref,
                q_ref, k_ref, v_ref, ld_ref, c_ref,
                o_ref, logl_ref, l_scr, acc_scr,
                *, block_q, block_kv, group, hb, bf16p, fullskip):
    """exp2 fold: q pre-multiplied by scale*log2(e), c by log2(e), so
    p = exp2(st - c) — the multiply hidden inside every exp(x)=exp2(x*log2e)
    is absorbed into the prescale. bf16p additionally runs the exp2 on a
    bf16 tile (cast before, not after — the PV matmul eats bf16 anyway and
    l accumulates in fp32). fullskip gives typ==2 blocks a bias-free branch."""
    i = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[i]
    typ = types_ref[i, s]

    @pl.when(s == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _body(bias):
        for hi in range(hb):
            k = k_ref[hi]
            v = v_ref[hi]
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                q = q_ref[hi, gi]
                c_row = c_ref[hi, gi : gi + 1, :]
                st = jax.lax.dot_general(
                    k, q, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if bias is not None:
                    st = st + bias
                x = st - c_row
                if bf16p:
                    p16 = jnp.exp2(x.astype(jnp.bfloat16))
                    l_scr[0:1, sl] += jnp.sum(
                        p16.astype(jnp.float32), axis=0, keepdims=True
                    )
                    pv = p16
                else:
                    p = jnp.exp2(x)
                    l_scr[0:1, sl] += jnp.sum(p, axis=0, keepdims=True)
                    pv = p.astype(v.dtype)
                acc_scr[sl] += jax.lax.dot_general(
                    pv, v, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    if fullskip:
        @pl.when(typ == 1)
        def _partial():
            _body(_kernel_common(i, s, offs_ref, ids_ref, block_q, block_kv,
                                 typ, ld_ref))

        @pl.when(typ == 2)
        def _full():
            _body(None)
    else:
        @pl.when(typ > 0)
        def _compute():
            _body(_kernel_common(i, s, offs_ref, ids_ref, block_q, block_kv,
                                 typ, ld_ref))

    @pl.when(s == count - 1)
    def _emit():
        for hi in range(hb):
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                l_col = jnp.transpose(l_scr[0:1, sl])
                inv = jnp.where(l_col == 0.0, 1.0, 1.0 / l_col)
                o_ref[hi, gi] = (acc_scr[sl] * inv).astype(o_ref.dtype)
                logl_ref[hi, gi : gi + 1] = jnp.log(
                    jnp.maximum(l_scr[0:1, sl], 1e-30)
                )


def fwd_h4x(q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale, bs,
            hb=4, bf16p=False, fullskip=False):
    hkv, group, n, dh = q4.shape
    bq, bkv = bs.block_q, bs.block_kv
    nq = n // bq
    slots = kv_ids.shape[1]
    offs = jnp.zeros((2,), jnp.int32)
    c = ta._score_bound(q4, k, scale)
    qin = (q4.astype(jnp.float32) * (scale * _LOG2E)).astype(q4.dtype)
    c2 = c * _LOG2E

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(hkv // hb, nq, slots),
        in_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((1, bkv), lambda h, i, s, off, ids, *_: (0, ids[i, s])),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, hb * group * bq), jnp.float32),
            pltpu.VMEM((hb * group * bq, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _h4x_kernel, block_q=bq, block_kv=bkv, group=group, hb=hb,
        bf16p=bf16p, fullskip=fullskip,
    )
    o, logl = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q4.shape, q4.dtype),
            jax.ShapeDtypeStruct((hkv, group, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 << 20,
        ),
        name=f"fwd_h{hb}x{'b' if bf16p else ''}{'f' if fullskip else ''}",
    )(offs, kv_ids, kv_counts, kv_types, qin, k, v, ld2, c2)
    return o, c + logl


# ------------------------------------------------------------------ harness


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
    kv_ids, kv_counts, kv_types, *_ = batch.meta
    ld2 = jnp.asarray(batch.packed.last_desc).reshape(1, n).astype(jnp.int32)
    active = int(jnp.sum(jnp.asarray(kv_types) > 0))
    print(f"shape n={n} bq/bkv={BQ}/{BKV} active={active} "
          f"slots={kv_ids.shape} full={int(jnp.sum(jnp.asarray(kv_types) == 2))}")

    key = jax.random.key(0)
    shape4 = (CALLS, HKV, GROUP, n, DH)
    qs = jax.random.normal(key, shape4, dtype=jnp.bfloat16) * 0.3
    ks = jax.random.normal(jax.random.key(1), (CALLS, HKV, n, DH), dtype=jnp.bfloat16) * 0.3
    vs = jax.random.normal(jax.random.key(2), (CALLS, HKV, n, DH), dtype=jnp.bfloat16)
    scale = DH ** -0.5
    bs = BlockSizes(BQ, BKV)
    kvm = (jnp.asarray(kv_ids), jnp.asarray(kv_counts), jnp.asarray(kv_types))

    roof = 2 * active * HKV * GROUP * 2 * BQ * BKV * DH / (PEAK_TFLOPS * 1e12)

    variants = {
        "base": lambda q, k, v: ta._fwd_bound(q, k, v, ld2, *kvm, scale, bs, False),
        "prescale": lambda q, k, v: fwd_prescale(q, k, v, ld2, *kvm, scale, bs),
        "h2": lambda q, k, v: fwd_h2(q, k, v, ld2, *kvm, scale, bs, hb=2),
        "h2p": lambda q, k, v: fwd_h2(q, k, v, ld2, *kvm, scale, bs, hb=2, prescale=True),
        "h4p": lambda q, k, v: fwd_h2(q, k, v, ld2, *kvm, scale, bs, hb=4, prescale=True),
        "fullskip": lambda q, k, v: fwd_fullskip(q, k, v, ld2, *kvm, scale, bs),
        "h2sw": lambda q, k, v: fwd_h2sw(q, k, v, ld2, *kvm, scale, bs, hb=2),
        "h4sw": lambda q, k, v: fwd_h2sw(q, k, v, ld2, *kvm, scale, bs, hb=4),
        "h8sw": lambda q, k, v: fwd_h2sw(q, k, v, ld2, *kvm, scale, bs, hb=8),
        "d_noexp": lambda q, k, v: fwd_h4diag(q, k, v, ld2, *kvm, scale, bs, "noexp"),
        "d_nomask": lambda q, k, v: fwd_h4diag(q, k, v, ld2, *kvm, scale, bs, "nomask"),
        "d_mxu": lambda q, k, v: fwd_h4diag(q, k, v, ld2, *kvm, scale, bs, "mxu"),
        "d_mxuq": lambda q, k, v: fwd_h4q(q, k, v, ld2, *kvm, scale, bs, "mxu"),
        "h4q": lambda q, k, v: fwd_h4q(q, k, v, ld2, *kvm, scale, bs, "full"),
        "h4g": lambda q, k, v: fwd_h4g(q, k, v, ld2, *kvm, scale, bs, hb=4),
        "h4x": lambda q, k, v: fwd_h4x(q, k, v, ld2, *kvm, scale, bs, hb=4),
        "h4xb": lambda q, k, v: fwd_h4x(q, k, v, ld2, *kvm, scale, bs, hb=4, bf16p=True),
        "h4xf": lambda q, k, v: fwd_h4x(q, k, v, ld2, *kvm, scale, bs, hb=4, fullskip=True),
        "h4xbf": lambda q, k, v: fwd_h4x(q, k, v, ld2, *kvm, scale, bs, hb=4, bf16p=True, fullskip=True),
        "h8x": lambda q, k, v: fwd_h4x(q, k, v, ld2, *kvm, scale, bs, hb=8),
        "h2g": lambda q, k, v: fwd_h4g(q, k, v, ld2, *kvm, scale, bs, hb=2),
        "h8g": lambda q, k, v: fwd_h4g(q, k, v, ld2, *kvm, scale, bs, hb=8),
    }
    want = sys.argv[1:] or list(variants)

    ref_o = ref_lse = None
    print(f"{'variant':10s} {'ms/call':>8s} {'%roof':>6s}  err")
    for name in want:
        fn = variants[name]

        @jax.jit
        def run(qs, ks, vs, fn=fn):
            return jax.lax.map(lambda t: fn(*t), (qs, ks, vs))

        t0 = time.time()
        o, lse = run(qs, ks, vs)
        o0, lse0 = np.asarray(o[0], np.float32), np.asarray(lse[0])
        tc = time.time() - t0
        if name == "base" or ref_o is None:
            ref_o, ref_lse = o0, lse0
        err = float(np.max(np.abs(o0 - ref_o)))
        lerr = float(np.max(np.abs(lse0 - ref_lse)))
        dt = timeit(run, qs, ks, vs) / CALLS
        print(f"{name:10s} {dt * 1e3:8.3f} {roof / dt:6.1%}  o={err:.2e} "
              f"lse={lerr:.2e} (compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
