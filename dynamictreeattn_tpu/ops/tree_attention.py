"""Pallas TPU tree-masked flash attention: forward + custom_vjp backward.

This kernel is the TPU-native replacement for everything the reference built
around FlashAttention-3's causal-only masks: the stack-based KV replay engine,
autograd surgery, and per-leaf kernel launches
(reference: tree_training_engine.py:146-513). Queries/keys live in a packed
DFS trie layout (tries/flatten.py) where token q attends to token k iff
``k <= q <= last_desc[k]`` — so the mask needs one int32 per kv position.

Block sparsity: the kernel only visits (q-block, kv-block) pairs that contain
at least one ancestor relation, via splash-attention-style scalar-prefetch
metadata (tries/flatten.py:build_block_meta):

* forward + dq iterate query-major: grid (kv_heads, n_q_blocks, max_slots)
  with ``kv_ids[i, s]`` naming the s-th active kv block of query block i;
* dkv iterates key-major over the transposed map ``q_ids[j, s]``.

Padding slots repeat the previous block id, so Pallas's pipeline never
re-fetches; their compute is skipped via the prefetched slot count. Blocks
tagged FULL (every pair unmasked) skip mask evaluation entirely.

GQA: q heads are grouped per kv head (layout [n_kv_heads, group, n, head_dim])
and the group loop is unrolled inside the kernel, so each K/V block is fetched
once per kv head, not once per q head.

Numerics follow flash-attention convention: fp32 scores/softmax statistics and
fp32 accumulators; the P·V and gradient matmuls run in the input dtype on the
MXU. Gradients match the dense-replay baseline at bf16 tolerance (the
reference's own parity bar, reference: grad/Qwen3-0.6B-TB-vs-DB-bf16.txt).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["BlockSizes", "tree_attention", "tree_attention_with_meta"]

NUM_LANES = 128
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _interpret_mode(interpret: bool):
    # The generic pallas interpreter (interpret=True) deadlocks
    # nondeterministically on scalar-prefetch grids; the TPU-semantics
    # interpreter is reliable (and emulates MXU precision).
    return pltpu.InterpretParams() if interpret else False


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    block_q: int = 512
    block_kv: int = 512
    # kv heads processed per grid step. The tree mask depends only on
    # positions, never on the head, so blocking heads shares one mask build
    # across head_block*group q-tiles, and halves/quarters the grid (fewer
    # padded-slot steps, fewer scratch init/emit steps). Measured on v5e at
    # the bench shape (scripts/tpu_fwd_variants.py): bound fwd -17% at 4.
    # Per-kernel launchers clamp to a divisor of n_kv_heads and to a
    # VMEM-driven per-kernel cap.
    head_block: int = 4


def _eff_head_block(hkv: int, want: int, cap: int) -> int:
    hb = max(1, min(want, cap, hkv))
    while hkv % hb:
        hb -= 1
    return hb


# --------------------------------------------------------------------------- fwd


def _fwd_kernel(
    # scalar prefetch
    offs_ref,
    ids_ref,
    counts_ref,
    types_ref,
    # inputs
    q_ref,
    k_ref,
    v_ref,
    ld_ref,
    # outputs
    o_ref,
    lse_ref,
    # scratch
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    block_q: int,
    block_kv: int,
    group: int,
):
    i = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[i]
    typ = types_ref[i, s]
    hb = q_ref.shape[0]

    @pl.when(s == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(typ > 0)
    def _compute():
        kv_id = ids_ref[i, s]
        # interval mask, shared across head_block kv heads AND the q-head
        # group (position-only); offs holds the global position offsets of
        # this (q, kv) shard pair (0 outside ring-attention mode)
        row_pos = offs_ref[0] + i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 0
        )
        col_pos = offs_ref[1] + kv_id * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 1
        )
        ld = ld_ref[0]  # [bkv] int32
        mask = (col_pos <= row_pos) & (row_pos <= ld[None, :])
        mask = mask | (typ == 2)
        bias = jnp.where(mask, 0.0, MASK_VALUE)

        for hi in range(hb):
            k = k_ref[hi]  # [bkv, dh]
            v = v_ref[hi]
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                q = q_ref[hi, gi]  # [bq, dh]
                st = (
                    jax.lax.dot_general(
                        q,
                        k,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                    + bias
                )
                m_prev = m_scr[sl]  # [bq, NUM_LANES]
                l_prev = l_scr[sl]
                m_cur = jnp.max(st, axis=1, keepdims=True)  # [bq, 1]
                m_next = jnp.maximum(
                    m_prev, jnp.broadcast_to(m_cur, m_prev.shape)
                )
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(st - m_next[:, :1])
                l_cur = jnp.sum(p, axis=1, keepdims=True)
                l_next = alpha * l_prev + jnp.broadcast_to(l_cur, l_prev.shape)
                m_scr[sl] = m_next
                l_scr[sl] = l_next
                acc_scr[sl] = acc_scr[sl] * alpha[:, :1] + jax.lax.dot(
                    p.astype(v.dtype), v, preferred_element_type=jnp.float32
                )

    @pl.when(s == count - 1)
    def _emit():
        for hi in range(hb):
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                l = l_scr[sl][:, :1]
                inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
                o_ref[hi, gi] = (acc_scr[sl] * inv).astype(o_ref.dtype)
                # stats are sublane-major [bq, 1]; one transpose per emit
                # buys a compact lane-major [1, bq] store (the fat [bq, 128]
                # broadcast wrote 128x the bytes and needed an XLA slice
                # pass after)
                lse_col = m_scr[sl][:, :1] + jnp.log(jnp.maximum(l, 1e-30))
                lse_ref[hi, gi : gi + 1] = jnp.transpose(lse_col)


def _fwd(q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale, bs, interpret,
         offs=None):
    """offs = [q_pos_offset, kv_pos_offset] int32 — global positions of the
    first q row / first kv row (ring attention shard pairs); ld2 is the FULL
    [1, n_global] last_desc and its blocks are indexed at the kv offset."""
    hkv, group, n, dh = q4.shape
    bq, bkv = bs.block_q, bs.block_kv
    nq = n // bq
    slots = kv_ids.shape[1]
    # online keeps 3 per-tile scratches (m, l, acc); 16384-row cap keeps
    # them ~24MB of VMEM (the chip has ~128MB; 16MB is only XLA's default
    # scoped limit, raised via vmem_limit_bytes below)
    hb = _eff_head_block(hkv, bs.head_block, max(1, 16384 // (group * bq)))
    grid = (hkv // hb, nq, slots)
    if offs is None:
        offs = jnp.zeros((2,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, off, ids, cnt, typ: (h, 0, i, 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, cnt, typ: (h, ids[i, s], 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, cnt, typ: (h, ids[i, s], 0)),
            pl.BlockSpec(
                (1, bkv),
                lambda h, i, s, off, ids, cnt, typ: (0, off[1] // bkv + ids[i, s]),
            ),
        ],
        out_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, off, ids, cnt, typ: (h, 0, i, 0)),
            pl.BlockSpec(
                (hb, group, bq),
                lambda h, i, s, off, ids, cnt, typ: (h, 0, i),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((hb * group * bq, NUM_LANES), jnp.float32),
            pltpu.VMEM((hb * group * bq, NUM_LANES), jnp.float32),
            pltpu.VMEM((hb * group * bq, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_q=bq, block_kv=bkv, group=group
    )
    o, lse = pl.pallas_call(
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
        interpret=_interpret_mode(interpret),
        name="tree_attention_fwd",
    )(offs.astype(jnp.int32), kv_ids, kv_counts, kv_types, q4, k, v, ld2)
    return o, lse  # [hkv, group, n]


# --------------------------------------------------------------------- fwd/bound


def _fwd_bound_kernel(
    # scalar prefetch
    offs_ref,
    ids_ref,
    counts_ref,
    types_ref,
    # inputs
    q_ref,
    k_ref,
    v_ref,
    ld_ref,
    c_ref,
    # outputs
    o_ref,
    logl_ref,
    # scratch
    l_scr,
    acc_scr,
    *,
    scale: float,
    block_q: int,
    block_kv: int,
    group: int,
):
    """Bound-shift forward: no online softmax.

    ``c_ref`` holds a per-row upper bound C >= max_k score(q_row, k) (computed
    outside the kernel from ||q_row||*max||k||, Cauchy-Schwarz), so
    ``p = exp(st - C) <= 1`` needs no running max, no alpha rescale, and no
    accumulator rescale — the three VPU chains that make the online forward
    the slowest of the three kernels (docs/PERF.md). Scores are built k-major
    ([bkv, bq]) so the remaining sum-reduction runs over sublanes, which is
    cheap, and the per-row constants broadcast over sublanes naturally.
    Emits unnormalized log(sum exp(st - C)); the caller adds C back to form
    the lse the backward kernels consume.
    """
    i = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[i]
    typ = types_ref[i, s]
    hb = q_ref.shape[0]

    @pl.when(s == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(typ > 0)
    def _compute():
        kv_id = ids_ref[i, s]
        # k-major orientation: rows = kv positions, lanes = q positions.
        # One mask build shared across head_block kv heads x group q heads.
        k_pos = offs_ref[1] + kv_id * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (block_kv, block_q), 0
        )
        q_pos = offs_ref[0] + i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_kv, block_q), 1
        )
        ld_col = jnp.expand_dims(ld_ref[0], -1)  # [bkv, 1]
        mask = (k_pos <= q_pos) & (q_pos <= ld_col)
        mask = mask | (typ == 2)
        bias = jnp.where(mask, 0.0, MASK_VALUE)

        for hi in range(hb):
            k = k_ref[hi]  # [bkv, dh]
            v = v_ref[hi]
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                q = q_ref[hi, gi]  # [bq, dh]
                c_row = c_ref[hi, gi : gi + 1, :]  # [1, bq]
                st = (
                    jax.lax.dot_general(
                        k,
                        q,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                    + bias
                )  # [bkv, bq]
                p = jnp.exp(st - c_row)
                l_scr[0:1, sl] += jnp.sum(p, axis=0, keepdims=True)
                acc_scr[sl] += jax.lax.dot_general(
                    p.astype(v.dtype),
                    v,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bq, dh]

    @pl.when(s == count - 1)
    def _emit():
        for hi in range(hb):
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                l_col = jnp.transpose(l_scr[0:1, sl])  # [bq, 1]
                inv = jnp.where(l_col == 0.0, 1.0, 1.0 / l_col)
                o_ref[hi, gi] = (acc_scr[sl] * inv).astype(o_ref.dtype)
                # lane-major [1, bq] store — the lse output is compact [.., n]
                # (the online kernel's [.., n, 128] broadcast wrote 128x the
                # bytes and needed an XLA slice pass afterwards)
                logl_ref[hi, gi : gi + 1] = jnp.log(
                    jnp.maximum(l_scr[0:1, sl], 1e-30)
                )


def _score_bound(q4, k, scale):
    """Per-row score upper bound C[h,g,row] = scale*||q_row||*max_r||k_r||.

    Sound for any weights (Cauchy-Schwarz); tight enough to keep
    exp(st - C) well inside fp32 range for qk-normed models, where
    |st| <= sqrt(dh)*|g_q|*|g_k| — see tree_attention docstring."""
    qn = jnp.sqrt(
        jnp.sum(jnp.square(q4.astype(jnp.float32)), axis=-1)
    )  # [hkv, group, n]
    kn = jnp.sqrt(jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1))  # [hkv, n]
    kmax = jnp.max(kn, axis=-1)  # [hkv]
    return scale * qn * kmax[:, None, None]


def _fwd_bound(q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale, bs, interpret,
               offs=None, c=None):
    hkv, group, n, dh = q4.shape
    bq, bkv = bs.block_q, bs.block_kv
    nq = n // bq
    slots = kv_ids.shape[1]
    # acc scratch rows = hb*group*bq; 16384-row cap = ~8MB fp32 at dh=128
    hb = _eff_head_block(hkv, bs.head_block, max(1, 16384 // (group * bq)))
    grid = (hkv // hb, nq, slots)
    if offs is None:
        offs = jnp.zeros((2,), jnp.int32)
    if c is None:
        c = _score_bound(q4, k, scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, off, ids, cnt, typ: (h, 0, i, 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, cnt, typ: (h, ids[i, s], 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, cnt, typ: (h, ids[i, s], 0)),
            pl.BlockSpec(
                (1, bkv),
                lambda h, i, s, off, ids, cnt, typ: (0, off[1] // bkv + ids[i, s]),
            ),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, off, ids, cnt, typ: (h, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, off, ids, cnt, typ: (h, 0, i, 0)),
            pl.BlockSpec(
                (hb, group, bq),
                lambda h, i, s, off, ids, cnt, typ: (h, 0, i),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, hb * group * bq), jnp.float32),
            pltpu.VMEM((hb * group * bq, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fwd_bound_kernel, scale=scale, block_q=bq, block_kv=bkv, group=group
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
        interpret=_interpret_mode(interpret),
        name="tree_attention_fwd_bound",
    )(offs.astype(jnp.int32), kv_ids, kv_counts, kv_types, q4, k, v, ld2, c)
    return o, c + logl  # lse: [hkv, group, n]


# ---------------------------------------------------------------------------- dq


def _dq_kernel(
    offs_ref,
    ids_ref,
    counts_ref,
    types_ref,
    q_ref,
    k_ref,
    v_ref,
    ld_ref,
    do_ref,
    lse_ref,
    di_ref,
    dq_ref,
    dq_scr,
    *,
    scale: float,
    block_q: int,
    block_kv: int,
    group: int,
):
    i = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[i]
    typ = types_ref[i, s]
    hb = q_ref.shape[0]

    @pl.when(s == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    @pl.when(typ > 0)
    def _compute():
        kv_id = ids_ref[i, s]
        # k-major orientation: rows = kv positions, lanes = q positions.
        k_pos = offs_ref[1] + kv_id * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (block_kv, block_q), 0
        )
        q_pos = offs_ref[0] + i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_kv, block_q), 1
        )
        ld_col = jnp.expand_dims(ld_ref[0], -1)  # [bkv, 1]
        mask = (k_pos <= q_pos) & (q_pos <= ld_col)
        mask = mask | (typ == 2)
        bias = jnp.where(mask, 0.0, MASK_VALUE)

        for hi in range(hb):
            k = k_ref[hi]
            v = v_ref[hi]
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                q = q_ref[hi, gi]  # [bq, dh]
                do = do_ref[hi, gi]
                lse_row = lse_ref[hi, gi : gi + 1, :]  # [1, bq]
                di_row = di_ref[hi, gi : gi + 1, :]
                st = (
                    jax.lax.dot_general(
                        k,
                        q,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                    + bias
                )  # [bkv, bq]
                p = jnp.exp(st - lse_row)
                dp = jax.lax.dot_general(
                    v, do, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bkv, bq]
                ds = (dp - di_row) * p * scale
                dq_scr[sl] += jax.lax.dot_general(
                    ds.astype(k.dtype),
                    k,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bq, dh]

    @pl.when(s == count - 1)
    def _emit():
        for hi in range(hb):
            for gi in range(group):
                t = hi * group + gi
                sl = slice(t * block_q, (t + 1) * block_q)
                dq_ref[hi, gi] = dq_scr[sl].astype(dq_ref.dtype)


def _bwd_dq(q4, k, v, ld2, kv_ids, kv_counts, kv_types, do, lse, di, scale, bs,
            interpret, offs=None):
    hkv, group, n, dh = q4.shape
    bq, bkv = bs.block_q, bs.block_kv
    nq = n // bq
    slots = kv_ids.shape[1]
    hb = _eff_head_block(hkv, bs.head_block, max(1, 16384 // (group * bq)))
    if offs is None:
        offs = jnp.zeros((2,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(hkv // hb, nq, slots),
        in_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec(
                (1, bkv),
                lambda h, i, s, off, ids, *_: (0, off[1] // bkv + ids[i, s]),
            ),
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
            pl.BlockSpec((hb, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((hb * group * bq, dh), jnp.float32)],
    )
    kernel = functools.partial(
        _dq_kernel, scale=scale, block_q=bq, block_kv=bkv, group=group
    )
    (dq,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(q4.shape, q4.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 << 20,
        ),
        interpret=_interpret_mode(interpret),
        name="tree_attention_bwd_dq",
    )(offs.astype(jnp.int32), kv_ids, kv_counts, kv_types, q4, k, v, ld2, do, lse, di)
    return dq


# --------------------------------------------------------------------------- dkv


def _dkv_kernel(
    offs_ref,
    ids_ref,
    counts_ref,
    types_ref,
    q_ref,
    k_ref,
    v_ref,
    ld_ref,
    do_ref,
    lse_ref,
    di_ref,
    dk_ref,
    dv_ref,
    dk_scr,
    dv_scr,
    *,
    scale: float,
    block_q: int,
    block_kv: int,
    group: int,
):
    j = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[j]
    typ = types_ref[j, s]
    hb = k_ref.shape[0]

    @pl.when(s == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    @pl.when(typ > 0)
    def _compute():
        q_id = ids_ref[j, s]
        k_pos = offs_ref[1] + j * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (block_kv, block_q), 0
        )
        q_pos = offs_ref[0] + q_id * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_kv, block_q), 1
        )
        ld_col = jnp.expand_dims(ld_ref[0], -1)
        mask = (k_pos <= q_pos) & (q_pos <= ld_col)
        mask = mask | (typ == 2)
        bias = jnp.where(mask, 0.0, MASK_VALUE)

        for hi in range(hb):
            k = k_ref[hi]
            v = v_ref[hi]
            for gi in range(group):
                q = q_ref[hi, gi]
                do = do_ref[hi, gi]
                lse_row = lse_ref[hi, gi : gi + 1, :]  # [1, bq]
                di_row = di_ref[hi, gi : gi + 1, :]
                st = (
                    jax.lax.dot_general(
                        k,
                        q,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                    + bias
                )  # [bkv, bq]
                p = jnp.exp(st - lse_row)
                dv_scr[hi] += jax.lax.dot_general(
                    p.astype(do.dtype),
                    do,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bkv, dh]
                dp = jax.lax.dot_general(
                    v, do, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ds = (dp - di_row) * p * scale
                dk_scr[hi] += jax.lax.dot_general(
                    ds.astype(q.dtype),
                    q,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bkv, dh]

    @pl.when(s == count - 1)
    def _emit():
        dk_ref[...] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dkv(q4, k, v, ld2, q_ids, q_counts, q_types, do, lse, di, scale, bs,
             interpret, offs=None):
    hkv, group, n, dh = q4.shape
    nkv = k.shape[1]
    bq, bkv = bs.block_q, bs.block_kv
    nk = nkv // bkv
    slots = q_ids.shape[1]
    hb = _eff_head_block(hkv, bs.head_block, max(1, 16384 // (group * bq)))
    if offs is None:
        offs = jnp.zeros((2,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(hkv // hb, nk, slots),
        in_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, j, s, off, ids, *_: (h, 0, ids[j, s], 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, j, s, *_: (h, j, 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, j, s, *_: (h, j, 0)),
            pl.BlockSpec(
                (1, bkv), lambda h, j, s, off, *_: (0, off[1] // bkv + j)
            ),
            pl.BlockSpec((hb, group, bq, dh), lambda h, j, s, off, ids, *_: (h, 0, ids[j, s], 0)),
            pl.BlockSpec((hb, group, bq), lambda h, j, s, off, ids, *_: (h, 0, ids[j, s])),
            pl.BlockSpec((hb, group, bq), lambda h, j, s, off, ids, *_: (h, 0, ids[j, s])),
        ],
        out_specs=[
            pl.BlockSpec((hb, bkv, dh), lambda h, j, s, *_: (h, j, 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, j, s, *_: (h, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((hb, bkv, dh), jnp.float32),
            pltpu.VMEM((hb, bkv, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _dkv_kernel, scale=scale, block_q=bq, block_kv=bkv, group=group
    )
    dk, dv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 << 20,
        ),
        interpret=_interpret_mode(interpret),
        name="tree_attention_bwd_dkv",
    )(offs.astype(jnp.int32), q_ids, q_counts, q_types, q4, k, v, ld2, do, lse, di)
    return dk, dv


# --------------------------------------------------------------------- fused bwd


def _dqdkv_kernel(
    offs_ref,
    ids_ref,
    counts_ref,
    types_ref,
    aux_ref,
    q_ref,
    k_ref,
    v_ref,
    ld_ref,
    do_ref,
    lse_ref,
    di_ref,
    dq_ref,
    dk_hbm,
    dv_hbm,
    dq_scr,
    dkv_scr,
    pend_scr,
    rsem,
    wsem,
    *,
    scale: float,
    block_q: int,
    block_kv: int,
    group: int,
    nq: int,
    slots: int,
):
    """Fused dq+dk+dv: one query-major pass computes st/p/dp/ds ONCE per
    active (q, kv) block pair and emits all three gradients.

    The split kernels each rebuild the same scores, probabilities and dp —
    per pair that is 7 MXU matmuls + 2 exp chains; fused it is 5 matmuls +
    1 exp (the kernels are VPU-bound on exp, docs/PERF.md). dq accumulates
    in VMEM scratch exactly like the split dq kernel (resident per q block).
    dk/dv[kv_id] are visited at several non-consecutive grid steps (one per
    descendant q block), which Pallas's output pipeline cannot accumulate —
    so they live in fp32 HBM (memory_space ANY) and the kernel does an
    explicit read-modify-write per visit with manual DMAs, double-buffered
    so the RMW never stalls the MXU except on true back-to-back conflicts:

    * ``aux_ref[i, s] = (first, conflict, parity)``: `first` marks the first
      visit of kv block ``ids[i, s]`` in (i asc, s asc) traversal order (the
      first visit overwrites — no read, no zero-init pass); `conflict` marks
      a visit whose kv block equals the PREVIOUS compute step's (its write
      must drain before this read — RAW); `parity` alternates 0/1 across
      compute steps and picks the scratch buffer + write semaphore.
    * ``pend_scr[p]`` (SMEM) tracks whether a write from buffer p is in
      flight. Each compute step drains pend[parity] (buffer reuse — that
      write is 2 compute steps old, so it is long done) and, only on
      `conflict`, pend[1-parity] (the immediately preceding write). Reads
      are issued before the pair's 5 matmuls and waited after, hiding their
      latency. Writes from distinct buffers target distinct kv blocks
      except across h-subgrids (different h ⇒ disjoint regions, no hazard).
    * all pending writes are drained at the last grid step of each
      h-subgrid, and pend resets at each subgrid start — megacore splits
      only the parallel h axis, so this bookkeeping is per-core-correct.
    """
    h = pl.program_id(0)
    i = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[i]
    typ = types_ref[i, s]
    # this kernel runs one kv head per grid step (hb forced to 1 in
    # _bwd_fused): an [hb, bkv, dh] RMW unit with a leading pl.ds head slice
    # measured ~20% slower than the plain 2-D [bkv, dh] descriptors below

    @pl.when((i == 0) & (s == 0))
    def _init_pending():
        # SMEM scratch is uninitialized at kernel start; at later subgrid
        # starts everything was drained at the previous subgrid's end.
        pend_scr[0] = 0
        pend_scr[1] = 0

    @pl.when(s == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    @pl.when(typ > 0)
    def _compute():
        kv_id = ids_ref[i, s]
        first = aux_ref[i, s, 0]
        conflict = aux_ref[i, s, 1]
        par = aux_ref[i, s, 2]
        dst_k = dk_hbm.at[h, pl.ds(kv_id * block_kv, block_kv), :]
        dst_v = dv_hbm.at[h, pl.ds(kv_id * block_kv, block_kv), :]

        def _drain(p):
            pltpu.make_async_copy(dkv_scr.at[p, 0], dst_k, wsem.at[p, 0]).wait()
            pltpu.make_async_copy(dkv_scr.at[p, 1], dst_v, wsem.at[p, 1]).wait()
            pend_scr[p] = 0

        @pl.when(pend_scr[par] == 1)
        def _drain_reuse():
            _drain(par)

        @pl.when((conflict == 1) & (pend_scr[1 - par] == 1))
        def _drain_conflict():
            _drain(1 - par)

        rd_k = pltpu.make_async_copy(dst_k, dkv_scr.at[par, 0], rsem.at[0])
        rd_v = pltpu.make_async_copy(dst_v, dkv_scr.at[par, 1], rsem.at[1])

        @pl.when(first == 0)
        def _start_reads():
            rd_k.start()
            rd_v.start()

        # k-major orientation: rows = kv positions, lanes = q positions.
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

        k = k_ref[0]
        v = v_ref[0]
        for gi in range(group):
            sl = slice(gi * block_q, (gi + 1) * block_q)
            q = q_ref[0, gi]  # [bq, dh]
            do = do_ref[0, gi]
            lse_row = lse_ref[0, gi : gi + 1, :]  # [1, bq]
            di_row = di_ref[0, gi : gi + 1, :]
            st = (
                jax.lax.dot_general(
                    k,
                    q,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + bias
            )  # [bkv, bq]
            p = jnp.exp(st - lse_row)
            dv_p = jax.lax.dot_general(
                p.astype(do.dtype),
                do,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bkv, dh]
            dp = jax.lax.dot_general(
                v, do, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (dp - di_row) * p * scale
            dk_p = jax.lax.dot_general(
                ds.astype(q.dtype),
                q,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bkv, dh]
            dq_scr[sl] += jax.lax.dot_general(
                ds.astype(k.dtype),
                k,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bq, dh]
            if gi == 0:
                dk_acc, dv_acc = dk_p, dv_p
            else:
                dk_acc, dv_acc = dk_acc + dk_p, dv_acc + dv_p

        @pl.when(first == 0)
        def _wait_reads():
            rd_k.wait()
            rd_v.wait()

        revisit = first == 0
        dkv_scr[par, 0] = jnp.where(revisit, dkv_scr[par, 0], 0.0) + dk_acc
        dkv_scr[par, 1] = jnp.where(revisit, dkv_scr[par, 1], 0.0) + dv_acc
        pltpu.make_async_copy(dkv_scr.at[par, 0], dst_k, wsem.at[par, 0]).start()
        pltpu.make_async_copy(dkv_scr.at[par, 1], dst_v, wsem.at[par, 1]).start()
        pend_scr[par] = 1

    @pl.when(s == count - 1)
    def _emit():
        for gi in range(group):
            sl = slice(gi * block_q, (gi + 1) * block_q)
            dq_ref[0, gi] = dq_scr[sl].astype(dq_ref.dtype)

    @pl.when((i == nq - 1) & (s == slots - 1))
    def _final_drain():
        # the descriptor's target address is irrelevant to a semaphore
        # wait — only the transfer size matters
        for p in (0, 1):

            @pl.when(pend_scr[p] == 1)
            def _(p=p):
                pltpu.make_async_copy(
                    dkv_scr.at[p, 0], dk_hbm.at[h, pl.ds(0, block_kv), :],
                    wsem.at[p, 0],
                ).wait()
                pltpu.make_async_copy(
                    dkv_scr.at[p, 1], dv_hbm.at[h, pl.ds(0, block_kv), :],
                    wsem.at[p, 1],
                ).wait()
                pend_scr[p] = 0


def _rmw_visit_marks(ids, types, n_blocks):
    """Per-(i, s) int32 (first, conflict, parity) for the fused kernel's
    read-modify-write schedule, in (i asc, s asc) traversal order over valid
    slots (padding slots repeat earlier ids and never count):

    * first    — first valid visit of block ``ids[i, s]`` (overwrites).
    * conflict — same block as the immediately preceding valid visit (its
      in-flight write must drain before this visit's read).
    * parity   — alternates over valid visits (scratch-buffer index).

    Tiny [rows, slots] work, computed on device so BlockMeta needs no new
    field."""
    flat = ids.reshape(-1)
    validm = types.reshape(-1) > 0
    m = flat.shape[0]
    sentinel = jnp.int32(m)
    idx = jnp.arange(m, dtype=jnp.int32)
    pos = jnp.where(validm, idx, sentinel)
    firstpos = jnp.full((n_blocks,), sentinel, jnp.int32).at[flat].min(
        pos, mode="drop"
    )
    first = validm & (pos == firstpos[flat])
    # index of the previous valid entry (exclusive running max of valid idx)
    prev = jax.lax.associative_scan(
        jnp.maximum, jnp.where(validm, idx, -1)
    )
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prev[:-1]])
    conflict = validm & (prev >= 0) & (flat[jnp.maximum(prev, 0)] == flat)
    parity = jnp.where(validm, (jnp.cumsum(validm) - 1) % 2, 0)
    out = jnp.stack(
        [first.astype(jnp.int32), conflict.astype(jnp.int32),
         parity.astype(jnp.int32)],
        axis=-1,
    )
    return out.reshape(ids.shape + (3,))


def _first_visit_marks(q_ids, q_types, nq):
    """First-visit component of `_rmw_visit_marks` (kept for tests)."""
    return _rmw_visit_marks(q_ids, q_types, nq)[..., 0]


def _bwd_fused(q4, k, v, ld2, kv_ids, kv_counts, kv_types, do, lse, di, scale,
               bs, interpret, offs=None):
    hkv, group, n, dh = q4.shape
    nkv = k.shape[1]
    bq, bkv = bs.block_q, bs.block_kv
    nq = n // bq
    slots = kv_ids.shape[1]
    # NOTE head-blocking measured SLOWER here (7.3 vs 6.0 ms/call at the
    # bench shape): the per-visit RMW unit would grow to [hb, bkv, dh] and
    # the extra in-flight DMA bytes + VMEM pressure outweigh the shared
    # mask build. The split dq/dkv kernels take head_block; fused stays
    # per-head (grid h axis = hkv).
    if offs is None:
        offs = jnp.zeros((2,), jnp.int32)
    aux = _rmw_visit_marks(kv_ids, kv_types, nkv // bkv)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(hkv, nq, slots),
        in_specs=[
            pl.BlockSpec((1, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((1, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((1, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec(
                (1, bkv),
                lambda h, i, s, off, ids, *_: (0, off[1] // bkv + ids[i, s]),
            ),
            pl.BlockSpec((1, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((1, group, bq), lambda h, i, s, *_: (h, 0, i)),
            pl.BlockSpec((1, group, bq), lambda h, i, s, *_: (h, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((group * bq, dh), jnp.float32),
            pltpu.VMEM((2, 2, bkv, dh), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _dqdkv_kernel, scale=scale, block_q=bq, block_kv=bkv, group=group,
        nq=nq, slots=slots,
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
        interpret=_interpret_mode(interpret),
        name="tree_attention_bwd_fused",
    )(offs.astype(jnp.int32), kv_ids, kv_counts, kv_types, aux,
      q4, k, v, ld2, do, lse, di)
    return dq, dkf.astype(k.dtype), dvf.astype(v.dtype)


# -------------------------------------------------------- cached fused bwd


def _dqdkv_cached_kernel(
    offs_ref,
    ids_ref,
    counts_ref,
    types_ref,
    sched_ref,
    flush_ref,
    q_ref,
    k_ref,
    v_ref,
    ld_ref,
    do_ref,
    lse_ref,
    di_ref,
    dq_ref,
    dk_hbm,
    dv_hbm,
    dq_scr,
    cache_scr,
    rsem,
    wsem,
    *,
    scale: float,
    block_q: int,
    block_kv: int,
    group: int,
    nq: int,
    slots: int,
    n_slots: int,
):
    """Fused dq+dk+dv with a VMEM-resident kv-block accumulator cache.

    Same math as ``_dqdkv_kernel`` (one score/exp/dp chain per active pair,
    dq in VMEM scratch), but dk/dv accumulate in an R-slot VMEM cache driven
    by a host-precomputed Belady schedule (tries/flatten.py
    ``build_bwd_cache_sched``) instead of a per-visit HBM read-modify-write.
    HBM is touched only on slot evictions, reloads of previously-evicted
    blocks, and the final flush — ~9-11% of the RMW traffic at the bench
    shapes — which also removes the ±15% sensitivity to XLA's VMEM pinning
    of the dk/dv buffers (docs/PERF.md).

    Removing the per-visit RMW also unblocks HEAD-BLOCKING (the RMW unit
    objection that kept ``_dqdkv_kernel`` per-head is gone): with ``hb`` kv
    heads per grid step, one mask build is shared across hb*group q-tiles
    and the grid shrinks hb-fold. The cache slot unit becomes
    [hb, 2, bkv, dh]; VMEM affords it — the chip has ~128 MB (the 16 MB
    figure elsewhere is only XLA's default scoped limit), and the launcher
    budgets (hb, R) in ``cached_bwd_geometry``.

    DMA discipline: at most one eviction write and one reload read are in
    flight, both started before the pair's matmuls and waited after (evict
    must drain before the reload into the same slot starts, so that rare
    combination serializes).
    """
    h = pl.program_id(0)
    i = pl.program_id(1)
    s = pl.program_id(2)
    count = counts_ref[i]
    typ = types_ref[i, s]
    hb = k_ref.shape[0]

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

        # k-major orientation: rows = kv positions, lanes = q positions.
        # One mask build shared across hb kv heads x group q heads.
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
                q = q_ref[hi, gi]  # [bq, dh]
                do = do_ref[hi, gi]
                lse_row = lse_ref[hi, gi : gi + 1, :]  # [1, bq]
                di_row = di_ref[hi, gi : gi + 1, :]
                st = (
                    jax.lax.dot_general(
                        k,
                        q,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                    + bias
                )  # [bkv, bq]
                p = jnp.exp(st - lse_row)
                dv_p = jax.lax.dot_general(
                    p.astype(do.dtype),
                    do,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bkv, dh]
                dp = jax.lax.dot_general(
                    v, do, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ds = (dp - di_row) * p * scale
                dk_p = jax.lax.dot_general(
                    ds.astype(q.dtype),
                    q,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bkv, dh]
                dq_scr[sl] += jax.lax.dot_general(
                    ds.astype(k.dtype),
                    k,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bq, dh]
                if gi == 0:
                    dk_acc, dv_acc = dk_p, dv_p
                else:
                    dk_acc, dv_acc = dk_acc + dk_p, dv_acc + dv_p
            accs.append((dk_acc, dv_acc))

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
                        dk_hbm.at[h * hb + hi, pl.ds(blk * block_kv, block_kv), :],
                        wsem.at[hi, 0],
                    ))
                    copies.append(pltpu.make_async_copy(
                        cache_scr.at[r, hi, 1],
                        dv_hbm.at[h * hb + hi, pl.ds(blk * block_kv, block_kv), :],
                        wsem.at[hi, 1],
                    ))
                for c in copies:
                    c.start()
                for c in copies:
                    c.wait()


# total kernel VMEM budget for the cached backward (the chip has ~128 MB;
# leave headroom for XLA's own scoped allocations in the surrounding program)
_CACHED_VMEM_BUDGET = 96 << 20


def cached_bwd_geometry(hkv: int, group: int, bq: int, bkv: int, dh: int,
                        n_kv_blocks: int, head_block: int) -> tuple[int, int]:
    """(hb, n_slots) for the cached fused backward — the single source of
    truth shared by the engine's prepare() (which sizes the Belady schedule)
    and the kernel launcher (which sizes the VMEM scratch).

    Picks the largest head block hb ≤ head_block that divides hkv, then the
    largest slot count R ≤ n_kv_blocks that fits the VMEM budget after the
    pipeline's double-buffered operands and the dq scratch; if R would drop
    below the point where the cache stops being useful (min(n_kv_blocks, 8)
    — below the typical ancestor-row working set Belady starts thrashing),
    hb is halved and R recomputed. Operand sizes are budgeted at 4 bytes
    (fp32 worst case) so the geometry — and therefore the schedule the
    engine builds at prepare() time — never depends on the activation
    dtype."""
    hb = _eff_head_block(hkv, head_block, hkv)
    while True:
        tile = hb * group * bq * dh
        operands = 2 * (2 * tile + 2 * hb * bkv * dh) * 4  # q,do,k,v buffers
        operands += 2 * tile * 4  # dq out block
        operands += 4 * 2 * hb * group * bq * 4  # lse/di double-buffered
        dq_scr = tile * 4
        per_slot = hb * 2 * bkv * dh * 4
        r = (_CACHED_VMEM_BUDGET - operands - dq_scr) // per_slot
        r = min(int(n_kv_blocks), int(r))
        if r >= min(int(n_kv_blocks), 8) or hb == 1:
            return hb, max(1, r)
        hb = _eff_head_block(hkv, hb // 2, hkv)


def _bwd_cached(q4, k, v, ld2, kv_ids, kv_counts, kv_types, actions, flush,
                do, lse, di, scale, bs, interpret, offs=None):
    hkv, group, n, dh = q4.shape
    nkv = k.shape[1]
    bq, bkv = bs.block_q, bs.block_kv
    nq = n // bq
    slots = kv_ids.shape[1]
    n_slots = flush.shape[0]
    # hb from the shared geometry; the slot count comes from the schedule
    # itself (the schedule is head-independent, so any R is executable —
    # engine.prepare sizes it via cached_bwd_geometry, tests may force a
    # tiny cache to exercise evictions)
    hb, _ = cached_bwd_geometry(
        hkv, group, bq, bkv, dh, nkv // bkv, bs.head_block
    )
    if offs is None:
        offs = jnp.zeros((2,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(hkv // hb, nq, slots),
        in_specs=[
            pl.BlockSpec((hb, group, bq, dh), lambda h, i, s, *_: (h, 0, i, 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec((hb, bkv, dh), lambda h, i, s, off, ids, *_: (h, ids[i, s], 0)),
            pl.BlockSpec(
                (1, bkv),
                lambda h, i, s, off, ids, *_: (0, off[1] // bkv + ids[i, s]),
            ),
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
        _dqdkv_cached_kernel, scale=scale, block_q=bq, block_kv=bkv,
        group=group, nq=nq, slots=slots, n_slots=n_slots,
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
        interpret=_interpret_mode(interpret),
        name="tree_attention_bwd_cached",
    )(offs.astype(jnp.int32), kv_ids, kv_counts, kv_types,
      actions, flush, q4, k, v, ld2, do, lse, di)
    return dq, dkf.astype(k.dtype), dvf.astype(v.dtype)


# -------------------------------------------------------------------- custom_vjp


# Guard for the bound path: scores satisfy |st| <= C (Cauchy-Schwarz both
# ways), so the shift's worst-case slack over the true row max is 2*max(C).
# exp(st - C) keeps full fp32 precision while the slack stays inside the
# normal range (floor ~e^-87); max(C) < 40 caps the slack at 80 e-folds.
BOUND_SAFE_MAX = 40.0


def _fwd_dispatch(q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale,
                  block_sizes, interpret, softmax_mode):
    if softmax_mode == "bound":
        c = _score_bound(q4, k, scale)

        def take_bound(q4, k, v, ld2, c):
            return _fwd_bound(
                q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale,
                block_sizes, interpret, c=c,
            )

        def take_online(q4, k, v, ld2, c):
            return _fwd(
                q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale,
                block_sizes, interpret,
            )

        # Runtime fallback: if weights drift to where the bound could
        # underflow fp32, silently use the online kernel instead.
        return jax.lax.cond(
            jnp.max(c) < BOUND_SAFE_MAX, take_bound, take_online,
            q4, k, v, ld2, c,
        )
    if softmax_mode != "online":
        raise ValueError(f"unknown softmax_mode {softmax_mode!r}")
    return _fwd(
        q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale, block_sizes, interpret
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16))
def _tree_attention(
    q4,
    k,
    v,
    ld2,
    kv_ids,
    kv_counts,
    kv_types,
    q_ids,
    q_counts,
    q_types,
    cache_actions,
    cache_flush,
    scale,
    block_sizes,
    interpret,
    softmax_mode,
    bwd_mode,
):
    o, _ = _fwd_dispatch(
        q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale, block_sizes,
        interpret, softmax_mode,
    )
    return o


def _tree_attention_fwd(
    q4, k, v, ld2, kv_ids, kv_counts, kv_types, q_ids, q_counts, q_types,
    cache_actions, cache_flush,
    scale, block_sizes, interpret, softmax_mode, bwd_mode,
):
    o, lse = _fwd_dispatch(
        q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale, block_sizes,
        interpret, softmax_mode,
    )
    # named so a `save_only_these_names` remat policy can keep (o, lse) and
    # DCE the forward kernel out of the backward recompute — the kernel then
    # runs once instead of twice per step (models/qwen3.py _remat_policy
    # "attn"); q/k/v residuals are rebuilt by the cheap linear recompute
    from jax.ad_checkpoint import checkpoint_name

    o = checkpoint_name(o, "tree_attn_o")
    lse = checkpoint_name(lse, "tree_attn_lse")
    res = (q4, k, v, ld2, kv_ids, kv_counts, kv_types, q_ids, q_counts, q_types,
           cache_actions, cache_flush, o, lse)
    return o, res


def _tree_attention_bwd(scale, block_sizes, interpret, softmax_mode, bwd_mode,
                        res, do):
    (q4, k, v, ld2, kv_ids, kv_counts, kv_types, q_ids, q_counts, q_types,
     cache_actions, cache_flush, o, lse) = res
    di = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # [hkv,g,n]
    nones = (None,) * 9
    if bwd_mode == "cached":
        dq, dk, dv = _bwd_cached(
            q4, k, v, ld2, kv_ids, kv_counts, kv_types, cache_actions,
            cache_flush, do, lse, di, scale, block_sizes, interpret,
        )
        return (dq, dk, dv) + nones
    if bwd_mode == "fused":
        dq, dk, dv = _bwd_fused(
            q4, k, v, ld2, kv_ids, kv_counts, kv_types, do, lse, di, scale,
            block_sizes, interpret,
        )
        return (dq, dk, dv) + nones
    if bwd_mode != "split":
        raise ValueError(f"unknown bwd_mode {bwd_mode!r}")
    dq = _bwd_dq(
        q4, k, v, ld2, kv_ids, kv_counts, kv_types, do, lse, di, scale, block_sizes,
        interpret,
    )
    dk, dv = _bwd_dkv(
        q4, k, v, ld2, q_ids, q_counts, q_types, do, lse, di, scale, block_sizes,
        interpret,
    )
    return (dq, dk, dv) + nones


_tree_attention.defvjp(_tree_attention_fwd, _tree_attention_bwd)


# ------------------------------------------------------------------- public API


def tree_attention(
    q: jnp.ndarray,  # [Hq, n, dh]
    k: jnp.ndarray,  # [Hkv, n, dh]
    v: jnp.ndarray,  # [Hkv, n, dh]
    last_desc: jnp.ndarray,  # [n] int32
    kv_ids: jnp.ndarray,  # [nq, S] int32
    kv_counts: jnp.ndarray,  # [nq] int32
    kv_types: jnp.ndarray,  # [nq, S] int32
    q_ids: jnp.ndarray,  # [nk, St] int32
    q_counts: jnp.ndarray,  # [nk] int32
    q_types: jnp.ndarray,  # [nk, St] int32
    *,
    scale: float | None = None,
    block_sizes: BlockSizes = BlockSizes(),
    interpret: bool = False,
    softmax_mode: str = "online",
    bwd_mode: str = "split",
    cache_sched=None,
) -> jnp.ndarray:
    """Tree-masked flash attention over a packed DFS trie layout.

    bwd_mode:

    * ``"split"`` (default) — separate dq (query-major) and dkv (key-major)
      kernels, each recomputing scores/probabilities from the saved lse.
    * ``"fused"`` — one query-major kernel emits dq+dk+dv, computing the
      score/exp/dp chain once per active block pair (the split pair does it
      twice; the kernels are VPU-bound on that chain — docs/PERF.md). dq
      accumulates in VMEM scratch (resident per q block, like the split dq
      kernel); dk/dv accumulate in fp32 HBM via explicit double-buffered
      read-modify-write DMAs; see ``_dqdkv_kernel``.
    * ``"cached"`` — the fused kernel with its dk/dv accumulators resident
      in an R-slot VMEM cache driven by a host-precomputed Belady schedule
      (``cache_sched``, required: a tries.BwdCacheSched or an
      ``(actions, flush)`` array pair from
      tries.flatten.build_bwd_cache_sched). HBM dk/dv traffic drops to
      evictions + final flush (~9-11% of "fused" at the bench shapes);
      see ``_dqdkv_cached_kernel``.

    softmax_mode:

    * ``"online"`` (default, safe for any inputs) — classic flash-attention
      running max/sum with per-block accumulator rescale.
    * ``"bound"`` — shift by the per-row Cauchy-Schwarz bound
      ``C = scale*||q_row||*max||k||`` computed outside the kernel instead of
      tracking a running max; removes the whole online-softmax VPU chain
      (max reductions, second exp, accumulator rescale), the forward kernel's
      bottleneck (docs/PERF.md; measured 23% faster fwd at 0.6B shapes).
      Exact same math — softmax is shift-invariant — but ``exp(st - C)``
      underflows fp32 if the bound overshoots the true row max by >~85
      e-folds. Slack is bounded by ``2*max(C)`` (scores also satisfy
      ``st >= -C``), so the dispatch guards with a runtime
      ``lax.cond(max(C) < BOUND_SAFE_MAX=40, bound, online)`` — provably
      full-precision when taken, silent online fallback otherwise. With
      qk-norm (all Qwen3 variants) ``C <= sqrt(dh)*max|g_q|*max|g_k|``
      (~22 at dh=128, gains ~1.4), so the fast path engages; without qk-norm
      (Llama/Qwen2.5) score magnitudes are unbounded and ``"online"`` avoids
      compiling the second kernel. Engine-level ``fwd_softmax="auto"`` picks
      per model config.
    """
    hq, n, dh = q.shape
    hkv = k.shape[0]
    if hq % hkv:
        raise ValueError(f"{hq=} not a multiple of {hkv=}")
    if n % block_sizes.block_q or n % block_sizes.block_kv:
        raise ValueError(f"{n=} must divide block sizes {block_sizes}")
    group = hq // hkv
    if scale is None:
        scale = dh**-0.5
    if bwd_mode == "cached":
        if cache_sched is None:
            raise ValueError('bwd_mode="cached" needs cache_sched '
                             "(tries.flatten.build_bwd_cache_sched)")
        acts, flush = (
            (cache_sched.actions, cache_sched.flush)
            if hasattr(cache_sched, "actions")
            else cache_sched
        )
        cache_actions = jnp.asarray(acts, jnp.int32)
        cache_flush = jnp.asarray(flush, jnp.int32)
    else:
        # uniform custom_vjp signature; unused by split/fused backward
        cache_actions = jnp.zeros((1, 1, 4), jnp.int32)
        cache_flush = jnp.zeros((1, 2), jnp.int32)
    q4 = q.reshape(hkv, group, n, dh)
    ld2 = last_desc.reshape(1, n).astype(jnp.int32)
    o = _tree_attention(
        q4,
        k,
        v,
        ld2,
        kv_ids.astype(jnp.int32),
        kv_counts.astype(jnp.int32),
        kv_types.astype(jnp.int32),
        q_ids.astype(jnp.int32),
        q_counts.astype(jnp.int32),
        q_types.astype(jnp.int32),
        cache_actions,
        cache_flush,
        float(scale),
        block_sizes,
        bool(interpret),
        str(softmax_mode),
        str(bwd_mode),
    )
    return o.reshape(hq, n, dh)


def tree_attention_with_meta(q, k, v, last_desc, meta, **kw):
    """Convenience: accept a tries.BlockMeta (numpy) directly."""
    return tree_attention(
        q,
        k,
        v,
        last_desc,
        jnp.asarray(meta.kv_ids),
        jnp.asarray(meta.kv_counts),
        jnp.asarray(meta.kv_types),
        jnp.asarray(meta.q_ids),
        jnp.asarray(meta.q_counts),
        jnp.asarray(meta.q_types),
        block_sizes=BlockSizes(meta.block_q, meta.block_kv),
        **kw,
    )
