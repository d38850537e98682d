"""Ring tree attention: sequence-sharded tree-masked flash attention.

Beyond-reference capability (the reference has no sequence/context
parallelism, SURVEY.md §2.3): the packed DFS trie is sharded over the "seq"
mesh axis — each rank holds q/k/v for its n/sp slice with ALL local heads —
and K/V chunks rotate around the ring via `ppermute`, one ring step per
shard. Unlike Ulysses (parallel/tp_model.py), this removes the
sp ≤ kv_heads/tp constraint: any sp dividing the padded length works.

Per ring step the rank runs the SAME block-sparse Pallas kernels
(ops/tree_attention.py) on the (my q shard, incoming kv shard) pair, with

* per-pair block metadata (tries/flatten.py:build_ring_block_meta) — tree
  sparsity across shards is large: a q shard only reads the few ancestor
  blocks of earlier shards, so most ring steps stream tiny slot counts;
* global position offsets threaded into the kernels' interval test
  (`offs` scalar prefetch) and into the FULL replicated `last_desc` table;
* fp32 online-softmax combination of the per-pair partials (o_i, lse_i).

The backward is a hand-written ring (custom_vjp): dq accumulates locally
over incoming kv chunks; (dk, dv) partials ride around the ring WITH their
kv chunk (fp32 accumulators) and arrive home after sp hops — the standard
ring-attention backward dataflow, driven by the existing dq/dkv kernels fed
with the final lse/di.

`tree_attention_ring_reference` is the blocked-jnp differentiable oracle
(autodiff through scan + ppermute) used by CPU tests and the "reference"
attention backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dynamictreeattn_tpu.ops.tree_attention import (
    MASK_VALUE,
    BlockSizes,
    _bwd_dq,
    _bwd_dkv,
    _fwd,
)

__all__ = ["tree_attention_ring", "tree_attention_ring_reference"]


def _ring_perm(sp: int):
    return [(i, (i + 1) % sp) for i in range(sp)]


def _rotate(xs, axis, perm):
    return jax.tree.map(lambda t: jax.lax.ppermute(t, axis, perm), xs)


def _combine(o_run, lse_run, o_i, lse_i):
    """fp32 online-softmax merge of a normalized partial (o_i, lse_i)."""
    lse_new = jnp.logaddexp(lse_run, lse_i)
    c_run = jnp.where(lse_run == -jnp.inf, 0.0, jnp.exp(lse_run - lse_new))
    c_i = jnp.where(lse_i == -jnp.inf, 0.0, jnp.exp(lse_i - lse_new))
    o_new = o_run * c_run[..., None] + o_i.astype(jnp.float32) * c_i[..., None]
    return o_new, lse_new


def _ring_fwd_impl(
    q4, k, v, ld2, kv_ids, kv_counts, kv_types, scale, bs, interpret, sp, axis
):
    hkv, group, n_loc, dh = q4.shape
    me = jax.lax.axis_index(axis)
    perm = _ring_perm(sp)

    def step(carry, r):
        kc, vc, o_run, lse_run = carry
        src = jnp.mod(me - r, sp)
        offs = (jnp.stack([me, src]) * n_loc).astype(jnp.int32)
        o_i, lse_i = _fwd(
            q4, kc, vc, ld2,
            kv_ids[me, src], kv_counts[me, src], kv_types[me, src],
            scale, bs, interpret, offs=offs,
        )
        o_run, lse_run = _combine(o_run, lse_run, o_i, lse_i)
        kc, vc = _rotate((kc, vc), axis, perm)
        return (kc, vc, o_run, lse_run), None

    o0 = jnp.zeros((hkv, group, n_loc, dh), jnp.float32)
    lse0 = jnp.full((hkv, group, n_loc), -jnp.inf, jnp.float32)
    (_, _, o, lse), _ = jax.lax.scan(step, (k, v, o0, lse0), jnp.arange(sp))
    return o.astype(q4.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def _tree_attention_ring(
    q4, k, v, ld2,
    kv_ids, kv_counts, kv_types, q_ids, q_counts, q_types,
    scale, block_sizes, interpret, sp, axis,
):
    o, _ = _ring_fwd_impl(
        q4, k, v, ld2, kv_ids, kv_counts, kv_types,
        scale, block_sizes, interpret, sp, axis,
    )
    return o


def _tree_attention_ring_fwd(
    q4, k, v, ld2,
    kv_ids, kv_counts, kv_types, q_ids, q_counts, q_types,
    scale, block_sizes, interpret, sp, axis,
):
    o, lse = _ring_fwd_impl(
        q4, k, v, ld2, kv_ids, kv_counts, kv_types,
        scale, block_sizes, interpret, sp, axis,
    )
    res = (q4, k, v, ld2, kv_ids, kv_counts, kv_types, q_ids, q_counts,
           q_types, o, lse)
    return o, res


def _tree_attention_ring_bwd(scale, block_sizes, interpret, sp, axis, res, do):
    (q4, k, v, ld2, kv_ids, kv_counts, kv_types, q_ids, q_counts, q_types,
     o, lse) = res
    hkv, group, n_loc, dh = q4.shape
    me = jax.lax.axis_index(axis)
    perm = _ring_perm(sp)
    di = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    def step(carry, r):
        kc, vc, dkc, dvc, dq_acc = carry
        src = jnp.mod(me - r, sp)
        offs = (jnp.stack([me, src]) * n_loc).astype(jnp.int32)
        dq_p = _bwd_dq(
            q4, kc, vc, ld2,
            kv_ids[me, src], kv_counts[me, src], kv_types[me, src],
            do, lse, di, scale, block_sizes, interpret, offs=offs,
        )
        dk_p, dv_p = _bwd_dkv(
            q4, kc, vc, ld2,
            q_ids[me, src], q_counts[me, src], q_types[me, src],
            do, lse, di, scale, block_sizes, interpret, offs=offs,
        )
        dq_acc = dq_acc + dq_p.astype(jnp.float32)
        dkc = dkc + dk_p.astype(jnp.float32)
        dvc = dvc + dv_p.astype(jnp.float32)
        # the (dk, dv) accumulators travel WITH their kv chunk; after sp hops
        # both are back at the chunk's owner carrying every rank's
        # contribution
        kc, vc, dkc, dvc = _rotate((kc, vc, dkc, dvc), axis, perm)
        return (kc, vc, dkc, dvc, dq_acc), None

    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    dq0 = jnp.zeros(q4.shape, jnp.float32)
    (_, _, dk, dv, dq), _ = jax.lax.scan(
        step, (k, v, dk0, dv0, dq0), jnp.arange(sp)
    )
    return (dq.astype(q4.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None, None, None, None, None, None)


_tree_attention_ring.defvjp(_tree_attention_ring_fwd, _tree_attention_ring_bwd)


def tree_attention_ring(
    q: jnp.ndarray,  # [Hq_local, n_loc, dh] — this seq rank's rows
    k: jnp.ndarray,  # [Hkv_local, n_loc, dh]
    v: jnp.ndarray,  # [Hkv_local, n_loc, dh]
    last_desc: jnp.ndarray,  # [n_global] int32 — FULL table, replicated
    kv_ids: jnp.ndarray,  # [sp, sp, nq_loc, S] (build_ring_block_meta)
    kv_counts: jnp.ndarray,  # [sp, sp, nq_loc]
    kv_types: jnp.ndarray,  # [sp, sp, nq_loc, S]
    q_ids: jnp.ndarray,  # [sp, sp, nk_loc, St]
    q_counts: jnp.ndarray,  # [sp, sp, nk_loc]
    q_types: jnp.ndarray,  # [sp, sp, nk_loc, St]
    *,
    sp: int,
    axis: str = "seq",
    scale: float | None = None,
    block_sizes: BlockSizes = BlockSizes(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Ring tree-masked flash attention over a "seq"-sharded packed trie."""
    hq, n_loc, dh = q.shape
    hkv = k.shape[0]
    if hq % hkv:
        raise ValueError(f"{hq=} not a multiple of {hkv=}")
    if n_loc % block_sizes.block_q or n_loc % block_sizes.block_kv:
        raise ValueError(f"block sizes {block_sizes} must divide {n_loc=}")
    group = hq // hkv
    if scale is None:
        scale = dh**-0.5
    q4 = q.reshape(hkv, group, n_loc, dh)
    ld2 = last_desc.reshape(1, -1).astype(jnp.int32)
    o = _tree_attention_ring(
        q4, k, v, ld2,
        kv_ids.astype(jnp.int32), kv_counts.astype(jnp.int32),
        kv_types.astype(jnp.int32), q_ids.astype(jnp.int32),
        q_counts.astype(jnp.int32), q_types.astype(jnp.int32),
        float(scale), block_sizes, bool(interpret), int(sp), axis,
    )
    return o.reshape(hq, n_loc, dh)


def tree_attention_ring_reference(
    q: jnp.ndarray,  # [Hq_local, n_loc, dh]
    k: jnp.ndarray,  # [Hkv_local, n_loc, dh]
    v: jnp.ndarray,  # [Hkv_local, n_loc, dh]
    last_desc: jnp.ndarray,  # [n_global]
    *,
    sp: int,
    axis: str = "seq",
    scale: float | None = None,
) -> jnp.ndarray:
    """Differentiable jnp ring (autodiff backward through scan + ppermute)."""
    hq, n_loc, dh = q.shape
    hkv = k.shape[0]
    group = hq // hkv
    if scale is None:
        scale = dh**-0.5
    me = jax.lax.axis_index(axis)
    perm = _ring_perm(sp)
    qg = q.reshape(hkv, group, n_loc, dh).astype(jnp.float32)
    q_pos = me * n_loc + jnp.arange(n_loc)
    ld = last_desc.astype(jnp.int32)

    def step(carry, r):
        kc, vc, m, l, acc = carry
        src = jnp.mod(me - r, sp)
        k_pos = src * n_loc + jnp.arange(n_loc)
        ld_c = jax.lax.dynamic_slice_in_dim(ld, src * n_loc, n_loc)
        mask = (k_pos[None, :] <= q_pos[:, None]) & (
            q_pos[:, None] <= ld_c[None, :]
        )
        st = (
            jnp.einsum(
                "hgqd,hkd->hgqk", qg, kc.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            * scale
            + jnp.where(mask, 0.0, MASK_VALUE)[None, None]
        )
        m_cur = jnp.max(st, axis=-1)
        m_new = jnp.maximum(m, m_cur)
        # multiply by the mask so fully-masked pair rows contribute exactly 0
        p = jnp.exp(st - m_new[..., None]) * mask[None, None]
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "hgqk,hkd->hgqd", p, vc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        kc, vc = _rotate((kc, vc), axis, perm)
        return (kc, vc, m_new, l, acc), None

    m0 = jnp.full((hkv, group, n_loc), MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((hkv, group, n_loc), jnp.float32)
    acc0 = jnp.zeros((hkv, group, n_loc, dh), jnp.float32)
    (_, _, _, l, acc), _ = jax.lax.scan(step, (k, v, m0, l0, acc0), jnp.arange(sp))
    o = acc / jnp.maximum(l, 1e-30)[..., None]
    return o.reshape(hq, n_loc, dh).astype(q.dtype)
