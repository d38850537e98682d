"""Pallas TPU grouped-decode attention: one token for G branches × P prompts.

The XLA formulation of the grouped decode step (models/generate.py
_layer_step_grouped) materializes per-(prompt, layer) fp32 score rows over
[Lp] and [Nc] in HBM and always reads the FULL branch-completion cache (cols
≥ t are masked after the read). This kernel is the decode-side mirror of the
tree-training kernel (reference delegates decode entirely to a host
framework — README.md:4-5):

* flash-style online softmax over [prompt chunks | branch chunks] — scores
  never leave VMEM;
* branch-cache chunks use a t-clamped index map, so chunks whose columns are
  all ≥ t are never DMA'd (the pipeline repeats the previous block id) and
  their grid steps are skipped — the cache read grows with the decoded
  length instead of the allocation;
* the G branches of one (prompt, kv head) are batched into a single
  [G·grp, G·chunk] masked matmul per chunk (branches attend only to their
  own columns — a block-diagonal mask; the wasted MXU lanes are free, the
  cache read happens ONCE for all G);
* the current token's self column is merged outside the kernel from the
  emitted (acc, m, l) — standard two-piece softmax combine.

Layouts match the sampler's caches: kp/vp [P, Hkv, Lp, dh] (frozen prompt),
kc/vc [P, G, Hkv, Nc, dh] (branch completions, written once per step outside
the layer scan). Lp and Nc must divide the chunk sizes — the sampler pads
its cache allocations, padding columns are masked by plen/t.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_attention_grouped"]

NUM_LANES = 128
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _decode_kernel(
    scal_ref,  # [P + 1] int32: plen per prompt, then t
    q_ref,     # [1, 1, R, dh]       R = G*grp
    kp_ref,    # [1, 1, cp, dh]
    vp_ref,
    kc_ref,    # [1, G, 1, cj, dh]
    vc_ref,
    acc_ref,   # [1, 1, R, dh] f32
    m_ref,     # [1, 1, R, NUM_LANES] f32
    l_ref,     # [1, 1, R, NUM_LANES] f32
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    grp: int,
    cp: int,
    cj: int,
    n_prompt_chunks: int,
    n_branch_chunks: int,
):
    p = pl.program_id(0)
    b = pl.program_id(2)
    plen = scal_ref[p]
    t = scal_ref[pl.num_programs(0)]
    R = q_ref.shape[2]

    @pl.when(b == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # [R, dh]

    def _online_update(st, v):  # st [R, C] fp32 masked, v [C, dh]
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_cur = jnp.max(st, axis=1, keepdims=True)  # [R, 1]
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)
        pe = jnp.exp(st - m_next[:, :1])
        l_scr[...] = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(pe, axis=1, keepdims=True), l_prev.shape
        )
        m_scr[...] = m_next
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
            pe.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(b < n_prompt_chunks)
    def _prompt_chunk():
        k = kp_ref[0, 0]  # [cp, dh]
        v = vp_ref[0, 0]
        st = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [R, cp]
        col = b * cp + jax.lax.broadcasted_iota(jnp.int32, (R, cp), 1)
        st = jnp.where(col < plen, st, MASK_VALUE)
        _online_update(st, v)

    @pl.when((b >= n_prompt_chunks) & ((b - n_prompt_chunks) * cj < t))
    def _branch_chunk():
        jc = b - n_prompt_chunks
        G = kc_ref.shape[1]
        k = kc_ref[0, :, 0].reshape(G * cj, -1)  # [G*cj, dh]
        v = vc_ref[0, :, 0].reshape(G * cj, -1)
        st = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [R, G*cj]
        row = jax.lax.broadcasted_iota(jnp.int32, (R, G * cj), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, G * cj), 1)
        ok = (row // grp == col // cj) & (jc * cj + col % cj < t)
        st = jnp.where(ok, st, MASK_VALUE)
        _online_update(st, v)

    @pl.when(b == n_prompt_chunks + n_branch_chunks - 1)
    def _emit():
        acc_ref[0, 0] = acc_scr[...]
        m_ref[0, 0] = m_scr[...]
        l_ref[0, 0] = l_scr[...]


def decode_attention_grouped(
    q,      # [P, G, hq, dh] post-rope queries for the current token
    k_self, # [P, G, hkv, dh] current token's keys (self column)
    v_self, # [P, G, hkv, dh]
    kp, vp, # [P, hkv, Lp, dh] frozen prompt cache
    kc, vc, # [P, G, hkv, Nc, dh] branch completion cache (cols < t live)
    plens,  # [P] int32 valid prompt lengths
    t,      # scalar int32: number of completed decode steps
    *,
    scale: float | None = None,
    prompt_chunk: int = 1024,
    branch_chunk: int = 256,
    interpret: bool = False,
):
    """Returns o [P, G, hq, dh] (q.dtype) — softmax(q·K^T)·V over each
    branch's visible columns: prompt cols < plen, own completion cols < t,
    and the current token itself."""
    P, G, hq, dh = q.shape
    hkv = kp.shape[1]
    Lp = kp.shape[2]
    Nc = kc.shape[3]
    grp = hq // hkv
    R = G * grp
    if scale is None:
        scale = dh ** -0.5
    def _pick(total, pref):
        for cand in (pref, 1024, 768, 512, 384, 256, 128):
            if cand <= pref and cand <= total and total % cand == 0:
                return cand
        raise ValueError(
            f"no chunk size <= {pref} divides {total} (pad the cache)"
        )

    cp = _pick(Lp, prompt_chunk)
    cj = _pick(Nc, branch_chunk)
    npc, nbc = Lp // cp, Nc // cj

    # [P, hkv, R, dh] — all branch queries of one (prompt, kv head) as rows
    qr = (
        q.reshape(P, G, hkv, grp, dh)
        .transpose(0, 2, 1, 3, 4)
        .reshape(P, hkv, R, dh)
    )
    scal = jnp.concatenate(
        [plens.astype(jnp.int32), jnp.asarray(t, jnp.int32).reshape(1)]
    )

    def _branch_idx(pp, h, b, scal_ref):
        # clamp to the last chunk with live columns: never DMA cols >= t
        # (pl.when skips their compute; the repeated id skips the fetch)
        tt = scal_ref[P]
        last_live = jnp.maximum((tt + cj - 1) // cj - 1, 0)
        jc = jnp.clip(b - npc, 0, last_live)
        return (pp, 0, h, jc, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P, hkv, npc + nbc),
        in_specs=[
            pl.BlockSpec((1, 1, R, dh), lambda p, h, b, s: (p, h, 0, 0)),
            pl.BlockSpec(
                (1, 1, cp, dh),
                lambda p, h, b, s: (p, h, jnp.minimum(b, npc - 1), 0),
            ),
            pl.BlockSpec(
                (1, 1, cp, dh),
                lambda p, h, b, s: (p, h, jnp.minimum(b, npc - 1), 0),
            ),
            pl.BlockSpec((1, G, 1, cj, dh), _branch_idx),
            pl.BlockSpec((1, G, 1, cj, dh), _branch_idx),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, R, dh), lambda p, h, b, s: (p, h, 0, 0)),
            pl.BlockSpec((1, 1, R, NUM_LANES), lambda p, h, b, s: (p, h, 0, 0)),
            pl.BlockSpec((1, 1, R, NUM_LANES), lambda p, h, b, s: (p, h, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, NUM_LANES), jnp.float32),
            pltpu.VMEM((R, NUM_LANES), jnp.float32),
            pltpu.VMEM((R, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, scale=float(scale), grp=grp, cp=cp, cj=cj,
        n_prompt_chunks=npc, n_branch_chunks=nbc,
    )
    acc, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P, hkv, R, dh), jnp.float32),
            jax.ShapeDtypeStruct((P, hkv, R, NUM_LANES), jnp.float32),
            jax.ShapeDtypeStruct((P, hkv, R, NUM_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
        name="decode_attention_grouped",
    )(scal, qr, kp, vp, kc, vc)

    # merge the self column: st_s[row] = scale * q·k_self(row's branch)
    m0 = m[..., 0]  # [P, hkv, R]
    l0 = l[..., 0]
    ks = (
        k_self.transpose(0, 2, 1, 3)[:, :, :, None, :]
        .repeat(grp, axis=3)
        .reshape(P, hkv, R, dh)
    )
    vs = (
        v_self.transpose(0, 2, 1, 3)[:, :, :, None, :]
        .repeat(grp, axis=3)
        .reshape(P, hkv, R, dh)
    )
    st_s = jnp.sum(
        qr.astype(jnp.float32) * ks.astype(jnp.float32), axis=-1
    ) * scale  # [P, hkv, R]
    m_tot = jnp.maximum(m0, st_s)
    sc = jnp.exp(m0 - m_tot)
    ss = jnp.exp(st_s - m_tot)
    o = (sc[..., None] * acc + ss[..., None] * vs.astype(jnp.float32)) / (
        (sc * l0 + ss)[..., None]
    )
    o = (
        o.reshape(P, hkv, G, grp, dh)
        .transpose(0, 2, 1, 3, 4)
        .reshape(P, G, hq, dh)
    )
    return o.astype(q.dtype)
