"""Blocked simulator of the Pallas tree-attention kernel (pure jnp).

Executes the SAME block-sparse iteration, masking, and online-softmax update
order as kernels in tree_attention.py, but as ordinary jnp ops — fast to
compile on CPU. Two roles:

1. CPU test oracle for the block metadata + kernel math (interpret-mode Pallas
   compiles are minutes-slow for grouped kernels; the real kernel is verified
   on actual TPU by scripts/tpu_kernel_check.py and the bench harness).
2. Differentiable fallback path on hosts without TPU.

Metadata arrays must be host numpy (python loop bounds are static).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.ops.tree_attention import MASK_VALUE

__all__ = ["tree_attention_blocked_sim"]


def tree_attention_blocked_sim(
    q: jnp.ndarray,  # [Hq, n, dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    last_desc: np.ndarray,  # HOST numpy [n]
    meta,  # tries.BlockMeta (host numpy)
    scale: float | None = None,
    softmax_mode: str = "online",
) -> jnp.ndarray:
    hq, n, dh = q.shape
    hkv = k.shape[0]
    group = hq // hkv
    bq, bkv = meta.block_q, meta.block_kv
    if scale is None:
        scale = dh**-0.5
    q4 = q.reshape(hkv, group, n, dh)
    ld = np.asarray(last_desc)

    if softmax_mode == "bound":
        # mirrors _fwd_bound_kernel: fixed per-row Cauchy-Schwarz shift,
        # no running max / rescale
        from dynamictreeattn_tpu.ops.tree_attention import _score_bound

        bound = _score_bound(q4, k, scale)[..., None]  # [hkv, group, n, 1]
    elif softmax_mode != "online":
        raise ValueError(f"unknown softmax_mode {softmax_mode!r}")

    out = jnp.zeros((hkv, group, n, dh), jnp.float32)
    for i in range(meta.n_q_blocks):
        rows = slice(i * bq, (i + 1) * bq)
        m = jnp.full((group, bq, 1), -jnp.inf, jnp.float32)
        l = jnp.zeros((group, bq, 1), jnp.float32)
        acc = jnp.zeros((group, bq, dh), jnp.float32)
        for s in range(int(meta.kv_counts[i])):
            j = int(meta.kv_ids[i, s])
            typ = int(meta.kv_types[i, s])
            cols = slice(j * bkv, (j + 1) * bkv)
            kb = k[:, cols].astype(jnp.float32)  # [hkv, bkv, dh]
            vb = v[:, cols].astype(jnp.float32)
            st = (
                jnp.einsum("hgqd,hkd->hgqk", q4[:, :, rows].astype(jnp.float32), kb)
                * scale
            )
            if typ == 1:
                row_pos = i * bq + np.arange(bq)[:, None]
                col_pos = j * bkv + np.arange(bkv)[None, :]
                mask = (col_pos <= row_pos) & (row_pos <= ld[cols][None, :])
                st = st + jnp.where(jnp.asarray(mask)[None, None], 0.0, MASK_VALUE)
            if softmax_mode == "bound":
                p = jnp.exp(st - bound[:, :, rows])
                l = l + jnp.sum(p, axis=-1, keepdims=True)
                acc = acc + jnp.einsum("hgqk,hkd->hgqd", p.astype(v.dtype), vb)
                continue
            m_cur = jnp.max(st, axis=-1, keepdims=True)
            m_next = jnp.maximum(m, m_cur)
            alpha = jnp.exp(m - m_next)
            p = jnp.exp(st - m_next)
            l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.einsum("hgqk,hkd->hgqd", p.astype(v.dtype), vb)
            m = m_next
        inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        out = out.at[:, :, rows].set(acc * inv)
    return out.reshape(hq, n, dh).astype(q.dtype)
