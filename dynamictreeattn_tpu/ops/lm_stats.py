"""Pallas fused LM-head softmax statistics: (lse, mean_x) + analytic vjp.

The vocab-chunked XLA loss (ops/losses.py mode="vocab") already avoids the
[n, V] logits matrix and the fp32 [d, V] dW carry, but XLA still
materializes per-chunk transients between fusion boundaries — above all the
[n, vc] bf16 ``dlogits`` in the backward, which feeds two matmuls (dW and
dhidden) and therefore round-trips HBM (~12 GB/step at the 2-group bench
shape; the measured ~27 ms gap between the 108 ms loss bucket and its 81 ms
4-matmul floor, docs/PERF.md "LM-head loss").

These kernels keep every transient in VMEM (the chip has ~128 MB; 16 MB
elsewhere in the tree is only XLA's default scoped limit):

* forward — 1-D grid over vocab blocks; ``hidden`` [n, d] rides whole in
  VMEM (constant-index window, fetched once), each grid step computes
  [bn, bv] logits tiles in an in-kernel row loop (small tiles keep Mosaic's
  register allocator from spilling — a whole-[n, bv] body spilled 58 MB)
  and folds them into resident online (m, Σeˣ, Σeˣ·x) statistics; lse /
  mean_x emit on the last block. One n·d·V matmul pass, zero logits HBM
  traffic.
* backward — same grid; recomputes the tiles from the saved lse (flash
  convention), forms dlogits tile-by-tile in VMEM, emits each [bv, d] dW^T
  block as a write-once pipelined output (contiguous [V_pad, d] — the
  layout ops/losses.py hands the tied embedding), and accumulates dhidden
  directly in a constant-index fp32 [n, d] output window (the window IS the
  accumulator; flushed once at the end). Three matmul passes — 4-pass floor
  total with the forward, zero dlogits traffic.

Ragged vocabs are zero-padded to a block multiple by the wrappers (one
[d, V] device copy per loss call — the loss runs once per step, not per
layer) and the kernels mask columns ≥ V.

VMEM: hidden (n·d bf16) + the fp32 dhidden window + tiles must fit ~100 MB,
so the wrappers row-split calls above ``max_rows`` (each split streams W
once more, ~0.4 ms — far cheaper than the XLA path's transients).

Reference role: the torch.compile'd gather_logprobs / entropy math
(reference: vocab_parallel.py:13-36,293-304).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lm_stats", "lm_stats_bwd", "default_max_rows"]


def default_max_rows(d: int) -> int:
    """Row cap per kernel call: the resident hidden (bf16, 2d B/row) plus
    the fp32 dhidden window (4d B/row) must fit an ~84 MB budget beside the
    w/dW tile buffers — 14336 rows at d=1024 (0.6B), 3584 at d=4096 (8B).
    Calls above the cap row-split (each split streams W once more)."""
    return max(512, (84 << 20) // (6 * d) // 512 * 512)


def _interpret_mode(interpret: bool):
    return pltpu.InterpretParams() if interpret else False


def _pad_w(w_lm, bv: int):
    V = w_lm.shape[1]
    V_pad = -(-V // bv) * bv
    if V_pad != V:
        w_lm = jnp.pad(w_lm, ((0, 0), (0, V_pad - V)))
    return w_lm, V_pad


def _row_block(n: int) -> int:
    for bn in (1024, 512, 256, 128):
        if n % bn == 0:
            return bn
    return n


# ------------------------------------------------------------------ forward


def _fwd_kernel(h_ref, w_ref, lse_ref, mx_ref, m_scr, se_scr, sx_scr, *,
                inv_temp: float, bv: int, bn: int, v_real: int,
                n_blocks: int):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        se_scr[...] = jnp.zeros_like(se_scr)
        sx_scr[...] = jnp.zeros_like(sx_scr)

    w = w_ref[...]
    ragged = v_real % bv != 0
    if ragged:
        col = c * bv + jax.lax.broadcasted_iota(jnp.int32, (bn, bv), 1)
        keep = col < v_real
    for ib in range(h_ref.shape[0] // bn):
        rows = pl.ds(ib * bn, bn)
        x = jax.lax.dot_general(
            h_ref[rows, :], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_temp  # [bn, bv]
        if ragged:
            x = jnp.where(keep, x, -jnp.inf)
        m_c = jnp.max(x, axis=1, keepdims=True)  # [bn, 1]
        m_prev = m_scr[rows, :]
        m_new = jnp.maximum(m_prev, m_c)
        r = jnp.exp(m_prev - m_new)  # 0 on the first block (m_prev = -inf)
        ex = jnp.exp(x - m_new)  # padded cols -> exp(-inf) = 0
        se_scr[rows, :] = (
            se_scr[rows, :] * r + jnp.sum(ex, axis=1, keepdims=True)
        )
        xs = jnp.where(jnp.isfinite(x), x, 0.0) if ragged else x
        sx_scr[rows, :] = (
            sx_scr[rows, :] * r + jnp.sum(ex * xs, axis=1, keepdims=True)
        )
        m_scr[rows, :] = m_new

    @pl.when(c == n_blocks - 1)
    def _emit():
        se = se_scr[...]
        lse_ref[...] = m_scr[...] + jnp.log(se)
        mx_ref[...] = sx_scr[...] / se


def _fwd_call(hidden, w_lm, inv_temp, bv, interpret):
    n, d = hidden.shape
    V = w_lm.shape[1]
    w_pad, V_pad = _pad_w(w_lm, bv)
    nb = V_pad // bv

    kernel = functools.partial(
        _fwd_kernel, inv_temp=inv_temp, bv=bv, bn=_row_block(n), v_real=V,
        n_blocks=nb,
    )
    lse, mx = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((n, d), lambda c: (0, 0)),
            pl.BlockSpec((d, bv), lambda c: (0, c)),
        ],
        out_specs=[
            pl.BlockSpec((n, 1), lambda c: (0, 0)),
            pl.BlockSpec((n, 1), lambda c: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 << 20,
        ),
        interpret=_interpret_mode(interpret),
        name="lm_stats_fwd",
    )(hidden, w_pad)
    return lse[:, 0], mx[:, 0]


# ------------------------------------------------------------------ backward


def _bwd_kernel(h_ref, w_ref, lse_ref, a_ref, b_ref, dwT_ref, dh_ref,
                dw_scr, *, inv_temp: float, bv: int, bn: int, v_real: int):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _init():
        dh_ref[...] = jnp.zeros_like(dh_ref)

    w = w_ref[...]
    ragged = v_real % bv != 0
    if ragged:
        col = c * bv + jax.lax.broadcasted_iota(jnp.int32, (bn, bv), 1)
        keep = col < v_real
    for ib in range(h_ref.shape[0] // bn):
        rows = pl.ds(ib * bn, bn)
        h = h_ref[rows, :]
        x = jax.lax.dot_general(
            h, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * inv_temp  # [bn, bv]
        p = jnp.exp(x - lse_ref[rows, :])
        if ragged:
            p = jnp.where(keep, p, 0.0)
        # dlogits_ij = p_ij·[a_i − b_i·x_ij]·inv_temp with a = g_lse +
        # g_ent·mean_x, b = g_ent (ops/losses.py _vc_bwd_rule math)
        dl = (p * (a_ref[rows, :] - b_ref[rows, :] * x) * inv_temp).astype(
            h_ref.dtype
        )
        dwc = jax.lax.dot_general(
            dl, h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bv, d]
        if ib == 0:
            dw_scr[...] = dwc
        else:
            dw_scr[...] += dwc
        # the constant-index fp32 output window IS the dhidden accumulator
        dh_ref[rows, :] += jax.lax.dot_general(
            dl, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # fp32 accumulation across row sub-blocks; the OUTPUT is w_lm's dtype so
    # the [V_pad, d] buffer costs half the HBM of a fp32 emit (a 1.2 GB fp32
    # dW^T per row-split OOM'd the 1.7B dense baseline beside params+grads)
    dwT_ref[...] = dw_scr[...].astype(dwT_ref.dtype)


def _bwd_call(hidden, w_lm, lse, a, b, inv_temp, bv, interpret):
    n, d = hidden.shape
    V = w_lm.shape[1]
    w_pad, V_pad = _pad_w(w_lm, bv)
    nb = V_pad // bv

    kernel = functools.partial(
        _bwd_kernel, inv_temp=inv_temp, bv=bv, bn=_row_block(n), v_real=V
    )
    dwT, dh = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((n, d), lambda c: (0, 0)),
            pl.BlockSpec((d, bv), lambda c: (0, c)),
            pl.BlockSpec((n, 1), lambda c: (0, 0)),
            pl.BlockSpec((n, 1), lambda c: (0, 0)),
            pl.BlockSpec((n, 1), lambda c: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bv, d), lambda c: (c, 0)),
            pl.BlockSpec((n, d), lambda c: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((V_pad, d), w_lm.dtype),
            jax.ShapeDtypeStruct((n, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bv, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 << 20,
        ),
        interpret=_interpret_mode(interpret),
        name="lm_stats_bwd",
    )(hidden, w_pad, lse.reshape(n, 1), a.reshape(n, 1), b.reshape(n, 1))
    return dh, dwT[:V]


def _row_splits(n: int, max_rows: int) -> list[tuple[int, int]]:
    parts = max(1, -(-n // max_rows))
    step = max(512, -(-(n // parts) // 512) * 512) if n > 512 else n
    out = []
    at = 0
    while at < n:
        take = min(step, n - at)
        out.append((at, take))
        at += take
    return out


def lm_stats(hidden, w_lm, inv_temp: float = 1.0, block_v: int = 512,
             interpret: bool = False, max_rows: int | None = None):
    """(lse [n], mean_x [n]) of softmax(logits), logits = hidden @ w_lm ·
    inv_temp in fp32. Entropy = lse − mean_x."""
    n = hidden.shape[0]
    if max_rows is None:
        max_rows = default_max_rows(hidden.shape[1])
    splits = _row_splits(n, max_rows)
    if len(splits) == 1:
        return _fwd_call(hidden, w_lm, float(inv_temp), block_v, interpret)
    outs = [
        _fwd_call(
            jax.lax.dynamic_slice_in_dim(hidden, at, take, 0), w_lm,
            float(inv_temp), block_v, interpret,
        )
        for at, take in splits
    ]
    return (jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]))


def lm_stats_bwd(hidden, w_lm, lse, mean_x, g_lse, g_ent,
                 inv_temp: float = 1.0, block_v: int = 512,
                 interpret: bool = False, max_rows: int | None = None):
    """Analytic backward for (lse, entropy) cotangents (g_lse, g_ent):
    returns (dhidden [n, d] in hidden.dtype, dWT [V, d] in w_lm.dtype —
    transpose of the [d, V] cotangent, contiguous for tied embeddings;
    fp32-accumulated in-kernel). dWT sums over row splits."""
    n, d = hidden.shape
    if max_rows is None:
        max_rows = default_max_rows(d)
    a = (g_lse + g_ent * mean_x).astype(jnp.float32)
    b = g_ent.astype(jnp.float32)
    dh_parts, dwT_total = [], None
    for at, take in _row_splits(n, max_rows):
        dh, dwT = _bwd_call(
            jax.lax.dynamic_slice_in_dim(hidden, at, take, 0), w_lm,
            jax.lax.dynamic_slice_in_dim(lse, at, take, 0),
            jax.lax.dynamic_slice_in_dim(a, at, take, 0),
            jax.lax.dynamic_slice_in_dim(b, at, take, 0),
            float(inv_temp), block_v, interpret,
        )
        dh_parts.append(dh.astype(hidden.dtype))
        dwT_total = dwT if dwT_total is None else dwT_total + dwT
    dh = dh_parts[0] if len(dh_parts) == 1 else jnp.concatenate(dh_parts)
    return dh, dwT_total
