"""Fused q/k/v attention-input prep: per-head RMSNorm + RoPE + transpose.

TPU-native replacement for the per-layer elementwise chain the reference
gets from torch/CUDA fused ops (reference: run.py:129-132 relies on
FlashAttention-3 + torch fused elementwise; the HF model applies q/k norm
and rotary embedding as separate CUDA kernels). In the JAX model the same
chain (`rms_norm` on q/k heads → `apply_rope` → transpose to [heads, n, dh])
lowers to a dozen XLA fusions per layer running at 200–500 GB/s with fp32
layout shuffles between them — the ~13%-of-step "elementwise backward"
bucket in docs/PERF.md.

This module fuses the whole chain into two Pallas kernels (q; k+v) with an
analytic custom_vjp backward (two more), one HBM round-trip each way:

* forward:  x = proj[n, H·dh] → fp32 → (RMSNorm_head · w) → rope(cos, sin)
            → emit bf16 [H, n, dh] (the exact layout tree_attention wants,
            so the XLA transpose copies disappear too); v is a pure
            transpose fused into the k kernel.
* backward: g [H, n, dh] → rope^T (cos, −sin) → RMSNorm vjp
            dx = r·(du − u·mean(du·u)) → emit [n, H·dh]; the norm-weight
            grads accumulate across the whole grid in a resident block.

Grid layout: one step per row block with the head loop unrolled inside the
kernel (lane slices at dh boundaries) — ~n/bn grid steps of ~MB-sized
blocks rather than (n/bn)·H steps of 128 KB blocks, which measured ~40%
faster on v5e.

Numerics: fp32 throughout the kernel (the unfused path rounds the normed
q/k to bf16 before rope; here u stays fp32 until the final emit — a ≤1-ulp
difference covered by the parity tests)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["qkv_prep"]


def _interpret_mode(interpret: bool):
    return pltpu.InterpretParams() if interpret else False


def _row_block(n: int, width_bytes: int) -> int:
    """Largest row block dividing n with in+out blocks ≲ 4 MB total."""
    cap = max(8, (4 * 1024 * 1024) // max(width_bytes, 1))
    for bn in (512, 256, 128, 64, 32, 16, 8):
        if bn <= cap and n % bn == 0:
            return bn
    return n


def _rot(x):
    """rotate_half, HF layout: [x1, x2] -> [-x2, x1] (lane split)."""
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _norm_rope_fwd(x, w, cos, sin, eps, use_norm):
    if use_norm:
        r = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        x = x * r * w
    return x * cos + _rot(x) * sin


def _norm_rope_bwd(g, x, w, cos, sin, eps, use_norm):
    """(dx, dw_partial | None): vjp of _norm_rope_fwd for one head block."""
    gp = g * cos - _rot(g) * sin  # rope^T (rot is antisymmetric)
    if not use_norm:
        return gp, None
    dh_ = x.shape[-1]
    r = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    u = x * r
    dw = jnp.sum(gp * u, axis=0)
    du = gp * w
    dx = r * (du - u * (jnp.sum(du * u, axis=-1, keepdims=True) / dh_))
    return dx, dw


def _fwd_kernel(x_ref, w_ref, cos_ref, sin_ref, o_ref, *, dh, eps, use_norm):
    H = o_ref.shape[0]
    cos = cos_ref[...].astype(jnp.float32)
    sin = sin_ref[...].astype(jnp.float32)
    w = w_ref[0].astype(jnp.float32) if use_norm else None
    for h in range(H):
        x = x_ref[:, h * dh:(h + 1) * dh].astype(jnp.float32)
        o_ref[h] = _norm_rope_fwd(x, w, cos, sin, eps, use_norm).astype(
            o_ref.dtype
        )


def _kv_fwd_kernel(k_ref, v_ref, w_ref, cos_ref, sin_ref, ko_ref, vo_ref, *,
                   dh, eps, use_norm):
    _fwd_kernel(k_ref, w_ref, cos_ref, sin_ref, ko_ref, dh=dh, eps=eps,
                use_norm=use_norm)
    H = vo_ref.shape[0]
    for h in range(H):
        vo_ref[h] = v_ref[:, h * dh:(h + 1) * dh]


def _bwd_kernel(g_ref, x_ref, w_ref, cos_ref, sin_ref, dx_ref, dw_ref, *,
                dh, eps, use_norm):
    H = g_ref.shape[0]
    cos = cos_ref[...].astype(jnp.float32)
    sin = sin_ref[...].astype(jnp.float32)
    w = w_ref[0].astype(jnp.float32) if use_norm else None
    if dw_ref is not None:
        @pl.when(pl.program_id(0) == 0)
        def _init():
            dw_ref[...] = jnp.zeros_like(dw_ref)
    for h in range(H):
        g = g_ref[h].astype(jnp.float32)
        x = (
            x_ref[:, h * dh:(h + 1) * dh].astype(jnp.float32)
            if use_norm else None
        )
        dx, dw = _norm_rope_bwd(g, x, w, cos, sin, eps, use_norm)
        dx_ref[:, h * dh:(h + 1) * dh] = dx.astype(dx_ref.dtype)
        if dw_ref is not None:
            dw_ref[0] += dw


def _kv_bwd_kernel(gk_ref, gv_ref, k_ref, w_ref, cos_ref, sin_ref,
                   dk_ref, dv_ref, dw_ref, *, dh, eps, use_norm):
    _bwd_kernel(gk_ref, k_ref, w_ref, cos_ref, sin_ref, dk_ref, dw_ref,
                dh=dh, eps=eps, use_norm=use_norm)
    H = gv_ref.shape[0]
    for h in range(H):
        dv_ref[:, h * dh:(h + 1) * dh] = gv_ref[h]


def _fwd_q(q, w, cos, sin, eps, use_norm, interpret):
    n, hdh = q.shape
    dh = cos.shape[-1]
    H = hdh // dh
    bn = _row_block(n, 2 * hdh * q.dtype.itemsize)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, dh=dh, eps=eps, use_norm=use_norm),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, hdh), lambda i: (i, 0)),
            pl.BlockSpec((1, dh), lambda i: (0, 0)),
            pl.BlockSpec((bn, dh), lambda i: (i, 0)),
            pl.BlockSpec((bn, dh), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((H, bn, dh), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((H, n, dh), q.dtype),
        interpret=_interpret_mode(interpret),
        name="qk_prep_fwd_q",
    )(q, w.reshape(1, dh), cos, sin)
    return out


def _fwd_kv(k, v, w, cos, sin, eps, use_norm, interpret):
    n, hdh = k.shape
    dh = cos.shape[-1]
    H = hdh // dh
    bn = _row_block(n, 4 * hdh * k.dtype.itemsize)
    ko, vo = pl.pallas_call(
        functools.partial(_kv_fwd_kernel, dh=dh, eps=eps, use_norm=use_norm),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, hdh), lambda i: (i, 0)),
            pl.BlockSpec((bn, hdh), lambda i: (i, 0)),
            pl.BlockSpec((1, dh), lambda i: (0, 0)),
            pl.BlockSpec((bn, dh), lambda i: (i, 0)),
            pl.BlockSpec((bn, dh), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((H, bn, dh), lambda i: (0, i, 0)),
            pl.BlockSpec((H, bn, dh), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, n, dh), k.dtype),
            jax.ShapeDtypeStruct((H, n, dh), v.dtype),
        ],
        interpret=_interpret_mode(interpret),
        name="qk_prep_fwd_kv",
    )(k, v, w.reshape(1, dh), cos, sin)
    return ko, vo


def _bwd_q(gq, q, w, cos, sin, eps, use_norm, interpret):
    n, hdh = q.shape
    dh = cos.shape[-1]
    H = hdh // dh
    bn = _row_block(n, 3 * hdh * q.dtype.itemsize)
    out_specs = [pl.BlockSpec((bn, hdh), lambda i: (i, 0))]
    out_shape = [jax.ShapeDtypeStruct((n, hdh), q.dtype)]
    if use_norm:
        out_specs.append(pl.BlockSpec((1, dh), lambda i: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((1, dh), jnp.float32))

    def kernel(g_ref, x_ref, w_ref, cos_ref, sin_ref, dx_ref, *dw):
        _bwd_kernel(g_ref, x_ref, w_ref, cos_ref, sin_ref, dx_ref,
                    dw[0] if dw else None, dh=dh, eps=eps, use_norm=use_norm)

    res = pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((H, bn, dh), lambda i: (0, i, 0)),
            pl.BlockSpec((bn, hdh), lambda i: (i, 0)),
            pl.BlockSpec((1, dh), lambda i: (0, 0)),
            pl.BlockSpec((bn, dh), lambda i: (i, 0)),
            pl.BlockSpec((bn, dh), lambda i: (i, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret_mode(interpret),
        name="qk_prep_bwd_q",
    )(gq, q, w.reshape(1, dh), cos, sin)
    if use_norm:
        return res[0], res[1].reshape(dh)
    return res[0], None


def _bwd_kv(gk, gv, k, w, cos, sin, eps, use_norm, interpret):
    n, hdh = k.shape
    dh = cos.shape[-1]
    H = hdh // dh
    bn = _row_block(n, 5 * hdh * k.dtype.itemsize)
    out_specs = [
        pl.BlockSpec((bn, hdh), lambda i: (i, 0)),
        pl.BlockSpec((bn, hdh), lambda i: (i, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, hdh), k.dtype),
        jax.ShapeDtypeStruct((n, hdh), k.dtype),
    ]
    if use_norm:
        out_specs.append(pl.BlockSpec((1, dh), lambda i: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((1, dh), jnp.float32))

    def kernel(gk_ref, gv_ref, k_ref, w_ref, cos_ref, sin_ref,
               dk_ref, dv_ref, *dw):
        _kv_bwd_kernel(gk_ref, gv_ref, k_ref, w_ref, cos_ref, sin_ref,
                       dk_ref, dv_ref, dw[0] if dw else None,
                       dh=dh, eps=eps, use_norm=use_norm)

    res = pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((H, bn, dh), lambda i: (0, i, 0)),
            pl.BlockSpec((H, bn, dh), lambda i: (0, i, 0)),
            pl.BlockSpec((bn, hdh), lambda i: (i, 0)),
            pl.BlockSpec((1, dh), lambda i: (0, 0)),
            pl.BlockSpec((bn, dh), lambda i: (i, 0)),
            pl.BlockSpec((bn, dh), lambda i: (i, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret_mode(interpret),
        name="qk_prep_bwd_kv",
    )(gk, gv, k, w.reshape(1, dh), cos, sin)
    if use_norm:
        return res[0], res[1], res[2].reshape(dh)
    return res[0], res[1], None


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def qkv_prep(q, k, v, qw, kw, cos, sin, eps: float, use_norm: bool,
             interpret: bool = False):
    """(q[n,hq·dh], k[n,hkv·dh], v[n,hkv·dh]) → ([hq,n,dh], [hkv,n,dh] ×2).

    Fused per-head RMSNorm (weight qw/kw [dh]) + rotary embedding +
    head-major transpose; v transposes only. With use_norm=False (Qwen2.5 /
    Llama-3 families) qw/kw are ignored (pass any [dh] array)."""
    qo = _fwd_q(q, qw, cos, sin, eps, use_norm, interpret)
    ko, vo = _fwd_kv(k, v, kw, cos, sin, eps, use_norm, interpret)
    return qo, ko, vo


def _qkv_fwd_rule(q, k, v, qw, kw, cos, sin, eps, use_norm, interpret):
    out = qkv_prep(q, k, v, qw, kw, cos, sin, eps, use_norm, interpret)
    return out, (q, k, qw, kw, cos, sin)


def _qkv_bwd_rule(eps, use_norm, interpret, res, cts):
    q, k, qw, kw, cos, sin = res
    gq, gk, gv = cts
    dq, dqw = _bwd_q(gq, q, qw, cos, sin, eps, use_norm, interpret)
    dk, dv, dkw = _bwd_kv(gk, gv, k, kw, cos, sin, eps, use_norm, interpret)
    zq = jnp.zeros_like(qw) if dqw is None else dqw.astype(qw.dtype)
    zk = jnp.zeros_like(kw) if dkw is None else dkw.astype(kw.dtype)
    # cos/sin derive from integer positions — no grad ever flows; the zeros
    # are dead code XLA eliminates
    return dq, dk, dv, zq, zk, jnp.zeros_like(cos), jnp.zeros_like(sin)


qkv_prep.defvjp(_qkv_fwd_rule, _qkv_bwd_rule)
