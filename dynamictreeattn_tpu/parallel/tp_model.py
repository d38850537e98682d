"""Explicit tensor-parallel Qwen3 forward (runs inside shard_map).

Megatron-style partitioning over the "model" mesh axis (the sharding the
reference leaves to its host framework, reference: vocab_parallel.py:406-414):

* embedding: vocab-sharded rows, masked local gather + psum;
* attention: heads sharded (GQA co-located: q-head groups live with their kv
  head — zero comms during attention); o_proj row-sharded → psum;
* MLP: gate/up column-sharded, down row-sharded → psum;
* norms replicated (fp32 math).

Two psums per layer + one for the embedding — all riding ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dynamictreeattn_tpu.parallel.collectives import mpar_in, mpar_out
from dynamictreeattn_tpu.models.qwen3 import (
    Qwen3Config,
    apply_rope,
    rms_norm,
    rope_tables,
)

__all__ = ["forward_hidden_tp", "tp_param_shard_info", "mpar_in", "mpar_out"]


def tp_param_shard_info(config: Qwen3Config, tp: int) -> dict:
    """Sanity info: which dims shard; raises if the config can't shard tp-ways."""
    c = config
    if c.num_key_value_heads % tp:
        raise ValueError(f"kv heads {c.num_key_value_heads} not divisible by {tp=}")
    if c.vocab_size % tp:
        raise ValueError("vocab not divisible by tp")
    info = {
        "local_q_heads": c.num_attention_heads // tp,
        "local_kv_heads": c.num_key_value_heads // tp,
        "local_vocab": c.vocab_size // tp,
    }
    if c.is_moe:
        # expert parallelism rides the "model" axis: experts shard E/tp-ways
        if c.num_experts % tp:
            raise ValueError(f"experts {c.num_experts} not divisible by {tp=}")
        info["local_experts"] = c.num_experts // tp
    else:
        if c.intermediate_size % tp:
            raise ValueError("intermediate not divisible by tp")
        info["local_intermediate"] = c.intermediate_size // tp
    return info


def _embed_vp(embed_local, tokens, axis):
    v_local = embed_local.shape[0]
    off = jax.lax.axis_index(axis) * v_local
    in_range = (tokens >= off) & (tokens < off + v_local)
    local_tok = jnp.clip(tokens - off, 0, v_local - 1)
    x = jnp.take(embed_local, local_tok, axis=0)
    x = jnp.where(in_range[:, None], x, 0)
    return mpar_out(x, axis)


def _layer_tp(
    x, lp, cos, sin, config: Qwen3Config, attn_fn, tp: int, axis: str,
    sp: int = 1, seq_axis: str = "seq", ep: int = 1, ep_axis: str = "data",
    sp_mode: str = "ulysses", valid=None, fused_qk: bool = False,
):
    c = config
    n = x.shape[0]
    dh = c.head_dim
    hq_l = c.num_attention_heads // tp
    hkv_l = c.num_key_value_heads // tp
    grp = hq_l // hkv_l
    eps = c.rms_norm_eps

    h = mpar_in(rms_norm(x, lp["ln1"], eps), axis)
    q = h @ lp["wq"]
    k = h @ lp["wk"]
    v = h @ lp["wv"]
    if c.attention_bias:
        q = q + lp["bq"]
        k = k + lp["bk"]
        v = v + lp["bv"]
    if fused_qk and not (sp > 1 and sp_mode == "ulysses"):
        # fused per-head norm+rope+head-major transpose (ops/qk_prep.py) on
        # this rank's LOCAL heads — same kernels as the single-chip engine;
        # q_norm/k_norm grads stay per-rank partial (psum("model") in the
        # train step, unchanged). The Ulysses path keeps the unfused chain
        # (its all-to-all wants the [n, h, d] layout).
        from dynamictreeattn_tpu.ops.qk_prep import qkv_prep

        qw = lp["q_norm"] if c.use_qk_norm else jnp.ones((dh,), x.dtype)
        kw = lp["k_norm"] if c.use_qk_norm else jnp.ones((dh,), x.dtype)
        qt, kt, vt = qkv_prep(q, k, v, qw, kw, cos, sin, eps, c.use_qk_norm)
        o = attn_fn(qt, kt, vt)
        o = o.transpose(1, 0, 2).reshape(n, hq_l * dh)
        x = x + mpar_out(o @ lp["wo"], axis)
        return _layer_tp_mlp(x, lp, c, tp, axis, sp, seq_axis, ep, ep_axis,
                             valid)
    q = q.reshape(n, hq_l, dh)
    k = k.reshape(n, hkv_l, dh)
    v = v.reshape(n, hkv_l, dh)
    if c.use_qk_norm:
        q = rms_norm(q, lp["q_norm"], eps)
        k = rms_norm(k, lp["k_norm"], eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if sp > 1 and sp_mode == "ulysses":
        # Ulysses: all-to-all trades the seq shard for a kv-head shard, so the
        # tree-attention kernel sees the FULL packed sequence (global
        # positions, same block metadata on every seq rank) on hkv_l/sp kv
        # heads. GQA q-head groups ride with their kv head (split on the
        # hkv axis), keeping attention comm-free across "model" AND exact.
        q = q.reshape(n, hkv_l, grp, dh)
        q = jax.lax.all_to_all(q, seq_axis, split_axis=1, concat_axis=0, tiled=True)
        k = jax.lax.all_to_all(k, seq_axis, split_axis=1, concat_axis=0, tiled=True)
        v = jax.lax.all_to_all(v, seq_axis, split_axis=1, concat_axis=0, tiled=True)
        n_full = n * sp
        o = attn_fn(
            q.reshape(n_full, (hkv_l // sp) * grp, dh).transpose(1, 0, 2),
            k.transpose(1, 0, 2),
            v.transpose(1, 0, 2),
        )
        o = o.transpose(1, 0, 2).reshape(n_full, hkv_l // sp, grp, dh)
        o = jax.lax.all_to_all(o, seq_axis, split_axis=0, concat_axis=1, tiled=True)
        o = o.reshape(n, hq_l * dh)
    else:
        # sp == 1, or ring sequence parallelism: either way attn_fn consumes
        # this rank's local rows with all local heads (the ring rotation — if
        # any — lives inside attn_fn, ops/tree_attention_ring.py)
        o = attn_fn(q.transpose(1, 0, 2), k.transpose(1, 0, 2), v.transpose(1, 0, 2))
        o = o.transpose(1, 0, 2).reshape(n, hq_l * dh)
    x = x + mpar_out(o @ lp["wo"], axis)
    return _layer_tp_mlp(x, lp, c, tp, axis, sp, seq_axis, ep, ep_axis, valid)


def _layer_tp_mlp(x, lp, c, tp, axis, sp, seq_axis, ep, ep_axis, valid):
    eps = c.rms_norm_eps
    h_norm = rms_norm(x, lp["ln2"], eps)
    if c.is_moe:
        # under sequence parallelism every seq rank routes a slice of the
        # SAME packed trie: pool the load-balance statistics over "seq"
        # (moe_route stat_axes) and emit lb/sp per rank so the loss-level
        # psum("seq") reconstructs exactly the unsharded global lb term
        stat_axes = (seq_axis,) if sp > 1 else ()
        if ep > 1:
            x, lb = _moe_block_ep_a2a(
                x, h_norm, lp, c, tp, axis, ep, ep_axis, valid,
                stat_axes=stat_axes,
            )
        else:
            x, lb = _moe_block_ep(x, h_norm, lp, c, tp, axis, valid,
                                  stat_axes=stat_axes)
        if sp > 1:
            lb = lb / sp
        return x, lb
    h = mpar_in(h_norm, axis)
    act = jax.nn.silu((h @ lp["gate"]).astype(jnp.float32)).astype(h.dtype)
    x = x + mpar_out((act * (h @ lp["up"])) @ lp["down"], axis)
    return x, jnp.float32(0)


def _moe_block_ep(x, h_norm, lp, c: Qwen3Config, tp: int, axis: str,
                  valid=None, stat_axes=()):
    """Expert-parallel MoE over the "model" axis (replicated activations).

    Routing (router matmul, softmax, top-k, load-balance loss) is computed
    redundantly-replicated on every rank — the router weight is tiny and
    this avoids any routing collective. Each rank dispatches only the
    (token, choice) pairs whose expert it owns and the partial outputs psum
    (`mpar_out`). Autodiff bookkeeping: the combine weights `w` pass through
    `mpar_in` because each rank's w-cotangent covers only its own experts'
    combine path — the psum restores the full router gradient; the lb path
    is redundant-replicated and therefore already full."""
    import math

    from dynamictreeattn_tpu.models.qwen3 import moe_apply, moe_route

    n = h_norm.shape[0]
    E, k = c.num_experts, c.num_experts_per_tok
    e_local = E // tp
    w, idx, lb = moe_route(h_norm, lp["router"], c, valid, stat_axes)
    cap = int(math.ceil(c.moe_capacity_factor * n * k / E))
    e_off = jax.lax.axis_index(axis) * e_local
    y_partial = moe_apply(
        mpar_in(h_norm, axis),
        lp["e_gate"], lp["e_up"], lp["e_down"],
        idx - e_off, mpar_in(w, axis), cap,
    )
    return x + mpar_out(y_partial, axis).astype(x.dtype), lb


def _moe_block_ep_a2a(x, h_norm, lp, c: Qwen3Config, tp: int, axis: str,
                      ep: int, ep_axis: str, valid=None, stat_axes=()):
    """Expert parallelism over the `ep_axis` ("data") via token all-to-all,
    composed with expert sharding over `axis` ("model"): expert e lives on
    (data rank e // (E/ep), model rank (e % (E/ep)) // (E/(ep·tp))).

    DeepSpeed-MoE/GShard-style dispatch for E ≫ tp: each rank routes its own
    tokens (router replicated over "model"), packs the (token, choice) pairs
    destined to each data rank into a static [ep, C, d] buffer (GShard
    capacity drop past C), all-to-alls tokens + local-expert ids over
    `ep_axis`, runs the batched expert GEMMs on the received set (further
    sharded over "model" exactly like _moe_block_ep), all-to-alls the outputs
    back, and combines with the locally-kept routing weights. `jax.grad`
    transposes the all-to-alls into the reverse exchanges — no hand-written
    backward. Expert-weight grads are rank-exact (each expert has one owner;
    the train step skips the "data" grad psum for expert leaves)."""
    import math

    from dynamictreeattn_tpu.models.qwen3 import moe_apply, moe_route

    n, d = h_norm.shape
    E, k = c.num_experts, c.num_experts_per_tok
    nk = n * k
    e_owned = E // ep  # experts per data rank
    e_local = e_owned // tp  # ... per (data, model) rank
    # --- routing: rank-local tokens, replicated over "model" (masked idx for
    # padding rows is E — dest computes to ep and the pair is never packed)
    w, idx, lb = moe_route(h_norm, lp["router"], c, valid, stat_axes)

    # --- dispatch: pack pairs by destination data rank (stable sort → the
    # within-source order is preserved, so drops are deterministic)
    C = int(math.ceil(c.moe_capacity_factor * nk / ep))
    flat_e = idx.reshape(-1)  # [nk] global expert ids
    flat_w = w.reshape(-1)
    dest = flat_e // e_owned
    order = jnp.argsort(dest, stable=True)
    sorted_dest = jnp.take(dest, order)
    starts = jnp.searchsorted(sorted_dest, jnp.arange(ep))
    rank_in = jnp.arange(nk) - jnp.take(
        starts, jnp.clip(sorted_dest, 0, ep - 1)
    )
    keep = (rank_in < C) & (sorted_dest < ep)
    slot = jnp.where(keep, sorted_dest * C + rank_in, ep * C)  # last = trash
    tok = order // k
    xs = jnp.take(h_norm, tok, axis=0)  # [nk, d]
    send_x = (
        jnp.zeros((ep * C + 1, d), h_norm.dtype)
        .at[slot]
        .add(xs * keep[:, None].astype(h_norm.dtype))
    )[:-1].reshape(ep, C, d)
    local_e = jnp.take(flat_e, order) - sorted_dest * e_owned
    send_e = (
        jnp.full((ep * C + 1,), -1, jnp.int32)
        .at[slot]
        .set(jnp.where(keep, local_e, -1).astype(jnp.int32))
    )[:-1].reshape(ep, C)

    recv_x = jax.lax.all_to_all(send_x, ep_axis, split_axis=0, concat_axis=0)
    recv_e = jax.lax.all_to_all(send_e, ep_axis, split_axis=0, concat_axis=0)

    # --- expert compute on the received set, sharded over "model"
    h_recv = recv_x.reshape(ep * C, d)
    e_recv = recv_e.reshape(ep * C)
    m_off = jax.lax.axis_index(axis) * e_local
    cap_local = int(math.ceil(c.moe_capacity_factor * ep * nk / E))
    y_part = moe_apply(
        mpar_in(h_recv, axis),
        lp["e_gate"], lp["e_up"], lp["e_down"],
        (e_recv - m_off)[:, None],  # off-rank / padding(-1) entries skipped
        jnp.ones((ep * C, 1), jnp.float32),  # combine weights applied at source
        cap_local,
    )
    y_full = mpar_out(y_part, axis)  # [ep·C, d], psum over "model"

    # --- return + combine at source with the locally-kept weights
    y_back = jax.lax.all_to_all(
        y_full.reshape(ep, C, d), ep_axis, split_axis=0, concat_axis=0
    ).reshape(ep * C, d)
    ys = jnp.take(y_back, jnp.minimum(slot, ep * C - 1), axis=0)
    val = ys.astype(jnp.float32) * (keep * jnp.take(flat_w, order))[:, None]
    out = jnp.zeros((n, d), jnp.float32).at[tok].add(val)
    return x + out.astype(x.dtype), lb


def forward_hidden_tp(
    params_local: dict,
    config: Qwen3Config,
    tokens: jnp.ndarray,
    positions: jnp.ndarray,
    attn_fn,
    tp: int,
    axis: str = "model",
    remat: bool = False,
    remat_policy: str | None = None,
    remat_segments: int = 0,
    unshard_fn=None,
    sp: int = 1,
    seq_axis: str = "seq",
    ep: int = 1,
    ep_axis: str = "data",
    sp_mode: str = "ulysses",
    valid=None,
    fused_qk: bool = False,
):
    """Like models.qwen3.forward_hidden_aux but on tp-sharded local params.
    Returns (hidden, aux) with aux["lb_loss"] the summed router
    load-balance loss (0 for dense configs).

    `attn_fn` receives LOCAL head shards [hq/tp, n, dh]. `unshard_fn`, if
    given, maps one layer's param pytree to its full (tp-local) form at the
    top of the scan body — the FSDP per-layer all-gather; placing it inside
    the `jax.checkpoint`-wrapped body means the gathered weights are
    re-gathered (not saved) in the backward, ZeRO-3 style.

    With `sp > 1`, `tokens`/`positions` are this seq rank's LOCAL slice of
    the packed trie; attention internally all-to-alls to full-sequence /
    sharded-kv-head form (Ulysses), and `attn_fn` receives full-length
    arrays with hq/(tp·sp) heads."""
    c = config
    x = _embed_vp(params_local["embed"], tokens, axis)
    x = x.astype(params_local["layers"]["wq"].dtype)
    cos, sin = rope_tables(positions, c.head_dim, c.rope_theta,
                           c.rope_scaling_tuple)

    body = functools.partial(
        _layer_tp, config=c, attn_fn=attn_fn, tp=tp, axis=axis, sp=sp,
        fused_qk=fused_qk,
        seq_axis=seq_axis, ep=ep, ep_axis=ep_axis, sp_mode=sp_mode,
        valid=valid,
    )

    def scan_fn(carry, lp):
        if unshard_fn is not None:
            lp = unshard_fn(lp)
        x, lb = carry
        x, lb_i = body(x, lp, cos, sin)
        return (x, lb + lb_i), None

    carry = (x, jnp.float32(0))
    if remat and remat_segments:
        from dynamictreeattn_tpu.models.qwen3 import _remat_policy

        L = c.num_hidden_layers
        G = remat_segments
        assert L % G == 0
        seg_params = jax.tree.map(
            lambda a: a.reshape(G, L // G, *a.shape[1:]), params_local["layers"]
        )
        inner = jax.checkpoint(
            scan_fn, prevent_cse=False, policy=_remat_policy(remat_policy)
        )

        def seg_fn(carry, sp):
            out, _ = jax.lax.scan(inner, carry, sp)
            return out, None

        (x, lb), _ = jax.lax.scan(
            jax.checkpoint(seg_fn, prevent_cse=False), carry, seg_params
        )
    elif remat:
        from dynamictreeattn_tpu.models.qwen3 import _remat_policy

        scan_fn = jax.checkpoint(
            scan_fn, prevent_cse=False, policy=_remat_policy(remat_policy)
        )
        (x, lb), _ = jax.lax.scan(scan_fn, carry, params_local["layers"])
    else:
        (x, lb), _ = jax.lax.scan(scan_fn, carry, params_local["layers"])
    # final mpar_in: the vocab-parallel loss produces per-rank partial hidden
    # cotangents (its vocab shard only)
    hidden = mpar_in(
        rms_norm(x, params_local["final_norm"], c.rms_norm_eps), axis
    )
    return hidden, {"lb_loss": lb}
