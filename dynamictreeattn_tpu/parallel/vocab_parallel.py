"""Vocab-parallel log-prob / entropy over a sharded LM head.

The TPU-native counterpart of the reference's Megatron-style custom autograd
functions (reference: vocab_parallel.py:82-370). The logits stay sharded
[n, V/tp] on the "model" axis; four collectives per chunk reproduce the
reference's NCCL all_reduces (reference: vocab_parallel.py:263-298):

    pmax(row max) → psum(Σ exp) → psum(label logit) → psum(Σ softmax·logits)

Differences by design:
* runs inside `shard_map`; `jax.grad` through `psum`/`pmax` regenerates the
  reference's hand-written in-place backward (vocab_parallel.py:168-192,
  323-370) — with chunking + `jax.checkpoint`, logits are *recomputed* in the
  backward instead of saved, so peak memory is O(chunk·V/tp), strictly better
  than the reference's saved-softmax scheme;
* fused with the LM-head matmul (hidden @ W_shard), the full [n, V] logits
  never exist anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dynamictreeattn_tpu.parallel.collectives import const_pmax, mpar_out

__all__ = [
    "vp_position_stats",
    "vp_label_logits",
    "vp_tree_loss_from_hidden",
    "vp_tree_edge_logprobs",
    "vp_tree_loss_edges",
]


def _vp_chunk_stats(h_chunk, w_local, inv_temp, axis):
    logits = (
        jnp.dot(h_chunk, w_local, preferred_element_type=jnp.float32) * inv_temp
    )  # [C, V/tp] fp32
    m = const_pmax(jnp.max(logits, axis=-1), axis)  # [C]
    ex = jnp.exp(logits - m[:, None])
    se = mpar_out(jnp.sum(ex, axis=-1), axis)  # [C]
    lse = m + jnp.log(se)
    sx = mpar_out(jnp.sum(ex * logits, axis=-1), axis)  # [C] Σ exp·x
    entropy = lse - sx / se
    return lse, entropy


def _vp_rows_stats(hidden, w_local, temperature, chunk_size, axis):
    """Legacy row-chunked formulation (jax.checkpoint + lax.map): its
    autodiff drags a fp32 [d, V/tp] dW accumulator through every chunk step
    — kept as the cross-impl oracle (mode="rows")."""
    n, d = hidden.shape
    inv_temp = 1.0 / temperature
    c = chunk_size
    while n % c:
        c -= 1
    chunks = hidden.reshape(n // c, c, d)
    fn = jax.checkpoint(
        functools.partial(_vp_chunk_stats, w_local=w_local, inv_temp=inv_temp, axis=axis)
    )
    lse, entropy = jax.lax.map(fn, chunks)
    return lse.reshape(n), entropy.reshape(n)


def _vp_local_stats(hidden, w_local, inv_temp: float, impl: str):
    """Local-shard (lse, mean_x) via the engine-path implementations."""
    if impl in ("pallas", "pallas_interpret"):
        from dynamictreeattn_tpu.ops.lm_stats import lm_stats

        return lm_stats(
            hidden, w_local, inv_temp, interpret=impl == "pallas_interpret"
        )
    from dynamictreeattn_tpu.ops.losses import _vc_forward, _vocab_chunk_width

    vc = min(_vocab_chunk_width(w_local.shape[1], hidden.shape[0]),
             w_local.shape[1])
    lse, _, mean_x = _vc_forward(hidden, w_local, inv_temp, vc)
    return lse, mean_x


def _vp_merge(lse_l, mean_l, axis):
    """Global (lse, mean_x) from per-shard values: any local (lse, mean_x)
    pair is an exact online-softmax partial with stabilizer m := lse and
    unit Σexp, so the cross-shard merge needs no raw (m, Σeˣ, Σeˣ·x)."""
    m_g = const_pmax(lse_l, axis)
    w8 = jnp.exp(lse_l - m_g)
    se_g = mpar_out(w8, axis)
    sx_g = mpar_out(mean_l * w8, axis)
    return m_g + jnp.log(se_g), sx_g / se_g


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _vp_stats(hidden, w_local, inv_temp: float, axis: str, impl: str):
    lse, mean_x = _vp_merge(*_vp_local_stats(hidden, w_local, inv_temp, impl),
                            axis)
    return lse, lse - mean_x


def _vp_stats_fwd(hidden, w_local, inv_temp: float, axis: str, impl: str):
    lse, mean_x = _vp_merge(*_vp_local_stats(hidden, w_local, inv_temp, impl),
                            axis)
    return (lse, lse - mean_x), (hidden, w_local, lse, mean_x)


def _vp_stats_bwd(inv_temp: float, axis: str, impl: str, res, cts):
    """Shard-local analytic backward from the GLOBAL (lse, mean_x): each
    rank's dlogits block only needs its own W shard plus the global
    statistics, so there is no backward communication at all — dhidden is
    the rank-local contribution (the Megatron f operator upstream psums it,
    collectives.py mpar_in), dW is exact per shard."""
    hidden, w_local, lse, mean_x = res
    g_lse, g_ent = cts
    if impl in ("pallas", "pallas_interpret"):
        from dynamictreeattn_tpu.ops.lm_stats import lm_stats_bwd

        dh, dwT = lm_stats_bwd(
            hidden, w_local, lse, mean_x, g_lse, g_ent, inv_temp,
            interpret=impl == "pallas_interpret",
        )
        return dh, dwT.astype(w_local.dtype).T
    from dynamictreeattn_tpu.ops.losses import _vc_bwd_rule, _vocab_chunk_width

    vc = min(_vocab_chunk_width(w_local.shape[1], hidden.shape[0]),
             w_local.shape[1])
    return _vc_bwd_rule(inv_temp, vc, (hidden, w_local, lse, mean_x),
                        (g_lse, g_ent))


_vp_stats.defvjp(_vp_stats_fwd, _vp_stats_bwd)


def vp_position_stats(hidden, w_local, temperature, chunk_size, axis="model",
                      mode: str = "vocab"):
    """(lse [n], entropy [n]) with logits sharded on `axis`.

    mode="vocab" (default): the engine's vocab-chunked custom_vjp per shard
    (ops/losses.py) + a 3-collective merge of (lse, mean_x) — no [d, V/tp]
    backward carry, no backward communication. mode="pallas"/
    "pallas_interpret": the fused Pallas stats kernels per shard
    (ops/lm_stats.py). mode="rows": the legacy row-chunked formulation."""
    if mode == "rows":
        return _vp_rows_stats(hidden, w_local, temperature, chunk_size, axis)
    return _vp_stats(hidden, w_local, 1.0 / temperature, axis, mode)


def vp_label_logits(h_at_parent, tokens, w_local, temperature, axis="model"):
    """label_logit[j] = <h[parent[j]], W[:, token[j]]>/T with W vocab-sharded.

    Masked local gather + psum — the reference's mask-and-gather all_reduce
    (reference: vocab_parallel.py:145-156)."""
    v_local = w_local.shape[1]
    rank = jax.lax.axis_index(axis)
    off = rank * v_local
    in_range = (tokens >= off) & (tokens < off + v_local)
    local_tok = jnp.clip(tokens - off, 0, v_local - 1)
    w_cols = jnp.take(w_local.T, local_tok, axis=0)  # [n, d]
    ll = jnp.sum(
        h_at_parent.astype(jnp.float32) * w_cols.astype(jnp.float32), axis=-1
    ) / temperature
    return mpar_out(jnp.where(in_range, ll, 0.0), axis)


def vp_tree_edge_logprobs(
    hidden,
    w_local,
    tokens,
    parent,
    temperature: float = 1.0,
    chunk_size: int = 1024,
    axis: str = "model",
    mode: str = "vocab",
):
    """(lp_edge [n], entropy [n]) over a vocab-sharded LM head — the
    inference half of vp_tree_loss_from_hidden (RL behavior-logprob
    recompute, reference: tree_training_engine.py:516-553)."""
    lse, entropy = vp_position_stats(
        hidden, w_local, temperature, chunk_size, axis, mode
    )
    par = jnp.maximum(parent, 0)
    h_par = jnp.take(hidden, par, axis=0)
    label_logit = vp_label_logits(h_par, tokens, w_local, temperature, axis)
    lp_edge = label_logit - jnp.take(lse, par)
    lp_edge = jnp.where(parent >= 0, lp_edge, 0.0)
    return lp_edge, entropy


def vp_tree_loss_from_hidden(
    hidden,
    w_local,
    tokens,
    parent,
    w_logprob,
    w_entropy,
    temperature: float = 1.0,
    chunk_size: int = 1024,
    axis: str = "model",
    mode: str = "vocab",
):
    """Sharded-LM-head version of ops.losses.tree_loss_from_hidden.

    Returns (loss, aux); loss is identical on every `axis` rank."""
    lp_edge, entropy = vp_tree_edge_logprobs(
        hidden, w_local, tokens, parent, temperature, chunk_size, axis, mode
    )
    sum_lp = jnp.sum(w_logprob * lp_edge)
    sum_ent = jnp.sum(w_entropy * entropy)
    loss = sum_lp + sum_ent
    return loss, {"sum_logprob": sum_lp, "sum_entropy": sum_ent}


def vp_tree_edge_logprobs_sp(
    hidden_local,  # [n_loc, d] — this seq rank's hidden rows
    w_local,  # [d, V/tp]
    edge_parent,  # [E] int32 — LOCAL parent position of each owned edge
    edge_token,  # [E] int32 — global child token id
    edge_child,  # [E] int32 — GLOBAL child position (= n_global for padding
    #              slots: scatter drops out-of-bounds updates)
    n_global: int,
    temperature: float = 1.0,
    chunk_size: int = 1024,
    axis: str = "model",
    seq_axis: str = "seq",
    mode: str = "vocab",
):
    """(lp_edge [n_global], entropy [n_global]) under sequence parallelism —
    the per-edge (non-reduced) companion of vp_tree_loss_edges for custom
    per-sequence losses: each seq rank evaluates the edges whose parent it
    owns (parent-side activations only), scatters them to the child's global
    position, and a psum over `seq_axis` assembles the full replicated
    vector; entropies ride an all_gather of the rank-contiguous rows.
    Autodiff routes each edge's cotangent back to the owning rank through
    the psum/scatter transpose."""
    lse, ent_loc = vp_position_stats(
        hidden_local, w_local, temperature, chunk_size, axis, mode
    )
    h_par = jnp.take(hidden_local, edge_parent, axis=0)  # [E, d]
    label_logit = vp_label_logits(h_par, edge_token, w_local, temperature, axis)
    lp_own = label_logit - jnp.take(lse, edge_parent)
    lp_edge = jnp.zeros((n_global,), jnp.float32).at[edge_child].add(lp_own)
    lp_edge = jax.lax.psum(lp_edge, seq_axis)
    entropy = jax.lax.all_gather(ent_loc, seq_axis, axis=0, tiled=True)
    return lp_edge, entropy


def vp_tree_loss_edges(
    hidden_local,  # [n_loc, d] — this seq rank's hidden rows
    w_local,  # [d, V/tp]
    edge_parent,  # [E] int32 — LOCAL parent position of each owned edge
    edge_token,  # [E] int32 — global child token id
    edge_w,  # [E] f32 — edge logprob weight (0 = padding slot)
    w_entropy_local,  # [n_loc] f32
    temperature: float = 1.0,
    chunk_size: int = 1024,
    axis: str = "model",
    mode: str = "vocab",
):
    """Sequence-parallel (parent-owned) edge formulation of the trie loss.

    Under sequence parallelism the child position of an edge can live on a
    different seq rank than its parent, but the edge logprob
    ``logit[parent, token[child]] − lse[parent]`` only reads PARENT-side
    activations — the child contributes just its (replicated, host-known)
    token id. So each seq rank sums the edges whose parent it owns, from
    host-precomputed (parent_local, token, weight) triples, and the shard
    partial losses psum over "seq" in the train step. No cross-shard hidden
    gather ever happens. (The reference's counterpart is the prefix-grad
    accumulation across its KV stack, reference:
    tree_training_engine.py:443-465 — here it's an indexing scheme.)"""
    lse, entropy = vp_position_stats(
        hidden_local, w_local, temperature, chunk_size, axis, mode
    )
    h_par = jnp.take(hidden_local, edge_parent, axis=0)  # [E, d]
    label_logit = vp_label_logits(h_par, edge_token, w_local, temperature, axis)
    lp_edge = label_logit - jnp.take(lse, edge_parent)
    sum_lp = jnp.sum(edge_w * lp_edge)
    sum_ent = jnp.sum(w_entropy_local * entropy)
    loss = sum_lp + sum_ent
    return loss, {"sum_logprob": sum_lp, "sum_entropy": sum_ent}
