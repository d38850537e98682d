"""Fused log-prob / entropy losses over the packed trie layout.

Replaces the reference's logprob/entropy machinery (reference:
vocab_parallel.py:13-79 single-device math, :39-79 chunking) the TPU way:

* statistics (logsumexp, entropy) are computed in fp32 from logits formed
  **chunk-by-chunk** from hidden states and the LM head inside a
  `jax.checkpoint`-ed `lax.map` — the [n, V] logits matrix is never
  materialized, mirroring the memory role of the reference's
  ``chunk_size=1024`` `_chunked_apply` and its in-place backward
  (reference: vocab_parallel.py:39-79,168-192);
* per-edge label log-probs need only the label *column* of the LM head:
  ``lp[j] = <h[parent[j]], W[:, token[j]]>/T − lse[parent[j]]`` — an O(n·d)
  gather instead of an O(n·V) slice. Trie fork positions fall out for free:
  several edges may share one parent (the reference instead stored full-vocab
  logits at fork positions, reference: tree_training_engine.py:92-96,217-220).

Entropy identity: H[p] = logZ[p] − E_softmax[x] (reference:
vocab_parallel.py:293-304). Temperature divides logits before everything.

The trie training loss is the weighted sum over packed positions
(weights from tries/flatten.py — per-sequence means folded in):

    loss = Σ_j w_logprob[j]·lp[j] + Σ_p w_entropy[p]·H[p]

which equals the reference's Σ_seq w_lp·mean(logprobs[:L−1]) +
w_ent·mean(entropy[:L]) (reference: run.py:149-152).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "logprob_entropy_from_hidden",
    "tree_loss_from_hidden",
    "position_stats_from_hidden",
]


def _chunk_stats(h_chunk: jnp.ndarray, w_lm: jnp.ndarray, inv_temp: float):
    """(lse, entropy) of softmax(h @ W · inv_temp) for one row chunk, fp32."""
    logits = (
        jnp.dot(h_chunk, w_lm, preferred_element_type=jnp.float32) * inv_temp
    )  # [C, V] fp32
    m = jnp.max(logits, axis=-1, keepdims=True)
    ex = jnp.exp(logits - m)
    se = jnp.sum(ex, axis=-1, keepdims=True)
    lse = (m + jnp.log(se))[..., 0]
    mean_x = jnp.sum(ex * logits, axis=-1) / se[..., 0]
    entropy = lse - mean_x
    return lse, entropy


def position_stats_from_hidden(
    hidden: jnp.ndarray,  # [n, d]
    w_lm: jnp.ndarray,  # [d, V]
    temperature: float = 1.0,
    chunk_size: int = 1024,
):
    """Per-position (logsumexp, entropy) with logits recomputed chunkwise.

    `jax.checkpoint` makes the backward re-form each chunk's logits instead of
    saving them — peak memory O(chunk·V) not O(n·V)."""
    n, d = hidden.shape
    inv_temp = 1.0 / temperature
    if n % chunk_size:
        chunk_size = _best_chunk(n, chunk_size)
    chunks = hidden.reshape(n // chunk_size, chunk_size, d)
    fn = jax.checkpoint(
        functools.partial(_chunk_stats, w_lm=w_lm, inv_temp=inv_temp)
    )
    lse, entropy = jax.lax.map(fn, chunks)
    return lse.reshape(n), entropy.reshape(n)


def _best_chunk(n: int, preferred: int) -> int:
    for c in range(min(preferred, n), 0, -1):
        if n % c == 0:
            return c
    return n


def logprob_entropy_from_hidden(
    hidden: jnp.ndarray,  # [n, d] — model output after final norm
    w_lm: jnp.ndarray,  # [d, V] — LM head (transposed embedding if tied)
    tokens: jnp.ndarray,  # [n] int32 packed trie tokens
    parent: jnp.ndarray,  # [n] int32, -1 for roots
    temperature: float = 1.0,
    chunk_size: int = 1024,
):
    """Per-edge log-probs and per-position entropies over the packed trie.

    Returns (lp_edge [n], entropy [n]): ``lp_edge[j]`` = log P(token[j] |
    ancestors of j) — the packed analogue of the reference's
    ``logprobs[t] = logprob of token t+1`` (reference:
    tree_training_engine.py:192,258,363). Roots get lp_edge = 0 (no incoming
    edge; their weight is 0 by construction)."""
    lse, entropy = position_stats_from_hidden(hidden, w_lm, temperature, chunk_size)

    par = jnp.maximum(parent, 0)
    h_par = jnp.take(hidden, par, axis=0)  # [n, d]
    w_cols = jnp.take(w_lm.T, tokens, axis=0)  # [n, d]
    label_logit = (
        jnp.sum(h_par.astype(jnp.float32) * w_cols.astype(jnp.float32), axis=-1)
        / temperature
    )
    lp_edge = label_logit - jnp.take(lse, par)
    lp_edge = jnp.where(parent >= 0, lp_edge, 0.0)
    return lp_edge, entropy


def tree_loss_from_hidden(
    hidden,
    w_lm,
    tokens,
    parent,
    w_logprob,  # [n] f32 per-edge weights (tries/flatten.py)
    w_entropy,  # [n] f32 per-position weights
    temperature: float = 1.0,
    chunk_size: int = 1024,
):
    """Scalar trie loss + aux stats. Gradients flow into hidden and w_lm."""
    lp_edge, entropy = logprob_entropy_from_hidden(
        hidden, w_lm, tokens, parent, temperature, chunk_size
    )
    loss = jnp.sum(w_logprob * lp_edge) + jnp.sum(w_entropy * entropy)
    aux = {
        "lp_edge": lp_edge,
        "entropy": entropy,
        "sum_logprob": jnp.sum(w_logprob * lp_edge),
        "sum_entropy": jnp.sum(w_entropy * entropy),
    }
    return loss, aux
