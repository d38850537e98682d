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


def position_stats_rowchunked(
    hidden: jnp.ndarray,  # [n, d]
    w_lm: jnp.ndarray,  # [d, V]
    temperature: float = 1.0,
    chunk_size: int = 1024,
):
    """Row-chunked (lse, entropy): logits formed chunk-by-chunk under
    `jax.checkpoint` so the [n, V] matrix never materializes.

    Kept as the reference implementation (it is the direct analogue of the
    reference's ``_chunked_apply``, reference: vocab_parallel.py:39-79).
    Its autodiff backward carries a fp32 [d, V] dW accumulator across the
    `lax.map` steps — ~1.2 GB of HBM read+write per chunk step at 0.6B,
    the measured ~6%-of-step "dW carry" bucket (docs/PERF.md) that
    `position_stats_from_hidden`'s vocab-chunked custom_vjp eliminates."""
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


# ------------------------------------------------- vocab-chunked custom path


def _vocab_chunk_width(V: int, n_rows: int) -> int:
    """Chunk width Vc: [n_rows, Vc] fp32 logits transient stays under
    ~512 MB, lane-multiple, in [512, 16384]. Exact divisors of V are
    preferred (published vocabs are 2^7·odd, so one almost always fits);
    otherwise the last chunk runs flush-to-edge with overlap masking."""
    budget = 512 * 1024 * 1024
    w = budget // max(n_rows * 4, 1)
    w = max(512, min(16384, (w // 128) * 128))
    if V <= w:
        return V  # single exact chunk (small vocab)
    for c in range(1, V // 512 + 1):
        if V % c == 0 and V // c <= w:
            return V // c  # largest fitting divisor: no ragged tail
    return w  # ragged tail (V > w guaranteed here)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _position_stats_vc(hidden, w_lm, inv_temp: float, vc: int):
    lse, entropy, _ = _vc_forward(hidden, w_lm, inv_temp, vc)
    return lse, entropy


def _vc_slice(w_lm, c, vc):
    """(wc [d, vc], col_valid [vc] | None) — the c-th column block, zero-
    padded past V on the ragged last chunk (dynamic_slice clamps the start,
    so the tail block is instead taken flush to the edge and re-masked)."""
    d, V = w_lm.shape
    if V % vc == 0:
        return jax.lax.dynamic_slice(w_lm, (0, c * vc), (d, vc)), None
    start = jnp.minimum(c * vc, V - vc)  # flush-to-edge for the tail block
    wc = jax.lax.dynamic_slice(w_lm, (0, start), (d, vc))
    col = start + jnp.arange(vc)
    return wc, col >= c * vc  # columns already seen in earlier chunks drop


def _vc_forward(hidden, w_lm, inv_temp: float, vc: int):
    n, d = hidden.shape
    V = w_lm.shape[1]
    n_chunks = -(-V // vc)

    def body(c, carry):
        m, se, sx = carry
        wc, valid = _vc_slice(w_lm, c, vc)
        x = jnp.dot(hidden, wc, preferred_element_type=jnp.float32) * inv_temp
        if valid is not None:
            x = jnp.where(valid[None, :], x, -jnp.inf)
        mc = jnp.max(x, axis=-1)
        new_m = jnp.maximum(m, mc)
        r = jnp.exp(m - new_m)  # 0 on the first chunk (m = -inf)
        ex = jnp.exp(x - new_m[:, None])  # masked columns -> exp(-inf) = 0
        se = se * r + jnp.sum(ex, axis=-1)
        xs = jnp.where(valid[None, :], x, 0.0) if valid is not None else x
        sx = sx * r + jnp.sum(ex * xs, axis=-1)
        return new_m, se, sx

    m0 = jnp.full((n,), -jnp.inf, jnp.float32)
    z = jnp.zeros((n,), jnp.float32)
    m, se, sx = jax.lax.fori_loop(0, n_chunks, body, (m0, z, z))
    lse = m + jnp.log(se)
    mean_x = sx / se
    return lse, lse - mean_x, mean_x


def _vc_fwd_rule(hidden, w_lm, inv_temp: float, vc: int):
    lse, entropy, mean_x = _vc_forward(hidden, w_lm, inv_temp, vc)
    return (lse, entropy), (hidden, w_lm, lse, mean_x)


def _vc_bwd_rule(inv_temp: float, vc: int, res, cts):
    """Analytic backward, vocab-chunk-parallel.

    dlogits_ij = p_ij·[g_lse_i − g_ent_i·(x_ij − mean_x_i)] with
    p = exp(x − lse) from the SAVED lse (no second online pass). Each dW
    column block is produced by one matmul and written once
    (dynamic_update_slice on the loop carry → in-place), so the only
    cross-chunk carry is dhidden [n, d] — unlike autodiff of the row-chunked
    path, which drags the full fp32 [d, V] dW through every chunk step."""
    hidden, w_lm, lse, mean_x = res
    g_lse, g_ent = cts
    n, d = hidden.shape
    V = w_lm.shape[1]
    n_chunks = -(-V // vc)
    V_pad = n_chunks * vc
    # dW chunks come out as stacked scan OUTPUTS (append-only — no in-place
    # carry for XLA's while-loop aliasing to get wrong), then one cheap
    # [C, d, vc] -> [d, V] transpose. Ragged vocabs pad W with zero columns
    # and mask their softmax term.
    w_use = (
        jnp.pad(w_lm, ((0, 0), (0, V_pad - V))) if V_pad != V else w_lm
    )
    a = (g_lse + g_ent * mean_x)[:, None]  # [n, 1] fp32
    b = g_ent[:, None]

    def body(dh, c):
        wc = jax.lax.dynamic_slice(w_use, (0, c * vc), (d, vc))
        x = jnp.dot(hidden, wc, preferred_element_type=jnp.float32) * inv_temp
        p = jnp.exp(x - lse[:, None])
        if V_pad != V:  # zero-padded columns have x=0, not -inf: mask them
            p = jnp.where((c * vc + jnp.arange(vc))[None, :] < V, p, 0.0)
        dl = (p * (a - b * x) * inv_temp).astype(hidden.dtype)  # [n, vc]
        dwcT = jax.lax.dot_general(
            dl, hidden, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [vc, d] — stacked ys then reshape contiguously to [V, d]
        dh = dh + jnp.dot(dl, wc.T, preferred_element_type=jnp.float32)
        return dh, dwcT.astype(w_lm.dtype)

    dh0 = jnp.zeros((n, d), jnp.float32)
    dh, dwsT = jax.lax.scan(body, dh0, jnp.arange(n_chunks))
    dWT = dwsT.reshape(V_pad, d)  # free reshape: scan axis is contiguous
    if V_pad != V:
        dWT = dWT[:V]
    # the custom_vjp contract wants [d, V]; for tied embeddings the engine
    # immediately transposes it back to [V, d] (w_lm = embed.T), so the two
    # transposes cancel in XLA and the grad lands contiguously
    return dh.astype(hidden.dtype), dWT.T


_position_stats_vc.defvjp(_vc_fwd_rule, _vc_bwd_rule)


# --------------------------------------------------- Pallas fused-kernel path


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _position_stats_pallas(hidden, w_lm, inv_temp: float, interpret: bool):
    lse, mx = _lm_stats_import().lm_stats(
        hidden, w_lm, inv_temp, interpret=interpret
    )
    return lse, lse - mx


def _lm_stats_import():
    from dynamictreeattn_tpu.ops import lm_stats as _m

    return _m


def _pallas_fwd_rule(hidden, w_lm, inv_temp: float, interpret: bool):
    lse, mx = _lm_stats_import().lm_stats(
        hidden, w_lm, inv_temp, interpret=interpret
    )
    return (lse, lse - mx), (hidden, w_lm, lse, mx)


def _pallas_bwd_rule(inv_temp: float, interpret: bool, res, cts):
    hidden, w_lm, lse, mx = res
    g_lse, g_ent = cts
    dh, dwT = _lm_stats_import().lm_stats_bwd(
        hidden, w_lm, lse, mx, g_lse, g_ent, inv_temp, interpret=interpret
    )
    # same contract as _vc_bwd_rule: [d, V] cotangent whose transpose is the
    # contiguous [V, d] the tied embedding wants
    return dh, dwT.astype(w_lm.dtype).T


_position_stats_pallas.defvjp(_pallas_fwd_rule, _pallas_bwd_rule)


def position_stats_from_hidden(
    hidden: jnp.ndarray,  # [n, d]
    w_lm: jnp.ndarray,  # [d, V]
    temperature: float = 1.0,
    chunk_size: int = 1024,  # row-chunk size, "rows" mode only
    mode: str = "vocab",
    vocab_chunk_width: int | None = None,  # override the auto chunk width
):
    """Per-position (logsumexp, entropy) without materializing [n, V] logits.

    mode="pallas" (engine default on TPU): fused Pallas kernels — logits
    tiles and the backward's dlogits never leave VMEM (ops/lm_stats.py).
    mode="pallas_interpret": same kernels in the TPU-semantics interpreter
    (CPU tests). mode="vocab": XLA custom_vjp looping over VOCAB chunks —
    online (m, Σe^x, Σe^x·x) merge forward; analytic backward writes each dW
    column block exactly once (see _vc_bwd_rule). mode="rows": the legacy
    row-chunked `jax.checkpoint` + `lax.map` formulation."""
    if mode == "rows":
        return position_stats_rowchunked(hidden, w_lm, temperature, chunk_size)
    if mode in ("pallas", "pallas_interpret"):
        return _position_stats_pallas(
            hidden, w_lm, 1.0 / temperature, mode == "pallas_interpret"
        )
    V = w_lm.shape[1]
    vc = min(vocab_chunk_width or _vocab_chunk_width(V, hidden.shape[0]), V)
    return _position_stats_vc(hidden, w_lm, 1.0 / temperature, vc)


def logprob_entropy_from_hidden(
    hidden: jnp.ndarray,  # [n, d] — model output after final norm
    w_lm: jnp.ndarray,  # [d, V] — LM head (transposed embedding if tied)
    tokens: jnp.ndarray,  # [n] int32 packed trie tokens
    parent: jnp.ndarray,  # [n] int32, -1 for roots
    temperature: float = 1.0,
    chunk_size: int = 1024,
    mode: str = "vocab",
):
    """Per-edge log-probs and per-position entropies over the packed trie.

    Returns (lp_edge [n], entropy [n]): ``lp_edge[j]`` = log P(token[j] |
    ancestors of j) — the packed analogue of the reference's
    ``logprobs[t] = logprob of token t+1`` (reference:
    tree_training_engine.py:192,258,363). Roots get lp_edge = 0 (no incoming
    edge; their weight is 0 by construction)."""
    lse, entropy = position_stats_from_hidden(
        hidden, w_lm, temperature, chunk_size, mode=mode
    )

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
    mode: str = "vocab",
):
    """Scalar trie loss + aux stats. Gradients flow into hidden and w_lm."""
    lp_edge, entropy = logprob_entropy_from_hidden(
        hidden, w_lm, tokens, parent, temperature, chunk_size, mode=mode
    )
    loss = jnp.sum(w_logprob * lp_edge) + jnp.sum(w_entropy * entropy)
    aux = {
        "lp_edge": lp_edge,
        "entropy": entropy,
        "sum_logprob": jnp.sum(w_logprob * lp_edge),
        "sum_entropy": jnp.sum(w_entropy * entropy),
    }
    return loss, aux
