"""Autoregressive sampling with a KV cache — the rollout side of the RL loop.

The reference delegates rollout generation to its host framework (AReaL,
reference: README.md:4-5) and only trains on the resulting sequences. This
module makes the TPU framework self-contained: batched prefill + decode with
a per-sequence KV cache, greedy or temperature sampling, for every supported
model family (Qwen3 / Qwen2.5 / Llama-3 / Qwen3-MoE).

Decode is intentionally simple XLA (einsum attention over the cache — decode
is a memory-bound matvec, the MXU kernel buys nothing at T=1); prefill runs
the same cached path so logits and cache slots agree exactly. Greedy output
is HF-generate-parity-tested (tests/test_generate.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dynamictreeattn_tpu.ops.sampling import filter_logits
from dynamictreeattn_tpu.models.qwen3 import (
    Qwen3Config,
    _moe_block,
    apply_rope,
    lm_head_weight,
    rms_norm,
    rope_tables,
)

__all__ = ["init_cache", "forward_step", "generate", "generate_grouped"]

NEG = -1e30


def init_cache(config: Qwen3Config, batch: int, max_len: int, dtype=jnp.bfloat16):
    """{'k','v'}: [L, B, Hkv, max_len, dh] zero-initialized cache."""
    c = config
    shape = (c.num_hidden_layers, batch, c.num_key_value_heads, max_len,
             c.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _layer_step(x, lp, cos, sin, ck, cv, start, config: Qwen3Config,
                valid=None):
    """One layer over T new tokens of ONE sequence against its cache.

    x [T, d]; ck/cv [Hkv, Lmax, dh]; start = cache slot of the first new
    token. Mirrors qwen3._layer exactly (same norms/rope/GQA/MoE math).
    `valid` ([T] 0/1, optional) marks real tokens — ragged prefill passes
    positions < prompt_len so padding rows neither consume MoE expert
    capacity nor skew router statistics (same contract as moe_route's
    valid in the training path)."""
    c = config
    T, d = x.shape
    dh = c.head_dim
    hq, hkv = c.num_attention_heads, c.num_key_value_heads
    grp = hq // hkv
    eps = c.rms_norm_eps
    Lmax = ck.shape[1]

    h = rms_norm(x, lp["ln1"], eps)
    q = h @ lp["wq"]
    k = h @ lp["wk"]
    v = h @ lp["wv"]
    if c.attention_bias:
        q = q + lp["bq"]
        k = k + lp["bk"]
        v = v + lp["bv"]
    q = q.reshape(T, hq, dh)
    k = k.reshape(T, hkv, dh)
    v = v.reshape(T, hkv, dh)
    if c.use_qk_norm:
        q = rms_norm(q, lp["q_norm"], eps)
        k = rms_norm(k, lp["k_norm"], eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    ck = jax.lax.dynamic_update_slice(ck, k.transpose(1, 0, 2).astype(ck.dtype),
                                      (0, start, 0))
    cv = jax.lax.dynamic_update_slice(cv, v.transpose(1, 0, 2).astype(cv.dtype),
                                      (0, start, 0))

    # bf16 matmul operands with fp32 accumulation (MXU-native; casting the
    # cache to fp32 would halve matmul rate and double its HBM traffic —
    # decode is KV-read-bound)
    qh = q.transpose(1, 0, 2).reshape(hkv, grp, T, dh)  # [Hkv, grp, T, dh]
    st = jnp.einsum(
        "hgtd,hjd->hgtj", qh.astype(ck.dtype), ck,
        preferred_element_type=jnp.float32,
    ) * (dh ** -0.5)
    col = jnp.arange(Lmax)[None, None, None, :]
    row = (start + jnp.arange(T))[None, None, :, None]
    st = jnp.where(col <= row, st, NEG)
    p = jax.nn.softmax(st, axis=-1)
    o = jnp.einsum(
        "hgtj,hjd->hgtd", p.astype(cv.dtype), cv,
        preferred_element_type=jnp.float32,
    )
    o = o.transpose(2, 0, 1, 3).reshape(T, hq * dh).astype(x.dtype)
    x = x + o @ lp["wo"]

    h = rms_norm(x, lp["ln2"], eps)
    if c.is_moe:
        y, _lb = _moe_block(h, lp, c, valid)
        x = x + y.astype(x.dtype)
        return x, ck, cv
    act = jax.nn.silu((h @ lp["gate"]).astype(jnp.float32)).astype(h.dtype)
    x = x + (act * (h @ lp["up"])) @ lp["down"]
    return x, ck, cv


def _layer_step_decode(x, lp, cos, sin, ck, cv, plen, lp0, t,
                       config: Qwen3Config):
    """One layer, one decode token of ONE sequence, cache READ-ONLY.

    x [d]; ck/cv [Hkv, Lmax, dh]. The row's prompt lives in slots
    [0, plen); its completion in slots [lp0, lp0+t) (lp0 = padded prompt
    width — slots [plen, lp0) are dead padding, always masked); the current
    token enters via an explicit self column and its (k, v) is returned for
    the caller to write at slot lp0+t once per step (writing inside the
    layer scan made XLA copy the whole cache per layer). Same math as
    _layer_step at T=1."""
    c = config
    d = x.shape[0]
    dh = c.head_dim
    hq, hkv = c.num_attention_heads, c.num_key_value_heads
    grp = hq // hkv
    eps = c.rms_norm_eps
    Lmax = ck.shape[1]

    h = rms_norm(x, lp["ln1"], eps)
    q = h @ lp["wq"]
    k = h @ lp["wk"]
    v = h @ lp["wv"]
    if c.attention_bias:
        q = q + lp["bq"]
        k = k + lp["bk"]
        v = v + lp["bv"]
    q = q.reshape(hq, dh)
    k = k.reshape(hkv, dh)
    v = v.reshape(hkv, dh)
    if c.use_qk_norm:
        q = rms_norm(q, lp["q_norm"], eps)
        k = rms_norm(k, lp["k_norm"], eps)
    q = apply_rope(q[None], cos[None], sin[None])[0]
    k = apply_rope(k[None], cos[None], sin[None])[0]

    qh = q.reshape(hkv, grp, dh).astype(ck.dtype)
    scale = dh ** -0.5
    st = jnp.einsum(
        "krd,kjd->krj", qh, ck, preferred_element_type=jnp.float32
    ) * scale  # [hkv, grp, Lmax]
    col = jnp.arange(Lmax)[None, None, :]
    visible = (col < plen) | ((col >= lp0) & (col < lp0 + t))
    st = jnp.where(visible, st, NEG)
    st_s = jnp.sum(
        qh.astype(jnp.float32) * k.astype(jnp.float32)[:, None, :], axis=-1
    ) * scale  # [hkv, grp]
    # two-piece online softmax merge (cache / self) — no concatenated row
    # materialization (see _layer_step_grouped)
    m = jnp.maximum(jnp.max(st, axis=-1), st_s)  # [hkv, grp]
    pc = jnp.exp(st - m[..., None])
    ps = jnp.exp(st_s - m)
    l = jnp.sum(pc, axis=-1) + ps
    o = jnp.einsum(
        "krj,kjd->krd", pc.astype(cv.dtype), cv,
        preferred_element_type=jnp.float32,
    ) + ps[..., None] * v.astype(jnp.float32)[:, None, :]
    o = (o / l[..., None]).reshape(hq * dh).astype(x.dtype)
    x = x + o @ lp["wo"]

    h = rms_norm(x, lp["ln2"], eps)
    if c.is_moe:
        y, _lb = _moe_block(h[None], lp, c, None)
        x = x + y[0].astype(x.dtype)
        return x, k, v
    act = jax.nn.silu((h @ lp["gate"]).astype(jnp.float32)).astype(h.dtype)
    x = x + (act * (h @ lp["up"])) @ lp["down"]
    return x, k, v


def _decode_step_flat(params, c: Qwen3Config, tok, plens, lp0, t, ck, cv):
    """One decode token for all [B] rows. tok/plens [B]; ck/cv
    [L, B, Hkv, Lmax, dh] — completion k/v written at the COMMON slot
    lp0 + t (one in-place dynamic_update_slice per cache per step on the
    decode loop's carry). Returns (logits [B, V] fp32, ck, cv)."""
    x = jnp.take(params["embed"], tok, axis=0)  # [B, d]
    cos, sin = rope_tables(plens + t, c.head_dim, c.rope_theta,
                           c.rope_scaling_tuple)  # [B, dh]

    def scan_fn(x, inp):
        lp, kc, vc = inp
        x, k_new, v_new = jax.vmap(
            lambda xb, cb, sb, pl, kc1, vc1: _layer_step_decode(
                xb, lp, cb, sb, kc1, vc1, pl, lp0, t, c
            )
        )(x, cos, sin, plens, kc, vc)
        return x, (k_new, v_new)

    x, (k_new, v_new) = jax.lax.scan(
        scan_fn, x, (params["layers"], ck, cv)
    )  # k_new/v_new [L, B, Hkv, dh]
    ck = jax.lax.dynamic_update_slice(
        ck, k_new[:, :, :, None, :].astype(ck.dtype), (0, 0, 0, lp0 + t, 0)
    )
    cv = jax.lax.dynamic_update_slice(
        cv, v_new[:, :, :, None, :].astype(cv.dtype), (0, 0, 0, lp0 + t, 0)
    )
    hidden = rms_norm(x, params["final_norm"], c.rms_norm_eps)
    logits = jnp.dot(
        hidden, lm_head_weight(params, c), preferred_element_type=jnp.float32
    )
    return logits, ck, cv


def forward_hidden_cached(params, config: Qwen3Config, tokens, positions,
                          cache_k, cache_v, start, valid=None):
    """T tokens of one sequence through all layers, cache updated — WITHOUT
    the LM head. tokens/positions [T]; cache_k/v [L, Hkv, Lmax, dh]; returns
    (hidden [T, d] post-final-norm, ck, cv). Prefill uses this directly:
    materializing [T, V] logits for every prompt position would cost
    O(B·Lp·V) memory/FLOPs when only the last position is ever sampled.
    `valid` ([T] 0/1, optional): real-token mask for ragged prefill (MoE
    routing ignores padding)."""
    c = config
    x = jnp.take(params["embed"], tokens, axis=0)
    cos, sin = rope_tables(positions, c.head_dim, c.rope_theta,
                           c.rope_scaling_tuple)

    def scan_fn(x, inp):
        lp, ck, cv = inp
        x, ck, cv = _layer_step(x, lp, cos, sin, ck, cv, start, c, valid)
        return x, (ck, cv)

    x, (cks, cvs) = jax.lax.scan(
        scan_fn, x, (params["layers"], cache_k, cache_v)
    )
    return rms_norm(x, params["final_norm"], c.rms_norm_eps), cks, cvs


def forward_step(params, config: Qwen3Config, tokens, positions, cache_k,
                 cache_v, start, valid=None):
    """T tokens of one sequence through all layers. tokens/positions [T];
    cache_k/v [L, Hkv, Lmax, dh]; returns (logits [T, V] fp32, ck, cv).
    `valid` ([T] 0/1, optional): real-token mask for ragged prefill (MoE
    routing ignores padding)."""
    hidden, cks, cvs = forward_hidden_cached(
        params, config, tokens, positions, cache_k, cache_v, start, valid
    )
    logits = jnp.dot(
        hidden, lm_head_weight(params, config),
        preferred_element_type=jnp.float32,
    )
    return logits, cks, cvs


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_new", "greedy", "use_eos", "top_k",
                     "use_top_p", "use_min_p"),
)
def _generate_jit(params, config, prompts, prompt_lens, key, max_new,
                  temperature, greedy, use_eos, eos_id,
                  top_k=0, use_top_p=False, top_p=1.0,
                  use_min_p=False, min_p=0.0):
    # temperature and eos_id are TRACED (plain numeric operands) so sweeping
    # or annealing them never recompiles; greedy/use_eos change control flow
    # and stay static
    B, Lp = prompts.shape
    c = config
    dtype = params["layers"]["wq"].dtype
    cache = init_cache(c, B, Lp + max_new, dtype)

    hidden_b = jax.vmap(
        lambda tok, pos, ck, cv, st, vl: forward_hidden_cached(
            params, c, tok, pos, ck, cv, st, vl
        ),
        in_axes=(0, 0, 1, 1, 0, 0), out_axes=(0, 1, 1),
    )

    # ---- prefill: all prompt rows at once (padding rows write garbage cache
    # slots past each row's length; decode overwrites them before any
    # attention ever reads them). The valid mask keeps those padding tokens
    # out of MoE expert capacity / router statistics (ADVICE r1). The LM
    # head runs only on each row's last hidden state — full [B, Lp, V]
    # prefill logits would dominate prefill FLOPs and OOM at real vocab
    pos = jnp.broadcast_to(jnp.arange(Lp)[None, :], (B, Lp))
    pre_valid = (pos < prompt_lens[:, None]).astype(jnp.int32)
    hidden, ck, cv = hidden_b(
        prompts, pos, cache["k"], cache["v"], jnp.zeros((B,), jnp.int32),
        pre_valid,
    )
    last_h = jnp.take_along_axis(
        hidden, (prompt_lens - 1)[:, None, None], axis=1
    )[:, 0]  # [B, d]
    last = jnp.dot(
        last_h, lm_head_weight(params, c), preferred_element_type=jnp.float32
    )  # [B, V]

    def sample(lg, k):
        if greedy:
            return jnp.argmax(lg, axis=-1).astype(jnp.int32)
        lg = lg / temperature
        if top_k or use_top_p or use_min_p:
            lg = filter_logits(lg, top_k, top_p if use_top_p else None,
                               min_p if use_min_p else None)
        return jax.random.categorical(k, lg, axis=-1).astype(jnp.int32)

    key, k0 = jax.random.split(key)
    tok0 = sample(last, k0)

    # the carry token sits at rope position prompt_lens + t (t = 0 for
    # tok0); its k/v land at the common cache slot Lp + t. Each step emits
    # the carry token, so the outputs are [tok0, nxt1, ...] — exactly the
    # max_new sampled tokens
    def step_fn(tok, t, ck, cv, key):
        logits, ck, cv = _decode_step_flat(
            params, c, tok, prompt_lens, Lp, t, ck, cv
        )
        key, kt = jax.random.split(key)
        return sample(logits, kt), ck, cv, key

    if not use_eos:
        def decode(carry, t):
            tok, ck, cv, key = carry
            nxt, ck, cv, key = step_fn(tok, t, ck, cv, key)
            return (nxt, ck, cv, key), tok

        (_, _, _, _), toks = jax.lax.scan(
            decode, (tok0, ck, cv, key), jnp.arange(max_new)
        )
        return toks.T  # [B, max_new]

    # eos mode: while_loop with early exit once every row has sampled eos
    # (pre-filled eos buffer = the forced-eos-tail contract)
    buf0 = jnp.full((max_new, B), eos_id.astype(jnp.int32))

    def cond(carry):
        t, tok, done, ck, cv, key, buf = carry
        return (t < max_new) & ~jnp.all(done)

    def body(carry):
        t, tok, done, ck, cv, key, buf = carry
        buf = jax.lax.dynamic_update_slice(buf, tok[None], (t, 0))
        nxt, ck, cv, key = step_fn(tok, t, ck, cv, key)
        done_next = done | (tok == eos_id)
        nxt = jnp.where(done_next, eos_id.astype(jnp.int32), nxt)
        return (t + 1, nxt, done_next, ck, cv, key, buf)

    done0 = jnp.zeros((B,), bool)
    carry = (jnp.int32(0), tok0, done0, ck, cv, key, buf0)
    *_, buf = jax.lax.while_loop(cond, body, carry)
    return buf.T  # [B, max_new]


# --------------------------------------------------------- grouped generation
#
# GRPO-style rollouts sample G completions per prompt. The flat sampler
# duplicates each prompt G times: G× prefill FLOPs, G× prompt-KV memory, and
# — decode being KV-read-bound — G× HBM reads of identical prompt KV every
# step. Grouped generation prefers the rollout-side mirror of the training
# trie: prefill each prompt ONCE into a frozen shared cache, then decode G
# branches per prompt that attend to (shared prompt KV) ⊕ (their own
# completion KV). The prompt-side attention becomes an einsum with G on the
# rhs batch dim, so XLA streams each prompt's KV from HBM once per step
# instead of G times.


def _grouped_qkv(x, lp, cos, sin, config: Qwen3Config):
    """Pre-attention of one grouped-decode layer for ONE prompt: x [G, d] →
    post-rope (q [G, hq, dh], k/v [G, hkv, dh]). cos/sin [1, dh]: all
    branches share the position."""
    c = config
    G = x.shape[0]
    dh = c.head_dim
    hq, hkv = c.num_attention_heads, c.num_key_value_heads
    eps = c.rms_norm_eps
    h = rms_norm(x, lp["ln1"], eps)
    q = h @ lp["wq"]
    k = h @ lp["wk"]
    v = h @ lp["wv"]
    if c.attention_bias:
        q = q + lp["bq"]
        k = k + lp["bk"]
        v = v + lp["bv"]
    q = q.reshape(G, hq, dh)
    k = k.reshape(G, hkv, dh)
    v = v.reshape(G, hkv, dh)
    if c.use_qk_norm:
        q = rms_norm(q, lp["q_norm"], eps)
        k = rms_norm(k, lp["k_norm"], eps)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v


def _grouped_ffn(x, o_flat, lp, config: Qwen3Config):
    """Post-attention of one grouped-decode layer for ONE prompt:
    residual + wo, then MLP/MoE. x [G, d], o_flat [G, hq*dh]."""
    c = config
    G = x.shape[0]
    eps = c.rms_norm_eps
    x = x + o_flat.astype(x.dtype) @ lp["wo"]
    h = rms_norm(x, lp["ln2"], eps)
    if c.is_moe:
        # batched dispatch with capacity=G is EXACT: an expert receives at
        # most one (token, choice) pair per branch token, so <= G pairs —
        # nothing can drop, matching the flat per-row decode (whose cap >= k
        # at T=1 likewise never drops)
        from dynamictreeattn_tpu.models.qwen3 import moe_apply, moe_route

        w, idx, _lb = moe_route(h, lp["router"], c, None)
        y = moe_apply(h, lp["e_gate"], lp["e_up"], lp["e_down"], idx, w, G)
        return x + y.astype(x.dtype)
    act = jax.nn.silu((h @ lp["gate"]).astype(jnp.float32)).astype(h.dtype)
    return x + (act * (h @ lp["up"])) @ lp["down"]


def _layer_step_grouped(x, lp, cos, sin, ckp, cvp, ckc, cvc, t, plen,
                        config: Qwen3Config):
    """One layer, one decode token for each of G branches of ONE prompt.

    x [G, d]; ckp/cvp [Hkv, Lp, dh] — frozen shared prompt cache; ckc/cvc
    [G, Hkv, Nc, dh] — per-branch completion cache, READ-ONLY here: the
    current token's score/value enter through an explicit self column, and
    the caller writes the returned (k, v) into slot t once per decode step
    (writing inside the layer scan made XLA copy the full cache per layer —
    the decode bottleneck). Branches never attend to each other — only to
    the shared prompt prefix (cols < plen), their own past completion
    (slots < t), and themselves. Same norms/rope/GQA/MoE math as
    _layer_step. Returns (x, k [G, Hkv, dh], v [G, Hkv, dh])."""
    c = config
    G, d = x.shape
    dh = c.head_dim
    hq, hkv = c.num_attention_heads, c.num_key_value_heads
    grp = hq // hkv
    Lp = ckp.shape[1]
    Nc = ckc.shape[2]

    q, k, v = _grouped_qkv(x, lp, cos, sin, c)

    # bf16 matmul operands, fp32 accumulation (see _layer_step note)
    qh = q.reshape(G, hkv, grp, dh).astype(ckp.dtype)
    scale = dh ** -0.5
    # shared-prompt scores: ckp has no G axis — read once, batched over G·grp
    st_p = jnp.einsum(
        "gkrd,kjd->gkrj", qh, ckp,
        preferred_element_type=jnp.float32,
    ) * scale  # [G, hkv, grp, Lp]
    st_p = jnp.where(jnp.arange(Lp)[None, None, None, :] < plen, st_p, NEG)
    st_c = jnp.einsum(
        "gkrd,gkjd->gkrj", qh, ckc,
        preferred_element_type=jnp.float32,
    ) * scale  # [G, hkv, grp, Nc]
    st_c = jnp.where(jnp.arange(Nc)[None, None, None, :] < t, st_c, NEG)
    kb = k.astype(qh.dtype)
    st_s = jnp.sum(
        qh.astype(jnp.float32) * kb.astype(jnp.float32)[:, :, None, :], axis=-1
    ) * scale  # [G, hkv, grp] — current token attends to itself
    # three-piece online softmax merge (prompt / completion / self): never
    # materializes the concatenated [.., Lp+Nc+1] score row — the concat +
    # softmax + split formulation cost two extra HBM passes over it per
    # layer, a measurable slice of the decode step at GRPO shapes
    m = jnp.maximum(
        jnp.maximum(jnp.max(st_p, axis=-1), jnp.max(st_c, axis=-1)), st_s
    )  # [G, hkv, grp]
    pp = jnp.exp(st_p - m[..., None])
    pc = jnp.exp(st_c - m[..., None])
    ps = jnp.exp(st_s - m)
    l = jnp.sum(pp, axis=-1) + jnp.sum(pc, axis=-1) + ps  # [G, hkv, grp]
    o = jnp.einsum(
        "gkrj,kjd->gkrd", pp.astype(cvp.dtype), cvp,
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "gkrj,gkjd->gkrd", pc.astype(cvc.dtype), cvc,
        preferred_element_type=jnp.float32,
    ) + ps[..., None] * v.astype(jnp.float32)[:, :, None, :]
    o = (o / l[..., None]).reshape(G, hq * dh)
    return _grouped_ffn(x, o, lp, c), k, v


def _decode_step_grouped(params, c: Qwen3Config, tok, plens, t, ckp, cvp,
                         ckc, cvc, backend: str = "xla"):
    """One decode token for all [P, G] branches. tok [P, G]; ckp/cvp
    [L, P, Hkv, Lp, dh] frozen; ckc/cvc [L, P, G, Hkv, Nc, dh] updated at
    slot t. Returns (logits [P, G, V] fp32, ckc, cvc).

    The layer scan only READS the caches and emits each layer's new (k, v)
    [P, G, Hkv, dh]; both caches get ONE dynamic_update_slice at slot t per
    step, on the decode loop's carry — which XLA performs in place. (The
    previous formulation updated the caches inside the layer scan as stacked
    outputs, making XLA materialize a full cache copy every step.)

    backend="pallas" runs the attention of each layer as ONE fused
    decode-attention kernel over all (prompt, branch) pairs
    (ops/decode_attention.py): scores stay in VMEM and completion-cache
    columns ≥ t are never read. Requires Lp/Nc chunk-divisible — the
    sampler pads its cache allocations."""
    x = jnp.take(params["embed"], tok, axis=0)  # [P, G, d]
    cos, sin = rope_tables(plens + t, c.head_dim, c.rope_theta,
                           c.rope_scaling_tuple)  # [P, dh]

    if backend == "pallas":
        from dynamictreeattn_tpu.ops.decode_attention import (
            decode_attention_grouped,
        )

        def scan_fn(x, inp):
            lp, kp, vp, kc, vc = inp
            q, k_new, v_new = jax.vmap(
                lambda xg, cg, sg: _grouped_qkv(xg, lp, cg[None], sg[None], c)
            )(x, cos, sin)  # q [P, G, hq, dh]; k/v [P, G, hkv, dh]
            o = decode_attention_grouped(
                q.astype(kp.dtype), k_new.astype(kp.dtype),
                v_new.astype(kp.dtype), kp, vp, kc, vc, plens, t,
            )
            P, G = x.shape[:2]
            x = jax.vmap(lambda xg, og: _grouped_ffn(xg, og, lp, c))(
                x, o.reshape(P, G, -1)
            )
            return x, (k_new, v_new)
    else:

        def scan_fn(x, inp):
            lp, kp, vp, kc, vc = inp

            def per_prompt(xg, cosg, sing, plen, kp1, vp1, kc1, vc1):
                return _layer_step_grouped(
                    xg, lp, cosg[None], sing[None], kp1, vp1, kc1, vc1, t,
                    plen, c,
                )

            x, k_new, v_new = jax.vmap(per_prompt)(
                x, cos, sin, plens, kp, vp, kc, vc
            )
            return x, (k_new, v_new)

    x, (k_new, v_new) = jax.lax.scan(
        scan_fn, x, (params["layers"], ckp, cvp, ckc, cvc)
    )  # k_new/v_new [L, P, G, Hkv, dh]
    ckc = jax.lax.dynamic_update_slice(
        ckc, k_new[:, :, :, :, None, :].astype(ckc.dtype), (0, 0, 0, 0, t, 0)
    )
    cvc = jax.lax.dynamic_update_slice(
        cvc, v_new[:, :, :, :, None, :].astype(cvc.dtype), (0, 0, 0, 0, t, 0)
    )
    hidden = rms_norm(x, params["final_norm"], c.rms_norm_eps)
    logits = jnp.dot(
        hidden, lm_head_weight(params, c), preferred_element_type=jnp.float32
    )
    return logits, ckc, cvc


@functools.partial(
    jax.jit,
    static_argnames=("config", "group", "max_new", "greedy", "use_eos",
                     "backend", "top_k", "use_top_p", "use_min_p"),
)
def _generate_grouped_jit(params, config, prompts, prompt_lens, key, group,
                          max_new, temperature, greedy, use_eos, eos_id,
                          backend="xla",
                          top_k=0, use_top_p=False, top_p=1.0,
                          use_min_p=False, min_p=0.0):
    P, Lp = prompts.shape
    G = group
    c = config
    dtype = params["layers"]["wq"].dtype
    n_alloc = max_new
    if backend == "pallas":
        # the decode kernel chunks the caches; pad the prompt buffer and the
        # completion-cache allocation to chunk multiples (padding columns are
        # masked by plen/t)
        lp_pad = -(-Lp // 512) * 512
        if lp_pad != Lp:
            prompts = jnp.pad(prompts, ((0, 0), (0, lp_pad - Lp)))
            Lp = lp_pad
        n_alloc = -(-max_new // 256) * 256

    # ---- prefill each prompt ONCE (cache sized to the prompt only); LM
    # head only on the last hidden state per prompt
    cache = init_cache(c, P, Lp, dtype)
    hidden_b = jax.vmap(
        lambda tok, pos, ck, cv, st, vl: forward_hidden_cached(
            params, c, tok, pos, ck, cv, st, vl
        ),
        in_axes=(0, 0, 1, 1, 0, 0), out_axes=(0, 1, 1),
    )
    pos = jnp.broadcast_to(jnp.arange(Lp)[None, :], (P, Lp))
    pre_valid = (pos < prompt_lens[:, None]).astype(jnp.int32)
    hidden, ckp, cvp = hidden_b(
        prompts, pos, cache["k"], cache["v"], jnp.zeros((P,), jnp.int32),
        pre_valid,
    )
    last_h = jnp.take_along_axis(
        hidden, (prompt_lens - 1)[:, None, None], axis=1
    )[:, 0]  # [P, d]
    last = jnp.dot(
        last_h, lm_head_weight(params, c), preferred_element_type=jnp.float32
    )  # [P, V]

    def sample(lg, k):
        # lg [..., V] — categorical samples independently per leading dim
        if greedy:
            return jnp.argmax(lg, axis=-1).astype(jnp.int32)
        lg = lg / temperature
        if top_k or use_top_p or use_min_p:
            lg = filter_logits(lg, top_k, top_p if use_top_p else None,
                               min_p if use_min_p else None)
        return jax.random.categorical(k, lg, axis=-1).astype(jnp.int32)

    key, k0 = jax.random.split(key)
    tok0 = sample(jnp.broadcast_to(last[:, None, :], (P, G, last.shape[-1])),
                  k0)  # [P, G]

    # Windowed branch caches (xla backend): the branch-KV reads are ~40% of
    # decode HBM traffic and a fixed max_new-wide cache wastes ~half of it
    # on not-yet-written columns. Grow the allocation in W-column segments
    # instead (each segment compiles once; jnp.pad between segments is one
    # in-sequence copy). The pallas decode kernel keeps the single
    # chunk-divisible allocation its cache contract requires.
    W = 128
    if backend != "xla" or max_new <= W:
        bounds = [(0, max_new, n_alloc)]
    else:
        bounds = []
        lo = 0
        while lo < max_new:
            hi = min(lo + W, max_new)
            bounds.append((lo, hi, hi))
            lo = hi

    def cache_zeros(width):
        return jnp.zeros(
            (c.num_hidden_layers, P, G, c.num_key_value_heads, width,
             c.head_dim), dtype,
        )

    def grow(cache, width):
        pad = width - cache.shape[4]
        if pad == 0:
            return cache
        return jnp.pad(cache, ((0, 0),) * 4 + ((0, pad), (0, 0)))

    def step_fn(tok, t, ckc, cvc, key):
        logits, ckc, cvc = _decode_step_grouped(
            params, c, tok, prompt_lens, t, ckp, cvp, ckc, cvc,
            backend=backend,
        )
        key, kt = jax.random.split(key)
        return sample(logits, kt), ckc, cvc, key

    done0 = jnp.zeros((P, G), bool)
    if not use_eos:
        def decode(carry, t):
            tok, ckc, cvc, key = carry
            nxt, ckc, cvc, key = step_fn(tok, t, ckc, cvc, key)
            return (nxt, ckc, cvc, key), tok

        tok = tok0
        ckc = cvc = None
        segs = []
        for lo, hi, width in bounds:
            ckc = cache_zeros(width) if ckc is None else grow(ckc, width)
            cvc = cache_zeros(width) if cvc is None else grow(cvc, width)
            (tok, ckc, cvc, key), toks = jax.lax.scan(
                decode, (tok, ckc, cvc, key), jnp.arange(lo, hi)
            )
            segs.append(toks)
        toks = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=0)
        return jnp.transpose(toks, (1, 2, 0))  # [P, G, max_new]

    # eos mode: while_loop with early exit once EVERY branch has sampled
    # eos — real completions usually end well before max_new, and the
    # pre-filled eos buffer is exactly the forced-eos-tail contract.
    # Windowing composes: each segment's while_loop exits immediately once
    # everything is done, so later (larger-cache) segments cost nothing.
    buf0 = jnp.full((max_new, P, G), eos_id.astype(jnp.int32))

    def body(carry):
        t, tok, done, ckc, cvc, key, buf = carry
        buf = jax.lax.dynamic_update_slice(buf, tok[None], (t, 0, 0))
        nxt, ckc, cvc, key = step_fn(tok, t, ckc, cvc, key)
        done_next = done | (tok == eos_id)
        nxt = jnp.where(done_next, eos_id.astype(jnp.int32), nxt)
        return (t + 1, nxt, done_next, ckc, cvc, key, buf)

    t = jnp.int32(0)
    tok, done, buf = tok0, done0, buf0
    ckc = cvc = None
    for lo, hi, width in bounds:
        ckc = cache_zeros(width) if ckc is None else grow(ckc, width)
        cvc = cache_zeros(width) if cvc is None else grow(cvc, width)

        def cond(carry, _hi=hi):
            t, tok, done, ckc, cvc, key, buf = carry
            return (t < _hi) & ~jnp.all(done)

        t, tok, done, ckc, cvc, key, buf = jax.lax.while_loop(
            cond, body, (t, tok, done, ckc, cvc, key, buf)
        )
    return jnp.transpose(buf, (1, 2, 0))  # [P, G, max_new]


def generate_grouped(params, config: Qwen3Config, prompts, prompt_lens,
                     group: int, max_new: int, key=None,
                     temperature: float = 1.0, greedy: bool = False,
                     eos_id: int | None = None, backend: str = "auto",
                     top_k: int = 0, top_p: float | None = None,
                     min_p: float | None = None):
    """Sample `group` completions per prompt with a SHARED prompt KV cache.

    prompts [P, Lp] int32 (right-padded), prompt_lens [P] — returns
    [P, group, max_new] int32. Each prompt is prefilled once; its `group`
    branches decode against the frozen shared prompt KV plus their own
    completion cache. Token-for-token equivalent to `generate` on the
    G-times-duplicated prompt batch (greedy-parity-tested), at 1/G of the
    prefill compute and prompt-KV footprint — the rollout-side mirror of the
    tree-training engine's prefix sharing. With `eos_id`, tokens after a
    sampled eos are forced to eos (truncate host-side). `top_k`/`top_p`/
    `min_p` filter logits after temperature with HF-warper semantics
    (ops/sampling.py; top_k is static, top_p/min_p traced — sweeping them
    never recompiles).

    backend: "auto" (= "xla" — the measured-default: the XLA einsum path
    beats the pallas decode kernel 6.2k vs 4.6k sampled tok/s at GRPO
    shapes on v5e, scripts/tpu_decode_backend_ab.py / docs/PERF.md)
    | "pallas" | "xla"."""
    import numpy as np

    if key is None:
        key = jax.random.key(0)
    if backend == "auto":
        backend = "xla"
    return np.asarray(_generate_grouped_jit(
        params, config, jnp.asarray(prompts, jnp.int32),
        jnp.asarray(prompt_lens, jnp.int32), key, int(group), int(max_new),
        jnp.float32(temperature), bool(greedy),
        eos_id is not None, jnp.int32(eos_id if eos_id is not None else 0),
        backend=backend,
        top_k=int(top_k), use_top_p=top_p is not None,
        top_p=jnp.float32(1.0 if top_p is None else top_p),
        use_min_p=min_p is not None,
        min_p=jnp.float32(0.0 if min_p is None else min_p),
    ))


def generate(params, config: Qwen3Config, prompts, prompt_lens, max_new: int,
             key=None, temperature: float = 1.0, greedy: bool = False,
             eos_id: int | None = None, top_k: int = 0,
             top_p: float | None = None, min_p: float | None = None):
    """Sample `max_new` continuation tokens for each right-padded prompt row.

    prompts [B, Lp] int32, prompt_lens [B] — returns [B, max_new] int32
    (compose full sequences as prompt[:len] + row). With `eos_id`, every
    token after a sampled eos is forced to eos (truncate host-side).
    `top_k`/`top_p`/`min_p` filter logits after temperature with HF-warper
    semantics (ops/sampling.py)."""
    import numpy as np

    if key is None:
        key = jax.random.key(0)
    return np.asarray(_generate_jit(
        params, config, jnp.asarray(prompts, jnp.int32),
        jnp.asarray(prompt_lens, jnp.int32), key, int(max_new),
        jnp.float32(temperature), bool(greedy),
        eos_id is not None, jnp.int32(eos_id if eos_id is not None else 0),
        top_k=int(top_k), use_top_p=top_p is not None,
        top_p=jnp.float32(1.0 if top_p is None else top_p),
        use_min_p=min_p is not None,
        min_p=jnp.float32(0.0 if min_p is None else min_p),
    ))
