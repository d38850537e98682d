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

from dynamictreeattn_tpu.models.qwen3 import (
    Qwen3Config,
    _moe_block,
    apply_rope,
    lm_head_weight,
    rms_norm,
    rope_tables,
)

__all__ = ["init_cache", "forward_step", "generate"]

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

    qh = q.transpose(1, 0, 2).reshape(hkv, grp, T, dh)  # [Hkv, grp, T, dh]
    st = jnp.einsum(
        "hgtd,hjd->hgtj", qh.astype(jnp.float32), ck.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * (dh ** -0.5)
    col = jnp.arange(Lmax)[None, None, None, :]
    row = (start + jnp.arange(T))[None, None, :, None]
    st = jnp.where(col <= row, st, NEG)
    p = jax.nn.softmax(st, axis=-1)
    o = jnp.einsum(
        "hgtj,hjd->hgtd", p, cv.astype(jnp.float32),
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


def forward_step(params, config: Qwen3Config, tokens, positions, cache_k,
                 cache_v, start, valid=None):
    """T tokens of one sequence through all layers. tokens/positions [T];
    cache_k/v [L, Hkv, Lmax, dh]; returns (logits [T, V] fp32, ck, cv).
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
    hidden = rms_norm(x, params["final_norm"], c.rms_norm_eps)
    logits = jnp.dot(
        hidden, lm_head_weight(params, c), preferred_element_type=jnp.float32
    )
    return logits, cks, cvs


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_new", "greedy", "use_eos"),
)
def _generate_jit(params, config, prompts, prompt_lens, key, max_new,
                  temperature, greedy, use_eos, eos_id):
    # temperature and eos_id are TRACED (plain numeric operands) so sweeping
    # or annealing them never recompiles; greedy/use_eos change control flow
    # and stay static
    B, Lp = prompts.shape
    c = config
    dtype = params["layers"]["wq"].dtype
    cache = init_cache(c, B, Lp + max_new, dtype)

    step_b = jax.vmap(
        lambda tok, pos, ck, cv, st, vl: forward_step(
            params, c, tok, pos, ck, cv, st, vl
        ),
        in_axes=(0, 0, 1, 1, 0, 0), out_axes=(0, 1, 1),
    )

    # ---- prefill: all prompt rows at once (padding rows write garbage cache
    # slots past each row's length; decode overwrites them before any
    # attention ever reads them). The valid mask keeps those padding tokens
    # out of MoE expert capacity / router statistics (ADVICE r1)
    pos = jnp.broadcast_to(jnp.arange(Lp)[None, :], (B, Lp))
    pre_valid = (pos < prompt_lens[:, None]).astype(jnp.int32)
    logits, ck, cv = step_b(
        prompts, pos, cache["k"], cache["v"], jnp.zeros((B,), jnp.int32),
        pre_valid,
    )
    last = jnp.take_along_axis(
        logits, (prompt_lens - 1)[:, None, None], axis=1
    )[:, 0]  # [B, V]

    def sample(lg, k):
        if greedy:
            return jnp.argmax(lg, axis=-1).astype(jnp.int32)
        return jax.random.categorical(k, lg / temperature, axis=-1).astype(
            jnp.int32
        )

    key, k0 = jax.random.split(key)
    tok0 = sample(last, k0)

    def decode(carry, t):
        # carry token sits at position prompt_lens + t (t = 0 for tok0)
        tok, done, ck, cv, key = carry
        pos_t = (prompt_lens + t)[:, None]
        logits, ck, cv = step_b(
            tok[:, None], pos_t, ck, cv, prompt_lens + t,
            jnp.ones((B, 1), jnp.int32),
        )
        key, kt = jax.random.split(key)
        nxt = sample(logits[:, -1], kt)
        if use_eos:
            done_next = done | (tok == eos_id)
            nxt = jnp.where(done_next, eos_id.astype(jnp.int32), nxt)
        else:
            done_next = done
        return (nxt, done_next, ck, cv, key), tok

    # each step emits the carry token, so ys = [tok0, nxt1, ...] — exactly
    # the max_new sampled tokens
    done0 = jnp.zeros((B,), bool)
    (_, _, _, _, _), toks = jax.lax.scan(
        decode, (tok0, done0, ck, cv, key), jnp.arange(max_new)
    )
    return toks.T  # [B, max_new]


def generate(params, config: Qwen3Config, prompts, prompt_lens, max_new: int,
             key=None, temperature: float = 1.0, greedy: bool = False,
             eos_id: int | None = None):
    """Sample `max_new` continuation tokens for each right-padded prompt row.

    prompts [B, Lp] int32, prompt_lens [B] — returns [B, max_new] int32
    (compose full sequences as prompt[:len] + row). With `eos_id`, every
    token after a sampled eos is forced to eos (truncate host-side)."""
    import numpy as np

    if key is None:
        key = jax.random.key(0)
    return np.asarray(_generate_jit(
        params, config, jnp.asarray(prompts, jnp.int32),
        jnp.asarray(prompt_lens, jnp.int32), key, int(max_new),
        jnp.float32(temperature), bool(greedy),
        eos_id is not None, jnp.int32(eos_id if eos_id is not None else 0),
    ))
