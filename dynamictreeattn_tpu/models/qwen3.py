"""Functional JAX Qwen3.

Architecture (matches HF `transformers` Qwen3ForCausalLM, the model family the
reference benchmarks — reference: run.py:246-250, exp/exp_tree.py:4-9):
token embedding → L × [RMSNorm → GQA attention with per-head q/k RMSNorm and
RoPE → residual → RMSNorm → SwiGLU MLP → residual] → final RMSNorm → LM head
(tied to the embedding for the smaller models).

Design choices (TPU-first):

* Parameters are a flat pytree of arrays with **layers stacked** on a leading
  [L, ...] axis and the layer loop expressed as `lax.scan` — one layer's HLO is
  compiled once regardless of depth, and `jax.checkpoint` on the scanned body
  gives activation rematerialization (the role of the reference's
  `--act-ckpt` HF gradient checkpointing, reference: dense.py:29-32).
* The attention callable is injected: the engine passes the Pallas tree
  kernel (closure over mask metadata), the dense baseline passes causal
  metadata, and CPU tests pass the jnp reference. The model operates on a
  packed token layout [n] with explicit position ids (= trie depths;
  the reference gets positions implicitly from KV-cache offsets).
* Norms, RoPE, and softmax statistics run in fp32; matmuls in the param dtype
  (bf16 on TPU).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "Qwen3Config",
    "MODEL_CONFIGS",
    "init_params",
    "forward_hidden",
    "forward_hidden_aux",
    "moe_apply",
    "logits_from_hidden",
    "lm_head_weight",
]


@dataclasses.dataclass(frozen=True)
class Qwen3Config:
    vocab_size: int = 151936
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    tie_word_embeddings: bool = True
    # Qwen2.5 variants (reference supports both generations,
    # reference: tree_training_engine.py:104-106): no per-head q/k RMSNorm,
    # biases on the q/k/v projections (not o_proj).
    use_qk_norm: bool = True
    attention_bias: bool = False
    # Qwen3-MoE variants (beyond the reference's dense-only sweep): sparse
    # SwiGLU experts with softmax top-k routing, per HF Qwen3Moe.
    num_experts: int = 0  # 0 = dense MLP
    num_experts_per_tok: int = 8
    moe_intermediate_size: int = 768
    norm_topk_prob: bool = True
    # GShard-style per-expert capacity = cap_factor · n·k/E (tokens past it
    # are dropped, standard for static-shape TPU MoE); raise for exactness.
    moe_capacity_factor: float = 1.5
    router_aux_coef: float = 0.001  # load-balance aux loss weight (0 = off)
    # Rope scaling (beyond the reference's Qwen-only support):
    # "llama3" rescales inv_freq by wavelength band (HF llama3 rope_init);
    # "yarn" is NTK-by-parts interpolation + attention-factor cos/sin scale
    # (HF yarn rope_init — the published long-context Qwen3 recipe,
    # factor 4 × 32768 → 131072 positions)
    rope_scaling: str | None = None  # None, "llama3", or "yarn"
    rope_factor: float = 8.0
    rope_low_freq_factor: float = 1.0  # llama3 only
    rope_high_freq_factor: float = 4.0  # llama3 only
    rope_original_max_position: int = 8192
    rope_beta_fast: float = 32.0  # yarn only
    rope_beta_slow: float = 1.0  # yarn only
    rope_attention_factor: float | None = None  # yarn; None = 0.1·ln(f)+1

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    @property
    def group(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @property
    def rope_scaling_tuple(self):
        """Hashable tagged rope-scaling spec for rope_tables (None = unscaled)."""
        if self.rope_scaling is None:
            return None
        if self.rope_scaling == "llama3":
            return ("llama3", self.rope_factor, self.rope_low_freq_factor,
                    self.rope_high_freq_factor, self.rope_original_max_position)
        if self.rope_scaling == "yarn":
            import math

            att = self.rope_attention_factor
            if att is None:
                att = (0.1 * math.log(self.rope_factor) + 1.0
                       if self.rope_factor > 1 else 1.0)
            return ("yarn", self.rope_factor, self.rope_beta_fast,
                    self.rope_beta_slow, self.rope_original_max_position,
                    float(att))
        raise ValueError(f"unknown rope_scaling {self.rope_scaling!r}")


# Published Qwen3 dense family configs (the reference's sweep models,
# reference: exp/exp_tree.py:4-9 + the 0.6B parity model, run.py:246-250).
MODEL_CONFIGS: dict[str, Qwen3Config] = {
    # tiny config for CPU tests / CLI smoke runs (not a published model)
    "qwen3-tiny": Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=True,
    ),
    "qwen3-0.6b": Qwen3Config(
        hidden_size=1024, intermediate_size=3072, num_hidden_layers=28,
        num_attention_heads=16, num_key_value_heads=8, tie_word_embeddings=True,
    ),
    "qwen3-1.7b": Qwen3Config(
        hidden_size=2048, intermediate_size=6144, num_hidden_layers=28,
        num_attention_heads=16, num_key_value_heads=8, tie_word_embeddings=True,
    ),
    "qwen3-4b": Qwen3Config(
        hidden_size=2560, intermediate_size=9728, num_hidden_layers=36,
        num_attention_heads=32, num_key_value_heads=8, tie_word_embeddings=True,
    ),
    "qwen3-8b": Qwen3Config(
        hidden_size=4096, intermediate_size=12288, num_hidden_layers=36,
        num_attention_heads=32, num_key_value_heads=8, tie_word_embeddings=False,
    ),
    "qwen3-14b": Qwen3Config(
        hidden_size=5120, intermediate_size=17408, num_hidden_layers=40,
        num_attention_heads=40, num_key_value_heads=8, tie_word_embeddings=False,
    ),
    "qwen3-tiny-yarn": Qwen3Config(  # CPU-test config for yarn rope scaling
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=True,
        rope_scaling="yarn", rope_factor=4.0, rope_original_max_position=64,
    ),
    # Long-context Qwen3 (the published recipe: yarn factor 4 over the
    # 32768 native window -> 131072 positions, per the Qwen3 model cards)
    "qwen3-0.6b-128k": Qwen3Config(
        hidden_size=1024, intermediate_size=3072, num_hidden_layers=28,
        num_attention_heads=16, num_key_value_heads=8, tie_word_embeddings=True,
        rope_scaling="yarn", rope_factor=4.0,
        rope_original_max_position=32768,
    ),
    "qwen3-4b-128k": Qwen3Config(
        hidden_size=2560, intermediate_size=9728, num_hidden_layers=36,
        num_attention_heads=32, num_key_value_heads=8, tie_word_embeddings=True,
        rope_scaling="yarn", rope_factor=4.0,
        rope_original_max_position=32768,
    ),
    # Qwen2.5 dense family (published configs)
    "qwen2.5-0.5b": Qwen3Config(
        hidden_size=896, intermediate_size=4864, num_hidden_layers=24,
        num_attention_heads=14, num_key_value_heads=2, head_dim=64,
        tie_word_embeddings=True, use_qk_norm=False, attention_bias=True,
    ),
    "qwen2.5-1.5b": Qwen3Config(
        hidden_size=1536, intermediate_size=8960, num_hidden_layers=28,
        num_attention_heads=12, num_key_value_heads=2, head_dim=128,
        tie_word_embeddings=True, use_qk_norm=False, attention_bias=True,
    ),
    "qwen2.5-7b": Qwen3Config(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
        head_dim=128, tie_word_embeddings=False, use_qk_norm=False,
        attention_bias=True,
    ),
    # Qwen3 MoE family (published configs; beyond-reference model family)
    "qwen3-moe-tiny": Qwen3Config(  # CPU-test config, not a published model
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=True,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
    ),
    "qwen3-30b-a3b": Qwen3Config(
        hidden_size=2048, intermediate_size=6144, num_hidden_layers=48,
        num_attention_heads=32, num_key_value_heads=4, head_dim=128,
        tie_word_embeddings=False,
        num_experts=128, num_experts_per_tok=8, moe_intermediate_size=768,
    ),
    "qwen3-moe-demo": Qwen3Config(  # single-chip MoE bench config (~0.8B
        # total, ~0.25B active) — NOT a published model
        hidden_size=1024, intermediate_size=3072, num_hidden_layers=12,
        num_attention_heads=16, num_key_value_heads=8, head_dim=128,
        tie_word_embeddings=True,
        num_experts=32, num_experts_per_tok=4, moe_intermediate_size=512,
    ),
    # Llama-3 family (published configs; beyond-reference model family —
    # no q/k norm, no qkv bias, llama3 rope scaling, rms eps 1e-5)
    "llama-tiny": Qwen3Config(  # CPU-test config, not a published model
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=True, use_qk_norm=False,
        rms_norm_eps=1e-5, rope_theta=500_000.0, rope_scaling="llama3",
        rope_factor=8.0, rope_original_max_position=64,
    ),
    "llama-3.2-1b": Qwen3Config(
        vocab_size=128256, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        head_dim=64, tie_word_embeddings=True, use_qk_norm=False,
        rms_norm_eps=1e-5, rope_theta=500_000.0, rope_scaling="llama3",
        rope_factor=32.0,
    ),
    "llama-3.2-3b": Qwen3Config(
        vocab_size=128256, hidden_size=3072, intermediate_size=8192,
        num_hidden_layers=28, num_attention_heads=24, num_key_value_heads=8,
        head_dim=128, tie_word_embeddings=True, use_qk_norm=False,
        rms_norm_eps=1e-5, rope_theta=500_000.0, rope_scaling="llama3",
        rope_factor=32.0,
    ),
    "llama-3.1-8b": Qwen3Config(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
        head_dim=128, tie_word_embeddings=False, use_qk_norm=False,
        rms_norm_eps=1e-5, rope_theta=500_000.0, rope_scaling="llama3",
        rope_factor=8.0,
    ),
}


# ----------------------------------------------------------------------- params


def init_params(config: Qwen3Config, key, dtype=jnp.bfloat16) -> dict:
    c = config
    d, dh = c.hidden_size, c.head_dim
    hq, hkv = c.num_attention_heads, c.num_key_value_heads
    L, I, V = c.num_hidden_layers, c.intermediate_size, c.vocab_size
    keys = jax.random.split(key, 8)

    def norm(*shape):
        return jnp.ones(shape, dtype)

    def dense(k, fan_in, *shape):
        return (jax.random.normal(k, shape, jnp.float32) * fan_in**-0.5).astype(dtype)

    layers = {
        "ln1": norm(L, d),
        "ln2": norm(L, d),
        "wq": dense(keys[1], d, L, d, hq * dh),
        "wk": dense(keys[2], d, L, d, hkv * dh),
        "wv": dense(keys[3], d, L, d, hkv * dh),
        "wo": dense(keys[4], hq * dh, L, hq * dh, d),
    }
    if c.is_moe:
        E, Ie = c.num_experts, c.moe_intermediate_size
        ek = jax.random.split(keys[5], 4)
        layers["router"] = dense(ek[0], d, L, d, E)
        layers["e_gate"] = dense(ek[1], d, L, E, d, Ie)
        layers["e_up"] = dense(ek[2], d, L, E, d, Ie)
        layers["e_down"] = dense(ek[3], Ie, L, E, Ie, d)
    else:
        layers["gate"] = dense(keys[5], d, L, d, I)
        layers["up"] = dense(keys[6], d, L, d, I)
        layers["down"] = dense(keys[7], I, L, I, d)
    if c.use_qk_norm:
        layers["q_norm"] = norm(L, dh)
        layers["k_norm"] = norm(L, dh)
    if c.attention_bias:
        layers["bq"] = jnp.zeros((L, hq * dh), dtype)
        layers["bk"] = jnp.zeros((L, hkv * dh), dtype)
        layers["bv"] = jnp.zeros((L, hkv * dh), dtype)
    params = {
        "embed": dense(keys[0], d, V, d),  # scaled like HF init ~N(0, 0.02)-ish
        "layers": layers,
        "final_norm": norm(d),
    }
    if not c.tie_word_embeddings:
        params["lm_head"] = dense(jax.random.split(keys[0])[0], d, d, V)
    return params


def lm_head_weight(params: dict, config: Qwen3Config) -> jnp.ndarray:
    """[d, V] LM head; transposed embedding when tied."""
    if config.tie_word_embeddings:
        return params["embed"].T
    return params["lm_head"]


# ---------------------------------------------------------------------- helpers


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(x.dtype)


def rope_tables(positions: jnp.ndarray, head_dim: int, theta: float,
                scaling: tuple | None = None):
    """(cos, sin) [n, head_dim] in fp32, HF rotate-half layout.

    `scaling` is a tagged tuple from Qwen3Config.rope_scaling_tuple:

    * ("llama3", factor, low_freq_factor, high_freq_factor, original_max) —
      Llama-3.1's wavelength-banded inv_freq rescale (HF
      ROPE_INIT_FUNCTIONS["llama3"]): long wavelengths divide by `factor`,
      short ones stay, the band between interpolates smoothly;
    * ("yarn", factor, beta_fast, beta_slow, original_max, attention_factor)
      — YaRN NTK-by-parts (HF ROPE_INIT_FUNCTIONS["yarn"], the published
      long-context Qwen3 recipe): per-dim blend of interpolated
      (inv_freq/factor) and extrapolated inv_freq over the correction range,
      with cos/sin scaled by `attention_factor`."""
    import math

    half = head_dim // 2
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )  # [half]
    att = 1.0
    if scaling is not None and scaling[0] == "llama3":
        _, factor, lo, hi, orig = scaling
        wavelen = 2.0 * jnp.pi / inv_freq
        low_wavelen = orig / lo
        high_wavelen = orig / hi
        smooth = (orig / wavelen - lo) / (hi - lo)
        mid = (1.0 - smooth) * (inv_freq / factor) + smooth * inv_freq
        inv_freq = jnp.where(
            wavelen > low_wavelen,
            inv_freq / factor,
            jnp.where(wavelen < high_wavelen, inv_freq, mid),
        )
    elif scaling is not None and scaling[0] == "yarn":
        _, factor, beta_fast, beta_slow, orig, att = scaling
        dim = 2 * half  # rotary dim

        def corr_dim(rot):
            return (dim * math.log(orig / (rot * 2 * math.pi))) / (
                2 * math.log(theta)
            )

        low = max(math.floor(corr_dim(beta_fast)), 0)
        high = min(math.ceil(corr_dim(beta_slow)), dim - 1)
        ramp = jnp.clip(
            (jnp.arange(half, dtype=jnp.float32) - low)
            / max(high - low, 1e-3),
            0.0, 1.0,
        )
        extrap_factor = 1.0 - ramp
        inv_freq = (inv_freq / factor) * (1.0 - extrap_factor) + (
            inv_freq * extrap_factor
        )
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [n, half]
    angles = jnp.concatenate([angles, angles], axis=-1)  # [n, dh]
    return jnp.cos(angles) * att, jnp.sin(angles) * att


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [n, H, dh]; cos/sin: [n, dh]."""
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    out = xf * cos[:, None, :] + rotated * sin[:, None, :]
    return out.astype(x.dtype)


# -------------------------------------------------------------------------- MoE


def moe_apply(
    h: jnp.ndarray,  # [n, d]
    e_gate: jnp.ndarray,  # [E_local, d, Ie]
    e_up: jnp.ndarray,  # [E_local, d, Ie]
    e_down: jnp.ndarray,  # [E_local, Ie, d]
    idx: jnp.ndarray,  # [n, k] int32 — LOCAL expert ids (may be out of range
    #                     under expert parallelism: those entries are skipped)
    w: jnp.ndarray,  # [n, k] f32 routing weights
    capacity: int,
) -> jnp.ndarray:
    """Sort-based capacity dispatch → batched expert GEMMs → weighted combine.

    TPU-first formulation: instead of ragged per-expert token lists, the
    (token, choice) pairs are argsorted by expert, ranked within their
    expert, and scattered into a static [E, capacity, d] buffer (GShard-style
    token dropping past capacity). The three expert GEMMs are then single
    batched einsums on the MXU. Everything has static shapes."""
    n, d = h.shape
    E_local = e_gate.shape[0]
    k = idx.shape[1]
    nk = n * k
    flat_e = idx.reshape(-1)
    flat_w = w.reshape(-1)
    in_range = (flat_e >= 0) & (flat_e < E_local)
    sort_key = jnp.where(in_range, flat_e, E_local)  # off-rank → tail bucket
    order = jnp.argsort(sort_key, stable=True)
    sorted_e = jnp.take(sort_key, order)
    starts = jnp.searchsorted(sorted_e, jnp.arange(E_local))  # [E_local]
    rank = jnp.arange(nk) - jnp.take(
        starts, jnp.clip(sorted_e, 0, E_local - 1)
    )
    keep = (sorted_e < E_local) & (rank < capacity)
    slot = jnp.where(
        keep,
        jnp.clip(sorted_e, 0, E_local - 1) * capacity + rank,
        E_local * capacity,  # overflow slot, never read back
    )
    tok = order // k
    xs = jnp.take(h, tok, axis=0)  # [nk, d]
    buf = (
        jnp.zeros((E_local * capacity + 1, d), h.dtype)
        .at[slot]
        .add(xs * keep[:, None].astype(h.dtype))
    )
    buf = buf[:-1].reshape(E_local, capacity, d)
    a = jnp.einsum("ecd,edi->eci", buf, e_gate)
    b = jnp.einsum("ecd,edi->eci", buf, e_up)
    act = jax.nn.silu(a.astype(jnp.float32)).astype(b.dtype) * b
    out = jnp.einsum("eci,eid->ecd", act, e_down).reshape(E_local * capacity, d)
    ys = jnp.take(out, jnp.minimum(slot, E_local * capacity - 1), axis=0)
    ys = ys.astype(jnp.float32) * (keep * jnp.take(flat_w, order))[:, None]
    return jnp.zeros((n, d), jnp.float32).at[tok].add(ys).astype(h.dtype)


def moe_route(h, router, config: Qwen3Config, valid=None, stat_axes=()):
    """Router + top-k + load-balance loss, shared by every EP flavor.

    Returns (w [n,k] f32, idx [n,k] i32, lb scalar). With `valid` (a [n]
    0/1 float mask), padding rows are excluded from the lb statistics AND
    from dispatch (their idx becomes E — out of every rank's range — so they
    never occupy expert capacity). Aux loss is the Switch/GShard
    load-balance term E · Σ_e f_e·P̄_e (HF Qwen3Moe's
    load_balancing_loss_func equivalent, masked like its attention_mask
    path).

    `stat_axes`: mesh axis names to pool the lb statistics over (used under
    sequence parallelism, where each rank routes a slice of the SAME packed
    trie — the counts/probs sums psum over "seq" so the lb term matches the
    unsharded computation instead of a sum of per-shard terms)."""
    c = config
    n = h.shape[0]
    E, k = c.num_experts, c.num_experts_per_tok
    logits = jnp.dot(h, router, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)  # [n, E] fp32
    w, idx = jax.lax.top_k(probs, k)
    if c.norm_topk_prob:
        w = w / jnp.sum(w, axis=-1, keepdims=True)
    if valid is None:
        counts = jnp.zeros((E,), jnp.float32).at[idx.reshape(-1)].add(1.0)
        n_eff = jnp.float32(n)
        prob_sum = jnp.sum(probs, axis=0)
    else:
        m = valid.astype(jnp.float32)
        idx = jnp.where(valid[:, None] > 0, idx, E)  # OOB scatter updates drop
        counts = jnp.zeros((E,), jnp.float32).at[idx.reshape(-1)].add(
            jnp.repeat(m, k)
        )
        n_eff = jnp.sum(m)
        prob_sum = jnp.sum(probs * m[:, None], axis=0)
    for ax in stat_axes:
        counts = jax.lax.psum(counts, ax)
        n_eff = jax.lax.psum(n_eff, ax)
        prob_sum = jax.lax.psum(prob_sum, ax)
    n_eff = jnp.maximum(n_eff, 1.0)
    lb = E * jnp.sum((counts / (n_eff * k)) * (prob_sum / n_eff))
    return w, idx, lb


def _moe_block(h: jnp.ndarray, lp: dict, config: Qwen3Config, valid=None):
    """Router + top-k + dispatch. Returns (mlp_out [n, d], lb_loss scalar)."""
    import math

    c = config
    n, _ = h.shape
    E, k = c.num_experts, c.num_experts_per_tok
    w, idx, lb = moe_route(h, lp["router"], c, valid)
    cap = int(math.ceil(c.moe_capacity_factor * n * k / E))
    y = moe_apply(h, lp["e_gate"], lp["e_up"], lp["e_down"], idx, w, cap)
    return y, lb


# ---------------------------------------------------------------------- forward

AttnFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _layer(x, lp, cos, sin, config: Qwen3Config, attn_fn: AttnFn, valid=None,
           fused_qk: bool = False):
    c = config
    n, d = x.shape
    dh = c.head_dim
    hq, hkv = c.num_attention_heads, c.num_key_value_heads
    eps = c.rms_norm_eps

    # --- attention block
    h = rms_norm(x, lp["ln1"], eps)
    q = h @ lp["wq"]
    k = h @ lp["wk"]
    v = h @ lp["wv"]
    if c.attention_bias:
        q = q + lp["bq"]
        k = k + lp["bk"]
        v = v + lp["bv"]
    if fused_qk:
        # one Pallas pass for norm+rope+head-major transpose (+ analytic
        # custom_vjp backward) instead of ~a dozen VPU-bound XLA fusions —
        # ops/qk_prep.py
        from dynamictreeattn_tpu.ops.qk_prep import qkv_prep

        qw = lp["q_norm"] if c.use_qk_norm else jnp.ones((dh,), x.dtype)
        kw = lp["k_norm"] if c.use_qk_norm else jnp.ones((dh,), x.dtype)
        qt, kt, vt = qkv_prep(q, k, v, qw, kw, cos, sin, eps, c.use_qk_norm)
        o = attn_fn(qt, kt, vt)  # [hq, n, dh]
    else:
        q = q.reshape(n, hq, dh)
        k = k.reshape(n, hkv, dh)
        v = v.reshape(n, hkv, dh)
        if c.use_qk_norm:
            q = rms_norm(q, lp["q_norm"], eps)  # per-head RMS over head_dim
            k = rms_norm(k, lp["k_norm"], eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        o = attn_fn(
            q.transpose(1, 0, 2), k.transpose(1, 0, 2), v.transpose(1, 0, 2)
        )  # [hq, n, dh]
    o = o.transpose(1, 0, 2).reshape(n, hq * dh)
    x = x + o @ lp["wo"]

    # --- MLP block
    h = rms_norm(x, lp["ln2"], eps)
    if c.is_moe:
        y, lb = _moe_block(h, lp, c, valid)
        x = x + y.astype(x.dtype)
        return x, lb
    act = jax.nn.silu((h @ lp["gate"]).astype(jnp.float32)).astype(h.dtype)
    x = x + (act * (h @ lp["up"])) @ lp["down"]
    return x, jnp.float32(0)


def forward_hidden_aux(
    params: dict,
    config: Qwen3Config,
    tokens: jnp.ndarray,  # [n] int32
    positions: jnp.ndarray,  # [n] int32 (trie depths / sequence positions)
    attn_fn: AttnFn,
    remat: bool = False,
    remat_policy: str | None = None,
    remat_segments: int = 0,
    valid=None,
    fused_qk: bool = False,
):
    """(hidden [n, d], aux) — aux["lb_loss"] is the summed router
    load-balance loss over layers (0 for dense models). `valid` ([n] 0/1
    mask) excludes padding rows from MoE routing stats and capacity."""
    c = config
    x = jnp.take(params["embed"], tokens, axis=0)
    cos, sin = rope_tables(positions, c.head_dim, c.rope_theta,
                           c.rope_scaling_tuple)

    body = functools.partial(_layer, config=c, attn_fn=attn_fn, valid=valid,
                             fused_qk=fused_qk)

    def scan_fn(carry, lp):
        x, lb = carry
        x, lb_i = body(x, lp, cos, sin)
        return (x, lb + lb_i), None

    carry = (x, jnp.float32(0))
    if remat and remat_segments:
        # nested (√L-style) checkpointing: the plain remat'd scan still saves
        # one [n, d] carry per layer; two checkpointed scan levels save
        # G + L/G carries at the cost of one extra forward per layer
        L = c.num_hidden_layers
        G = remat_segments
        assert L % G == 0, f"{L=} not divisible by {remat_segments=}"
        S = L // G
        seg_params = jax.tree.map(
            lambda a: a.reshape(G, S, *a.shape[1:]), params["layers"]
        )
        inner = jax.checkpoint(
            scan_fn, prevent_cse=False, policy=_remat_policy(remat_policy)
        )

        def seg_fn(carry, sp):
            out, _ = jax.lax.scan(inner, carry, sp)
            return out, None

        seg_fn = jax.checkpoint(seg_fn, prevent_cse=False)
        (x, lb), _ = jax.lax.scan(seg_fn, carry, seg_params)
    else:
        if remat:
            scan_fn = jax.checkpoint(
                scan_fn, prevent_cse=False, policy=_remat_policy(remat_policy)
            )
        (x, lb), _ = jax.lax.scan(scan_fn, carry, params["layers"])
    hidden = rms_norm(x, params["final_norm"], c.rms_norm_eps)
    return hidden, {"lb_loss": lb}


def forward_hidden(
    params: dict,
    config: Qwen3Config,
    tokens: jnp.ndarray,
    positions: jnp.ndarray,
    attn_fn: AttnFn,
    remat: bool = False,
    remat_policy: str | None = None,
    remat_segments: int = 0,
    valid=None,
    fused_qk: bool = False,
) -> jnp.ndarray:
    """Returns final-norm'd hidden states [n, d] (LM head applied separately
    so losses can fuse it — ops/losses.py)."""
    hidden, _ = forward_hidden_aux(
        params, config, tokens, positions, attn_fn,
        remat=remat, remat_policy=remat_policy, remat_segments=remat_segments,
        valid=valid, fused_qk=fused_qk,
    )
    return hidden


def _remat_policy(name: str | None):
    """None: full recompute (min memory). "dots": save matmul outputs so the
    backward skips re-running the FLOP-heavy ops. "attn": save the tree-
    attention kernel outputs (o, lse) so the fwd kernel runs once per step,
    not twice — ~O(n·Hq·dh) extra memory per layer. "attn_dots": both."""
    if name is None:
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "attn":
        return jax.checkpoint_policies.save_only_these_names(
            "tree_attn_o", "tree_attn_lse"
        )
    if name == "attn_dots":
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.save_only_these_names(
                "tree_attn_o", "tree_attn_lse"
            ),
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    raise ValueError(f"unknown remat policy {name!r}")


def logits_from_hidden(params, config, hidden: jnp.ndarray) -> jnp.ndarray:
    """[n, V] fp32 logits — test/debug path; training uses the fused loss."""
    w = lm_head_weight(params, config)
    return jnp.dot(hidden, w, preferred_element_type=jnp.float32)
