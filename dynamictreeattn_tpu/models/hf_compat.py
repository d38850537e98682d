"""Bridges between this framework's Qwen3 params and HF transformers layout.

Used for (a) loading real pretrained checkpoints from HF safetensors
directories, and (b) the CPU parity test that proves the JAX model is the same
function as HF's Qwen3ForCausalLM (the model the reference trains through,
reference: run.py:199-204).

HF nn.Linear stores weights [out, in]; this framework stores [in, out].
"""

from __future__ import annotations

import numpy as np

from dynamictreeattn_tpu.models.qwen3 import Qwen3Config

__all__ = ["to_hf_state_dict", "from_hf_state_dict", "load_hf_checkpoint", "hf_config"]


def hf_config(config: Qwen3Config):
    """Build the matching transformers config (Qwen3 or Qwen2 generation)."""
    common = dict(
        vocab_size=config.vocab_size,
        hidden_size=config.hidden_size,
        intermediate_size=config.intermediate_size,
        num_hidden_layers=config.num_hidden_layers,
        num_attention_heads=config.num_attention_heads,
        num_key_value_heads=config.num_key_value_heads,
        rms_norm_eps=config.rms_norm_eps,
        rope_theta=config.rope_theta,
        tie_word_embeddings=config.tie_word_embeddings,
    )
    if config.is_moe:
        from transformers.models.qwen3_moe import Qwen3MoeConfig as HFQwen3MoeConfig

        assert config.use_qk_norm and not config.attention_bias
        return HFQwen3MoeConfig(
            head_dim=config.head_dim,
            attention_bias=False,
            num_experts=config.num_experts,
            num_experts_per_tok=config.num_experts_per_tok,
            moe_intermediate_size=config.moe_intermediate_size,
            norm_topk_prob=config.norm_topk_prob,
            decoder_sparse_step=1,
            mlp_only_layers=[],
            **common,
        )
    if config.use_qk_norm:
        from transformers.models.qwen3 import Qwen3Config as HFQwen3Config

        assert not config.attention_bias
        rope_scaling = None
        if config.rope_scaling is not None:
            # long-context Qwen3 ships yarn scaling (HF rope_type "yarn")
            assert config.rope_scaling == "yarn", config.rope_scaling
            rope_scaling = {
                "rope_type": "yarn",
                "factor": config.rope_factor,
                "beta_fast": config.rope_beta_fast,
                "beta_slow": config.rope_beta_slow,
                "original_max_position_embeddings":
                    config.rope_original_max_position,
            }
            if config.rope_attention_factor is not None:
                rope_scaling["attention_factor"] = config.rope_attention_factor
        return HFQwen3Config(
            head_dim=config.head_dim, attention_bias=False,
            rope_scaling=rope_scaling,
            max_position_embeddings=max(
                40960, int(config.rope_factor *
                           config.rope_original_max_position)
            ),
            **common,
        )
    if not config.attention_bias:
        # Llama-3: no q/k norm, no biases, optional llama3 rope scaling
        from transformers.models.llama import LlamaConfig as HFLlamaConfig

        rope_scaling = None
        if config.rope_scaling is not None:
            rope_scaling = {
                "rope_type": config.rope_scaling,
                "factor": config.rope_factor,
                "low_freq_factor": config.rope_low_freq_factor,
                "high_freq_factor": config.rope_high_freq_factor,
                "original_max_position_embeddings":
                    config.rope_original_max_position,
            }
        return HFLlamaConfig(
            head_dim=config.head_dim, attention_bias=False, mlp_bias=False,
            rope_scaling=rope_scaling, **common,
        )
    # Qwen2.5: derived head_dim, hardwired qkv biases
    from transformers.models.qwen2 import Qwen2Config as HFQwen2Config

    assert config.head_dim * config.num_attention_heads == config.hidden_size
    assert config.attention_bias
    return HFQwen2Config(**common)


def to_hf_state_dict(params: dict, config: Qwen3Config) -> dict:
    """Numpy state dict in HF Qwen3ForCausalLM naming."""
    c = config
    lp = params["layers"]
    out = {"model.embed_tokens.weight": np.asarray(params["embed"], np.float32)}
    for i in range(c.num_hidden_layers):
        pre = f"model.layers.{i}."
        out[pre + "input_layernorm.weight"] = np.asarray(lp["ln1"][i], np.float32)
        out[pre + "post_attention_layernorm.weight"] = np.asarray(
            lp["ln2"][i], np.float32
        )
        out[pre + "self_attn.q_proj.weight"] = np.asarray(lp["wq"][i], np.float32).T
        out[pre + "self_attn.k_proj.weight"] = np.asarray(lp["wk"][i], np.float32).T
        out[pre + "self_attn.v_proj.weight"] = np.asarray(lp["wv"][i], np.float32).T
        out[pre + "self_attn.o_proj.weight"] = np.asarray(lp["wo"][i], np.float32).T
        if "q_norm" in lp:
            out[pre + "self_attn.q_norm.weight"] = np.asarray(lp["q_norm"][i], np.float32)
            out[pre + "self_attn.k_norm.weight"] = np.asarray(lp["k_norm"][i], np.float32)
        if "bq" in lp:
            out[pre + "self_attn.q_proj.bias"] = np.asarray(lp["bq"][i], np.float32)
            out[pre + "self_attn.k_proj.bias"] = np.asarray(lp["bk"][i], np.float32)
            out[pre + "self_attn.v_proj.bias"] = np.asarray(lp["bv"][i], np.float32)
        if c.is_moe:
            out[pre + "mlp.gate.weight"] = np.asarray(lp["router"][i], np.float32).T
            for e in range(c.num_experts):
                ep = pre + f"mlp.experts.{e}."
                out[ep + "gate_proj.weight"] = np.asarray(
                    lp["e_gate"][i, e], np.float32
                ).T
                out[ep + "up_proj.weight"] = np.asarray(
                    lp["e_up"][i, e], np.float32
                ).T
                out[ep + "down_proj.weight"] = np.asarray(
                    lp["e_down"][i, e], np.float32
                ).T
        else:
            out[pre + "mlp.gate_proj.weight"] = np.asarray(lp["gate"][i], np.float32).T
            out[pre + "mlp.up_proj.weight"] = np.asarray(lp["up"][i], np.float32).T
            out[pre + "mlp.down_proj.weight"] = np.asarray(lp["down"][i], np.float32).T
    out["model.norm.weight"] = np.asarray(params["final_norm"], np.float32)
    if c.tie_word_embeddings:
        out["lm_head.weight"] = out["model.embed_tokens.weight"]
    else:
        out["lm_head.weight"] = np.asarray(params["lm_head"], np.float32).T
    return out


def from_hf_state_dict(sd: dict, config: Qwen3Config, dtype=None) -> dict:
    """Inverse of to_hf_state_dict. `sd` values: numpy-convertible arrays."""
    import jax.numpy as jnp

    c = config
    dtype = dtype or jnp.bfloat16

    def get(name):
        return np.asarray(sd[name], np.float32)

    def stack(fmt):
        return jnp.asarray(
            np.stack([get(fmt.format(i)) for i in range(c.num_hidden_layers)]), dtype
        )

    def stack_t(fmt):
        return jnp.asarray(
            np.stack(
                [get(fmt.format(i)).T for i in range(c.num_hidden_layers)]
            ),
            dtype,
        )

    layers = {
        "ln1": stack("model.layers.{}.input_layernorm.weight"),
        "ln2": stack("model.layers.{}.post_attention_layernorm.weight"),
        "wq": stack_t("model.layers.{}.self_attn.q_proj.weight"),
        "wk": stack_t("model.layers.{}.self_attn.k_proj.weight"),
        "wv": stack_t("model.layers.{}.self_attn.v_proj.weight"),
        "wo": stack_t("model.layers.{}.self_attn.o_proj.weight"),
    }
    if c.is_moe:
        layers["router"] = stack_t("model.layers.{}.mlp.gate.weight")

        def stack_experts(fmt):
            return jnp.asarray(
                np.stack([
                    np.stack([
                        get(fmt.format(i, e)).T for e in range(c.num_experts)
                    ])
                    for i in range(c.num_hidden_layers)
                ]),
                dtype,
            )

        layers["e_gate"] = stack_experts(
            "model.layers.{}.mlp.experts.{}.gate_proj.weight"
        )
        layers["e_up"] = stack_experts(
            "model.layers.{}.mlp.experts.{}.up_proj.weight"
        )
        layers["e_down"] = stack_experts(
            "model.layers.{}.mlp.experts.{}.down_proj.weight"
        )
    else:
        layers["gate"] = stack_t("model.layers.{}.mlp.gate_proj.weight")
        layers["up"] = stack_t("model.layers.{}.mlp.up_proj.weight")
        layers["down"] = stack_t("model.layers.{}.mlp.down_proj.weight")
    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "layers": layers,
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype),
    }
    if c.use_qk_norm:
        params["layers"]["q_norm"] = stack("model.layers.{}.self_attn.q_norm.weight")
        params["layers"]["k_norm"] = stack("model.layers.{}.self_attn.k_norm.weight")
    if c.attention_bias:
        params["layers"]["bq"] = stack("model.layers.{}.self_attn.q_proj.bias")
        params["layers"]["bk"] = stack("model.layers.{}.self_attn.k_proj.bias")
        params["layers"]["bv"] = stack("model.layers.{}.self_attn.v_proj.bias")
    if not c.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype)
    return params


def load_hf_checkpoint(path: str, config: Qwen3Config, dtype=None) -> dict:
    """Load params from a HF checkpoint directory (safetensors shards)."""
    import glob
    import os

    from safetensors.numpy import load_file

    sd = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors under {path}")
    for f in files:
        sd.update(load_file(f))
    if "lm_head.weight" not in sd and config.tie_word_embeddings:
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
    return from_hf_state_dict(sd, config, dtype)
