"""Model family: functional JAX Qwen3 (dense, the reference's benchmark family).

The reference delegates model forward to HF transformers + FlashAttention-3
(reference: run.py:199-204, tree_training_engine.py:182-186). Here the model is
a pure-functional JAX implementation designed for pjit sharding and a pluggable
attention callable (tree kernel / dense causal / reference)."""

from dynamictreeattn_tpu.models.qwen3 import (
    Qwen3Config,
    MODEL_CONFIGS,
    init_params,
    forward_hidden,
    forward_hidden_aux,
    moe_apply,
    logits_from_hidden,
)

from dynamictreeattn_tpu.models.generate import generate, generate_grouped, init_cache

__all__ = [
    "Qwen3Config",
    "MODEL_CONFIGS",
    "init_params",
    "forward_hidden",
    "forward_hidden_aux",
    "moe_apply",
    "logits_from_hidden",
    "generate",
    "generate_grouped",
    "init_cache",
]
