"""JAX Qwen3 vs HF transformers Qwen3ForCausalLM parity (CPU, fp32).

The strongest available oracle without network access: identical weights in
both frameworks must give identical logits on causal sequences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamictreeattn_tpu.models import (
    Qwen3Config,
    forward_hidden,
    init_params,
    logits_from_hidden,
)
from dynamictreeattn_tpu.models.hf_compat import hf_config, to_hf_state_dict
from dynamictreeattn_tpu.ops import tree_attention_reference

TINY = Qwen3Config(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    tie_word_embeddings=True,
)


def _causal_attn_fn(n):
    ld = jnp.full((n,), n - 1, dtype=jnp.int32)  # single chain == causal

    def attn(q, k, v):
        return tree_attention_reference(q, k, v, ld)

    return attn


@pytest.mark.parametrize("tie", [True, False])
def test_logits_match_hf(tie):
    import torch
    from transformers.models.qwen3 import Qwen3ForCausalLM

    cfg = TINY if tie else Qwen3Config(
        **{**TINY.__dict__, "tie_word_embeddings": False}
    )
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)

    n = 24
    tokens = np.array([3, 7, 11, 2, 9] * 5, dtype=np.int32)[:n] % cfg.vocab_size
    positions = jnp.arange(n, dtype=jnp.int32)

    hidden = forward_hidden(
        params, cfg, jnp.asarray(tokens), positions, _causal_attn_fn(n)
    )
    ours = np.asarray(logits_from_hidden(params, cfg, hidden))

    hf_model = Qwen3ForCausalLM(hf_config(cfg)).eval()
    sd = {k: torch.from_numpy(np.array(v)) for k, v in to_hf_state_dict(params, cfg).items()}
    missing, unexpected = hf_model.load_state_dict(sd, strict=False)
    assert not [m for m in missing if "rotary" not in m], missing
    assert not unexpected, unexpected
    with torch.no_grad():
        theirs = hf_model(torch.from_numpy(tokens[None].astype(np.int64))).logits[0]
    theirs = theirs.float().numpy()

    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_tree_forward_consistent_with_sequence_replay():
    """Model over a packed trie == model over each sequence independently.

    This is the model-level version of the engine parity oracle: every
    sequence's hidden states inside the trie must equal a standalone causal
    run of that sequence (positions = depths, tree mask = ancestors)."""
    from dynamictreeattn_tpu.tries import TokenTrie, flatten_trie

    cfg = TINY
    params = init_params(cfg, jax.random.key(1), dtype=jnp.float32)

    seqs = [
        np.array([5, 9, 3, 4, 8], dtype=np.int32),
        np.array([5, 9, 3, 7], dtype=np.int32),
        np.array([5, 2], dtype=np.int32),
        np.array([1, 2, 3], dtype=np.int32),
    ]
    trie = TokenTrie(seqs, [{} for _ in seqs])
    packed = flatten_trie(trie)
    n = packed.n_tokens
    ld = jnp.asarray(packed.last_desc)

    def tree_attn(q, k, v):
        return tree_attention_reference(q, k, v, ld)

    hidden_tree = forward_hidden(
        params, cfg,
        jnp.asarray(packed.tokens), jnp.asarray(packed.depth), tree_attn,
    )
    logits_tree = np.asarray(logits_from_hidden(params, cfg, hidden_tree))

    for s_idx in range(len(packed.seq_batch_ids)):
        bid = int(packed.seq_batch_ids[s_idx])
        path = packed.seq_path(s_idx)
        seq = seqs[bid]
        m = len(seq)
        hidden_seq = forward_hidden(
            params, cfg,
            jnp.asarray(seq), jnp.arange(m, dtype=jnp.int32), _causal_attn_fn(m),
        )
        logits_seq = np.asarray(logits_from_hidden(params, cfg, hidden_seq))
        np.testing.assert_allclose(
            logits_tree[path], logits_seq, rtol=2e-4, atol=2e-4,
            err_msg=f"sequence {bid}",
        )


def test_remat_matches_no_remat():
    cfg = TINY
    params = init_params(cfg, jax.random.key(2), dtype=jnp.float32)
    n = 16
    tokens = jnp.arange(n, dtype=jnp.int32) % cfg.vocab_size
    pos = jnp.arange(n, dtype=jnp.int32)
    attn = _causal_attn_fn(n)

    def loss(params, remat):
        h = forward_hidden(params, cfg, tokens, pos, attn, remat=remat)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            # remat reorders fusions; tiny absolute drift on near-zero grads
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        ),
        g0,
        g1,
    )


def test_qwen25_logits_match_hf():
    """Qwen2.5 generation: no q/k-norm, qkv biases (reference supports both
    generations, reference: tree_training_engine.py:104-106)."""
    import torch
    from transformers.models.qwen2 import Qwen2ForCausalLM

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=True,
        use_qk_norm=False, attention_bias=True,
    )
    params = init_params(cfg, jax.random.key(5), dtype=jnp.float32)
    # non-trivial biases
    import numpy as _np

    rng = _np.random.default_rng(0)
    for b in ("bq", "bk", "bv"):
        params["layers"][b] = jnp.asarray(
            rng.normal(size=params["layers"][b].shape).astype(_np.float32) * 0.1
        )

    n = 20
    tokens = np.arange(n, dtype=np.int32) * 5 % cfg.vocab_size
    hidden = forward_hidden(
        params, cfg, jnp.asarray(tokens), jnp.arange(n, dtype=jnp.int32),
        _causal_attn_fn(n),
    )
    ours = np.asarray(logits_from_hidden(params, cfg, hidden))

    hf_model = Qwen2ForCausalLM(hf_config(cfg)).eval()
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in to_hf_state_dict(params, cfg).items()}
    missing, unexpected = hf_model.load_state_dict(sd, strict=False)
    assert not missing, missing
    assert not unexpected, unexpected
    with torch.no_grad():
        theirs = hf_model(torch.from_numpy(tokens[None].astype(np.int64))).logits[0]
    np.testing.assert_allclose(ours, theirs.float().numpy(), rtol=2e-4, atol=2e-4)


def test_llama_logits_match_hf():
    """Llama-3 family (beyond-reference): no q/k-norm, no biases, llama3
    wavelength-banded rope scaling must match HF's rope_init exactly."""
    import torch
    from transformers.models.llama import LlamaForCausalLM

    from dynamictreeattn_tpu.models import MODEL_CONFIGS

    cfg = MODEL_CONFIGS["llama-tiny"]
    params = init_params(cfg, jax.random.key(6), dtype=jnp.float32)

    n = 20
    tokens = np.arange(n, dtype=np.int32) * 7 % cfg.vocab_size
    hidden = forward_hidden(
        params, cfg, jnp.asarray(tokens), jnp.arange(n, dtype=jnp.int32),
        _causal_attn_fn(n),
    )
    ours = np.asarray(logits_from_hidden(params, cfg, hidden))

    hf_model = LlamaForCausalLM(hf_config(cfg)).eval()
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in to_hf_state_dict(params, cfg).items()}
    missing, unexpected = hf_model.load_state_dict(sd, strict=False)
    assert not [m for m in missing if "rotary" not in m], missing
    assert not unexpected, unexpected
    with torch.no_grad():
        theirs = hf_model(torch.from_numpy(tokens[None].astype(np.int64))).logits[0]
    np.testing.assert_allclose(ours, theirs.float().numpy(), rtol=2e-4, atol=2e-4)


def test_yarn_logits_match_hf():
    """Long-context Qwen3 (beyond-reference): YaRN NTK-by-parts rope scaling
    + attention-factor cos/sin scale must match HF's yarn rope_init exactly
    (positions pushed past the original window so scaling matters)."""
    import torch
    from transformers.models.qwen3 import Qwen3ForCausalLM

    from dynamictreeattn_tpu.models import MODEL_CONFIGS

    cfg = MODEL_CONFIGS["qwen3-tiny-yarn"]
    params = init_params(cfg, jax.random.key(8), dtype=jnp.float32)

    n = 96  # > rope_original_max_position=64: exercises the scaled regime
    tokens = np.arange(n, dtype=np.int32) * 5 % cfg.vocab_size
    hidden = forward_hidden(
        params, cfg, jnp.asarray(tokens), jnp.arange(n, dtype=jnp.int32),
        _causal_attn_fn(n),
    )
    ours = np.asarray(logits_from_hidden(params, cfg, hidden))

    hf_model = Qwen3ForCausalLM(hf_config(cfg)).eval()
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in to_hf_state_dict(params, cfg).items()}
    missing, unexpected = hf_model.load_state_dict(sd, strict=False)
    assert not [m for m in missing if "rotary" not in m], missing
    assert not unexpected, unexpected
    with torch.no_grad():
        theirs = hf_model(torch.from_numpy(tokens[None].astype(np.int64))).logits[0]
    np.testing.assert_allclose(ours, theirs.float().numpy(), rtol=2e-4, atol=2e-4)


def test_nested_remat_matches_plain():
    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=True,
    )
    params = init_params(cfg, jax.random.key(9), dtype=jnp.float32)
    n = 16
    tokens = jnp.arange(n, dtype=jnp.int32) % cfg.vocab_size
    pos = jnp.arange(n, dtype=jnp.int32)
    attn = _causal_attn_fn(n)

    def loss(params, segs):
        h = forward_hidden(params, cfg, tokens, pos, attn, remat=True,
                           remat_segments=segs)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    g0 = jax.grad(lambda p: loss(p, 0))(params)
    g1 = jax.grad(lambda p: loss(p, 2))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        ),
        g0, g1,
    )
