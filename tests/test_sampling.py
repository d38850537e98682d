"""Logit-filter parity vs HuggingFace's logits processors (CPU).

The reference delegates sampling to its host RL framework (reference:
README.md:4-5), so HF's TopK/TopP/MinP warpers are the parity oracle for
ops/sampling.py. Filters must select the exact same token set; masked-out
positions differ only in the fill value (-1e30 vs -inf), which categorical
sampling cannot distinguish.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamictreeattn_tpu.ops.sampling import filter_logits

torch = pytest.importorskip("torch")
tfm = pytest.importorskip("transformers")


def _keep_sets(ours, theirs):
    ok = np.asarray(ours) > -1e29
    tk = np.asarray(theirs) > -1e29  # HF fills with -inf (or min-dtype)
    np.testing.assert_array_equal(ok, tk)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("k", [1, 5, 50])
def test_top_k_matches_hf(seed, k):
    rng = np.random.default_rng(seed)
    lg = rng.standard_normal((4, 257)).astype(np.float32) * 3
    ours = filter_logits(jnp.asarray(lg), top_k=k)
    hf = tfm.TopKLogitsWarper(top_k=k, filter_value=-float("inf"))(
        None, torch.tensor(lg)
    )
    _keep_sets(ours, hf.numpy())


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("p", [0.1, 0.5, 0.9, 0.99])
def test_top_p_matches_hf(seed, p):
    rng = np.random.default_rng(seed)
    lg = rng.standard_normal((4, 257)).astype(np.float32) * 3
    ours = filter_logits(jnp.asarray(lg), top_p=p)
    hf = tfm.TopPLogitsWarper(top_p=p, filter_value=-float("inf"),
                              min_tokens_to_keep=1)(None, torch.tensor(lg))
    _keep_sets(ours, hf.numpy())


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("mp", [0.02, 0.1, 0.5])
def test_min_p_matches_hf(seed, mp):
    rng = np.random.default_rng(seed)
    lg = rng.standard_normal((4, 257)).astype(np.float32) * 3
    ours = filter_logits(jnp.asarray(lg), min_p=mp)
    hf = tfm.MinPLogitsWarper(min_p=mp, filter_value=-float("inf"))(
        None, torch.tensor(lg)
    )
    _keep_sets(ours, hf.numpy())


def test_combined_filters_and_sampling():
    """Chained k→p→min_p keeps ≥1 token per row and categorical sampling
    only ever draws kept tokens."""
    rng = np.random.default_rng(3)
    lg = jnp.asarray(rng.standard_normal((8, 101)).astype(np.float32) * 5)
    out = filter_logits(lg, top_k=20, top_p=0.8, min_p=0.05)
    kept = np.asarray(out) > -1e29
    assert kept.sum(axis=-1).min() >= 1
    toks = jax.random.categorical(
        jax.random.key(0), jnp.broadcast_to(out, (64, *out.shape)), axis=-1
    )
    toks = np.asarray(toks)
    for r in range(lg.shape[0]):
        assert kept[r, np.unique(toks[:, r])].all()


def test_generate_with_filters_runs():
    """End-to-end: both samplers accept the knobs (tiny model, CPU)."""
    from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params
    from dynamictreeattn_tpu.models.generate import generate, generate_grouped

    mc = MODEL_CONFIGS["qwen3-tiny"]
    params = init_params(mc, jax.random.key(0), dtype=jnp.float32)
    prompts = np.full((2, 8), 3, np.int32)
    lens = np.array([8, 5], np.int32)
    out = generate(params, mc, prompts, lens, 4, top_k=5, top_p=0.9,
                   min_p=0.05)
    assert out.shape == (2, 4)
    outg = generate_grouped(params, mc, prompts, lens, group=3, max_new=4,
                            top_k=5, top_p=0.9, min_p=0.05)
    assert outg.shape == (2, 3, 4)
    # filters at top_k=1 == greedy (argmax), both samplers
    g1 = generate(params, mc, prompts, lens, 4, top_k=1)
    gg = generate(params, mc, prompts, lens, 4, greedy=True)
    np.testing.assert_array_equal(g1, gg)
