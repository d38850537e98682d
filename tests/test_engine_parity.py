"""THE flagship oracle: tree-engine grads == dense-replay grads.

Mirrors the reference's grad-parity protocol (reference: run.py:245-261 +
exp/compare_grads.py + committed grad/Qwen3-0.6B-TB-vs-DB-bf16.txt): the same
batch trained through the tree path and the dense per-sequence replay path
must produce (near-)identical losses and per-parameter gradients.

Here at fp32 on CPU the bar is much tighter than the reference's bf16 ~1e-1:
relative grad deviation must be < 1e-3."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine, pack_sequences_dense
from dynamictreeattn_tpu.models import Qwen3Config, init_params
from dynamictreeattn_tpu.tries import TokenTrie
from dynamictreeattn_tpu.utils import compare_grads

from helpers import random_trie_batch

TINY = Qwen3Config(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    tie_word_embeddings=True,
)

ECFG = EngineConfig(
    block_q=32, block_kv=32, remat=False, attn_backend="reference", loss_chunk=32
)


def _setup(seed=0, n_seqs=10):
    rng = np.random.default_rng(seed)
    seqs, attachs = random_trie_batch(rng, n_seqs=n_seqs, vocab=TINY.vocab_size, max_len=24)
    params = init_params(TINY, jax.random.key(seed), dtype=jnp.float32)
    engine = TreeEngine(TINY, ECFG)
    tree_batch = engine.prepare(TokenTrie(seqs, attachs))
    dense_batch = engine.prepare(
        pack_sequences_dense(seqs, attachs, pad_multiple=ECFG.pad_multiple)
    )
    return seqs, params, engine, tree_batch, dense_batch


def test_loss_and_grad_parity_tree_vs_dense():
    _, params, engine, tree_batch, dense_batch = _setup()
    assert tree_batch.packed.n_tokens < dense_batch.packed.n_tokens  # sharing exists

    loss_t, grads_t, aux_t = engine.loss_and_grad(params, tree_batch)
    loss_d, grads_d, aux_d = engine.loss_and_grad(params, dense_batch)

    np.testing.assert_allclose(float(loss_t), float(loss_d), rtol=1e-5)
    np.testing.assert_allclose(
        float(aux_t["sum_entropy"]), float(aux_d["sum_entropy"]), rtol=1e-5
    )
    rows = compare_grads(grads_d, grads_t)
    worst = rows[0]
    assert worst[1] < 1e-3, f"worst grad deviation {worst}"


def test_forward_per_sequence_logprobs_match_dense():
    seqs, params, engine, tree_batch, dense_batch = _setup(seed=1)
    lp_tree = engine.forward(params, tree_batch)
    lp_dense = engine.forward(params, dense_batch)
    assert set(lp_tree) == set(lp_dense) == set(range(len(seqs)))
    for bid in lp_tree:
        assert len(lp_tree[bid]) == len(seqs[bid]) - 1
        np.testing.assert_allclose(
            lp_tree[bid], lp_dense[bid], rtol=5e-4, atol=5e-4, err_msg=f"seq {bid}"
        )


def test_leafization_preserves_loss():
    """Interior-endpoint sequences (prefixes of others) must contribute loss
    identically whether leafized or not (reference: token_trie.py:13-49)."""
    rng = np.random.default_rng(7)
    seqs, attachs = random_trie_batch(rng, n_seqs=8, vocab=TINY.vocab_size, max_len=16)
    # force a strict-prefix relation
    seqs.append(seqs[0][: max(2, len(seqs[0]) // 2)])
    attachs.append({"w_logprobs": -1.0, "w_entropy": 0.1})
    params = init_params(TINY, jax.random.key(3), dtype=jnp.float32)
    engine = TreeEngine(TINY, ECFG)
    b_leaf = engine.prepare(TokenTrie(seqs, attachs, leafization=True))
    b_noleaf = engine.prepare(TokenTrie(seqs, attachs, leafization=False))
    l1, _ = engine.loss(params, b_leaf)
    l2, _ = engine.loss(params, b_noleaf)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_permutes_preserve_loss_and_grads():
    """Loss/grads must be invariant to the DFS leaf order (reference checks
    this via consistency across --permute policies, SURVEY.md §4)."""
    rng = np.random.default_rng(9)
    seqs, attachs = random_trie_batch(rng, n_seqs=10, vocab=TINY.vocab_size, max_len=20)
    params = init_params(TINY, jax.random.key(4), dtype=jnp.float32)
    engine = TreeEngine(TINY, ECFG)

    losses = []
    grads = []
    for perm in ["none", "forward", "backward", "random"]:
        trie = TokenTrie(seqs, attachs)
        if perm == "forward":
            trie.forward_permute()
        elif perm == "backward":
            trie.backward_permute()
        elif perm == "random":
            trie.random_permute(seed=5)
        loss, g, _ = engine.loss_and_grad(params, engine.prepare(trie))
        losses.append(float(loss))
        grads.append(g)
    for l in losses[1:]:
        np.testing.assert_allclose(l, losses[0], rtol=1e-5)
    for g in grads[1:]:
        rows = compare_grads(grads[0], g)
        assert rows[0][1] < 1e-3, rows[0]


def test_engine_edge_case_tries():
    """Degenerate inputs the reference's engine would hit in RL practice:
    one sequence, exact duplicates (leafization folds them), length-1
    sequences, and strict-prefix pairs."""
    mc = TINY
    ec = ECFG
    e = TreeEngine(mc, ec)
    p = init_params(mc, jax.random.key(0), dtype=jnp.float32)

    single = [np.array([5, 6, 7], np.int32)]
    dup = [np.array([5, 6, 7], np.int32), np.array([5, 6, 7], np.int32)]
    l1, _, _ = e.loss_and_grad(p, e.prepare(TokenTrie(single, [{}])))
    l2, _, _ = e.loss_and_grad(p, e.prepare(TokenTrie(dup, [{}, {}])))
    np.testing.assert_allclose(float(l2), 2 * float(l1), rtol=1e-6)

    for seqs in (
        [np.array([9], np.int32), np.array([9, 4], np.int32)],
        [np.array([5, 6], np.int32), np.array([5, 6, 7, 8], np.int32)],
    ):
        b = e.prepare(TokenTrie(seqs, [{} for _ in seqs]))
        l, _, _ = e.loss_and_grad(p, b)
        assert np.isfinite(float(l))
        fw = e.forward(p, b)
        assert sorted(fw) == list(range(len(seqs)))


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505])
def test_loss_parity_fuzz(seed):
    """Seeded fuzz of the core oracle: tree loss == dense-replay loss over
    varied random trie shapes (the reference validated exactly one workload;
    this sweeps branchy/short/long mixes)."""
    rng = np.random.default_rng(seed)
    n_seqs = int(rng.integers(3, 14))
    max_len = int(rng.integers(8, 40))
    seqs, attachs = random_trie_batch(
        rng, n_seqs=n_seqs, vocab=TINY.vocab_size, max_len=max_len
    )
    params = init_params(TINY, jax.random.key(seed), dtype=jnp.float32)
    engine = TreeEngine(TINY, ECFG)
    lt, _ = engine.loss(params, engine.prepare(TokenTrie(seqs, attachs)))
    ld, _ = engine.loss(params, engine.prepare(
        pack_sequences_dense(seqs, attachs, pad_multiple=ECFG.pad_multiple)
    ))
    np.testing.assert_allclose(float(lt), float(ld), rtol=1e-5)
