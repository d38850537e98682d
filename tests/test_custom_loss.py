"""Pluggable per-sequence loss functions (the reference's loss_fn contract).

Checks: (a) a custom linear loss reproduces the fast weighted path exactly,
(b) a nonlinear PPO-style loss runs and matches a dense-replay computation."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine, pack_sequences_dense
from dynamictreeattn_tpu.models import Qwen3Config, init_params
from dynamictreeattn_tpu.tries import TokenTrie

from helpers import random_trie_batch

TINY = Qwen3Config(
    vocab_size=128, hidden_size=64, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, tie_word_embeddings=True,
)
ECFG = EngineConfig(
    block_q=32, block_kv=32, remat=False, attn_backend="reference", loss_chunk=32
)


def _mask(lengths_like, n, length):
    return (jnp.arange(n) < length).astype(jnp.float32)


def linear_loss(lp, ent, extras, length):
    m_lp = (jnp.arange(lp.shape[0]) < length - 1).astype(jnp.float32)
    m_en = (jnp.arange(ent.shape[0]) < length).astype(jnp.float32)
    return (
        -1.0 * jnp.sum(lp * m_lp) / jnp.maximum(length - 1, 1)
        + 0.1 * jnp.sum(ent * m_en) / length
    )


def test_custom_linear_matches_fast_path():
    rng = np.random.default_rng(0)
    seqs, attachs = random_trie_batch(rng, n_seqs=10, vocab=TINY.vocab_size, max_len=24)
    params = init_params(TINY, jax.random.key(0), dtype=jnp.float32)
    engine = TreeEngine(TINY, ECFG)
    batch = engine.prepare(TokenTrie(seqs, attachs))

    loss_fast, grads_fast, _ = engine.loss_and_grad(params, batch)
    loss_c, grads_c = engine.loss_and_grad_custom(params, batch, linear_loss)
    np.testing.assert_allclose(float(loss_c), float(loss_fast), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        grads_fast, grads_c,
    )


def test_custom_loss_cache_no_stale_reuse_on_recycled_id():
    """Two sequentially-created closures must not collide in the jit cache,
    even when the GC recycles the first closure's id for the second
    (the id(loss_fn)-keyed cache is guarded by a weakref to the function)."""
    rng = np.random.default_rng(2)
    seqs, attachs = random_trie_batch(rng, n_seqs=6, vocab=TINY.vocab_size, max_len=16)
    params = init_params(TINY, jax.random.key(0), dtype=jnp.float32)
    engine = TreeEngine(TINY, ECFG)
    batch = engine.prepare(TokenTrie(seqs, attachs))

    def make(scale):
        def fn(lp, ent, extras, length):
            m = (jnp.arange(lp.shape[0]) < length - 1).astype(jnp.float32)
            return scale * jnp.sum(lp * m)

        return fn

    f1 = make(1.0)
    l1, _ = engine.loss_and_grad_custom(params, batch, f1)
    recycled = id(f1)
    del f1  # allow id reuse
    # create closures until one lands on the recycled id (usually immediate
    # in CPython); bail out gracefully if the allocator never reuses it
    f2 = None
    for _ in range(64):
        cand = make(2.0)
        if id(cand) == recycled:
            f2 = cand
            break
        # keep cand alive so the allocator must move on — drop at loop end
    if f2 is None:
        f2 = make(2.0)
    l2, _ = engine.loss_and_grad_custom(params, batch, f2)
    np.testing.assert_allclose(float(l2), 2.0 * float(l1), rtol=1e-5)


def test_ppo_style_loss_tree_vs_dense():
    """Nonlinear per-sequence loss (clipped ratio vs behavior logprobs):
    tree == dense replay."""
    rng = np.random.default_rng(1)
    seqs, attachs = random_trie_batch(rng, n_seqs=8, vocab=TINY.vocab_size, max_len=20)
    params = init_params(TINY, jax.random.key(1), dtype=jnp.float32)
    engine = TreeEngine(TINY, ECFG)

    t_batch = engine.prepare(TokenTrie(seqs, attachs))
    d_batch = engine.prepare(
        pack_sequences_dense(seqs, attachs, pad_multiple=ECFG.pad_multiple)
    )

    def extras_for(batch):
        # behavior logprobs + advantages aligned with the batch's seq order
        S = len(batch.packed.seq_batch_ids)
        lmax = int(batch.packed.seq_lens.max())
        rng2 = np.random.default_rng(7)
        table_lp = {int(b): rng2.normal(size=lmax - 1).astype(np.float32)
                    for b in sorted(set(int(x) for x in batch.packed.seq_batch_ids))}
        table_adv = {b: rng2.normal(size=lmax - 1).astype(np.float32)
                     for b in table_lp}
        # note rng2 order differs between batches; regenerate deterministically
        rng3 = np.random.default_rng(7)
        all_ids = sorted(table_lp)
        for b in all_ids:
            table_lp[b] = rng3.normal(size=lmax - 1).astype(np.float32)
        for b in all_ids:
            table_adv[b] = rng3.normal(size=lmax - 1).astype(np.float32)
        ids = [int(b) for b in batch.packed.seq_batch_ids]
        return {
            "behavior_lp": jnp.asarray(np.stack([table_lp[b] for b in ids])),
            "adv": jnp.asarray(np.stack([table_adv[b] for b in ids])),
        }

    def ppo_loss(lp, ent, extras, length):
        m = (jnp.arange(lp.shape[0]) < length - 1).astype(jnp.float32)
        ratio = jnp.exp(lp - extras["behavior_lp"])
        clipped = jnp.clip(ratio, 0.8, 1.2)
        obj = jnp.minimum(ratio * extras["adv"], clipped * extras["adv"])
        m_en = (jnp.arange(ent.shape[0]) < length).astype(jnp.float32)
        return -jnp.sum(obj * m) / jnp.maximum(length - 1, 1) + 0.01 * jnp.sum(
            ent * m_en
        ) / length

    # padded Lmax can differ between packings; force equal by construction
    assert int(t_batch.packed.seq_lens.max()) == int(d_batch.packed.seq_lens.max())

    lt, gt = engine.loss_and_grad_custom(params, t_batch, ppo_loss, extras_for(t_batch))
    ld, gd = engine.loss_and_grad_custom(params, d_batch, ppo_loss, extras_for(d_batch))
    np.testing.assert_allclose(float(lt), float(ld), rtol=1e-5)
    from dynamictreeattn_tpu.utils import compare_grads

    rows = compare_grads(gd, gt)
    assert rows[0][1] < 1e-3, rows[0]
