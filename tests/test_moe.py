"""Qwen3-MoE tests: dispatch oracle, engine training, expert parallelism.

Beyond-reference capability (the reference sweeps dense Qwen3 only,
reference: exp/exp_tree.py:4-9); oracles are dense per-expert loops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine
from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params, moe_apply
from dynamictreeattn_tpu.tries import TokenTrie

from helpers import random_trie_batch

MOE = MODEL_CONFIGS["qwen3-moe-tiny"]

ECFG = EngineConfig(
    block_q=32, block_kv=32, remat=False, attn_backend="reference", loss_chunk=32
)


def _dense_moe_oracle(h, e_gate, e_up, e_down, idx, w):
    """Loop-over-experts dense compute (no capacity): the exact math."""
    n, d = h.shape
    y = np.zeros((n, d), np.float32)
    for t in range(n):
        for j in range(idx.shape[1]):
            e = int(idx[t, j])
            a = h[t] @ e_gate[e]
            b = h[t] @ e_up[e]
            act = a / (1.0 + np.exp(-a)) * b  # silu(a) * b
            y[t] += float(w[t, j]) * (act @ e_down[e])
    return y


def test_moe_apply_matches_dense_oracle():
    rng = np.random.default_rng(0)
    n, d, E, k, Ie = 16, 8, 4, 2, 6
    h = rng.normal(size=(n, d)).astype(np.float32)
    e_gate = rng.normal(size=(E, d, Ie)).astype(np.float32) * 0.3
    e_up = rng.normal(size=(E, d, Ie)).astype(np.float32) * 0.3
    e_down = rng.normal(size=(E, Ie, d)).astype(np.float32) * 0.3
    idx = rng.integers(0, E, size=(n, k)).astype(np.int32)
    # distinct experts per token (top_k never repeats); weights sum to 1
    idx[:, 1] = (idx[:, 0] + 1 + idx[:, 1] % (E - 1)) % E
    w = rng.uniform(0.1, 1.0, size=(n, k)).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)

    y = moe_apply(
        jnp.asarray(h), jnp.asarray(e_gate), jnp.asarray(e_up),
        jnp.asarray(e_down), jnp.asarray(idx), jnp.asarray(w),
        capacity=n * k,  # no drops
    )
    np.testing.assert_allclose(
        np.asarray(y), _dense_moe_oracle(h, e_gate, e_up, e_down, idx, w),
        rtol=2e-4, atol=2e-5,
    )


def test_moe_apply_capacity_drops_are_clean():
    """Over-capacity tokens drop to zero contribution (no NaN, no garbage)."""
    rng = np.random.default_rng(1)
    n, d, E, k, Ie = 12, 8, 2, 1, 4
    h = rng.normal(size=(n, d)).astype(np.float32)
    e_gate = rng.normal(size=(E, d, Ie)).astype(np.float32)
    e_up = rng.normal(size=(E, d, Ie)).astype(np.float32)
    e_down = rng.normal(size=(E, Ie, d)).astype(np.float32)
    idx = np.zeros((n, k), np.int32)  # everyone wants expert 0
    w = np.ones((n, k), np.float32)
    cap = 4
    y = np.asarray(moe_apply(
        jnp.asarray(h), jnp.asarray(e_gate), jnp.asarray(e_up),
        jnp.asarray(e_down), jnp.asarray(idx), jnp.asarray(w), capacity=cap,
    ))
    assert np.all(np.isfinite(y))
    kept = np.abs(y).sum(axis=1) > 0
    assert kept.sum() == cap  # first `cap` (token, choice) pairs survive
    assert np.all(kept[:cap]) and not np.any(kept[cap:])


def test_moe_engine_loss_grad_and_descent():
    rng = np.random.default_rng(2)
    seqs, attachs = random_trie_batch(rng, n_seqs=6, vocab=MOE.vocab_size, max_len=20)
    trie = TokenTrie(seqs, attachs)
    engine = TreeEngine(MOE, ECFG)
    params = init_params(MOE, jax.random.key(0), dtype=jnp.float32)
    batch = engine.prepare(trie)
    loss, grads, aux = engine.loss_and_grad(params, batch)
    assert np.isfinite(float(loss))
    assert "lb_loss" in aux and float(aux["lb_loss"]) > 0
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # router + experts actually receive gradient
    assert float(jnp.abs(grads["layers"]["router"]).max()) > 0
    assert float(jnp.abs(grads["layers"]["e_gate"]).max()) > 0

    # few SGD steps on the fixed batch must descend
    lr = 1e-2
    p = params
    losses = []
    for _ in range(5):
        l, g, _ = engine.loss_and_grad(p, batch)
        losses.append(float(l))
        p = jax.tree.map(lambda a, b: a - lr * b, p, g)
    assert losses[-1] < losses[0]


def test_moe_tree_matches_dense_replay():
    """The grad-parity oracle (reference's core test) holds for MoE too."""
    from dynamictreeattn_tpu.engine import pack_sequences_dense
    from dynamictreeattn_tpu.utils import compare_grads

    rng = np.random.default_rng(3)
    seqs, attachs = random_trie_batch(rng, n_seqs=5, vocab=MOE.vocab_size, max_len=18)
    # exactness requires (a) no token drops — ample capacity — and (b) no
    # router aux term: the lb loss legitimately differs between packings
    # (dense replays shared-prefix tokens, changing the routed multiset)
    import dataclasses

    mc = dataclasses.replace(
        MOE, moe_capacity_factor=float(MOE.num_experts), router_aux_coef=0.0
    )
    engine = TreeEngine(mc, ECFG)
    params = init_params(mc, jax.random.key(1), dtype=jnp.float32)
    tree_b = engine.prepare(TokenTrie(seqs, attachs))
    dense_b = engine.prepare(
        pack_sequences_dense(seqs, attachs, pad_multiple=ECFG.pad_multiple)
    )
    lt, gt, _ = engine.loss_and_grad(params, tree_b)
    ld, gd, _ = engine.loss_and_grad(params, dense_b)
    np.testing.assert_allclose(float(lt), float(ld), rtol=1e-5)
    rows = compare_grads(jax.device_get(gd), jax.device_get(gt))
    assert rows[0][1] < 1e-3, rows[:3]


@pytest.mark.parametrize("dp,tp", [(1, 2), (2, 2)])
def test_moe_expert_parallel_matches_single_device(dp, tp):
    """EP over "model": sharded step == single-chip engine (loss + grads).

    Token drops are identical on both sides (same stable dispatch order per
    expert), so default capacity is exact parity."""
    from dynamictreeattn_tpu.parallel import (
        make_mesh, make_train_step, shard_params, stack_batches,
    )
    from dynamictreeattn_tpu.utils import compare_grads

    rng = np.random.default_rng(7)
    tries = []
    for _ in range(dp):
        seqs, attachs = random_trie_batch(
            rng, n_seqs=6, vocab=MOE.vocab_size, max_len=20
        )
        tries.append(TokenTrie(seqs, attachs))
    mesh = make_mesh(dp=dp, tp=tp)
    params = init_params(MOE, jax.random.key(0), dtype=jnp.float32)
    step = make_train_step(MOE, mesh, ECFG)
    batch = stack_batches(tries, ECFG)
    loss, grads, aux = step(shard_params(params, mesh, MOE), batch.arrays)

    engine = TreeEngine(MOE, ECFG)
    total_loss, total_grads = 0.0, None
    for t in tries:
        l, g, _ = engine.loss_and_grad(params, engine.prepare(t))
        total_loss += float(l)
        total_grads = g if total_grads is None else jax.tree.map(
            jnp.add, total_grads, g
        )
    np.testing.assert_allclose(float(loss), total_loss, rtol=1e-4)
    rows = compare_grads(total_grads, jax.device_get(grads))
    assert rows[0][1] < 1e-3, rows[:3]


@pytest.mark.parametrize("dp,tp", [(2, 1), (2, 2), (4, 2)])
def test_moe_ep_a2a_matches_single_device(dp, tp):
    """EP over "data" (token all-to-all dispatch): sharded step == summed
    single-chip engine. Ample capacity so neither side drops tokens (the
    two-stage a2a capacity ranks pairs globally, the single-chip oracle
    per rank — only drop-free runs are bit-comparable)."""
    import dataclasses

    from dynamictreeattn_tpu.parallel import (
        make_mesh, make_train_step, shard_params, stack_batches,
    )
    from dynamictreeattn_tpu.utils import compare_grads

    cfg = dataclasses.replace(MOE, moe_capacity_factor=float(MOE.num_experts))
    rng = np.random.default_rng(11)
    tries = []
    for _ in range(dp):
        seqs, attachs = random_trie_batch(
            rng, n_seqs=6, vocab=cfg.vocab_size, max_len=20
        )
        tries.append(TokenTrie(seqs, attachs))
    mesh = make_mesh(dp=dp, tp=tp)
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    step = make_train_step(cfg, mesh, ECFG, ep=True)
    batch = stack_batches(tries, ECFG)
    loss, grads, aux = step(
        shard_params(params, mesh, cfg, ep=dp), batch.arrays
    )

    engine = TreeEngine(cfg, ECFG)
    total_loss, total_grads = 0.0, None
    for t in tries:
        l, g, _ = engine.loss_and_grad(params, engine.prepare(t))
        total_loss += float(l)
        total_grads = g if total_grads is None else jax.tree.map(
            jnp.add, total_grads, g
        )
    np.testing.assert_allclose(float(loss), total_loss, rtol=1e-4)
    rows = compare_grads(total_grads, jax.device_get(grads))
    assert rows[0][1] < 1e-3, rows[:3]


@pytest.mark.parametrize("schedule", ["gpipe", "1f1b"])
def test_moe_pipeline_matches_single_device(schedule):
    """MoE × pipeline (both schedules): per-stage router lb seeding must
    reproduce the oracle loss + grads (ample capacity → no drops)."""
    import dataclasses

    from dynamictreeattn_tpu.parallel import (
        make_mesh, make_pp_train_step, shard_params_pp, stack_microbatches,
    )
    from dynamictreeattn_tpu.utils import compare_grads

    cfg = dataclasses.replace(
        MOE, moe_capacity_factor=float(MOE.num_experts), router_aux_coef=0.01
    )
    rng = np.random.default_rng(41)
    M = 3
    row = [
        TokenTrie(*random_trie_batch(rng, n_seqs=5, vocab=cfg.vocab_size, max_len=20))
        for _ in range(M)
    ]
    mesh = make_mesh(dp=1, tp=2, pp=2)
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    step = make_pp_train_step(cfg, mesh, ECFG, schedule=schedule)
    batch = stack_microbatches([row], ECFG)
    loss, grads, aux = step(shard_params_pp(params, mesh, cfg), batch.arrays)

    engine = TreeEngine(cfg, ECFG)
    total_loss, total_grads, total_lb = 0.0, None, 0.0
    for t in row:
        l, g, a = engine.loss_and_grad(params, engine.prepare(t))
        total_loss += float(l)
        total_lb += float(a["lb_loss"])
        total_grads = g if total_grads is None else jax.tree.map(
            jnp.add, total_grads, g
        )
    np.testing.assert_allclose(float(loss), total_loss, rtol=1e-4)
    np.testing.assert_allclose(float(aux["lb_loss"]), total_lb, rtol=1e-4)
    rows = compare_grads(total_grads, jax.device_get(grads))
    assert rows[0][1] < 1e-3, rows[:3]


@pytest.mark.parametrize("dp,sp,tp", [(1, 2, 1), (2, 2, 1)])
def test_moe_ulysses_sp_matches_single_device(dp, sp, tp):
    """MoE × Ulysses sequence parallelism: the router load-balance loss must
    use GLOBAL statistics (counts/probs psum'd over "seq"), not a sum of
    per-shard lb terms — loss, lb aux, and grads all match the single-device
    oracle (ample capacity → no drops)."""
    import dataclasses

    from dynamictreeattn_tpu.parallel import (
        make_mesh, make_train_step, shard_params, stack_batches,
    )
    from dynamictreeattn_tpu.utils import compare_grads

    cfg = dataclasses.replace(
        MOE, moe_capacity_factor=float(MOE.num_experts), router_aux_coef=0.01
    )
    rng = np.random.default_rng(23)
    tries = [
        TokenTrie(*random_trie_batch(rng, n_seqs=6, vocab=cfg.vocab_size,
                                     max_len=20))
        for _ in range(dp)
    ]
    mesh = make_mesh(dp=dp, tp=tp, sp=sp)
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    step = make_train_step(cfg, mesh, ECFG)
    batch = stack_batches(tries, ECFG, sp=sp)
    loss, grads, aux = step(shard_params(params, mesh, cfg), batch.arrays)

    engine = TreeEngine(cfg, ECFG)
    total_loss, total_grads, total_lb = 0.0, None, 0.0
    for t in tries:
        l, g, a = engine.loss_and_grad(params, engine.prepare(t))
        total_loss += float(l)
        total_lb += float(a["lb_loss"])
        total_grads = g if total_grads is None else jax.tree.map(
            jnp.add, total_grads, g
        )
    np.testing.assert_allclose(float(loss), total_loss, rtol=1e-4)
    np.testing.assert_allclose(float(aux["lb_loss"]), total_lb, rtol=1e-4)
    rows = compare_grads(total_grads, jax.device_get(grads))
    assert rows[0][1] < 1e-3, rows[:3]


def test_moe_logits_match_hf():
    """JAX MoE forward == HF Qwen3MoeForCausalLM on the same weights.

    HF computes experts exactly (no capacity), so the JAX side gets ample
    capacity for this check."""
    import dataclasses

    import torch
    from transformers.models.qwen3_moe import Qwen3MoeForCausalLM

    from dynamictreeattn_tpu.models.hf_compat import hf_config, to_hf_state_dict
    from dynamictreeattn_tpu.models.qwen3 import (
        forward_hidden, logits_from_hidden,
    )

    cfg = dataclasses.replace(MOE, moe_capacity_factor=float(MOE.num_experts))
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)

    n = 24
    tokens = np.array([3, 7, 11, 2, 9] * 5, dtype=np.int32)[:n] % cfg.vocab_size
    positions = jnp.arange(n, dtype=jnp.int32)

    def causal_attn(q, k, v):
        from dynamictreeattn_tpu.ops.tree_attention_ref import (
            tree_attention_reference,
        )
        last = jnp.full((n,), n - 1, dtype=jnp.int32)
        return tree_attention_reference(q, k, v, last)

    hidden = forward_hidden(
        params, cfg, jnp.asarray(tokens), positions, causal_attn
    )
    ours = np.asarray(logits_from_hidden(params, cfg, hidden))

    hf_model = Qwen3MoeForCausalLM(hf_config(cfg)).eval()
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in to_hf_state_dict(params, cfg).items()}
    missing, unexpected = hf_model.load_state_dict(sd, strict=False)
    assert not [m for m in missing if "rotary" not in m], missing
    assert not unexpected, unexpected
    with torch.no_grad():
        theirs = hf_model(torch.from_numpy(tokens[None].astype(np.int64))).logits[0]
    np.testing.assert_allclose(ours, theirs.float().numpy(), rtol=2e-4, atol=2e-4)
