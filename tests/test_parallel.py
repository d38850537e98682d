"""Multi-device tests on the fake 8-device CPU mesh (SURVEY.md §4: the
reference never had multi-device tests; these validate DP+TP end to end)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine
from dynamictreeattn_tpu.models import Qwen3Config, init_params
from dynamictreeattn_tpu.engine import TreeEngine
from dynamictreeattn_tpu.parallel import (
    LB_by_DFS_and_TM,
    LB_by_n_tokens,
    LB_by_TM,
    TreeTimeModel,
    eval_bins,
    init_opt_state,
    make_mesh,
    make_train_step,
    shard_params,
    stack_batches,
)
from dynamictreeattn_tpu.tries import TokenTrie, trie_stats
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


def _tries(dp, seed=0):
    rng = np.random.default_rng(seed)
    tries, all_seqs = [], []
    for r in range(dp):
        seqs, attachs = random_trie_batch(rng, n_seqs=6, vocab=TINY.vocab_size, max_len=20)
        tries.append(TokenTrie(seqs, attachs))
        all_seqs.append((seqs, attachs))
    return tries, all_seqs


@pytest.mark.parametrize("dp,tp", [(2, 1), (1, 2), (2, 2), (4, 2)])
def test_sharded_step_matches_single_device(dp, tp):
    tries, all_seqs = _tries(dp)
    mesh = make_mesh(dp=dp, tp=tp)
    params = init_params(TINY, jax.random.key(0), dtype=jnp.float32)
    sharded = shard_params(params, mesh, TINY)
    step = make_train_step(TINY, mesh, ECFG)
    batch = stack_batches(tries, ECFG)
    loss, grads, aux = step(sharded, batch.arrays)

    # single-device oracle: sum over per-rank tries
    engine = TreeEngine(TINY, ECFG)
    total_loss = 0.0
    total_grads = None
    for t in tries:
        l, g, _ = engine.loss_and_grad(params, engine.prepare(t))
        total_loss += float(l)
        total_grads = g if total_grads is None else jax.tree.map(jnp.add, total_grads, g)

    np.testing.assert_allclose(float(loss), total_loss, rtol=1e-4)
    rows = compare_grads(total_grads, jax.device_get(grads))
    assert rows[0][1] < 1e-3, rows[0]


def test_optimizer_step_runs_sharded():
    import optax

    dp, tp = 2, 2
    tries, _ = _tries(dp, seed=3)
    mesh = make_mesh(dp=dp, tp=tp)
    params = init_params(TINY, jax.random.key(1), dtype=jnp.float32)
    sharded = shard_params(params, mesh, TINY)
    opt = optax.adamw(1e-3)
    opt_state = jax.jit(opt.init)(sharded)
    step = make_train_step(TINY, mesh, ECFG, optimizer=opt)
    batch = stack_batches(tries, ECFG)
    p1, opt_state, loss1, _ = step(sharded, opt_state, batch.arrays)
    p2, opt_state, loss2, _ = step(p1, opt_state, batch.arrays)
    assert float(loss2) < float(loss1)  # loss decreases on same batch


# enough kv heads that sp×tp can split them (Ulysses shards kv heads)
TINY4 = Qwen3Config(
    vocab_size=128, hidden_size=64, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
    head_dim=16, tie_word_embeddings=True,
)


@pytest.mark.parametrize("dp,sp,tp", [(1, 2, 1), (1, 2, 2), (2, 2, 2)])
def test_seq_parallel_step_matches_single_device(dp, sp, tp):
    """Ulysses SP: loss + grads == single-device oracle on the same tries."""
    rng = np.random.default_rng(13)
    tries = []
    for _ in range(dp):
        seqs, attachs = random_trie_batch(
            rng, n_seqs=6, vocab=TINY4.vocab_size, max_len=24
        )
        tries.append(TokenTrie(seqs, attachs))
    mesh = make_mesh(dp=dp, tp=tp, sp=sp)
    params = init_params(TINY4, jax.random.key(0), dtype=jnp.float32)
    step = make_train_step(TINY4, mesh, ECFG)
    batch = stack_batches(tries, ECFG, sp=sp)
    loss, grads, aux = step(shard_params(params, mesh, TINY4), batch.arrays)

    engine = TreeEngine(TINY4, ECFG)
    total_loss, total_grads = 0.0, None
    for t in tries:
        l, g, _ = engine.loss_and_grad(params, engine.prepare(t))
        total_loss += float(l)
        total_grads = g if total_grads is None else jax.tree.map(
            jnp.add, total_grads, g
        )
    np.testing.assert_allclose(float(loss), total_loss, rtol=1e-4)
    rows = compare_grads(total_grads, jax.device_get(grads))
    assert rows[0][1] < 1e-3, rows[0]


@pytest.mark.parametrize("dp,sp,tp", [(1, 2, 1), (1, 4, 2), (2, 2, 2)])
def test_ring_seq_parallel_step_matches_single_device(dp, sp, tp):
    """Ring SP: loss + grads == single-device oracle. sp=4 × tp=2 exceeds
    the Ulysses kv-head limit (4 kv heads / tp=2 = 2 < sp) — ring has no
    such constraint."""
    rng = np.random.default_rng(19)
    tries = []
    for _ in range(dp):
        seqs, attachs = random_trie_batch(
            rng, n_seqs=6, vocab=TINY4.vocab_size, max_len=24
        )
        tries.append(TokenTrie(seqs, attachs))
    mesh = make_mesh(dp=dp, tp=tp, sp=sp)
    params = init_params(TINY4, jax.random.key(0), dtype=jnp.float32)
    step = make_train_step(TINY4, mesh, ECFG, sp_mode="ring")
    batch = stack_batches(tries, ECFG, sp=sp, sp_mode="ring")
    loss, grads, aux = step(shard_params(params, mesh, TINY4), batch.arrays)

    engine = TreeEngine(TINY4, ECFG)
    total_loss, total_grads = 0.0, None
    for t in tries:
        l, g, _ = engine.loss_and_grad(params, engine.prepare(t))
        total_loss += float(l)
        total_grads = g if total_grads is None else jax.tree.map(
            jnp.add, total_grads, g
        )
    np.testing.assert_allclose(float(loss), total_loss, rtol=1e-4)
    rows = compare_grads(total_grads, jax.device_get(grads))
    assert rows[0][1] < 1e-3, rows[0]


def test_seq_parallel_with_fsdp():
    """SP × FSDP × TP compose: 2×2×2 mesh step matches the replicated step."""
    rng = np.random.default_rng(17)
    tries = []
    for _ in range(2):
        seqs, attachs = random_trie_batch(
            rng, n_seqs=6, vocab=TINY4.vocab_size, max_len=24
        )
        tries.append(TokenTrie(seqs, attachs))
    mesh = make_mesh(dp=2, tp=2, sp=2)
    params = init_params(TINY4, jax.random.key(0), dtype=jnp.float32)
    batch = stack_batches(tries, ECFG, sp=2)

    base = make_train_step(TINY4, mesh, ECFG)
    loss0, grads0, _ = base(shard_params(params, mesh, TINY4), batch.arrays)

    fstep = make_train_step(TINY4, mesh, ECFG, fsdp=True, fsdp_min_size=1)
    fsharded = shard_params(params, mesh, TINY4, fsdp=True, fsdp_min_size=1)
    loss1, grads1, _ = fstep(fsharded, batch.arrays)
    np.testing.assert_allclose(float(loss1), float(loss0), rtol=1e-5)
    rows = compare_grads(jax.device_get(grads0), jax.device_get(grads1))
    assert rows[0][1] < 1e-5, rows[0]


@pytest.mark.parametrize("dp,tp", [(2, 2), (4, 2), (4, 1)])
def test_fsdp_step_matches_replicated(dp, tp):
    """ZeRO-3 sharded step == replicated-param step (loss + full grads)."""
    tries, _ = _tries(dp, seed=7)
    mesh = make_mesh(dp=dp, tp=tp)
    params = init_params(TINY, jax.random.key(0), dtype=jnp.float32)
    # remat on so the per-layer all-gather sits inside jax.checkpoint
    ecfg = EngineConfig(
        block_q=32, block_kv=32, remat=True, attn_backend="reference",
        loss_chunk=32,
    )
    batch = stack_batches(tries, ecfg)

    base = make_train_step(TINY, mesh, ecfg)
    loss0, grads0, _ = base(shard_params(params, mesh, TINY), batch.arrays)

    fsharded = shard_params(params, mesh, TINY, fsdp=True, fsdp_min_size=1)
    # params must actually be sharded over "data"
    spec = fsharded["layers"]["wq"].sharding.spec
    assert any("data" in (p if isinstance(p, tuple) else (p,)) for p in spec if p)
    fstep = make_train_step(TINY, mesh, ecfg, fsdp=True, fsdp_min_size=1)
    loss1, grads1, _ = fstep(fsharded, batch.arrays)

    np.testing.assert_allclose(float(loss1), float(loss0), rtol=1e-5)
    rows = compare_grads(jax.device_get(grads0), jax.device_get(grads1))
    assert rows[0][1] < 1e-5, rows[0]


def test_fsdp_optimizer_state_is_sharded():
    import optax

    dp, tp = 4, 2
    tries, _ = _tries(dp, seed=11)
    mesh = make_mesh(dp=dp, tp=tp)
    params = init_params(TINY, jax.random.key(1), dtype=jnp.float32)
    fsharded = shard_params(params, mesh, TINY, fsdp=True, fsdp_min_size=1)
    opt = optax.adamw(1e-3)
    opt_state = init_opt_state(opt, fsharded)
    # adam moments inherit the ZeRO param sharding (ZeRO-1 for free)
    mu_wq = opt_state[0].mu["layers"]["wq"]
    assert "data" in jax.tree_util.tree_leaves(
        [p for p in mu_wq.sharding.spec if p is not None]
    )
    step = make_train_step(TINY, mesh, ECFG, optimizer=opt, fsdp=True, fsdp_min_size=1)
    batch = stack_batches(tries, ECFG)
    p1, opt_state, loss1, _ = step(fsharded, opt_state, batch.arrays)
    p2, opt_state, loss2, _ = step(p1, opt_state, batch.arrays)
    assert float(loss2) < float(loss1)


@pytest.mark.parametrize("dp,pp,tp,M", [(1, 2, 1, 3), (1, 2, 2, 2), (2, 2, 2, 2)])
def test_pipeline_step_matches_single_device(dp, pp, tp, M):
    """GPipe over "pipe": loss + grads == oracle summed over all microbatches."""
    from dynamictreeattn_tpu.parallel import (
        make_pp_train_step, shard_params_pp, stack_microbatches,
    )

    rng = np.random.default_rng(23)
    rows, flat_tries = [], []
    for _ in range(dp):
        row = []
        for _ in range(M):
            seqs, attachs = random_trie_batch(
                rng, n_seqs=5, vocab=TINY.vocab_size, max_len=20
            )
            row.append(TokenTrie(seqs, attachs))
        rows.append(row)
        flat_tries.extend(row)
    mesh = make_mesh(dp=dp, tp=tp, pp=pp)
    params = init_params(TINY, jax.random.key(0), dtype=jnp.float32)
    step = make_pp_train_step(TINY, mesh, ECFG)
    batch = stack_microbatches(rows, ECFG)
    loss, grads, aux = step(shard_params_pp(params, mesh, TINY), batch.arrays)

    engine = TreeEngine(TINY, ECFG)
    total_loss, total_grads = 0.0, None
    for t in flat_tries:
        l, g, _ = engine.loss_and_grad(params, engine.prepare(t))
        total_loss += float(l)
        total_grads = g if total_grads is None else jax.tree.map(
            jnp.add, total_grads, g
        )
    np.testing.assert_allclose(float(loss), total_loss, rtol=1e-4)
    rows_cmp = compare_grads(total_grads, jax.device_get(grads))
    assert rows_cmp[0][1] < 1e-3, rows_cmp[0]


@pytest.mark.parametrize("dp,pp,tp,M", [(1, 2, 1, 3), (1, 2, 2, 2), (1, 4, 1, 6)])
def test_pipeline_1f1b_matches_single_device(dp, pp, tp, M):
    """1F1B schedule: hand-written per-tick vjp backward must reproduce the
    oracle loss + grads exactly like the autodiff GPipe schedule."""
    from dynamictreeattn_tpu.parallel import (
        make_pp_train_step, shard_params_pp, stack_microbatches,
    )

    rng = np.random.default_rng(31)
    cfg = dataclasses.replace(TINY, num_hidden_layers=max(2, pp))
    rows, flat_tries = [], []
    for _ in range(dp):
        row = [
            TokenTrie(*random_trie_batch(
                rng, n_seqs=5, vocab=cfg.vocab_size, max_len=20
            ))
            for _ in range(M)
        ]
        rows.append(row)
        flat_tries.extend(row)
    mesh = make_mesh(dp=dp, tp=tp, pp=pp)
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    step = make_pp_train_step(cfg, mesh, ECFG, schedule="1f1b")
    batch = stack_microbatches(rows, ECFG)
    loss, grads, aux = step(shard_params_pp(params, mesh, cfg), batch.arrays)

    engine = TreeEngine(cfg, ECFG)
    total_loss, total_grads = 0.0, None
    for t in flat_tries:
        l, g, _ = engine.loss_and_grad(params, engine.prepare(t))
        total_loss += float(l)
        total_grads = g if total_grads is None else jax.tree.map(
            jnp.add, total_grads, g
        )
    np.testing.assert_allclose(float(loss), total_loss, rtol=1e-4)
    rows_cmp = compare_grads(total_grads, jax.device_get(grads))
    assert rows_cmp[0][1] < 1e-3, rows_cmp[0]


def test_pipeline_optimizer_descends():
    import optax

    from dynamictreeattn_tpu.parallel import (
        make_pp_train_step, shard_params_pp, stack_microbatches,
    )

    rng = np.random.default_rng(29)
    rows = [[
        TokenTrie(*random_trie_batch(rng, n_seqs=5, vocab=128, max_len=20))
        for _ in range(2)
    ]]
    mesh = make_mesh(dp=1, tp=2, pp=2)
    params = init_params(TINY, jax.random.key(1), dtype=jnp.float32)
    sharded = shard_params_pp(params, mesh, TINY)
    opt = optax.adamw(1e-3)
    opt_state = init_opt_state(opt, sharded)
    step = make_pp_train_step(TINY, mesh, ECFG, optimizer=opt)
    batch = stack_microbatches(rows, ECFG)
    p1, opt_state, loss1, _ = step(sharded, opt_state, batch.arrays)
    p2, opt_state, loss2, _ = step(p1, opt_state, batch.arrays)
    assert float(loss2) < float(loss1)


def test_time_model_nnls_recovers_linear_cost():
    rng = np.random.default_rng(0)
    tm = TreeTimeModel(min_points=16)
    true_c = np.array([5.0, 0.1, 0.0, 0.02, 0.001])
    recs = []
    for _ in range(64):
        seqs, _ = random_trie_batch(rng, n_seqs=8, max_len=30)
        t = TokenTrie(seqs, [{} for _ in seqs])
        s = trie_stats(t.lens, t.lcp_lens, mode="backward", block_size=16)
        feats = np.array([
            s["n_leaf_sequences"], s["n_tree_tokens"], s["n_f1_tokens"],
            s["sum_prefix_len"], s["sum_depth"],
        ], dtype=float)
        recs.append(dict(s, time=float(true_c @ feats)))
    tm.add_data(recs)
    assert tm.avg_rel_error() < 1e-6
    s = recs[0]
    np.testing.assert_allclose(tm.pred(s), s["time"], rtol=1e-6)


@pytest.mark.parametrize("K", [2, 4])
def test_load_balancers_partition_and_balance(K):
    rng = np.random.default_rng(1)
    seqs, _ = random_trie_batch(rng, n_seqs=24, max_len=40)
    tm = TreeTimeModel()  # cold-start: pred = n_tree_tokens

    for lb in (
        lambda: LB_by_n_tokens(seqs, K),
        lambda: LB_by_TM(seqs, tm, K, block_size=16),
        lambda: LB_by_DFS_and_TM(seqs, tm, K, block_size=16),
    ):
        bins = lb()
        assert len(bins) == K
        got = sorted(i for b in bins for i in b)
        assert got == list(range(len(seqs)))  # exact partition

    # TM-driven binning should not be (much) worse than token-count binning
    # under the cost model it optimizes.
    e_tok = eval_bins(seqs, LB_by_n_tokens(seqs, K), tm, block_size=16)
    e_tm = eval_bins(seqs, LB_by_TM(seqs, tm, K, block_size=16), tm, block_size=16)
    e_dfs = eval_bins(seqs, LB_by_DFS_and_TM(seqs, tm, K, block_size=16), tm, block_size=16)
    assert e_tm["makespan"] <= e_tok["makespan"] * 1.3
    assert e_dfs["makespan"] <= e_tok["makespan"] * 1.5


def test_sharded_step_qwen25_variant():
    """Bias + no-qk-norm (Qwen2.5) param layout shards correctly."""
    cfg25 = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=True,
        use_qk_norm=False, attention_bias=True,
    )
    rng = np.random.default_rng(21)
    tries = []
    all_params = init_params(cfg25, jax.random.key(2), dtype=jnp.float32)
    # non-trivial biases so their grads matter
    for b in ("bq", "bk", "bv"):
        all_params["layers"][b] = jnp.asarray(
            rng.normal(size=all_params["layers"][b].shape).astype(np.float32) * 0.1
        )
    for r in range(2):
        seqs, attachs = random_trie_batch(rng, n_seqs=5, vocab=128, max_len=16)
        tries.append(TokenTrie(seqs, attachs))
    mesh = make_mesh(dp=2, tp=2)
    sharded = shard_params(all_params, mesh, cfg25)
    step = make_train_step(cfg25, mesh, ECFG)
    batch = stack_batches(tries, ECFG)
    loss, grads, _ = step(sharded, batch.arrays)

    engine = TreeEngine(cfg25, ECFG)
    total_loss, total_grads = 0.0, None
    for t in tries:
        l, g, _ = engine.loss_and_grad(all_params, engine.prepare(t))
        total_loss += float(l)
        total_grads = g if total_grads is None else jax.tree.map(jnp.add, total_grads, g)
    np.testing.assert_allclose(float(loss), total_loss, rtol=1e-4)
    rows = compare_grads(total_grads, jax.device_get(grads))
    assert rows[0][1] < 1e-3, rows[0]


def test_ring_seq_parallel_with_fsdp():
    """Ring SP × FSDP × TP compose: 2×2×2 step matches the plain sharded step."""
    rng = np.random.default_rng(23)
    tries = []
    for _ in range(2):
        seqs, attachs = random_trie_batch(
            rng, n_seqs=6, vocab=TINY4.vocab_size, max_len=24
        )
        tries.append(TokenTrie(seqs, attachs))
    mesh = make_mesh(dp=2, tp=2, sp=2)
    params = init_params(TINY4, jax.random.key(0), dtype=jnp.float32)
    batch = stack_batches(tries, ECFG, sp=2, sp_mode="ring")

    base = make_train_step(TINY4, mesh, ECFG, sp_mode="ring")
    loss0, grads0, _ = base(shard_params(params, mesh, TINY4), batch.arrays)

    fstep = make_train_step(TINY4, mesh, ECFG, sp_mode="ring", fsdp=True,
                            fsdp_min_size=1)
    fsharded = shard_params(params, mesh, TINY4, fsdp=True, fsdp_min_size=1)
    loss1, grads1, _ = fstep(fsharded, batch.arrays)
    np.testing.assert_allclose(float(loss1), float(loss0), rtol=1e-5)
    rows = compare_grads(jax.device_get(grads0), jax.device_get(grads1))
    assert rows[0][1] < 1e-5, rows[0]


def test_local_data_ranks_on_fake_mesh():
    """Single host owns every device → every data rank is local (and the
    iteration handles the full 4-axis mesh, not just [dp, tp])."""
    from dynamictreeattn_tpu.parallel.distributed import local_data_ranks

    mesh = make_mesh(dp=2, tp=2, sp=2)
    assert local_data_ranks(mesh) == [0, 1]
    mesh2 = make_mesh(dp=4, tp=2)
    assert local_data_ranks(mesh2) == [0, 1, 2, 3]


@pytest.mark.parametrize("dp,tp", [(2, 2), (4, 1)])
def test_sharded_forward_matches_engine_forward(dp, tp):
    """make_forward_step (inference logprobs at scale) == engine.forward
    per sequence — the RL behavior-logprob recompute sharded over the mesh."""
    from dynamictreeattn_tpu.parallel import extract_forward, make_forward_step

    tries, _ = _tries(dp, seed=31)
    mesh = make_mesh(dp=dp, tp=tp)
    params = init_params(TINY, jax.random.key(2), dtype=jnp.float32)
    fstep = make_forward_step(TINY, mesh, ECFG)
    batch = stack_batches(tries, ECFG)
    lp, ent = fstep(shard_params(params, mesh, TINY), batch.arrays)
    engine = TreeEngine(TINY, ECFG)
    got = extract_forward(batch, lp)  # one dict per data rank
    for r, t in enumerate(tries):
        ref = engine.forward(params, engine.prepare(t))
        for k, v in ref.items():
            np.testing.assert_allclose(got[r][k], v, rtol=2e-5, atol=2e-5)
    assert np.isfinite(np.asarray(ent)).all()


def test_sharded_forward_with_fsdp_params():
    """make_forward_step(fsdp=True) consumes ZeRO-sharded params directly
    (per-layer all-gather, no full-model replication) and matches the
    replicated-layout forward."""
    from dynamictreeattn_tpu.parallel import extract_forward, make_forward_step

    tries, _ = _tries(2, seed=37)
    mesh = make_mesh(dp=2, tp=2)
    params = init_params(TINY, jax.random.key(3), dtype=jnp.float32)
    batch = stack_batches(tries, ECFG)

    base = make_forward_step(TINY, mesh, ECFG)
    lp0, _ = base(shard_params(params, mesh, TINY), batch.arrays)

    fstep = make_forward_step(TINY, mesh, ECFG, fsdp=True, fsdp_min_size=1)
    fshard = shard_params(params, mesh, TINY, fsdp=True, fsdp_min_size=1)
    lp1, _ = fstep(fshard, batch.arrays)
    np.testing.assert_allclose(
        np.asarray(lp1), np.asarray(lp0), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("dp,sp,tp,sp_mode", [
    (2, 1, 2, "ulysses"),
    (2, 2, 1, "ulysses"),  # custom loss under Ulysses sequence parallelism
    (1, 2, 2, "ring"),     # ... and under ring sequence parallelism
])
def test_sharded_custom_loss_matches_engine(dp, sp, tp, sp_mode):
    """Clipped-ratio (GRPO/PPO) per-sequence loss AT SCALE: the sharded step
    with custom_loss == summed single-device engine.loss_and_grad_custom —
    including under sequence parallelism (parent-owned per-edge logprobs,
    vp_tree_edge_logprobs_sp)."""
    tries, _ = _tries(dp, seed=41)
    mesh = make_mesh(dp=dp, tp=tp, sp=sp)
    params = init_params(TINY, jax.random.key(5), dtype=jnp.float32)
    batch = stack_batches(tries, ECFG, sp=sp, sp_mode=sp_mode, with_paths=True)
    S = batch.arrays["seq_lens"].shape[1]
    Lb = batch.arrays["seq_paths"].shape[2]

    rng = np.random.default_rng(9)
    beh_master = rng.normal(size=(dp, S, Lb - 1)).astype(np.float32)
    adv_master = rng.normal(size=(dp, S)).astype(np.float32)

    def ppo_loss(lp, ent, extras, length):
        m = (jnp.arange(lp.shape[0]) < length - 1).astype(jnp.float32)
        ratio = jnp.exp(jnp.where(m > 0, lp - extras["beh"][: lp.shape[0]], 0.0))
        obj = jnp.minimum(ratio * extras["adv"],
                          jnp.clip(ratio, 0.8, 1.2) * extras["adv"])
        return -jnp.sum(obj * m) / jnp.maximum(length - 1, 1)

    step = make_train_step(
        TINY, mesh, ECFG, custom_loss=ppo_loss, sp_mode=sp_mode,
        extras_spec={"beh": 1, "adv": 0},
    )
    arrays = dict(batch.arrays)
    arrays["x_beh"] = jnp.asarray(beh_master)
    arrays["x_adv"] = jnp.asarray(adv_master)
    loss, grads, aux = step(shard_params(params, mesh, TINY), arrays)

    engine = TreeEngine(TINY, ECFG)
    total_loss, total_grads = 0.0, None
    for r, t in enumerate(tries):
        b = engine.prepare(t)
        nseq = len(b.packed.seq_batch_ids)
        lmax = int(b.packed.seq_lens.max())
        extras = {
            "beh": jnp.asarray(beh_master[r, :nseq, : lmax - 1]),
            "adv": jnp.asarray(adv_master[r, :nseq]),
        }

        def eng_loss(lp, ent, extras, length):
            m = (jnp.arange(lp.shape[0]) < length - 1).astype(jnp.float32)
            ratio = jnp.exp(jnp.where(m > 0, lp - extras["beh"], 0.0))
            obj = jnp.minimum(ratio * extras["adv"],
                              jnp.clip(ratio, 0.8, 1.2) * extras["adv"])
            return -jnp.sum(obj * m) / jnp.maximum(length - 1, 1)

        l, g = engine.loss_and_grad_custom(params, b, eng_loss, extras)
        total_loss += float(l)
        total_grads = g if total_grads is None else jax.tree.map(
            jnp.add, total_grads, g
        )
    np.testing.assert_allclose(float(loss), total_loss, rtol=1e-4)
    rows = compare_grads(total_grads, jax.device_get(grads))
    assert rows[0][1] < 1e-3, rows[0]
