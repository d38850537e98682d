"""Trie layer unit tests against brute-force oracles.

The reference has no test suite (SURVEY.md §4); these implement the test
strategy it implies: trie/order/stats vs brute-force token tries."""

import numpy as np
import pytest

from dynamictreeattn_tpu.tries import (
    CompressedTrie,
    TokenTrie,
    build_block_meta,
    flatten_trie,
    pack_forest,
    trie_stats,
)


def random_trie_batch(rng, n_seqs=12, vocab=7, max_len=24, branchy=True):
    """Random sequences with heavy prefix sharing."""
    seqs = []
    pool = [np.array([], dtype=np.int32)]
    for _ in range(n_seqs):
        if branchy and len(pool) > 1 and rng.random() < 0.7:
            base = pool[rng.integers(len(pool))]
        else:
            base = np.array([], dtype=np.int32)
        ext = rng.integers(0, vocab, size=rng.integers(1, max_len)).astype(np.int32)
        seq = np.concatenate([base, ext])[:max_len]
        if len(seq) == 0:
            seq = np.array([0], dtype=np.int32)
        seqs.append(seq)
        pool.append(seq[: rng.integers(1, len(seq) + 1)])
    attachs = [{"w_logprobs": -1.0, "w_entropy": 0.1, "tag": i} for i in range(n_seqs)]
    return seqs, attachs


def brute_force_ancestor_mask(parent, n):
    """mask[q, k] = k is an ancestor-or-self of q, via parent chains."""
    mask = np.zeros((n, n), dtype=bool)
    for q in range(n):
        a = q
        while a >= 0:
            mask[q, a] = True
            a = parent[a]
    return mask


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_token_trie_sort_and_leafization(seed):
    rng = np.random.default_rng(seed)
    seqs, attachs = random_trie_batch(rng)
    trie = TokenTrie(seqs, attachs)

    # Sorted lexicographically.
    for i in range(trie.n_leaves - 1):
        assert tuple(trie.inputs[i]) <= tuple(trie.inputs[i + 1])
    # No leaf is a full prefix of the next (leafization invariant).
    for i in range(trie.n_leaves - 1):
        lcp = trie.lcp_lens[i]
        assert lcp < len(trie.inputs[i]) or len(trie.inputs[i]) == len(
            trie.inputs[i + 1]
        ) == lcp or True
        assert not (
            lcp == len(trie.inputs[i]) and len(trie.inputs[i]) <= len(trie.inputs[i + 1])
        )
    # Every original sequence appears exactly once as an (attach, length) pair
    # and the recorded prefix matches the original tokens.
    seen = {}
    for leaf, al in zip(trie.inputs, trie.attach_lists):
        for att, length in al:
            bid = att["_sequence_batch_id"]
            assert bid not in seen
            seen[bid] = True
            np.testing.assert_array_equal(leaf[:length], seqs[bid])
    assert len(seen) == len(seqs)


@pytest.mark.parametrize("seed", [0, 5])
def test_lcp_and_subset_lens(seed):
    rng = np.random.default_rng(seed)
    seqs, attachs = random_trie_batch(rng, n_seqs=16)
    trie = TokenTrie(seqs, attachs)
    # lcp oracle
    for i in range(trie.n_leaves - 1):
        a, b = trie.inputs[i], trie.inputs[i + 1]
        m = min(len(a), len(b))
        l = 0
        while l < m and a[l] == b[l]:
            l += 1
        assert trie.lcp_lens[i] == l
    # subset lens: LCP(leaf_i, leaf_j) == min over the range
    if trie.n_leaves >= 4:
        ids = sorted(rng.choice(trie.n_leaves, size=4, replace=False))
        lens, lcps = trie.subset_lens(ids)
        for j in range(1, 4):
            a, b = trie.inputs[ids[j - 1]], trie.inputs[ids[j]]
            m = min(len(a), len(b))
            l = 0
            while l < m and a[l] == b[l]:
                l += 1
            assert lcps[j - 1] == l


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("order_name", ["forward", "backward", "random"])
def test_orders_are_valid_dfs(seed, order_name):
    rng = np.random.default_rng(seed)
    seqs, attachs = random_trie_batch(rng)
    trie = TokenTrie(seqs, attachs)
    n_tree = trie.n_tree_tokens
    ct = CompressedTrie(trie.lens, trie.lcp_lens)
    order = {
        "forward": ct.get_order_forward,
        "backward": ct.get_order_backward,
        "random": lambda: ct.get_order_random(seed=seed),
    }[order_name]()
    assert sorted(order) == list(range(trie.n_leaves))
    trie.permute(order)
    # A valid DFS order preserves the tree token count (invalid interleavings
    # would break prefix adjacency and inflate it).
    assert trie.n_tree_tokens == n_tree
    packed = flatten_trie(trie)
    packed.validate()


@pytest.mark.parametrize("seed", [0, 1, 2, 7])
@pytest.mark.parametrize("leafization", [True, False])
def test_flatten_mask_and_weights(seed, leafization):
    rng = np.random.default_rng(seed)
    seqs, attachs = random_trie_batch(rng)
    trie = TokenTrie(seqs, attachs, leafization=leafization)
    packed = flatten_trie(trie)
    packed.validate()
    n = packed.n_tokens
    assert n == trie.n_tree_tokens

    # Interval ancestor test == brute-force parent-chain ancestors.
    bf = brute_force_ancestor_mask(packed.parent, n)
    q = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    interval = (k <= q) & (q <= packed.last_desc[None, :n])
    np.testing.assert_array_equal(interval, bf)

    # Each sequence's path spells its original tokens with correct depths.
    for s in range(len(packed.seq_batch_ids)):
        bid = int(packed.seq_batch_ids[s])
        path = packed.seq_path(s)
        np.testing.assert_array_equal(packed.tokens[path], seqs[bid])
        np.testing.assert_array_equal(packed.depth[path], np.arange(len(seqs[bid])))

    # Loss weights == brute-force accumulation over sequence paths.
    w_lp = np.zeros(n)
    w_ent = np.zeros(n)
    for s in range(len(packed.seq_batch_ids)):
        path = packed.seq_path(s)
        L = len(path)
        if L > 1:
            w_lp[path[1:]] += -1.0 / (L - 1)
        w_ent[path] += 0.1 / L
    np.testing.assert_allclose(packed.w_logprob[:n], w_lp, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(packed.w_entropy[:n], w_ent, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("seed", [0, 3])
def test_block_meta_matches_dense_mask(seed):
    rng = np.random.default_rng(seed)
    seqs, attachs = random_trie_batch(rng, n_seqs=20, max_len=40)
    trie = TokenTrie(seqs, attachs)
    bq, bk = 8, 8
    pad = -(-trie.n_tree_tokens // bq) * bq
    packed = flatten_trie(trie, pad_to=pad)
    meta = build_block_meta(packed.last_desc, bq, bk)

    n = packed.n_padded
    q = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    dense = (k <= q) & (q <= packed.last_desc[None, :])

    nq, nk = n // bq, n // bk
    blocked = dense.reshape(nq, bq, nk, bk)
    any_active = blocked.any(axis=(1, 3))
    all_active = blocked.all(axis=(1, 3))

    for i in range(nq):
        cols = set(np.nonzero(any_active[i])[0].tolist())
        c = int(meta.kv_counts[i])
        got = set(meta.kv_ids[i, :c].tolist())
        assert got == cols
        for s in range(c):
            j = meta.kv_ids[i, s]
            t = meta.kv_types[i, s]
            if t == 2:
                assert all_active[i, j]
            else:
                assert any_active[i, j]
        # padding slots repeat the last id
        assert np.all(meta.kv_ids[i, c:] == meta.kv_ids[i, c - 1])
    # transposed metadata consistency
    pairs_fwd = {
        (i, meta.kv_ids[i, s]) for i in range(nq) for s in range(meta.kv_counts[i])
    }
    pairs_t = {
        (meta.q_ids[j, s], j) for j in range(nk) for s in range(meta.q_counts[j])
    }
    assert pairs_fwd == pairs_t


def test_pack_forest_isolation():
    rng = np.random.default_rng(11)
    tries = []
    for t in range(3):
        seqs, attachs = random_trie_batch(rng, n_seqs=5)
        for a in attachs:
            a["tag"] = (t, a["tag"])
        tries.append(flatten_trie(TokenTrie(seqs, attachs), pad_to=64))
    forest = pack_forest(tries, pad_to=256)
    forest.validate()
    n = forest.n_padded
    q = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    dense = (k <= q) & (q <= forest.last_desc[None, :])
    # no attention across trie boundaries
    for b in range(3):
        lo, hi = b * 64, (b + 1) * 64
        assert not dense[hi:, lo:hi][: n - hi].any() or dense[hi:, lo:hi].sum() == 0
        assert not dense[lo:hi, :lo].any()


def test_stats_formulas():
    # Hand trie: lens [5,4,3,2], lcps [3,2,1] (reference: trie.py:246-262).
    lens = np.array([5, 4, 3, 2])
    lcps = np.array([3, 2, 1])
    s = trie_stats(lens, lcps, mode="forward", block_size=8)
    assert s["n_leaf_sequences"] == 4
    assert s["n_tree_tokens"] == 14 - 6
    # sum_depth = Σ_i Σ_{p=lcp}^{len-1} p
    expect = sum(sum(range(l0, l1)) for l0, l1 in [(0, 5), (3, 4), (2, 3), (1, 2)])
    assert s["sum_depth"] == expect
    assert s["sum_prefix_len"] == 6
    assert s["n_padded_tokens"] == 8


def test_dense_as_unmerged_trie():
    """The dense baseline is the same engine on an unmerged forest: each
    sequence is its own chain, so last_desc spans exactly the chain."""
    seqs = [np.array([1, 2, 3]), np.array([1, 2, 4])]
    tries = [flatten_trie(TokenTrie([s], [{}])) for s in seqs]
    forest = pack_forest(tries)
    np.testing.assert_array_equal(forest.last_desc, [2, 2, 2, 5, 5, 5])
    assert forest.n_tokens == 6
