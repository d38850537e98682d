"""Differential tests: native treekit C++ data path vs the numpy oracle."""

import numpy as np
import pytest

from dynamictreeattn_tpu.tries import TokenTrie, build_block_meta, flatten_trie
from dynamictreeattn_tpu.tries import _native

from helpers import random_trie_batch

pytestmark = pytest.mark.skipif(
    _native.get_lib() is None, reason="native treekit unavailable (no g++?)"
)


def _numpy_path(fn, *args, **kw):
    import os

    os.environ["DTA_NO_NATIVE"] = "1"
    try:
        return fn(*args, **kw)
    finally:
        del os.environ["DTA_NO_NATIVE"]


@pytest.mark.parametrize("seed", range(6))
def test_flatten_native_equals_numpy(seed):
    rng = np.random.default_rng(seed)
    seqs, attachs = random_trie_batch(rng, n_seqs=20, max_len=40)
    trie = TokenTrie(seqs, attachs)

    a = flatten_trie(trie, pad_to=None)
    b = _numpy_path(flatten_trie, trie, pad_to=None)
    for f in ("tokens", "depth", "parent", "last_desc", "seq_batch_ids",
              "seq_end_pos", "seq_lens"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), err_msg=f)
    for f in ("w_logprob", "w_entropy"):
        np.testing.assert_allclose(getattr(a, f), getattr(b, f), rtol=1e-6,
                                   atol=1e-9, err_msg=f)


@pytest.mark.parametrize("seed", range(4))
def test_block_meta_native_equals_numpy(seed):
    rng = np.random.default_rng(100 + seed)
    seqs, attachs = random_trie_batch(rng, n_seqs=20, max_len=40)
    packed = flatten_trie(TokenTrie(seqs, attachs), pad_to=None)
    pad = -(-packed.n_tokens // 16) * 16
    packed = flatten_trie(TokenTrie(seqs, attachs), pad_to=pad)

    a = build_block_meta(packed.last_desc, 16, 16, min_kv_slots=4)
    b = _numpy_path(build_block_meta, packed.last_desc, 16, 16, min_kv_slots=4)
    for f in ("kv_ids", "kv_counts", "kv_types", "q_ids", "q_counts", "q_types"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), err_msg=f)


def test_native_lcp():
    rng = np.random.default_rng(3)
    seqs, _ = random_trie_batch(rng, n_seqs=15, max_len=30)
    trie = TokenTrie(seqs, [{} for _ in seqs])  # sorted inside
    got = _native.lcp_adjacent(trie.inputs)
    np.testing.assert_array_equal(got, trie.lcp_lens)


@pytest.mark.parametrize("seed", range(4))
def test_seq_paths_native_equals_numpy_and_bruteforce(seed):
    """seq_paths_matrix (native parent-chain walk) == vectorized numpy
    fallback == brute-force per-sequence walk."""
    rng = np.random.default_rng(100 + seed)
    seqs, attachs = random_trie_batch(rng, n_seqs=16, max_len=30)
    trie = TokenTrie(seqs, attachs)
    a = flatten_trie(trie, pad_to=None)
    b = _numpy_path(flatten_trie, trie, pad_to=None)
    pa = a.seq_paths_matrix()
    pb = _numpy_path(lambda: b.seq_paths_matrix())
    np.testing.assert_array_equal(pa, pb)
    # brute force: walk each parent chain in python
    for s in range(len(a.seq_batch_ids)):
        L = int(a.seq_lens[s])
        pos = int(a.seq_end_pos[s])
        want = []
        for _ in range(L):
            want.append(pos)
            pos = int(a.parent[pos])
        np.testing.assert_array_equal(pa[s, :L], want[::-1])
        assert np.all(pa[s, L:] == -1)
