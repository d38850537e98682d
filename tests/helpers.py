"""Shared test utilities: random tries with heavy prefix sharing."""

import numpy as np

from dynamictreeattn_tpu.tries import TokenTrie, build_block_meta, flatten_trie


def random_trie_batch(rng, n_seqs=12, vocab=7, max_len=24, branchy=True):
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
    attachs = [{"w_logprobs": -1.0, "w_entropy": 0.1} for _ in range(n_seqs)]
    return seqs, attachs


def random_packed(rng, n_pad, block, n_seqs=24, vocab=31, max_len=48):
    """A random packed trie padded to n_pad with block metadata at `block`.

    Slot counts are padded to the worst case (n_pad // block) so every test
    geometry shares one compiled kernel shape (interpret-mode compiles are
    expensive)."""
    while True:
        seqs, attachs = random_trie_batch(rng, n_seqs=n_seqs, vocab=vocab, max_len=max_len)
        trie = TokenTrie(seqs, attachs)
        if trie.n_tree_tokens <= n_pad:
            break
        max_len = max(4, max_len - 8)
    packed = flatten_trie(trie, pad_to=n_pad)
    nblk = n_pad // block
    meta = build_block_meta(
        packed.last_desc, block, block, min_kv_slots=nblk, min_q_slots=nblk
    )
    return seqs, trie, packed, meta
