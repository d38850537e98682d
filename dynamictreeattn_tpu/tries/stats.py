"""Per-trie cost features for the execution-time model.

Counterpart of the reference's ``_get_stats`` (reference: trie.py:7-56). The
features are the inputs of the linear TreeTimeModel (reference:
tree_time_model.py:5-48) used by the DP load balancers.

Feature semantics (per ordered trie, i.e., after a permute):

* ``n_leaf_sequences``  — number of leaves.
* ``n_tree_tokens``     — Σ lens − Σ lcp_lens: packed tokens the fused engine
  forwards exactly once (reference: trie.py:25-53).
* ``sum_prefix_len``    — Σ lcp_i: prefix KV re-read proxy.
* ``sum_depth``         — Σ_i Σ_{p=lcp_i}^{len_i−1} p = Σ_j depth(j) over
  packed tokens: the attention-FLOPs proxy (each packed token attends to
  depth(j)+1 ancestors).
* ``n_f1_tokens``       — no-grad pre-forwarded tokens in the reference's
  stack engine (reference: trie.py:25-53). The fused TPU engine has no "f1"
  phase, so this is 0 in mode="forward" and kept for backward mode as the
  blockwise approximation for time-model compatibility with reference stats.

TPU-native extras (better predictors of fused-kernel time):

* ``n_attn_blocks``     — active (q-block, kv-block) pairs of the tree mask at
  the given block size: the tree-attention kernel's actual grid work.
* ``n_padded_tokens``   — packed length rounded up to the block size: the
  per-token (non-attention) FLOP count after padding.
"""

from __future__ import annotations

import numpy as np

__all__ = ["trie_stats"]


def _tri(x: np.ndarray) -> np.ndarray:
    return x * (x - 1) // 2


def trie_stats(lens, lcp_lens, mode: str = "forward", block_size: int = 2048) -> dict:
    lens = np.asarray(lens, dtype=np.int64)
    lcp = np.asarray(lcp_lens, dtype=np.int64)
    if len(lcp) != len(lens) - 1:
        raise ValueError("lcp_lens must have len(lens)-1 entries")
    starts = np.concatenate([[0], lcp])  # first new-token depth per leaf

    n_tree_tokens = int(lens.sum() - lcp.sum())
    sum_depth = int((_tri(lens) - _tri(starts)).sum())
    sum_prefix_len = int(starts.sum())

    if mode == "backward":
        # Reference backward replays each pop block with its prefix offset;
        # approximate f1 tokens as tokens beyond the first block boundary of
        # each pushed suffix (cut_f1_tail semantics, reference: trie.py:25-53,
        # tree_training_engine.py:596-609).
        n_new = lens - starts
        n_f1 = np.maximum(n_new - block_size, 0)
        n_f1_tokens = int(n_f1.sum())
    else:
        n_f1_tokens = 0

    n_padded = -(-n_tree_tokens // block_size) * block_size if block_size else n_tree_tokens

    return {
        "n_leaf_sequences": int(len(lens)),
        "n_tree_tokens": n_tree_tokens,
        "n_f1_tokens": n_f1_tokens,
        "sum_prefix_len": sum_prefix_len,
        "sum_depth": sum_depth,
        "n_padded_tokens": int(n_padded),
    }
