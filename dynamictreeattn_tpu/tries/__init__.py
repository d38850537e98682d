"""Token tries, DFS flattening, and tree-attention mask metadata.

TPU-native counterpart of the reference's trie layer (reference: trie.py,
token_trie.py). The key addition over the reference is `flatten.py`: the trie is
flattened ONCE into a packed DFS token layout in which the ancestor relation —
and therefore the tree-attention mask — is the O(1) interval test
``k <= q <= last_desc[k]``, so the whole trie can be trained in a single fused
pass instead of the reference's stack-based push/pop replay
(reference: tree_training_engine.py:52-616).
"""

from dynamictreeattn_tpu.tries.token_trie import TokenTrie, lcp_arrays
from dynamictreeattn_tpu.tries.compressed_trie import CompressedTrie
from dynamictreeattn_tpu.tries.stats import trie_stats
from dynamictreeattn_tpu.tries.flatten import (
    PackedTrie,
    BlockMeta,
    BwdCacheSched,
    flatten_trie,
    build_block_meta,
    build_bwd_cache_sched,
    pack_forest,
    RingBlockMeta,
    build_ring_block_meta,
)

__all__ = [
    "TokenTrie",
    "CompressedTrie",
    "trie_stats",
    "lcp_arrays",
    "PackedTrie",
    "BlockMeta",
    "BwdCacheSched",
    "flatten_trie",
    "build_block_meta",
    "build_bwd_cache_sched",
    "RingBlockMeta",
    "build_ring_block_meta",
    "pack_forest",
]
