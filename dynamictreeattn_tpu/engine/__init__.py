"""Training engines.

`TreeEngine` is the TPU-native replacement for the reference's 616-line
stack-based TreeTrainingEngine (reference: tree_training_engine.py:52-616):
one fused forward over the packed trie + `jax.grad` replaces push/pop KV
replay, fork-logit stashing, and manual cotangent injection.

The dense replay baseline (reference: dense.py) is the SAME engine run on an
unmerged forest-of-chains packing — so tree-vs-dense parity isolates exactly
the prefix-sharing machinery, and the speedup measurement is apples-to-apples.
"""

from dynamictreeattn_tpu.engine.tree_engine import (
    EngineConfig,
    TreeEngine,
    TrieBatch,
    pack_sequences_dense,
)

__all__ = ["EngineConfig", "TreeEngine", "TrieBatch", "pack_sequences_dense"]
