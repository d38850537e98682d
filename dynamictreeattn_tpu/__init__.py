"""dynamictreeattn_tpu — a TPU-native framework for dynamic tree-attention RL training.

Re-implementation (from scratch, TPU-first) of the capabilities of the reference
Whisper-6/DynamicTreeAttn research prototype. Instead of the reference's stack-based
KV-cache replay engine (reference: tree_training_engine.py), rollout sequences sharing
prefixes are merged into a token trie, flattened once into a single packed DFS layout,
and trained in ONE fused forward + `jax.grad` backward pass through a Pallas
tree-masked flash-attention kernel.

Subpackages
-----------
tries     : token tries, DFS flattening, ancestor-mask block metadata, cost features
ops       : Pallas tree-attention kernel (fwd+bwd), fused logprob/entropy losses,
            vocab-parallel loss collectives
models    : JAX/flax-free functional Qwen3 model family
engine    : tree training engine + dense replay baseline (parity oracle)
parallel  : device mesh, sharded train steps, DP trie load balancing, cost model
data      : synthetic trie generation + IO
utils     : grad comparison, timing, stats sinks
"""

__version__ = "0.1.0"
