"""Microbenchmark the tree-attention kernel on real trie metadata shapes."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.data import synthetic_rollout_batch
from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine, pack_sequences_dense
from dynamictreeattn_tpu.models import MODEL_CONFIGS
from dynamictreeattn_tpu.ops.tree_attention import BlockSizes, tree_attention
from dynamictreeattn_tpu.tries import TokenTrie

mc = MODEL_CONFIGS["qwen3-0.6b"]
ec = EngineConfig(block_q=256, block_kv=256)
engine = TreeEngine(mc, ec)

seqs, attachs = synthetic_rollout_batch(
    seed=0, n_prompts=2, samples_per_prompt=8,
    prompt_len=(512, 1024), completion_len=(128, 768),
)
batch = engine.prepare(TokenTrie(seqs, attachs))
dense = engine.prepare(pack_sequences_dense(seqs, attachs, pad_multiple=ec.pad_multiple))

for name, b in [("tree", batch), ("dense", dense)]:
    n = b.n_padded
    kv_ids = b.meta[0]
    q_ids = b.meta[3]
    print(f"{name}: n={n} kv_slots={kv_ids.shape} q_slots={q_ids.shape} "
          f"active={int(np.sum(np.asarray(b.meta[1])))}")
    hq, hkv, dh = mc.num_attention_heads, mc.num_key_value_heads, mc.head_dim
    q = jax.random.normal(jax.random.key(0), (hq, n, dh), dtype=jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (hkv, n, dh), dtype=jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (hkv, n, dh), dtype=jnp.bfloat16)

    fwd = jax.jit(lambda q, k, v, b=b: tree_attention(
        q, k, v, b.last_desc, *b.meta[:6], block_sizes=BlockSizes(ec.block_q, ec.block_kv)))

    def bwd_loss(q, k, v, b=b):
        o = tree_attention(q, k, v, b.last_desc, *b.meta[:6],
                           block_sizes=BlockSizes(ec.block_q, ec.block_kv))
        return jnp.sum(o.astype(jnp.float32) ** 2)

    grad = jax.jit(jax.grad(bwd_loss, argnums=(0, 1, 2)))

    for label, fn, sync in [("fwd", fwd, lambda o: float(jnp.sum(o.astype(jnp.float32)))),
                            ("fwd+bwd", grad, lambda o: float(jnp.sum(o[0].astype(jnp.float32))))]:
        t0 = time.time()
        out = fn(q, k, v); sync(out)
        compile_t = time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.time()
            out = fn(q, k, v); sync(out)
            ts.append(time.time() - t0)
        print(f"  {label}: compile {compile_t:.1f}s, median {np.median(ts)*1e3:.1f}ms")
