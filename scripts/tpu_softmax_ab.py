"""A/B the fwd kernel softmax modes (online vs bound-shift) on the real chip."""

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

print(jax.devices())
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
    hq, hkv, dh = mc.num_attention_heads, mc.num_key_value_heads, mc.head_dim
    q = jax.random.normal(jax.random.key(0), (hq, n, dh), dtype=jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (hkv, n, dh), dtype=jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (hkv, n, dh), dtype=jnp.bfloat16)
    print(f"{name}: n={n}")

    REPS = 20
    outs = {}
    for mode in ("online", "bound"):
        def one(q, b=b, m=mode):
            return tree_attention(
                q, k, v, b.last_desc, *b.meta[:6],
                block_sizes=BlockSizes(ec.block_q, ec.block_kv), softmax_mode=m)

        outs[mode] = np.asarray(jax.jit(one)(q), dtype=np.float32)

        @jax.jit
        def many(q):
            def step(x, _):
                return one(x), None
            return jax.lax.scan(step, q, None, length=REPS)[0]

        many(q).block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.time()
            many(q).block_until_ready()
            ts.append(time.time() - t0)
        print(f"  fwd[{mode}]: {np.median(ts)/REPS*1e3:.3f}ms/call")
    err = np.abs(outs["online"] - outs["bound"]).max()
    print(f"  max |online-bound| = {err:.3e}")
