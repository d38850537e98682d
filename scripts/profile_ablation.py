"""Step-time ablation on the bench workload (real TPU).

Times value_and_grad of the full tree step against variants with one
component knocked out, to locate the time:

  full         — forward + tree loss (mirrors TreeEngine._loss)
  triv_loss    — loss replaced by sum(hidden · vec)   → loss share
  id_attn      — attention replaced by identity(v)    → attention share
  fwd_only     — full loss, no grad                   → backward share

Usage: python scripts/profile_ablation.py [model] [block]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.data import synthetic_rollout_batch
from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine
from dynamictreeattn_tpu.models import (
    MODEL_CONFIGS,
    init_params,
)
from dynamictreeattn_tpu.models.qwen3 import forward_hidden, lm_head_weight
from dynamictreeattn_tpu.ops.losses import tree_loss_from_hidden
from dynamictreeattn_tpu.ops.tree_attention import BlockSizes, tree_attention


def timeit(fn, *args, iters=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "qwen3-0.6b"
    blk = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    mc = MODEL_CONFIGS[name]
    ec = EngineConfig(block_q=blk, block_kv=blk, remat=True, bucketing="exact")
    engine = TreeEngine(mc, ec)
    seqs, attachs = synthetic_rollout_batch(
        seed=0, n_prompts=2, samples_per_prompt=16,
        prompt_len=(1024, 2048), completion_len=(128, 512), branch_prob=0.85,
    )
    from dynamictreeattn_tpu.tries import TokenTrie

    b = engine.prepare(TokenTrie(seqs, attachs))
    params = init_params(mc, jax.random.key(0), dtype=jnp.bfloat16)
    bs = BlockSizes(blk, blk)

    real_attn = lambda q, k, v: tree_attention(
        q, k, v, b.last_desc, *b.meta[:6], block_sizes=bs
    )
    id_attn = lambda q, k, v: jnp.repeat(v, q.shape[0] // v.shape[0], axis=0)

    def full(p):
        h = forward_hidden(p, mc, b.tokens, b.depth, real_attn, remat=True)
        loss, _ = tree_loss_from_hidden(
            h, lm_head_weight(p, mc), b.tokens, b.parent,
            b.w_logprob, b.w_entropy, 1.0, ec.loss_chunk,
        )
        return loss

    def triv_loss(p):
        h = forward_hidden(p, mc, b.tokens, b.depth, real_attn, remat=True)
        return jnp.sum(h.astype(jnp.float32) * b.w_entropy[:, None])

    def id_attn_loss(p):
        h = forward_hidden(p, mc, b.tokens, b.depth, id_attn, remat=True)
        loss, _ = tree_loss_from_hidden(
            h, lm_head_weight(p, mc), b.tokens, b.parent,
            b.w_logprob, b.w_entropy, 1.0, ec.loss_chunk,
        )
        return loss

    t_full = timeit(jax.jit(jax.grad(full)), params)
    t_fwd = timeit(jax.jit(full), params)
    t_triv = timeit(jax.jit(jax.grad(triv_loss)), params)
    t_noattn = timeit(jax.jit(jax.grad(id_attn_loss)), params)
    n = b.n_padded
    print(f"model={name} blk={blk} n={n}")
    print(f"full grad step : {t_full*1e3:8.1f} ms")
    print(f"fwd only       : {t_fwd*1e3:8.1f} ms  ({t_fwd/t_full:.0%})")
    print(f"grad, triv loss: {t_triv*1e3:8.1f} ms  -> loss share ~{(t_full-t_triv)/t_full:.0%}")
    print(f"grad, id attn  : {t_noattn*1e3:8.1f} ms  -> attn share ~{(t_full-t_noattn)/t_full:.0%}")


if __name__ == "__main__":
    main()
