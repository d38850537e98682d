"""End-to-end on-TPU check: Qwen3-0.6B tree training step vs dense replay.

Random-init bf16 weights (pretrained checkpoints need network; parity physics
is identical). Measures:
  * tree vs dense loss agreement,
  * per-parameter grad deviation at bf16 (reference bar: max rel ~1e-1,
    reference: grad/Qwen3-0.6B-TB-vs-DB-bf16.txt),
  * step time + dense-equivalent tokens/s for both engines.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.data import sharing_ratio, synthetic_rollout_batch
from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine, pack_sequences_dense
from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params
from dynamictreeattn_tpu.tries import TokenTrie
from dynamictreeattn_tpu.utils import compare_grads, format_grad_table

MODEL = "qwen3-0.6b"
SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0

mc = MODEL_CONFIGS[MODEL]
ec = EngineConfig(block_q=256, block_kv=256, remat=True, attn_backend="pallas")

seqs, attachs = synthetic_rollout_batch(
    seed=0,
    n_prompts=max(1, int(2 * SCALE)),
    samples_per_prompt=8,
    prompt_len=(512, 1024),
    completion_len=(128, 768),
)
n_dense = sum(len(s) for s in seqs)
print(f"{len(seqs)} seqs, {n_dense} dense tokens, sharing={sharing_ratio(seqs):.3f}")

engine = TreeEngine(mc, ec)
trie = TokenTrie(seqs, attachs)
tree_batch = engine.prepare(trie)
dense_batch = engine.prepare(pack_sequences_dense(seqs, attachs, pad_multiple=ec.pad_multiple))
print(f"tree packed {tree_batch.packed.n_tokens}->{tree_batch.n_padded} "
      f"dense packed {dense_batch.packed.n_tokens}->{dense_batch.n_padded}")

params = init_params(mc, jax.random.key(0), dtype=jnp.bfloat16)
n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
print(f"params: {n_params/1e6:.1f}M")


def timed(fn, *args, iters=5):
    out = fn(*args)
    float(out[0])  # compile + full host roundtrip (block_until_ready is
    # unreliable through the axon tunnel)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        # loss and grads come from one XLA program: the scalar fetch syncs the
        # step without downloading 1.2GB of grads through the tunnel.
        float(out[0])
        ts.append(time.time() - t0)
    return out, float(np.median(ts))


t0 = time.time()
(loss_t, grads_t, aux_t), dt_tree = timed(engine.loss_and_grad, params, tree_batch)
print(f"tree: loss={float(loss_t):.4f} step={dt_tree*1e3:.1f}ms "
      f"(compile+5 iters in {time.time()-t0:.1f}s) "
      f"dense-equiv tok/s={n_dense/dt_tree:,.0f}")

t0 = time.time()
(loss_d, grads_d, aux_d), dt_dense = timed(engine.loss_and_grad, params, dense_batch)
print(f"dense: loss={float(loss_d):.4f} step={dt_dense*1e3:.1f}ms "
      f"(compile+5 iters in {time.time()-t0:.1f}s) "
      f"tok/s={n_dense/dt_dense:,.0f}")

print(f"loss rel diff: {abs(float(loss_t)-float(loss_d))/abs(float(loss_d)):.2e}")
print(f"SPEEDUP tree vs dense: {dt_dense/dt_tree:.2f}x")

rows = compare_grads(grads_d, grads_t)
rels = [r[1] for r in rows if np.isfinite(r[1])]
print(f"grad parity: max={max(rels):.3e} median={np.median(rels):.3e}")
print(format_grad_table(rows, top=8))
