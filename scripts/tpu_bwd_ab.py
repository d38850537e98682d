"""A/B the backward kernels (split dq/dkv vs fused dqdkv vs cached fused
with the VMEM slot cache + Belady schedule) on the real chip.

Parity: fused/cached grads vs split grads at the bench tree shape (bf16).
Timing: kernel-level grad call + end-to-end engine loss_and_grad, all modes.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.data import synthetic_rollout_batch
from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine
from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params
from dynamictreeattn_tpu.ops.tree_attention import BlockSizes, tree_attention
from dynamictreeattn_tpu.tries import TokenTrie

print(jax.devices())
mc = MODEL_CONFIGS[os.environ.get("DTA_BENCH_MODEL", "qwen3-0.6b")]
# "auto" so prepare() attaches the Belady cache schedule (meta[6:])
ec = EngineConfig(bucketing="exact", remat_policy="attn", bwd_mode="auto")
engine = TreeEngine(mc, ec)

n_prompts = int(os.environ.get("DTA_BENCH_PROMPTS", "1"))
seqs, attachs = synthetic_rollout_batch(
    seed=0, n_prompts=n_prompts, samples_per_prompt=16,
    prompt_len=(1024, 2048), completion_len=(128, 512), branch_prob=0.85,
)
b = engine.prepare(TokenTrie(seqs, attachs))
n = b.n_padded
hq, hkv, dh = mc.num_attention_heads, mc.num_key_value_heads, mc.head_dim
print(f"n={n} heads={hq}/{hkv} dh={dh} "
      f"active={int(np.sum(np.asarray(b.meta[1])))} slots={b.meta[0].shape} "
      f"cache_slots={b.meta[7].shape[0] if len(b.meta) > 6 else 0}")

q = jax.random.normal(jax.random.key(0), (hq, n, dh), dtype=jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (hkv, n, dh), dtype=jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (hkv, n, dh), dtype=jnp.bfloat16)

REPS = 20
grads = {}
for mode in ("split", "fused", "cached"):
    def one(q, k, v, m=mode):
        def loss(q, k, v):
            o = tree_attention(
                q, k, v, b.last_desc, *b.meta[:6],
                block_sizes=BlockSizes(ec.block_q, ec.block_kv),
                softmax_mode="bound", bwd_mode=m,
                cache_sched=b.meta[6:] if m == "cached" else None)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    grads[mode] = jax.jit(one)(q, k, v)
    jax.block_until_ready(grads[mode])

    @jax.jit
    def many(q, k, v):
        def step(c, _):
            q, k, v = c
            dq, dk, dv = one(q, k, v)
            return (q + 1e-6 * dq.astype(q.dtype),
                    k + 1e-6 * dk.astype(k.dtype),
                    v + 1e-6 * dv.astype(v.dtype)), None
        return jax.lax.scan(step, (q, k, v), None, length=REPS)[0]

    jax.block_until_ready(many(q, k, v))
    ts = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(many(q, k, v))
        ts.append(time.time() - t0)
    print(f"  fwd+bwd[{mode}]: {np.median(ts)/REPS*1e3:.3f}ms/call")

for other in ("fused", "cached"):
    for name, a, f in zip("dq dk dv".split(), grads["split"], grads[other]):
        a = np.asarray(a, np.float32); f = np.asarray(f, np.float32)
        denom = max(1e-30, float(np.abs(a).max()))
        print(f"  {name}[{other}]: "
              f"max_rel_vs_split={float(np.abs(a - f).max()) / denom:.3e}")

# ---- end-to-end engine step
params = init_params(mc, jax.random.key(0), dtype=jnp.bfloat16)
for mode in ("split", "fused", "cached"):
    eng = TreeEngine(mc, dataclasses.replace(ec, bwd_mode=mode))
    loss, grads_, _aux = eng.loss_and_grad(params, b)
    l0 = float(loss)
    del grads_, _aux
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = eng.loss_and_grad(params, b)
        float(out[0])
        del out
        ts.append(time.time() - t0)
    print(f"  engine step[{mode}]: {np.median(ts)*1e3:.1f}ms  loss={l0:.4f}")
