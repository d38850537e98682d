"""Decompose the production-path (Trainer, ladder buckets) vs headline
(exact buckets) throughput gap at the bench workload.

Round-4 evidence: bench.py (exact) 97.5k tok/s at 2 groups vs the committed
Trainer run ~66k (stats/qwen3-0.6b-train30.jsonl step 30). Candidate
contributors, measured here one at a time on the same rollout batches:

  A. TreeEngine step, exact bucketing            (the bench number)
  B. TreeEngine step, ladder bucketing           (isolate padding waste)
  C. make_train_step(dp=1) grads-only, ladder    (isolate shard_map path)
  D. make_train_step(dp=1) + adamw update, ladder(isolate optimizer)
  E. Trainer.train_step                          (everything incl. TM refit)

Ladder growth factor sweep at the end sizes the padding lever
(EngineConfig.bucket_growth).
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import dataclasses
import time

import jax
import numpy as np
import jax.numpy as jnp

from dynamictreeattn_tpu.data import synthetic_rollout_batch
from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine
from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params
from dynamictreeattn_tpu.tries import TokenTrie

GROUPS = int(os.environ.get("DTA_BENCH_PROMPTS", "2"))
STEPS = 8

mc = MODEL_CONFIGS["qwen3-0.6b"]
params = init_params(mc, jax.random.key(0), dtype=jnp.bfloat16)

# a stream of slightly-varying rollout batches, like the Trainer sees
batches = []
for step in range(STEPS):
    seqs, attachs = synthetic_rollout_batch(
        seed=100 + step, n_prompts=GROUPS, samples_per_prompt=16,
        prompt_len=(1024, 2048), completion_len=(128, 512), branch_prob=0.85,
    )
    batches.append((seqs, attachs, sum(len(s) for s in seqs)))
total_tokens = sum(b[2] for b in batches)


def bench_engine(tag, ec):
    eng = TreeEngine(mc, ec)
    prepped = [eng.prepare(TokenTrie(s, a)) for s, a, _ in batches]
    pads = [b.n_padded for b in prepped]
    reals = [b.packed.n_tokens for b in prepped]
    waste = 1 - sum(reals) / sum(pads)
    # warm every shape
    for b in prepped:
        out = eng.loss_and_grad(params, b)
        float(out[0]); del out
    t0 = time.time()
    for b in prepped:
        out = eng.loss_and_grad(params, b)
        float(out[0]); del out
    dt = time.time() - t0
    shapes = sorted(set(pads))
    print(f"{tag:<44} {total_tokens/dt:9.0f} tok/s  pad_waste={waste:5.1%} "
          f"shapes={shapes}", flush=True)
    return total_tokens / dt


def bench_sharded(tag, ec, optimizer=None):
    from dynamictreeattn_tpu.parallel import (
        init_opt_state, make_mesh, make_train_step, shard_params, stack_batches,
    )

    mesh = make_mesh(dp=1, tp=1)
    step = make_train_step(mc, mesh, ec, optimizer=optimizer)
    p = shard_params(params, mesh, mc)
    opt = init_opt_state(optimizer, p) if optimizer is not None else None
    stacked = [stack_batches([TokenTrie(s, a)], ec) for s, a, _ in batches]
    for b in stacked:  # warm every shape (opt steps donate: rebind p/opt)
        if optimizer is None:
            out = step(p, b.arrays); float(out[0]); del out
        else:
            p, opt, loss, aux = step(p, opt, b.arrays); float(loss)
    t0 = time.time()
    for b in stacked:
        if optimizer is None:
            out = step(p, b.arrays); float(out[0]); del out
        else:
            p, opt, loss, aux = step(p, opt, b.arrays); float(loss)
    dt = time.time() - t0
    print(f"{tag:<44} {total_tokens/dt:9.0f} tok/s", flush=True)
    return total_tokens / dt


def bench_trainer(tag, ec):
    from dynamictreeattn_tpu.training import TrainConfig, Trainer

    tr = Trainer(mc, ec, TrainConfig(dp=1, tp=1))
    tr.init(seed=0)
    for s, a, _ in batches:  # warm
        tr.train_step(s, a)
    t0 = time.time()
    for s, a, _ in batches:
        tr.train_step(s, a)
    dt = time.time() - t0
    print(f"{tag:<44} {total_tokens/dt:9.0f} tok/s", flush=True)
    return total_tokens / dt


base = dict(remat_policy="attn", attn_backend="pallas")
print(f"== {GROUPS}-group stream, {STEPS} distinct batches, "
      f"{total_tokens} dense tokens ==", flush=True)
a = bench_engine("A engine exact", EngineConfig(bucketing="exact", **base))
b = bench_engine("B engine ladder", EngineConfig(bucketing="ladder", **base))
c = bench_sharded("C sharded dp1 grads-only ladder",
                  EngineConfig(bucketing="ladder", **base))
import optax

d = bench_sharded("D sharded dp1 adamw ladder",
                  EngineConfig(bucketing="ladder", **base),
                  optimizer=optax.chain(optax.clip_by_global_norm(1.0),
                                        optax.adamw(1e-5)))
e = bench_trainer("E Trainer.train_step", EngineConfig(bucketing="ladder", **base))
print(f"\ngap decomposition: exact->ladder {b/a-1:+.1%}, "
      f"ladder->shardmap {c/b-1:+.1%}, +opt {d/c-1:+.1%}, "
      f"trainer {e/d-1:+.1%}; total {e/a-1:+.1%}")
