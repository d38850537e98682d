"""Headline benchmark: Qwen3-0.6B tree-training throughput vs dense replay.

Runs on the real TPU chip. Workload: tau2-16k-like synthetic rollout tries
(the reference's benchmark regime: 16k-token tool-call tries, Qwen3, bf16 —
reference: exp/exp_tree.py, run_all.py). Both engines are the SAME fused
code path; "dense" is the unmerged forest-of-chains packing (per-sequence
replay semantics, reference: dense.py).

Metric: dense-equivalent trained tokens/sec/chip of the tree engine
(total dense tokens the batch represents / tree step time).
vs_baseline: speedup over the dense-replay baseline measured in the same run
on the same chip (BASELINE.md target: ≥3x at ≥60% prefix sharing).

Prints ONE JSON line at the end.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.data import sharing_ratio, synthetic_rollout_batch
from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine, pack_sequences_dense
from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params
from dynamictreeattn_tpu.tries import TokenTrie


def timed_step(fn, *args, iters=5):
    out = fn(*args)
    loss = float(out[0])  # compile + sync (loss roundtrip syncs the program)
    del out  # don't hold grads alive across phases (HBM)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        loss = float(out[0])
        del out
        ts.append(time.time() - t0)
    return loss, float(np.median(ts))


def main():
    mc = MODEL_CONFIGS[os.environ.get("DTA_BENCH_MODEL", "qwen3-0.6b")]
    blk = int(os.environ.get("DTA_BENCH_BLOCK", "512"))
    # 512/1024 is ~2% faster on the knobs microbench but noise-level here
    # (and it speeds the dense baseline more); 1024/1024 exceeds the 16MB
    # VMEM scoped limit
    bkv = int(os.environ.get("DTA_BENCH_BKV", str(blk)))
    # 2048 is ~1% over 1024 (tpu_ab_knobs); bigger is flat
    chunk = int(os.environ.get("DTA_BENCH_CHUNK", "2048"))
    remat = os.environ.get("DTA_BENCH_REMAT", "1") != "0"
    policy = os.environ.get("DTA_BENCH_REMAT_POLICY") or None
    segments = int(os.environ.get("DTA_BENCH_SEGMENTS", "0"))
    ec = EngineConfig(block_q=blk, block_kv=bkv, remat=remat, attn_backend="pallas",
                      remat_policy=policy, remat_segments=segments,
                      loss_chunk=chunk,
                      bucketing="exact")  # fixed workload: measure the engine, not padding
    # The tree engine may use a lighter remat than the dense baseline: the
    # trie packs ~5x fewer tokens, so activations that OOM dense can fit tree
    # (the reference's dense baseline likewise needs --act-ckpt at scale,
    # reference: exp/exp_dense.py:11-15). Default: tree saves the attention
    # kernel outputs ("attn" policy — fwd kernel runs once per step, measured
    # 13% step win; ~1.8GB at 0.6B/15k tokens) while dense keeps full
    # recompute (saving o at its ~4x padded length OOMs the chip — each
    # engine runs its best feasible config).
    t_remat = os.environ.get("DTA_BENCH_TREE_REMAT")
    t_policy = os.environ.get("DTA_BENCH_TREE_POLICY", "attn")
    ec_tree = ec
    if t_remat is not None or t_policy is not None:
        import dataclasses

        ec_tree = dataclasses.replace(
            ec,
            remat=remat if t_remat is None else t_remat != "0",
            remat_policy=policy if t_policy is None else (t_policy or None),
        )

    # tau2-16k-like: long shared tool-call prompts, heavy branching.
    # Headline workload = ONE prompt group × 16 rollouts — the per-chip slice
    # of a data-parallel GRPO step (each data rank trains its own group(s);
    # parallel/load_balance.py keeps groups whole). The 2-group workload is
    # measured every round too so round-over-round deltas isolate the engine
    # (both series pinned since r03; r01 reported 2-group, r02 1-group).
    engine = TreeEngine(mc, ec)
    tree_engine = engine if ec_tree is ec else TreeEngine(mc, ec_tree)
    params = init_params(mc, jax.random.key(0), dtype=jnp.bfloat16)
    from dynamictreeattn_tpu.utils.profiling import device_memory_stats

    forced = os.environ.get("DTA_BENCH_PROMPTS")
    group_counts = [int(forced)] if forced else [1, 2]
    workloads = []
    for n_prompts in group_counts:
        seqs, attachs = synthetic_rollout_batch(
            seed=0, n_prompts=n_prompts, samples_per_prompt=16,
            prompt_len=(1024, 2048), completion_len=(128, 512),
            branch_prob=0.85,
        )
        n_dense = sum(len(s) for s in seqs)
        share = sharing_ratio(seqs)

        tree_batch = tree_engine.prepare(TokenTrie(seqs, attachs))
        dense_batch = engine.prepare(
            pack_sequences_dense(seqs, attachs, pad_multiple=ec.pad_multiple)
        )

        loss_t, dt_tree = timed_step(tree_engine.loss_and_grad, params, tree_batch)
        loss_d, dt_dense = timed_step(engine.loss_and_grad, params, dense_batch)

        loss_rel = abs(loss_t - loss_d) / max(1e-9, abs(loss_d))
        assert loss_rel < 1e-3, f"tree/dense loss diverged: {loss_rel}"

        tree_tps = n_dense / dt_tree
        dense_tps = n_dense / dt_dense
        mem = device_memory_stats()
        peak = mem.get("peak_bytes_in_use")
        print(
            f"# groups={n_prompts}: {len(seqs)} seqs, {n_dense} dense tokens, "
            f"sharing={share:.3f}, "
            f"tree packed {tree_batch.packed.n_tokens}->{tree_batch.n_padded}, "
            f"tree {dt_tree*1e3:.0f}ms dense {dt_dense*1e3:.0f}ms, "
            f"loss_rel={loss_rel:.2e}"
            + (f", peak HBM {peak/2**30:.2f} GiB" if peak else ""),
            file=sys.stderr,
        )
        workloads.append({
            "groups": n_prompts,
            "tokens_per_s": round(tree_tps, 1),
            "vs_dense": round(tree_tps / dense_tps, 3),
            "dense_tokens": n_dense,
            "sharing": round(share, 3),
        })

    # ---- production-path line: the full Trainer (ladder buckets + live
    # TM-balanced packing + adamw update, donated) over a stream of varying
    # 2-group batches — what a real RL loop runs, vs the exact-bucket
    # engine-only headline above (the gap is padding + optimizer;
    # docs/PERF.md "production path"). Skipped when DTA_BENCH_PROMPTS pins a
    # custom single workload.
    model_name = os.environ.get("DTA_BENCH_MODEL", "qwen3-0.6b")
    if (not forced and os.environ.get("DTA_BENCH_LADDER", "1") != "0"
            and model_name == "qwen3-0.6b"):
        # flagship only: the Trainer holds fp32 adamw moments (8 bytes/param)
        # beside bf16 params — 1.7B+ exceeds the 16 GB chip in this section
        import dataclasses as _dc

        from dynamictreeattn_tpu.training import TrainConfig, Trainer

        tr = Trainer(
            mc, _dc.replace(ec_tree, bucketing="ladder"),
            TrainConfig(dp=1, tp=1),
        )
        tr.init(seed=0)
        stream = [
            synthetic_rollout_batch(
                seed=100 + i, n_prompts=2, samples_per_prompt=16,
                prompt_len=(1024, 2048), completion_len=(128, 512),
                branch_prob=0.85,
            )
            for i in range(4)
        ]
        for s, a in stream:  # warm every ladder bucket + the trainer step
            tr.train_step(s, a)
        n_dense = sum(len(x) for s, _ in stream for x in s)
        t0 = time.time()
        for s, a in stream:
            tr.train_step(s, a)
        ladder_tps = n_dense / (time.time() - t0)
        print(f"# trainer ladder stream: {n_dense} dense tokens, "
              f"{ladder_tps:.0f} tok/s", file=sys.stderr)
        workloads.append({
            "groups": 2, "mode": "trainer_ladder",
            "tokens_per_s": round(ladder_tps, 1),
            "dense_tokens": n_dense,
        })

    head = workloads[0]
    print(json.dumps({
        "metric": f"{os.environ.get('DTA_BENCH_MODEL', 'qwen3-0.6b')}"
                  "_tree_train_dense_equiv_tokens_per_s_per_chip",
        "value": head["tokens_per_s"],
        "unit": "tokens/s",
        "vs_baseline": head["vs_dense"],
        "workloads": workloads,
    }))


if __name__ == "__main__":
    # the tunneled TPU occasionally fails a first attempt with a transient
    # backend error (RESOURCE_EXHAUSTED / FAILED_PRECONDITION); one retry
    # after a pause has always succeeded
    try:
        main()
    except Exception as e:  # noqa: BLE001
        transient = any(
            tag in f"{type(e).__name__} {e}"
            for tag in ("RESOURCE_EXHAUSTED", "FAILED_PRECONDITION",
                        "ResourceExhausted", "FailedPrecondition",
                        "UNAVAILABLE", "DEADLINE_EXCEEDED")
        )
        if not transient:
            raise
        print(f"# transient backend failure ({type(e).__name__}); retrying",
              file=sys.stderr)
        time.sleep(15)
        main()
