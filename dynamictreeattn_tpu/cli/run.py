"""Single-run CLI (reference: run.py:163-243).

Examples (reference: run.py:245-261 recipes):

    python -m dynamictreeattn_tpu.cli.run --model qwen3-0.6b \
        --data synthetic:n_prompts=2,samples=8 --run tree_backward
    python -m dynamictreeattn_tpu.cli.run --run dense_backward \
        --data data/call1.pt --grad-out grad/dense.npz
    # grad parity: run both with --grad-out, then cli.compare_grads
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from dynamictreeattn_tpu.cli.common import (
    add_engine_args,
    add_model_args,
    append_stats,
    build_engine,
    build_model,
    prepare_trie,
    save_grads_npz,
    timed_call,
    weight_fn_from_args,
)

RUNS = ["tree_forward", "tree_backward", "dense_forward", "dense_backward"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    add_engine_args(p)
    p.add_argument("--data", required=True, help="path (.pt/.npz) or synthetic: spec")
    p.add_argument("--run", required=True, choices=RUNS)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--grad-out", default=None, help="save grads (.npz)")
    p.add_argument("--logprobs-out", default=None,
                   help="save per-sequence logprobs from forward runs (.npz)")
    p.add_argument("--stats-out", default=None, help="append stats JSONL")
    args = p.parse_args(argv)

    from dynamictreeattn_tpu.data.io import parse_data_spec
    from dynamictreeattn_tpu.engine import pack_sequences_dense
    from dynamictreeattn_tpu.tries import flatten_trie, trie_stats

    mc, params = build_model(args)
    engine, ec = build_engine(mc, args)
    seqs, attachs = parse_data_spec(args.data, mc.vocab_size)
    for a in attachs:
        a.setdefault("w_logprobs", args.w_logprobs)
        a.setdefault("w_entropy", args.w_entropy)

    kind, mode = args.run.split("_")
    trie = prepare_trie(seqs, attachs, args, mode)
    weight_fn = weight_fn_from_args(args)
    if kind == "tree":
        packed = flatten_trie(trie, weight_fn=weight_fn)
        stats = trie_stats(trie.lens, trie.lcp_lens, mode=mode, block_size=ec.block_q)
    else:
        packed = pack_sequences_dense(
            seqs, attachs, pad_multiple=ec.pad_multiple, weight_fn=weight_fn
        )
        stats = trie_stats(
            np.array([len(s) for s in seqs]),
            np.zeros(len(seqs) - 1, dtype=np.int64),
            mode=mode,
            block_size=ec.block_q,
        )
    batch = engine.prepare(packed)

    n_dense = sum(len(s) for s in seqs)
    record = {
        "run": args.run,
        "model": args.model,
        "dtype": args.dtype,
        "attn_backend": args.attn_backend,
        "permute": args.permute,
        "n_sequences": len(seqs),
        "n_tokens": n_dense,
        "n_padded": batch.n_padded,
        "block_size": ec.block_q,
        **stats,
    }

    if mode == "backward":
        (loss, grads, aux), dt = timed_call(
            engine.loss_and_grad, params, batch,
            iters=args.iters, sync=lambda o: float(o[0]),
        )
        record.update(
            loss=float(loss),
            sum_logprob=float(aux["sum_logprob"]),
            sum_entropy=float(aux["sum_entropy"]),
        )
        if args.grad_out:
            save_grads_npz(args.grad_out, grads)
            print(f"saved grads -> {args.grad_out}", file=sys.stderr)
        else:
            import jax

            gn = float(
                sum(float((np.asarray(g, np.float32) ** 2).sum())
                    for g in jax.tree.leaves(grads))
            ) ** 0.5
            record["grad_norm"] = gn
    else:
        lp, dt = timed_call(engine.forward, params, batch, iters=args.iters)
        record["sum_logprobs"] = float(sum(float(v.sum()) for v in lp.values()))
        if args.logprobs_out:
            np.savez(args.logprobs_out, **{str(k): v for k, v in lp.items()})
            print(f"saved logprobs -> {args.logprobs_out}", file=sys.stderr)

    record["time"] = dt
    record["tokens_per_s"] = n_dense / dt
    from dynamictreeattn_tpu.utils.profiling import device_memory_stats

    mem = device_memory_stats()
    if mem.get("peak_bytes_in_use"):
        record["peak_mem_gb"] = round(mem["peak_bytes_in_use"] / 2**30, 3)
    print(json.dumps(record))
    record["ts"] = time.time()
    append_stats(args.stats_out, record)


if __name__ == "__main__":
    main()
