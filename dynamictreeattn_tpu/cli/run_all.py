"""Batch benchmark CLI (reference: run_all.py:104-165).

Runs the chosen engine over every data file in a folder with one persistent
engine and shared jit cache, logs per-trie stats JSONL (the TreeTimeModel's
training data), and prints aggregate throughput.

    python -m dynamictreeattn_tpu.cli.run_all --data-dir data/tau2 \
        --run tree_backward --stats-out stats/tree.jsonl
"""

from __future__ import annotations

import argparse
import glob
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
    timed_call,
    weight_fn_from_args,
)
from dynamictreeattn_tpu.cli.run import RUNS


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    add_engine_args(p)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--glob", default="*.pt")
    p.add_argument("--run", required=True, choices=RUNS)
    p.add_argument("--iters", type=int, default=1)
    p.add_argument("--warmup", type=int, default=1,
                   help="files to re-run once for jit warmup (reference: run_all.py)")
    p.add_argument("--stats-out", default=None)
    args = p.parse_args(argv)

    from dynamictreeattn_tpu.data.io import load_sequences
    from dynamictreeattn_tpu.engine import pack_sequences_dense
    from dynamictreeattn_tpu.tries import flatten_trie, trie_stats

    mc, params = build_model(args)
    engine, ec = build_engine(mc, args)
    kind, mode = args.run.split("_")
    weight_fn = weight_fn_from_args(args)

    files = sorted(glob.glob(os.path.join(args.data_dir, args.glob)))
    if not files:
        sys.exit(f"no files match {args.data_dir}/{args.glob}")

    total_tokens = 0
    total_time = 0.0
    for idx, f in enumerate(files):
        seqs = load_sequences(f)
        if not seqs:
            # the contiguous DFS-TM partitioner may emit empty bins when the
            # makespan-optimal split uses fewer than K segments — an empty
            # bin is a 0-time device, not an error
            print(f"# skip empty {f}", file=sys.stderr)
            continue
        attachs = [
            {"w_logprobs": args.w_logprobs, "w_entropy": args.w_entropy}
            for _ in seqs
        ]
        trie = prepare_trie(seqs, attachs, args, mode)
        if kind == "tree":
            packed = flatten_trie(trie, weight_fn=weight_fn)
        else:
            packed = pack_sequences_dense(
                seqs, attachs, pad_multiple=ec.pad_multiple, weight_fn=weight_fn
            )
        batch = engine.prepare(packed)
        n_dense = sum(len(s) for s in seqs)

        iters = args.iters + (args.warmup if idx == 0 else 0)
        if mode == "backward":
            (loss, _, aux), dt = timed_call(
                engine.loss_and_grad, params, batch,
                iters=iters, sync=lambda o: float(o[0]),
            )
            loss_val = float(loss)
        else:
            _, dt = timed_call(engine.forward, params, batch, iters=iters)
            loss_val = None

        rec = {
            "file": os.path.basename(f),
            "run": args.run,
            "model": args.model,
            "time": dt,
            "loss": loss_val,
            "n_sequences": len(seqs),
            "n_tokens": n_dense,
            "n_padded": batch.n_padded,
            "block_size": ec.block_q,
            **trie_stats(trie.lens, trie.lcp_lens, mode=mode, block_size=ec.block_q),
            "ts": time.time(),
        }
        append_stats(args.stats_out, rec)
        print(json.dumps(rec))
        total_tokens += n_dense
        total_time += dt

    print(json.dumps({
        "aggregate": True,
        "run": args.run,
        "files": len(files),
        "total_tokens": total_tokens,
        "total_time": total_time,
        "tokens_per_s": total_tokens / total_time,
    }))


if __name__ == "__main__":
    main()
