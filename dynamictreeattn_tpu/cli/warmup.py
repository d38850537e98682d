"""warmup — AOT-compile the engine for the common shape buckets.

Compile times dominate iteration on fresh machines (~minutes per new shape
on remote-compile TPU backends). The engine's static-shape discipline keys
each compile on (bucket length, kv slot width, q slot width) — this CLI
pre-bakes those combinations into the persistent compilation cache
(JAX_COMPILATION_CACHE_DIR) using AOT lowering: no data, no real params,
just jax.ShapeDtypeStructs.

Example:
    JAX_COMPILATION_CACHE_DIR=.jax_cache python -m dynamictreeattn_tpu.cli.warmup \
        --model qwen3-0.6b --max-len 16384 --widths auto

The reference has no counterpart (single-shape CUDA eager mode); this is a
TPU-native operational need (SURVEY.md §7.3 hard part 3: bucketing/padding
discipline so recompiles are rare).
"""

from __future__ import annotations

import argparse
import sys
import time


def _pow2_widths(nblocks: int):
    """Every slot width the engine can emit for `nblocks` blocks: powers of
    two up to AND INCLUDING _next_pow2(nblocks) (the engine pads the actual
    slot count to the next power of two — tree_engine.prepare)."""
    out, w = [], 1
    while w < nblocks:
        out.append(w)
        w *= 2
    out.append(w)  # == _next_pow2(nblocks)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from dynamictreeattn_tpu.cli.common import add_engine_args, add_model_args

    add_model_args(p)
    add_engine_args(p)
    p.add_argument("--max-len", type=int, default=16384,
                   help="largest packed-trie bucket to pre-compile")
    p.add_argument("--min-len", type=int, default=0)
    p.add_argument("--widths", default="square",
                   help="'square' (kv width = q width, every pow2 the engine "
                        "can emit — the common case since kv/q counts "
                        "correlate), 'cross' (full kv x q width product — "
                        "exhaustive, quadratic compiles), 'max' (worst case "
                        "only), or a comma list of widths")
    p.add_argument("--fwd-only", action="store_true",
                   help="compile engine.loss (inference) instead of "
                        "loss_and_grad")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dynamictreeattn_tpu.cli.common import build_engine
    from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params

    mc = MODEL_CONFIGS[args.model]
    engine, ec = build_engine(mc, args)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    pshapes = jax.eval_shape(
        lambda key: init_params(mc, key, dtype=dtype), jax.random.key(0)
    )

    # enumerate ladder buckets
    buckets, n = [], max(args.min_len, ec.pad_multiple)
    while True:
        b = ec.bucket_length(n)
        if b > args.max_len:
            break
        buckets.append(b)
        n = b + 1
    fn = engine._loss_fn if args.fwd_only else engine._grad_fn

    total = 0.0
    for n_pad in buckets:
        nq, nk = n_pad // ec.block_q, n_pad // ec.block_kv
        kv_ws, q_ws = _pow2_widths(nk), _pow2_widths(nq)
        if args.widths == "square":
            depth = max(len(kv_ws), len(q_ws))
            ext = lambda ws: ws + [ws[-1]] * (depth - len(ws))
            pairs = list(zip(ext(kv_ws), ext(q_ws)))
        elif args.widths == "cross":
            pairs = [(kw, qw) for kw in kv_ws for qw in q_ws]
        elif args.widths == "max":
            pairs = [(kv_ws[-1], q_ws[-1])]
        else:
            ws = [int(x) for x in args.widths.split(",")]
            pairs = [(w, w) for w in ws]
        for kv_w, q_w in pairs:
            i32 = jnp.int32
            sd = jax.ShapeDtypeStruct
            meta = (
                sd((nq, kv_w), i32), sd((nq,), i32), sd((nq, kv_w), i32),
                sd((nk, q_w), i32), sd((nk,), i32), sd((nk, q_w), i32),
            )
            t0 = time.time()
            fn.lower(
                pshapes,
                sd((n_pad,), i32), sd((n_pad,), i32), sd((n_pad,), i32),
                sd((n_pad,), i32), sd((n_pad,), jnp.float32),
                sd((n_pad,), jnp.float32), sd((n_pad,), jnp.float32), meta,
            ).compile()
            dt = time.time() - t0
            total += dt
            print(f"bucket {n_pad:7d}  kv_w {kv_w:4d}  q_w {q_w:4d}  "
                  f"compiled in {dt:6.1f}s", flush=True)
    print(f"warmed {len(buckets)} buckets in {total:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
