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
    # sharded warmup: pre-bake the dp x tp (x fsdp) train step — the
    # expensive compiles of a pod bring-up — from ShapeDtypeStructs with
    # the canonical NamedShardings attached (so the runtime step, whose
    # params/batches carry the same shardings, hits the persistent cache)
    p.add_argument("--dp", type=int, default=0,
                   help=">0: warm the SHARDED train step on a dp x tp mesh "
                        "(parallel.make_train_step) instead of the "
                        "single-chip engine")
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--fsdp", action="store_true")
    p.add_argument("--opt", action="store_true",
                   help="warm the adamw optimizer step (Trainer path) "
                        "rather than grads-only")
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

    if args.dp > 0:
        return _warm_sharded(args, mc, ec, pshapes, buckets)
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
            if ec.attn_backend == "pallas" and engine._bwd_mode() == "cached":
                # prepare() appends the Belady cache schedule; mirror its
                # slot count so the compile-cache key matches at runtime
                from dynamictreeattn_tpu.ops.tree_attention import (
                    BlockSizes, cached_bwd_geometry,
                )

                hkv = mc.num_key_value_heads
                _, r = cached_bwd_geometry(
                    hkv, mc.num_attention_heads // hkv, ec.block_q,
                    ec.block_kv, mc.head_dim, nk, BlockSizes().head_block,
                )
                meta = meta + (sd((nq, kv_w, 4), i32), sd((r, 2), i32))
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


def _warm_sharded(args, mc, ec, pshapes, buckets):
    import time

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from dynamictreeattn_tpu.parallel import make_mesh
    from dynamictreeattn_tpu.parallel.train import (
        batch_partition_specs, fsdp_param_specs, make_train_step,
        param_specs, FSDP_MIN_SIZE,
    )

    mesh = make_mesh(dp=args.dp, tp=args.tp)
    optimizer = None
    if args.opt:
        import optax

        optimizer = optax.adamw(1e-5)
    step = make_train_step(mc, mesh, ec, optimizer=optimizer,
                           fsdp=args.fsdp)
    pspecs = (
        fsdp_param_specs(mc, args.dp, FSDP_MIN_SIZE)
        if args.fsdp and args.dp > 1 else param_specs(mc)
    )
    sd = jax.ShapeDtypeStruct
    psh = jax.tree.map(
        lambda a, spec: sd(a.shape, a.dtype, sharding=NamedSharding(mesh, spec)),
        pshapes, pspecs,
    )
    opt_sh = None
    if optimizer is not None:
        from dynamictreeattn_tpu.parallel.train import init_opt_state

        opt_sh = jax.eval_shape(lambda p: init_opt_state(optimizer, p), psh)
    from dynamictreeattn_tpu.parallel.train import _stack_wants_cache_sched

    want_sched = _stack_wants_cache_sched(ec, 1)
    bspec = batch_partition_specs(1, "ulysses", cache_sched=want_sched)
    i32, f32 = jnp.int32, jnp.float32
    total = 0.0
    for n_pad in buckets:
        nq, nk = n_pad // ec.block_q, n_pad // ec.block_kv
        kv_ws, q_ws = _pow2_widths(nk), _pow2_widths(nq)
        depth_ = max(len(kv_ws), len(q_ws))
        ext = lambda ws: ws + [ws[-1]] * (depth_ - len(ws))
        for kv_w, q_w in zip(ext(kv_ws), ext(q_ws)):
            shapes = {
                "tokens": (i32, (n_pad,)), "depth": (i32, (n_pad,)),
                "parent": (i32, (n_pad,)), "last_desc": (i32, (n_pad,)),
                "w_logprob": (f32, (n_pad,)), "w_entropy": (f32, (n_pad,)),
                "valid": (f32, (n_pad,)),
                "kv_ids": (i32, (nq, kv_w)), "kv_counts": (i32, (nq,)),
                "kv_types": (i32, (nq, kv_w)), "q_ids": (i32, (nk, q_w)),
                "q_counts": (i32, (nk,)), "q_types": (i32, (nk, q_w)),
            }
            if want_sched:  # mirror stack_batches' fixed slot-count rule
                shapes["cache_actions"] = (i32, (nq, kv_w, 4))
                shapes["cache_flush"] = (i32, (min(16, nk), 2))
            batch_sh = {
                k: sd((args.dp,) + shp, dt,
                      sharding=NamedSharding(mesh, bspec[k]))
                for k, (dt, shp) in shapes.items()
            }
            t0 = time.time()
            if optimizer is None:
                step.lower(psh, batch_sh).compile()
            else:
                step.lower(psh, opt_sh, batch_sh).compile()
            dt = time.time() - t0
            total += dt
            print(f"sharded bucket {n_pad:7d}  kv_w {kv_w:4d}  q_w {q_w:4d}"
                  f"  dp={args.dp} tp={args.tp} fsdp={args.fsdp} "
                  f"opt={args.opt}  compiled in {dt:6.1f}s", flush=True)
    print(f"warmed {len(buckets)} sharded buckets in {total:.0f}s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
