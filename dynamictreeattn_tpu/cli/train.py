"""Training-loop CLI: sharded RL-style trie training with checkpointing.

New capability vs the reference (which computes grads only). Demonstrates the
full stack: rollout stream → TM-balanced DP packing → fused tree step on a
(data, model) mesh → optax update → orbax checkpoints.

    python -m dynamictreeattn_tpu.cli.train --model qwen3-0.6b \
        --data synthetic:n_prompts=2,samples=8 --steps 20 --dp 1 --tp 1 \
        --ckpt-dir ckpt/ --ckpt-every 10
"""

from __future__ import annotations

import argparse
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from dynamictreeattn_tpu.cli.common import add_engine_args, add_model_args


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    add_engine_args(p)
    p.add_argument("--data", required=True,
                   help="path or synthetic: spec; re-sampled per step for synthetic")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence parallelism over the seq axis")
    p.add_argument("--sp-mode", default="ulysses", choices=["ulysses", "ring"],
                   help="ulysses (all-to-all, sp <= kv_heads/tp) or ring "
                        "(K/V rotation, any sp dividing the padded length)")
    p.add_argument("--pp", type=int, default=1,
                   help="GPipe pipeline stages (must divide n_layers)")
    p.add_argument("--pp-schedule", default="gpipe", choices=["gpipe", "1f1b"],
                   help="microbatch schedule: gpipe (memory grows with M) or "
                        "1f1b (O(pp) activation memory)")
    p.add_argument("--microbatches", type=int, default=4,
                   help="microbatches per data rank when --pp > 1")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--grad-accum", type=int, default=1)
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--ep", action="store_true",
                   help="MoE: shard experts over the data axis with token "
                        "all-to-all dispatch (E >> tp regime)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed and place params/"
                        "batches with put_global (run the same command "
                        "on every host)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: shard params/grads/opt state over the data axis")
    p.add_argument("--fsdp-min-size", type=int, default=1 << 16,
                   help="per-layer element floor below which a leaf stays replicated")
    p.add_argument("--lb-method", default="LB_by_DFS_and_TM",
                   choices=["LB_by_DFS_and_TM", "LB_by_n_tokens"])
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--ckpt-every", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--stats-out", default=None)
    args = p.parse_args(argv)

    from dynamictreeattn_tpu.cli.common import append_stats, build_engine
    from dynamictreeattn_tpu.data.io import parse_data_spec
    from dynamictreeattn_tpu.models import MODEL_CONFIGS
    from dynamictreeattn_tpu.training import TrainConfig, Trainer

    if args.multihost:
        from dynamictreeattn_tpu.parallel.distributed import (
            initialize_multihost,
        )

        initialize_multihost()
    mc = MODEL_CONFIGS[args.model]
    _, ec = build_engine(mc, args)
    tc = TrainConfig(
        dp=args.dp, tp=args.tp, sp=args.sp, sp_mode=args.sp_mode, pp=args.pp,
        pp_schedule=args.pp_schedule,
        microbatches=args.microbatches, learning_rate=args.lr,
        weight_decay=args.weight_decay, grad_clip=args.grad_clip,
        grad_accum=args.grad_accum, warmup_steps=args.warmup_steps,
        fsdp=args.fsdp, fsdp_min_size=args.fsdp_min_size, ep=args.ep,
        multihost=args.multihost,
        param_dtype=args.dtype if args.dtype == "bf16" else "fp32",
        lb_method=args.lb_method, lb_block_size=args.block_q,
        ckpt_dir=args.ckpt_dir, ckpt_every=args.ckpt_every,
    )
    trainer = Trainer(mc, ec, tc)
    if args.resume and args.ckpt_dir:
        trainer.restore()
        print(f"resumed at step {trainer.step_idx}")
    else:
        trainer.init(seed=args.seed)

    synthetic = args.data.startswith("synthetic:")
    for i in range(args.steps):
        spec = args.data + (f",seed={args.seed + trainer.step_idx}" if synthetic
                            and "seed=" not in args.data else "")
        seqs, attachs = parse_data_spec(spec, mc.vocab_size)
        rec = trainer.train_step(seqs, attachs)
        print(json.dumps(rec))
        append_stats(args.stats_out, rec)
    if args.ckpt_dir:
        trainer.save()
        print(f"saved checkpoint at step {trainer.step_idx}")


if __name__ == "__main__":
    main()
