"""Fully self-contained RL loop on TPU: sample rollouts → reward → GRPO.

Where examples/grpo.py trains on pre-made rollouts (the reference's setting —
its host framework AReaL produces the sequences, reference: README.md:4-5),
this loop closes the cycle inside the framework:

1. **Rollout**: `models.generate` samples G completions per prompt with a
   KV cache (temperature sampling). All G share the prompt — exactly the
   prefix-sharing structure the tree engine exploits.
2. **Reward**: a synthetic verifier (fraction of even tokens) stands in for
   a reward model; GRPO advantages standardize within each prompt group.
3. **Update**: one fused tree step over the whole rollout trie via the
   pluggable per-sequence loss (clipped ratio vs the sampling policy's
   logprobs, which `engine.forward` recomputes in one inference walk).

With an even-token reward the policy measurably shifts its sampling mass:
mean reward climbs within a few iterations even on a random tiny model.

    python -m examples.rl_loop --model qwen3-tiny --iters 8 \
        --attn-backend reference --dtype fp32            # CPU
    python -m examples.rl_loop --model qwen3-0.6b --iters 4   # TPU
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from examples.grpo import grpo_advantages, make_grpo_loss


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from dynamictreeattn_tpu.cli.common import add_engine_args, add_model_args

    add_model_args(p)
    add_engine_args(p)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--n-prompts", type=int, default=2)
    p.add_argument("--samples", type=int, default=8)
    p.add_argument("--prompt-len", type=int, default=24)
    p.add_argument("--max-new", type=int, default=16)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--rollout-temp", type=float, default=1.0)
    p.add_argument("--clip-eps", type=float, default=0.2)
    p.add_argument("--ent-bonus", type=float, default=0.0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from dynamictreeattn_tpu.cli.common import build_engine
    from dynamictreeattn_tpu.models import (
        MODEL_CONFIGS,
        generate_grouped,
        init_params,
    )
    from dynamictreeattn_tpu.tries import TokenTrie

    mc = MODEL_CONFIGS[args.model]
    engine, ec = build_engine(mc, args)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    params = init_params(mc, jax.random.key(args.seed), dtype=dtype)
    opt = optax.adamw(args.lr)
    opt_state = opt.init(params)
    loss_fn = make_grpo_loss(args.clip_eps, args.ent_bonus)

    rng = np.random.default_rng(args.seed)
    prompts = rng.integers(
        1, mc.vocab_size, size=(args.n_prompts, args.prompt_len)
    ).astype(np.int32)
    key = jax.random.key(args.seed + 1)

    import time

    history = []
    for it in range(args.iters):
        t0 = time.time()
        # ---- rollout: G samples per prompt with a SHARED prompt KV cache
        # (generate_grouped prefills each prompt once and decodes G branches
        # against the frozen shared prefix — the rollout-side mirror of the
        # tree engine's prefix sharing)
        B = args.n_prompts * args.samples
        lens = np.full((args.n_prompts,), args.prompt_len, np.int32)
        key, kgen = jax.random.split(key)
        gen = generate_grouped(
            params, mc, prompts, lens, args.samples, args.max_new,
            key=kgen, temperature=args.rollout_temp,
        ).reshape(B, args.max_new)
        prompt_rows = np.repeat(prompts, args.samples, axis=0)
        seqs = [np.concatenate([prompt_rows[b], gen[b]]).astype(np.int32)
                for b in range(B)]
        t_roll = time.time() - t0
        attachs = [
            {"prompt_id": b // args.samples, "prompt_len": args.prompt_len}
            for b in range(B)
        ]

        # ---- reward + GRPO advantages
        rewards = np.array([
            float((gen[b] % 2 == 0).mean()) for b in range(B)
        ])
        groups = np.array([a["prompt_id"] for a in attachs])
        adv = grpo_advantages(rewards, groups)

        # ---- one fused tree-training step
        batch = engine.prepare(TokenTrie(seqs, attachs))
        ids = [int(x) for x in batch.packed.seq_batch_ids]
        lmax = int(batch.packed.seq_lens.max())
        t1 = time.time()
        old_lp = engine.forward(params, batch)
        t_fwd = time.time() - t1
        beh = np.zeros((len(ids), lmax - 1), np.float32)
        for row, b in enumerate(ids):
            beh[row, : len(old_lp[b])] = old_lp[b]
        extras = {
            "behavior_lp": jnp.asarray(beh),
            "adv": jnp.asarray(adv[ids].astype(np.float32)),
            "prompt_len": jnp.asarray(
                np.array([attachs[b]["prompt_len"] for b in ids], np.int32)
            ),
        }
        t2 = time.time()
        loss, grads = engine.loss_and_grad_custom(params, batch, loss_fn, extras)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        jax.block_until_ready(params["embed"])
        t_train = time.time() - t2

        rec = {"iter": it + 1, "loss": float(loss),
               "mean_reward": float(rewards.mean()),
               "n_tree_tokens": int(batch.packed.n_tokens),
               "t_rollout": round(t_roll, 3), "t_behavior_fwd": round(t_fwd, 3),
               "t_train": round(t_train, 3),
               "t_iter": round(time.time() - t0, 3)}
        history.append(rec)
        print(json.dumps(rec), flush=True)
    return history


if __name__ == "__main__":
    main()
