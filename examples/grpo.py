"""End-to-end GRPO demo on prefix-shared rollouts — the reference's target
workload (GRPO/tree-search groups of completions branching off shared
prompts; reference: README.md:1-5, tree_training_engine.py).

The loop a user of the reference would port:

1. sample rollout groups (here: synthetic tries with controllable sharing);
2. recompute behavior ("old") logprobs with the inference-mode tree walk
   (`engine.forward` — reference: tree_training_engine.py:516-553);
3. score each completion, normalize rewards within each prompt group
   (GRPO advantages);
4. train with a clipped-ratio objective via the pluggable per-sequence
   loss (`engine.loss_and_grad_custom` — the reference's
   ``loss_fn(logprobs, entropy, attachment)`` contract,
   reference: run.py:149-152) — every shared prefix token is forwarded
   and backpropagated ONCE for the whole group.

Run (any backend):
    python -m examples.grpo --model qwen3-tiny --steps 5 \
        --attn-backend reference --dtype fp32           # CPU
    python -m examples.grpo --model qwen3-0.6b --steps 5  # TPU
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def grpo_advantages(rewards: np.ndarray, groups: np.ndarray) -> np.ndarray:
    """Per-sequence advantage: reward standardized within its prompt group."""
    adv = np.zeros_like(rewards, dtype=np.float32)
    for g in np.unique(groups):
        m = groups == g
        r = rewards[m]
        adv[m] = (r - r.mean()) / (r.std() + 1e-6)
    return adv


def make_grpo_loss(clip_eps: float, ent_bonus: float):
    import jax.numpy as jnp

    def loss_fn(lp, ent, extras, length):
        # token mask: completion edges only (prompt tokens are context)
        t = jnp.arange(lp.shape[0])
        m = ((t < length - 1) & (t >= extras["prompt_len"] - 1)).astype(
            jnp.float32
        )
        n_tok = jnp.maximum(jnp.sum(m), 1.0)
        # mask INSIDE the exp: padded rows would overflow to inf and turn
        # the masked product into NaN
        ratio = jnp.exp(jnp.where(m > 0, lp - extras["behavior_lp"], 0.0))
        adv = extras["adv"]  # scalar, sequence-level (GRPO)
        obj = jnp.minimum(
            ratio * adv, jnp.clip(ratio, 1 - clip_eps, 1 + clip_eps) * adv
        )
        m_en = (jnp.arange(ent.shape[0]) < length).astype(jnp.float32)
        return (
            -jnp.sum(obj * m) / n_tok
            - ent_bonus * jnp.sum(ent * m_en) / jnp.maximum(length, 1)
        )

    return loss_fn


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from dynamictreeattn_tpu.cli.common import add_engine_args, add_model_args

    add_model_args(p)
    add_engine_args(p)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--n-prompts", type=int, default=2)
    p.add_argument("--samples", type=int, default=8)
    p.add_argument("--prompt-len", type=int, default=48)
    p.add_argument("--completion-len", type=int, default=24)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--clip-eps", type=float, default=0.2)
    p.add_argument("--ent-bonus", type=float, default=0.01)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from dynamictreeattn_tpu.cli.common import build_engine
    from dynamictreeattn_tpu.data import synthetic_rollout_batch
    from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params
    from dynamictreeattn_tpu.tries import TokenTrie

    mc = MODEL_CONFIGS[args.model]
    engine, ec = build_engine(mc, args)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    params = init_params(mc, jax.random.key(args.seed), dtype=dtype)
    opt = optax.adamw(args.lr)
    opt_state = opt.init(params)

    # one fixed rollout batch (a real loop would resample per step)
    seqs, attachs = synthetic_rollout_batch(
        seed=args.seed, n_prompts=args.n_prompts,
        samples_per_prompt=args.samples,
        prompt_len=(args.prompt_len, args.prompt_len + 16),
        completion_len=(args.completion_len, args.completion_len + 8),
        vocab_size=mc.vocab_size,
    )
    # synthetic reward: fraction of even tokens in the completion — a
    # learnable target (stands in for a verifier / reward model)
    prompt_lens = np.array(
        [int(a.get("prompt_len", args.prompt_len)) for a in attachs]
    )
    groups = np.array([int(a.get("prompt_id", i // args.samples))
                       for i, a in enumerate(attachs)])
    rewards = np.array([
        float((np.asarray(s)[pl:] % 2 == 0).mean())
        for s, pl in zip(seqs, prompt_lens)
    ])
    adv = grpo_advantages(rewards, groups)

    batch = engine.prepare(TokenTrie(seqs, attachs))
    ids = [int(b) for b in batch.packed.seq_batch_ids]
    lmax = int(batch.packed.seq_lens.max())

    # behavior logprobs from the CURRENT policy (one inference tree walk)
    old_lp = engine.forward(params, batch)
    beh = np.zeros((len(ids), lmax - 1), np.float32)
    for row, b in enumerate(ids):
        lp = old_lp[b]
        beh[row, : len(lp)] = lp
    extras = {
        "behavior_lp": jnp.asarray(beh),
        "adv": jnp.asarray(adv[ids].astype(np.float32)),
        "prompt_len": jnp.asarray(prompt_lens[ids].astype(np.int32)),
    }

    loss_fn = make_grpo_loss(args.clip_eps, args.ent_bonus)
    history = []
    for step in range(args.steps):
        loss, grads = engine.loss_and_grad_custom(params, batch, loss_fn, extras)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        rec = {"step": step + 1, "loss": float(loss),
               "mean_reward": float(rewards.mean())}
        history.append(rec)
        print(json.dumps(rec), flush=True)
    return history


if __name__ == "__main__":
    main()
