"""Shared CLI plumbing: model/engine construction, timing, stats, grad IO."""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

__all__ = [
    "add_model_args",
    "add_engine_args",
    "build_model",
    "build_engine",
    "prepare_trie",
    "timed_call",
    "append_stats",
    "save_grads_npz",
    "load_grads_npz",
    "weight_fn_from_args",
]


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default="qwen3-0.6b",
                   help="model preset name (see models.MODEL_CONFIGS)")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--ckpt", default=None,
                   help="HF safetensors checkpoint dir (default: random init)")
    p.add_argument("--seed", type=int, default=0)


def add_engine_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--block-q", type=int, default=512)
    p.add_argument("--block-kv", type=int, default=512)
    p.add_argument("--attn-backend", default="pallas", choices=["pallas", "reference"])
    p.add_argument("--no-remat", action="store_true",
                   help="disable activation rematerialization "
                   "(reference --act-ckpt inverse, dense.py:29-32)")
    p.add_argument("--remat-policy", default=None,
                   choices=["dots", "attn", "attn_dots"],
                   help="save select tensors through remat: attn = keep "
                        "the attention kernel outputs (fwd kernel runs "
                        "once per step, ~13%% step win at 0.6B)")
    p.add_argument("--remat-segments", type=int, default=0,
                   help="nested sqrt(L) checkpointing: G outer segments "
                        "(0 = plain per-layer remat)")
    p.add_argument("--loss-chunk", type=int, default=1024)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--w-logprobs", type=float, default=-1.0)
    p.add_argument("--w-entropy", type=float, default=0.1)
    p.add_argument("--leafization", dest="leafization", action="store_true", default=True)
    p.add_argument("--no-leafization", dest="leafization", action="store_false")
    p.add_argument("--permute", default="ours", choices=["ours", "idx", "random"],
                   help="DFS leaf order policy (reference run.py:43-50)")


def build_model(args):
    import jax
    import jax.numpy as jnp

    from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params

    mc = MODEL_CONFIGS[args.model]
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.ckpt:
        from dynamictreeattn_tpu.models.hf_compat import load_hf_checkpoint

        params = load_hf_checkpoint(args.ckpt, mc, dtype)
    else:
        params = init_params(mc, jax.random.key(args.seed), dtype=dtype)
    return mc, params


def build_engine(mc, args):
    from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine

    ec = EngineConfig(
        block_q=args.block_q,
        block_kv=args.block_kv,
        remat=not args.no_remat,
        remat_policy=args.remat_policy,
        remat_segments=args.remat_segments,
        temperature=args.temperature,
        loss_chunk=args.loss_chunk,
        attn_backend=args.attn_backend,
    )
    return TreeEngine(mc, ec), ec


def weight_fn_from_args(args):
    w_lp, w_ent = args.w_logprobs, args.w_entropy

    def weight_fn(attachment: dict, length: int):
        return (
            float(attachment.get("w_logprobs", w_lp)),
            float(attachment.get("w_entropy", w_ent)),
        )

    return weight_fn


def prepare_trie(seqs, attachs, args, mode: str):
    """TokenTrie with the requested permute policy applied."""
    from dynamictreeattn_tpu.tries import TokenTrie

    trie = TokenTrie(seqs, attachs, leafization=args.leafization)
    if args.permute == "ours":
        if mode == "backward":
            trie.backward_permute()
        else:
            trie.forward_permute()
    elif args.permute == "random":
        trie.random_permute(seed=args.seed)
    return trie


def timed_call(fn, *args, iters: int = 3, sync=None):
    """(last_output, median_seconds). `sync(out)` must force a host roundtrip."""
    out = fn(*args)
    if sync:
        sync(out)
    ts = []
    for _ in range(max(1, iters)):
        t0 = time.time()
        out = fn(*args)
        if sync:
            sync(out)
        ts.append(time.time() - t0)
    return out, float(np.median(ts))


def append_stats(path: str | None, record: dict) -> None:
    if not path:
        return
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def save_grads_npz(path: str, grads) -> None:
    import jax

    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    arrays = {
        jax.tree_util.keystr(p): np.asarray(v, dtype=np.float32) for p, v in flat
    }
    np.savez(path, **arrays)


def load_grads_npz(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
