"""Sharded training steps over a ("data", "model") mesh.

Real data parallelism (the reference only simulates DP by running per-bin
processes and taking max-over-bins time, reference: exp/calc_time.py:24-38):
each data rank trains its own packed trie forest and gradients are psum'd over
"data"; tensor/vocab parallelism over "model" via the explicit-TP model
(tp_model.py) and the vocab-parallel loss (vocab_parallel.py).

Everything is one `shard_map`-ed, jit-compiled step — collectives ride ICI.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from dynamictreeattn_tpu.engine.tree_engine import EngineConfig
from dynamictreeattn_tpu.models.qwen3 import Qwen3Config
from dynamictreeattn_tpu.ops.tree_attention import BlockSizes, tree_attention
from dynamictreeattn_tpu.ops.tree_attention_ref import tree_attention_reference
from dynamictreeattn_tpu.parallel.tp_model import forward_hidden_tp, tp_param_shard_info
from dynamictreeattn_tpu.parallel.vocab_parallel import vp_tree_loss_from_hidden
from dynamictreeattn_tpu.tries import TokenTrie, build_block_meta, flatten_trie
from dynamictreeattn_tpu.tries.flatten import _pad_packed

__all__ = [
    "param_specs",
    "shard_params",
    "stack_batches",
    "StackedBatch",
    "make_train_step",
]


def param_specs(config: Qwen3Config) -> dict:
    """PartitionSpecs for the Qwen3 param pytree over the "model" axis.

    Vocab-sharded embedding co-designs with the vocab-parallel loss (tied LM
    head shares the shard); attention sharded by heads (GQA co-located);
    MLP column/row-sharded — the standard Megatron layout."""
    specs = {
        "embed": P("model", None),
        "layers": {
            "ln1": P(None, None),
            "ln2": P(None, None),
            "wq": P(None, None, "model"),
            "wk": P(None, None, "model"),
            "wv": P(None, None, "model"),
            "wo": P(None, "model", None),
            "gate": P(None, None, "model"),
            "up": P(None, None, "model"),
            "down": P(None, "model", None),
        },
        "final_norm": P(None),
    }
    if config.use_qk_norm:
        specs["layers"]["q_norm"] = P(None, None)
        specs["layers"]["k_norm"] = P(None, None)
    if config.attention_bias:
        specs["layers"]["bq"] = P(None, "model")
        specs["layers"]["bk"] = P(None, "model")
        specs["layers"]["bv"] = P(None, "model")
    if not config.tie_word_embeddings:
        specs["lm_head"] = P(None, "model")
    return specs


def shard_params(params: dict, mesh, config: Qwen3Config) -> dict:
    specs = param_specs(config)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


@dataclasses.dataclass
class StackedBatch:
    """dp per-device packed tries stacked on a leading "data" axis."""

    arrays: dict  # name -> np/jnp array with leading dp dim
    packeds: list  # host PackedTries, one per data rank

    @property
    def dp(self) -> int:
        return len(self.packeds)


_BATCH_FIELDS = ("tokens", "depth", "parent", "last_desc", "w_logprob", "w_entropy")
_META_FIELDS = ("kv_ids", "kv_counts", "kv_types", "q_ids", "q_counts", "q_types")


def stack_batches(tries_or_packed: list, cfg: EngineConfig) -> StackedBatch:
    """Flatten+pad each rank's trie to a COMMON bucket and common metadata slot
    widths, then stack on the leading "data" axis."""
    packeds = [
        flatten_trie(t) if isinstance(t, TokenTrie) else t for t in tries_or_packed
    ]
    n_pad = cfg.bucket_length(max(p.n_padded for p in packeds))
    packeds = [_pad_packed(p, n_pad) if p.n_padded != n_pad else p for p in packeds]

    metas = [build_block_meta(p.last_desc, cfg.block_q, cfg.block_kv) for p in packeds]
    kv_w = _next_pow2(max(me.kv_ids.shape[1] for me in metas))
    q_w = _next_pow2(max(me.q_ids.shape[1] for me in metas))
    metas = [
        build_block_meta(
            p.last_desc, cfg.block_q, cfg.block_kv, min_kv_slots=kv_w, min_q_slots=q_w
        )
        for p in packeds
    ]

    arrays = {f: np.stack([getattr(p, f) for p in packeds]) for f in _BATCH_FIELDS}
    for f in _META_FIELDS:
        arrays[f] = np.stack([getattr(me, f) for me in metas]).astype(np.int32)
    return StackedBatch(arrays={k: jnp.asarray(v) for k, v in arrays.items()},
                        packeds=packeds)


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


def make_train_step(
    model_config: Qwen3Config,
    mesh,
    engine_config: EngineConfig = EngineConfig(),
    optimizer=None,
):
    """Build the jitted sharded step.

    Without `optimizer`: step(params, batch_arrays) -> (loss, grads, aux).
    With an optax `optimizer`: step(params, opt_state, batch_arrays) ->
    (params, opt_state, loss, aux).
    """
    mc, ec = model_config, engine_config
    tp = mesh.shape["model"]
    tp_param_shard_info(mc, tp)  # validate divisibility
    pspecs = param_specs(mc)
    bspec = {f: P("data", None) for f in _BATCH_FIELDS}
    bspec["kv_counts"] = bspec["q_counts"] = P("data", None)
    for f in ("kv_ids", "kv_types", "q_ids", "q_types"):
        bspec[f] = P("data", None, None)

    def local_loss_and_grad(params, batch):
        tokens = batch["tokens"][0]
        depth = batch["depth"][0]
        parent = batch["parent"][0]
        last_desc = batch["last_desc"][0]
        w_lp = batch["w_logprob"][0]
        w_ent = batch["w_entropy"][0]
        meta = tuple(batch[f][0] for f in _META_FIELDS)

        if ec.attn_backend == "reference":
            attn_fn = lambda q, k, v: tree_attention_reference(q, k, v, last_desc)
        else:
            bs = BlockSizes(ec.block_q, ec.block_kv)
            attn_fn = lambda q, k, v: tree_attention(
                q, k, v, last_desc, *meta, block_sizes=bs, interpret=ec.interpret
            )

        def loss_fn(p):
            h = forward_hidden_tp(
                p, mc, tokens, depth, attn_fn, tp=tp, remat=ec.remat,
                remat_policy=ec.remat_policy,
                remat_segments=ec.remat_segments,
            )
            w_local = p["embed"].T if mc.tie_word_embeddings else p["lm_head"]
            return vp_tree_loss_from_hidden(
                h, w_local, tokens, parent, w_lp, w_ent,
                ec.temperature, ec.loss_chunk,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # q_norm/k_norm are replicated params used inside rank-local head
        # compute: each model rank holds a partial grad (its heads only).
        # Every other replicated param's grad is already full thanks to the
        # mpar_in operators in tp_model (see tp_model.mpar_in).
        if mc.use_qk_norm:
            for nrm in ("q_norm", "k_norm"):
                grads["layers"][nrm] = jax.lax.psum(grads["layers"][nrm], "model")
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "data"), grads)
        loss = jax.lax.psum(loss, "data")
        aux = jax.tree.map(lambda a: jax.lax.psum(a, "data"), aux)
        return loss, grads, aux

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(pspecs, bspec),
        out_specs=(P(), pspecs, P()),
        check_vma=False,
    )
    def step(params, batch):
        return local_loss_and_grad(params, batch)

    grad_step = jax.jit(step)
    if optimizer is None:
        return grad_step

    import optax

    @jax.jit
    def opt_step(params, opt_state, batch):
        # Optimizer update under plain jit: GSPMD propagates the params/grads
        # NamedShardings into the update — no shard_map needed here.
        loss, grads, aux = step(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return opt_step
