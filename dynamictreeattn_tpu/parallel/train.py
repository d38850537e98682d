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

from dynamictreeattn_tpu.engine.tree_engine import EngineConfig, resolve_loss_mode
from dynamictreeattn_tpu.models.qwen3 import Qwen3Config, init_params
from dynamictreeattn_tpu.ops.tree_attention import BlockSizes, tree_attention
from dynamictreeattn_tpu.ops.tree_attention_ref import tree_attention_reference
from dynamictreeattn_tpu.parallel.tp_model import forward_hidden_tp, tp_param_shard_info
from dynamictreeattn_tpu.parallel.vocab_parallel import (
    vp_tree_edge_logprobs,
    vp_tree_edge_logprobs_sp,
    vp_tree_loss_edges,
    vp_tree_loss_from_hidden,
)
from dynamictreeattn_tpu.tries import TokenTrie, build_block_meta, flatten_trie
from dynamictreeattn_tpu.tries.flatten import _pad_packed

__all__ = [
    "param_specs",
    "fsdp_dims",
    "fsdp_param_specs",
    "shard_params",
    "stack_batches",
    "StackedBatch",
    "batch_partition_specs",
    "make_train_step",
    "make_forward_step",
    "init_opt_state",
]


def param_specs(config: Qwen3Config, ep: int = 1) -> dict:
    """PartitionSpecs for the Qwen3 param pytree over the "model" axis.

    Vocab-sharded embedding co-designs with the vocab-parallel loss (tied LM
    head shares the shard); attention sharded by heads (GQA co-located);
    MLP column/row-sharded — the standard Megatron layout. With `ep > 1`
    (expert parallelism over the "data" axis, token all-to-all dispatch),
    the expert dim shards data-major over ("data", "model")."""
    layer_specs = {
        "ln1": P(None, None),
        "ln2": P(None, None),
        "wq": P(None, None, "model"),
        "wk": P(None, None, "model"),
        "wv": P(None, None, "model"),
        "wo": P(None, "model", None),
    }
    if config.is_moe:
        # expert parallelism: experts shard over ("data",)"model", router
        # replicated
        e_spec = ("data", "model") if ep > 1 else "model"
        layer_specs["router"] = P(None, None, None)
        layer_specs["e_gate"] = P(None, e_spec, None, None)
        layer_specs["e_up"] = P(None, e_spec, None, None)
        layer_specs["e_down"] = P(None, e_spec, None, None)
    else:
        layer_specs["gate"] = P(None, None, "model")
        layer_specs["up"] = P(None, None, "model")
        layer_specs["down"] = P(None, "model", None)
    specs = {
        "embed": P("model", None),
        "layers": layer_specs,
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


FSDP_MIN_SIZE = 1 << 16  # per-layer elems below which a leaf stays replicated


def fsdp_dims(
    config: Qwen3Config, dp: int, min_size: int = FSDP_MIN_SIZE, ep: int = 1
) -> dict:
    """Which dim of each param shards over "data" (ZeRO-3); -1 = replicated.

    A dim qualifies if the TP spec leaves it free (and it is not the stacked
    layer dim) and its size divides by dp. Leaves with fewer than `min_size`
    per-layer elements stay replicated — an all-gather of a tiny norm vector
    every scan step would be ICI-latency-bound for no memory win. The
    reference has no FSDP counterpart in-repo; its docstrings assume a host
    FSDP wrapper (reference: vocab_parallel.py:406-414) — here it is native."""
    specs = param_specs(config, ep)
    shapes = jax.eval_shape(
        functools.partial(init_params, config, jax.random.key(0))
    )

    def pick(path, shape_struct, spec):
        shape = shape_struct.shape
        # expert leaves under ep already consume "data" (permanently sharded,
        # never gathered) — they are outside ZeRO's scope
        if any(
            "data" in (p if isinstance(p, tuple) else (p,))
            for p in spec if p is not None
        ):
            return -1
        in_layers = any(
            getattr(k, "key", None) == "layers" for k in path
        )
        # only layer stacks + the (big) embed / lm_head participate; other
        # top-level leaves (final_norm) have no gather site in the forward
        if not in_layers and getattr(path[0], "key", None) not in (
            "embed", "lm_head"
        ):
            return -1
        per_layer = int(np.prod(shape)) // (shape[0] if in_layers else 1)
        if dp == 1 or per_layer < min_size:
            return -1
        for d in range(1 if in_layers else 0, len(shape)):
            if (len(spec) <= d or spec[d] is None) and shape[d] % dp == 0:
                return d
        return -1

    return jax.tree_util.tree_map_with_path(
        pick, shapes, specs, is_leaf=lambda x: isinstance(x, P)
    )


def _with_data_axis(spec: P, dim: int) -> P:
    if dim < 0:
        return spec
    parts = list(spec) + [None] * (dim + 1 - len(spec))
    assert parts[dim] is None, (spec, dim)
    parts[dim] = "data"
    return P(*parts)


def fsdp_param_specs(
    config: Qwen3Config, dp: int, min_size: int = FSDP_MIN_SIZE, ep: int = 1
) -> dict:
    """param_specs with "data" added on each leaf's fsdp dim (ZeRO-3 layout)."""
    return jax.tree.map(
        _with_data_axis,
        param_specs(config, ep),
        fsdp_dims(config, dp, min_size, ep),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(
    params: dict,
    mesh,
    config: Qwen3Config,
    fsdp: bool = False,
    fsdp_min_size: int = FSDP_MIN_SIZE,
    ep: int = 1,
    placer=None,
) -> dict:
    """`placer(x, NamedSharding)` overrides jax.device_put — pass a
    make_array_from_callback-based placer for multi-host runs (see
    parallel.distributed.put_global)."""
    if fsdp:
        specs = fsdp_param_specs(config, mesh.shape["data"], fsdp_min_size, ep)
    else:
        specs = param_specs(config, ep)
    put = placer or (lambda x, sh: jax.device_put(x, sh))
    return jax.tree.map(
        lambda x, s: put(x, NamedSharding(mesh, s)),
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


_BATCH_FIELDS = ("tokens", "depth", "parent", "last_desc", "w_logprob",
                 "w_entropy", "valid")
_META_FIELDS = ("kv_ids", "kv_counts", "kv_types", "q_ids", "q_counts", "q_types")


def _fsdp_unshard_layer(dims):
    """Per-layer ZeRO all-gather for use inside the remat'd layer scan
    (per-layer leaves lost the stacked L dim → gather axis = d − 1)."""
    layer_dims = dims["layers"]

    def unshard_layer(lp):
        return jax.tree.map(
            lambda a, d: a if d < 0 else jax.lax.all_gather(
                a, "data", axis=d - 1, tiled=True
            ),
            lp, layer_dims,
        )

    return unshard_layer


def _fsdp_gather_top(params, dims):
    """Gather the (big) top-level ZeRO leaves once per step — the transpose
    is a psum_scatter of the grad, the ZeRO reduce-scatter."""
    params = dict(params)
    if dims["embed"] >= 0:
        params["embed"] = jax.lax.all_gather(
            params["embed"], "data", axis=dims["embed"], tiled=True
        )
    if "lm_head" in params and dims["lm_head"] >= 0:
        params["lm_head"] = jax.lax.all_gather(
            params["lm_head"], "data", axis=dims["lm_head"], tiled=True
        )
    return params


def _stack_wants_cache_sched(cfg: EngineConfig, sp: int) -> bool:
    from dynamictreeattn_tpu.engine.tree_engine import resolve_kernel_modes

    return (
        cfg.attn_backend == "pallas"
        and sp == 1
        and resolve_kernel_modes(None, cfg)[1] == "cached"
    )


def _unpack_rank_batch(batch, ec: EngineConfig, mc=None):
    """This rank's batch fields + the attention fn both step builders use."""
    from dynamictreeattn_tpu.engine.tree_engine import resolve_kernel_modes

    fields = {f: batch[f][0] for f in _BATCH_FIELDS}
    meta = tuple(batch[f][0] for f in _META_FIELDS)
    last_desc = fields["last_desc"]
    if ec.attn_backend == "reference":
        attn_fn = lambda q, k, v: tree_attention_reference(q, k, v, last_desc)
    else:
        bs = BlockSizes(ec.block_q, ec.block_kv)
        fwd_mode, bwd_mode = resolve_kernel_modes(mc, ec)
        sched = None
        if "cache_actions" in batch:
            sched = (batch["cache_actions"][0], batch["cache_flush"][0])
        elif bwd_mode == "cached":
            bwd_mode = "fused"  # batch carries no schedule
        attn_fn = lambda q, k, v: tree_attention(
            q, k, v, last_desc, *meta, block_sizes=bs, interpret=ec.interpret,
            softmax_mode=fwd_mode, bwd_mode=bwd_mode, cache_sched=sched,
        )
    return fields, meta, attn_fn


def batch_partition_specs(
    sp: int = 1, sp_mode: str = "ulysses",
    extras_spec: dict | None = None,
    cache_sched: bool = False,
) -> dict:
    """PartitionSpec per batch-array field (what make_train_step shards by —
    also the layout multi-host data loading must produce).

    `extras_spec` ({name: per-sequence ndim}) adds the custom-loss fields:
    seq_paths/seq_lens (stack_batches(with_paths=True)) plus one
    x_<name> per entry — pass the Trainer's extras_spec so multihost
    put_global placement covers every array the step consumes."""
    bspec = {f: P("data", None) for f in _BATCH_FIELDS}
    bspec["kv_counts"] = bspec["q_counts"] = P("data", None)
    for f in ("kv_ids", "kv_types", "q_ids", "q_types"):
        bspec[f] = P("data", None, None)
    if cache_sched:
        # Belady slot schedules for the cached fused backward
        bspec["cache_actions"] = P("data", None, None, None)
        bspec["cache_flush"] = P("data", None, None)
    if sp > 1:
        for f in ("edge_parent", "edge_token", "edge_w"):
            bspec[f] = P("data", "seq", None)
    if sp > 1 and sp_mode == "ring":
        for f in ("kv_ids", "kv_types", "q_ids", "q_types"):
            bspec["ring_" + f] = P("data", None, None, None, None)
        bspec["ring_kv_counts"] = bspec["ring_q_counts"] = P(
            "data", None, None, None
        )
    if extras_spec is not None:
        bspec["seq_paths"] = P("data", None, None)
        bspec["seq_lens"] = P("data", None)
        for name, nd in extras_spec.items():
            bspec["x_" + name] = P("data", None, *([None] * nd))
        if sp > 1:
            for f in ("ce_parent", "ce_token", "ce_child"):
                bspec[f] = P("data", "seq", None)
    return bspec


def stack_batches(
    tries_or_packed: list, cfg: EngineConfig, sp: int = 1,
    sp_mode: str = "ulysses", device: bool = True,
    with_paths: bool = False,
) -> StackedBatch:
    """Flatten+pad each rank's trie to a COMMON bucket and common metadata slot
    widths, then stack on the leading "data" axis.

    With `sp > 1`, also emits parent-owned edge arrays
    edge_parent/edge_token/edge_w of shape [dp, sp, E] for the
    sequence-parallel loss (vp_tree_loss_edges); with `sp_mode="ring"`, the
    per-(q shard, kv shard) ring metadata ring_* of shape [dp, sp, sp, ...]
    (tries/flatten.py:build_ring_block_meta)."""
    packeds = [
        flatten_trie(t) if isinstance(t, TokenTrie) else t for t in tries_or_packed
    ]
    # seq shards need equal, block-aligned slices (buckets are block-
    # multiples, so only a few extra rungs at worst)
    quantum = sp if sp_mode != "ring" else sp * int(
        np.lcm(cfg.block_q, cfg.block_kv)
    )
    n_pad = cfg.bucket_length(max(p.n_padded for p in packeds))
    while n_pad % quantum:
        n_pad = cfg.bucket_length(n_pad + 1)
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
    if _stack_wants_cache_sched(cfg, sp):
        # Belady slot schedules for the cached fused backward
        # (ops/tree_attention.py; sp>1 paths keep the schedule-free kernels).
        # R is model-independent — the launcher sizes its scratch from the
        # schedule itself; 16 slots ≈ 34 MB of VMEM at hb=4 and covers the
        # per-row working set of tau2-16k-scale tries.
        from dynamictreeattn_tpu.tries import build_bwd_cache_sched

        r = min(16, metas[0].n_kv_blocks)
        scheds = [build_bwd_cache_sched(me, r) for me in metas]
        arrays["cache_actions"] = np.stack([s.actions for s in scheds])
        arrays["cache_flush"] = np.stack([s.flush for s in scheds])
    if sp > 1:
        arrays.update(_edge_arrays(packeds, sp, n_pad))
    if sp > 1 and sp_mode == "ring":
        from dynamictreeattn_tpu.tries import build_ring_block_meta

        rmetas = [
            build_ring_block_meta(p.last_desc, sp, cfg.block_q, cfg.block_kv)
            for p in packeds
        ]
        rkv_w = _next_pow2(max(m.kv_ids.shape[-1] for m in rmetas))
        rq_w = _next_pow2(max(m.q_ids.shape[-1] for m in rmetas))

        def _pad_slots(a, w, edge):
            # extra slots: repeat the last id (pipeline never re-DMAs) but
            # zero the type (compute skipped); counts are unchanged, so this
            # equals rebuilding with min_*_slots=w at half the host cost
            pad = [(0, 0)] * (a.ndim - 1) + [(0, w - a.shape[-1])]
            return np.pad(a, pad, mode="edge" if edge else "constant")

        widths = {"kv_ids": (rkv_w, True), "kv_types": (rkv_w, False),
                  "q_ids": (rq_w, True), "q_types": (rq_w, False)}
        for f in _META_FIELDS:
            vals = [getattr(m, f) for m in rmetas]
            if f in widths:
                w, edge = widths[f]
                vals = [_pad_slots(v, w, edge) for v in vals]
            arrays["ring_" + f] = np.stack(vals).astype(np.int32)
    if with_paths:
        # per-sequence packed paths for custom (nonlinear) per-sequence
        # losses under sharding (the reference loss_fn contract at scale)
        S = max(len(p.seq_batch_ids) for p in packeds)
        lmax = max((int(p.seq_lens.max()) if len(p.seq_lens) else 1)
                   for p in packeds)
        paths = np.full((len(packeds), S, lmax), -1, np.int32)
        lens = np.zeros((len(packeds), S), np.int32)
        for r, p in enumerate(packeds):
            m = p.seq_paths_matrix()  # native/cached per-trie path matrix
            paths[r, : m.shape[0], : m.shape[1]] = m
            lens[r, : m.shape[0]] = p.seq_lens
        arrays["seq_paths"] = paths
        arrays["seq_lens"] = lens
        if sp > 1:
            arrays.update(_custom_edge_arrays(packeds, sp, n_pad))
    # device=False keeps host numpy (multihost placement re-shards via
    # make_array_from_callback — uploading here would just round-trip)
    if device:
        arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
    return StackedBatch(arrays=arrays, packeds=packeds)


def _custom_edge_arrays(packeds: list, sp: int, n_pad: int) -> dict:
    """Parent-owned edge triples for the CUSTOM-loss path under sequence
    parallelism: every real edge (parent >= 0), carrying the child's GLOBAL
    position so per-edge logprobs can be scattered back into a full [n]
    vector (vp_tree_edge_logprobs_sp). Padding slots point child at n_pad
    (out of bounds — the scatter drops them)."""
    n_loc = n_pad // sp
    rows, width = [], 1
    for p in packeds:
        j = np.nonzero(p.parent >= 0)[0]
        par = p.parent[j]
        owner = par // n_loc
        per_rank = []
        for s in range(sp):
            m = owner == s
            per_rank.append((par[m] - s * n_loc, p.tokens[j[m]], j[m]))
            width = max(width, int(m.sum()))
        rows.append(per_rank)
    width = _next_pow2(width)
    dp = len(packeds)
    c_par = np.zeros((dp, sp, width), np.int32)
    c_tok = np.zeros((dp, sp, width), np.int32)
    c_child = np.full((dp, sp, width), n_pad, np.int32)
    for r, per_rank in enumerate(rows):
        for s, (pl, tk, ch) in enumerate(per_rank):
            c = len(pl)
            c_par[r, s, :c] = pl
            c_tok[r, s, :c] = tk
            c_child[r, s, :c] = ch
    return {"ce_parent": c_par, "ce_token": c_tok, "ce_child": c_child}


def _edge_arrays(packeds: list, sp: int, n_pad: int) -> dict:
    """Parent-owned edge triples per (data rank, seq rank), common-padded.

    Edge j (child position) is owned by the seq rank holding parent[j];
    padding slots carry weight 0 and index 0 (always in-range)."""
    n_loc = n_pad // sp
    rows = []  # [dp][sp] -> (par_local, tok, w)
    width = 1
    for p in packeds:
        j = np.nonzero((p.parent >= 0) & (p.w_logprob != 0))[0]
        par = p.parent[j]
        owner = par // n_loc
        per_rank = []
        for s in range(sp):
            m = owner == s
            per_rank.append(
                (par[m] - s * n_loc, p.tokens[j[m]], p.w_logprob[j[m]])
            )
            width = max(width, int(m.sum()))
        rows.append(per_rank)
    width = _next_pow2(width)
    dp = len(packeds)
    e_par = np.zeros((dp, sp, width), np.int32)
    e_tok = np.zeros((dp, sp, width), np.int32)
    e_w = np.zeros((dp, sp, width), np.float32)
    for r, per_rank in enumerate(rows):
        for s, (pl, tk, w) in enumerate(per_rank):
            c = len(pl)
            e_par[r, s, :c] = pl
            e_tok[r, s, :c] = tk
            e_w[r, s, :c] = w
    return {"edge_parent": e_par, "edge_token": e_tok, "edge_w": e_w}


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


def init_opt_state(optimizer, params):
    """optimizer.init with each params-shaped leaf placed on the matching
    param's sharding (a bare jit of init constant-folds the zeros and can
    leave them replicated/single-device). Leaves whose tree path doesn't end
    in a param path (step counts, schedules) are left untouched."""
    state = optimizer.init(params)
    suffix_map = {
        tuple(str(k) for k in path): leaf.sharding
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
        if hasattr(leaf, "sharding")
    }

    def place(path, leaf):
        key = tuple(str(k) for k in path)
        for i in range(len(key)):
            if key[i:] in suffix_map:
                return jax.device_put(leaf, suffix_map[key[i:]])
        return leaf

    return jax.tree_util.tree_map_with_path(place, state)


def make_train_step(
    model_config: Qwen3Config,
    mesh,
    engine_config: EngineConfig = EngineConfig(),
    optimizer=None,
    fsdp: bool = False,
    fsdp_min_size: int = FSDP_MIN_SIZE,
    ep: bool = False,
    sp_mode: str = "ulysses",
    custom_loss=None,
    extras_spec: dict | None = None,
):
    """Build the jitted sharded step.

    Without `optimizer`: step(params, batch_arrays) -> (loss, grads, aux).
    With an optax `optimizer`: step(params, opt_state, batch_arrays) ->
    (params, opt_state, loss, aux).

    With `fsdp=True`, params (and therefore grads / optimizer state) live
    ZeRO-3-sharded over "data": each layer is all-gathered inside the remat'd
    scan body (re-gathered in backward), and the all_gather transpose yields
    reduce-scattered gradients — no separate grad psum for fsdp leaves.

    With `ep=True` (MoE configs), experts additionally shard over the full
    "data" axis with token all-to-all dispatch (tp_model._moe_block_ep_a2a):
    expert weights/grads/optimizer state are permanently data-sharded (E ≫ tp
    regime); their grads skip the "data" psum (each expert has one owner).

    `sp_mode` picks the sequence-parallel flavor when the mesh has a "seq"
    axis: "ulysses" (all-to-all to kv-head sharding; needs sp ≤ kv_heads/tp)
    or "ring" (K/V chunks rotate over "seq" through the ring tree-attention
    op — any sp dividing the padded length; ops/tree_attention_ring.py).

    `custom_loss(lp_rows, ent_rows, extras, length) -> scalar` replaces the
    linear weighted loss with the reference's pluggable per-sequence
    contract AT SCALE (clipped-ratio GRPO etc., reference: run.py:149-152):
    batches must come from `stack_batches(with_paths=True)` and carry one
    `x_<name>` array of shape [dp, S, ...] per `extras_spec` entry
    ({name: ndim-after-(dp,S)}). Padded sequence rows (length 0) contribute
    exactly 0 regardless of the loss function.
    """
    mc, ec = model_config, engine_config
    tp = mesh.shape["model"]
    dp = mesh.shape["data"]
    sp = mesh.shape.get("seq", 1)
    tp_param_shard_info(mc, tp)  # validate divisibility
    if sp_mode not in ("ulysses", "ring"):
        raise ValueError(f"unknown sp_mode {sp_mode!r}")
    if sp > 1 and sp_mode == "ulysses" and (mc.num_key_value_heads // tp) % sp:
        raise ValueError(
            f"seq parallel sp={sp} must divide local kv heads "
            f"{mc.num_key_value_heads // tp} (= {mc.num_key_value_heads} kv "
            f"heads / tp={tp}); use sp_mode='ring' for larger sp"
        )
    ep_size = dp if (ep and mc.is_moe) else 1
    if ep and not mc.is_moe:
        raise ValueError("ep=True requires a MoE model config")
    if ep_size > 1 and (
        mc.num_experts % ep_size or (mc.num_experts // ep_size) % tp
    ):
        raise ValueError(
            f"experts {mc.num_experts} must divide ep={ep_size} × tp={tp}"
        )
    fsdp = fsdp and dp > 1
    # fused qk-prep kernels need the real Pallas backend (same hardware
    # requirement as the attention kernel); the Ulysses path opts out
    # inside _layer_tp
    fused_qk = ec.attn_backend == "pallas" and not ec.interpret
    if fsdp:
        dims = fsdp_dims(mc, dp, fsdp_min_size, ep_size)
        pspecs = fsdp_param_specs(mc, dp, fsdp_min_size, ep_size)
    else:
        dims = None
        pspecs = param_specs(mc, ep_size)
    bspec = batch_partition_specs(
        sp, sp_mode,
        extras_spec=(extras_spec or {}) if custom_loss is not None else None,
        cache_sched=_stack_wants_cache_sched(ec, sp),
    )

    def local_loss_and_grad(params, batch):
        fields, meta, attn_fn = _unpack_rank_batch(batch, ec, mc)
        tokens = fields["tokens"]
        depth = fields["depth"]
        parent = fields["parent"]
        last_desc = fields["last_desc"]
        w_lp = fields["w_logprob"]
        w_ent = fields["w_entropy"]
        valid = fields["valid"]

        if sp > 1 and sp_mode == "ring":
            from dynamictreeattn_tpu.ops.tree_attention_ring import (
                tree_attention_ring,
                tree_attention_ring_reference,
            )

            if ec.attn_backend == "reference":
                attn_fn = lambda q, k, v: tree_attention_ring_reference(
                    q, k, v, last_desc, sp=sp, axis="seq"
                )
            else:
                rmeta = tuple(
                    batch["ring_" + f][0] for f in _META_FIELDS
                )
                bs = BlockSizes(ec.block_q, ec.block_kv)
                attn_fn = lambda q, k, v: tree_attention_ring(
                    q, k, v, last_desc, *rmeta, sp=sp, axis="seq",
                    block_sizes=bs, interpret=ec.interpret,
                )

        unshard_layer = _fsdp_unshard_layer(dims) if fsdp else None
        if sp > 1:
            r = jax.lax.axis_index("seq")
            n_loc = tokens.shape[0] // sp
            tok_in = jax.lax.dynamic_slice_in_dim(tokens, r * n_loc, n_loc)
            dep_in = jax.lax.dynamic_slice_in_dim(depth, r * n_loc, n_loc)
            val_in = jax.lax.dynamic_slice_in_dim(valid, r * n_loc, n_loc)
            w_ent_loc = jax.lax.dynamic_slice_in_dim(w_ent, r * n_loc, n_loc)
            e_par = batch["edge_parent"][0, 0]
            e_tok = batch["edge_token"][0, 0]
            e_w = batch["edge_w"][0, 0]
        else:
            tok_in, dep_in, val_in = tokens, depth, valid

        def loss_fn(p):
            if fsdp:
                p = _fsdp_gather_top(p, dims)
            h, faux = forward_hidden_tp(
                p, mc, tok_in, dep_in, attn_fn, tp=tp, remat=ec.remat,
                remat_policy=ec.remat_policy,
                remat_segments=ec.remat_segments,
                unshard_fn=unshard_layer,
                sp=sp,
                sp_mode=sp_mode,
                ep=ep_size,
                valid=val_in,
                fused_qk=fused_qk,
            )
            w_local = p["embed"].T if mc.tie_word_embeddings else p["lm_head"]
            if custom_loss is not None:
                if sp > 1:
                    # parent-owned per-edge logprobs assembled into the full
                    # replicated [n] vector; the /sp below makes the loss-
                    # level psum("seq") sum to the unsharded value exactly
                    lp_edge, entropy = vp_tree_edge_logprobs_sp(
                        h, w_local,
                        batch["ce_parent"][0, 0], batch["ce_token"][0, 0],
                        batch["ce_child"][0, 0], tokens.shape[0],
                        ec.temperature, ec.loss_chunk,
                        mode=resolve_loss_mode(ec, mc),
                    )
                else:
                    lp_edge, entropy = vp_tree_edge_logprobs(
                        h, w_local, tokens, parent, ec.temperature,
                        ec.loss_chunk, mode=resolve_loss_mode(ec, mc),
                    )
                paths = batch["seq_paths"][0]
                lengths = batch["seq_lens"][0]
                extras = {k[2:]: batch[k][0] for k in batch
                          if k.startswith("x_")}
                safe = jnp.maximum(paths, 0)
                lp_rows = jnp.take(lp_edge, safe[:, 1:], axis=0)
                ent_rows = jnp.take(entropy, safe, axis=0)
                per_seq = jax.vmap(custom_loss)(
                    lp_rows, ent_rows, extras, lengths
                )
                live = (lengths > 0).astype(per_seq.dtype)
                loss = jnp.sum(per_seq * live)
                m_lp = (jnp.arange(lp_rows.shape[1])[None, :]
                        < (lengths - 1)[:, None])
                m_en = (jnp.arange(ent_rows.shape[1])[None, :]
                        < lengths[:, None])
                aux = {
                    "sum_logprob": jnp.sum(lp_rows * m_lp),
                    "sum_entropy": jnp.sum(ent_rows * m_en),
                }
                if sp > 1:
                    loss = loss / sp
                    aux = jax.tree.map(lambda a: a / sp, aux)
            elif sp > 1:
                loss, aux = vp_tree_loss_edges(
                    h, w_local, e_par, e_tok, e_w, w_ent_loc,
                    ec.temperature, ec.loss_chunk,
                    mode=resolve_loss_mode(ec, mc),
                )
            else:
                loss, aux = vp_tree_loss_from_hidden(
                    h, w_local, tokens, parent, w_lp, w_ent,
                    ec.temperature, ec.loss_chunk,
                    mode=resolve_loss_mode(ec, mc),
                )
            if mc.is_moe:
                aux = dict(aux, lb_loss=faux["lb_loss"])
                if mc.router_aux_coef:
                    loss = loss + mc.router_aux_coef * faux["lb_loss"]
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if sp > 1:
            # every param is used by every seq shard on its local rows:
            # shard grads are partial sums over the sequence → psum("seq");
            # same for the shard-partial loss/aux
            grads = jax.tree.map(lambda g: jax.lax.psum(g, "seq"), grads)
            loss = jax.lax.psum(loss, "seq")
            aux = jax.tree.map(lambda a: jax.lax.psum(a, "seq"), aux)
        # q_norm/k_norm are replicated params used inside rank-local head
        # compute: each model rank holds a partial grad (its heads only).
        # Every other replicated param's grad is already full thanks to the
        # mpar_in operators in tp_model (see tp_model.mpar_in).
        if mc.use_qk_norm:
            for nrm in ("q_norm", "k_norm"):
                grads["layers"][nrm] = jax.lax.psum(grads["layers"][nrm], "model")
        def _is_expert_leaf(path):
            return ep_size > 1 and any(
                getattr(k, "key", None) in ("e_gate", "e_up", "e_down")
                for k in path
            )

        if fsdp:
            # fsdp'd leaves already arrive reduce-scattered over "data" (the
            # all_gather transpose); expert leaves under ep are data-sharded
            # with exact rank-local grads; only replicated leaves need the psum
            grads = jax.tree_util.tree_map_with_path(
                lambda pth, g, d: g if (d >= 0 or _is_expert_leaf(pth))
                else jax.lax.psum(g, "data"),
                grads, dims,
            )
        else:
            grads = jax.tree_util.tree_map_with_path(
                lambda pth, g: g if _is_expert_leaf(pth)
                else jax.lax.psum(g, "data"),
                grads,
            )
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

    # params/opt_state are DONATED: the update aliases them in place instead
    # of allocating a second copy of params + fp32 adamw moments every step
    # (~6 GB of extra live buffers at 0.6B). Callers must rebind both to the
    # returned values (the Trainer does; a donated input is unusable after).
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def opt_step(params, opt_state, batch):
        # Optimizer update under plain jit: GSPMD propagates the params/grads
        # NamedShardings into the update — no shard_map needed here.
        loss, grads, aux = step(params, batch)
        updates, new_state = optimizer.update(grads, opt_state, params)
        # non-finite guard IN-GRAPH: donation consumes the old buffers, so
        # "keep the previous params" must happen here, not in the caller
        # (training robustness the Trainer's skip_nonfinite relies on)
        good = jnp.isfinite(loss)
        updates = jax.tree.map(
            lambda u: jnp.where(good, u, jnp.zeros_like(u)), updates
        )
        new_state = jax.tree.map(
            lambda nx, ox: jnp.where(good, nx, ox), new_state, opt_state
        )
        params = optax.apply_updates(params, updates)
        return params, new_state, loss, aux

    return opt_step


def make_forward_step(
    model_config: Qwen3Config,
    mesh,
    engine_config: EngineConfig = EngineConfig(),
    fsdp: bool = False,
    fsdp_min_size: int = FSDP_MIN_SIZE,
    ep: bool = False,
):
    """Sharded inference-mode per-edge logprobs — engine.forward at scale
    (the RL behavior-logprob recompute, reference:
    tree_training_engine.py:516-553, run.py tree_forward).

    Returns step(params, batch_arrays) -> (lp_edge [dp, n], entropy [dp, n])
    as global fp32 arrays; use StackedBatch.packeds[r].seq_path(...) to map
    rank r's rows back to per-sequence logprob vectors (or
    `extract_forward`). fsdp/ep must match the param layout the step will be
    fed (per-layer all-gather / data-axis experts, exactly like
    make_train_step)."""
    mc, ec = model_config, engine_config
    tp = mesh.shape["model"]
    dp = mesh.shape["data"]
    tp_param_shard_info(mc, tp)
    if mesh.shape.get("seq", 1) > 1:
        raise ValueError(
            "make_forward_step does not shard over 'seq' yet — a seq-axis "
            "mesh would silently run the full forward on every seq rank"
        )
    ep_size = dp if (ep and mc.is_moe) else 1
    fsdp = fsdp and dp > 1
    # fused qk-prep kernels need the real Pallas backend (same hardware
    # requirement as the attention kernel); the Ulysses path opts out
    # inside _layer_tp
    fused_qk = ec.attn_backend == "pallas" and not ec.interpret
    if fsdp:
        dims = fsdp_dims(mc, dp, fsdp_min_size, ep_size)
        pspecs = fsdp_param_specs(mc, dp, fsdp_min_size, ep_size)
    else:
        dims = None
        pspecs = param_specs(mc, ep_size)
    bspec = batch_partition_specs(cache_sched=_stack_wants_cache_sched(ec, 1))

    def local_forward(params, batch):
        fields, meta, attn_fn = _unpack_rank_batch(batch, ec, mc)
        if fsdp:
            unshard_layer = _fsdp_unshard_layer(dims)
            params = _fsdp_gather_top(params, dims)
        else:
            unshard_layer = None
        h, _ = forward_hidden_tp(
            params, mc, fields["tokens"], fields["depth"], attn_fn, tp=tp,
            remat=ec.remat,
            remat_policy=ec.remat_policy, remat_segments=ec.remat_segments,
            unshard_fn=unshard_layer,
            ep=ep_size,
            valid=fields["valid"],
            fused_qk=fused_qk,
        )
        w_local = params["embed"].T if mc.tie_word_embeddings else params["lm_head"]
        lp, ent = vp_tree_edge_logprobs(
            h, w_local, fields["tokens"], fields["parent"],
            ec.temperature, ec.loss_chunk, mode=resolve_loss_mode(ec, mc),
        )
        return lp[None], ent[None]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(pspecs, bspec),
        out_specs=(P("data", None), P("data", None)),
        check_vma=False,
    )
    def step(params, batch):
        return local_forward(params, batch)

    return jax.jit(step)


def extract_forward(batch: StackedBatch, lp_edge) -> list:
    """Per data rank: {_sequence_batch_id: fp32 logprob array of length
    len(seq)-1} from a make_forward_step result (engine.forward's return
    contract, reference: tree_training_engine.py:226-228,530). One dict per
    rank because batch ids are only unique within a rank's trie."""
    lp = np.asarray(lp_edge)
    out = []
    for r, packed in enumerate(batch.packeds):
        rank = {}
        m = packed.seq_paths_matrix()
        for s in range(len(packed.seq_batch_ids)):
            L = int(packed.seq_lens[s])
            rank[int(packed.seq_batch_ids[s])] = lp[r, m[s, 1:L]]
        out.append(rank)
    return out
