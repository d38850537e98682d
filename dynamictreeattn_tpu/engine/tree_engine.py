"""TreeEngine: fused single-pass trie training.

Reference counterpart: TreeTrainingEngine (tree_training_engine.py:52-616) and
the dense baseline (dense.py:1-53). API parity:

* ``forward(params, batch)`` → per-sequence logprob vectors keyed by
  ``_sequence_batch_id`` (reference: tree_training_engine.py:516-553 returns
  ``logprobs[:len-1]`` per sequence) — the RL ratio-denominator path.
* ``loss_and_grad(params, batch)`` → (loss, grads, aux): the training path,
  replacing ``backward()``'s DFS of push/pop with autograd injection
  (reference: tree_training_engine.py:555-616).

The reference's engine knobs disappear by design:
- ``block_size``/``pop_byblock`` (memory bounding) → Pallas kernel block
  streaming + `jax.checkpoint` remat over layers + chunked LM-head loss;
- ``cut_f1_tail`` (avoiding double forwards) → moot, every trie token is
  forwarded exactly once;
- fork-logit stash → moot, per-edge label gathers (ops/losses.py).

Static-shape discipline: packed length is padded to a bucket and block-sparse
metadata slots are padded to power-of-two widths, so jit recompiles only on
bucket changes (SURVEY.md §7.3 hard part 3).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.models.qwen3 import (
    Qwen3Config,
    forward_hidden,
    lm_head_weight,
)
from dynamictreeattn_tpu.ops.losses import logprob_entropy_from_hidden
from dynamictreeattn_tpu.ops.tree_attention import BlockSizes, tree_attention
from dynamictreeattn_tpu.ops.tree_attention_ref import tree_attention_reference
from dynamictreeattn_tpu.tries import PackedTrie, TokenTrie, build_block_meta, flatten_trie, pack_forest

__all__ = ["EngineConfig", "TrieBatch", "TreeEngine", "pack_sequences_dense"]


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    # 512 beats 256 by ~25% on tau2-like tries on v5e (stats/, bench.py)
    block_q: int = 512
    block_kv: int = 512
    remat: bool = True
    remat_policy: str | None = None  # None (full recompute) | "dots"
    remat_segments: int = 0  # >0: nested √L checkpointing with this many segments
    temperature: float = 1.0
    loss_chunk: int = 1024  # row-chunk size (loss_mode="rows" only)
    # "auto": fused Pallas LM-head stats kernels (ops/lm_stats.py — logits
    # and backward dlogits tiles never leave VMEM) whenever the Pallas
    # attention backend runs, else the vocab-chunked XLA path; "pallas" /
    # "vocab" / "rows" force a specific implementation
    loss_mode: str = "auto"
    attn_backend: str = "pallas"  # "pallas" | "reference"
    interpret: bool = False  # pallas interpret mode (CPU debugging)
    # fwd kernel softmax shift: "auto" = "bound" (Cauchy-Schwarz row bound,
    # no online-softmax chain — see ops/tree_attention.py) for qk-normed
    # models, "online" otherwise; or force either mode explicitly
    fwd_softmax: str = "auto"
    # backward kernels: "auto" = "cached" on the engine path (the fused
    # query-major dq+dk+dv kernel with its dk/dv accumulators resident in a
    # VMEM slot cache driven by a host-precomputed Belady schedule —
    # ops/tree_attention.py, tries/flatten.py build_bwd_cache_sched);
    # "fused" = the same kernel with per-visit HBM read-modify-write DMAs
    # (no host schedule needed — what the sharded steps use); "split" =
    # separate dq/dkv kernels
    bwd_mode: str = "auto"
    # fuse per-head qk-norm + rope + head-major transpose into Pallas
    # kernels with analytic backward (ops/qk_prep.py): "auto" = on whenever
    # the Pallas attention backend runs (same hardware requirement);
    # "on"/"off" force it
    fused_qk: str = "auto"
    # "ladder": geometric length buckets so jit shapes repeat across
    # workloads (SURVEY.md §7.3 hard part 3); "exact": minimal padding (one
    # compile per distinct length — benchmarking single fixed workloads)
    bucketing: str = "ladder"
    # ladder growth factor: worst-case padded fraction is (growth-1)/growth.
    # 1.12 ≈ ≤11% waste at ~2x the bucket count of the old 1.25 (compiles
    # amortize via the persistent cache / warmup CLI)
    bucket_growth: float = 1.12

    @property
    def pad_multiple(self) -> int:
        # metadata needs the padded length to divide both block sizes
        import math

        return math.lcm(self.block_q, self.block_kv)

    def bucket_length(self, n: int) -> int:
        m = self.pad_multiple
        exact = max(m, -(-n // m) * m)
        if self.bucketing == "exact":
            return exact
        # geometric ladder of m-multiples
        g = self.bucket_growth
        b = m
        while b < exact:
            b = max(-(-int(b * g) // m) * m, b + m)
        return b


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


def resolve_kernel_modes(mc, cfg: EngineConfig) -> tuple[str, str]:
    """(softmax_mode, bwd_mode) for this model/config — the single "auto"
    rule, shared by TreeEngine and the sharded step builders
    (parallel/train.py, parallel/pipeline.py). "auto" backward resolves to
    "cached" (the fused kernel + VMEM slot cache); call sites without a
    host-built Belady schedule in reach (pipeline microbatches, hand-built
    batches) downgrade to "fused" themselves."""
    fwd = cfg.fwd_softmax
    if fwd == "auto":
        fwd = "bound" if getattr(mc, "use_qk_norm", False) else "online"
    bwd = "cached" if cfg.bwd_mode == "auto" else cfg.bwd_mode
    return fwd, bwd


def resolve_loss_mode(cfg: EngineConfig, mc=None) -> str:
    """LM-head loss implementation for this config — shared by TreeEngine
    and the sharded step builders: "auto" means the fused Pallas stats
    kernels (ops/lm_stats.py) whenever the Pallas attention backend runs
    (same hardware requirement; TPU-semantics interpreter under
    cfg.interpret), else the vocab-chunked XLA custom_vjp.

    Gated to hidden sizes ≤ 2048: at d=4096 (8B) the AOT TPU compiler
    places the backward kernel's full dW^T output on the VMEM stack and
    OOMs (scripts/aot_memory_8b.py finding) — measured-good at 0.6B/1.7B
    scale, the XLA vocab-chunked path covers larger models until the
    kernel is re-tuned on real multi-chip hardware."""
    if cfg.loss_mode != "auto":
        return cfg.loss_mode
    if cfg.attn_backend == "pallas" and (
        mc is None or getattr(mc, "hidden_size", 0) <= 2048
    ):
        return "pallas_interpret" if cfg.interpret else "pallas"
    return "vocab"


@dataclasses.dataclass
class TrieBatch:
    """Device-ready packed trie + host-side metadata for result extraction."""

    packed: PackedTrie  # host
    tokens: jnp.ndarray
    depth: jnp.ndarray
    parent: jnp.ndarray
    last_desc: jnp.ndarray
    w_logprob: jnp.ndarray
    w_entropy: jnp.ndarray
    valid: jnp.ndarray  # [n] 1.0 real / 0.0 padding (MoE routing mask)
    meta: tuple  # (kv_ids, kv_counts, kv_types, q_ids, q_counts, q_types)
    # lazily-cached device copy of the per-sequence path matrix
    _gather_cache: tuple | None = None

    @property
    def n_padded(self) -> int:
        return self.packed.n_padded


class TreeEngine:
    def __init__(self, model_config: Qwen3Config, config: EngineConfig = EngineConfig()):
        self.mc = model_config
        self.cfg = config
        self._grad_fn = jax.jit(
            jax.value_and_grad(self._loss, has_aux=True), static_argnums=()
        )
        self._loss_fn = jax.jit(self._loss)
        self._lp_fn = jax.jit(self._logprobs)
        self._custom_cache: dict = {}

    # ----------------------------------------------------------- preparation
    def prepare(self, trie_or_packed) -> TrieBatch:
        """Flatten (if needed), pad to bucket, build block metadata, upload."""
        cfg = self.cfg
        if isinstance(trie_or_packed, TokenTrie):
            packed = flatten_trie(trie_or_packed)
        else:
            packed = trie_or_packed
        n_pad = cfg.bucket_length(packed.n_padded)
        if packed.n_padded != n_pad:
            # re-pad to the bucket (flatten's _pad_packed is idempotent here)
            from dynamictreeattn_tpu.tries.flatten import _pad_packed

            packed = _pad_packed(packed, n_pad)
        meta = build_block_meta(packed.last_desc, cfg.block_q, cfg.block_kv)
        if cfg.bucketing != "exact":
            # stabilize compiled shapes: pad slot widths to powers of two.
            # "exact" mode keeps the minimal width — padded slots are cheap
            # (~0.34us vs ~4.5us active) but 60%+ waste still costs ~5% of
            # the kernel time at the bench shape (docs/PERF.md).
            meta = build_block_meta(
                packed.last_desc,
                cfg.block_q,
                cfg.block_kv,
                min_kv_slots=_next_pow2(meta.kv_ids.shape[1]),
                min_q_slots=_next_pow2(meta.q_ids.shape[1]),
            )
        extra = ()
        if cfg.attn_backend == "pallas" and self._bwd_mode() == "cached":
            from dynamictreeattn_tpu.ops.tree_attention import cached_bwd_geometry
            from dynamictreeattn_tpu.tries import build_bwd_cache_sched

            hkv = self.mc.num_key_value_heads
            _, n_slots = cached_bwd_geometry(
                hkv, self.mc.num_attention_heads // hkv,
                cfg.block_q, cfg.block_kv, self.mc.head_dim,
                meta.n_kv_blocks, BlockSizes().head_block,
            )
            sched = build_bwd_cache_sched(meta, n_slots)
            extra = (jnp.asarray(sched.actions), jnp.asarray(sched.flush))
        return TrieBatch(
            packed=packed,
            tokens=jnp.asarray(packed.tokens),
            depth=jnp.asarray(packed.depth),
            parent=jnp.asarray(packed.parent),
            last_desc=jnp.asarray(packed.last_desc),
            w_logprob=jnp.asarray(packed.w_logprob),
            w_entropy=jnp.asarray(packed.w_entropy),
            valid=jnp.asarray(packed.valid),
            meta=tuple(
                jnp.asarray(x)
                for x in (
                    meta.kv_ids,
                    meta.kv_counts,
                    meta.kv_types,
                    meta.q_ids,
                    meta.q_counts,
                    meta.q_types,
                )
            )
            + extra,
        )

    # ------------------------------------------------------------- internals
    def _attn_fn(self, last_desc, meta):
        cfg = self.cfg
        if cfg.attn_backend == "reference":
            return lambda q, k, v: tree_attention_reference(q, k, v, last_desc)
        if cfg.attn_backend == "pallas":
            bs = BlockSizes(cfg.block_q, cfg.block_kv)
            mode = self._fwd_softmax()
            bwd = self._bwd_mode()
            sched = meta[6:] if len(meta) > 6 else None
            if bwd == "cached" and sched is None:
                bwd = "fused"  # batch prepared without a schedule
            return lambda q, k, v: tree_attention(
                q, k, v, last_desc, *meta[:6], block_sizes=bs,
                interpret=cfg.interpret, softmax_mode=mode, bwd_mode=bwd,
                cache_sched=sched,
            )
        raise ValueError(f"unknown attn_backend {cfg.attn_backend!r}")

    def _fwd_softmax(self) -> str:
        return resolve_kernel_modes(self.mc, self.cfg)[0]

    def _bwd_mode(self) -> str:
        return resolve_kernel_modes(self.mc, self.cfg)[1]

    def _loss_mode(self) -> str:
        return resolve_loss_mode(self.cfg, self.mc)

    def _fused_qk(self) -> bool:
        cfg = self.cfg
        if cfg.fused_qk == "auto":
            return cfg.attn_backend == "pallas" and not cfg.interpret
        return cfg.fused_qk == "on"

    def _hidden(self, params, tokens, depth, last_desc, meta, valid=None):
        return forward_hidden(
            params,
            self.mc,
            tokens,
            depth,
            self._attn_fn(last_desc, meta),
            remat=self.cfg.remat,
            remat_policy=self.cfg.remat_policy,
            remat_segments=self.cfg.remat_segments,
            valid=valid,
            fused_qk=self._fused_qk(),
        )

    def _logprobs(self, params, tokens, depth, parent, last_desc, meta,
                  valid=None):
        hidden = self._hidden(params, tokens, depth, last_desc, meta, valid)
        w_lm = lm_head_weight(params, self.mc)
        return logprob_entropy_from_hidden(
            hidden, w_lm, tokens, parent,
            self.cfg.temperature, self.cfg.loss_chunk, self._loss_mode(),
        )

    def _loss(self, params, tokens, depth, parent, last_desc, w_lp, w_ent,
              valid, meta):
        from dynamictreeattn_tpu.models.qwen3 import forward_hidden_aux

        hidden, faux = forward_hidden_aux(
            params, self.mc, tokens, depth, self._attn_fn(last_desc, meta),
            remat=self.cfg.remat, remat_policy=self.cfg.remat_policy,
            remat_segments=self.cfg.remat_segments,
            valid=valid, fused_qk=self._fused_qk(),
        )
        lp_edge, entropy = logprob_entropy_from_hidden(
            hidden, lm_head_weight(params, self.mc), tokens, parent,
            self.cfg.temperature, self.cfg.loss_chunk, self._loss_mode(),
        )
        sum_lp = jnp.sum(w_lp * lp_edge)
        sum_ent = jnp.sum(w_ent * entropy)
        loss = sum_lp + sum_ent
        aux = {"sum_logprob": sum_lp, "sum_entropy": sum_ent}
        if self.mc.is_moe:
            # router load-balance auxiliary loss (HF Qwen3Moe counterpart)
            aux["lb_loss"] = faux["lb_loss"]
            if self.mc.router_aux_coef:
                loss = loss + self.mc.router_aux_coef * faux["lb_loss"]
        return loss, aux

    # -------------------------------------------------------------- user API
    def loss(self, params, batch: TrieBatch):
        loss, aux = self._loss_fn(
            params, batch.tokens, batch.depth, batch.parent, batch.last_desc,
            batch.w_logprob, batch.w_entropy, batch.valid, batch.meta,
        )
        return loss, aux

    def loss_and_grad(self, params, batch: TrieBatch):
        (loss, aux), grads = self._grad_fn(
            params, batch.tokens, batch.depth, batch.parent, batch.last_desc,
            batch.w_logprob, batch.w_entropy, batch.valid, batch.meta,
        )
        return loss, grads, aux

    # ------------------------------------------------- custom per-seq losses
    def seq_gather_arrays(self, batch: TrieBatch):
        """(paths [S, Lmax] int32 with -1 padding, lengths [S]) — each row is
        a sequence's packed positions root→end, for gathering per-sequence
        logprob/entropy vectors inside jit (the reference's pluggable
        ``loss_fn(logprobs, entropy, attachment)`` contract,
        reference: tree_training_engine.py:377-398)."""
        if batch._gather_cache is None:
            packed = batch.packed
            paths = packed.seq_paths_matrix()  # native/cached (tries/flatten)
            batch._gather_cache = (
                jnp.asarray(paths), jnp.asarray(packed.seq_lens)
            )
        return batch._gather_cache

    def loss_and_grad_custom(self, params, batch: TrieBatch, loss_fn, extras=None):
        """Training step with an arbitrary per-sequence loss.

        ``loss_fn(logprobs, entropy, extras_s, length) -> scalar`` is vmapped
        over sequences: `logprobs` is the padded [Lmax-1] per-edge vector
        (entries ≥ length-1 are garbage — mask by `length`), `entropy` the
        padded [Lmax] entropy vector, `extras_s` the per-sequence slice of the
        `extras` pytree (arrays with leading dim S, aligned with
        batch.packed.seq_batch_ids order)."""
        paths, lengths = self.seq_gather_arrays(batch)
        if extras is None:
            extras = {}

        # Cache compiled steps per loss_fn. Keyed by id() for lookup speed,
        # but guarded by a weakref to the original function: if a closure is
        # garbage-collected and a new one lands on the recycled id, the
        # stale jitted function must NOT be silently reused.
        fn = None
        hit = self._custom_cache.get(id(loss_fn))
        if hit is not None and hit[0]() is loss_fn:
            fn = hit[1]
        if fn is None:

            def total_loss(params, tokens, depth, parent, last_desc, meta,
                           valid, paths, lengths, extras):
                lp_edge, entropy = self._logprobs(
                    params, tokens, depth, parent, last_desc, meta, valid
                )
                safe = jnp.maximum(paths, 0)
                lp_rows = jnp.take(lp_edge, safe[:, 1:], axis=0)  # [S, Lmax-1]
                ent_rows = jnp.take(entropy, safe, axis=0)  # [S, Lmax]
                per_seq = jax.vmap(loss_fn)(lp_rows, ent_rows, extras, lengths)
                return jnp.sum(per_seq)

            fn = jax.jit(jax.value_and_grad(total_loss))
            import weakref

            try:
                ref = weakref.ref(loss_fn)
            except TypeError:
                # non-weakrefable callables (e.g. functools.partial): hold a
                # strong ref so the id can never be recycled under us
                ref = (lambda obj: (lambda: obj))(loss_fn)
            self._custom_cache[id(loss_fn)] = (ref, fn)
        return fn(
            params, batch.tokens, batch.depth, batch.parent, batch.last_desc,
            batch.meta, batch.valid, paths, lengths, extras,
        )

    def forward(self, params, batch: TrieBatch) -> dict[int, np.ndarray]:
        """Inference-mode per-sequence logprobs (reference:
        tree_training_engine.py:516-553): {_sequence_batch_id:
        fp32 array of length len(seq)-1}."""
        lp_edge, _ = self._lp_fn(
            params, batch.tokens, batch.depth, batch.parent, batch.last_desc,
            batch.meta, batch.valid,
        )
        lp_edge = np.asarray(lp_edge)
        out: dict[int, np.ndarray] = {}
        packed = batch.packed
        paths = packed.seq_paths_matrix()
        for s in range(len(packed.seq_batch_ids)):
            L = int(packed.seq_lens[s])
            out[int(packed.seq_batch_ids[s])] = lp_edge[paths[s, 1:L]]
        return out


def pack_sequences_dense(
    seqs, attachs=None, pad_multiple: int = 256, weight_fn=None
) -> PackedTrie:
    """Dense-replay packing: every sequence its own chain (zero sharing).

    Running TreeEngine on this packing IS the dense baseline
    (reference: dense.py:26-53 per-sequence replay) — identical math,
    no prefix reuse, so speedup measures exactly the tree machinery."""
    if attachs is None:
        attachs = [{} for _ in seqs]
    kw = {"weight_fn": weight_fn} if weight_fn is not None else {}
    chains = []
    for i, (s, a) in enumerate(zip(seqs, attachs)):
        t = TokenTrie([s], [dict(a)])
        # keep the original batch id (TokenTrie re-keys to its local index 0)
        t.attach_lists[0] = [
            (dict(att, _sequence_batch_id=i), length)
            for att, length in t.attach_lists[0]
        ]
        chains.append(flatten_trie(t, **kw))
    packed = pack_forest(chains)
    m = pad_multiple
    n_pad = max(m, -(-packed.n_padded // m) * m)
    from dynamictreeattn_tpu.tries.flatten import _pad_packed

    return _pad_packed(packed, n_pad)
