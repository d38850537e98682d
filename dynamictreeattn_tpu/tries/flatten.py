"""Flatten a TokenTrie into a packed DFS layout + tree-attention mask metadata.

This is the architectural heart of the TPU build. The reference exploits prefix
sharing *outside* the attention kernel with a stack-based KV-cache replay engine
(reference: tree_training_engine.py:52-616) because CUDA flash attention only
understands contiguous causal masks. On TPU we instead flatten the trie ONCE
into a single packed sequence in DFS order, where:

* each trie token occupies exactly one packed position ``j``;
* ``depth[j]`` is its distance from the root (the RoPE position id — the
  reference gets this implicitly from KV-cache offsets);
* ``parent[j]`` is the packed position of its trie parent (−1 for roots);
* ``last_desc[j]`` is the largest packed position in j's subtree.

Because DFS assigns each subtree a contiguous interval, the ancestor relation —
and hence the tree-attention mask — becomes the O(1) interval test::

    attend(q, k)  ⇔  k <= q <= last_desc[k]

A forest (many tries packed back-to-back, plus isolated padding tokens) needs
no extra segment ids: the interval test never crosses tree boundaries.

``build_block_meta`` turns ``last_desc`` into splash-attention-style block
metadata: for each query block, the (sparse) list of key/value blocks that
contain any ancestor, each tagged full/partial. The Pallas kernel iterates only
those blocks — this is where the ≥3× over dense replay comes from.

Loss weighting: the reference accumulates prefix logprob/entropy grads across
leaves through its stack buffers (reference: tree_training_engine.py:443-465).
Here each packed position gets a scalar weight instead: position j's
logprob-edge (entropy) contributes to every sequence whose path contains j,
weighted per the default linear loss ``w_logprobs·mean(logprobs[:L−1]) +
w_entropy·mean(entropy[:L])`` (reference: run.py:149-152; logprob term excludes
the last label, entropy includes position 0). The weights are computed in O(n)
by placing per-sequence weights at endpoint positions and accumulating up the
parent chain.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from dynamictreeattn_tpu.tries.token_trie import TokenTrie

__all__ = [
    "PackedTrie", "BlockMeta", "RingBlockMeta", "BwdCacheSched", "flatten_trie",
    "build_block_meta", "build_ring_block_meta", "build_bwd_cache_sched",
    "pack_forest",
]


def _default_weight_fn(attachment: dict, length: int) -> tuple[float, float]:
    """(total logprob weight, total entropy weight) for one sequence endpoint.

    Defaults match the reference harness (reference: run_all.py:11-19):
    loss = w_logprobs * mean(logprobs[:L-1]) + w_entropy * mean(entropy[:L]).
    """
    return (
        float(attachment.get("w_logprobs", -1.0)),
        float(attachment.get("w_entropy", 0.1)),
    )


@dataclasses.dataclass
class PackedTrie:
    """A trie (or forest of tries) in packed DFS layout, padded to a bucket."""

    tokens: np.ndarray  # [n_padded] int32
    depth: np.ndarray  # [n_padded] int32 — RoPE position ids
    parent: np.ndarray  # [n_padded] int32, -1 for roots and padding
    last_desc: np.ndarray  # [n_padded] int32, == own index for padding
    w_logprob: np.ndarray  # [n_padded] float32 — weight of edge parent[j]→j
    w_entropy: np.ndarray  # [n_padded] float32 — weight of entropy at j
    valid: np.ndarray  # [n_padded] float32 — 1.0 real token, 0.0 padding
    n_tokens: int  # valid (un-padded) token count
    # one row per original sequence endpoint:
    seq_batch_ids: np.ndarray  # [n_seqs] int32 — _sequence_batch_id
    seq_end_pos: np.ndarray  # [n_seqs] int32 — packed pos of last token
    seq_lens: np.ndarray  # [n_seqs] int32

    @property
    def n_padded(self) -> int:
        return len(self.tokens)

    def seq_path(self, which: int) -> np.ndarray:
        """Packed positions of sequence `which`'s tokens, root → endpoint."""
        length = int(self.seq_lens[which])
        return self.seq_paths_matrix()[which, :length]

    def seq_paths_matrix(self) -> np.ndarray:
        """[n_seqs, Lmax] packed root→endpoint paths, -1 padded — computed
        once per PackedTrie (native parent-chain walk in treekit, vectorized
        numpy fallback) and cached: this used to be a per-sequence Python
        walk re-run on every custom-loss step."""
        cached = getattr(self, "_paths_cache", None)
        if cached is not None:
            return cached
        from dynamictreeattn_tpu.tries import _native

        S = len(self.seq_lens)
        lmax = int(self.seq_lens.max()) if S else 0
        if _native.native_enabled():
            paths = _native.seq_paths_core(
                self.parent, self.seq_end_pos.astype(np.int64),
                self.seq_lens.astype(np.int64), lmax,
            )
        else:
            paths = np.full((S, max(lmax, 1)), -1, np.int32)
            pos = self.seq_end_pos.astype(np.int64).copy()
            d = self.seq_lens.astype(np.int64) - 1
            for _ in range(lmax):
                act = d >= 0
                if not act.any():
                    break
                rows = np.nonzero(act)[0]
                paths[rows, d[act]] = pos[act]
                pos[act] = self.parent[pos[act]]
                d -= 1
        self._paths_cache = paths
        return paths

    def validate(self) -> None:
        n = self.n_tokens
        assert np.all(self.parent[:n] < np.arange(n))
        assert np.all(self.last_desc[:n] >= np.arange(n))
        assert np.all(self.last_desc[n:] == np.arange(n, self.n_padded))
        roots = self.parent[:n] < 0
        assert np.all(self.depth[:n][roots] == 0)
        nonroot = ~roots
        assert np.all(
            self.depth[:n][nonroot]
            == self.depth[self.parent[:n][nonroot]] + 1
        )


def flatten_trie(
    trie: TokenTrie,
    pad_to: int | None = None,
    weight_fn=_default_weight_fn,
) -> PackedTrie:
    """Flatten a TokenTrie into a PackedTrie.

    `pad_to` pads the packed length (padding tokens are isolated roots with
    zero loss weight — they attend only to themselves, so they never NaN and
    never contribute).

    The per-token passes run in native code when the treekit C++ library is
    available (tries/_native.py); the numpy path is the fallback and oracle.
    """
    from dynamictreeattn_tpu.tries import _native

    use_native = _native.native_enabled()
    lens = trie.lens
    lcps = np.concatenate([[0], trie.lcp_lens]) if trie.n_leaves > 1 else np.array([0])
    n = int(lens.sum() - lcps[1:].sum()) if trie.n_leaves > 1 else int(lens[0])

    # attachment queries (python-light: one iteration per sequence endpoint,
    # no numpy ops — typically one per leaf)
    q_leaf: list[int] = []
    q_len: list[int] = []
    q_wlp: list[float] = []
    q_went: list[float] = []
    seq_batch_ids: list[int] = []
    for i in range(trie.n_leaves):
        for attachment, length in trie.attach_lists[i]:
            w_lp, w_ent = weight_fn(attachment, length)
            q_leaf.append(i)
            q_len.append(length)
            q_wlp.append(w_lp)
            q_went.append(w_ent)
            seq_batch_ids.append(int(attachment["_sequence_batch_id"]))
    q_leaf_a = np.asarray(q_leaf, np.int64)
    q_len_a = np.asarray(q_len, np.int64)
    q_wlp_a = np.asarray(q_wlp, np.float64)
    q_went_a = np.asarray(q_went, np.float64)

    if use_native:
        # all O(n)/O(n_leaves) passes in treekit; endpoint resolution via
        # the native stack sweep, weight scatter vectorized
        tokens, depth, parent, last_desc = _native.flatten_core(
            trie.inputs, np.asarray(trie.lcp_lens, np.int64)
        )
        end_a = _native.endpoints_core(
            trie.inputs, np.asarray(trie.lcp_lens, np.int64), q_leaf_a, q_len_a
        )
    else:
        tokens = np.zeros(n, dtype=np.int32)
        depth = np.zeros(n, dtype=np.int32)
        parent = np.full(n, -1, dtype=np.int32)
        end_a = np.empty(len(q_leaf), np.int64)
        stack_pos = np.full(int(lens.max()) + 1, -1, dtype=np.int64)
        cursor = 0
        qi = 0
        for i in range(trie.n_leaves):
            seq = trie.inputs[i]
            start = int(lcps[i])
            new = len(seq) - start
            if new > 0:
                sl = slice(cursor, cursor + new)
                tokens[sl] = seq[start:]
                depth[sl] = np.arange(start, len(seq), dtype=np.int32)
                parent[sl] = np.concatenate(
                    [
                        [stack_pos[start - 1] if start > 0 else -1],
                        np.arange(cursor, cursor + new - 1, dtype=np.int64),
                    ]
                )
                stack_pos[start : len(seq)] = np.arange(cursor, cursor + new)
                cursor += new
            while qi < len(q_leaf) and q_leaf[qi] == i:
                end_a[qi] = stack_pos[q_len[qi] - 1]
                qi += 1
        assert cursor == n

    acc_lp = np.zeros(n, dtype=np.float64)
    acc_ent = np.zeros(n, dtype=np.float64)
    multi = q_len_a > 1
    np.add.at(acc_lp, end_a[multi], q_wlp_a[multi] / (q_len_a[multi] - 1))
    np.add.at(acc_ent, end_a, q_went_a / q_len_a)
    seq_end_pos = end_a
    seq_lens = q_len_a

    if not use_native:
        # last_desc via monotone depth stack (DFS layout property).
        last_desc = np.empty(n, dtype=np.int32)
        dstack: list[int] = []
        for j in range(n):
            while dstack and depth[dstack[-1]] >= depth[j]:
                last_desc[dstack.pop()] = j - 1
            dstack.append(j)
        for j in dstack:
            last_desc[j] = n - 1

    # Propagate endpoint weights up the parent chain (children precede nothing —
    # DFS order means parent[j] < j, so a single reverse sweep suffices).
    if use_native:
        _native.accumulate_up(parent, acc_lp, acc_ent)
    else:
        for j in range(n - 1, -1, -1):
            p = parent[j]
            if p >= 0:
                acc_lp[p] += acc_lp[j]
                acc_ent[p] += acc_ent[j]
    w_logprob = acc_lp.astype(np.float32)
    w_logprob[depth == 0] = 0.0  # roots have no incoming edge
    w_entropy = acc_ent.astype(np.float32)

    packed = PackedTrie(
        tokens=tokens,
        depth=depth,
        parent=parent,
        last_desc=last_desc,
        w_logprob=w_logprob,
        w_entropy=w_entropy,
        valid=np.ones(n, dtype=np.float32),
        n_tokens=n,
        seq_batch_ids=np.asarray(seq_batch_ids, dtype=np.int32),
        seq_end_pos=np.asarray(seq_end_pos, dtype=np.int32),
        seq_lens=np.asarray(seq_lens, dtype=np.int32),
    )
    if pad_to is not None:
        packed = _pad_packed(packed, pad_to)
    return packed


def _pad_packed(p: PackedTrie, pad_to: int) -> PackedTrie:
    n = p.n_padded
    if pad_to < n:
        raise ValueError(f"pad_to={pad_to} < packed length {n}")
    extra = pad_to - n
    if extra == 0:
        return p
    pad_idx = np.arange(n, pad_to, dtype=np.int32)
    return dataclasses.replace(
        p,
        tokens=np.concatenate([p.tokens, np.zeros(extra, np.int32)]),
        depth=np.concatenate([p.depth, np.zeros(extra, np.int32)]),
        parent=np.concatenate([p.parent, np.full(extra, -1, np.int32)]),
        last_desc=np.concatenate([p.last_desc, pad_idx]),
        w_logprob=np.concatenate([p.w_logprob, np.zeros(extra, np.float32)]),
        w_entropy=np.concatenate([p.w_entropy, np.zeros(extra, np.float32)]),
        valid=np.concatenate([p.valid, np.zeros(extra, np.float32)]),
    )


def pack_forest(packed_tries: list[PackedTrie], pad_to: int | None = None) -> PackedTrie:
    """Concatenate several PackedTries into one forest buffer.

    DFS intervals never span tries, so the interval mask stays exact — no
    segment ids needed. Sequence endpoints keep their original batch ids, so
    callers must ensure ids are disjoint (or re-key afterwards).
    """
    offsets = np.cumsum([0] + [p.n_padded for p in packed_tries])

    def _shift(arr_name, off, p):
        a = getattr(p, arr_name).copy()
        valid = a >= 0
        a[valid] += off
        return a

    merged = PackedTrie(
        tokens=np.concatenate([p.tokens for p in packed_tries]),
        depth=np.concatenate([p.depth for p in packed_tries]),
        parent=np.concatenate(
            [_shift("parent", off, p) for off, p in zip(offsets, packed_tries)]
        ),
        last_desc=np.concatenate(
            [p.last_desc + off for off, p in zip(offsets, packed_tries)]
        ),
        w_logprob=np.concatenate([p.w_logprob for p in packed_tries]),
        w_entropy=np.concatenate([p.w_entropy for p in packed_tries]),
        valid=np.concatenate([p.valid for p in packed_tries]),
        n_tokens=int(offsets[-1]),
        seq_batch_ids=np.concatenate([p.seq_batch_ids for p in packed_tries]),
        seq_end_pos=np.concatenate(
            [p.seq_end_pos + off for off, p in zip(offsets, packed_tries)]
        ),
        seq_lens=np.concatenate([p.seq_lens for p in packed_tries]),
    )
    # note: interior padding of constituent tries stays valid (isolated roots).
    if pad_to is not None:
        merged = _pad_packed(merged, pad_to)
    return merged


@dataclasses.dataclass
class BlockMeta:
    """Block-sparse tree-mask metadata for the Pallas kernel.

    Forward / dq iteration (query-major): for query block i, the kernel visits
    kv blocks ``kv_ids[i, s]`` for s < ``kv_counts[i]``; ``kv_types[i, s]`` is
    2 when every (q, k) pair in the block tile is unmasked (no mask applied
    in-kernel) and 1 when the interval test must run elementwise. Slots past
    the count repeat the last valid id so Pallas's pipeline never re-DMAs.

    dkv iteration (key-major): the transpose — for kv block j, the query
    blocks that read it.
    """

    block_q: int
    block_kv: int
    kv_ids: np.ndarray  # [n_q_blocks, max_kv_slots] int32
    kv_counts: np.ndarray  # [n_q_blocks] int32
    kv_types: np.ndarray  # [n_q_blocks, max_kv_slots] int32 (1 partial, 2 full)
    q_ids: np.ndarray  # [n_kv_blocks, max_q_slots] int32
    q_counts: np.ndarray  # [n_kv_blocks] int32
    q_types: np.ndarray  # [n_kv_blocks, max_q_slots] int32

    @property
    def n_q_blocks(self) -> int:
        return len(self.kv_counts)

    @property
    def n_kv_blocks(self) -> int:
        return len(self.q_counts)

    @property
    def n_active_pairs(self) -> int:
        return int(self.kv_counts.sum())


def build_block_meta(
    last_desc: np.ndarray,
    block_q: int,
    block_kv: int,
    min_kv_slots: int = 0,
    min_q_slots: int = 0,
) -> BlockMeta:
    """Compute block-sparse metadata from `last_desc` (padded length).

    Query block i covers rows [i·Bq, (i+1)·Bq); kv block j covers columns
    [j·Bk, (j+1)·Bk). Derivations (q ∈ Q, k ∈ K, mask = k ≤ q ≤ last_desc[k],
    and last_desc[k] ≥ k always):

    * K active for Q   ⇔ ks < qe  and  max(last_desc[K]) ≥ qs
    * K full for Q     ⇔ ke ≤ qs+1 and min(last_desc[K]) ≥ qe−1
      (ke−1 ≤ qs handles the k ≤ q side; the diagonal block is never full
      unless Bk == 1.)
    """
    n = len(last_desc)
    if n % block_q or n % block_kv:
        raise ValueError("padded length must divide both block sizes")
    from dynamictreeattn_tpu.tries import _native

    if _native.native_enabled():
        kv_ids, kv_counts, kv_types, q_ids, q_counts, q_types = (
            _native.block_meta_core(
                np.asarray(last_desc), block_q, block_kv, min_kv_slots, min_q_slots
            )
        )
        return BlockMeta(
            block_q=block_q, block_kv=block_kv,
            kv_ids=kv_ids, kv_counts=kv_counts, kv_types=kv_types,
            q_ids=q_ids, q_counts=q_counts, q_types=q_types,
        )
    nq, nk = n // block_q, n // block_kv
    ld = np.asarray(last_desc, dtype=np.int64).reshape(nk, block_kv)
    ld_max = ld.max(axis=1)  # [nk]
    ld_min = ld.min(axis=1)

    qs = np.arange(nq, dtype=np.int64)[:, None] * block_q  # [nq, 1]
    qe = qs + block_q
    ks = np.arange(nk, dtype=np.int64)[None, :] * block_kv  # [1, nk]
    ke = ks + block_kv

    active = (ks < qe) & (ld_max[None, :] >= qs)  # [nq, nk]
    full = (ke - 1 <= qs) & (ld_min[None, :] >= qe - 1)

    kv_ids, kv_counts, kv_types = _compact(active, full, min_kv_slots)
    q_ids, q_counts, q_types = _compact(active.T, full.T, min_q_slots)
    return BlockMeta(
        block_q=block_q,
        block_kv=block_kv,
        kv_ids=kv_ids,
        kv_counts=kv_counts,
        kv_types=kv_types,
        q_ids=q_ids,
        q_counts=q_counts,
        q_types=q_types,
    )


@dataclasses.dataclass
class BwdCacheSched:
    """Host-precomputed slot schedule for the cached fused-backward kernel.

    The fused dq+dk+dv kernel is query-major, so a kv block's dk/dv
    accumulator is revisited at several non-consecutive grid steps. The
    round-2 kernel round-tripped each visit through fp32 HBM
    (read-modify-write, ~1 MB per visit); this schedule instead keeps an
    R-slot cache of [block_kv, head_dim] accumulators resident in VMEM
    scratch and tells the kernel, per (q-block, slot) visit, exactly what to
    do — consecutive q blocks share most ancestors (DFS layout), so hit
    rates are high and HBM traffic drops to roughly one write per kv block
    (measured ~9-11% of the RMW traffic at the bench shapes with R=16).

    Eviction is Belady/optimal (evict the resident block whose next visit is
    farthest away) — the whole visit sequence is known here, and plain LRU
    thrashes on the cyclic re-visit pattern of consecutive q rows.

    Per valid visit (kv_types[i, s] > 0), ``actions[i, s]`` holds int32
    ``(slot, fresh, load, evict_id)``:

    * ``slot``     — cache slot this visit accumulates into;
    * ``fresh``    — 1 on the block's first visit anywhere: overwrite the
      slot (no read, no zero-init);
    * ``load``     — 1 when the block was evicted earlier: DMA its partial
      accumulator back from HBM into the slot before accumulating;
    * ``evict_id`` — kv block currently occupying the slot, to be written
      out to HBM before reuse; −1 when the slot is free.

    ``flush[r] = (block_id, valid)`` lists each slot's final occupant; the
    kernel writes those out at the last grid step of each head subgrid.
    The schedule is head-independent (the mask depends only on positions).
    """

    n_slots: int
    actions: np.ndarray  # [n_q_blocks, max_kv_slots, 4] int32
    flush: np.ndarray  # [n_slots, 2] int32


def build_bwd_cache_sched(meta: BlockMeta, n_slots: int) -> BwdCacheSched:
    """Belady-eviction slot schedule for the kernel's (i asc, s asc) visit
    order over valid slots. ``n_slots`` is clamped to at least 1; callers
    size it from their VMEM budget (ops/tree_attention.py picks
    min(16, n_kv_blocks) at the default block sizes)."""
    R = max(1, int(n_slots))
    nq, width = meta.kv_ids.shape
    # visit list in kernel traversal order
    vis_i: list[int] = []
    vis_s: list[int] = []
    vis_b: list[int] = []
    for i in range(nq):
        for s in range(width):
            if meta.kv_types[i, s] > 0:
                vis_i.append(i)
                vis_s.append(s)
                vis_b.append(int(meta.kv_ids[i, s]))
    V = len(vis_b)
    # next-use index per visit (V means "never again")
    next_use = np.full(V, V, np.int64)
    last_seen: dict[int, int] = {}
    for t in range(V - 1, -1, -1):
        b = vis_b[t]
        next_use[t] = last_seen.get(b, V)
        last_seen[b] = t

    actions = np.zeros((nq, width, 4), np.int32)
    actions[:, :, 3] = -1
    slot_of: dict[int, int] = {}  # resident block -> slot
    occupant: list[int] = [-1] * R  # slot -> block (-1 free)
    nxt: dict[int, int] = {}  # resident block -> next use index
    evicted: set[int] = set()  # blocks with partial content in HBM
    seen: set[int] = set()
    for t in range(V):
        b = vis_b[t]
        i, s = vis_i[t], vis_s[t]
        if b in slot_of:
            slot, fresh, load, evict_id = slot_of[b], 0, 0, -1
        else:
            free = [r for r in range(R) if occupant[r] < 0]
            if free:
                slot, evict_id = free[0], -1
            else:
                victim = max(slot_of, key=lambda x: nxt[x])
                slot = slot_of.pop(victim)
                occupant[slot] = -1
                evicted.add(victim)
                evict_id = victim
            fresh = 0 if b in seen else 1
            load = 1 if b in evicted else 0
            if load:
                evicted.discard(b)
            slot_of[b] = slot
            occupant[slot] = b
        seen.add(b)
        nxt[b] = next_use[t]
        actions[i, s] = (slot, fresh, load, evict_id)
    flush = np.zeros((R, 2), np.int32)
    for b, r in slot_of.items():
        flush[r] = (b, 1)
    return BwdCacheSched(n_slots=R, actions=actions, flush=flush)


@dataclasses.dataclass
class RingBlockMeta:
    """Per-(q shard, kv shard) block-sparse metadata for ring tree attention.

    Arrays are the BlockMeta tables with two leading shard axes:
    ``kv_ids[a, b]`` is the query-major table for q shard a against kv shard
    b (ids are LOCAL to the shard: q blocks in [0, nq_loc), kv blocks in
    [0, nk_loc)); ``q_ids[a, b]`` the key-major transpose. Pairs with no
    ancestor relation get one type-0 slot (count clamped to 1 so the kernel's
    emit-at-last-slot still fires, writing zeros / −inf lse)."""

    sp: int
    block_q: int
    block_kv: int
    kv_ids: np.ndarray  # [sp, sp, nq_loc, S] int32
    kv_counts: np.ndarray  # [sp, sp, nq_loc] int32
    kv_types: np.ndarray  # [sp, sp, nq_loc, S] int32
    q_ids: np.ndarray  # [sp, sp, nk_loc, St] int32
    q_counts: np.ndarray  # [sp, sp, nk_loc] int32
    q_types: np.ndarray  # [sp, sp, nk_loc, St] int32


def build_ring_block_meta(
    last_desc: np.ndarray,
    sp: int,
    block_q: int,
    block_kv: int,
    min_kv_slots: int = 0,
    min_q_slots: int = 0,
) -> RingBlockMeta:
    """Block metadata for every (q shard, kv shard) pair of a ring layout.

    The global activity/fullness tests are identical to build_block_meta;
    each pair's submatrix is compacted separately (common slot widths so one
    kernel shape serves every ring step)."""
    n = len(last_desc)
    if n % sp:
        raise ValueError(f"sp={sp} must divide the padded length {n=}")
    n_loc = n // sp
    if n_loc % block_q or n_loc % block_kv:
        raise ValueError(
            f"both block sizes ({block_q}, {block_kv}) must divide the "
            f"shard length {n_loc}"
        )
    nq, nk = n // block_q, n // block_kv
    nq_loc, nk_loc = n_loc // block_q, n_loc // block_kv
    ld = np.asarray(last_desc, dtype=np.int64).reshape(nk, block_kv)
    ld_max = ld.max(axis=1)
    ld_min = ld.min(axis=1)
    qs = np.arange(nq, dtype=np.int64)[:, None] * block_q
    qe = qs + block_q
    ks = np.arange(nk, dtype=np.int64)[None, :] * block_kv
    ke = ks + block_kv
    active = (ks < qe) & (ld_max[None, :] >= qs)
    full = (ke - 1 <= qs) & (ld_min[None, :] >= qe - 1)

    kv_w = max(
        int(active[a * nq_loc:(a + 1) * nq_loc, b * nk_loc:(b + 1) * nk_loc]
            .sum(axis=1).max())
        for a in range(sp) for b in range(sp)
    )
    q_w = max(
        int(active[a * nq_loc:(a + 1) * nq_loc, b * nk_loc:(b + 1) * nk_loc]
            .sum(axis=0).max())
        for a in range(sp) for b in range(sp)
    )
    kv_w = max(kv_w, min_kv_slots, 1)
    q_w = max(q_w, min_q_slots, 1)

    kv_ids = np.zeros((sp, sp, nq_loc, kv_w), np.int32)
    kv_counts = np.zeros((sp, sp, nq_loc), np.int32)
    kv_types = np.zeros((sp, sp, nq_loc, kv_w), np.int32)
    q_ids = np.zeros((sp, sp, nk_loc, q_w), np.int32)
    q_counts = np.zeros((sp, sp, nk_loc), np.int32)
    q_types = np.zeros((sp, sp, nk_loc, q_w), np.int32)
    for a in range(sp):
        for b in range(sp):
            sub_a = active[a * nq_loc:(a + 1) * nq_loc, b * nk_loc:(b + 1) * nk_loc]
            sub_f = full[a * nq_loc:(a + 1) * nq_loc, b * nk_loc:(b + 1) * nk_loc]
            i, c, t = _compact_allow_empty(sub_a, sub_f, kv_w)
            kv_ids[a, b], kv_counts[a, b], kv_types[a, b] = i, c, t
            i, c, t = _compact_allow_empty(sub_a.T, sub_f.T, q_w)
            q_ids[a, b], q_counts[a, b], q_types[a, b] = i, c, t
    return RingBlockMeta(
        sp=sp, block_q=block_q, block_kv=block_kv,
        kv_ids=kv_ids, kv_counts=kv_counts, kv_types=kv_types,
        q_ids=q_ids, q_counts=q_counts, q_types=q_types,
    )


def _compact_allow_empty(active: np.ndarray, full: np.ndarray, width: int):
    """_compact for shard-pair submatrices: empty rows are legal (count
    clamped to 1 with a type-0 slot — skipped compute, still emits)."""
    nrows, _ = active.shape
    counts = active.sum(axis=1).astype(np.int32)
    ids = np.zeros((nrows, width), dtype=np.int32)
    types = np.zeros((nrows, width), dtype=np.int32)
    for r in range(nrows):
        cols = np.nonzero(active[r])[0]
        c = len(cols)
        if c:
            ids[r, :c] = cols
            types[r, :c] = np.where(full[r, cols], 2, 1)
            ids[r, c:] = cols[-1]
    return ids, np.maximum(counts, 1), types


def _compact(active: np.ndarray, full: np.ndarray, min_slots: int):
    """Row-compact a boolean activity matrix into (ids, counts, types)."""
    nrows, _ = active.shape
    counts = active.sum(axis=1).astype(np.int32)
    # Every row must have ≥1 active block (diagonal/self block) so the repeat-
    # padding has something to repeat.
    assert counts.min() >= 1, "every block row must have at least one active block"
    width = max(int(counts.max()), min_slots, 1)
    ids = np.zeros((nrows, width), dtype=np.int32)
    types = np.zeros((nrows, width), dtype=np.int32)
    for r in range(nrows):
        cols = np.nonzero(active[r])[0]
        c = len(cols)
        ids[r, :c] = cols
        types[r, :c] = np.where(full[r, cols], 2, 1)
        ids[r, c:] = cols[-1]  # repeat → pipeline re-uses the fetched block
        types[r, c:] = 0
    return ids, counts, types
