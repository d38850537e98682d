"""Tree-attention correctness tests.

Strategy (SURVEY.md §4 implication — the reference repo has no tests):

* CPU (always): the blocked simulator — which executes the kernels' exact
  block-sparse iteration, masking, and online-softmax math — against the
  dense-mask reference, over random tries and GQA configs.
* CPU (opt-in, RUN_INTERPRET=1): the actual Pallas kernel in TPU-interpret
  mode on a tiny grid (interpret compiles take minutes for grouped kernels).
* Real TPU: scripts/tpu_kernel_check.py runs Pallas fwd+bwd parity at bf16 —
  executed as part of benching, not in this CPU suite.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamictreeattn_tpu.ops import BlockSizes, tree_attention_reference
from dynamictreeattn_tpu.ops.tree_attention import tree_attention
from dynamictreeattn_tpu.ops.tree_attention_sim import tree_attention_blocked_sim
from dynamictreeattn_tpu.tries import build_block_meta

from helpers import random_packed


def _meta_args(meta):
    return (
        jnp.asarray(meta.kv_ids),
        jnp.asarray(meta.kv_counts),
        jnp.asarray(meta.kv_types),
        jnp.asarray(meta.q_ids),
        jnp.asarray(meta.q_counts),
        jnp.asarray(meta.q_types),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("hq,hkv", [(2, 2), (4, 2), (8, 2), (4, 1)])
def test_sim_forward_matches_reference(seed, hq, hkv):
    rng = np.random.default_rng(seed)
    block, n, dh = 32, 256, 32
    _, _, packed, meta = random_packed(rng, n, block, n_seqs=20, max_len=60)
    key = jax.random.key(seed)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (hq, n, dh), dtype=jnp.float32)
    k = jax.random.normal(kk, (hkv, n, dh), dtype=jnp.float32)
    v = jax.random.normal(kv_, (hkv, n, dh), dtype=jnp.float32)
    ld = jnp.asarray(packed.last_desc)

    out = tree_attention_blocked_sim(q, k, v, packed.last_desc, meta)
    ref = tree_attention_reference(q, k, v, ld)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_sim_backward_matches_reference():
    rng = np.random.default_rng(3)
    block, n, dh = 32, 128, 32
    hq, hkv = 4, 2
    _, _, packed, meta = random_packed(rng, n, block, n_seqs=10, max_len=30)
    key = jax.random.key(103)
    kq, kk, kv_, kc = jax.random.split(key, 4)
    q = jax.random.normal(kq, (hq, n, dh), dtype=jnp.float32)
    k = jax.random.normal(kk, (hkv, n, dh), dtype=jnp.float32)
    v = jax.random.normal(kv_, (hkv, n, dh), dtype=jnp.float32)
    cot = jax.random.normal(kc, (hq, n, dh), dtype=jnp.float32)
    ld = jnp.asarray(packed.last_desc)

    def f_sim(q, k, v):
        return jnp.sum(tree_attention_blocked_sim(q, k, v, packed.last_desc, meta) * cot)

    def f_ref(q, k, v):
        return jnp.sum(tree_attention_reference(q, k, v, ld) * cot)

    gk = jax.grad(f_sim, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5, err_msg=name
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_sim_bound_softmax_matches_reference(seed):
    """Bound-shift mode (fixed Cauchy-Schwarz shift, no online max) — same
    math as online up to fp rounding; the engine uses it for qk-norm models."""
    rng = np.random.default_rng(seed)
    block, n, dh = 32, 256, 32
    hq, hkv = 4, 2
    _, _, packed, meta = random_packed(rng, n, block, n_seqs=20, max_len=60)
    key = jax.random.key(100 + seed)
    kq, kk, kv_, kc = jax.random.split(key, 4)
    q = jax.random.normal(kq, (hq, n, dh), dtype=jnp.float32)
    k = jax.random.normal(kk, (hkv, n, dh), dtype=jnp.float32)
    v = jax.random.normal(kv_, (hkv, n, dh), dtype=jnp.float32)
    cot = jax.random.normal(kc, (hq, n, dh), dtype=jnp.float32)
    ld = jnp.asarray(packed.last_desc)

    out = tree_attention_blocked_sim(
        q, k, v, packed.last_desc, meta, softmax_mode="bound"
    )
    ref = tree_attention_reference(q, k, v, ld)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def f_sim(q, k, v):
        return jnp.sum(
            tree_attention_blocked_sim(
                q, k, v, packed.last_desc, meta, softmax_mode="bound"
            )
            * cot
        )

    def f_ref(q, k, v):
        return jnp.sum(tree_attention_reference(q, k, v, ld) * cot)

    gk = jax.grad(f_sim, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5, err_msg=name
        )


def test_bound_shift_margin_qk_normed():
    """The bound is sound (>= every score) and, at qk-norm score magnitudes,
    its slack over the true row max stays within the full-precision window
    the dispatch guard (BOUND_SAFE_MAX) certifies."""
    from dynamictreeattn_tpu.ops.tree_attention import (
        BOUND_SAFE_MAX,
        _score_bound,
    )

    rng = np.random.default_rng(7)
    dh, n = 128, 512
    scale = dh**-0.5
    for gain in (1.0, 2.0, 4.0):
        q = rng.standard_normal((1, 1, n, dh)).astype(np.float32)
        q = q / np.linalg.norm(q, axis=-1, keepdims=True) * np.sqrt(dh) * gain
        k = rng.standard_normal((1, n, dh)).astype(np.float32)
        k = k / np.linalg.norm(k, axis=-1, keepdims=True) * np.sqrt(dh) * gain
        st = np.einsum("hgqd,hkd->hgqk", q, k) * scale
        bound = np.asarray(_score_bound(jnp.asarray(q), jnp.asarray(k), scale))
        # soundness at any gain
        assert (bound[..., None] >= st - 1e-4).all()
        # slack <= 2*max(C): the invariant the runtime guard relies on
        slack = bound - st.max(axis=-1)
        assert slack.max() <= 2 * bound.max() + 1e-4
        if gain <= 1.5:
            # realistic qk-norm gains: guard engages and precision is certified
            assert bound.max() < BOUND_SAFE_MAX, bound.max()
            assert slack.max() < 2 * BOUND_SAFE_MAX
        if gain >= 4.0:
            # drifted gains: guard must refuse the bound path
            assert bound.max() >= BOUND_SAFE_MAX


def test_bound_guard_falls_back_when_unsafe():
    """softmax_mode="bound" with large-magnitude scores must still be exact:
    the lax.cond guard routes to the online path (sim mirror + dispatch on
    CPU jit; real-kernel check in scripts/tpu_kernel_check.py)."""
    from dynamictreeattn_tpu.ops.tree_attention import (
        BOUND_SAFE_MAX,
        _score_bound,
    )

    rng = np.random.default_rng(11)
    block, n, dh = 32, 128, 32
    hq, hkv = 2, 1
    _, _, packed, meta = random_packed(rng, n, block, n_seqs=8, max_len=40)
    key = jax.random.key(5)
    kq, kk, kv_ = jax.random.split(key, 3)
    # 20x-scaled inputs: C >> BOUND_SAFE_MAX, unguarded bound path underflows
    q = jax.random.normal(kq, (hq, n, dh), dtype=jnp.float32) * 20.0
    k = jax.random.normal(kk, (hkv, n, dh), dtype=jnp.float32) * 20.0
    v = jax.random.normal(kv_, (hkv, n, dh), dtype=jnp.float32)
    ld = jnp.asarray(packed.last_desc)

    q4 = q.reshape(hkv, hq // hkv, n, dh)
    c = _score_bound(q4, k, dh**-0.5)
    assert float(jnp.max(c)) >= BOUND_SAFE_MAX  # guard must trip

    # the unguarded sim path really does underflow here...
    raw = tree_attention_blocked_sim(
        q, k, v, packed.last_desc, meta, softmax_mode="bound"
    )
    ref = tree_attention_reference(q, k, v, ld)
    assert not np.allclose(np.asarray(raw), np.asarray(ref), atol=1e-2)


def test_sim_dense_chain_equals_causal():
    """A forest of chains (the dense baseline layout) == causal attention per
    chain — sanity for using the same engine as the dense baseline."""
    n, block, dh = 128, 32, 32
    last_desc = np.concatenate([np.full(64, 63), np.full(64, 127)]).astype(np.int32)
    meta = build_block_meta(last_desc, block, block)
    q = jax.random.normal(jax.random.key(0), (4, n, dh), dtype=jnp.float32)
    k = jax.random.normal(jax.random.key(1), (2, n, dh), dtype=jnp.float32)
    v = jax.random.normal(jax.random.key(2), (2, n, dh), dtype=jnp.float32)
    out = tree_attention_blocked_sim(q, k, v, last_desc, meta)
    for lo, hi in [(0, 64), (64, 128)]:
        ld_local = jnp.full((hi - lo,), hi - lo - 1, dtype=jnp.int32)
        ref = tree_attention_reference(q[:, lo:hi], k[:, lo:hi], v[:, lo:hi], ld_local)
        np.testing.assert_allclose(
            np.asarray(out[:, lo:hi]), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


@pytest.mark.skipif(
    not os.environ.get("RUN_INTERPRET"),
    reason="Pallas interpret-mode compile is minutes-slow; opt in with RUN_INTERPRET=1. "
    "Real-kernel parity runs on TPU via scripts/tpu_kernel_check.py.",
)
def test_pallas_interpret_forward_tiny():
    rng = np.random.default_rng(0)
    block, n, dh = 32, 64, 32
    hq = hkv = 2  # group=1: grouped kernels blow up interpret compile time
    _, _, packed, meta = random_packed(rng, n, block, n_seqs=6, max_len=20)
    q = jax.random.normal(jax.random.key(0), (hq, n, dh), dtype=jnp.float32)
    k = jax.random.normal(jax.random.key(1), (hkv, n, dh), dtype=jnp.float32)
    v = jax.random.normal(jax.random.key(2), (hkv, n, dh), dtype=jnp.float32)
    ld = jnp.asarray(packed.last_desc)
    with jax.default_matmul_precision("highest"):
        out = tree_attention(
            q, k, v, ld, *_meta_args(meta),
            block_sizes=BlockSizes(block, block), interpret=True,
        )
        ref = tree_attention_reference(q, k, v, ld)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_rmw_visit_marks_oracle(seed):
    """The fused backward's read-modify-write schedule metadata
    (first-visit / conflict-with-previous / buffer parity per grid step)
    vs a python oracle, on real random-trie block metadata."""
    from dynamictreeattn_tpu.ops.tree_attention import _rmw_visit_marks

    rng = np.random.default_rng(seed)
    block, n = 32, 256
    _, _, packed, meta = random_packed(rng, n, block, n_seqs=10, max_len=40)
    nk = n // block
    got = np.asarray(
        _rmw_visit_marks(
            jnp.asarray(meta.kv_ids), jnp.asarray(meta.kv_types), nk
        )
    )
    seen: set = set()
    prev = None
    nvalid = 0
    want = np.zeros_like(got)
    for i in range(meta.kv_ids.shape[0]):
        for s in range(meta.kv_ids.shape[1]):
            if meta.kv_types[i, s] > 0:
                kv = meta.kv_ids[i, s]
                want[i, s] = (
                    kv not in seen, prev == kv, nvalid % 2
                )
                seen.add(kv)
                prev = kv
                nvalid += 1
    np.testing.assert_array_equal(got, want)
    # every kv block is visited (diagonal pairs always exist) — the fused
    # kernel relies on this to initialize every dk/dv block
    assert len(seen) == nk


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n_slots", [1, 2, 3, 8])
def test_bwd_cache_sched_oracle(seed, n_slots):
    """build_bwd_cache_sched replayed like the cached kernel would —
    per-block scalar accumulators through slots/evictions/reloads/flush —
    must reproduce direct per-visit accumulation exactly, for any slot
    count (R=1 forces eviction on every block change)."""
    from dynamictreeattn_tpu.tries import build_bwd_cache_sched

    rng = np.random.default_rng(seed)
    block, n = 32, 256
    _, _, packed, meta = random_packed(rng, n, block, n_seqs=10, max_len=40)
    nk = n // block
    sched = build_bwd_cache_sched(meta, n_slots)
    R = sched.n_slots
    assert R == max(1, n_slots)

    hbm = np.full(nk, np.nan)  # uninitialized output, like device HBM
    cache = np.full(R, np.nan)
    cache_block = np.full(R, -1)
    want = np.zeros(nk)
    for i in range(meta.kv_ids.shape[0]):
        for s in range(meta.kv_ids.shape[1]):
            if meta.kv_types[i, s] <= 0:
                # padding slots must carry no actions
                assert tuple(sched.actions[i, s]) == (0, 0, 0, -1)
                continue
            b = int(meta.kv_ids[i, s])
            contrib = rng.standard_normal()
            want[b] += contrib
            slot, fresh, load, evict_id = (int(x) for x in sched.actions[i, s])
            assert 0 <= slot < R
            if evict_id >= 0:
                assert cache_block[slot] == evict_id, "evicting wrong block"
                hbm[evict_id] = cache[slot]
                cache_block[slot] = -1
            if fresh:
                cache[slot] = contrib
            elif load:
                cache[slot] = hbm[b] + contrib
            else:
                assert cache_block[slot] == b or cache_block[slot] == -1
                if cache_block[slot] == b:
                    cache[slot] += contrib
                else:  # slot was just freed for us without explicit evict
                    raise AssertionError("revisit without load/fresh on empty slot")
            cache_block[slot] = b
    fl_valid = sched.flush[:, 1] == 1
    for r in np.nonzero(fl_valid)[0]:
        assert cache_block[r] == sched.flush[r, 0]
        hbm[sched.flush[r, 0]] = cache[r]
    assert not np.isnan(hbm).any(), "some kv block never written"
    np.testing.assert_allclose(hbm, want, rtol=1e-12)


@pytest.mark.parametrize("mode", ["online", "bound"])
def test_pallas_interpret_head_blocked(mode):
    """hkv=4 with BlockSizes(head_block=2): the grid head axis has size 2,
    so the h>0 block-indexing path of the (hb, ...) BlockSpecs is exercised
    (regression cover for the head-blocked kernel rewrite — no other CI test
    reaches it). Forward in both softmax modes + the split backward vs the
    dense-mask reference, in the TPU-semantics interpreter. Slow lane."""
    rng = np.random.default_rng(0)
    block, n, dh = 32, 128, 32
    hq = hkv = 4  # group=1 keeps interpret compile tolerable; head grid = 2
    _, _, packed, meta = random_packed(rng, n, block, n_seqs=8, max_len=30)
    q = jax.random.normal(jax.random.key(0), (hq, n, dh), dtype=jnp.float32)
    k = jax.random.normal(jax.random.key(1), (hkv, n, dh), dtype=jnp.float32)
    v = jax.random.normal(jax.random.key(2), (hkv, n, dh), dtype=jnp.float32)
    w = jax.random.normal(jax.random.key(3), (hq, n, dh), dtype=jnp.float32)
    ld = jnp.asarray(packed.last_desc)
    bs = BlockSizes(block, block, head_block=2)

    def loss(q, k, v):
        o = tree_attention(
            q, k, v, ld, *_meta_args(meta), block_sizes=bs,
            interpret=True, softmax_mode=mode, bwd_mode="split",
        )
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        return jnp.sum(tree_attention_reference(q, k, v, ld) * w)

    with jax.default_matmul_precision("highest"):
        out = tree_attention(
            q, k, v, ld, *_meta_args(meta), block_sizes=bs,
            interpret=True, softmax_mode=mode,
        )
        ref = tree_attention_reference(q, k, v, ld)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
        gk = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5, err_msg=name
        )


@pytest.mark.skipif(
    not os.environ.get("RUN_INTERPRET"),
    reason="Pallas interpret-mode compile is minutes-slow; opt in with RUN_INTERPRET=1. "
    "Real-kernel parity runs on TPU via scripts/tpu_bwd_ab.py.",
)
def test_pallas_interpret_fused_bwd_matches_split():
    """Fused dq+dkv kernel (HBM read-modify-write dq accumulation) ==
    split kernels, bit-exact in the TPU-semantics interpreter."""
    rng = np.random.default_rng(0)
    block, n, dh = 32, 128, 32
    hq, hkv = 4, 2  # group=2 exercises the grouped RMW buffer
    _, _, packed, meta = random_packed(rng, n, block, n_seqs=8, max_len=30)
    q = jax.random.normal(jax.random.key(0), (hq, n, dh), dtype=jnp.float32)
    k = jax.random.normal(jax.random.key(1), (hkv, n, dh), dtype=jnp.float32)
    v = jax.random.normal(jax.random.key(2), (hkv, n, dh), dtype=jnp.float32)
    w = jax.random.normal(jax.random.key(3), (hq, n, dh), dtype=jnp.float32)
    ld = jnp.asarray(packed.last_desc)

    def loss(q, k, v, mode):
        o = tree_attention(
            q, k, v, ld, *_meta_args(meta),
            block_sizes=BlockSizes(block, block), interpret=True, bwd_mode=mode,
        )
        return jnp.sum(o * w)

    with jax.default_matmul_precision("highest"):
        gs = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, "split")
        gf = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, "fused")
    for a, b in zip(gs, gf):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


@pytest.mark.skipif(
    not os.environ.get("RUN_INTERPRET"),
    reason="Pallas interpret-mode compile is minutes-slow; opt in with "
    "RUN_INTERPRET=1. Real-kernel parity runs on TPU via "
    "scripts/tpu_kernel_parity.py.",
)
def test_pallas_interpret_cached_bwd_matches_split():
    """Cached fused kernel (VMEM slot cache + Belady schedule) == split
    kernels in the TPU-semantics interpreter, at a slot count small enough
    to force evictions and reloads."""
    from dynamictreeattn_tpu.tries import build_bwd_cache_sched

    rng = np.random.default_rng(0)
    block, n, dh = 32, 128, 32
    hq, hkv = 4, 2
    _, _, packed, meta = random_packed(rng, n, block, n_seqs=8, max_len=30)
    sched = build_bwd_cache_sched(meta, 2)
    assert (sched.actions[:, :, 3] >= 0).sum() > 0, "want evictions"
    assert (sched.actions[:, :, 2] == 1).sum() > 0, "want reloads"
    q = jax.random.normal(jax.random.key(0), (hq, n, dh), dtype=jnp.float32)
    k = jax.random.normal(jax.random.key(1), (hkv, n, dh), dtype=jnp.float32)
    v = jax.random.normal(jax.random.key(2), (hkv, n, dh), dtype=jnp.float32)
    w = jax.random.normal(jax.random.key(3), (hq, n, dh), dtype=jnp.float32)
    ld = jnp.asarray(packed.last_desc)

    def loss(q, k, v, mode, cs=None):
        o = tree_attention(
            q, k, v, ld, *_meta_args(meta),
            block_sizes=BlockSizes(block, block), interpret=True,
            bwd_mode=mode, cache_sched=cs,
        )
        return jnp.sum(o * w)

    with jax.default_matmul_precision("highest"):
        gs = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, "split")
        gc = jax.grad(loss, argnums=(0, 1, 2))(
            q, k, v, "cached", (sched.actions, sched.flush)
        )
    for a, b in zip(gs, gc):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


@pytest.mark.skipif(
    not os.environ.get("RUN_TPU"),
    reason="needs the real TPU chip (conftest pins this suite to CPU); "
    "opt in with RUN_TPU=1 — runs scripts/tpu_kernel_parity.py --check "
    "in a clean subprocess so the axon backend registers.",
)
def test_tpu_kernel_parity_6combo():
    """All 6 softmax x backward kernel combos vs the dense reference on
    hardware, bf16 (committed artifact: grad/kernel-parity-bf16.txt)."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [_sys.executable,
         os.path.join(repo, "scripts", "tpu_kernel_parity.py"), "--check"],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
