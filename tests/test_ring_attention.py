"""Ring tree attention vs the full-sequence reference (fake "seq" mesh).

The reference never had sequence parallelism (SURVEY.md §2.3); the oracle is
the single-device dense-mask reference on the unsharded packed trie.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dynamictreeattn_tpu.ops import tree_attention_reference
from dynamictreeattn_tpu.ops.tree_attention import BlockSizes
from dynamictreeattn_tpu.ops.tree_attention_ring import (
    tree_attention_ring,
    tree_attention_ring_reference,
)
from dynamictreeattn_tpu.parallel import make_mesh
from dynamictreeattn_tpu.tries import build_ring_block_meta

from helpers import random_packed


def _ring_ref_full(q, k, v, ld, sp):
    """Full-arrays wrapper: shard q/k/v over "seq", run the jnp ring."""
    mesh = make_mesh(dp=1, tp=1, sp=sp)
    fn = jax.shard_map(
        lambda ql, kl, vl: tree_attention_ring_reference(
            ql, kl, vl, ld, sp=sp, axis="seq"
        ),
        mesh=mesh,
        in_specs=(P(None, "seq", None),) * 3,
        out_specs=P(None, "seq", None),
        check_vma=False,
    )
    return fn(q, k, v)


def _ring_pallas_full(q, k, v, ld, sp, block, meta):
    mesh = make_mesh(dp=1, tp=1, sp=sp)
    margs = tuple(
        jnp.asarray(getattr(meta, f))
        for f in ("kv_ids", "kv_counts", "kv_types", "q_ids", "q_counts", "q_types")
    )
    fn = jax.shard_map(
        lambda ql, kl, vl: tree_attention_ring(
            ql, kl, vl, ld, *margs, sp=sp, axis="seq",
            block_sizes=BlockSizes(block, block), interpret=True,
        ),
        mesh=mesh,
        in_specs=(P(None, "seq", None),) * 3,
        out_specs=P(None, "seq", None),
        check_vma=False,
    )
    return fn(q, k, v)


def _rand_qkv(seed, hq, hkv, n, dh):
    key = jax.random.key(seed)
    kq, kk, kv_, kc = jax.random.split(key, 4)
    q = jax.random.normal(kq, (hq, n, dh), dtype=jnp.float32)
    k = jax.random.normal(kk, (hkv, n, dh), dtype=jnp.float32)
    v = jax.random.normal(kv_, (hkv, n, dh), dtype=jnp.float32)
    cot = jax.random.normal(kc, (hq, n, dh), dtype=jnp.float32)
    return q, k, v, cot


@pytest.mark.parametrize("sp", [2, 4])
@pytest.mark.parametrize("hq,hkv", [(4, 2), (4, 1)])
def test_ring_reference_matches_full(sp, hq, hkv):
    rng = np.random.default_rng(5 + sp)
    n, dh = 256, 32
    _, _, packed, _ = random_packed(rng, n, 32, n_seqs=16, max_len=50)
    ld = jnp.asarray(packed.last_desc)
    q, k, v, cot = _rand_qkv(sp, hq, hkv, n, dh)

    full = tree_attention_reference(q, k, v, ld)
    ring = _ring_ref_full(q, k, v, ld, sp)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(full), rtol=2e-5, atol=2e-5)

    g_full = jax.grad(
        lambda *a: jnp.sum(tree_attention_reference(*a, ld) * cot), argnums=(0, 1, 2)
    )(q, k, v)
    g_ring = jax.grad(
        lambda *a: jnp.sum(_ring_ref_full(*a, ld, sp) * cot), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b, name in zip(g_ring, g_full, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )


@pytest.mark.skipif(
    not os.environ.get("RUN_INTERPRET"),
    reason="Pallas interpret-mode compile is minutes-slow; opt in with "
    "RUN_INTERPRET=1. Real-TPU coverage: scripts/tpu_ring_check.py.",
)
def test_ring_pallas_matches_full_interpret():
    sp, hq, hkv = 2, 4, 2
    rng = np.random.default_rng(17)
    n, dh, block = 128, 32, 32
    _, _, packed, _ = random_packed(rng, n, block, n_seqs=10, max_len=30)
    meta = build_ring_block_meta(packed.last_desc, sp, block, block)
    ld = jnp.asarray(packed.last_desc)
    q, k, v, cot = _rand_qkv(23, hq, hkv, n, dh)

    full = tree_attention_reference(q, k, v, ld)
    ring = _ring_pallas_full(q, k, v, ld, sp, block, meta)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(full), rtol=2e-5, atol=2e-5)

    g_full = jax.grad(
        lambda *a: jnp.sum(tree_attention_reference(*a, ld) * cot), argnums=(0, 1, 2)
    )(q, k, v)
    g_ring = jax.grad(
        lambda *a: jnp.sum(_ring_pallas_full(*a, ld, sp, block, meta) * cot),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b, name in zip(g_ring, g_full, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )
