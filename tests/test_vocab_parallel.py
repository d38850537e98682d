"""Direct unit tests of the vocab-parallel loss vs the local fused loss.

The reference's vocab_parallel.py has NO in-repo test (SURVEY.md §4: "the
vocab-parallel path has no test at all in-repo"); these close that gap."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dynamictreeattn_tpu.ops.losses import (
    logprob_entropy_from_hidden,
    position_stats_from_hidden,
)
from dynamictreeattn_tpu.parallel import make_mesh
from dynamictreeattn_tpu.parallel.vocab_parallel import (
    vp_position_stats,
    vp_tree_loss_from_hidden,
)


def _setup(seed=0, n=64, d=32, v=128):
    key = jax.random.key(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = jax.random.normal(k1, (n, d), dtype=jnp.float32)
    w = jax.random.normal(k2, (d, v), dtype=jnp.float32) * 0.3
    tokens = jax.random.randint(k3, (n,), 0, v, dtype=jnp.int32)
    parent = jnp.concatenate([jnp.array([-1], jnp.int32),
                              jnp.arange(n - 1, dtype=jnp.int32)])
    return hidden, w, tokens, parent


@pytest.mark.parametrize("tp", [2, 4])
@pytest.mark.parametrize("temperature", [1.0, 0.7])
def test_vp_stats_match_local(tp, temperature):
    hidden, w, _, _ = _setup()
    mesh = make_mesh(dp=1, tp=tp)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, "model")), out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded(hidden, w_local):
        return vp_position_stats(hidden, w_local, temperature, 16)

    lse_s, ent_s = sharded(hidden, w)
    lse_l, ent_l = position_stats_from_hidden(hidden, w, temperature, 16)
    np.testing.assert_allclose(np.asarray(lse_s), np.asarray(lse_l), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ent_s), np.asarray(ent_l),
                               rtol=2e-4, atol=2e-5)


def test_vp_loss_and_grads_match_local():
    hidden, w, tokens, parent = _setup(seed=3)
    n = hidden.shape[0]
    w_lp = jnp.asarray(np.random.default_rng(0).normal(size=n).astype(np.float32))
    w_ent = jnp.abs(w_lp) * 0.1
    mesh = make_mesh(dp=1, tp=4)

    def local(hidden, w):
        lp, ent = logprob_entropy_from_hidden(hidden, w, tokens, parent, 1.0, 16)
        return jnp.sum(w_lp * lp) + jnp.sum(w_ent * ent)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, "model")),
        out_specs=(P(), P(), P(None, "model")),
        check_vma=False,
    )
    def sharded(hidden, w_local):
        # Differentiate INSIDE shard_map, like the real train step (grads
        # through the unchecked shard_map boundary use pmean-style cotangent
        # conventions and are not what optimizers want). Contract: the vp
        # loss produces per-rank PARTIAL hidden cotangents (its vocab shard
        # only); mpar_in on the hidden restores the full gradient, exactly as
        # forward_hidden_tp does at its output.
        from dynamictreeattn_tpu.parallel.collectives import mpar_in

        def f(h, w_local):
            loss, _ = vp_tree_loss_from_hidden(
                mpar_in(h, "model"), w_local, tokens, parent, w_lp, w_ent, 1.0, 16
            )
            return loss

        loss, (gh, gw_local) = jax.value_and_grad(f, argnums=(0, 1))(hidden, w_local)
        return loss, gh, gw_local

    l_loc, (gh_loc, gw_loc) = jax.value_and_grad(local, argnums=(0, 1))(hidden, w)
    l_sh, gh_sh, gw_sh = sharded(hidden, w)
    np.testing.assert_allclose(float(l_sh), float(l_loc), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gh_sh), np.asarray(gh_loc),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_sh), np.asarray(gw_loc),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("temperature", [1.0, 0.7])
@pytest.mark.parametrize("n,v,vc", [(64, 128, 32), (48, 100, 32), (40, 90, 64)])
def test_vocab_chunked_stats_match_rowchunked(n, v, vc, temperature):
    """position_stats_from_hidden mode="vocab" (custom_vjp, per-column-block
    dW writes) == mode="rows" (autodiff through the checkpointed lax.map) ==
    dense one-shot — values AND grads through both operands. Covers the
    exact-divisor chunking (128/32), a ragged tail (100/32), and a
    wider-than-half tail overlap (90/64)."""
    hidden, w, _, _ = _setup(seed=7, n=n, d=32, v=v)

    def stats(mode):
        # force a small chunk width so the online merge + per-block dW
        # writes run (the auto heuristic picks one chunk at toy vocabs)
        kw = {"vocab_chunk_width": vc} if mode == "vocab" else {}
        return position_stats_from_hidden(hidden, w, temperature, 16,
                                          mode=mode, **kw)

    for a, b in zip(stats("vocab"), stats("rows")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    cl = jax.random.normal(jax.random.key(1), (n,), jnp.float32)
    ce = jax.random.normal(jax.random.key(2), (n,), jnp.float32)

    def scalar(mode):
        kw = {"vocab_chunk_width": vc} if mode == "vocab" else {}

        def f(hidden, w):
            lse, ent = position_stats_from_hidden(
                hidden, w, temperature, 16, mode=mode, **kw
            )
            return jnp.sum(cl * lse) + jnp.sum(ce * ent)
        return f

    gv = jax.grad(scalar("vocab"), argnums=(0, 1))(hidden, w)
    gr = jax.grad(scalar("rows"), argnums=(0, 1))(hidden, w)
    for a, b, name in zip(gv, gr, ["dhidden", "dW"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5, err_msg=name)


def test_vocab_chunked_indivisible_vocab_single_chunk():
    """A vocab with no usable divisor (prime) falls back to one chunk and
    still matches the dense math."""
    n, d, v = 32, 16, 97  # prime vocab
    hidden, w, _, _ = _setup(seed=9, n=n, d=d, v=v)
    lse_v, ent_v = position_stats_from_hidden(hidden, w, 1.0, 16, mode="vocab")
    logits = (hidden @ w).astype(jnp.float32)
    lse_d = jax.scipy.special.logsumexp(logits, axis=-1)
    p = jax.nn.softmax(logits, axis=-1)
    ent_d = lse_d - jnp.sum(p * logits, axis=-1)
    np.testing.assert_allclose(np.asarray(lse_v), np.asarray(lse_d), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ent_v), np.asarray(ent_d),
                               rtol=2e-4, atol=2e-5)
