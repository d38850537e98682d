"""Fused qk-prep kernel (ops/qk_prep.py) vs the unfused jnp chain.

Runs the REAL Pallas kernels in the TPU-semantics interpreter (cheap here:
elementwise kernels, tiny grids) against rms_norm+apply_rope+transpose,
values and grads, for both the qk-normed (Qwen3) and plain (Llama/Qwen2.5)
variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamictreeattn_tpu.models.qwen3 import apply_rope, rms_norm, rope_tables
from dynamictreeattn_tpu.ops.qk_prep import qkv_prep

EPS = 1e-6


def _setup(seed, n, hq, hkv, dh):
    key = jax.random.key(seed)
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (n, hq * dh), jnp.float32)
    k = jax.random.normal(ks[1], (n, hkv * dh), jnp.float32)
    v = jax.random.normal(ks[2], (n, hkv * dh), jnp.float32)
    qw = 1.0 + 0.1 * jax.random.normal(ks[3], (dh,), jnp.float32)
    kw = 1.0 + 0.1 * jax.random.normal(ks[4], (dh,), jnp.float32)
    pos = jnp.arange(n, dtype=jnp.int32) % 7
    cos, sin = rope_tables(pos, dh, 10000.0)
    return q, k, v, qw, kw, cos, sin


def _reference(q, k, v, qw, kw, cos, sin, use_norm, n, hq, hkv, dh):
    qh = q.reshape(n, hq, dh)
    kh = k.reshape(n, hkv, dh)
    vh = v.reshape(n, hkv, dh)
    if use_norm:
        qh = rms_norm(qh, qw, EPS)
        kh = rms_norm(kh, kw, EPS)
    qh = apply_rope(qh, cos, sin)
    kh = apply_rope(kh, cos, sin)
    return (qh.transpose(1, 0, 2), kh.transpose(1, 0, 2),
            vh.transpose(1, 0, 2))


@pytest.mark.parametrize("use_norm", [True, False])
def test_qkv_prep_matches_reference(use_norm):
    n, hq, hkv, dh = 64, 4, 2, 32
    q, k, v, qw, kw, cos, sin = _setup(0, n, hq, hkv, dh)

    with jax.default_matmul_precision("highest"):
        out = qkv_prep(q, k, v, qw, kw, cos, sin, EPS, use_norm, True)
        ref = _reference(q, k, v, qw, kw, cos, sin, use_norm, n, hq, hkv, dh)
    for a, b, name in zip(out, ref, ["q", "k", "v"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5, err_msg=name
        )


@pytest.mark.parametrize("use_norm", [True, False])
def test_qkv_prep_grads_match_reference(use_norm):
    n, hq, hkv, dh = 64, 4, 2, 32
    q, k, v, qw, kw, cos, sin = _setup(3, n, hq, hkv, dh)
    cq = jax.random.normal(jax.random.key(10), (hq, n, dh), jnp.float32)
    ck = jax.random.normal(jax.random.key(11), (hkv, n, dh), jnp.float32)
    cv = jax.random.normal(jax.random.key(12), (hkv, n, dh), jnp.float32)

    def loss_fused(q, k, v, qw, kw):
        qt, kt, vt = qkv_prep(q, k, v, qw, kw, cos, sin, EPS, use_norm, True)
        return (jnp.sum(qt * cq) + jnp.sum(kt * ck) + jnp.sum(vt * cv))

    def loss_ref(q, k, v, qw, kw):
        qt, kt, vt = _reference(q, k, v, qw, kw, cos, sin, use_norm,
                                n, hq, hkv, dh)
        return (jnp.sum(qt * cq) + jnp.sum(kt * ck) + jnp.sum(vt * cv))

    with jax.default_matmul_precision("highest"):
        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, qw, kw)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, qw, kw)
    names = ["dq", "dk", "dv", "dqw", "dkw"]
    for a, b, name in zip(gf, gr, names):
        if not use_norm and name in ("dqw", "dkw"):
            # fused path returns zeros for the unused norm weights
            np.testing.assert_allclose(np.asarray(a), 0.0, err_msg=name)
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-5, err_msg=name
        )
