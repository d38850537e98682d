"""Fused LM-head stats kernels (ops/lm_stats.py) vs autodiff oracle.

Tiny shapes keep the TPU-semantics interpreter tolerable (~30 s); the
larger ragged/row-split matrix is RUN_INTERPRET-gated like the other
interpret suites. Real-chip timing/parity: scripts/tpu_loss_ab.py
(committed numbers in docs/PERF.md)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamictreeattn_tpu.ops.lm_stats import lm_stats, lm_stats_bwd


def _oracle(h, w, it):
    logits = (h @ w) * it
    m = jnp.max(logits, axis=-1)
    ex = jnp.exp(logits - m[:, None])
    se = jnp.sum(ex, axis=-1)
    lse = m + jnp.log(se)
    mx = jnp.sum(ex * logits, axis=-1) / se
    return lse, mx


def test_lm_stats_interpret_fwd_bwd():
    """Forward + analytic backward vs the dense oracle, ragged vocab
    (V=160 → one full + one flush-to-edge masked block at bv=128)."""
    rng = np.random.default_rng(0)
    n, d, V, bv, it = 64, 32, 160, 128, 1.25
    h = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, V)), jnp.float32) * 0.3
    lse_o, mx_o = _oracle(h, w, it)
    lse, mx = lm_stats(h, w, it, block_v=bv, interpret=True)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_o),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(mx_o),
                               rtol=1e-5, atol=1e-5)

    g_lse = jnp.asarray(rng.standard_normal(n), jnp.float32)
    g_ent = jnp.asarray(rng.standard_normal(n), jnp.float32)

    def f(h, w):
        lse, mx = _oracle(h, w, it)
        return jnp.sum(g_lse * lse + g_ent * (lse - mx))

    dh_o, dw_o = jax.grad(f, argnums=(0, 1))(h, w)
    dh, dwT = lm_stats_bwd(h, w, lse, mx, g_lse, g_ent, it, block_v=bv,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_o),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dwT.T), np.asarray(dw_o),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(
    not os.environ.get("RUN_INTERPRET"),
    reason="interpret compiles are slow; opt in with RUN_INTERPRET=1 "
    "(real-chip parity: scripts/tpu_loss_ab.py)",
)
def test_lm_stats_interpret_row_split():
    """Row-split wrapper (max_rows) agrees with the single-call kernels and
    the oracle — dW must sum across splits."""
    rng = np.random.default_rng(1)
    n, d, V, bv, it = 96, 32, 300, 128, 0.9
    h = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, V)), jnp.float32) * 0.3
    lse_o, mx_o = _oracle(h, w, it)
    lse, mx = lm_stats(h, w, it, block_v=bv, interpret=True, max_rows=32)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_o),
                               rtol=1e-5, atol=1e-5)
    g_lse = jnp.asarray(rng.standard_normal(n), jnp.float32)
    g_ent = jnp.asarray(rng.standard_normal(n), jnp.float32)

    def f(h, w):
        lse, mx = _oracle(h, w, it)
        return jnp.sum(g_lse * lse + g_ent * (lse - mx))

    dh_o, dw_o = jax.grad(f, argnums=(0, 1))(h, w)
    dh, dwT = lm_stats_bwd(h, w, lse, mx, g_lse, g_ent, it, block_v=bv,
                           interpret=True, max_rows=32)
    np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_o),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dwT.T), np.asarray(dw_o),
                               rtol=2e-5, atol=2e-5)
