"""Logit filtering for sampling: top-k / top-p (nucleus) / min-p.

The reference delegates rollout sampling to its host RL framework
(reference: README.md:4-5 — AReaL), so these are ecosystem-parity controls
for the in-repo sampler (models/generate.py); semantics match HuggingFace's
logits processors (TopKLogitsWarper / TopPLogitsWarper / MinPLogitsWarper),
parity-tested in tests/test_sampling.py.

All filters rewrite disallowed logits to a large negative number (not -inf:
`jax.random.categorical` subtracts the row max, and -inf arithmetic turns
fully-masked rows into NaN; the filters always keep ≥1 token so any finite
very-negative fill behaves identically).

TPU notes: min-p is sort-free (prob < min_p·p_max ⇔ logit < logit_max +
log(min_p)); top-k thresholds on `lax.top_k`'s k-th value; top-p needs the
nucleus boundary, computed from one descending `jnp.sort` over the vocab —
at GRPO decode shapes ([32, 151936] fp32) the sort costs ~0.2 ms/step on
v5e against a ~3.2 ms decode step (scripts/tpu_sampling_cost.py).
`top_k` is static (lax.top_k shape); `top_p`/`min_p` are traced operands,
so sweeping them never recompiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["filter_logits"]

_NEG = -1e30


def _top_k(logits, k: int):
    thr = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < thr, _NEG, logits)


def _top_p(logits, p):
    srt = jnp.sort(logits, axis=-1)[..., ::-1]  # descending
    probs = jax.nn.softmax(srt, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens whose preceding (exclusive) mass is < p: the smallest set
    # whose total mass reaches p, always including the top token (HF
    # TopPLogitsWarper semantics)
    keep = (cum - probs) < p
    thr = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < thr, _NEG, logits)


def _min_p(logits, mp):
    # prob < mp * p_max  ⇔  logit < logit_max + log(mp) — no softmax needed
    thr = jnp.max(logits, axis=-1, keepdims=True) + jnp.log(mp)
    return jnp.where(logits < thr, _NEG, logits)


def filter_logits(logits, top_k: int = 0, top_p=None, min_p=None):
    """Apply top-k → top-p → min-p filtering (HF processor order) to
    `logits` [..., V]. `top_k` static (0 = off); `top_p`/`min_p` may be
    traced scalars (None = off). Temperature scaling is the caller's job
    (apply before filtering, as HF does)."""
    if top_k:
        logits = _top_k(logits, int(top_k))
    if top_p is not None:
        logits = _top_p(logits, top_p)
    if min_p is not None:
        logits = _min_p(logits, min_p)
    return logits
