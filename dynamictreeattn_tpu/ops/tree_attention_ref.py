"""Reference (pure-jnp, dense-mask) tree attention.

Numerically the "ground truth" the Pallas kernel is tested against, and the
CPU-friendly fallback path. Materializes the full [n, n] score matrix — fine
for tests, unusable at 16k tries (that's what the kernel is for).

Math: packed queries/keys over a DFS-flattened trie; position j attends to i
iff i is an ancestor-or-self of j, i.e. ``i <= j <= last_desc[i]``
(see tries/flatten.py). Softmax statistics in float32 regardless of input
dtype, matching both the Pallas kernel and the reference's fp32 upcast
(reference: vocab_parallel.py:13-27).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tree_attention_reference", "tree_mask"]


def tree_mask(last_desc: jnp.ndarray) -> jnp.ndarray:
    """[n, n] boolean mask: mask[q, k] = k attends-from q (k ancestor of q)."""
    n = last_desc.shape[0]
    q = jnp.arange(n)[:, None]
    k = jnp.arange(n)[None, :]
    return (k <= q) & (q <= last_desc[None, :])


def tree_attention_reference(
    q: jnp.ndarray,  # [Hq, n, dh]
    k: jnp.ndarray,  # [Hkv, n, dh]
    v: jnp.ndarray,  # [Hkv, n, dh]
    last_desc: jnp.ndarray,  # [n] int32
    scale: float | None = None,
) -> jnp.ndarray:
    hq, n, dh = q.shape
    hkv = k.shape[0]
    assert hq % hkv == 0
    g = hq // hkv
    if scale is None:
        scale = dh**-0.5

    qf = q.astype(jnp.float32).reshape(hkv, g, n, dh)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    s = jnp.einsum("hgqd,hkd->hgqk", qf, kf) * scale
    mask = tree_mask(last_desc)[None, None]
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("hgqk,hkd->hgqd", p, vf)
    return o.reshape(hq, n, dh).astype(q.dtype)
