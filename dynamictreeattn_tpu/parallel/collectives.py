"""Autodiff-correct collective operators for explicit TP under shard_map.

With `check_vma=False`, jax's transpose of `lax.psum` is another psum — which
double-counts when the cotangent is already replicated (the classic shard_map
footgun). Tensor parallelism wants the Megatron f/g operator pair instead:

* ``mpar_in``  (f): identity forward, psum backward — placed where a
  replicated activation enters rank-local compute, restoring the full input
  gradient before it flows upstream.
* ``mpar_out`` (g): psum forward, identity backward — placed where rank-local
  partial sums are combined into a replicated activation; since
  ∂(Σ_j x_j)/∂x_local = 1, identity is the exact logical gradient.
* ``const_pmax``: pmax treated as a constant (softmax stabilizer only — its
  gradient cancels analytically; jax defines no pmax differentiation rule).

The reference gets all of this implicitly from torch.distributed autograd
(reference: vocab_parallel.py:82-370); here it is explicit and auditable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mpar_in", "mpar_out", "const_pmax"]


def mpar_in(x, axis: str):
    @jax.custom_vjp
    def f(x):
        return x

    f.defvjp(lambda x: (x, None), lambda _, g: (jax.lax.psum(g, axis),))
    return f(x)


def mpar_out(x, axis: str):
    @jax.custom_vjp
    def g_op(x):
        return jax.lax.psum(x, axis)

    g_op.defvjp(lambda x: (jax.lax.psum(x, axis), None), lambda _, g: (g,))
    return g_op(x)


def const_pmax(x, axis: str):
    @jax.custom_jvp
    def f(x):
        return jax.lax.pmax(x, axis)

    @f.defjvp
    def f_jvp(primals, tangents):
        return f(primals[0]), jnp.zeros_like(tangents[0])

    return f(x)
