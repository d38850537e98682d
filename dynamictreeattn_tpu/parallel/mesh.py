"""Device mesh construction.

One 4-D mesh ("data", "seq", "pipe", "model") covers every parity scaling
point (BASELINE.md) plus the stretch goals: DP trie batches over "data"
(ICI intra-host, DCN across hosts), Ulysses sequence parallelism over
"seq" (ICI), GPipe pipeline stages over "pipe" (ICI/DCN — only
neighbor ppermutes cross it), tensor/vocab parallelism over "model"
(innermost → fastest ICI). Axes of size 1 cost nothing. Multi-host
bring-up: call `jax.distributed.initialize()` before `make_mesh`
(SURVEY.md §5)."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(
    dp: int | None = None, tp: int = 1, sp: int = 1, pp: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp is None:
        dp = len(devices) // (tp * sp * pp)
    need = dp * sp * pp * tp
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(dp, sp, pp, tp)
    return Mesh(arr, axis_names=("data", "seq", "pipe", "model"))
