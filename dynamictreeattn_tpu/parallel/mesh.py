"""Device mesh construction.

One 3-D mesh ("data", "seq", "model") covers every parity scaling point
(BASELINE.md) plus the long-trie stretch goal: DP trie batches over "data"
(ICI intra-host, DCN across hosts), Ulysses sequence parallelism over "seq"
(ICI), tensor/vocab parallelism over "model" (ICI). Axes of size 1 cost
nothing. Multi-host bring-up: call `jax.distributed.initialize()` before
`make_mesh` (SURVEY.md §5)."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(
    dp: int | None = None, tp: int = 1, sp: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp is None:
        dp = len(devices) // (tp * sp)
    need = dp * sp * tp
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(dp, sp, tp)
    return Mesh(arr, axis_names=("data", "seq", "model"))
