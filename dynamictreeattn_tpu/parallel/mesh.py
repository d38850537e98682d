"""Device mesh construction.

One 2-D mesh ("data", "model") covers every parity scaling point
(BASELINE.md): DP trie batches over "data" (ICI intra-host, DCN across
hosts), tensor/vocab parallelism over "model" (ICI). Multi-host bring-up:
call `jax.distributed.initialize()` before `make_mesh` (SURVEY.md §5)."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp is None:
        dp = len(devices) // tp
    if dp * tp != len(devices):
        devices = devices[: dp * tp]
    if dp * tp > len(devices):
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))
