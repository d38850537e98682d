"""Gradient parity comparison — the build's flagship correctness oracle.

Counterpart of the reference's exp/compare_grads.py:5-88 (and its committed
result grad/Qwen3-0.6B-TB-vs-DB-bf16.txt): per-parameter relative gradient
deviation ``‖g_exp − g_base‖ / ‖g_base‖``, sorted descending.
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = ["compare_grads", "format_grad_table"]


def compare_grads(base_grads, exp_grads) -> list[tuple[str, float, float]]:
    """[(param_path, rel_err, base_norm)], sorted by rel_err descending.

    Leaves with a stacked leading layer axis are split per layer so the table
    resolution matches the reference's per-parameter dump."""
    base_flat = jax.tree_util.tree_flatten_with_path(base_grads)[0]
    exp_flat = jax.tree_util.tree_flatten_with_path(exp_grads)[0]
    rows = []
    for (path_b, gb), (path_e, ge) in zip(base_flat, exp_flat):
        assert path_b == path_e, (path_b, path_e)
        name = jax.tree_util.keystr(path_b)
        gb = np.asarray(gb, dtype=np.float64)
        ge = np.asarray(ge, dtype=np.float64)
        if gb.ndim >= 2 and "layers" in name:
            for i in range(gb.shape[0]):
                rows.append(_row(f"{name}[{i}]", gb[i], ge[i]))
        else:
            rows.append(_row(name, gb, ge))
    rows.sort(key=lambda r: -r[1])
    return rows


def _row(name, gb, ge):
    nb = float(np.linalg.norm(gb))
    diff = float(np.linalg.norm(ge - gb))
    rel = diff / nb if nb > 0 else (0.0 if diff == 0 else float("inf"))
    return (name, rel, nb)


def format_grad_table(rows, top: int | None = None) -> str:
    out = [f"{'param':60s} {'rel_err':>12s} {'base_norm':>12s}"]
    for name, rel, nb in rows[:top]:
        out.append(f"{name:60s} {rel:12.4e} {nb:12.4e}")
    return "\n".join(out)
