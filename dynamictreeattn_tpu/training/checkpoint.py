"""Orbax-backed checkpoint/resume for params + optimizer state.

Handles sharded arrays natively (orbax restores to the provided shardings),
works single-host and multi-host (orbax coordinates across processes)."""

from __future__ import annotations

import os
from typing import Any

import jax

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, params: Any, opt_state: Any = None,
             extra: dict | None = None) -> None:
        ocp = self._ocp
        items = {"params": ocp.args.StandardSave(params)}
        if opt_state is not None:
            items["opt_state"] = ocp.args.StandardSave(opt_state)
        if extra:
            items["extra"] = ocp.args.JsonSave(extra)
        self._mgr.save(step, args=ocp.args.Composite(**items))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, step: int | None = None, params_like: Any = None,
                opt_state_like: Any = None) -> dict:
        """Restore {params, opt_state?, extra?}. `*_like` pytrees (arrays or
        ShapeDtypeStructs with shardings) direct layout/sharding restoration."""
        ocp = self._ocp
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")

        def as_restore(tree):
            if tree is None:
                return ocp.args.StandardRestore()
            abstract = jax.tree.map(
                lambda x: x
                if isinstance(x, jax.ShapeDtypeStruct)
                else jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None)),
                tree,
            )
            return ocp.args.StandardRestore(abstract)

        items = {"params": as_restore(params_like)}
        if opt_state_like is not None:
            items["opt_state"] = as_restore(opt_state_like)
        items["extra"] = ocp.args.JsonRestore()
        try:
            out = self._mgr.restore(step, args=ocp.args.Composite(**items))
        except Exception:
            # checkpoint may lack opt_state/extra
            out = self._mgr.restore(
                step, args=ocp.args.Composite(params=as_restore(params_like))
            )
        return dict(out)

    def close(self) -> None:
        self._mgr.close()
