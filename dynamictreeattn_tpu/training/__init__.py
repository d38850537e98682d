"""Training loop, optimizer integration, checkpoint/resume.

All NEW capability relative to the reference, which computes gradients only —
no optimizer, no checkpointing, no resume exists there (SURVEY.md §5:
"no optimizer anywhere in the repo"). Required for the multi-host production
training the TPU build targets (BASELINE.md scaling points)."""

from dynamictreeattn_tpu.training.checkpoint import (
    CheckpointManager,
)
from dynamictreeattn_tpu.training.trainer import Trainer, TrainConfig
from dynamictreeattn_tpu.training.batching import TokenBudgetBatcher

__all__ = ["CheckpointManager", "Trainer", "TrainConfig", "TokenBudgetBatcher"]
