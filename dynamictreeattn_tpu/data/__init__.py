"""Data: synthetic trie generation + sequence IO.

The reference's benchmark dataset (tau2-16k-merged tool-call rollout tries,
reference: exp/exp_tree.py:2) is not committed there (.MISSING_LARGE_BLOBS), so
the build ships a synthetic generator with controllable prefix-sharing ratio,
depth, and branching to reproduce tau2-16k-like workloads (SURVEY.md §8)."""

from dynamictreeattn_tpu.data.synthetic import (
    synthetic_rollout_batch,
    sharing_ratio,
)

__all__ = ["synthetic_rollout_batch", "sharing_ratio"]
