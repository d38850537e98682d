"""TPU compute ops: tree-attention kernels and fused losses.

These replace the native compute the reference delegates to external CUDA deps
(SURVEY.md §2.2): FlashAttention-3 → the Pallas tree-masked flash kernel;
torch.compile'd logprob/entropy math → fused JAX losses; NCCL all_reduce →
vocab-parallel collectives (see parallel/)."""

from dynamictreeattn_tpu.ops.tree_attention_ref import tree_attention_reference
from dynamictreeattn_tpu.ops.tree_attention import tree_attention, BlockSizes
from dynamictreeattn_tpu.ops.losses import (
    logprob_entropy_from_hidden,
    tree_loss_from_hidden,
)

__all__ = [
    "tree_attention_reference",
    "tree_attention",
    "BlockSizes",
    "logprob_entropy_from_hidden",
    "tree_loss_from_hidden",
]
