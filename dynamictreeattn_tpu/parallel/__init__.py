"""Distributed execution: mesh, sharded train steps, DP load balancing.

Replaces the reference's distributed story (SURVEY.md §2.3):

* NCCL vocab-parallel loss collectives (reference: vocab_parallel.py:82-370)
  → `psum`/`pmax` over a `"model"` mesh axis inside `shard_map`;
* offline file-level DP binning run as separate processes (reference:
  data_parallel.py + exp/exp_dp.py) → real data parallelism: per-device trie
  batches with a `psum` gradient all-reduce over a `"data"` axis, fed by the
  same cost-model-balanced packing algorithms;
* host-framework FSDP/TP (implied, reference: vocab_parallel.py:406-414)
  → explicit Megatron-style tensor parallelism of every layer.
"""

from dynamictreeattn_tpu.parallel.mesh import make_mesh
from dynamictreeattn_tpu.parallel.train import (
    fsdp_dims,
    fsdp_param_specs,
    init_opt_state,
    make_train_step,
    make_forward_step,
    extract_forward,
    param_specs,
    shard_params,
    stack_batches,
    batch_partition_specs,
)
from dynamictreeattn_tpu.parallel.pipeline import (
    make_pp_train_step,
    pp_param_specs,
    shard_params_pp,
    stack_microbatches,
)
from dynamictreeattn_tpu.parallel.load_balance import (
    LB_by_n_tokens,
    LB_by_TM,
    LB_by_DFS_and_TM,
    pred_time,
    eval_bins,
)
from dynamictreeattn_tpu.parallel.time_model import TreeTimeModel

__all__ = [
    "make_mesh",
    "make_train_step",
    "make_forward_step",
    "extract_forward",
    "fsdp_dims",
    "fsdp_param_specs",
    "init_opt_state",
    "make_pp_train_step",
    "pp_param_specs",
    "shard_params_pp",
    "stack_microbatches",
    "param_specs",
    "shard_params",
    "stack_batches",
    "batch_partition_specs",
    "LB_by_n_tokens",
    "LB_by_TM",
    "LB_by_DFS_and_TM",
    "pred_time",
    "eval_bins",
    "TreeTimeModel",
]
