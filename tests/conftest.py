"""Test config: run everything on a fake 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py, never in tests. Env vars must be set
before jax initializes, hence here at conftest import time.
"""

import os

# Hard override: the session env pre-sets JAX_PLATFORMS=axon (the tunneled
# TPU); tests must run on local CPU with fake devices.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent compilation cache: interpret-mode Pallas compiles are slow (~1min)
# but fully cacheable across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# This JAX build defaults f32 matmuls to bf16 MXU passes (TPU convention) even
# on CPU; parity oracles need true f32 matmuls.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# The axon sitecustomize force-registers the tunneled TPU regardless of
# JAX_PLATFORMS; the config knob wins. Tests must run on local CPU.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---------------------------------------------------------------- slow lane
# The exhaustive parallelism / HF-parity / CLI matrix takes ~14 min of
# fake-mesh shard_map compiles; the default run deselects it (pytest.ini
# addopts) to keep the pre-commit gate ~6 min. Centralized here instead
# of per-test decorators so the fast/slow split is one reviewable list.
# Matching is substring-on-nodeid. The fast lane intentionally keeps one
# representative per subsystem (e.g. sharded_step[2-1], ring [2-...],
# moe_expert_parallel[2-1]).
_SLOW_NODEIDS = (
    "test_multihost.py",                      # real 2-process bring-up
    "test_greedy_generate_matches_hf",        # HF sampling parity, ~40s each
    "test_train_cli_with_resume",
    "test_run_all_and_dp_pipeline",
    "test_warmup_cli",
    "test_run_grad_parity_via_cli",
    "test_ring_reference_matches_full[4",     # sp=4 ring cases (keep sp=2)
    "test_pipeline_step_matches_single_device[2-2-2-2]",
    "test_pipeline_step_matches_single_device[1-2-2-2]",
    "test_pipeline_step_matches_single_device[1-2-1-3]",
    "test_sharded_step_matches_single_device[2-2]",
    "test_sharded_step_matches_single_device[4-2]",
    "test_ring_seq_parallel_step_matches_single_device",
    "test_seq_parallel_step_matches_single_device",
    "test_seq_parallel_with_fsdp",
    "test_sharded_custom_loss_matches_engine",
    "test_fsdp_optimizer_state_is_sharded",
    "test_pipeline_optimizer_descends",
    "test_moe_pipeline_matches_single_device",
    "test_moe_ep_a2a_matches_single_device[4-2]",
    "test_moe_ep_a2a_matches_single_device[2-2]",
    "test_moe_expert_parallel_matches_single_device[2-2]",
    "test_moe_expert_parallel_matches_single_device[1-2]",
    "test_moe_ulysses_sp_matches_single_device",
    "test_checkpoint_save_restore_roundtrip",
    "test_trainer_custom_grpo_loss_at_scale",
    "test_trainer_pipeline_descends",
    "test_trainer_fsdp_descends",
    "test_grad_accum_and_warmup",
    "test_vp_loss_and_grads_match_local",
    "test_remat_matches_no_remat",
    "test_sim_backward_matches_reference",
    "test_pallas_interpret_head_blocked",   # interpret-mode kernel, ~min/case
    "test_ring_seq_parallel_with_fsdp",     # ring+fsdp combo (plain fsdp and
    #                                         ring-sp each covered fast)
    "test_pipeline_1f1b_matches_single_device[1-4-1-6]",  # keep [1-2-1-3]
    "test_fsdp_step_matches_replicated[4-2]",             # keep [2-2]
    "test_sim_bound_softmax_matches_reference[1]",        # keep seed 0
    "test_qkv_prep_grads_match_reference[False]",  # keep the qk-norm variant
)


def _is_full_suite_run(config) -> bool:
    """True when collection targets the whole tests dir (no explicit file /
    nodeid args) — the only case where lane bookkeeping should apply."""
    args = config.args or []
    return all(
        os.path.basename(os.path.normpath(a)) in ("tests", "repo") for a in args
    )


def pytest_report_header(config):
    if "not slow" in (config.option.markexpr or ""):
        return (
            'slow lane deselected (pytest.ini addopts -m "not slow"); '
            'RUN_SLOW=1 or -m "" includes it'
        )


def pytest_collection_modifyitems(config, items):
    full_run = _is_full_suite_run(config)
    if full_run:
        # guard against _SLOW_NODEIDS rot: a renamed test silently falling
        # back into the fast gate / a stale key silently matching nothing
        stale = [
            key
            for key in _SLOW_NODEIDS
            if not any(key in item.nodeid for item in items)
        ]
        if stale:
            import warnings

            msg = f"_SLOW_NODEIDS entries matched no collected test: {stale}"
            if os.environ.get("RUN_SLOW"):
                raise pytest.UsageError(msg)
            warnings.warn(msg)
    if os.environ.get("RUN_SLOW"):
        config.option.markexpr = ""
        return
    if not full_run:
        # explicitly-targeted files/nodeids run regardless of lane: marking
        # them slow here would make `pytest tests/test_multihost.py` collect
        # nothing with no hint why
        return
    for item in items:
        if any(key in item.nodeid for key in _SLOW_NODEIDS):
            item.add_marker(pytest.mark.slow)
