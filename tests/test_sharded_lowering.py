"""Abstract lowering of the sharded train step at PRODUCTION model scale.

Qwen3-8B/14B cannot run on the CPU test host, but `jit(...).lower()` with
abstract inputs validates the whole sharded program — shapes, shardings,
collectives, divisibility — without allocating memory. This is the test for
BASELINE.md config 4 ("Qwen3-8B sharded, model > 1 chip")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

from dynamictreeattn_tpu.engine import EngineConfig
from dynamictreeattn_tpu.models import MODEL_CONFIGS
from dynamictreeattn_tpu.models.qwen3 import init_params
from dynamictreeattn_tpu.parallel import make_mesh, param_specs
from dynamictreeattn_tpu.parallel.train import (
    _BATCH_FIELDS,
    _META_FIELDS,
    make_train_step,
)


def _abstract_params(mc, mesh):
    shapes = jax.eval_shape(
        lambda k: init_params(mc, k, dtype=jnp.bfloat16), jax.random.key(0)
    )
    specs = param_specs(mc)
    return jax.tree.map(
        lambda s, p: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, p)
        ),
        shapes,
        specs,
        is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct),
    )


def _abstract_batch(mesh, dp, n, nq, nk, slots):
    def arr(shape, dtype=jnp.int32):
        return jax.ShapeDtypeStruct(shape, dtype)

    batch = {
        "tokens": arr((dp, n)),
        "depth": arr((dp, n)),
        "parent": arr((dp, n)),
        "last_desc": arr((dp, n)),
        "w_logprob": arr((dp, n), jnp.float32),
        "w_entropy": arr((dp, n), jnp.float32),
        "valid": arr((dp, n), jnp.float32),
        "kv_ids": arr((dp, nq, slots)),
        "kv_counts": arr((dp, nq)),
        "kv_types": arr((dp, nq, slots)),
        "q_ids": arr((dp, nk, slots)),
        "q_counts": arr((dp, nk)),
        "q_types": arr((dp, nk, slots)),
    }
    assert set(batch) == set(_BATCH_FIELDS + _META_FIELDS)
    return batch


@pytest.mark.parametrize("model,dp,tp", [
    ("qwen3-8b", 2, 4),
    ("qwen3-14b", 1, 8),
])
def test_sharded_step_lowers_at_scale(model, dp, tp):
    mc = MODEL_CONFIGS[model]
    mesh = make_mesh(dp=dp, tp=tp)
    # reference attention: Pallas kernels cannot lower for the CPU test mesh;
    # at-scale kernel execution is covered by the on-TPU scripts
    ec = EngineConfig(block_q=256, block_kv=256, remat=True, attn_backend="reference")
    step = make_train_step(mc, mesh, ec)
    n = 16384  # tau2-16k scale
    nq = nk = n // 256
    params = _abstract_params(mc, mesh)
    batch = _abstract_batch(mesh, dp, n, nq, nk, 16)
    lowered = step.lower(params, batch)  # traces + SPMD-partitions, no memory
    text = lowered.as_text()
    assert "all_reduce" in text  # model/data-axis collectives present
    assert f"num_partitions = {dp * tp}" in text
