"""AOT memory-feasibility proof for Qwen3-8B/14B sharded training.

BASELINE.md config 4 asks for Qwen3-8B sharded over >1 chip. Multi-chip
hardware does not exist in this environment, but the TPU compiler does:
`jax.experimental.topologies.get_topology_desc` builds an abstract v5e/v5p
topology and `jit(step).lower(abstract args).compile()` runs the REAL
XLA:TPU pipeline — including the Pallas tree-attention kernels — and
reports per-chip `memory_analysis()` without any devices. This script
compiles the actual sharded train step (parallel/train.py) at true 8B/14B
shapes and writes the per-chip HBM table to stats/AOT_MEM_8B.txt.

Reference role: the 8B/14B rows of the reference's flagship sweep
(reference: exp/exp_tree.py:4-9), which it runs on an 80GB-class GPU; here
the question is which pod-slice shardings fit 16GB-per-chip v5e / 95GB v5p.

Run: python scripts/aot_memory_8b.py  (no TPU devices needed, ~minutes)
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamictreeattn_tpu.engine import EngineConfig
from dynamictreeattn_tpu.models import MODEL_CONFIGS
from dynamictreeattn_tpu.models.qwen3 import init_params
from dynamictreeattn_tpu.parallel.train import (
    fsdp_param_specs,
    init_opt_state,
    make_train_step,
    param_specs,
    _BATCH_FIELDS,
    _META_FIELDS,
)

GiB = 1 << 30
# HBM per chip: v5e 16 GiB, v5p 95 GiB
HBM = {"v5e": 16 * GiB, "v5p": 95 * GiB}


def _abstract(tree, specs, mesh):
    return jax.tree.map(
        lambda s, p: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, p)
        ),
        tree,
        specs,
        is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct),
    )


def _abstract_batch(dp, n, bq, bkv, slots):
    nq, nk = n // bq, n // bkv
    shp = {
        "tokens": ((dp, n), jnp.int32),
        "depth": ((dp, n), jnp.int32),
        "parent": ((dp, n), jnp.int32),
        "last_desc": ((dp, n), jnp.int32),
        "w_logprob": ((dp, n), jnp.float32),
        "w_entropy": ((dp, n), jnp.float32),
        "valid": ((dp, n), jnp.float32),
        "kv_ids": ((dp, nq, slots), jnp.int32),
        "kv_counts": ((dp, nq), jnp.int32),
        "kv_types": ((dp, nq, slots), jnp.int32),
        "q_ids": ((dp, nk, slots), jnp.int32),
        "q_counts": ((dp, nk), jnp.int32),
        "q_types": ((dp, nk, slots), jnp.int32),
        # Belady schedules for the cached fused backward (stack_batches
        # emits these for pallas batches since r5)
        "cache_actions": ((dp, nq, slots, 4), jnp.int32),
        "cache_flush": ((dp, min(16, nk), 2), jnp.int32),
    }
    assert set(shp) >= set(_BATCH_FIELDS + _META_FIELDS)
    return {k: jax.ShapeDtypeStruct(s, d) for k, (s, d) in shp.items()}


def _sharded_bytes(tree, specs, mesh):
    """Analytic per-chip bytes of a pytree under its PartitionSpecs."""
    total = 0
    for leaf, spec in zip(
        jax.tree.leaves(tree, is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct)),
        jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P)),
    ):
        denom = 1
        for axis in spec:
            if axis is None:
                continue
            for a in (axis if isinstance(axis, tuple) else (axis,)):
                denom *= mesh.shape[a]
        total += int(np.prod(leaf.shape)) * leaf.dtype.itemsize // denom
    return total


def _abstract_opt_state(optimizer, pshapes, pspecs, mesh):
    """Abstract sharded optimizer state: optax state pytrees embed subtrees
    with the params' exact tree structure (mu/nu); those get the param
    shardings, scalar leaves (step counts) are replicated."""
    oshapes = jax.eval_shape(optimizer.init, pshapes)
    ptreedef = jax.tree.structure(pshapes)

    def rec(node):
        if isinstance(node, jax.ShapeDtypeStruct):
            return jax.ShapeDtypeStruct(
                node.shape, node.dtype, sharding=NamedSharding(mesh, P())
            )
        if jax.tree.structure(node) == ptreedef:
            return _abstract(node, pspecs, mesh)
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(rec(c) for c in node))  # namedtuple
        if isinstance(node, (list, tuple)):
            return type(node)(rec(c) for c in node)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node  # EmptyState etc.

    return rec(oshapes)


def run_case(name, model, gen, topo_name, mesh_shape, axes, *, fsdp=False,
             optimizer=None, n=16384, remat_segments=0, out_lines=None):
    mc = MODEL_CONFIGS[model]
    topo = topologies.get_topology_desc(platform="tpu", topology_name=topo_name)
    n_dev = int(np.prod(mesh_shape))
    mesh = Mesh(np.array(topo.devices[:n_dev]).reshape(mesh_shape), axes)
    dp = mesh.shape["data"]
    tp = mesh.shape["model"]
    ec = EngineConfig(
        block_q=512, block_kv=512, remat=True, remat_policy="attn",
        remat_segments=remat_segments, attn_backend="pallas",
        bucketing="exact",
    )
    step = make_train_step(mc, mesh, ec, optimizer=optimizer, fsdp=fsdp)

    pshapes = jax.eval_shape(
        lambda k: init_params(mc, k, dtype=jnp.bfloat16), jax.random.key(0)
    )
    pspecs = fsdp_param_specs(mc, dp) if fsdp else param_specs(mc)
    params = _abstract(pshapes, pspecs, mesh)
    args = [params]
    if optimizer is not None:
        args.append(_abstract_opt_state(optimizer, pshapes, pspecs, mesh))
    batch = _abstract_batch(dp, n, ec.block_q, ec.block_kv, 16)
    args.append(batch)

    t0 = time.time()
    compiled = step.lower(*args).compile()
    dt = time.time() - t0
    ma = compiled.memory_analysis()
    param_b = _sharded_bytes(pshapes, pspecs, mesh)
    arg_b = ma.argument_size_in_bytes
    out_b = ma.output_size_in_bytes
    tmp_b = ma.temp_size_in_bytes
    alias_b = ma.alias_size_in_bytes
    peak = arg_b + out_b + tmp_b - alias_b
    budget = HBM[gen]
    fit = "FIT" if peak <= budget else "OOM"
    line = (
        f"{name:<34} {topo_name:<9} dp={dp} tp={tp} fsdp={int(fsdp)} "
        f"n={n} | params/chip {param_b/GiB:6.2f}  args {arg_b/GiB:6.2f}  "
        f"out {out_b/GiB:6.2f}  temp {tmp_b/GiB:6.2f}  peak {peak/GiB:6.2f} "
        f"/ {budget/GiB:.0f} GiB  -> {fit}   (compile {dt:.0f}s)"
    )
    print(line, flush=True)
    if out_lines is not None:
        out_lines.append(line)
    return fit == "FIT"


def main():
    lines = []
    hdr = ("AOT per-chip HBM accounting — real XLA:TPU compile of the sharded "
           "tree train step\n(Pallas kernels included) from abstract "
           "topologies; no devices attached.\n"
           "peak = arguments + outputs + temp - donated/aliased.\n")
    print(hdr)
    lines.append(hdr)
    adamw = optax.adamw(1e-5)
    cases = [
        # name, model, gen, topo, mesh_shape, axes, kwargs
        ("8B grads-only dp2 x tp4", "qwen3-8b", "v5e", "v5e:2x4", (2, 4),
         ("data", "model"), {}),
        ("8B grads-only dp2 x tp4 remat6", "qwen3-8b", "v5e", "v5e:2x4",
         (2, 4), ("data", "model"), {"remat_segments": 6}),
        ("8B grads-only tp8", "qwen3-8b", "v5e", "v5e:2x4", (1, 8),
         ("data", "model"), {}),
        ("8B adamw fsdp8 (dp8 x tp1)", "qwen3-8b", "v5e", "v5e:2x4", (8, 1),
         ("data", "model"), {"fsdp": True, "optimizer": adamw}),
        ("8B adamw fsdp8 remat6", "qwen3-8b", "v5e", "v5e:2x4", (8, 1),
         ("data", "model"),
         {"fsdp": True, "optimizer": adamw, "remat_segments": 6}),
        ("8B adamw fsdp4 x tp4 (16 chip)", "qwen3-8b", "v5e", "v5e:4x4", (4, 4),
         ("data", "model"), {"fsdp": True, "optimizer": adamw}),
        ("14B grads-only tp8", "qwen3-14b", "v5e", "v5e:2x4", (1, 8),
         ("data", "model"), {}),
        ("8B adamw dp2 x tp4 (v5p)", "qwen3-8b", "v5p", "v5p:2x2x2", (2, 4),
         ("data", "model"), {"optimizer": adamw}),
    ]
    only = sys.argv[1:]  # optional case-index filter, e.g. "2 3 6"
    out_path = "/root/repo/stats/AOT_MEM_8B.txt"
    done: dict[str, str] = {}
    if only and os.path.exists(out_path):
        # merge with previously-computed cases when running a subset
        for ln in open(out_path).read().splitlines():
            for cname, *_ in cases:
                if ln.startswith(cname.ljust(34)):
                    done[cname] = ln
    for idx, (name, model, gen, topo, shape, axes, kw) in enumerate(cases):
        if only and str(idx) not in only:
            continue
        try:
            ls: list[str] = []
            run_case(name, model, gen, topo, shape, axes, out_lines=ls, **kw)
            done[name] = ls[-1]
        except Exception as e:  # noqa: BLE001
            msg = f"{name:<34} ERROR {type(e).__name__}: {str(e)[:160]}"
            print(msg, flush=True)
            done[name] = msg
        # write incrementally so a timeout never loses finished cases
        with open(out_path, "w") as f:
            f.write(hdr + "\n" + "\n".join(
                done[c[0]] for c in cases if c[0] in done
            ) + "\n")
    print("\nwrote", out_path)


if __name__ == "__main__":
    main()
