"""Per-kernel time breakdown of the engine train step via xplane traces.

Usage: python scripts/tpu_step_profile.py [split|fused] ...
Traces 3 engine steps per requested bwd_mode and prints the top ops by
total device time, plus buckets (tree kernels / matmul fusions / other).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import collections
import dataclasses
import glob
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.data import synthetic_rollout_batch
from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine
from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params
from dynamictreeattn_tpu.tries import TokenTrie


def device_op_times(logdir, with_flops=False):
    """Sum device "XLA Ops" event durations by op name from xplane.pb,
    excluding control-flow wrapper events (%while/%cond span their bodies).
    with_flops=True additionally returns (total_flops, name->category)."""
    try:
        from xprof.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                            recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    totals = collections.Counter()
    flops_total = 0
    cats = {}
    for plane in xs.planes:
        if plane.name != "/device:TPU:0":
            continue
        smeta = {m.id: m.name for m in plane.stat_metadata.values()}
        emeta = {}
        for m in plane.event_metadata.values():
            st = {smeta.get(s.metadata_id): s for s in m.stats}
            fl = st.get("flops")
            cat = st.get("hlo_category")
            src = st.get("source")
            emeta[m.id] = (
                m.name,
                fl.int64_value or fl.uint64_value if fl else 0,
                (cat.str_value if cat else "?")
                + ("|loss" if src and "losses.py" in src.str_value else ""),
            )
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name, fl, cat = emeta.get(ev.metadata_id, ("?", 0, "?"))
                opname = name.split(" = ")[0]
                if opname.startswith("%while") or opname.startswith("%cond"):
                    continue
                totals[name] += ev.duration_ps / 1e9
                flops_total += fl
                cats[name] = cat
    if with_flops:
        return totals, flops_total, cats
    return totals  # full op text -> ms summed


def main():
    modes = sys.argv[1:] or ["split", "fused"]
    mc = MODEL_CONFIGS[os.environ.get("DTA_BENCH_MODEL", "qwen3-0.6b")]
    seqs, attachs = synthetic_rollout_batch(
        seed=0, n_prompts=int(os.environ.get("DTA_PROF_PROMPTS", "1")),
        samples_per_prompt=16,
        prompt_len=(1024, 2048), completion_len=(128, 512), branch_prob=0.85,
    )
    params = init_params(mc, jax.random.key(0), dtype=jnp.bfloat16)
    base = EngineConfig(bucketing="exact", remat_policy="attn")
    for mode in modes:
        eng = TreeEngine(mc, dataclasses.replace(base, bwd_mode=mode))
        b = eng.prepare(TokenTrie(seqs, attachs))
        out = eng.loss_and_grad(params, b)
        float(out[0]); del out
        logdir = f"/tmp/xprof_{mode}"
        with jax.profiler.trace(logdir):
            for _ in range(3):
                out = eng.loss_and_grad(params, b)
                float(out[0]); del out
        totals, flops, cats = device_op_times(logdir, with_flops=True)
        n_steps = 3
        buckets = collections.Counter()
        for name, ms in totals.items():
            opname = name.split(" = ")[0]
            cat = cats.get(name, "other")
            if "tree_attention" in opname or "qk_prep" in opname:
                buckets["kernel:" + opname.lstrip("%").split(".")[0]] += ms
            elif cat.endswith("|loss"):
                buckets["xla:loss"] += ms
            elif cat in ("convolution fusion", "convolution"):
                buckets["xla:matmul"] += ms
            elif "copy" in opname:
                buckets["xla:copy"] += ms
            else:
                buckets["xla:" + cat] += ms
        total = sum(totals.values())
        print(f"\n== {mode}: device total {total/n_steps:.1f} ms/step; "
              f"xla-counted {flops/n_steps/1e12:.2f} TFLOP/step "
              f"-> {flops/1e12/(total/1e3):.1f} TFLOP/s (+ kernel flops, "
              f"not xla-counted)")
        for k, v in buckets.most_common():
            print(f"  {k:<26} {v/n_steps:8.2f} ms/step")
        print("  top ops:")
        for name, ms in totals.most_common(12):
            print(f"    {ms/n_steps:8.2f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
