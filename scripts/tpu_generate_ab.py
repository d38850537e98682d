"""A/B flat vs grouped rollout sampling on the real chip (GRPO shapes).

Flat `generate` duplicates each prompt G times (G× prefill, G× prompt-KV
reads per decode step); `generate_grouped` prefills each prompt once and
decodes G branches against the frozen shared prompt KV.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from dynamictreeattn_tpu.models import (
    MODEL_CONFIGS,
    generate,
    generate_grouped,
    init_params,
)

print(jax.devices())
import jax.numpy as jnp

mc = MODEL_CONFIGS["qwen3-0.6b"]
params = init_params(mc, jax.random.key(0), dtype=jnp.bfloat16)

P, G, Lp, NEW = 2, 16, 1536, 384
rng = np.random.default_rng(0)
prompts = rng.integers(1, mc.vocab_size, size=(P, Lp)).astype(np.int32)
lens = np.full((P,), Lp, np.int32)
flat_prompts = np.repeat(prompts, G, axis=0)
flat_lens = np.repeat(lens, G)

print(f"P={P} G={G} Lp={Lp} new={NEW}")


def timeit(fn, reps=3):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts))


t_flat = timeit(lambda: generate(
    params, mc, flat_prompts, flat_lens, NEW, key=jax.random.key(1)))
t_grp = timeit(lambda: generate_grouped(
    params, mc, prompts, lens, G, NEW, key=jax.random.key(1)))

tok = P * G * NEW
print(f"flat:    {t_flat:.3f}s  {tok/t_flat:,.0f} sampled tok/s")
print(f"grouped: {t_grp:.3f}s  {tok/t_grp:,.0f} sampled tok/s")
print(f"speedup: {t_flat/t_grp:.2f}x")

# greedy cross-implementation check on the real chip. At bf16 the two
# samplers associate reductions differently (split vs fused cache einsums),
# so near-tied argmaxes can flip and then the sequences diverge chaotically
# — exact token parity is only a contract at fp32 (tests/test_generate.py).
# Report agreement per position: it should start at 1.0 and decay, not
# start broken.
fg = generate(params, mc, flat_prompts[:G], flat_lens[:G], 16, greedy=True)
gg = generate_grouped(params, mc, prompts[:1], lens[:1], G, 16, greedy=True)
agree = (fg == gg[0]).mean(axis=0)
print(f"greedy agreement by position (bf16): {np.round(agree, 2)}")
assert agree[0] == 1.0, "first token must match (same prefill logits)"
