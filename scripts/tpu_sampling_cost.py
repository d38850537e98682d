"""Decode-time cost of the sampling logit filters (ops/sampling.py).

Times filter_logits at GRPO decode shapes ([32, 151936] fp32 logits) per
filter and combined, plus the end-to-end rollout delta: generate_grouped
with and without top-p at the PERF.md rollout shape (P=2 x G=16, 1536-token
prompts, 384 new tokens).
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

# The measurement is the END-TO-END rollout delta below — an isolated
# scan-microbench of filter_logits reports ~0 (XLA hoists/elides parts of
# the repeated filter); the in-decode cost is what matters anyway.

# ---- end-to-end rollout delta
from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params
from dynamictreeattn_tpu.models.generate import generate_grouped

mc = MODEL_CONFIGS["qwen3-0.6b"]
params = init_params(mc, jax.random.key(0), dtype=jnp.bfloat16)
P, G, LP, NEW = 2, 16, 1536, 384
prompts = np.random.default_rng(0).integers(1, mc.vocab_size, (P, LP)).astype(np.int32)
lens = np.full((P,), LP, np.int32)

for tag, kw in (("plain", {}), ("top_p=0.95", {"top_p": 0.95}),
                ("k50+p0.95", {"top_k": 50, "top_p": 0.95})):
    generate_grouped(params, mc, prompts, lens, G, NEW, **kw)  # compile
    ts = []
    for _ in range(3):
        t0 = time.time()
        generate_grouped(params, mc, prompts, lens, G, NEW, **kw)
        ts.append(time.time() - t0)
    dt = np.median(ts)
    print(f"rollout[{tag:<12}] {dt:6.3f} s  "
          f"{P * G * NEW / dt:7.0f} sampled tok/s")
