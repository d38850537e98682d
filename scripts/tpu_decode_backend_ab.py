"""A/B the grouped-decode attention backends (xla einsums vs the pallas
decode kernel) on the real chip: greedy token parity + sampled tok/s."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.models import MODEL_CONFIGS, generate_grouped, init_params

print(jax.devices(), flush=True)
mc = MODEL_CONFIGS[os.environ.get("DTA_BENCH_MODEL", "qwen3-0.6b")]
params = init_params(mc, jax.random.key(0), dtype=jnp.bfloat16)

P, G, Lp, NEW = 2, 16, 1536, 384
rng = np.random.default_rng(0)
prompts = rng.integers(1, mc.vocab_size, size=(P, Lp)).astype(np.int32)
lens = np.full((P,), Lp, np.int32)
print(f"P={P} G={G} Lp={Lp} new={NEW}", flush=True)

toks = {}
for backend in ("xla", "pallas"):
    run = lambda b=backend: generate_grouped(
        params, mc, prompts, lens, G, NEW, key=jax.random.key(1),
        greedy=True, backend=b,
    )
    toks[backend] = run()  # compile
    ts = []
    for _ in range(3):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    tok = P * G * NEW
    print(f"{backend}: {dt:.3f}s  {tok/dt:,.0f} sampled tok/s "
          f"({dt/NEW*1e3:.2f} ms/step incl prefill)", flush=True)

match = (toks["xla"] == toks["pallas"]).mean()
print(f"greedy token match: {match:.4f}", flush=True)
