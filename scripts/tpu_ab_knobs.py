"""A/B test engine knobs on the real chip: remat policy, loss chunk, blocks."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.data import synthetic_rollout_batch
from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine
from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params
from dynamictreeattn_tpu.tries import TokenTrie

mc = MODEL_CONFIGS["qwen3-0.6b"]
seqs, attachs = synthetic_rollout_batch(
    seed=0, n_prompts=2, samples_per_prompt=16,
    prompt_len=(1024, 2048), completion_len=(128, 512), branch_prob=0.85,
)
n_dense = sum(len(s) for s in seqs)
params = init_params(mc, jax.random.key(0), dtype=jnp.bfloat16)


def bench(tag, ec):
    engine = TreeEngine(mc, ec)
    batch = engine.prepare(TokenTrie(seqs, attachs))
    t0 = time.time()
    out = engine.loss_and_grad(params, batch)
    float(out[0])
    compile_t = time.time() - t0
    ts = []
    for _ in range(4):
        t0 = time.time()
        out = engine.loss_and_grad(params, batch)
        float(out[0])
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    print(f"{tag:44s} {dt*1e3:8.1f}ms  ({n_dense/dt:,.0f} tok/s)  "
          f"[compile {compile_t:.0f}s, n_pad {batch.n_padded}]", flush=True)


cases = sys.argv[1:] or ["base", "chunk4096"]
for case in cases:
    if case == "base":
        bench("base (remat, chunk1024, 256/256)", EngineConfig())
    elif case == "remat_dots":
        bench("remat policy=dots", EngineConfig(remat_policy="dots"))
    elif case == "remat_attn":
        bench("remat policy=attn", EngineConfig(remat_policy="attn"))
    elif case == "remat_attn_dots":
        bench("remat policy=attn_dots", EngineConfig(remat_policy="attn_dots"))
    elif case == "attn_c2048":
        bench("attn, chunk 2048", EngineConfig(
            block_q=512, block_kv=512, remat_policy="attn", loss_chunk=2048))
    elif case == "attn_c4096":
        bench("attn, chunk 4096", EngineConfig(
            block_q=512, block_kv=512, remat_policy="attn", loss_chunk=4096))
    elif case == "attn_c512":
        bench("attn, chunk 512", EngineConfig(
            block_q=512, block_kv=512, remat_policy="attn", loss_chunk=512))
    elif case == "attn256":
        bench("remat policy=attn, 256/256",
              EngineConfig(block_q=256, block_kv=256, remat_policy="attn"))
    elif case == "attn768":
        bench("remat policy=attn, 768/768",
              EngineConfig(block_q=768, block_kv=768, remat_policy="attn"))
    elif case == "attn512_1024":
        bench("remat policy=attn, 512/1024",
              EngineConfig(block_q=512, block_kv=1024, remat_policy="attn"))
    elif case == "attn1024_1024":
        bench("remat policy=attn, 1024/1024",
              EngineConfig(block_q=1024, block_kv=1024, remat_policy="attn"))
    elif case == "attn512_2048":
        bench("remat policy=attn, 512/2048",
              EngineConfig(block_q=512, block_kv=2048, remat_policy="attn"))
    elif case == "attn1024_512":
        bench("remat policy=attn, 1024/512",
              EngineConfig(block_q=1024, block_kv=512, remat_policy="attn"))
    elif case == "base512":
        bench("base (remat, chunk1024, 512/512)",
              EngineConfig(block_q=512, block_kv=512))
    elif case == "attn512":
        bench("remat policy=attn, 512/512",
              EngineConfig(block_q=512, block_kv=512, remat_policy="attn"))
    elif case == "attn_dots512":
        bench("remat policy=attn_dots, 512/512",
              EngineConfig(block_q=512, block_kv=512, remat_policy="attn_dots"))
    elif case == "no_remat":
        bench("no remat", EngineConfig(remat=False))
    elif case == "chunk4096":
        bench("loss_chunk=4096", EngineConfig(loss_chunk=4096))
    elif case == "bkv1024":
        bench("block 512/1024", EngineConfig(block_kv=1024))
    elif case == "bq1024":
        bench("block 1024/512", EngineConfig(block_q=1024))
    elif case == "b1024":
        bench("block 1024/1024", EngineConfig(block_q=1024, block_kv=1024))
