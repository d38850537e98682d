"""Bisect the tree-step slowness: model-only vs loss-only vs full."""

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
from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine, pack_sequences_dense
from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params
from dynamictreeattn_tpu.models.qwen3 import forward_hidden, lm_head_weight
from dynamictreeattn_tpu.ops.losses import tree_loss_from_hidden
from dynamictreeattn_tpu.tries import TokenTrie

mc = MODEL_CONFIGS["qwen3-0.6b"]
ec = EngineConfig(block_q=256, block_kv=256, remat=True, attn_backend="pallas")
engine = TreeEngine(mc, ec)

seqs, attachs = synthetic_rollout_batch(
    seed=0, n_prompts=2, samples_per_prompt=8,
    prompt_len=(512, 1024), completion_len=(128, 768),
)
params = init_params(mc, jax.random.key(0), dtype=jnp.bfloat16)

which = sys.argv[1] if len(sys.argv) > 1 else "tree"
batch = engine.prepare(TokenTrie(seqs, attachs)) if which == "tree" else engine.prepare(
    pack_sequences_dense(seqs, attachs, pad_multiple=ec.pad_multiple))
print(which, "n_padded", batch.n_padded)


def bench(label, fn, *args):
    t0 = time.time()
    out = fn(*args)
    s = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    compile_t = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        s = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append(time.time() - t0)
    print(f"{label:28s} compile {compile_t:6.1f}s   median {np.median(ts)*1e3:8.1f}ms")


attn = engine._attn_fn(batch.last_desc, batch.meta)

model_fwd = jax.jit(lambda p: forward_hidden(p, mc, batch.tokens, batch.depth, attn, remat=ec.remat))
bench("model fwd", model_fwd, params)

def model_loss(p):
    h = forward_hidden(p, mc, batch.tokens, batch.depth, attn, remat=ec.remat)
    return jnp.sum(h.astype(jnp.float32) ** 2)

model_grad = jax.jit(jax.grad(model_loss))
bench("model fwd+bwd (h^2 loss)", model_grad, params)

hidden_const = model_fwd(params)

def loss_only(h, p):
    w = lm_head_weight(p, mc)
    loss, _ = tree_loss_from_hidden(
        h, w, batch.tokens, batch.parent, batch.w_logprob, batch.w_entropy,
        1.0, 1024)
    return loss

loss_grad = jax.jit(jax.grad(loss_only, argnums=(0, 1)))
bench("lmhead loss fwd+bwd", loss_grad, hidden_const, params)

full = jax.jit(jax.value_and_grad(
    lambda p: engine._loss(p, batch.tokens, batch.depth, batch.parent,
                           batch.last_desc, batch.w_logprob, batch.w_entropy,
                           batch.meta)[0]))
bench("full step", full, params)
