"""Hypothesis test: is grouped-decode step time dominated by KV-cache
copies (DUS through the layer-scan stacked outputs) rather than real reads?

Variant A: current _decode_step_grouped (caches updated per layer).
Variant B: same attention reads, but caches are READ-ONLY (no DUS, no
stacked outputs) — bounds the true bandwidth cost of the step.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params
from dynamictreeattn_tpu.models.generate import (
    _decode_step_grouped,
    _layer_step_grouped,
)
from dynamictreeattn_tpu.models.qwen3 import rms_norm, rope_tables, lm_head_weight

print(jax.devices(), flush=True)
mc = MODEL_CONFIGS["qwen3-0.6b"]
params = init_params(mc, jax.random.key(0), dtype=jnp.bfloat16)
c = mc

P, G, Lp, NEW = 2, 16, 1536, 384
ckp = jnp.zeros((c.num_hidden_layers, P, c.num_key_value_heads, Lp, c.head_dim), jnp.bfloat16)
cvp = jnp.zeros_like(ckp)
ckc0 = jnp.zeros((c.num_hidden_layers, P, G, c.num_key_value_heads, NEW, c.head_dim), jnp.bfloat16)
cvc0 = jnp.zeros_like(ckc0)
plens = jnp.full((P,), Lp, jnp.int32)
STEPS = 32


def timeit(fn, *args):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return np.median(ts) / STEPS * 1e3


@jax.jit
def variant_a(tok, ckc, cvc):
    def body(carry, t):
        tok, ckc, cvc = carry
        logits, ckc, cvc = _decode_step_grouped(params, c, tok, plens, t, ckp, cvp, ckc, cvc)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, ckc, cvc), ()
    (tok, ckc, cvc), _ = jax.lax.scan(body, (tok, ckc, cvc), jnp.arange(STEPS))
    return tok


@jax.jit
def variant_b(tok, ckc, cvc):
    def step(x_tok, t):
        x = jnp.take(params["embed"], x_tok, axis=0)
        cos, sin = rope_tables(plens + t, c.head_dim, c.rope_theta, c.rope_scaling_tuple)

        def scan_fn(x, inp):
            lp, kp, vp, kc, vc = inp

            def per_prompt(xg, cg, sg, pl, kp1, vp1, kc1, vc1):
                xo, _, _ = _layer_step_grouped(
                    xg, lp, cg[None], sg[None], kp1, vp1, kc1, vc1, t, pl, c)
                return xo

            x = jax.vmap(per_prompt)(x, cos, sin, plens, kp, vp, kc, vc)
            return x, ()

        x, _ = jax.lax.scan(scan_fn, x, (params["layers"], ckp, cvp, ckc, cvc))
        hidden = rms_norm(x, params["final_norm"], c.rms_norm_eps)
        return jnp.dot(hidden, lm_head_weight(params, c), preferred_element_type=jnp.float32)

    def body(tok, t):
        logits = step(tok, t)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), ()

    tok, _ = jax.lax.scan(body, tok, jnp.arange(STEPS))
    return tok


tok = jnp.ones((P, G), jnp.int32)
print(f"A (cache updates): {timeit(variant_a, tok, ckc0, cvc0):.2f} ms/step", flush=True)
print(f"B (read-only):     {timeit(variant_b, tok, ckc0, cvc0):.2f} ms/step", flush=True)
