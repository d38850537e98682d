"""Break down grouped-decode step time on the real chip (ablation timing)."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params
from dynamictreeattn_tpu.models.generate import _decode_step_grouped
from dynamictreeattn_tpu.models.qwen3 import lm_head_weight

print(jax.devices(), flush=True)
mc = MODEL_CONFIGS["qwen3-0.6b"]
params = init_params(mc, jax.random.key(0), dtype=jnp.bfloat16)

P, G, Lp, NEW = 2, 16, 1536, 384
c = mc
ckp = jnp.zeros((c.num_hidden_layers, P, c.num_key_value_heads, Lp, c.head_dim), jnp.bfloat16)
cvp = jnp.zeros_like(ckp)
ckc0 = jnp.zeros((c.num_hidden_layers, P, G, c.num_key_value_heads, NEW, c.head_dim), jnp.bfloat16)
cvc0 = jnp.zeros_like(ckc0)
plens = jnp.full((P,), Lp, jnp.int32)

STEPS = 32


def bench(name, fn, *args):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else fn(*args).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name}: {np.median(ts)/STEPS*1e3:.2f} ms/step", flush=True)


@jax.jit
def full(tok, ckc, cvc):
    def body(carry, t):
        tok, ckc, cvc = carry
        logits, ckc, cvc = _decode_step_grouped(params, c, tok, plens, t, ckp, cvp, ckc, cvc)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, ckc, cvc), ()
    (tok, ckc, cvc), _ = jax.lax.scan(body, (tok, ckc, cvc), jnp.arange(STEPS))
    return tok


tok = jnp.ones((P, G), jnp.int32)
bench("full step", full, tok, ckc0, cvc0)


# no LM head: does the [PG, V] head matmul matter?
@jax.jit
def no_head(tok, ckc, cvc):
    from dynamictreeattn_tpu.models.generate import _layer_step_grouped
    from dynamictreeattn_tpu.models.qwen3 import rms_norm, rope_tables

    def step(x_tok, ckc, cvc, t):
        x = jnp.take(params["embed"], x_tok, axis=0)
        cos, sin = rope_tables(plens + t, c.head_dim, c.rope_theta, c.rope_scaling_tuple)
        def scan_fn(x, inp):
            lp, kp, vp, kc, vc = inp
            f = lambda xg, cg, sg, pl, kp1, vp1, kc1, vc1: _layer_step_grouped(
                xg, lp, cg[None], sg[None], kp1, vp1, kc1, vc1, t, pl, c)
            x, kc, vc = jax.vmap(f)(x, cos, sin, plens, kp, vp, kc, vc)
            return x, (kc, vc)
        x, (kcs, vcs) = jax.lax.scan(scan_fn, x, (params["layers"], ckp, cvp, ckc, cvc))
        return x, kcs, vcs

    def body(carry, t):
        tok, ckc, cvc = carry
        x, ckc, cvc = step(tok, ckc, cvc, t)
        nxt = (tok + 1) % 100
        return (nxt, ckc, cvc), ()
    (tok, ckc, cvc), _ = jax.lax.scan(body, (tok, ckc, cvc), jnp.arange(STEPS))
    return tok


bench("no lm head", no_head, tok, ckc0, cvc0)


# params only: a matvec through every weight, no caches/attn — the HBM
# bandwidth floor for decode
@jax.jit
def params_only(x):
    def body(x, _):
        def lf(x, lp):
            q = x @ lp["wq"]            # [B, hq*dh]
            k = x @ lp["wk"]            # [B, hkv*dh]
            v = x @ lp["wv"]
            o = q @ lp["wo"]            # [B, d]
            kvd = (k + v) @ lp["wk"].T  # project back (touches wk twice, ok)
            g = jax.nn.silu((x @ lp["gate"]).astype(jnp.float32)).astype(x.dtype)
            m = (g * (x @ lp["up"])) @ lp["down"]
            return x + o + m + kvd, ()
        x, _ = jax.lax.scan(lf, x, params["layers"])
        lg = x @ lm_head_weight(params, c)  # [B, V]
        x = x + jnp.sum(lg, axis=-1, keepdims=True).astype(x.dtype)
        return x, ()
    x, _ = jax.lax.scan(body, x, jnp.arange(STEPS))
    return x


x0 = jnp.ones((P * G, c.hidden_size), jnp.bfloat16)
bench("params-touch only", params_only, x0)
