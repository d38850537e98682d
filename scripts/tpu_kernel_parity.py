"""Kernel-level parity artifact: all 6 softmax x backward mode combos
(online/bound x split/fused/cached) vs the dense-mask jnp reference, real
Pallas kernels on the real TPU, bf16.

The committed output (grad/kernel-parity-bf16.txt) is the kernel-level
counterpart of the end-to-end grad table (grad/Qwen3-0.6B-TB-vs-DB-bf16.txt),
mirroring the reference's practice of committing its parity evidence
(reference: grad/Qwen3-0.6B-TB-vs-DB-bf16.txt). A RUN_TPU=1-gated pytest
(tests/test_tree_attention.py::test_tpu_kernel_parity_6combo) runs this
script with --check.

Usage: python scripts/tpu_kernel_parity.py [--check]
  --check: assert thresholds, write nothing (exit nonzero on failure).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.ops import BlockSizes, tree_attention_reference
from dynamictreeattn_tpu.ops.tree_attention import tree_attention
from helpers import random_packed

CHECK = "--check" in sys.argv
# bf16 tolerance: worst measured 6.3e-3 (fwd max-abs) / 5.6e-3 (grad rel fro)
FWD_TOL = 0.05
GRAD_TOL = 2e-2

rng = np.random.default_rng(0)
block, n, dh = 512, 4096, 128
hq, hkv = 16, 8
_, _, packed, meta = random_packed(rng, n, block, n_seqs=48, vocab=1000,
                                   max_len=640)
key = jax.random.key(0)
kq, kk, kv_, kc = jax.random.split(key, 4)
dtype = jnp.bfloat16
q = jax.random.normal(kq, (hq, n, dh), dtype=dtype)
k = jax.random.normal(kk, (hkv, n, dh), dtype=dtype)
v = jax.random.normal(kv_, (hkv, n, dh), dtype=dtype)
cot = jax.random.normal(kc, (hq, n, dh), dtype=dtype)
ld = jnp.asarray(packed.last_desc)
margs = tuple(jnp.asarray(x) for x in (
    meta.kv_ids, meta.kv_counts, meta.kv_types,
    meta.q_ids, meta.q_counts, meta.q_types))
bs = BlockSizes(block, block)

ref_o = tree_attention_reference(q, k, v, ld)


def ref_grads(q, k, v):
    def f(q, k, v):
        return jnp.sum(
            (tree_attention_reference(q, k, v, ld) * cot).astype(jnp.float32)
        )
    return jax.grad(f, argnums=(0, 1, 2))(q, k, v)


gr = jax.jit(ref_grads)(q, k, v)
gr_norm = [float(jnp.linalg.norm(g.astype(jnp.float32))) for g in gr]

rows = []
worst_fwd = worst_grad = 0.0
from dynamictreeattn_tpu.tries import build_bwd_cache_sched

_sched = build_bwd_cache_sched(meta, 16)
_sched_args = (jnp.asarray(_sched.actions), jnp.asarray(_sched.flush))

for softmax_mode in ("online", "bound"):
    for bwd_mode in ("split", "fused", "cached"):

        @jax.jit
        def run_grads(q, k, v, sm=softmax_mode, bm=bwd_mode):
            def f(q, k, v):
                o = tree_attention(
                    q, k, v, ld, *margs, block_sizes=bs,
                    softmax_mode=sm, bwd_mode=bm,
                    cache_sched=_sched_args if bm == "cached" else None,
                )
                return jnp.sum((o * cot).astype(jnp.float32))
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        @jax.jit
        def run_fwd(q, k, v, sm=softmax_mode):
            return tree_attention(q, k, v, ld, *margs, block_sizes=bs,
                                  softmax_mode=sm)

        o = run_fwd(q, k, v)
        fwd_err = float(jnp.max(jnp.abs(
            o.astype(jnp.float32) - ref_o.astype(jnp.float32))))
        gk = run_grads(q, k, v)
        rels = []
        for a, b, bn_ in zip(gk, gr, gr_norm):
            d = float(jnp.linalg.norm(
                (a.astype(jnp.float32) - b.astype(jnp.float32))))
            rels.append(d / max(bn_, 1e-30))
        worst_fwd = max(worst_fwd, fwd_err)
        worst_grad = max(worst_grad, *rels)
        rows.append((softmax_mode, bwd_mode, fwd_err, *rels))
        print(f"{softmax_mode:7s}/{bwd_mode:5s}: fwd max abs {fwd_err:.4e}  "
              f"dq {rels[0]:.4e}  dk {rels[1]:.4e}  dv {rels[2]:.4e}")

ok = worst_fwd <= FWD_TOL and worst_grad <= GRAD_TOL
print(f"worst: fwd {worst_fwd:.4e} (tol {FWD_TOL}), "
      f"grad rel {worst_grad:.4e} (tol {GRAD_TOL}) -> {'OK' if ok else 'FAIL'}")

if not CHECK:
    dev = jax.devices()[0]
    lines = [
        "# Pallas tree-attention kernel parity vs dense-mask jnp reference "
        "— bf16, real TPU",
        f"# device: {dev.device_kind}; trie: n={n} (packed "
        f"{packed.n_tokens}), hq/hkv={hq}/{hkv}, dh={dh}, blocks "
        f"{block}/{block}, active pairs "
        f"{int(np.sum(meta.kv_types > 0))}/{meta.kv_ids.size}",
        "# grads via jax.grad of sum(o*cot); rel = ||delta g||_F / "
        "||g_ref||_F per operand",
        "# (e2e counterpart: grad/Qwen3-0.6B-TB-vs-DB-bf16.txt; reference's "
        "own bar at bf16: 1.06e-1)",
        "#",
        f"# {'softmax':8s} {'bwd':6s} {'fwd_max_abs':>12s} {'dq_rel':>10s} "
        f"{'dk_rel':>10s} {'dv_rel':>10s}",
    ]
    for sm, bm, fe, dq, dk, dv in rows:
        lines.append(f"{sm:10s} {bm:6s} {fe:12.4e} {dq:10.4e} {dk:10.4e} "
                     f"{dv:10.4e}")
    lines.append(f"# worst fwd {worst_fwd:.4e}, worst grad rel "
                 f"{worst_grad:.4e}")
    out = os.path.join(REPO, "grad", "kernel-parity-bf16.txt")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")

sys.exit(0 if ok else 1)
