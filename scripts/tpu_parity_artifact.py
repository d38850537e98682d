"""Produce the committed grad-parity artifact (the build's counterpart of the
reference's grad/Qwen3-0.6B-TB-vs-DB-bf16.txt): tree-backward vs
dense-backward per-parameter relative gradient deviation, Qwen3-0.6B, bf16,
on the real TPU. Norms are computed on-device (grads never leave HBM)."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dynamictreeattn_tpu.data import sharing_ratio, synthetic_rollout_batch
from dynamictreeattn_tpu.engine import EngineConfig, TreeEngine, pack_sequences_dense
from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params
from dynamictreeattn_tpu.tries import TokenTrie

mc = MODEL_CONFIGS["qwen3-0.6b"]
ec = EngineConfig(block_q=256, block_kv=256, remat=True, attn_backend="pallas")

seqs, attachs = synthetic_rollout_batch(
    seed=0, n_prompts=2, samples_per_prompt=8,
    prompt_len=(512, 1024), completion_len=(128, 768),
)
engine = TreeEngine(mc, ec)
tree_batch = engine.prepare(TokenTrie(seqs, attachs))
dense_batch = engine.prepare(pack_sequences_dense(seqs, attachs, pad_multiple=ec.pad_multiple))
params = init_params(mc, jax.random.key(0), dtype=jnp.bfloat16)

loss_t, grads_t, _ = engine.loss_and_grad(params, tree_batch)
loss_d, grads_d, _ = engine.loss_and_grad(params, dense_batch)


@jax.jit
def norms(gt, gd):
    L = mc.num_hidden_layers

    def per_leaf(a, b):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        # split per layer for stacked [L, ...] leaves; whole-tensor otherwise
        if a.ndim >= 2 and a.shape[0] == L:
            axes = tuple(range(1, a.ndim))
            return (
                jnp.sqrt(jnp.sum((a - b) ** 2, axis=axes)),
                jnp.sqrt(jnp.sum(b**2, axis=axes)),
            )
        return (
            jnp.sqrt(jnp.sum((a - b) ** 2))[None],
            jnp.sqrt(jnp.sum(b**2))[None],
        )

    return jax.tree.map(per_leaf, gt, gd)


res = jax.device_get(norms(grads_t, grads_d))
flat = jax.tree_util.tree_flatten_with_path(res, is_leaf=lambda x: isinstance(x, tuple))[0]

rows = []
for path, (dn, bn) in flat:
    name = jax.tree_util.keystr(path)
    dn, bn = np.atleast_1d(dn), np.atleast_1d(bn)
    if len(dn) > 1:
        for i in range(len(dn)):
            rows.append((f"{name}[{i}]", float(dn[i] / max(bn[i], 1e-30)), float(bn[i])))
    else:
        rows.append((name, float(dn[0] / max(bn[0], 1e-30)), float(bn[0])))
rows.sort(key=lambda r: -r[1])

rels = [r for _, r, _ in rows]
header = (
    f"# Tree-backward vs dense-backward grad parity — Qwen3-0.6B, bf16, TPU v5e\n"
    f"# data: synthetic tau2-16k-like rollouts, {len(seqs)} seqs, "
    f"{sum(len(s) for s in seqs)} dense tokens, sharing={sharing_ratio(seqs):.3f}\n"
    f"# loss: tree={float(loss_t):.4f} dense={float(loss_d):.4f} "
    f"(rel diff {abs(float(loss_t)-float(loss_d))/abs(float(loss_d)):.2e})\n"
    f"# {len(rows)} params: max rel {max(rels):.4e}, median {np.median(rels):.4e}, "
    f"min {min(rels):.4e}\n"
    f"# (reference's committed artifact at the same protocol: max 1.0636e-1, "
    f"grad/Qwen3-0.6B-TB-vs-DB-bf16.txt)\n"
    f"#\n# {'param':58s} {'rel_err':>12s} {'base_norm':>12s}"
)
lines = [header] + [f"{n:60s} {r:12.4e} {b:12.4e}" for n, r, b in rows]
out = "grad/Qwen3-0.6B-TB-vs-DB-bf16.txt"
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
print("\n".join(lines[:2]))
print(f"wrote {out}: max {max(rels):.4e} median {np.median(rels):.4e}")
