"""Worker for the 2-process multi-host smoke test (spawned by
tests/test_multihost.py). Each process owns 4 fake CPU devices; the global
mesh is dp=2 × tp=2 (8 devices); process r hosts data rank r. Runs ONE full
sharded train step (vocab-parallel loss, grad psums riding the cross-process
'ICI') and prints the loss."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

proc_id = int(sys.argv[1])
port = sys.argv[2]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2,
    process_id=proc_id,
)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

from helpers import random_trie_batch

from dynamictreeattn_tpu.engine import EngineConfig
from dynamictreeattn_tpu.models import Qwen3Config, init_params
from dynamictreeattn_tpu.parallel import (
    batch_partition_specs,
    make_mesh,
    make_train_step,
    param_specs,
    stack_batches,
)
from dynamictreeattn_tpu.parallel.distributed import (
    local_data_ranks,
    put_global,
)
from dynamictreeattn_tpu.tries import TokenTrie

TINY = Qwen3Config(
    vocab_size=128, hidden_size=64, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
    head_dim=16, tie_word_embeddings=True,
)
ECFG = EngineConfig(
    block_q=32, block_kv=32, remat=False, attn_backend="reference",
    loss_chunk=32,
)

assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
mesh = make_mesh(dp=2, tp=2, sp=2)

# deterministic global batch: every process computes the SAME tries/arrays
rng = np.random.default_rng(0)
tries = [
    TokenTrie(*random_trie_batch(rng, n_seqs=6, vocab=TINY.vocab_size, max_len=20))
    for _ in range(2)
]
batch = stack_batches(tries, ECFG, sp=2)
batch_global = put_global(
    batch.arrays,
    mesh,
    {f: batch_partition_specs(sp=2)[f] for f in batch.arrays},
)

params = init_params(TINY, jax.random.key(0), dtype=jnp.float32)
params_global = put_global(params, mesh, param_specs(TINY))

step = make_train_step(TINY, mesh, ECFG)
loss, grads, aux = step(params_global, batch_global)
gnorm = float(jax.jit(
    lambda g: sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree.leaves(g))
)(grads) ** 0.5)
print(f"RESULT proc={jax.process_index()} ranks={local_data_ranks(mesh)} "
      f"loss={float(loss):.6f} gnorm={gnorm:.6f}", flush=True)

# ---- second leg: the Trainer in multihost mode (put_global placement,
# deterministic global binning on every process, optax update across hosts)
from dynamictreeattn_tpu.training import TrainConfig, Trainer

tc = TrainConfig(dp=2, tp=2, sp=2, learning_rate=1e-3, param_dtype="fp32",
                 lb_block_size=32, multihost=True)
tr = Trainer(TINY, ECFG, tc, mesh=mesh)
tr.init(seed=0)
seqs = [s for t in tries for s in t.inputs]
attachs = [{} for _ in seqs]
h1 = tr.train_step(seqs, attachs)
h2 = tr.train_step(seqs, attachs)
print(f"TRAINER proc={jax.process_index()} l1={h1['loss']:.6f} "
      f"l2={h2['loss']:.6f} descend={h2['loss'] < h1['loss']}", flush=True)

# ---- third leg: custom per-sequence loss UNDER multihost (regression for
# the r1 KeyError: batch_partition_specs must cover seq_paths/seq_lens/x_*)
def _clip_loss(lp, ent, extras, length):
    m = (jnp.arange(lp.shape[0]) < length - 1).astype(jnp.float32)
    ratio = jnp.exp(lp - extras["behavior_lp"][: lp.shape[0]])
    adv = extras["adv"]
    clipped = jnp.minimum(ratio * adv, jnp.clip(ratio, 0.8, 1.2) * adv)
    return -jnp.sum(clipped * m) / jnp.maximum(length - 1, 1)


tc_c = TrainConfig(dp=4, tp=2, learning_rate=1e-3, param_dtype="fp32",
                   lb_block_size=32, multihost=True)
tr_c = Trainer(TINY, ECFG, tc_c, mesh=make_mesh(dp=4, tp=2),
               custom_loss=_clip_loss,
               extras_spec={"behavior_lp": 1, "adv": 0})
tr_c.init(seed=0)
rng_e = np.random.default_rng(3)
extras = {
    "behavior_lp": [rng_e.normal(size=len(s) - 1).astype(np.float32)
                    for s in seqs],
    "adv": rng_e.normal(size=len(seqs)).astype(np.float32),
}
c1 = tr_c.train_step(seqs, attachs, extras=extras)
print(f"CUSTOM proc={jax.process_index()} loss={c1['loss']:.6f}", flush=True)
