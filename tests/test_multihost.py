"""Real multi-PROCESS smoke: 2 jax processes × 4 fake CPU devices = the
multi-host code path (jax.distributed.initialize, cross-process collectives,
put_global data placement) the reference never had and single-process
fake-mesh tests can't reach. The oracle is the identical step on one
process."""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step_matches_single_process():
    port = str(_free_port())
    worker = str(ROOT / "tests" / "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(ROOT),
        )
        for i in range(2)
    ]
    results = {}
    for p in procs:
        out, _ = p.communicate(timeout=420)
        assert p.returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT")][-1]
        kv = dict(tok.split("=") for tok in line.split()[1:] if "=" in tok)
        results[int(kv["proc"])] = (float(kv["loss"]), float(kv["gnorm"]))
        tline = [l for l in out.splitlines() if l.startswith("TRAINER")][-1]
        tkv = dict(tok.split("=") for tok in tline.split()[1:] if "=" in tok)
        assert tkv["descend"] == "True", tline
        results[int(kv["proc"]) + 10] = (float(tkv["l1"]), float(tkv["l2"]))
        cline = [l for l in out.splitlines() if l.startswith("CUSTOM")][-1]
        ckv = dict(tok.split("=") for tok in cline.split()[1:] if "=" in tok)
        results[int(kv["proc"]) + 20] = float(ckv["loss"])
        assert np.isfinite(results[int(kv["proc"]) + 20]), cline
    assert set(results) == {0, 1, 10, 11, 20, 21}
    # both processes agree bit-for-bit on the global loss and grad norm
    np.testing.assert_allclose(results[0], results[1], rtol=0)
    # ... and on the multihost Trainer's per-step losses
    np.testing.assert_allclose(results[10], results[11], rtol=0)
    # ... and on the custom-loss (GRPO-style) multihost step
    np.testing.assert_allclose(results[20], results[21], rtol=0)

    # single-process oracle: same tries, fake 8-device mesh
    import jax

    from dynamictreeattn_tpu.engine import EngineConfig
    from dynamictreeattn_tpu.models import Qwen3Config, init_params
    from dynamictreeattn_tpu.parallel import (
        make_mesh, make_train_step, shard_params, stack_batches,
    )
    from dynamictreeattn_tpu.tries import TokenTrie

    from helpers import random_trie_batch

    import jax.numpy as jnp

    TINY = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        head_dim=16, tie_word_embeddings=True,
    )
    ECFG = EngineConfig(
        block_q=32, block_kv=32, remat=False, attn_backend="reference",
        loss_chunk=32,
    )
    rng = np.random.default_rng(0)
    tries = [
        TokenTrie(*random_trie_batch(rng, n_seqs=6, vocab=128, max_len=20))
        for _ in range(2)
    ]
    mesh = make_mesh(dp=2, tp=2, sp=2)
    params = init_params(TINY, jax.random.key(0), dtype=jnp.float32)
    step = make_train_step(TINY, mesh, ECFG)
    batch = stack_batches(tries, ECFG, sp=2)
    loss, grads, _ = step(shard_params(params, mesh, TINY), batch.arrays)
    np.testing.assert_allclose(results[0][0], float(loss), rtol=1e-6)
