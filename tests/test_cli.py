"""End-to-end CLI smoke tests (CPU, tiny model) — the harness surface the
reference exposes (run.py / run_all.py / data_parallel.py / compare_grads /
remark / calc_time)."""

import json

import numpy as np
import pytest

from dynamictreeattn_tpu.data.io import save_sequences

from helpers import random_trie_batch

COMMON = [
    "--model", "qwen3-tiny", "--dtype", "fp32", "--attn-backend", "reference",
    "--block-q", "32", "--block-kv", "32", "--loss-chunk", "32", "--no-remat",
    "--iters", "1",
]


def _write_data(tmp_path, n_files=2, fmt=".npz"):
    rng = np.random.default_rng(0)
    files = []
    for i in range(n_files):
        seqs, _ = random_trie_batch(rng, n_seqs=6, vocab=128, max_len=20)
        f = tmp_path / f"call{i}{fmt}"
        save_sequences(str(f), seqs)
        files.append(f)
    return files


def test_run_grad_parity_via_cli(tmp_path, capsys):
    from dynamictreeattn_tpu.cli import compare_grads, run

    [f0, _] = _write_data(tmp_path)
    g_tree = tmp_path / "tree.npz"
    g_dense = tmp_path / "dense.npz"
    stats = tmp_path / "stats.jsonl"
    run.main(COMMON + ["--data", str(f0), "--run", "tree_backward",
                       "--grad-out", str(g_tree), "--stats-out", str(stats)])
    run.main(COMMON + ["--data", str(f0), "--run", "dense_backward",
                       "--grad-out", str(g_dense), "--stats-out", str(stats)])
    out = [json.loads(line) for line in capsys.readouterr().out.splitlines()
           if line.startswith("{")]
    losses = [r["loss"] for r in out if "loss" in r]
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-4)

    table = tmp_path / "table.txt"
    compare_grads.main(["--baseline-grad", str(g_dense),
                        "--exp-grad", str(g_tree), "--out", str(table)])
    tail = table.read_text().strip().splitlines()[-1]
    max_rel = float(tail.split("max")[1].split()[0])
    assert max_rel < 1e-3, tail
    # stats JSONL got both records
    recs = [json.loads(line) for line in stats.read_text().splitlines()]
    assert len(recs) == 2 and all("time" in r for r in recs)


def test_run_forward_and_synthetic(tmp_path, capsys):
    from dynamictreeattn_tpu.cli import run

    run.main(COMMON + ["--data", "synthetic:n_prompts=1,samples=3,prompt_lo=8,prompt_hi=12,completion_lo=4,completion_hi=8",
                       "--run", "tree_forward"])
    rec = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert rec["tokens_per_s"] > 0
    assert "sum_logprobs" in rec


def test_run_all_and_dp_pipeline(tmp_path, capsys):
    from dynamictreeattn_tpu.cli import calc_time, data_parallel, remark, run_all

    _write_data(tmp_path, n_files=2)
    stats = tmp_path / "stats.jsonl"
    run_all.main(COMMON + ["--data-dir", str(tmp_path), "--glob", "*.npz",
                           "--run", "tree_backward", "--stats-out", str(stats)])
    out = capsys.readouterr().out.splitlines()
    agg = json.loads(out[-1])
    assert agg["aggregate"] and agg["tokens_per_s"] > 0

    # remark: recompute features
    remarked = tmp_path / "stats.re.jsonl"
    remark.main(["--stats", str(stats), "--data-dir", str(tmp_path),
                 "--out", str(remarked)])
    recs = [json.loads(line) for line in remarked.read_text().splitlines()]
    assert all("sum_depth" in r for r in recs)

    # binning with a model fitted from the stats
    bins_dir = tmp_path / "bins"
    data_parallel.main(["--data-dir", str(tmp_path), "--glob", "*.npz",
                        "--K", "2", "--method", "LB_by_DFS_and_TM",
                        "--block-size", "32",
                        "--out-dir", str(bins_dir), "--eval"])
    binned = sorted(bins_dir.glob("*.npz"))
    assert len(binned) == 4  # 2 files x 2 bins

    # run bins + calc_time aggregation
    bin_stats = tmp_path / "bin_stats.jsonl"
    run_all.main(COMMON + ["--data-dir", str(bins_dir), "--glob", "*.npz",
                           "--run", "tree_backward", "--stats-out", str(bin_stats)])
    capsys.readouterr()
    calc_time.main(["--stats", str(bin_stats)])
    out = capsys.readouterr().out.splitlines()
    agg = json.loads(out[-1])
    assert agg["aggregate"] and agg["total_tokens"] > 0
    groups = [json.loads(line) for line in out[:-1]]
    assert all(g["bins"] == 2 for g in groups)


def test_train_cli_with_resume(tmp_path, capsys):
    from dynamictreeattn_tpu.cli import train

    args = COMMON[:-2] + [  # drop --iters
        "--data", "synthetic:n_prompts=1,samples=3,prompt_lo=8,prompt_hi=12,"
        "completion_lo=4,completion_hi=8",
        "--steps", "2", "--dp", "2", "--tp", "2", "--lr", "1e-3",
        "--ckpt-dir", str(tmp_path / "ckpt"),
    ]
    train.main(args)
    out1 = [json.loads(line) for line in capsys.readouterr().out.splitlines()
            if line.startswith("{")]
    assert len(out1) == 2 and out1[-1]["step"] == 2

    train.main(args + ["--resume", "--steps", "1"])
    out2 = capsys.readouterr().out
    assert "resumed at step 2" in out2
    rec = [json.loads(line) for line in out2.splitlines() if line.startswith("{")][-1]
    assert rec["step"] == 3


def test_warmup_cli(capsys):
    """AOT warmup pre-compiles every (bucket, width) combo without data."""
    from dynamictreeattn_tpu.cli import warmup

    warmup.main([
        "--model", "qwen3-tiny", "--dtype", "fp32",
        "--attn-backend", "reference", "--block-q", "32", "--block-kv", "32",
        "--max-len", "128", "--widths", "max",
    ])
    out = capsys.readouterr().out
    assert "compiled in" in out


def test_warmup_cli_sharded_cache_hit(capsys):
    """--dp/--tp warmup AOT-lowers the SHARDED train step (dp x tp mesh,
    canonical NamedShardings, optimizer update included) and bakes it into
    the persistent compilation cache: a second identical warmup — the same
    construction a pod bring-up's Trainer performs — must hit the cache and
    run much faster. (conftest points JAX_COMPILATION_CACHE_DIR at a
    persistent dir.)"""
    import tempfile
    import time

    import jax

    from dynamictreeattn_tpu.cli import warmup

    args = [
        "--model", "qwen3-tiny", "--dtype", "fp32",
        "--attn-backend", "reference", "--block-q", "32", "--block-kv", "32",
        "--max-len", "96", "--dp", "4", "--tp", "2", "--opt",
    ]
    prev = jax.config.jax_compilation_cache_dir
    with tempfile.TemporaryDirectory() as fresh:
        try:
            jax.config.update("jax_compilation_cache_dir", fresh)
            t0 = time.time()
            warmup.main(args)
            t_cold = time.time() - t0
            out = capsys.readouterr().out
            assert "sharded bucket" in out and "dp=4 tp=2" in out
            import os

            assert len(os.listdir(fresh)) > 0  # entries actually persisted
            t0 = time.time()
            warmup.main(args)
            t_warm = time.time() - t0
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)
    # second pass pays tracing + cache loads only; a miss would recompile
    # (cold ~10s+ even at tiny shapes)
    assert t_warm < max(0.6 * t_cold, t_cold - 4), (t_cold, t_warm)
