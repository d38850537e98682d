"""Benchmark sweep driver (reference: exp/exp_dense.py, exp_tree.py, exp_dp.py,
exp_dp_TM.py — consolidated into one idempotent matrix runner).

Generates tau2-16k-like synthetic data files once, then sweeps
model × engine × config combinations, skipping combinations whose stats file
already exists (the reference's idempotency pattern, exp_tree.py:28).

    python exp/sweep.py --suite tree --models qwen3-0.6b
    python exp/sweep.py --suite dense --models qwen3-0.6b qwen3-1.7b
    python exp/sweep.py --suite dp --K 2 4
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "data", "synthetic-tau2")
STATS = os.path.join(ROOT, "stats")
BINS = os.path.join(ROOT, "bins")


def sh(args):
    print("+", " ".join(args), flush=True)
    subprocess.run(args, check=True, cwd=ROOT)


def ensure_data(n_files=4):
    os.makedirs(DATA, exist_ok=True)
    sys.path.insert(0, ROOT)
    from dynamictreeattn_tpu.data.io import save_sequences
    from dynamictreeattn_tpu.data.synthetic import synthetic_rollout_batch

    for i in range(n_files):
        f = os.path.join(DATA, f"call{i}.npz")
        if os.path.exists(f):
            continue
        seqs, _ = synthetic_rollout_batch(
            seed=i, n_prompts=2, samples_per_prompt=8,
            prompt_len=(1024, 2048), completion_len=(128, 512), branch_prob=0.8,
        )
        save_sequences(f, seqs)
        print(f"wrote {f} ({sum(len(s) for s in seqs)} tokens)")


def run_all(model, run, stats_name, extra=()):
    out = os.path.join(STATS, stats_name)
    if os.path.exists(out):
        print(f"skip (exists): {out}")
        return
    os.makedirs(STATS, exist_ok=True)
    sh([sys.executable, "-m", "dynamictreeattn_tpu.cli.run_all",
        "--data-dir", DATA, "--glob", "*.npz", "--model", model,
        "--run", run, "--stats-out", out, *extra])


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--suite", required=True, choices=["tree", "dense", "dp"])
    p.add_argument("--models", nargs="+", default=["qwen3-0.6b"])
    p.add_argument("--K", nargs="+", type=int, default=[2, 4])
    args = p.parse_args()
    ensure_data()

    if args.suite == "dense":
        # reference exp_dense.py: dense fwd/bwd (act-ckpt is our default remat)
        for m in args.models:
            run_all(m, "dense_forward", f"{m}-DF.jsonl")
            run_all(m, "dense_backward", f"{m}-DB.jsonl")
    elif args.suite == "tree":
        # reference exp_tree.py: tree fwd/bwd × permute policy × block size
        for m in args.models:
            run_all(m, "tree_forward", f"{m}-TF.jsonl")
            run_all(m, "tree_backward", f"{m}-TB.jsonl")
            run_all(m, "tree_backward", f"{m}-TB-random.jsonl",
                    ["--permute", "random"])
            run_all(m, "tree_backward", f"{m}-TB-b512.jsonl",
                    ["--block-q", "512", "--block-kv", "512"])
            run_all(m, "tree_backward", f"{m}-TB-b512-attn.jsonl",
                    ["--block-q", "512", "--block-kv", "512",
                     "--remat-policy", "attn"])
    else:
        # reference exp_dp.py / exp_dp_TM.py: binning × K × method, then run
        # bins and aggregate the simulated makespan
        for m in args.models:
            run_all(m, "tree_backward", f"{m}-TB.jsonl")  # fit source
            for K in args.K:
                for method in ["LB_by_n_tokens", "LB_by_TM", "LB_by_DFS_and_TM"]:
                    bdir = os.path.join(BINS, f"{m}-K{K}-{method}")
                    if not os.path.exists(bdir):
                        sh([sys.executable, "-m",
                            "dynamictreeattn_tpu.cli.data_parallel",
                            "--data-dir", DATA, "--glob", "*.npz",
                            "--K", str(K), "--method", method,
                            "--stats", os.path.join(STATS, f"{m}-TB.jsonl"),
                            "--out-dir", bdir, "--eval"])
                    out = os.path.join(STATS, f"{m}-K{K}-{method}.jsonl")
                    if not os.path.exists(out):
                        sh([sys.executable, "-m", "dynamictreeattn_tpu.cli.run_all",
                            "--data-dir", bdir, "--glob", "*.npz", "--model", m,
                            "--run", "tree_backward", "--stats-out", out])
                    sh([sys.executable, "-m", "dynamictreeattn_tpu.cli.calc_time",
                        "--stats", out])


if __name__ == "__main__":
    main()
