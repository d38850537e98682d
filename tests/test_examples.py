"""The GRPO example runs end to end and the clipped-ratio objective
descends (examples/grpo.py — the reference's target RL workload)."""

import sys

import numpy as np
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_grpo_example_descends():
    from examples.grpo import main

    hist = main([
        "--model", "qwen3-tiny", "--steps", "5", "--attn-backend", "reference",
        "--dtype", "fp32", "--block-q", "32", "--block-kv", "32",
        "--loss-chunk", "32", "--no-remat", "--prompt-len", "24",
        "--completion-len", "12", "--samples", "6", "--lr", "1e-3",
    ])
    assert all(h["loss"] == h["loss"] for h in hist), "NaN loss"
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_rl_loop_reward_improves():
    """Self-contained RL loop: sample -> reward -> GRPO update. With the
    even-token reward the sampled-reward trend must rise (fixed seed; the
    CPU backend makes this deterministic)."""
    from examples.rl_loop import main

    hist = main([
        "--model", "qwen3-tiny", "--iters", "10", "--attn-backend",
        "reference", "--dtype", "fp32", "--block-q", "32", "--block-kv", "32",
        "--loss-chunk", "32", "--no-remat", "--prompt-len", "16",
        "--max-new", "12", "--samples", "8", "--lr", "1e-3",
    ])
    assert all(np.isfinite(h["loss"]) for h in hist)
    first = np.mean([h["mean_reward"] for h in hist[:3]])
    last = np.mean([h["mean_reward"] for h in hist[-3:]])
    assert last > first, (first, last)
