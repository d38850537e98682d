"""The GRPO example runs end to end and the clipped-ratio objective
descends (examples/grpo.py — the reference's target RL workload)."""

import sys
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
