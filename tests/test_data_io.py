"""Data IO: reference .pt format roundtrip, npz, synthetic specs."""

import numpy as np

from dynamictreeattn_tpu.data import sharing_ratio, synthetic_rollout_batch
from dynamictreeattn_tpu.data.io import load_sequences, parse_data_spec, save_sequences


def test_pt_roundtrip(tmp_path):
    """The reference's torch .pt format (list of LongTensors,
    reference: run.py:134-147) loads and saves."""
    seqs = [np.array([1, 2, 3], np.int32), np.array([7], np.int32)]
    f = tmp_path / "x.pt"
    save_sequences(str(f), seqs)
    got = load_sequences(str(f))
    assert len(got) == 2
    np.testing.assert_array_equal(got[0], seqs[0])
    np.testing.assert_array_equal(got[1], seqs[1])


def test_npz_roundtrip_order(tmp_path):
    seqs = [np.arange(i + 1, dtype=np.int32) for i in range(12)]
    f = tmp_path / "x.npz"
    save_sequences(str(f), seqs)
    got = load_sequences(str(f))
    assert [len(s) for s in got] == [len(s) for s in seqs]


def test_synthetic_spec_and_sharing():
    seqs, attachs = parse_data_spec(
        "synthetic:n_prompts=2,samples=6,prompt_lo=32,prompt_hi=64,"
        "completion_lo=8,completion_hi=16,branch_prob=0.9,seed=3",
        vocab_size=1000,
    )
    assert len(seqs) == 12
    assert all(a["w_logprobs"] == -1.0 for a in attachs)
    assert all(s.max() < 1000 for s in seqs)
    # heavy branching → strong sharing
    assert sharing_ratio(seqs) > 0.4


def test_sharing_ratio_bounds():
    # identical sequences → maximal sharing
    seqs = [np.array([1, 2, 3, 4], np.int32)] * 4
    assert sharing_ratio(seqs) == 0.75
    # disjoint sequences → zero sharing
    seqs = [np.array([i], np.int32) for i in range(4)]
    assert sharing_ratio(seqs) == 0.0


def test_synthetic_group_structure():
    seqs, attachs = synthetic_rollout_batch(
        seed=0, n_prompts=3, samples_per_prompt=4,
        prompt_len=(16, 20), completion_len=(4, 8), vocab_size=50,
    )
    assert len(seqs) == 12
    # samples of one prompt share the prompt prefix
    for p in range(3):
        group = [s for s, a in zip(seqs, attachs) if a["prompt_id"] == p]
        plen = min(len(s) for s in group)
        first = group[0][:16]
        for s in group[1:]:
            np.testing.assert_array_equal(s[:16], first)
