"""Sequence batch IO.

Reads the reference's data format — torch ``.pt`` files holding a list of
LongTensors (reference: run.py:134-147, data_parallel.py:130-138) — plus
npz, and "synthetic:" specs for the generator. Writes bins in either format
(reference writes ``{name}_bin{i}.pt``, data_parallel.py:195-199)."""

from __future__ import annotations

import os

import numpy as np

__all__ = ["load_sequences", "save_sequences", "parse_data_spec"]


def load_sequences(path: str) -> list[np.ndarray]:
    if path.endswith(".pt"):
        import torch

        seqs = torch.load(path, map_location="cpu", weights_only=False)
        return [np.asarray(s, dtype=np.int32).reshape(-1) for s in seqs]
    if path.endswith(".npz"):
        with np.load(path) as z:
            return [z[k].astype(np.int32) for k in sorted(z.files, key=_numkey)]
    raise ValueError(f"unsupported data file {path!r} (.pt or .npz)")


def _numkey(k: str):
    try:
        return (0, int(k.split("_")[-1]))
    except ValueError:
        return (1, k)


def save_sequences(path: str, seqs) -> None:
    if path.endswith(".pt"):
        import torch

        torch.save([torch.as_tensor(np.asarray(s), dtype=torch.long) for s in seqs], path)
    elif path.endswith(".npz"):
        np.savez(path, **{f"seq_{i}": np.asarray(s, np.int32) for i, s in enumerate(seqs)})
    else:
        raise ValueError(f"unsupported data file {path!r}")


def parse_data_spec(spec: str, vocab_size: int):
    """A data path (.pt/.npz) or ``synthetic:key=val,key=val`` generator spec
    (keys: seed, n_prompts, samples, prompt_lo/hi, completion_lo/hi,
    branch_prob)."""
    from dynamictreeattn_tpu.data.synthetic import synthetic_rollout_batch

    if not spec.startswith("synthetic:"):
        seqs = load_sequences(spec)
        return seqs, [{} for _ in seqs]
    kv = {}
    body = spec[len("synthetic:"):]
    for part in filter(None, body.split(",")):
        k, v = part.split("=")
        kv[k] = float(v) if "." in v else int(v)
    return synthetic_rollout_batch(
        seed=int(kv.get("seed", 0)),
        n_prompts=int(kv.get("n_prompts", 2)),
        samples_per_prompt=int(kv.get("samples", 8)),
        prompt_len=(int(kv.get("prompt_lo", 512)), int(kv.get("prompt_hi", 1024))),
        completion_len=(
            int(kv.get("completion_lo", 128)),
            int(kv.get("completion_hi", 512)),
        ),
        branch_prob=float(kv.get("branch_prob", 0.7)),
        vocab_size=vocab_size,
    )
