"""Grad-dump comparison CLI (reference: exp/compare_grads.py:5-88).

    python -m dynamictreeattn_tpu.cli.compare_grads \
        --baseline-grad grad/dense.npz --exp-grad grad/tree.npz --out table.txt
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from dynamictreeattn_tpu.cli.common import load_grads_npz


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--baseline-grad", required=True)
    p.add_argument("--exp-grad", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--top", type=int, default=None)
    args = p.parse_args(argv)

    base = load_grads_npz(args.baseline_grad)
    exp = load_grads_npz(args.exp_grad)
    missing = sorted(set(base) - set(exp))
    extra = sorted(set(exp) - set(base))
    for k in missing:
        print(f"WARNING: missing in exp: {k}", file=sys.stderr)
    for k in extra:
        print(f"WARNING: extra in exp: {k}", file=sys.stderr)

    rows = []
    for k in sorted(set(base) & set(exp)):
        gb, ge = base[k].astype(np.float64), exp[k].astype(np.float64)
        if gb.ndim >= 2 and "layers" in k:  # stacked [L, ...] leaves → per layer
            for i in range(gb.shape[0]):
                rows.append(_row(f"{k}[{i}]", gb[i], ge[i]))
        else:
            rows.append(_row(k, gb, ge))
    rows.sort(key=lambda r: -r[1])

    lines = [f"{'param':60s} {'rel_err':>12s} {'base_norm':>12s}"]
    lines += [f"{n:60s} {r:12.4e} {b:12.4e}" for n, r, b in rows[: args.top]]
    rels = [r for _, r, _ in rows if np.isfinite(r)]
    lines.append(
        f"# {len(rows)} params: max {max(rels):.4e} "
        f"median {np.median(rels):.4e} min {min(rels):.4e}"
    )
    text = "\n".join(lines)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


def _row(name, gb, ge):
    nb = float(np.linalg.norm(gb))
    diff = float(np.linalg.norm(ge - gb))
    rel = diff / nb if nb > 0 else (0.0 if diff == 0 else float("inf"))
    return (name, rel, nb)


if __name__ == "__main__":
    main()
