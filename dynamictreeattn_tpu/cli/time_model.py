"""TreeTimeModel CLI (reference: tree_time_model.py:50-85).

Fits the NNLS cost model from a stats JSONL and prints coefficients + average
relative error.

    python -m dynamictreeattn_tpu.cli.time_model --stats stats/tree.jsonl
"""

from __future__ import annotations

import argparse
import json

from dynamictreeattn_tpu.parallel.time_model import FEATURES, TreeTimeModel


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stats", required=True)
    p.add_argument("--min-points", type=int, default=16)
    args = p.parse_args(argv)

    with open(args.stats) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    recs = [r for r in recs if "time" in r and all(k in r for k in FEATURES)]
    tm = TreeTimeModel(min_points=args.min_points)
    tm.add_data(recs)
    if tm.coef is None:
        print(f"only {len(recs)} usable records (< {args.min_points}); not fitted")
        return
    print(json.dumps({
        "n_records": len(recs),
        "coefficients": dict(zip(FEATURES, [float(c) for c in tm.coef])),
        "avg_rel_error": tm.avg_rel_error(),
    }, indent=2))


if __name__ == "__main__":
    main()
