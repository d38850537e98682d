"""Command-line harness (reference L5/L6 parity, SURVEY.md §1).

    python -m dynamictreeattn_tpu.cli.run          # reference: run.py
    python -m dynamictreeattn_tpu.cli.run_all      # reference: run_all.py
    python -m dynamictreeattn_tpu.cli.data_parallel  # reference: data_parallel.py
    python -m dynamictreeattn_tpu.cli.compare_grads  # reference: exp/compare_grads.py
    python -m dynamictreeattn_tpu.cli.remark       # reference: remark.py
    python -m dynamictreeattn_tpu.cli.calc_time    # reference: exp/calc_time.py
"""
