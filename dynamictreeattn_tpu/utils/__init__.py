"""Utilities: grad comparison, timing, stats sinks."""

from dynamictreeattn_tpu.utils.compare_grads import compare_grads, format_grad_table

__all__ = ["compare_grads", "format_grad_table"]
