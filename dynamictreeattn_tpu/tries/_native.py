"""ctypes bindings for the native treekit data path (native/treekit.cpp).

Compiled lazily with g++ on first use and cached next to the source; falls
back silently to the numpy implementations when unavailable (set
``DTA_NO_NATIVE=1`` to force the fallback — tests diff both paths)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["get_lib", "native_enabled", "lcp_adjacent", "flatten_core",
           "block_meta_core", "endpoints_core", "seq_paths_core"]

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "treekit.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libtreekit.so")

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def native_enabled() -> bool:
    return os.environ.get("DTA_NO_NATIVE", "") != "1" and get_lib() is not None


def get_lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            src = os.path.abspath(_SRC)
            so = os.path.abspath(_SO)
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.tk_lcp_adjacent.argtypes = [_i32p, _i64p, ctypes.c_int64, _i64p]
            lib.tk_flatten.argtypes = [
                _i32p, _i64p, _i64p, ctypes.c_int64, _i32p, _i32p, _i32p, _i32p,
            ]
            lib.tk_flatten.restype = ctypes.c_int64
            lib.tk_accumulate_up.argtypes = [_i32p, ctypes.c_int64, _f64p, _f64p]
            lib.tk_block_counts.argtypes = [
                _i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _i32p, _i32p,
            ]
            lib.tk_block_fill.argtypes = [
                _i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, _i32p, _i32p, _i32p, _i32p,
            ]
            lib.tk_endpoints.argtypes = [
                _i64p, _i64p, ctypes.c_int64, _i64p, _i64p, ctypes.c_int64,
                _i64p,
            ]
            lib.tk_seq_paths.argtypes = [
                _i32p, _i64p, _i64p, ctypes.c_int64, ctypes.c_int64, _i32p,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
    return _LIB


def _flat_offsets(seqs):
    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    flat = (
        np.concatenate(seqs).astype(np.int32)
        if seqs and offsets[-1] > 0
        else np.zeros(0, np.int32)
    )
    return np.ascontiguousarray(flat), offsets


def lcp_adjacent(seqs) -> np.ndarray:
    lib = get_lib()
    flat, offsets = _flat_offsets(seqs)
    out = np.zeros(max(0, len(seqs) - 1), dtype=np.int64)
    if len(seqs) > 1:
        lib.tk_lcp_adjacent(flat, offsets, len(seqs), out)
    return out


def flatten_core(seqs, lcps: np.ndarray):
    """(tokens, depth, parent, last_desc) for the packed DFS layout."""
    lib = get_lib()
    flat, offsets = _flat_offsets(seqs)
    n = int(offsets[-1] - lcps.sum())
    tokens = np.empty(n, np.int32)
    depth = np.empty(n, np.int32)
    parent = np.empty(n, np.int32)
    last_desc = np.empty(n, np.int32)
    wrote = lib.tk_flatten(
        flat, offsets, np.ascontiguousarray(lcps, np.int64), len(seqs),
        tokens, depth, parent, last_desc,
    )
    assert wrote == n, (wrote, n)
    return tokens, depth, parent, last_desc


def accumulate_up(parent: np.ndarray, acc_a: np.ndarray, acc_b: np.ndarray):
    get_lib().tk_accumulate_up(
        np.ascontiguousarray(parent, np.int32), len(parent), acc_a, acc_b
    )


def block_meta_core(last_desc: np.ndarray, bq: int, bk: int,
                    min_kv_slots: int = 0, min_q_slots: int = 0):
    """(kv_ids, kv_counts, kv_types, q_ids, q_counts, q_types)."""
    lib = get_lib()
    ld = np.ascontiguousarray(last_desc, np.int32)
    n = len(ld)
    nq, nk = n // bq, n // bk
    kv_counts = np.zeros(nq, np.int32)
    q_counts = np.zeros(nk, np.int32)
    lib.tk_block_counts(ld, n, bq, bk, kv_counts, q_counts)
    kv_w = max(int(kv_counts.max()), min_kv_slots, 1)
    q_w = max(int(q_counts.max()), min_q_slots, 1)
    kv_ids = np.zeros((nq, kv_w), np.int32)
    kv_types = np.zeros((nq, kv_w), np.int32)
    q_ids = np.zeros((nk, q_w), np.int32)
    q_types = np.zeros((nk, q_w), np.int32)
    lib.tk_block_fill(ld, n, bq, bk, kv_w, q_w, kv_ids, kv_types, q_ids, q_types)
    return kv_ids, kv_counts, kv_types, q_ids, q_counts, q_types


def endpoints_core(seqs, lcps: np.ndarray, q_leaf: np.ndarray,
                   q_len: np.ndarray) -> np.ndarray:
    """Packed endpoint position per (leaf, length) attachment query
    (queries sorted by leaf index — the attach_lists iteration order)."""
    lib = get_lib()
    _, offsets = _flat_offsets(seqs)
    out = np.empty(len(q_leaf), np.int64)
    lib.tk_endpoints(
        offsets, np.ascontiguousarray(lcps, np.int64), len(seqs),
        np.ascontiguousarray(q_leaf, np.int64),
        np.ascontiguousarray(q_len, np.int64), len(q_leaf), out,
    )
    return out


def seq_paths_core(parent: np.ndarray, end_pos: np.ndarray,
                   seq_lens: np.ndarray, lmax: int) -> np.ndarray:
    """[S, lmax] packed root->endpoint paths, -1 padded."""
    lib = get_lib()
    S = len(end_pos)
    paths = np.full((S, max(lmax, 1)), -1, np.int32)
    if S and lmax:
        lib.tk_seq_paths(
            np.ascontiguousarray(parent, np.int32),
            np.ascontiguousarray(end_pos, np.int64),
            np.ascontiguousarray(seq_lens, np.int64), S, lmax,
            paths,
        )
    return paths
