"""Vectorized twin of Spark's ``F.hash`` (Murmur3_x86_32, seed 42).

The weight the index assigns to every record IS ``F.hash(indexed cols)``
(QbeastMurmur3Hash parity, see core/weight.py). The JVM computes it for
free inside codegen on the normal read/write paths — but the Python Data
Source reader (sources/pyds.py) evaluates the residual sample predicate
*inside a Python worker*, where no Spark expression engine exists. This
module recomputes the identical int32 over pyarrow record batches with
NumPy, so ``format("qbeast").option("fraction", f)`` returns byte-for-byte
the rows ``QbeastTable.sample(f)`` returns.

Algorithm per Spark's ``Murmur3HashFunction`` (sql/catalyst hash.scala):
each column folds into the running hash ``h = hash(col, seed=h)`` starting
at 42; NULL leaves ``h`` unchanged; int-like types mix one 32-bit word,
long-like types mix (lo, hi) words, floats hash their IEEE bit patterns
(-0.0 normalized to 0.0), strings hash UTF-8 bytes as 4-byte
little-endian words plus sign-extended tail bytes (the scalar twin of
``core.weight.murmur3_string_hash``).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .weight import murmur3_string_hash

__all__ = ["spark_hash_batches"]

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def _mix_k1(k1: np.ndarray) -> np.ndarray:
    k1 = (k1 * _C1) & np.uint32(0xFFFFFFFF)
    k1 = (k1 << np.uint32(15)) | (k1 >> np.uint32(17))
    return (k1 * _C2) & np.uint32(0xFFFFFFFF)


def _mix_h1(h1: np.ndarray, k1: np.ndarray) -> np.ndarray:
    h1 = h1 ^ k1
    h1 = (h1 << np.uint32(13)) | (h1 >> np.uint32(19))
    return (h1 * np.uint32(5) + np.uint32(0xE6546B64)) & np.uint32(0xFFFFFFFF)


def _fmix(h1: np.ndarray, length: int) -> np.ndarray:
    h1 = h1 ^ np.uint32(length)
    h1 = h1 ^ (h1 >> np.uint32(16))
    h1 = (h1 * np.uint32(0x85EBCA6B)) & np.uint32(0xFFFFFFFF)
    h1 = h1 ^ (h1 >> np.uint32(13))
    h1 = (h1 * np.uint32(0xC2B2AE35)) & np.uint32(0xFFFFFFFF)
    return h1 ^ (h1 >> np.uint32(16))


def _hash_int32(vals: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """One 32-bit word (int/short/byte/date/float-bits/boolean)."""
    return _fmix(_mix_h1(seeds, _mix_k1(vals.astype(np.uint32))), 4)


def _hash_int64(vals: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """Two words, low then high (long/timestamp/double-bits)."""
    u = vals.astype(np.uint64)
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (u >> np.uint64(32)).astype(np.uint32)
    h1 = _mix_h1(seeds, _mix_k1(lo))
    h1 = _mix_h1(h1, _mix_k1(hi))
    return _fmix(h1, 8)


def _fold_column(col, h: np.ndarray) -> np.ndarray:
    """Fold one pyarrow Array/ChunkedArray into the running hash vector."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    n = len(col)
    if col.null_count == n:
        return h
    valid = np.ones(n, dtype=bool) if col.null_count == 0 else \
        ~np.asarray(col.is_null())

    if pa.types.is_string(t) or pa.types.is_large_string(t):
        out = h.copy()
        vals = col.to_pylist()
        for i in np.flatnonzero(valid):
            out[i] = np.uint32(
                murmur3_string_hash(vals[i], int(h[i])) & 0xFFFFFFFF)
        return out

    if pa.types.is_timestamp(t) or pa.types.is_date64(t):
        vals = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        wide = True
    elif pa.types.is_date32(t):
        vals = col.cast(pa.int32()).to_numpy(zero_copy_only=False)
        wide = False
    elif pa.types.is_boolean(t):
        vals = col.to_numpy(zero_copy_only=False).astype(np.int32)
        wide = False
    elif pa.types.is_floating(t):
        f = col.to_numpy(zero_copy_only=False)
        if pa.types.is_float64(t):
            f = np.where(f == 0.0, 0.0, f)      # -0.0 -> 0.0 (SPARK-32110)
            vals = f.astype(np.float64).view(np.int64)
            wide = True
        else:
            f = np.where(f == 0.0, np.float32(0.0), f.astype(np.float32))
            vals = f.view(np.int32)
            wide = False
    elif pa.types.is_integer(t):
        wide = t.bit_width > 32
        vals = col.to_numpy(zero_copy_only=False).astype(
            np.int64 if wide else np.int32)
    else:
        raise TypeError(f"spark_hash: unsupported column type {t}")

    kern = _hash_int64 if wide else _hash_int32
    new_h = kern(vals, h)
    return np.where(valid, new_h, h)


def spark_hash_batches(table, cols: Sequence[str]) -> np.ndarray:
    """``F.hash(*cols)`` over a pyarrow Table/RecordBatch -> int32 array."""
    h = np.full(table.num_rows, 42, dtype=np.uint32)
    for c in cols:
        h = _fold_column(table.column(c) if hasattr(table, "column")
                         else table[c], h)
    return h.astype(np.uint32).view(np.int32)
