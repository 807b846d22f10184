"""Per-file Bloom filters for string point lookups (opt-in data skipping).

Parquet has native column blooms, but pyarrow 16 (this container) cannot
write them, so the writer keeps a compact per-file filter in the commit
log instead: ``bits`` bits (default 16384 = 2 KiB) per opted-in column
per file, built inline while batches stream through the write kernel.
The reader drops a file when every probed literal of an equality / IN
predicate tests negative — Bloom filters have no false negatives, so the
drop is always sound; a false positive only costs reading the file.

Sizing: with k=6 hashes, 16384 bits hold ~2k distinct values at ~2% FPR
(~1.1 KiB/file in the log after base64+zlib when sparse). For columns
with many more distinct values per file, raise ``bloom_bits`` — an
oversized filter never hurts correctness, only log bytes. At the 100 TB
design point (5M-row files) blooms suit selective-ID columns where each
FILE still sees a bounded distinct count (e.g. session-sorted layouts);
for uniformly-random high-cardinality columns the filter saturates and
degrades to "never prunes" — still sound.

Hashing: crc32-based double hashing (Kirsch-Mitzenmacker): positions are
``(h1 + i*h2) mod bits``. crc32 is stable across processes (unlike
Python's salted ``hash``), so write-side membership and read-side probes
always agree.
"""

from __future__ import annotations

import base64
import zlib
from typing import Dict, Iterable, Optional

import numpy as np

__all__ = ["BLOOM_K", "DEFAULT_BLOOM_BITS", "bloom_new", "bloom_add_many",
           "bloom_encode", "bloom_might_contain"]

BLOOM_K = 6
DEFAULT_BLOOM_BITS = 16384


def _hashes(value: str):
    data = value.encode("utf-8")
    h1 = zlib.crc32(data)
    h2 = zlib.crc32(data, 0x9E3779B9) | 1   # odd: full-period stride
    return h1, h2


def bloom_new(bits: int = DEFAULT_BLOOM_BITS) -> np.ndarray:
    if bits % 8:
        raise ValueError("bloom bits must be a multiple of 8")
    return np.zeros(bits // 8, dtype=np.uint8)


def bloom_add_many(bitmap: np.ndarray, values: Iterable[Optional[str]]) -> None:
    bits = len(bitmap) * 8
    for v in values:
        if v is None:
            continue    # equality never matches null: nulls stay out
        h1, h2 = _hashes(v)
        for i in range(BLOOM_K):
            pos = (h1 + i * h2) % bits
            bitmap[pos >> 3] |= 1 << (pos & 7)


def bloom_encode(bitmap: np.ndarray) -> str:
    """zlib+base64 — sparse filters compress well in the JSON log."""
    return base64.b64encode(zlib.compress(bitmap.tobytes(), 6)).decode()


def _bloom_decode(encoded: str) -> bytes:
    return zlib.decompress(base64.b64decode(encoded))


def bloom_might_contain(encoded: str, value: str) -> bool:
    """False ONLY when ``value`` was provably never written (no false
    negatives); True on membership or false positive."""
    raw = _bloom_decode(encoded)
    bits = len(raw) * 8
    h1, h2 = _hashes(value)
    for i in range(BLOOM_K):
        pos = (h1 + i * h2) % bits
        if not (raw[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def blooms_exclude(blooms: Optional[Dict[str, str]], filters) -> bool:
    """True when a file's blooms prove NO row satisfies the conjunction:
    an equality / IN clause on a bloomed column where every probed string
    literal tests negative."""
    if not blooms:
        return False
    for t in filters:
        col, op, val = t[0], t[1].lower(), (t[2] if len(t) > 2 else None)
        enc = blooms.get(col)
        if enc is None:
            continue
        try:
            if op in ("=", "==") and isinstance(val, str):
                if not bloom_might_contain(enc, val):
                    return True
            elif op == "in" and val and all(isinstance(v, str) for v in val):
                if not any(bloom_might_contain(enc, v) for v in val):
                    return True
        except (ValueError, zlib.error):
            continue    # undecodable filter: never prune on it
    return False
