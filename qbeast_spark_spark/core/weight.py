"""Weight: deterministic pseudo-random Int per record, and fraction mapping.

Mirrors /root/reference/core/src/main/scala/io/qbeast/core/model/Weight.scala:28-139.
A weight is a signed 32-bit int produced by murmur3 over the indexed columns
(seed 42). PySpark's ``F.hash`` IS Murmur3_x86_32 with seed 42 — the exact
algorithm the reference's QbeastMurmur3Hash expression uses
(/root/reference/core/src/main/scala/io/qbeast/spark/internal/expressions/QbeastMurmur3Hash.scala:37-52)
— so weight assignment needs zero custom JVM code.
"""

from __future__ import annotations

INT_MIN = -(2**31)
INT_MAX = 2**31 - 1
RANGE = float(2**32 - 1)  # INT_MAX - INT_MIN

MIN_WEIGHT = INT_MIN
MAX_WEIGHT = INT_MAX

__all__ = [
    "INT_MIN",
    "INT_MAX",
    "MIN_WEIGHT",
    "MAX_WEIGHT",
    "fraction_to_weight",
    "weight_to_fraction",
]


def fraction_to_weight(fraction: float) -> int:
    """Map a sample fraction in [0,1] to the int weight threshold.

    Weight.scala:53 — Weight(f) = MinValue + (f * RANGE).
    """
    if fraction <= 0.0:
        return MIN_WEIGHT
    if fraction >= 1.0:
        return MAX_WEIGHT
    return min(MAX_WEIGHT, INT_MIN + int(round(fraction * RANGE)))


def weight_to_fraction(weight: int) -> float:
    """Inverse of fraction_to_weight (Weight.scala fraction)."""
    return (weight - INT_MIN) / RANGE


def _rotl32(x: int, r: int) -> int:
    x &= 0xFFFFFFFF
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def murmur3_string_hash(value: str, seed: int = 42) -> int:
    """Spark-compatible Murmur3_x86_32 of a string's UTF-8 bytes, signed
    int32 — the exact value `F.hash(string_col)` produces (Spark's
    hashUnsafeBytes: 4-byte little-endian words, then each tail byte
    sign-extended and mixed as a full k1, then fmix by total length).
    Pure-Python driver-side twin used for planning-time point lookups on
    hash-transformed dimensions."""
    data = value.encode("utf-8")
    n = len(data)
    h1 = seed & 0xFFFFFFFF
    aligned = n - n % 4

    def mix_k1(k1: int) -> int:
        k1 = (k1 * 0xCC9E2D51) & 0xFFFFFFFF
        k1 = _rotl32(k1, 15)
        return (k1 * 0x1B873593) & 0xFFFFFFFF

    def mix_h1(h1: int, k1: int) -> int:
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF

    for i in range(0, aligned, 4):
        word = int.from_bytes(data[i:i + 4], "little")
        h1 = mix_h1(h1, mix_k1(word))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128:
            b -= 256  # sign-extended byte, masked inside mix_k1
        h1 = mix_h1(h1, mix_k1(b & 0xFFFFFFFF))
    # fmix
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 - 0x100000000 if h1 >= 0x80000000 else h1
