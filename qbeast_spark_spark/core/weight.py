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
