"""Skew mitigation for large-large equi-joins.

AQE's skew-join split (spark.sql.adaptive.skewJoin) handles most cases at
runtime; ``salted_join`` is the explicit fallback for keys so hot that one
reducer would still drown (the classic null-key / celebrity-key problem):
the left side's key is salted deterministically (pmod of a row hash), the
right side is replicated once per salt value, and the join key becomes
(key, salt) — fan-out on the build side is ``salt``×, reducer load drops
``salt``×. Use when a profile shows a handful of keys owning most rows.
"""

from __future__ import annotations

from typing import List, Sequence

__all__ = ["salted_join"]

_SALT = "_qss_salt"


def salted_join(left, right, on: Sequence[str] | str, how: str = "inner",
                salt: int = 16, salt_source: Sequence[str] | None = None):
    """Equi-join ``left`` and ``right`` on ``on`` with the left side's hot
    keys spread across ``salt`` sub-partitions.

    ``salt_source``: columns whose hash spreads the left rows (defaults to
    all left columns — deterministic, no RNG state, repeatable plans).
    Supported ``how``: inner / left (the replicated side must be the
    non-preserved one)."""
    from pyspark.sql import functions as F

    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys: List[str] = [on] if isinstance(on, str) else list(on)
    src = [F.col(c) for c in (salt_source or left.columns)]
    salted_left = left.withColumn(
        _SALT, F.pmod(F.hash(*src), F.lit(salt)).cast("int"))
    salted_right = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = salted_left.join(salted_right, keys + [_SALT], how)
    return out.drop(_SALT)
