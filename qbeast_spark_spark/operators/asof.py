"""As-of (time-travel) join — an operator Spark SQL lacks natively,
composed from union + window ``last(ignorenulls)`` so it scales without a
range cross-product: one shuffle on the key, one ordered window pass.

For each left row, attaches the most recent right row with the same key and
right_ts <= left_ts (backward as-of). Matches DuckDB's ASOF JOIN semantics,
which the oracle uses.
"""

from __future__ import annotations

from typing import List

__all__ = ["asof_join"]


def asof_join(left, right, on: List[str] | str, left_ts: str, right_ts: str,
              right_cols: List[str], suffix: str = "_r"):
    """Backward as-of join.

    Scale shape: union(left, right) -> window over (key, ts) -> filter.
    No expansion: |rows| = |left| + |right| throughout; skew only if a
    single key dominates (salt upstream if so).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    on = [on] if isinstance(on, str) else list(on)

    r_payload = F.struct(*[F.col(c) for c in [right_ts] + right_cols])
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right rows sort before ties on _ts
        r_payload.alias("_rv"),
    )
    left_cols = left.columns
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    )
    r_padded = r.select(
        *[F.col(c) for c in on], "_ts", "_side", "_rv",
        *[F.lit(None).cast(dict(zip(left.columns,
                                    [f.dataType for f in left.schema.fields]
                                    ))[c]).alias(f"_l_{c}")
          for c in left_cols],
    )
    unioned = l.unionByName(r_padded)
    w = (Window.partitionBy(*on).orderBy(F.col("_ts").asc(),
                                         F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = unioned.withColumn("_last_rv",
                                 F.last("_rv", ignorenulls=True).over(w))
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left_cols]
    out_cols += [F.col(f"_last_rv.{right_ts}").alias(f"{right_ts}{suffix}")]
    out_cols += [F.col(f"_last_rv.{c}").alias(f"{c}{suffix}")
                 for c in right_cols]
    return matched.where(F.col("_side") == 1).select(*out_cols)
