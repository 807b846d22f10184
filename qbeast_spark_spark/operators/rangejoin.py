"""Interval (range) join — a custom operator Spark lacks natively.

A naive ``points JOIN intervals ON ts BETWEEN start AND end`` has no equi
key, so Spark plans BroadcastNestedLoopJoin — O(|points| x |intervals|)
and a driver OOM once the intervals side outgrows the broadcast limit.
The scale-safe shape is the classic bucketing trick: quantize time into
fixed-width buckets, explode each interval to the buckets it overlaps,
tag each point with its containing bucket, equi-join on the bucket id
(hash-partitioned, well distributed), and apply the exact range predicate
as a residual filter. Shuffle volume is |points| + |intervals| x
avg_buckets_per_interval, and the join parallelizes like any other
equi-join.

Pick ``bucket_width`` on the order of the typical interval length: each
interval then explodes to ~2 buckets. (The reference has no such
operator; its relational surface delegates to Spark — SURVEY.md §2.2.)
"""

from __future__ import annotations

__all__ = ["interval_join"]


def interval_join(points, intervals, ts_col: str, start_col: str,
                  end_col: str, bucket_width: int):
    """Join rows of ``points`` to rows of ``intervals`` with
    ``start_col <= ts_col < end_col``, in the same integer time unit
    (e.g. epoch microseconds). Column sets must be disjoint."""
    from pyspark.sql import functions as F

    b = F.lit(int(bucket_width))
    iv = intervals.withColumn(
        "_iv_bkt",
        F.explode(F.sequence(
            F.floor(F.col(start_col) / b),
            F.floor((F.col(end_col) - 1) / b))))
    pt = points.withColumn("_pt_bkt", F.floor(F.col(ts_col) / b))
    joined = pt.join(
        iv,
        (F.col("_pt_bkt") == F.col("_iv_bkt"))
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) < F.col(end_col)))
    return joined.drop("_pt_bkt", "_iv_bkt")
