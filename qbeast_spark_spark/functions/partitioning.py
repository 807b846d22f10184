"""Partitioning utilities.

``spread`` widens under-partitioned inputs to the cluster's parallelism
before CPU-bound per-row stages (regex tokenization, Arrow kernels,
vector math). Small reference tables often arrive as a single parquet
split — without this every "embarrassingly parallel" stage runs on one
core. At real scale (inputs already >= defaultParallelism splits) this is
a no-op, so no extra shuffle appears in 100 TB plans.
"""

from __future__ import annotations

from typing import Optional

__all__ = ["spread"]


def spread(df, min_partitions: Optional[int] = None):
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= target:
        return df
    return df.repartition(target)
