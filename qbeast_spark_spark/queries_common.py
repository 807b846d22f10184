"""Shared helpers for the query surface modules (queries.py, queries_ext.py).

Lives in its own module so the surface can be split across files without
import cycles.
"""

from __future__ import annotations

import os

__all__ = ["_t", "_events", "_cents"]


def _t(spark, sf_dir: str, name: str):
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark, sf_dir: str):
    """events.parquet stores TIMESTAMP(NANOS) which Spark rejects by
    default; read via the legacy nanos-as-long conf and expose ``ts_us``
    (epoch microseconds, = DuckDB's microsecond truncation). All events
    queries work in integer microsecond space — timezone-proof under any
    driver session tz."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts_us", F.expr("ts div 1000"))
    else:
        ev = ev.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    return ev


def _cents(col):
    from pyspark.sql import functions as F

    return F.round(col * 100, 0).cast("long")
