"""Capture .explain('formatted') for registered queries into plans/r12/.

Usage: python tools/capture_plans.py <suffix> [sf_dir] [query ...]

suffix is 'before' or 'after'; default sf_dir /root/testdata/sf0.01 (plan
SHAPE is scale-free; the driver cannot run Spark and only reads the files).
Queries that execute eager work when invoked (qb_dml, qb_sample,
qb_time_cdf) still produce their FINAL DataFrame's plan — that is the plan
the bench's noop sink times last, and the submetric-level evidence for
their internal jobs lives in the code + OPTIMIZATION_r12.md.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("qbeast-plan-capture")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from qbeast_spark_spark.queries import QUERIES

    names = sys.argv[3:] or list(QUERIES)
    out_dir = os.path.join(HERE, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn, _sql = QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
        except Exception as e:  # capture the failure instead of dying
            plan = f"ERROR capturing plan: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars")


if __name__ == "__main__":
    main()
