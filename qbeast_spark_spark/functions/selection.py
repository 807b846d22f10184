"""Auto column selection (O3) and quantile helpers (O4).

Ports of /root/reference/core/src/main/scala/io/qbeast/spark/index/
SparkColumnsToIndexSelector.scala:33-161 (pick up to N indexing columns by
lowest average absolute Pearson correlation; strings via StringIndexer,
timestamps via unix time) and src/main/scala/io/qbeast/utils/
QbeastUtils.scala:58-148 (columnStats quantiles: numeric approxQuantile,
string bucketing).
"""

from __future__ import annotations

from typing import List, Optional

__all__ = ["select_columns_to_index", "compute_quantiles"]

MAX_AUTO_COLUMNS = 3  # config.scala:48-52


def select_columns_to_index(df, max_columns: int = MAX_AUTO_COLUMNS
                            ) -> List[str]:
    """Pick up to ``max_columns`` columns with the lowest average absolute
    Pearson correlation against the others (least-redundant dimensions)."""
    from pyspark.ml.feature import StringIndexer, VectorAssembler
    from pyspark.ml.stat import Correlation
    from pyspark.sql import functions as F

    numeric_types = {"int", "bigint", "double", "float", "smallint",
                     "tinyint"}
    work = df
    feature_cols: List[str] = []
    for field in df.schema.fields:
        t = field.dataType.simpleString()
        name = field.name
        if t in numeric_types or t.startswith("decimal"):
            work = work.withColumn(f"_f_{name}",
                                   F.coalesce(F.col(name).cast("double"),
                                              F.lit(0.0)))
            feature_cols.append(name)
        elif t in ("timestamp", "timestamp_ntz", "date"):
            work = work.withColumn(
                f"_f_{name}",
                F.coalesce(F.unix_timestamp(F.col(name).cast("timestamp"))
                           .cast("double"), F.lit(0.0)))
            feature_cols.append(name)
        elif t == "string":
            idx = StringIndexer(inputCol=name, outputCol=f"_f_{name}",
                                handleInvalid="keep")
            work = idx.fit(work).transform(work)
            feature_cols.append(name)
    if not feature_cols:
        raise ValueError("no indexable columns found")
    if len(feature_cols) <= max_columns:
        return feature_cols

    assembler = VectorAssembler(
        inputCols=[f"_f_{c}" for c in feature_cols], outputCol="_features")
    vec = assembler.transform(work).select("_features")
    corr = Correlation.corr(vec, "_features", "pearson").head()[0].toArray()

    import numpy as np

    abscorr = np.abs(np.nan_to_num(corr, nan=0.0))
    np.fill_diagonal(abscorr, 0.0)
    avg = abscorr.mean(axis=1)
    order = np.argsort(avg)
    return [feature_cols[i] for i in order[:max_columns]]


def _string_quantile_df(df, column: str, n_buckets: int):
    """Distributed string-quantile plan (QbeastUtils.scala:120-144 parity):
    range-repartition on the column, then min per range bucket — every
    stage parallel, no global-order Window (which would funnel the whole
    column through one task)."""
    from pyspark.sql import functions as F

    return (
        df.where(F.col(column).isNotNull())
        .select(column)
        .repartitionByRange(n_buckets, F.col(column))
        .select(F.spark_partition_id().alias("_b"), F.col(column))
        .groupBy("_b").agg(F.min(column).alias("q"))
    )


def compute_quantiles(df, column: str, n_buckets: int = 50,
                      relative_error: float = 0.1) -> List:
    """columnStats quantile helper: numeric via approxQuantile
    (Greenwald-Khanna, one pass), string via range-partition bucketing
    (both one distributed pass; neither sorts globally)."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes)[column]
    probs = [i / n_buckets for i in range(n_buckets + 1)]
    if dtype != "string":
        qs = df.where(F.col(column).isNotNull()).stat.approxQuantile(
            column, probs, relative_error)
        # strictly increasing (duplicate quantiles collapse bins)
        out = [qs[0]]
        for q in qs[1:]:
            if q > out[-1]:
                out.append(q)
        return out
    rows = _string_quantile_df(df, column, n_buckets).collect()
    qs = []
    for r in sorted(rows, key=lambda r: r["_b"]):
        if r["q"] is not None and (not qs or r["q"] > qs[-1]):
            qs.append(r["q"])
    mx = df.agg(F.max(column)).collect()[0][0]
    if qs and qs[-1] != mx:
        qs.append(mx)
    return qs
