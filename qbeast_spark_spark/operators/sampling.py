"""Deterministic stratified sampling — the training-data downsampling
primitive (e.g. downsample over-represented languages/sources, keep rare
strata whole).

Unlike ``df.sampleBy`` (seeded RNG over partition iteration: results change
with partitioning and Spark version), the keep-decision here is a pure
function of the row's id: md5(id) mapped to uniform [0,1], kept when below
the stratum's rate. Exactly reproducible across engines, cluster layouts,
and reruns — and therefore exactly DuckDB-oracle-checkable. The same
hash-as-uniform trick the OTree sampler uses (Weight.scala:28-139
semantics), with md5 instead of murmur3 so non-Spark engines can replay it.
"""

from __future__ import annotations

from typing import Dict

__all__ = ["uniform_col", "stratified_sample"]


def uniform_col(id_col: str):
    """Deterministic uniform [0,1) from a column's string form (first 8
    md5 hex digits / 2^32)."""
    from pyspark.sql import functions as F

    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
               16, 10).cast("double")
    return h / float(1 << 32)


def stratified_sample(df, stratum_col: str, rates: Dict[str, float],
                      id_col: str, default_rate: float = 1.0):
    """Keep each row iff uniform(id) < rate(stratum). Rows whose stratum
    is not in ``rates`` use ``default_rate``. One narrow projection, no
    shuffle, no RNG state."""
    from pyspark.sql import functions as F

    u = uniform_col(id_col)
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(rate)
    return df.where(u < rate)
