"""Shared helpers for the query surface modules (queries.py, queries_ext.py).

Lives in its own module so the surface can be split across files without
import cycles.
"""

from __future__ import annotations

import os

__all__ = ["_t", "_events", "_cents", "_cache_path"]


def _cache_path(sf_dir: str, name: str) -> str:
    """Stable per-sf_dir scratch path under /tmp/qss_tables for tables
    derived from (and pure in) sf_dir. One scheme for every memoized
    derived table (indexed lineitem/embeddings/events, DML/CDF bases,
    partsupp) so a future change — e.g. hashing the key against the
    '/'-to-'_' collision — lands in exactly one place."""
    tag = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    return f"/tmp/qss_tables/{tag}/{name}"


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


from .operators.text import TOKEN_RE  # noqa: E402

DD_JACCARD_SQL = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') toks
           FROM documents),
s AS (SELECT doc_id,
             unnest(list_distinct(CASE WHEN len(toks) >= 3 THEN
               list_transform(range(1, len(toks)-1),
                              i -> array_to_string(list_slice(toks, i, i+2), ' '))
               ELSE [] END)) AS shingle
      FROM t),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM s GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS i
          FROM s a JOIN s b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id1, id2,
       ROUND(i::DOUBLE / (x.sz + y.sz - i), 6) AS jaccard
FROM inter JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
WHERE ROUND(i::DOUBLE / (x.sz + y.sz - i), 6) >= 0.5
"""


from .operators.dedup import (  # noqa: E402
    LSH_BAND_ROWS,
    MINHASH_PERMS,
    MINHASH_PRIME,
)


def _minhash_sql_core() -> str:
    mins = ",\n       ".join(
        f"MIN((h * {a} + {b}) % {MINHASH_PRIME}) AS mh{j}"
        for j, (a, b) in enumerate(MINHASH_PERMS))
    return f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') toks
           FROM documents),
s AS (SELECT doc_id,
             unnest(list_distinct(CASE WHEN len(toks) >= 3 THEN
               list_transform(range(1, len(toks)-1),
                              i -> array_to_string(list_slice(toks, i, i+2), ' '))
               ELSE [] END)) AS shingle
      FROM t),
h AS (SELECT doc_id,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h
      FROM s),
sigs AS (SELECT doc_id,
       {mins}
FROM h GROUP BY doc_id)
"""


def _lsh_sql() -> str:
    n_bands = len(MINHASH_PERMS) // LSH_BAND_ROWS
    band_selects = []
    for b in range(n_bands):
        cols = [f"mh{b * LSH_BAND_ROWS + r}" for r in range(LSH_BAND_ROWS)]
        concat = " || '_' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_selects.append(
            f"SELECT doc_id, {b} AS band, {concat} AS band_val FROM sigs")
    bands = "\nUNION ALL\n".join(band_selects)
    return (_minhash_sql_core()
            + f", bands AS ({bands})\n"
            + """SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
""")
