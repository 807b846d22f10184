"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin side-by-side on a scale factor, compare row count,
column names, and order-insensitive values. Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if len(a) != len(b):
        return f"ROWCOUNT {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"SCHEMA {sorted(a.columns)} vs {sorted(b.columns)}"
    # Strict dtype twin-check: the driver hashes raw values, so a DuckDB
    # HUGEINT (object dtype) vs Spark int64 mismatches even when values agree.
    # Calibrated to CORRECTNESS_r01: the driver's hash tolerates int width
    # (int32 vs int64) and datetime64 unit (ns vs us) but NOT kind changes
    # (DuckDB HUGEINT -> object/float vs Spark int64 was the r01 killer).
    def kind(dt):
        s = str(dt)
        if s.startswith("int") or s.startswith("uint"):
            return "int"
        if s.startswith("datetime64"):
            return "datetime"
        if s.startswith("float"):
            return "float"
        return s
    for c in sorted(a.columns):
        ka, kb = kind(a[c].dtype), kind(b[c].dtype)
        if ka != kb:
            return (f"DTYPE col={c}: spark={a[c].dtype} oracle={b[c].dtype} "
                    f"(kind {ka} vs {kb})")
    a, b = normalize(a.copy()), normalize(b.copy())
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if pd.api.types.is_float_dtype(a[c]):
            ok = np.allclose(av.astype(float), bv.astype(float),
                             rtol=1e-9, atol=1e-6, equal_nan=True)
        else:
            ok = (pd.Series(av).fillna("<null>") ==
                  pd.Series(bv).fillna("<null>")).all()
        if not ok:
            mism = next(i for i in range(len(av))
                        if str(av[i]) != str(bv[i]))
            return (f"VALUES col={c} row={mism}: "
                    f"spark={av[mism]!r} oracle={bv[mism]!r}")
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    # sized for the sf1 sweep (r11): full-result collects reach ~6M rows
    # (qb_roundtrip returns the whole table), which OOMs a default-sized
    # driver. Arrow transfer stays OFF by default — it collects object
    # cells as numpy arrays, which the comparator (calibrated to the
    # driver's non-Arrow hash) can't equality-test; opt in for sweeps
    # whose entries are all scalar-columned. Knobs are env-tunable.
    cpus = os.environ.get("ORACLE_CHECK_CPUS", "8")
    mem = os.environ.get("ORACLE_CHECK_DRIVER_MEM", "12g")
    arrow = os.environ.get("ORACLE_CHECK_ARROW", "0") == "1"
    n_cpus = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("oracle-check")
             .config("spark.sql.shuffle.partitions", str(2 * n_cpus))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", mem)
             .config("spark.sql.execution.arrow.pyspark.enabled",
                     "true" if arrow else "false")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")

    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"{name:28s} SPARK-ERROR {type(ex).__name__}: "
                  f"{str(ex)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only   rows={len(sdf)} "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"{name:28s} ORACLE-ERROR {type(ex).__name__}: "
                  f"{str(ex)[:200]}")
            failures += 1
            continue
        verdict = compare(sdf, odf)
        status = "ok" if verdict == "OK" else "FAIL"
        if verdict != "OK":
            failures += 1
        print(f"{name:28s} {status:5s} rows={len(sdf)} "
              f"({time.time()-t0:.1f}s) {verdict if verdict != 'OK' else ''}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
