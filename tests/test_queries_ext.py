"""Extended relational/analytic surface (queries_ext.py) vs the DuckDB
oracle at sf0.001 — same compare as tools/oracle_check.py (the driver-gate
replica), small scale for suite speed."""

import os
import sys

import duckdb
import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "tools"))

from oracle_check import TABLES, compare  # noqa: E402

from qbeast_spark_spark.queries_ext import EXT_QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(EXT_QUERIES))
def test_ext_query_matches_oracle(spark, oracle, name):
    fn, sql = EXT_QUERIES[name]
    sdf = fn(spark, SF_DIR).toPandas()
    odf = oracle.execute(sql).fetchdf()
    verdict = compare(sdf, odf)
    assert verdict == "OK", verdict
