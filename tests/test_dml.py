"""DELETE / UPDATE keep the index readable (sources/dml.py) — the verbs
the reference hands to DeltaTable, after which its docs say the table
"should only be read using delta" (Quickstart.md:409-427)."""

import pytest
from pyspark.sql import functions as F

import qbeast_spark_spark as qss
from conftest import load


@pytest.fixture()
def table(spark, tmp_table):
    li = load(spark, "lineitem")
    qss.write(li, tmp_table,
              columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=500)
    return tmp_table, li


def test_delete_removes_only_matching_rows(spark, table):
    path, li = table
    qt = qss.QbeastTable.for_path(spark, path)
    files_before = set(qt.file_paths())
    expect_gone = li.where("l_orderkey < 1000").count()
    out = qt.delete([("l_orderkey", "<", 1000)])
    assert out["rows_deleted"] == expect_gone
    assert out["files_rewritten"] >= 1
    got = qt.to_df()
    assert got.count() == li.count() - expect_gone
    assert got.where("l_orderkey < 1000").count() == 0
    # untouched data identical
    keep = li.where("l_orderkey >= 1000")
    assert got.exceptAll(keep).count() == 0
    assert keep.exceptAll(got).count() == 0
    # no more files rewritten than existed, and the table still prunes
    # (at this tiny scale the root cube can overlap every file, so strict
    # < is not guaranteed; the no-match test covers the zero-file case)
    assert out["files_rewritten"] <= len(files_before)
    snap = qt.snapshot(refresh=True)
    pruned = qt._prune_files(snap, [("l_orderkey", ">=", 9000)])
    assert len(pruned) < len(snap.files)


def test_delete_sql_string_and_sampling_stay_exact(spark, table):
    path, li = table
    qt = qss.QbeastTable.for_path(spark, path)
    out = qt.delete("l_extendedprice > 50000.0")
    assert out["rows_deleted"] == li.where("l_extendedprice > 50000.0").count()
    n = qt.to_df().count()
    # sampling still accurate after the rewrite (weights re-assigned)
    s = qt.sample(0.2).count()
    assert abs(s - 0.2 * n) / n < 0.05
    # deterministic: same sample twice
    assert qt.sample(0.2).count() == s


def test_delete_null_semantics(spark, tmp_table):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], ["k", "v"])
    qss.write(df, tmp_table, columns_to_index=["k"], cube_size=10)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    out = qt.delete("v > 20.0")
    # NULL comparison doesn't match -> the NULL row survives (SQL DELETE)
    assert out["rows_deleted"] == 1
    left = {r["k"] for r in qt.to_df().collect()}
    assert left == {1, 2}


def test_delete_truncate_is_metadata_only(spark, table):
    path, li = table
    qt = qss.QbeastTable.for_path(spark, path)
    out = qt.delete()
    assert out["rows_deleted"] == li.count()
    assert out["files_rewritten"] == 0
    assert qt.to_df().count() == 0
    # time travel still sees the pre-delete data
    assert qt.to_df(version=out["version"] - 1).count() == li.count()


def test_delete_no_matches_no_commit(spark, table):
    path, _li = table
    qt = qss.QbeastTable.for_path(spark, path)
    v_before = qt.snapshot(refresh=True).version
    out = qt.delete([("l_orderkey", "<", -5)])
    assert out == {"version": None, "rows_deleted": 0, "files_rewritten": 0}
    assert qt.snapshot(refresh=True).version == v_before


def test_update_non_indexed_column(spark, table):
    path, li = table
    qt = qss.QbeastTable.for_path(spark, path)
    out = qt.update({"l_quantity": "l_quantity + 100"},
                    [("l_orderkey", "<", 500)])
    expect = li.where("l_orderkey < 500").count()
    assert out["rows_updated"] == expect
    got = qt.to_df()
    assert got.count() == li.count()
    bumped = got.where("l_orderkey < 500").agg(
        F.sum("l_quantity").alias("s")).first()["s"]
    base = li.where("l_orderkey < 500").agg(
        F.sum("l_quantity").alias("s")).first()["s"]
    assert float(bumped) == pytest.approx(float(base) + 100 * expect)
    # untouched rows keep their values
    same = got.where("l_orderkey >= 500").exceptAll(
        li.where("l_orderkey >= 500"))
    assert same.count() == 0


def test_update_indexed_column_within_space(spark, table):
    path, li = table
    qt = qss.QbeastTable.for_path(spark, path)
    # move a slice to another in-space position: pruned reads must follow
    out = qt.update({"l_extendedprice": "l_extendedprice + 1.0"},
                    "l_extendedprice < 2000.0")
    assert out["rows_updated"] == li.where(
        "l_extendedprice < 2000.0").count()
    got = qt.read([("l_extendedprice", "<", 2001.0)])
    assert got.count() == li.where("l_extendedprice < 2000.0").count()
    assert qt.to_df().count() == li.count()


def test_update_outside_revision_space_raises(spark, table):
    path, _li = table
    qt = qss.QbeastTable.for_path(spark, path)
    with pytest.raises(ValueError, match="outside the revision space"):
        qt.update({"l_extendedprice": "l_extendedprice + 1e9"},
                  [("l_orderkey", "<", 100)])


def test_update_type_cast_and_unknown_column(spark, table):
    path, _li = table
    qt = qss.QbeastTable.for_path(spark, path)
    with pytest.raises(ValueError, match="unknown column"):
        qt.update({"nope": "1"})
    # int expr into a double column: cast to the declared type
    qt.update({"l_quantity": "7"}, [("l_orderkey", "<", 100)])
    t = dict(qt.to_df().dtypes)["l_quantity"]
    assert t == "double"


def test_delete_on_staging_table(spark, tmp_table):
    li = load(spark, "lineitem").limit(3000)
    qss.convert_to_qbeast_dir = None  # no-op guard against typos
    # staging-only table: write plain parquet then convert
    li.coalesce(2).write.mode("overwrite").parquet(tmp_table)
    import glob
    import os
    for extra in glob.glob(os.path.join(tmp_table, "_SUCCESS")):
        os.remove(extra)
    qss.convert_to_qbeast(spark, tmp_table)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    n = qt.to_df().count()
    gone = qt.to_df().where("l_orderkey < 500").count()
    out = qt.delete("l_orderkey < 500")
    assert out["rows_deleted"] == gone
    assert qt.to_df().count() == n - gone
    assert qt.to_df().where("l_orderkey < 500").count() == 0


def test_delete_preserves_blooms(spark, tmp_table):
    li = load(spark, "lineitem").withColumn(
        "tag", F.concat(F.lit("t"), F.col("l_orderkey")))
    qss.write(li, tmp_table, columns_to_index=["l_orderkey"],
              cube_size=1000, bloom_columns=["tag"])
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    qt.delete([("l_orderkey", "<", 200)])
    snap = qt.snapshot(refresh=True)
    rewritten = [f for f in snap.files.values() if f.blooms]
    assert rewritten, "rewritten files must keep bloom coverage"
    # absent-key point lookup still prunes to zero files
    assert qt.read([("tag", "==", "no-such-tag")]).count() == 0
