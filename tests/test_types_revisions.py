"""Per-type indexing round-trips (TransformerIndexingTest.scala:1-501
analogue: every indexable type writes + reads back equal, with a working
range read) and revision growth on space expansion
(NewRevisionTest.scala:1-333 analogue)."""

import datetime as dt
import decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import qbeast_spark_spark as qss


@pytest.fixture(scope="module")
def typed_df(spark):
    n = 2000
    rows = [
        (
            i,                                    # int_col (long)
            i % 97,                               # small_int
            float(i) * 1.5 - 300.0,               # double_col (negatives)
            float(i % 13) / 7.0,                  # float_col
            decimal.Decimal(i) / 100,             # dec_col
            dt.date(2020, 1, 1) + dt.timedelta(days=i % 900),
            dt.datetime(2021, 6, 1) + dt.timedelta(minutes=i * 11),
            f"key_{i % 37:03d}",                  # string_col
            None if i % 50 == 0 else i * 2,       # nullable_col
        )
        for i in range(n)
    ]
    schema = T.StructType([
        T.StructField("int_col", T.LongType()),
        T.StructField("small_int", T.IntegerType()),
        T.StructField("double_col", T.DoubleType()),
        T.StructField("float_col", T.FloatType()),
        T.StructField("dec_col", T.DecimalType(12, 2)),
        T.StructField("date_col", T.DateType()),
        T.StructField("ts_col", T.TimestampType()),
        T.StructField("string_col", T.StringType()),
        T.StructField("nullable_col", T.LongType()),
    ])
    return spark.createDataFrame(rows, schema)


@pytest.mark.parametrize("cols,probe", [
    (["int_col", "double_col"], ("int_col", ">=", 1000)),
    (["small_int"], ("small_int", "<", 40)),
    (["float_col", "int_col"], ("float_col", ">=", 0.5)),
    (["date_col"], ("date_col", ">=", dt.date(2021, 1, 1))),
    (["ts_col", "int_col"], ("ts_col", "<", dt.datetime(2022, 1, 1))),
    (["string_col", "int_col"], ("int_col", ">=", 500)),
])
def test_type_roundtrip_and_range_read(spark, tmp_path, typed_df, cols,
                                       probe):
    path = str(tmp_path / "t")
    qss.write(typed_df, path, columns_to_index=cols, cube_size=300)
    qt = qss.QbeastTable.for_path(spark, path)
    got = qt.to_df()
    assert got.count() == typed_df.count()
    assert got.exceptAll(typed_df).count() == 0
    col, op, val = probe
    expected = {"<": typed_df.where(F.col(col) < F.lit(val)),
                ">=": typed_df.where(F.col(col) >= F.lit(val))}[op]
    pruned = qt.read([probe])
    assert pruned.count() == expected.count()
    assert pruned.exceptAll(expected).count() == 0


def test_nulls_in_indexed_column(spark, tmp_path, typed_df):
    path = str(tmp_path / "t")
    qss.write(typed_df, path, columns_to_index=["nullable_col", "int_col"],
              cube_size=300)
    qt = qss.QbeastTable.for_path(spark, path)
    got = qt.to_df()
    assert got.count() == typed_df.count()
    assert got.exceptAll(typed_df).count() == 0
    # null rows survive and are returned by an unfiltered read
    assert got.where(F.col("nullable_col").isNull()).count() == \
        typed_df.where(F.col("nullable_col").isNull()).count()


def test_decimal_index_roundtrip(spark, tmp_path, typed_df):
    path = str(tmp_path / "t")
    qss.write(typed_df, path, columns_to_index=["dec_col"], cube_size=300)
    qt = qss.QbeastTable.for_path(spark, path)
    assert qt.to_df().exceptAll(typed_df).count() == 0


def test_new_revision_on_space_growth(spark, tmp_path):
    """Appending data outside the current [min,max] space must create a
    new revision with a widened space (SparkRevisionFactory.scala:230-270
    semantics); reads and samples span both revisions."""
    path = str(tmp_path / "t")
    d1 = spark.range(0, 3000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v"))
    qss.write(d1, path, columns_to_index=["k", "v"], cube_size=300)
    qt = qss.QbeastTable.for_path(spark, path)
    revs_before = qt.revisions()

    d2 = spark.range(100_000, 103_000).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("v"))
    qss.write(d2, path, columns_to_index=["k", "v"], cube_size=300)
    qt = qss.QbeastTable.for_path(spark, path)
    revs_after = qt.revisions()
    assert len(revs_after) > len(revs_before)

    # full read covers both writes
    got = qt.to_df()
    assert got.count() == 6000
    assert got.exceptAll(d1.unionAll(d2)).count() == 0

    # sampling stays accurate across revisions (reference tolerance 1%,
    # loosened for the small N here)
    f = 0.3
    s = qt.sample(f).count()
    assert abs(s - 6000 * f) <= 6000 * 0.05

    # range read spanning only the second revision's space
    pruned = qt.read([("k", ">=", 100_000)])
    assert pruned.count() == 3000


def test_append_same_space_reuses_revision(spark, tmp_path):
    path = str(tmp_path / "t")
    d1 = spark.range(0, 3000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v"))
    qss.write(d1, path, columns_to_index=["k", "v"], cube_size=300)
    n_revs = len(qss.QbeastTable.for_path(spark, path).revisions())
    # strictly inside the existing space -> same revision
    d2 = spark.range(1000, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v"))
    qss.write(d2, path, columns_to_index=["k", "v"], cube_size=300)
    qt = qss.QbeastTable.for_path(spark, path)
    assert len(qt.revisions()) == n_revs
    assert qt.to_df().count() == 4000


def test_null_predicate_reads(spark, tmp_path, typed_df):
    path = str(tmp_path / "t")
    qss.write(typed_df, path, columns_to_index=["nullable_col", "int_col"],
              cube_size=300)
    qt = qss.QbeastTable.for_path(spark, path)
    n_null = typed_df.where(F.col("nullable_col").isNull()).count()
    got_null = qt.read([("nullable_col", "is_null", None)])
    assert got_null.count() == n_null
    got_nn = qt.read([("nullable_col", "is_not_null", None),
                      ("int_col", ">=", 1000)])
    expect_nn = typed_df.where(F.col("nullable_col").isNotNull()
                               & (F.col("int_col") >= 1000))
    assert got_nn.count() == expect_nn.count()
    assert got_nn.exceptAll(expect_nn).count() == 0
