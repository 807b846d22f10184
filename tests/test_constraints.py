"""CHECK constraints (sources/constraints.py): declaration, persistence,
and enforcement across every path that introduces new row values —
append/overwrite, insert_into, UPDATE, MERGE update + insert (staged and
in-space), and the streaming sink. NULL passes (Delta semantics)."""

import pytest
from pyspark.sql import functions as F

import qbeast_spark_spark as qss

from conftest import load


@pytest.fixture()
def table(spark, tmp_table):
    li = load(spark, "lineitem").limit(2000)
    qss.write(li, tmp_table, columns_to_index=["l_orderkey"], cube_size=500,
              constraints={"qty_positive": "l_quantity > 0"})
    return tmp_table, li


def test_declared_on_write_and_persisted(spark, table):
    path, li = table
    qt = qss.QbeastTable.for_path(spark, path)
    assert qt.constraints() == {"qty_positive": "l_quantity > 0"}
    # a conforming append passes
    qss.write(li.limit(100), path, columns_to_index=["l_orderkey"])
    # a violating append is rejected and commits nothing
    v_before = qt.snapshot(refresh=True).version
    bad = li.limit(50).withColumn("l_quantity", F.lit(-1.0))
    with pytest.raises(ValueError, match="qty_positive"):
        qss.write(bad, path, columns_to_index=["l_orderkey"])
    assert qt.snapshot(refresh=True).version == v_before


def test_null_passes_delta_semantics(spark, table):
    path, li = table
    with_nulls = li.limit(50).withColumn(
        "l_quantity", F.lit(None).cast("double"))
    qss.write(with_nulls, path, columns_to_index=["l_orderkey"])  # no raise


def test_declaration_rejected_when_batch_violates(spark, tmp_table):
    li = load(spark, "lineitem").limit(500)
    with pytest.raises(ValueError, match="impossible"):
        qss.write(li, tmp_table, columns_to_index=["l_orderkey"],
                  constraints={"impossible": "l_quantity < 0"})


def test_add_constraint_validates_existing_data(spark, table):
    path, _ = table
    qt = qss.QbeastTable.for_path(spark, path)
    with pytest.raises(ValueError, match="never"):
        qt.add_constraint("never", "l_extendedprice < 0")
    qt.add_constraint("price_cap", "l_extendedprice < 1e9")
    assert "price_cap" in qt.constraints()
    qt.drop_constraint("price_cap")
    assert "price_cap" not in qt.constraints()
    with pytest.raises(ValueError, match="no such"):
        qt.drop_constraint("absent")


def test_update_and_merge_enforced(spark, table):
    path, li = table
    qt = qss.QbeastTable.for_path(spark, path)
    with pytest.raises(ValueError, match="UPDATE.*qty_positive"):
        qss.update_rows(spark, path, {"l_quantity": "-5.0"},
                        [("l_orderkey", "<", 1000)])
    # conforming update passes
    qss.update_rows(spark, path, {"l_quantity": "l_quantity + 1.0"},
                    [("l_orderkey", "<", 1000)])

    src_bad = (li.limit(20)
               .select("l_orderkey", "l_linenumber")
               .distinct()
               .withColumn("l_quantity", F.lit(-3.0)))
    with pytest.raises(ValueError, match="MERGE update"):
        qss.merge_rows(spark, path, src_bad,
                       on=["l_orderkey", "l_linenumber"],
                       when_matched_update={"l_quantity": "__src_l_quantity"})
    # violating INSERT side (unmatched keys land as inserts)
    src_ins = (spark.createDataFrame(
        [(999_999_991, 1, -9.0)],
        "l_orderkey long, l_linenumber int, l_quantity double"))
    with pytest.raises(ValueError, match="MERGE insert"):
        qss.merge_rows(spark, path, src_ins,
                       on=["l_orderkey", "l_linenumber"],
                       when_not_matched_insert={"l_orderkey": "l_orderkey",
                                                "l_linenumber":
                                                    "l_linenumber",
                                                "l_quantity": "l_quantity"})
    # delete-only merge is never blocked by constraints
    qss.merge_rows(spark, path,
                   li.limit(5).select("l_orderkey", "l_linenumber")
                   .distinct(),
                   on=["l_orderkey", "l_linenumber"],
                   when_matched_delete=True)
    assert qt.to_df(version=None).count() > 0


def test_constraints_survive_overwrite_and_insert_into(spark, table):
    path, li = table
    qss.write(li.limit(500), path, columns_to_index=["l_orderkey"],
              mode="overwrite")
    qt = qss.QbeastTable.for_path(spark, path)
    assert "qty_positive" in qt.constraints()
    bad = li.limit(10).withColumn("l_quantity", F.lit(-2.0))
    with pytest.raises(ValueError, match="qty_positive"):
        qt.insert_into(bad)


def test_staging_lane_enforces_constraints(spark, table):
    path, li = table
    qt = qss.QbeastTable.for_path(spark, path)
    bad = li.limit(30).withColumn("l_quantity", F.lit(-4.0))
    with pytest.raises(ValueError, match="staging.*qty_positive"):
        qss.write_staging(bad, path)
    with pytest.raises(ValueError, match="qty_positive"):
        qt.append_staging(bad)
    # conforming staging rows pass
    qss.write_staging(li.limit(30), path)


def test_restore_rolls_back_constraints(spark, tmp_table):
    li = load(spark, "lineitem").limit(500)
    qss.write(li, tmp_table, columns_to_index=["l_orderkey"])
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    v0 = qt.snapshot().version
    qt.add_constraint("cap", "l_extendedprice < 1e9")
    assert "cap" in qt.constraints()
    qt.restore(v0)
    assert "cap" not in qt.constraints()
    # and a batch violating the rolled-back constraint now passes
    qss.write(li.limit(10).withColumn("l_extendedprice", F.lit(2e9)),
              tmp_table, columns_to_index=["l_orderkey"])
