"""Round-3 hardening: the to_df().where() pruning trap pinned as an
invariant, and sampling across grown (multi-revision) tables."""

from pyspark.sql import functions as F

import qbeast_spark_spark as qss
from conftest import load


def test_qt_where_prunes_todf_where_does_not(spark, tmp_table):
    """README's pruning-trap contract: qt.where() must read strictly
    fewer files than the same predicate chained on to_df(), with equal
    row results (the bench files_read_pricelt1k invariant as a pytest)."""
    li = load(spark, "lineitem")
    qss.write(li, tmp_table,
              columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=300)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    n_files = len(qt.file_paths())
    assert n_files > 3

    pred = "l_extendedprice < 1500.0"
    pruned = qt.where(pred)
    unpruned = qt.to_df().where(pred)
    assert pruned.count() == unpruned.count() == li.where(pred).count()
    # inputFiles() is the SCAN set (input_file_name() would only show
    # files that contributed result rows — parquet footer skipping makes
    # both look equally small)
    files_pruned = len(pruned.inputFiles())
    files_unpruned = len(unpruned.inputFiles())
    assert files_unpruned == n_files          # the trap: scans every file
    assert files_pruned < files_unpruned      # the verb: skips files


def test_sampling_across_grown_revisions(spark, tmp_table):
    """Appends whose values exceed the revision space trigger a NEW
    revision with widened transformations (QbeastFormat.md 'will create a
    new revision'); sample(f) must stay accurate and deterministic over
    the mixed-revision table (QbeastSamplingTest.scala:71-105 analogue)."""
    li = load(spark, "lineitem")
    n = li.count()
    mid = li.selectExpr("percentile_approx(l_orderkey, 0.5)").first()[0]
    first = li.where(F.col("l_orderkey") < mid)
    second = li.where(F.col("l_orderkey") >= mid)
    assert first.count() > 0 and second.count() > 0

    cols = ["l_orderkey", "l_extendedprice"]
    qss.write(first, tmp_table, columns_to_index=cols, cube_size=300)
    qss.write(second, tmp_table, columns_to_index=cols, cube_size=300,
              mode="append")
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    indexed_revs = [r for r in qt.revisions() if r.revision_id > 0]
    assert len(indexed_revs) >= 2, "space widening must grow a revision"
    widened = max(indexed_revs, key=lambda r: r.revision_id)
    assert widened.transformations[0].max_value >= mid

    assert qt.to_df().count() == n
    for frac in (0.1, 0.5):
        got = qt.sample(frac).count()
        assert abs(got - n * frac) <= 0.05 * n, (frac, got)
        # deterministic: the hash-range predicate re-evaluates identically
        assert qt.sample(frac).count() == got
    # sample is a true subset of the table
    s = qt.sample(0.2)
    assert s.exceptAll(qt.to_df()).count() == 0
    # residuals compose per revision: a sample with a filter equals
    # filtering the sample, across both revisions' files
    flt = qt.sample(0.5, filters=[("l_orderkey", "<", 1500)])
    expect = qt.sample(0.5).where("l_orderkey < 1500")
    assert flt.count() == expect.count()
    assert flt.exceptAll(expect).count() == 0
