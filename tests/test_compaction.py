"""Small-file compaction (sources/compact.py): bin-packing without
re-indexing must preserve every logical row, keep sampling/pruning
correct, purge deletion vectors, and commit with dataChange=false."""

import os

import pytest
from pyspark.sql import functions as F

from conftest import load


@pytest.fixture()
def small_file_table(spark, tmp_table):
    """An indexed table deliberately fragmented into many small files:
    several appends at a small cube size."""
    import qbeast_spark_spark as qss

    li = load(spark, "lineitem").limit(3000)
    # first write pins the revision space over the full key range; the
    # appends fall inside it, so all files share one revision and the
    # table ends up fragmented across many small files
    qss.write(li.where(F.col("l_orderkey") % 3 == 0), tmp_table,
              columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=300,
              column_stats={"l_orderkey": {"min": 0, "max": 70000},
                            "l_extendedprice": {"min": 0.0,
                                                "max": 200000.0}})
    for i in (1, 2):
        qss.write(li.where(F.col("l_orderkey") % 3 == i), tmp_table,
                  columns_to_index=["l_orderkey", "l_extendedprice"],
                  cube_size=300)
    return tmp_table


def test_compact_reduces_files_preserves_rows(spark, small_file_table):
    import qbeast_spark_spark as qss

    qt = qss.QbeastTable.for_path(spark, small_file_table)
    before_files = len(qt.file_paths())
    before = qt.to_df()
    before_rows = before.count()
    before_data = sorted(map(tuple, before.collect()))

    v = qss.compact_table(spark, small_file_table,
                          target_file_bytes=64 * 1024 * 1024)
    assert v is not None

    qt2 = qss.QbeastTable.for_path(spark, small_file_table)
    after_files = len(qt2.file_paths())
    assert after_files < before_files
    after = qt2.to_df()
    assert after.count() == before_rows
    assert sorted(map(tuple, after.collect())) == before_data


def test_compact_preserves_block_accounting(spark, small_file_table):
    import qbeast_spark_spark as qss

    qt = qss.QbeastTable.for_path(spark, small_file_table)
    snap_before = qt.snapshot()
    per_cube_before = {}
    for f in snap_before.files.values():
        for b in f.blocks:
            per_cube_before[b.cube] = per_cube_before.get(b.cube, 0) + b.count

    qss.compact_table(spark, small_file_table)
    snap_after = qss.QbeastTable.for_path(spark, small_file_table).snapshot()
    per_cube_after = {}
    for f in snap_after.files.values():
        assert sum(b.count for b in f.blocks) == f.rows
        for b in f.blocks:
            per_cube_after[b.cube] = per_cube_after.get(b.cube, 0) + b.count
    assert per_cube_after == per_cube_before


def test_compact_keeps_sampling_and_pruning_exact(spark, small_file_table):
    import qbeast_spark_spark as qss

    qt = qss.QbeastTable.for_path(spark, small_file_table)
    n = qt.to_df().count()
    filt = [("l_orderkey", ">=", 1000), ("l_orderkey", "<", 4000)]
    expected_filtered = qt.read(filt).count()
    expected_sample = qt.sample(0.2).count()

    qss.compact_table(spark, small_file_table)
    qt2 = qss.QbeastTable.for_path(spark, small_file_table)
    assert qt2.to_df().count() == n
    assert qt2.read(filt).count() == expected_filtered
    # the hash-range sample is deterministic -> identical rows either way
    assert qt2.sample(0.2).count() == expected_sample
    # sampling still prunes: a 5% sample must not read every file
    if len(qt2.file_paths()) > 1:
        assert len(qt2.sample_files(0.05)) < len(qt2.file_paths())


def test_compact_purges_deletion_vectors(spark, small_file_table):
    import qbeast_spark_spark as qss

    qt = qss.QbeastTable.for_path(spark, small_file_table)
    n = qt.to_df().count()
    gone = qt.read([("l_orderkey", "<", 500)]).count()
    assert gone > 0
    qss.delete_rows(spark, small_file_table,
                    [("l_orderkey", "<", 500)], mode="dv")
    qt_dv = qss.QbeastTable.for_path(spark, small_file_table)
    assert qt_dv.to_df().count() == n - gone
    assert any(f.dv for f in qt_dv.snapshot().files.values())

    qss.compact_table(spark, small_file_table)
    qt2 = qss.QbeastTable.for_path(spark, small_file_table)
    snap = qt2.snapshot()
    assert not any(f.dv for f in snap.files.values())
    assert qt2.to_df().count() == n - gone
    assert qt2.read([("l_orderkey", "<", 500)]).count() == 0
    for f in snap.files.values():
        assert sum(b.count for b in f.blocks) == f.rows


def test_compact_is_no_op_when_files_are_large_enough(spark,
                                                      small_file_table):
    import qbeast_spark_spark as qss

    # every file is bigger than a 1-byte cutoff -> nothing qualifies
    assert qss.compact_table(spark, small_file_table,
                             min_file_bytes=1) is None


def test_compact_commit_is_data_change_false_and_time_travels(
        spark, small_file_table):
    import qbeast_spark_spark as qss
    from qbeast_spark_spark.sources.log import CommitLog

    log = CommitLog(small_file_table)
    v_before = log.snapshot().version
    qt = qss.QbeastTable.for_path(spark, small_file_table)
    rows = qt.to_df().count()

    v = qss.compact_table(spark, small_file_table)
    assert v == v_before + 1
    import json
    with open(os.path.join(small_file_table, "_qbeast_log",
                           f"{v:012d}.json")) as fh:
        commit = json.load(fh)
    assert commit["dataChange"] is False
    assert commit["add"] and commit["remove"]

    # the pre-compaction version still reads (old files stay on disk
    # until vacuum)
    assert qt.to_df(version=v_before).count() == rows


def test_compact_respects_staging_and_mixed_revisions(spark, tmp_table):
    import qbeast_spark_spark as qss

    li = load(spark, "lineitem").limit(2000)
    qss.write(li.where(F.col("l_orderkey") % 2 == 0), tmp_table,
              columns_to_index=["l_orderkey"], cube_size=300)
    qss.write_staging(li.where(F.col("l_orderkey") % 2 == 1)
                      .repartition(3), tmp_table)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    n = qt.to_df().count()
    snap = qt.snapshot()
    revs_before = {f.revision_id for f in snap.files.values()}
    assert revs_before == {0, 1}

    qss.compact_table(spark, tmp_table)
    qt2 = qss.QbeastTable.for_path(spark, tmp_table)
    assert qt2.to_df().count() == n
    # bins never mix revisions: staging output stays staging, indexed
    # output stays on its revision
    for f in qt2.snapshot().files.values():
        assert f.revision_id in revs_before
        assert sum(b.count for b in f.blocks) == f.rows


def test_compact_refreshes_column_stats_and_blooms(spark, tmp_table):
    import qbeast_spark_spark as qss
    from qbeast_spark_spark.functions.bloom import bloom_might_contain

    li = (load(spark, "lineitem").limit(2000)
          .withColumn("rid", F.format_string("id-%d", F.col("l_orderkey"))))
    for i in range(2):
        qss.write(li.where(F.col("l_orderkey") % 2 == i), tmp_table,
                  columns_to_index=["l_orderkey"], cube_size=500,
                  bloom_columns=["rid"])
    qss.compact_table(spark, tmp_table)
    snap = qss.QbeastTable.for_path(spark, tmp_table).snapshot()
    some_rid = li.select("rid").first()[0]
    for f in snap.files.values():
        assert f.column_stats and "l_orderkey" in f.column_stats
        lo, hi = f.column_stats["l_orderkey"]
        assert lo <= hi
        assert f.blooms and "rid" in f.blooms
    # bloom still answers point lookups (present id hits somewhere)
    assert any(bloom_might_contain(f.blooms["rid"], some_rid)
               for f in snap.files.values())


def test_compact_without_purge_skips_dv_files(spark, small_file_table):
    """purge_deletion_vectors=False must never resurrect DV-masked rows:
    DV-carrying files are not candidates (a DV cannot survive
    concatenation), other files still compact."""
    import qbeast_spark_spark as qss

    qt = qss.QbeastTable.for_path(spark, small_file_table)
    n = qt.to_df().count()
    gone = qt.read([("l_orderkey", "<", 500)]).count()
    qss.delete_rows(spark, small_file_table,
                    [("l_orderkey", "<", 500)], mode="dv")
    dv_files = {f.path for f in qss.QbeastTable.for_path(
        spark, small_file_table).snapshot().files.values() if f.dv}
    assert dv_files

    qss.compact_table(spark, small_file_table,
                      purge_deletion_vectors=False)
    qt2 = qss.QbeastTable.for_path(spark, small_file_table)
    snap = qt2.snapshot()
    # deleted rows stay deleted; DV files survive untouched
    assert qt2.to_df().count() == n - gone
    assert qt2.read([("l_orderkey", "<", 500)]).count() == 0
    assert dv_files <= set(snap.files)
    assert all(snap.files[p].dv for p in dv_files)
