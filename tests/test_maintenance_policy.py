"""auto_maintain (sources/maintenance.py): the threshold-driven
maintenance loop — index the staging backlog, compact small files,
vacuum — and its hook in the streaming ingest sink."""

import os

import pytest
from pyspark.sql import functions as F

from conftest import load


def test_noop_on_healthy_table(spark, tmp_table):
    import qbeast_spark_spark as qss

    li = load(spark, "lineitem").limit(1000)
    qss.write(li, tmp_table, columns_to_index=["l_orderkey"])
    report = qss.auto_maintain(spark, tmp_table, max_small_files=10_000)
    assert "optimize_staging" not in report
    assert "compact" not in report


def test_noop_on_missing_table(spark, tmp_table):
    import qbeast_spark_spark as qss

    assert qss.auto_maintain(spark, tmp_table) == {}


def test_staging_backlog_gets_indexed(spark, tmp_table):
    import qbeast_spark_spark as qss
    from qbeast_spark_spark.core.revision import STAGING_REVISION_ID

    li = load(spark, "lineitem").limit(2000)
    qss.write(li.where(F.col("l_orderkey") % 2 == 0), tmp_table,
              columns_to_index=["l_orderkey"], cube_size=500)
    qss.write_staging(li.where(F.col("l_orderkey") % 2 == 1), tmp_table)
    n = qss.QbeastTable.for_path(spark, tmp_table).to_df().count()

    report = qss.auto_maintain(spark, tmp_table, max_staging_rows=10,
                               max_small_files=10_000)
    assert "optimize_staging" in report
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    snap = qt.snapshot()
    assert not any(f.revision_id == STAGING_REVISION_ID
                   for f in snap.files.values())
    assert qt.to_df().count() == n


def test_small_files_get_compacted(spark, tmp_table):
    import qbeast_spark_spark as qss

    li = load(spark, "lineitem").limit(3000)
    qss.write(li, tmp_table, columns_to_index=["l_orderkey"], cube_size=200)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    before = len(qt.file_paths())
    assert before > 2
    n = qt.to_df().count()

    report = qss.auto_maintain(spark, tmp_table, max_small_files=2)
    assert "compact" in report
    qt2 = qss.QbeastTable.for_path(spark, tmp_table)
    assert len(qt2.file_paths()) < before
    assert qt2.to_df().count() == n


def test_vacuum_step_reclaims_dropped_files(spark, tmp_table):
    import qbeast_spark_spark as qss

    li = load(spark, "lineitem").limit(3000)
    qss.write(li, tmp_table, columns_to_index=["l_orderkey"], cube_size=200)
    qss.compact_table(spark, tmp_table)

    # without vacuum: old files linger on disk
    on_disk = [p for p in os.listdir(tmp_table) if p.endswith(".parquet")]
    live = [os.path.basename(p) for p in
            qss.QbeastTable.for_path(spark, tmp_table).file_paths()]
    assert len(on_disk) > len(live)

    report = qss.auto_maintain(spark, tmp_table, max_small_files=10_000,
                               vacuum_retention_hours=0.0)
    assert report.get("vacuum")
    on_disk2 = [p for p in os.listdir(tmp_table) if p.endswith(".parquet")]
    assert sorted(on_disk2) == sorted(live)


def test_streaming_sink_runs_maintenance(spark, tmp_path):
    import qbeast_spark_spark as qss
    from qbeast_spark_spark.streaming.ingest import stream_write_qbeast

    li = load(spark, "lineitem").limit(3000)
    src = str(tmp_path / "src")
    # several source files -> several micro-batches
    li.repartition(6).write.parquet(src)
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    stream = (spark.readStream.schema(li.schema)
              .option("maxFilesPerTrigger", "2").parquet(src))
    q = stream_write_qbeast(
        stream, table, columns_to_index=["l_orderkey"], cube_size=300,
        checkpoint=ckpt, trigger_available_now=True,
        maintain_every=2,
        maintain_kwargs={"max_small_files": 2,
                         "small_file_bytes": 32 * 1024 * 1024})
    q.awaitTermination(120)

    qt = qss.QbeastTable.for_path(spark, table)
    assert qt.to_df().count() == 3000
    # maintenance compacted at least once: a dataChange=false commit exists
    history = qt.log.history()
    assert any(c.get("dataChange") is False for c in history)
    # and the result still reads exactly
    assert qt.to_df().exceptAll(spark.read.parquet(src)).count() == 0


def test_table_facade_compact_and_maintain(spark, tmp_table):
    import qbeast_spark_spark as qss

    li = load(spark, "lineitem").limit(3000)
    qss.write(li, tmp_table, columns_to_index=["l_orderkey"], cube_size=200)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    before = len(qt.file_paths())
    n = qt.to_df().count()
    v = qt.compact()
    assert v is not None
    # facade refreshes its own snapshot
    assert len(qt.file_paths()) < before
    assert qt.to_df().count() == n
    assert qt.maintain(max_small_files=10_000) == {}


def test_revision_sprawl_gets_consolidated(spark, tmp_table):
    """Appends that widen the space mint new revisions; files stranded on
    old revisions can neither optimize-by-fraction nor compact together.
    auto_maintain folds them into the latest revision."""
    import qbeast_spark_spark as qss

    li = load(spark, "lineitem").limit(3000)
    for i in range(3):   # each chunk widens the space -> 3 revisions
        qss.write(li.where(F.col("l_orderkey") % 3 == i), tmp_table,
                  columns_to_index=["l_orderkey", "l_extendedprice"],
                  cube_size=300)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    n = qt.to_df().count()
    revs = {f.revision_id for f in qt.snapshot().files.values()}
    assert len(revs) == 3

    report = qss.auto_maintain(spark, tmp_table, max_revisions=1,
                               max_small_files=10_000)
    assert "consolidate_revisions" in report
    qt2 = qss.QbeastTable.for_path(spark, tmp_table)
    revs2 = {f.revision_id for f in qt2.snapshot().files.values()}
    assert len(revs2) == 1
    assert qt2.to_df().count() == n
    # the consolidated table samples with pruning like any indexed table
    assert 0 < qt2.sample(0.3).count() < n
    # and now compaction CAN bin everything together
    if len(qt2.file_paths()) > 1:
        assert qss.compact_table(spark, tmp_table) is not None
        assert qss.QbeastTable.for_path(
            spark, tmp_table).to_df().count() == n


def test_restore_rolls_back_and_preserves_history(spark, tmp_table):
    import qbeast_spark_spark as qss

    li = load(spark, "lineitem").limit(2000)
    qss.write(li.where(F.col("l_orderkey") % 2 == 0), tmp_table,
              columns_to_index=["l_orderkey"], cube_size=500)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    v0 = qt.snapshot().version
    n0 = qt.to_df().count()
    data0 = sorted(map(tuple, qt.to_df().collect()))

    qss.write(li.where(F.col("l_orderkey") % 2 == 1), tmp_table,
              columns_to_index=["l_orderkey"], cube_size=500)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    assert qt.to_df().count() > n0

    v_restore = qt.restore(v0)
    assert v_restore > v0
    assert qt.to_df().count() == n0
    assert sorted(map(tuple, qt.to_df().collect())) == data0
    # history preserved: the pre-restore state is still time-travelable
    assert qt.to_df(version=v_restore - 1).count() > n0
    # sampling and appends work on the restored state
    assert 0 < qt.sample(0.5).count() < n0
    qss.write(li.where(F.col("l_orderkey") % 2 == 1), tmp_table,
              columns_to_index=["l_orderkey"], cube_size=500)
    qt2 = qss.QbeastTable.for_path(spark, tmp_table)
    assert qt2.to_df().count() == li.count()
    assert qt2.to_df().exceptAll(li).count() == 0


def test_restore_refuses_after_vacuum(spark, tmp_table):
    import qbeast_spark_spark as qss

    li = load(spark, "lineitem").limit(2000)
    qss.write(li, tmp_table, columns_to_index=["l_orderkey"], cube_size=300)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    v0 = qt.snapshot().version
    qt.optimize()                        # rewrites files; old ones dangle
    qt.vacuum(retention_hours=0.0)       # ...and are now gone
    with pytest.raises(ValueError, match="vacuumed"):
        qt.restore(v0)


def test_detail_summary(spark, tmp_table):
    import qbeast_spark_spark as qss

    li = load(spark, "lineitem").limit(2000)
    qss.write(li, tmp_table, columns_to_index=["l_orderkey"], cube_size=400,
              constraints={"qty_pos": "l_quantity > 0"})
    qss.write_staging(li.limit(100), tmp_table)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    d = qt.detail()
    assert d["numRows"] == 2100
    assert d["numFiles"] == len(qt.file_paths())
    assert d["sizeInBytes"] > 0
    assert d["numStagingFiles"] >= 1
    assert 0 in d["revisions"] and len(d["revisions"]) == 2
    assert d["constraints"] == ["qty_pos"]
    assert d["version"] == qt.snapshot().version
    qss.delete_rows(spark, tmp_table, [("l_orderkey", "<", 500)], mode="dv")
    d2 = qss.QbeastTable.for_path(spark, tmp_table).detail()
    assert d2["numFilesWithDeletionVectors"] >= 1
    assert d2["numRows"] < 2100


def test_concurrent_appends_race_compaction(spark, tmp_table):
    """Appends from several threads racing a compactor: the O_EXCL commit
    protocol serializes log versions, compaction's late-conflict guard
    drops bins whose inputs changed, and no row is lost or duplicated.
    (Appends only ADD files, so a compacted input can never vanish —
    the one maintenance/DML combination that is race-safe by design.)"""
    import threading

    import qbeast_spark_spark as qss

    li = load(spark, "lineitem").limit(2400).cache()
    li.count()
    qss.write(li.where(F.col("l_orderkey") % 4 == 0), tmp_table,
              columns_to_index=["l_orderkey"], cube_size=400,
              column_stats={"l_orderkey": {"min": 0, "max": 70000}})
    errors = []

    def appender(i):
        try:
            qss.write(li.where(F.col("l_orderkey") % 4 == i), tmp_table,
                      columns_to_index=["l_orderkey"], cube_size=400)
        except Exception as e:       # pragma: no cover
            errors.append(e)

    def compactor():
        try:
            for _ in range(3):
                qss.compact_table(spark, tmp_table,
                                  target_file_bytes=64 * 1024 * 1024)
        except Exception as e:       # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=appender, args=(i,))
               for i in (1, 2, 3)] + [threading.Thread(target=compactor)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    qt = qss.QbeastTable.for_path(spark, tmp_table)
    got = qt.to_df()
    assert got.count() == li.count()
    assert got.exceptAll(li).count() == 0
    # block accounting stayed consistent through the races
    for f in qt.snapshot().files.values():
        assert sum(b.count for b in f.blocks) == f.rows
    li.unpersist()


def test_history_records_operation_verbs(spark, tmp_table):
    import qbeast_spark_spark as qss

    li = load(spark, "lineitem").limit(2000)
    qss.write(li, tmp_table, columns_to_index=["l_orderkey"], cube_size=300)
    qss.delete_rows(spark, tmp_table, [("l_orderkey", "<", 200)],
                    mode="rewrite")
    qss.update_rows(spark, tmp_table,
                    {"l_quantity": "l_quantity + 1.0"},
                    [("l_orderkey", "<", 1000)])
    qss.compact_table(spark, tmp_table)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    v0 = qt.snapshot().version
    qt.add_constraint("qp", "l_quantity > 0")
    qt.restore(v0)
    qt.optimize()
    ops = [h["operation"] for h in qt.log.history()]
    assert ops == ["APPEND", "DELETE", "UPDATE", "COMPACT",
                   "ADD CONSTRAINT", "RESTORE", "OPTIMIZE"]
