"""Logical conflict detection between concurrent transactions (Delta
ConflictChecker parity — the physical O_EXCL race only serializes log
versions; these tests cover the SEMANTIC races: two rewrites of the same
file, a stale read set, DV read-modify-write).

Reference analogue: the reference inherits Delta's ConflictChecker via
OptimisticTransaction (DeltaMetadataWriter.scala:162-228); its retry loop
(IndexedTable.scala:355-368) re-runs the whole operation on conflict.
"""


import pytest

from conftest import load
from qbeast_spark_spark.sources.log import (CommitLog,
                                            ConcurrentModificationError)


def _small_table(spark, path):
    import qbeast_spark_spark as qss

    li = load(spark, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity")
    qss.write(li, path, columns_to_index=["l_orderkey"], cube_size=2000)
    return qss.QbeastTable.for_path(spark, path)


def test_stale_remove_of_same_file_conflicts(spark, tmp_table):
    qt = _small_table(spark, tmp_table)
    snap = qt.snapshot(refresh=True)
    victim = sorted(snap.files)[0]
    # transaction A rewrites the file (normal delete)
    qt.delete([("l_orderkey", "<", 10**9)])
    # transaction B planned against the OLD snapshot and also rewrites it
    log = CommitLog(tmp_table)
    with pytest.raises(ConcurrentModificationError):
        log.commit(add=[], remove=[victim], read_version=snap.version,
                   data_change=True, operation="DELETE")


def test_stale_read_set_conflicts(spark, tmp_table):
    qt = _small_table(spark, tmp_table)
    snap = qt.snapshot(refresh=True)
    victim = sorted(snap.files)[0]
    qt.delete([("l_orderkey", "<", 10**9)])
    log = CommitLog(tmp_table)
    # B removes nothing but DECIDED from the removed file's contents
    with pytest.raises(ConcurrentModificationError):
        log.commit(add=[], remove=[], read_version=snap.version,
                   read_files=[victim], data_change=True,
                   operation="MERGE")


def test_concurrent_append_does_not_conflict(spark, tmp_table):
    import qbeast_spark_spark as qss

    qt = _small_table(spark, tmp_table)
    snap = qt.snapshot(refresh=True)
    victim = sorted(snap.files)[0]
    # a blind append lands in the gap — additions of NEW files never
    # invalidate another transaction's plan
    li = load(spark, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity").limit(50)
    qss.write(li, tmp_table, columns_to_index=["l_orderkey"],
              cube_size=2000, mode="append")
    log = CommitLog(tmp_table)
    v = log.commit(add=[], remove=[victim], read_version=snap.version,
                   data_change=True, operation="DELETE")
    assert v == snap.version + 2


def test_dv_readd_conflicts_with_stale_reader(spark, tmp_table):
    """A deletion-vector commit re-adds the same path (entry replaced in
    place): a transaction that read the pre-DV file state must abort, or
    its rewrite would resurrect the DV-deleted rows."""
    qt = _small_table(spark, tmp_table)
    snap = qt.snapshot(refresh=True)
    res = qt.delete([("l_orderkey", "<", 100)], mode="dv")
    assert res["files_dv"] >= 1
    changed = [rel for rel, f in
               qt.snapshot(refresh=True).files.items() if f.dv]
    log = CommitLog(tmp_table)
    with pytest.raises(ConcurrentModificationError):
        log.commit(add=[], remove=[changed[0]], read_version=snap.version,
                   data_change=True, operation="UPDATE")


def test_end_to_end_racing_deletes(spark, tmp_table, monkeypatch):
    """Real DML vs DML: a second delete commits in the window between the
    first delete's planning and its commit — the first must raise instead
    of double-rewriting the shared file (both re-adding their own copy of
    the survivors)."""
    import qbeast_spark_spark as qss

    qt = _small_table(spark, tmp_table)
    orig_commit = CommitLog.commit
    state = {"armed": True}

    def racing(self, **kw):
        if state["armed"] and kw.get("operation") == "DELETE" \
                and kw.get("remove"):
            state["armed"] = False     # the injected racer commits clean
            qt2 = qss.QbeastTable.for_path(spark, tmp_table)
            qt2.delete([("l_orderkey", ">=", 800)], mode="rewrite")
        return orig_commit(self, **kw)

    monkeypatch.setattr(CommitLog, "commit", racing)
    with pytest.raises(ConcurrentModificationError):
        qt.delete([("l_orderkey", ">=", 1000)], mode="rewrite")
    # the racer's result is intact and the loser changed nothing
    state["armed"] = False
    final = qss.QbeastTable.for_path(spark, tmp_table).to_df()
    assert final.where("l_orderkey >= 800").count() == 0
    n_expected = (load(spark, "lineitem")
                  .where("l_orderkey < 800").count())
    assert final.count() == n_expected


def test_optimize_aborts_when_file_deleted_under_it(spark, tmp_table,
                                                    monkeypatch):
    """Delta parity: OPTIMIZE fails (ConcurrentDeleteRead) when a
    concurrent DML removed a file it was re-laying out."""
    import qbeast_spark_spark as qss

    qt = _small_table(spark, tmp_table)
    orig_commit = CommitLog.commit
    state = {"armed": True}

    def racing(self, **kw):
        if state["armed"] and kw.get("operation") == "OPTIMIZE":
            state["armed"] = False
            qt2 = qss.QbeastTable.for_path(spark, tmp_table)
            qt2.delete([("l_orderkey", "<", 10**9)])  # rewrites all files
        return orig_commit(self, **kw)

    monkeypatch.setattr(CommitLog, "commit", racing)
    with pytest.raises(ConcurrentModificationError):
        qss.optimize_table(spark, tmp_table, fraction=1.0)


def test_restore_aborts_when_file_rewritten_under_it(spark, tmp_table,
                                                     monkeypatch):
    """A RESTORE re-adds every file of the target version, including ones
    still live NOW (absent from its remove set, which only lists
    cur-minus-old): a concurrent DELETE rewriting such a file must abort
    the restore, else both the stale re-add and the rewrite end up live
    (duplicated survivors + resurrected deleted rows)."""
    import qbeast_spark_spark as qss

    qt = _small_table(spark, tmp_table)
    n0 = qt.to_df().count()
    # v1: append so restore(0) has something to roll back
    from pyspark.sql import functions as F

    li = (load(spark, "lineitem")
          .select((F.col("l_orderkey") + 100000).alias("l_orderkey"),
                  "l_extendedprice", "l_quantity").limit(100))
    qss.write(li, tmp_table, columns_to_index=["l_orderkey"],
              cube_size=2000, mode="append")
    orig_commit = CommitLog.commit
    state = {"armed": True}

    def racing(self, **kw):
        if state["armed"] and kw.get("operation") == "RESTORE":
            state["armed"] = False
            qt2 = qss.QbeastTable.for_path(spark, tmp_table)
            qt2.delete([("l_orderkey", ">=", 1000)], mode="rewrite")
        return orig_commit(self, **kw)

    monkeypatch.setattr(CommitLog, "commit", racing)
    with pytest.raises(ConcurrentModificationError):
        qt.restore(0)
    # the delete won; no duplicates, no resurrections
    state["armed"] = False
    final = qss.QbeastTable.for_path(spark, tmp_table).to_df()
    assert final.where("l_orderkey >= 1000").count() == 0
    assert final.count() == final.dropDuplicates().count()
