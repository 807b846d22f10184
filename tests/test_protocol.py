"""Table-feature protocol (sources/log.py, Delta reader/writer-features
parity): feature upgrades ride commits, replay unions them, unknown
reader features fail reads loudly, unknown writer features fail writes."""

import json
import os

import pytest

import qbeast_spark_spark as qss
from qbeast_spark_spark.sources.log import CommitLog
from tests.conftest import load


def _mk(spark, path):
    qss.write(load(spark, "lineitem").limit(300), path,
              columns_to_index=["l_orderkey"], cube_size=100)
    return qss.QbeastTable.for_path(spark, path)


def test_dv_delete_raises_reader_feature_bar(spark, tmp_table):
    qt = _mk(spark, tmp_table)
    assert qt.snapshot().protocol.get("readerFeatures") in (None, [])
    qt.delete([("l_orderkey", "<", 100)], mode="dv")
    snap = qt.snapshot(refresh=True)
    assert "deletionVectors" in snap.protocol["readerFeatures"]
    assert "deletionVectors" in snap.protocol["writerFeatures"]
    # still perfectly readable/writable by this engine
    snap.assert_writable()
    assert qt.to_df().count() > 0


def test_cdf_enable_raises_writer_feature_bar(spark, tmp_table):
    qt = _mk(spark, tmp_table)
    qt.enable_change_data_feed()
    snap = qt.snapshot(refresh=True)
    assert "changeDataFeed" in snap.protocol["writerFeatures"]
    assert not snap.protocol.get("readerFeatures")  # readers unaffected


def _append_raw_commit(path, payload):
    log_dir = os.path.join(path, "_qbeast_log")
    v = max(int(f[:12]) for f in os.listdir(log_dir)
            if f.endswith(".json") and f[:12].isdigit()
            and ".checkpoint" not in f) + 1
    with open(os.path.join(log_dir, f"{v:012d}.json"), "w") as fh:
        json.dump(payload, fh)
    return v


def test_unknown_reader_feature_fails_reads_but_not_time_travel(
        spark, tmp_table):
    qt = _mk(spark, tmp_table)
    v_before = qt.snapshot(refresh=True).version
    _append_raw_commit(tmp_table, {
        "timestamp": 1, "dataChange": False, "add": [], "remove": [],
        "protocol": {"readerFeatures": ["rowTrackingV9"]}})
    with pytest.raises(RuntimeError, match="rowTrackingV9"):
        qss.QbeastTable.for_path(spark, tmp_table).snapshot()
    # time travel to before the upgrade still works (replay stops there)
    snap = CommitLog(tmp_table).snapshot(at_version=v_before)
    assert snap.files


def test_unknown_writer_feature_blocks_writes_not_reads(spark, tmp_table):
    qt = _mk(spark, tmp_table)
    _append_raw_commit(tmp_table, {
        "timestamp": 1, "dataChange": False, "add": [], "remove": [],
        "protocol": {"writerFeatures": ["icebergCompatV9"]}})
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    assert qt.to_df().count() == 300          # reads unaffected
    with pytest.raises(RuntimeError, match="icebergCompatV9"):
        qss.write(load(spark, "lineitem").limit(20), tmp_table,
                  columns_to_index=["l_orderkey"], cube_size=100,
                  mode="append")
    with pytest.raises(RuntimeError, match="icebergCompatV9"):
        qt.delete([("l_orderkey", "<", 10)])


def test_protocol_survives_checkpoints(spark, tmp_table):
    qt = _mk(spark, tmp_table)
    qt.delete([("l_orderkey", "<", 50)], mode="dv")
    r = load(spark, "lineitem").limit(50)
    for _ in range(12):                        # cross a checkpoint
        qss.write(r, tmp_table, columns_to_index=["l_orderkey"],
                  cube_size=100, mode="append")
    log = CommitLog(tmp_table)
    assert log._last_checkpoint_version() is not None
    snap = log.snapshot()
    assert "deletionVectors" in snap.protocol["readerFeatures"]
    assert "deletionVectors" in log.table_protocol()["readerFeatures"]


def test_constraints_raise_writer_feature_bar(spark, tmp_table):
    qt = _mk(spark, tmp_table)
    qt.add_constraint("key_pos", "l_orderkey >= 0")
    snap = qt.snapshot(refresh=True)
    assert "checkConstraints" in snap.protocol["writerFeatures"]
    # write-time constraints do the same on a fresh table
    p2 = tmp_table + "_w"
    qss.write(load(spark, "region"), p2,
              columns_to_index=["r_regionkey"], cube_size=100,
              constraints={"k": "r_regionkey >= 0"})
    assert "checkConstraints" in CommitLog(p2) \
        .table_protocol()["writerFeatures"]
