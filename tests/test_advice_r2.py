"""Regression tests for the round-2 ADVICE items: non-numeric CC labels,
empty sample() filter lists, the idempotent-commit race window, spread()
memo staleness across appends, and unknown Delta reader features."""

import json
import os

from pyspark.sql import functions as F

import qbeast_spark_spark as qss
from conftest import load


def test_connected_components_string_ids(spark):
    """String node ids must both label correctly and converge early: the
    old label-sum convergence cast to decimal (NULL for strings) and
    silently ran all max_iter rounds (ADVICE r2 #1)."""
    from qbeast_spark_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-c", "doc-b"),   # chain: a-b-c
         ("doc-x", "doc-y")],                      # pair:  x-y
        ["id1", "id2"])
    got = {r["node"]: r["canonical"]
           for r in connected_components(pairs, max_iter=10).collect()}
    assert got == {"doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
                   "doc-x": "doc-x", "doc-y": "doc-x"}


def test_connected_components_numeric_ids_still_exact(spark):
    from qbeast_spark_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3), (10, 11)], ["id1", "id2"])
    got = {r["node"]: r["canonical"]
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_sample_empty_filters_list(spark, tmp_table):
    """sample(f, filters=[]) used to raise IndexError at filters[0]
    (ADVICE r2 #2); an empty list must mean 'no filter', like read()."""
    li = load(spark, "lineitem")
    qss.write(li, tmp_table, columns_to_index=["l_orderkey"], cube_size=500)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    assert qt.sample(0.3, filters=[]).count() == qt.sample(0.3).count()
    assert qt.sample(0.3, filters=()).count() == qt.sample(0.3).count()


def test_commit_rechecks_txn_inside_retry_loop(tmp_path):
    """Two writers that both passed a stale idempotent check must not both
    commit: commit() re-reads the committed txns before finalizing
    (ADVICE r2 #3)."""
    from qbeast_spark_spark.sources.log import CommitLog

    path = str(tmp_path / "t")
    os.makedirs(path)
    log = CommitLog(path)
    v0 = log.commit(add=[], remove=[],
                    txn={"appId": "ingest", "version": 7})
    assert v0 == 0
    n_files = len(os.listdir(log.log_dir))
    # a racing writer whose pre-commit snapshot predates v0 calls commit
    # with the same txn: it must skip, not double-commit
    v1 = log.commit(add=[], remove=[],
                    txn={"appId": "ingest", "version": 7})
    assert v1 == v0
    assert len(os.listdir(log.log_dir)) == n_files
    # a LOWER version of the same app also skips (SetTransaction <=)
    assert log.commit(add=[], remove=[],
                      txn={"appId": "ingest", "version": 3}) == v0
    # a higher version commits normally
    assert log.commit(add=[], remove=[],
                      txn={"appId": "ingest", "version": 8}) == 1


def test_spread_memo_not_stale_after_append(spark, tmp_path):
    """The split-count memo keyed on semanticHash alone returned stale
    counts after appends to the same path (ADVICE r2 #4)."""
    from qbeast_spark_spark.functions.partitioning import (_num_partitions,
                                                           spread)

    p = str(tmp_path / "pq")
    df = spark.range(0, 1000)
    df.coalesce(1).write.mode("overwrite").parquet(p)
    first = spark.read.parquet(p)
    assert _num_partitions(first) == 1
    assert spread(first).rdd.getNumPartitions() >= \
        spark.sparkContext.defaultParallelism
    # append more files: a re-read has the same semanticHash but must not
    # reuse the single-split answer
    df.repartition(8).write.mode("append").parquet(p)
    second = spark.read.parquet(p)
    n = _num_partitions(second)
    assert n is not None and n > 1


def test_delta_import_rejects_unknown_reader_features(spark, tmp_path):
    """A protocol action demanding reader features we don't implement
    (e.g. v2Checkpoint) must fail with a clear error, not a downstream
    FileNotFoundError (ADVICE r2 #5)."""
    import pytest

    from qbeast_spark_spark.sources.delta_import import read_delta_snapshot

    dl = str(tmp_path / "delta_t")
    os.makedirs(os.path.join(dl, "_delta_log"))
    li = load(spark, "lineitem").limit(10)
    li.coalesce(1).write.mode("append").parquet(dl)
    part = next(p for p in os.listdir(dl) if p.endswith(".parquet"))
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["v2Checkpoint"],
                      "writerFeatures": ["v2Checkpoint"]}},
        {"metaData": {"id": "t",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": li.schema.json(),
                      "partitionColumns": [], "configuration": {}}},
        {"add": {"path": part, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(dl, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(ValueError, match="v2Checkpoint"):
        read_delta_snapshot(dl)
    # tolerated features pass: timestampNtz alone is plain parquet
    actions[0]["protocol"]["readerFeatures"] = ["timestampNtz"]
    with open(os.path.join(dl, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    schema_json, files = read_delta_snapshot(dl)
    assert schema_json and len(files) == 1
