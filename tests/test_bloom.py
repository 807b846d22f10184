"""Opt-in per-file Bloom filters for string point lookups
(functions/bloom.py + writer bloom_columns): membership semantics, the
no-false-negative guarantee, end-to-end file skipping, and preservation
across optimize."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import qbeast_spark_spark as qss
from qbeast_spark_spark.functions.bloom import (
    bloom_add_many,
    bloom_encode,
    bloom_might_contain,
    bloom_new,
    blooms_exclude,
)
from conftest import load


def test_bloom_no_false_negatives_and_low_fpr():
    bm = bloom_new(16384)
    members = [f"id-{i:06d}" for i in range(1000)]
    bloom_add_many(bm, members + [None])      # nulls are ignored
    enc = bloom_encode(bm)
    assert all(bloom_might_contain(enc, m) for m in members)
    probes = [f"absent-{i}" for i in range(2000)]
    fpr = sum(bloom_might_contain(enc, p) for p in probes) / len(probes)
    assert fpr < 0.1, fpr    # ~2% expected at 1000/16384, k=6


def test_blooms_exclude_semantics():
    bm = bloom_new(8192)
    bloom_add_many(bm, ["alpha", "beta"])
    blooms = {"name": bloom_encode(bm)}
    assert not blooms_exclude(blooms, [("name", "=", "alpha")])
    assert blooms_exclude(blooms, [("name", "=", "definitely-absent")])
    # IN prunes only when EVERY probed literal tests negative
    assert not blooms_exclude(blooms, [("name", "in", ["nope", "beta"])])
    assert blooms_exclude(blooms, [("name", "in", ["nope", "also-nope"])])
    # unknown column / range ops / non-string literals never prune
    assert not blooms_exclude(blooms, [("other", "=", "alpha")])
    assert not blooms_exclude(blooms, [("name", ">", "alpha")])
    assert not blooms_exclude(blooms, [("name", "=", 7)])
    assert not blooms_exclude(None, [("name", "=", "x")])


def test_bloom_point_lookup_skips_files(spark, tmp_table):
    li = (load(spark, "lineitem")
          .withColumn("row_id", F.format_string(
              "id-%06d-%d", F.col("l_orderkey"), F.col("l_linenumber"))))
    qss.write(li, tmp_table,
              columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=300, bloom_columns=["row_id"])
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    snap = qt.snapshot()
    n_files = len(snap.files)
    assert n_files > 3
    assert all(f.blooms and "row_id" in f.blooms
               for f in snap.files.values())

    # a present id: correct row back, and the probe reads only the
    # bloom-surviving files (typically 1 + rare false positives)
    target = li.orderBy("l_orderkey", "l_linenumber").first()["row_id"]
    probe = [("row_id", "=", target)]
    got = qt.read(probe)
    assert got.count() == li.where(F.col("row_id") == target).count()
    pruned = qt._prune_files(snap, probe)
    assert 0 < len(pruned) < n_files

    # an absent id: ZERO files read, empty result — min/max stats alone
    # could never prove this (the id sorts inside every file's range)
    absent = [("row_id", "=", "id-999999-9")]
    assert qt._prune_files(snap, absent) == []
    assert qt.read(absent).count() == 0

    # IN composes: one present + one absent value keeps only the
    # present value's files
    both = [("row_id", "in", [target, "id-999999-9"])]
    assert sorted(qt._prune_files(snap, both)) == sorted(pruned)

    # optimize preserves bloom coverage on the rewritten files
    qt.optimize()
    snap2 = qt.snapshot(refresh=True)
    assert all(f.blooms and "row_id" in f.blooms
               for f in snap2.files.values())
    assert qt._prune_files(snap2, absent) == []
    assert qt.read(probe).count() == 1


def test_bloom_columns_must_be_string(spark, tmp_table):
    li = load(spark, "lineitem")
    with pytest.raises(ValueError, match="string columns"):
        qss.write(li, tmp_table, columns_to_index=["l_orderkey"],
                  cube_size=500, bloom_columns=["l_orderkey"])
    with pytest.raises(ValueError, match="absent"):
        qss.write(li, tmp_table, columns_to_index=["l_orderkey"],
                  cube_size=500, bloom_columns=["nope"])
