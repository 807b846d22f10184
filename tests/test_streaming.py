"""Structured Streaming tests: foreachBatch qbeast ingest, watermarked
windows, applyInPandasWithState custom stateful op."""

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import qbeast_spark_spark as qss
from qbeast_spark_spark.streaming.ingest import (
    stateful_running_totals,
    stream_write_qbeast,
    windowed_aggregate,
)

from conftest import load


EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])


def _make_events(spark, n=200, start_hour=0):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, i % 7,
         base + dt.timedelta(hours=start_hour, minutes=(i * 7) % 180),
         float(i % 100))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_stream_ingest_foreachbatch(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    # two source files -> two-ish micro-batches
    _make_events(spark, 150, 0).coalesce(1).write.mode("append").parquet(src)
    _make_events(spark, 150, 200).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1).parquet(src)
    q = stream_write_qbeast(stream, table,
                            columns_to_index=["user_id", "value"],
                            cube_size=100, checkpoint=ckpt,
                            trigger_available_now=True)
    q.awaitTermination(120)

    qt = qss.QbeastTable.for_path(spark, table)
    got = qt.to_df()
    expect = spark.read.parquet(src)
    assert got.count() == 300
    assert got.exceptAll(expect).count() == 0
    # multiple commits happened (one per micro-batch)
    assert qt.snapshot().version >= 1
    # sampling works on the streamed table
    assert 0 < qt.sample(0.5).count() < 300


def test_windowed_aggregate_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    # two micro-batches; the second is far in the future so the watermark
    # closes (and append-mode emits) the first batch's windows
    _make_events(spark, 240).coalesce(1).write.mode("append").parquet(src)
    _make_events(spark, 20, start_hour=500).coalesce(1).write.mode(
        "append").parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1).parquet(src)
    agg = windowed_aggregate(stream, "ts", window="1 hour",
                             watermark="2 hours", group_cols=["user_id"],
                             agg_col="value")
    out = str(tmp_path / "out")
    q = (agg.writeStream.format("parquet")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .option("path", out)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "user_id", "n",
                "sum_value")
    )
    # append mode emits only watermark-closed windows; every emitted row
    # must match the batch computation exactly
    assert got.count() > 0
    emitted = got.select("window_start", "user_id", "n", "sum_value")
    expected = batch.select(
        "window_start", "user_id",
        F.col("n").alias("n_b"), F.col("sum_value").alias("sum_b"))
    j = emitted.join(expected, ["window_start", "user_id"], "left")
    bad = j.where(F.col("n_b").isNull() | (F.col("n") != F.col("n_b"))
                  | (F.abs(F.col("sum_value") - F.col("sum_b")) > 1e-6))
    assert bad.count() == 0


def test_stateful_running_totals(spark, tmp_path):
    src = str(tmp_path / "src")
    _make_events(spark, 100).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    totals = stateful_running_totals(stream, "user_id", "value")
    out_rows = []

    def collect_batch(df, _bid):
        out_rows.extend(df.collect())

    q = (totals.writeStream.foreachBatch(collect_batch)
         .option("checkpointLocation", str(tmp_path / "ck3"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["user_id"]: (r["n_events"], r["total"]) for r in out_rows}
    expect = {
        r["user_id"]: (r["n"], r["s"])
        for r in spark.read.parquet(src).groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s")).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0]
        assert abs(got[k][1] - expect[k][1]) < 1e-6


def test_session_aggregate_closes_sessions(spark, tmp_path):
    from qbeast_spark_spark.streaming.ingest import session_aggregate

    src = str(tmp_path / "src_sess")
    # batch 1: a burst; batch 2 far in the future closes every session
    _make_events(spark, 120).coalesce(1).write.mode("append").parquet(src)
    _make_events(spark, 10, start_hour=500).coalesce(1).write.mode(
        "append").parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1).parquet(src)
    agg = session_aggregate(stream, "ts", gap="15 minutes",
                            watermark="1 hour", group_cols=["user_id"],
                            agg_col="value")
    out = str(tmp_path / "out_sess")
    q = (agg.writeStream.format("parquet")
         .option("checkpointLocation", str(tmp_path / "ck_sess"))
         .option("path", out)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() > 0
    # session invariants: end > start; per-user sessions don't overlap
    assert got.where(F.col("session_end") <= F.col("session_start")
                     ).count() == 0
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("session_start")
    overlaps = (got.withColumn("prev_end", F.lag("session_end").over(w))
                .where(F.col("prev_end").isNotNull()
                       & (F.col("session_start") < F.col("prev_end"))))
    assert overlaps.count() == 0
    # totals conserved for the closed portion: every batch-1 event is in
    # exactly one emitted session
    assert got.agg(F.sum("n")).collect()[0][0] >= 120


def test_stream_dedup_within_watermark(spark, tmp_path):
    from qbeast_spark_spark.streaming.ingest import stream_dedup

    src = str(tmp_path / "src_dd")
    ev = _make_events(spark, 100)
    # duplicate every event (same event_id, same ts) in the same batch
    ev.union(ev).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1).parquet(src)
    dd = stream_dedup(stream, ["event_id"], "ts", watermark="1 hour")
    out = str(tmp_path / "out_dd")
    q = (dd.writeStream.format("parquet")
         .option("checkpointLocation", str(tmp_path / "ck_dd"))
         .option("path", out)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 100
    assert got.select("event_id").distinct().count() == 100


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join returns exactly the batch
    join: every (impression, click) pair with the click inside the lag
    window, and state bounded by the watermarks."""
    from qbeast_spark_spark.streaming.ingest import stream_stream_join

    left_src = str(tmp_path / "imps")
    right_src = str(tmp_path / "clicks")
    imps = _make_events(spark, 120)
    clicks = (_make_events(spark, 120)
              .withColumn("ts", F.col("ts")
                          + F.expr("INTERVAL 5 MINUTES"))
              .withColumnRenamed("event_id", "click_id"))
    imps.coalesce(1).write.mode("append").parquet(left_src)
    clicks.coalesce(1).write.mode("append").parquet(right_src)

    click_schema = T.StructType([
        T.StructField("click_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    lstream = spark.readStream.schema(EVENT_SCHEMA).parquet(left_src)
    rstream = spark.readStream.schema(click_schema).parquet(right_src)
    joined = stream_stream_join(
        lstream, rstream, key="user_id", left_ts="ts", right_ts="ts",
        watermark="3 hours", max_lag="INTERVAL 10 MINUTES")
    out = str(tmp_path / "joined_out")
    ckpt = str(tmp_path / "joined_ckpt")
    q = (joined.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    expect = (imps.alias("l")
              .join(clicks.select(F.col("click_id").alias("click_id_r"),
                                  F.col("user_id").alias("user_id_r"),
                                  F.col("ts").alias("ts_r"),
                                  F.col("value").alias("value_r")),
                    (F.col("l.user_id") == F.col("user_id_r"))
                    & (F.col("ts_r") >= F.col("l.ts"))
                    & (F.col("ts_r") <= F.col("l.ts")
                       + F.expr("INTERVAL 10 MINUTES"))))
    assert got.count() == expect.count() > 0
    assert got.select("event_id", "click_id_r").exceptAll(
        expect.select("event_id", "click_id_r")).count() == 0


def test_stream_dedup_ingest_pipeline(spark, tmp_path):
    """The production crawl-ingest shape end-to-end: a seeded corpus +
    signature store, then a streamed batch containing (a) near-dups of
    corpus docs, (b) an intra-batch near-dup pair, (c) fresh docs. Only
    the fresh docs and one of each intra-batch pair may land; the
    signature store grows by exactly the survivors."""
    import os

    import qbeast_spark_spark as qss
    from qbeast_spark_spark.operators.dedup import minhash_signatures
    from qbeast_spark_spark.streaming.ingest import stream_dedup_ingest

    table = str(tmp_path / "corpus")
    sig_path = str(tmp_path / "sigs")
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    base = ("the quick brown fox jumps over the lazy dog while "
            "seventeen sleepy penguins waddle across the frozen shore "
            "carrying umbrellas and singing quiet songs about summer")
    corpus = spark.createDataFrame(
        [(i, base + f" tail variant {i}") for i in range(10)],
        ["doc_id", "text"])
    qss.write(corpus, table, columns_to_index=["doc_id"], cube_size=100)
    # seed the store in its per-batch layout (negative id = a
    # consolidation/seed directory, never a checkpoint batch id)
    minhash_signatures(corpus).write.mode("overwrite") \
        .parquet(sig_path + "/batch=-1")
    n_sigs0 = spark.read.parquet(sig_path).count()

    # incoming: 100/101 near-dup corpus doc 0; 102/103 near-dup each
    # other; 104/105 fresh distinct docs
    fresh_a = ("completely different content about databases indexes "
               "shuffles partitions and the gentle art of benchmarking "
               "distributed query engines on cold winter mornings today")
    fresh_b = ("unrelated recipe for bread flour water salt yeast time "
               "patience folding shaping baking crust crumb steam oven "
               "stone temperature hydration schedule notes and a diary")
    batch = spark.createDataFrame(
        [(100, base + " tail variant 0 extra"),
         (101, base + " tail variant 0"),
         (102, fresh_a + " first copy marker"),
         (103, fresh_a + " first copy marker again"),
         (104, fresh_b),
         (105, "tiny short doc unlike anything else entirely novel "
               "words assembled uniquely here with no repeated phrases "
               "from other documents in this synthetic little corpus"),
         # < n tokens: no shingles — exercised the whole-doc signature
         # fallback; 107 is an exact duplicate of 106 and must drop
         (106, "two words"),
         (107, "two words")],
        ["doc_id", "text"])
    batch.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = stream_dedup_ingest(stream, table, sig_path,
                            columns_to_index=["doc_id"], cube_size=100,
                            threshold=0.5, checkpoint=ckpt,
                            trigger_available_now=True)
    q.awaitTermination(120)

    final = qss.QbeastTable.for_path(spark, table).to_df()
    landed = {r.doc_id for r in
              final.where("doc_id >= 100").select("doc_id").collect()}
    # corpus near-dups dropped
    assert 100 not in landed and 101 not in landed
    # exactly one of the intra-batch pair survives (the smaller id)
    assert 102 in landed and 103 not in landed
    # fresh docs land
    assert {104, 105} <= landed
    # short docs: one of the exact-dup pair lands via the whole-doc
    # signature fallback (without it both would land and neither would
    # ever reach the store)
    assert 106 in landed and 107 not in landed
    # store grew by exactly the survivors
    n_sigs1 = spark.read.parquet(sig_path).count()
    assert n_sigs1 == n_sigs0 + len(landed)

    # -- crash replay (VERDICT r4 "What's wrong #2"): the worst case is
    # a crash AFTER both writes but BEFORE the checkpoint commit — the
    # whole batch re-runs with the same batch id. Emulate with a fresh
    # checkpoint over the same source: the data commit hits the
    # idempotent txn skip, and the signature write OVERWRITES its
    # per-batch directory instead of appending duplicates.
    n_table = final.count()
    q2 = stream_dedup_ingest(stream, table, sig_path,
                             columns_to_index=["doc_id"], cube_size=100,
                             threshold=0.5,
                             checkpoint=str(tmp_path / "ckpt_replay"),
                             trigger_available_now=True)
    q2.awaitTermination(120)
    assert qss.QbeastTable.for_path(spark, table).to_df().count() \
        == n_table
    sigs = spark.read.parquet(sig_path)
    assert sigs.count() == n_sigs1
    # exactly one signature row per surviving doc
    assert sigs.select("doc_id").distinct().count() == n_sigs1

    # -- cross-batch exact same-id dedup (r5 review finding): a doc
    # RE-DELIVERED in a later batch with an id already in the store
    # must still be dropped — only the CURRENT batch's own store
    # directory is exempt from corpus matching, not all same-id rows
    batch2 = spark.createDataFrame(
        [(104, fresh_b),                      # re-crawl of a stored doc
         (108, "genuinely new second batch document with its own "
               "vocabulary nothing shared with any earlier text "
               "entirely separate topic matter and phrasing choices")],
        ["doc_id", "text"])
    batch2.coalesce(1).write.mode("append").parquet(src)
    q3 = stream_dedup_ingest(stream, table, sig_path,
                             columns_to_index=["doc_id"], cube_size=100,
                             threshold=0.5, checkpoint=ckpt,
                             trigger_available_now=True)
    q3.awaitTermination(120)
    final2 = qss.QbeastTable.for_path(spark, table).to_df()
    assert final2.where("doc_id = 104").count() == 1   # not re-ingested
    assert final2.where("doc_id = 108").count() == 1   # fresh doc landed
    n_sigs2 = spark.read.parquet(sig_path).count()
    assert n_sigs2 == n_sigs1 + 1                      # only 108's sig

    # -- store compaction: fold the seed dir + batch dirs into one,
    # still one row per doc; a second pass is a no-op
    from qbeast_spark_spark.streaming.ingest import compact_sig_store

    new_id = compact_sig_store(spark, sig_path)
    assert new_id is not None and new_id < 0
    sigs = spark.read.parquet(sig_path)
    assert sigs.count() == n_sigs2
    assert sigs.select("doc_id").distinct().count() == n_sigs2
    assert compact_sig_store(spark, sig_path) is None

    # -- the consolidated store still dedups the NEXT batch (corpus
    # matching reads the negative-id dir), and the sink-level
    # compact_store_every hook runs after the batch
    batch3 = spark.createDataFrame(
        [(109, fresh_b + " tiny tail"),       # near-dup of stored 104
         (110, "final batch brand new content on astronomy telescopes "
               "mirrors apertures eyepieces tracking mounts and the "
               "quiet patience of long exposure photography at night")],
        ["doc_id", "text"])
    batch3.coalesce(1).write.mode("append").parquet(src)
    q4 = stream_dedup_ingest(stream, table, sig_path,
                             columns_to_index=["doc_id"], cube_size=100,
                             threshold=0.5, checkpoint=ckpt,
                             trigger_available_now=True,
                             compact_store_every=1)
    q4.awaitTermination(120)
    final3 = qss.QbeastTable.for_path(spark, table).to_df()
    assert final3.where("doc_id = 109").count() == 0   # corpus near-dup
    assert final3.where("doc_id = 110").count() == 1
    # compact_store_every must NOT fold the in-flight batch's own
    # directory (ADVICE r5: folding it before the checkpoint commits
    # would void the own-batch corpus exclusion on a replay): the
    # current batch's namespaced dir survives next to the earlier
    # consolidation, and joins a LATER compaction cycle instead
    dirs = sorted(d for d in os.listdir(sig_path)
                  if d.startswith("batch="))
    assert len(dirs) == 2, dirs
    assert any(d.startswith("batch=qbeast-dedup-ingest-") for d in dirs), dirs
    sigs = spark.read.parquet(sig_path)
    assert sigs.count() == n_sigs2 + 1
    assert sigs.select("doc_id").distinct().count() == n_sigs2 + 1
    # a later ONLINE pass still protects the namespace's newest batch
    # (another query could be mid two-phase commit), so it folds nothing
    # here (only 1 other dir < min_dirs)...
    from qbeast_spark_spark.streaming.ingest import compact_sig_store
    assert compact_sig_store(spark, sig_path) is None
    # ... while OFFLINE compaction of a stopped store folds everything
    assert compact_sig_store(spark, sig_path,
                             protect_latest=False) is not None
    dirs = [d for d in os.listdir(sig_path) if d.startswith("batch=")]
    assert len(dirs) == 1, dirs
    assert spark.read.parquet(sig_path).count() == n_sigs2 + 1


def test_sig_store_flat_layout_migration(spark, tmp_path):
    """A store written by the pre-r5 flat-append layout is adopted into
    the per-batch layout on the next read: root parquet files move into
    batch=-1, partition discovery sees one depth, rows survive."""
    import os

    from qbeast_spark_spark.operators.dedup import minhash_signatures
    from qbeast_spark_spark.streaming.ingest import _migrate_flat_store

    sig_path = str(tmp_path / "flat_sigs")
    docs = spark.createDataFrame(
        [(i, f"some document number {i} with plenty of words to "
             f"shingle across the board for test {i}") for i in range(8)],
        ["doc_id", "text"])
    minhash_signatures(docs).write.mode("overwrite").parquet(sig_path)
    # overwrite-mode leaves flat part files at the root (legacy layout)
    flat = [f for f in os.listdir(sig_path) if f.endswith(".parquet")]
    assert flat
    n0 = spark.read.parquet(sig_path).count()
    _migrate_flat_store(spark, sig_path)
    assert not [f for f in os.listdir(sig_path) if f.endswith(".parquet")]
    assert os.path.isdir(os.path.join(sig_path, "batch=-1"))
    after = spark.read.parquet(sig_path)
    assert after.count() == n0 and "batch" in after.columns
    # idempotent
    _migrate_flat_store(spark, sig_path)
    assert spark.read.parquet(sig_path).count() == n0


def test_sig_store_two_queries_no_collision(spark, tmp_path):
    """Two streaming queries sharing one sig_path both start at batch 0;
    the query-name-namespaced directories (ADVICE r5) keep them from
    overwriting each other's signatures."""
    import os

    import qbeast_spark_spark as qss
    from qbeast_spark_spark.streaming.ingest import stream_dedup_ingest

    sig_path = str(tmp_path / "shared_sigs")
    texts = {
        "a": "alpha corpus text about rivers valleys stones and the "
             "slow patience of erosion across geological time spans",
        "b": "beta corpus text concerning harbor cranes containers "
             "manifests customs and the logistics of modern shipping",
    }
    handles = {}
    for tag, text in texts.items():
        src = str(tmp_path / f"src_{tag}")
        os.makedirs(src)
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        df.coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        handles[tag] = stream_dedup_ingest(
            stream, str(tmp_path / f"tbl_{tag}"), sig_path,
            columns_to_index=["doc_id"], cube_size=100,
            checkpoint=str(tmp_path / f"ckpt_{tag}"),
            trigger_available_now=True, query_name=f"ingest-{tag}")
    for q in handles.values():
        q.awaitTermination(120)
    dirs = sorted(d for d in os.listdir(sig_path)
                  if d.startswith("batch="))
    assert dirs == ["batch=ingest-a-0", "batch=ingest-b-0"], dirs
    # both queries' signatures present — nothing overwrote anything
    sigs = spark.read.parquet(sig_path)
    assert sigs.count() == 2
    assert sorted(r.batch for r in sigs.select("batch").collect()) \
        == ["ingest-a-0", "ingest-b-0"]


def test_sig_store_repeated_compaction_cycles(spark, tmp_path):
    """Alternating batch appends and OFFLINE compactions
    (protect_latest=False — the writer is stopped between cycles): each
    consolidation must pick a NEVER-USED negative id (no overwrite of
    the only copy), and the store always reads back with one row per
    doc."""
    import os

    sig_path = str(tmp_path / "cycle_sigs")
    from qbeast_spark_spark.streaming.ingest import compact_sig_store

    def write_batch(bid, ids):
        df = spark.createDataFrame([(i, i * 7) for i in ids],
                                   "doc_id long, mh0 long")
        df.write.mode("overwrite").parquet(f"{sig_path}/batch={bid}")

    seen_dirs = set()
    next_id = 0
    total_ids = set()
    for cycle in range(3):
        for _ in range(2):
            ids = list(range(next_id * 10, next_id * 10 + 5))
            total_ids.update(ids)
            write_batch(next_id, ids)
            next_id += 1
        new_id = compact_sig_store(spark, sig_path, protect_latest=False)
        assert new_id is not None and new_id < 0
        assert new_id not in seen_dirs
        seen_dirs.add(new_id)
        dirs = [d for d in os.listdir(sig_path) if d.startswith("batch=")]
        assert dirs == [f"batch={new_id}"]
        got = spark.read.parquet(sig_path)
        assert got.count() == len(total_ids)
        assert got.select("doc_id").distinct().count() == len(total_ids)


def test_sig_store_online_compaction_protects_other_writers(spark,
                                                            tmp_path):
    """r6 review: an ONLINE compaction (triggered by query A's sink)
    must not fold the NEWEST batch directory of ANY writer namespace —
    another query sharing the store may be mid two-phase commit on its
    latest batch. Older directories of every namespace still fold."""
    import os

    sig_path = str(tmp_path / "multi_sigs")
    from qbeast_spark_spark.streaming.ingest import compact_sig_store

    def write_batch(val, ids):
        df = spark.createDataFrame([(i, i * 7) for i in ids],
                                   "doc_id long, mh0 long")
        df.write.mode("overwrite").parquet(f"{sig_path}/batch={val}")

    write_batch("qa-0", [1, 2])
    write_batch("qa-1", [3, 4])        # A's newest
    write_batch("qb-0", [5, 6])
    write_batch("qb-1", [7, 8])        # B's newest: possibly in-flight
    write_batch("7", [9])              # legacy writer's newest
    new_id = compact_sig_store(spark, sig_path, exclude="qa-1")
    assert new_id is not None
    dirs = {d[len("batch="):] for d in os.listdir(sig_path)
            if d.startswith("batch=")}
    # every namespace's newest survives; only the old dirs folded
    assert dirs == {"qa-1", "qb-1", "7", str(new_id)}, dirs
    got = spark.read.parquet(sig_path)
    assert got.count() == 9
    assert got.select("doc_id").distinct().count() == 9


def test_sig_store_compaction_protects_synthetic_mtime_dirs(spark,
                                                            tmp_path):
    """Object stores report synthetic (0) modification times for
    directory prefixes; an unknown age must err toward protecting the
    newest per-writer dir instead of treating it as ancient and folding
    it mid two-phase commit (r6 fourth review pass). Simulated locally
    by utime()ing the newest dir to epoch 0."""
    import os

    from qbeast_spark_spark.streaming.ingest import compact_sig_store

    sig_path = str(tmp_path / "s3ish_sigs")

    def write_batch(val, ids):
        df = spark.createDataFrame([(i, i * 7) for i in ids],
                                   "doc_id long, mh0 long")
        df.write.mode("overwrite").parquet(f"{sig_path}/batch={val}")

    write_batch("qb-0", [1, 2])
    write_batch("qb-1", [3, 4])
    write_batch("qb-2", [5, 6])          # newest: possibly in-flight
    os.utime(f"{sig_path}/batch=qb-2", (0, 0))   # synthetic s3a mtime
    new_id = compact_sig_store(spark, sig_path)
    assert new_id is not None
    dirs = {d[len("batch="):] for d in os.listdir(sig_path)
            if d.startswith("batch=")}
    assert "qb-2" in dirs, "zero-mtime newest dir was folded"
    assert dirs == {"qb-2", str(new_id)}, dirs
    got = spark.read.parquet(sig_path)
    assert got.count() == 6


def test_stream_ingest_auto_sketch_engages(spark, tmp_path, monkeypatch):
    """r8 (VERDICT r7 task 4): big micro-batches inherit the sampled
    domain sketch by DEFAULT through the sink (the policy lives in
    estimate_cube_domains, so foreachBatch needs no plumbing) — and the
    streamed table's read invariants hold on the auto-sampled index."""
    from qbeast_spark_spark.index import analyzer as A

    monkeypatch.setattr(A, "_AUTO_SKETCH_MIN_ROWS", 100)
    monkeypatch.setattr(A, "_AUTO_SKETCH_TARGET_ROWS", 150)
    monkeypatch.setattr(A, "_MIN_SKETCH_ROWS", 50)
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _make_events(spark, 300, 0).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = stream_write_qbeast(stream, table,
                            columns_to_index=["user_id", "value"],
                            cube_size=100, checkpoint=ckpt,
                            trigger_available_now=True)
    q.awaitTermination(120)
    assert A.LAST_SKETCH_FRACTION == pytest.approx(0.5)  # 150/300
    qt = qss.QbeastTable.for_path(spark, table)
    expect = spark.read.parquet(src)
    assert qt.to_df().count() == 300
    assert qt.to_df().exceptAll(expect).count() == 0
    got = qt.read("value >= 50.0").count()
    assert got == expect.filter("value >= 50.0").count()


def test_stream_upsert_cdc_sink(spark, tmp_path):
    """r8: CDC-style streaming upsert — last-row-per-key collapse by the
    sequence column, op-column deletes, idempotent (query, batch) MERGE
    epochs, out-of-space inserts through the staging lane."""
    from qbeast_spark_spark.streaming.ingest import stream_upsert_qbeast

    src = str(tmp_path / "cdc_src")
    table = str(tmp_path / "cdc_table")
    ckpt = str(tmp_path / "cdc_ckpt")
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
    ])
    b1 = [(k, float(k), 1, "upsert") for k in range(50)]
    b2 = ([(k, 1000.0 + k, 2, "upsert") for k in range(10)]      # updates
          + [(k, float(k), 2, "upsert") for k in range(50, 60)]  # inserts
          + [(k, 0.0, 2, "DELETE") for k in range(40, 45)]       # deletes
          + [(5, -1.0, 3, "upsert")])       # same-batch second change
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(src)
    q = stream_upsert_qbeast(stream, table, on="k",
                             columns_to_index=["k"], cube_size=25,
                             checkpoint=ckpt, trigger_available_now=True,
                             order_col="seq", op_col="op")
    q.awaitTermination(120)

    # replay the CDC in Python: batch files arrive in write order
    state = {k: float(k) for k in range(50)}
    state.update({k: 1000.0 + k for k in range(10)})
    state.update({k: float(k) for k in range(50, 60)})
    for k in range(40, 45):
        state.pop(k)
    state[5] = -1.0                         # seq=3 beats seq=2
    qt = qss.QbeastTable.for_path(spark, table)
    got = {r["k"]: r["v"] for r in qt.to_df().collect()}
    assert got == state
    assert set(qt.to_df().columns) == {"k", "v"}    # seq/op consumed
    # exactly-once: the epochs are on record, and a replayed merge with
    # the same (app, version) is skipped before any work
    snap = qt.snapshot(refresh=True)
    assert snap.txns.get("qbeast-stream-upsert", -1) >= 1
    assert snap.txns.get("qbeast-stream-upsert#del", -1) >= 1
    replay = spark.createDataFrame([(0, 123.0)], ["k", "v"])
    out = qt.merge(replay, on="k", when_matched_update="all",
                   when_not_matched_insert="all",
                   txn_app_id="qbeast-stream-upsert", txn_version=1)
    assert out.get("skipped_txn") is True
    assert {r["k"]: r["v"] for r in qt.to_df().collect()} == state


def test_stream_upsert_sink_guards(spark, tmp_path):
    """r8 review pins: a NULL op means upsert (never silently dropped);
    the sink refuses to run without a checkpoint; a no-op merge still
    advances its txn high-water mark."""
    from qbeast_spark_spark.streaming.ingest import stream_upsert_qbeast

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("op", T.StringType()),
    ])
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 1.0, None), (2, 2.0, "upsert"), (3, 3.0, "DELETE")],
        schema).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(ValueError, match="checkpoint"):
        stream_upsert_qbeast(
            spark.readStream.schema(schema).parquet(src),
            str(tmp_path / "t"), on="k", columns_to_index=["k"])
    q = stream_upsert_qbeast(
        spark.readStream.schema(schema).parquet(src),
        str(tmp_path / "t"), on="k", columns_to_index=["k"],
        cube_size=10, checkpoint=str(tmp_path / "ck"),
        trigger_available_now=True, op_col="op")
    q.awaitTermination(120)
    qt = qss.QbeastTable.for_path(spark, str(tmp_path / "t"))
    got = {r["k"]: r["v"] for r in qt.to_df().collect()}
    assert got == {1: 1.0, 2: 2.0}     # NULL op upserted; 3 deleted pre-create = no-op
    # no-op merge with a txn identity records it in an empty commit
    miss = spark.createDataFrame([(99, 0.0)], ["k", "v"])
    out = qt.merge(miss, on="k", when_matched_delete=True,
                   txn_app_id="noop-app", txn_version=7)
    assert out["version"] is not None
    snap = qt.snapshot(refresh=True)
    assert snap.txns.get("noop-app") == 7
    assert {r["k"] for r in qt.to_df().collect()} == {1, 2}
    # and the recorded epoch now skips a replay
    out2 = qt.merge(miss, on="k", when_matched_delete=True,
                    txn_app_id="noop-app", txn_version=7)
    assert out2.get("skipped_txn") is True
