"""Structured Streaming surface.

The reference has no streaming support (SURVEY.md §2.10); this engine adds
the idiomatic bridges:

- ``stream_write_qbeast``: readStream -> foreachBatch -> indexed qbeast
  commit per micro-batch, EXACTLY-ONCE: each batch commits with the
  query name as txn app id and the batch id as txn version, so a batch
  replayed after a failure is recognized in the log and skipped;
- ``stream_upsert_qbeast`` (r8): the CDC twin — one idempotent MERGE
  per micro-batch (last-row-per-key collapse, optional op-column
  deletes), riding the merge-on-read DML so each batch costs O(batch);
- ``windowed_aggregate``: watermarked tumbling/sliding window aggregation;
- ``session_aggregate``: dynamic-gap session windows (F.session_window),
  the streaming twin of queries.q_sessionize;
- ``stream_dedup``: exact in-stream deduplication bounded by the
  watermark (dropDuplicatesWithinWatermark) — state stays finite;
- ``stateful_running_totals``: custom stateful operator via
  applyInPandasWithState (per-key running count/sum with timeout-free
  state), the pattern for operators Spark lacks natively;
- ``stream_stream_join``: watermarked stream-stream equi-join with a
  time-interval condition — both sides' state stores stay bounded by
  their watermarks + the interval width.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence

from pyspark.errors import AnalysisException

__all__ = ["stream_write_qbeast", "stream_upsert_qbeast",
           "stream_dedup_ingest",
           "compact_sig_store",
           "windowed_aggregate", "session_aggregate",
           "stream_dedup", "stateful_running_totals", "stream_stream_join"]


def stream_write_qbeast(stream_df, path: str,
                        columns_to_index: Sequence[str],
                        cube_size: int = 100_000,
                        checkpoint: Optional[str] = None,
                        trigger_available_now: bool = False,
                        query_name: str = "qbeast-stream-ingest",
                        maintain_every: Optional[int] = None,
                        maintain_kwargs: Optional[dict] = None,
                        **write_kwargs):
    """writeStream.foreachBatch -> qbeast.write append per micro-batch.
    Exactly-once: the commit is tagged (query_name, batch_id), so a batch
    replayed after a failure hits the idempotent-skip path. Extra
    keyword arguments (bloom_columns, column_stats, merge_schema, ...)
    pass straight through to write_qbeast for every batch.

    ``maintain_every=N`` runs auto_maintain (index the staging backlog,
    compact small files, optionally vacuum — sources/maintenance.py)
    after every Nth batch, the standard counter to micro-batch
    fragmentation; its thresholds come from ``maintain_kwargs``."""
    from ..sources.writer import write_qbeast

    def sink(batch_df, batch_id: int):
        if not batch_df.isEmpty():
            write_qbeast(batch_df, path, columns_to_index=columns_to_index,
                         cube_size=cube_size, mode="append",
                         txn_app_id=query_name, txn_version=batch_id,
                         **write_kwargs)
        _maybe_maintain(batch_df.sparkSession, path, batch_id,
                        maintain_every, maintain_kwargs, columns_to_index)

    return _start_foreach_sink(stream_df, sink, query_name, checkpoint,
                               trigger_available_now)


def _maybe_maintain(spark, path, batch_id, maintain_every,
                    maintain_kwargs, columns_to_index):
    """auto_maintain after every Nth batch — shared by all sinks."""
    if maintain_every and (batch_id + 1) % maintain_every == 0:
        from ..sources.maintenance import auto_maintain

        mk = dict(maintain_kwargs or {})
        mk.setdefault("columns_to_index", columns_to_index)
        auto_maintain(spark, path, **mk)


def _start_foreach_sink(stream_df, sink, query_name,
                        checkpoint, trigger_available_now):
    """Shared writeStream.foreachBatch boilerplate for the sinks."""
    writer = (stream_df.writeStream.foreachBatch(sink)
              .queryName(query_name)
              .outputMode("update"))
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_upsert_qbeast(stream_df, path: str, on,
                         columns_to_index: Sequence[str],
                         cube_size: int = 100_000,
                         checkpoint: Optional[str] = None,
                         trigger_available_now: bool = False,
                         query_name: str = "qbeast-stream-upsert",
                         order_col: Optional[str] = None,
                         op_col: Optional[str] = None,
                         delete_value: str = "delete",
                         mode: str = "auto",
                         maintain_every: Optional[int] = None,
                         maintain_kwargs: Optional[dict] = None,
                         **write_kwargs):
    """CDC-style streaming UPSERT sink: readStream -> foreachBatch ->
    one idempotent MERGE per micro-batch. The r8 merge-on-read DML makes
    this scale-sane — a selective upsert batch masks its matched rows
    with deletion vectors and appends only the changed rows, so the
    per-batch cost is O(batch), never O(matched files' bytes).

    Semantics per batch (Delta's foreachBatch-upsert recipe):

    - the batch is collapsed to ONE row per key: the LAST row by
      ``order_col`` (a CDC sequence/timestamp column — recommended) or
      an arbitrary-but-single row via dropDuplicates when absent;
    - ``op_col``: when given, rows whose ``op_col`` equals
      ``delete_value`` (case-insensitive; NULL op means upsert) delete
      their keys (matched rows removed, unmatched ignored), the rest
      upsert. The delete MERGE and the upsert MERGE are separate
      commits with separate txn app ids (``<query_name>#del`` /
      ``<query_name>``), each idempotent, so a replay after a crash
      between them re-skips the finished half and completes the other;
    - exactly-once: every merge commits with (query_name, batch_id) as
      its transaction identity — the same epoch protocol as
      stream_write_qbeast, enforced race-free inside the commit. The
      identity is only meaningful while batch ids are durable, so a
      CHECKPOINT IS REQUIRED (without one, a restarted query's batch
      ids restart at 0 and real batches would be skipped as replays);
    - a first batch against a missing/empty table creates it with
      ``write_qbeast`` (same txn identity); ``**write_kwargs``
      (bloom_columns, constraints, ...) apply to that CREATING write
      only — later batches go through MERGE, which takes none of them;
    - keys never update (merge refuses key assignments by design);
      upsert rows outside the revision space land in the staging lane
      and are folded in by the next maintenance pass.

    ``op_col`` and ``order_col`` are consumed (dropped from the stored
    rows). Returns the StreamingQuery."""
    from pyspark.sql import functions as F

    from ..sources.log import CommitLog
    from ..sources.reader import QbeastTable
    from ..sources.writer import write_qbeast

    if not checkpoint:
        raise ValueError(
            "stream_upsert_qbeast requires a checkpoint: the exactly-"
            "once merge epochs key on durable batch ids — without a "
            "checkpoint a restart resets them to 0 and new batches "
            "would be skipped as replays")
    keys = [on] if isinstance(on, str) else list(on)

    def _one_row_per_key(df):
        if order_col is not None:
            from pyspark.sql import Window

            w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
            df = (df.withColumn("__rn", F.row_number().over(w))
                  .where("__rn = 1").drop("__rn", order_col))
        else:
            df = df.dropDuplicates(keys)
        return df

    def sink(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = _one_row_per_key(batch_df)
        deletes = None
        if op_col is not None:
            # eqNullSafe: a NULL op is an upsert, never silently dropped
            is_del = F.lower(F.col(op_col)).eqNullSafe(
                delete_value.lower())
            deletes = batch.where(is_del).select(*keys)
            batch = batch.where(~is_del).drop(op_col)
        has_upserts = not batch.isEmpty()
        if not CommitLog(path).exists():
            if not has_upserts:
                return      # delete-only batch against no table: no-op
            write_qbeast(batch, path, columns_to_index=columns_to_index,
                         cube_size=cube_size, mode="append",
                         txn_app_id=query_name, txn_version=batch_id,
                         **write_kwargs)
        elif has_upserts:
            qt = QbeastTable.for_path(spark, path)
            qt.merge(batch, on=keys, when_matched_update="all",
                     when_not_matched_insert="all", mode=mode,
                     txn_app_id=query_name, txn_version=batch_id)
        if deletes is not None and not deletes.isEmpty():
            QbeastTable.for_path(spark, path).merge(
                deletes, on=keys, when_matched_delete=True, mode=mode,
                txn_app_id=f"{query_name}#del", txn_version=batch_id)
        _maybe_maintain(spark, path, batch_id, maintain_every,
                        maintain_kwargs, columns_to_index)

    return _start_foreach_sink(stream_df, sink, query_name, checkpoint,
                               trigger_available_now)


def stream_dedup_ingest(stream_df, path: str, sig_path: str,
                        columns_to_index: Sequence[str],
                        cube_size: int = 100_000,
                        id_col: str = "doc_id",
                        n: int = 3,
                        threshold: float = 0.7,
                        checkpoint: Optional[str] = None,
                        trigger_available_now: bool = False,
                        query_name: str = "qbeast-dedup-ingest",
                        compact_store_every: Optional[int] = None,
                        **write_kwargs):
    """The production crawl-ingest pipeline in one sink: per micro-batch,

    1. MinHash-sign the incoming documents (one shingle aggregation);
    2. drop documents near-duplicating the EXISTING corpus — a banded
       LSH join against the persisted signature store at ``sig_path``
       (signatures only; the corpus text is never re-read or re-hashed);
    3. drop intra-batch near-dups (keep the smallest id of each pair);
    4. append the survivors to the indexed table exactly-once (same txn
       tagging as stream_write_qbeast) and their signatures to the store.

    Scale shape per batch: O(batch) shingle work, band equi-joins whose
    shuffle is O(batch x bands) + matching store slices — never a corpus
    scan. The signature store grows by O(survivors x perms) longs.

    Exactly-once holds for BOTH writes (r5, VERDICT r4 "What's wrong
    #2"): the DATA commit is idempotent via the commit log's txn map,
    and the signature write goes to a per-batch directory
    ``{sig_path}/batch=<query_name>-<batch_id>`` in OVERWRITE mode —
    batch ids from the checkpoint are monotonic and never reused within
    a query, so a batch replayed after a crash between the two writes
    rewrites the same directory with the same (deterministic) rows
    instead of appending duplicates. The directory name embeds the
    (sanitized) query name (r6, ADVICE r5): two queries sharing one
    ``sig_path`` both start at batch 0, and un-namespaced ``batch=<id>``
    directories would silently overwrite each other's signatures. The
    store reads back as one partitioned parquet table regardless of the
    mix of legacy integer and namespaced string directory values; a
    pre-r5 flat-append store is auto-adopted into the layout on the
    next batch (_migrate_flat_store).

    Operational contract (the same one every txnAppId-tagged
    exactly-once sink has, Delta included): the checkpoint and
    ``query_name`` live and die together. Resetting the checkpoint
    while keeping the name restarts batch ids at 0, which makes the
    data commit's idempotent skip swallow real batches AND lets new
    batches overwrite old signature directories — start a fresh
    query_name (or keep the checkpoint) instead.

    ``compact_store_every=N`` folds the accumulated per-batch
    directories into one (compact_sig_store) every Nth batch — a
    small-files optimization, not a correctness need. The CURRENT
    batch's own directory is never folded (ADVICE r5): compaction runs
    before the checkpoint commits this batch, and folding the directory
    into a consolidation would defeat the own-batch corpus exclusion on
    a replay (every doc would self-match its compacted signature and
    the batch directory would be rewritten empty — survivable only
    through the data commit's txn-skip, and one reordering away from
    signature loss). The directory joins the next compaction cycle,
    after its checkpoint entry is durable. Run compaction from a single
    owner when several queries share a store — two concurrent
    compactions could both pick the same consolidation id."""
    from pyspark.sql import functions as F

    from ..operators.dedup import (lsh_join_sigs, lsh_pairs_scored,
                                   minhash_signatures)
    from ..sources.writer import write_qbeast

    from ..operators.dedup import MINHASH_PERMS, MINHASH_PRIME

    def _whole_doc_sigs(docs):
        """Fallback signature for documents too short to shingle (< n
        tokens, incl. empty): the whole normalized text acts as the one
        shingle, so EXACT short-doc duplicates still collide on every
        band (near-dup recall for short docs is out of scope and
        documented)."""
        h = F.conv(F.substring(
            F.md5(F.trim(F.lower(F.col("text")))), 1, 8), 16, 10) \
            .cast("long")
        return docs.select(
            F.col(id_col),
            *[((h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME))
              .alias(f"mh{j}")
              for j, (a, b) in enumerate(MINHASH_PERMS)])

    qname = _safe_store_name(query_name)

    def sink(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        own_dir_val = f"{qname}-{batch_id}"
        sigs = minhash_signatures(batch_df, n, id_col)
        # docs with < n tokens yield no shingles, hence no signature row:
        # without a fallback they would bypass dedup AND never enter the
        # store, re-ingesting forever
        short = batch_df.join(sigs.select(id_col), id_col, "left_anti")
        new_sigs = sigs.unionByName(_whole_doc_sigs(short)).persist()
        try:
            dup_ids = None
            # existence probe through Spark, not the driver's local
            # filesystem — sig_path may be s3a://... on a real cluster
            _migrate_flat_store(spark, sig_path)
            try:
                corpus_sigs = spark.read.parquet(sig_path)
                corpus_sigs.schema     # force analysis
            except AnalysisException as e:
                # ONLY an absent/empty store means "first batch"; any
                # other failure (permissions, corrupt footer) must fail
                # the batch so the checkpoint retries it — swallowing it
                # would silently disable corpus dedup and let
                # near-duplicates land permanently (ADVICE r4).
                # UNABLE_TO_INFER_SCHEMA is the empty-store shape: the
                # directory exists but holds no readable data files —
                # e.g. only the _temporary/ debris of a first-batch
                # signature write that crashed mid-job; treating it as
                # an error would wedge every retry of that first batch.
                if not any(tok in str(e) for tok in
                           ("PATH_NOT_FOUND", "Path does not exist",
                            "UNABLE_TO_INFER_SCHEMA")):
                    raise
                corpus_sigs = None     # first batch: no store yet
            if corpus_sigs is not None:
                # exclude THIS batch's own directory from the corpus
                # side: on a crash-replay the store already holds this
                # attempt's output, and matching a doc against its own
                # prior signature would drop every prior survivor and
                # rewrite the batch directory short. Filtering on the
                # partition column (not on id equality) keeps exact
                # same-id dedup across batches working: a doc
                # re-delivered in a LATER batch still collides with its
                # stored signature and is dropped. The bare batch id is
                # excluded too, covering a replay over a directory this
                # query wrote before the r6 namespaced layout (the cast
                # keeps the comparison valid whether partition discovery
                # inferred the column as int — legacy dirs only — or
                # string).
                if "batch" in corpus_sigs.columns:
                    corpus_sigs = corpus_sigs.where(
                        ~F.col("batch").cast("string")
                        .isin(own_dir_val, str(batch_id)))
                vs_corpus = lsh_join_sigs(corpus_sigs, new_sigs,
                                          id_col=id_col,
                                          threshold=threshold)
                dup_ids = (vs_corpus
                           .select(F.col("id_b").alias(id_col))
                           .distinct())
            intra = lsh_pairs_scored(batch_df, n=n, threshold=threshold,
                                     id_col=id_col, sig_df=new_sigs)
            intra_dups = intra.select(
                F.col("id2").alias(id_col)).distinct()
            dup_ids = intra_dups if dup_ids is None \
                else dup_ids.unionByName(intra_dups).distinct()
            # dup_ids feeds BOTH the survivors write and the sig append;
            # without this the corpus-store scan and band joins run twice
            dup_ids = dup_ids.persist()
            try:
                survivors = batch_df.join(dup_ids, id_col, "left_anti")
                write_qbeast(survivors, path,
                             columns_to_index=columns_to_index,
                             cube_size=cube_size, mode="append",
                             txn_app_id=query_name, txn_version=batch_id,
                             **write_kwargs)
                # per-batch overwrite = idempotent on replay (batch ids
                # never repeat across the checkpoint's lifetime; the
                # query-name prefix keeps a second query sharing the
                # store from colliding on the same ids)
                (new_sigs.join(dup_ids, id_col, "left_anti")
                 .write.mode("overwrite")
                 .parquet(f"{sig_path}/batch={own_dir_val}"))
            finally:
                dup_ids.unpersist()
        finally:
            new_sigs.unpersist()
        if compact_store_every \
                and (batch_id + 1) % compact_store_every == 0:
            # never fold the in-flight batch's directory — see the
            # docstring's compaction contract
            compact_sig_store(spark, sig_path, id_col=id_col,
                              exclude=own_dir_val)

    return _start_foreach_sink(stream_df, sink, query_name, checkpoint,
                               trigger_available_now)


def _safe_store_name(query_name: str) -> str:
    """Sanitize a query name for use inside a ``batch=`` partition
    directory value: path separators / '=' / whitespace would corrupt
    the layout, so anything outside [A-Za-z0-9._-] becomes '_'."""
    safe = re.sub(r"[^A-Za-z0-9._-]", "_", query_name)
    return safe or "q"


def _migrate_flat_store(spark, sig_path: str) -> None:
    """Adopt a signature store written by the pre-r5 flat-append layout:
    root-level parquet files are MOVED into a ``batch=-1`` seed
    directory so partition discovery sees one consistent layout (mixed
    depths raise 'Conflicting directory structures'). Idempotent and
    crash-tolerant: each file is an independent rename, and files left
    behind by a crash are picked up on the next call."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(sig_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return
    flat = [st.getPath() for st in fs.listStatus(root)
            if st.isFile() and st.getPath().getName().endswith(".parquet")]
    if not flat:
        return
    seed = jvm.org.apache.hadoop.fs.Path(sig_path + "/batch=-1")
    fs.mkdirs(seed)
    for p in flat:
        fs.rename(p, jvm.org.apache.hadoop.fs.Path(
            sig_path + "/batch=-1/" + p.getName()))


def compact_sig_store(spark, sig_path: str, id_col: str = "doc_id",
                      min_dirs: int = 2,
                      exclude: Optional[str] = None,
                      protect_latest: bool = True,
                      protect_age_s: float = 3600.0) -> Optional[int]:
    """Fold a signature store's per-batch directories into ONE
    deduplicated directory (one row per ``id_col``) — the small-files
    hygiene pass for long-running ``stream_dedup_ingest`` queries.

    Crash-safe by construction: the consolidated rows are written to a
    brand-new directory (``batch=-(max |trailing int| + 1)`` — negative
    and bare, so it can never collide with a checkpoint batch
    directory, which always carries a query-name prefix or a
    non-negative legacy id, nor with a previous consolidation) BEFORE
    the covered directories are deleted. A crash between the write and
    the deletes leaves duplicate signature rows visible, which are
    harmless (same doc carries the same signature; candidate pairs are
    distinct) and are removed by the next pass. No directory holding
    the only copy of a row is ever truncated.

    ``exclude`` names one partition VALUE (e.g. ``myquery-7``) to leave
    out of the fold — the sink passes its in-flight batch's directory,
    which must survive untouched until its checkpoint entry is durable
    (ADVICE r5: folding it would void the own-batch corpus exclusion on
    a replay). Independently of ``exclude``, the NEWEST directory of
    EVERY writer namespace (highest non-negative trailing id per
    query-name prefix, legacy bare ids included) is always skipped (r6
    review): when several queries share a store, a compaction triggered
    by query A must not fold query B's latest batch — B may be mid
    two-phase commit, and folding its directory would void B's
    own-batch exclusion on replay exactly like folding A's would. A
    skipped directory joins a later cycle: once a newer batch of the
    same writer exists, or — for a RETIRED writer that will never
    produce one — once the directory's modification time ages past
    ``protect_age_s`` (in-flight means seconds-to-minutes between the
    signature write and the checkpoint commit; an hour-old newest dir
    is a stopped query's durable tail, not an open two-phase commit,
    so retired namespaces don't pin one directory forever). Pass
    ``protect_latest=False`` ONLY for offline compaction of a store no
    query is writing (then every directory is checkpoint-durable and
    full folding is safe).

    Returns the new directory's batch id, or None if fewer than
    ``min_dirs`` directories are eligible. Uses the Hadoop FileSystem
    API, so it works wherever the store lives (local, s3a, ...)."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(sig_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return None
    all_vals = []
    paths = {}
    mtimes = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch="):
            val = name[len("batch="):]
            all_vals.append(val)
            paths[val] = st.getPath()
            mtimes[val] = st.getModificationTime() / 1000.0

    def _split(val):
        # bare value = legacy batch id or negative consolidation id;
        # otherwise '<qname>-<id>' where the checkpoint id is >= 0 (the
        # '-' is the separator, NOT a sign — a sign-greedy trailing-int
        # regex would read 'q-1' as id -1 and misplace the namespace's
        # newest batch)
        if re.fullmatch(r"-?\d+", val):
            return "", int(val)
        m = re.search(r"-(\d+)$", val)
        if not m:
            return None, None
        return val[:m.start()], int(m.group(1))

    # newest non-negative id per writer prefix = possibly in-flight,
    # unless old enough that no two-phase commit can still be open
    protected = set()
    if protect_latest:
        import time as _time

        now = _time.time()
        newest: dict = {}
        for val in all_vals:
            pre, num = _split(val)
            if num is not None and num >= 0:
                if pre not in newest or num > newest[pre][1]:
                    newest[pre] = (val, num)
        # an unknown or synthetic age must err toward protection:
        # object stores (s3a) report 0 modification time for
        # "directories" (they are key prefixes), which would otherwise
        # make every in-flight dir look ancient and fold it mid-commit
        protected = set()
        for v, _n in newest.values():
            mt = mtimes.get(v)
            if mt is None or mt <= 0 or now - mt < protect_age_s:
                protected.add(v)
    if exclude is not None:
        protected.add(exclude)
    dirs = {v: paths[v] for v in all_vals if v not in protected}
    if len(dirs) < min_dirs:
        return None
    # derive a never-used negative id from every trailing integer in
    # sight — legacy ``batch=7``, namespaced ``batch=q-7`` (trailing
    # -7 -> |7|) and consolidations ``batch=-9`` all contribute, and
    # protected values count too so the new id cannot collide with them
    seen_ints = [0]
    for val in all_vals + list(protected):
        _pre, num = _split(val)
        if num is not None:
            seen_ints.append(abs(num))
    new_id = -(max(seen_ints) + 1)
    sigs = spark.read.parquet(*[f"{sig_path}/batch={v}" for v in dirs])
    # identical doc -> identical signature, so keeping any one row per
    # doc id is exact; drop any stale 'batch' col a reader may add.
    # (Assumes one global id space across writers sharing the store —
    # the same assumption the cross-batch same-id dedup makes.)
    keep = [c for c in sigs.columns if c != "batch"]
    (sigs.select(*keep).dropDuplicates([id_col])
     .write.mode("overwrite").parquet(f"{sig_path}/batch={new_id}"))
    for p in dirs.values():
        fs.delete(p, True)
    return new_id


def windowed_aggregate(stream_df, ts_col: str, window: str = "1 hour",
                       watermark: str = "2 hours",
                       group_cols: Sequence[str] = (),
                       agg_col: Optional[str] = None,
                       slide: Optional[str] = None):
    """Watermarked tumbling (or, with ``slide``, hopping) window
    aggregation: the late-data-tolerant streaming twin of
    queries.q_tumbling_window / q_sliding_window."""
    from pyspark.sql import functions as F

    aggs = [F.count("*").alias("n")]
    out_names = ["n"]
    if agg_col:
        aggs.append(F.sum(agg_col).alias(f"sum_{agg_col}"))
        out_names.append(f"sum_{agg_col}")
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *[F.col(c) for c in group_cols])
        .agg(*aggs)
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                *[F.col(c) for c in group_cols],
                *[F.col(n) for n in out_names])
    )


def session_aggregate(stream_df, ts_col: str, gap: str = "30 minutes",
                      watermark: str = "2 hours",
                      group_cols: Sequence[str] = (),
                      agg_col: Optional[str] = None):
    """Session windows with a dynamic inactivity gap (F.session_window):
    a session closes when no event arrives for ``gap``. Streaming twin of
    the batch gap-and-island sessionization (queries.q_sessionize)."""
    from pyspark.sql import functions as F

    aggs = [F.count("*").alias("n")]
    out_names = ["n"]
    if agg_col:
        aggs.append(F.sum(agg_col).alias(f"sum_{agg_col}"))
        out_names.append(f"sum_{agg_col}")
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                 *[F.col(c) for c in group_cols])
        .agg(*aggs)
        .select(F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                *[F.col(c) for c in group_cols],
                *[F.col(n) for n in out_names])
    )


def stream_dedup(stream_df, keys: Sequence[str], ts_col: str,
                 watermark: str = "2 hours"):
    """Exact in-stream deduplication with bounded state: duplicates of a
    key are dropped for as long as the key can still legally arrive (the
    watermark horizon), after which its state is evicted — the streaming
    twin of operators.dedup.dedup_exact that never grows unbounded."""
    return (stream_df.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(list(keys)))


def stream_stream_join(left, right, key: str,
                       left_ts: str, right_ts: str,
                       watermark: str = "1 hour",
                       max_lag: str = "INTERVAL 15 MINUTES",
                       join_type: str = "inner"):
    """Watermarked stream-stream join: equi-join on ``key`` with the
    time-interval condition ``left_ts <= right_ts <= left_ts + max_lag``
    (the click-after-impression shape). Both watermarks plus the interval
    bound the join state Spark must retain, so the state store can evict —
    without them a stream-stream join buffers forever. Column names on the
    right side are suffixed ``_r`` to keep the joined schema unambiguous.
    """
    from pyspark.sql import functions as F

    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    rw = rw.select(*[F.col(c).alias(f"{c}_r") for c in rw.columns])
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (F.col(f"{right_ts}_r") >= F.col(left_ts))
        & (F.col(f"{right_ts}_r")
           <= F.expr(f"{left_ts} + {max_lag}"))
    )
    return lw.join(rw, cond, join_type)


def stateful_running_totals(stream_df, key_col: str, value_col: str,
                            timeout: str = "NoTimeout"):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-key running event count and value sum, emitted on every batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} long, n_events long, total double"
    state_schema = "n long, total double"

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n],
                            "total": [total]})

    timeout_conf = getattr(GroupStateTimeout, timeout, None) or \
        GroupStateTimeout.NoTimeout
    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(update, out_schema, state_schema,
                                "update", timeout_conf)
    )
