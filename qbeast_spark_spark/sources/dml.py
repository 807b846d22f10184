"""DELETE / UPDATE that keep the table fully qbeast-readable.

The reference delegates row deletion to the DeltaTable API and then
documents that "the table should only be read using `delta`"
(/root/reference/docs/Quickstart.md:409-427) — its DML costs the index.
Here both verbs:

1. prune candidate files with the same multi-dim block/stats pruning as
   ``read()`` — files that cannot contain a matching row are never
   touched;
2. find the files that actually DO contain matches with one pruned scan
   (``groupBy(input_file_name)`` — an O(#files) driver result);
3. rewrite only those files, re-assigning the replacement rows through
   the EXISTING cube weights (the same re-layout path as optimize), and
   commit adds + removes atomically in ONE log version, so readers see
   either the old or the new table, never a mix.

Scale shape: full-data work only over the matched files; the one shuffle
is the rollup repartition of the rewritten subset. ``delete()`` with no
predicate is a metadata-only truncate (pure removes). NULL semantics
match SQL: a WHERE that evaluates NULL does not match, so those rows
survive a delete and are not touched by an update.

Updates to indexed columns are validated against the revision space:
values that would leave it raise (re-appending through ``write`` grows
revisions; a silent in-place clamp would skew pruning), which mirrors
how the reference only grows revisions on append.
"""

from __future__ import annotations

import os
import urllib.parse
from typing import Any, Dict, List, Optional, Sequence, Tuple

from ..core.transform import LinearTransformation
from ..core.weight import INT_MAX
from ..index.analyzer import with_index_columns
from .log import CommitLog
from .writer import _complete_file_map, _cube_str, _materialize, _parse_cube

__all__ = ["delete_rows", "update_rows", "merge_rows"]

# auto-mode DELETE policy: deletion vectors while the matched rows are
# below this fraction of the matched files' live rows, full rewrite
# above it (read-amplification guard — every surviving read of a heavily
# masked file pays the bitmap anti-join for mostly-dead bytes). 0.5 is
# deliberately coarse, mirroring Delta's DV-first default behavior.
DV_DELETE_MAX_FRACTION = 0.5

# auto-mode UPDATE / matched-update-MERGE policy: stricter than
# DELETE (r8 second session). An update masks AND appends post-image
# rows, and the masked fraction taxes every later read; the isolated
# sf10 soak measured the 0.5 boundary as NEUTRAL (mask-tax ≈ rewrite
# saving — same ~150 s qb_dml on both policies), while at sf0.1 the
# borderline-dv update also dragged later reads through the DV lane.
# With no measured win anywhere near the boundary and clear wins on
# the selective shapes (sf10 A/Bs in SCALE.md: merge 1.7×, update
# parity-warm/2.4×-cold), 0.25 reserves dv for the shapes where the
# rewrite cost is demonstrably waste. Matched-DELETE merges append
# nothing — they are deletes by another verb — and use
# DV_DELETE_MAX_FRACTION like DELETE itself.
DV_UPDATE_MAX_FRACTION = 0.25


def _rel_path(qt, file_uri: str) -> str:
    """Scan-captured file URI -> table-relative path (snapshot key)."""
    p = urllib.parse.unquote(urllib.parse.urlparse(file_uri).path)
    return os.path.relpath(os.path.abspath(p), os.path.abspath(qt.path))


def _match_counts(qt, candidates: Sequence[str], residual
                  ) -> Dict[str, int]:
    """{rel_path: matching row count} for candidate files that contain at
    least one row matching ``residual`` — one job, O(#files) result.
    (merge's pass 1 runs its own variant inline: an inner join against
    the key-grouped source that also carries the multi-match guard.)"""
    if not candidates:
        return {}
    sel = qt._df_for_files(candidates, file_col="_f").where(residual)
    rows = sel.groupBy("_f").count().collect()
    return {_rel_path(qt, r["_f"]): int(r["count"]) for r in rows}


def _match_hits(qt, snap, candidates: Sequence[str], residual):
    """Live ``(fp, ri)`` positions of the rows matching ``residual`` over
    the candidate files — the FUSED source for both the per-file match
    counts and the DV mask build (r12, VERDICT r11 Next #1): the count
    pass and the raw position scan evaluated the same predicate over the
    same files as two separate jobs. Callers persist the returned frame
    (narrow: one string + one long per matched row), derive counts with
    a cheap ``groupBy("fp").count()`` over it, decide the dv/rewrite
    mode, and in dv mode feed the SAME frame to ``_dv_mask_adds`` — one
    scan instead of two.

    Unlike ``_raw_positions`` this scan APPLIES existing deletion
    vectors, which is both cheaper and equivalent: an already-masked
    position is already in its file's bitmap, so re-surfacing it was a
    union no-op that never changed the descriptor or the new-mask
    count."""
    from pyspark.sql import functions as F

    sel = qt._df_for_files(candidates, snap=snap, file_col="_f",
                           pos_col="_ri")
    if residual is not None:
        sel = sel.where(residual)
    return sel.select(F.col("_f").alias("fp"), F.col("_ri").alias("ri"))


def _cdc_of(qt, snap, frames) -> Optional[List[Dict[str, Any]]]:
    """When the table has CDF enabled, persist the given
    (DataFrame, change_type) pairs as one change-file set and return the
    commit payload entry list; else None. Each frame holds the CHANGED
    rows only — O(changed data), like Delta's _change_data files."""
    from pyspark.sql import functions as F

    from .cdf import CHANGE_TYPE, cdf_enabled, write_change_files

    if not cdf_enabled(snap.properties):
        return None
    tagged = None
    for df, change_type in frames:
        t = df.withColumn(CHANGE_TYPE, F.lit(change_type))
        tagged = t if tagged is None else tagged.unionByName(t)
    if tagged is None:
        return None
    return [write_change_files(tagged, qt.path)]


def _rewrite(qt, snap, matched: List[str], replacement,
             staged=None, operation: str = "WRITE",
             cdc: Optional[List[Dict[str, Any]]] = None,
             read_files: Optional[List[str]] = None,
             txn: Optional[Dict[str, Any]] = None) -> int:
    """Write ``replacement`` (the new contents of ``matched`` files)
    through the index pipeline against the existing cube weights, and
    commit adds + removes in one version. Mirrors optimize_table's
    re-layout (IndexedTable.scala:399-552 analogue) with dataChange=True.
    ``staged`` rows (e.g. merge inserts outside the revision space) are
    written as staging (revision 0) files inside the SAME commit —
    readable immediately, indexed by the next optimize()."""
    from ..core.revision import STAGING_REVISION_ID, Revision
    import time as _time

    log: CommitLog = qt.log
    rev = snap.latest_revision()
    selected = [snap.files[rel] for rel in matched]
    extra_add: List = []
    extra_revs: Dict = {}
    if staged is not None:
        from .optimize import _write_staging_files

        extra_add = _write_staging_files(staged, qt.path)
        extra_revs[STAGING_REVISION_ID] = Revision(
            STAGING_REVISION_ID, int(_time.time() * 1000),
            5_000_000, [], [], [])
        if replacement is None:
            return log.commit(
                add=extra_add, remove=matched, revisions=extra_revs,
                schema_json=snap.schema_json or staged.schema.json(),
                data_change=True, operation=operation, cdc=cdc,
                read_version=snap.version,
                read_files=read_files or matched, txn=txn)

    if rev is None:
        # staging-only table: replacement rows stay staging files
        from .optimize import _write_staging_files

        if staged is not None:
            replacement = replacement.unionByName(staged)
        add = _write_staging_files(replacement, qt.path)
        staging = Revision(STAGING_REVISION_ID, int(_time.time() * 1000),
                           5_000_000, [], [], [])
        return log.commit(add=add, remove=matched, operation=operation,
                          revisions={STAGING_REVISION_ID: staging},
                          schema_json=snap.schema_json
                          or replacement.schema.json(),
                          data_change=True, cdc=cdc,
                          read_version=snap.version,
                          read_files=read_files or matched, txn=txn)

    add, weights_payload = _indexed_adds(qt, snap, rev, replacement,
                                         selected)
    return log.commit(
        add=add + extra_add,
        remove=matched,
        revisions={rev.revision_id: rev, **extra_revs},
        cube_weights={rev.revision_id: weights_payload},
        schema_json=snap.schema_json or replacement.schema.json(),
        data_change=True,
        operation=operation,
        cdc=cdc,
        read_version=snap.version,
        read_files=read_files or matched,
        txn=txn,
    )


def _indexed_adds(qt, snap, rev, replacement, selected,
                  scale: float = 1.0):
    """Index ``replacement`` rows through the EXISTING cube weights of
    ``rev`` and write them as new data files (no commit). Returns
    ``(add_entries, cube_weights_payload)``. ``selected`` (the matched
    files' entries) sizes the rollup from their stored block counts;
    ``scale`` shrinks those counts when the replacement holds only a
    fraction of the files' rows (the merge-on-read append path, where
    only the changed rows are written)."""
    from ..index.analyzer import compute_rollup_from_counts

    bloom_cols = sorted({c for f in selected for c in (f.blooms or {})})
    prepared = with_index_columns(replacement, rev)
    weights = {
        _parse_cube(c): w
        for c, w in snap.cube_weights.get(rev.revision_id, {}).items()
    } or {(0, 0): INT_MAX}
    # rollup sizing from the matched files' stored block counts (an upper
    # bound after a delete — at worst slightly fewer rows per file)
    counts: Dict[Tuple[int, int], float] = {}
    for f in selected:
        for b in f.blocks:
            key = (_parse_cube(b.cube)
                   if f.revision_id != 0 else (0, 0))
            counts[key] = counts.get(key, 0.0) + b.count * scale
    for key in weights:
        counts.setdefault(key, 0.0)
    rollup = compute_rollup_from_counts(counts, rev.dims,
                                        rev.desired_cube_size)
    file_map = _complete_file_map(weights.keys(), rollup, rev.dims)
    num_files = max(1, len(set(rollup.values())))
    add = _materialize(prepared, rev, weights, file_map, num_files, qt.path,
                       bloom_cols=tuple(bloom_cols))
    payload = {_cube_str(d, p): int(w) for (d, p), w in weights.items()}
    return add, payload


def _raw_positions(qt, matched: List[str]):
    """Raw parquet scan of the matched files (existing deletion vectors
    NOT applied) carrying ``__fp`` (file URI) and ``__ri`` (row position)
    alongside the data columns — the position source for DV mask builds.
    Already-masked rows that re-match a predicate are harmless: their
    positions are unioned into a bitmap that already holds them."""
    from pyspark.sql import functions as F

    schema = qt.schema()
    paths = [os.path.join(qt.path, rel) for rel in matched]
    reader = qt.spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return (reader.parquet(*paths)
            .withColumn("__fp", F.col("_metadata.file_path"))
            .withColumn("__ri", F.col("_metadata.row_index")))


def _hit_positions(df):
    """``__fp``/``__ri`` carrier (a filtered/joined _raw_positions scan)
    -> the (fp, ri) frame ``_dv_mask_adds`` consumes."""
    from pyspark.sql import functions as F

    return df.select(F.col("__fp").alias("fp"),
                     F.col("__ri").alias("ri"))


def _pred_determinism(qt, snap, residual) -> Optional[bool]:
    """Catalyst's own verdict on whether the residual predicate is
    deterministic: True / False / None (= could not be analyzed).
    Every DML strategy evaluates the predicate in more than one job
    (match counts, mask scan or survivors rewrite, the CDC frame), so
    a nondeterministic one makes the reported counts, the change feed,
    and the committed data describe DIFFERENT row samples — Delta
    rejects nondeterministic DML conditions outright, and (r9 review)
    so do these verbs when Catalyst PROVES nondeterminism. Unresolvable
    shapes return None: callers fall back to the rewrite strategy
    (conservative) rather than refusing a predicate that may well be
    deterministic."""
    if residual is None:
        return True
    try:
        plan = (qt._df_for_files([], snap=snap).where(residual)
                ._jdf.queryExecution().analyzed())
        return bool(plan.condition().deterministic())
    except Exception:
        return None


def _pred_deterministic(qt, snap, residual) -> bool:
    """dv-gate form of ``_pred_determinism``: unknown counts as
    nondeterministic (the dv lanes must never run an unprovable
    predicate twice)."""
    return _pred_determinism(qt, snap, residual) is True


# Analyzed-plan leaves whose re-evaluation yields the same rows within
# one merge call: local/RDD-backed rows are pinned in memory, Range is
# pure. "LogicalRelation" is safe ONLY over a HadoopFsRelation (file
# scans capture their file LIST at analysis time; only an in-place
# overwrite mid-call could differ — the exposure every multi-action
# Spark job has). The same node name also fronts JDBC and other
# external V1 relations whose rescans hit a LIVE external system — a
# concurrent writer there would give each merge pass different rows, so
# those pin (r10 review).
_RESCAN_SAFE_LEAVES = frozenset({
    "LocalRelation", "LogicalRDD", "Range", "OneRowRelation"})
# Inner-node WHITELIST: shapes whose output ROW SET is a deterministic
# function of their (deterministic-expression) inputs. Everything not
# listed pins — notably Sample and Global/LocalLimit/Offset (arbitrary
# row picks that AQE / partition layout can change between runs),
# Window (rank/row_number over tied orderings can break ties
# differently per shuffle execution — SPARK-23207 class), and
# Deduplicate with a key SUBSET (dropDuplicates(subset) keeps an
# arbitrary row per key — same class; whole-row dedup / df.distinct()
# is set-deterministic and allowed by an arity check in the walk).
_RESCAN_SAFE_INNER = frozenset({
    "Project", "Filter", "Join", "Aggregate", "SubqueryAlias",
    "Deduplicate", "Union", "Sort", "Repartition",
    "RepartitionByExpression", "ResolvedHint", "UnresolvedHint",
    "Expand", "Generate", "Intersect", "Except"})
# Aggregate functions Catalyst marks deterministic whose VALUE is
# order-dependent (first/last/any_value; collect_list/collect_set whose
# ARRAY ORDERING tracks partition arrival order — SPARK-10712 class;
# and the sketch/tie-broken aggregates whose result depends on merge
# order: percentile_approx's GK sketch, mode's arbitrary tie pick,
# histogram_numeric's bin merging): an Aggregate over them yields
# different non-key values per re-execution, so they pin (r11 review).
_ORDER_DEPENDENT_EXPRS = frozenset({
    "First", "Last", "AnyValue", "CollectList", "CollectSet",
    "ApproximatePercentile", "Mode", "HistogramNumeric"})
# Expressions Catalyst calls deterministic but stamps ONCE PER
# QueryExecution (ComputeCurrentTime): each of merge's derived frames
# (key box, match counts, dv mask, post-image, insert) is its own
# QueryExecution, so a time-window filter over these can select
# different rows per pass — pin (r11 review).
_PER_EXECUTION_EXPRS = frozenset({
    "CurrentTimestamp", "CurrentDate", "Now", "LocalTimestamp",
    "CurrentTimeZone"})
# one expression walk per node: Aggregates check both sets (r11 review
# — separate walks doubled the py4j traversals in the merge hot path)
_AGG_UNSAFE_EXPRS = _PER_EXECUTION_EXPRS | _ORDER_DEPENDENT_EXPRS


def _exprs_contain(node, names: frozenset, budget: int = 2000) -> bool:
    """Walk the node's expression trees for any class in ``names``
    (budget-capped; exhaustion counts as a hit → caller pins)."""
    exprs = node.expressions()
    stack = [exprs.apply(i) for i in range(exprs.size())]
    while stack:
        budget -= 1
        if budget < 0:
            return True
        e = stack.pop()
        if e.getClass().getSimpleName() in names:
            return True
        kids = e.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
    return False


def _file_index_pinned(relation) -> bool:
    """True when the HadoopFsRelation's FileIndex captured its file
    list at analysis time (InMemoryFileIndex — what spark.read.parquet
    builds). CatalogFileIndex and other listing-deferred indexes
    re-list per query execution, so a concurrent append mid-merge would
    give the passes different row sets — those pin (r11 review; Delta's
    MergeIntoMaterializeSource only trusts snapshot-pinned indexes)."""
    try:
        cls = relation.location().getClass()
        while cls is not None:
            if cls.getSimpleName() == "InMemoryFileIndex":
                return True
            cls = cls.getSuperclass()
        return False
    except Exception:
        return False


def _source_safe_to_rescan(source) -> bool:
    """Catalyst's verdict on whether re-evaluating the merge source in
    several jobs (key box agg, match counts, dv mask scan, post-image /
    insert joins) yields the SAME rows each time — Delta's
    materialize-source gate (it skips materialization when the source
    plan is deterministic over stable scans; reference behavior:
    MergeIntoMaterializeSource). True only when every node is on the
    rescan-stable whitelist with deterministic expressions, no
    subqueries hide, and every leaf is a pinned/local relation or a
    file scan. Unknown/unanalyzable shapes return False — the caller
    pins."""
    try:
        stack = [source._jdf.queryExecution().analyzed()]
        budget = 500                    # degenerate mega-plans: just pin
        while stack:
            budget -= 1
            if budget < 0:
                return False
            n = stack.pop()
            name = n.nodeName()
            exprs = n.expressions()
            for i in range(exprs.size()):
                if not exprs.apply(i).deterministic():
                    return False
            if _exprs_contain(n, _AGG_UNSAFE_EXPRS
                              if name == "Aggregate"
                              else _PER_EXECUTION_EXPRS):
                return False
            if name == "Deduplicate":
                # whole-row dedup (df.distinct(), dropDuplicates() with
                # no subset) is set-deterministic; dropDuplicates(subset)
                # keeps an ARBITRARY row per key — pin (r10 review)
                if n.keys().size() != n.output().size():
                    return False
            if n.subqueries().size() > 0:
                return False
            kids = n.children()
            m = kids.size()
            if m == 0:
                if name == "LogicalRelation":
                    rel = n.relation()
                    if rel.getClass().getSimpleName() != "HadoopFsRelation":
                        return False
                    if not _file_index_pinned(rel):
                        return False
                elif name not in _RESCAN_SAFE_LEAVES:
                    return False
            elif name not in _RESCAN_SAFE_INNER:
                return False
            else:
                for i in range(m):
                    stack.append(kids.apply(i))
        return True
    except Exception:
        return False


def _reject_nondeterministic(qt, snap, residual, verb: str) -> None:
    """Raise when Catalyst proves the predicate nondeterministic —
    regardless of physical mode (rewrite evaluates it independently in
    the match count, the survivors scan, and the CDC frame too)."""
    if _pred_determinism(qt, snap, residual) is False:
        raise ValueError(
            f"{verb} requires a deterministic predicate: the match "
            "count, the data rewrite/mask, and the change-data-feed "
            "frame each re-evaluate it, so a nondeterministic one "
            "(e.g. rand()) would commit a different row sample than "
            "it reports — materialize the target keys first and "
            f"{verb.lower()} by key instead")


def delete_rows(spark, path: str, filters=None,
                mode: str = "auto",
                txn_app_id: Optional[str] = None,
                txn_version: Optional[int] = None) -> dict:
    """DELETE FROM <path> WHERE <filters>; see module docstring.
    ``filters`` speaks read()'s languages (tuple DNF, SQL string, Column);
    ``None`` truncates the table without touching any data file.

    ``mode`` picks the physical strategy:

    - ``"rewrite"``: rewrite the matched files without the matched rows
      (survivors re-indexed through the existing cube weights).
    - ``"dv"``: write DELETION VECTORS — a roaring-bitmap sidecar per
      matched file (sources/deletion_vectors.py, Delta's on-disk DV
      format) and a metadata-only commit; no data file is rewritten. The
      100 TB shape: a selective delete touches O(matched files) bitmaps,
      not O(matched bytes) of parquet. Reads anti-join the bitmaps until
      ``optimize()`` rewrites the files and drops them.
    - ``"auto"`` (default, r7 verdict task 3 — Delta's DV-first parity):
      ``"dv"`` when the matched rows are a minority
      (< ``DV_DELETE_MAX_FRACTION``) of the matched files' live rows
      (read-amplification guard), else ``"rewrite"``. A selective delete
      on 100 TB is metadata + O(matched files) bitmaps; a bulk delete
      still compacts away its dead bytes immediately.
    """
    from pyspark.sql import functions as F

    from .reader import QbeastTable

    if mode not in ("rewrite", "dv", "auto"):
        raise ValueError(f"unknown delete mode {mode!r}")
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version must be set together")
    qt = QbeastTable(spark, path)
    snap = qt.snapshot(refresh=True)
    if txn_app_id is not None and \
            snap.txns.get(txn_app_id, -1) >= int(txn_version):
        return {"version": snap.version, "skipped_txn": True,
                "rows_deleted": 0, "files_rewritten": 0,
                "files_scanned": 0}
    txn = ({"appId": txn_app_id, "version": int(txn_version)}
           if txn_app_id is not None else None)
    if not snap.files:
        version = None
        if txn is not None:
            version = qt.log.commit(
                add=[], remove=[], schema_json=snap.schema_json,
                data_change=False, operation="DELETE", txn=txn,
                read_version=snap.version)
        return {"version": version, "rows_deleted": 0,
                "files_rewritten": 0, "files_scanned": 0}
    candidates, residual = qt._candidates_and_residual(filters, snap)
    _reject_nondeterministic(qt, snap, residual, "DELETE")
    if residual is None:
        kernel = getattr(snap.files, "kernel", None)
        rows = kernel.live_rows_sum() if kernel is not None \
            else sum(f.live_rows for f in snap.files.values())
        version = qt.log.commit(add=[], remove=list(snap.files.keys()),
                                schema_json=snap.schema_json,
                                data_change=True, operation="DELETE",
                                txn=txn,
                                read_version=snap.version)
        return {"version": version, "rows_deleted": int(rows),
                "files_rewritten": 0, "files_scanned": 0}
    # Fused pass (r12): when dv mode is possible, ONE scan yields both
    # the per-file match counts and the mask positions — the count job
    # materializes the persisted (fp, ri) frame, the auto-mode decision
    # moves after it, and the dv path reuses the frame instead of
    # rescanning the matched files. An explicit mode="rewrite" keeps the
    # count-only job (positions are never needed). Trade-off: a bulk
    # delete that routes to rewrite persisted its matched positions for
    # nothing — O(matched rows) narrow rows vs the O(matched bytes)
    # rewrite it proceeds to pay, and the frame is released immediately.
    hits = None
    try:
        if mode == "rewrite" or not candidates:
            per_file = _match_counts(qt, candidates, residual)
        else:
            hits = _match_hits(qt, snap, candidates, residual).persist()
            per_file = {
                _rel_path(qt, r["fp"]): int(r["count"])
                for r in hits.groupBy("fp").count().collect()}
        if not per_file:
            version = None
            if txn is not None:
                # a no-op verb with a txn identity still advances the
                # epoch high-water mark (same contract as merge)
                version = qt.log.commit(
                    add=[], remove=[], schema_json=snap.schema_json,
                    data_change=False, operation="DELETE", txn=txn,
                    read_version=snap.version)
            return {"version": version, "rows_deleted": 0,
                    "files_rewritten": 0,
                    "files_scanned": len(candidates)}
        matched = sorted(per_file)
        if mode == "auto":
            live = sum(snap.files[rel].live_rows for rel in matched)
            mode = "dv" if sum(per_file.values()) \
                < DV_DELETE_MAX_FRACTION * max(live, 1) \
                and _pred_deterministic(qt, snap, residual) else "rewrite"
        elif mode == "dv" and not _pred_deterministic(qt, snap, residual):
            raise ValueError(
                "dv delete requires a deterministic predicate: the match "
                "count, the mask scan, and the CDC frame evaluate it "
                "independently, so a nondeterministic one would mask a "
                "different sample of rows than it reports — use "
                "mode='rewrite'")
        cdc = _cdc_of(qt, snap, [
            (qt._df_for_files(matched, snap=snap).where(residual),
             "delete")])
        if mode == "dv":
            out = _delete_with_dvs(qt, snap, matched, hits, cdc=cdc,
                                   txn=txn)
            out["files_scanned"] = len(candidates)
            return out
        survivors = qt._df_for_files(matched, snap=snap).where(
            ~F.coalesce(residual, F.lit(False)))
        version = _rewrite(qt, snap, matched, survivors,
                           operation="DELETE", cdc=cdc, txn=txn)
        return {"version": version,
                "rows_deleted": int(sum(per_file.values())),
                "files_rewritten": len(matched),
                "files_scanned": len(candidates)}
    finally:
        if hits is not None:
            hits.unpersist()


def _delete_with_dvs(qt, snap, matched: List[str], hits,
                     cdc=None, txn=None) -> dict:
    """Metadata-only delete: per matched file, union the newly matched
    row positions into its deletion vector and commit re-adds carrying
    the new descriptors. ``hits`` is the PERSISTED (fp, ri) frame the
    count pass already materialized (r12 fusion — no second scan of the
    matched files). Position sets never touch the driver — each file's
    bitmap is built and written by one executor task (applyInPandas
    over row-position groups), and the driver collects only
    O(#matched files) descriptor rows."""
    add, total_new = _dv_mask_adds(qt, snap, matched, hits)
    version = qt.log.commit(add=add, remove=[],
                            schema_json=snap.schema_json,
                            data_change=True, operation="DELETE",
                            cdc=cdc, txn=txn,
                            read_version=snap.version,
                            read_files=matched,
                            protocol=_DV_PROTOCOL)
    # superseded bitmaps are dead the moment the commit lands (their file
    # entry now points at the new sidecar) — unlike data files they are
    # never referenced by older READ paths we support mutating, but time
    # travel still wants them, so defer actual deletion to vacuum()
    return {"version": version, "rows_deleted": int(total_new),
            "files_rewritten": 0, "files_dv": len(add)}


_DV_PROTOCOL = {"readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"]}


def _dv_mask_adds(qt, snap, matched: List[str], hits):
    """Union the ``hits`` (columns ``fp`` = file URI, ``ri`` = row
    position) into each matched file's deletion vector and return
    ``(re-add FileEntry list, newly masked row count)`` — no commit.
    Raw-scan hit sources may re-surface already-masked positions; the
    per-file union makes those no-ops and the new-mask count exact."""
    from .deletion_vectors import (DVDescriptor, _ensure_shipped,
                                   descriptor_positions,
                                   roaring_array_encode, write_dv_file,
                                   z85_encode)

    _ensure_shipped()
    table_path = os.path.abspath(qt.path)
    old_dv = {}     # file URI -> existing descriptor json
    uri_to_rel = {}
    for rel in matched:
        from .deletion_vectors import _file_uri

        uri = _file_uri(os.path.join(table_path, rel))
        uri_to_rel[uri] = rel
        if snap.files[rel].dv:
            old_dv[uri] = snap.files[rel].dv

    def _build(key, pdf):
        import uuid as _u

        import numpy as _np
        import pandas as pd

        fp = key[0]
        new = _np.unique(pdf["ri"].to_numpy(dtype="int64"))
        prev = _np.empty(0, dtype="int64")
        desc_json = old_dv.get(fp)
        if desc_json:
            prev = descriptor_positions(
                table_path, DVDescriptor.from_json(desc_json))
        union = _np.union1d(prev, new)
        uid = _u.uuid4()
        name = f"deletion_vector_{uid}.bin"
        data = roaring_array_encode(union)
        offset, size = write_dv_file(
            os.path.join(table_path, name), data)
        return pd.DataFrame({
            "fp": [fp], "enc": [z85_encode(uid.bytes)],
            "offset": [offset], "size": [size],
            "cardinality": [len(union)],
            "new_deletes": [len(union) - len(prev)]})

    out = (hits.repartition(max(1, len(matched)), "fp")
           .groupBy("fp")
           .applyInPandas(_build, schema="fp string, enc string, "
                          "offset long, size long, cardinality long, "
                          "new_deletes long")
           .collect())
    add: List = []
    total_new = 0
    import dataclasses

    for r in out:
        rel = uri_to_rel[r["fp"]]
        f = dataclasses.replace(snap.files[rel], dv={
            "storageType": "u", "pathOrInlineDv": r["enc"],
            "offset": int(r["offset"]), "sizeInBytes": int(r["size"]),
            "cardinality": int(r["cardinality"])})
        add.append(f)
        total_new += int(r["new_deletes"])
    return add, total_new


def _mor_commit(qt, snap, matched: List[str], hits, post, operation: str,
                cdc=None, staged=None, read_files=None,
                scale: float = 1.0,
                txn: Optional[Dict[str, Any]] = None) -> int:
    """Merge-on-read commit (Delta's DV-backed UPDATE/MERGE shape): mask
    the matched rows of ``matched`` files via deletion vectors and append
    only the replacement rows ``post`` as new indexed files — one atomic
    version, NO data-file rewrite. Write amplification drops from
    O(matched files' bytes) to O(changed rows); readers anti-join the
    bitmaps until ``optimize()`` compacts them away. ``staged`` rows (out
    of the revision space) land in the staging lane of the SAME commit."""
    from ..core.revision import STAGING_REVISION_ID, Revision
    import time as _time

    dv_adds, _ = _dv_mask_adds(qt, snap, matched, hits)
    rev = snap.latest_revision()
    add: List = list(dv_adds)
    revisions: Dict = {}
    cube_weights = None
    if rev is not None:
        revisions[rev.revision_id] = rev
        if post is not None:
            selected = [snap.files[rel] for rel in matched]
            new_adds, payload = _indexed_adds(qt, snap, rev, post,
                                              selected, scale=scale)
            add += new_adds
            cube_weights = {rev.revision_id: payload}
    elif post is not None:
        # staging-only table: replacement rows stay staging files
        staged = post if staged is None else staged.unionByName(post)
    if staged is not None:
        from .optimize import _write_staging_files

        add += _write_staging_files(staged, qt.path)
        revisions[STAGING_REVISION_ID] = Revision(
            STAGING_REVISION_ID, int(_time.time() * 1000),
            5_000_000, [], [], [])
    return qt.log.commit(
        add=add, remove=[],
        revisions=revisions or None,
        cube_weights=cube_weights,
        schema_json=snap.schema_json,
        data_change=True, operation=operation, cdc=cdc,
        read_version=snap.version,
        read_files=read_files or matched,
        txn=txn,
        protocol=_DV_PROTOCOL)


def update_rows(spark, path: str, assignments: Dict[str, Any],
                filters=None, mode: str = "auto",
                txn_app_id: Optional[str] = None,
                txn_version: Optional[int] = None) -> dict:
    """UPDATE <path> SET <assignments> WHERE <filters>; see module
    docstring. ``assignments`` maps column name -> SQL expression string
    or Column; expressions are cast back to the column's declared type
    (Delta UPDATE's implicit-cast semantics).

    ``mode`` picks the physical strategy (Delta's DV-backed UPDATE):

    - ``"rewrite"``: rewrite every matched file with the assignments
      applied (the pre-r8 behavior).
    - ``"dv"``: merge-on-read — mask the matched rows with deletion
      vectors and append ONLY the post-image rows as new indexed files.
      Write amplification drops from O(matched files' bytes) to
      O(changed rows); at 100 TB a selective UPDATE stops rewriting
      multi-GB files to change a handful of rows.
    - ``"auto"`` (default): ``"dv"`` while the matched rows are a
      small minority (< ``DV_UPDATE_MAX_FRACTION``) of the matched
      files' live rows, else ``"rewrite"``. The bar is stricter than
      DELETE's: an update's masked fraction taxes every later read AND
      still pays the post-image append."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    from .reader import QbeastTable

    if mode not in ("rewrite", "dv", "auto"):
        raise ValueError(f"unknown update mode {mode!r}")
    if not assignments:
        raise ValueError("update needs at least one column assignment")
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version must be set together")
    qt = QbeastTable(spark, path)
    snap = qt.snapshot(refresh=True)
    if txn_app_id is not None and \
            snap.txns.get(txn_app_id, -1) >= int(txn_version):
        return {"version": snap.version, "skipped_txn": True,
                "rows_updated": 0, "files_rewritten": 0,
                "files_scanned": 0}
    txn = ({"appId": txn_app_id, "version": int(txn_version)}
           if txn_app_id is not None else None)
    if not snap.files:
        version = None
        if txn is not None:
            version = qt.log.commit(
                add=[], remove=[], schema_json=snap.schema_json,
                data_change=False, operation="UPDATE", txn=txn,
                read_version=snap.version)
        return {"version": version, "rows_updated": 0,
                "files_rewritten": 0, "files_scanned": 0}
    schema = qt.schema()
    by_name = {f.name: f for f in schema.fields} if schema else {}
    for c in assignments:
        if by_name and c not in by_name:
            raise ValueError(f"unknown column {c!r} "
                             f"(table has {sorted(by_name)})")
    candidates, residual = qt._candidates_and_residual(filters, snap)
    _reject_nondeterministic(qt, snap, residual, "UPDATE")
    # Fused pass (r12, same shape as delete_rows): when dv mode is
    # possible and there is a residual to evaluate, one persisted
    # (fp, ri) scan feeds both the per-file counts and the dv mask
    # build. residual=None keeps the metadata-only counts (no scan at
    # all); explicit rewrite keeps the count-only job.
    hits = None
    try:
        if residual is None:
            per_file = {rel: snap.files[rel].live_rows
                        for rel in candidates}
        elif mode == "rewrite" or not candidates:
            per_file = _match_counts(qt, candidates, residual)
        else:
            hits = _match_hits(qt, snap, candidates, residual).persist()
            per_file = {
                _rel_path(qt, r["fp"]): int(r["count"])
                for r in hits.groupBy("fp").count().collect()}
        if not per_file:
            version = None
            if txn is not None:
                version = qt.log.commit(
                    add=[], remove=[], schema_json=snap.schema_json,
                    data_change=False, operation="UPDATE", txn=txn,
                    read_version=snap.version)
            return {"version": version, "rows_updated": 0,
                    "files_rewritten": 0,
                    "files_scanned": len(candidates)}
        matched = sorted(per_file)
        n_upd = int(sum(per_file.values()))
        live = sum(snap.files[rel].live_rows for rel in matched)
        if mode == "auto":
            mode = "dv" if n_upd < DV_UPDATE_MAX_FRACTION * max(live, 1) \
                and _pred_deterministic(qt, snap, residual) else "rewrite"
        elif mode == "dv" and not _pred_deterministic(qt, snap, residual):
            raise ValueError(
                "dv update requires a deterministic predicate: the mask "
                "scan and the post-image write evaluate it independently, "
                "so a nondeterministic one would lose or duplicate rows — "
                "use mode='rewrite'")
        df = qt._df_for_files(matched)
        pred = (F.coalesce(residual, F.lit(False))
                if residual is not None else F.lit(True))
        pre = qt._df_for_files(matched, snap=snap).where(pred)
        post = pre
        for cname, expr in assignments.items():
            e = F.expr(expr) if isinstance(expr, str) else expr
            if not isinstance(e, Column):
                e = F.lit(expr)
            if by_name:
                e = e.cast(by_name[cname].dataType)
            df = df.withColumn(cname, F.when(pred, e)
                               .otherwise(F.col(cname)))
            # CDF post-image: the assignment applied unconditionally to
            # the PRE rows (evaluating pred against df would see updated
            # values)
            post = post.withColumn(cname, e)
        # DV mode only ever writes the post rows — checking them (vs the
        # full rewrite frame) is equivalent: unchanged rows are in space
        # already
        _check_revision_space(qt, snap, post if mode == "dv" else df,
                              set(assignments))
        from .constraints import constraints_of, validate_constraints

        validate_constraints(post if mode == "dv" else df,
                             constraints_of(snap.properties),
                             context="UPDATE")
        cdc = _cdc_of(qt, snap, [(pre, "update_preimage"),
                                 (post, "update_postimage")])
        if mode == "dv":
            if hits is None:        # residual None: all live positions
                hits = _hit_positions(
                    _raw_positions(qt, matched).where(pred))
            version = _mor_commit(qt, snap, matched, hits, post, "UPDATE",
                                  cdc=cdc, scale=n_upd / max(live, 1),
                                  txn=txn)
            return {"version": version, "rows_updated": n_upd,
                    "files_rewritten": 0, "files_dv": len(matched),
                    "files_scanned": len(candidates)}
        version = _rewrite(qt, snap, matched, df, operation="UPDATE",
                           cdc=cdc, txn=txn)
        return {"version": version,
                "rows_updated": n_upd,
                "files_rewritten": len(matched),
                "files_scanned": len(candidates)}
    finally:
        if hits is not None and hits.is_cached:
            hits.unpersist()


def merge_rows(spark, path: str, source, on,
               when_matched_update=None, when_matched_delete: bool = False,
               when_not_matched_insert=None, mode: str = "auto",
               txn_app_id: Optional[str] = None,
               txn_version: Optional[int] = None,
               materialize_source: str = "auto") -> dict:
    """MERGE INTO <path> USING <source> ON <equi keys> — the upsert verb
    the reference hands to the DeltaTable API at the cost of its index;
    here the table stays fully qbeast-readable (module docstring).

    ``on``: key column name or list of names (equi-join keys).
    ``when_matched_update``: ``"all"`` (every target column takes the
    source value — source must carry all target columns) or a dict
    mapping target column -> SQL string / Column; expressions see target
    columns by name and source columns as ``__src_<name>``. Mutually
    exclusive with ``when_matched_delete=True`` (matched rows removed).
    ``when_not_matched_insert``: ``"all"`` or a dict over source columns
    (unassigned target columns become NULL); ``None`` inserts nothing.

    Scale shape (Delta MERGE's two-pass plan): pass 1 joins the
    column-pruned target key scan against the distinct source keys to
    find the files that contain a match (O(#files) driver result);
    pass 2 rewrites only those files — matched rows transformed by a
    single equi-join with the source, not-matched source rows appended
    through the existing cube weights — and commits adds + removes in
    ONE atomic log version. A target row matching more than one source
    row raises (Delta's multiple-source-match error).

    ``mode`` picks the matched-file strategy (Delta's DV-backed MERGE):
    ``"rewrite"`` replaces the matched files outright; ``"dv"`` masks
    the matched rows with deletion vectors and appends only the changed
    rows (merge-on-read — O(changed rows) written, not O(matched
    files' bytes)); ``"auto"`` (default) picks ``"dv"`` while matched
    rows are a small minority (< ``DV_UPDATE_MAX_FRACTION``, stricter
    than DELETE's bar — the masked fraction taxes every later read) of
    the matched files' live rows.

    ``txn_app_id``/``txn_version`` make the merge IDEMPOTENT exactly
    like write_qbeast's streaming epochs: a merge replayed with an
    (appId, version) at or below the table's recorded high-water mark
    is skipped before any work (and race-free again inside the commit),
    the foundation of the streaming upsert sink.

    ``materialize_source`` (Delta's merge materialize-source knob):
    ``"auto"`` (default) persists the source only when Catalyst cannot
    prove its plan rescan-stable (nondeterministic expressions,
    limits/samples, subqueries, or non-file leaves) — deterministic
    sources such as the streaming upsert sink's per-batch frame run
    unpinned; ``"all"`` always persists (an expensive source recomputed
    by merge's ~4 jobs); ``"none"`` never persists (caller guarantees
    stability)."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    from .reader import QbeastTable

    if mode not in ("rewrite", "dv", "auto"):
        raise ValueError(f"unknown merge mode {mode!r}")
    if materialize_source not in ("auto", "all", "none"):
        raise ValueError(
            f"unknown materialize_source {materialize_source!r}")
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version must be set together")
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("merge needs at least one key column in `on`")
    if when_matched_update is not None and when_matched_delete:
        raise ValueError("when_matched_update and when_matched_delete "
                         "are mutually exclusive")
    has_matched = when_matched_update is not None or when_matched_delete
    if not has_matched and when_not_matched_insert is None:
        raise ValueError("merge needs at least one WHEN clause")
    missing = [k for k in keys if k not in source.columns]
    if missing:
        raise ValueError(f"source lacks merge key column(s) {missing}")

    qt = QbeastTable(spark, path)
    snap = qt.snapshot(refresh=True)
    if txn_app_id is not None and \
            snap.txns.get(txn_app_id, -1) >= int(txn_version):
        # replayed epoch: already committed — idempotent skip before any
        # job runs (the commit itself re-checks race-free AS OF listing)
        return {"version": snap.version, "skipped_txn": True,
                "files_rewritten": 0, "rows_inserted": 0,
                "rows_updated": 0, "rows_deleted": 0, "files_scanned": 0}
    txn = ({"appId": txn_app_id, "version": int(txn_version)}
           if txn_app_id is not None else None)
    schema = qt.schema()
    tcols = [f.name for f in schema.fields] if schema \
        else list(source.columns)
    by_name = {f.name: f for f in schema.fields} if schema else {}
    clash = [c for c in source.columns if c.startswith("__src_")]
    if clash:
        raise ValueError(f"source columns may not start with __src_: "
                         f"{clash}")

    def _to_target_schema(df, exprs: Dict[str, Any]):
        """Project ``exprs`` (target col -> Column) to the full target
        schema, NULL-filling and casting to declared types."""
        cols = []
        for c in tcols:
            e = exprs.get(c)
            if e is None:
                e = F.lit(None)
            if by_name:
                e = e.cast(by_name[c].dataType)
            cols.append(e.alias(c))
        return df.select(*cols)

    # Pin the source ONCE, before pass 1: file discovery (the key box
    # and the per-file match counts below), the dv mask scan, and the
    # post-image/insert joins each trigger their own jobs over it, and a
    # nondeterministic source (rand()-filtered, a shuffling subquery, a
    # re-read of mutating files) would give each pass a different row
    # sample — matched files undiscovered, masks disagreeing with the
    # recorded keys. Delta materializes its MERGE source for the same
    # reason — but ONLY when the source plan is not provably
    # rescan-stable; a deterministic plan over stable scans yields the
    # same rows in every pass, so pinning it is pure overhead (the
    # streaming upsert sink pays it per batch — VERDICT r9 Next #3).
    # Every frame pinned below (the source, the insert set) is released
    # in the finally: merge raises on multiple-source-match, unknown
    # columns, constraint and revision-space violations AFTER pinning,
    # and a leaked persist pins executor storage for the session
    # lifetime (r9 review) — a retrying streaming upsert sink would
    # accumulate them until eviction pressure or OOM.
    pins = []                   # persisted frames, released in finally
    if materialize_source == "all" or (
            materialize_source == "auto"
            and not _source_safe_to_rescan(source)):
        source = source.persist()
        pins.append(source)
    try:

        # pass 1: which files contain a matched row (column-pruned key scan).
        # Candidate files are first pruned with the source's per-key
        # [min, max] bounding box (ONE tiny agg job over the source): an
        # equi-match must lie inside every key's range, so the same
        # OTree/stats pruning read() uses skips files outside the box before
        # any target scan. A source spanning the full key domain degrades to
        # the all-files scan; an empty (or all-null-key) source skips pass 1
        # outright. At 100 TB this turns MERGE's find-touched-files pass
        # from O(table) into O(files overlapping the source's key range).
        per_file: Dict[str, int] = {}
        box: Optional[list] = []        # [] = no pruning possible; None = no
        box_cands = None                # non-null source keys (no matches)
        if snap.files:
            import datetime as _dt

            aggs = []
            for k in keys:
                aggs += [F.min(k).alias(f"__lo_{k}"),
                         F.max(k).alias(f"__hi_{k}")]
            b = source.agg(*aggs).collect()[0]
            for k in keys:
                lo, hi = b[f"__lo_{k}"], b[f"__hi_{k}"]
                if lo is None:          # no non-null key values: no matches
                    box = None
                    break
                if (isinstance(lo, (int, float, str, _dt.date, _dt.datetime))
                        and not isinstance(lo, bool)):
                    box += [(k, ">=", lo), (k, "<=", hi)]
            if box is not None:
                box_cands = qt._candidates_and_residual(box or None, snap)
        n_scanned = 0
        hits_all = None         # fused (fp, ri) match positions (r12)
        if has_matched and snap.files and box_cands is not None and \
                box_cands[0]:
            candidates, residual = box_cands
            n_scanned = len(candidates)
            # ONE job yields the per-file match counts, Delta's
            # multiple-source-match guard, AND the dv mask positions
            # (r12 fusion — the mask pass used to rescan the matched
            # files): the target key scan (carrying the captured file
            # URI and row position) inner-joins the key-GROUPED source
            # (unique per key, so target row multiplicity is preserved
            # — counts equal the former semi-join) while carrying each
            # key's source row count; any matched key with >1 source
            # rows raises before anything is planned further. The
            # persisted frame is narrow (uri, position, count) and
            # bounded by the matched rows; released in the finally.
            srcg = source.groupBy(*keys).agg(
                F.count(F.lit(1)).alias("__src_n"))
            sel = qt._df_for_files(candidates, snap=snap, file_col="_f",
                                   pos_col="_ri")
            if residual is not None:
                sel = sel.where(residual)
            hits_all = (sel.select("_f", "_ri", *keys)
                        .join(srcg, keys, "inner")
                        .select(F.col("_f").alias("fp"),
                                F.col("_ri").alias("ri"), "__src_n")
                        .persist())
            pins.append(hits_all)
            rows = (hits_all.groupBy("fp")
                    .agg(F.count(F.lit(1)).alias("__n"),
                         F.max("__src_n").alias("__mx")).collect())
            if any(r["__mx"] > 1 for r in rows):
                raise ValueError(
                    "merge source has multiple rows for a matched key; "
                    "aggregate the source to one row per key first")
            for r in rows:
                per_file[_rel_path(qt, r["fp"])] = int(r["__n"])
        matched = sorted(per_file)
        n_matched = int(sum(per_file.values()))
        live = sum(snap.files[rel].live_rows for rel in matched)
        if mode == "auto":
            # a matched-delete merge is a DELETE in merge clothing (mask
            # only, no post-image append) -> DELETE's laxer bar applies
            bar = DV_DELETE_MAX_FRACTION if when_matched_delete \
                else DV_UPDATE_MAX_FRACTION
            mode = "dv" if matched and n_matched < bar * max(live, 1) \
                else "rewrite"
        elif mode == "dv" and not matched:
            mode = "rewrite"        # nothing to mask: plain append path

        # not-matched source rows -> insert set (bounded by the source size)
        inserts = None
        n_ins = 0
        if when_not_matched_insert is not None:
            anti = source
            if snap.files and box_cands is not None:
                # the anti-join's right side only needs target keys inside
                # the source's key box: keys outside it cannot equal any
                # source key, so the box-pruned file list (shared with
                # pass 1) replaces the full-table scan
                cand, resid = box_cands
                n_scanned = max(n_scanned, len(cand))
                tgt = qt._df_for_files(cand, snap=snap)
                if resid is not None:
                    tgt = tgt.where(resid)
                anti = source.join(tgt.select(*keys).distinct(),
                                   keys, "left_anti")
            if when_not_matched_insert == "all":
                lacking = [c for c in tcols if c not in source.columns]
                if lacking:
                    raise ValueError(
                        f"insert='all' needs every target column in the "
                        f"source; missing {lacking}")
                exprs = {c: F.col(c) for c in tcols}
            else:
                exprs = {}
                for c, e in when_not_matched_insert.items():
                    if by_name and c not in by_name:
                        raise ValueError(f"unknown target column {c!r}")
                    e = F.expr(e) if isinstance(e, str) else e
                    exprs[c] = e if isinstance(e, Column) else F.lit(e)
                for k in keys:
                    exprs.setdefault(k, F.col(k))
            inserts = _to_target_schema(anti, exprs).persist()
            pins.append(inserts)
            # ONE agg job yields the insert count AND the revision-space
            # bounds (r12: the count and the later _space_violation each
            # ran their own job over the persisted insert frame)
            rev_ins = snap.latest_revision()
            ins_checks = _space_checks(
                rev_ins, set(rev_ins.column_names)) \
                if rev_ins is not None else []
            ins_row = inserts.agg(
                F.count(F.lit(1)).alias("__n_ins"),
                *_space_min_max_aggs(ins_checks)).first()
            n_ins = int(ins_row["__n_ins"])
            ins_violation = _space_violation_of_row(ins_checks, ins_row) \
                if n_ins else None

        # pass 2: new contents of the matched files (rewrite mode) / the
        # changed rows only (dv mode — the full-contents frame is never
        # planned, matched files survive behind their bitmaps)
        updated = None
        post = None                 # dv mode: post-image of changed rows
        cdc_frames = []             # (changed-rows frame, _change_type)
        skeys = None                # distinct source keys, shared by joins
        if matched:
            cur = qt._df_for_files(matched)
            if when_matched_delete:
                # source is pinned above, so the mask scan's key set and the
                # cdc semi-join see the same rows without re-pinning here
                skeys = source.select(*keys).distinct()
                if mode != "dv":
                    updated = cur.join(skeys, keys, "left_anti")
                cdc_frames.append(
                    (cur.join(skeys, keys, "left_semi"), "delete"))
            else:
                src = source.select(
                    *keys, *[F.col(c).alias(f"__src_{c}")
                             for c in source.columns if c not in keys])
                joined = cur.join(
                    src.withColumn("__src__m", F.lit(True)), keys, "left")
                hit = F.col("__src__m").isNotNull()
                if when_matched_update == "all":
                    lacking = [c for c in tcols if c not in source.columns]
                    if lacking:
                        raise ValueError(
                            f"update='all' needs every target column in the "
                            f"source; missing {lacking}")
                    assignments = {c: F.col(f"__src_{c}")
                                   for c in tcols if c not in keys}
                else:
                    assignments = {}
                    for c, e in when_matched_update.items():
                        if by_name and c not in by_name:
                            raise ValueError(f"unknown target column {c!r}")
                        if c in keys:
                            raise ValueError(f"merge may not update key {c!r}")
                        e = F.expr(e) if isinstance(e, str) else e
                        assignments[c] = e if isinstance(e, Column) else F.lit(e)
                exprs = {}
                for c in tcols:
                    e = assignments.get(c)
                    base = F.col(c)
                    exprs[c] = base if e is None else F.when(hit, e) \
                        .otherwise(base)
                post = _to_target_schema(joined.where(hit), exprs)
                if mode != "dv":
                    updated = _to_target_schema(joined, exprs)
                cdc_frames.append((joined.where(hit).select(*tcols),
                                   "update_preimage"))
                cdc_frames.append((post, "update_postimage"))

        if not matched and n_ins == 0:
            version = None
            if txn is not None:
                # a no-op merge must still advance the txn high-water mark
                # (Delta parity: the txn action rides an otherwise empty
                # commit) — streaming epochs that matched nothing would
                # otherwise stay unrecorded, and after a checkpoint loss an
                # old epoch could re-execute against newer state
                version = qt.log.commit(
                    add=[], remove=[], schema_json=snap.schema_json,
                    data_change=False, operation="MERGE", txn=txn,
                    read_version=snap.version)
            return {"version": version, "files_rewritten": 0,
                    "rows_inserted": 0,
                    "rows_updated": 0, "rows_deleted": 0,
                    "files_scanned": int(n_scanned)}

        changed = post if mode == "dv" else updated
        if matched and when_matched_update is not None:
            assigned = set(tcols) - set(keys) if when_matched_update == "all" \
                else set(when_matched_update)
            # dv mode checks the post rows only — the ones it writes;
            # unchanged rows are in space already
            _check_revision_space(qt, snap, changed, assigned)
        # inserts that fit the revision space index through the existing cube
        # weights; out-of-space inserts go to the staging lane (revision 0)
        # inside the same commit — readable now, indexed by the next optimize()
        replacement, staged = changed, None
        if inserts is not None and n_ins:
            rev = snap.latest_revision()
            if rev is not None and ins_violation is not None:
                staged = inserts
            else:
                replacement = inserts if replacement is None \
                    else replacement.unionByName(inserts)
        from .constraints import constraints_of, validate_constraints

        # only the frames carrying NEW values need checking: updated rows
        # (when an update clause ran) and inserted rows (staged or in-space);
        # delete-only rewrites just drop rows
        checks = constraints_of(snap.properties)
        if checks:
            if when_matched_update is not None and changed is not None:
                validate_constraints(changed, checks, context="MERGE update")
            if inserts is not None and n_ins:
                validate_constraints(inserts, checks, context="MERGE insert")
        # MERGE commits mix rewritten and inserted rows in their add files,
        # so inserts must be recorded explicitly too (Delta does the same)
        if inserts is not None and n_ins:
            cdc_frames.append((inserts, "insert"))
        cdc = _cdc_of(qt, snap, cdc_frames)
        if mode == "dv":
            # matched rows are masked where they sit; the mask positions
            # come from the SAME persisted pass-1 frame that produced the
            # match counts (r12 fusion — the former raw-position rescan +
            # source semi-join is gone), so file discovery, the mask, and
            # the post-image join agree on the matched key set by
            # construction. replacement carries only the changed rows +
            # in-space inserts.
            hits = hits_all.select("fp", "ri")
            version = _mor_commit(qt, snap, matched, hits, replacement,
                                  "MERGE", cdc=cdc, staged=staged,
                                  read_files=list(snap.files.keys()),
                                  scale=n_matched / max(live, 1), txn=txn)
        else:
            version = _rewrite(qt, snap, matched, replacement, staged=staged,
                               read_files=list(snap.files.keys()),
                               operation="MERGE", cdc=cdc, txn=txn)
        return {"version": version,
                "files_rewritten": 0 if mode == "dv" else len(matched),
                **({"files_dv": len(matched)} if mode == "dv" else {}),
                "rows_inserted": int(n_ins),
                "inserts_staged": staged is not None,
                "rows_updated": n_matched if when_matched_update is not None
                else 0,
                "rows_deleted": n_matched if when_matched_delete else 0,
                # pass-1 observability: how many files the source-key
                # bounding box let the match scan read (vs len(snap.files))
                "files_scanned": int(n_scanned)}
    finally:
        for p in pins:
            p.unpersist()


def _space_checks(rev, cols: set):
    """The (column, LinearTransformation) pairs whose bounds need
    checking for the given assigned/inserted columns."""
    return [
        (name, t) for name, t in zip(rev.column_names, rev.transformations)
        if name in cols and isinstance(t, LinearTransformation)]


def _space_violation_of_row(checks, row):
    """Evaluate the bounds check against an already-collected agg row
    carrying ``mn_<col>``/``mx_<col>`` — lets callers fuse the min/max
    agg into a job they are running anyway (merge fuses it with the
    insert count, r12)."""
    for name, t in checks:
        mn, mx = row[f"mn_{name}"], row[f"mx_{name}"]
        if mn is None:
            continue
        if float(mn) < t.min_value or float(mx) > t.max_value:
            return (f"indexed column {name!r} outside the revision space "
                    f"[{t.min_value}, {t.max_value}] "
                    f"(new range [{mn}, {mx}])")
    return None


def _space_min_max_aggs(checks):
    from pyspark.sql import functions as F

    aggs = []
    for name, _t in checks:
        aggs += [F.min(name).alias(f"mn_{name}"),
                 F.max(name).alias(f"mx_{name}")]
    return aggs


def _space_violation(rev, df, cols: set):
    """None if every linear-indexed column in ``cols`` stays inside the
    revision space over ``df``, else a description of the first breach.
    One tiny agg over the (already pruned) rewrite set."""
    checks = _space_checks(rev, cols)
    if not checks:
        return None
    row = df.agg(*_space_min_max_aggs(checks)).first()
    return _space_violation_of_row(checks, row)


def _check_revision_space(qt, snap, df, assigned: set) -> None:
    """Updated linear-indexed columns must stay inside the revision space:
    out-of-space values would be clamp-assigned to edge cubes, skewing
    future pruning."""
    rev = snap.latest_revision()
    if rev is None:
        return
    violation = _space_violation(rev, df, assigned)
    if violation is not None:
        raise ValueError(
            f"update moves {violation}; delete the rows and append "
            "them through write() so the revision can grow instead")
