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

__all__ = ["delete_rows", "update_rows"]


def _match_counts(qt, candidates: Sequence[str], residual
                  ) -> Dict[str, int]:
    """{rel_path: matching row count} for candidate files that contain at
    least one row matching ``residual`` — one job, O(#files) result."""
    from pyspark.sql import functions as F

    if not candidates:
        return {}
    rows = (qt._df_for_files(candidates).where(residual)
            .groupBy(F.input_file_name().alias("_f")).count().collect())
    root = os.path.abspath(qt.path)
    out: Dict[str, int] = {}
    for r in rows:
        p = urllib.parse.unquote(urllib.parse.urlparse(r["_f"]).path)
        out[os.path.relpath(os.path.abspath(p), root)] = int(r["count"])
    return out


def _rewrite(qt, snap, matched: List[str], replacement) -> int:
    """Write ``replacement`` (the new contents of ``matched`` files)
    through the index pipeline against the existing cube weights, and
    commit adds + removes in one version. Mirrors optimize_table's
    re-layout (IndexedTable.scala:399-552 analogue) with dataChange=True."""
    from ..core.revision import STAGING_REVISION_ID, Revision
    from ..index.analyzer import compute_rollup_from_counts
    import time as _time

    log: CommitLog = qt.log
    rev = snap.latest_revision()
    selected = [snap.files[rel] for rel in matched]
    bloom_cols = sorted({c for f in selected for c in (f.blooms or {})})

    if rev is None:
        # staging-only table: replacement rows stay staging files
        from .optimize import _write_staging_files

        add = _write_staging_files(replacement, qt.path)
        staging = Revision(STAGING_REVISION_ID, int(_time.time() * 1000),
                           5_000_000, [], [], [])
        return log.commit(add=add, remove=matched,
                          revisions={STAGING_REVISION_ID: staging},
                          schema_json=snap.schema_json
                          or replacement.schema.json(),
                          data_change=True)

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
            counts[key] = counts.get(key, 0.0) + b.count
    for key in weights:
        counts.setdefault(key, 0.0)
    rollup = compute_rollup_from_counts(counts, rev.dims,
                                        rev.desired_cube_size)
    file_map = _complete_file_map(weights.keys(), rollup, rev.dims)
    num_files = max(1, len(set(rollup.values())))
    add = _materialize(prepared, rev, weights, file_map, num_files, qt.path,
                       bloom_cols=tuple(bloom_cols))
    return log.commit(
        add=add,
        remove=matched,
        revisions={rev.revision_id: rev},
        cube_weights={rev.revision_id: {
            _cube_str(d, p): int(w) for (d, p), w in weights.items()}},
        schema_json=snap.schema_json or replacement.schema.json(),
        data_change=True,
    )


def delete_rows(spark, path: str, filters=None) -> dict:
    """DELETE FROM <path> WHERE <filters>; see module docstring.
    ``filters`` speaks read()'s languages (tuple DNF, SQL string, Column);
    ``None`` truncates the table without touching any data file."""
    from pyspark.sql import functions as F

    from .reader import QbeastTable

    qt = QbeastTable(spark, path)
    snap = qt.snapshot(refresh=True)
    if not snap.files:
        return {"version": None, "rows_deleted": 0, "files_rewritten": 0}
    candidates, residual = qt._candidates_and_residual(filters, snap)
    if residual is None:
        rows = sum(f.rows for f in snap.files.values())
        version = qt.log.commit(add=[], remove=list(snap.files.keys()),
                                schema_json=snap.schema_json,
                                data_change=True)
        return {"version": version, "rows_deleted": int(rows),
                "files_rewritten": 0}
    per_file = _match_counts(qt, candidates, residual)
    if not per_file:
        return {"version": None, "rows_deleted": 0, "files_rewritten": 0}
    matched = sorted(per_file)
    survivors = qt._df_for_files(matched).where(
        ~F.coalesce(residual, F.lit(False)))
    version = _rewrite(qt, snap, matched, survivors)
    return {"version": version,
            "rows_deleted": int(sum(per_file.values())),
            "files_rewritten": len(matched)}


def update_rows(spark, path: str, assignments: Dict[str, Any],
                filters=None) -> dict:
    """UPDATE <path> SET <assignments> WHERE <filters>; see module
    docstring. ``assignments`` maps column name -> SQL expression string
    or Column; expressions are cast back to the column's declared type
    (Delta UPDATE's implicit-cast semantics)."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    from .reader import QbeastTable

    if not assignments:
        raise ValueError("update needs at least one column assignment")
    qt = QbeastTable(spark, path)
    snap = qt.snapshot(refresh=True)
    if not snap.files:
        return {"version": None, "rows_updated": 0, "files_rewritten": 0}
    schema = qt.schema()
    by_name = {f.name: f for f in schema.fields} if schema else {}
    for c in assignments:
        if by_name and c not in by_name:
            raise ValueError(f"unknown column {c!r} "
                             f"(table has {sorted(by_name)})")
    candidates, residual = qt._candidates_and_residual(filters, snap)
    if residual is None:
        per_file = {rel: snap.files[rel].rows for rel in candidates}
    else:
        per_file = _match_counts(qt, candidates, residual)
    if not per_file:
        return {"version": None, "rows_updated": 0, "files_rewritten": 0}
    matched = sorted(per_file)
    df = qt._df_for_files(matched)
    pred = (F.coalesce(residual, F.lit(False))
            if residual is not None else F.lit(True))
    for cname, expr in assignments.items():
        e = F.expr(expr) if isinstance(expr, str) else expr
        if not isinstance(e, Column):
            e = F.lit(expr)
        if by_name:
            e = e.cast(by_name[cname].dataType)
        df = df.withColumn(cname, F.when(pred, e)
                           .otherwise(F.col(cname)))
    _check_revision_space(qt, snap, df, set(assignments))
    version = _rewrite(qt, snap, matched, df)
    return {"version": version,
            "rows_updated": int(sum(per_file.values())),
            "files_rewritten": len(matched)}


def _check_revision_space(qt, snap, df, assigned: set) -> None:
    """Updated linear-indexed columns must stay inside the revision space:
    out-of-space values would be clamp-assigned to edge cubes, skewing
    future pruning. One tiny agg over the (already pruned) rewrite set."""
    from pyspark.sql import functions as F

    rev = snap.latest_revision()
    if rev is None:
        return
    checks = [
        (name, t) for name, t in zip(rev.column_names, rev.transformations)
        if name in assigned and isinstance(t, LinearTransformation)]
    if not checks:
        return
    aggs = []
    for name, _t in checks:
        aggs += [F.min(name).alias(f"mn_{name}"),
                 F.max(name).alias(f"mx_{name}")]
    row = df.agg(*aggs).first()
    for name, t in checks:
        mn, mx = row[f"mn_{name}"], row[f"mx_{name}"]
        if mn is None:
            continue
        if float(mn) < t.min_value or float(mx) > t.max_value:
            raise ValueError(
                f"update moves indexed column {name!r} outside the "
                f"revision space [{t.min_value}, {t.max_value}] "
                f"(new range [{mn}, {mx}]); delete the rows and append "
                "them through write() so the revision can grow instead")
