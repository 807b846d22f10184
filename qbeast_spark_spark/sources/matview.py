"""Incremental materialized aggregates ("continuous aggregates") driven by
the Change Data Feed.

A classic warehouse/hypertable feature the reference lacks entirely: define
a grouped aggregate over a qbeast table once, then ``refresh()`` applies
only the rows CHANGED since the last refresh — decoded from the change feed
(sources/cdf.py) — instead of re-scanning the table. At 100 TB the refresh
cost is O(changed data) + O(affected groups), never a table scan; the view
state itself is O(groups).

Delta-mergeable aggregates only (the honest contract):

- ``count`` / ``sum`` apply signed deltas exactly (insert/update_postimage
  = +1, delete/update_preimage = -1 — an UPDATE contributes its pre-image
  negatively and its post-image positively, so moved rows regroup
  correctly);
- ``avg`` is stored as (sum, count) internally and divided at read time;
- ``approx_count_distinct`` keeps a Datasketches HLL sketch per group
  (``hll_sketch_agg``/``hll_union``): sketches union monotonically, so
  refreshes succeed while the change range is INSERT-only and raise —
  with a recreate-the-view hint — when it contains deletes/updates;
- ``min``/``max`` are NOT mergeable under deletes (removing the current
  extremum needs the runner-up) and are refused with a clear error —
  recompute those from the source, where the OTree index prunes the scan.

State layout under ``view_path``::

    _matview.json            {source, group_cols, aggs, last_version,
                              state_dir}
    state-<version>/         parquet snapshot of the aggregate table

Each refresh writes a NEW ``state-<v>`` directory and atomically repoints
the meta (tmp + rename), so a crashed refresh never corrupts the view.
The current and the immediately superseded snapshot are both retained
(a lazy DataFrame handed out before a refresh stays readable); older
state dirs are removed.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Tuple, Union

__all__ = ["create_continuous_agg", "refresh_continuous_agg",
           "read_continuous_agg"]

META_NAME = "_matview.json"

AggSpec = Union[str, Tuple[str, str]]   # "count" | (fn, col)

_MERGEABLE = {"count", "sum", "avg", "approx_count_distinct"}


def _normalize_aggs(aggs: Dict[str, AggSpec]) -> Dict[str, Tuple[str, str]]:
    out: Dict[str, Tuple[str, str]] = {}
    for name, spec in aggs.items():
        if isinstance(spec, str):
            fn, col = spec, ""
        else:
            fn, col = spec
        fn = fn.lower()
        if fn not in _MERGEABLE:
            raise ValueError(
                f"aggregate {fn!r} ({name}) is not delta-mergeable: "
                f"deleting the current extremum needs a rescan — compute "
                f"min/max directly from the source table, where index "
                f"pruning applies. Mergeable: {sorted(_MERGEABLE)} "
                f"(approx_count_distinct only under insert-only changes)")
        if fn != "count" and not col:
            raise ValueError(f"{fn} needs a column: {name}=('{fn}', col)")
        out[name] = (fn, col)
    return out


def _internal_cols(aggs: Dict[str, Tuple[str, str]]):
    """Map each output agg to the (sum-like, count-like) internal columns
    that make it delta-mergeable."""
    cols = {}
    for name, (fn, col) in aggs.items():
        if fn == "count":
            cols[name] = {"cnt": f"_{name}_cnt"}
        elif fn == "approx_count_distinct":
            # an HLL sketch unions monotonically: exact for inserts,
            # impossible to subtract — refresh refuses delete ranges
            cols[name] = {"hll": f"_{name}_hll"}
        else:
            # sum carries a non-null count too: SQL SUM over a group
            # whose values are all NULL is NULL, and only the count can
            # distinguish that from values netting out to exactly 0
            cols[name] = {"sum": f"_{name}_sum", "cnt": f"_{name}_cnt"}
    return cols


def _delta_frame(changes, group_cols, aggs):
    """Signed per-group deltas from a CDF frame. ``_rows`` (net row
    count) is always present — it decides group liveness; ``count``
    means COUNT(*), while avg's internal count only counts NON-NULL
    values of its column (SQL AVG semantics)."""
    from pyspark.sql import functions as F

    sign = F.when(F.col("_change_type").isin("insert", "update_postimage"),
                  F.lit(1)).otherwise(F.lit(-1))
    exprs = [F.sum(sign).alias("_rows")]
    all_ints = _internal_cols(aggs)
    for name, (fn, col) in aggs.items():
        ints = all_ints[name]
        if "sum" in ints:
            exprs.append(F.sum(sign * F.col(col)).alias(ints["sum"]))
        if "cnt" in ints:
            cnt = (F.sum(sign) if fn == "count"
                   else F.sum(F.when(F.col(col).isNotNull(), sign)))
            exprs.append(cnt.alias(ints["cnt"]))
        if "hll" in ints:
            exprs.append(F.hll_sketch_agg(F.col(col)).alias(ints["hll"]))
    return changes.groupBy(*group_cols).agg(*exprs)


def _read_meta(view_path: str) -> dict:
    with open(os.path.join(view_path, META_NAME)) as fh:
        return json.load(fh)


def _write_meta(view_path: str, meta: dict) -> None:
    tmp = os.path.join(view_path, META_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, sort_keys=True)
    os.replace(tmp, os.path.join(view_path, META_NAME))


def create_continuous_agg(spark, source_path: str, view_path: str,
                          group_cols, aggs: Dict[str, AggSpec]) -> dict:
    """Materialize the grouped aggregate at the source's current version
    (ONE full computation — the last one the view ever needs) and record
    the watermark. The source table must have (or will transparently
    benefit from) the change data feed for later refreshes; appends,
    truncates and overwrites decode from file actions alone, DML needs
    ``enable_change_data_feed()`` before it runs."""
    from .reader import QbeastTable

    from pyspark.sql import functions as F

    aggs = _normalize_aggs(aggs)
    qt = QbeastTable.for_path(spark, source_path)
    snap = qt.snapshot(refresh=True)
    os.makedirs(view_path, exist_ok=True)
    state_dir = f"state-{snap.version:012d}"
    # read AS OF the watermark version: to_df() with no version would
    # re-read the log, so a commit landing between the snapshot and this
    # materialization would be baked into the state yet replayed again by
    # the first refresh (double-count)
    full = _delta_frame(
        qt.to_df(version=snap.version)
        .withColumn("_change_type", F.lit("insert")),
        list(group_cols), aggs)
    full.write.mode("overwrite").parquet(os.path.join(view_path, state_dir))
    meta = {"source": os.path.abspath(source_path),
            "group_cols": list(group_cols),
            "aggs": {k: list(v) for k, v in aggs.items()},
            "last_version": snap.version,
            "state_dir": state_dir}
    _write_meta(view_path, meta)
    return meta


def refresh_continuous_agg(spark, view_path: str) -> dict:
    """Fold every change committed since the last refresh into the view:
    decode the change feed once, aggregate the signed deltas per group
    (O(changed rows)), outer-merge with the stored state (O(groups)),
    write the new state snapshot, advance the watermark atomically.
    Groups whose count reaches zero disappear, matching a recomputation
    from scratch exactly."""
    from pyspark.sql import functions as F

    from .reader import QbeastTable

    meta = _read_meta(view_path)
    aggs = {k: tuple(v) for k, v in meta["aggs"].items()}
    group_cols = meta["group_cols"]
    qt = QbeastTable.for_path(spark, meta["source"])
    snap = qt.snapshot(refresh=True)
    last = int(meta["last_version"])
    if snap.version <= last:
        return {**meta, "refreshed": False}
    changes = qt.table_changes(last + 1, snap.version)
    has_hll = any(fn == "approx_count_distinct" for fn, _ in aggs.values())
    if has_hll:
        # the guard and the delta aggregation both consume the decoded
        # feed — persist so the CDF decode (sidecar reads + file-action
        # reconstruction) runs once, not twice
        changes = changes.persist()
        removals = changes.where(
            F.col("_change_type").isin("delete", "update_preimage"))
        if removals.limit(1).count() > 0:
            changes.unpersist()
            raise ValueError(
                "refresh range contains deletes/updates but the view has "
                "an approx_count_distinct aggregate — HLL sketches union "
                "monotonically and cannot subtract; recreate the view "
                "(create_continuous_agg) or keep the source insert-only")
    deltas = _delta_frame(changes, group_cols, aggs)
    state = spark.read.parquet(os.path.join(view_path, meta["state_dir"]))
    ints = _internal_cols(aggs)
    d = deltas.select(
        *[F.col(c).alias(f"_d_{c}") for c in group_cols],
        F.col("_rows").alias("_d__rows"),
        *[F.col(c).alias(f"_d_{c}")
          for name in aggs for c in ints[name].values()])
    cond = None
    for c in group_cols:
        # null-safe: NULL group keys must merge, not multiply
        e = state[c].eqNullSafe(d[f"_d_{c}"])
        cond = e if cond is None else (cond & e)
    merged = state.join(d, cond, "full_outer")
    out_cols = [F.coalesce(state[c], d[f"_d_{c}"]).alias(c)
                for c in group_cols]
    hll_cols = {c for name in aggs for k, c in ints[name].items()
                if k == "hll"}
    for c in ["_rows"] + [c for name in aggs
                          for c in ints[name].values()]:
        if c in hll_cols:
            # sketches union, they don't add; either side may be absent
            out_cols.append(
                F.when(state[c].isNull(), d[f"_d_{c}"])
                .when(d[f"_d_{c}"].isNull(), state[c])
                .otherwise(F.hll_union(state[c], d[f"_d_{c}"]))
                .alias(c))
        else:
            out_cols.append(
                (F.coalesce(state[c], F.lit(0))
                 + F.coalesce(d[f"_d_{c}"], F.lit(0))).alias(c))
    new_state = merged.select(*out_cols)
    # a group whose net row count reaches zero disappears, exactly as a
    # from-scratch recomputation would have it
    new_state = new_state.where(F.col("_rows") > 0)
    state_dir = f"state-{snap.version:012d}"
    new_state.write.mode("overwrite").parquet(
        os.path.join(view_path, state_dir))
    old_dir = meta["state_dir"]
    meta = {**meta, "last_version": snap.version, "state_dir": state_dir}
    _write_meta(view_path, meta)
    # keep the current AND the immediately superseded snapshot (a lazy
    # DataFrame handed out before this refresh may still be pinned to
    # it); anything older is garbage
    for name in sorted(d for d in os.listdir(view_path)
                       if d.startswith("state-")):
        if name not in (state_dir, old_dir):
            shutil.rmtree(os.path.join(view_path, name),
                          ignore_errors=True)
    if has_hll:
        changes.unpersist()
    return {**meta, "refreshed": True}


def read_continuous_agg(spark, view_path: str):
    """The view as (group_cols..., agg outputs...) — avg divided at read
    time from its internal (sum, count)."""
    from pyspark.sql import functions as F

    meta = _read_meta(view_path)
    aggs = {k: tuple(v) for k, v in meta["aggs"].items()}
    ints = _internal_cols(aggs)
    state = spark.read.parquet(os.path.join(view_path, meta["state_dir"]))
    cols = [F.col(c) for c in meta["group_cols"]]
    for name, (fn, col) in aggs.items():
        if fn == "count":
            cols.append(F.col(ints[name]["cnt"]).alias(name))
        elif fn == "sum":
            cols.append(F.when(F.col(ints[name]["cnt"]) > 0,
                               F.col(ints[name]["sum"]))
                        .alias(name))      # SQL SUM: all-NULL group -> NULL
        elif fn == "approx_count_distinct":
            cols.append(
                F.coalesce(F.hll_sketch_estimate(F.col(ints[name]["hll"])),
                           F.lit(0)).alias(name))
        else:
            # try_divide: all-NULL group has cnt 0 -> NULL (not an ANSI
            # division error)
            cols.append(F.try_divide(F.col(ints[name]["sum"]),
                                     F.col(ints[name]["cnt"]))
                        .alias(name))
    return state.select(*cols)
