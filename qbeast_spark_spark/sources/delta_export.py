"""Delta-log export: make a qbeast table's CURRENT snapshot readable by any
Delta Lake client (delta-rs, DuckDB delta extension, delta-spark).

The reference persists its index metadata INSIDE a Delta log, so its tables
are Delta tables (delta/src/main/scala/io/qbeast/spark/delta/
DeltaQbeastSnapshot.scala:45-297). This engine's `_qbeast_log/` is
self-contained (delta-spark is unavailable in this container —
sources/log.py:1-19), so interop goes the other way: `export_delta_log()`
writes a standard `_delta_log/` next to `_qbeast_log/` with the minimal
action set every Delta reader understands — protocol (reader v1),
metaData (parquet format + Spark schemaString), and one add per live data
file with size + numRecords stats.

Scale note: O(#files) driver work and one JSON file — same order as a
Delta checkpoint commit; no data is rewritten or copied.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import List

__all__ = ["export_delta_log", "DELTA_LOG_DIR"]

DELTA_LOG_DIR = "_delta_log"


def export_delta_log(snapshot, table_path: str) -> str:
    """Write `<table>/_delta_log/00000000000000000000.json` describing
    ``snapshot``'s live files; returns the written path. Re-exporting
    overwrites version 0 (the export mirrors the current snapshot, it is
    not an incremental mirror of qbeast history)."""
    log_dir = os.path.join(table_path, DELTA_LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    now = int(time.time() * 1000)
    # deterministic table id: re-exports keep the same identity
    table_id = hashlib.sha256(
        os.path.abspath(table_path).encode()).hexdigest()[:32]
    actions: List[dict] = [
        {"commitInfo": {"timestamp": now, "operation": "WRITE",
                        "operationParameters": {"mode": "Overwrite"},
                        "engineInfo": "qbeast-spark-spark-export"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": table_id,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": snapshot.schema_json or "{}",
            "partitionColumns": [],
            "configuration": {},
            "createdTime": now,
        }},
    ]
    for f in snapshot.files.values():
        stats = {"numRecords": int(f.rows)}
        cs = getattr(f, "column_stats", None)
        if cs:     # Delta data-skipping stats: external readers can prune
            stats["minValues"] = {c: v[0] for c, v in cs.items()}
            stats["maxValues"] = {c: v[1] for c, v in cs.items()}
        actions.append({"add": {
            "path": f.path,
            "partitionValues": {},
            "size": int(f.size),
            "modificationTime": now,
            "dataChange": True,
            "stats": json.dumps(stats),
        }})
    target = os.path.join(log_dir, "00000000000000000000.json")
    tmp = target + ".tmp"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a, sort_keys=True) + "\n")
    os.replace(tmp, target)
    return target
