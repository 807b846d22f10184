"""Delta-log import: resolve a Delta table's live files WITHOUT delta-spark,
so existing Delta tables can be read and converted to qbeast in this
container (the reverse of sources/delta_export.py).

Protocol subset implemented (the read side of the Delta spec every client
agrees on): JSON commit files ``NNNNNNNNNNNNNNNNNNNN.json`` replayed in
version order, each contributing ``add`` / ``remove`` / ``metaData``
actions; a ``_last_checkpoint`` pointer + parquet checkpoint (columns
``add.path`` / ``remove.path`` / ``metaData``) seeds the state so only
commits after the checkpoint replay. Driver work is O(#files), like any
Delta snapshot build.

Unsupported (raises): column-mapping modes and deletion vectors — both
announce themselves in metaData/protocol, so detection is reliable.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

__all__ = ["read_delta_snapshot", "convert_delta_to_qbeast"]


def _checkpoint_state(log_dir: str) -> Tuple[int, Dict[str, dict],
                                             Optional[str]]:
    """(last_checkpointed_version, live files, schema) from the newest
    checkpoint, or (-1, {}, None) when the log has none."""
    lc = os.path.join(log_dir, "_last_checkpoint")
    if not os.path.exists(lc):
        return -1, {}, None
    with open(lc) as fh:
        info = json.load(fh)
    version = int(info["version"])
    parts = info.get("parts")
    if parts:
        names = [
            f"{version:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet"
            for i in range(parts)]
    else:
        names = [f"{version:020d}.checkpoint.parquet"]
    import pyarrow.parquet as pq

    files: Dict[str, dict] = {}
    schema_json: Optional[str] = None
    for name in names:
        tbl = pq.read_table(os.path.join(log_dir, name))
        cols = {c: tbl.column(c).to_pylist() for c in
                ("add", "remove", "metaData") if c in tbl.column_names}
        n = tbl.num_rows
        for i in range(n):
            add = cols.get("add", [None] * n)[i]
            if add and add.get("path"):
                files[add["path"]] = add
            meta = cols.get("metaData", [None] * n)[i]
            if meta and meta.get("schemaString"):
                schema_json = meta["schemaString"]
                cfg = meta.get("configuration") or {}
                if str(cfg.get("delta.columnMapping.mode",
                               "none")) not in ("none", "None"):
                    raise ValueError(
                        "column-mapping Delta tables are not supported")
    return version, files, schema_json


def read_delta_snapshot(table_path: str
                        ) -> Tuple[Optional[str], List[str]]:
    """(schemaString, absolute live data-file paths) of the Delta table at
    ``table_path``'s current version."""
    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"{log_dir} does not exist")
    ckpt_version, files, schema_json = _checkpoint_state(log_dir)
    versions = sorted(
        int(name[:-5]) for name in os.listdir(log_dir)
        if name.endswith(".json") and name[:-5].isdigit())
    for v in versions:
        if v <= ckpt_version:
            continue
        with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    a = action["add"]
                    if a.get("deletionVector"):
                        raise ValueError(
                            "deletion-vector Delta tables are not supported")
                    files[a["path"]] = a
                elif "remove" in action:
                    files.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    meta = action["metaData"]
                    schema_json = meta.get("schemaString", schema_json)
                    cfg = meta.get("configuration") or {}
                    if str(cfg.get("delta.columnMapping.mode",
                                   "none")) not in ("none", "None"):
                        raise ValueError(
                            "column-mapping Delta tables are not supported")
    return schema_json, [os.path.join(table_path, p) for p in sorted(files)]


def convert_delta_to_qbeast(spark, delta_path: str, out_path: str,
                            columns_to_index=None,
                            cube_size: Optional[int] = None,
                            mode: str = "overwrite") -> int:
    """Read a Delta table's current snapshot (no delta-spark needed) and
    write it as a new OTree-indexed qbeast table; returns the committed
    log version. ``columns_to_index=None`` auto-selects."""
    from pyspark.sql import types as T

    from .writer import write_qbeast

    schema_json, files = read_delta_snapshot(delta_path)
    if not files:
        raise ValueError(f"{delta_path} has no live files")
    reader = spark.read
    if schema_json:
        reader = reader.schema(T.StructType.fromJson(json.loads(schema_json)))
    df = reader.parquet(*files)
    kwargs = {} if cube_size is None else {"cube_size": cube_size}
    return write_qbeast(df, out_path, columns_to_index=columns_to_index,
                        mode=mode, **kwargs)
