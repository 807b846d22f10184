"""Reference qbeast-on-Delta format interop: read (and write) the index
metadata the reference engine persists inside a Delta log, so a table
written by the reference samples and prunes HERE without re-indexing —
and a table written here can carry its index TO a reference reader.

Format being parsed (all public, from the reference repo):

- Revision JSON under ``qbeast.revision.N`` keys of
  ``metaData.configuration`` — docs/QbeastFormat.md:85-146,
  core/src/main/scala/io/qbeast/core/model/RevisionClasses.scala.
- Per-file Block lists under ``AddFile.tags`` (``revision`` +
  ``blocks`` JSON) — delta/src/main/scala/io/qbeast/spark/delta/
  DeltaQbeastFileUtils.scala:59-102,164-226.
- CubeId strings: per tree level, ``ceil(dims/6)`` base64-alphabet
  symbols carrying one bit per dimension, MSB-first within each symbol —
  core/src/main/scala/io/qbeast/core/model/CubeId.scala:185-260 (Codec).
- The staging revision (ID 0, EmptyTransformer) holds every un-tagged
  AddFile at the root cube — docs/QbeastFormat.md "Staging Revision",
  StagingUtils.scala.
- Legacy transformations are upgraded on import the same way
  ``QbeastUtils.updateTransformationTypes`` does
  (src/main/scala/io/qbeast/utils/QbeastUtils.scala:155-186):
  StringHistogram -> string quantiles, IdentityToZero / NullToZero ->
  identity.

Sampling parity: record weights are murmur3(indexed columns, seed 42) via
Spark's own hash expression in BOTH engines (QbeastMurmur3Hash.scala:37-52
== ``F.hash``), so block weight ranges and the residual sample predicate
transfer exactly. Hash-dimension SPACE coordinates do not (the reference
uses Scala ``MurmurHash3.bytesHash`` there), so imported hash dims become
``ForeignHashTransformation`` — sampling still exact, value pruning on
that dimension disabled (sound, never wrong).

Scale note: import is O(#files + #cubes) driver-side metadata work — the
same order as building any Delta snapshot; no data is read or rewritten.
"""

from __future__ import annotations

import json
import os
import urllib.parse
from typing import Any, Dict, List, Optional, Tuple

from ..core.revision import ColumnToIndex, Revision
from ..core.transform import (
    EmptyTransformation,
    ForeignHashTransformation,
    HashTransformation,
    IdentityTransformation,
    LinearTransformation,
    QuantilesTransformation,
    Transformation,
)
from ..core.weight import INT_MAX, INT_MIN
# module-level (not deferred): read_qbeast_delta_snapshot runs inside
# Spark's Python planning worker via sources/pyds.py, where a lazy
# intra-package import would resolve by name and fail
from .constraints import CONSTRAINT_PREFIX, DELTA_CONSTRAINT_PREFIX
from .log import Block, CommitLog, IndexFile, Snapshot
from .delta_import import _snapshot_state

__all__ = [
    "decode_cube_string", "encode_cube_string",
    "revision_from_reference_json", "revision_to_reference_json",
    "read_qbeast_delta_snapshot", "attach_qbeast_delta",
]

_SYMBOLS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
_SYM_IDX = {c: i for i, c in enumerate(_SYMBOLS)}


# -- CubeId codec (CubeId.scala:185-260) ------------------------------------

def decode_cube_string(dims: int, s: str) -> Tuple[int, int]:
    """Reference cube string -> (depth, packed path int) in this engine's
    convention (core/cube.py: child-index bit i == upper half of dim i).
    The reference's bitset bit ``dims*level + i`` means exactly the same,
    so only the symbol packing differs: symbols cover 6 positions each,
    MSB-first."""
    if not s:
        return 0, 0
    symbol_count = (dims + 5) // 6
    if len(s) % symbol_count:
        raise ValueError(
            f"cube string {s!r} length not a multiple of {symbol_count} "
            f"(dims={dims})")
    depth = len(s) // symbol_count
    path = 0
    for level in range(depth):
        idx = 0
        for j in range(symbol_count):
            sym = s[symbol_count * level + j]
            if sym not in _SYM_IDX:
                raise ValueError(f"invalid cube symbol {sym!r} in {s!r}")
            v = _SYM_IDX[sym]
            base = 6 * j
            for k in range(min(6, dims - base)):
                if v & (1 << (5 - k)):
                    idx |= 1 << (base + k)
        path |= idx << (dims * level)
    return depth, path


def encode_cube_string(dims: int, depth: int, path: int) -> str:
    """Inverse of decode_cube_string — this engine's cube -> the string the
    reference's Codec.decode accepts."""
    symbol_count = (dims + 5) // 6
    out = []
    mask = (1 << dims) - 1
    for level in range(depth):
        idx = (path >> (dims * level)) & mask
        for j in range(symbol_count):
            base = 6 * j
            v = 0
            for k in range(min(6, dims - base)):
                if idx & (1 << (base + k)):
                    v |= 1 << (5 - k)
            out.append(_SYMBOLS[v])
    return "".join(out)


# -- Revision codec (RevisionClasses.scala / QbeastFormat.md:85-146) --------

_QDATATYPE_TO_SPARK = {
    "DoubleDataType": "double",
    "FloatDataType": "float",
    "IntegerDataType": "int",
    "LongDataType": "bigint",
    "DecimalDataType": "double",
    "StringDataType": "string",
    "TimestampDataType": "timestamp",
    "DateDataType": "date",
}
_SPARK_TO_QDATATYPE = {
    "double": "DoubleDataType",
    "float": "FloatDataType",
    "int": "IntegerDataType",
    "integer": "IntegerDataType",
    "bigint": "LongDataType",
    "long": "LongDataType",
    "string": "StringDataType",
    "timestamp": "TimestampDataType",
    "timestamp_ntz": "TimestampDataType",
    "date": "DateDataType",
}

_REF_NS = "io.qbeast.core.transform."


def _short(class_name: str) -> str:
    return class_name.rsplit(".", 1)[-1]


def _transformer_kind(class_name: str) -> str:
    n = _short(class_name)
    if n == "LinearTransformer":
        return "linear"
    if n == "HashTransformer":
        return "hashing"
    if n in ("CDFQuantilesTransformer", "CDFNumericQuantilesTransformer",
             "CDFStringQuantilesTransformer",
             "StringHistogramTransformer",     # legacy -> quantiles
             "HistogramTransformer"):
        return "quantiles"
    if n == "EmptyTransformer":
        return ""
    raise ValueError(f"unknown reference transformer {class_name!r}")


def _transformation_from_reference(obj: Dict[str, Any]) -> Transformation:
    n = _short(obj.get("className", ""))
    if n == "LinearTransformation":
        return LinearTransformation(float(obj["minNumber"]),
                                    float(obj["maxNumber"]),
                                    obj.get("nullValue"))
    if n == "HashTransformation":
        return ForeignHashTransformation()
    if n == "CDFNumericQuantilesTransformation":
        return QuantilesTransformation(list(obj["quantiles"]),
                                       is_string=False)
    if n == "CDFStringQuantilesTransformation":
        return QuantilesTransformation([str(q) for q in obj["quantiles"]],
                                       is_string=True)
    if n == "StringHistogramTransformation":
        # legacy histogram == string quantiles (QbeastUtils.scala:163-165)
        return QuantilesTransformation([str(q) for q in obj["histogram"]],
                                       is_string=True)
    if n in ("IdentityTransformation", "IdentityToZeroTransformation",
             "NullToZeroTransformation"):
        return IdentityTransformation()
    if n == "EmptyTransformation":
        return EmptyTransformation()
    raise ValueError(f"unknown reference transformation {obj.get('className')!r}")


def revision_from_reference_json(obj: Dict[str, Any]) -> Revision:
    """Reference revision JSON (the value of a ``qbeast.revision.N``
    configuration entry) -> this engine's Revision."""
    specs: List[ColumnToIndex] = []
    col_types: List[str] = []
    for t in obj.get("columnTransformers", []):
        kind = _transformer_kind(t.get("className", ""))
        specs.append(ColumnToIndex(t["columnName"], kind))
        dt = t.get("dataType")
        col_types.append(_QDATATYPE_TO_SPARK.get(dt, "string" if kind in
                                                 ("hashing", "quantiles", "")
                                                 else "double"))
    transformations = [_transformation_from_reference(t)
                       for t in obj.get("transformations", [])]
    if len(transformations) < len(specs):
        # a freshly-staged revision may not carry transformations yet
        transformations += [EmptyTransformation()] * (len(specs)
                                                      - len(transformations))
    return Revision(
        revision_id=int(obj["revisionID"]),
        timestamp_ms=int(obj.get("timestamp", 0)),
        desired_cube_size=int(obj.get("desiredCubeSize", 5_000_000)),
        column_specs=specs,
        transformations=transformations,
        column_types=col_types,
    )


def revision_to_reference_json(rev: Revision, table_id: str
                               ) -> Optional[Dict[str, Any]]:
    """This engine's Revision -> reference revision JSON, or None when the
    revision cannot be represented faithfully: a NATIVE hash dimension's
    layout came from ``F.hash``, and a reference reader would map equality
    literals through ``MurmurHash3.bytesHash`` and over-prune. (Foreign
    hash dims — originally imported FROM the reference — are re-exported
    as plain HashTransformation: only files this engine appended have the
    divergent layout, so the same caveat applies and we refuse for them
    too unless no native writes occurred; keeping the rule simple and
    sound: any hash dim -> no index export.)"""
    transformers = []
    transformations = []
    for i, spec in enumerate(rev.column_specs):
        kind = rev.transformer_kind(i)
        tr = rev.transformations[i]
        ctype = (rev.column_types[i] if i < len(rev.column_types)
                 else "double").lower()
        qtype = _SPARK_TO_QDATATYPE.get(
            ctype, "DoubleDataType" if ctype.startswith("decimal")
            else None)
        if isinstance(tr, HashTransformation):   # incl. foreign
            return None
        if kind == "linear" and isinstance(tr, LinearTransformation):
            transformers.append({
                "className": _REF_NS + "LinearTransformer",
                "columnName": spec.name, "dataType": qtype})
            transformations.append({
                "className": _REF_NS + "LinearTransformation",
                "minNumber": tr.min_value, "maxNumber": tr.max_value,
                "nullValue": tr.null_value, "orderedDataType": qtype})
        elif isinstance(tr, QuantilesTransformation):
            flavor = ("CDFStringQuantilesTransform" if tr.is_string
                      else "CDFNumericQuantilesTransform")
            transformers.append({
                "className": _REF_NS + flavor + "er",
                "columnName": spec.name, "dataType": qtype})
            transformations.append({
                "className": _REF_NS + flavor + "ation",
                "quantiles": list(tr.quantiles)})
        elif isinstance(tr, IdentityTransformation):
            transformers.append({
                "className": _REF_NS + "LinearTransformer",
                "columnName": spec.name, "dataType": qtype})
            transformations.append({
                "className": _REF_NS + "IdentityTransformation",
                "identityValue": 0, "orderedDataType": qtype})
        elif isinstance(tr, EmptyTransformation):
            transformers.append({
                "className": _REF_NS + "EmptyTransformer",
                "columnName": spec.name, "dataType": qtype})
            transformations.append({
                "className": _REF_NS + "EmptyTransformation"})
        else:
            return None
    return {
        "revisionID": rev.revision_id,
        "timestamp": rev.timestamp_ms,
        "tableID": table_id,
        "desiredCubeSize": rev.desired_cube_size,
        "columnTransformers": transformers,
        "transformations": transformations,
    }


# -- snapshot import (DeltaQbeastSnapshot.scala:45-297) ----------------------

def _file_from_add(rel_path: str, add: Dict[str, Any],
                   revisions: Dict[int, Revision]) -> IndexFile:
    tags = add.get("tags") or {}
    stats = add.get("stats")
    if isinstance(stats, str) and stats:
        try:
            stats = json.loads(stats)
        except ValueError:
            stats = None
    rows = int((stats or {}).get("numRecords", 0) or 0)
    column_stats = None
    if stats and isinstance(stats.get("minValues"), dict):
        mins, maxs = stats["minValues"], stats.get("maxValues") or {}
        column_stats = {c: [mins[c], maxs[c]]
                        for c in mins if c in maxs
                        and mins[c] is not None and maxs[c] is not None} \
            or None

    rev_id = int(tags.get("revision", 0) or 0)
    blocks: List[Block] = []
    if tags.get("blocks"):
        rev = revisions.get(rev_id)
        if rev is None:
            raise ValueError(
                f"AddFile {rel_path!r} is tagged with revision {rev_id} "
                "but the table configuration has no such revision")
        dims = max(rev.dims, 1)
        for b in json.loads(tags["blocks"]):
            cube_s = b.get("cubeId", b.get("cube", ""))
            depth, path = decode_cube_string(dims, cube_s)
            blocks.append(Block(
                f"{depth}:{path:x}",
                int(b.get("minWeight", INT_MIN)),
                int(b.get("maxWeight", INT_MAX)),
                int(b.get("elementCount", 0))))
        if rows == 0:
            rows = sum(b.count for b in blocks)
    else:
        # un-tagged file: staging revision, all rows at the root
        # (DeltaQbeastFileUtils.fromAddFile:75-78 — root block fallback)
        rev_id = 0
        blocks = [Block("0:0", INT_MIN, INT_MAX, rows)]
    # Delta DML with DVs enabled leaves deletionVector descriptors on the
    # add actions; carried into the snapshot so for_delta reads (and any
    # adopt-then-mutate flow) see logical rows (sources/deletion_vectors)
    return IndexFile(rel_path, int(add.get("size", 0) or 0), rows,
                     rev_id, blocks, column_stats,
                     dv=add.get("deletionVector") or None)


def read_qbeast_delta_snapshot(table_path: str,
                               at_version: Optional[int] = None) -> Snapshot:
    """Build this engine's Snapshot straight from a reference-written
    qbeast Delta table — revisions from ``qbeast.revision.N``
    configuration, Blocks from AddFile tags — WITHOUT re-indexing. Plain
    Delta/parquet AddFiles (no tags) land in the staging revision and are
    read (and sampled, row-level) but never pruned, exactly like the
    reference's hybrid qbeast+delta state. ``at_version`` time-travels
    the Delta log (VERSION AS OF semantics)."""
    schema_json, part_cols, files, config = _snapshot_state(table_path,
                                                            at_version)
    if part_cols:
        raise ValueError(
            "qbeast tables are never partitioned (the reference rejects "
            "conversion of partitioned tables); use read_delta_table for "
            "plain partitioned Delta")
    if str(config.get("delta.columnMapping.mode", "none")) not in (
            "none", "None"):
        raise ValueError(
            "column-mapped qbeast Delta tables are not supported (the "
            "reference writer never enables mapping); use "
            "read_delta_table + convert_delta_to_qbeast to re-index")
    revisions: Dict[int, Revision] = {}
    for key, value in config.items():
        if not key.startswith("qbeast.revision."):
            continue
        obj = json.loads(value) if isinstance(value, str) else value
        rev = revision_from_reference_json(obj)
        revisions[rev.revision_id] = rev
    if 0 not in revisions:
        # synthesize the staging revision for hybrid tables
        revisions[0] = Revision(0, 0, 5_000_000, [], [], [])

    if at_version is None:
        log_dir = os.path.join(table_path, "_delta_log")
        known = [int(n[:-5]) for n in os.listdir(log_dir)
                 if n.endswith(".json") and n[:-5].isdigit()]
        at_version = max(known) if known else 0
    snap = Snapshot(table_path=table_path, version=at_version)
    snap.schema_json = schema_json
    snap.revisions = revisions
    snap.properties = {k: v for k, v in config.items()
                       if k.startswith("qbeast.")}
    # adopt Delta CHECK constraints under this engine's property
    # convention so the mutable surface keeps enforcing them
    snap.properties.update({
        CONSTRAINT_PREFIX + k[len(DELTA_CONSTRAINT_PREFIX):]: v
        for k, v in config.items()
        if k.startswith(DELTA_CONSTRAINT_PREFIX) and v})
    cube_weights: Dict[int, Dict[str, int]] = {}
    for rel, add in files.items():
        rel = urllib.parse.unquote(rel)
        f = _file_from_add(rel, add, revisions)
        snap.files[rel] = f
        if f.revision_id > 0:
            dst = cube_weights.setdefault(f.revision_id, {})
            for b in f.blocks:
                # revision cube weight = min of the block max weights, the
                # same reduction DeltaQbeastSnapshot applies when it
                # rebuilds CubeStatuses from blocks
                dst[b.cube] = min(dst.get(b.cube, INT_MAX), b.max_weight)
    snap.cube_weights = cube_weights
    return snap


def attach_qbeast_delta(table_path: str) -> int:
    """Adopt a reference-written qbeast Delta table into this engine's
    native log: one metadata-only commit (no data rewritten) recording the
    imported files, blocks, and revisions under ``_qbeast_log/``. After
    attaching, the FULL native surface works — appends, optimize, vacuum,
    time travel from this point on. Returns the committed version.

    The Delta log is left untouched; ``table_path`` must be writable.
    """
    snap = read_qbeast_delta_snapshot(table_path)
    log = CommitLog(table_path)
    if log.exists():
        raise ValueError(
            f"{table_path} already has a _qbeast_log; attach only adopts "
            "fresh imports")
    last_rev = max((r for r in snap.revisions if r > 0), default=None)
    props = {"qbeast.importedFrom": "delta"}
    if last_rev is not None:
        props["qbeast.lastRevisionID"] = str(last_rev)
    # carry imported CHECK constraints into the native log so appends
    # through this engine keep enforcing them
    props.update({k: v for k, v in snap.properties.items()
                  if k.startswith(CONSTRAINT_PREFIX)})
    return log.commit(
        add=list(snap.files.values()),
        remove=[],
        revisions=snap.revisions,
        cube_weights=snap.cube_weights,
        schema_json=snap.schema_json,
        properties=props,
        data_change=True,
        operation="ATTACH",
    )


class DeltaQbeastLog:
    """Read-only CommitLog stand-in backed by a reference-written Delta
    log — enough surface for QbeastTable's read paths (to_df / sample /
    read / where / create_view / metrics). Mutating operations need
    ``attach_qbeast_delta`` first."""

    def __init__(self, table_path: str) -> None:
        self.table_path = table_path
        self.log_dir = os.path.join(table_path, "_delta_log")

    def exists(self) -> bool:
        return os.path.isdir(self.log_dir)

    def snapshot(self, at_version: Optional[int] = None) -> Snapshot:
        """Current state, or VERSION AS OF when ``at_version`` is given
        (the Delta log replays to any version whose JSON commits still
        exist — same free time travel as the native log)."""
        return read_qbeast_delta_snapshot(self.table_path, at_version)

    def commit(self, **_kw):
        raise NotImplementedError(
            "this QbeastTable wraps a reference-written Delta table "
            "read-only; run attach_qbeast_delta(path) to adopt it into "
            "the native log first")
