"""Reference qbeast-on-Delta format interop (sources/qbeast_format.py):
cube-string codec parity, revision JSON parsing (incl. legacy upgrade),
importing hand-written reference-style logs, hybrid staging, foreign hash
dims, the export->import roundtrip, attach, and versioned delta export."""

import json
import os

import pytest
from pyspark.sql import functions as F

import qbeast_spark_spark as qss
from qbeast_spark_spark.core.weight import INT_MAX, INT_MIN
from qbeast_spark_spark.sources.qbeast_format import (
    decode_cube_string,
    encode_cube_string,
    revision_from_reference_json,
)

from conftest import load


# -- codec ------------------------------------------------------------------

def test_cube_string_codec_reference_parity():
    """Hand-computed against CubeId.Codec (CubeId.scala:185-260): one
    symbol carries 6 bit positions MSB-first; bit (dims*level + i) means
    dimension i is in the upper half at that level."""
    # dims=2: 'w' = symbols[48] = 0b110000 -> dims {0,1} -> child index 3
    assert decode_cube_string(2, "") == (0, 0)
    assert decode_cube_string(2, "w") == (1, 3)
    # 'g' = symbols[32] = 0b100000 -> dim 0 -> index 1 (docs' "wg" cube)
    assert decode_cube_string(2, "wg") == (2, 3 | (1 << 2))
    # 'Q' = symbols[16] = 0b010000 -> dim 1 -> index 2
    assert decode_cube_string(2, "Q") == (1, 2)
    assert decode_cube_string(1, "g") == (1, 1)
    assert decode_cube_string(1, "A") == (1, 0)
    with pytest.raises(ValueError):
        decode_cube_string(2, "w!")


def test_cube_string_codec_roundtrip_wide_dims():
    import random

    rng = random.Random(7)
    for dims in (1, 2, 3, 6, 7, 8, 13):
        for _ in range(100):
            depth = rng.randint(0, 63 // dims)
            path = rng.getrandbits(dims * depth) if depth else 0
            s = encode_cube_string(dims, depth, path)
            assert decode_cube_string(dims, s) == (depth, path)
            # symbol count per level matches the reference's formula
            assert len(s) == depth * ((dims + 5) // 6)


# -- revision JSON ----------------------------------------------------------

_DOC_REVISION = {
    "revisionID": 1, "timestamp": 1637851757680,
    "tableID": "/tmp/example-table/", "desiredCubeSize": 5000,
    "columnTransformers": [
        {"className": "io.qbeast.core.transform.LinearTransformer",
         "columnName": "price", "dataType": "DoubleDataType"},
        {"className": "io.qbeast.core.transform.CDFStringQuantilesTransformer",
         "columnName": "product_name"},
        {"className": "io.qbeast.core.transform.HashTransformer",
         "columnName": "user_id", "dataType": "IntegerDataType"}],
    "transformations": [
        {"className": "io.qbeast.core.transform.LinearTransformation",
         "minNumber": 0, "maxNumber": 100, "nullValue": 43,
         "orderedDataType": "DoubleDataType"},
        {"className":
         "io.qbeast.core.transform.CDFStringQuantilesTransformation",
         "quantiles": ["product_1", "product_100", "product_3223"]},
        {"className": "io.qbeast.core.transform.HashTransformation",
         "nullValue": -1809672334}],
}


def test_revision_from_reference_json_doc_example():
    """The exact example from docs/QbeastFormat.md:95-146 parses into a
    native Revision; the hash dim becomes FOREIGN (its layout hash is
    Scala bytesHash, not F.hash — never value-prune on it)."""
    rev = revision_from_reference_json(_DOC_REVISION)
    assert rev.revision_id == 1 and rev.desired_cube_size == 5000
    assert rev.column_names == ["price", "product_name", "user_id"]
    assert [t.kind for t in rev.transformations] == \
        ["linear", "quantiles", "hashing-foreign"]
    assert rev.transformations[2].foreign
    assert rev.column_types == ["double", "string", "int"]
    lin = rev.transformations[0]
    assert (lin.min_value, lin.max_value, lin.null_value) == (0.0, 100.0, 43.0)


def test_revision_legacy_histogram_upgrade():
    """StringHistogramTransformation upgrades to string quantiles on
    import, mirroring QbeastUtils.updateTransformationTypes
    (QbeastUtils.scala:155-186); IdentityToZero/NullToZero -> identity."""
    legacy = {
        "revisionID": 2, "timestamp": 0, "desiredCubeSize": 100,
        "columnTransformers": [
            {"className": "io.qbeast.core.transform.StringHistogramTransformer",
             "columnName": "name"},
            {"className": "io.qbeast.core.transform.LinearTransformer",
             "columnName": "qty", "dataType": "LongDataType"}],
        "transformations": [
            {"className":
             "io.qbeast.core.transform.StringHistogramTransformation",
             "histogram": ["a", "b", "c"]},
            {"className":
             "io.qbeast.core.transform.IdentityToZeroTransformation",
             "identityValue": 7}],
    }
    rev = revision_from_reference_json(legacy)
    assert [t.kind for t in rev.transformations] == ["quantiles", "identity"]
    assert rev.transformations[0].quantiles == ["a", "b", "c"]
    assert rev.transformations[0].is_string
    assert rev.column_specs[0].transformer == "quantiles"


# -- importing a hand-written reference-style log ---------------------------

def _write_ref_log(table_path: str, schema_json: str, revisions: dict,
                   adds: list) -> None:
    """Write a minimal reference-shaped _delta_log version 0."""
    log_dir = os.path.join(table_path, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    config = {f"qbeast.revision.{rid}": json.dumps(rj)
              for rid, rj in revisions.items()}
    if revisions:
        config["qbeast.lastRevisionID"] = str(max(revisions))
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "ref-table",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema_json,
                      "partitionColumns": [], "configuration": config}},
    ] + [{"add": a} for a in adds]
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _linear_revision(rid, cols, mins, maxs, types, cube_size=100):
    qd = {"bigint": "LongDataType", "double": "DoubleDataType",
          "int": "IntegerDataType"}
    return {
        "revisionID": rid, "timestamp": 1, "tableID": "t",
        "desiredCubeSize": cube_size,
        "columnTransformers": [
            {"className": "io.qbeast.core.transform.LinearTransformer",
             "columnName": c, "dataType": qd[t]}
            for c, t in zip(cols, types)],
        "transformations": [
            {"className": "io.qbeast.core.transform.LinearTransformation",
             "minNumber": mn, "maxNumber": mx, "nullValue": mn,
             "orderedDataType": qd[t]}
            for mn, mx, t in zip(mins, maxs, types)],
    }


def _one_parquet(df, dest_dir):
    """Write df as a single parquet and return (relative name, size)."""
    before = set(os.listdir(dest_dir)) if os.path.isdir(dest_dir) else set()
    df.coalesce(1).write.mode("append").parquet(dest_dir)
    name = next(p for p in set(os.listdir(dest_dir)) - before
                if p.endswith(".parquet"))
    return name, os.path.getsize(os.path.join(dest_dir, name))


def test_import_handwritten_reference_log(spark, tmp_path):
    """A reference-style log with tagged blocks prunes BOTH ways (range +
    sampling) and reads exactly; an un-tagged file joins the staging
    revision: read and sampled, never range-pruned away wrongly."""
    dl = str(tmp_path / "ref_t")
    os.makedirs(dl)
    li = load(spark, "lineitem").select("l_orderkey", "l_extendedprice")
    ok_mid = 5000          # space split points for the handcrafted cubes
    price_mid = 50000.0
    lo = li.where((F.col("l_orderkey") < ok_mid) |
                  (F.col("l_extendedprice") < price_mid))
    hi = li.exceptAll(lo)  # upper-right quadrant only -> cube "w"
    staged = li.limit(50)  # plain-parquet hybrid lane
    n_lo, n_hi, n_staged = lo.count(), hi.count(), staged.count()
    f_lo, s_lo = _one_parquet(lo, dl)
    f_hi, s_hi = _one_parquet(hi, dl)
    f_st, s_st = _one_parquet(staged, dl)

    rev = _linear_revision(
        1, ["l_orderkey", "l_extendedprice"],
        [0, 0.0], [10000, 100000.0], ["bigint", "double"])
    adds = [
        {"path": f_lo, "partitionValues": {}, "size": s_lo,
         "modificationTime": 0, "dataChange": True,
         "stats": json.dumps({"numRecords": n_lo}),
         "tags": {"revision": "1", "blocks": json.dumps(
             [{"cubeId": "", "minWeight": INT_MIN, "maxWeight": 0,
               "elementCount": n_lo}])}},
        {"path": f_hi, "partitionValues": {}, "size": s_hi,
         "modificationTime": 0, "dataChange": True,
         "stats": json.dumps({"numRecords": n_hi}),
         # cube "w" = depth 1, both dims upper half: [0.5,1)^2
         "tags": {"revision": "1", "blocks": json.dumps(
             [{"cubeId": "w", "minWeight": 1000, "maxWeight": INT_MAX,
               "elementCount": n_hi}])}},
        {"path": f_st, "partitionValues": {}, "size": s_st,
         "modificationTime": 0, "dataChange": True,
         "stats": json.dumps({"numRecords": n_staged})},   # no tags
    ]
    _write_ref_log(dl, lo.schema.json(), {1: rev}, adds)

    qt = qss.QbeastTable.for_delta(spark, dl)
    snap = qt.snapshot()
    assert sorted(snap.revisions) == [0, 1]
    assert snap.files[f_st].revision_id == 0          # staging lane
    assert snap.files[f_hi].blocks[0].cube == "1:3"   # decoded "w"

    # full read = all three files
    assert qt.to_df().count() == n_lo + n_hi + n_staged

    # range pruning: a low-corner box must drop the "w" file but keep
    # root + staging, and the result must equal the plain filter
    low = qt.read([("l_orderkey", "<", 1000)])
    whole = (lo.unionByName(hi).unionByName(staged)
             .where(F.col("l_orderkey") < 1000))
    assert low.count() == whole.count()
    pruned = qt._prune_files(snap, [("l_orderkey", "<", 1000)])
    assert f_hi not in pruned and f_lo in pruned and f_st in pruned

    # sampling file pruning honors the imported block weight ranges:
    # at a tiny fraction the [1000, MAX] file is skipped, the [MIN, 0]
    # one and the staging file (full range) are kept
    sel = qt.sample_files(1e-7)
    assert f_lo in sel and f_st in sel and f_hi not in sel


def test_import_foreign_hash_dim_never_value_prunes(spark, tmp_path):
    """Equality on a reference-hashed dimension must not prune (the
    reference hashed with Scala bytesHash; mapping the literal through
    OUR hash would drop files that contain matches). Result correctness
    comes from the residual row filter."""
    dl = str(tmp_path / "ref_hash")
    os.makedirs(dl)
    li = load(spark, "lineitem").select("l_orderkey", "l_returnflag")
    name, size = _one_parquet(li, dl)
    n = li.count()
    rev = {
        "revisionID": 1, "timestamp": 1, "tableID": "t",
        "desiredCubeSize": 1000,
        "columnTransformers": [
            {"className": "io.qbeast.core.transform.LinearTransformer",
             "columnName": "l_orderkey", "dataType": "LongDataType"},
            {"className": "io.qbeast.core.transform.HashTransformer",
             "columnName": "l_returnflag", "dataType": "StringDataType"}],
        "transformations": [
            {"className": "io.qbeast.core.transform.LinearTransformation",
             "minNumber": 0, "maxNumber": 10000, "nullValue": 0,
             "orderedDataType": "LongDataType"},
            {"className": "io.qbeast.core.transform.HashTransformation",
             "nullValue": 0}],
    }
    adds = [{"path": name, "partitionValues": {}, "size": size,
             "modificationTime": 0, "dataChange": True,
             "stats": json.dumps({"numRecords": n}),
             "tags": {"revision": "1", "blocks": json.dumps(
                 # a deep cube on the hash dim: OUR hash of 'R' would map
                 # elsewhere — pruning on it would lose rows
                 [{"cubeId": "w", "minWeight": INT_MIN,
                   "maxWeight": INT_MAX, "elementCount": n}])}}]
    _write_ref_log(dl, li.schema.json(), {1: rev}, adds)

    qt = qss.QbeastTable.for_delta(spark, dl)
    rev_imported = qt.snapshot().revisions[1]
    assert rev_imported.transformations[1].foreign
    got = qt.read([("l_returnflag", "=", "R")]).count()
    assert got == li.where("l_returnflag = 'R'").count()
    # the file is NOT dropped by the equality (foreign hash -> full span)
    assert qt._prune_files(qt.snapshot(), [("l_returnflag", "=", "R")]) \
        == [name]


# -- export -> import roundtrip + attach ------------------------------------

def test_export_import_roundtrip_and_attach(spark, tmp_path):
    """Native write -> qbeast-tagged Delta export -> for_delta import:
    identical pruning decisions both ways; attach adopts the table into
    the native log (metadata-only) and appends keep working."""
    p = str(tmp_path / "t")
    li = load(spark, "lineitem")
    n = li.count()
    qss.write(li, p, columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=500)
    native = qss.QbeastTable.for_path(spark, p)
    native.export_delta_log()

    with open(os.path.join(p, "_delta_log", f"{0:020d}.json")) as fh:
        acts = [json.loads(line) for line in fh]
    meta = next(a["metaData"] for a in acts if "metaData" in a)
    assert "qbeast.revision.1" in meta["configuration"]
    adds = [a["add"] for a in acts if "add" in a]
    assert adds and all("tags" in a and "blocks" in a["tags"] for a in adds)

    qt = qss.QbeastTable.for_delta(spark, p)
    assert qt.to_df().count() == n
    for frac in (0.001, 0.05, 0.5):
        assert sorted(qt.sample_files(frac)) == \
            sorted(native.sample_files(frac))
    filt = [("l_extendedprice", "<", 10000.0)]
    assert sorted(qt._prune_files(qt.snapshot(), filt)) == \
        sorted(native._prune_files(native.snapshot(), filt))
    assert qt.read(filt).count() == li.where("l_extendedprice < 10000").count()

    # read-only guard, then attach and append natively
    with pytest.raises(NotImplementedError):
        qt.log.commit()
    import shutil

    shutil.rmtree(os.path.join(p, "_qbeast_log"))
    with_attached = qss.attach_qbeast_delta(p)
    assert with_attached == 0
    at = qss.QbeastTable.for_path(spark, p)
    assert at.to_df().count() == n
    assert len(at.sample_files(0.01)) < len(at.snapshot().files)
    qss.write(li.limit(100), p, cube_size=500,
              columns_to_index=["l_orderkey", "l_extendedprice"],
              mode="append")
    assert at.to_df().count() == n + 100
    # double-attach refuses (native log now owns the table)
    with pytest.raises(ValueError, match="already has a _qbeast_log"):
        qss.attach_qbeast_delta(p)


def test_import_checkpointed_reference_log(spark, tmp_path):
    """Reference tables checkpoint their Delta log every N commits: the
    qbeast tags then live in a PARQUET checkpoint whose map columns
    pyarrow renders as key/value pair lists, not dicts. The importer must
    read revisions + blocks from the checkpoint path identically."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dl = str(tmp_path / "ref_ckpt")
    os.makedirs(os.path.join(dl, "_delta_log"))
    li = load(spark, "lineitem").select("l_orderkey", "l_extendedprice")
    name, size = _one_parquet(li, dl)
    n = li.count()
    rev = _linear_revision(1, ["l_orderkey", "l_extendedprice"],
                           [0, 0.0], [10000, 100000.0],
                           ["bigint", "double"])
    config = [("qbeast.revision.1", json.dumps(rev)),
              ("qbeast.lastRevisionID", "1")]
    tags = [("revision", "1"),
            ("blocks", json.dumps([{"cubeId": "", "minWeight": INT_MIN,
                                    "maxWeight": 0, "elementCount": n}]))]
    map_t = pa.map_(pa.string(), pa.string())
    add_t = pa.struct([
        pa.field("path", pa.string()),
        pa.field("partitionValues", map_t),
        pa.field("size", pa.int64()),
        pa.field("modificationTime", pa.int64()),
        pa.field("dataChange", pa.bool_()),
        pa.field("stats", pa.string()),
        pa.field("tags", map_t)])
    meta_t = pa.struct([
        pa.field("id", pa.string()),
        pa.field("schemaString", pa.string()),
        pa.field("partitionColumns", pa.list_(pa.string())),
        pa.field("configuration", map_t)])
    proto_t = pa.struct([pa.field("minReaderVersion", pa.int32()),
                         pa.field("minWriterVersion", pa.int32())])
    rows = [
        {"add": None, "metaData": None,
         "protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"add": None, "protocol": None,
         "metaData": {"id": "t", "schemaString": li.schema.json(),
                      "partitionColumns": [], "configuration": config}},
        {"metaData": None, "protocol": None,
         "add": {"path": name, "partitionValues": [], "size": size,
                 "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": n}), "tags": tags}},
    ]
    schema = pa.schema([pa.field("add", add_t), pa.field("metaData", meta_t),
                        pa.field("protocol", proto_t)])
    tbl = pa.Table.from_pylist(rows, schema=schema)
    ck = os.path.join(dl, "_delta_log", f"{2:020d}.checkpoint.parquet")
    pq.write_table(tbl, ck)
    with open(os.path.join(dl, "_delta_log", "_last_checkpoint"),
              "w") as fh:
        json.dump({"version": 2, "size": len(rows)}, fh)

    qt = qss.QbeastTable.for_delta(spark, dl)
    snap = qt.snapshot()
    assert sorted(snap.revisions) == [0, 1]
    f = snap.files[name]
    assert f.revision_id == 1 and f.blocks[0].cube == "0:0"
    assert f.blocks[0].max_weight == 0 and f.rows == n
    assert qt.to_df().count() == n
    # the [MIN, 0] weight range caps the sample at ~50%: a fraction above
    # it keeps the file, and rows come back deterministically
    assert qt.sample_files(0.9) == [name]
    assert qt.read([("l_orderkey", "<", 100)]).count() == \
        li.where("l_orderkey < 100").count()


def test_import_multipart_checkpoint(spark, tmp_path):
    """Multi-part classic checkpoints (NNN.checkpoint.i.of.n.parquet +
    parts field in _last_checkpoint) merge into one state."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dl = str(tmp_path / "ref_mp")
    os.makedirs(os.path.join(dl, "_delta_log"))
    li = load(spark, "lineitem").select("l_orderkey", "l_extendedprice")
    half = li.count() // 2
    f1, s1 = _one_parquet(li.limit(half), dl)
    f2, s2 = _one_parquet(li.exceptAll(li.limit(half)), dl)
    rev = _linear_revision(1, ["l_orderkey", "l_extendedprice"],
                           [0, 0.0], [10000, 100000.0],
                           ["bigint", "double"])
    map_t = pa.map_(pa.string(), pa.string())
    add_t = pa.struct([pa.field("path", pa.string()),
                       pa.field("partitionValues", map_t),
                       pa.field("size", pa.int64()),
                       pa.field("modificationTime", pa.int64()),
                       pa.field("dataChange", pa.bool_()),
                       pa.field("stats", pa.string()),
                       pa.field("tags", map_t)])
    meta_t = pa.struct([pa.field("id", pa.string()),
                        pa.field("schemaString", pa.string()),
                        pa.field("partitionColumns", pa.list_(pa.string())),
                        pa.field("configuration", map_t)])
    schema = pa.schema([pa.field("add", add_t), pa.field("metaData", meta_t)])

    def add_row(name, size, n):
        return {"metaData": None,
                "add": {"path": name, "partitionValues": [], "size": size,
                        "modificationTime": 0, "dataChange": True,
                        "stats": json.dumps({"numRecords": n}),
                        "tags": [("revision", "1"), ("blocks", json.dumps(
                            [{"cubeId": "", "minWeight": INT_MIN,
                              "maxWeight": INT_MAX, "elementCount": n}]))]}}

    meta_row = {"add": None,
                "metaData": {"id": "t", "schemaString": li.schema.json(),
                             "partitionColumns": [],
                             "configuration": [
                                 ("qbeast.revision.1", json.dumps(rev)),
                                 ("qbeast.lastRevisionID", "1")]}}
    parts = [[meta_row, add_row(f1, s1, half)],
             [add_row(f2, s2, li.count() - half)]]
    for i, rows in enumerate(parts):
        name = (f"{1:020d}.checkpoint.{i + 1:010d}.{len(parts):010d}"
                ".parquet")
        pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                       os.path.join(dl, "_delta_log", name))
    with open(os.path.join(dl, "_delta_log", "_last_checkpoint"),
              "w") as fh:
        json.dump({"version": 1, "size": 3, "parts": len(parts)}, fh)

    qt = qss.QbeastTable.for_delta(spark, dl)
    snap = qt.snapshot()
    assert set(snap.files) == {f1, f2}
    assert sorted(snap.revisions) == [0, 1]
    assert qt.to_df().count() == li.count()


def test_foreign_table_metrics_and_view(spark, tmp_path):
    """index_metrics and the SQL-view bridge work over an imported table
    (they only consume the snapshot)."""
    p = str(tmp_path / "t")
    li = load(spark, "lineitem")
    qss.write(li, p, columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=500)
    qss.QbeastTable.for_path(spark, p).export_delta_log()
    qt = qss.QbeastTable.for_delta(spark, p)
    m = qt.index_metrics()
    assert m["files"] == len(qt.snapshot().files)
    assert m["rows"] == li.count() and m["height"] >= 1
    qt.create_view("foreign_li")
    assert spark.sql("SELECT COUNT(*) c FROM foreign_li").first()["c"] == \
        li.count()


def test_versioned_export_appends_log_versions(spark, tmp_path):
    """Re-exporting appends version 1 (removes + fresh adds) instead of
    rewriting version 0, so an incremental Delta reader replaying both
    versions sees exactly the current snapshot."""
    from qbeast_spark_spark.sources.delta_import import read_delta_snapshot

    p = str(tmp_path / "t")
    li = load(spark, "lineitem")
    qss.write(li.limit(500), p, columns_to_index=["l_orderkey"],
              cube_size=100)
    qt = qss.QbeastTable.for_path(spark, p)
    first = qt.export_delta_log()
    assert first.endswith(f"{0:020d}.json")
    files_v0 = set(qt.snapshot(refresh=True).files)

    # overwrite changes the live file set entirely
    qss.write(li.limit(200), p, columns_to_index=["l_orderkey"],
              cube_size=100, mode="overwrite")
    second = qt.export_delta_log()
    assert second.endswith(f"{1:020d}.json")
    # version 0 content untouched (log immutability)
    with open(first) as fh:
        v0_adds = {json.loads(a)["add"]["path"] for a in fh
                   if '"add"' in a}
    assert v0_adds == files_v0
    # replaying 0+1 yields exactly the current snapshot
    with open(second) as fh:
        v1 = [json.loads(a) for a in fh]
    removed = {a["remove"]["path"] for a in v1 if "remove" in a}
    assert removed == files_v0   # every stale file is removed
    _, live = read_delta_snapshot(p)
    assert {os.path.basename(f) for f in live} == \
        {os.path.basename(f) for f in qt.snapshot(refresh=True).files}
    assert qss.read_delta_table(spark, p).count() == 200

    # foreign time travel: VERSION AS OF over the exported Delta log
    fqt = qss.QbeastTable.for_delta(spark, p)
    assert fqt.to_df().count() == 200
    assert fqt.to_df(version=0).count() == 500
    old = qss.read_qbeast_delta_snapshot(p, at_version=0)
    assert set(old.files) == files_v0 and old.version == 0
    with pytest.raises(ValueError, match="not in the Delta log"):
        qss.read_qbeast_delta_snapshot(p, at_version=99)


def test_constraints_roundtrip_through_delta_interop(spark, tmp_path):
    """CHECK constraints export as delta.constraints.* (Delta's own
    convention, so a Delta writer keeps enforcing them) and come back as
    qbeast.constraint.* on import/attach — violating appends are rejected
    on the attached table."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "t")
    li = load(spark, "lineitem").limit(800)
    qss.write(li, p, columns_to_index=["l_orderkey"], cube_size=400,
              constraints={"qty_positive": "l_quantity > 0"})
    qss.QbeastTable.for_path(spark, p).export_delta_log()

    with open(os.path.join(p, "_delta_log", f"{0:020d}.json")) as fh:
        acts = [json.loads(line) for line in fh]
    meta = next(a["metaData"] for a in acts if "metaData" in a)
    assert meta["configuration"].get(
        "delta.constraints.qty_positive") == "l_quantity > 0"
    # protocol gating (Delta spec): CHECK constraints need writer v3+,
    # else a protocol-2 writer could legally skip enforcement
    proto = next(a["protocol"] for a in acts if "protocol" in a)
    assert proto["minWriterVersion"] >= 3

    # import direction: the snapshot surfaces the constraint natively
    snap = qss.read_qbeast_delta_snapshot(p)
    assert snap.properties.get(
        "qbeast.constraint.qty_positive") == "l_quantity > 0"

    # attach: the adopted table enforces on append
    import shutil

    shutil.rmtree(os.path.join(p, "_qbeast_log"))
    qss.attach_qbeast_delta(p)
    qt = qss.QbeastTable.for_path(spark, p)
    assert qt.constraints() == {"qty_positive": "l_quantity > 0"}
    bad = li.limit(10).withColumn("l_quantity", F.lit(-1.0))
    with pytest.raises(ValueError, match="qty_positive"):
        qss.write(bad, p, columns_to_index=["l_orderkey"], mode="append")

    # DV + constraints together: the table-features protocol must list
    # checkConstraints alongside deletionVectors
    qss.delete_rows(spark, p, [("l_orderkey", "<", 200)], mode="dv")
    v = qss.QbeastTable.for_path(spark, p).export_delta_log()
    with open(v) as fh:
        acts2 = [json.loads(line) for line in fh]
    proto2 = next(a["protocol"] for a in acts2 if "protocol" in a)
    assert "deletionVectors" in proto2["writerFeatures"]
    assert "checkConstraints" in proto2["writerFeatures"]
