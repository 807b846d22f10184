"""Generate the checked-in golden fixture of a REFERENCE-written qbeast
table (tests/fixtures/ref_table) — VERDICT r5 Next #4.

The interop tests construct reference-style logs inline; this fixture
freezes one on disk so format drift in the importer is caught even when
the test-side constructors drift with it. It composes, in one table,
every reference-format feature the importer claims
(sources/qbeast_format.py, docs/QbeastFormat.md):

- a WEIGHT-ORDERED multi-level OTree layout: root + the four depth-1
  cubes + depth-2 cubes under "w", with multi-block files (a depth-1
  file carrying both its [w_root, w_1) block and a [w_1, MAX] tail
  block) — cube ids in the reference's CubeId.Codec base-64 strings
  (CubeId.scala:185-260);
- rows placed by their REAL murmur3 weight (F.hash == the reference's
  weight hash, analyzer.py:40) and their real cube region under the
  revision's linear transformations, so sampling and range pruning over
  the fixture behave exactly as over a table the reference wrote;
- a LEGACY revision (pre-0.6 JSON: StringHistogramTransformation +
  IdentityToZeroTransformation) appended at v1, upgraded on import per
  QbeastUtils.scala:155-186;
- a parquet CHECKPOINT at v2 (_last_checkpoint + NNN.checkpoint.parquet
  with map-typed tags/configuration, the pyarrow key/value rendering)
  holding the v0 state, with v1..v2 as JSON deltas on top.

Deterministic: same inputs -> byte-stable rows (parquet metadata may
differ; the test reads content, not bytes). Regenerate with
    python tools/make_ref_fixture.py
after an intentional format change, and commit the new fixture.
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

FIXTURE = os.path.join(HERE, "tests", "fixtures", "ref_table")
SRC = "/root/testdata/sf0.001"

OK_MIN, OK_MAX = 0.0, 1500.0          # l_orderkey linear domain
PR_MIN, PR_MAX = 900.0, 105000.0      # l_extendedprice linear domain


def _scale(v, lo, hi):
    from pyspark.sql import functions as F

    return (v - F.lit(lo)) / F.lit(hi - lo)


def _region(cube: str):
    """Depth<=2 cube id -> the membership predicate of its space region
    under the two linear dims (dim0=l_orderkey, dim1=l_extendedprice).
    Mirrors decode_cube_string's bit layout for dims=2: per level, child
    bit0 = dim0 upper half, bit1 = dim1 upper half."""
    from pyspark.sql import functions as F

    from qbeast_spark_spark.sources.qbeast_format import decode_cube_string

    depth, path = decode_cube_string(2, cube)
    s0 = _scale(F.col("l_orderkey").cast("double"), OK_MIN, OK_MAX)
    s1 = _scale(F.col("l_extendedprice"), PR_MIN, PR_MAX)
    lo0, hi0, lo1, hi1 = 0.0, 1.0, 0.0, 1.0
    # halve from the COARSEST level down: bits (level-1)*2 of the path
    # hold that level's child index (decode_cube_string's layout)
    for level in range(1, depth + 1):
        child = (path >> (2 * (level - 1))) & 0b11
        m0, m1 = (lo0 + hi0) / 2, (lo1 + hi1) / 2
        if child & 1:
            lo0 = m0
        else:
            hi0 = m0
        if child & 2:
            lo1 = m1
        else:
            hi1 = m1
    cond = (s0 >= lo0) & (s0 < hi0) & (s1 >= lo1) & (s1 < hi1)
    return cond


def _one_parquet(df, dest_dir):
    before = set(os.listdir(dest_dir)) if os.path.isdir(dest_dir) else set()
    df.coalesce(1).write.mode("append").parquet(dest_dir)
    name = next(p for p in set(os.listdir(dest_dir)) - before
                if p.endswith(".parquet"))
    return name, os.path.getsize(os.path.join(dest_dir, name))


def main():
    from pyspark.sql import SparkSession, functions as F

    from qbeast_spark_spark.core.weight import (INT_MAX, INT_MIN,
                                                fraction_to_weight)

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(FIXTURE, ignore_errors=True)
    os.makedirs(os.path.join(FIXTURE, "_delta_log"))

    cols = ["l_orderkey", "l_extendedprice", "l_quantity", "l_returnflag"]
    li = (spark.read.parquet(f"{SRC}/lineitem.parquet").select(*cols)
          .orderBy("l_orderkey", "l_extendedprice", "l_quantity")
          .coalesce(1).cache())
    h = F.hash("l_orderkey", "l_extendedprice")   # == reference weight
    w_root = fraction_to_weight(0.3)
    w_1 = fraction_to_weight(0.7)

    # -- v0: the weight-ordered rev-1 layout --------------------------------
    adds = []

    def add_file(df, blocks):
        df = df.cache()
        n = df.count()
        if n == 0:
            df.unpersist()
            return
        name, size = _one_parquet(df, FIXTURE)
        for b in blocks:
            b.setdefault("elementCount", 0)
        blocks[-1]["elementCount"] = n - sum(
            b["elementCount"] for b in blocks[:-1])
        adds.append({"path": name, "partitionValues": {}, "size": size,
                     "modificationTime": 0, "dataChange": True,
                     "stats": json.dumps({"numRecords": n}),
                     "tags": {"revision": "1",
                              "blocks": json.dumps(blocks)}})
        df.unpersist()

    root_rows = li.where(h < w_root)
    add_file(root_rows, [{"cubeId": "", "minWeight": INT_MIN,
                          "maxWeight": w_root}])
    depth2_parent = "w"
    for cube in ("A", "Q", "g", "w"):
        mid = li.where((h >= w_root) & (h < w_1) & _region(cube))
        if cube == depth2_parent:
            # "w" holds only its mid-weight block; its high-weight rows
            # spill into the four depth-2 children below
            add_file(mid, [{"cubeId": cube, "minWeight": w_root,
                            "maxWeight": w_1}])
        else:
            # multi-block file: the depth-1 cube keeps BOTH its
            # mid-weight block and its high-weight tail
            tail = li.where((h >= w_1) & _region(cube))
            n_mid = mid.count()
            add_file(mid.unionAll(tail),
                     [{"cubeId": cube, "minWeight": w_root,
                       "maxWeight": w_1, "elementCount": n_mid},
                      {"cubeId": cube, "minWeight": w_1,
                       "maxWeight": INT_MAX}])
    for sub in ("A", "Q", "g", "w"):
        add_file(li.where((h >= w_1) & _region(depth2_parent + sub)),
                 [{"cubeId": depth2_parent + sub, "minWeight": w_1,
                   "maxWeight": INT_MAX}])

    rev1 = {
        "revisionID": 1, "timestamp": 1700000000000,
        "tableID": FIXTURE + "/", "desiredCubeSize": 1000,
        "columnTransformers": [
            {"className": "io.qbeast.core.transform.LinearTransformer",
             "columnName": "l_orderkey", "dataType": "LongDataType"},
            {"className": "io.qbeast.core.transform.LinearTransformer",
             "columnName": "l_extendedprice", "dataType": "DoubleDataType"}],
        "transformations": [
            {"className": "io.qbeast.core.transform.LinearTransformation",
             "minNumber": int(OK_MIN), "maxNumber": int(OK_MAX),
             "nullValue": 0, "orderedDataType": "LongDataType"},
            {"className": "io.qbeast.core.transform.LinearTransformation",
             "minNumber": PR_MIN, "maxNumber": PR_MAX, "nullValue": PR_MIN,
             "orderedDataType": "DoubleDataType"}],
    }
    schema_json = li.schema.json()
    config_v0 = {"qbeast.revision.1": json.dumps(rev1),
                 "qbeast.lastRevisionID": "1"}
    v0_actions = (
        [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
         {"metaData": {"id": "golden-ref-table",
                       "format": {"provider": "parquet", "options": {}},
                       "schemaString": schema_json,
                       "partitionColumns": [],
                       "configuration": config_v0}}]
        + [{"add": a} for a in adds])

    # -- v1: legacy (pre-0.6) revision 2 appended ---------------------------
    extra = spark.createDataFrame(
        [(9001, 50000.0, 10.0, "A"), (9002, 60000.0, 20.0, "N"),
         (9003, 70000.0, 30.0, "R"), (9004, 80000.0, 40.0, "A")],
        "l_orderkey long, l_extendedprice double, l_quantity double, "
        "l_returnflag string")
    name2, size2 = _one_parquet(extra, FIXTURE)
    rev2 = {
        "revisionID": 2, "timestamp": 1700000001000,
        "tableID": FIXTURE + "/", "desiredCubeSize": 1000,
        "columnTransformers": [
            {"className":
             "io.qbeast.core.transform.StringHistogramTransformer",
             "columnName": "l_returnflag"},
            {"className": "io.qbeast.core.transform.LinearTransformer",
             "columnName": "l_quantity", "dataType": "DoubleDataType"}],
        "transformations": [
            {"className":
             "io.qbeast.core.transform.StringHistogramTransformation",
             "histogram": ["A", "N", "R"]},
            {"className":
             "io.qbeast.core.transform.IdentityToZeroTransformation",
             "identityValue": 0}],
    }
    config_v1 = dict(config_v0)
    config_v1["qbeast.revision.2"] = json.dumps(rev2)
    config_v1["qbeast.lastRevisionID"] = "2"
    v1_actions = [
        {"metaData": {"id": "golden-ref-table",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema_json,
                      "partitionColumns": [],
                      "configuration": config_v1}},
        {"add": {"path": name2, "partitionValues": {}, "size": size2,
                 "modificationTime": 1, "dataChange": True,
                 "stats": json.dumps({"numRecords": 4}),
                 "tags": {"revision": "2", "blocks": json.dumps(
                     [{"cubeId": "", "minWeight": INT_MIN,
                       "maxWeight": INT_MAX, "elementCount": 4}])}}},
    ]

    # -- v2: empty commit + parquet CHECKPOINT of the full state ------------
    v2_actions = [{"commitInfo": {"operation": "CHECKPOINT-NOOP"}}]

    log = os.path.join(FIXTURE, "_delta_log")
    for v, actions in ((0, v0_actions), (1, v1_actions), (2, v2_actions)):
        with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")

    import pyarrow as pa
    import pyarrow.parquet as pq

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
    rows = [{"add": None, "metaData": None,
             "protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"add": None, "protocol": None,
             "metaData": {"id": "golden-ref-table",
                          "schemaString": schema_json,
                          "partitionColumns": [],
                          "configuration": list(config_v1.items())}}]
    for a in adds + [v1_actions[1]["add"]]:
        rows.append({"metaData": None, "protocol": None,
                     "add": {**a, "partitionValues": [],
                             "tags": list(a["tags"].items())}})
    schema = pa.schema([pa.field("add", add_t), pa.field("metaData", meta_t),
                        pa.field("protocol", proto_t)])
    pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                   os.path.join(log, f"{2:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 2, "size": len(rows)}, fh)

    n_total = li.count() + 4
    manifest = {"rows_total": n_total, "rev1_rows": li.count(),
                "rev2_rows": 4, "w_root": w_root, "w_1": w_1,
                "files": sorted(a["path"] for a in adds) + [name2],
                "domains": {"l_orderkey": [OK_MIN, OK_MAX],
                            "l_extendedprice": [PR_MIN, PR_MAX]}}
    with open(os.path.join(FIXTURE, "_fixture_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    print(json.dumps(manifest, indent=1))
    # tidy Spark's write debris so the fixture stays minimal
    for junk in glob.glob(os.path.join(FIXTURE, "_SUCCESS")) + \
            glob.glob(os.path.join(FIXTURE, "*.crc")) + \
            glob.glob(os.path.join(FIXTURE, ".*.crc")):
        os.remove(junk)
    spark.stop()


if __name__ == "__main__":
    main()
