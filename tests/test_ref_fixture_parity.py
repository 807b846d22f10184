"""Golden-fixture parity for reference-written tables (VERDICT r5 Next
#4): tests/fixtures/ref_table is a CHECKED-IN table in the reference's
on-disk format — weight-ordered multi-level CubeId.Codec layout with
multi-block files, a legacy pre-0.6 revision (StringHistogram +
IdentityToZero), and a parquet checkpoint (tools/make_ref_fixture.py
documents the construction). Unlike the inline logs in
test_qbeast_interop.py, the fixture cannot drift WITH the importer —
a format regression fails here even if the test-side constructors
would have drifted too.

Parity is asserted against (a) plain Spark over the same logical rows
(read/filter equality, row-for-row via checksum) and (b) a NATIVE twin
of the same data written by this engine (sampling returns the identical
row set on the shared revision, both layouts prune)."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

import qbeast_spark_spark as qss
from qbeast_spark_spark.core.weight import fraction_to_weight

from conftest import load

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "ref_table")


@pytest.fixture(scope="module")
def manifest():
    with open(os.path.join(FIXTURE, "_fixture_manifest.json")) as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def logical_rows(spark):
    """The fixture's logical content, rebuilt from the SOURCE testdata
    (not from the fixture's own parquet, which would be circular)."""
    cols = ["l_orderkey", "l_extendedprice", "l_quantity", "l_returnflag"]
    li = load(spark, "lineitem").select(*cols)
    extra = spark.createDataFrame(
        [(9001, 50000.0, 10.0, "A"), (9002, 60000.0, 20.0, "N"),
         (9003, 70000.0, 30.0, "R"), (9004, 80000.0, 40.0, "A")],
        "l_orderkey long, l_extendedprice double, l_quantity double, "
        "l_returnflag string")
    return li.unionByName(extra)


def _chk(df):
    cols = sorted(df.columns)
    h = F.pmod(F.xxhash64(*[F.coalesce(F.col(c).cast("string"),
                                       F.lit("\x00")) for c in cols]),
               F.lit(2 ** 31))
    r = df.agg(F.count(F.lit(1)).alias("n"), F.sum(h).alias("h")) \
        .collect()[0]
    return (r["n"], r["h"])


def test_fixture_imports_with_decoded_layout(spark, manifest):
    qt = qss.QbeastTable.for_delta(spark, FIXTURE)
    snap = qt.snapshot()
    # staging rev 0 + the linear rev 1 + the upgraded legacy rev 2
    assert sorted(snap.revisions) == [0, 1, 2]
    rev2 = snap.revisions[2]
    assert [t.kind for t in rev2.transformations] == \
        ["quantiles", "identity"]
    assert rev2.transformations[0].is_string
    # CubeId.Codec strings decoded: depth-2 cubes under "w" present, and
    # at least one file carries TWO blocks (mid + tail of a depth-1 cube)
    cubes = {b.cube for f in snap.files.values() for b in f.blocks}
    assert "0:0" in cubes and "1:3" in cubes          # root and "w"
    assert any(c.startswith("2:") for c in cubes), cubes
    assert any(len(f.blocks) > 1 for f in snap.files.values())
    assert len(snap.files) == len(manifest["files"])


def test_fixture_reads_equal_plain_spark(spark, manifest, logical_rows):
    qt = qss.QbeastTable.for_delta(spark, FIXTURE)
    assert _chk(qt.to_df()) == _chk(logical_rows)
    for pred in ("l_orderkey < 700",
                 "l_orderkey >= 1200 AND l_extendedprice >= 53000.0",
                 "l_extendedprice < 2000.0 OR l_orderkey >= 9000",
                 "l_returnflag = 'A' AND l_quantity > 25"):
        assert _chk(qt.read(pred)) == _chk(logical_rows.where(pred)), pred


def test_fixture_range_pruning_drops_off_region_cubes(spark, manifest):
    qt = qss.QbeastTable.for_delta(spark, FIXTURE)
    snap = qt.snapshot()
    # upper-right box (both dims in the top half): every depth-1/2 cube
    # OUTSIDE the "w" subtree must prune away; root + "w" subtree + the
    # untagged-region rev-2 root file stay
    pruned = qt._prune_files(snap, [("l_orderkey", ">=", 1300),
                                    ("l_extendedprice", ">=", 90000.0)])
    assert len(pruned) < len(snap.files)
    kept_cubes = {b.cube for rel in pruned
                  for b in snap.files[rel].blocks}
    assert "1:0" not in kept_cubes and "1:1" not in kept_cubes \
        and "1:2" not in kept_cubes, kept_cubes


def test_fixture_sampling_matches_native_twin(spark, manifest,
                                              logical_rows, tmp_path):
    qt = qss.QbeastTable.for_delta(spark, FIXTURE)
    twin_path = str(tmp_path / "native_twin")
    qss.write(logical_rows, twin_path,
              columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=1000)
    twin = qss.QbeastTable.for_path(spark, twin_path)
    # file pruning at a fraction below w_root: only blocks whose
    # min_weight is INT_MIN qualify — the root file and the rev-2 file
    sel = qt.sample_files(0.2)
    assert 0 < len(sel) < len(qt.snapshot().files)
    assert fraction_to_weight(0.2) < manifest["w_root"]
    # row-level parity on the shared revision (both tables hash the
    # same two columns): identical sampled row SETS at any fraction
    for f in (0.1, 0.37):
        twin_rows = {tuple(r) for r in
                     twin.sample(f).where("l_orderkey < 9000")
                     .select(*sorted(twin.to_df().columns)).collect()}
        ref_rows = {tuple(r) for r in
                    qt.sample(f).where("l_orderkey < 9000")
                    .select(*sorted(qt.to_df().columns)).collect()}
        assert ref_rows == twin_rows, f
    # both layouts prune a selective box to fewer files
    box = [("l_orderkey", ">=", 1300), ("l_extendedprice", ">=", 90000.0)]
    assert len(qt._prune_files(qt.snapshot(), box)) \
        < len(qt.snapshot().files)
    assert len(twin._prune_files(twin.snapshot(), box)) \
        < len(twin.snapshot().files)


def test_fixture_checkpoint_is_complete(spark, manifest, logical_rows,
                                        tmp_path):
    """Deleting the JSON commits the checkpoint covers must change
    nothing: the parquet checkpoint alone reconstructs the full state
    (files, revisions, blocks) — the layout long-lived reference tables
    actually have after log cleanup."""
    cp = str(tmp_path / "ckpt_only")
    shutil.copytree(FIXTURE, cp)
    for v in (0, 1):
        os.remove(os.path.join(cp, "_delta_log", f"{v:020d}.json"))
    qt = qss.QbeastTable.for_delta(spark, cp)
    snap = qt.snapshot()
    assert sorted(snap.revisions) == [0, 1, 2]
    assert len(snap.files) == len(manifest["files"])
    assert _chk(qt.to_df()) == _chk(logical_rows)


def test_fixture_pyds_fraction_matches_native_sample(spark):
    """format("qbeast") + option("fraction") over the reference fixture
    returns exactly reader.sample()'s row set: the pyds planner assigns
    per-REVISION hash columns per file (pyds.py _cols_for — the same
    golden-fixture finding as reader.sample; before the fix every file
    was hashed with the LATEST revision's columns, under-sampling the
    different-column legacy revision)."""
    from qbeast_spark_spark.sources.pyds import register

    register(spark)
    qt = qss.QbeastTable.for_delta(spark, FIXTURE)
    cols = sorted(qt.to_df().columns)
    for f in (0.1, 0.37):
        via_pyds = {tuple(r) for r in
                    spark.read.format("qbeast").option("fraction", f)
                    .load(FIXTURE).select(*cols).collect()}
        via_api = {tuple(r) for r in
                   qt.sample(f).select(*cols).collect()}
        assert via_pyds == via_api, f
        assert via_pyds, "empty sample would vacuously pass"
