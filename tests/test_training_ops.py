"""Training-set assembly ops (operators/training.py): deterministic
hash splits, token-bounded chunking (with a DuckDB twin for the token
convention), and sequence packing invariants."""

import duckdb
import pytest
from pyspark.sql import functions as F

from conftest import load


def test_hash_split_deterministic_and_proportional(spark):
    from qbeast_spark_spark.operators.training import hash_split

    docs = load(spark, "documents")
    n = docs.count()
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(docs, w).groupBy("split").count().collect()
    b = hash_split(docs, w).groupBy("split").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    counts = {r["split"]: r["count"] for r in a}
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] / n == pytest.approx(0.8, abs=0.08)
    # membership is stable under corpus growth: the half-corpus split
    # agrees with the full-corpus split on shared ids
    half = hash_split(docs.limit(n // 2), w).select("doc_id", "split")
    full = hash_split(docs, w).select("doc_id",
                                      F.col("split").alias("split_full"))
    diff = (half.join(full, "doc_id")
            .where("split != split_full").count())
    assert diff == 0
    # a different seed produces a different assignment
    c = {r["split"]: r["count"]
         for r in hash_split(docs, w, seed=7).groupBy("split")
         .count().collect()}
    assert c != counts or True  # proportions may coincide; just run it


def test_chunk_text_covers_tokens_with_overlap(spark):
    from qbeast_spark_spark.operators.training import chunk_text
    from qbeast_spark_spark.operators.text import TOKEN_RE

    docs = load(spark, "documents").limit(100)
    chunks = chunk_text(docs, max_tokens=16, overlap=4)
    got = chunks.collect()
    assert all(1 <= r["n_tokens"] <= 16 for r in got)
    # token accounting: sum over chunks == tokens + overlap re-counts
    con = duckdb.connect()
    tok_counts = {r[0]: r[1] for r in con.execute(f"""
        SELECT doc_id, len(regexp_extract_all(lower(text), '{TOKEN_RE}'))
        FROM '/root/testdata/sf0.001/documents.parquet'
        WHERE doc_id < 100""").fetchall()}
    per_doc = {}
    for r in got:
        per_doc.setdefault(r["doc_id"], []).append(r)
    step = 16 - 4
    for doc_id, rows in per_doc.items():
        n = tok_counts[doc_id]
        import math
        expect_chunks = max(1, math.ceil(max(n - 4, 1) / step))
        assert len(rows) == expect_chunks, doc_id
        # chunks except the last are full
        by_id = sorted(rows, key=lambda r: r["chunk_id"])
        assert all(r["n_tokens"] == 16 for r in by_id[:-1])
        # reconstruction: stripping the overlap from non-first chunks
        # yields the original token stream
        toks = []
        for i, r in enumerate(by_id):
            ts = r["chunk"].split(" ")
            toks.extend(ts if i == 0 else ts[4:])
        assert len(toks) == n, doc_id


def test_pack_sequences_invariants(spark):
    from qbeast_spark_spark.operators.text import token_counts
    from qbeast_spark_spark.operators.training import pack_sequences

    docs = load(spark, "documents")
    with_counts = token_counts(docs).select(
        "doc_id", F.col("re_tokens").alias("n_tokens"))
    total_docs = with_counts.count()
    budget = 600
    packed = pack_sequences(with_counts, budget_tokens=budget,
                            num_partitions=4)
    rows = packed.collect()
    # every document packed exactly once
    assert len(rows) == total_docs
    assert len({r["doc_id"] for r in rows}) == total_docs
    # no bin over budget unless it is a singleton oversized doc
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r["bin_id"], []).append(r)
    for bin_id, members in by_bin.items():
        tot = sum(r["n_tokens"] for r in members)
        assert tot == members[0]["bin_tokens"]
        if tot > budget:
            assert len(members) == 1        # oversized singleton
    # packing is reasonably tight: mean fill of multi-doc bins > 60%
    fills = [sum(r["n_tokens"] for r in m) / budget
             for m in by_bin.values() if len(m) > 1]
    if fills:
        assert sum(fills) / len(fills) > 0.6


# ---------------------------------------------------------------------------
# sample_mixture (data mixing under a token budget)
# ---------------------------------------------------------------------------

def test_sample_mixture_hits_weighted_targets(spark):
    from pyspark.sql import functions as F

    from qbeast_spark_spark.operators.training import sample_mixture

    docs = load(spark, "documents")
    web = docs.where("doc_id % 2 = 0")
    code = docs.where("doc_id % 2 = 1")
    total = docs.agg(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    budget = int(total * 0.3)
    out, rep = sample_mixture({"web": (web, 3.0), "code": (code, 1.0)},
                              token_budget=budget)
    got = {r["source"]: r["t"] for r in
           out.groupBy("source")
              .agg(F.sum(F.size(F.split("text", " "))).alias("t"))
              .collect()}
    # each source lands near its weighted target (Bernoulli tolerance)
    assert got["web"] == pytest.approx(rep["web"]["target_tokens"],
                                       rel=0.25)
    assert got["code"] == pytest.approx(rep["code"]["target_tokens"],
                                        rel=0.25)
    assert got["web"] > got["code"]          # 3:1 weighting shows up


def test_sample_mixture_is_deterministic(spark):
    from qbeast_spark_spark.operators.training import sample_mixture

    docs = load(spark, "documents")
    a, _ = sample_mixture({"d": (docs, 1.0)}, token_budget=5000)
    b, _ = sample_mixture({"d": (docs, 1.0)}, token_budget=5000)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_sample_mixture_upsamples_small_sources_with_epochs(spark):
    from qbeast_spark_spark.operators.training import sample_mixture

    docs = load(spark, "documents")
    tiny = docs.limit(10)
    out, rep = sample_mixture({"tiny": (tiny, 1.0), "big": (docs, 1.0)},
                              token_budget=60000, max_epochs=3.0)
    assert rep["tiny"]["rate"] > 1.0         # tiny source must repeat
    assert rep["tiny"]["epochs"] >= 2
    epochs = {r[0] for r in out.where("source = 'tiny'")
              .select("epoch").distinct().collect()}
    assert len(epochs) >= 2
    # clipping reported when the target is unreachable
    out2, rep2 = sample_mixture({"tiny": (tiny, 1.0)},
                                token_budget=10**9, max_epochs=2.0)
    assert rep2["tiny"]["clipped_by_max_epochs"]
    assert rep2["tiny"]["rate"] == 2.0


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Every member of a near-dup cluster must land in the SAME split;
    unclustered docs keep their plain hash_split assignment, so an
    existing eval set stays stable when clustering is introduced."""
    from pyspark.sql import functions as F

    from qbeast_spark_spark.operators.dedup import (connected_components,
                                                    lsh_pairs_scored)
    from qbeast_spark_spark.operators.training import (hash_split,
                                                       leakage_safe_split)

    base = ("the quick brown fox jumps over the lazy dog while many "
            "sleepy penguins waddle across the frozen shore carrying "
            "umbrellas and singing quiet songs about a warm summer")
    rows = []
    for i in range(40):                       # 40 clusters of 3 near-dups
        for j in range(3):
            rows.append((i * 10 + j, f"{base} cluster {i} variant {j}"))
    for i in range(100):                      # 100 unique singletons
        rows.append((1000 + i,
                     f"unique document {i} about topic {i*7%13} with "
                     f"its own vocabulary {i*31%17} and phrasing {i}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = lsh_pairs_scored(docs, n=3, threshold=0.5)
    canon = connected_components(pairs)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    split = leakage_safe_split(docs, canon, w)
    # (a) no cluster straddles splits
    per_cluster = (split.join(canon, split.doc_id == canon.node)
                   .groupBy("canonical")
                   .agg(F.countDistinct("split").alias("k"))
                   .collect())
    assert per_cluster and all(r.k == 1 for r in per_cluster)
    # (b) row count preserved, schema = input + split
    assert split.count() == docs.count()
    assert set(split.columns) == {"doc_id", "text", "split"}
    # (c) singletons match plain hash_split exactly (stability)
    clustered_ids = {r.node for r in canon.collect()}
    plain = {r.doc_id: r.split
             for r in hash_split(docs, w).collect()}
    for r in split.collect():
        if r.doc_id not in clustered_ids:
            assert r.split == plain[r.doc_id]
    # (d) all three splits are populated at this corpus size
    assert {r.split for r in split.select("split").distinct().collect()} \
        == {"train", "val", "test"}


# -- round-11: paragraph-level cross-corpus exact dedup -----------------------


def test_paragraphs_blank_line_mode(spark):
    """Default mode splits on blank lines, trims, drops empties."""
    from qbeast_spark_spark.operators.dedup import paragraphs

    df = spark.createDataFrame(
        [(1, "alpha beta\n\ngamma delta\n\n\n  \n\nepsilon"),
         (2, "single paragraph"),
         (3, "  \n\n  ")],
        ["doc_id", "text"])
    got = {(r.doc_id, r.paragraph)
           for r in paragraphs(df).collect()}
    assert got == {(1, "alpha beta"), (1, "gamma delta"),
                   (1, "epsilon"), (2, "single paragraph")}


def test_paragraph_dedup_cross_corpus_semantics(spark):
    """Hand-built corpus: doc 1 is the canonical holder of a shared
    paragraph; doc 2 copies it plus a unique one; doc 3 is all unique.
    A paragraph repeated WITHIN one doc is not a cross-corpus dup."""
    from qbeast_spark_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "shared para\n\nown one"),
         (2, "shared para\n\nunique two"),
         (3, "solo a\n\nsolo b\n\nsolo a")],
        ["doc_id", "text"])
    rows = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert rows[1].n_paras == 2 and rows[1].n_dup_paras == 1 \
        and rows[1].n_foreign_paras == 0
    assert rows[2].n_paras == 2 and rows[2].n_dup_paras == 1 \
        and rows[2].n_foreign_paras == 1 \
        and rows[2].para_dup_frac == 0.5
    # within-doc repetition only: distinct paras = 2, none shared
    assert rows[3].n_paras == 2 and rows[3].n_dup_paras == 0


def test_paragraph_dedup_window_mode_duckdb_parity(spark):
    """Token-window mode on the real documents table must match the
    DuckDB twin row for row (the registry's dedup_exact branch)."""
    from qbeast_spark_spark.operators.dedup import paragraph_dedup

    docs = load(spark, "documents").limit(200)
    got = {(r.doc_id, r.n_paras, r.n_dup_paras, r.n_foreign_paras)
           for r in paragraph_dedup(docs, window=6).collect()}
    pdf = docs.select("doc_id", "text").toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = set(map(tuple, con.execute("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
        paras AS (SELECT doc_id,
                         trim(array_to_string(t[(i*6+1):(i*6+6)], ' ')) AS p
                  FROM toks, UNNEST(range(0,
                      GREATEST(CAST(CEIL(len(t)/6.0) AS BIGINT), 1))) AS u(i)),
        dp AS (SELECT DISTINCT doc_id, md5(p) AS h
               FROM paras WHERE length(p) > 0),
        g AS (SELECT h, COUNT(*) AS n_docs, MIN(doc_id) AS holder
              FROM dp GROUP BY h)
        SELECT dp.doc_id, COUNT(*),
               CAST(SUM(CASE WHEN g.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN g.n_docs >= 2 AND g.holder <> dp.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM dp JOIN g USING (h) GROUP BY dp.doc_id
    """).fetchall()))
    assert got == want and len(got) == 200
