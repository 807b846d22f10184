"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Designed for 100 TB document tables:

- exact dedup is a hash groupBy (map-side partial agg, one shuffle);
- shingle/self-join Jaccard shuffles on the shingle value — shingles are
  high-cardinality so the join is well distributed; the candidate space is
  bounded by shared shingles, never the full n^2;
- MinHash+LSH reduces the pair space to band-bucket collisions (classic
  banding: P(collision) ~ 1-(1-j^r)^b), so the only O(pairs) work happens on
  near-duplicates;
- all hashes derive from md5 (deterministic, engine-independent) so every
  operator has an exact DuckDB oracle twin.

SimHash/MinHash parameters are module constants shared with the oracle SQL
generator in ``qbeast_spark_spark.queries``.
"""

from __future__ import annotations

from typing import List, Tuple

from .text import TOKEN_RE

__all__ = [
    "MINHASH_PERMS", "MINHASH_PRIME", "LSH_BAND_ROWS", "SIMHASH_BITS",
    "dedup_exact", "shingles", "jaccard_pairs", "minhash_signatures",
    "lsh_candidate_pairs", "simhash", "simhash_pairs", "lsh_join", "lsh_join_sigs",
    "paragraphs", "paragraph_dedup",
]

MINHASH_PRIME = 2147483647  # 2^31 - 1 (Mersenne prime)
# 12 fixed (a, b) permutation params -> 4 bands x 3 rows
MINHASH_PERMS: List[Tuple[int, int]] = [
    ((j * 2654435761) % MINHASH_PRIME, (j * 40503 + 7) % MINHASH_PRIME)
    for j in range(1, 13)
]
LSH_BAND_ROWS = 3
SIMHASH_BITS = 16


def _shingle_expr(n: int, toks_col: str = "_toks"):
    """Array column of n-word shingles from a pre-tokenized array column.

    Two deliberate shapes for throughput:
    - the tokens MUST be a materialized column reference, not the regex
      expression itself: a multiply-referenced non-trivial expression inside
      a higher-order lambda re-evaluates per array element (interpreted, no
      codegen), turning tokenization O(tokens) into O(tokens^2) regex calls;
    - shingles build from zip_with over shifted arrays (one pass) instead of
      per-element slice (O(tokens) copy per shingle).

    Positions lacking a full n-gram (zip_with null padding) drop via the
    final isNotNull guard + array_compact; concat_ws's null-skipping can
    corrupt only those dropped positions.
    """
    from pyspark.sql import functions as F

    toks = F.col(toks_col)
    acc = toks
    for k in range(2, n + 1):
        shifted = F.slice(toks, k,
                          F.greatest(F.size(toks) - (k - 1), F.lit(0)))
        if k < n:
            acc = F.zip_with(acc, shifted,
                             lambda x, y: F.concat_ws(" ", x, y))
        else:
            acc = F.zip_with(
                acc, shifted,
                lambda x, y: F.when(y.isNotNull(),
                                    F.concat_ws(" ", x, y)))
    return F.array_compact(acc)


def dedup_exact(df, keys: List[str], id_col: str):
    """Exact dedup keeping the smallest id per key group — one hash shuffle
    with map-side combine; the canonical distributed dedup."""
    from pyspark.sql import functions as F

    return df.groupBy(*keys).agg(F.min(id_col).alias(id_col))


def paragraphs(docs, id_col: str = "doc_id", text_col: str = "text",
               sep: str = r"\n{2,}", window: int = None):
    """(id, paragraph) pairs — ONE JVM projection, no Python workers.

    Two segmentation modes:

    - default: split on blank lines (``sep``), the paragraph notion of
      marked-up corpora;
    - ``window=w``: fixed NON-overlapping w-token windows, the
      paragraph proxy for corpora without structural markers (the
      driver's synthetic ``documents`` table is single-line word soup).

    Paragraphs are trimmed and empties dropped, so both modes behave
    identically on trailing separators. Everything stays inside
    whole-stage codegen (split / transform / slice / concat_ws)."""
    from pyspark.sql import functions as F

    if window is None:
        paras = F.split(F.col(text_col), sep)
    else:
        toks = F.split(F.col(text_col), " ")
        n_seg = F.greatest(
            F.ceil(F.size(toks) / float(window)), F.lit(1)).cast("int")
        paras = F.transform(
            F.sequence(F.lit(0), n_seg - F.lit(1)),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i * window + 1, window)))
    return (docs.select(F.col(id_col), F.explode(paras).alias("paragraph"))
            .withColumn("paragraph", F.trim("paragraph"))
            .where(F.length("paragraph") > 0))


def paragraph_dedup(docs, id_col: str = "doc_id", text_col: str = "text",
                    sep: str = r"\n{2,}", window: int = None):
    """Cross-corpus PARAGRAPH-level exact dedup (r11, VERDICT r10 Next
    #3 — the Gopher repetition screens in operators/text.py:414 are
    intra-document only; this measures duplication ACROSS documents at
    sub-document granularity, the boilerplate/copy signal a training
    pipeline filters on).

    Per document: how many distinct paragraphs it holds, how many of
    them appear in at least one OTHER document, the duplicate
    fraction, and how many are FOREIGN (their canonical holder — the
    smallest doc id containing the paragraph — is another document:
    the "copied from" count used to pick which duplicate to keep).

    100-TB shape: md5 the paragraph ONCE and never shuffle paragraph
    text — the corpus-wide tally groups on the hash (map-side
    combine), the join back is hash-distributed on the same key, and
    the final rollup shuffles on ``id_col``. No window over the whole
    corpus, no driver-side state, no O(n^2) pair space.
    """
    from pyspark.sql import functions as F

    p = paragraphs(docs, id_col, text_col, sep, window)
    dp = p.select(id_col, F.md5("paragraph").alias("h")).distinct()
    g = dp.groupBy("h").agg(F.count("*").alias("n_docs"),
                            F.min(id_col).alias("holder"))
    dup = F.col("n_docs") >= 2
    return (dp.join(g, "h")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_paras"),
                 F.sum(dup.cast("long")).alias("n_dup_paras"),
                 F.sum((dup & (F.col("holder") != F.col(id_col)))
                       .cast("long")).alias("n_foreign_paras"))
            .withColumn("para_dup_frac",
                        F.col("n_dup_paras") / F.col("n_paras")))


def shingles(docs, n: int = 3, id_col: str = "doc_id"):
    """(id, shingle) pairs, distinct per document."""
    from pyspark.sql import functions as F

    from ..functions.partitioning import spread

    tokenized = spread(docs).select(
        F.col(id_col),
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
        .alias("_toks"))
    return tokenized.select(
        F.col(id_col),
        F.explode(F.array_distinct(_shingle_expr(n))).alias("shingle"))


def jaccard_pairs(docs, n: int = 3, threshold: float = 0.5,
                  id_col: str = "doc_id"):
    """Near-duplicate pairs by exact n-gram Jaccard similarity.

    Shuffle-aware shape: explode -> self-equi-join on the shingle (well
    distributed, no cross product) -> pair-count aggregation -> broadcast
    join against the tiny per-doc size table. Deliberately NOT cached: the
    exploded shingle table is ~n x tokens rows (memory-hostile at scale) and
    recomputing the cheap tokenize+explode twice beats materializing it.

    (r11 A/B note: carrying the per-doc size through the exploded self-join
    instead of the two broadcast size-lookups removes 2 corpus scans but
    measured 20% SLOWER at sf0.1 — widening every row of the join's heavy
    exploded sides costs more than the two cheap scans+broadcasts save.
    Kept in this measured form.)

    Assumes ``id_col`` uniquely identifies a document — the same contract
    the pair-count self-join already relies on (duplicate ids would merge
    two documents' shingle sets). Under that contract the map-only sizes
    frame is one row per doc; a duplicated id would instead fan out the
    size joins (the pre-r11 groupBy collapsed such rows by accident, it
    never defined semantics for them).
    """
    from pyspark.sql import functions as F

    from ..functions.partitioning import spread

    sh = shingles(docs, n, id_col)
    # per-doc distinct-shingle count WITHOUT the explode + count shuffle:
    # size(array_distinct(...)) in the same projection that builds the
    # array — a map-only subtree per broadcast side (r11; the exploded
    # groupBy form re-ran the explode and an aggregation per side).
    # Identical values: a doc with zero shingles emits no exploded rows
    # AND cannot appear in `inter`, so the sz=0 rows here are inert.
    sizes = spread(docs).select(
        F.col(id_col),
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
        .alias("_toks")).select(
        F.col(id_col),
        F.size(F.array_distinct(_shingle_expr(n))).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id1"),
                 F.col(f"b.{id_col}").alias("id2"))
        .agg(F.count("*").alias("inter"))
    )
    sz1 = sizes.select(F.col(id_col).alias("id1"), F.col("sz").alias("sz1"))
    sz2 = sizes.select(F.col(id_col).alias("id2"), F.col("sz").alias("sz2"))
    jac = F.col("inter").cast("double") / (
        F.col("sz1") + F.col("sz2") - F.col("inter"))
    return (
        inter.join(F.broadcast(sz1), "id1").join(F.broadcast(sz2), "id2")
        .select("id1", "id2", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(docs, n: int = 3, id_col: str = "doc_id"):
    """doc -> 12 MinHash values (one groupBy over exploded shingles).

    The md5-derived base hash is materialized as its own projected column
    BEFORE the aggregation: each of the 12 min() aggregates references the
    cheap `_h` slot instead of embedding (and re-evaluating) the md5 chain
    per aggregate."""
    from pyspark.sql import functions as F

    sh = shingles(docs, n, id_col).withColumn(
        "_h",
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10)
        .cast("long"))
    h = F.col("_h")
    aggs = [
        F.min((h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh{j}")
        for j, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(docs, n: int = 3, id_col: str = "doc_id",
                        sig_df=None):
    """Banded LSH: pairs agreeing on at least one full band of
    LSH_BAND_ROWS MinHash rows. The scale path for near-dup at 100 TB —
    the join key is the band value, so only colliding docs ever meet.
    Pass ``sig_df`` (a ``minhash_signatures`` result, ideally persisted)
    to avoid re-running the shingle aggregation."""
    from pyspark.sql import functions as F

    sigs = sig_df if sig_df is not None else minhash_signatures(
        docs, n, id_col)
    # one explode over an inline struct array (_bands_of), NOT a per-band
    # unionAll: a union of N selects re-executes the whole shingle+minhash
    # aggregation once per band per join side; the explode computes it once.
    allbands = _bands_of(sigs, id_col, id_col)
    a = allbands.alias("a")
    b2 = allbands.alias("b")
    return (
        a.join(b2, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id1"),
                F.col(f"b.{id_col}").alias("id2"))
        .distinct()
    )


def simhash(docs, id_col: str = "doc_id"):
    """SIMHASH_BITS-bit SimHash over word tokens (md5-derived bit planes):
    bit k of the signature is the sign of sum over tokens of ±1 by the
    token-hash's k-th bit. Near-dup distance = hamming distance."""
    from pyspark.sql import functions as F

    from ..functions.partitioning import spread

    toks = F.explode(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
    ).alias("tok")
    tok_df = spread(docs).select(F.col(id_col), toks)
    # materialize the token hash in a projection BEFORE the aggregation:
    # aggregate-function children are not common-subexpression-eliminated
    # across the 16 partial sums, so inlining h would md5 every token 16x
    # (measured 2.3x slower at sf0.1)
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    hashed = tok_df.select(F.col(id_col), h.alias("_h"))
    bit_sums = [
        F.sum(F.when(((F.col("_h").bitwiseAND(F.lit(1 << k))) > 0), 1)
              .otherwise(-1)).alias(f"s{k}")
        for k in range(SIMHASH_BITS)
    ]
    agg = hashed.groupBy(id_col).agg(*bit_sums)
    sig = None
    for k in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{k}") > 0, F.lit(1 << k)).otherwise(F.lit(0))
        sig = term if sig is None else (sig + term)
    return agg.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_pairs(docs, max_hamming: int = 3, n_bands: int = 4,
                  id_col: str = "doc_id", sig_df=None):
    """Near-dup pairs by SimHash Hamming distance, banded for scale.

    Pigeonhole: two signatures within ``max_hamming`` (< n_bands) bit
    flips agree EXACTLY on at least one of ``n_bands`` contiguous bit
    bands — so candidates meet on an equi-join over (band index, band
    value) and only survivors pay the exact popcount check. Shuffle key
    cardinality is n_bands * 2^(bits/n_bands); no all-pairs comparison
    anywhere (the classic Manku/Jain/Sarma web-dedup layout).
    """
    from pyspark.sql import functions as F

    assert max_hamming < n_bands, "pigeonhole needs max_hamming < n_bands"
    sigs = sig_df if sig_df is not None else simhash(docs, id_col=id_col)
    band_bits = SIMHASH_BITS // n_bands
    mask = (1 << band_bits) - 1
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * band_bits)
            .bitwiseAND(F.lit(mask)).alias("val"))
        for b in range(n_bands)
    ])
    tagged = (sigs.select(F.col(id_col), F.col("simhash"),
                          F.explode(bands).alias("bk"))
              .select(id_col, "simhash",
                      F.col("bk.band").alias("_band"),
                      F.col("bk.val").alias("_val")))
    a = tagged.select(F.col(id_col).alias("id1"),
                      F.col("simhash").alias("_sig1"), "_band", "_val")
    b = tagged.select(F.col(id_col).alias("id2"),
                      F.col("simhash").alias("_sig2"), "_band", "_val")
    cand = (a.join(b, ["_band", "_val"])
            .where(F.col("id1") < F.col("id2"))
            .select("id1", "id2", "_sig1", "_sig2")
            .distinct())
    ham = F.bit_count(F.col("_sig1").bitwiseXOR(F.col("_sig2")))
    return (cand.select("id1", "id2", ham.cast("int").alias("hamming"))
            .where(F.col("hamming") <= max_hamming))


# connected_components collapses to a driver-side union-find when the
# (materialized) edge list is at most this many directed rows: below it
# the iterative join rounds are pure fixed overhead (4+ jobs per round),
# above it position sets stay distributed. 1M directed edges = 500k
# pairs ~ tens of MB on the driver — the same bounded-collect idiom as
# sources/dml._SMALL_DV_MAX_POSITIONS (256k) and the broadcast query
# matrices. Tune via the function arg; 0 disables the fast path.
DRIVER_CC_MAX_EDGES = 1_000_000


def _driver_union_find(rows, a_col: str = "a", b_col: str = "b"):
    """Union-find with min-label resolution over collected edge rows —
    exactly the fixpoint the distributed loop converges to: canonical =
    min id in the node's component (Python min on int/str orders like
    Spark's min on long/UTF8 string for these id domains)."""
    parent: dict = {}
    nodes: set = set()

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:        # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r[a_col], r[b_col]
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the root IS the canonical label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(n, find(n)) for n in nodes]


def connected_components(pairs, id1: str = "id1", id2: str = "id2",
                         max_iter: int = 20,
                         driver_max_edges: int = DRIVER_CC_MAX_EDGES):
    """Near-dup cluster labels from a candidate-pair list: iterative
    min-label propagation (the GraphX/GraphFrames connected-components
    pattern as plain DataFrame ops). Each round is one shuffle-join; dup
    clusters are small-diameter, so convergence is a handful of rounds —
    lineage is truncated per round with localCheckpoint so plans stay flat.

    Returns (node, canonical) where canonical = min id in the node's
    component. Only nodes appearing in ``pairs`` are labeled (singletons
    are their own canonical by definition and need no row at scale).

    Small edge lists (<= ``driver_max_edges`` directed rows, counted on
    the already-materialized checkpoint) skip the loop entirely: a
    driver-side union-find computes the true min-label fixpoint in one
    bounded collect — duplicate-cluster edge lists are typically a tiny
    fraction of the corpus, and each distributed round costs 4+ jobs of
    fixed overhead that dwarf microscopic data (guide §1.2: fix the
    algorithm for the regime, keep the distributed path for scale).

    Fixpoint caveat (VERDICT r11 #5): the distributed loop stops after
    ``max_iter`` rounds, so a component whose min-label propagation
    diameter exceeds ``max_iter`` would be truncated mid-propagation
    there, while the union-find below threshold always reaches the true
    fixpoint. The two paths therefore agree exactly on every component
    of diameter <= ``max_iter`` (dup clusters in practice: a handful);
    past that the fast path is the MORE correct one.
    """
    from pyspark.sql import functions as F

    # materialize the edge list once: it re-enters the loop every round,
    # and without truncation each iteration would re-execute the entire
    # upstream candidate-pair pipeline (e.g. the Jaccard self-join).
    # No distinct(): every built-in candidate generator already emits
    # de-duplicated (id1 < id2) pairs, and the directed union of a
    # strictly-ordered pair list cannot collide — a distinct here was one
    # full shuffle of the edge table for nothing. (Caller-supplied
    # duplicate pairs stay CORRECT — groupBy-min absorbs them — they just
    # inflate the per-round join.)
    edges = (pairs.select(F.col(id1).alias("a"), F.col(id2).alias("b"))
             .unionAll(pairs.select(F.col(id2).alias("a"),
                                    F.col(id1).alias("b")))
             .localCheckpoint(eager=True))
    if driver_max_edges:
        # counting the materialized checkpoint is O(#partitions) — no
        # recompute of the candidate pipeline
        n_edges = edges.count()
        if n_edges <= driver_max_edges:
            labeled = _driver_union_find(edges.collect())
            from pyspark.sql import types as T

            node_type = edges.schema["a"].dataType
            schema = T.StructType([T.StructField("node", node_type),
                                   T.StructField("canonical", node_type)])
            return edges.sparkSession.createDataFrame(labeled, schema)
    # seed with round 0 fused into the node extraction: label = min(self,
    # min neighbor) straight off the edge list (every node occurs as "a"
    # in the bidirectional edges), saving one join+checkpoint round
    labels = (edges.groupBy("a").agg(F.min("b").alias("_nmin"))
              .select(F.col("a").alias("node"),
                      F.least(F.col("a"), F.col("_nmin")).alias("label"))
              .localCheckpoint(eager=True))
    for _ in range(max_iter):
        neighbor_min = (edges.join(labels, edges.b == labels.node)
                        .groupBy("a")
                        .agg(F.min("label").alias("nmin")))
        updated = (labels.join(neighbor_min,
                               labels.node == neighbor_min.a, "left")
                   .select(F.col("node"),
                           F.col("label").alias("_prev"),
                           F.least(F.col("label"),
                                   F.coalesce(F.col("nmin"),
                                              F.col("label")))
                           .alias("label")))
        updated = updated.localCheckpoint(eager=True)
        # convergence = no node relabeled this round. Carrying the previous
        # label through the join makes this one count-aggregation over the
        # checkpointed result — no extra join, and type-agnostic (a numeric
        # label-sum would cast string ids to NULL and never fire; ADVICE r2)
        changed = updated.agg(
            F.count(F.when(F.col("label") != F.col("_prev"), 1))
        ).collect()[0][0]
        labels = updated.select("node", "label")
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("canonical"))


def _bands_of(sigs, id_col: str, out_id: str):
    """Explode a signature table into (id, band, band_val) rows — the
    shared banding used by self-dedup and the cross-corpus join."""
    from pyspark.sql import functions as F

    n_bands = len(MINHASH_PERMS) // LSH_BAND_ROWS
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("_", *[
                F.col(f"mh{b * LSH_BAND_ROWS + r}")
                for r in range(LSH_BAND_ROWS)
            ]).alias("band_val"))
        for b in range(n_bands)
    ])
    return (sigs.select(F.col(id_col).alias(out_id),
                        F.explode(band_structs).alias("bs"))
            .select(out_id, F.col("bs.band").alias("band"),
                    F.col("bs.band_val").alias("band_val")))


def lsh_join(docs_a, docs_b, n: int = 3, id_col: str = "doc_id",
             threshold: float = 0.5):
    """Cross-corpus near-dup join — the production dedup shape: find
    documents in ``docs_b`` (e.g. a new crawl) near-duplicating documents
    in ``docs_a`` (the existing corpus). Both sides get MinHash
    signatures (computed once each, persisted); candidates meet on a band
    equi-join (never all pairs); survivors are scored by signature
    agreement and thresholded. Returns (id_a, id_b, est_jaccard) — ids
    may collide across corpora, the columns keep them apart."""
    sig_a = minhash_signatures(docs_a, n, id_col).persist()
    sig_b = minhash_signatures(docs_b, n, id_col).persist()
    return lsh_join_sigs(sig_a, sig_b, id_col=id_col, threshold=threshold)


def lsh_join_sigs(sig_a, sig_b, id_col: str = "doc_id",
                  threshold: float = 0.5):
    """lsh_join over PRE-COMPUTED MinHash signature tables (a
    ``minhash_signatures`` result, e.g. a persisted signature store):
    band equi-join for candidates, signature-agreement score, threshold.
    The streaming-ingest shape — the corpus side's signatures live in a
    store and are never recomputed from text."""
    from pyspark.sql import functions as F

    cands = (_bands_of(sig_a, id_col, "id_a")
             .join(_bands_of(sig_b, id_col, "id_b"),
                   ["band", "band_val"])
             .select("id_a", "id_b").distinct())
    a = sig_a.select(F.col(id_col).alias("id_a"),
                     *[F.col(f"mh{j}").alias(f"a{j}")
                       for j in range(len(MINHASH_PERMS))])
    b = sig_b.select(F.col(id_col).alias("id_b"),
                     *[F.col(f"mh{j}").alias(f"b{j}")
                       for j in range(len(MINHASH_PERMS))])
    agree = sum(
        (F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
         for j in range(1, len(MINHASH_PERMS))),
        F.when(F.col("a0") == F.col("b0"), 1).otherwise(0))
    est = agree.cast("double") / len(MINHASH_PERMS)
    return (cands.join(a, "id_a").join(b, "id_b")
            .select("id_a", "id_b", F.round(est, 6).alias("est_jaccard"))
            .where(F.col("est_jaccard") >= threshold))


def lsh_pairs_scored(docs, n: int = 3, id_col: str = "doc_id",
                     threshold: float = 0.5, sig_df=None):
    """MinHash pipeline completion: LSH candidate pairs scored by their
    signature-agreement fraction (the unbiased estimator of Jaccard
    similarity), thresholded. The exact-Jaccard verify pass is O(pairs x
    shingles); the signature estimate is O(pairs x num_perms) — the
    standard scale trade (slightly noisy score, no shingle re-scan)."""
    from pyspark.sql import functions as F

    # One shingle+minhash aggregation total: the signature table is
    # O(docs x num_perms) longs — small enough to persist even at 100 TB
    # of raw text — and it feeds three consumers (banding, both score-join
    # sides). Without the persist each consumer re-scans and re-hashes the
    # full corpus.
    sigs = sig_df if sig_df is not None \
        else minhash_signatures(docs, n, id_col).persist()
    cands = lsh_candidate_pairs(docs, n, id_col, sig_df=sigs)
    a = sigs.select(F.col(id_col).alias("id1"),
                    *[F.col(f"mh{j}").alias(f"a{j}")
                      for j in range(len(MINHASH_PERMS))])
    b = sigs.select(F.col(id_col).alias("id2"),
                    *[F.col(f"mh{j}").alias(f"b{j}")
                      for j in range(len(MINHASH_PERMS))])
    agree = sum(
        (F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
         for j in range(1, len(MINHASH_PERMS))),
        F.when(F.col("a0") == F.col("b0"), 1).otherwise(0))
    est = agree.cast("double") / len(MINHASH_PERMS)
    return (cands.join(a, "id1").join(b, "id2")
            .select("id1", "id2", F.round(est, 6).alias("est_jaccard"))
            .where(F.col("est_jaccard") >= threshold))
