"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. The
  query side is broadcast (tiny), so the scan is embarrassingly parallel and
  shuffle-free until the final per-query top-k (a W x k window over
  #queries x #vectors rows).
- ``cosine_pairs``: exact near-duplicate pairs above a threshold.
- ``ivf_topk``: the scale path — IVF-style bucketing: vectors are assigned
  to their nearest centroid once (broadcast centroids), queries probe only
  their own centroid's bucket, cutting the scanned fraction to ~1/K.

All arithmetic is double-precision JVM expressions (zip_with + aggregate);
deterministic and exactly mirrored by the DuckDB oracle
(list_cosine_similarity over ::DOUBLE[]).
"""

from __future__ import annotations

__all__ = ["cosine_col", "cosine_topk", "cosine_pairs", "ivf_topk",
           "kmeans_centroids", "otree_prefilter_topk",
           "embedding_lsh_pairs", "semantic_dedup"]


def _dot(a, b):
    from pyspark.sql import functions as F

    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    from pyspark.sql import functions as F

    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col):
    from pyspark.sql import functions as F

    return F.col(col).cast("array<double>") if isinstance(col, str) else \
        col.cast("array<double>")


def cosine_topk(vectors, queries, k: int = 5, vec_col: str = "embedding",
                id_col: str = "vec_id", q_id_col: str = "q_id",
                q_vec_col: str = "q_embedding"):
    """Exact top-k by cosine per query vector; broadcast the query side.

    Norms (and the float->double cast) are projected ONCE per row before
    the cross join, so the per-pair work is a single dot product — the
    norm aggregates otherwise re-run #queries (resp. #vectors) times per
    row. The arithmetic sequence per value is unchanged (same aggregate
    exprs, same dot/(na*nb) association), so results are bit-identical
    to the naive form and the DuckDB oracle still matches."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.partitioning import spread

    body = spread(vectors).select(
        F.col(id_col), _as_double(vec_col).alias("_vd")
    ).withColumn("_vn", _norm(F.col("_vd")))
    qs = queries.select(
        F.col(q_id_col), _as_double(q_vec_col).alias("_qd")
    ).withColumn("_qn", _norm(F.col("_qd")))
    joined = body.crossJoin(F.broadcast(qs))
    cos = _dot(F.col("_vd"), F.col("_qd")) / (F.col("_vn") * F.col("_qn"))
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc())
    return (
        joined.select(F.col(q_id_col), F.col(id_col),
                      F.round(cos, 6).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# cosine_pairs is the documented O(n^2) correctness baseline; above this
# many vectors the theta-join cross product is a scale bug, not a query —
# the operator itself refuses (mirroring matview's _MAX_SCOPE_KEYS guard)
# instead of trusting every caller to remember the cap.
MAX_EXACT_PAIR_VECTORS = 10_000


def cosine_pairs(vectors, threshold: float, vec_col: str = "embedding",
                 id_col: str = "vec_id", exact_ok: bool = False):
    """Exact embedding near-dup pairs (cos >= threshold), id1 < id2.

    O(n^2) by construction (theta join id1 < id2) — the correctness
    baseline next to the scale paths (embedding_lsh_pairs /
    semantic_dedup). Inputs beyond ``MAX_EXACT_PAIR_VECTORS`` raise
    unless ``exact_ok=True``: at corpus scale the cross product is
    never the intended plan, and failing loudly at plan time is cheaper
    than a cartesian at run time. The bounded count probe reads at most
    cap+1 rows (limit + count — no full scan)."""
    from pyspark.sql import functions as F

    from ..functions.partitioning import spread

    if not exact_ok:
        n = vectors.limit(MAX_EXACT_PAIR_VECTORS + 1).count()
        if n > MAX_EXACT_PAIR_VECTORS:
            raise ValueError(
                f"cosine_pairs is the exact O(n^2) baseline and the input "
                f"exceeds {MAX_EXACT_PAIR_VECTORS} vectors; use "
                f"embedding_lsh_pairs/semantic_dedup (the LSH scale path) "
                f"or pass exact_ok=True to force the cross product")

    vectors = spread(vectors).select(
        F.col(id_col), _as_double(vec_col).alias("_vd")
    ).withColumn("_n", _norm(F.col("_vd")))
    a = vectors.select(F.col(id_col).alias("id1"),
                       F.col("_vd").alias("va"), F.col("_n").alias("_na"))
    b = vectors.select(F.col(id_col).alias("id2"),
                       F.col("_vd").alias("vb"), F.col("_n").alias("_nb"))
    # norms precomputed per row (see cosine_topk) — per-pair work is one dot
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select("id1", "id2", F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def ivf_topk(vectors, queries, centroids, k: int = 5,
             vec_col: str = "embedding", id_col: str = "vec_id",
             q_id_col: str = "q_id", q_vec_col: str = "q_embedding",
             c_id_col: str = "c_id", c_vec_col: str = "c_embedding",
             probe: int = 1):
    """IVF (inverted-file) approximate top-k.

    Vectors are assigned to their max-cosine centroid; queries probe
    their ``probe`` nearest centroids (the standard nprobe recall knob —
    a true neighbor just across a Voronoi boundary is only visible from
    the adjacent cell). Assignment is a broadcast cross join + row_number
    window; the search join is then an equi-join on the centroid id — at
    scale this is the difference between scanning 100 TB and scanning
    ``probe``/K of it. Each (query, vector) pair meets at most once
    because a vector lives in exactly one cell."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.partitioning import spread

    cents = centroids.select(
        F.col(c_id_col), _as_double(c_vec_col).alias("_cd")
    ).withColumn("_cn", _norm(F.col("_cd")))

    def assign(df, idc, vc, n_best, d_col, n_col):
        # cast + norm projected once per row (see cosine_topk): the
        # centroid-assignment cross join and the rerank join both reuse
        # them, so per-pair work is a single dot product
        prepped = spread(df).select(
            F.col(idc), _as_double(vc).alias(d_col)
        ).withColumn(n_col, _norm(F.col(d_col)))
        joined = prepped.crossJoin(F.broadcast(cents))
        cos = _dot(F.col(d_col), F.col("_cd")) \
            / (F.col(n_col) * F.col("_cn"))
        from pyspark.sql import types as T

        c_id_numeric = isinstance(cents.schema[c_id_col].dataType,
                                  T.NumericType)
        if n_best == 1 and c_id_numeric:
            # argmax as an aggregate, not a window: the broadcast cross
            # join emits K rows per vector INSIDE the map task, so a
            # hash aggregate's partial (map-side) pass collapses them to
            # one row per vector before the exchange — the shuffle
            # carries |vectors| rows instead of |vectors| x K (guide
            # §2.3 "aggregate before you shuffle"; the window shape
            # shuffled the whole cross product to sort it). max over
            # the (cos, -c_id) struct is a TOTAL order realizing
            # exactly the window's ORDER BY cos DESC, c_id ASC rank-1
            # pick (Spark and the oracle both order NaN greatest); the
            # tie-break negation needs a numeric centroid id — other id
            # types keep the window shape below.
            best = F.max(F.struct(
                cos.alias("_c"), (-F.col(c_id_col)).alias("_negid"),
                F.col(d_col).alias("_d"), F.col(n_col).alias("_n")))
            agg = joined.groupBy(idc).agg(best.alias("_b"))
            return agg.select(
                F.col(idc), F.col("_b._d").alias(d_col),
                F.col("_b._n").alias(n_col),
                (-F.col("_b._negid")).alias(c_id_col))
        w = Window.partitionBy(idc).orderBy(
            F.col("_ccos").desc(), F.col(c_id_col).asc())
        return (
            joined.withColumn("_ccos", cos)
            .withColumn("_crank", F.row_number().over(w))
            .where(F.col("_crank") <= n_best)
            .drop("_ccos", "_crank", "_cd", "_cn")
        )

    v_assigned = assign(vectors, id_col, vec_col, 1, "_vd", "_vn")
    q_assigned = assign(queries, q_id_col, q_vec_col, max(1, probe),
                        "_qd", "_qn")
    joined = v_assigned.join(q_assigned, c_id_col)
    cos = _dot(F.col("_vd"), F.col("_qd")) / (F.col("_vn") * F.col("_qn"))
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc())
    return (
        joined.select(F.col(q_id_col), F.col(id_col),
                      F.round(cos, 6).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def kmeans_centroids(vectors, k: int, vec_col: str = "embedding",
                     c_id_col: str = "c_id",
                     c_vec_col: str = "c_embedding",
                     max_iter: int = 20, seed: int = 42):
    """Train REAL k-means centroids for ``ivf_topk`` with pyspark.ml
    KMeans (distributed Lloyd iterations, k-means|| initialization —
    the same engine dependency auto column selection already uses for
    Correlation, functions/selection.py). The heuristic
    sample-every-Nth-vector centroids the bench lanes use are fine as
    Voronoi seeds, but trained centroids tighten the cells, which is
    what makes low ``probe`` values retain recall on clustered data.

    Scale shape: the fit is O(iters x N x K) map-side work + O(K)
    driver state; the returned frame has exactly ``k`` rows —
    broadcast-sized by construction, ready to pass as ``centroids``.
    Euclidean k-means on L2-normalized inputs orders cells identically
    to cosine, so normalize upstream when vectors have wildly varying
    norms (operators/embeddings.l2_normalize)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = vectors.select(
        array_to_vector(_as_double(vec_col)).alias("features"))
    model = KMeans(k=k, maxIter=max_iter, seed=seed).fit(feats)
    rows = [(i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())]
    return vectors.sparkSession.createDataFrame(
        rows, f"{c_id_col} int, {c_vec_col} array<double>")


def otree_prefilter_topk(spark, qt, query_rows, k: int = 10,
                         radius: float = 0.1, vec_col: str = "embedding",
                         id_col: str = "vec_id", dim_cols=("e0", "e1")):
    """ANN over the OTree index itself: the vector table is indexed on a
    few extracted embedding dimensions, so a per-query range read prunes
    FILES (multi-dim data skipping) before the exact cosine rerank ever
    runs — the index generalizes to vector search with no extra structure
    (SURVEY.md §2.3). Each query reads only the cubes intersecting its
    [dim - radius, dim + radius] box; recall is governed by radius exactly
    like an IVF nprobe.

    ``qt`` is a QbeastTable over a table with ``dim_cols`` materialized;
    ``query_rows`` is a small driver-side list of Rows (id, vector,
    dim values) — driver-known queries are inherent to ANN serving.

    Batched: ONE pruned read over the DNF union of all query boxes (the
    reader unions the per-disjunct file sets), then a broadcast
    nested-loop join against the tiny query matrix re-applies per-query
    box membership and reranks — plan count is independent of #queries
    (the round-1 shape built one plan per query row).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    disjuncts = []
    for row in query_rows:
        box = []
        for d in dim_cols:
            box += [(d, ">=", float(row[d]) - radius),
                    (d, "<=", float(row[d]) + radius)]
        disjuncts.append(box)
    cand = qt.read(disjuncts)

    qdf = qt.spark.createDataFrame(
        [(row[id_col], [float(x) for x in row[vec_col]],
          *[float(row[d]) for d in dim_cols]) for row in query_rows],
        schema=("q_id long, _q_vec array<double>, "
                + ", ".join(f"_q_{d} double" for d in dim_cols)))
    in_box = F.lit(True)
    for d in dim_cols:
        in_box = in_box & (
            F.abs(F.col(d) - F.col(f"_q_{d}")) <= F.lit(radius))
    joined = cand.join(F.broadcast(qdf),
                       in_box & (F.col(id_col) != F.col("q_id")))
    cos = cosine_col(_as_double(vec_col), F.col("_q_vec"))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col(id_col).asc())
    return (joined.select("q_id", F.col(id_col),
                          F.round(cos, 6).alias("cos"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def embedding_lsh_pairs(vectors, threshold: float, n_bits: int = 8,
                        n_tables: int = 1,
                        vec_col: str = "embedding", id_col: str = "vec_id"):
    """Near-duplicate embedding pairs via hyperplane LSH: the bucket key is
    the sign bit of ``n_bits`` dimensions (axis-aligned hyperplanes
    through the origin — for whitened/random-basis embeddings these behave
    like random projections), candidates meet only inside a bucket
    (equi-join, well distributed), and the exact cosine filters the
    survivors. The scale path next to the exact O(n^2/buckets)
    cosine_pairs: shuffle volume is O(n · n_tables), join fan-out
    O(n^2 / 2^n_bits) per table.

    Recall: a true pair straddling any hyperplane of a table is missed by
    that table; ``n_tables > 1`` stacks tables over DISJOINT dimension
    slices (table t uses dims [t·n_bits, (t+1)·n_bits)) exactly like
    dedup.lsh_candidate_pairs bands — one explode, one equi-join on
    (table, bucket), candidates distinct before the exact rerank, so
    recall rises monotonically with n_tables at linear cost."""
    from pyspark.sql import functions as F

    from ..functions.partitioning import spread

    v = _as_double(vec_col)

    def bucket(t: int):
        lo = t * n_bits
        return F.concat_ws(
            "", *[(v[lo + i] >= 0).cast("int").cast("string")
                  for i in range(n_bits)])

    tables = F.array(*[
        F.struct(F.lit(t).alias("t"), bucket(t).alias("b"))
        for t in range(n_tables)
    ])
    tagged = (spread(vectors)
              .select(F.col(id_col), F.col(vec_col),
                      F.explode(tables).alias("_tb"))
              .select(id_col,
                      _as_double(vec_col).alias("_vd"),
                      F.col("_tb.t").alias("_t"),
                      F.col("_tb.b").alias("_bkt"))
              .withColumn("_n", _norm(F.col("_vd"))))
    a = tagged.select(F.col(id_col).alias("id1"),
                      F.col("_vd").alias("_va"),
                      F.col("_n").alias("_na"), "_t", "_bkt")
    b = tagged.select(F.col(id_col).alias("id2"),
                      F.col("_vd").alias("_vb"),
                      F.col("_n").alias("_nb"), "_t", "_bkt")
    cand = (a.join(b, ["_t", "_bkt"])
            .where(F.col("id1") < F.col("id2"))
            .select("id1", "id2", "_va", "_vb", "_na", "_nb"))
    if n_tables > 1:
        cand = cand.dropDuplicates(["id1", "id2"])
    # norms precomputed per tagged row (see cosine_topk)
    cos = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (cand
            .select("id1", "id2", F.round(cos, 6).alias("cos"))
            .where(F.col("cos") >= threshold))


def semantic_dedup(vectors, threshold: float = 0.95,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   n_bits: int = 8, n_tables: int = 2,
                   exact: bool = False, exact_ok: bool = False):
    """SemDeDup-style semantic deduplication: docs whose EMBEDDINGS are
    near-identical (cosine >= threshold) collapse to one canonical
    representative — the dedup tier that catches paraphrases and
    templated rewrites that token-level MinHash/SimHash miss.

    Plan: candidate pairs from hyperplane-LSH buckets (equi-join inside
    buckets — never all-pairs; ``exact=True`` swaps in the labeled
    O(n^2) cosine_pairs baseline for small/verification runs, guarded
    above MAX_EXACT_PAIR_VECTORS unless ``exact_ok=True``), then
    min-label connected components (dedup.connected_components) so
    chains of near-dupes collapse transitively, like the exact-dedup
    clustering. Returns one row per input vector:
    (id, canonical_id, is_duplicate) — filter ``~is_duplicate`` for the
    keep-list. At 100 TB: shuffle is O(n · n_tables) bucket rows plus
    the CC rounds over the (sparse) duplicate-pair edges only."""
    from pyspark.sql import functions as F

    from .dedup import connected_components

    pairs = (cosine_pairs(vectors, threshold, vec_col=vec_col,
                          id_col=id_col, exact_ok=exact_ok)
             if exact else
             embedding_lsh_pairs(vectors, threshold, n_bits=n_bits,
                                 n_tables=n_tables, vec_col=vec_col,
                                 id_col=id_col))
    labels = connected_components(pairs.select("id1", "id2"))
    out = (vectors.select(F.col(id_col))
           .join(labels, F.col(id_col) == F.col("node"), "left"))
    canonical = F.coalesce(F.col("canonical"), F.col(id_col))
    return out.select(
        F.col(id_col),
        canonical.alias("canonical_id"),
        (canonical != F.col(id_col)).alias("is_duplicate"))
