"""Embedding-column storage utilities: L2 normalization and symmetric
int8 quantization.

At 100 TB an `array<float>` embedding column is routinely the widest
thing in the table; int8 quantization cuts it 4x (array<tinyint> + one
float scale per vector) while keeping cosine ranking error ~1e-2 — the
standard serving trade (FAISS SQ8). Everything here is JVM higher-order
functions (transform / aggregate) over the array column: no UDF, no
shuffle, map-only at any scale.

Rounding is spelled floor(x + 0.5) instead of round() so the Spark
expression and any SQL twin (DuckDB round() half-away-from-zero vs Java
HALF_UP) agree bit-for-bit on negative values.
"""

from __future__ import annotations

__all__ = ["l2_normalize", "quantize_int8", "dequantize_int8",
           "quantized_cosine_col", "quantized_topk"]

Q_LEVELS = 127  # symmetric int8: values land in [-127, 127]


def _l2(a):
    from pyspark.sql import functions as F

    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def l2_normalize(df, vec_col: str = "embedding",
                 out_col: str = "embedding"):
    """Unit-length vectors (zero vectors pass through unchanged): after
    this, dot product IS cosine similarity."""
    from pyspark.sql import functions as F

    v = F.col(vec_col).cast("array<double>")
    n = _l2(v)
    unit = F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)
    return df.withColumn(out_col, unit)


def quantize_int8(df, vec_col: str = "embedding",
                  q_col: str = "embedding_q8",
                  scale_col: str = "q8_scale",
                  drop_source: bool = False):
    """Per-vector symmetric int8: q_i = floor(x_i * 127/amax + 0.5) with
    amax = max |x_i|; the per-vector ``scale_col`` (= amax/127) restores
    approximate floats as q_i * scale. All-zero vectors get scale 0."""
    from pyspark.sql import functions as F

    v = F.col(vec_col).cast("array<double>")
    amax = F.aggregate(F.transform(v, lambda x: F.abs(x)),
                       F.lit(0.0), lambda acc, x: F.greatest(acc, x))
    s = amax / F.lit(float(Q_LEVELS))
    q = F.when(amax > 0, F.transform(
        v, lambda x: F.floor(x / s + F.lit(0.5)).cast("tinyint"))) \
         .otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    out = df.withColumn(q_col, q).withColumn(scale_col, s)
    return out.drop(vec_col) if drop_source else out


def dequantize_int8(df, q_col: str = "embedding_q8",
                    scale_col: str = "q8_scale",
                    out_col: str = "embedding_deq"):
    from pyspark.sql import functions as F

    s = F.col(scale_col)
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda q: q.cast("double") * s))


def quantized_cosine_col(qa, sa, qb, sb):
    """Cosine from two int8-quantized vectors: the integer dot product
    rescales by both per-vector scales and both (rescaled) norms — so it
    works whether or not inputs were pre-normalized. Integer multiplies
    accumulate in long: no overflow below ~2^46 dims."""
    from pyspark.sql import functions as F

    def _idot(a, b):
        return F.aggregate(
            F.zip_with(a, b,
                       lambda x, y: x.cast("long") * y.cast("long")),
            F.lit(0).cast("long"), lambda acc, x: acc + x)

    dot = _idot(qa, qb).cast("double") * sa * sb
    na = F.sqrt(_idot(qa, qa).cast("double")) * sa
    nb = F.sqrt(_idot(qb, qb).cast("double")) * sb
    return dot / (na * nb)


def quantized_topk(vectors, queries, k: int = 5,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   q_id_col: str = "q_id", q_vec_col: str = "q_embedding"):
    """Top-k by cosine computed entirely on int8-quantized vectors — the
    4x-memory serving path. Same plan shape as similarity.cosine_topk
    (broadcast quantized queries, per-query top-k window); the float
    vectors never travel through the join."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.partitioning import spread

    def _idot(a, b):
        return F.aggregate(
            F.zip_with(a, b,
                       lambda x, y: x.cast("long") * y.cast("long")),
            F.lit(0).cast("long"), lambda acc, x: acc + x)

    # rescaled norms projected ONCE per row (same trick as
    # similarity.cosine_topk): the per-pair work in the cross join is a
    # single integer dot product; expression sequence per value is
    # unchanged vs quantized_cosine_col, so results are bit-identical
    vq = quantize_int8(vectors, vec_col=vec_col, drop_source=True) \
        .withColumn("_vn", F.sqrt(
            F.aggregate(F.transform(
                F.col("embedding_q8"),
                lambda x: x.cast("long") * x.cast("long")),
                F.lit(0).cast("long"), lambda acc, x: acc + x)
            .cast("double")) * F.col("q8_scale"))
    qq = (quantize_int8(queries, vec_col=q_vec_col, q_col="_qq8",
                        scale_col="_qs", drop_source=True)
          .withColumn("_qn", F.sqrt(
              F.aggregate(F.transform(
                  F.col("_qq8"),
                  lambda x: x.cast("long") * x.cast("long")),
                  F.lit(0).cast("long"), lambda acc, x: acc + x)
              .cast("double")) * F.col("_qs")))
    joined = spread(vq).crossJoin(F.broadcast(qq))
    cos = (_idot(F.col("embedding_q8"), F.col("_qq8")).cast("double")
           * F.col("q8_scale") * F.col("_qs")
           / (F.col("_vn") * F.col("_qn")))
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc())
    return (
        joined.select(F.col(q_id_col), F.col(id_col),
                      F.round(cos, 6).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
