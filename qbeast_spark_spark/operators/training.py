"""Training-set assembly operators: deterministic splits, token-bounded
chunking, and sequence packing.

These are the last-mile ops between a cleaned corpus and an LLM training
run. All three are built for 100 TB:

- ``hash_split`` is a pure column expression (murmur3, no shuffle, no
  state) — the split of a row never changes as the corpus grows, the
  property that keeps eval sets stable across dataset versions;
- ``leakage_safe_split`` hashes by duplicate-cluster canonical id
  instead, so near-duplicate documents can never straddle train/eval
  (one equi-join over the clustered minority — AQE broadcasts it when
  small — + the same column expression);
- ``chunk_text`` is a single JVM projection (sequence + slice over the
  token array; no UDF, no explode-then-join);
- ``pack_sequences`` is the classic first-fit-decreasing bin pack done
  PARTITION-LOCALLY (Arrow-batched applyInPandas over salted groups):
  exact global FFD is inherently sequential, so each task packs its own
  slice and bins never span partitions — the standard distributed
  approximation (waste is bounded by one partial bin per partition).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from .text import TOKEN_RE

__all__ = ["hash_split", "leakage_safe_split", "chunk_text",
           "pack_sequences", "sample_mixture"]


def hash_split(df, weights: Dict[str, float], id_col: str = "doc_id",
               seed: int = 42, out_col: str = "split",
               method: str = "murmur3"):
    """Deterministic train/val/test assignment: hash(id) maps to [0,1);
    cumulative weight ranges pick the split. Rows keep their split
    forever — appends can't reshuffle existing membership.

    ``method``: 'murmur3' (default; JVM-native ``F.hash`` with ``seed``,
    zero Python) or 'md5' (first 8 hex digits / 2^32 — the same
    hash-as-uniform scheme as operators.sampling.uniform_col, replayable
    by any engine with md5, which is what the DuckDB oracle checks)."""
    from pyspark.sql import functions as F

    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to > 0")
    if method == "md5":
        # seed folded into the digest input (id ":" seed) so different
        # seeds give independent draws, same as the murmur3 path; the
        # DuckDB twin is md5(CAST(id AS VARCHAR) || ':<seed>')
        h = F.conv(F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                              F.lit(str(seed)))), 1, 8),
            16, 10).cast("double")
        u = h / float(1 << 32)
    elif method == "murmur3":
        u = ((F.hash(F.col(id_col), F.lit(seed))
              .bitwiseAND(F.lit(0x7FFFFFFF))) / F.lit(2147483647.0))
    else:
        raise ValueError(f"unknown hash_split method {method!r}")
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < acc
        expr = F.when(cond, name) if expr is None else \
            expr.when(cond, name)
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(names[-1]))
    return df.withColumn(out_col, expr)


def leakage_safe_split(df, canonical, weights: Dict[str, float],
                       id_col: str = "doc_id", seed: int = 42,
                       out_col: str = "split", method: str = "murmur3"):
    """``hash_split`` that cannot leak near-duplicates across splits:
    rows are hashed by their duplicate-cluster CANONICAL id, so every
    member of a near-dup cluster lands in the SAME split — hashing raw
    doc ids would place a train doc's near-twin in the eval set and
    inflate every benchmark number (the classic train/test
    contamination vector that survives plain doc-id splitting).

    ``canonical``: a (node, canonical) frame, e.g. the output of
    ``dedup.connected_components`` over LSH/SimHash pairs (dedup.py:252
    — singletons may be absent: an id with no row is its own cluster).

    Scale shape: one left equi-join on the id — only DOCUMENTS WITH A
    DUPLICATE appear in ``canonical``, typically a small fraction of
    the corpus, so AQE broadcasts it when it fits and falls back to a
    shuffle join when a crawl-heavy corpus clusters billions of docs
    (no forced broadcast hint: that would hard-fail at the 8 GB
    broadcast limit instead of degrading, r5 review) — followed by the
    same pure-column-expression assignment as ``hash_split``. Split
    membership is stable under corpus growth for unclustered docs; a
    doc that later JOINS a cluster adopts the cluster's split, which
    is exactly the property that keeps the eval set leak-free."""
    from pyspark.sql import functions as F

    can = canonical.select(F.col("node").alias(id_col),
                           F.col("canonical").alias("_canon"))
    joined = df.join(can, id_col, "left")
    keyed = joined.withColumn(
        "_split_key", F.coalesce(F.col("_canon"), F.col(id_col)))
    out = hash_split(keyed, weights, id_col="_split_key", seed=seed,
                     out_col=out_col, method=method)
    return out.drop("_canon", "_split_key")


def chunk_text(docs, max_tokens: int = 128, overlap: int = 0,
               id_col: str = "doc_id", text_col: str = "text"):
    """Split documents into token-bounded chunks with optional overlap:
    (id, chunk_id, n_tokens, chunk) rows. One projection — tokens
    materialize once, chunk starts come from ``sequence()``, each chunk
    is a ``slice`` + ``concat_ws`` (JVM higher-order functions, no UDF).
    Whitespace inside the original text is normalized to single spaces
    (chunks re-join tokens)."""
    from pyspark.sql import functions as F

    from ..functions.partitioning import spread

    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    tokenized = spread(docs).select(
        F.col(id_col),
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        .alias("_toks"))
    n = F.size(F.col("_toks"))
    # chunk start offsets 0, step, 2*step, ...: a start must contribute at
    # least one NEW token (start < n - overlap), else the final chunk
    # would be pure overlap of its predecessor
    starts = F.sequence(F.lit(0),
                        F.greatest(n - overlap - 1, F.lit(0)),
                        F.lit(step))
    chunks = (tokenized
              .where(n > 0)
              .select(F.col(id_col), F.col("_toks"),
                      F.posexplode(starts).alias("chunk_id", "_start"))
              .select(
                  F.col(id_col), F.col("chunk_id"),
                  F.slice(F.col("_toks"), F.col("_start") + 1,
                          F.lit(max_tokens)).alias("_chunk_toks")))
    return chunks.select(
        F.col(id_col), F.col("chunk_id"),
        F.size(F.col("_chunk_toks")).alias("n_tokens"),
        F.concat_ws(" ", F.col("_chunk_toks")).alias("chunk"))


def pack_sequences(docs, budget_tokens: int = 2048,
                   id_col: str = "doc_id", tokens_col: str = "n_tokens",
                   num_partitions: int | None = None):
    """Sample packing: group documents into bins whose token totals stay
    within ``budget_tokens`` (first-fit decreasing). Returns (id, tokens,
    bin_id, bin_tokens) — every input row appears exactly once; documents
    longer than the budget get a singleton bin (truncation is the
    caller's policy call).

    Distributed shape: rows hash-salt into ``num_partitions`` groups (ONE
    shuffle), each task packs its group with best-fit-decreasing (a
    bisect over the sorted remaining-capacity list: O(n log n)
    comparisons — same packing quality class as first-fit-decreasing),
    and bin ids are salted by group so they are globally unique. Exact
    global FFD is a sequential algorithm; per-group packing is the
    standard approximation and its waste is at most one under-filled bin
    per group — negligible when groups hold thousands of documents."""
    from pyspark.sql import functions as F

    spark = docs.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    narrow = (docs.select(F.col(id_col).alias("__id"),
                          F.col(tokens_col).cast("long").alias("_tok"))
              .withColumn("_part",
                          F.pmod(F.hash("__id"), F.lit(nparts))))

    def pack(pdf):
        import bisect

        pdf = pdf.sort_values("_tok", ascending=False, kind="mergesort")
        part = int(pdf["_part"].iloc[0]) if len(pdf) else 0
        rems: List[int] = []     # open-bin remaining capacities, sorted
        slot_bin: List[int] = []  # parallel: bin index per slot
        totals: List[int] = []
        assign = []
        for tok in pdf["_tok"]:
            tok = int(tok)
            pos = bisect.bisect_left(rems, tok)
            if pos == len(rems):          # nothing fits: open a bin
                idx = len(totals)
                totals.append(tok)
                rem = budget_tokens - tok
                if rem > 0:
                    at = bisect.bisect_left(rems, rem)
                    rems.insert(at, rem)
                    slot_bin.insert(at, idx)
            else:                          # tightest bin that fits
                idx = slot_bin.pop(pos)
                rem = rems.pop(pos) - tok
                totals[idx] += tok
                if rem > 0:
                    at = bisect.bisect_left(rems, rem)
                    rems.insert(at, rem)
                    slot_bin.insert(at, idx)
            assign.append(idx)
        pdf = pdf.assign(
            bin_id=[part * 1_000_000_000 + a for a in assign])
        pdf["bin_tokens"] = [totals[a] for a in assign]
        return pdf[["__id", "_tok", "bin_id", "bin_tokens"]]

    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("__id", docs.schema[id_col].dataType),
        T.StructField("_tok", T.LongType()),
        T.StructField("bin_id", T.LongType()),
        T.StructField("bin_tokens", T.LongType()),
    ])
    packed = narrow.groupBy("_part").applyInPandas(pack, out_schema)
    return packed.select(
        F.col("__id").alias(id_col), F.col("_tok").alias(tokens_col),
        "bin_id", "bin_tokens")


def sample_mixture(sources: Dict[str, Tuple[object, float]],
                   token_budget: int,
                   text_col: str = "text",
                   tokens_col: str = None,
                   max_epochs: float = 4.0,
                   seed: int = 42,
                   id_col: str = "doc_id"):
    """Data-mixing sampler: draw a training mix hitting ``token_budget``
    tokens split across sources by weight — the standard pretraining
    recipe ("X% web, Y% code, Z% books ...").

    ``sources`` maps name -> (DataFrame, weight). Per source the target
    is ``budget * weight / sum(weights)`` tokens; one aggregate job per
    source measures its token supply, and the rate = target / supply.
    Undersized sources REPEAT (epochs, Delta between integer passes is
    hash-sampled) up to ``max_epochs`` — the standard upsampling cap, a
    warning-grade report field when it clips the target. Selection is
    deterministic: murmur3(id, epoch-salted) <= rate, so the same call
    on the same data returns the same rows, and a source's sample only
    grows monotonically as its rate rises.

    Returns (DataFrame with a ``source`` + ``epoch`` column, report
    dict). At 100 TB: one agg per source + a map-only filter per epoch
    pass — no shuffle, no collect beyond per-source scalars."""
    from pyspark.sql import functions as F

    if not sources:
        raise ValueError("sample_mixture needs at least one source")
    total_w = sum(w for _, w in sources.values())
    if total_w <= 0:
        raise ValueError("weights must sum to > 0")
    report = {}
    out = None
    for name, (df, w) in sources.items():
        toks = (F.col(tokens_col) if tokens_col else
                F.size(F.regexp_extract_all(F.lower(F.col(text_col)),
                                            F.lit(TOKEN_RE), 0)))
        supply = df.agg(F.sum(toks).alias("t")).collect()[0]["t"] or 0
        target = token_budget * (w / total_w)
        rate = 0.0 if supply == 0 else target / supply
        clipped = rate > max_epochs
        rate = min(rate, max_epochs)
        full_epochs = int(rate)
        frac = rate - full_epochs
        report[name] = {"supply_tokens": int(supply),
                        "target_tokens": int(target),
                        "rate": round(rate, 6),
                        "epochs": full_epochs + (1 if frac > 0 else 0),
                        "clipped_by_max_epochs": clipped}
        pieces = []
        for e in range(full_epochs):
            pieces.append(df.withColumn("epoch", F.lit(e)))
        if frac > 0:
            # deterministic Bernoulli(frac): uniform in [0,1) from the
            # sign-free murmur3 of (id, seed, epoch)
            u = (F.hash(F.col(id_col), F.lit(seed),
                        F.lit(full_epochs)).cast("long")
                 + F.lit(2**31)) / F.lit(float(2**32))
            pieces.append(df.where(u < F.lit(frac))
                          .withColumn("epoch", F.lit(full_epochs)))
        for p in pieces:
            p = p.withColumn("source", F.lit(name))
            out = p if out is None else out.unionByName(p)
    if out is None or not report:
        raise ValueError("no sampleable rows across sources")
    return out, report
