"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language guessing, fingerprinting.

All expressions are JVM-side `pyspark.sql.functions` (whole-stage codegen,
no Python in the hot path) so they scale to 100 TB document tables. Every
operator has an exact ANSI-SQL twin used by the DuckDB oracle in
``qbeast_spark_spark.queries``.
"""

from __future__ import annotations

__all__ = [
    "TOKEN_RE", "STOPWORDS_EN", "tokens_col", "text_stats", "language_guess",
    "token_counts", "fingerprint", "fingerprint_col", "text_analysis",
    "PII_PATTERNS", "pii_scan", "token_ngrams_col", "decontaminate",
    "GOPHER_DEFAULTS", "quality_flags", "TOP_NGRAM_DEFAULTS",
    "repetition_flags",
]

# word-ish tokens: lowercase alnum runs (a deliberate, documented convention
# shared byte-for-byte with the oracle SQL)
TOKEN_RE = "[a-z0-9]+"

STOPWORDS_EN = ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"]


def tokens_col(text_col: str = "text"):
    from pyspark.sql import functions as F

    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)


def _tokenized(docs, id_col: str, text_col: str, extra_cols=(),
               extra_exprs=()):
    """Materialize the token array in its own projection — a multiply-used
    regex expression must not be inlined into downstream lambdas (it would
    re-evaluate per array element; see dedup._shingle_expr)."""
    from pyspark.sql import functions as F

    from ..functions.partitioning import spread

    return spread(docs).select(
        F.col(id_col), *[F.col(c) for c in extra_cols], *extra_exprs,
        tokens_col(text_col).alias("_toks"))


def text_stats(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Quality-scoring features per document: token counts, average token
    length, stopword ratio, alpha ratio."""
    from pyspark.sql import functions as F

    from ..functions.partitioning import spread

    docs = spread(docs).select(
        F.col(id_col), F.length(F.col(text_col)).alias("_n_chars"),
        F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
        .alias("_n_alpha"),
        F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?'\"()-]", ""))
        .alias("_n_punct"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_ws_tokens"),
        tokens_col(text_col).alias("_toks"))
    toks = F.col("_toks")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_toks = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    chars = F.greatest(F.col("_n_chars"), F.lit(1))
    return docs.select(
        F.col(id_col),
        F.col("_n_chars").alias("n_chars_measured"),
        F.col("_ws_tokens").alias("ws_tokens"),
        n_toks.alias("n_tokens"),
        F.round(total_len.cast("double") /
                F.greatest(n_toks, F.lit(1)), 4).alias("avg_token_len"),
        F.round(n_stop.cast("double") /
                F.greatest(n_toks, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(F.col("_n_alpha").cast("double") / chars, 4)
        .alias("alpha_ratio"),
        F.round(F.col("_n_punct").cast("double") / chars, 4)
        .alias("punct_ratio"),
    )


# High-frequency English character trigrams for the n-gram signal; shared
# with the oracle SQL generator in queries.py.
EN_TRIGRAMS = ["the", "and", "ing", "ion", "ent", "her", "for", "tha"]


def fingerprint_col(text_col: str = "text"):
    """md5 over the normalized text (lowercase, whitespace collapsed,
    trimmed) — the fingerprint as a reusable Column expression."""
    from pyspark.sql import functions as F

    return F.md5(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")))


def language_guess(docs, id_col: str = "doc_id", text_col: str = "text",
                   threshold: float = 0.05, tri_threshold: float = 0.01,
                   include_fingerprint: bool = False):
    """Language-ID heuristic combining two signals: English stopword
    density over word tokens AND character-trigram density (occurrences of
    high-frequency English trigrams per character). Both all-JVM
    (occurrence counting via length-difference after replace — no explode,
    no UDF); 'en' needs both signals above threshold.

    ``include_fingerprint`` adds the document fingerprint column in the
    same pass (one projection instead of a join of two)."""
    from pyspark.sql import functions as F

    extra = [F.length(F.lower(F.col(text_col))).alias("_n_chars"),
             *[(F.length(F.lower(F.col(text_col)))
                - F.length(F.replace(
                    F.lower(F.col(text_col)),
                    F.lit(tri), F.lit(""))))
               .alias(f"_tri_{tri}")
               for tri in EN_TRIGRAMS]]
    if include_fingerprint:
        extra.append(fingerprint_col(text_col).alias("_fp"))
    tokenized = _tokenized(docs, id_col, text_col, extra_exprs=extra)
    toks = F.col("_toks")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_toks = F.greatest(F.size(toks), F.lit(1))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    ratio = n_stop.cast("double") / n_toks
    tri_hits = sum((F.col(f"_tri_{t}") / 3 for t in EN_TRIGRAMS[1:]),
                   F.col(f"_tri_{EN_TRIGRAMS[0]}") / 3)
    tri_score = tri_hits.cast("double") / F.greatest(F.col("_n_chars"),
                                                     F.lit(1))
    cols = [
        F.col(id_col),
        F.round(ratio, 4).alias("en_score"),
        F.round(tri_score, 4).alias("trigram_score"),
        F.when((ratio >= threshold) & (tri_score >= tri_threshold),
               F.lit("en")).otherwise(F.lit("unk"))
        .alias("lang_guess"),
    ]
    if include_fingerprint:
        cols.append(F.col("_fp").alias("fingerprint"))
    return tokenized.select(*cols)


def text_analysis(docs, id_col: str = "doc_id", text_col: str = "text",
                  threshold: float = 0.05, tri_threshold: float = 0.01):
    """Quality stats + language-ID + fingerprint in ONE pass: a single
    intermediate projection materializes every shared input (token array,
    char counts, trigram hits, fingerprint), then one final select emits
    the union of text_stats and language_guess columns. No join, no
    second scan — the shape both standalone operators use, merged."""
    from pyspark.sql import functions as F

    from ..functions.partitioning import spread

    lower = F.lower(F.col(text_col))
    docs = spread(docs).select(
        F.col(id_col), F.length(F.col(text_col)).alias("_n_chars"),
        F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
        .alias("_n_alpha"),
        F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?'\"()-]", ""))
        .alias("_n_punct"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_ws_tokens"),
        *[(F.length(lower) - F.length(
            F.replace(lower, F.lit(tri), F.lit(""))))
          .alias(f"_tri_{tri}") for tri in EN_TRIGRAMS],
        fingerprint_col(text_col).alias("_fp"),
        tokens_col(text_col).alias("_toks"))
    toks = F.col("_toks")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_toks = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    chars = F.greatest(F.col("_n_chars"), F.lit(1))
    ratio = n_stop.cast("double") / F.greatest(n_toks, F.lit(1))
    tri_hits = sum((F.col(f"_tri_{t}") / 3 for t in EN_TRIGRAMS[1:]),
                   F.col(f"_tri_{EN_TRIGRAMS[0]}") / 3)
    tri_score = tri_hits.cast("double") / chars
    return docs.select(
        F.col(id_col),
        F.col("_n_chars").alias("n_chars_measured"),
        F.col("_ws_tokens").alias("ws_tokens"),
        n_toks.alias("n_tokens"),
        F.round(total_len.cast("double") /
                F.greatest(n_toks, F.lit(1)), 4).alias("avg_token_len"),
        F.round(ratio, 4).alias("stopword_ratio"),
        F.round(F.col("_n_alpha").cast("double") / chars, 4)
        .alias("alpha_ratio"),
        F.round(F.col("_n_punct").cast("double") / chars, 4)
        .alias("punct_ratio"),
        F.round(ratio, 4).alias("en_score"),
        F.round(tri_score, 4).alias("trigram_score"),
        F.when((ratio >= threshold) & (tri_score >= tri_threshold),
               F.lit("en")).otherwise(F.lit("unk")).alias("lang_guess"),
        F.col("_fp").alias("fingerprint"),
    )


# PII probes for training-data redaction triage. Patterns deliberately use
# only constructs whose matching semantics agree between Java regex
# (Spark) and RE2 (DuckDB oracle): character classes, bounded/greedy
# quantifiers — no backrefs, no lookaround. Shared with the oracle SQL
# generator in queries.py.
PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+",
    "url": r"https?://[^ \t\n]+",
    # 9+ digit runs allowing common separators, anchored on digits at
    # both ends (catches phone-ish and id-ish sequences)
    "phone": r"[0-9][0-9 ().-]{7,}[0-9]",
}


def pii_scan(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document PII hit counts (emails / URLs / phone-like digit
    runs) + their total — the triage pass before redaction in a
    training-data pipeline (filter ``n_pii_total > 0``). All-JVM
    ``regexp_count`` expressions (one scan, whole-stage codegen); at
    100 TB this is a map-only pass."""
    from pyspark.sql import functions as F

    from ..functions.partitioning import spread

    counts = {name: F.regexp_count(F.col(text_col), F.lit(pat))
              for name, pat in PII_PATTERNS.items()}
    return spread(docs).select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        sum(list(counts.values())[1:], list(counts.values())[0])
        .cast("int").alias("n_pii_total"),
    )


def token_counts(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Token counting two ways: whitespace split and the BPE-ish regex."""
    from pyspark.sql import functions as F

    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    re_toks = F.size(tokens_col(text_col))
    return docs.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        re_toks.alias("re_tokens"),
    )


def fingerprint(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Deterministic document fingerprint: md5 over the normalized text
    (lowercase, whitespace collapsed, trimmed)."""
    from pyspark.sql import functions as F

    return docs.select(
        F.col(id_col),
        fingerprint_col(text_col).alias("fingerprint"),
    )


def token_ngrams_col(toks_col, n: int):
    """Rolling word n-grams from a token-array column, space-joined —
    one JVM projection (sequence + slice + concat_ws, no explode yet).
    Pass the name of an ALREADY-MATERIALIZED token array column (see
    _tokenized): inlining the tokenizer regex here would re-evaluate it
    per gram."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    toks = toks_col if isinstance(toks_col, Column) else F.col(toks_col)
    starts = F.when(F.size(toks) >= n,
                    F.sequence(F.lit(1), F.size(toks) - (n - 1))) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(starts,
                       lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def decontaminate(docs, eval_docs, n: int = 13, id_col: str = "doc_id",
                  eval_id_col: str = "doc_id", text_col: str = "text",
                  eval_text_col: str = "text", exclude_self: bool = True):
    """Training-set decontamination: which corpus docs contain any word
    ``n``-gram that also appears in an EVAL/benchmark document — the
    standard 13-gram-overlap contamination check run before training.
    Returns (doc_id, contam_hits) with contam_hits = #distinct
    overlapping grams, one row per contaminated doc.

    Scale shape for 100 TB: the eval side (benchmark suites — tiny next
    to the corpus) is aggregated to distinct (gram, eval_id) pairs and
    BROADCAST, so the corpus side is one map-side semi-join over its
    exploded grams plus one groupBy(doc) — no corpus-vs-corpus shuffle.
    ``exclude_self=True`` ignores identity matches when the eval set is
    a slice of the corpus itself."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from ..functions.partitioning import spread

    def grams_of(d, idc, txt, out_id):
        toked = spread(d).select(F.col(idc).alias(out_id),
                                 tokens_col(txt).alias("_tk"))
        return (toked.select(out_id,
                             F.explode(token_ngrams_col("_tk", n))
                             .alias("gram")))

    corpus = grams_of(docs, id_col, text_col, "doc_id")
    ev = grams_of(eval_docs, eval_id_col, eval_text_col,
                  "eval_id").distinct()
    # r12: the broadcast side is pre-aggregated to ONE row per gram —
    # the former per-(gram, eval_id) side duplicated every corpus match
    # k-fold for a gram present in k eval docs, inflating the join
    # output and the count_distinct shuffle. exclude_self only needs
    # "does some eval doc OTHER than this one carry the gram", which
    # (#eval docs, one representative id) answers exactly: a match is
    # self-only iff the gram's eval count is 1 and that one id is the
    # corpus doc. NULL ids keep their pre-r12 three-valued-logic fate:
    # NULL eval ids contributed nothing (NULL != d is never true) and
    # are dropped up front; a NULL corpus doc_id never passed
    # `doc_id != eval_id` either, so it is filtered explicitly here.
    if exclude_self:
        evg = (ev.where(F.col("eval_id").isNotNull())
               .groupBy("gram")
               .agg(F.count(F.lit(1)).alias("_n_ev"),
                    F.min("eval_id").alias("_one_ev")))
        joined = (corpus.join(broadcast(evg), "gram")
                  .where(F.col("doc_id").isNotNull()
                         & ~((F.col("_n_ev") == 1)
                             & (F.col("_one_ev") == F.col("doc_id")))))
    else:
        joined = corpus.join(broadcast(ev.select("gram").distinct()),
                             "gram")
    return (joined.groupBy("doc_id")
            .agg(F.count_distinct("gram").alias("contam_hits")))


# Gopher-style quality-filter thresholds (Rae et al. 2021, table A1 —
# the standard web-corpus heuristics); each is a keyword so pipelines
# tune them per corpus
GOPHER_DEFAULTS = dict(
    min_words=50, max_words=100_000,
    min_avg_word_len=3.0, max_avg_word_len=10.0,
    max_symbol_word_ratio=0.1,          # '#' and '...' per word
    max_bullet_line_ratio=0.9,
    max_ellipsis_line_ratio=0.3,
    min_alpha_word_ratio=0.8,           # words containing >=1 alphabetic
    min_stopword_hits=2,                # distinct stopwords present
    max_dup_line_frac=0.30,             # repetition screens (Gopher A.1.1)
    max_dup_para_frac=0.30,
)

# Gopher repetition thresholds for the top word n-gram by character mass
TOP_NGRAM_DEFAULTS = {2: 0.20, 3: 0.18, 4: 0.16}


def quality_flags(docs, id_col: str = "doc_id", text_col: str = "text",
                  **overrides):
    """Gopher-rule quality screen: one row per doc with each rule's
    boolean verdict and the overall ``passes_quality`` conjunction — the
    classic pre-training corpus filter (keep ``passes_quality``).

    All-JVM single projection (token array materialized once, line array
    once; no UDF, no shuffle) — at 100 TB this is a map-only pass, and
    the flags compose with ``text_analysis``/``pii_scan`` in the same
    scan."""
    from pyspark.sql import functions as F

    from ..functions.partitioning import spread

    p = {**GOPHER_DEFAULTS, **overrides}
    base = spread(docs).select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_words"),
        F.split(F.col(text_col), r"\n").alias("_lines"),
        (F.length(F.col(text_col))
         - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit(""))))
        .alias("_n_hash"),
        F.size(F.split(F.col(text_col), r"\.\.\.", -1)).alias("_n_ell1"),
        F.split(F.col(text_col), r"\n\s*\n").alias("_paras"),
        tokens_col(text_col).alias("_toks"))
    words = F.col("_words")
    n_words = F.size(words)
    avg_len = (F.aggregate(words, F.lit(0),
                           lambda a, w: a + F.length(w)).cast("double")
               / F.greatest(n_words, F.lit(1)))
    n_sym = F.col("_n_hash") + (F.col("_n_ell1") - 1)
    lines = F.col("_lines")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_lines = F.size(F.filter(
        lines, lambda l: F.trim(l).startswith("-")
        | F.trim(l).startswith("*")))
    ellipsis_lines = F.size(F.filter(
        lines, lambda l: F.trim(l).endswith("...")))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    stop_hits = F.size(F.array_intersect(F.col("_toks"), stop_arr))
    # repetition screens (Gopher A.1.1): fraction of lines/paragraphs
    # that repeat an earlier one — still map-only (array_distinct over
    # the per-doc line/paragraph arrays; no shuffle). The n-gram
    # repetition rules need a per-gram aggregate and live in
    # repetition_flags (one keyed shuffle).
    nonempty = F.filter(lines, lambda l: F.trim(l) != "")
    n_ne = F.greatest(F.size(nonempty), F.lit(1))
    dup_line_frac = ((F.size(nonempty)
                      - F.size(F.array_distinct(nonempty))).cast("double")
                     / n_ne)
    paras = F.filter(F.col("_paras"), lambda q: F.trim(q) != "")
    n_paras = F.greatest(F.size(paras), F.lit(1))
    dup_para_frac = ((F.size(paras)
                      - F.size(F.array_distinct(paras))).cast("double")
                     / n_paras)

    flags = {
        "ok_word_count": (n_words >= p["min_words"])
        & (n_words <= p["max_words"]),
        "ok_avg_word_len": (avg_len >= p["min_avg_word_len"])
        & (avg_len <= p["max_avg_word_len"]),
        "ok_symbol_ratio": (n_sym.cast("double")
                            / F.greatest(n_words, F.lit(1)))
        <= p["max_symbol_word_ratio"],
        "ok_bullet_lines": (bullet_lines.cast("double") / n_lines)
        <= p["max_bullet_line_ratio"],
        "ok_ellipsis_lines": (ellipsis_lines.cast("double") / n_lines)
        <= p["max_ellipsis_line_ratio"],
        "ok_alpha_words": (alpha_words.cast("double")
                           / F.greatest(n_words, F.lit(1)))
        >= p["min_alpha_word_ratio"],
        "ok_stopwords": stop_hits >= p["min_stopword_hits"],
        "ok_dup_lines": dup_line_frac <= p["max_dup_line_frac"],
        "ok_dup_paras": dup_para_frac <= p["max_dup_para_frac"],
    }
    passes = None
    for c in flags.values():
        passes = c if passes is None else (passes & c)
    return base.select(
        F.col(id_col), n_words.alias("n_words"),
        *[c.alias(name) for name, c in flags.items()],
        passes.alias("passes_quality"))


def repetition_flags(docs, id_col: str = "doc_id", text_col: str = "text",
                     thresholds: dict = None):
    """Gopher n-gram repetition screens: per document and n in
    ``thresholds`` (default TOP_NGRAM_DEFAULTS = {2: 0.20, 3: 0.18,
    4: 0.16}), the fraction of token characters covered by the single
    most-repeated word n-gram; a doc fails when any fraction exceeds its
    threshold (boilerplate/template pages repeat one phrase massively).

    Unlike quality_flags (map-only), the top-gram statistic needs a
    per-(doc, gram) count — computed the scale-safe way in ONE corpus
    scan: a single projection tokenizes once and emits every size's
    grams as one (n, gram) struct array, ``explode_outer`` (so empty
    docs keep a row) feeds ONE keyed aggregation (map-side combine
    collapses each doc-partition's repeats first), then per-doc maxima.
    Shuffle volume is O(distinct grams), never O(docs^2); downstream
    aggregates and the final width-pivot work on O(docs × sizes) rows.
    The screened statistic is the character mass of the single MOST
    FREQUENT n-gram (Gopher's definition; count ties broken by char
    mass, then lexicographically, so results are deterministic). A gram
    occurring once contributes 0 (a singleton n-gram is not repetition)
    and overlap-overcounting caps the fraction at 1.0."""
    from pyspark.sql import functions as F

    th = dict(thresholds or TOP_NGRAM_DEFAULTS)
    sizes = sorted(th)
    base = _tokenized(docs, id_col, text_col)
    tot = F.greatest(
        F.aggregate(F.col("_toks"), F.lit(0),
                    lambda a, t: a + F.length(t)), F.lit(1))
    def _tagged_grams(n):
        # NB: a 2-arg lambda would make transform() pass the ARRAY INDEX
        # as the second argument (PySpark arity dispatch), clobbering n
        return F.transform(token_ngrams_col("_toks", n),
                           lambda g: F.struct(F.lit(n).alias("n"),
                                              g.alias("g")))

    gram_structs = F.concat(*[_tagged_grams(n) for n in sizes])
    rows = base.select(F.col(id_col), tot.alias("_tot"),
                       F.explode_outer(gram_structs).alias("_gs"))
    counts = (rows.groupBy(id_col, F.col("_gs.n").alias("_n"),
                           F.col("_gs.g").alias("_gram"))
              .agg(F.count("*").alias("_c"),
                   F.first("_tot").alias("_tot")))
    # Gopher's statistic is the char mass of the MOST FREQUENT gram (not
    # the gram with the largest mass): max_by on (count, chars, gram) —
    # the chars/gram components only break count ties deterministically.
    # One conditional max_by per size collapses straight to the wide
    # per-doc frame: no pivot, no second totals aggregation, no join.
    chars = F.length(F.col("_gram")) - (F.col("_n") - 1)
    mass = F.when(F.col("_c") >= 2, F.col("_c") * chars).otherwise(0)
    ordkey = F.struct(F.col("_c").alias("c"), chars.alias("len"),
                      F.col("_gram").alias("g"))
    out = counts.groupBy(id_col).agg(
        F.first("_tot").alias("_tot"),
        *[F.max_by(F.when(F.col("_n") == n, mass),
                   F.when(F.col("_n") == n, ordkey)).alias(str(n))
          for n in sizes])
    cols = [F.col(id_col)]
    passes = None
    for n in sizes:
        frac = F.least(
            F.coalesce(F.col(str(n)), F.lit(0)).cast("double")
            / F.col("_tot"), F.lit(1.0))
        cols.append(F.round(frac, 4).alias(f"top{n}gram_char_frac"))
        ok = frac <= th[n]
        cols.append(ok.alias(f"ok_top{n}gram"))
        passes = ok if passes is None else (passes & ok)
    cols.append(passes.alias("passes_repetition"))
    return out.select(*cols)
