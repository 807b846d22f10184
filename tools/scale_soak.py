"""Scale soak: execute the write path + the most expensive registered
queries at sf0.1 AND at locally synthesized sf1 (10x) / sf10 (100x,
``--sf10``) datasets, and record how wall time, shuffle volume, and
driver memory actually scale — the empirical backstop for the repo's
100 TB plan-shape claims (VERDICT r4 Next #4: "the 100 TB claims are
plan-shape-verified but have never been executed above 600 MB").

sf1 synthesis (deterministic, schema-identical to the testdata):

- ``lineitem`` / ``orders`` / ``customer``: 10 copies, all join keys
  (orderkey, custkey) offset per copy so cardinalities scale 10x while
  key relationships are preserved; dimension tables (part, supplier,
  nation, region) stay 1x, exactly like TPC-H scaling.
- ``documents``: 10 copies with doc_id offsets; every word in a copy's
  text gets a copy-specific suffix, so shingle sets are DISJOINT
  across copies while each copy's shingle frequency distribution stays
  isomorphic to the original: the corpus behaves like 10 independent
  sf0.1 corpora (duplicate structure scales linearly, the honest shape
  for a dedup soak — naive concatenation would give every doc 10 exact
  twins and blow candidate pairs up quadratically instead).
- ``embeddings``: 10 copies with vec_id offsets (vectors unchanged).

Metrics per (query, sf): wall seconds, sum/max of per-stage shuffle
write bytes and peak task counts (Spark UI REST API), driver JVM heap
used and Python driver RSS after the run. Ratios are always computed
against sf0.1, so linear = 10x for the sf1 leg and 100x for the sf10
leg. The soak PASSES when no query's shuffle volume or wall time
grows superlinearly (> ~1.3x the leg's linear factor; one-time
broadcast->sort-merge-join plan transitions are the allowed
exception, recognizable because later legs return to exactly-linear
growth past the switch) and driver memory stays bounded (O(#cubes),
not O(rows)).

Usage: python tools/scale_soak.py [--rebuild] [--sf10]
Writes soak_results.json; SCALE.md summarizes.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SRC = "/root/testdata/sf0.1"
SCALE_ROOT = "/tmp/qss_scale"

# the heaviest BENCH_r04 entries that aren't pure index-build timings,
# plus one big join+agg shape
SOAK_QUERIES = ["qb_dml", "dedup_canonical", "dedup_ngram_jaccard",
                "sim_topk", "q18_large_volume"]
COPIES = 10


def _write_single(df, dest: str) -> None:
    """One parquet FILE (not a directory) — the testdata layout the
    query registry's footer-based row counts expect."""
    import glob

    tmp = dest + "._dir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, dest)
    shutil.rmtree(tmp)


def build_scaled(spark, dst: str, copies: int) -> None:
    from pyspark.sql import functions as F

    DST = dst
    os.makedirs(DST, exist_ok=True)
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    base_ok = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    base_ck = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    base_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    base_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1

    def offset_union(df, cols_offsets, extra=None):
        parts = []
        for i in range(copies):
            d = df
            for c, base in cols_offsets:
                d = d.withColumn(c, F.col(c) + F.lit(i * base))
            if extra is not None:
                d = extra(d, i)
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    _write_single(offset_union(li, [("l_orderkey", base_ok)]), f"{DST}/lineitem.parquet")
    _write_single(offset_union(orders, [("o_orderkey", base_ok),
                          ("o_custkey", base_ck)]), f"{DST}/orders.parquet")
    _write_single(offset_union(cust, [("c_custkey", base_ck)]), f"{DST}/customer.parquet")

    def salt_text(d, i):
        # copy 0 keeps the original corpus; later copies SUFFIX every
        # word with a copy tag: the per-copy shingle frequency
        # distribution is isomorphic to the original (each distinct
        # word maps to a distinct salted word, token count unchanged)
        # while cross-copy shingle sets are disjoint. (Interleaving a
        # copy token BETWEEN words — the first attempt — manufactured
        # degenerate `cpN <word> cpN` shingles whose frequency matched
        # single words, and the shingle self-join exploded ~100x: a
        # synthetic-data artifact, not an engine behavior.)
        if i == 0:
            return d
        return d.withColumn(
            "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1q{i}"))

    _write_single(offset_union(docs, [("doc_id", base_doc)], extra=salt_text), f"{DST}/documents.parquet")
    _write_single(offset_union(emb, [("vec_id", base_vec)]), f"{DST}/embeddings.parquet")
    for t in ["part", "supplier", "nation", "region", "events"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")


# -- Spark UI REST helpers ---------------------------------------------------

def _api(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}",
                                timeout=10) as r:
        return json.load(r)


def stage_metrics(spark, since_stage: int) -> dict:
    stages = [s for s in _api(spark, "/stages?status=complete")
              if s["stageId"] > since_stage]
    sw = [s.get("shuffleWriteBytes", 0) for s in stages]
    sr = [s.get("shuffleReadBytes", 0) for s in stages]
    return {
        "n_stages": len(stages),
        "shuffle_write_mb": round(sum(sw) / 1e6, 1),
        "max_stage_shuffle_write_mb": round(max(sw, default=0) / 1e6, 1),
        "shuffle_read_mb": round(sum(sr) / 1e6, 1),
        "input_mb": round(sum(s.get("inputBytes", 0)
                              for s in stages) / 1e6, 1),
        "max_stage_tasks": max((s.get("numCompleteTasks", 0)
                                for s in stages), default=0),
    }


def _last_stage_id(spark) -> int:
    done = _api(spark, "/stages")
    return max((s["stageId"] for s in done), default=-1)


def driver_memory(spark) -> dict:
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    # without a GC the "used" number is dominated by collectible garbage
    # from the query that just ran
    spark._jvm.System.gc()
    time.sleep(0.5)
    # CURRENT RSS, not ru_maxrss: the lifetime peak would echo whatever
    # earlier phase was largest and hide a per-query driver regression
    rss_kb = 0
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                rss_kb = int(line.split()[1])
                break
    return {
        "jvm_heap_used_mb": round(
            (rt.totalMemory() - rt.freeMemory()) / 1e6),
        "py_rss_mb": round(rss_kb / 1024),
    }


def run_soak(spark, sf_dir: str) -> dict:
    import gc

    import qbeast_spark_spark as qss
    from qbeast_spark_spark.queries import QUERIES, _indexed_lineitem

    out = {}
    # the write path: index the full lineitem for this sf_dir (fresh)
    tag = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    shutil.rmtree(f"/tmp/qss_tables/{tag}", ignore_errors=True)
    mark = _last_stage_id(spark)
    t0 = time.time()
    path = _indexed_lineitem(spark, sf_dir)
    qt = qss.QbeastTable.for_path(spark, path)
    n_cubes = sum(len(w) for w in
                  qt.snapshot().cube_weights.values()) \
        if hasattr(qt.snapshot(), "cube_weights") else None
    out["qb_write"] = {"sec": round(time.time() - t0, 2),
                       **stage_metrics(spark, mark),
                       **driver_memory(spark)}
    if n_cubes is not None:
        out["qb_write"]["n_cubes"] = n_cubes
    for name in SOAK_QUERIES:
        fn, _sql = QUERIES[name]
        spark.catalog.clearCache()
        gc.collect()
        mark = _last_stage_id(spark)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = {"sec": round(time.time() - t0, 2),
                     **stage_metrics(spark, mark),
                     **driver_memory(spark)}
    return out


def main():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "true")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    # --sf10 adds a 100x leg (second decade of scaling evidence)
    legs = [("sf1", f"{SCALE_ROOT}/sf1", COPIES)]
    if "--sf10" in sys.argv:
        legs.append(("sf10", f"{SCALE_ROOT}/sf10", COPIES * 10))
    for label, dst, copies in legs:
        if "--rebuild" in sys.argv or not os.path.exists(
                f"{dst}/embeddings.parquet"):
            print(f"building {label} ({copies}x) ...", flush=True)
            t0 = time.time()
            build_scaled(spark, dst, copies)
            print(f"built in {time.time() - t0:.0f}s", flush=True)
    results = {}
    for label, sf_dir in [("sf0.1", SRC)] + [(l, d) for l, d, _ in legs]:
        print(f"== soak {label}", flush=True)
        results[label] = run_soak(spark, sf_dir)
        print(json.dumps(results[label], indent=1), flush=True)
    ratios = {}
    base = results["sf0.1"]
    for label, _d, _c in legs:
        for q in results[label]:
            a, b = base[q], results[label][q]
            ratios.setdefault(label, {})[q] = {
                "sec": round(b["sec"] / max(a["sec"], 1e-9), 1),
                "shuffle_write": round(
                    b["shuffle_write_mb"]
                    / max(a["shuffle_write_mb"], 1e-9), 1),
                "jvm_heap": round(
                    b["jvm_heap_used_mb"]
                    / max(a["jvm_heap_used_mb"], 1), 1),
            }
    print(json.dumps({"ratios": ratios}, indent=1))
    path = os.path.join(HERE, "soak_results.json")
    with open(path, "w") as fh:
        json.dump({"results": results, "ratios": ratios,
                   "copies": {l: c for l, _d, c in legs}}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
