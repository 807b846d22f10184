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

``--stream`` (r6, VERDICT r5 Next #3) runs the STREAMING-lane soak
instead: stream_dedup_ingest over 24 micro-batches of the synthesized
sf1 documents corpus (~10x the bench corpus, one batch per source
file via maxFilesPerTrigger=1), twice — one straight run, one with a
hard stop at batch 12 and a restart on the same checkpoint (the
in-flight batch replays). Asserts exactly-once equivalence (both
lanes' final table row count + content checksum + signature-store doc
count identical) and records the per-batch wall/shuffle trend, which
must stay FLAT as the store grows (the band join reads matching store
slices, never the whole corpus). Writes stream_soak_results.json.
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


# -- streaming-lane soak (r6) ------------------------------------------------

def _build_stream_source(spark, sf_dir: str, src: str, n_batches: int):
    """Split the corpus into n_batches single-file chunks (deterministic
    by doc_id) so maxFilesPerTrigger=1 makes each chunk one micro-batch."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    os.makedirs(src, exist_ok=True)
    for b in range(n_batches):
        _write_single(docs.where(F.pmod(F.col("doc_id"),
                                        F.lit(n_batches)) == b),
                      f"{src}/b{b:03d}.parquet")
    return docs.schema


def _stream_lane(spark, root: str, src: str, schema, tag: str,
                 kill_after: int | None) -> dict:
    """One ingest lane: all batches from ``src`` into a fresh table +
    signature store. ``kill_after`` hard-stops the query once that batch
    id has COMMITTED and restarts on the same checkpoint — the next
    batch was usually mid-flight, so the restart replays it. Polls
    lastProgress at 0.2s to attribute per-batch wall (durationMs) and a
    stage-id window (per-batch shuffle) — batches run sequentially, so
    the windows are sound."""
    from qbeast_spark_spark.streaming.ingest import stream_dedup_ingest

    table = f"{root}/tbl_{tag}"
    sig = f"{root}/sigs_{tag}"
    ckpt = f"{root}/ckpt_{tag}"
    for p in (table, sig, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    batches: dict[int, dict] = {}
    stage_marks: dict[int, int] = {}

    def start():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        return stream_dedup_ingest(
            stream, table, sig, columns_to_index=["doc_id"],
            cube_size=100_000, checkpoint=ckpt,
            trigger_available_now=True, query_name=f"soak-{tag}")

    def pump(q, stop_at=None):
        # drain recentProgress (buffers every batch update) instead of
        # sampling lastProgress: a batch finishing between polls would
        # otherwise lose its entry and fold its stage window into a
        # neighbor's (r6 review). Stage marks are still taken at
        # observation time, so when two batches complete within one
        # poll the earlier one's shuffle window absorbs the later's —
        # wall_ms (from the progress event itself) is always exact.
        last = -1

        def record(lp):
            nonlocal last
            bid = lp["batchId"]
            if bid <= last:
                return False
            last = bid
            stage_marks[bid + 1] = _last_stage_id(spark)
            batches[bid] = {
                "wall_ms": lp["durationMs"].get("triggerExecution"),
                "rows_in": lp.get("numInputRows"),
            }
            return True

        while q.isActive:
            for lp in q.recentProgress:
                if record(lp) and stop_at is not None and last >= stop_at:
                    q.stop()
                    break
            time.sleep(0.2)
        q.awaitTermination(120)
        for lp in q.recentProgress:      # anything after the last poll
            record(lp)

    stage_marks[0] = _last_stage_id(spark)
    t0 = time.time()
    q = start()
    if kill_after is not None:
        pump(q, stop_at=kill_after)
        q2 = start()
        pump(q2)
    else:
        pump(q)
    wall = round(time.time() - t0, 1)

    # per-batch shuffle from the stage-id windows
    all_stages = {s["stageId"]: s
                  for s in _api(spark, "/stages?status=complete")}
    bids = sorted(batches)
    for i, bid in enumerate(bids):
        lo = stage_marks.get(bid, -1)
        hi = stage_marks.get(bid + 1, 10 ** 9)
        sw = sum(s.get("shuffleWriteBytes", 0)
                 for sid, s in all_stages.items() if lo < sid <= hi)
        batches[bid]["shuffle_write_mb"] = round(sw / 1e6, 1)

    import qbeast_spark_spark as qss
    from pyspark.sql import functions as F

    final = qss.QbeastTable.for_path(spark, table).to_df()
    chk = final.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(F.col("doc_id").cast("string"),
                                F.col("text")), F.lit(2 ** 31))).alias("h")
    ).collect()[0]
    sig_docs = spark.read.parquet(sig).select("doc_id").distinct().count()
    return {"wall_sec": wall, "table_rows": chk["n"],
            "table_checksum": int(chk["h"]), "sig_store_docs": sig_docs,
            "batches": {str(b): batches[b] for b in bids},
            **driver_memory(spark)}


def run_stream_soak(spark, sf_dir: str, n_batches: int = 24,
                    kill_after: int = 12) -> dict:
    root = f"{SCALE_ROOT}/stream_soak"
    src = f"{root}/src"
    shutil.rmtree(root, ignore_errors=True)
    schema = _build_stream_source(spark, sf_dir, src, n_batches)
    print("== stream lane: straight", flush=True)
    straight = _stream_lane(spark, root, src, schema, "straight", None)
    print(json.dumps(straight, indent=1), flush=True)
    print(f"== stream lane: kill@{kill_after}+restart", flush=True)
    killed = _stream_lane(spark, root, src, schema, "killed", kill_after)
    print(json.dumps(killed, indent=1), flush=True)

    # exactly-once equivalence: a mid-run kill/restart must leave the
    # SAME table contents and signature store as the straight run
    eo_ok = (straight["table_rows"] == killed["table_rows"]
             and straight["table_checksum"] == killed["table_checksum"]
             and straight["sig_store_docs"] == killed["sig_store_docs"])

    # flatness: steady-state tail vs head medians (skip warmup batch 0-1)
    import statistics as _st

    def _trend(lane):
        walls = [v["wall_ms"] for k, v in sorted(
            lane["batches"].items(), key=lambda kv: int(kv[0]))
            if v.get("wall_ms")]
        if len(walls) < 10:
            return None
        head = _st.median(walls[2:2 + len(walls) // 3])
        tail = _st.median(walls[-len(walls) // 3:])
        return {"head_ms": round(head), "tail_ms": round(tail),
                "tail_over_head": round(tail / head, 2)}

    out = {"n_batches": n_batches, "kill_after": kill_after,
           "straight": straight, "killed": killed,
           "exactly_once_equivalent": eo_ok,
           "trend": {"straight": _trend(straight),
                     "killed": _trend(killed)}}
    path = os.path.join(HERE, "stream_soak_results.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"exactly_once_equivalent": eo_ok,
                      "trend": out["trend"]}, indent=1), flush=True)
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
    if "--stream" in sys.argv:
        # streaming-lane soak over the synthesized sf1 corpus (10x)
        dst = f"{SCALE_ROOT}/sf1"
        if "--rebuild" in sys.argv or not os.path.exists(
                f"{dst}/embeddings.parquet"):
            print(f"building sf1 ({COPIES}x) ...", flush=True)
            build_scaled(spark, dst, COPIES)
        run_stream_soak(spark, dst)
        spark.stop()
        return
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
