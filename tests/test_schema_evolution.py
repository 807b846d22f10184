"""Schema evolution under the WHOLE mutable surface.

Round-6 continuation findings, pinned:

1. Time-travel reads presented the LATEST schema instead of the schema
   AS OF the requested version (``_df_for_files`` took ``self.schema()``
   even when handed a versioned snapshot) — a pre-evolution version
   showed later-added columns as all-null phantoms. Delta parity: the
   versioned read carries the versioned schema
   (/root/reference/docs/AdvancedConfiguration.md documents plain Delta
   time travel over qbeast tables, which behaves this way).
2. The pyds twin: ``option("versionAsOf")`` / ``option("timestampAsOf")``
   resolved the file list as-of but ``schema()`` always loaded the
   latest snapshot.
3. ``table_changes`` unioned per-commit frames with strict
   ``unionByName`` — a change file written BEFORE an evolution (fewer
   columns) broke the union; now null-filled and projected to the
   end-of-range schema (Delta CDF schema-on-read).

Plus a model fuzz interleaving evolution with every other verb —
the one composition the main model fuzzer never drew.
"""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from conftest import load


def _mk(spark, tmp_table, pdf, n=700, cube=300):
    import qbeast_spark_spark as qss

    qss.write(spark.createDataFrame(pdf.iloc[:n]), tmp_table,
              columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=cube)
    return qss.QbeastTable.for_path(spark, tmp_table)


@pytest.fixture()
def lineitem_pdf(spark):
    return load(spark, "lineitem").limit(1500).toPandas()


def test_time_travel_shows_as_of_schema(spark, tmp_table, lineitem_pdf):
    """A pre-evolution version must not show later-added columns —
    native to_df(version=), to_df(timestamp=), and the pyds
    versionAsOf / timestampAsOf twins. Fails against the pre-fix
    reader (latest-schema _df_for_files) on every lane."""
    import qbeast_spark_spark as qss
    from qbeast_spark_spark.sources.pyds import register

    register(spark)
    pdf = lineitem_pdf
    qt = _mk(spark, tmp_table, pdf)
    pre_v = qt.snapshot(refresh=True).version

    qss.write(spark.createDataFrame(pdf.iloc[700:1100]).withColumn(
        "extra_i", (F.col("l_orderkey") % 7).cast("int")), tmp_table,
        columns_to_index=["l_orderkey", "l_extendedprice"],
        cube_size=300, merge_schema=True)
    qt = qss.QbeastTable.for_path(spark, tmp_table)

    cur = qt.to_df()
    assert "extra_i" in cur.columns and cur.count() == 1100

    old = qt.to_df(version=pre_v)
    assert "extra_i" not in old.columns
    assert old.count() == 700

    hist = qt.history()
    ts_ms = [h for h in hist if h["version"] == pre_v][0]["timestamp"]
    old_ts = qt.to_df(timestamp=ts_ms)
    assert "extra_i" not in old_ts.columns and old_ts.count() == 700

    dfp = (spark.read.format("qbeast")
           .option("versionAsOf", pre_v).load(tmp_table))
    assert "extra_i" not in dfp.columns and dfp.count() == 700
    dfl = spark.read.format("qbeast").load(tmp_table)
    assert "extra_i" in dfl.columns and dfl.count() == 1100
    dpt = (spark.read.format("qbeast")
           .option("timestampAsOf", str(ts_ms)).load(tmp_table))
    assert "extra_i" not in dpt.columns and dpt.count() == 700


def test_cdf_spans_schema_evolution(spark, tmp_table, lineitem_pdf):
    """A CDF range holding a PRE-evolution change file (old schema) and
    post-evolution commits must decode: null-filled union, end-of-range
    schema, and the pyds readChangeFeed lane row-for-row equal."""
    import qbeast_spark_spark as qss
    from qbeast_spark_spark.sources.pyds import register

    register(spark)
    pdf = lineitem_pdf
    qt = _mk(spark, tmp_table, pdf)
    qt.enable_change_data_feed()
    # pre-evolution DML -> change file WITHOUT extra_i
    qss.update_rows(spark, tmp_table,
                    {"l_extendedprice": "l_extendedprice + 1.0"},
                    [("l_orderkey", ">=", 0), ("l_orderkey", "<", 400)])
    pre_v = qss.QbeastTable.for_path(spark, tmp_table).snapshot().version
    qss.write(spark.createDataFrame(pdf.iloc[700:1100]).withColumn(
        "extra_i", (F.col("l_orderkey") % 7).cast("int")), tmp_table,
        columns_to_index=["l_orderkey", "l_extendedprice"],
        cube_size=300, merge_schema=True)
    # post-evolution DML -> change file WITH extra_i
    qss.delete_rows(spark, tmp_table,
                    [("l_orderkey", ">=", 500), ("l_orderkey", "<", 900)],
                    mode="rewrite")
    qt = qss.QbeastTable.for_path(spark, tmp_table)

    ch = qt.table_changes(0)
    assert ch.columns[-4:] == ["extra_i", "_change_type",
                               "_commit_version", "_commit_timestamp"]
    pre = ch.where(F.col("_commit_version") <= pre_v)
    assert pre.count() > 0
    assert pre.where(F.col("extra_i").isNotNull()).count() == 0

    chp = (spark.read.format("qbeast").option("readChangeFeed", "true")
           .option("startingVersion", 0).load(tmp_table))
    assert chp.count() == ch.count()

    # gold invariant: multiset replay of the feed == the current table,
    # extra_i included (pre-evolution rows null)
    from collections import Counter

    cols = ["l_orderkey", "l_linenumber", "l_extendedprice", "extra_i"]
    state: Counter = Counter()
    for r in ch.select(*cols, "_change_type").toPandas().itertuples(
            index=False):
        row = (r.l_orderkey, r.l_linenumber, r.l_extendedprice,
               None if pd.isna(r.extra_i) else int(r.extra_i))
        if r._4 in ("insert", "update_postimage"):
            state[row] += 1
        else:
            state[row] -= 1
    got = qt.to_df().select(*cols).toPandas()
    have = Counter(
        (r.l_orderkey, r.l_linenumber, r.l_extendedprice,
         None if pd.isna(r.extra_i) else int(r.extra_i))
        for r in got.itertuples(index=False))
    assert not [r for r, c in state.items() if c < 0]
    assert +state == have


def _norm_extra(series):
    return [None if pd.isna(v) else int(v) for v in series]


def _table_tuples(df_pdf, has_extra):
    if has_extra:
        return sorted(zip(df_pdf.l_orderkey, df_pdf.l_linenumber,
                          df_pdf.l_extendedprice,
                          _norm_extra(df_pdf.extra_i)))
    return sorted(zip(df_pdf.l_orderkey, df_pdf.l_linenumber,
                      df_pdf.l_extendedprice))


@pytest.mark.parametrize("seed", [5, 20260815])
def test_schema_evolution_model_fuzz(spark, tmp_table, seed):
    """Model fuzz with EVOLUTION in the op mix: evolve mid-history, then
    old-schema appends, deletes (rewrite+dv), updates touching the new
    column, merges assigning it from the source, compact/optimize,
    restore ACROSS the evolution boundary (schema must roll back), and a
    final time-travel sweep asserting rows AND schema per version."""
    import qbeast_spark_spark as qss

    pdf_all = load(spark, "lineitem").limit(3000).toPandas()
    rng = random.Random(seed)

    init = pdf_all.iloc[:1000]
    rest = pdf_all.iloc[1000:]
    qss.write(spark.createDataFrame(init), tmp_table,
              columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=400)
    model = init.copy()
    evolved = False
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    versions = {qt.snapshot().version: (False, model.copy())}
    appended = 0

    def check(step):
        qt = qss.QbeastTable.for_path(spark, tmp_table)
        df = qt.to_df()
        assert ("extra_i" in df.columns) == evolved, f"{step}: schema"
        cols = ["l_orderkey", "l_linenumber", "l_extendedprice"] + (
            ["extra_i"] if evolved else [])
        got = _table_tuples(df.select(*cols).toPandas(), evolved)
        if evolved and "extra_i" not in model.columns:
            model["extra_i"] = pd.NA
        want = _table_tuples(model, evolved)
        assert len(got) == len(want), \
            f"{step}: {len(got)} vs model {len(want)}"
        assert got == want, f"{step}: content diverged (seed {seed})"
        return qt

    for step_no in range(12):
        op = rng.choice(["evolve", "append_old", "delete_rw", "delete_dv",
                         "update_extra", "merge_extra", "compact",
                         "optimize", "restore"])
        if op == "evolve" and appended < len(rest):
            chunk = rest.iloc[appended:appended + 300].copy()
            appended += 300
            chunk["extra_i"] = (chunk.l_orderkey % 7).astype("int32")
            sdf = spark.createDataFrame(chunk).withColumn(
                "extra_i", F.col("extra_i").cast("int"))
            qss.write(sdf, tmp_table,
                      columns_to_index=["l_orderkey", "l_extendedprice"],
                      cube_size=400, merge_schema=True)
            if not evolved:
                model = model.copy()
                model["extra_i"] = pd.NA
                evolved = True
            model = pd.concat([model, chunk], ignore_index=True)
        elif op == "append_old" and appended < len(rest):
            chunk = rest.iloc[appended:appended + 300]
            appended += 300
            qss.write(spark.createDataFrame(chunk), tmp_table,
                      columns_to_index=["l_orderkey", "l_extendedprice"],
                      cube_size=400, merge_schema=evolved)
            chunk = chunk.copy()
            if evolved:
                chunk["extra_i"] = pd.NA
            model = pd.concat([model, chunk], ignore_index=True)
        elif op in ("delete_rw", "delete_dv"):
            lo = rng.randrange(0, 50000)
            hi = lo + rng.randrange(500, 5000)
            qss.delete_rows(spark, tmp_table,
                            [("l_orderkey", ">=", lo),
                             ("l_orderkey", "<", hi)],
                            mode="rewrite" if op == "delete_rw" else "dv")
            model = model[~((model.l_orderkey >= lo)
                            & (model.l_orderkey < hi))]
        elif op == "update_extra" and evolved:
            lo = rng.randrange(0, 40000)
            qss.update_rows(
                spark, tmp_table,
                {"extra_i": "CAST(coalesce(extra_i, 0) + 100 AS INT)"},
                [("l_orderkey", ">=", lo), ("l_orderkey", "<", lo + 3000)])
            m = (model.l_orderkey >= lo) & (model.l_orderkey < lo + 3000)
            model = model.copy()
            model.loc[m, "extra_i"] = [
                (0 if pd.isna(v) else int(v)) + 100
                for v in model.loc[m, "extra_i"]]
        elif op == "merge_extra" and evolved and len(model):
            pairs = (model[["l_orderkey", "l_linenumber"]]
                     .drop_duplicates().sample(
                         n=min(30, len(model)),
                         random_state=rng.randrange(1 << 30)))
            src = spark.createDataFrame(pairs).withColumn(
                "bump", F.lit(7).cast("int"))
            qss.merge_rows(
                spark, tmp_table, src,
                on=["l_orderkey", "l_linenumber"],
                when_matched_update={
                    "extra_i":
                        "CAST(coalesce(extra_i, 0) + __src_bump AS INT)"})
            key = set(map(tuple, pairs.itertuples(index=False)))
            m = [(r.l_orderkey, r.l_linenumber) in key
                 for r in model[["l_orderkey", "l_linenumber"]]
                 .itertuples(index=False)]
            model = model.copy()
            model.loc[m, "extra_i"] = [
                (0 if pd.isna(v) else int(v)) + 7
                for v in model.loc[m, "extra_i"]]
        elif op == "compact":
            qss.compact_table(spark, tmp_table)
        elif op == "optimize":
            qss.optimize_table(spark, tmp_table, fraction=1.0)
        elif op == "restore" and len(versions) > 1:
            qt = qss.QbeastTable.for_path(spark, tmp_table)
            target = rng.choice(sorted(versions)[:-1])
            qt.restore(target)
            evolved, model = versions[target]
            model = model.copy()
        qt = check(f"step {step_no}:{op}")
        versions[qt.snapshot().version] = (evolved, model.copy())

    # time-travel sweep: rows AND schema per version
    qt = qss.QbeastTable.for_path(spark, tmp_table)
    for v in sorted(versions):
        had_extra, snap_model = versions[v]
        df = qt.to_df(version=v)
        assert ("extra_i" in df.columns) == had_extra, \
            f"v{v}: time-travel schema (seed {seed})"
        cols = ["l_orderkey", "l_linenumber", "l_extendedprice"] + (
            ["extra_i"] if had_extra else [])
        got = _table_tuples(df.select(*cols).toPandas(), had_extra)
        sm = snap_model.copy()
        if had_extra and "extra_i" not in sm.columns:
            sm["extra_i"] = pd.NA
        want = _table_tuples(sm, had_extra)
        assert got == want, f"v{v}: time travel diverged (seed {seed})"
