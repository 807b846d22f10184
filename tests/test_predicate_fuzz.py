"""Soundness fuzz for the SQL-WHERE pruning path: random predicate trees
(AND/OR/NOT over ranges, equality, BETWEEN, IN, IS NULL) must read
EXACTLY the rows plain Spark reads — pruning may widen the file set but
never change the answer. Exercises the De Morgan negation pushdown on
shapes no hand-written test would think of."""

import random

import pytest
from pyspark.sql import functions as F

from conftest import load

COLS = [("l_orderkey", [0, 17, 300, 1500, 3000, 60000]),
        ("l_extendedprice", [900.0, 20000.5, 55000.0, 104949.5])]


def _leaf(rng):
    col, vals = rng.choice(COLS)
    v = rng.choice(vals)
    kind = rng.randrange(6)
    if kind == 0:
        return f"{col} {rng.choice(['<', '<=', '>', '>=' ])} {v}"
    if kind == 1:
        return f"{col} = {v}"
    if kind == 2:
        return f"{col} != {v}"
    if kind == 3:
        lo, hi = sorted(rng.sample(vals, 2))
        return f"{col} BETWEEN {lo} AND {hi}"
    if kind == 4:
        picks = rng.sample(vals, min(3, len(vals)))
        return f"{col} IN ({', '.join(str(p) for p in picks)})"
    return f"{col} IS {'NOT ' if rng.random() < 0.5 else ''}NULL"


def _tree(rng, depth):
    if depth == 0 or rng.random() < 0.35:
        node = _leaf(rng)
    else:
        op = rng.choice([" AND ", " OR "])
        node = "(" + op.join(_tree(rng, depth - 1)
                             for _ in range(rng.randrange(2, 4))) + ")"
    if rng.random() < 0.3:
        node = f"NOT {node}"
    return node


@pytest.fixture(scope="module")
def fuzz_table(spark, tmp_path_factory):
    import qbeast_spark_spark as qss

    li = load(spark, "lineitem")
    path = str(tmp_path_factory.mktemp("fuzz") / "t")
    qss.write(li, path, columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=300)
    return path, li


def test_random_predicates_read_exactly(spark, fuzz_table):
    import qbeast_spark_spark as qss

    path, li = fuzz_table
    qt = qss.QbeastTable.for_path(spark, path)
    rng = random.Random(20260813)
    checked = 0
    for _ in range(40):
        q = _tree(rng, 2)
        expect = li.where(q).count()
        got = qt.read(q).count()
        assert got == expect, q
        checked += 1
    assert checked == 40


def test_random_predicates_through_data_source(spark, fuzz_table):
    """Soundness through format('qbeast') under DataFrame REUSE — the
    shape that exposed Spark 4.1's stale readInfo cache (a filtered
    query's partition plan being served to later queries): every random
    tree on the SAME df must equal plain Spark."""
    from qbeast_spark_spark.sources.pyds import register

    register(spark)
    path, li = fuzz_table
    df = spark.read.format("qbeast").load(path)
    rng = random.Random(20260814)
    for _ in range(15):
        q = _tree(rng, 2)
        assert df.where(q).count() == li.where(q).count(), q


def test_random_predicates_with_where_option_pruning(spark, fuzz_table):
    """option('where') pruning + the same .where() residual must read
    exactly plain Spark's rows for every random tree (pruning is
    best-effort and widening — never under-selects)."""
    from qbeast_spark_spark.sources.pyds import register

    register(spark)
    path, li = fuzz_table
    rng = random.Random(20260815)
    for _ in range(15):
        q = _tree(rng, 2)
        got = (spark.read.format("qbeast").option("where", q).load(path)
               .where(q).count())
        assert got == li.where(q).count(), q
