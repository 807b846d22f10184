"""r11 optimization: connected_components' driver-side union-find fast
path (small edge lists) must be result-identical to the distributed
min-label loop — both orders of magnitude of input and both id types."""

import random

from qbeast_spark_spark.operators.dedup import connected_components


def _labels(pairs_df, **kw):
    return {r["node"]: r["canonical"]
            for r in connected_components(pairs_df, **kw).collect()}


def test_driver_fastpath_matches_distributed_long_ids(spark):
    random.seed(7)
    # random forest of chains + stars + isolated pairs
    edges = [(2, 1), (3, 2), (4, 3), (10, 11), (20, 21), (21, 22),
             (20, 23), (100, 4)]
    edges += [(1000 + i, 1000 + random.randrange(i)) for i in range(1, 60)]
    pairs = spark.createDataFrame(
        [(max(a, b), min(a, b)) for a, b in edges], ["id1", "id2"])
    fast = _labels(pairs)                       # default: driver fast path
    dist = _labels(pairs, driver_max_edges=0)   # force the iterative loop
    assert fast == dist
    # spot-invariants: canonical is the min of the component
    assert fast[4] == 1 and fast[100] == 1 and fast[23] == 20


def test_driver_fastpath_matches_distributed_string_ids(spark):
    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-c", "doc-b"), ("doc-x", "doc-y"),
         ("doc-Z", "doc-c")],                   # mixed case: binary order
        ["id1", "id2"])
    fast = _labels(pairs)
    dist = _labels(pairs, driver_max_edges=0)
    assert fast == dist
    # 'Z' < 'a' in UTF8 binary order — both paths must agree on that
    assert fast["doc-c"] == "doc-Z"


def test_threshold_boundary_routes_to_distributed(spark):
    # 3 pairs -> 6 directed edges; a cap of 5 must take the loop and
    # still produce the same labels
    pairs = spark.createDataFrame([(2, 1), (3, 2), (5, 4)], ["id1", "id2"])
    assert _labels(pairs, driver_max_edges=5) == \
        _labels(pairs, driver_max_edges=100)


def test_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id1 long, id2 long")
    assert _labels(pairs) == {}
