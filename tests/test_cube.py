"""Core geometry unit tests — ports of the reference's CubeIdTest invariants
(/root/reference/core/src/test/scala/io/qbeast/core/model/CubeIdTest.scala)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from qbeast_spark_spark.core.cube import CubeId, max_depth_for_dims
from qbeast_spark_spark.core.weight import (
    INT_MAX, INT_MIN, fraction_to_weight, weight_to_fraction,
)
from qbeast_spark_spark.index.vectorized import (
    child_index_matrix, cube_ranges, packed_prefixes,
)


def test_root():
    r = CubeId.root(2)
    assert r.is_root and r.depth == 0 and r.path == 0
    frm, to = r.ranges()
    assert frm == [0.0, 0.0] and to == [1.0, 1.0]


def test_children_partition_parent():
    r = CubeId.root(2)
    kids = list(r.children())
    assert len(kids) == 4
    assert all(k.parent() == r for k in kids)
    # children tile the parent without overlap
    corners = set()
    for k in kids:
        frm, to = k.ranges()
        assert all(t - f == 0.5 for f, t in zip(frm, to))
        corners.add(tuple(frm))
    assert corners == {(0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (0.5, 0.5)}


def test_container_chain():
    p = (0.66, 0.83, 0.79)
    gen = CubeId.root(3).containers(p)
    cubes = [next(gen) for _ in range(8)]
    assert cubes[0] == CubeId.root(3)
    for parent, child in zip(cubes, cubes[1:]):
        assert child.parent() == parent
        assert parent.is_ancestor_of(child)
        assert child.contains(p)


def test_string_roundtrip():
    c = CubeId.container((0.1, 0.9), 7)
    s = str(c)
    assert CubeId.from_string(2, s) == c


@given(st.lists(st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
                min_size=1, max_size=4),
       st.integers(min_value=0, max_value=10))
@settings(max_examples=200, deadline=None)
def test_container_always_contains(point, depth):
    point = tuple(point)
    c = CubeId.container(point, depth)
    assert c.contains(point)
    assert c.depth == depth


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(42)
    pts = rng.random((500, 3))
    depth = 6
    idx = child_index_matrix(pts, depth)
    packed = packed_prefixes(idx, 3)
    for row in range(0, 500, 37):
        point = tuple(pts[row])
        for d in range(depth + 1):
            expect = CubeId.container(point, d)
            assert packed[row, d] == expect.path, (row, d)


def test_vectorized_ranges_match_scalar():
    rng = np.random.default_rng(7)
    pts = rng.random((50, 2))
    idx = child_index_matrix(pts, 5)
    packed = packed_prefixes(idx, 2)
    depths = np.full(50, 5, dtype=np.int64)
    frm, to = cube_ranges(depths, packed[:, 5], 2)
    for row in range(50):
        c = CubeId(2, 5, int(packed[row, 5]))
        efrm, eto = c.ranges()
        assert np.allclose(frm[row], efrm)
        assert np.allclose(to[row], eto)


def test_max_depth():
    assert max_depth_for_dims(1) == 63
    assert max_depth_for_dims(2) == 31
    assert max_depth_for_dims(3) == 21


def test_weight_fraction_roundtrip():
    assert fraction_to_weight(0.0) == INT_MIN
    assert fraction_to_weight(1.0) == INT_MAX
    for f in (0.01, 0.1, 0.5, 0.99):
        w = fraction_to_weight(f)
        assert abs(weight_to_fraction(w) - f) < 1e-9


def test_is_ancestor():
    root = CubeId.root(2)
    c = CubeId.container((0.3, 0.7), 4)
    assert root.is_ancestor_of(c)
    assert not c.is_ancestor_of(root)
    sibling = CubeId.container((0.9, 0.1), 4)
    assert not sibling.is_ancestor_of(c)
