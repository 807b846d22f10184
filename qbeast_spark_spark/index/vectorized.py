"""Vectorized (NumPy) OTree kernels used inside Arrow-batched Spark stages.

These are the executor-side hot paths: everything here is O(rows) NumPy with
no per-row Python, so a 100 TB run spends its time in Arrow/NumPy, not the
interpreter.

Cube encoding matches core.cube.CubeId: the child index chosen at level ``l``
occupies bits [l*dims, (l+1)*dims) of an int64 ``path``.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

__all__ = [
    "child_index_matrix",
    "packed_prefixes",
    "cube_ranges",
    "LevelMap",
    "assign_cubes",
    "simulate_domains",
]

_ONE_MINUS_EPS = 1.0 - 2.0**-52


def child_index_matrix(points: np.ndarray, max_depth: int) -> np.ndarray:
    """(N, dims) normalized coords -> (N, max_depth) child indices per level."""
    pts = np.clip(points, 0.0, _ONE_MINUS_EPS)
    n, dims = pts.shape
    out = np.zeros((n, max_depth), dtype=np.int64)
    for level in range(max_depth):
        scale = 2.0 ** (level + 1)
        for i in range(dims):
            bit = (pts[:, i] * scale).astype(np.int64) & 1
            out[:, level] |= bit << i
    return out


def packed_prefixes(child_idx: np.ndarray, dims: int) -> np.ndarray:
    """(N, L) child indices -> (N, L+1) packed cube paths; column d is the
    path of the containing cube at depth d (column 0 = root = 0)."""
    n, levels = child_idx.shape
    out = np.zeros((n, levels + 1), dtype=np.int64)
    for level in range(levels):
        out[:, level + 1] = out[:, level] | (child_idx[:, level] << (dims * level))
    return out


def cube_ranges(depths: np.ndarray, paths: np.ndarray, dims: int
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized CubeId.ranges: (M,) depth + (M,) path -> (M, dims) from/to."""
    m = len(depths)
    frm = np.zeros((m, dims), dtype=np.float64)
    max_d = int(depths.max()) if m else 0
    for level in range(max_d):
        width = 2.0 ** -(level + 1)
        active = depths > level
        idx = (paths >> (dims * level)) & ((1 << dims) - 1)
        for i in range(dims):
            frm[:, i] += np.where(active & (((idx >> i) & 1) == 1), width, 0.0)
    side = np.power(2.0, -depths.astype(np.float64))
    to = frm + side[:, None]
    return frm, to


class LevelMap:
    """Per-depth sorted lookup tables for the estimated cube tree:
    path -> (max_weight, file_id). Broadcast to executors for assignment."""

    def __init__(self, levels: List[Tuple[np.ndarray, np.ndarray, np.ndarray]]):
        # each entry: (sorted_paths int64, max_weights int64, file_ids int64)
        self.levels = levels

    @property
    def max_depth(self) -> int:
        return len(self.levels) - 1

    @staticmethod
    def build(cube_weights: Dict[Tuple[int, int], int],
              cube_files: Dict[Tuple[int, int], int]) -> "LevelMap":
        """cube key = (depth, path); weights are int32-domain ints."""
        if not cube_weights:
            levels = [(np.zeros(1, dtype=np.int64),
                       np.full(1, 2**31 - 1, dtype=np.int64),
                       np.zeros(1, dtype=np.int64))]
            return LevelMap(levels)
        by_depth: Dict[int, List[Tuple[int, int, int]]] = {}
        for (d, p), w in cube_weights.items():
            by_depth.setdefault(d, []).append((p, w, cube_files.get((d, p), 0)))
        max_d = max(by_depth)
        levels = []
        for d in range(max_d + 1):
            entries = sorted(by_depth.get(d, []))
            if entries:
                paths = np.array([e[0] for e in entries], dtype=np.int64)
                ws = np.array([e[1] for e in entries], dtype=np.int64)
                fs = np.array([e[2] for e in entries], dtype=np.int64)
            else:
                paths = np.empty(0, dtype=np.int64)
                ws = np.empty(0, dtype=np.int64)
                fs = np.empty(0, dtype=np.int64)
            levels.append((paths, ws, fs))
        return LevelMap(levels)


def _level_bits(points: np.ndarray, rows: np.ndarray, level: int,
                dims: int) -> np.ndarray:
    """Child index at ``level`` for the given row subset — computed lazily
    so work is O(sum of active rows per level), not O(rows * max_depth)."""
    pts = np.clip(points[rows], 0.0, _ONE_MINUS_EPS)
    scale = 2.0 ** (level + 1)
    idx = np.zeros(len(rows), dtype=np.int64)
    for i in range(dims):
        idx |= ((pts[:, i] * scale).astype(np.int64) & 1) << i
    return idx


def assign_cubes(points: np.ndarray, weights: np.ndarray, level_map: LevelMap,
                 dims: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Point-weight indexing (PointWeightIndexer.scala:35-44 semantics):
    each row goes to the first cube along its container chain whose
    max_weight >= row weight, or to the first cube missing from the
    estimated tree (new deeper cube; its file comes from the deepest known
    ancestor's rollup group).

    Returns (depth, path, file_id) per row. Bits are computed lazily per
    level over the shrinking active set (most rows settle in the first few
    levels, so the deep-tree worst case never materializes).
    """
    n = len(weights)
    max_depth = level_map.max_depth

    out_depth = np.zeros(n, dtype=np.int64)
    out_path = np.zeros(n, dtype=np.int64)
    out_file = np.zeros(n, dtype=np.int64)
    carry_file = np.zeros(n, dtype=np.int64)
    path = np.zeros(n, dtype=np.int64)  # prefix of the containing cube

    active = np.arange(n)
    for depth in range(max_depth + 1):
        if len(active) == 0:
            break
        paths_l, ws_l, fs_l = level_map.levels[depth]
        keys = path[active]
        if len(paths_l):
            pos = np.searchsorted(paths_l, keys)
            pos_c = np.minimum(pos, len(paths_l) - 1)
            found = paths_l[pos_c] == keys
        else:
            pos_c = np.zeros(len(keys), dtype=np.int64)
            found = np.zeros(len(keys), dtype=bool)

        missing = ~found
        fits = found & (weights[active] <= ws_l[pos_c])
        # update carried rollup file for rows that found a known cube
        carry_file[active[found]] = fs_l[pos_c[found]]

        done = missing | fits | (depth == max_depth)
        done_rows = active[done]
        out_depth[done_rows] = depth
        out_path[done_rows] = path[done_rows]
        out_file[done_rows] = carry_file[done_rows]
        active = active[~done]
        if len(active) and depth < max_depth:
            idx = _level_bits(points, active, depth, dims)
            path[active] |= idx << (dims * depth)
    return out_depth, out_path, out_file


def simulate_domains(points: np.ndarray, weights: np.ndarray,
                     group_cube_size: int, dims: int, max_depth: int
                     ) -> List[Tuple[int, int, int]]:
    """Partition-level cube-domain estimation — the exact semantics of the
    reference's weight-ordered queues (CubeDomainsBuilder.scala:74-192)
    expressed as a level-by-level simulation:

    rows are processed in weight order; each cube keeps the
    ``group_cube_size`` smallest-weight rows in its region, the rest overflow
    to its children. The *domain* of a cube is the number of rows reaching its
    region. Returns [(depth, path, domain), ...].
    """
    n = len(weights)
    if n == 0:
        return []
    order = np.argsort(weights, kind="stable")
    sorted_pts = points[order]

    out: List[Tuple[int, int, int]] = []
    # active rows at current level, kept in weight order; path = prefix of
    # the containing cube at the current depth (bits computed lazily)
    active = np.arange(n)
    path = np.zeros(n, dtype=np.int64)
    for depth in range(max_depth + 1):
        if len(active) == 0:
            break
        keys = path[active]
        uniq, counts = np.unique(keys, return_counts=True)
        out.extend(
            (depth, int(k), int(c)) for k, c in zip(uniq.tolist(), counts.tolist())
        )
        if depth == max_depth:
            break
        # within each cube, the group_cube_size smallest weights stay; the
        # rest overflow to the next level. active is weight-ordered, so a
        # stable sort by key gives per-cube weight-ordered groups.
        sort_by_key = np.argsort(keys, kind="stable")
        sorted_keys = keys[sort_by_key]
        new_group = np.flatnonzero(sorted_keys[1:] != sorted_keys[:-1]) + 1
        starts = np.concatenate(([0], new_group))
        sizes = np.diff(np.concatenate((starts, [len(sorted_keys)])))
        rank_within = np.arange(len(sorted_keys)) - np.repeat(starts, sizes)
        overflow_mask = rank_within >= group_cube_size
        overflow_rows = active[sort_by_key[overflow_mask]]
        # restore weight order for the next level
        overflow_rows.sort()
        active = overflow_rows
        if len(active):
            idx = _level_bits(sorted_pts, active, depth, dims)
            path[active] |= idx << (dims * depth)
    return out
