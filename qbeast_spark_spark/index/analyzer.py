"""OTree analysis: cube-domain estimation (distributed) + cube-weight
computation and rollup (driver-side, O(#cubes)).

Re-expression of the reference two-pass analyzer
(/root/reference/core/src/main/scala/io/qbeast/spark/index/OTreeDataAnalyzer.scala:67-212)
and the rollup grouping (core/src/main/scala/io/qbeast/core/writer/ —
Rollup.scala:56-76) in Spark-first form:

job 1  min/max/count stats          -> plain DataFrame aggregate
job 2  per-partition domain sketch  -> mapInArrow (NumPy) + groupBy().sum()
driver cube weights + rollup        -> pure Python over ~#cubes entries
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.cube import max_depth_for_dims
from ..core.revision import Revision
from ..core.weight import INT_MIN, INT_MAX, RANGE
from .vectorized import LevelMap, simulate_domains

__all__ = [
    "WEIGHT_COL", "NORM_PREFIX",
    "MIN_GROUP_CUBE_SIZE", "DOMAIN_BUFFER_CAPACITY",
    "with_index_columns", "estimate_cube_domains", "compute_cube_weights",
    "compute_rollup", "build_level_map", "group_cube_size",
]

WEIGHT_COL = "_qbeast_weight"
NORM_PREFIX = "_qbeast_norm_"

MIN_GROUP_CUBE_SIZE = 30          # CubeDomainsBuilder.scala:23
DOMAIN_BUFFER_CAPACITY = 100_000  # config.scala:30-34

# floor for the SAMPLED domain sketch (estimate_cube_domains
# sample_fraction): below this many expected rows the sampled tree is
# noise and the full sketch is cheap anyway, so the fraction is clamped
_MIN_SKETCH_ROWS = 100_000

# r8 (VERDICT r7 task 4): the sampled sketch auto-enables above this
# many input rows — large ingest batches (streaming sinks, auto_maintain
# re-indexing, bulk writes) get the 100-TB lever by DEFAULT instead of
# opt-in. Below the threshold the exact pass is cheap; above it the
# fraction targets _AUTO_SKETCH_TARGET_ROWS sampled rows (10x the
# _MIN_SKETCH_ROWS noise floor — accuracy margin), floored at 1% so a
# colossal batch never sketches more than ~1% of its bytes. Explicit
# sample_fraction always wins; pass 1.0 to force the exact pass.
_AUTO_SKETCH_MIN_ROWS = 4_000_000
_AUTO_SKETCH_TARGET_ROWS = 1_000_000

# fraction the last estimate_cube_domains call IN THIS PROCESS actually
# used (None = exact pass) — diagnostic observability for soaks/benches
# asserting the policy. Deliberately a plain global, not a thread-local:
# streaming sinks run estimate in a worker thread while the assertion
# reads from the driver thread. Concurrent writers interleave it —
# don't build product logic on it.
LAST_SKETCH_FRACTION: Optional[float] = None


def with_index_columns(df, revision: Revision):
    """Append the weight (murmur3 seed-42 == F.hash, QbeastMurmur3Hash
    parity) and per-dimension normalized coordinate columns — all JVM-side
    expressions inside whole-stage codegen."""
    from pyspark.sql import functions as F

    cols = {WEIGHT_COL: F.hash(*[F.col(c) for c in revision.column_names])}
    for i, (spec, tr) in enumerate(zip(revision.column_specs,
                                       revision.transformations)):
        ctype = revision.column_types[i]
        cols[f"{NORM_PREFIX}{i}"] = tr.spark_column(spec.name, ctype).cast("double")
    return df.withColumns(cols)


def group_cube_size(desired_cube_size: int, num_elements: int,
                    num_partitions: int = 1,
                    buffer_capacity: int = DOMAIN_BUFFER_CAPACITY) -> int:
    """CubeDomainsBuilder.estimateGroupCubeSize (CubeDomainsBuilder.scala:40-48):
    numGroups = MAX(numPartitions, numElements / bufferCapacity). Omitting
    the partitions term makes a partition whose rows all fit in one local
    root emit a depth-0-only sketch, so the estimated tree never subdivides
    and real cubes blow past capacity."""
    num_groups = max(1, num_partitions, math.ceil(num_elements / buffer_capacity))
    return max(MIN_GROUP_CUBE_SIZE, desired_cube_size // num_groups)


def estimate_cube_domains(prepared_df, revision: Revision, num_elements: int,
                          buffer_capacity: int = DOMAIN_BUFFER_CAPACITY,
                          sample_fraction: Optional[float] = None
                          ) -> Dict[Tuple[int, int], float]:
    """Distributed pass: per-partition weight-ordered domain simulation over
    the normalized coords, then a tiny groupBy().sum() shuffle (one row per
    discovered cube — KBs, not data-sized). Returns {(depth, path): domain}.

    ``sample_fraction`` runs the sketch over a Bernoulli sample and
    scales the result back by 1/f — the 100-TB ingest lever: cube
    weights are RATIOS (cubeSize/domain), so a cube holding ≥cubeSize
    rows keeps relative error ~1/sqrt(f·cubeSize) (0.4% at f=0.01,
    cubeSize=5M); under-sampled small cubes degrade to leaves, which is
    where they were headed anyway. Sampling changes index BALANCE only,
    never read correctness: per-file/block stats and element weights
    are computed from the REAL rows in the write pass. The fraction is
    clamped so the sketch still sees enough rows to shape a tree, and
    the subdivision threshold scales with f so the sampled sketch
    discovers the same tree granularity the full sketch would."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    dims = revision.dims
    max_depth = max_depth_for_dims(dims)
    norm_cols = [f"{NORM_PREFIX}{i}" for i in range(dims)]
    out_schema = "depth int, path long, domain long"

    def sketch(batches):
        buf_pts: List[np.ndarray] = []
        buf_w: List[np.ndarray] = []
        buffered = 0

        def flush():
            nonlocal buf_pts, buf_w, buffered
            if not buffered:
                return None
            pts = np.concatenate(buf_pts)
            ws = np.concatenate(buf_w)
            buf_pts, buf_w, buffered = [], [], 0
            triples = simulate_domains(pts, ws, gcs, dims, max_depth)
            if not triples:
                return None
            arr = np.array(triples, dtype=np.int64).reshape(-1, 3)
            return pa.RecordBatch.from_arrays(
                [pa.array(arr[:, 0].astype(np.int32)), pa.array(arr[:, 1]),
                 pa.array(arr[:, 2])],
                names=["depth", "path", "domain"])

        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            pts = np.column_stack([
                tbl.column(c).to_numpy(zero_copy_only=False) for c in norm_cols
            ])
            ws = tbl.column(WEIGHT_COL).to_numpy(zero_copy_only=False).astype(np.int64)
            buf_pts.append(pts)
            buf_w.append(ws)
            buffered += len(ws)
            if buffered >= buffer_capacity:  # bound executor memory
                res = flush()
                if res is not None:
                    yield res
        res = flush()
        if res is not None:
            yield res

    from ..functions.partitioning import spread

    if sample_fraction is not None and not (0.0 < sample_fraction <= 1.0):
        # a typo'd 10 ("ten percent") silently paying the full sketch is
        # the exact failure this knob exists to prevent — reject loudly
        raise ValueError(
            f"sample_fraction must be in (0, 1], got {sample_fraction}")
    if sample_fraction is None and num_elements >= _AUTO_SKETCH_MIN_ROWS:
        # default-on above the threshold (see _AUTO_SKETCH_MIN_ROWS):
        # every caller — writer, optimize, streaming sinks — inherits
        sample_fraction = max(
            0.01, _AUTO_SKETCH_TARGET_ROWS / max(1, num_elements))
    global LAST_SKETCH_FRACTION
    f = None
    if sample_fraction is not None and 0.0 < sample_fraction < 1.0:
        # keep at least ~100k expected sketch rows (or everything):
        # below that the discovered tree is noise, and the full sketch
        # is cheap anyway
        f = max(sample_fraction,
                min(1.0, _MIN_SKETCH_ROWS / max(1, num_elements)))
        if f >= 1.0:
            f = None
    LAST_SKETCH_FRACTION = f

    # spread the NARROW projection (weight + dims doubles) so the sketch
    # parallelizes even from a single input split; cheap relative to the
    # full-row width, and a no-op when the input is already well-split.
    narrow = prepared_df.select([WEIGHT_COL] + norm_cols)
    if f is not None:
        narrow = narrow.sample(fraction=f, seed=42)
    narrow = spread(narrow)
    num_partitions = max(1, narrow.rdd.getNumPartitions())
    if f is None:
        gcs = group_cube_size(revision.desired_cube_size, num_elements,
                              num_partitions, buffer_capacity)
    else:
        # the sample is a shrunk replica of the data: shrink the target
        # cube size and the element count together so the subdivision
        # threshold keeps the same RATIO to group row counts, and the
        # sketch discovers the tree at full-data granularity
        gcs = group_cube_size(
            max(1, int(round(revision.desired_cube_size * f))),
            max(1, int(round(num_elements * f))),
            num_partitions, buffer_capacity)
    sketch_df = (
        narrow
        .mapInArrow(sketch, out_schema)
        .groupBy("depth", "path")
        .agg(F.sum("domain").alias("domain"))
    )
    rows = sketch_df.collect()
    scale = 1.0 if f is None else 1.0 / f
    return {(r["depth"], r["path"]): float(r["domain"]) * scale
            for r in rows}


def compute_cube_weights(domains: Dict[Tuple[int, int], float],
                         desired_cube_size: int,
                         dims: int,
                         existing_weights: Optional[Dict[Tuple[int, int], int]] = None
                         ) -> Dict[Tuple[int, int], int]:
    """Driver pass (OTreeDataAnalyzer.estimateUpdatedCubeWeights:141-212):
    top-down per level, maxWeight(c) = maxWeight(parent) + cubeSize/domain(c)
    in normalized-fraction space; leaves (domain <= cubeSize) get 1.0.

    Returns int32-domain weights {(depth, path): weight_int}.
    """
    fractions: Dict[Tuple[int, int], float] = {}
    out: Dict[Tuple[int, int], int] = {}
    for (depth, path) in sorted(domains, key=lambda k: (k[0], k[1])):
        domain = domains[(depth, path)]
        if depth == 0:
            parent_f = 0.0
        else:
            # parent path: clear this level's top dims bits (each level
            # appends `dims` bits above the ancestor path).
            parent_key = (depth - 1, path & ((1 << (dims * (depth - 1))) - 1))
            parent_f = fractions.get(parent_key, 0.0)
        if domain <= 0:
            f = 1.0
        else:
            f = parent_f + desired_cube_size / domain
        f = min(1.0, f)
        fractions[(depth, path)] = f
        w = INT_MIN + int(round(f * RANGE))
        out[(depth, path)] = min(INT_MAX, w)
    if existing_weights:
        # Appends: never loosen an existing cube's bound — reuse the smaller
        # weight so previously written blocks stay consistent.
        for k, w in existing_weights.items():
            if k in out:
                out[k] = min(out[k], w)
            else:
                out[k] = w
    return out


def cube_element_counts(domains: Dict[Tuple[int, int], float], dims: int
                        ) -> Dict[Tuple[int, int], float]:
    """Estimated rows stored in each cube = own domain minus children domains."""
    counts = dict(domains)
    for (depth, path), dom in domains.items():
        if depth == 0:
            continue
        mask = (1 << (dims * (depth - 1))) - 1
        pk = (depth - 1, path & mask)
        if pk in counts:
            counts[pk] -= dom
    return {k: max(0.0, v) for k, v in counts.items()}


def compute_rollup(domains: Dict[Tuple[int, int], float], dims: int,
                   desired_cube_size: int) -> Dict[Tuple[int, int], int]:
    """Rollup.compute (Rollup.scala:56-76): bottom-up, cubes with fewer than
    desiredCubeSize estimated rows merge into their parent; each resulting
    group becomes one output file. Returns {(depth,path): file_id}."""
    counts = cube_element_counts(domains, dims)
    return compute_rollup_from_counts(counts, dims, desired_cube_size)


def compute_rollup_from_counts(counts: Dict[Tuple[int, int], float], dims: int,
                               desired_cube_size: int
                               ) -> Dict[Tuple[int, int], int]:
    """Rollup over per-cube element counts (used by optimize, where actual
    stored counts are known from the block metadata)."""
    sizes = dict(counts)
    target: Dict[Tuple[int, int], Tuple[int, int]] = {}
    for key in sorted(sizes, key=lambda k: (-k[0], k[1])):
        depth, path = key
        if depth > 0 and sizes[key] < desired_cube_size:
            mask = (1 << (dims * (depth - 1))) - 1
            pk = (depth - 1, path & mask)
            if pk in sizes:
                sizes[pk] += sizes[key]
                target[key] = pk
                continue
        target[key] = key

    def resolve(k: Tuple[int, int]) -> Tuple[int, int]:
        while target.get(k, k) != k:
            k = target[k]
        return k

    roots = sorted({resolve(k) for k in sizes})
    file_ids = {r: i for i, r in enumerate(roots)}
    return {k: file_ids[resolve(k)] for k in sizes}


def build_level_map(cube_weights: Dict[Tuple[int, int], int],
                    cube_files: Dict[Tuple[int, int], int]) -> LevelMap:
    return LevelMap.build(cube_weights, cube_files)
