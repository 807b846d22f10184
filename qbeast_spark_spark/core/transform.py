"""Space transformations: one indexed column -> [0,1] coordinate.

Re-expression of the reference's transformer/transformation pair
(/root/reference/core/src/main/scala/io/qbeast/core/transform/
 LinearTransformation.scala:61-113, HashTransformation.scala:26-40,
 CDFQuantilesTransformation.scala:69-84, IdentityTransformation.scala:37-42,
 EmptyTransformer.scala:20-31).

Each transformation can produce its coordinate **as a Spark Column
expression** (JVM-side, whole-stage-codegen friendly — the hot path at 100 TB)
and as a NumPy function (driver-side literal conversion for query pruning).

Timestamps and dates normalize through epoch **milliseconds**, matching the
reference (LinearTransformation.scala:78-90, QueryFiltersUtils.scala:140-155).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

__all__ = [
    "Transformation",
    "LinearTransformation",
    "HashTransformation",
    "ForeignHashTransformation",
    "QuantilesTransformation",
    "IdentityTransformation",
    "EmptyTransformation",
    "transformation_from_json",
    "transformer_for_type",
    "numeric_view",
    "literal_to_number",
]

_ORDERED_SPARK_TYPES = {
    "double", "float", "int", "integer", "bigint", "long", "smallint",
    "tinyint", "date", "timestamp", "timestamp_ntz",
}


def _is_decimal(t: str) -> bool:
    return t.startswith("decimal")


def transformer_for_type(spark_type: str) -> str:
    """Default transformer per column type (Transformer.scala:85-92):
    linear for ordered types, hashing for strings."""
    t = spark_type.lower()
    if t in _ORDERED_SPARK_TYPES or _is_decimal(t):
        return "linear"
    if t == "string":
        return "hashing"
    raise ValueError(f"column type {spark_type} is not indexable")


def numeric_view(col_name: str, spark_type: str):
    """Spark Column casting an ordered column to its numeric (double) view.

    Timestamp/date -> epoch millis (the reference's convention); numerics ->
    double. Strings have no numeric view (hash transformer reads them raw).
    """
    from pyspark.sql import functions as F

    t = spark_type.lower()
    c = F.col(col_name)
    if t == "timestamp":
        return F.unix_millis(c).cast("double")
    if t == "timestamp_ntz":
        # NTZ wall-clock interpreted in the session tz; query-space pruning
        # pads timestamp intervals by the max utc offset to stay sound.
        return F.unix_millis(c.cast("timestamp")).cast("double")
    if t == "date":
        return (F.unix_date(c).cast("double") * 86400000.0)
    return c.cast("double")


def literal_to_number(value: Any) -> float:
    """Driver-side literal -> the same numeric space as numeric_view."""
    if isinstance(value, _dt.datetime):
        if value.tzinfo is None:
            value = value.replace(tzinfo=_dt.timezone.utc)
        return value.timestamp() * 1000.0
    if isinstance(value, _dt.date):
        epoch = _dt.date(1970, 1, 1)
        return (value - epoch).days * 86400000.0
    return float(value)


class Transformation:
    """Frozen normalization function for one indexed column."""

    kind: str = "base"

    def spark_column(self, col_name: str, spark_type: str):
        """Column expression producing the [0,1] coordinate (JVM-side)."""
        raise NotImplementedError

    def normalize(self, values: np.ndarray) -> np.ndarray:
        """Driver-side numeric literals -> [0,1] (query pruning)."""
        raise NotImplementedError

    def is_superseded_by(self, other: "Transformation") -> bool:
        """True when ``other`` covers space outside this transformation
        (LinearTransformation.scala:92-111) -> a new revision is needed."""
        return False

    def merge(self, other: "Transformation") -> "Transformation":
        return other

    def to_json(self) -> Dict[str, Any]:
        raise NotImplementedError


class LinearTransformation(Transformation):
    """min/max scaling: (v - min) / (max - min); nulls -> stored null_value.

    Reference: LinearTransformation.scala:61-113. null_value is deterministic
    (range midpoint) rather than random — an intentional, documented
    divergence that keeps writes reproducible.
    """

    kind = "linear"

    def __init__(self, min_value: float, max_value: float,
                 null_value: Optional[float] = None) -> None:
        self.min_value = float(min_value)
        self.max_value = float(max_value)
        if self.max_value <= self.min_value:
            # Degenerate single-valued column: widen so scale is defined.
            self.max_value = self.min_value + 1.0
        self.null_value = (
            float(null_value) if null_value is not None
            else (self.min_value + self.max_value) / 2.0
        )

    @property
    def _scale(self) -> float:
        return 1.0 / (self.max_value - self.min_value)

    def spark_column(self, col_name: str, spark_type: str):
        from pyspark.sql import functions as F

        v = F.coalesce(numeric_view(col_name, spark_type), F.lit(self.null_value))
        expr = (v - F.lit(self.min_value)) * F.lit(self._scale)
        # Clamp: appended data inside the same revision stays in [0,1].
        return F.least(F.greatest(expr, F.lit(0.0)), F.lit(1.0))

    def normalize(self, values: np.ndarray) -> np.ndarray:
        out = (np.asarray(values, dtype=np.float64) - self.min_value) * self._scale
        return np.clip(out, 0.0, 1.0)

    def is_superseded_by(self, other: "Transformation") -> bool:
        if not isinstance(other, LinearTransformation):
            return True
        return (other.min_value < self.min_value
                or other.max_value > self.max_value)

    def merge(self, other: "Transformation") -> "Transformation":
        if not isinstance(other, LinearTransformation):
            return other
        return LinearTransformation(
            min(self.min_value, other.min_value),
            max(self.max_value, other.max_value),
        )

    def to_json(self) -> Dict[str, Any]:
        return {"kind": self.kind, "minValue": self.min_value,
                "maxValue": self.max_value, "nullValue": self.null_value}


class HashTransformation(Transformation):
    """murmur3(value) & 0x7fffffff / Int.MaxValue -> [0,1].

    Reference: HashTransformation.scala:26-40. We use Spark's own F.hash
    (Murmur3, seed 42) instead of Scala's MurmurHash3.bytesHash — identical
    uniform-[0,1] semantics, different concrete values (documented divergence;
    only affects physical clustering, never query results).
    """

    kind = "hashing"
    # False = write-side coordinates came from this engine's F.hash twin,
    # so planning-time string-equality lookups may map a literal to its
    # exact point coordinate. ForeignHashTransformation flips this.
    foreign = False

    def spark_column(self, col_name: str, spark_type: str):
        from pyspark.sql import functions as F

        h = F.hash(F.coalesce(F.col(col_name).cast("string"), F.lit("\x00null")))
        return h.bitwiseAND(F.lit(0x7FFFFFFF)).cast("double") / 2147483647.0

    def normalize(self, values: np.ndarray) -> np.ndarray:
        # Not order-preserving: a range predicate cannot prune on a hashed
        # dimension; callers treat it as the full [0,1] interval.
        raise TypeError("hash transformation has no ordered literal mapping")

    def to_json(self) -> Dict[str, Any]:
        return {"kind": self.kind}


class ForeignHashTransformation(HashTransformation):
    """Hash dimension imported from a REFERENCE-written table.

    The reference's space coordinates for hashed columns come from Scala's
    ``MurmurHash3.bytesHash`` (HashTransformation.scala:26-40) — a
    different function than the ``F.hash`` twin this engine writes with.
    Sampling is unaffected (record weights are QbeastMurmur3Hash ==
    ``F.hash`` in both engines), but a planning-time equality lookup must
    NOT map a literal through our hash: it would land in the wrong cube
    chain and prune files that contain matches. ``foreign = True`` makes
    the query-space builder treat this dimension as the full [0,1]
    interval instead (always sound).
    """

    kind = "hashing-foreign"
    foreign = True


class QuantilesTransformation(Transformation):
    """CDF over user/driver-supplied quantiles -> relative rank in [0,1].

    Reference: CDFQuantilesTransformation.scala:69-84 (numeric and string
    flavors). Numeric columns go through numeric_view first; strings compare
    lexicographically.
    """

    kind = "quantiles"

    def __init__(self, quantiles: Sequence[Any], is_string: bool = False) -> None:
        if len(quantiles) < 2:
            raise ValueError("quantiles require at least 2 values")
        self.quantiles = list(quantiles)
        self.is_string = bool(is_string)

    def spark_column(self, col_name: str, spark_type: str):
        from pyspark.sql import functions as F

        n = len(self.quantiles) - 1
        if self.is_string:
            v = F.coalesce(F.col(col_name).cast("string"), F.lit(""))
            qs = [F.lit(str(q)) for q in self.quantiles]
        else:
            v = F.coalesce(numeric_view(col_name, spark_type),
                           F.lit(float(self.quantiles[0])))
            qs = [F.lit(float(q)) for q in self.quantiles]
        # rank = (#quantiles <= v) clamped to [0, n]; JVM-side sum of
        # comparisons keeps this inside whole-stage codegen (no UDF).
        rank = sum((q <= v).cast("int") for q in qs[1:])
        return rank.cast("double") / float(n)

    def normalize(self, values: np.ndarray) -> np.ndarray:
        n = len(self.quantiles) - 1
        if self.is_string:
            qs = np.asarray([str(q) for q in self.quantiles[1:]])
            vals = np.asarray(values, dtype=str)
        else:
            qs = np.asarray([float(q) for q in self.quantiles[1:]], dtype=np.float64)
            vals = np.asarray(values, dtype=np.float64)
        rank = np.searchsorted(qs, vals, side="right")
        return np.clip(rank / float(n), 0.0, 1.0)

    def is_superseded_by(self, other: "Transformation") -> bool:
        return not isinstance(other, QuantilesTransformation)

    def to_json(self) -> Dict[str, Any]:
        return {"kind": self.kind, "quantiles": self.quantiles,
                "isString": self.is_string}


class IdentityTransformation(Transformation):
    """Single-valued column -> constant 0.0 (IdentityTransformation.scala:37-42)."""

    kind = "identity"

    def spark_column(self, col_name: str, spark_type: str):
        from pyspark.sql import functions as F

        return F.lit(0.0)

    def normalize(self, values: np.ndarray) -> np.ndarray:
        return np.zeros(len(values), dtype=np.float64)

    def is_superseded_by(self, other: "Transformation") -> bool:
        return True

    def to_json(self) -> Dict[str, Any]:
        return {"kind": self.kind}


class EmptyTransformation(Transformation):
    """Placeholder for the staging revision (ID 0) — EmptyTransformer.scala:20-31."""

    kind = "empty"

    def spark_column(self, col_name: str, spark_type: str):
        from pyspark.sql import functions as F

        return F.lit(0.0)

    def normalize(self, values: np.ndarray) -> np.ndarray:
        return np.zeros(len(values), dtype=np.float64)

    def is_superseded_by(self, other: "Transformation") -> bool:
        return True

    def to_json(self) -> Dict[str, Any]:
        return {"kind": self.kind}


_KINDS = {
    "linear": LinearTransformation,
    "hashing": HashTransformation,
    "hashing-foreign": ForeignHashTransformation,
    "quantiles": QuantilesTransformation,
    "identity": IdentityTransformation,
    "empty": EmptyTransformation,
}


def transformation_from_json(obj: Dict[str, Any]) -> Transformation:
    kind = obj["kind"]
    if kind == "linear":
        return LinearTransformation(obj["minValue"], obj["maxValue"],
                                    obj.get("nullValue"))
    if kind == "hashing":
        return HashTransformation()
    if kind == "hashing-foreign":
        return ForeignHashTransformation()
    if kind == "quantiles":
        return QuantilesTransformation(obj["quantiles"], obj.get("isString", False))
    if kind == "identity":
        return IdentityTransformation()
    if kind == "empty":
        return EmptyTransformation()
    raise ValueError(f"unknown transformation kind {kind!r}")
