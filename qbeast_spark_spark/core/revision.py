"""Revision: one immutable index configuration.

Mirrors /root/reference/core/src/main/scala/io/qbeast/core/model/RevisionClasses.scala:131-195
and the on-log JSON shape of docs/QbeastFormat.md:85-146 (adapted to this
engine's self-contained log — no Delta dependency in this container).

A revision freezes: the indexed columns (with transformer type per column),
their transformations (the normalized space), and the desired cube size.
Appends whose values fall outside the current space trigger a new revision
with widened transformations (SparkRevisionFactory.scala:230-270 semantics).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

from .transform import (
    Transformation,
    transformation_from_json,
    transformer_for_type,
)

__all__ = ["ColumnToIndex", "Revision", "parse_columns_to_index",
           "STAGING_REVISION_ID"]

STAGING_REVISION_ID = 0  # StagingUtils.scala:25-58 — non-indexed files.

DEFAULT_CUBE_SIZE = 5_000_000  # config.scala:24-28


@dataclass(frozen=True)
class ColumnToIndex:
    """'col:transformerType' spec (ColumnToIndex.scala:40-53)."""

    name: str
    transformer: str  # linear | hashing | quantiles

    @staticmethod
    def parse(spec: str) -> "ColumnToIndex":
        name, sep, kind = spec.partition(":")
        name = name.strip()
        kind = kind.strip().lower()
        if sep and kind not in ("linear", "hashing", "quantiles"):
            raise ValueError(f"unknown transformer type {kind!r} in {spec!r}")
        return ColumnToIndex(name, kind if sep else "")


def parse_columns_to_index(specs: Sequence[str] | str) -> List[ColumnToIndex]:
    if isinstance(specs, str):
        specs = [s for s in specs.split(",") if s.strip()]
    return [ColumnToIndex.parse(s) for s in specs]


@dataclass
class Revision:
    revision_id: int
    timestamp_ms: int
    desired_cube_size: int
    column_specs: List[ColumnToIndex]
    transformations: List[Transformation]
    column_types: List[str] = field(default_factory=list)  # spark simpleString per column

    @property
    def dims(self) -> int:
        return len(self.column_specs)

    @property
    def column_names(self) -> List[str]:
        return [c.name for c in self.column_specs]

    @property
    def is_staging(self) -> bool:
        return self.revision_id == STAGING_REVISION_ID

    def transformer_kind(self, i: int) -> str:
        spec = self.column_specs[i]
        return spec.transformer or transformer_for_type(self.column_types[i])

    def is_superseded_by(self, new_transformations: Sequence[Transformation]) -> bool:
        return any(
            t.is_superseded_by(n)
            for t, n in zip(self.transformations, new_transformations)
        )

    def merged_with(self, new_transformations: Sequence[Transformation],
                    new_id: int, timestamp_ms: int) -> "Revision":
        merged = [
            t.merge(n) for t, n in zip(self.transformations, new_transformations)
        ]
        return Revision(new_id, timestamp_ms, self.desired_cube_size,
                        list(self.column_specs), merged, list(self.column_types))

    # -- JSON codec ---------------------------------------------------------

    def to_json(self) -> Dict[str, Any]:
        return {
            "revisionID": self.revision_id,
            "timestamp": self.timestamp_ms,
            "desiredCubeSize": self.desired_cube_size,
            "columnTransformers": [
                {"columnName": c.name, "transformerType": c.transformer or None}
                for c in self.column_specs
            ],
            "columnTypes": self.column_types,
            "transformations": [t.to_json() for t in self.transformations],
        }

    @staticmethod
    def from_json(obj: Dict[str, Any]) -> "Revision":
        specs = [
            ColumnToIndex(c["columnName"], c.get("transformerType") or "")
            for c in obj["columnTransformers"]
        ]
        return Revision(
            revision_id=obj["revisionID"],
            timestamp_ms=obj["timestamp"],
            desired_cube_size=obj["desiredCubeSize"],
            column_specs=specs,
            transformations=[
                transformation_from_json(t) for t in obj["transformations"]
            ],
            column_types=list(obj.get("columnTypes", [])),
        )

    def to_json_str(self) -> str:
        return json.dumps(self.to_json(), sort_keys=True)

    @staticmethod
    def from_json_str(s: str) -> "Revision":
        return Revision.from_json(json.loads(s))
