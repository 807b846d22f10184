"""CHECK constraints (Delta `ALTER TABLE ADD CONSTRAINT` parity — the
reference has no equivalent; its DML story delegates to Delta and loses
the index, docs/Quickstart.md:409-427).

A constraint is a SQL boolean expression stored as the table property
``qbeast.constraint.<name>``. Enforcement follows Delta's semantics: a
row violates when the expression evaluates to FALSE — NULL (unknown)
passes. Every code path that introduces NEW row values validates before
committing: indexed writes (append/overwrite/insert_into/streaming
batches), UPDATE replacements, and MERGE updates + inserts (staged or
in-space). Re-layout verbs (optimize, compact) move existing rows and
skip the check, as Delta OPTIMIZE does.

Validation is ONE aggregation job over the batch being written — a
conditional count per constraint, map-side combined; at 100 TB it adds a
single scan of the incoming (not existing) data, only when constraints
are defined."""

from __future__ import annotations

from typing import Dict, Mapping, Optional

__all__ = ["CONSTRAINT_PREFIX", "DELTA_CONSTRAINT_PREFIX",
           "constraints_of", "validate_constraints"]

CONSTRAINT_PREFIX = "qbeast.constraint."
# Delta's own convention for the same concept — the export/import wire
# key (PROTOCOL.md "CHECK Constraints"); shared so the two directions
# cannot drift
DELTA_CONSTRAINT_PREFIX = "delta.constraints."


def constraints_of(properties: Mapping[str, str]) -> Dict[str, str]:
    """Active constraints from table properties. Dropped constraints are
    DELETED via the log's null-value property protocol (log.py replay);
    an empty-string value (the pre-null legacy spelling) also reads as
    dropped."""
    return {k[len(CONSTRAINT_PREFIX):]: v
            for k, v in (properties or {}).items()
            if k.startswith(CONSTRAINT_PREFIX) and v}


def validate_constraints(df, constraints: Optional[Dict[str, str]],
                         context: str = "write") -> None:
    """Raise ValueError naming every violated constraint (with its row
    count) if any row of ``df`` fails a CHECK; no-op without
    constraints. A malformed expression (unknown column, syntax error)
    surfaces as the underlying analysis error — fail fast."""
    from pyspark.sql import functions as F

    if not constraints:
        return
    aggs = [
        F.count(F.when(F.expr(f"NOT coalesce(({expr}), true)"), 1))
        .alias(f"_c_{i}")
        for i, expr in enumerate(constraints.values())
    ]
    row = df.agg(*aggs).collect()[0]
    bad = {name: int(row[f"_c_{i}"])
           for i, (name, expr) in enumerate(constraints.items())
           if row[f"_c_{i}"]}
    if bad:
        detail = ", ".join(
            f"{name} [CHECK ({constraints[name]})]: {n} row(s)"
            for name, n in sorted(bad.items()))
        raise ValueError(
            f"{context} violates CHECK constraint(s): {detail}")
