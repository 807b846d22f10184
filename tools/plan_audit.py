"""Scale-pattern audit over every registered query's physical plan.

Flags the plan shapes that break at 100 TB and verifies the ones that make
pruning work:

- SINGLE_PARTITION: an `Exchange SinglePartition` outside the whitelist
  (global top-k / LIMIT / scalar aggregate results are legitimately
  single-partition at the very end).
- WINDOW_NO_PART: a Window operator with an empty partition spec (whole
  table through one task).
- CARTESIAN: CartesianProduct / BroadcastNestedLoopJoin outside the
  whitelist (exact-baseline pairs and broadcast query matrices are
  intentional).
- NO_PUSHDOWN: a parquet scan of a table with a WHERE in the query but no
  PushedFilters at all (informational; Spark can't push every predicate).

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Exit code 1 if any non-whitelisted flag fires.
"""

from __future__ import annotations

import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# queries where a trailing single-partition exchange is the point
# (global LIMIT / one-row aggregate) or inherent to a tiny final result
SINGLE_PART_OK = {
    "q_topk_global",        # global ORDER BY ... LIMIT (TakeOrderedAndProject)
    "q3_shipping_priority", "q10_returned_items", "q18_large_volume",
    "q6_forecast_revenue", "q_funnel",
    "q17_19_part_predicates", "q15_top_supplier",
    "qb_sample",            # scalar aggregate over the sample (1-row result)
    "q22_inactive_rich",    # 1-row scalar-subquery aggregate (avg threshold)
    "q2_9_11_16_20_partsupp",  # q2 branch: global top-100
                               # (TakeOrderedAndProject); q11 branch:
                               # 1-row scalar threshold aggregate
}
# intentional nested-loop / cartesian shapes
NESTED_LOOP_OK = {
    "sim_pairs",        # exact all-pairs baseline (capped) + LSH rerank
    "sim_topk",         # broadcast query side vs vectors
    "sim_otree_topk",   # broadcast query matrix vs pruned candidates
    "q4_order_priority",  # non-equi semi-join condition
    "q_interval_join",  # bucketed equi-join + range residual
    "q22_inactive_rich",  # broadcast crossJoin of the 1-row scalar agg —
                          # how Spark itself executes a scalar subquery
    "q2_9_11_16_20_partsupp",  # q11 branch: same 1-row scalar-agg
                               # broadcast crossJoin as q22
}


def audit(name: str, df) -> list:
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = []
    if name not in SINGLE_PART_OK and "Exchange SinglePartition" in plan:
        flags.append("SINGLE_PARTITION")
    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\]", plan):
        # Window [exprs], [partition spec], [order spec] — the 3-group
        # form; a missing partition group means global window
        pass
    for line in plan.splitlines():
        ls = line.strip()
        if ls.startswith("+- Window ") or ls.startswith(":- Window ") \
                or ls.startswith("Window "):
            # partition spec is the second bracket group; global windows
            # render as `windowspecdefinition(<order>, ...)` with no
            # partition columns before the order spec — detect via the
            # explicit pattern `], [], [` (empty partition list)
            if re.search(r"\], \[\], \[", ls):
                flags.append("WINDOW_NO_PART")
                break
    if "CartesianProduct" in plan and name not in NESTED_LOOP_OK:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_OK:
        flags.append("NESTED_LOOP_JOIN")
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .appName("plan-audit")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    failures = 0
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        try:
            flags = audit(name, fn(spark, sf_dir))
        except Exception as ex:
            print(f"{name:28s} BUILD-ERROR {type(ex).__name__}: "
                  f"{str(ex)[:120]}")
            failures += 1
            continue
        if flags:
            failures += 1
            print(f"{name:28s} FLAG {','.join(flags)}")
        else:
            print(f"{name:28s} ok")
    print(f"\n{'ALL CLEAN' if failures == 0 else f'{failures} FLAGGED'}")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
