"""Extended relational surface: TPC-H-shaped queries adapted to the reduced
testdata schema (no partsupp/commitdate/shipmode/phone/container columns) plus
analytic operators (exact-global ntile without a global sort, pivot, exact
percentiles), plus later additions: q15 scalar-max, bucketed interval
join, funnel analysis, JSON extraction, hypertable time-slice reads over a
time-indexed events table, ANN over the OTree index, scored LSH,
connected-components dedup clustering, and deterministic stratified
sampling. (lag/lead, grouping sets, sliding windows and hyperplane-LSH
pairs moved into merged queries.py entries in round 2 — see COVERAGE.md
"Registry size note".)

These exercise the operator families the reference DELEGATES to Spark
(SURVEY.md §2.2 — evidence: reads materialize as HadoopFsRelation +
ParquetFileFormat, QbeastBaseRelation.scala:74-83, so joins/aggs/windows are
vanilla Catalyst): semi-join with non-equi condition (q4), multi-way join with
disjunctive nation pairing (q7), conditional-ratio aggregation (q8, q14),
top-k over join (q10), left-join count distribution (q13), correlated-style
avg threshold via self-agg join (q17), HAVING-subquery (q18), disjunction of
conjunctions with pushdown (q19), anti-pattern "inactive customers" (q22).

Same compare conventions as queries.py: money -> per-row cents trick;
ratios -> ROUND(...,4); identical aliases both sides.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from .queries_common import _cache_path, _cents, _events, _t

__all__ = ["EXT_QUERIES"]


# ---------------------------------------------------------------------------
# TPC-H adaptations
# ---------------------------------------------------------------------------

def q4_order_priority(spark, sf_dir):
    """Semi-join with a non-equi condition (EXISTS rewrite)."""
    from pyspark.sql import functions as F

    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz")))
    li = _t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAY"))
    return (o.join(li, cond, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count")))


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


def q7_volume_shipping(spark, sf_dir):
    """Two-nation trade flow: 4-way join, disjunctive pair filter, year agg."""
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    pair = (((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
             .alias("revenue_cents"))
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""


def q8_market_share(spark, sf_dir):
    """Share-of-total conditional aggregation over a 5-way join."""
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    vol = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    n2 = n.select(F.col("n_nationkey").alias("s_nkey"),
                  F.col("n_name").alias("supp_nation"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0))
            .cast("double") / F.sum(vol), 4).alias("mkt_share"))
    )


Q8_SQL = """
SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                  THEN CAST(ROUND(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)
                  ELSE 0 END) AS DOUBLE)
             / SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)), 4)
         AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def q10_returned_items(spark, sf_dir):
    """Top-20 revenue-loss customers from returned items."""
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz")))
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name",
                 _cents(F.col("c_acctbal")).alias("acctbal_cents"), "n_name")
        .agg(F.sum(rev).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, CAST(ROUND(c_acctbal*100,0) AS BIGINT) AS acctbal_cents,
       n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
"""


def q13_customer_distribution(spark, sf_dir):
    """Left join + two-level aggregation (order-count distribution)."""
    from pyspark.sql import functions as F

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) t
GROUP BY c_count
"""


def q14_promo_effect(spark, sf_dir):
    """Global conditional-ratio aggregate (single row)."""
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz")))
    p = _t(spark, sf_dir, "part")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))
            .cast("double") / F.sum(rev), 4).alias("promo_revenue_pct"))
    )


Q14_SQL = """
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(ROUND(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)
                 ELSE 0 END) AS DOUBLE)
             / SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)), 4)
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q17_small_quantity(spark, sf_dir):
    """q17 (per-part average threshold, correlated-subquery shape, via
    self-agg broadcast join — no per-row subquery execution at scale),
    q19 (disjunction of conjunctive range predicates across a join) and
    q14 (global conditional-ratio aggregate, merged here in r5 to free a
    registry slot for the partsupp suite) as one labeled result: all are
    selective lineitem-x-part aggregates. The q14 branch keeps its
    conditional-ratio semantics with the percentage scaled to a bigint
    (x 1e4) to fit the shared (shape, revenue_cents, n_lines) schema."""
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem")
    p17 = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    avg_qty = (li.groupBy(F.col("l_partkey").alias("a_partkey"))
               .agg(F.avg("l_quantity").alias("avg_qty")))
    q17 = (
        li.join(F.broadcast(p17), li.l_partkey == p17.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("a_partkey"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("revenue_cents"),
             F.count("*").alias("n_lines"))
        .select(F.lit("q17_avg_qty_threshold").alias("shape"),
                "revenue_cents", "n_lines")
    )

    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5))
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10))
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15))
           & q.between(20, 30)))
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    q19 = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
           .where(cond)
           .agg(F.sum(rev).alias("revenue_cents"),
                F.count("*").alias("n_lines"))
           .select(F.lit("q19_disjunctive").alias("shape"),
                   "revenue_cents", "n_lines"))

    li14 = li.where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz")))
    rev14 = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    # promo share scaled to x1e4 basis points via EXACT integer half-up
    # division on bigint cents: floor((2e6*promo + total) / (2*total)) ==
    # round-half-up(1e6*promo/total) for positive operands. The previous
    # round-through-doubles (ROUND(pct,4) then ROUND(pct*10000,0)) could
    # disagree by 1 between Spark (BigDecimal HALF_UP on the shortest
    # decimal repr) and DuckDB (rounds the binary double) on boundary
    # values (ADVICE r5, queries_ext.py:311). No doubles anywhere now.
    q14 = (
        li14.join(F.broadcast(p), li14.l_partkey == p.p_partkey)
        .agg(F.sum(F.when(F.col("p_type") == "PROMO", rev14).otherwise(0))
             .alias("promo_cents"),
             F.sum(rev14).alias("total_cents"),
             F.count("*").alias("n_lines"))
        .select(F.lit("q14_promo_pct_x1e4").alias("shape"),
                F.expr("CAST((2000000 * promo_cents + total_cents) "
                       "DIV (2 * total_cents) AS BIGINT)")
                .alias("revenue_cents"), "n_lines"))
    return q17.unionByName(q19).unionByName(q14)


Q17_SQL = """
SELECT 'q17_avg_qty_threshold' AS shape,
       CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
UNION ALL
SELECT 'q19_disjunctive' AS shape,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
UNION ALL
SELECT 'q14_promo_pct_x1e4' AS shape,
       -- exact integer half-up division on bigint cents; DuckDB SUM(int)
       -- widens to HUGEINT so 2e6x the sum cannot overflow, and // is
       -- floor division which equals half-up rounding here (operands > 0)
       CAST((2000000 * SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(ROUND(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)
                 ELSE 0 END)
             + SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)))
            // (2 * SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)))
            AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q18_large_volume(spark, sf_dir):
    """HAVING-subquery: orders whose total quantity exceeds a threshold."""
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .where(F.col("sum_qty") > 300))
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                _cents(F.col("o_totalprice")).alias("totalprice_cents"),
                F.col("sum_qty").cast("double").alias("sum_qty"))
        .orderBy(F.col("totalprice_cents").desc(), F.col("o_orderkey"))
        .limit(20)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS totalprice_cents,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice_cents DESC, o_orderkey
LIMIT 20
"""


def q22_inactive_rich(spark, sf_dir):
    """Scalar-subquery threshold + anti-join (every synthetic customer has
    orders, so "no orders at all" is vacuous — adapted to "no orders since
    2000-01-01"). The threshold stays in-plan as a broadcast crossJoin of
    the 1-row aggregate (one job instead of a driver collect + second
    job)."""
    from pyspark.sql import functions as F

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = (c.where(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("_avg_bal")))
    recent = o.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"),
             F.sum(_cents(F.col("c_acctbal"))).alias("totacctbal_cents"))
    )


Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(ROUND(c_acctbal*100,0) AS BIGINT)) AS BIGINT) AS totacctbal_cents
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Analytic operators
# ---------------------------------------------------------------------------

def q_ntile_quartiles(spark, sf_dir):
    """Exact global NTILE(4) bucketing WITHOUT a global-order Window
    (which funnels the whole table through one task): 2-pass plan —
    distributed order statistics find the three exact quartile cut rows
    (functions/ranks.py: range-repartition + per-bucket counts + local
    rank of just the cut buckets), then rows bucket by comparing against
    the broadcast cut literals. Identical output to NTILE(4) because the
    (o_totalprice, o_orderkey) order is total."""
    from pyspark.sql import functions as F

    from .functions.ranks import exact_ntile_cuts

    o = _t(spark, sf_dir, "orders")
    _n, cuts = exact_ntile_cuts(o, ["o_totalprice", "o_orderkey"], 4)
    p, k = F.col("o_totalprice"), F.col("o_orderkey")
    quartile = F.lit(1)
    for cut in cuts:
        after_cut = (p > F.lit(cut["o_totalprice"])) | (
            (p == F.lit(cut["o_totalprice"]))
            & (k > F.lit(cut["o_orderkey"])))
        quartile = quartile + F.when(after_cut, 1).otherwise(0)
    return (o.select(quartile.cast("int").alias("quartile"),
                     F.col("o_totalprice"))
            .groupBy("quartile")
            .agg(F.count("*").alias("n"),
                 F.sum(_cents(F.col("o_totalprice"))).alias("sum_cents"),
                 _cents(F.min("o_totalprice")).alias("min_cents"),
                 _cents(F.max("o_totalprice")).alias("max_cents")))


Q_NTILE_SQL = """
SELECT quartile, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(ROUND(MIN(o_totalprice)*100,0) AS BIGINT) AS min_cents,
       CAST(ROUND(MAX(o_totalprice)*100,0) AS BIGINT) AS max_cents
FROM (SELECT o_totalprice,
             NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders) t
GROUP BY quartile
"""


def q_pivot(spark, sf_dir):
    """Pivot (explicit value list keeps the plan a single pass, no distinct
    pre-scan) — event counts per type by user bucket."""
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir)
    types = ["click", "view", "purchase", "signup", "error"]
    return (ev.withColumn("user_bucket", F.col("user_id") % 10)
            .groupBy("user_bucket")
            .pivot("event_type", types)
            .agg(F.count(F.lit(1)))
            .select(F.col("user_bucket").cast("long").alias("user_bucket"),
                    *[F.coalesce(F.col(t), F.lit(0)).cast("long")
                      .alias(f"n_{t}") for t in types]))


Q_PIVOT_SQL = """
SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
FROM events
GROUP BY 1
"""


def q15_top_supplier(spark, sf_dir):
    """View + scalar-max pattern (TPC-H q15 shape): supplier(s) with the
    maximum revenue in a quarter, via a broadcast join against the 1-row
    max aggregate (a global window over lit(1) would collapse the whole
    aggregate into a single partition at scale)."""
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz")))
    s = _t(spark, sf_dir, "supplier")
    rev = (li.groupBy("l_suppkey")
           .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                .alias("total_revenue_cents")))
    mx = rev.agg(F.max("total_revenue_cents").alias("_mx"))
    top = (rev.join(F.broadcast(mx),
                    rev.total_revenue_cents == mx._mx).drop("_mx"))
    return (top.join(s, top.l_suppkey == s.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue_cents"))


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS BIGINT)
           AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue_cents
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue_cents = (SELECT MAX(total_revenue_cents) FROM revenue)
"""


def q_interval_join(spark, sf_dir):
    """Range join via the bucketed equi-join operator: each error event
    opens a 10-minute window; count events and sum value inside it."""
    from pyspark.sql import functions as F

    from .operators.rangejoin import interval_join

    ev = _events(spark, sf_dir)
    TEN_MIN = 600_000_000
    intervals = (ev.where(F.col("event_type") == "error")
                 .select(F.col("event_id").alias("err_id"),
                         F.col("ts_us").alias("win_start"),
                         (F.col("ts_us") + TEN_MIN).alias("win_end")))
    points = ev.select(F.col("event_id"), F.col("ts_us"), F.col("value"))
    j = interval_join(points, intervals, "ts_us", "win_start", "win_end",
                      bucket_width=TEN_MIN)
    return (j.groupBy("err_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum(_cents(F.col("value"))).alias("value_cents")))


Q_INTERVAL_SQL = """
SELECT err_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) AS BIGINT) AS value_cents
FROM (SELECT event_id AS err_id, epoch_us(ts) AS win_start,
             epoch_us(ts) + 600000000 AS win_end
      FROM events WHERE event_type = 'error') iv
JOIN (SELECT epoch_us(ts) AS ts_us, value FROM events) ev
  ON ev.ts_us >= iv.win_start AND ev.ts_us < iv.win_end
GROUP BY err_id
"""


_EMB_CACHE: Dict[str, str] = {}


def _indexed_embeddings(spark, sf_dir):
    """Embeddings table with dims 0/1 materialized and OTree-indexed —
    built once per sf_dir (same cache pattern as queries._indexed_lineitem)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from .sources.log import CommitLog
    from .sources.writer import write_qbeast

    key = os.path.abspath(sf_dir)
    path = _EMB_CACHE.get(key) or _cache_path(sf_dir, "embeddings")
    if not CommitLog(path).exists():
        shutil.rmtree(path, ignore_errors=True)
        emb = (spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
               .withColumn("e0", F.col("embedding")[0].cast("double"))
               .withColumn("e1", F.col("embedding")[1].cast("double")))
        import pyarrow.parquet as pq
        n = pq.ParquetFile(
            os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
        write_qbeast(emb, path, columns_to_index=["e0", "e1"],
                     cube_size=max(50, n // 16))
    _EMB_CACHE[key] = path
    return path


def sim_otree_topk(spark, sf_dir):
    """ANN where the OTree index IS the prefilter: range-pruned read on
    two indexed embedding dims, exact cosine rerank inside the box."""
    from pyspark.sql import functions as F

    from .operators.similarity import otree_prefilter_topk
    from .sources.reader import QbeastTable

    path = _indexed_embeddings(spark, sf_dir)
    qt = QbeastTable.for_path(spark, path)
    query_rows = (qt.to_df().where(F.col("vec_id") < 5)
                  .select("vec_id", "embedding", "e0", "e1").collect())
    query_rows.sort(key=lambda r: r["vec_id"])
    return otree_prefilter_topk(spark, qt, query_rows, k=10, radius=0.1)


SIM_OTREE_SQL = """
SELECT q_id, vec_id, cos, rank FROM (
  SELECT q.vec_id AS q_id, v.vec_id AS vec_id,
         ROUND(list_cosine_similarity(v.embedding::DOUBLE[],
                                      q.embedding::DOUBLE[]), 6) AS cos,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(v.embedding::DOUBLE[],
                                           q.embedding::DOUBLE[]) DESC,
                    v.vec_id) AS rank
  FROM embeddings v, embeddings q
  WHERE q.vec_id < 5 AND v.vec_id <> q.vec_id
    AND v.embedding[1]::DOUBLE
        BETWEEN q.embedding[1]::DOUBLE - 0.1 AND q.embedding[1]::DOUBLE + 0.1
    AND v.embedding[2]::DOUBLE
        BETWEEN q.embedding[2]::DOUBLE - 0.1 AND q.embedding[2]::DOUBLE + 0.1)
WHERE rank <= 10
"""


def dedup_canonical(spark, sf_dir):
    """Near-dup clustering: Jaccard candidate pairs -> connected
    components (iterative min-label propagation) -> (doc, canonical)
    mapping, i.e. 'keep one representative per duplicate cluster'."""
    from .operators.dedup import connected_components, jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, n=3, threshold=0.5)
    cc = connected_components(pairs)
    return cc.select(cc.node.alias("doc_id"),
                     cc.canonical.alias("canonical_id"))


def _cc_ctes(pairs_sql: str, prefix: str = "") -> str:
    """The ONE SQL replay of operators.dedup.connected_components —
    recursive-CTE reachability closure + min-label — shared by every
    doc-id oracle that needs canonical ids (dedup_canonical and the
    train_assembly leakage_safe branch). Keeping a single template
    means a future change to the CC replay cannot silently
    de-synchronize the two oracle rows (r5 review). ``prefix``
    namespaces the CTE names inside a larger WITH chain; the caller
    reads (node, canonical) from ``{prefix}canon``."""
    p = prefix
    return f"""{p}pairs AS ({pairs_sql}),
{p}edges AS (SELECT id1 AS a, id2 AS b FROM {p}pairs
             UNION SELECT id2, id1 FROM {p}pairs),
{p}reach(node, lbl) AS (
  SELECT a, a FROM {p}edges
  UNION
  SELECT e.b, r.lbl FROM {p}reach r JOIN {p}edges e ON r.node = e.a),
{p}canon AS (SELECT node, MIN(lbl) AS canonical FROM {p}reach
             GROUP BY node)"""


def _dd_canonical_sql() -> str:
    from .queries_common import DD_JACCARD_SQL

    ctes = _cc_ctes(DD_JACCARD_SQL.strip().rstrip(";"))
    return (f"WITH RECURSIVE {ctes}\n"
            f"SELECT node AS doc_id, canonical AS canonical_id "
            f"FROM canon")


def q_funnel(spark, sf_dir):
    """Sequential-pattern (funnel) analysis: per user, did a 'view' get
    followed by a 'purchase' within 1 hour? One shuffle on user_id, then a
    forward-looking window min — no self-join, no pattern-matching UDF.
    Output: per-user funnel flags + global conversion counts per step."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir)
    w = (Window.partitionBy("user_id").orderBy("ts_us", "event_id")
         .rowsBetween(1, Window.unboundedFollowing))
    # for every view event: earliest later purchase time for the same user
    flagged = (ev.withColumn(
        "_next_purchase_us",
        F.min(F.when(F.col("event_type") == "purchase",
                     F.col("ts_us"))).over(w))
        .where(F.col("event_type") == "view")
        .withColumn("_converted",
                    (F.col("_next_purchase_us") - F.col("ts_us"))
                    <= F.lit(3_600_000_000)))
    per_user = (flagged.groupBy("user_id")
                .agg(F.count("*").alias("n_views"),
                     F.sum(F.when(F.col("_converted"), 1).otherwise(0))
                     .alias("n_converted_views")))
    return (per_user.agg(
        F.count("*").alias("n_users_with_views"),
        F.sum("n_views").alias("total_views"),
        F.sum("n_converted_views").alias("total_converted_views"),
        F.sum(F.when(F.col("n_converted_views") > 0, 1).otherwise(0))
        .alias("n_users_converted")))


Q_FUNNEL_SQL = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   - epoch_us(ts) <= 3600000000
              THEN 1 ELSE 0 END AS converted,
         event_type
  FROM events),
per_user AS (
  SELECT user_id, COUNT(*) AS n_views,
         SUM(converted) AS n_converted_views
  FROM flagged WHERE event_type = 'view' GROUP BY user_id)
SELECT COUNT(*) AS n_users_with_views,
       CAST(SUM(n_views) AS BIGINT) AS total_views,
       CAST(SUM(n_converted_views) AS BIGINT) AS total_converted_views,
       CAST(SUM(CASE WHEN n_converted_views > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_users_converted
FROM per_user
"""


def q_json_extract(spark, sf_dir):
    """JSON scalar functions over the events.props payload column:
    extract, cast, bucket, aggregate — all JVM-side (get_json_object)."""
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
            .agg(F.count("*").alias("n"),
                 F.sum("k").alias("sum_k"),
                 F.max("k").alias("max_k")))


Q_JSON_SQL = """
SELECT event_type, CAST(props->>'k' AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(props->>'k' AS BIGINT)) AS max_k
FROM events
GROUP BY 1, 2
"""


_EV_CACHE: Dict[str, str] = {}


def _indexed_events(spark, sf_dir):
    """Events OTree-indexed on (ts_us:quantiles, user_id) — the
    hypertable pattern: time is just another indexed dimension, so
    time-slice + user-slice queries prune files multi-dimensionally with
    no special-cased time-partitioning scheme. The time axis uses the O4
    quantile transformer (core/transform.py QuantilesTransformation;
    reference utils/QbeastUtils.scala:58-148) over quantiles computed by
    functions/selection.compute_quantiles — event timestamps are heavily
    skewed toward the recent end, and a linear [min,max] mapping would
    concentrate most rows in a sliver of the index space; the CDF
    mapping equidistributes them (r7 verdict task 5: this is the driver
    row exercising the quantile transform path, under qb_events_timeslice's
    unchanged oracle)."""
    import os
    import shutil

    from .functions.selection import compute_quantiles
    from .sources.log import CommitLog
    from .sources.writer import write_qbeast

    key = os.path.abspath(sf_dir)
    # cache name versions the RECIPE ('_q' = quantile time axis, r8): a
    # warm host's pre-r8 'events' dir would otherwise pass the
    # exists-check and silently keep serving the old linear index
    path = _EV_CACHE.get(key) or _cache_path(sf_dir, "events_q")
    # reclaim the pre-r8 recipe's cache dir (old linear index)
    # unconditionally — nothing reads it anymore and it is a full
    # table copy
    shutil.rmtree(_cache_path(sf_dir, "events"), ignore_errors=True)
    if not CommitLog(path).exists():
        shutil.rmtree(path, ignore_errors=True)
        ev = _events(spark, sf_dir)
        import pyarrow.parquet as pq
        n = pq.ParquetFile(
            os.path.join(sf_dir, "events.parquet")).metadata.num_rows
        qs = compute_quantiles(ev, "ts_us", 32)
        write_qbeast(ev, path,
                     columns_to_index=["ts_us:quantiles", "user_id"],
                     cube_size=max(500, n // 32),
                     column_stats={"ts_us": {"quantiles": qs}})
    _EV_CACHE[key] = path
    return path


def qb_events_timeslice(spark, sf_dir):
    """Pruned time-slice + user-slice read over the time-indexed events
    table, then a per-type aggregate — the hypertable query shape."""
    from pyspark.sql import functions as F

    from .sources.reader import QbeastTable

    path = _indexed_events(spark, sf_dir)
    qt = QbeastTable.for_path(spark, path)
    # 2024-01-10T00:00Z .. 2024-01-12T00:00Z, users 0..400
    lo = 1704844800000000
    hi = 1705017600000000
    sliced = qt.read([("ts_us", ">=", lo), ("ts_us", "<", hi),
                      ("user_id", "<", 400)])
    return (sliced.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(_cents(F.col("value"))).alias("value_cents")))


QB_EVENTS_TIMESLICE_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
WHERE epoch_us(ts) >= 1704844800000000 AND epoch_us(ts) < 1705017600000000
  AND user_id < 400
GROUP BY 1
"""


def dedup_lsh_scored(spark, sf_dir):
    """MinHash pipeline completion: LSH candidates scored by the
    signature-agreement Jaccard estimate and thresholded."""
    from .operators.dedup import lsh_pairs_scored

    docs = _t(spark, sf_dir, "documents")
    return lsh_pairs_scored(docs, n=3, threshold=0.5)


def _lsh_scored_sql() -> str:
    from .operators.dedup import MINHASH_PERMS
    from .queries_common import _lsh_sql

    n = len(MINHASH_PERMS)
    agree = " + ".join(
        f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END" for j in range(n))
    # reuse the candidate-pair SQL as a CTE; its own WITH-chain already
    # defines `sigs`, so wrap the final select and re-join signatures.
    cand_sql = _lsh_sql().strip()
    head, _, final = cand_sql.partition("SELECT DISTINCT")
    return (head
            + f", cands AS (SELECT DISTINCT{final})\n"
            + f"""SELECT c.id1, c.id2,
       ROUND(({agree})::DOUBLE / {n}, 6) AS est_jaccard
FROM cands c JOIN sigs sa ON c.id1 = sa.doc_id
             JOIN sigs sb ON c.id2 = sb.doc_id
WHERE ROUND(({agree})::DOUBLE / {n}, 6) >= 0.5
""")


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified downsampling of documents by language:
    keep 30% of 'en' (over-represented), 100% of everything else, with the
    keep-decision a pure function of doc_id — exactly replayable by the
    oracle."""
    from pyspark.sql import functions as F

    from .operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    kept = stratified_sample(docs, "lang", {"en": 0.3}, id_col="doc_id")
    return (kept.groupBy("lang")
            .agg(F.count("*").alias("n_kept"),
                 F.sum(F.col("n_chars").cast("long")).alias("chars_kept")))


Q_STRATIFIED_SQL = """
SELECT lang, COUNT(*) AS n_kept,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars_kept
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      / 4294967296.0
      < CASE WHEN lang = 'en' THEN 0.3 ELSE 1.0 END
GROUP BY lang
"""


def q12_21_late_lines(spark, sf_dir):
    """TPC-H q12 + q21 shapes adapted to the reduced schema (no
    l_shipmode/l_commitdate/l_receiptdate — lateness proxies from
    l_shipdate vs o_orderdate, category proxy = l_returnflag), one
    labeled long result. This completes the feasible TPC-H coverage:
    1,3-8,10,12-15,17-19,21,22 all registered; 2/9/11/16/20 need the
    partsupp table the testdata does not ship.

    q12 branch: per category, line counts split by order priority for
    1997 shipments (join + conditional aggregation).
    q21 branch: suppliers who were the SOLE late supplier of a
    multi-supplier finished order (the double-EXISTS shape, computed
    scale-safely as two per-order aggregates joined back — no
    correlated re-scan per row)."""
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    # --- q12: priority split per category over 1997 shipments
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    q12 = (li.where(F.year("l_shipdate") == 1997)
           .join(o, li.l_orderkey == o.o_orderkey)
           .groupBy(F.col("l_returnflag").alias("grp"))
           .agg(F.count(F.when(hi, 1)).alias("high_line_count"),
                F.count(F.when(~hi, 1)).alias("low_line_count")))
    q12_long = q12.select(
        F.lit("q12").alias("probe"), "grp",
        F.create_map(F.lit("high"), F.col("high_line_count"),
                     F.lit("low"), F.col("low_line_count")).alias("_m"))
    q12_long = (q12_long.select("probe", "grp", F.explode("_m")
                                .alias("metric", "n")))
    # --- q21: sole-late supplier of multi-supplier 'F' orders
    lateness = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 90 DAY")
    lines = (li.join(o.where(F.col("o_orderstatus") == "F"),
                     li.l_orderkey == o.o_orderkey)
             .select("l_orderkey", "l_suppkey", lateness.alias("_late")))
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_nsupp"),
        F.countDistinct(F.when(F.col("_late"), F.col("l_suppkey")))
        .alias("_nlate"))
    waiting = (lines.where(F.col("_late"))
               .select("l_orderkey", "l_suppkey").distinct()
               .join(per_order.where((F.col("_nsupp") > 1)
                                     & (F.col("_nlate") == 1)),
                     "l_orderkey"))
    s = _t(spark, sf_dir, "supplier")
    q21 = (waiting.join(F.broadcast(s),
                        waiting.l_suppkey == s.s_suppkey)
           .groupBy(F.col("s_name").alias("grp"))
           .agg(F.count("*").alias("n"))
           .select(F.lit("q21").alias("probe"), "grp",
                   F.lit("numwait").alias("metric"), "n"))
    return q12_long.unionByName(q21)


Q12_21_SQL = """
SELECT 'q12' AS probe, l_returnflag AS grp, m.metric, m.n
FROM (
  SELECT l_returnflag,
         COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 END) AS high_n,
         COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 END) AS low_n
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(l_shipdate) = 1997
  GROUP BY l_returnflag),
LATERAL (VALUES ('high', high_n), ('low', low_n)) AS m(metric, n)
UNION ALL
SELECT 'q21' AS probe, s_name AS grp, 'numwait' AS metric, COUNT(*) AS n
FROM supplier,
     (SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l.l_orderkey
                      AND l2.l_suppkey <> l.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                        WHERE l3.l_orderkey = l.l_orderkey
                          AND l3.l_suppkey <> l.l_suppkey
                          AND l3.l_shipdate > o3.o_orderdate
                              + INTERVAL 90 DAY)) w
WHERE w.l_suppkey = s_suppkey
GROUP BY s_name
"""


def train_assembly(spark, sf_dir):
    """Training-set assembly (operators/training.py): token-bounded
    chunking with overlap (pure JVM higher-order functions — sequence /
    slice / concat_ws, no UDF) + deterministic train/val/test splits
    (md5-as-uniform so any engine can replay the assignment). One
    projection chain over documents; per-chunk rows keep the chunk text
    so the oracle checks the actual token slicing, not just counts.

    r5 adds the 'leakage_safe' branch: ``leakage_safe_split`` assigns
    each document by the md5 of its duplicate-cluster CANONICAL id
    (LSH-scored pairs -> connected components), so near-duplicates
    never straddle train/eval. The oracle replays the whole
    composition — banded MinHash candidates, signature-agreement
    threshold, recursive-CTE connected components, md5 split — in SQL,
    putting the contamination-safe split under the strict driver gate."""
    from pyspark.sql import functions as F

    from .operators.dedup import connected_components, lsh_pairs_scored
    from .operators.training import (chunk_text, hash_split,
                                     leakage_safe_split)

    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    docs = _t(spark, sf_dir, "documents")
    chunks = chunk_text(docs, max_tokens=32, overlap=8)
    chunk_branch = hash_split(chunks, w, id_col="doc_id",
                              method="md5").select(
        F.lit("chunks").alias("probe"),
        "doc_id", "chunk_id", "n_tokens", "chunk", "split")
    pairs = lsh_pairs_scored(docs, n=3, threshold=0.5)
    canon = connected_components(pairs)
    ls_branch = leakage_safe_split(docs, canon, w, id_col="doc_id",
                                   method="md5").select(
        F.lit("leakage_safe").alias("probe"), "doc_id",
        F.lit(None).cast("int").alias("chunk_id"),
        F.lit(None).cast("int").alias("n_tokens"),
        F.lit(None).cast("string").alias("chunk"), "split")
    return chunk_branch.unionByName(ls_branch)


def _train_assembly_sql() -> str:
    from .operators.text import TOKEN_RE

    # replicate hash_split's cumulative thresholds with the SAME Python
    # float accumulation (0.9 + 0.05 != 0.95 exactly; the literals must
    # match bit-for-bit in both engines)
    weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    case, acc = "CASE", 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        case += f" WHEN u < {acc!r} THEN '{name}'"
    case += f" ELSE '{names[-1]}' END"
    # the leakage_safe branch replays the full dedup composition: the
    # LSH-scored pair query (same SQL the dedup_lsh_scored row proves)
    # feeds the recursive-CTE connected components (the dedup_canonical
    # machinery), and the split key is COALESCE(canonical, doc_id)
    cc_ctes = _cc_ctes(_lsh_scored_sql().strip().rstrip(";"),
                       prefix="ls")
    # chunk geometry must mirror chunk_text(max_tokens=32, overlap=8):
    # starts 0,24,48.. while start <= greatest(n-overlap-1, 0)
    return f"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '{TOKEN_RE}') AS t,
         len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n
  FROM documents),
starts AS (
  SELECT doc_id, t, unnest(generate_series(0, greatest(n - 8 - 1, 0), 24))
           AS start
  FROM toks WHERE n > 0),
chunks AS (
  SELECT doc_id, CAST(start / 24 AS INTEGER) AS chunk_id,
         t[start + 1 : start + 32] AS ct
  FROM starts),
u AS (
  SELECT doc_id, chunk_id,
         CAST(len(ct) AS INTEGER) AS n_tokens,
         array_to_string(ct, ' ') AS chunk,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8))
              AS BIGINT) / 4294967296.0 AS u
  FROM chunks),
{cc_ctes},
lsu AS (
  SELECT d.doc_id,
         CAST(('0x' || substr(md5(CAST(COALESCE(c.canonical, d.doc_id)
                                       AS VARCHAR) || ':42'), 1, 8))
              AS BIGINT) / 4294967296.0 AS u
  FROM documents d LEFT JOIN lscanon c ON d.doc_id = c.node)
SELECT 'chunks' AS probe, doc_id, chunk_id, n_tokens, chunk,
       {case} AS split
FROM u
UNION ALL
SELECT 'leakage_safe' AS probe, doc_id, CAST(NULL AS INTEGER) AS chunk_id,
       CAST(NULL AS INTEGER) AS n_tokens, CAST(NULL AS VARCHAR) AS chunk,
       {case} AS split
FROM lsu
"""


def qb_time_cdf(spark, sf_dir):
    """Time travel + Change Data Feed under one oracle (sources/cdf.py,
    reader.to_df(version=...)): fresh indexed table from a lineitem
    slice (v0), CDF enabled (v1), append (v2), DELETE of a key range
    (v3). Result = the v0 snapshot read back AS OF version 0 ('v0'
    branch) unioned with the decoded change feed for v2..v3 ('cdf'
    branch: the append's insert rows from file actions alone + the
    delete's recorded pre-images). Everything derives from the source
    parquet, so DuckDB replays it exactly. The FIRST call in a process
    builds v0..v2 from scratch; later calls RESTORE to the pre-delete
    version instead (metadata-only), then re-run the delete — the AS OF
    v0 read and the v2..3 change decode return byte-identical values
    either way, and a fresh process (the driver's correctness run)
    always rebuilds (VERDICT r5 Next #7)."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from . import write_qbeast
    from .sources.reader import QbeastTable

    import os as _os

    import time as _time

    path = _cache_path(sf_dir, "lineitem_timecdf")
    cols = ["l_orderkey", "l_extendedprice", "l_quantity", "l_returnflag"]
    li = _t(spark, sf_dir, "lineitem").select(*cols)
    LAST_TIMECDF_PHASES.clear()
    _t0 = _time.time()
    qt = None
    if _TIMECDF_BASE.get(path) is not None and _os.path.exists(path):
        try:
            qt = QbeastTable.for_path(spark, path)
            qt.restore(_TIMECDF_BASE[path])
        except Exception:
            qt = None
    if qt is None:
        _sh.rmtree(path, ignore_errors=True)
        write_qbeast(li.where("l_orderkey < 3000"), path,
                     columns_to_index=["l_orderkey", "l_extendedprice"],
                     cube_size=5000)                              # v0
        qt = QbeastTable.for_path(spark, path)
        qt.enable_change_data_feed()                              # v1
        write_qbeast(li.where("l_orderkey >= 3000 AND l_orderkey < 4000"),
                     path,
                     columns_to_index=["l_orderkey", "l_extendedprice"],
                     cube_size=5000, mode="append")               # v2
        _TIMECDF_BASE[path] = qt.snapshot(refresh=True).version
    # table construction is one-time setup (bench reports it as a
    # submetric, same convention as qb_dml.setup); the headline is the
    # CDF-recording delete + the AS OF read + the change-feed decode
    LAST_TIMECDF_PHASES["setup"] = _time.time() - _t0
    qt.delete([("l_orderkey", "<", 500)])                         # v3
    asof = (qt.to_df(version=0).select(*cols)
            .withColumn("branch", F.lit("v0"))
            .withColumn("change_type", F.lit("snapshot")))
    cdf = (qt.table_changes(2, 3)
           .select(*cols, F.lit("cdf").alias("branch"),
                   F.col("_change_type").alias("change_type")))
    return asof.unionByName(cdf)


# per-phase wall time of the last qb_time_cdf call (bench submetric)
LAST_TIMECDF_PHASES: Dict[str, float] = {}

# in-process map of the probe's pre-delete base version: later calls
# restore instead of rebuilding (never persisted — new processes rebuild)
_TIMECDF_BASE: Dict[str, int] = {}


QB_TIME_CDF_SQL = """
SELECT l_orderkey, l_extendedprice, l_quantity, l_returnflag,
       'v0' AS branch, 'snapshot' AS change_type
FROM lineitem WHERE l_orderkey < 3000
UNION ALL
SELECT l_orderkey, l_extendedprice, l_quantity, l_returnflag,
       'cdf' AS branch, 'insert' AS change_type
FROM lineitem WHERE l_orderkey >= 3000 AND l_orderkey < 4000
UNION ALL
SELECT l_orderkey, l_extendedprice, l_quantity, l_returnflag,
       'cdf' AS branch, 'delete' AS change_type
FROM lineitem WHERE l_orderkey < 500
"""


def dedup_semantic(spark, sf_dir):
    """SemDeDup-style semantic dedup (operators/similarity.py
    semantic_dedup): hyperplane-LSH candidate pairs over two disjoint
    dimension slices, exact-cosine rerank, then min-label connected
    components so paraphrase chains collapse transitively. One row per
    input vector: (vec_id, canonical_id, is_duplicate). The oracle
    replays the identical LSH geometry and closes the components with a
    recursive CTE."""
    from pyspark.sql import functions as F

    from .operators.similarity import semantic_dedup

    emb = (_t(spark, sf_dir, "embeddings")
           .where(F.col("vec_id") < 300))
    return semantic_dedup(emb, threshold=0.3, n_bits=8, n_tables=2)


DEDUP_SEMANTIC_SQL = """
WITH RECURSIVE base AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
tagged AS (
  SELECT vec_id, embedding,
         list_aggregate(list_transform(embedding[1:8],
             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END),
             'string_agg', '') AS b0,
         list_aggregate(list_transform(embedding[9:16],
             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END),
             'string_agg', '') AS b1
  FROM base),
pairs AS (
  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
  FROM tagged a JOIN tagged b
    ON a.vec_id < b.vec_id AND (a.b0 = b.b0 OR a.b1 = b.b1)
  WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]), 6) >= 0.3),
edges AS (
  SELECT id1 AS a, id2 AS b FROM pairs
  UNION ALL SELECT id2 AS a, id1 AS b FROM pairs),
walk(node, lbl) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, w.lbl FROM edges e JOIN walk w ON w.node = e.b),
canon AS (SELECT node, MIN(lbl) AS canonical FROM walk GROUP BY node)
SELECT v.vec_id,
       COALESCE(c.canonical, v.vec_id) AS canonical_id,
       COALESCE(c.canonical, v.vec_id) <> v.vec_id AS is_duplicate
FROM base v LEFT JOIN canon c ON v.vec_id = c.node
"""


# ---------------------------------------------------------------------------
# The partsupp suite: TPC-H q2 / q9 / q11 / q16 / q20 (r5)
# ---------------------------------------------------------------------------

# The testdata ships no partsupp table, so the five TPC-H shapes that
# need one (q2 correlated-min, q9 profit rollup, q11 HAVING-over-scalar-
# subquery, q16 anti-join distinct-count, q20 nested-IN with correlated
# aggregate) derive it DETERMINISTICALLY from lineitem: one row per
# distinct (l_partkey, l_suppkey) with arithmetic cost/availability.
# The identical derivation runs as a CTE in the DuckDB oracle, so both
# engines aggregate the same table — the qb_time_cdf precedent for
# making otherwise-untestable shapes oracle-checkable.

_PARTSUPP_CTE = """
WITH partsupp AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         ((l_partkey*37 + l_suppkey*17) % 1000) / 10.0 + 1.0 AS ps_supplycost,
         (l_partkey*13 + l_suppkey*7) % 9999 + 1 AS ps_availqty
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
)
"""


# in-process memo of materialized derived-partsupp paths (never
# persisted across processes: a fresh process re-derives once, so
# regenerated testdata can never serve a stale dimension)
_PARTSUPP_PATHS: Dict[str, str] = {}


def _partsupp(spark, sf_dir):
    """Derived partsupp dimension (see _PARTSUPP_CTE), MATERIALIZED
    once per process (r6 — the production pattern the r5 verdict
    pointed at): the first call runs the one distinct-shuffle over two
    int columns (result bounded by |part| x |supplier| —
    dimension-sized, broadcastable) and writes it as parquet under
    /tmp/qss_tables; every consumer then SCANS the table. Within the
    suite's single union plan Catalyst's ReusedExchange already shared
    the distinct, but the union still planned 7 dimension-sized
    exchanges — as a table it contributes 7 small parquet scans and
    zero derivation shuffles, and at 100 TB the derivation runs once
    per corpus version instead of once per query."""
    import os as _os

    from pyspark.sql import functions as F

    key = _os.path.abspath(sf_dir)
    path = _PARTSUPP_PATHS.get(key) or _cache_path(sf_dir, "partsupp_derived")
    # on-disk _SUCCESS gates the rebuild (same pattern as
    # _indexed_lineitem/_indexed_embeddings): a fresh process reuses a
    # previously materialized table instead of overwriting it out from
    # under another process's in-flight scans; the derivation is pure
    # in sf_dir so reuse is always valid
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        li = _t(spark, sf_dir, "lineitem")
        pk, sk = F.col("l_partkey"), F.col("l_suppkey")
        (li.select("l_partkey", "l_suppkey").distinct()
         .select(pk.alias("ps_partkey"), sk.alias("ps_suppkey"),
                 (((pk * 37 + sk * 17) % 1000) / F.lit(10.0) + 1.0)
                 .alias("ps_supplycost"),
                 ((pk * 13 + sk * 7) % 9999 + 1).alias("ps_availqty"))
         .coalesce(4).write.mode("overwrite").parquet(path))
    _PARTSUPP_PATHS[key] = path
    return spark.read.parquet(path)


def q2_9_11_16_20_partsupp(spark, sf_dir):
    """The five partsupp-dependent TPC-H shapes as one labeled result
    over the shared (shape, k1, k2, k3, v1) schema — completing the
    feasible-TPC-H set (1,3-8,10,12-22). Constants are adapted to the
    reduced testdata domains (p_type ECONOMY/SMALL/..., NATION_n names,
    s_acctbal<0 standing in for the complaints filter) while each
    query's SHAPE is kept intact; oracle equality per
    QbeastFilterPushdownTest.scala:187-195 style.

    - q2: min-cost supplier per part within a region — correlated-min
      via a partitioned window over the region-filtered join (one
      shuffle; no per-row subquery).
    - q9: profit rollup by nation x order-year across a 6-way join.
    - q11: value per part HAVING > fraction of a global total — scalar
      total broadcast-crossed, never a single-partition window.
    - q16: distinct supplier count per part attribute with a broadcast
      anti-join exclusion list.
    - q20: nested-IN: suppliers whose availability beats half the 1996
      shipped quantity for the parts they supply — the correlated
      aggregate becomes a keyed pre-aggregation + equi-join.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # r6: _partsupp is MATERIALIZED (derived once per process, read as
    # a table by every branch) — the production pattern, replacing the
    # r5 design where the union plan carried 7 dimension-sized distinct
    # exchanges. .persist() remains deliberately avoided: it would pin
    # cache with no unpersist hook and rewrite audited plans to
    # InMemoryTableScan, hiding the scans plan_audit inspects.
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    s_k1 = lambda c: F.col(c).cast("string").alias("k1")        # noqa: E731
    nul_s = lambda a: F.lit(None).cast("string").alias(a)       # noqa: E731
    nul_l = lambda a: F.lit(None).cast("bigint").alias(a)       # noqa: E731

    # -- q2: correlated min over the region-filtered (part, supplier) --
    p2 = part.where((F.col("p_size") <= 12)
                    & (F.col("p_type") == "ECONOMY"))
    eu = (supplier
          .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(region.where(F.col("r_name") == "EUROPE")),
                F.col("n_regionkey") == F.col("r_regionkey")))
    j2 = (ps.join(F.broadcast(p2), F.col("ps_partkey") == F.col("p_partkey"))
          .join(F.broadcast(eu), F.col("ps_suppkey") == F.col("s_suppkey")))
    w2 = Window.partitionBy("p_partkey")
    q2 = (j2.withColumn("_min_cost", F.min("ps_supplycost").over(w2))
          .where(F.col("ps_supplycost") == F.col("_min_cost"))
          .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                   "p_partkey")
          .limit(100)
          .select(F.lit("q2").alias("shape"), s_k1("s_name"),
                  F.col("n_name").alias("k2"),
                  F.col("p_partkey").cast("bigint").alias("k3"),
                  _cents(F.col("s_acctbal")).alias("v1")))

    # -- q9: profit by nation x year ----------------------------------
    p9 = part.where(F.col("p_name").like("%red%")).select("p_partkey")
    amount_cents = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity"))
    j9 = (li.join(F.broadcast(p9), F.col("l_partkey") == F.col("p_partkey"))
          .join(ps, (F.col("l_partkey") == F.col("ps_partkey"))
                & (F.col("l_suppkey") == F.col("ps_suppkey")))
          .join(F.broadcast(supplier),
                F.col("l_suppkey") == F.col("s_suppkey"))
          .join(F.broadcast(nation),
                F.col("s_nationkey") == F.col("n_nationkey"))
          .join(orders, F.col("l_orderkey") == F.col("o_orderkey")))
    q9 = (j9.groupBy(F.col("n_name"),
                     F.year("o_orderdate").alias("_yr"))
          .agg(F.sum(amount_cents).alias("v1"))
          .select(F.lit("q9").alias("shape"), s_k1("n_name"),
                  F.col("_yr").cast("string").alias("k2"), nul_l("k3"),
                  "v1"))

    # -- q11: per-part value above a fraction of the global total -----
    s11 = (supplier.join(
        F.broadcast(nation.where(F.col("n_name") == "NATION_3")),
        F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey"))
    val = (ps.join(F.broadcast(s11),
                   F.col("ps_suppkey") == F.col("s_suppkey"))
           .groupBy("ps_partkey")
           .agg(F.sum(_cents(F.col("ps_supplycost")
                             * F.col("ps_availqty"))).alias("value_cents")))
    # r12: `val` feeds BOTH the scalar threshold and the filtered output
    # side; without materialization Catalyst plans the whole subtree
    # (partsupp scan -> broadcast join -> partkey exchange -> agg) twice
    # and runtime exchange reuse never fires across the crossJoin
    # boundary (verified: 0 ReusedExchange in the executed plan).
    # localCheckpoint runs it once — val is dimension-sized (one row per
    # part), so pinning it is bounded at any corpus scale (guide §3.3).
    val = val.localCheckpoint(eager=True)
    # scale-stable threshold: 2x the average per-part value (a fixed
    # fraction of the total empties as |part| grows, TPC-H scales its
    # 0.0001 by 1/SF — this is the SF-free equivalent)
    total = val.agg((2.0 * F.sum("value_cents") / F.count("*"))
                    .alias("_thresh"))
    q11 = (val.crossJoin(F.broadcast(total))
           .where(F.col("value_cents") > F.col("_thresh"))
           .select(F.lit("q11").alias("shape"), nul_s("k1"), nul_s("k2"),
                   F.col("ps_partkey").cast("bigint").alias("k3"),
                   F.col("value_cents").alias("v1")))

    # -- q16: distinct suppliers per attribute, exclusion anti-join ---
    p16 = part.where((F.col("p_brand") != "Brand#13")
                     & ~F.col("p_type").like("MEDIUM%")
                     & F.col("p_size").isin(9, 14, 19, 23, 36, 45, 49))
    bad = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    j16 = (ps.join(F.broadcast(p16),
                   F.col("ps_partkey") == F.col("p_partkey"))
           .join(F.broadcast(bad),
                 F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti"))
    q16 = (j16.groupBy("p_brand", "p_type", "p_size")
           .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
           .select(F.lit("q16").alias("shape"), s_k1("p_brand"),
                   F.col("p_type").alias("k2"),
                   F.col("p_size").cast("bigint").alias("k3"),
                   F.col("supplier_cnt").alias("v1")))

    # -- q20: availability beats half the 1996 shipped quantity -------
    p20 = part.where(F.col("p_name").like("small%")).select("p_partkey")
    li96 = (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz")))
        .groupBy("l_partkey", "l_suppkey")
        .agg((0.5 * F.sum("l_quantity")).alias("_half_qty")))
    cand = (ps.join(F.broadcast(p20),
                    F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
            .join(li96, (F.col("ps_partkey") == F.col("l_partkey"))
                  & (F.col("ps_suppkey") == F.col("l_suppkey")))
            .where(F.col("ps_availqty") > F.col("_half_qty"))
            .select("ps_suppkey").distinct())
    q20 = (supplier.join(
        F.broadcast(nation.where(F.col("n_name") == "NATION_3")),
        F.col("s_nationkey") == F.col("n_nationkey"))
        .join(cand, F.col("s_suppkey") == F.col("ps_suppkey"),
              "left_semi")
        .select(F.lit("q20").alias("shape"), s_k1("s_name"), nul_s("k2"),
                F.col("s_suppkey").cast("bigint").alias("k3"),
                nul_l("v1")))

    return q2.unionByName(q9).unionByName(q11).unionByName(q16) \
        .unionByName(q20)


Q2_9_11_16_20_SQL = _PARTSUPP_CTE + """
(SELECT 'q2' AS shape, s_name AS k1, n_name AS k2,
       CAST(p_partkey AS BIGINT) AS k3,
       CAST(ROUND(s_acctbal*100,0) AS BIGINT) AS v1
FROM partsupp, supplier, nation, region, part
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size <= 12 AND p_type = 'ECONOMY'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost = (
      SELECT MIN(ps2.ps_supplycost)
      FROM partsupp ps2, supplier s2, nation n2, region r2
      WHERE ps2.ps_partkey = part.p_partkey
        AND s2.s_suppkey = ps2.ps_suppkey
        AND s2.s_nationkey = n2.n_nationkey
        AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100)
UNION ALL
SELECT 'q9', nation, CAST(o_year AS VARCHAR), CAST(NULL AS BIGINT),
       SUM(amount_cents)
FROM (SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
             CAST(ROUND((l_extendedprice*(1-l_discount)
                         - ps_supplycost*l_quantity)*100,0) AS BIGINT)
               AS amount_cents
      FROM lineitem, partsupp, part, supplier, nation, orders
      WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
        AND ps_partkey = l_partkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%') profit
GROUP BY nation, o_year
UNION ALL
SELECT 'q11', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(ps_partkey AS BIGINT), value_cents
FROM (SELECT ps_partkey,
             SUM(CAST(ROUND(ps_supplycost*ps_availqty*100,0) AS BIGINT))
               AS value_cents
      FROM partsupp, supplier, nation
      WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_3'
      GROUP BY ps_partkey) v
WHERE value_cents > (
      SELECT 2.0*SUM(value_cents)/COUNT(*)
      FROM (SELECT ps_partkey,
                   SUM(CAST(ROUND(ps_supplycost*ps_availqty*100,0)
                            AS BIGINT)) AS value_cents
            FROM partsupp, supplier, nation
            WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_3'
            GROUP BY ps_partkey) tot)
UNION ALL
SELECT 'q16', p_brand, p_type, CAST(p_size AS BIGINT),
       COUNT(DISTINCT ps_suppkey)
FROM partsupp, part
WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (9, 14, 19, 23, 36, 45, 49)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                         WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
UNION ALL
SELECT 'q20', s_name, CAST(NULL AS VARCHAR), CAST(s_suppkey AS BIGINT),
       CAST(NULL AS BIGINT)
FROM supplier, nation
WHERE s_suppkey IN (
      SELECT ps_suppkey FROM partsupp
      WHERE ps_partkey IN (SELECT p_partkey FROM part
                           WHERE p_name LIKE 'small%')
        AND ps_availqty > (
            SELECT 0.5*SUM(l_quantity) FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'))
  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
"""


EXT_QUERIES: Dict[str, Tuple[Callable, Optional[str]]] = {
    "q12_21_late_lines": (q12_21_late_lines, Q12_21_SQL),
    "train_assembly": (train_assembly, _train_assembly_sql()),
    "qb_time_cdf": (qb_time_cdf, QB_TIME_CDF_SQL),
    "dedup_semantic": (dedup_semantic, DEDUP_SEMANTIC_SQL),
    "qb_events_timeslice": (qb_events_timeslice, QB_EVENTS_TIMESLICE_SQL),
    "q_stratified_sample": (q_stratified_sample, Q_STRATIFIED_SQL),
    "dedup_lsh_scored": (dedup_lsh_scored, _lsh_scored_sql()),
    "q_funnel": (q_funnel, Q_FUNNEL_SQL),
    "q_json_extract": (q_json_extract, Q_JSON_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "dedup_canonical": (dedup_canonical, _dd_canonical_sql()),
    "q_interval_join": (q_interval_join, Q_INTERVAL_SQL),
    "sim_otree_topk": (sim_otree_topk, SIM_OTREE_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    # q14 merged into q17_19 in r5 (same lineitem-x-part family) to free
    # the slot for the partsupp suite; q14_promo_effect stays importable
    "q17_19_part_predicates": (q17_small_quantity, Q17_SQL),
    "q2_9_11_16_20_partsupp": (q2_9_11_16_20_partsupp,
                               Q2_9_11_16_20_SQL),
    "q18_large_volume": (q18_large_volume, Q18_SQL),
    "q22_inactive_rich": (q22_inactive_rich, Q22_SQL),
    "q_ntile_quartiles": (q_ntile_quartiles, Q_NTILE_SQL),
    "q_pivot": (q_pivot, Q_PIVOT_SQL),
}
