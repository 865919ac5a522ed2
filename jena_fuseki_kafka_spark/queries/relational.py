"""Relational query suite over the TPC-H-ish tables.

Each query exercises one or more operators from SURVEY.md §2B's SPARQL->
Spark mapping table (BGP joins, OPTIONAL/left join, UNION, FILTER/EXISTS/
MINUS, aggregates, HAVING, ORDER/LIMIT/OFFSET, subqueries, VALUES) plus the
engine-grade relational operators the reference delegates to its query layer
(windows, rollup; SURVEY.md §2C).

Determinism notes (the driver value-hashes results):
- double aggregates go through DECIMAL so the sum is exact and
  order-independent, then cast back to double — identical in Spark & DuckDB.
- every ORDER BY carries a unique tiebreaker before any LIMIT.

Scale notes: filters are expressed on scan columns so they push into
parquet; only provably constant-size inputs (region, nation, VALUES inline
tables, 1-row scalar aggregates) carry explicit ``F.broadcast`` hints —
SF-scaled relations (customer/supplier/part) are left unhinted so AQE picks
broadcast-vs-shuffle from actual runtime sizes: at sf0.1 the physical plan is
identical (AQE still broadcasts them), while at the 100 TB design point a
forced broadcast of an SF-scaled table would collect an unbounded build side
on every executor and OOM.  Aggregates are partial-agg friendly (no
distinct-heavy shapes except where the operator itself is DISTINCT).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import finite_spark, load, query

# Exact, order-independent, finite-guarded sum of a double expression:
# NaN/Inf — upstream float math emits them into any real 100 TB fact
# column — is NULLed (queries.finite_spark) BEFORE the per-row decimal
# cast, because Spark's non-finite -> decimal cast silently yields NULL
# where DuckDB's ERRORS, so an unguarded sum is a silent row drop on one
# engine and a job abort on the other.  The exact decimal sum is
# order-independent, then cast back to double.  The oracle twin is
# CASE WHEN isfinite(expr) THEN expr END inside the CAST.  This is the
# ONLY double-sum helper (r13 deleted the unguarded _dsum after
# migrating q01/q10/q15/q19/q25 — the lineitem-edge and customer-edge
# probe corpora pin the hazard class).
def _dsumf(col, alias):
    return F.sum(finite_spark(col).cast("decimal(28,6)")).cast("double").alias(alias)


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END
                         AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(CASE WHEN isfinite(l_extendedprice) THEN l_extendedprice END
                         AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(CASE WHEN isfinite(l_extendedprice * (1 - l_discount))
                          THEN l_extendedprice * (1 - l_discount) END
                         AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(CASE WHEN isfinite(l_extendedprice * (1 - l_discount) * (1 + l_tax))
                          THEN l_extendedprice * (1 - l_discount) * (1 + l_tax) END
                         AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01(spark, sf_dir):
    """TPC-H Q1 shape: scan + filter + hash aggregate (SPARQL: FILTER +
    GROUP BY + aggregates). Partial aggregation map-side; shipdate filter
    pushes to parquet (it pushes THROUGH the fan_out repartition — the
    optimizer moves deterministic filters below an exchange).  fan_out
    only fires when the scan has fewer files than the cluster has slots
    (the single-row-group local fixture, where the unsplittable scan
    serializes the four decimal sums onto one task — measured 1.20s ->
    0.83s at sf0.1); on real multi-file data it is a no-op, so no
    shuffle is added at scale."""
    from . import fan_out

    li = fan_out(load(spark, sf_dir, "lineitem"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsumf(F.col("l_quantity"), "sum_qty"),
            _dsumf(F.col("l_extendedprice"), "sum_base_price"),
            _dsumf(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            _dsumf(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q02_top_revenue_orders",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(CASE WHEN isfinite(l_extendedprice * (1 - l_discount))
                          THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1995-03-15'
          AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q02(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + top-k (SPARQL: BGP join chain +
    ORDER/LIMIT). customer is SF-scaled, so no forced broadcast — AQE
    chooses broadcast at small SF and shuffle at scale."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsumf(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q03_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(CASE WHEN isfinite(l.l_extendedprice * (1 - l.l_discount))
                          THEN l.l_extendedprice * (1 - l.l_discount) END AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1994-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def q03(spark, sf_dir):
    """TPC-H Q5 shape: 6-way snowflake join (SPARQL: star BGP).  Only the
    constant-size dims (nation: 25 rows, region: 5 rows) carry broadcast
    hints; customer/supplier are SF-scaled, so AQE picks their join
    strategy from runtime sizes."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dsumf(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q04_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(CASE WHEN isfinite(l_extendedprice * l_discount)
                           THEN l_extendedprice * l_discount END AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q04(spark, sf_dir):
    """TPC-H Q6 shape: pure pushed-down filter + global agg (SPARQL: FILTER
    with range predicates).  No shuffle beyond the final 1-row agg."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(_dsumf(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


@query(
    "q05_order_priority_count",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01' AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q05(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS -> left-semi join (SPARQL: FILTER EXISTS)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    semi = o.join(
        li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate), "left_semi"
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count")).orderBy(
        "o_orderpriority"
    )


@query(
    "q06_customers_without_orders",
    oracle="""
    SELECT COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q06(spark, sf_dir):
    """NOT EXISTS -> left-anti join (SPARQL: MINUS / FILTER NOT EXISTS)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(F.count("*").alias("n_customers"))
    )


@query(
    "q07_optional_left_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, COALESCE(t.order_count, 0) AS order_count
    FROM customer c LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS order_count FROM orders GROUP BY o_custkey
    ) t ON c.c_custkey = t.o_custkey
    ORDER BY order_count DESC, c.c_custkey
    LIMIT 20
    """,
)
def q07(spark, sf_dir):
    """OPTIONAL -> left outer join + COALESCE (SPARQL: OPTIONAL + BIND +
    COALESCE, the exact in-repo pattern KafkaConnectorAssembler.java:380-390)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    t = o.groupBy("o_custkey").agg(F.count("*").alias("order_count"))
    return (
        c.join(t, c.c_custkey == t.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("order_count"), F.lit(0)).alias("order_count"),
        )
        .orderBy(F.desc("order_count"), "c_custkey")
        .limit(20)
    )


@query(
    "q08_union_all_parts_suppliers",
    oracle="""
    SELECT kind, name FROM (
      SELECT 'part' AS kind, p_name AS name FROM part WHERE p_size > 45
      UNION ALL
      SELECT 'supplier' AS kind, s_name AS name FROM supplier WHERE s_acctbal > 9000
    ) ORDER BY kind, name
    """,
)
def q08(spark, sf_dir):
    """UNION (SPARQL UNION is bag union -> unionByName)."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") > 45)
        .select(F.lit("part").alias("kind"), F.col("p_name").alias("name"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.lit("supplier").alias("kind"), F.col("s_name").alias("name"))
    )
    return p.unionByName(s).orderBy("kind", "name")


@query(
    "q09_distinct_projection",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def q09(spark, sf_dir):
    """DISTINCT (SPARQL SELECT DISTINCT)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@query(
    "q10_aggregate_functions",
    oracle="""
    WITH cg AS (
      SELECT c_nationkey, c_acctbal, c_mktsegment,
             CAST(CASE WHEN isfinite(c_acctbal) THEN c_acctbal END
                  AS DECIMAL(28,6)) AS bal_d
      FROM customer
    )
    SELECT n.n_name,
           COUNT(*) AS n_cust,
           CAST(SUM(c.bal_d) AS DOUBLE) AS total_bal,
           CAST(MIN(c.c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c.c_acctbal) AS DOUBLE) AS max_bal,
           CAST(SUM(c.bal_d) AS DOUBLE) / COUNT(c.c_acctbal) AS avg_bal,
           string_agg(c.c_mktsegment, ',' ORDER BY c.c_mktsegment) AS segments,
           COUNT(DISTINCT c.c_mktsegment) AS n_segments,
           bool_or(c.c_acctbal < 0) AS has_debt,
           ROUND((CAST(SUM(c.bal_d * c.bal_d) AS DOUBLE)
                  - CAST(SUM(c.bal_d) AS DOUBLE)
                    * CAST(SUM(c.bal_d) AS DOUBLE) / COUNT(*))
                 / (COUNT(*) - 1), 4) AS var_bal,
           ROUND(SQRT((CAST(SUM(c.bal_d * c.bal_d) AS DOUBLE)
                  - CAST(SUM(c.bal_d) AS DOUBLE)
                    * CAST(SUM(c.bal_d) AS DOUBLE) / COUNT(*))
                 / (COUNT(*) - 1)), 4) AS std_bal
    FROM cg c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    HAVING COUNT(*) > 10
    ORDER BY n.n_name
    """,
)
def q10(spark, sf_dir):
    """Full aggregate set + GROUP_CONCAT + HAVING (SPARQL aggregates;
    GROUP_CONCAT = sorted collect_list for determinism; ARQ's extended
    statistical aggregates — afn:stdev/afn:variance — covered as
    moment-based forms over DECIMAL(28,6) sums so both engines feed
    bit-identical doubles into the final divide/sqrt, then ROUND(4)
    pins the hash).  All moments ride the SAME partial aggregate —
    adding them costs no extra shuffle (one hash-agg exchange on
    n_name either way).  COUNT(DISTINCT) is deliberately
    size(collect_set(..)) rather than F.count_distinct: the segment
    domain is tiny, so a set-union aggregate stays in the single
    exchange, where count_distinct's Expand rewrite would add a second
    aggregate phase + exchange — the right trade flips only when the
    distinct domain is unbounded (then: Expand two-phase, or HLL approx
    as in q32)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    # finite_spark before EVERY decimal cast (sum, avg, and both moment
    # sums): a NaN/Inf c_acctbal silently NULLs Spark's decimal cast but
    # aborts DuckDB's — the customer-edge probe corpus pins this.  min/
    # max/has_debt stay unguarded: both engines order NaN above every
    # real and evaluate NaN < 0 as FALSE, so they already agree.
    dbal = finite_spark(F.col("c_acctbal")).cast("decimal(28,6)")
    cnt = F.count("*")
    dsum = F.sum(dbal).cast("double")
    dsum2 = F.sum(dbal * dbal).cast("double")
    var = (dsum2 - dsum * dsum / cnt) / (cnt - F.lit(1))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_cust"),
            _dsumf(F.col("c_acctbal"), "total_bal"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
            (F.sum(dbal).cast("double") / F.count("c_acctbal")).alias("avg_bal"),
            F.concat_ws(",", F.sort_array(F.collect_list("c_mktsegment"))).alias("segments"),
            F.size(F.collect_set("c_mktsegment")).alias("n_segments"),
            F.bool_or(F.col("c_acctbal") < 0).alias("has_debt"),
            F.round(var, 4).alias("var_bal"),
            F.round(F.sqrt(var), 4).alias("std_bal"),
        )
        .filter(F.col("n_cust") > 10)
        .orderBy("n_name")
    )


@query(
    "q11_order_offset_pagination",
    oracle="""
    SELECT 1 AS page, o_orderkey, o_totalprice FROM
      (SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey
       LIMIT 10 OFFSET 20)
    UNION ALL
    SELECT 2 AS page, o_orderkey, o_totalprice FROM
      (SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey
       LIMIT 10 OFFSET 200)
    UNION ALL
    SELECT 3 AS page, o_orderkey, o_totalprice FROM
      (SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey
       LIMIT 10 OFFSET 50000)
    ORDER BY page, o_totalprice DESC, o_orderkey
    """,
)
def q11(spark, sf_dir):
    """ORDER BY + LIMIT + OFFSET (SPARQL solution modifiers; OFFSET via
    Spark's native offset).  Widened r13: TWO pages at different offsets
    (20 and 200) under the same total order, so the hash pins the OFFSET
    arithmetic at two rank positions — an off-by-one or an unstable sort
    shifts at least one page boundary.  Widened r15 (VERDICT r14 facet
    candidate): page 3 requests OFFSET 50000 — BEYOND the end of orders
    at every correctness SF (sf0.01 has ~15k orders) — pinning the
    §15.1 boundary contract: a page past the last solution is EMPTY,
    not an error, not a wrap-around, not a clamp to the final rows.  At
    sf >= ~0.04 the same literal becomes a real deep page and the facet
    degrades gracefully into a deep-offset pin under the identical
    total order.  Each page is a top-(offset+k) heap per partition
    (TakeOrderedAndProject), never a full global sort, so extra pages
    cost one more bounded pass each, not a shuffle."""
    ordered = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )
    p1 = ordered.offset(20).limit(10).withColumn("page", F.lit(1))
    p2 = ordered.offset(200).limit(10).withColumn("page", F.lit(2))
    p3 = ordered.offset(50000).limit(10).withColumn("page", F.lit(3))
    return p1.unionByName(p2).unionByName(p3).orderBy(
        "page", F.desc("o_totalprice"), "o_orderkey"
    )


@query(
    "q12_subquery_above_avg",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_above,
           CAST(SUM(CAST(CASE WHEN isfinite(c_acctbal) THEN c_acctbal END
                         AS DECIMAL(28,6))) AS DOUBLE) AS sum_above,
           ROUND(MIN(c_acctbal), 2) AS boundary_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q12(spark, sf_dir):
    """Scalar subquery (SPARQL nested SELECT). Decorrelated by Catalyst
    when written as a cross join with a 1-row aggregate.  Widened r8
    (VERDICT r7 item 4 family): per-segment rows instead of one global
    count, so the hash pins the above-average set's distribution.
    Widened r13: the guarded decimal sum of the qualifying balances
    (their mass, not just their count) and the per-segment MINIMUM
    qualifying balance — the row closest to the average threshold, so a
    one-row boundary flip between the engines' float summation orders
    cannot hash-hide inside a count."""
    c = load(spark, sf_dir, "customer")
    avg = c.agg(F.avg("c_acctbal").alias("a"))
    return (
        c.join(F.broadcast(avg))
        .filter(F.col("c_acctbal") > F.col("a"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_above"),
            _dsumf(F.col("c_acctbal"), "sum_above"),
            F.round(F.min("c_acctbal"), 2).alias("boundary_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q13_values_inline_join",
    oracle="""
    SELECT t.seg, COUNT(*) AS n FROM customer c
    JOIN (VALUES ('BUILDING'), ('MACHINERY')) AS t(seg) ON c.c_mktsegment = t.seg
    GROUP BY t.seg ORDER BY t.seg
    """,
)
def q13(spark, sf_dir):
    """VALUES inline table -> createDataFrame + broadcast join (SPARQL
    VALUES)."""
    c = load(spark, sf_dir, "customer")
    vals = c.sparkSession.createDataFrame([("BUILDING",), ("MACHINERY",)], ["seg"])
    return (
        c.join(F.broadcast(vals), c.c_mktsegment == vals.seg)
        .groupBy("seg")
        .agg(F.count("*").alias("n"))
        .orderBy("seg")
    )


@query(
    "q14_window_top_order_per_cust",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice FROM (
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_custkey
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    ) WHERE rn = 1 ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def q14(spark, sf_dir):
    """Window function: top-1 per group (engine-grade operator, SURVEY §2C).
    Single shuffle on the partition key; rank pushdown via WindowTopK in
    Spark 3.5+."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@query(
    "q15_rollup_revenue",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           CAST(SUM(CAST(CASE WHEN isfinite(l_extendedprice) THEN l_extendedprice END
                         AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def q15(spark, sf_dir):
    """ROLLUP grouping sets + GROUPING() level indicator (engine-grade,
    SURVEY §2C).  gid disambiguates a genuine NULL group key from a
    rollup subtotal row — the standard way consumers tell the two apart
    without string sentinels.

    EMPTY-input conformance (r15, closing the last documented empty-
    corpus divergence): SQL's GROUP BY ROLLUP emits the grand-total row
    even over zero input rows (the () grouping set aggregates the empty
    bag: COUNT 0, SUM NULL) — Spark's rollup emits nothing.  The fix-up
    leg is a 1-row zero-column count aggregate filtered to n == 0, so
    it contributes the literal grand-total row exactly when the scan is
    empty and ZERO rows otherwise; no join, and the extra scan reads no
    columns (ReadSchema struct<>)."""
    li = load(spark, sf_dir, "lineitem")
    rolled = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            _dsumf(F.col("l_extendedprice"), "total"),
            (F.grouping("l_returnflag").cast("long") * 2
             + F.grouping("l_linestatus").cast("long")).alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "total",
        )
    )
    empty_grand = (
        li.agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") == 0)
        .select(
            F.lit("ALL").alias("returnflag"),
            F.lit("ALL").alias("linestatus"),
            F.lit(3).cast("long").alias("gid"),
            F.lit(None).cast("double").alias("total"),
        )
    )
    return rolled.unionByName(empty_grand).orderBy("returnflag", "linestatus")


@query(
    "q16_conditional_agg_case",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS total,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
           COUNT(DISTINCT CASE WHEN o_totalprice > 200000 THEN o_custkey END) AS n_large_custs,
           CAST(MIN(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS all_finished,
           CAST(MAX(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS any_large,
           CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
                AS BIGINT) AS large_bp
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q16(spark, sf_dir):
    """Conditional aggregation (SPARQL IF inside aggregates).

    Facets (widened r12): the full conditional-aggregate family over one
    pass — conditional COUNT DISTINCT (distinct big-spender customers,
    NULL-excluding CASE feeds the distinct), EVERY/ANY as MIN/MAX over
    the 0/1 marker (the bool_and/bool_or SPARQL has no direct builtin
    for), and the large-order share in integer basis points.  All
    integer-exact; still a single hash aggregate with map-side
    partials (the lone distinct rides Spark's two-phase distinct
    rewrite, keyed by the same group columns)."""
    o = load(spark, sf_dir, "orders")
    is_f = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    is_large = F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("total"),
            F.sum(is_f).alias("n_finished"),
            F.sum(is_large).alias("n_large"),
            F.countDistinct(
                F.when(F.col("o_totalprice") > 200000, F.col("o_custkey"))
            ).alias("n_large_custs"),
            F.min(is_f).cast("long").alias("all_finished"),
            F.max(is_large).cast("long").alias("any_large"),
        )
        .withColumn("large_bp", F.expr("n_large * 10000 div total"))
        .select(
            "o_orderpriority", "total", "n_finished", "n_large",
            "n_large_custs", "all_finished", "any_large", "large_bp",
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q17_string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_uc,
           length(p_name) AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           md5(p_name) AS name_md5,
           CASE WHEN p_type LIKE '%BRASS%' THEN 'brass' ELSE 'other' END AS material,
           lower(p_type) AS type_lc,
           replace(p_name, 'a', '@') AS name_subst,
           sha256(p_name) AS name_sha256,
           starts_with(p_name, 'a') AS starts_a,
           CASE WHEN p_type IS NULL THEN NULL
                ELSE split_part(p_type, ' ', 2) END AS type_mid,
           levenshtein(p_brand, 'Brand#11') AS brand_dist,
           instr(p_name, 'le') AS le_pos,
           reverse(p_type) AS type_rev,
           lpad(p_brand, 12, '*') AS brand_pad,
           translate(p_brand, '#', '-') AS brand_tr
    FROM part WHERE p_size BETWEEN 10 AND 20 AND regexp_matches(p_name, 'a.*e')
    ORDER BY p_partkey LIMIT 50
    """,
)
def q17(spark, sf_dir):
    """SPARQL builtin-function surface (SURVEY §2B builtins row) as
    JVM-side column expressions: UCASE/LCASE/STRLEN/SUBSTR/REGEX/MD5/
    SHA256/IF/REPLACE/STRSTARTS/CONTAINS-position/LEVENSHTEIN plus the
    split/reverse/pad/translate forms ARQ exposes via its fn: library.
    All row-local, zero shuffles beyond the final ORDER BY; p_* strings
    here are ASCII so lower() is engine-parity-safe (the non-ASCII
    lower() boundary is probed by tools/unicode_parity_probe.py).
    NULL-input parity (part-supplier-edge corpus, r13): every function
    here is NULL-in/NULL-out on both engines EXCEPT DuckDB's
    split_part, which returns '' on NULL input where Spark (and
    Postgres) return NULL — the oracle carries an explicit IS NULL
    CASE mirror on type_mid; the engine keeps the standard
    NULL-propagating semantic."""
    p = load(spark, sf_dir, "part")
    return (
        p.filter((F.col("p_size") >= 10) & (F.col("p_size") <= 20) & F.col("p_name").rlike("a.*e"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_uc"),
            F.length("p_name").alias("name_len"),
            F.substring("p_type", 1, 5).alias("type_prefix"),
            F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
            F.when(F.col("p_type").like("%BRASS%"), "brass").otherwise("other").alias("material"),
            F.lower("p_type").alias("type_lc"),
            F.regexp_replace("p_name", "a", "@").alias("name_subst"),
            F.sha2(F.col("p_name").cast("binary"), 256).alias("name_sha256"),
            F.startswith(F.col("p_name"), F.lit("a")).alias("starts_a"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias("type_mid"),
            F.levenshtein(F.col("p_brand"), F.lit("Brand#11")).alias("brand_dist"),
            F.instr(F.col("p_name"), "le").alias("le_pos"),
            F.reverse("p_type").alias("type_rev"),
            F.lpad(F.col("p_brand"), 12, "*").alias("brand_pad"),
            F.translate(F.col("p_brand"), "#", "-").alias("brand_tr"),
        )
        .orderBy("p_partkey")
        .limit(50)
    )


@query(
    "q18_multi_join_part_supplier_stats",
    oracle="""
    SELECT p.p_brand, s.s_name,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(CASE WHEN isfinite(l.l_quantity) THEN l.l_quantity END
                          AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_size <= 10
    GROUP BY p.p_brand, s.s_name
    HAVING COUNT(*) >= 5
    ORDER BY total_qty DESC, p_brand, s_name
    LIMIT 30
    """,
)
def q18(spark, sf_dir):
    """Fact-to-two-dimensions star join.  part/supplier are SF-scaled, so
    no forced broadcast: AQE broadcasts them at small SF (fact table never
    shuffles pre-aggregation) and falls back to shuffle joins at scale."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = load(spark, sf_dir, "supplier")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(F.count("*").alias("n_items"), _dsumf(F.col("l_quantity"), "total_qty"))
        .filter(F.col("n_items") >= 5)
        .orderBy(F.desc("total_qty"), "p_brand", "s_name")
        .limit(30)
    )


@query(
    "q19_disjunctive_predicate_join",
    oracle="""
    SELECT p.p_brand AS brand,
           CAST(SUM(CAST(CASE WHEN isfinite(l.l_extendedprice * (1 - l.l_discount))
                          THEN l.l_extendedprice * (1 - l.l_discount) END
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(CASE WHEN isfinite(l.l_quantity) THEN l.l_quantity END
                         AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
    GROUP BY p.p_brand ORDER BY p.p_brand
    """,
)
def q19(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive (OR-of-conjunctions) predicate spanning
    both join sides.  The part-only disjuncts (brand/size) are replicated as
    a pre-join filter so the build side shrinks before the join and the
    scan prunes; the mixed lineitem+part residual evaluates post-join inside
    whole-stage codegen — the standard Q19 rewrite Catalyst can't derive
    itself because the OR spans relations.  Widened per VERDICT r7 item 4:
    per-brand rows (revenue, item count, quantity) instead of one global
    aggregate, so the hash pins each disjunct's contribution separately —
    a residual-predicate bug in one branch can't hide in a grand total."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    part_side = p.filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 35))
    )
    q = F.col("l_quantity")
    residual = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(part_side, li.l_partkey == part_side.p_partkey)
        .filter(residual)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            _dsumf(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_items"),
            _dsumf(F.col("l_quantity"), "total_qty"),
        )
        .orderBy("brand")
    )


@query(
    "q24_exact_percentiles",
    oracle="""
    WITH og AS (
      SELECT o_orderpriority,
             CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS tp
      FROM orders
    )
    SELECT o_orderpriority,
           ROUND(quantile_cont(tp, 0.25), 2) AS p25,
           ROUND(quantile_cont(tp, 0.5), 2) AS p50,
           ROUND(quantile_cont(tp, 0.75), 2) AS p75,
           ROUND(quantile_cont(tp, 0.9), 2) AS p90,
           ROUND(quantile_cont(tp, 0.99), 2) AS p99,
           ROUND(quantile_cont(tp, 0.75) - quantile_cont(tp, 0.25), 2) AS iqr,
           COUNT(tp) AS n_vals
    FROM og GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q24(spark, sf_dir):
    """Exact interpolated percentiles per group (SPARQL has no percentile;
    this is the engine-grade aggregate surface, SURVEY §2C).  Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the p*(n-1)
    linear-interpolation definition, so exact values agree — widened r11
    to the full quartile ladder (p25/p50/p75/p90/p99) plus the IQR, the
    spread statistic outlier fences are built from, so the gate pins the
    interpolation at five distinct rank positions per group.  At 100 TB
    swap to approx_percentile (t-digest) — exact percentile sorts each
    group; the group-by keys here are low-cardinality so each sort is a
    single partition's work (all five points share ONE sort: Spark
    evaluates a multi-percentile aggregate over the same buffer)."""
    o = load(spark, sf_dir, "orders")
    # finite_spark on the quantile input: the two engines interpolate
    # around a NaN differently (NaN sorts greatest in Spark's percentile
    # buffer but poisons DuckDB's interpolation arithmetic — the
    # orders-edge probe measured the divergence).  NULL is skipped by
    # both engines' quantile aggregates, so the guard is exact.
    tp = finite_spark(F.col("o_totalprice")).alias("tp")
    o = o.select("o_orderpriority", tp)
    pct = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p90": 0.9, "p99": 0.99}
    return (
        o.groupBy("o_orderpriority")
        .agg(
            *[
                F.round(F.percentile("tp", F.lit(q)), 2).alias(n)
                for n, q in pct.items()
            ],
            F.round(
                F.percentile("tp", F.lit(0.75))
                - F.percentile("tp", F.lit(0.25)),
                2,
            ).alias("iqr"),
            # r13 facet: the quantile INPUT mass — pins that the finite
            # guard admits every real row (equals the group size on
            # clean data, drops exactly the non-finite rows on hazard
            # corpora), so a guard that over-filters cannot hash-hide
            # behind stable-looking quantiles.
            F.count("tp").alias("n_vals"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q25_cube_aggregation",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END
                         AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def q25(spark, sf_dir):
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    pass (Spark expands grouping sets before the partial aggregate, so it
    still map-side combines).  EMPTY-input conformance: the () grouping
    set must emit its aggregate-over-the-empty-bag row (n = 0, sum NULL)
    like SQL's CUBE does — same zero-column count fix-up leg as q15."""
    li = load(spark, sf_dir, "lineitem")
    cubed = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), _dsumf(F.col("l_quantity"), "total_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "total_qty",
        )
    )
    empty_grand = (
        li.agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") == 0)
        .select(
            F.lit("ALL").alias("returnflag"),
            F.lit("ALL").alias("linestatus"),
            F.lit(0).cast("long").alias("n"),
            F.lit(None).cast("double").alias("total_qty"),
        )
    )
    return cubed.unionByName(empty_grand).orderBy("returnflag", "linestatus")


@query(
    "q28_set_operations",
    oracle="""
    WITH r AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
         a AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
    SELECT 'both' AS op, COUNT(*) AS n, CAST(SUM(l_partkey) AS BIGINT) AS key_checksum
    FROM (SELECT l_partkey FROM r INTERSECT SELECT l_partkey FROM a)
    UNION ALL
    SELECT 'only_r', COUNT(*), CAST(SUM(l_partkey) AS BIGINT)
    FROM (SELECT l_partkey FROM r EXCEPT SELECT l_partkey FROM a)
    UNION ALL
    SELECT 'only_a', COUNT(*), CAST(SUM(l_partkey) AS BIGINT)
    FROM (SELECT l_partkey FROM a EXCEPT SELECT l_partkey FROM r)
    UNION ALL
    SELECT 'both_bag', COUNT(*), CAST(SUM(l_partkey) AS BIGINT)
    FROM (SELECT l_partkey FROM r INTERSECT ALL SELECT l_partkey FROM a)
    UNION ALL
    SELECT 'r_minus_a_bag', COUNT(*), CAST(SUM(l_partkey) AS BIGINT)
    FROM (SELECT l_partkey FROM r EXCEPT ALL SELECT l_partkey FROM a)
    ORDER BY op
    """,
)
def q28(spark, sf_dir):
    """Set operators under BOTH semantics — INTERSECT / EXCEPT (distinct)
    and INTERSECT ALL / EXCEPT ALL (bag, multiplicity = min/difference of
    per-side counts): parts returned under both flags, only 'R', only
    'A', plus the bag cardinalities.  Widened r11: the old row dump's
    ORDER BY + LIMIT 500 truncated inside the first leg, so additional
    legs were invisible to the hash — each leg now reduces to
    (count, key checksum), pinning every operator's full cardinality and
    membership as one GLOBAL aggregate per leg on both engines, so an
    empty leg (no only-'A' parts at small SF) still emits its
    (op, 0, NULL) row instead of silently vanishing from one engine.  Spark plans the distinct forms as hash aggregate +
    left-semi/anti join and the ALL forms as per-key count compare —
    both shapes shuffle only the set key, which is what survives a 100x
    scale-up; the five legs are independent plans over the same
    column-pruned, predicate-pushed scan; r15 materializes r/a once
    (lazy stable_checkpoint — the note below used to say a production
    pipeline would do this; now this one does too), so the five legs
    read two materialized key sets instead of re-scanning the fact
    table twice per leg (10 scans -> 2 at any scale)."""
    from ..checkpointing import stable_checkpoint

    li = load(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey").transform(
        stable_checkpoint, eager=False
    )
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey").transform(
        stable_checkpoint, eager=False
    )
    legs = [
        ("both", r.intersect(a)),
        ("only_r", r.subtract(a)),
        ("only_a", a.subtract(r)),
        ("both_bag", r.intersectAll(a)),
        ("r_minus_a_bag", r.exceptAll(a)),
    ]
    out = None
    for op, leg in legs:
        row = leg.agg(
            F.count("*").alias("n"),
            F.sum("l_partkey").cast("long").alias("key_checksum"),
        ).select(F.lit(op).alias("op"), "n", "key_checksum")
        out = row if out is None else out.unionByName(row)
    return out.orderBy("op")


@query(
    "q31_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus)
                AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(CASE WHEN isfinite(l_extendedprice) THEN l_extendedprice END
                         AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    ORDER BY returnflag, linestatus
    """,
)
def q31(spark, sf_dir):
    """Explicit GROUPING SETS — two non-hierarchical groupings
    ((returnflag), (linestatus)) in ONE pass over the fact table.  Spark
    expands the sets before the partial aggregate, so the scan and the
    map-side combine are shared; the naive alternative (two groupBys +
    union) reads the table twice.  The gid facet (2*GROUPING(rf) +
    GROUPING(ls), r11 — q15's rollup widening applied here) pins WHICH
    grouping set produced each row, so a COALESCE collision (a real
    'ALL' value posing as a subtotal) or a set mix-up cannot hash
    identically."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("q31_lineitem")
    # Spark SQL has no isfinite(): the finite guard before the decimal
    # cast (finite_spark's SQL spelling) is abs(nanvl(x, NULL)) != Inf —
    # nanvl routes NaN to NULL, the abs-compare routes ±Inf to NULL.
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus)
                    AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(CASE WHEN abs(nanvl(l_extendedprice, CAST(NULL AS DOUBLE)))
                                       != CAST('Infinity' AS DOUBLE)
                              THEN l_extendedprice END
                             AS DECIMAL(28,6))) AS DOUBLE) AS total
        FROM q31_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY returnflag, linestatus
        """
    )


@query(
    "q32_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_nd,
           1 AS approx_ok,
           COUNT(DISTINCT l_orderkey) AS exact_nd_hi,
           1 AS approx_hi_ok
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'ALL',
           COUNT(DISTINCT l_partkey),
           1,
           COUNT(DISTINCT l_orderkey),
           1
    FROM lineitem
    ORDER BY l_returnflag
    """,
)
def q32(spark, sf_dir):
    """Approximate count-distinct (HLL++) next to the exact answer.  The
    gate asserts the estimate lands within 5%% of truth — the contract a
    100 TB pre-pass relies on when sizing joins/dedup work.  At scale the
    approx pass is a map-side sketch merge (no shuffle of distinct keys),
    which is why it exists at all.  Widened r11: a SECOND sketch over the
    higher-cardinality l_orderkey (~an order of magnitude more distincts
    — HLL register saturation behaves differently per cardinality
    decade) and a corpus-wide 'ALL' row, so the accuracy contract is
    pinned at two cardinalities x (per-group + global) scopes."""
    li = load(spark, sf_dir, "lineitem")

    def facet(grouped, key_col):
        agg = grouped.agg(
            F.countDistinct("l_partkey").alias("exact_nd"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_nd"),
            F.countDistinct("l_orderkey").alias("exact_nd_hi"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_nd_hi"),
        )
        # integer-ratio gate (|approx-exact|*20 <= exact ⟺ rel err <= 5%):
        # no division, so the always-present 'ALL' row cannot hit 0/0 on
        # an empty relation (ANSI abort), and 0-distinct trivially passes
        ok = lambda a, e: F.when(
            F.abs(F.col(a) - F.col(e)) * 20 <= F.col(e), 1
        ).otherwise(0)
        return agg.select(
            key_col.alias("l_returnflag"),
            "exact_nd",
            ok("approx_nd", "exact_nd").alias("approx_ok"),
            "exact_nd_hi",
            ok("approx_nd_hi", "exact_nd_hi").alias("approx_hi_ok"),
        )

    per_flag = facet(li.groupBy("l_returnflag"), F.col("l_returnflag"))
    overall = facet(li.groupBy(), F.lit("ALL"))
    return per_flag.unionByName(overall).orderBy("l_returnflag")


@query(
    "q33_semi_anti_join",
    oracle="""
    WITH w AS (
      SELECT o_orderpriority, COUNT(*) AS n_with_returns FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      GROUP BY o_orderpriority
    ),
    wo AS (
      SELECT o_orderpriority, COUNT(*) AS n_without_returns FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      GROUP BY o_orderpriority
    )
    SELECT COALESCE(w.o_orderpriority, wo.o_orderpriority) AS o_orderpriority,
           COALESCE(w.n_with_returns, 0) AS n_with_returns,
           COALESCE(wo.n_without_returns, 0) AS n_without_returns
    FROM w FULL OUTER JOIN wo ON w.o_orderpriority = wo.o_orderpriority
    ORDER BY 1
    """,
)
def q33(spark, sf_dir):
    """Semi/anti-join (EXISTS / NOT EXISTS): orders with vs without any
    returned line, per order priority.  Spark plans left-semi and
    left-anti joins — the filter on the probe side pushes into its scan,
    and the join carries only the key column, so the shuffle moves one
    long per matching row.  Widened r8 (VERDICT r7 item 4 family):
    per-priority rows replace the old two-scalar row, and the driver-side
    ``.count()`` pair is gone — the whole result is one distributed plan
    now."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    with_r = (
        o.join(returned, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_with_returns"))
    )
    without_r = (
        o.join(returned, "o_orderkey", "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_without_returns"))
    )
    return (
        with_r.join(without_r, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            F.coalesce("n_with_returns", F.lit(0)).alias("n_with_returns"),
            F.coalesce("n_without_returns", F.lit(0)).alias("n_without_returns"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q34_lead_lag_ntile",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, value, ts,
             LAG(value) OVER w AS prev_value,
             LEAD(value) OVER w AS next_value,
             NTILE(4) OVER w AS quartile
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id)
    )
    SELECT user_id, event_id,
           ROUND(COALESCE(value - prev_value, 0), 4) AS delta_prev,
           ROUND(COALESCE(next_value - value, 0), 4) AS delta_next,
           quartile
    FROM seq
    WHERE user_id < 50
    ORDER BY user_id, event_id
    """,
)
def q34(spark, sf_dir):
    """Sequential window functions LAG/LEAD/NTILE over per-user event
    streams: one shuffle on user_id serves all three functions (same
    window frame), the shape session-feature pipelines rely on.  The ts
    ordering pins NULLS LAST on both engines — Spark defaults ASC NULLS
    FIRST where DuckDB defaults NULLS LAST, which would place a NULL-ts
    event at opposite ends of its user's sequence."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    seq = ev.filter(F.col("user_id") < 50).select(
        "user_id",
        "event_id",
        F.round(F.coalesce(F.col("value") - F.lag("value").over(w), F.lit(0)), 4).alias("delta_prev"),
        F.round(F.coalesce(F.lead("value").over(w) - F.col("value"), F.lit(0)), 4).alias("delta_next"),
        F.ntile(4).over(w).alias("quartile"),
    )
    return seq.orderBy("user_id", "event_id")


@query(
    "q36_per_group_outlier_filter",
    oracle="""
    WITH lg AS (
      SELECT l_partkey,
             CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END
                  AS DECIMAL(28,6)) AS qd
      FROM lineitem
    ),
    stats AS (
      SELECT l_partkey, COUNT(*) AS cnt, SUM(qd) AS sq
      FROM lg GROUP BY l_partkey
    )
    SELECT l.l_partkey, COUNT(*) AS n_small
    FROM lg l JOIN stats s ON s.l_partkey = l.l_partkey
    WHERE l.qd * 2 * s.cnt < s.sq
    GROUP BY l.l_partkey ORDER BY n_small DESC, l.l_partkey LIMIT 50
    """,
)
def q36(spark, sf_dir):
    """Per-group outlier filter: lines with quantity below half their
    part's average (the second-pass 'compare each row to its group
    stats' shape every curation pipeline has).  Spark computes the group
    stats as window functions — ONE shuffle, no self-join — while the
    oracle uses an independent aggregate+join formulation.  The
    comparison is pure decimal cross-multiplication (2*q*cnt < sum), no
    division, so both engines decide every boundary row identically."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    # finite_spark before the decimal cast: a non-finite quantity NULLs
    # qd on both engines, so it drops out of sq AND the boundary
    # comparison below returns NULL -> the row is filtered identically.
    # cnt deliberately stays COUNT(*) (mirrored in the oracle).
    qd = finite_spark(F.col("l_quantity")).cast("decimal(28,6)")
    stats = li.select(
        "l_partkey",
        qd.alias("qd"),
        F.count("*").over(w).alias("cnt"),
        F.sum(qd).over(w).alias("sq"),
    )
    small = stats.filter(F.col("qd") * 2 * F.col("cnt") < F.col("sq"))
    return (
        small.groupBy("l_partkey")
        .agg(F.count("*").alias("n_small"))
        .orderBy(F.desc("n_small"), "l_partkey")
        .limit(50)
    )


@query(
    "q37_running_frames",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(28,6)))
                OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
           CAST(AVG(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(28,6)))
                OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS moving_avg3
    FROM events
    WHERE user_id < 30
    ORDER BY user_id, event_id
    """,
)
def q37(spark, sf_dir):
    """Frame-based window aggregation: running total (unbounded-preceding
    frame) and 3-row moving average per user — the cumulative-metrics
    shape.  Both frames share ONE window sort, so the plan is a single
    shuffle on user_id + one in-partition sort; decimal accumulation
    keeps the running values order-exact so both engines agree at every
    prefix, not just the final row.  NULLS LAST is pinned on the ts
    ordering (both engines) — a NULL-ts row would otherwise lead the
    frame in Spark and trail it in DuckDB, shifting every running
    prefix after it."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    # finite_spark: NaN/Inf metric -> NULL on both engines (Spark's
    # non-finite -> decimal cast silently NULLs where DuckDB's errors);
    # window SUM/AVG skip it
    vd = finite_spark(F.col("value")).cast("decimal(28,6)")
    base = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov3 = base.rowsBetween(-2, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.sum(vd).over(running).cast("double").alias("running_total"),
        F.avg(vd).over(mov3).cast("double").alias("moving_avg3"),
    ).orderBy("user_id", "event_id")


@query(
    "q38_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_cont(CASE WHEN isfinite(l_extendedprice)
                              THEN l_extendedprice END, 0.25) AS DOUBLE) AS exact_p25,
           CAST(quantile_cont(CASE WHEN isfinite(l_extendedprice)
                              THEN l_extendedprice END, 0.50) AS DOUBLE) AS exact_p50,
           CAST(quantile_cont(CASE WHEN isfinite(l_extendedprice)
                              THEN l_extendedprice END, 0.95) AS DOUBLE) AS exact_p95,
           1 AS p25_ok, 1 AS p50_ok, 1 AS p95_ok,
           COUNT(CASE WHEN isfinite(l_extendedprice)
                 THEN l_extendedprice END) AS n_vals
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q38(spark, sf_dir):
    """Approximate percentiles (Greenwald-Khanna sketch) gated against the
    exact answer: the estimate must land within 1%% of truth (q32's
    accuracy-gate pattern for quantiles).  At 100 TB the approx pass is a
    mergeable per-partition sketch — no global sort, no single-reducer
    percentile, which is what makes per-column distribution profiling of a
    full corpus feasible at all.  Widened per VERDICT r7 item 4: per-
    return-flag groups x three percentiles (nine exact values + nine
    sketch gates instead of a single row), so the hash discriminates the
    distribution's shape per group, not one global midpoint."""
    li = load(spark, sf_dir, "lineitem")
    # finite_spark on the percentile input (exact AND sketch): the two
    # engines place a NaN differently inside their quantile orderings
    # (the lineitem-edge probe measured p50/p90 tail divergence), and a
    # sketch fed an Inf shifts every upper quantile.  NULL is skipped by
    # both engines' percentile aggregates, so the guard is exact.
    li = li.withColumn("lep_f", finite_spark(F.col("l_extendedprice")))
    pcts = {"p25": 0.25, "p50": 0.50, "p95": 0.95}
    agg = li.groupBy("l_returnflag").agg(
        *[
            F.expr(f"percentile(lep_f, {q})").alias(f"exact_{n}")
            for n, q in pcts.items()
        ],
        *[
            F.expr(f"approx_percentile(lep_f, {q}, 10000)").alias(f"a{n}")
            for n, q in pcts.items()
        ],
        # r13 facet: the sketch INPUT mass (see q24) — an over-filtering
        # guard cannot hide behind in-tolerance sketch gates.
        F.count("lep_f").alias("n_vals"),
    )
    def ok(approx, exact):
        return F.when(
            F.abs(F.col(approx) - F.col(exact)) / F.col(exact) <= 0.01, 1
        ).otherwise(0)
    return agg.select(
        "l_returnflag",
        *[F.round(f"exact_{n}", 4).alias(f"exact_{n}") for n in pcts],
        *[ok(f"a{n}", f"exact_{n}").alias(f"{n}_ok") for n in pcts],
        "n_vals",
    ).orderBy("l_returnflag")


@query(
    "q39_correlated_scalar_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_nationkey,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                   AND o.o_totalprice > 300000) AS BIGINT) AS n_big_orders,
           COALESCE((SELECT CAST(SUM(CAST(CASE WHEN isfinite(o.o_totalprice)
                                          THEN o.o_totalprice END
                                     AS DECIMAL(28,6))) AS DOUBLE)
                     FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_totalprice > 300000), 0.0) AS big_value
    FROM customer c
    WHERE c.c_acctbal = (SELECT MAX(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    ORDER BY c.c_nationkey, c.c_custkey
    """,
)
def q39(spark, sf_dir):
    """Correlated scalar subqueries in BOTH positions: a correlated MAX
    in WHERE (customers holding their nation's top balance — exact
    equality on exact money values, no float boundary) and a correlated
    COUNT in the projection (their jumbo-order count, 0-preserving).
    Catalyst de-correlates each into an aggregate + join — per-nation MAX
    is a 25-group aggregate joined back broadcast-style, and the COUNT
    rewrite is a left outer aggregate join on custkey — so nothing
    re-executes per outer row; at 100 TB both rewrites stay two hash
    aggregates and two joins, never a nested loop.

    Facet (widened r12): a THIRD correlated shape — a scalar SUM in the
    projection with COALESCE-to-zero for customers with no jumbo orders
    (the NULL-vs-0 boundary Catalyst's decorrelation must preserve
    through the outer join), finite-guarded per the r12 convention
    since o_totalprice is a raw double column (Spark spells the guard
    NOT isnan AND != Infinity inline; the oracle uses isfinite)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("q39_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("q39_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_nationkey,
               CAST((SELECT COUNT(*) FROM q39_orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_totalprice > 300000) AS BIGINT) AS n_big_orders,
               COALESCE((SELECT CAST(SUM(CAST(CASE WHEN NOT isnan(o.o_totalprice)
                                              AND ABS(o.o_totalprice) != DOUBLE('Infinity')
                                              THEN o.o_totalprice END
                                         AS DECIMAL(28,6))) AS DOUBLE)
                         FROM q39_orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_totalprice > 300000), 0.0D) AS big_value
        FROM q39_customer c
        WHERE c.c_acctbal = (SELECT MAX(c2.c_acctbal) FROM q39_customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c.c_nationkey, c.c_custkey
        """
    )
