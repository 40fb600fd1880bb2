"""Relational operator coverage: scans, projections, filters, joins,
aggregates, set ops, sorts/limits, subqueries, scalar functions.

Maps SURVEY.md §2.2-§2.8 onto the driver's TPC-H-ish tables. Each query
declares the operator(s) it certifies in its docstring with the
reference citation. All plans are declarative DataFrame/SQL so Catalyst
does pushdown/pruning/join-selection; explicit ``broadcast`` hints mark
the dimension sides that must never shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import table
from ..functions.portable import hash64, o_hash64, o_rnd, prnd
from .registry import query

# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4) + filter/projection (§2.2)
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT
      l_returnflag, l_linestatus,
      floor((sum(l_quantity)) * 100.0 + 0.5001) / 100.0                                        AS sum_qty,
      floor((sum(l_extendedprice)) * 100.0 + 0.5001) / 100.0                                   AS sum_base_price,
      floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5001) / 100.0                AS sum_disc_price,
      floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0 + 0.5001) / 100.0  AS sum_charge,
      floor((avg(l_quantity)) * 10000.0 + 0.5001) / 10000.0                                        AS avg_qty,
      floor((avg(l_extendedprice)) * 100.0 + 0.5001) / 100.0                                   AS avg_price,
      floor((avg(l_discount)) * 1000000.0 + 0.5001) / 1000000.0                                        AS avg_disc,
      count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style wide aggregate: filter + groupBy + 8 aggregates.

    Certifies scan pushdown (P6 range predicate), groupBy().agg()
    (SURVEY §2.4 notes the reference never calls it directly — its A1-A5
    are all special cases of this). Partial (map-side) aggregation makes
    this shuffle only one row per (flag, status, partition) at any scale.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            prnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            prnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            prnd(F.sum(disc_price), 2).alias("sum_disc_price"),
            prnd(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            prnd(F.avg("l_quantity"), 4).alias("avg_qty"),
            prnd(F.avg("l_extendedprice"), 2).alias("avg_price"),
            prnd(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q02_filtered_revenue",
    oracle="""
    SELECT floor((sum(l_extendedprice * l_discount)) * 100.0 + 0.5001) / 100.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q02_filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style single-row agg over a compound predicate (P6/P7).

    The whole predicate reaches the parquet scan (PushedFilters); only
    3 columns are read (ReadSchema) — the shape that matters at 100 TB.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(prnd(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "q03_distinct_keys",
    oracle="SELECT DISTINCT c_mktsegment AS segment FROM customer",
)
def q03_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT grouping keys (A1; reference:
    airflow/etl_scripts/pyspark/D_Create_crypto_ind_day_001.py:39-41)."""
    return (
        table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("segment"))
        .distinct()
    )


@query(
    "q04_union_counts",
    oracle="""
    SELECT 'customer' AS table_name, count(*) AS n FROM customer
    UNION ALL SELECT 'orders', count(*) FROM orders
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'part', count(*) FROM part
    UNION ALL SELECT 'supplier', count(*) FROM supplier
    UNION ALL SELECT 'events', count(*) FROM events
    """,
)
def q04_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table row-count union — the reference's data-quality count
    model (A3; reference:
    modules/dbt/crypto_etl_pjr/models/cross_use/staging/cross_use_test.sql:1-15).
    """
    out = None
    for name in ("customer", "orders", "lineitem", "part", "supplier", "events"):
        one = table(spark, sf_dir, name).agg(F.count("*").alias("n")).select(
            F.lit(name).alias("table_name"), "n"
        )
        out = one if out is None else out.unionByName(one)
    return out


@query(
    "q05_minmax_bounds",
    oracle="""
    SELECT CAST(min(o_orderdate) AS DATE) AS min_dt,
           CAST(max(o_orderdate) AS DATE) AS max_dt,
           count(*) AS n
    FROM orders
    """,
)
def q05_minmax_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX bounding aggregate (A4; reference:
    crypto_daily_close_stats.sql:15-21 min_max_dt CTE)."""
    return table(spark, sf_dir, "orders").agg(
        F.min(F.to_date("o_orderdate")).alias("min_dt"),
        F.max(F.to_date("o_orderdate")).alias("max_dt"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@query(
    "q10_region_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5001) / 100.0 AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q10_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style 6-way join: big fact joined to broadcast dims.

    supplier/customer/nation/region are broadcast (no shuffle of
    lineitem for the dim joins); only the lineitem<->orders join shuffles
    on orderkey. Certifies J1-style equi-joins with Catalyst/AQE picking
    broadcast-hash for the small sides.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(region.r_name == "ASIA")
        .groupBy(nation.n_name.alias("nation"))
        .agg(
            prnd(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q11_top_unshipped_orders",
    oracle="""
    SELECT o.o_orderkey AS orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_orderpriority AS priority,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5001) / 100.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def q11_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style join + group + deterministic top-k (§2.6 sort/limit;
    reference spot-check pattern crypto_create_mart.py:189-191)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING"))
        .join(orders.filter(F.col("o_orderdate") < cutoff),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(li.filter(F.col("l_shipdate") > cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_orderkey").alias("orderkey"),
            F.to_date("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            prnd(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


@query(
    "q12_semi_anti_join",
    oracle="""
    SELECT 'with_orders' AS bucket, count(*) AS n_customers
    FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'without_orders', count(*)
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q12_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi / left-anti joins (EXISTS / NOT EXISTS) + union
    (SURVEY §2.7): customers WITH orders and customers WITHOUT,
    labeled and unioned — existence tests as join types, so neither
    branch materializes order payloads (the semi/anti forms prune to
    the key columns at the scan)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    semi = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .agg(F.count("*").alias("n_customers"))
        .select(F.lit("with_orders").alias("bucket"), "n_customers")
    )
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count("*").alias("n_customers"))
        .select(F.lit("without_orders").alias("bucket"), "n_customers")
    )
    return semi.unionByName(anti)


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style left outer join + two-level aggregation (J2 outer
    join semantics: preserved rows count as 0)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy(cust.c_custkey)
        .agg(F.count(orders.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q14_scalar_subquery",
    oracle="""
    SELECT count(*) AS n_above,
           floor((min(o_totalprice)) * 100.0 + 0.5001) / 100.0 AS min_above
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
)
def q14_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery bound (J3; reference:
    crypto_daily_close_stats.sql:43-44). Spark SQL supports scalar
    subqueries natively; the inner agg becomes a broadcast one-row plan.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT count(*) AS n_above,
               floor((min(o_totalprice)) * 100.0D + 0.5001D) / 100.0D AS min_above
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        """
    )


# ---------------------------------------------------------------------------
# Conditional aggregation, pivot, rollup, top-k per group
# ---------------------------------------------------------------------------


@query(
    "q15_promo_revenue_share",
    oracle="""
    SELECT floor((100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount))) * 1000000.0 + 0.5001) / 1000000.0 AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def q15_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style conditional aggregate (CASE WHEN inside sum) over a
    broadcast dim join."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            prnd(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_share")
        )
    )


@query(
    "q16_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q16_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (engine extension beyond reference scope — SURVEY §2.4 notes
    the reference has no grouping-sets/pivot; we expose it anyway)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0)
        .select(
            "priority",
            F.col("O").alias("status_o"),
            F.col("F").alias("status_f"),
            F.col("P").alias("status_p"),
        )
    )


@query(
    "q17_rollup_revenue",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           floor((sum(l_extendedprice)) * 100.0 + 0.5001) / 100.0 AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q17_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (engine extension; subsumes the
    reference's per-table count unions with one operator)."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(prnd(F.sum("l_extendedprice"), 2).alias("sum_price"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_price",
        )
    )


@query(
    "q18_topk_per_group",
    oracle="""
    SELECT brand, partkey, retailprice, rnk FROM (
      SELECT p_brand AS brand, p_partkey AS partkey,
             floor((p_retailprice) * 100.0 + 0.5001) / 100.0 AS retailprice,
             CAST(row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rnk
      FROM part
    ) WHERE rnk <= 3
    """,
)
def q18_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranking window (§2.6; order-book top-20 rank
    analog, reference: streaming/order_book.py:89-90)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        table(spark, sf_dir, "part")
        .select(
            F.col("p_brand").alias("brand"),
            F.col("p_partkey").alias("partkey"),
            prnd("p_retailprice", 2).alias("retailprice"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY §2.8) & null handling (§2.2 P8/P9)
# ---------------------------------------------------------------------------


@query(
    "q20_date_functions",
    oracle="""
    SELECT event_id,
           CAST(ts AS DATE)                                   AS dt,
           CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS m, CAST(day(ts) AS INTEGER) AS d, CAST(hour(ts) AS INTEGER) AS h,
           strftime(ts, '%Y-%m-%d')                           AS dt_str,
           CAST(ts AS DATE) + 7                               AS dt_plus7,
           CAST(CAST(ts AS DATE) - INTERVAL 3 MONTH AS DATE)  AS dt_minus_3m,
           CAST(date_trunc('month', CAST(ts AS DATE) - INTERVAL 3 MONTH) AS DATE)
                                                              AS first_day_3m_ago,
           CAST(floor(epoch(ts)) AS BIGINT)                   AS unix_sec
    FROM events WHERE event_id % 10 = 0
    """,
)
def q20_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dominant scalar family (§2.8): from_unixtime-style
    formatting, year/month/day/hour partition derivation
    (trino/D_Load_crypto_candles_realtime_003.sql:39-44), date_add,
    add_months + trunc-to-month (modules/common/utils.py:62-71)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    return ev.select(
        "event_id",
        F.to_date("ts").alias("dt"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.date_format("ts", "yyyy-MM-dd").alias("dt_str"),
        F.date_add(F.to_date("ts"), 7).alias("dt_plus7"),
        F.add_months(F.to_date("ts"), -3).alias("dt_minus_3m"),
        F.trunc(F.add_months(F.to_date("ts"), -3), "MM").alias("first_day_3m_ago"),
        F.unix_timestamp("ts").alias("unix_sec"),
    )


@query(
    "q21_null_and_case_handling",
    oracle="""
    SELECT
      CASE WHEN c_acctbal < 0 THEN 'negative'
           WHEN c_acctbal = 0 THEN 'zero'
           ELSE 'positive' END                       AS balance_bucket,
      count(*)                                       AS n,
      floor((sum(coalesce(c_acctbal, 0.0))) * 100.0 + 0.5001) / 100.0        AS total_bal,
      count(nullif(c_mktsegment, 'MACHINERY'))       AS non_machinery
    FROM customer
    GROUP BY 1
    """,
)
def q21_null_and_case_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF + null-aware counts (P8 null-row filter,
    reference: yahoofinancials_operation.py:57)."""
    c = table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") == 0, "zero")
        .otherwise("positive")
    )
    return c.groupBy(bucket.alias("balance_bucket")).agg(
        F.count("*").alias("n"),
        prnd(F.sum(F.coalesce(F.col("c_acctbal"), F.lit(0.0))), 2).alias("total_bal"),
        F.count(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))).alias(
            "non_machinery"
        ),
    )


@query(
    "q22_string_functions",
    oracle="""
    SELECT p_partkey AS partkey,
           upper(p_brand)                      AS brand_upper,
           substr(p_name, 1, 12)               AS name_prefix,
           CAST(length(p_name) AS INTEGER)     AS name_len,
           concat(p_brand, ':', p_type)        AS brand_type,
           replace(p_brand, 'Brand#', 'B')     AS brand_short,
           CASE WHEN p_type LIKE 'PROM%' THEN 1 ELSE 0 END AS is_promo
    FROM part WHERE p_size >= 40
    """,
)
def q22_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions (cast/alias are the only string ops the
    reference uses — §2.8; we expose the standard family)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        F.when(F.col("p_type").startswith("PROM"), 1).otherwise(0).alias("is_promo"),
    )


# ---------------------------------------------------------------------------
# As-of join (custom temporal operator, SURVEY §7.2 path (a))
# ---------------------------------------------------------------------------


@query(
    "q19_asof_join",
    oracle="""
    WITH c AS (
      SELECT event_type AS id, CAST(ts AS DATE) AS dt,
             avg(value) AS close
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    l AS (
      SELECT event_id, event_type, CAST(ts AS DATE) AS edt
      FROM events WHERE event_id % 13 = 0
    )
    SELECT l.event_id, l.event_type, l.edt,
           floor((c.close) * 10000.0 + 0.5001) / 10000.0 AS right_close,
           c.dt AS right_cdt
    FROM l ASOF LEFT JOIN c ON l.event_type = c.id AND l.edt >= c.dt
    """,
)
def q19_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — point-in-time enrichment Spark lacks natively
    (events -> latest daily candle at or before the event's day).

    Spark-first composition (operators/asof.py): tagged union + one
    per-key window with last(ignorenulls) carry-forward — single
    shuffle, O(n log n), no range explosion, no per-group pandas. The
    DuckDB oracle uses its native ASOF LEFT JOIN (inclusive semantics
    on both sides).
    """
    from ..functions.portable import hash64, o_hash64, prnd as _prnd
    from ..operators.asof import asof_join
    from ..operators.timeseries import events_candles

    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 13 == 0)
    left = ev.select(
        "event_id",
        F.col("event_type").alias("id"),
        F.to_date("ts").alias("edt"),
    )
    right = events_candles(spark, sf_dir).select(
        "id",
        F.col("dt").alias("edt"),
        "close",
        F.col("dt").alias("cdt"),
    )
    out = asof_join(left, right, on="edt", by="id", value_cols=["close", "cdt"])
    return out.select(
        "event_id",
        F.col("id").alias("event_type"),
        "edt",
        _prnd(F.col("right_close"), 4).alias("right_close"),
        F.col("right_cdt"),
    )


_Q23_K = 256  # KMV size: ~6% std err, measured <=5.1% on this data
_Q23_SAMPLE_MOD, _Q23_SAMPLE_KEEP = 5, 2  # deterministic 40% row sample


def _q23_oracle() -> str:
    from ..operators.sketches import HASH_SPACE

    skey = (
        "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)"
    )
    est = (
        f"CASE WHEN nd >= {_Q23_K} THEN {float(_Q23_K - 1)} * {HASH_SPACE}"
        f" / CAST(hh AS DOUBLE) ELSE CAST(nd AS DOUBLE) END"
    )
    return f"""
    WITH h AS (
      SELECT DISTINCT l_returnflag, ({o_hash64("l_partkey")}) AS hh
      FROM lineitem
    ),
    r AS (
      SELECT l_returnflag, hh,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY hh) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS nd
      FROM h
    ),
    kmv AS (
      SELECT l_returnflag,
             CAST(nd AS BIGINT) AS exact_parts,
             {o_rnd(est, 2)} AS kmv_parts
      FROM r WHERE rn = least({_Q23_K}, nd)
    ),
    samp AS (
      SELECT l_returnflag,
             {o_rnd("quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5)", 2)} AS median_price,
             {o_rnd("quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95)", 2)} AS p95_price
      FROM lineitem
      WHERE ({o_hash64(skey)}) % {_Q23_SAMPLE_MOD} < {_Q23_SAMPLE_KEEP}
      GROUP BY l_returnflag
    )
    SELECT k.l_returnflag, k.exact_parts, k.kmv_parts,
           s.median_price, s.p95_price
    FROM kmv k JOIN samp s USING (l_returnflag)
    """


@query("q23_approx_aggregates", oracle=_q23_oracle())
def q23_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate profiling aggregates that still hash-match across
    engines: distinct parts per returnflag via the portable KMV sketch
    (k=256 minimum md5 hashes — bit-reproducible anywhere, unlike
    engine HLL++ whose RNG is implementation-pinned) next to the exact
    count, plus approximate quantiles as exact interpolated percentiles
    over a deterministic 40% hash sample of the rows (the sample is a
    pure function of the row key, so both engines pick identical rows).
    The engine-native sketches (approx_count_distinct/percentile_approx)
    stay available — tests/test_plans.py asserts their error against
    this query's exact columns — but the REGISTERED result is the
    portable formulation, which is what a 100 TB pipeline's QA diff
    needs: approximation without cross-run/cross-engine noise.
    Scale shape: one distinct-shuffle on (flag, hash) then top-k per
    group for KMV; the sample predicate pushes to the scan for the
    quantile pass (reference parity: profiling aggregates in
    query_scripts/trino/*.sql)."""
    from ..operators.sketches import kmv_distinct

    li = table(spark, sf_dir, "lineitem")
    kmv = kmv_distinct(li, "l_returnflag", "l_partkey", k=_Q23_K).select(
        "l_returnflag",
        F.col("n_exact").alias("exact_parts"),
        F.col("kmv_estimate").alias("kmv_parts"),
    )
    skey = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    samp = (
        li.filter(hash64(skey) % _Q23_SAMPLE_MOD < _Q23_SAMPLE_KEEP)
        .groupBy("l_returnflag")
        .agg(
            prnd(
                F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.5)"), 2
            ).alias("median_price"),
            prnd(
                F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.95)"), 2
            ).alias("p95_price"),
        )
    )
    return kmv.join(samp, "l_returnflag")


@query(
    "q24_cube_counts",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n,
           floor((sum(l_quantity)) * 100.0 + 0.5001) / 100.0 AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q24_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (engine extension; completes the
    grouping-sets family next to q17 ROLLUP)."""
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            prnd(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@query(
    "q29_exact_percentiles",
    oracle="""
    SELECT o_orderpriority AS priority,
           floor((quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5)) * 100.0 + 0.5001) / 100.0  AS median_price,
           floor((quantile_cont(CAST(o_totalprice AS DOUBLE), 0.95)) * 100.0 + 0.5001) / 100.0 AS p95_price,
           floor((quantile_cont(CAST(o_totalprice AS DOUBLE), 0.99)) * 100.0 + 0.5001) / 100.0 AS p99_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q29_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark
    `percentile`; DuckDB `quantile_cont` — same interpolation). The
    approximate sibling (q23) is the scale path; this is the exact
    baseline it is judged against."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               floor(percentile(o_totalprice, 0.5D)  * 100.0D + 0.5001D) / 100.0D AS median_price,
               floor(percentile(o_totalprice, 0.95D) * 100.0D + 0.5001D) / 100.0D AS p95_price,
               floor(percentile(o_totalprice, 0.99D) * 100.0D + 0.5001D) / 100.0D AS p99_price
        FROM orders GROUP BY o_orderpriority
        """
    )


@query(
    "q26b_unpivot_measures",
    oracle="""
    SELECT o_orderpriority AS priority, measure,
           floor((val) * 100.0 + 0.5001) / 100.0 AS val
    FROM (
      SELECT o_orderpriority,
             sum(o_totalprice) AS total_price,
             CAST(count(*) AS DOUBLE) AS n_orders,
             max(o_totalprice) AS max_price
      FROM orders GROUP BY o_orderpriority
    ) UNPIVOT (val FOR measure IN (total_price, n_orders, max_price))
    """,
)
def q26b_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot wide measures to long (stack) — the inverse of q16's
    pivot; the same primitive that turns the one-pass window mart into
    the reference's range-stamped rows (operators/rolling.py)."""
    wide = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.sum("o_totalprice").alias("total_price"),
            F.count("*").cast("double").alias("n_orders"),
            F.max("o_totalprice").alias("max_price"),
        )
    )
    return wide.selectExpr(
        "priority",
        "stack(3, 'total_price', total_price, 'n_orders', n_orders, "
        "'max_price', max_price) AS (measure, val)",
    ).select("priority", "measure", prnd("val", 2).alias("val"))


@query(
    "q28b_ranking_family",
    oracle="""
    SELECT p_partkey AS partkey, p_brand AS brand,
           CAST(rank()       OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           floor((percent_rank() OVER w) * 1000000.0 + 0.5001) / 1000000.0 AS prnk,
           floor((cume_dist()    OVER w) * 1000000.0 + 0.5001) / 1000000.0 AS cdist,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    """,
)
def q28b_ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family per group (rank, dense_rank,
    percent_rank, cume_dist, ntile) — q18 covers row_number; these
    complete §2.6's ordering operators."""
    from pyspark.sql import Window as W

    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_brand").alias("brand"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        prnd(F.percent_rank().over(w), 6).alias("prnk"),
        prnd(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q26c_intersect_except",
    oracle="""
    SELECT 'both' AS bucket, n_nationkey AS key FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT 'customer_only', n_nationkey FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
    )
    """,
)
def q26c_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (engine completeness — SURVEY §2.7 notes the
    reference never uses them; a user of a full engine will)."""
    cust_n = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("key")
    )
    supp_n = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("key")
    )
    both = cust_n.intersect(supp_n).select(F.lit("both").alias("bucket"), "key")
    # subtract == EXCEPT (set semantics); exceptAll would keep leftover
    # multiplicity for keys present on both sides
    only = cust_n.subtract(supp_n).select(
        F.lit("customer_only").alias("bucket"), "key"
    )
    return both.unionByName(only)


@query(
    "q27b_table_profile",
    oracle="""
    SELECT 'o_totalprice' AS col,
           count(*) AS n_rows,
           count(o_totalprice) AS n_non_null,
           count(DISTINCT o_totalprice) AS n_distinct,
           floor((min(o_totalprice)) * 100.0 + 0.5001) / 100.0 AS min_val,
           floor((max(o_totalprice)) * 100.0 + 0.5001) / 100.0 AS max_val,
           floor((avg(o_totalprice)) * 100.0 + 0.5001) / 100.0 AS avg_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(o_custkey),
           count(DISTINCT o_custkey),
           floor((min(o_custkey)) * 100.0 + 0.5001) / 100.0,
           floor((max(o_custkey)) * 100.0 + 0.5001) / 100.0,
           floor((avg(o_custkey)) * 100.0 + 0.5001) / 100.0
    FROM orders
    """,
)
def q27b_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile sweep (rows, nulls, distinct, min/max/avg per
    column) — the engine primitive behind the reference's count/
    freshness operational checks, generalized to a profiling scan."""
    o = table(spark, sf_dir, "orders")
    out = None
    for c in ("o_totalprice", "o_custkey"):
        prof = o.agg(
            F.count("*").alias("n_rows"),
            F.count(c).alias("n_non_null"),
            F.countDistinct(c).alias("n_distinct"),
            prnd(F.min(c).cast("double"), 2).alias("min_val"),
            prnd(F.max(c).cast("double"), 2).alias("max_val"),
            prnd(F.avg(c), 2).alias("avg_val"),
        ).select(F.lit(c).alias("col"), "*")
        out = prof if out is None else out.unionByName(prof)
    return out


@query(
    "q24b_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def q24b_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (completes the grouping family beyond
    ROLLUP q17 / CUBE q24): per-flag totals and per-status totals in
    one pass."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@query(
    "q28c_value_windows",
    oracle="""
    -- windows must run over ALL rows (Spark side filters after the
    -- window); SQL WHERE runs before windows, so wrap in a subquery
    SELECT orderkey, priority, first_price, last_price, third_price FROM (
      SELECT o_orderkey AS orderkey, o_orderpriority AS priority,
             floor((first_value(o_totalprice) OVER w) * 100.0 + 0.5001) / 100.0 AS first_price,
             floor((last_value(o_totalprice) OVER
                    (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) * 100.0 + 0.5001) / 100.0 AS last_price,
             floor((nth_value(o_totalprice, 3) OVER
                    (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) * 100.0 + 0.5001) / 100.0 AS third_price
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey)
    ) WHERE orderkey % 17 = 0
    """,
)
def q28c_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over deterministic ordering
    (completing the window value-function family)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        table(spark, sf_dir, "orders")
        .withColumn("first_price", prnd(F.first("o_totalprice").over(w), 2))
        .withColumn("last_price", prnd(F.last("o_totalprice").over(wfull), 2))
        .withColumn(
            "third_price", prnd(F.nth_value("o_totalprice", 3).over(wfull), 2)
        )
        .filter(F.col("o_orderkey") % 17 == 0)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderpriority").alias("priority"),
            "first_price",
            "last_price",
            "third_price",
        )
    )


_Q110_K, _Q110_M = 3, 4096  # bloom: 3 hash functions, 4096 bits


def _q110_oracle() -> str:
    def pos(salt: int, expr: str) -> str:
        inner = "'bf" + str(salt) + ":' || " + expr
        return "(" + o_hash64(inner) + ") % " + str(_Q110_M)

    bit_rows = " UNION ALL ".join(
        f"SELECT DISTINCT {pos(r, 'CAST(o_custkey AS VARCHAR)')} AS p FROM orders"
        for r in range(_Q110_K)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT c_custkey, {pos(r, 'CAST(c_custkey AS VARCHAR)')} AS p FROM customer"
        for r in range(_Q110_K)
    )
    return f"""
    WITH bits AS (SELECT DISTINCT p FROM ({bit_rows})),
    probes AS ({probe_rows}),
    hit AS (
      SELECT c_custkey, CAST(count(b.p) AS BIGINT) AS n_hit
      FROM probes LEFT JOIN bits b USING (p)
      GROUP BY c_custkey
    ),
    actual AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
    SELECT h.c_custkey,
           CAST(h.n_hit = {_Q110_K} AS INT) AS might_contain,
           CAST(a.c_custkey IS NOT NULL AS INT) AS is_actual,
           CAST(h.n_hit = {_Q110_K} AND a.c_custkey IS NULL AS INT) AS false_positive
    FROM hit h LEFT JOIN actual a USING (c_custkey)
    """


@query("q110_bloom_membership", oracle=_q110_oracle())
def q110_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit portable bloom filter: 3 salted-md5 hash positions over
    4096 bits built from the orders' customer keys, probed by every
    customer — per customer the filter verdict, ground truth, and the
    false-positive flag. Spark's native bloom_filter_agg drives the
    same pruning at runtime (plan-asserted in tests/test_plans.py);
    this explicit build makes the structure itself gate-checkable and
    portable: the bit set is a distinct integer set, so construction
    is one distinct-aggregate, shards merge by set union (bitwise OR),
    and no-false-negatives is structural. At 100 TB the filter
    broadcast replaces a shuffle of the probe side — the semi-join
    pattern for 'does this key exist on the other side of the join'."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")

    def positions(col, salts=_Q110_K):
        return F.array(
            *[
                hash64(F.concat(F.lit(f"bf{r}:"), col.cast("string"))) % _Q110_M
                for r in range(salts)
            ]
        )

    bits = (
        orders.select(F.explode(positions(F.col("o_custkey"))).alias("p"))
        .distinct()
    )
    probes = cust.select(
        "c_custkey", F.explode(positions(F.col("c_custkey"))).alias("p")
    )
    hit = (
        probes.join(F.broadcast(bits.withColumn("_hit", F.lit(1))), "p", "left")
        .groupBy("c_custkey")
        .agg(F.count("_hit").alias("n_hit"))
    )
    actual = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    return (
        hit.join(actual.withColumn("_act", F.lit(1)), "c_custkey", "left")
        .select(
            "c_custkey",
            (F.col("n_hit") == _Q110_K).cast("int").alias("might_contain"),
            F.col("_act").isNotNull().cast("int").alias("is_actual"),
            ((F.col("n_hit") == _Q110_K) & F.col("_act").isNull())
            .cast("int")
            .alias("false_positive"),
        )
    )
