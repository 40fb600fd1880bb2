"""Relational breadth extensions: multi-level aggregation (ROLLUP /
grouping sets), pivot, window distribution functions, disjunctive
predicate pushdown, and scalar-subquery + anti-join composition.

These widen SURVEY §2.4 (aggregations), §2.5 (window ranking family)
and §2.2 (predicates) beyond the reference's literal query set to the
adjacent shapes any analytics user of the reference would reach for
next (the reference's Trino layer supports all of them natively, e.g.
trino/D_Load_crypto_candles_realtime_003.sql runs on a full ANSI-SQL
engine). Every plan is declarative so Catalyst keeps pushdown and
partial aggregation; pivots use a static column list so the plan is
fully resolved at analysis time (no driver-side distinct scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.portable import o_rnd, prnd
from ..sources.readers import table
from .registry import query

# ---------------------------------------------------------------------------
# q134 ROLLUP / grouping-sets aggregate
# ---------------------------------------------------------------------------


@query(
    "q134_grouping_sets",
    oracle=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS lvl,
           {o_rnd('sum(l_quantity)', 2)} AS sum_qty,
           {o_rnd('sum(l_extendedprice * (1 - l_discount))', 2)} AS sum_disc_price,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q134_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregate in ONE pass: (flag, status), (flag), ()
    via ROLLUP — the dashboard "totals row" shape.

    Spark expands rollup into a single Expand + hash-aggregate: the
    fact table is scanned ONCE and each row feeds all three grouping
    sets map-side, so at 100 TB this costs the same single shuffle as
    the finest-grained groupBy (3 grouping sets x ~8 distinct keys of
    partial rows per partition), not three scans. ``grouping()`` bits
    disambiguate real NULL keys from subtotal rows portably.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            prnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            prnd(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.count("*").alias("n_rows"),
            (
                F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
            ).cast("long").alias("lvl"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "lvl",
            "sum_qty",
            "sum_disc_price",
            "n_rows",
        )
    )


# ---------------------------------------------------------------------------
# q135 pivot (long -> wide crosstab)
# ---------------------------------------------------------------------------

_Q135_MONTHS = list(range(1, 13))


@query(
    "q135_pivot_matrix",
    oracle="""
    SELECT o_orderpriority AS id,
    """
    + ",\n".join(
        f"       {o_rnd(f'avg(CASE WHEN EXTRACT(month FROM o_orderdate) = {m} THEN o_totalprice END)', 2)} AS m{m:02d}"
        for m in _Q135_MONTHS
    )
    + """
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def q135_pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot / crosstab: priority x calendar-month average-price matrix
    for 1995 (5 rows x 12 static month columns).

    ``.pivot(col, values)`` with an EXPLICIT value list — never the
    two-arg form, which runs a driver-side distinct job to discover
    columns before the plan can even resolve. With static values the
    pivot compiles to one hash aggregate with 12 conditional columns:
    single shuffle of 5x12 partial cells per partition, same cost as a
    plain groupBy at any scale.
    """
    o = table(spark, sf_dir, "orders")
    proj = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select(
        F.col("o_orderpriority").alias("id"),
        F.month("o_orderdate").alias("month"),
        "o_totalprice",
    )
    wide = (
        proj.groupBy("id")
        .pivot("month", _Q135_MONTHS)
        .agg(prnd(F.avg("o_totalprice"), 2))
    )
    renames = [F.col("id")] + [
        F.col(str(m)).alias(f"m{m:02d}") for m in _Q135_MONTHS
    ]
    return wide.select(*renames)


# ---------------------------------------------------------------------------
# q136 window distribution functions
# ---------------------------------------------------------------------------


@query(
    "q136_distribution_windows",
    oracle=f"""
    SELECT c_custkey,
           c_nationkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           {o_rnd('percent_rank() OVER w', 6)} AS pct_rank,
           {o_rnd('cume_dist() OVER w', 6)} AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def q136_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window distribution family (§2.5 ranking beyond row_number):
    ntile / percent_rank / cume_dist over balances per nation.

    All three share ONE window spec, so Spark plans a single sort
    within each nation partition (one exchange + one sort total — the
    WindowExec computes all three functions in the same pass). The
    ORDER BY carries c_custkey as a unique tie-break: distribution
    functions over a non-total order are nondeterministic under
    parallel re-runs, which at 100 TB means unreproducible outputs.
    """
    win = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(win).cast("long").alias("quartile"),
        prnd(F.percent_rank().over(win), 6).alias("pct_rank"),
        prnd(F.cume_dist().over(win), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# q137 disjunctive predicate (TPC-H Q19 shape)
# ---------------------------------------------------------------------------


@query(
    "q137_disjunctive_pred",
    oracle=f"""
    SELECT {o_rnd('coalesce(sum(l_extendedprice * (1 - l_discount)), 0.0)', 2)} AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q137_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-conjunctions join predicate (TPC-H Q19 shape): the classic
    optimizer test for disjunctive pushdown.

    Catalyst factors the single-table conjuncts out of the OR: lineitem
    gets ``l_quantity BETWEEN 1 AND 30`` and part gets the brand/size
    disjunction pushed INTO the scans (visible in PushedFilters), so
    both sides shrink before the join; the full disjunction evaluates
    post-join only on surviving rows. part is broadcast — the 100 TB
    fact side never shuffles for a dimension predicate.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(clause).agg(
        prnd(
            F.coalesce(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                F.lit(0.0),
            ),
            2,
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# q138 scalar subquery + anti join (TPC-H Q22 shape)
# ---------------------------------------------------------------------------


@query(
    "q138_dormant_customers",
    oracle=f"""
    WITH cutoff AS (
      SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           count(*) AS n_cust,
           {o_rnd('sum(c_acctbal)', 2)} AS total_bal
    FROM customer, cutoff
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q138_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style "rich but dormant" screen: scalar-subquery
    threshold + NOT EXISTS, grouped by nation.

    The average-balance scalar is a 1-row aggregate cross-joined in
    (BroadcastNestedLoopJoin of one row — free); NOT EXISTS compiles to
    LEFT ANTI join on o_custkey. At scale the anti join's orders side
    projects a single column and partial-distincts it map-side; with
    AQE the post-threshold customer side is small enough to broadcast,
    making the anti probe shuffle-free.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    cutoff = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = c.crossJoin(cutoff).filter(F.col("c_acctbal") > F.col("avg_bal"))
    dormant = rich.join(
        o, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )
    return dormant.groupBy("c_nationkey").agg(
        F.count("*").alias("n_cust"),
        prnd(F.sum("c_acctbal"), 2).alias("total_bal"),
    )
