"""TPC-H completion set: q2/q9/q11/q12/q16/q20/q21 analogs.

The driver testdata omits ``partsupp`` and the lineitem shipping columns
(l_shipmode / l_commitdate / l_receiptdate), so these queries are ADAPTED:
each preserves the original query's operator shape — the thing the engine
is graded on — over the columns that exist:

- q2: argmin-per-group join (min-cost supplier per part) with a
  deterministic multi-key tiebreak order;
- q9: 5-way join with computed profit grouped by (nation, year);
- q11: HAVING over a global scalar aggregate (fraction-of-total);
- q12: fact-fact join + conditional two-way CASE counts per group;
- q16: bridge-table distinct-count with a NOT-IN anti-join exclusion;
- q20: nested semi-join chain (supplier <- qualifying shipped volume);
- q21: double-correlated EXISTS / NOT EXISTS, de-correlated in the
  Spark plan to per-order aggregates (one shuffle, no per-row probes).

Scale notes: every dim side (part / supplier / nation) is broadcast;
lineitem aggregates happen BEFORE joins so the shuffled payload is the
grouped result, not raw fact rows. The q21 rewrite is the canonical
distributed de-correlation — correlated subqueries become per-key aggs
joined back on the correlation key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from transitdata_monitor_data_collector_spark.functions.rounding import fround
from transitdata_monitor_data_collector_spark.plans import register, table

# ---------------------------------------------------------------------------
# Q2: min-cost supplier per part (argmin join). Supply relation is derived
# from lineitem: unit cost = min observed l_extendedprice / l_quantity per
# (part, supplier) — the partsupp analog in the trimmed schema.
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name,
           p_partkey, p_name,
           floor(unit_cost * 1e4 + 0.5) / 1e4 AS min_unit_cost
    FROM supply
    JOIN part     ON p_partkey = partkey
    JOIN supplier ON s_suppkey = suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_type = 'STANDARD' AND p_size <= 10
      AND unit_cost = (SELECT min(s2.unit_cost) FROM supply s2
                       WHERE s2.partkey = p_partkey)
    ORDER BY acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 analog (adapted: supply = lineitem-derived unit costs, "
    "no partsupp/region in the trimmed schema): argmin-per-group via a "
    "correlated min subquery, de-correlated to a grouped min joined back "
    "on the part key. Ties keep all rows, as in the original Q2.",
    tags=("join", "subquery", "topk", "tpch"),
)
def q2_min_cost_supplier(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    supply = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    # de-correlated argmin: grouped min per part, equi-joined back on
    # (partkey, unit_cost) — double equality is exact because both sides
    # select the same stored value, no re-arithmetic
    min_cost = supply.groupBy("partkey").agg(F.min("unit_cost").alias("unit_cost"))
    return (
        supply.join(min_cost, ["partkey", "unit_cost"])
        .join(F.broadcast(part), F.col("partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.round(F.col("s_acctbal"), 2).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            # floor-micro, not round(): price/qty lands exactly on
            # .00005 boundaries where the engines' round() algorithms
            # disagree (Spark rounds the exact expansion, DuckDB a
            # scaled double) — floor on identical doubles cannot
            (F.floor(F.col("unit_cost") * 1e4 + 0.5) / 1e4).alias(
                "min_unit_cost"
            ),
        )
        .orderBy(F.desc("acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit by nation and year (5-way join).
# ---------------------------------------------------------------------------


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                     - 0.1 * p_retailprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE) * 1e2 + 0.5)
             / 1e2 AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 analog (adapted: cost proxy = 0.1 * p_retailprice * "
    "l_quantity, no ps_supplycost in the trimmed schema): 5-way join "
    "where part/supplier/nation broadcast and the orders join is the one "
    "real shuffle; the p_name filter prunes the fact before any join.",
    tags=("join", "agg", "tpch"),
)
def q9_product_type_profit(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders")
    # per-row HALF_UP decimal cast + exact decimal sum: order-independent
    # across Spark's partial/final aggregation vs DuckDB's sequential sum
    # (see q11 note; the cast itself rounds at scale 4 on both engines)
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        # floor-micro on the final double, NOT round(): exact 4-decimal
        # sums land on .xx50 boundaries where the engines' round()
        # disagree (tests/test_rounding_contract.py)
        .agg(fround(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q11: important stock — HAVING against a global-total scalar subquery.
# ---------------------------------------------------------------------------


@register(
    "q11_important_stock",
    oracle="""
    WITH value_by_part AS (
        SELECT l_partkey AS partkey,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS val
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY l_partkey
    )
    SELECT partkey,
           floor(CAST(val AS DOUBLE) * 1e2 + 0.5) / 1e2 AS value
    FROM value_by_part
    WHERE 1000 * CAST(val AS DOUBLE)
          > (SELECT CAST(sum(val) AS DOUBLE) FROM value_by_part)
    ORDER BY value DESC, partkey
    """,
    doc="TPC-H Q11 analog (adapted: value = lineitem revenue for a "
    "3-nation supplier slice, no partsupp): grouped total filtered "
    "against a fraction of the GLOBAL total — the scalar subquery is a "
    "1-row broadcast, the per-part agg shuffles once and is reused for "
    "both sides.",
    tags=("agg", "subquery", "tpch"),
)
def q11_important_stock(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    # exact decimal summation: a double sum is order-dependent in its last
    # ulp, which flips round(..., 2) when the true value sits on a .005
    # boundary — per-row HALF_UP cast to 4 decimals then sum as DECIMAL is
    # order-independent and bit-identical to the oracle
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    by_part = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(rev).alias("val"))
    )
    # cache-free exchange reuse: the same grouped result feeds the global
    # scalar (crossJoin of a 1-row agg — Spark broadcasts it) and the filter.
    # The 0.1% threshold comparison is the IDENTICAL double expression on
    # both engines: 1000 * CAST(val AS DOUBLE) > CAST(sum(val) AS DOUBLE).
    # (0.001 * sum would be double on the Spark side but exact decimal in
    # DuckDB; 1000 * val in decimal overflows precision 38. Same-expression
    # double math is bit-deterministic: one cast + one exact-scale multiply.)
    total = by_part.agg(F.sum("val").cast("double").alias("grand_total"))
    return (
        by_part.crossJoin(F.broadcast(total))
        .filter(F.col("val").cast("double") * 1000 > F.col("grand_total"))
        .select(
            "partkey",
            fround(F.col("val"), 2).alias("value"),
        )
        .orderBy(F.desc("value"), "partkey")
    )


# ---------------------------------------------------------------------------
# Q12: shipping priority classes — conditional CASE counts per group.
# ---------------------------------------------------------------------------


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 analog (adapted: l_returnflag stands in for the absent "
    "l_shipmode, ship-year filter for the receipt-date window): fact-fact "
    "equi-join with the date filter pushed to the lineitem scan, then "
    "branch-free conditional counts in one aggregate pass.",
    tags=("join", "agg", "tpch"),
)
def q12_priority_shipping(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q16: supplier variety per part class — distinct-count over a bridge with
# a NOT-IN exclusion (anti-join).
# ---------------------------------------------------------------------------


@register(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) bridge
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 analog (adapted: the part-supplier bridge is the "
    "distinct (l_partkey, l_suppkey) projection of lineitem; the excluded "
    "suppliers are the negative-balance ones instead of the absent "
    "s_comment complaint match): distinct-pair reduction BEFORE the join "
    "(shrinks the shuffle to unique pairs), broadcast anti-join for the "
    "NOT IN, distinct-count aggregate on top.",
    tags=("join", "agg", "antijoin", "tpch"),
)
def q16_part_supplier_variety(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad_supp = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    bridge = li.select("l_partkey", "l_suppkey").distinct()
    return (
        bridge.join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20: suppliers with qualifying shipped volume — nested semi-join chain.
# ---------------------------------------------------------------------------


@register(
    "q20_excess_suppliers",
    oracle="""
    SELECT s_name, round(s_acctbal, 2) AS acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name IN ('NATION_4', 'NATION_5')
      AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'small%')
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey
          HAVING sum(l_quantity) > 40
      )
    ORDER BY s_name
    """,
    doc="TPC-H Q20 analog (adapted: availqty threshold becomes shipped "
    "volume > 40 within the year, part filter on the synthetic 'small%' "
    "names): two nested semi-joins — parts semi-filter the fact "
    "(broadcast), the HAVING agg produces the supplier keys, supplier "
    "left-semi-joins those keys. No fact rows survive past the agg.",
    tags=("join", "semijoin", "agg", "tpch"),
)
def q20_excess_suppliers(spark, sf_dir):
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_4", "NATION_5")
    )
    small_parts = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    qualifying = (
        li.join(
            F.broadcast(small_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round(F.col("s_acctbal"), 2).alias("acctbal"))
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting — double-correlated EXISTS /
# NOT EXISTS, de-correlated to per-order aggregates.
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE l1.l_returnflag = 'R'
      AND n_name IN ('NATION_6', 'NATION_7')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 analog (adapted: l_returnflag='R' marks the late/"
    "failed line since receipt/commit dates are absent). The oracle keeps "
    "the literal EXISTS/NOT EXISTS; the Spark plan de-correlates both "
    "into ONE per-order aggregate — n_supp = distinct suppliers on the "
    "order, n_ret_supp = distinct suppliers with a returned line — and "
    "the pair of correlated probes becomes a single equi-join on "
    "l_orderkey (EXISTS <=> n_supp >= 2; NOT EXISTS <=> n_ret_supp = 1 "
    "given l1 itself is returned). At 100 TB that is one shuffle instead "
    "of two correlated scans.",
    tags=("join", "subquery", "agg", "tpch"),
)
def q21_waiting_suppliers(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_6", "NATION_7")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    l1 = li.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(per_order.filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1)),
              "l_orderkey", "left_semi")
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
