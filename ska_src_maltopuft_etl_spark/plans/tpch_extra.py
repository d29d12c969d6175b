"""Advanced relational patterns — TPC-H Q7-Q22 shapes on the testdata.

These widen the declarative surface beyond SURVEY.md §2's literal
inventory with the classic decision-support shapes the reference's
users would expect from a general engine: multi-hop snowflake joins,
correlated scalar subqueries (decorrelated to aggregate + join),
EXISTS / NOT EXISTS with multiple correlations, HAVING against global
scalars, count-distinct, and zero-preserving left-join counts.

Spark-first notes applied throughout:

- dimension tables (``region``/``nation``/``supplier``/``part``) are
  broadcast so the fact scan (``lineitem``) never shuffles for them;
- correlated subqueries are written pre-decorrelated (aggregate +
  equi-join) — the same plan Catalyst's ``DecorrelateInnerQuery``
  produces, but explicit, so the shape is visible in ``.explain`` and
  survives at 100 TB where the optimizer cannot always decorrelate;
- threshold comparisons against aggregates use integer-valued doubles
  (``l_quantity``) where possible — integer sums are exact in IEEE
  doubles, so predicate boundaries cannot flip between engines;
- adapted columns (the testdata has no ``partsupp``, phone numbers, or
  commit/receipt dates) are noted per query.

Reference parity: the reference's query surface is plain SQLAlchemy
inserts/selects (e.g. `/root/reference/src/ska_src_maltopuft_etl/core/
insert.py:40`), so these patterns are strictly additive capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ska_src_maltopuft_etl_spark.plans.registry import register
from ska_src_maltopuft_etl_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q07_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_12')
         OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_7')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    covers=("J1", "P5", "A2"),
    description=(
        "TPC-H Q7 pattern: 5-hop snowflake join with a cross-table "
        "disjunction on two nation roles, revenue by (supplier nation, "
        "customer nation, ship year)"
    ),
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both nation hops are broadcasts; the only shuffles are the two
    fact-side equi-joins (lineitem->orders, orders->customer), which at
    cluster scale co-partition on their keys under AQE."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_12"))
            | ((F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_7"))
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


@register(
    "q08_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    covers=("J1", "P5", "A2", "P7"),
    description=(
        "TPC-H Q8 pattern: national market share (conditional-sum ratio) "
        "within one region's customers for one part type, by order year"
    ),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), "n_regionkey")
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    j = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q09_product_profit",
    oracle="""
    SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - p.p_retailprice * 0.1 * l.l_quantity AS amount
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE 'red %'
    ) profit
    GROUP BY nation, o_year
    """,
    covers=("J1", "P3", "A2", "F1"),
    description=(
        "TPC-H Q9 pattern: profit by supplier nation and order year for a "
        "part-name LIKE family (adapted: 10% of p_retailprice stands in "
        "for ps_supplycost — the testdata has no partsupp table)"
    ),
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("red %"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * 0.1 * F.col("l_quantity")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH v AS (
      SELECT l.l_partkey AS partkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name IN ('NATION_1', 'NATION_2')
      GROUP BY l.l_partkey
    )
    SELECT partkey, CAST(qty AS BIGINT) AS qty
    FROM v
    WHERE qty > (SELECT SUM(qty) * 0.002 FROM v)
    """,
    covers=("A2", "P5", "J9"),
    description=(
        "TPC-H Q11 pattern: per-part volume held by two nations' "
        "suppliers, HAVING against a global-scalar subquery (0.2% of "
        "total); quantity (integer-valued, exact IEEE sums) keeps the "
        "threshold boundary engine-independent"
    ),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global scalar is a one-row aggregate crossJoin-broadcast —
    the explicit form of Catalyst's scalar-subquery plan; at 100 TB the
    per-part aggregate is the only shuffle, the scalar side is a
    single-row broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    v = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum("l_quantity").alias("qty"))
    )
    total = v.agg((F.sum("qty") * 0.002).alias("__threshold"))
    return (
        v.crossJoin(F.broadcast(total))
        .where(F.col("qty") > F.col("__threshold"))
        .select("partkey", F.col("qty").cast("long").alias("qty"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    covers=("J3", "A2", "P6"),
    description=(
        "TPC-H Q13 pattern: distribution of per-customer order counts via "
        "zero-preserving left join (COUNT(col) skips the null-extended "
        "rows) + re-aggregation on the count"
    ),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join filter must live in the JOIN condition, not a WHERE —
    a WHERE would turn the left join back into an inner one and drop
    zero-order customers."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           ROUND(r.total_revenue, 2) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    covers=("A2", "J1", "W1"),
    description=(
        "TPC-H Q15 pattern: quarterly revenue per supplier, filtered to "
        "the MAX via a scalar subquery over the same derived table "
        "(each engine compares its own sums, so the equality is "
        "self-consistent)"
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    covers=("J1", "P5", "A2"),
    description=(
        "TPC-H Q16 pattern: distinct-supplier counts per (brand, type, "
        "size) with NOT IN excluded-supplier subquery (adapted: negative "
        "s_acctbal stands in for the complaints comment filter)"
    ),
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a provably non-null key column is an anti-join —
    expressed directly as left_anti (null-key NOT IN semantics, which
    would yield an empty result, don't apply: s_suppkey is a pk)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    excluded = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(excluded, li["l_suppkey"] == excluded["s_suppkey"], "left_anti")
        .join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
    covers=("J1", "A3", "P5"),
    description=(
        "TPC-H Q17 pattern: correlated per-part AVG scalar subquery, "
        "decorrelated to a per-part aggregate + equi-join; integer-valued "
        "l_quantity makes AVG exact so the `<` boundary cannot flip "
        "between engines"
    ),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-part average must aggregate ALL lineitem rows (the
    correlation is on l_partkey only), not just Brand#23 rows — the
    filter applies to the outer side alone."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("__qty_limit")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(per_part, li["l_partkey"] == F.col("__pk"))
        .where(F.col("l_quantity") < F.col("__qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           epoch_us(o.o_orderdate) AS o_orderdate_us,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    covers=("J1", "A2", "P5"),
    description=(
        "TPC-H Q18 pattern: large-quantity orders via IN over a grouped "
        "HAVING subquery (left-semi join against the aggregate), then "
        "customer rollup"
    ),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HAVING aggregate uses exact integer-valued sums, so the
    >250 membership set is identical across engines. The semi join
    prunes orders before the wide 3-way join — at scale this is the
    difference between shuffling all of lineitem twice and once."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .where(F.col("__qty") > 250)
        .select(F.col("l_orderkey").alias("__big_ok"))
    )
    o_big = o.join(big, o["o_orderkey"] == F.col("__big_ok"), "left_semi")
    return (
        c.join(o_big, c["c_custkey"] == o_big["o_custkey"])
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_micros("o_orderdate").alias("o_orderdate_us"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
    )


@register(
    "q20_part_promotion",
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
      AND s.s_suppkey IN (
        SELECT l.l_suppkey FROM lineitem l
        WHERE l.l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(l.l_quantity) > 50)
    """,
    covers=("J1", "P5", "A2"),
    description=(
        "TPC-H Q20 pattern: nested IN chain — suppliers who moved >50 "
        "units of any 'red' part, restricted to three nations (adapted: "
        "shipped quantity stands in for partsupp availqty)"
    ),
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two stacked semi joins: parts filter reduces lineitem before the
    per-(supplier, part) aggregate; the distinct supplier set then
    semi-joins the supplier dim. All dims broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_4", "NATION_5")
    )
    red_parts = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("red %"))
        .select("p_partkey")
    )
    movers = (
        li.join(red_parts, li["l_partkey"] == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .where(F.col("__qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(movers, s["s_suppkey"] == movers["l_suppkey"], "left_semi")
        .select("s_name", "n_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 120 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 120 DAY)
    GROUP BY s.s_name
    """,
    covers=("J1", "P5", "A2", "W1"),
    description=(
        "TPC-H Q21 pattern: sole-late-supplier detection via correlated "
        "EXISTS + NOT EXISTS, decorrelated to per-order distinct-supplier "
        "counts (adapted: shipped >120 days after order date stands in "
        "for receipt-after-commit lateness)"
    ),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS(other supplier) == per-order distinct-supplier count >= 2;
    NOT EXISTS(other LATE supplier) == per-order distinct LATE supplier
    count == 1 (l1 itself is late). A whole-partition window frame on
    l_orderkey computes both distinct counts alongside the rows in ONE
    shuffle — the aggregate+join-back decorrelation would shuffle
    twice. Per-order supplier sets are tiny (a handful of lines), so
    collect_set stays cheap and skew-safe at scale."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2")
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS")
    w = Window.partitionBy("l_orderkey")
    waiting = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .withColumn("__late", late)
        .withColumn("__nsupp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "__nlate",
            F.size(
                F.collect_set(
                    F.when(F.col("__late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .where(F.col("__late") & (F.col("__nsupp") >= 2) & (F.col("__nlate") == 1))
    )
    return (
        waiting.join(s, F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_dormant_customers",
    oracle="""
    SELECT c.c_nationkey AS cntry,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
    covers=("P5", "A3", "J1", "A2"),
    description=(
        "TPC-H Q22 pattern: above-average-balance customers with no "
        "recent orders — global scalar AVG subquery + NOT EXISTS "
        "anti-join, grouped by nation (adapted: c_nationkey stands in "
        "for the phone country code)"
    ),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anti-join side is pre-filtered to recent orders before the
    shuffle; the scalar average is a broadcast single row. At 100 TB
    both inputs to the anti-join are key-partitioned once."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
