"""Additional TPC-H-shape queries (Q4/Q7/Q10/Q12/Q14/Q16/Q19/Q22
analogues) adapted to the driver's reduced TPC-H-ish schemas.

The reference implements no relational queries at all (SURVEY.md
§2.2 — its only dataflow is the CDC archival pipeline,
`StartJob.java:52-103`), so these are capability queries over the
synthetic tables: each exercises a distinct plan shape — EXISTS
aggregation, bi-directional theta join, conditional aggregation,
disjunctive pushdown, distinct-count anti-join, scalar-subquery
anti-join — with a DuckDB oracle.

Columns absent from the reduced schemas (l_shipmode, l_commitdate,
p_container, c_phone) are substituted with present ones that keep
the plan shape identical; each substitution is noted per query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from .registry import register
from .relational_queries import _DSUM, _dsum


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "tpch_q4_priority_count",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
""",
    tags=("tpch", "subquery", "groupby"),
    doc="TPC-H Q4 shape: order-priority checking — correlated EXISTS "
    "(Catalyst: left-semi hash join) feeding an aggregation. "
    "l_commitdate/l_receiptdate are absent from the reduced schema; "
    "the lateness predicate is l_shipdate > o_orderdate instead.",
)
def tpch_q4_priority_count(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       {_DSUM('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    tags=("tpch", "join", "groupby"),
    doc="TPC-H Q7 shape: volume shipping between two nations — "
    "disjunctive cross-nation predicate over a 6-way join, grouped "
    "by both nation roles and ship year. Both nation dims broadcast.",
)
def tpch_q7_volume_shipping(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dsum(F.col("volume"), "revenue"))
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {_DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("tpch", "join", "groupby", "topk"),
    doc="TPC-H Q10 shape: returned-item reporting — 4-way join with "
    "a quarter date window and returnflag filter, revenue per "
    "customer, global top-20 (TakeOrderedAndProject, no full sort).",
)
def tpch_q10_returned_items(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q12_priority_classes",
    oracle="""
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
""",
    tags=("tpch", "join", "groupby", "conditional"),
    doc="TPC-H Q12 shape: shipping-priority classes — conditional "
    "(CASE) aggregation over a fact-fact join. l_shipmode is absent "
    "from the reduced schema; groups are l_linestatus instead.",
)
def tpch_q12_priority_classes(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
SELECT 100.00 * ({_DSUM("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")})
       / ({_DSUM('l.l_extendedprice * (1 - l.l_discount)')}) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate < TIMESTAMP '1997-04-01'
""",
    tags=("tpch", "join", "agg", "conditional"),
    doc="TPC-H Q14 shape: promotion-revenue share — conditional "
    "numerator over an unconditional denominator in one aggregation "
    "pass (p_type = 'PROMO' is the reduced schema's promo marker).",
)
def tpch_q14_promo_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    from .relational_queries import _dsum_col

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.00)
                * _dsum_col(promo)
                / _dsum_col(rev)
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q16_supplier_cnt",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT IN ('ECONOMY', 'STANDARD')
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND NOT EXISTS (
    SELECT 1 FROM supplier s
    WHERE s.s_acctbal < 0 AND s.s_suppkey = l.l_suppkey
  )
GROUP BY p.p_brand, p.p_type, p.p_size
""",
    tags=("tpch", "subquery", "distinct", "groupby"),
    doc="TPC-H Q16 shape: parts/supplier relationship — NOT EXISTS "
    "anti-join against a filtered dim (NOT IN diverges from the "
    "engine's left_anti on NULL keys), multi-predicate part filter, "
    "COUNT(DISTINCT) per group. partsupp is absent from the reduced "
    "schema; lineitem provides the part↔supplier relation.",
)
def tpch_q16_supplier_cnt(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").isin("ECONOMY", "STANDARD"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
SELECT {_DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
    tags=("tpch", "join", "disjunctive"),
    doc="TPC-H Q19 shape: discounted revenue under three OR-branches "
    "mixing build-side (part) and probe-side (lineitem) predicates — "
    "exercises disjunction splitting: Catalyst derives the common "
    "p_brand/p_size and l_quantity bounds to push below the join.",
)
def tpch_q19_disjunctive_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(branch)
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            )
        )
    )


@register(
    "tpch_q22_global_sales",
    oracle="""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.00
)
SELECT cntrycode, count(*) AS numcust,
       CAST(SUM(CAST(FLOOR(c_acctbal * 10000) AS DECIMAL(38,0))) AS DOUBLE) / 10000 AS totacctbal
FROM (
  SELECT substring(c.c_name, 17, 2) AS cntrycode, c.c_acctbal
  FROM customer c, avg_bal
  WHERE c.c_acctbal > avg_bal.a
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01'
    )
) custsale
GROUP BY cntrycode
""",
    tags=("tpch", "subquery", "anti", "groupby"),
    doc="TPC-H Q22 shape: global sales opportunity — scalar-subquery "
    "threshold (broadcast), NOT EXISTS anti-join against orders, "
    "grouped by a derived code. c_phone is absent from the reduced "
    "schema; the code is the last two digits of c_name. totacctbal uses the "
    "per-element floor-quantized sum for fold-order-independent "
    "hashing.",
)
def tpch_q22_global_sales(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("a"))
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            o.filter(
                F.col("o_orderdate")
                >= F.lit("2000-01-01").cast("timestamp")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
    )
    return (
        rich.select(
            F.substring(F.col("c_name"), 17, 2).alias("cntrycode"),
            "c_acctbal",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            _dsum(F.col("c_acctbal"), "totacctbal"),
        )
    )
