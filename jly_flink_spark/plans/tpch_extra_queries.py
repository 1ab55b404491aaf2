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
from .relational_queries import _DSUM, _dsum, _dsum_col


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
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
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


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), asia AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
), flt AS (
  SELECT p.p_partkey, p.p_name, a.s_suppkey, a.s_name, a.s_acctbal,
         a.n_name, sp.cost
  FROM supply sp
  JOIN asia a ON sp.l_suppkey = a.s_suppkey
  JOIN part p ON p.p_partkey = sp.l_partkey
  WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
), mn AS (
  SELECT p_partkey AS mn_partkey, min(cost) AS min_cost
  FROM flt GROUP BY p_partkey
)
SELECT f.s_acctbal, f.s_name, f.n_name, f.p_partkey, f.p_name, f.cost
FROM flt f JOIN mn ON f.p_partkey = mn.mn_partkey AND f.cost = mn.min_cost
ORDER BY f.s_acctbal DESC, f.n_name, f.s_name, f.p_partkey
LIMIT 100
""",
    tags=("tpch", "subquery", "join", "topk"),
    doc="TPC-H Q2 shape: minimum-cost supplier — per-part min over a "
    "region-restricted supply relation, re-joined on the min to "
    "recover the winning supplier rows. partsupp is absent from the "
    "reduced schema; the supply relation is derived from lineitem as "
    "min(l_extendedprice / l_quantity) per (part, supplier). min is "
    "order-independent and the per-row division is pure IEEE, so the "
    "equality re-join is engine-exact. The per-part min table is "
    "broadcast back (filtered-part-sized, not corpus-sized).",
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                n.join(
                    F.broadcast(r),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 10) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_name")
    )
    flt = supply.join(
        asia, F.col("l_suppkey") == F.col("s_suppkey")
    ).join(p, F.col("p_partkey") == F.col("l_partkey"))
    mn = flt.groupBy(F.col("p_partkey").alias("mn_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        flt.join(
            F.broadcast(mn),
            (F.col("p_partkey") == F.col("mn_partkey"))
            & (F.col("cost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost"
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name"),
            F.col("s_name"),
            F.col("p_partkey"),
        )
        .limit(100)
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
SELECT o_year,
       ({_DSUM("CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END")})
       / ({_DSUM('volume')}) AS mkt_share
FROM (
  SELECT year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
""",
    tags=("tpch", "join", "groupby", "conditional"),
    doc="TPC-H Q8 shape: national market share — one nation's share "
    "of regional revenue per year, a conditional numerator over an "
    "unconditional denominator across an 8-way join. Nation/region "
    "dims broadcast; fact-fact joins shuffle on their keys.",
)
def tpch_q8_market_share(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("nation"),
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
    )
    num = F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return df.groupBy("o_year").agg(
        (_dsum_col(num) / _dsum_col(F.col("volume"))).alias("mkt_share")
    )


@register(
    "tpch_q9_product_profit",
    oracle=f"""
SELECT nation, o_year, {_DSUM('amount')} AS sum_profit
FROM (
  SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount)
           - p.p_retailprice * l.l_quantity * 0.01 AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
""",
    tags=("tpch", "join", "groupby"),
    doc="TPC-H Q9 shape: product-type profit — profit per supplier "
    "nation per order year over parts whose name contains a color "
    "token. ps_supplycost is absent from the reduced schema; the "
    "cost term is p_retailprice * l_quantity * 0.01, evaluated with "
    "the identical left-to-right IEEE expression tree on both "
    "engines. Nation dim broadcast.",
)
def tpch_q9_product_profit(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    ).select("p_partkey", "p_retailprice")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.01)
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(
                n.select(
                    "n_nationkey", F.col("n_name").alias("nation")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "nation",
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(_dsum(F.col("amount"), "sum_profit"))
    )


@register(
    "tpch_q11_important_parts",
    oracle=f"""
WITH natsup AS (
  SELECT s.s_suppkey
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name IN ('NATION_3', 'NATION_8', 'NATION_13')
)
SELECT l.l_partkey AS p_partkey, {_DSUM('l.l_extendedprice')} AS part_value
FROM lineitem l JOIN natsup ns ON l.l_suppkey = ns.s_suppkey
GROUP BY l.l_partkey
HAVING {_DSUM('l.l_extendedprice')} > 0.001 * (
  SELECT {_DSUM('l2.l_extendedprice')}
  FROM lineitem l2 JOIN natsup ns2 ON l2.l_suppkey = ns2.s_suppkey
)
""",
    tags=("tpch", "subquery", "groupby", "having"),
    doc="TPC-H Q11 shape: important parts — per-part value within a "
    "nation-set's supply, kept when above a fraction of the global "
    "value (scalar subquery recomputed as a quantized sum, NOT a "
    "double-fold over group results, so the threshold is "
    "engine-exact). partsupp is absent; value is sum(l_extendedprice) "
    "over the nation-restricted lineitems. The scalar total rides a "
    "broadcast cross join.",
)
def tpch_q11_important_parts(spark, sf_dir):
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8", "NATION_13")
    )
    ns = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(ns), F.col("l_suppkey") == F.col("s_suppkey")
    )
    val = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        _dsum(F.col("l_extendedprice"), "part_value")
    )
    total = li.agg(_dsum_col(F.col("l_extendedprice")).alias("total_value"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("total_value"))
        .select("p_partkey", "part_value")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
    tags=("tpch", "join", "groupby", "outer"),
    doc="TPC-H Q13 shape: customer order distribution — left outer "
    "join with the filter in the JOIN condition (customers with no "
    "qualifying orders count as 0), then a histogram of the counts: "
    "two cascaded aggregations, the second over a tiny key space.",
)
def tpch_q13_customer_distribution(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey,
         {_DSUM('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    tags=("tpch", "subquery", "groupby"),
    doc="TPC-H Q15 shape: top supplier — quarterly revenue view, "
    "supplier(s) achieving the max. Quantized revenue makes the "
    "max-equality re-join engine-exact (a raw double sum could "
    "differ in the last ulp between engines and drop the winner).",
)
def tpch_q15_top_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        _dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "total_revenue",
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        _t(spark, sf_dir, "supplier")
        .join(rev, F.col("s_suppkey") == F.col("l_suppkey"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_qty_revenue",
    oracle=f"""
SELECT {_DSUM('l.l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND p.p_size < 10
  AND l.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
  )
""",
    tags=("tpch", "subquery", "agg"),
    doc="TPC-H Q17 shape: small-quantity-order revenue — correlated "
    "per-part average threshold. Spark computes the per-part avg as "
    "a groupBy over the SAME filtered fact (identical values: the "
    "correlation key restricts to the same parts) and broadcast-joins "
    "it back. l_quantity is integral, so avg = exact-int-sum / count "
    "is bit-identical across engines. p_container is absent; the "
    "part filter is p_brand + p_size.",
)
def tpch_q17_small_qty_revenue(spark, sf_dir):
    pf = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    base = li.join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
    avgq = base.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        base.join(
            F.broadcast(avgq), F.col("l_partkey") == F.col("avg_partkey")
        )
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (_dsum_col(F.col("l_extendedprice")) / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "tpch_q20_excess_shipments",
    oracle="""
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_2', 'NATION_8', 'NATION_21')
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'red%'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING sum(l.l_quantity) > 30
  )
""",
    tags=("tpch", "subquery", "semi", "having"),
    doc="TPC-H Q20 shape: excess shipments — nested IN with a "
    "grouped HAVING threshold, planned as a left-semi join against "
    "the (supplier, part) aggregate. partsupp/ps_availqty are "
    "absent; the threshold is a fixed shipped-quantity bound over "
    "the prefix-named parts. sum(l_quantity) is an exact "
    "integral-double sum — engine-exact without quantization.",
)
def tpch_q20_excess_shipments(spark, sf_dir):
    pf = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cand = (
        li.join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
    )
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_8", "NATION_21")
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(cand, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND n.n_name IN ('NATION_1', 'NATION_3', 'NATION_12')
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    tags=("tpch", "subquery", "semi", "anti", "topk"),
    doc="TPC-H Q21 shape: suppliers who kept orders waiting — the "
    "sole late supplier on multi-supplier finished orders: a "
    "left-semi (EXISTS: some other supplier on the order) chained "
    "with a left-anti (NOT EXISTS: no OTHER late supplier), both "
    "self-joins on the fact keyed by order. l_receiptdate/"
    "l_commitdate are absent; 'late' is shipped >30 days after the "
    "order date. s_name is unique, so the top-100 order is total.",
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_3", "NATION_12")
    )
    base = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            _t(spark, sf_dir, "orders").filter(
                F.col("o_orderstatus") == "F"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .filter(F.col("l_shipdate") > late_cut)
    )
    l2 = li.select(
        F.col("l_orderkey").alias("lo2"), F.col("l_suppkey").alias("ls2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("lo3"),
        F.col("l_suppkey").alias("ls3"),
        F.col("l_shipdate").alias("ld3"),
    )
    return (
        base.join(
            l2,
            (F.col("lo2") == F.col("l_orderkey"))
            & (F.col("ls2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("lo3") == F.col("l_orderkey"))
            & (F.col("ls3") != F.col("l_suppkey"))
            & (F.col("ld3") > late_cut),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )
