"""Advanced operator surface: temporal joins (as-of, banded range),
pandas-UDF execution paths, statistical aggregates, pivot, range
frames, and the remaining north-star text/embedding operators.

The reference implements none of these (SURVEY.md §2.2); they round
out the general analytics surface. Determinism for value-hash parity
follows the house patterns: quantized integer sums for doubles
(relational_queries._dsum), md5-derived hashing, and mirrored
double-expression trees on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_table, stage
from ..operators import joins, similarity
from ..functions import dsum
from .registry import register, register_sql

_Q = 10_000  # double-sum quantization (matches relational_queries)
_QV = similarity.QUANT  # vector dot quantization (1e8)


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# As-of join (events: each purchase ← latest prior view by same user)
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
),
best AS (
  SELECT l.purchase_id AS k, r.ts AS asof_ts, r.event_id AS asof_event_id,
         r.value AS asof_value,
         row_number() OVER (PARTITION BY l.purchase_id
                            ORDER BY r.ts DESC, r.event_id DESC) AS rn
  FROM purchases l
  JOIN events r ON r.event_type = 'view'
              AND r.user_id = l.user_id AND r.ts <= l.purchase_ts
)
SELECT p.purchase_id, p.user_id, p.purchase_ts,
       b.asof_ts, b.asof_event_id, b.asof_value
FROM purchases p
LEFT JOIN best b ON b.k = p.purchase_id AND b.rn = 1
"""


@register(
    "join_asof_events",
    oracle=_ASOF_ORACLE,
    tags=("join", "asof", "temporal"),
    doc="LEFT AS-OF join: each purchase gets the latest view event at "
    "or before it by the same user. Union-and-sweep implementation — "
    "one shuffle on the key, no pair blowup on hot keys "
    "(operators/joins.py).",
)
def join_asof_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    return joins.asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="ts",
        right_values=["event_id", "value"],
        tie_breaker="event_id",
    )


_ASOF_TOL_S = 120_000  # max staleness (~33h): splits the corpus roughly in half

_ASOF_TOL_ORACLE = f"""
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
),
best AS (
  SELECT l.purchase_id AS k, r.ts AS asof_ts, r.event_id AS asof_event_id,
         r.value AS asof_value,
         row_number() OVER (PARTITION BY l.purchase_id
                            ORDER BY r.ts DESC, r.event_id DESC) AS rn
  FROM purchases l
  JOIN events r ON r.event_type = 'view'
              AND r.user_id = l.user_id AND r.ts <= l.purchase_ts
              AND CAST(floor(epoch(l.purchase_ts)) AS BIGINT)
                  - CAST(floor(epoch(r.ts)) AS BIGINT) <= {_ASOF_TOL_S}
)
SELECT p.purchase_id, p.user_id, p.purchase_ts,
       b.asof_ts, b.asof_event_id, b.asof_value
FROM purchases p
LEFT JOIN best b ON b.k = p.purchase_id AND b.rn = 1
"""


@register(
    "join_asof_tolerance",
    oracle=_ASOF_TOL_ORACLE,
    tags=("join", "asof", "temporal", "feature-store"),
    doc="LEFT AS-OF join with bounded staleness (the feature-store "
    "point-in-time rule): each purchase gets the latest prior view "
    f"by the same user ONLY if it is at most {_ASOF_TOL_S}s old — "
    "older features must not leak into the row. Same union-and-sweep "
    "single-shuffle plan as join_asof_events; in-tolerance rows are "
    "a suffix of prior rows in ts order, so the stale match is "
    "nulled post-sweep with no second pass (operators/joins.py).",
)
def join_asof_tolerance(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    return joins.asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="ts",
        right_values=["event_id", "value"],
        tie_breaker="event_id",
        tolerance_seconds=_ASOF_TOL_S,
    )


# ---------------------------------------------------------------------------
# Banded range join (purchase ↔ clicks within ±1 hour, same user)
# ---------------------------------------------------------------------------

_BAND_S = 3600

_BAND_ORACLE = f"""
SELECT l.event_id AS purchase_id, l.user_id, l.ts,
       CAST(count(r.event_id) AS BIGINT) AS n_in_band
FROM events l
LEFT JOIN events r
  ON r.event_type = 'click' AND r.user_id = l.user_id
 AND abs(CAST(floor(epoch(r.ts)) AS BIGINT)
         - CAST(floor(epoch(l.ts)) AS BIGINT)) <= {_BAND_S}
WHERE l.event_type = 'purchase'
GROUP BY 1, 2, 3
"""


@register(
    "join_range_banded",
    oracle=_BAND_ORACLE,
    tags=("join", "range", "temporal"),
    doc="Banded range join via interval binning: |Δts| <= 1h pairs "
    "meet in an equi-join on (user, time-bin) with 3× replication of "
    "the left side — the O(n²)-avoiding form of a range join "
    "(operators/joins.py).",
)
def join_range_banded(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("r_user"), "ts", "event_id"
    )
    out = joins.band_join_count(
        purchases,
        clicks,
        on_left="user_id",
        on_right="r_user",
        left_ts="ts",
        right_ts="ts",
        band=F.lit(_BAND_S),
        band_seconds=_BAND_S,
        agg_alias="n_in_band",
    )
    return out.select(
        "purchase_id", "user_id", "ts", F.col("n_in_band").cast("bigint").alias("n_in_band")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (north star: dedup family)
# ---------------------------------------------------------------------------

_NEARDUP_T = 0.3

_NEARDUP_ORACLE = f"""
WITH norms AS (
  SELECT vec_id,
         sum(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * {_QV}) AS BIGINT)) AS qn
  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
  GROUP BY vec_id
),
prods AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         unnest(a.embedding) AS xa, unnest(b.embedding) AS xb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
),
dots AS (
  SELECT vec_a, vec_b,
         sum(CAST(floor(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE) * {_QV}) AS BIGINT)) AS qd
  FROM prods GROUP BY vec_a, vec_b
),
scored AS (
  SELECT d.vec_a, d.vec_b,
         CAST(d.qd AS DOUBLE)
           / (sqrt(CAST(na.qn AS DOUBLE)) * sqrt(CAST(nb.qn AS DOUBLE))) AS cosine
  FROM dots d
  JOIN norms na ON na.vec_id = d.vec_a
  JOIN norms nb ON nb.vec_id = d.vec_b
)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= {_NEARDUP_T}
"""


@register(
    "dedup_embedding_cosine",
    oracle=_NEARDUP_ORACLE,
    tags=("northstar", "dedup", "embedding"),
    doc="Embedding-cosine near-dup pairs: exact blocked all-pairs "
    "self-join (parallelism-sized crc32 blocks, one numpy kernel "
    "task per block-pair; quantized-exact). The LSH bucketing of "
    "ann_cosine_lsh is the same operator's 100-TB prefilter.",
)
def dedup_embedding_cosine(spark, sf_dir):
    return similarity.embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=_NEARDUP_T
    )


# ---------------------------------------------------------------------------
# Pandas-UDF execution paths (Arrow-batched — the sanctioned slow path)
# ---------------------------------------------------------------------------


@register(
    "udf_grouped_quantized_sum",
    oracle=f"""
SELECT event_type,
       CAST(sum(CAST(floor(value * {_Q}) AS BIGINT)) AS BIGINT) AS q_sum,
       count(*) AS n
FROM events GROUP BY event_type
""",
    tags=("udf", "pandas", "groupby"),
    doc="applyInPandas grouped aggregation (Arrow-batched): per-group "
    "quantized integer sum — numerically identical to the SQL oracle "
    "because quantization happens before summation.",
)
def udf_grouped_quantized_sum(spark, sf_dir):
    import numpy as np
    import pandas as pd

    def agg(pdf: "pd.DataFrame") -> "pd.DataFrame":
        q = np.floor(pdf["value"].to_numpy() * _Q).astype("int64")
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "q_sum": [int(q.sum())],
                "n": [len(pdf)],
            }
        )

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        agg, schema="event_type string, q_sum long, n long"
    )


@register(
    "udf_mapinpandas_tokens",
    oracle="""
SELECT doc_id,
       len(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS n_tokens,
       length(text) AS n_chars
FROM documents
""",
    tags=("udf", "pandas", "text"),
    doc="mapInPandas scalar path (Arrow-batched): per-doc token/char "
    "counts computed with vectorized pandas .str ops (no per-row "
    "Python loop), matching the SQL tokenizer exactly: tokens are "
    "the non-empty runs between single-space splits, i.e. "
    "count(' '-separated non-space runs).",
)
def udf_mapinpandas_tokens(spark, sf_dir):
    import pandas as pd

    def stats(batches):
        for pdf in batches:
            texts = pdf["text"]
            # len(list_filter(split(s,' '), t->t<>'')) ≡ number of
            # maximal runs of non-space chars — countable without
            # materializing per-row token lists.
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": texts.str.count(r"[^ ]+").astype("int64"),
                    "n_chars": texts.str.len().astype("int64"),
                }
            )

    from ..io import ensure_min_parallelism

    docs = ensure_min_parallelism(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return docs.mapInPandas(
        stats, schema="doc_id long, n_tokens long, n_chars long"
    )


# ---------------------------------------------------------------------------
# Statistical aggregates
# ---------------------------------------------------------------------------


@register(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS qty_q25,
       quantile_cont(l_quantity, 0.50) AS qty_q50,
       quantile_cont(l_quantity, 0.75) AS qty_q75,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
    tags=("groupby", "stats"),
    doc="Exact interpolated percentiles (sort-based aggregate). "
    "l_quantity is integral, so the q*(n-1) interpolation is exact "
    "double arithmetic on both engines. Spark computes the three "
    "quartiles as ONE array-percentile pass (one sort per group) and "
    "unpacks to scalar columns — the driver's pandas canonicalizer "
    "cannot hash a raw array column.",
)
def agg_percentiles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit([0.25, 0.5, 0.75])).alias("_q"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            F.element_at("_q", 1).alias("qty_q25"),
            F.element_at("_q", 2).alias("qty_q50"),
            F.element_at("_q", 3).alias("qty_q75"),
            "n",
        )
    )


# Quantize each value to an integer FIRST (qx = floor(x*1e4)), then
# sum qx, qy, qx², qy², qx·qy — one consistent scale, so the variance
# terms (n·Σqx² − (Σqx)²) are the exact integer-statistics of the
# quantized variables and can never go negative.
_CORR_SQL_SUMS = """
  CAST(count(*) AS DOUBLE) AS n,
  CAST(sum(CAST(qx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
  CAST(sum(CAST(qy AS DECIMAL(38,0))) AS DOUBLE) AS sy,
  CAST(sum(CAST(qx * qy AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
  CAST(sum(CAST(qx * qx AS DECIMAL(38,0))) AS DOUBLE) AS sx2,
  CAST(sum(CAST(qy * qy AS DECIMAL(38,0))) AS DOUBLE) AS sy2
"""


@register(
    "agg_corr_covar",
    oracle=f"""
SELECT l_returnflag,
       (n * sxy - sx * sy)
         / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)) AS corr_qty_price,
       (n * sxy - sx * sy) / (n * n) AS covar_pop_q
FROM (
  SELECT l_returnflag, {_CORR_SQL_SUMS}
  FROM (
    SELECT l_returnflag,
           CAST(floor(l_quantity * {_Q}) AS BIGINT) AS qx,
           CAST(floor(l_extendedprice * {_Q}) AS BIGINT) AS qy
    FROM lineitem
  ) GROUP BY l_returnflag
)
""",
    tags=("groupby", "stats"),
    doc="Correlation/covariance from exact quantized integer sums with "
    "a mirrored double-expression tree — order-independent and "
    "bit-identical across engines (built-in corr() is fold-order-"
    "dependent on doubles and can't hash-match).",
)
def agg_corr_covar(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_quantity") * _Q).alias("qx"),
        F.floor(F.col("l_extendedprice") * _Q).alias("qy"),
    )

    def qsum(expr):
        return F.sum(expr.cast("decimal(38,0)")).cast("double")

    qx, qy = F.col("qx"), F.col("qy")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        qsum(qx).alias("sx"),
        qsum(qy).alias("sy"),
        qsum(qx * qy).alias("sxy"),
        qsum(qx * qx).alias("sx2"),
        qsum(qy * qy).alias("sy2"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sx2, sy2 = F.col("sxy"), F.col("sx2"), F.col("sy2")
    return sums.select(
        "l_returnflag",
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy))
        ).alias("corr_qty_price"),
        ((n * sxy - sx * sy) / (n * n)).alias("covar_pop_q"),
    )


@register(
    "agg_listagg",
    oracle="""
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       count(*) AS n
FROM orders GROUP BY o_orderpriority
""",
    tags=("groupby", "string"),
    doc="Sorted string aggregation (LISTAGG): collect_set → array_sort "
    "→ array_join; deterministic by sorting.",
)
def agg_listagg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderstatus")), ","
        ).alias("statuses"),
        F.count("*").alias("n"),
    )


@register(
    "pivot_status_counts",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders GROUP BY o_orderpriority
""",
    tags=("groupby", "pivot"),
    doc="PIVOT with explicit value list (required at scale: implicit "
    "pivot runs a distinct scan to discover columns).",
)
def pivot_status_counts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("F", "O", "P")],
    )


# ---------------------------------------------------------------------------
# RANGE window frame (time-based sliding aggregate without a join)
# ---------------------------------------------------------------------------

_RANGE_S = 30 * 86400


@register(
    "window_range_30d",
    oracle=f"""
SELECT o_orderkey,
       count(*) OVER w AS n_30d,
       CAST(sum(CAST(floor(o_totalprice * {_Q}) AS DECIMAL(38,0))) OVER w AS DOUBLE) / {_Q} AS sum_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
             RANGE BETWEEN {_RANGE_S} PRECEDING AND CURRENT ROW)
""",
    tags=("window", "range-frame", "temporal"),
    doc="RANGE frame over event-time: per-customer trailing-30-day "
    "order count/total. The frame is value-based, so ties on the sort "
    "key are handled identically on both engines.",
)
def window_range_30d(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    epoch_s = F.unix_timestamp("o_orderdate")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch_s)
        .rangeBetween(-_RANGE_S, 0)
    )
    qsum = (
        F.sum(F.floor(F.col("o_totalprice") * _Q).cast("decimal(38,0)"))
        .over(w)
        .cast("double")
        / _Q
    )
    return o.select(
        "o_orderkey",
        F.count("*").over(w).alias("n_30d"),
        qsum.alias("sum_30d"),
    )


# ---------------------------------------------------------------------------
# Generators / reshaping: explode term stats, unpivot, date spine
# ---------------------------------------------------------------------------


@register(
    "text_term_topk",
    oracle="""
SELECT tok, n_docs, n_total
FROM (
  SELECT tok,
         count(DISTINCT doc_id) AS n_docs,
         count(*) AS n_total,
         row_number() OVER (ORDER BY count(*) DESC, tok) AS rnk
  FROM (
    SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                      t -> t <> '')) AS tok
    FROM documents
  )
  GROUP BY tok
)
WHERE rnk <= 25
""",
    tags=("northstar", "text", "explode"),
    doc="Corpus term statistics: explode tokens (UDTF-style generator) "
    "→ one groupBy on the token → global top-k. The explode multiplies "
    "rows ~50×, so the count happens BEFORE any wide operation; only "
    "aggregated (tok, counts) rows reach the top-k sort.",
)
def text_term_topk(spark, sf_dir):
    from ..io import ensure_min_parallelism
    from ..operators.text import tokens

    docs = ensure_min_parallelism(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    stats = toks.groupBy("tok").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_total"),
    )
    # sort+limit compiles to TakeOrderedAndProject (per-partition
    # top-25, driver merge) — no global window, no single-task sort
    return (
        stats.orderBy(F.col("n_total").desc(), F.col("tok"))
        .limit(25)
        .select("tok", "n_docs", "n_total")
    )


@register(
    "unpivot_lineitem_measures",
    oracle=f"""
SELECT l_returnflag, measure, {{dsum}} AS q_value
FROM (
  SELECT l_returnflag, 'quantity' AS measure, l_quantity AS v FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'tax', l_tax FROM lineitem
)
GROUP BY l_returnflag, measure
""".format(
        dsum="CAST(SUM(CAST(FLOOR(v * 10000) AS DECIMAL(38,0))) AS DOUBLE) / 10000"
    ),
    tags=("reshape", "unpivot"),
    doc="UNPIVOT/melt: wide measures to long form via the native "
    "unpivot operator (one scan — not the UNION ALL of N scans the "
    "naive SQL implies), then the standard quantized aggregation.",
)
def unpivot_lineitem_measures(spark, sf_dir):
    from .relational_queries import _dsum

    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="v",
    ).withColumn(
        "measure",
        F.element_at(F.split(F.col("measure"), "_"), -1).alias("measure"),
    )
    return long.groupBy("l_returnflag", "measure").agg(_dsum("v", "q_value"))


@register(
    "gen_date_spine",
    oracle="""
SELECT strftime(d, '%Y-%m-%d') AS day, count(o_orderkey) AS n_orders
FROM (
  SELECT unnest(generate_series(DATE '1998-07-01', DATE '1998-08-01',
                                INTERVAL 1 DAY))::DATE AS d
)
LEFT JOIN orders ON CAST(o_orderdate AS DATE) = d
GROUP BY d
""",
    tags=("generator", "temporal"),
    doc="Generator function: a date spine via sequence()+explode, "
    "left-joined to facts so empty days surface as zero — the "
    "gap-filling pattern for time series. The day column is emitted "
    "as a yyyy-MM-dd string on BOTH engines: DuckDB's fetchdf "
    "widens DATE to a midnight timestamp, so raw DATE outputs are "
    "not comparable across the driver's pandas bridge.",
)
def gen_date_spine(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1998-07-01").cast("date"),
                F.lit("1998-08-01").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    return (
        spine.join(
            o.select(
                F.col("o_orderdate").cast("date").alias("day"), "o_orderkey"
            ),
            "day",
            "left",
        )
        .groupBy("day")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "n_orders"
        )
    )


# ---------------------------------------------------------------------------
# Text: BPE-ish regex token counting + rolling-hash fingerprint
# ---------------------------------------------------------------------------

_BPE_PAT = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@register(
    "text_token_bpe",
    oracle=f"""
SELECT doc_id,
       len(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '{_BPE_PAT}')) AS n_bpe_tokens
FROM documents
""",
    tags=("northstar", "text", "tokenize"),
    doc="Token counting two ways: whitespace tokens and a BPE-ish "
    "regex segmentation (letter runs / digit runs / single symbols) — "
    "all JVM-side regexp, no Python.",
)
def text_token_bpe(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    ws = F.size(
        F.filter(F.split(lower, " "), lambda t: t != "")
    ).cast("long")
    bpe = F.size(
        F.regexp_extract_all(lower, F.lit(_BPE_PAT), F.lit(0))
    ).cast("long")
    return docs.select(
        "doc_id", ws.alias("n_ws_tokens"), bpe.alias("n_bpe_tokens")
    )


_Q18_T = 320

_DSUM_QTY = (
    "CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS DECIMAL(38,0))) AS DOUBLE)"
    " / 10000"
)


@register(
    "join_q18_large_orders",
    oracle=f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       big.sum_qty
FROM (
  SELECT l_orderkey, {_DSUM_QTY} AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {_DSUM_QTY} > {_Q18_T}
) big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
    tags=("join", "tpch", "headline"),
    doc="TPC-H Q18 shape: heavy groupBy on the fact key (600k rows → "
    "150k groups), HAVING prune to a handful, then two joins where "
    "the *pruned aggregate* is the build side — the plan must "
    "aggregate first and join small, never join first.",
)
def join_q18_large_orders(spark, sf_dir):
    from .relational_queries import _dsum

    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > _Q18_T)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


@register(
    "agg_distinct_two_phase",
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
""",
    tags=("groupby", "distinct", "skew"),
    doc="Exact distinct-count via the two-phase rewrite: dedup on "
    "(type, user) first — a uniform high-cardinality shuffle — then "
    "count per type. At 100 TB this is the skew-safe form of "
    "count_distinct on a 5-value hot group key: the heavy shuffle "
    "runs on the compound key, and only tiny partials hit the hot "
    "key. (Total events per type come from a separate cheap agg, "
    "joined at 5 rows.)",
)
def agg_distinct_two_phase(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    users = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n_users"))
    )
    totals = ev.groupBy("event_type").agg(F.count("*").alias("n_events"))
    return users.join(totals, "event_type").select(
        "event_type", "n_users", "n_events"
    )


# ---------------------------------------------------------------------------
# Subqueries (dialect-shared SQL: the same text plans on Catalyst and
# runs as its own oracle on DuckDB). Catalyst rewrites EXISTS/IN to
# semi joins and scalar subqueries to a broadcast aggregate — no
# per-row re-execution.
# ---------------------------------------------------------------------------

register_sql(
    "subq_exists_correlated",
    """
SELECT o_orderkey, o_orderpriority
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49
)
""",
    tags=("subquery", "semi-join"),
    doc="Correlated EXISTS → left-semi hash join (Catalyst's rewrite; "
    "never a per-row subquery execution).",
)

register_sql(
    "subq_not_exists_anti",
    """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
    tags=("subquery", "anti-join"),
    doc="Correlated NOT EXISTS → left-anti join: customers with no "
    "urgent order.",
)

register_sql(
    "subq_scalar_above_avg",
    """
SELECT p_partkey, p_retailprice
FROM part
WHERE p_retailprice > (
  SELECT CAST(SUM(CAST(FLOOR(p_retailprice * 10000) AS DECIMAL(38,0))) AS DOUBLE)
           / 10000 / count(*)
  FROM part
)
""",
    tags=("subquery", "scalar"),
    doc="Uncorrelated scalar subquery: computed once and pushed into "
    "the scan filter. The threshold is a quantized-exact average so "
    "the cut-off is bit-identical on both engines (a raw avg() of "
    "doubles is fold-order-dependent).",
)

register_sql(
    "subq_in_list",
    """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (
  SELECT n_nationkey FROM nation WHERE n_regionkey = 1
)
""",
    tags=("subquery", "semi-join"),
    doc="IN (subquery) → semi join against the small dim (broadcast).",
)


@register(
    "text_rolling_hash",
    oracle="""
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(generate_series(1, length(text)),
                     i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
    (acc, c) -> (acc * 31 + c) % 1000000007
  ) AS rolling_hash
FROM documents
""",
    tags=("northstar", "text", "fingerprint"),
    doc="Polynomial rolling-hash fingerprint (h = h*31 + code mod p) "
    "over the document's characters via the aggregate() higher-order "
    "function — pure JVM fold; mirrored in DuckDB with list_reduce "
    "over the same char codes, so the fold is value-hash-checked.",
)
def text_rolling_hash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    h = F.aggregate(
        F.split(F.col("text"), ""),
        F.lit(0).cast("bigint"),
        lambda acc, c: (
            acc * F.lit(31) + F.coalesce(F.ascii(c), F.lit(0))
        )
        % F.lit(1_000_000_007),
    )
    return docs.select("doc_id", h.alias("rolling_hash"))


register_sql(
    "window_distribution_funcs",
    """
SELECT o_orderkey,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
""",
    tags=("window", "distribution"),
    doc="Distribution window functions (ntile/percent_rank/cume_dist) "
    "— rank arithmetic over an unambiguous ORDER BY, so the derived "
    "doubles are identical on both engines.",
)

register_sql(
    "scalar_fuzzy_levenshtein",
    """
SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
       levenshtein(a.p_brand, b.p_brand) AS dist
FROM (SELECT DISTINCT p_brand FROM part) a
JOIN (SELECT DISTINCT p_brand FROM part) b
  ON a.p_brand < b.p_brand
WHERE levenshtein(a.p_brand, b.p_brand) <= 2
""",
    tags=("scalar", "fuzzy", "dedup"),
    doc="Edit-distance fuzzy matching over the distinct-value domain "
    "(distinct first — never levenshtein the raw fact table; the "
    "domain is tiny, the fact table is not).",
)


@register(
    "scalar_map_funcs",
    oracle="""
SELECT event_id,
       array_to_string(list_sort(json_keys(props)), '|') AS prop_keys,
       len(json_keys(props)) AS n_entries,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       element_at(map(['type'], [event_type]), 'type')[1] AS type_copy
FROM events
""",
    tags=("scalar", "map"),
    doc="Map-type functions: JSON → map<string,string> (from_json), "
    "map_keys, size, element_at lookups, map construction from "
    "arrays. (DuckDB's element_at returns a list — unwrapped in the "
    "oracle; Spark's returns the scalar.)",
)
def scalar_map_funcs(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,string>")
    built = F.map_from_arrays(
        F.array(F.lit("type")), F.array(F.col("event_type"))
    )
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), "|").alias("prop_keys"),
        F.size(m).alias("n_entries"),
        F.element_at(m, "k").cast("bigint").alias("k_val"),
        F.element_at(built, "type").alias("type_copy"),
    )


@register(
    "set_except_all",
    oracle="""
SELECT l_suppkey AS suppkey FROM lineitem WHERE l_returnflag = 'R'
EXCEPT ALL
SELECT l_suppkey AS suppkey FROM lineitem WHERE l_returnflag = 'A'
""",
    tags=("setop", "bag"),
    doc="EXCEPT ALL (bag semantics — multiplicity-aware subtraction, "
    "kept per-key as count differences, not row-by-row matching). "
    "Catalyst plans it as a counted aggregation + generate, never a "
    "sort of the full bags.",
)
def set_except_all(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("suppkey")
    )
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_suppkey").alias("suppkey")
    )
    return r.exceptAll(a)


@register(
    "set_intersect_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
""",
    tags=("setop", "bag"),
    doc="INTERSECT ALL (bag semantics): per-key min multiplicity of "
    "the two sides.",
)
def set_intersect_all(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    op = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.intersectAll(op)


@register(
    "window_ntile_deciles",
    oracle="""
SELECT decile,
       count(*) AS n_orders,
       min(o_totalprice) AS lo,
       max(o_totalprice) AS hi
FROM (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
GROUP BY decile
""",
    tags=("window", "ntile"),
    doc="NTILE(10) decile bucketing of order values (tie-broken by "
    "key for determinism) with per-bucket bounds — the window "
    "companion of approx_percentile for building equi-depth "
    "histograms. Deciles come from the sharded global-rank operator "
    "(operators/ranking.py), not a single-task global window.",
)
def window_ntile_deciles(spark, sf_dir):
    from ..operators.ranking import global_rank_analytics

    o = _t(spark, sf_dir, "orders")
    ranked = global_rank_analytics(
        o, "o_totalprice", tiebreak=("o_orderkey",), ntile=10
    )
    return (
        ranked.select(
            "o_totalprice", F.col("g_ntile").alias("decile")
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "lateral_explode_props",
    oracle="""
SELECT prop_key, val_bucket, count(*) AS n_events,
       count(DISTINCT event_type) AS n_event_types
FROM (
  SELECT event_type, k AS prop_key,
         CAST(floor(CAST(json_extract_string(props, '$.' || k) AS DOUBLE) / 10) AS BIGINT) AS val_bucket
  FROM (
    SELECT event_type, props, unnest(json_keys(props)) AS k FROM events
  )
)
GROUP BY prop_key, val_bucket
""",
    tags=("lateral", "explode", "json"),
    doc="Lateral view / explode: JSON props parsed to a map and "
    "exploded to one row per entry (Generate in the plan), then "
    "aggregated by key and value bucket — the schema-on-read path for ragged event "
    "attributes.",
)
def lateral_explode_props(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,string>")
    return (
        ev.select(
            "event_type",
            F.explode(m).alias("prop_key", "prop_val"),
        )
        .select(
            "event_type",
            "prop_key",
            F.floor(F.col("prop_val").cast("double") / 10)
            .cast("bigint")
            .alias("val_bucket"),
        )
        .groupBy("prop_key", "val_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("event_type").alias("n_event_types"),
        )
    )


@register(
    "events_multigrain_rollup",
    oracle="""
SELECT day_bucket, hour_bucket,
       CASE WHEN GROUPING(hour_bucket) = 1 THEN 'day' ELSE 'hour' END AS grain,
       count(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 10000) AS DECIMAL(38,0))) AS DOUBLE) / 10000 AS sum_value
FROM (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_bucket,
         date_trunc('hour', ts) AS hour_bucket,
         value
  FROM events
)
GROUP BY GROUPING SETS ((day_bucket), (day_bucket, hour_bucket))
""",
    tags=("rollup", "time", "groupby"),
    doc="Hypertable-style multi-grain time rollup: hourly and daily "
    "aggregates of the event stream in ONE pass via GROUPING SETS "
    "over derived time buckets (grain disambiguated by GROUPING()). "
    "Spark expands the sets map-side, so the fact scan happens once "
    "— the continuous-aggregate refresh pattern for time-series "
    "stores, batch form.",
)
def events_multigrain_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    bucketed = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day_bucket"),
        F.date_trunc("hour", F.col("ts")).alias("hour_bucket"),
        "value",
    )
    grain = (
        F.when(F.grouping("hour_bucket") == 1, "day").otherwise("hour")
    )
    return (
        bucketed.groupingSets(
            [["day_bucket"], ["day_bucket", "hour_bucket"]],
            "day_bucket",
            "hour_bucket",
        )
        .agg(
            grain.alias("grain"),
            F.count("*").alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
    )


@register(
    "scd2_user_history",
    oracle="""
SELECT user_id, event_type AS state, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            IS NULL AS BOOLEAN) AS is_current
FROM events
WHERE user_id % 50 = 0
""",
    tags=("scd", "window", "cdc"),
    doc="SCD Type-2 historization: a changelog becomes validity "
    "intervals [valid_from, valid_to) via lead() over each key's "
    "event-time order — one hash shuffle on the key, no self-join "
    "(the naive interval build is a range self-join; lead() is "
    "linear). is_current marks the open interval.",
)
def scd2_user_history(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "events_funnel_analysis",
    oracle="""
WITH stage_times AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS stage_view,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                 AND t_purchase > t_click
                THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
FROM stage_times
""",
    tags=("funnel", "events", "conditional"),
    doc="Ordered-funnel analysis (view → click → purchase, strictly "
    "increasing first-occurrence times): ONE conditional-min "
    "aggregation pass over the fact table, then per-user stage "
    "predicates — no per-stage self-joins (the naive funnel is "
    "k-way self-join; this is linear with a single key shuffle).",
)
def events_funnel_analysis(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    t_of = lambda et: F.min(  # noqa: E731
        F.when(F.col("event_type") == et, F.col("ts"))
    )
    stages = ev.groupBy("user_id").agg(
        t_of("view").alias("t_view"),
        t_of("click").alias("t_click"),
        t_of("purchase").alias("t_purchase"),
    )
    has_view = F.col("t_view").isNotNull()
    has_click = has_view & (F.col("t_click") > F.col("t_view"))
    has_purch = has_click & (F.col("t_purchase") > F.col("t_click"))
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return stages.agg(
        F.count("*").alias("n_users"),
        one(has_view).alias("stage_view"),
        one(has_click).alias("stage_click"),
        one(has_purch).alias("stage_purchase"),
    )


@register(
    "events_cohort_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, date_trunc('week', e.ts) AS active_week
  FROM events e
)
SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
       CAST(floor(date_diff('day', f.cohort_week, a.active_week) / 7) AS BIGINT)
         AS weeks_since,
       count(DISTINCT a.user_id) AS n_active
FROM firsts f JOIN activity a USING (user_id)
GROUP BY 1, 2
""",
    tags=("cohort", "retention", "events"),
    doc="Cohort retention matrix: users bucketed by first-seen week, "
    "counted per week-offset of later activity. Two aggregations "
    "and one join, all shuffling on user_id — the cohort dim rides "
    "along; no cross-week fan-out.",
)
def events_cohort_retention(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    weeks_since = F.floor(
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    ).cast("bigint")
    return (
        firsts.join(activity, "user_id")
        .groupBy("cohort_week", weeks_since.alias("weeks_since"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "events_activity_islands",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR date_diff('second', lag(ts) OVER w, ts) > 3600
              THEN 1 ELSE 0 END AS new_island
  FROM events
  WHERE user_id % 25 = 0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, ts,
         CAST(sum(new_island) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS island_id
  FROM flagged
)
SELECT user_id, island_id,
       min(ts) AS island_start, max(ts) AS island_end,
       count(*) AS n_events
FROM islands
GROUP BY user_id, island_id
""",
    tags=("window", "islands", "sessionization"),
    doc="Islands-and-gaps: contiguous activity runs per user, split "
    "where the inter-event gap exceeds 60 minutes — lag() flags "
    "island starts, a running sum numbers them, one aggregation "
    "closes them. The window/batch mirror of the stateful streaming "
    "sessionizer (streaming/stateful.py::sessionize); both shuffle "
    "once on the key.",
)
def events_activity_islands(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    new_island = F.when(
        F.lag("ts").over(w).isNull() | (gap_s > 3600), 1
    ).otherwise(0)
    wrun = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.select("user_id", "ts", "event_id")
        .withColumn("new_island", new_island)
        .withColumn("island_id", F.sum("new_island").over(wrun))
        .groupBy("user_id", "island_id")
        .agg(
            F.min("ts").alias("island_start"),
            F.max("ts").alias("island_end"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "scalar_null_semantics",
    oracle="""
SELECT grp,
       count(*) AS n_rows,
       count(val) AS n_nonnull,
       CAST(sum(CASE WHEN val IS NOT DISTINCT FROM ref THEN 1 ELSE 0 END)
            AS BIGINT) AS n_nullsafe_eq,
       coalesce(min(val), -1) AS min_or_default,
       max(nullif(val, 0)) AS max_nonzero
FROM (
  SELECT CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS grp,
         CASE WHEN event_id % 5 = 0 THEN NULL
              ELSE CAST(event_id % 13 AS BIGINT) END AS val,
         CASE WHEN event_id % 5 = 0 THEN NULL
              ELSE CAST(event_id % 11 AS BIGINT) END AS ref
  FROM events
)
GROUP BY grp
ORDER BY grp NULLS FIRST
""",
    tags=("scalar", "null"),
    doc="NULL semantics end-to-end: NULL group keys form their own "
    "group, count(col) vs count(*), null-safe equality (Spark <=> / "
    "SQL IS NOT DISTINCT FROM — true when both sides are NULL), "
    "coalesce/nullif, and NULLS FIRST ordering (Spark's default for "
    "ascending, made explicit in the oracle).",
)
def scalar_null_semantics(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    derived = ev.select(
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("event_type"))
        .alias("grp"),
        F.when(F.col("event_id") % 5 == 0, None)
        .otherwise((F.col("event_id") % 13).cast("bigint"))
        .alias("val"),
        F.when(F.col("event_id") % 5 == 0, None)
        .otherwise((F.col("event_id") % 11).cast("bigint"))
        .alias("ref"),
    )
    return (
        derived.groupBy("grp")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("val").alias("n_nonnull"),
            F.sum(
                F.when(F.col("val").eqNullSafe(F.col("ref")), 1).otherwise(0)
            ).alias("n_nullsafe_eq"),
            F.coalesce(F.min("val"), F.lit(-1)).alias("min_or_default"),
            F.max(F.nullif(F.col("val"), F.lit(0))).alias("max_nonzero"),
        )
        .orderBy(F.col("grp").asc_nulls_first())
    )


@register(
    "dedup_embedding_components",
    oracle=f"""
WITH RECURSIVE norms AS (
  SELECT vec_id,
         sum(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * {_QV}) AS BIGINT)) AS qn
  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
  GROUP BY vec_id
),
prods AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         unnest(a.embedding) AS xa, unnest(b.embedding) AS xb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
),
dots AS (
  SELECT vec_a, vec_b,
         sum(CAST(floor(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE) * {_QV}) AS BIGINT)) AS qd
  FROM prods GROUP BY vec_a, vec_b
),
pairs AS (
  SELECT d.vec_a, d.vec_b
  FROM dots d
  JOIN norms na ON na.vec_id = d.vec_a
  JOIN norms nb ON nb.vec_id = d.vec_b
  WHERE CAST(d.qd AS DOUBLE)
        / (sqrt(CAST(na.qn AS DOUBLE)) * sqrt(CAST(nb.qn AS DOUBLE)))
        >= {{thr}}
),
edges AS (
  SELECT vec_a AS a, vec_b AS b FROM pairs
  UNION ALL SELECT vec_b, vec_a FROM pairs
),
reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, min(b) AS component_id FROM reach GROUP BY a
""".replace("{thr}", "0.5"),
    tags=("northstar", "dedup", "embedding", "iterative"),
    doc="Semantic duplicate clusters: embedding-cosine(≥0.5) near-dup "
    "pairs (vectorized numpy kernel) fed into connected components — "
    "the cross-lingual/paraphrase dedup path, where token-based "
    "minhash misses rewrites that embed nearby. Same cluster "
    "machinery as the token pipeline; only the similarity metric "
    "changes.",
)
def dedup_embedding_components(spark, sf_dir):
    from ..operators import dedup

    pairs = similarity.embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.5
    ).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return dedup.connected_components(pairs)


@register(
    "events_value_histogram",
    oracle="""
SELECT CASE WHEN value < 0 THEN 0
            WHEN value >= 200 THEN 21
            ELSE CAST(floor(value / 10) AS BIGINT) + 1 END AS bucket,
       count(*) AS n,
       min(value) AS lo,
       max(value) AS hi
FROM events
GROUP BY 1
""",
    tags=("histogram", "groupby"),
    doc="Equi-width histogram via width_bucket (20 buckets over "
    "[0, 200); out-of-range rows land in the 0/21 overflow buckets) "
    "— the single-pass scan+groupBy companion of the NTILE "
    "equi-depth variant. DuckDB has no width_bucket; the oracle "
    "mirrors its bucket arithmetic explicitly.",
)
def events_value_histogram(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.width_bucket(F.col("value"), F.lit(0.0), F.lit(200.0), F.lit(20))
            .alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


@register(
    "agg_argmin_argmax",
    oracle="""
WITH ranked AS (
  SELECT o_orderstatus, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn_min,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice DESC, o_orderkey DESC)
           AS rn_max
  FROM orders
)
SELECT o_orderstatus,
       min(CASE WHEN rn_min = 1 THEN o_orderkey END) AS cheapest_order,
       min(CASE WHEN rn_max = 1 THEN o_orderkey END) AS priciest_order,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM ranked
GROUP BY o_orderstatus
""",
    tags=("groupby", "argminmax"),
    doc="ARG_MIN/ARG_MAX (min_by/max_by): the key of the extreme row "
    "per group in the same single aggregation pass as the extremes "
    "themselves — no self-join back to find 'which order was "
    "cheapest'. The ordering struct (price, key) makes tie-breaks "
    "deterministic — bare min_by on a tied price is "
    "partitioning-dependent and would flake the value-hash gate.",
)
def agg_argmin_argmax(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    tie_safe = F.struct("o_totalprice", "o_orderkey")
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", tie_safe).alias("cheapest_order"),
        F.max_by("o_orderkey", tie_safe).alias("priciest_order"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "scalar_bitwise_funcs",
    oracle="""
SELECT event_id,
       event_id & 255 AS low_byte,
       event_id >> 4 AS shifted,
       xor(event_id, 170) AS xored,
       CAST(bit_count(CAST(event_id AS BIGINT)) AS INT) AS popcount
FROM events
WHERE event_id % 100 = 0
""",
    tags=("scalar", "bitwise"),
    doc="Bitwise scalar surface: AND masks, right shift, XOR, "
    "popcount — the hash/bucketing primitives (e.g. SimHash banding, "
    "bloom probes) exposed directly.",
)
def scalar_bitwise_funcs(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 100 == 0)
    eid = F.col("event_id")
    return ev.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("low_byte"),
        F.shiftright(eid, 4).alias("shifted"),
        eid.bitwiseXOR(F.lit(170)).alias("xored"),
        F.bit_count(eid).alias("popcount"),
    )


# ---------------------------------------------------------------------------
# Z-order layout locality (multi-dimensional pruning)
# ---------------------------------------------------------------------------

_Z_EPOCH0 = 1704067200  # 2024-01-01 00:00 UTC — the events ts floor


def _zorder_oracle() -> str:
    from ..sources.layout import ZORDER_BITS, zorder_scaled_sql

    z = zorder_scaled_sql("(x - mnx)", "(mxx - mnx)", "(t - mnt)", "(mxt - mnt)")
    return f"""
WITH norm AS (
  SELECT CAST(user_id AS BIGINT) AS x,
         greatest(CAST(floor(epoch(ts)) AS BIGINT) - {_Z_EPOCH0}, 0) AS t
  FROM events
),
bounds AS (
  SELECT min(x) AS mnx, max(x) AS mxx, min(t) AS mnt, max(t) AS mxt
  FROM norm
),
zed AS (
  SELECT x, t, {z} AS zval FROM norm CROSS JOIN bounds
)
SELECT zval >> {2 * ZORDER_BITS - 8} AS zbucket,
       CAST(count(*) AS BIGINT) AS n,
       min(x) AS min_user, max(x) AS max_user,
       min(t) AS min_t, max(t) AS max_t
FROM zed GROUP BY 1
"""


@register(
    "events_zorder_locality",
    oracle=_zorder_oracle(),
    tags=("layout", "zorder", "scalar"),
    doc="Morton (Z-order) code over (user_id, seconds-since-floor) "
    "and per-top-8-bit-bucket min/max spans of BOTH dimensions — "
    "the multi-dimensional locality that makes `write_zorder_layout` "
    "(sources/layout.py) prune selective scans on EITHER column from "
    "parquet footer stats, where a single-column sort prunes only "
    "its own. Each dimension is MIN-max normalized onto the full "
    "2^22 grid first (a broadcast 1-row bounds aggregate; divide-"
    "first double scaling, so wide int64 ranges never overflow) — "
    "raw interleaving degenerates to a wide-dimension sort when "
    "bit widths differ. The interleave is one dialect-shared SQL "
    "fragment (shifts and floor-division agree across engines), "
    "so the whole code computation value-hashes; the bucket spans "
    "in the output ARE the pruning argument (each covers a narrow "
    "range of users AND of time at once). Pure per-row expression + "
    "one rollup shuffle.",
)
def events_zorder_locality(spark, sf_dir):
    from ..sources.layout import ZORDER_BITS, zorder_scaled_sql

    ev = _t(spark, sf_dir, "events")
    norm = ev.select(
        F.col("user_id").cast("bigint").alias("x"),
        F.greatest(
            F.unix_timestamp("ts").cast("bigint") - F.lit(_Z_EPOCH0),
            F.lit(0).cast("bigint"),
        ).alias("t"),
    )
    bounds = norm.agg(
        F.min("x").alias("mnx"),
        F.max("x").alias("mxx"),
        F.min("t").alias("mnt"),
        F.max("t").alias("mxt"),
    )
    zed = norm.crossJoin(F.broadcast(bounds)).select(
        "x",
        "t",
        F.expr(
            zorder_scaled_sql(
                "(x - mnx)", "(mxx - mnx)", "(t - mnt)", "(mxt - mnt)"
            )
        ).alias("zval"),
    )
    return (
        zed.select(
            F.expr(f"zval >> {2 * ZORDER_BITS - 8}").alias("zbucket"),
            "x",
            "t",
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("x").alias("min_user"),
            F.max("x").alias("max_user"),
            F.min("t").alias("min_t"),
            F.max("t").alias("max_t"),
        )
    )


def _hil_scale(v: str, vmax: str) -> str:
    """MIN-max normalization of `v` in [0, vmax] onto the 2^16
    Hilbert grid — the zorder_scaled_sql discipline (divide FIRST in
    double so wide int64 ranges never overflow; clamp the 1.0-rounding
    edge into the top cell), dialect-shared text."""
    from ..sources.layout import HILBERT_BITS

    top = (1 << HILBERT_BITS) - 1
    return (
        f"least(CAST(floor((({v}) / (({vmax}) + 1.0))"
        f" * {1 << HILBERT_BITS}) AS BIGINT), {top})"
    )


def _hilbert_oracle() -> str:
    from ..sources.layout import HILBERT_BITS, hilbert_duckdb_ctes

    sx = _hil_scale("(x - mnx)", "(mxx - mnx)")
    st = _hil_scale("(t - mnt)", "(mxt - mnt)")
    ctes, final = hilbert_duckdb_ctes("scaled", "sx", "st", "x, t")
    return f"""
WITH norm AS (
  SELECT CAST(user_id AS BIGINT) AS x,
         greatest(CAST(floor(epoch(ts)) AS BIGINT) - {_Z_EPOCH0}, 0) AS t
  FROM events
),
bounds AS (
  SELECT min(x) AS mnx, max(x) AS mxx, min(t) AS mnt, max(t) AS mxt
  FROM norm
),
scaled AS (
  SELECT x, t, {sx} AS sx, {st} AS st FROM norm CROSS JOIN bounds
),
{ctes}
SELECT hd >> {2 * HILBERT_BITS - 8} AS hbucket,
       CAST(count(*) AS BIGINT) AS n,
       min(x) AS min_user, max(x) AS max_user,
       min(t) AS min_t, max(t) AS max_t
FROM {final} GROUP BY 1
"""


@register(
    "events_hilbert_locality",
    oracle=_hilbert_oracle(),
    tags=("layout", "hilbert", "scalar"),
    doc="Hilbert-curve index over (user_id, seconds-since-floor) and "
    "per-top-8-bit-bucket min/max spans of BOTH dimensions — the "
    "stronger-locality companion to events_zorder_locality: the "
    "Hilbert curve has no Z-shape jumps (consecutive indexes are "
    "ALWAYS plane-adjacent, pinned by tests/test_hilbert.py), so "
    "bucket spans are tighter and layout pruning sharper at the "
    "price of a stateful quadrant-rotation recurrence instead of a "
    "bit interleave. Same min-max grid normalization (divide-first "
    "double scaling); the 16-level xy2d state machine runs as ONE "
    "per-row `aggregate` fold on Spark (no join/shuffle/UDF) and as "
    "an unrolled 16-CTE projection chain in the oracle — NOT one "
    "shared lambda text, because DuckDB 1.0's vectorized lambda "
    "evaluation miscomputes repeated subexpressions across struct "
    "fields (see hilbert_spark_sql's docstring). Both sides are "
    "pinned to the classic xy2d reference point-for-point, and the "
    "whole computation value-hashes. Per-row expression + one "
    "rollup shuffle.",
)
def events_hilbert_locality(spark, sf_dir):
    from ..sources.layout import HILBERT_BITS, hilbert_spark_sql

    ev = _t(spark, sf_dir, "events")
    norm = ev.select(
        F.col("user_id").cast("bigint").alias("x"),
        F.greatest(
            F.unix_timestamp("ts").cast("bigint") - F.lit(_Z_EPOCH0),
            F.lit(0).cast("bigint"),
        ).alias("t"),
    )
    bounds = norm.agg(
        F.min("x").alias("mnx"),
        F.max("x").alias("mxx"),
        F.min("t").alias("mnt"),
        F.max("t").alias("mxt"),
    )
    scaled = norm.crossJoin(F.broadcast(bounds)).select(
        "x",
        "t",
        F.expr(_hil_scale("(x - mnx)", "(mxx - mnx)")).alias("sx"),
        F.expr(_hil_scale("(t - mnt)", "(mxt - mnt)")).alias("st"),
    )
    hv = scaled.select(
        "x", "t", F.expr(hilbert_spark_sql("sx", "st")).alias("hd")
    )
    return (
        hv.select(
            F.expr(f"hd >> {2 * HILBERT_BITS - 8}").alias("hbucket"),
            "x",
            "t",
        )
        .groupBy("hbucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("x").alias("min_user"),
            F.max("x").alias("max_user"),
            F.min("t").alias("min_t"),
            F.max("t").alias("max_t"),
        )
    )


# ---------------------------------------------------------------------------
# Time-series resampling: hourly grid + forward fill (LOCF)
# ---------------------------------------------------------------------------
_FF_T0 = 1704067200  # 2024-01-01 00:00 UTC — the events month
_FF_SLOTS = 720  # 30 days of hourly slots
_FF_STEP = 3600
_FF_GRID_ID = 1 << 62  # event_id stand-in ordering grid rows last


def _ffill_oracle() -> str:
    return f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         value, 0 AS is_grid, event_id
  FROM events
),
users AS (SELECT DISTINCT user_id FROM events),
spine AS (
  SELECT user_id,
         unnest(range({_FF_T0}, {_FF_T0 + _FF_SLOTS * _FF_STEP}, {_FF_STEP}))
           AS ts_s
  FROM users
),
unioned AS (
  SELECT user_id, ts_s, value, is_grid, event_id FROM ev
  UNION ALL
  SELECT user_id, ts_s, NULL, 1, {_FF_GRID_ID} FROM spine
),
swept AS (
  SELECT user_id, ts_s, is_grid,
         last_value(value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts_s, is_grid, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
  FROM unioned
)
SELECT user_id, ts_s AS slot_s, filled
FROM swept WHERE is_grid = 1
"""


@register(
    "events_resample_ffill",
    oracle=_ffill_oracle(),
    tags=("temporal", "window", "resample"),
    doc="Time-series resampling with forward fill (last observation "
    "carried forward): every user's event stream lands on a shared "
    f"{_FF_SLOTS}-slot hourly grid, gaps filled from the most recent "
    "earlier observation (NULL before the first — never invented "
    "data). The union-sweep shape of the as-of join: observations "
    "and grid slots merge into ONE per-user ordered pass (one "
    "shuffle on user_id, last(...ignorenulls) over a running "
    "frame), so fill cost is O(events + slots) per user with no "
    "per-slot lookup join; same-second observations tie-break on "
    "event_id so the carried value is deterministic on both "
    "engines. The standard feature-engineering resample before "
    "training on irregular event data.",
)
def events_resample_ffill(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("ts_s"),
        "value",
        F.lit(0).alias("is_grid"),
        "event_id",
    )
    spine = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit(_FF_T0),
                    F.lit(_FF_T0 + (_FF_SLOTS - 1) * _FF_STEP),
                    F.lit(_FF_STEP),
                )
            ).alias("ts_s"),
        )
        .select(
            "user_id",
            "ts_s",
            F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("is_grid"),
            F.lit(_FF_GRID_ID).alias("event_id"),
        )
    )
    unioned = ev.unionByName(spine)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "is_grid", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn(
            "filled", F.last("value", ignorenulls=True).over(w)
        )
        .filter(F.col("is_grid") == 1)
        .select("user_id", F.col("ts_s").alias("slot_s"), "filled")
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy entity resolution (part names)
# ---------------------------------------------------------------------------
ER_LEV_MAX = 3  # max edit distance for a fuzzy match
ER_MAX_BLOCK = 10_000  # oversized-block guard (standard ER practice)

_ER_ORACLE = f"""
WITH names AS (
  SELECT p_name, CAST(count(*) AS BIGINT) AS cnt
  FROM part GROUP BY p_name
), blocked AS (
  SELECT p_name, cnt,
         string_split(p_name, ' ')[-1] AS block
  FROM names
), sized AS (
  SELECT b.* FROM blocked b
  JOIN (SELECT block FROM blocked GROUP BY block
        HAVING count(*) <= {ER_MAX_BLOCK}) k USING (block)
), pairs AS (
  SELECT a.block,
         a.cnt * b.cnt AS w
  FROM sized a JOIN sized b
    ON a.block = b.block AND a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= {ER_LEV_MAX}
), per_block AS (
  SELECT block,
         CAST(count(*) AS BIGINT) AS n_fuzzy_pairs,
         CAST(sum(w) AS BIGINT) AS pair_weight
  FROM pairs GROUP BY block
)
SELECT s.block,
       CAST(count(*) AS BIGINT) AS n_names,
       coalesce(p.n_fuzzy_pairs, 0) AS n_fuzzy_pairs,
       coalesce(p.pair_weight, 0) AS pair_weight
FROM sized s
LEFT JOIN per_block p ON p.block = s.block
GROUP BY s.block, p.n_fuzzy_pairs, p.pair_weight
"""


@register(
    "er_blocked_fuzzy_matches",
    oracle=_ER_ORACLE,
    tags=("advanced", "dedup", "fuzzy", "entity-resolution"),
    doc="Blocked fuzzy entity resolution over part names: distinct "
    "names pre-aggregate to (name, freq) — pairwise work runs over "
    "distinct VALUES, not rows, the first-order trick that keeps "
    "blocked ER alive at scale — then names sharing a blocking key "
    "(last name token) pair up a < b and match when Levenshtein "
    "distance <= 3, reported per block with the row-weighted pair "
    "count (freq_a x freq_b). An oversized-block guard skips "
    "degenerate keys (the standard blocking safeguard, mirroring "
    "the MinHash MAX_LSH_BUCKET cap) so no single hot key can go "
    "quadratic. The distinct-name table is broadcast-joined; the "
    "corpus-sized part scan is touched exactly once.",
)
def er_blocked_fuzzy_matches(spark, sf_dir):
    names = (
        _t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    blocked = names.select(
        "p_name",
        "cnt",
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
    )
    ok_blocks = (
        blocked.groupBy("block")
        .agg(F.count("*").alias("bn"))
        .filter(F.col("bn") <= ER_MAX_BLOCK)
        .select("block")
    )
    sized = blocked.join(F.broadcast(ok_blocks), "block").transform(stage)
    a = sized.alias("a")
    b = sized.alias("b")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            <= ER_LEV_MAX
        )
        .select(
            F.col("a.block").alias("block"),
            (F.col("a.cnt") * F.col("b.cnt")).alias("w"),
        )
    )
    per_block = pairs.groupBy("block").agg(
        F.count("*").cast("bigint").alias("n_fuzzy_pairs"),
        F.sum("w").cast("bigint").alias("pair_weight"),
    )
    return (
        sized.groupBy("block")
        .agg(F.count("*").cast("bigint").alias("n_names"))
        .join(F.broadcast(per_block), "block", "left")
        .select(
            "block",
            "n_names",
            F.coalesce(F.col("n_fuzzy_pairs"), F.lit(0)).alias(
                "n_fuzzy_pairs"
            ),
            F.coalesce(F.col("pair_weight"), F.lit(0)).alias(
                "pair_weight"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Fixed-point EWMA (deterministic sequential fold per key)
# ---------------------------------------------------------------------------
EWMA_TAIL = 64  # bounded state: fold only the last N events per user

_EWMA_ORACLE = f"""
WITH e AS (
  SELECT user_id, CAST(floor(value * 1000) AS BIGINT) AS vq, ts, event_id
  FROM events
), l AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         list(vq ORDER BY ts, event_id) AS vs
  FROM e GROUP BY user_id
), t AS (
  SELECT user_id, n_events,
         list_slice(vs, greatest(len(vs) - {EWMA_TAIL - 1}, 1), len(vs))
           AS tail
  FROM l
)
SELECT user_id, n_events,
       CAST(list_reduce(tail, (a, b) -> (a + b) >> 1) AS BIGINT)
         AS ewma_milli
FROM t
"""


@register(
    "events_ewma_fixedpoint",
    oracle=_EWMA_ORACLE,
    tags=("advanced", "window", "temporal", "fold"),
    doc="Per-user exponentially-weighted moving average as a "
    "deterministic sequential fold: values quantize to integer "
    "milli-units, events order by (ts, event_id), and the running "
    "state halves via bit-shift — ew := (ew + v) >> 1 — so the fold "
    "is exact integer arithmetic with zero float drift (values are "
    "non-negative, so shift = floor division on both engines). "
    "State is bounded by construction: only the LAST 64 events per "
    "user enter the fold (one EWMA half-life per step decays "
    "earlier events below milli resolution anyway), so the "
    "collect-sort-fold stays O(64) per key no matter how hot the "
    "key — the bounded-tail discipline a true sequential operator "
    "needs at scale, vs. the associative partial-agg path that "
    "EWMA's floor rounding does not admit. One shuffle on user_id.",
)
def events_ewma_fixedpoint(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 1000).cast("bigint").alias("vq"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "vq"))
        ).alias("s"),
    )
    vs = F.transform(F.col("s"), lambda x: x["vq"])
    tail = F.slice(
        vs,
        F.greatest(F.size(vs) - (EWMA_TAIL - 1), F.lit(1)),
        F.lit(EWMA_TAIL),
    )
    ew = F.aggregate(
        F.slice(tail, F.lit(2), F.greatest(F.size(tail) - 1, F.lit(0))),
        F.element_at(tail, 1),
        lambda acc, x: F.shiftright(acc + x, 1),
    )
    return per_user.select(
        "user_id", "n_events", ew.cast("bigint").alias("ewma_milli")
    )


# ---------------------------------------------------------------------------
# Event-sequence transition matrix (first-order Markov)
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), pairs AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
), totals AS (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM pairs
  GROUP BY from_type
)
SELECT p.from_type, p.to_type, p.n,
       CAST((p.n * 1000000) // t.tot AS BIGINT) AS prob_ppm
FROM pairs p JOIN totals t USING (from_type)
"""


@register(
    "events_transition_matrix",
    oracle=_TRANSITION_ORACLE,
    tags=("advanced", "sequence", "window", "markov"),
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lead() pairs each event with its successor in "
    "(ts, event_id) order, transitions count per (from, to) type, "
    "and the row-conditional probability lands as exact parts-per-"
    "million via BIGINT floor division — no float path. Scale "
    "shape: ONE corpus shuffle (the per-user sequence window); the "
    "pair counts partial-aggregate map-side to at most "
    "|types|² rows per partition and the row-total join is "
    "broadcast model-state, so everything downstream of the window "
    "moves O(|types|²) rows regardless of corpus size.",
)
def events_transition_matrix(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w))
    pairs = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n").cast("bigint").alias("tot")
    )
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("CAST(n * 1000000 AS BIGINT) div tot").alias("prob_ppm"),
    )


# ---------------------------------------------------------------------------
# Pareto front / skyline (cheapest-and-largest parts per brand)
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH p AS (
  SELECT p_brand, p_partkey, p_size,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_c
  FROM part
), m AS (
  SELECT p_brand, p_partkey, p_size, price_c,
         max(p_size) OVER (PARTITION BY p_brand ORDER BY price_c
                           RANGE BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS m_cheaper,
         max(p_size) OVER (PARTITION BY p_brand, price_c) AS m_same
  FROM p
)
SELECT p_brand, p_partkey
FROM m
WHERE coalesce(m_cheaper >= p_size, FALSE) = FALSE
  AND m_same <= p_size
"""


@register(
    "pareto_front_parts",
    oracle=_PARETO_ORACLE,
    tags=("advanced", "window", "skyline"),
    doc="2-D skyline (Pareto front) per brand: parts not dominated "
    "on (price low, size high) — q dominates p when q is no more "
    "expensive and no smaller, strictly better in one. Computed "
    "WITHOUT the naive O(n²) dominance self-join: sort each brand "
    "by price and take two window maxima — the running max size "
    "over STRICTLY cheaper parts (RANGE frame to 1 preceding, so "
    "price ties stay out) and the max size within the same price "
    "point — a part is on the front iff neither dominates it. "
    "O(n log n) per brand, one shuffle on p_brand, price in exact "
    "BIGINT cents. The window-staircase rewrite IS the scale story: "
    "the quadratic formulation dies at 100 TB, this one is a sort.",
)
def pareto_front_parts(spark, sf_dir):
    from pyspark.sql import Window

    p = _t(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.round(F.col("p_retailprice") * 100)
        .cast("bigint")
        .alias("price_c"),
    )
    w_cheaper = (
        Window.partitionBy("p_brand")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("p_brand", "price_c")
    m = p.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.max("p_size").over(w_cheaper).alias("m_cheaper"),
        F.max("p_size").over(w_same).alias("m_same"),
    )
    return m.filter(
        F.coalesce(F.col("m_cheaper") >= F.col("p_size"), F.lit(False))
        == F.lit(False)
    ).filter(F.col("m_same") <= F.col("p_size")).select(
        "p_brand", "p_partkey"
    )


# ---------------------------------------------------------------------------
# Robust anomaly detection (median / MAD, exact integer ranks)
# ---------------------------------------------------------------------------
MAD_K = 3  # flag when |v - median| > K * MAD

_MAD_ORACLE = f"""
WITH e AS (
  SELECT event_type, event_id,
         CAST(floor(value * 1000) AS BIGINT) AS vq
  FROM events
), r AS (
  SELECT event_type, vq,
         row_number() OVER (PARTITION BY event_type ORDER BY vq)
           AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM e
), med AS (
  SELECT event_type, vq AS med_milli FROM r WHERE rn = (n + 1) // 2
), a AS (
  SELECT e.event_type, abs(e.vq - m.med_milli) AS adev, m.med_milli
  FROM e JOIN med m USING (event_type)
), r2 AS (
  SELECT event_type, adev, med_milli,
         row_number() OVER (PARTITION BY event_type ORDER BY adev)
           AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM a
), mad AS (
  SELECT event_type, med_milli, adev AS mad_milli
  FROM r2 WHERE rn = (n + 1) // 2
)
SELECT a.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN a.adev > {MAD_K} * m.mad_milli
                THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       m.med_milli, m.mad_milli
FROM a JOIN mad m USING (event_type)
GROUP BY a.event_type, m.med_milli, m.mad_milli
"""


@register(
    "events_anomaly_mad",
    oracle=_MAD_ORACLE,
    tags=("advanced", "quality", "statistics", "window"),
    doc="Robust outlier detection per event type: median / median-"
    "absolute-deviation (the estimator that survives the outliers "
    "it hunts, unlike mean/stddev), flagging events with "
    "|v − median| > 3·MAD. Values quantize to integer milli-units "
    "and both medians are the EXACT lower-median rank element "
    "(row_number = (n+1) div 2) — pure integer arithmetic end to "
    "end, no interpolation, no float drift. Scale shape: two rank "
    "windows partitioned by event_type (each one shuffle of slim "
    "(type, vq) rows) and broadcast joins of the |types|-row "
    "median/MAD tables back onto the stream; at production "
    "cardinalities the rank windows would swap for the mergeable "
    "quantile sketch (agg_quantile_sketch) — this query is the "
    "exact-twin anchor for that approximation.",
)
def events_anomaly_mad(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 1000).cast("bigint").alias("vq"),
    )
    w = Window.partitionBy("event_type").orderBy("vq")
    wc = Window.partitionBy("event_type")
    med = (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wc))
        .filter(F.col("rn") == F.expr("CAST(n + 1 AS BIGINT) div 2"))
        .select("event_type", F.col("vq").alias("med_milli"))
    )
    a = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_milli",
        F.abs(F.col("vq") - F.col("med_milli")).alias("adev"),
    )
    w2 = Window.partitionBy("event_type").orderBy("adev")
    mad = (
        a.withColumn("rn", F.row_number().over(w2))
        .withColumn("n", F.count("*").over(wc))
        .filter(F.col("rn") == F.expr("CAST(n + 1 AS BIGINT) div 2"))
        .select("event_type", "med_milli", F.col("adev").alias("mad_milli"))
    )
    return (
        a.select("event_type", "adev")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med_milli", "mad_milli")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(
                F.when(F.col("adev") > MAD_K * F.col("mad_milli"), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalies"),
        )
        .select(
            "event_type", "n_events", "n_anomalies",
            "med_milli", "mad_milli",
        )
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quintiles)
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH o AS (
  SELECT o_custkey,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS od,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), base AS (
  SELECT o_custkey,
         CAST(count(*) AS BIGINT) AS f,
         CAST(sum(cents) AS BIGINT) AS m_cents,
         (SELECT max(od) FROM o) - max(od) AS days_since
  FROM o GROUP BY o_custkey
), scored AS (
  SELECT o_custkey,
         ntile(5) OVER (ORDER BY days_since DESC, o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY f, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY m_cents, o_custkey) AS m_score
  FROM base
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(count(*) AS BIGINT) AS n_customers
FROM scored GROUP BY 1, 2, 3
"""


@register(
    "customer_rfm_segments",
    oracle=_RFM_ORACLE,
    tags=("advanced", "window", "segmentation"),
    doc="RFM segmentation: per customer, recency (days since last "
    "order, anchored to the corpus max day — epoch-day integers), "
    "frequency (order count) and monetary value (exact cents), each "
    "cut into quintiles by ntile(5) with the customer key as a "
    "total-order tiebreak (ntile is deterministic only under a "
    "total order — both engines use the standard "
    "front-loaded-bucket rule), rolled up to segment counts. Scale "
    "shape: one aggregation on o_custkey, then three SHARDED ntile "
    "passes over the |customers|-row metric table via "
    "operators/ranking.py::global_rank_analytics (range partition "
    "on the score key, per-shard row_number in parallel, broadcast "
    "prefix offsets, ntile as arithmetic on the exact global row "
    "number) — no partition-less window anywhere: |customers| grows "
    "with the corpus, and a single-task ntile over billions of "
    "customers is exactly the stall the sharded form eliminates.",
)
def customer_rfm_segments(spark, sf_dir):
    from ..operators.ranking import global_rank_analytics

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.unix_timestamp("o_orderdate") / 86400)
        .cast("bigint")
        .alias("od"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("f"),
        F.sum("cents").cast("bigint").alias("m_cents"),
        F.max("od").alias("last_day"),
    )
    anchor = o.agg(F.max("od").alias("max_day"))
    base = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        "f",
        "m_cents",
        (F.col("max_day") - F.col("last_day")).alias("days_since"),
    )
    # The metric table fans out into nine branches (3 passes × each
    # pass's boundary aggregate + offsets + output): materialize the
    # dim-sized frame ONCE instead of re-aggregating the fact table
    # per branch. At cluster scale io.stage routes this cut to a
    # durable checkpoint (spark.jly.staging.mode=reliable) of a
    # |customers|-slim projection — the standard fan-out staging.
    base = base.transform(stage)
    # Three INDEPENDENT sharded-ntile passes over the SAME base (not
    # chained — chaining nests each pass's boundary aggregate and
    # offsets branch inside the next pass's plan, recomputing the
    # whole upstream per level). Independent passes share the one
    # orders-aggregation exchange (ReuseExchange: identical base
    # subtree 3×), each emits a slim (custkey, score) frame, and the
    # custkey equi-joins that reassemble them are ordinary
    # bounded-parallel shuffle joins.
    scored = None
    for col, out_name, is_desc in (
        ("days_since", "r_score", True),
        ("f", "f_score", False),
        ("m_cents", "m_score", False),
    ):
        s = global_rank_analytics(
            base,
            col,
            desc=is_desc,
            tiebreak=("o_custkey",),
            ntile=5,
            row_number_only=True,
        ).select(
            "o_custkey", F.col("g_ntile").cast("bigint").alias(out_name)
        )
        scored = s if scored is None else scored.join(s, "o_custkey")
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").cast("bigint").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# Growth accounting (new / returning / cumulative users per day)
# ---------------------------------------------------------------------------

_GROWTH_ORACLE = """
WITH e AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, user_id
  FROM events
), firsts AS (
  SELECT user_id, min(day) AS first_day FROM e GROUP BY user_id
), newd AS (
  SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new
  FROM firsts GROUP BY first_day
), act AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
  FROM e GROUP BY day
)
SELECT a.day, a.n_active,
       coalesce(nd.n_new, 0) AS n_new,
       a.n_active - coalesce(nd.n_new, 0) AS n_returning,
       CAST(sum(coalesce(nd.n_new, 0))
            OVER (ORDER BY a.day) AS BIGINT) AS cum_users
FROM act a LEFT JOIN newd nd ON nd.day = a.day
"""


@register(
    "events_new_users_daily",
    oracle=_GROWTH_ORACLE,
    tags=("advanced", "window", "growth", "temporal"),
    doc="Growth accounting: per epoch-day, active users, first-seen "
    "(new) users, returning users, and the cumulative user count — "
    "the standard new/returning/cumulative decomposition every "
    "product-analytics stack runs. Scale shape: two aggregations "
    "shuffle slim (user, day) pairs (first-seen and daily-active, "
    "both map-side combined); everything after is |days|-row model "
    "state, including the running-sum window — the global ordering "
    "ranks days, never events.",
)
def events_new_users_daily(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        (F.unix_timestamp("ts") / 86400).cast("bigint").alias("day"),
        "user_id",
    )
    firsts = e.groupBy("user_id").agg(F.min("day").alias("first_day"))
    newd = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").cast("bigint").alias("n_new")
    )
    act = e.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_active")
    )
    w = Window.orderBy("day")
    return (
        act.join(F.broadcast(newd), "day", "left")
        .select(
            "day",
            "n_active",
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
            (
                F.col("n_active") - F.coalesce(F.col("n_new"), F.lit(0))
            ).alias("n_returning"),
        )
        .withColumn(
            "cum_users",
            F.sum("n_new").over(w).cast("bigint"),
        )
    )


# ---------------------------------------------------------------------------
# Point-in-time (temporal) join against SCD2-style state history
# ---------------------------------------------------------------------------

_PIT_ORACLE = """
WITH dim AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         event_id, event_type AS state, 0 AS is_fact
  FROM events WHERE event_type IN ('view', 'click')
), fact AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         event_id, NULL AS state, 1 AS is_fact
  FROM events WHERE event_type = 'purchase'
), unioned AS (
  SELECT * FROM dim UNION ALL SELECT * FROM fact
), swept AS (
  SELECT user_id, event_id, is_fact,
         last_value(state IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts_s, is_fact, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS state_at
  FROM unioned
)
SELECT coalesce(state_at, 'none') AS state_at,
       CAST(count(*) AS BIGINT) AS n_purchases
FROM swept WHERE is_fact = 1
GROUP BY 1
"""


@register(
    "events_point_in_time_join",
    oracle=_PIT_ORACLE,
    tags=("advanced", "temporal", "scd", "join"),
    doc="Point-in-time join: each purchase picks up the user's state "
    "(last view/click) VALID AT its event time — the temporal/SCD2 "
    "lookup every feature store and backtest runs, and the classic "
    "leakage trap when done with a naive latest-state join. "
    "Implemented as the union-sweep, not an interval range join: "
    "state changes and facts merge into one per-user ordered pass "
    "(dim rows sort before facts at equal timestamps, ties on "
    "event_id), the running last(... ignorenulls) carries the valid "
    "state, and fact rows emit. One shuffle on user_id, O(changes + "
    "facts) per user — the interval self-join this replaces is "
    "quadratic in version count. Purchases before any state are "
    "'none', never leaked future state.",
)
def events_point_in_time_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ts_s"),
        "event_id",
        "event_type",
    )
    dim = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        "ts_s",
        "event_id",
        F.col("event_type").alias("state"),
        F.lit(0).alias("is_fact"),
    )
    fact = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_s",
        "event_id",
        F.lit(None).cast("string").alias("state"),
        F.lit(1).alias("is_fact"),
    )
    unioned = dim.unionByName(fact)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "is_fact", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = unioned.withColumn(
        "state_at", F.last("state", ignorenulls=True).over(w)
    )
    return (
        swept.filter(F.col("is_fact") == 1)
        .select(
            F.coalesce(F.col("state_at"), F.lit("none")).alias(
                "state_at"
            )
        )
        .groupBy("state_at")
        .agg(F.count("*").cast("bigint").alias("n_purchases"))
    )


# ---------------------------------------------------------------------------
# Sequence pattern matching (MATCH_RECOGNIZE workaround)
# ---------------------------------------------------------------------------

_PATTERN_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2,
         lead(ts, 2) OVER w AS ts2,
         ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), hits AS (
  SELECT user_id,
         CAST(floor(epoch(ts2)) - floor(epoch(ts)) AS BIGINT) AS span_s
  FROM seq
  WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
)
SELECT CAST(count(*) AS BIGINT) AS n_matches,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(coalesce(min(span_s), -1) AS BIGINT) AS min_span_s,
       CAST(coalesce(max(span_s), -1) AS BIGINT) AS max_span_s
FROM hits
"""


@register(
    "events_pattern_view_click_buy",
    oracle=_PATTERN_ORACLE,
    tags=("advanced", "sequence", "window", "pattern"),
    doc="Row-pattern matching (the MATCH_RECOGNIZE workaround Spark "
    "needs): strictly CONSECUTIVE view→click→purchase triples per "
    "user, found by materializing a 3-event sliding frame with "
    "lead() over the (ts, event_id) order and predicating on it — "
    "no k-way self-join, no regex engine, one window pass. Reports "
    "match count, matched users, and the min/max match span in "
    "whole seconds (exact integers; the funnel query covers the "
    "eventually-ordered variant, this covers the adjacency-strict "
    "one). ONE corpus shuffle (the per-user window); the rollup "
    "exchanges a single row.",
)
def events_pattern_view_click_buy(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ts_s"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts_s",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("ts_s", 2).over(w).alias("ts2_s"),
    )
    hits = seq.filter(
        (F.col("event_type") == "view")
        & (F.col("t1") == "click")
        & (F.col("t2") == "purchase")
    ).select("user_id", (F.col("ts2_s") - F.col("ts_s")).alias("span_s"))
    return hits.agg(
        F.count("*").cast("bigint").alias("n_matches"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.coalesce(F.min("span_s"), F.lit(-1))
        .cast("bigint")
        .alias("min_span_s"),
        F.coalesce(F.max("span_s"), F.lit(-1))
        .cast("bigint")
        .alias("max_span_s"),
    )


# ---------------------------------------------------------------------------
# Nearest as-of join (either direction, bounded tolerance)
# ---------------------------------------------------------------------------
ASOF_NEAREST_TOL_S = 3600  # match window on each side

_ASOF_NEAREST_ORACLE = f"""
WITH u AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
         CASE WHEN event_type = 'view' THEN event_id END AS view_id,
         CASE WHEN event_type = 'view'
              THEN CAST(floor(epoch(ts)) AS BIGINT) END AS view_ts
  FROM events WHERE event_type IN ('view', 'purchase')
), swept AS (
  SELECT user_id, ts_s, event_id, is_p,
         last_value(view_id IGNORE NULLS) OVER wb AS pv_id,
         last_value(view_ts IGNORE NULLS) OVER wb AS pv_ts,
         first_value(view_id IGNORE NULLS) OVER wf AS nv_id,
         first_value(view_ts IGNORE NULLS) OVER wf AS nv_ts
  FROM u
  WINDOW wb AS (PARTITION BY user_id ORDER BY ts_s, is_p, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY ts_s, is_p, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
), m AS (
  SELECT event_id AS purchase_id,
         CASE
           WHEN pv_ts IS NOT NULL AND ts_s - pv_ts <= {ASOF_NEAREST_TOL_S}
                AND (nv_ts IS NULL OR ts_s - pv_ts <= nv_ts - ts_s
                     OR nv_ts - ts_s > {ASOF_NEAREST_TOL_S})
           THEN pv_id
           WHEN nv_ts IS NOT NULL AND nv_ts - ts_s <= {ASOF_NEAREST_TOL_S}
           THEN nv_id
         END AS view_id,
         CASE
           WHEN pv_ts IS NOT NULL AND ts_s - pv_ts <= {ASOF_NEAREST_TOL_S}
                AND (nv_ts IS NULL OR ts_s - pv_ts <= nv_ts - ts_s
                     OR nv_ts - ts_s > {ASOF_NEAREST_TOL_S})
           THEN ts_s - pv_ts
           WHEN nv_ts IS NOT NULL AND nv_ts - ts_s <= {ASOF_NEAREST_TOL_S}
           THEN nv_ts - ts_s
         END AS dist_s
  FROM swept WHERE is_p = 1
)
SELECT purchase_id,
       coalesce(view_id, -1) AS view_id,
       coalesce(dist_s, -1) AS dist_s
FROM m
"""


@register(
    "join_asof_nearest",
    oracle=_ASOF_NEAREST_ORACLE,
    tags=("advanced", "join", "asof", "temporal"),
    doc="Nearest-direction as-of join: each purchase matches the "
    "CLOSEST view by the same user within ±1 h, backward winning "
    "ties — the bidirectional variant next to the backward-only "
    "join_asof_events/tolerance pair (sensor alignment, attribution "
    "with post-hoc views). Same union-sweep scale shape: views and "
    "purchases merge into ONE per-user ordered pass; two frames "
    "over the SAME window ordering (running last + forward first) "
    "share one shuffle, so the bidirectional lookup costs exactly "
    "what the one-directional one does — no range join, no per-row "
    "candidate explosion.",
)
def join_asof_nearest(spark, sf_dir):
    from pyspark.sql import Window

    tol = ASOF_NEAREST_TOL_S
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    u = ev.select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ts_s"),
        "event_id",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("is_p"),
        F.when(
            F.col("event_type") == "view", F.col("event_id")
        ).alias("view_id"),
        F.when(
            F.col("event_type") == "view",
            F.floor(F.unix_timestamp("ts")).cast("bigint"),
        ).alias("view_ts"),
    )
    order = [F.col("ts_s"), F.col("is_p"), F.col("event_id")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    swept = u.select(
        "event_id",
        "ts_s",
        "is_p",
        F.last("view_id", ignorenulls=True).over(wb).alias("pv_id"),
        F.last("view_ts", ignorenulls=True).over(wb).alias("pv_ts"),
        F.first("view_id", ignorenulls=True).over(wf).alias("nv_id"),
        F.first("view_ts", ignorenulls=True).over(wf).alias("nv_ts"),
    ).filter(F.col("is_p") == 1)
    prev_ok = F.col("pv_ts").isNotNull() & (
        F.col("ts_s") - F.col("pv_ts") <= tol
    )
    prev_wins = prev_ok & (
        F.col("nv_ts").isNull()
        | (F.col("ts_s") - F.col("pv_ts") <= F.col("nv_ts") - F.col("ts_s"))
        | (F.col("nv_ts") - F.col("ts_s") > tol)
    )
    next_ok = F.col("nv_ts").isNotNull() & (
        F.col("nv_ts") - F.col("ts_s") <= tol
    )
    view_id = F.when(prev_wins, F.col("pv_id")).when(
        next_ok, F.col("nv_id")
    )
    dist = F.when(prev_wins, F.col("ts_s") - F.col("pv_ts")).when(
        next_ok, F.col("nv_ts") - F.col("ts_s")
    )
    return swept.select(
        F.col("event_id").alias("purchase_id"),
        F.coalesce(view_id, F.lit(-1)).alias("view_id"),
        F.coalesce(dist, F.lit(-1)).alias("dist_s"),
    )


# ---------------------------------------------------------------------------
# Interval stabbing via difference arrays (open-order backlog)
# ---------------------------------------------------------------------------

_BACKLOG_ORACLE = """
WITH iv AS (
  SELECT o.o_orderkey,
         CAST(floor(epoch(o.o_orderdate) / 86400) AS BIGINT) AS d0,
         CAST(floor(epoch(max(l.l_shipdate)) / 86400) AS BIGINT) AS d1
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
), deltas AS (
  SELECT d0 AS day, 1 AS delta FROM iv
  UNION ALL
  SELECT d1 + 1 AS day, -1 AS delta FROM iv
), byday AS (
  SELECT day, CAST(sum(delta) AS BIGINT) AS delta FROM deltas
  GROUP BY day
)
SELECT day, delta,
       CAST(sum(delta) OVER (ORDER BY day) AS BIGINT) AS n_open
FROM byday
"""


@register(
    "orders_open_backlog_daily",
    oracle=_BACKLOG_ORACLE,
    tags=("advanced", "temporal", "window", "interval"),
    doc="Open-order backlog over time by interval stabbing: each "
    "order is open from its order day through its last ship day; "
    "the daily open count is the difference-array sweep (+1 at "
    "start, −1 past end, running sum over days) — O(intervals) "
    "instead of the interval×day stabbing join, the only shape "
    "that survives billions of intervals. One fact shuffle to "
    "close each order's interval (map-side combined max), one "
    "O(|days|) delta rollup; the running sum ranks days, never "
    "orders. Epoch-day integers throughout.",
)
def orders_open_backlog_daily(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.unix_timestamp("o_orderdate") / 86400)
        .cast("bigint")
        .alias("d0"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        (F.unix_timestamp("l_shipdate") / 86400)
        .cast("bigint")
        .alias("sd"),
    )
    iv = (
        li.groupBy("o_orderkey")
        .agg(F.max("sd").alias("d1"))
        .join(o, "o_orderkey")
    )
    deltas = iv.select(
        F.col("d0").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select(
            (F.col("d1") + 1).alias("day"), F.lit(-1).alias("delta")
        )
    )
    byday = deltas.groupBy("day").agg(
        F.sum("delta").cast("bigint").alias("delta")
    )
    w = Window.orderBy("day")
    return byday.withColumn(
        "n_open", F.sum("delta").over(w).cast("bigint")
    )


# ---------------------------------------------------------------------------
# Shannon entropy of the value distribution per event type
# ---------------------------------------------------------------------------
ENTROPY_BUCKETS = 10  # value deciles (fixed 0..500 domain → 50/bucket)

# Quantization discipline as the unigram-LM oracle: q(ln x) :=
# round(ln(x)·1e6) per DISTINCT count, then H = q(ln N) − (Σ c·q(ln c))
# div N — exact BIGINT afterwards, ≤ |buckets|·|types| ln() calls.
_ENTROPY_ORACLE = f"""
WITH b AS (
  SELECT event_type,
         least(CAST(floor(value / 50.0) AS BIGINT),
               {ENTROPY_BUCKETS - 1}) AS bucket
  FROM events
), c AS (
  SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS c
  FROM b GROUP BY event_type, bucket
), n AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM c
  GROUP BY event_type
)
SELECT c.event_type,
       n.n AS n_events,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(round(ln(CAST(n.n AS DOUBLE)) * 1e6) AS BIGINT)
         - CAST(sum(c.c * CAST(round(ln(CAST(c.c AS DOUBLE)) * 1e6)
                               AS BIGINT)) AS BIGINT) // n.n
         AS entropy_micro
FROM c JOIN n ON n.event_type = c.event_type
GROUP BY c.event_type, n.n
"""


@register(
    "events_entropy_by_type",
    oracle=_ENTROPY_ORACLE,
    tags=("advanced", "statistics", "information"),
    doc="Shannon entropy of each event type's value distribution "
    "(fixed deciles of the value domain): H = ln N − (Σ c·ln c)/N "
    "with every ln quantized to integer micro-nats per DISTINCT "
    "count (the unigram-LM determinism discipline) and the rest "
    "exact BIGINT — the drift/diversity signal monitoring stacks "
    "track per segment. Scale shape: bucket counts map-side combine "
    "to |types|·|buckets| rows before any exchange; everything "
    "after is model-state.",
)
def events_entropy_by_type(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.least(
            F.floor(F.col("value") / 50.0).cast("bigint"),
            F.lit(ENTROPY_BUCKETS - 1),
        ).alias("bucket"),
    )
    c = b.groupBy("event_type", "bucket").agg(
        F.count("*").cast("bigint").alias("c")
    )
    n = c.groupBy("event_type").agg(F.sum("c").cast("bigint").alias("n"))
    qln = lambda col: F.round(  # noqa: E731
        F.log(F.col(col).cast("double")) * 1e6
    ).cast("bigint")
    return (
        c.join(F.broadcast(n), "event_type")
        .select(
            "event_type",
            "n",
            (F.col("c") * qln("c")).alias("clnc"),
        )
        .groupBy("event_type", "n")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.sum("clnc").cast("bigint").alias("sum_clnc"),
        )
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            "n_buckets",
            (qln("n") - F.expr("sum_clnc div n")).alias("entropy_micro"),
        )
    )


# ---------------------------------------------------------------------------
# DAU / WAU stickiness (sliding-window distinct users)
# ---------------------------------------------------------------------------

_DAU_WAU_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), days AS (
  SELECT DISTINCT day FROM ud
), cover AS (
  SELECT DISTINCT u.user_id, d.day
  FROM ud u JOIN days d ON d.day BETWEEN u.day AND u.day + 6
), dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day
), wau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS wau FROM cover GROUP BY day
)
SELECT d.day, d.dau, w.wau,
       (d.dau * 1000000) // w.wau AS stickiness_ppm
FROM dau d JOIN wau w ON w.day = d.day
"""


@register(
    "events_dau_wau_stickiness",
    oracle=_DAU_WAU_ORACLE,
    tags=("advanced", "temporal", "growth", "window"),
    doc="DAU/WAU stickiness: per day, distinct daily actives over "
    "distinct trailing-7-day actives, as exact ppm. The sliding "
    "DISTINCT is the trick — a windowed count(distinct) does not "
    "distribute, so each (user, day) pair instead CONTRIBUTES to "
    "the 7 days it covers (a bounded 7× fan-out of slim long "
    "pairs, deduped per user-day), turning the sliding distinct "
    "into two plain count aggregations. The fan-out factor is the "
    "window length, independent of corpus size — the only exact "
    "shape that survives scale (the approximate alternative is the "
    "KMV sketch per day, anchored by this query).",
)
def events_dau_wau_stickiness(spark, sf_dir):
    ud = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            (F.unix_timestamp("ts") / 86400)
            .cast("bigint")
            .alias("day"),
        )
        .distinct()
        .transform(stage)
    )
    days = ud.select("day").distinct()
    cover = (
        ud.withColumn(
            "day_c", F.explode(F.sequence(F.col("day"), F.col("day") + 6))
        )
        .join(F.broadcast(days.select(F.col("day").alias("day_c"))), "day_c")
        .select("user_id", F.col("day_c").alias("day"))
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    wau = cover.groupBy("day").agg(
        F.count("*").cast("bigint").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.expr("(dau * 1000000) div wau").alias("stickiness_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Quantified row-pattern matching: view+ click? purchase
# ---------------------------------------------------------------------------

_PATTERN_QUANT_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rnt
  FROM events
), runs AS (
  SELECT user_id, event_type,
         CAST(count(*) AS BIGINT) AS len,
         min(rn) AS rn0,
         min(ts_s) AS start_s
  FROM e GROUP BY user_id, event_type, rn - rnt
), seq AS (
  SELECT user_id, event_type, len, start_s,
         lead(event_type, 1) OVER w AS t1,
         lead(len, 1) OVER w AS l1,
         lead(start_s, 1) OVER w AS s1,
         lead(event_type, 2) OVER w AS t2,
         lead(start_s, 2) OVER w AS s2
  FROM runs
  WINDOW w AS (PARTITION BY user_id ORDER BY rn0)
), hits AS (
  SELECT user_id, len AS n_views,
         CASE WHEN t1 = 'click' THEN 1 ELSE 0 END AS with_click,
         CASE WHEN t1 = 'click' THEN s2 ELSE s1 END - start_s AS span_s
  FROM seq
  WHERE event_type = 'view'
    AND (t1 = 'purchase'
         OR (t1 = 'click' AND l1 = 1 AND t2 = 'purchase'))
)
SELECT CAST(count(*) AS BIGINT) AS n_matches,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(coalesce(sum(n_views), 0) AS BIGINT) AS n_views_consumed,
       CAST(coalesce(sum(with_click), 0) AS BIGINT) AS n_with_click,
       CAST(coalesce(max(n_views), 0) AS BIGINT) AS max_views,
       CAST(coalesce(min(span_s), -1) AS BIGINT) AS min_span_s,
       CAST(coalesce(max(span_s), -1) AS BIGINT) AS max_span_s
FROM hits
"""


@register(
    "events_pattern_quantified",
    oracle=_PATTERN_QUANT_ORACLE,
    tags=("advanced", "sequence", "window", "pattern"),
    doc="QUANTIFIED row-pattern matching — MATCH_RECOGNIZE "
    "`view+ click? purchase` per user with greedy quantifiers and "
    "AFTER MATCH SKIP PAST LAST ROW, compiled to RUN ALGEBRA instead "
    "of a regex engine: run-length-encode each user's (ts, event_id)-"
    "ordered event stream (change-flag + running sum over ONE window "
    "partitioning, then a per-run combine), and a match is exactly a "
    "view-run followed by purchase, or by a length-1 click-run then "
    "purchase (runs are maximal, so greedy view+ consumes the whole "
    "run, click? admits at most one click, and a longer click-run "
    "can never match — the same backtracking outcome a regex engine "
    "would reach, derived statically). Generalizes the fixed-width "
    "lead() trick (`events_pattern_view_click_buy`) to variable-"
    "length patterns; arbitrary regex patterns would compile to an "
    "NFA fold via applyInPandas, but every concatenation-of-"
    "quantified-literals pattern compiles to this declarative form. "
    "Reports matches, users, views consumed, optional-click count, "
    "longest view run and span bounds — all exact integers. Scale "
    "shape: ONE fact shuffle total — the run-id windows, the run "
    "combine (groupBy user_id+run_id) and the run-sequence window "
    "all ride the same user_id partitioning (colocated: clustering "
    "by a superset key is satisfied without re-exchange), then a "
    "1-row rollup; no self-join, no per-row Python.",
)
def events_pattern_quantified(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ts_s"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # the running sum orders by the already-computed rn (same total
    # order; ts/event_id are projected away by then)
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts_s",
        F.row_number().over(w).alias("rn"),
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    ).withColumn("run_id", F.sum("chg").over(wcum))
    runs = flagged.groupBy("user_id", "run_id").agg(
        F.first("event_type").alias("event_type"),
        F.count("*").cast("bigint").alias("len"),
        F.min("rn").alias("rn0"),
        F.min("ts_s").alias("start_s"),
    )
    wr = Window.partitionBy("user_id").orderBy("rn0")
    seq = runs.select(
        "user_id",
        "event_type",
        "len",
        "start_s",
        F.lead("event_type", 1).over(wr).alias("t1"),
        F.lead("len", 1).over(wr).alias("l1"),
        F.lead("start_s", 1).over(wr).alias("s1"),
        F.lead("event_type", 2).over(wr).alias("t2"),
        F.lead("start_s", 2).over(wr).alias("s2"),
    )
    hits = seq.filter(
        (F.col("event_type") == "view")
        & (
            (F.col("t1") == "purchase")
            | (
                (F.col("t1") == "click")
                & (F.col("l1") == 1)
                & (F.col("t2") == "purchase")
            )
        )
    ).select(
        "user_id",
        F.col("len").alias("n_views"),
        F.when(F.col("t1") == "click", 1).otherwise(0).alias("with_click"),
        (
            F.when(F.col("t1") == "click", F.col("s2")).otherwise(
                F.col("s1")
            )
            - F.col("start_s")
        ).alias("span_s"),
    )
    return hits.agg(
        F.count("*").cast("bigint").alias("n_matches"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.coalesce(F.sum("n_views"), F.lit(0))
        .cast("bigint")
        .alias("n_views_consumed"),
        F.coalesce(F.sum("with_click"), F.lit(0))
        .cast("bigint")
        .alias("n_with_click"),
        F.coalesce(F.max("n_views"), F.lit(0))
        .cast("bigint")
        .alias("max_views"),
        F.coalesce(F.min("span_s"), F.lit(-1))
        .cast("bigint")
        .alias("min_span_s"),
        F.coalesce(F.max("span_s"), F.lit(-1))
        .cast("bigint")
        .alias("max_span_s"),
    )


# --------------------------------------------------------------------
# Stream-health analytics (round 8): CUSUM changepoint, Fano-factor
# burstiness, linear multi-touch attribution
# --------------------------------------------------------------------
CUSUM_SLACK_MICRO = 250_000   # k = 0.25 events of allowed drift/day
CUSUM_ALARM_MICRO = 3_000_000  # h = 3 events of cumulative excess

_CUSUM_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, day
),
mu AS (
  SELECT event_type,
         CAST(sum(n) * 1000000 // count(*) AS BIGINT) AS mu_micro
  FROM daily GROUP BY event_type
),
dev AS (
  SELECT d.event_type, d.day,
         d.n * 1000000 - m.mu_micro - {CUSUM_SLACK_MICRO} AS dev_micro
  FROM daily d JOIN mu m USING (event_type)
),
cum AS (
  SELECT event_type, day,
         CAST(sum(dev_micro) OVER w AS BIGINT) AS c
  FROM dev
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT event_type, day,
         c - least(CAST(0 AS BIGINT), min(c) OVER w) AS cusum_micro
  FROM cum
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       CAST(max(cusum_micro) AS BIGINT) AS peak_micro,
       CAST(min(CASE WHEN cusum_micro >= {CUSUM_ALARM_MICRO}
                THEN day END) AS BIGINT) AS first_alarm_day,
       CAST(sum(CASE WHEN cusum_micro >= {CUSUM_ALARM_MICRO}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_days,
       CAST(count(*) AS BIGINT) AS n_days
FROM s GROUP BY event_type
"""


@register(
    "events_changepoint_cusum",
    oracle=_CUSUM_ORACLE,
    tags=("advanced", "events", "window", "temporal"),
    doc="One-sided CUSUM changepoint detection on daily event "
    "volume: per type, the cumulative excess over (mean + slack) "
    "with the reset-at-zero recurrence S_d = max(0, S_{d-1} + "
    "dev_d) — the classic drift detector a stream-health monitor "
    "runs per source. The recurrence is NOT expressed as a "
    "sequential loop: max(0, ·) resets are algebraically S_d = "
    "cum_d − min(0, min_{j≤d} cum_j), i.e. the running sum minus "
    "its running minimum — two stock window functions over the "
    "per-(type, day) tile table, so the 100-TB shape is one "
    "map-side-combined aggregation plus windows over |types|·|days| "
    "slim rows. Exact micro-unit integer arithmetic (mean via "
    "trunc-div) keeps both engines bit-identical. Emits per type: "
    "peak CUSUM, first alarm day (NULL if never), alarm-day count.",
)
def events_changepoint_cusum(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 86400))
        .cast("bigint")
        .alias("day"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    mu = daily.groupBy("event_type").agg(
        F.expr("sum(n) * 1000000 div count(*)")
        .cast("bigint")
        .alias("mu_micro")
    )
    dev = daily.join(F.broadcast(mu), "event_type").select(
        "event_type",
        "day",
        (
            F.col("n") * 1000000
            - F.col("mu_micro")
            - F.lit(CUSUM_SLACK_MICRO)
        ).alias("dev_micro"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dev.withColumn(
        "c", F.sum("dev_micro").over(w).cast("bigint")
    )
    s = cum.withColumn(
        "cusum_micro",
        F.col("c")
        - F.least(F.lit(0).cast("bigint"), F.min("c").over(w)),
    )
    alarm = F.col("cusum_micro") >= CUSUM_ALARM_MICRO
    return s.groupBy("event_type").agg(
        F.max("cusum_micro").cast("bigint").alias("peak_micro"),
        F.min(F.when(alarm, F.col("day")))
        .cast("bigint")
        .alias("first_alarm_day"),
        F.sum(alarm.cast("int")).cast("bigint").alias("n_alarm_days"),
        F.count("*").cast("bigint").alias("n_days"),
    )


_FANO_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, hour
),
sums AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(n) AS BIGINT) AS sx,
         CAST(sum(n * n) AS BIGINT) AS sxx
  FROM hourly GROUP BY event_type
)
SELECT event_type, n_hours, sx AS n_events,
       CAST((n_hours * sxx - sx * sx) * 1000000 // (n_hours * sx)
            AS BIGINT) AS fano_micro
FROM sums
"""


@register(
    "events_burstiness_fano",
    oracle=_FANO_ORACLE,
    tags=("advanced", "events", "agg"),
    doc="Burstiness audit: the Fano factor (index of dispersion, "
    "population variance / mean of hourly arrival counts) per event "
    "type — 1.0 for a Poisson process, >1 bursty, <1 regular; the "
    "standard arrival-process health check a feed monitor runs per "
    "source. Exact integer fixed-point: fano_micro = (n·Σx² − "
    "(Σx)²)·1e6 div (n·Σx), all BIGINT (overflow bound: needs "
    "n·Σx² < 2^63 — fine to ~3e9 events/type at hourly grain; "
    "beyond that the q/r split the ratio tier uses applies). Scale "
    "shape: two map-side-combined aggregations, |types|·|hours| "
    "then |types| rows; nothing wider than the events scan itself.",
)
def events_burstiness_fano(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600))
        .cast("bigint")
        .alias("hour"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    sums = hourly.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_hours"),
        F.sum("n").cast("bigint").alias("sx"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sxx"),
    )
    return sums.select(
        "event_type",
        "n_hours",
        F.col("sx").alias("n_events"),
        F.expr(
            "(n_hours * sxx - sx * sx) * 1000000 div (n_hours * sx)"
        )
        .cast("bigint")
        .alias("fano_micro"),
    )


ATTR_WINDOW_DAYS = 7

_ATTR_ORACLE = f"""
WITH buys AS (
  SELECT user_id, event_id AS buy_id, ts AS buy_ts,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
views AS (
  SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'
),
touch AS (
  SELECT b.buy_id, b.cents,
         CAST(floor(epoch(v.view_ts) / 86400) AS BIGINT) AS view_day,
         count(*) OVER (PARTITION BY b.buy_id) AS n_touch
  FROM buys b JOIN views v
    ON v.user_id = b.user_id
   AND v.view_ts < b.buy_ts
   AND v.view_ts >= b.buy_ts - INTERVAL {ATTR_WINDOW_DAYS} DAY
)
SELECT view_day,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(cents * 1000000 // n_touch) AS BIGINT)
         AS attributed_micro_cents
FROM touch GROUP BY view_day
"""


@register(
    "events_attribution_linear",
    oracle=_ATTR_ORACLE,
    tags=("advanced", "events", "join", "temporal"),
    doc="Linear multi-touch attribution: every purchase splits its "
    "value equally (exact integer micro-cents, trunc-div) across "
    "the SAME user's view events in the prior 7 days, rolled up to "
    "attributed value per touch day — the standard marketing-"
    "attribution model, and the multi-touch generalization of the "
    "as-of join family (last-touch = join_asof_events). Scale "
    "shape: the touch join is an equi-join on user_id with a "
    "banded time predicate — shuffles partition on the user key, "
    "never a theta-only join; the per-buy touch count is a window "
    "over each buy's bounded touch set; the rollup map-side "
    "combines to |days| rows.",
)
def events_attribution_linear(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("buy_user"),
        F.col("event_id").alias("buy_id"),
        F.col("ts").alias("buy_ts"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
    )
    touch = buys.join(
        views,
        (F.col("buy_user") == F.col("view_user"))
        & (F.col("view_ts") < F.col("buy_ts"))
        & (
            F.col("view_ts")
            >= F.expr(f"buy_ts - INTERVAL {ATTR_WINDOW_DAYS} DAYS")
        ),
    ).select(
        "buy_id",
        "cents",
        (F.floor(F.unix_timestamp("view_ts") / 86400))
        .cast("bigint")
        .alias("view_day"),
    )
    counted = touch.withColumn(
        "n_touch", F.count("*").over(Window.partitionBy("buy_id"))
    )
    return counted.groupBy("view_day").agg(
        F.count("*").cast("bigint").alias("n_touches"),
        F.sum(F.expr("cents * 1000000 div n_touch"))
        .cast("bigint")
        .alias("attributed_micro_cents"),
    )


# --------------------------------------------------------------------
# Pattern compiler instance (round 8): view+ click? view{2,} purchase
# --------------------------------------------------------------------
PATTERN_COMPILED_SPEC = [
    ("view", 1, None),
    ("click", 0, 1),
    ("view", 2, None),
    ("purchase", 1, None),
]


def _pattern_compiled_oracle() -> str:
    from ..operators.patterns import pattern_oracle_sql

    return pattern_oracle_sql(PATTERN_COMPILED_SPEC)


@register(
    "events_pattern_compiled",
    oracle=_pattern_compiled_oracle(),
    tags=("advanced", "sequence", "window", "pattern"),
    doc="COMPILED quantified row-pattern matching — the general "
    "MATCH_RECOGNIZE subset (any concatenation of quantified "
    "literals) the hand-written events_pattern_quantified is one "
    "instance of. operators/patterns.py compiles the spec "
    "`view+ click? view{2,} purchase` into run-algebra branches AND "
    "generates the DuckDB oracle from the identical branch "
    "structure, so the two engines agree by construction. This spec "
    "exercises the compiler's hard case: skipping the optional "
    "click makes the two view steps ADJACENT, so the absent branch "
    "normalizes to `view{3,} purchase` (quantifier bounds add — the "
    "RLE counterpart of regex concatenation collapsing); branch "
    "type-exclusivity is checked at compile time so anchors can "
    "never double-count. Scale shape: identical to the hand-"
    "compiled query — one user_id exchange carries the run-id "
    "windows, run combine, and run-sequence window; lead() width is "
    "the compile-time max branch length.",
)
def events_pattern_compiled(spark, sf_dir):
    from ..operators.patterns import (
        compile_branches,
        event_runs,
        match_runs,
        pattern_rollup,
    )

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    runs = event_runs(ev)
    matches = match_runs(runs, compile_branches(PATTERN_COMPILED_SPEC))
    return pattern_rollup(matches)


# --------------------------------------------------------------------
# Round-8 second wave: linear-interpolation resampling + Benford audit
# --------------------------------------------------------------------
_LERP_ORACLE = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(floor(value * 1000000) AS BIGINT) AS v_micro,
         0 AS is_grid, event_id
  FROM events
),
users AS (SELECT DISTINCT user_id FROM events),
spine AS (
  SELECT user_id,
         unnest(range({_FF_T0}, {_FF_T0 + _FF_SLOTS * _FF_STEP}, {_FF_STEP}))
           AS ts_s
  FROM users
),
unioned AS (
  SELECT user_id, ts_s, v_micro, is_grid, event_id FROM ev
  UNION ALL
  SELECT user_id, ts_s, NULL, 1, {_FF_GRID_ID} FROM spine
),
swept AS (
  SELECT user_id, ts_s, is_grid,
         last_value(v_micro IGNORE NULLS) OVER wb AS pv,
         last_value(CASE WHEN v_micro IS NOT NULL THEN ts_s END
                    IGNORE NULLS) OVER wb AS pt,
         first_value(v_micro IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN v_micro IS NOT NULL THEN ts_s END
                     IGNORE NULLS) OVER wf AS nt
  FROM unioned
  WINDOW wb AS (PARTITION BY user_id
                ORDER BY ts_s, is_grid, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id
                ORDER BY ts_s, is_grid, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, ts_s AS slot_s,
       CAST(CASE
         WHEN pv IS NULL OR nv IS NULL THEN NULL
         WHEN nt = pt THEN pv
         ELSE pv + (nv - pv) * (ts_s - pt) // (nt - pt)
       END AS BIGINT) AS lerp_micro
FROM swept WHERE is_grid = 1
"""


@register(
    "events_resample_lerp",
    oracle=_LERP_ORACLE,
    tags=("advanced", "temporal", "window"),
    doc="Hourly-grid resampling with LINEAR interpolation — the "
    "companion of events_resample_ffill for continuous signals: "
    "each grid slot takes prev + (next−prev)·(t−t0) div (t1−t0) "
    "between its bracketing observations, exact integer micro "
    "units (trunc-div matches across engines for the negative "
    "deltas too), NULL outside the observed span. Same union-spine "
    "shape as ffill — observations and grid rows share ONE "
    "user-partitioned sort; the backward and forward IGNORE NULLS "
    "sweeps ride the same exchange (no self-join, no as-of probe "
    "per slot), so the cost is one window pass regardless of grid "
    "density.",
)
def events_resample_lerp(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("ts_s"),
        F.floor(F.col("value") * 1000000)
        .cast("bigint")
        .alias("v_micro"),
        F.lit(0).alias("is_grid"),
        "event_id",
    )
    spine = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit(_FF_T0),
                    F.lit(_FF_T0 + (_FF_SLOTS - 1) * _FF_STEP),
                    F.lit(_FF_STEP),
                )
            ).alias("ts_s"),
            F.lit(None).cast("bigint").alias("v_micro"),
            F.lit(1).alias("is_grid"),
            F.lit(_FF_GRID_ID).alias("event_id"),
        )
    )
    unioned = ev.unionByName(spine)
    order = [F.col("ts_s"), F.col("is_grid"), F.col("event_id")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(
        F.col("v_micro").isNotNull(), F.col("ts_s")
    )
    swept = unioned.select(
        "user_id",
        "ts_s",
        "is_grid",
        F.last("v_micro", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_ts, ignorenulls=True).over(wb).alias("pt"),
        F.first("v_micro", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_ts, ignorenulls=True).over(wf).alias("nt"),
    )
    lerp = (
        F.when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .when(F.col("nt") == F.col("pt"), F.col("pv"))
        .otherwise(
            F.col("pv")
            + F.expr("(nv - pv) * (ts_s - pt) div (nt - pt)")
        )
    )
    return swept.filter(F.col("is_grid") == 1).select(
        "user_id",
        F.col("ts_s").alias("slot_s"),
        lerp.cast("bigint").alias("lerp_micro"),
    )


# Benford first-digit expectation, micro units of log10(1 + 1/d)
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}

_BENFORD_CASES = " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
)

_BENFORD_ORACLE = f"""
WITH cents AS (
  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem WHERE l_extendedprice > 0
),
digits AS (
  SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM cents
),
counts AS (
  SELECT d, CAST(count(*) AS BIGINT) AS cnt FROM digits GROUP BY d
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts)
SELECT d AS digit, cnt,
       CAST(cnt * 1000000 // n AS BIGINT) AS obs_ppm,
       CAST(CASE d {_BENFORD_CASES} END AS BIGINT) AS benford_ppm,
       CAST(cnt * 1000000 // n
            - CASE d {_BENFORD_CASES} END AS BIGINT) AS dev_ppm
FROM counts, tot
"""


@register(
    "lineitem_benford_audit",
    oracle=_BENFORD_ORACLE,
    tags=("relational", "agg", "quality"),
    doc="Benford's-law first-digit audit over extended prices — the "
    "standard forensic data-quality screen (natural multiplicative "
    "quantities follow P(d) = log10(1+1/d); synthetic or tampered "
    "columns don't, and TPC-H's uniform price generator is exactly "
    "such a deviation — the audit EXPOSES it, which is the point): "
    "per leading digit of the exact integer cents, observed count, "
    "observed ppm, the Benford expectation (compile-time constants "
    "shared verbatim by both engines) and the signed deviation. "
    "First digit comes from the decimal string of the exact cents, "
    "never floating log10 (whose power-of-ten edges differ in the "
    "last ulp across engines). Scale shape: one scan, 9-row "
    "combine.",
)
def lineitem_benford_audit(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    digits = li.filter(F.col("l_extendedprice") > 0).select(
        F.substring(
            F.floor(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("bigint")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    tot = counts.agg(F.sum("cnt").cast("bigint").alias("n"))
    bppm = F.expr(f"CASE d {_BENFORD_CASES} END").cast("bigint")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("digit"),
            "cnt",
            F.expr("cnt * 1000000 div n").cast("bigint").alias(
                "obs_ppm"
            ),
            bppm.alias("benford_ppm"),
            (F.expr("cnt * 1000000 div n") - bppm)
            .cast("bigint")
            .alias("dev_ppm"),
        )
    )


_COHORT_LTV_ORACLE = """
WITH firsts AS (
  SELECT o_custkey,
         min(o_orderdate) AS f
  FROM orders GROUP BY o_custkey
),
facts AS (
  SELECT strftime(f.f, '%Y-%m') AS cohort_month,
         CAST((date_part('year', o.o_orderdate)
               - date_part('year', f.f)) * 12
              + (date_part('month', o.o_orderdate)
                 - date_part('month', f.f)) AS BIGINT)
           AS months_since,
         o.o_custkey,
         CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
),
cells AS (
  SELECT cohort_month, months_since,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active,
         CAST(sum(cents) AS BIGINT) AS revenue_cents
  FROM facts GROUP BY cohort_month, months_since
),
sized AS (
  SELECT cohort_month,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS cohort_size
  FROM facts GROUP BY cohort_month
)
SELECT c.cohort_month, c.months_since, s.cohort_size, c.n_active,
       c.revenue_cents,
       CAST(sum(c.revenue_cents) OVER (
              PARTITION BY c.cohort_month ORDER BY c.months_since
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_revenue_cents,
       CAST(sum(c.revenue_cents) OVER (
              PARTITION BY c.cohort_month ORDER BY c.months_since
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            * 100 // s.cohort_size AS BIGINT) AS ltv_cents_per_cust
FROM cells c JOIN sized s USING (cohort_month)
"""


@register(
    "orders_cohort_ltv",
    oracle=_COHORT_LTV_ORACLE,
    tags=("advanced", "temporal", "growth", "window"),
    doc="Cohort lifetime-value matrix: customers cohorted by "
    "first-order month, revenue per (cohort, months-since-first) "
    "cell, cumulative cohort revenue, and running LTV per customer "
    "(exact integer cents; the *100 keeps the trunc-div in "
    "hundredths) — the growth-accounting companion of "
    "events_cohort_retention with MONEY instead of activity. Scale "
    "shape: the first-order frame is one map-side-combined min per "
    "customer, the fact join shuffles on the customer key, and the "
    "replay windows run over the |cohorts|x|months| CELL table — "
    "model-sized, never fact-sized.",
)
def orders_cohort_ltv(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("f")
    )
    facts = o.join(firsts, "o_custkey").select(
        F.date_format("f", "yyyy-MM").alias("cohort_month"),
        (
            (F.year("o_orderdate") - F.year("f")) * 12
            + (F.month("o_orderdate") - F.month("f"))
        )
        .cast("bigint")
        .alias("months_since"),
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    cells = facts.groupBy("cohort_month", "months_since").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_active"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )
    sized = facts.groupBy("cohort_month").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("cohort_size")
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("months_since")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.join(F.broadcast(sized), "cohort_month")
        .withColumn(
            "cum_revenue_cents",
            F.sum("revenue_cents").over(w).cast("bigint"),
        )
        .select(
            "cohort_month",
            "months_since",
            "cohort_size",
            "n_active",
            "revenue_cents",
            "cum_revenue_cents",
            F.expr("cum_revenue_cents * 100 div cohort_size")
            .cast("bigint")
            .alias("ltv_cents_per_cust"),
        )
    )


# --------------------------------------------------------------------
# Markov stationary distribution (round 8): integer power iteration
# --------------------------------------------------------------------
MARKOV_ITERS = 8

def _markov_oracle() -> str:
    its = []
    prev = "pi0"
    for t in range(1, MARKOV_ITERS + 1):
        its.append(f"""
pi{t} AS MATERIALIZED (
  SELECT p.to_type AS event_type,
         CAST(sum((x.pi * p.n) // t.tot) AS BIGINT) AS pi
  FROM {prev} x
  JOIN pairs p ON p.from_type = x.event_type
  JOIN totals t ON t.from_type = x.event_type
  GROUP BY p.to_type
)""")
        prev = f"pi{t}"
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
pairs AS MATERIALIZED (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
totals AS MATERIALIZED (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
  FROM pairs GROUP BY from_type
),
pi0 AS (
  SELECT from_type AS event_type,
         CAST(1000000 // (SELECT count(*) FROM totals) AS BIGINT)
           AS pi
  FROM totals
),
{",".join(its)}
SELECT event_type, pi AS pi_micro FROM {prev}
"""


@register(
    "events_markov_stationary",
    oracle=_markov_oracle(),
    tags=("advanced", "sequence", "iterative"),
    doc="Stationary distribution of the per-user event-type Markov "
    "chain (the long-run occupancy the transition matrix implies) "
    "via 8 rounds of integer power iteration: π'_j = "
    "Σ_i (π_i·n_ij) div tot_i — multiply-then-truncate per term, so "
    "both engines iterate bit-identically (the PageRank discipline "
    "applied to a DATA-DERIVED chain instead of the damped web "
    "graph; truncation leaks ≤1 micro per term per round, which is "
    "the documented fixed-point behavior, not drift). Scale shape: "
    "ONE fact pass builds the |types|² transition counts; every "
    "iteration thereafter joins model-sized frames (≤|types| rows) "
    "— the iteration cost is corpus-independent.",
)
def events_markov_stationary(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w))
    pairs = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        .transform(stage)
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n").cast("bigint").alias("tot")
    ).transform(stage)
    n_states = totals.count()  # model state: |event types| with out-edges
    pi = totals.select(
        F.col("from_type").alias("event_type"),
        F.lit(1_000_000 // n_states).cast("bigint").alias("pi"),
    )
    for _ in range(MARKOV_ITERS):
        pi = (
            pi.join(
                pairs, pi["event_type"] == pairs["from_type"]
            )
            .join(totals, "from_type")
            .groupBy(F.col("to_type").alias("next_event_type"))
            .agg(
                F.sum(F.expr("(pi * n) div tot"))
                .cast("bigint")
                .alias("pi")
            )
            .select(
                F.col("next_event_type").alias("event_type"), "pi"
            )
            .transform(stage)
        )
    return pi.select("event_type", F.col("pi").alias("pi_micro"))


# --------------------------------------------------------------------
# Seasonal decomposition (round 9): period-24 trend + hour-of-day
# seasonal indices over the hourly event series
# --------------------------------------------------------------------
SEASON_BEFORE = 11  # centered 24-row trend window: 11 back, 12 fwd
SEASON_AFTER = 12


@register(
    "events_seasonal_hourly",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hb,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
tr AS (
  SELECT event_type, hb, c,
         CAST(sum(c * 1000000) OVER w // 24 AS BIGINT) AS trend_micro,
         count(*) OVER w AS n_w
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hb
               ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)
),
resid AS (
  SELECT event_type, CAST(hour(hb) AS BIGINT) AS hod,
         c * 1000000 - trend_micro AS r_micro
  FROM tr WHERE n_w = 24
)
SELECT event_type, hod,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(sum(r_micro) // count(*) AS BIGINT) AS seasonal_micro
FROM resid GROUP BY event_type, hod
""",
    tags=("advanced", "timeseries", "window"),
    doc="Classical seasonal decomposition over the hourly event "
    "series, per event type: trend = centered 24-row moving mean "
    "(rows 11 back / 12 forward, only FULL windows kept — the "
    "period-even centering every STL implementation applies), "
    "residual = count − trend, seasonal index = per hour-of-day "
    "mean residual. The additive-decomposition building block under "
    "anomaly detection and load forecasting; CUSUM/EWMA in this "
    "tier detect level shifts, this separates the daily cycle from "
    "them. Exact integer arithmetic end to end (micro-unit sums, "
    "truncating division on both engines), so the 24×|types| index "
    "table value-hashes cross-engine. Scale shape: ONE shuffle to "
    "hourly tiles (map-side combined), then windows over per-type "
    "series whose length is the time span — independent of event "
    "volume.",
)
def events_seasonal_hourly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hb")
    ).agg(F.count("*").cast("bigint").alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hb")
        .rowsBetween(-SEASON_BEFORE, SEASON_AFTER)
    )
    tr = (
        hourly.withColumn(
            "sw", F.sum(F.col("c") * F.lit(1000000)).over(w)
        )
        .withColumn("n_w", F.count("*").over(w))
        .withColumn("trend_micro", F.expr("sw div 24"))
        .filter(F.col("n_w") == 24)
    )
    resid = tr.select(
        "event_type",
        F.hour("hb").cast("bigint").alias("hod"),
        (F.col("c") * 1000000 - F.col("trend_micro")).alias("r_micro"),
    )
    return resid.groupBy("event_type", "hod").agg(
        F.count("*").cast("bigint").alias("n_hours"),
        F.expr("sum(r_micro) div count(*)")
        .cast("bigint")
        .alias("seasonal_micro"),
    )


# --------------------------------------------------------------------
# Sequential 2-patterns within a horizon (round 9) — SPADE-style
# sequence support (distinct users), not adjacent-only transitions
# --------------------------------------------------------------------
SEQ_HORIZON = 3  # b counts as following a if within the next 3 events


@register(
    "events_sequence_pairs",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type AS a, ts, event_id,
         [lead(event_type, 1) OVER w,
          lead(event_type, 2) OVER w,
          lead(event_type, 3) OVER w] AS nxt
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
occ AS (
  SELECT user_id, a, b
  FROM seq, unnest(nxt) AS t(b)
  WHERE b IS NOT NULL
)
SELECT a AS first_type, b AS then_type,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM occ GROUP BY a, b
""",
    tags=("advanced", "sequence", "window"),
    doc="Frequent 2-sequences with a bounded horizon — the "
    "sequential-pattern counterpart of the Markov transition "
    "matrix: (a, then b within the user's next 3 events), support "
    "counted both as occurrences and as DISTINCT USERS (the "
    "SPADE/PrefixSpan support definition — a pattern one power "
    "user repeats 1000x is still one user of evidence). Adjacent-"
    "only transitions miss a→x→b sequences; the horizon-3 leads "
    "catch them without the unbounded self-join a full sequence "
    "miner needs. ONE user-keyed window shuffle (three leads share "
    "it), map-side explode, then the pair rollup — the same "
    "exchange discipline as the compiled-pattern tier.",
)
def events_sequence_pairs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("a"),
        F.array(
            *[
                F.lead("event_type", i).over(w)
                for i in range(1, SEQ_HORIZON + 1)
            ]
        ).alias("nxt"),
    )
    occ = seq.select(
        "user_id", "a", F.explode("nxt").alias("b")
    ).filter(F.col("b").isNotNull())
    return occ.groupBy(
        F.col("a").alias("first_type"), F.col("b").alias("then_type")
    ).agg(
        F.count("*").cast("bigint").alias("n_occurrences"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )


# --------------------------------------------------------------------
# Theil–Sen trend (round 9): the robust slope estimator
# --------------------------------------------------------------------
@register(
    "events_theil_sen_trend",
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
slopes AS (
  SELECT a.event_type,
         CAST((b.c - a.c) * 1000000 // (b.day - a.day) AS BIGINT)
           AS slope_micro
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.day > a.day
),
ranked AS (
  SELECT event_type, slope_micro,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope_micro) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM slopes
)
SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
       slope_micro AS theil_sen_micro
FROM ranked WHERE rn = (n + 1) // 2
""",
    tags=("advanced", "timeseries", "robust"),
    doc="Theil–Sen trend over the daily event series, per type: the "
    "LOWER MEDIAN of all pairwise slopes (c_j−c_i)/(day_j−day_i) — "
    "the robust alternative to OLS (one crawler outage day moves a "
    "least-squares slope arbitrarily; it moves the median of "
    "slopes not at all up to a 29% breakdown). Slopes quantized to "
    "exact integer micro-units via truncating division; the median "
    "is picked by POSITION over the value ordering, so ties in "
    "slope value cannot make the result order-dependent. Scale "
    "shape: the pairwise join is over the DAILY TILE table — "
    "O(span²) per type, independent of event volume (the same "
    "bounded-tile argument as the seasonal decomposition); one "
    "combine + one bounded self-join + one per-type window.",
)
def events_theil_sen_trend(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.expr("cast(floor(unix_timestamp(ts) / 86400) as bigint)")
            .alias("day"),
        )
        .agg(F.count("*").cast("bigint").alias("c"))
        .transform(stage)
    )
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day") > F.col("a.day")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.expr("(b.c - a.c) * 1000000 div (b.day - a.day)")
            .cast("bigint")
            .alias("slope_micro"),
        )
    )
    w = Window.partitionBy("event_type")
    ranked = slopes.withColumn(
        "rn", F.row_number().over(w.orderBy("slope_micro"))
    ).withColumn("n", F.count("*").over(w))
    return ranked.filter(F.expr("rn = (n + 1) div 2")).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_pairs"),
        F.col("slope_micro").alias("theil_sen_micro"),
    )


# --------------------------------------------------------------------
# Ordered funnel conversion (round 9): view → click → purchase
# --------------------------------------------------------------------
@register(
    "events_funnel_conversion",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t
  GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase,
       CAST((SELECT count(*) FROM c) * 1000000
            // greatest((SELECT count(*) FROM v), 1) AS BIGINT)
         AS click_rate_ppm,
       CAST((SELECT count(*) FROM p) * 1000000
            // greatest((SELECT count(*) FROM c), 1) AS BIGINT)
         AS purchase_rate_ppm
""",
    tags=("advanced", "sequence", "agg"),
    doc="Ordered funnel: users whose FIRST view precedes their first "
    "subsequent click precedes their first subsequent purchase — "
    "the strict-ordering funnel (a purchase before any view does "
    "NOT count), which set-intersection 'funnels' get wrong. Three "
    "stage passes, each a per-user min over the events filtered by "
    "the previous stage's timestamp — co-partitioned user-keyed "
    "combines + joins, no window, no pattern state; conversion "
    "rates in exact ppm. The aggregate companion to the row-level "
    "pattern tier (events_pattern_compiled finds the sequences, "
    "this prices the drop-off).",
)
def events_funnel_conversion(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    nv = v.agg(F.count("*").cast("bigint").alias("n_view"))
    nc = c.agg(F.count("*").cast("bigint").alias("n_click"))
    np_ = p.agg(F.count("*").cast("bigint").alias("n_purchase"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            F.expr(
                "n_click * 1000000 div greatest(n_view, 1)"
            ).cast("bigint").alias("click_rate_ppm"),
            F.expr(
                "n_purchase * 1000000 div greatest(n_click, 1)"
            ).cast("bigint").alias("purchase_rate_ppm"),
        )
    )


# --------------------------------------------------------------------
# Time-to-convert distribution (round 9): the funnel's latency side
# --------------------------------------------------------------------
@register(
    "events_time_to_convert",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS tv FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT e.user_id,
         CAST(floor(epoch(min(e.ts))) AS BIGINT)
           - CAST(floor(epoch(v.tv)) AS BIGINT) AS delay_s
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > v.tv
  GROUP BY e.user_id, v.tv
)
SELECT CAST(count(*) AS BIGINT) AS n_converters,
       quantile_cont(delay_s, 0.25) AS p25_s,
       quantile_cont(delay_s, 0.50) AS p50_s,
       quantile_cont(delay_s, 0.90) AS p90_s
FROM p
""",
    tags=("advanced", "sequence", "statistics"),
    doc="Conversion latency: for every user whose first view is "
    "followed by a purchase, the delay from first view to FIRST "
    "subsequent purchase, summarized as interpolated p25/p50/p90 "
    "seconds — the latency half of the funnel "
    "(events_funnel_conversion prices the drop-off, this prices the "
    "wait; together they are the product analytics pair). Delays "
    "are exact integer seconds (floor-epoch differences); both "
    "engines use the same WEIGHTED percentile interpolation, so "
    "the floats value-hash. Two user-keyed combines + one 1-row "
    "percentile rollup.",
)
def events_time_to_convert(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id", "tv")
        .agg(F.min("ts").alias("tp"))
        .select(
            (
                F.expr("cast(floor(unix_timestamp(tp)) as bigint)")
                - F.expr("cast(floor(unix_timestamp(tv)) as bigint)")
            ).alias("delay_s")
        )
    )
    return p.agg(
        F.count("*").cast("bigint").alias("n_converters"),
        F.percentile("delay_s", F.lit(0.25)).alias("p25_s"),
        F.percentile("delay_s", F.lit(0.50)).alias("p50_s"),
        F.percentile("delay_s", F.lit(0.90)).alias("p90_s"),
    )
