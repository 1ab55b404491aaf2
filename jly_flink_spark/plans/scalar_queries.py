"""Scalar function surface (SURVEY.md §2.2): string, date/time, math,
conditional, JSON, and array functions — the library the reference
only touches via JSON extraction + string concat (StartJob.java:
122-146, AdbSink.java:89), widened to the full pyspark.sql.functions
coverage and verified cell-exact against DuckDB.

Dialect mapping is per-function (e.g. get_json_object ↔
json_extract_string, split ↔ string_split); every output column is
identically aliased on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from .registry import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "scalar_string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       length(p_name) AS name_len,
       substring(p_name, 1, 5) AS name_prefix,
       replace(p_type, ' ', '_') AS type_snake,
       trim(concat('  ', p_name, '  ')) AS name_trimmed,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       reverse(p_brand) AS brand_rev,
       instr(p_name, 'a') AS first_a,
       left(p_type, 3) AS type3,
       repeat(p_brand, 2) AS brand2
FROM part
""",
    tags=("scalar", "string"),
    doc="String function battery: case, length, substring, replace, "
    "trim, pad, reverse, position, left, repeat.",
)
def scalar_string_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.left(F.col("p_type"), F.lit(3)).alias("type3"),
        F.repeat(F.col("p_brand"), 2).alias("brand2"),
    )


@register(
    "scalar_regexp_split",
    oracle="""
SELECT doc_id,
       regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
       regexp_replace(text, '[0-9]+', '#', 'g') AS no_digits,
       array_to_string(string_split(lang, '-'), '|') AS lang_parts,
       CAST(regexp_matches(text, 'the') AS INTEGER) AS has_the
FROM documents
""",
    tags=("scalar", "string", "regexp"),
    doc="Regex extract/replace/match + split (split ↔ string_split; "
    "rlike ↔ regexp_matches). The split result is re-joined with '|' "
    "on BOTH engines: raw array columns are not hashable by the "
    "driver's pandas canonicalizer. NOTE: DuckDB regexp_replace "
    "replaces only the FIRST match without the 'g' flag where Spark "
    "always replaces all — latent on corpora with ≤1 digit run per "
    "text, caught by the 10× sweep (round 5).",
)
def scalar_regexp_split(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", r"[0-9]+", "#").alias("no_digits"),
        F.array_join(F.split("lang", "-"), "|").alias("lang_parts"),
        F.col("text").rlike("the").cast("int").alias("has_the"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
SELECT o_orderkey,
       extract(year FROM o_orderdate) AS order_year,
       extract(month FROM o_orderdate) AS order_month,
       extract(day FROM o_orderdate) AS order_day,
       extract(hour FROM o_orderdate) AS order_hour,
       quarter(o_orderdate) AS order_quarter,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(o_orderdate AS DATE) AS order_date,
       epoch_ms(o_orderdate) AS epoch_millis
FROM orders
""",
    tags=("scalar", "date"),
    doc="Date/time extraction, truncation, casts, epoch conversion "
    "(the reference's epoch-ms↔timestamp semantics, StartJob.java:161).",
)
def scalar_date_funcs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.hour("o_orderdate").cast("long").alias("order_hour"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.unix_millis(F.col("o_orderdate")).alias("epoch_millis"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
SELECT s_suppkey,
       abs(s_acctbal - 5000) AS dist_from_5k,
       CAST(floor(s_acctbal) AS BIGINT) AS bal_floor,
       CAST(ceil(s_acctbal) AS BIGINT) AS bal_ceil,
       sqrt(abs(s_acctbal)) AS bal_sqrt,
       s_acctbal * s_acctbal AS bal_sq,
       s_suppkey % 7 AS key_mod,
       CAST(sign(s_acctbal - 5000) AS INTEGER) AS bal_sign,
       greatest(s_acctbal, 1000.0) AS bal_floor1k,
       least(s_acctbal, 9000.0) AS bal_cap9k,
       1.0 / (s_acctbal + 1) AS bal_inv
FROM supplier
""",
    tags=("scalar", "math"),
    doc="Math battery: abs/floor/ceil/sqrt/mod/sign/greatest/least and "
    "arithmetic — IEEE-deterministic ops only; transcendentals (libm-"
    "dependent, 1-ulp engine differences) live in scalar_transcendental.",
)
def scalar_math_funcs(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.abs(bal - 5000).alias("dist_from_5k"),
        F.floor(bal).alias("bal_floor"),
        F.ceil(bal).alias("bal_ceil"),
        F.sqrt(F.abs(bal)).alias("bal_sqrt"),
        (bal * bal).alias("bal_sq"),
        (F.col("s_suppkey") % 7).alias("key_mod"),
        F.signum(bal - 5000).cast("int").alias("bal_sign"),
        F.greatest(bal, F.lit(1000.0)).alias("bal_floor1k"),
        F.least(bal, F.lit(9000.0)).alias("bal_cap9k"),
        (F.lit(1.0) / (bal + 1)).alias("bal_inv"),
    )


# Fixed-point scale for transcendental outputs. libm exp/ln/pow/sin
# differ by ≤1 ulp (~1e-16 relative) between the JVM and DuckDB, so raw
# doubles are not value-hashable; floor(x * 1e6) buckets are — a flip
# needs a value within 1 ulp of a 1e-6 boundary (probability ~1e-10 per
# cell; only EXACT boundary values like sin(0)=0 land on one, and those
# are computed bit-identically by both engines). Largest magnitude here
# is pow(|bal|, 1.5) ≈ 1e6, so quantized values stay ≤ ~1e12 « 2^63.
TRANS_QUANT = 10**6


@register(
    "scalar_transcendental",
    oracle=f"""
SELECT s_suppkey,
       CAST(floor(ln(abs(s_acctbal) + 1) * {TRANS_QUANT}) AS BIGINT) AS bal_ln_q,
       CAST(floor(exp(s_nationkey / 10.0) * {TRANS_QUANT}) AS BIGINT) AS nk_exp_q,
       CAST(floor(pow(abs(s_acctbal), 1.5) * {TRANS_QUANT}) AS BIGINT) AS bal_pow_q,
       CAST(floor(sin(CAST(s_nationkey AS DOUBLE)) * {TRANS_QUANT}) AS BIGINT) AS nk_sin_q,
       CAST(floor(cos(CAST(s_nationkey AS DOUBLE)) * {TRANS_QUANT}) AS BIGINT) AS nk_cos_q,
       CAST(floor(atan2(CAST(s_nationkey AS DOUBLE), 1.0) * {TRANS_QUANT}) AS BIGINT) AS nk_atan2_q
FROM supplier
""",
    tags=("scalar", "math"),
    doc="Transcendental functions (ln/exp/pow/sin/cos/atan2), value-"
    "checked via the fixed-point floor(x*1e6) discipline (TRANS_QUANT) "
    "— the same quantization the similarity/JL queries use — instead "
    "of the old rows-only escape hatch (round-9 verdict task 8).",
)
def scalar_transcendental(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    bal = F.abs(F.col("s_acctbal"))
    nk = F.col("s_nationkey").cast("double")
    q = F.lit(TRANS_QUANT)

    def _q(col):
        return F.floor(col * q).cast("long")

    return s.select(
        "s_suppkey",
        _q(F.log(bal + 1)).alias("bal_ln_q"),
        _q(F.exp(nk / 10)).alias("nk_exp_q"),
        _q(F.pow(bal, 1.5)).alias("bal_pow_q"),
        _q(F.sin(nk)).alias("nk_sin_q"),
        _q(F.cos(nk)).alias("nk_cos_q"),
        _q(F.atan2(nk, F.lit(1.0))).alias("nk_atan2_q"),
    )


@register(
    "scalar_conditional",
    oracle="""
SELECT o_orderkey,
       CASE o_orderstatus WHEN 'F' THEN 'finished'
                          WHEN 'O' THEN 'open'
                          ELSE 'other' END AS status_label,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       coalesce(NULLIF(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio,
       CAST(o_totalprice > 200000 AS INTEGER) AS is_big
FROM orders
""",
    tags=("scalar", "conditional"),
    doc="CASE / NULLIF / COALESCE / boolean-to-int conditionals.",
)
def scalar_conditional(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_label"),
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")),
            F.lit("URGENT!"),
        ).alias("prio"),
        (F.col("o_totalprice") > 200000).cast("int").alias("is_big"),
    )


@register(
    "scalar_json_funcs",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_field,
       CAST(json_valid(props) AS INTEGER) AS is_valid_json
FROM events
""",
    tags=("scalar", "json"),
    doc="JSON field extraction over events.props — the same primitive "
    "the reference's envelope parsing uses (StartJob.java:122-146: "
    "get_json_object ↔ json_extract_string).",
)
def scalar_json_funcs(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
        F.when(
            F.from_json(F.col("props"), "map<string,string>").isNotNull(),
            F.lit(1),
        )
        .otherwise(0)
        .alias("is_valid_json"),
    )


@register(
    "scalar_array_funcs",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       embedding[1] AS first_val,
       embedding[64] AS last_val,
       array_to_string(
         list_transform(embedding[1:4],
                        x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000)
                                       AS BIGINT) AS VARCHAR)),
         ',') AS head4,
       list_contains(embedding, 0.0) AS has_zero
FROM embeddings
""",
    tags=("scalar", "array"),
    doc="Array primitives over the embedding column: size, index, "
    "slice, contains (1-indexed on both engines). The slice is "
    "serialized element-wise via floor(x*1000) — bit-deterministic "
    "double arithmetic, so the string is engine-independent, unlike "
    "raw float formatting — because the driver's pandas canonicalizer "
    "cannot hash raw array columns.",
)
def scalar_array_funcs(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.element_at("embedding", 64).alias("last_val"),
        F.array_join(
            F.transform(
                F.slice("embedding", 1, 4),
                lambda x: F.floor(x.cast("double") * 1000).cast("string"),
            ),
            ",",
        ).alias("head4"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias(
            "has_zero"
        ),
    )


@register(
    "scalar_hash_funcs",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS h_md5,
       sha256(c_name) AS h_sha256,
       md5(c_name || '|' || CAST(c_nationkey AS VARCHAR))
         AS h_composite,
       substring(md5(c_name), 1, 8) AS h_prefix
FROM customer
WHERE c_custkey <= 500
""",
    tags=("scalar", "hash"),
    doc="Cryptographic-hash scalar surface: md5 and sha256 digests, "
    "a composite-key digest (the canonical change-detection / "
    "surrogate-key pattern), and a digest prefix — hex output is "
    "identical across engines, which is exactly why every "
    "deterministic operator in this repo (dedup, sampling, splits, "
    "sketches) builds on md5 rather than engine-native hash(). "
    "Pure per-row codegen, filter pushed to the scan.",
)
def scalar_hash_funcs(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 500
    )
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("h_md5"),
        F.sha2(F.col("c_name"), 256).alias("h_sha256"),
        F.md5(
            F.concat_ws(
                "|", F.col("c_name"), F.col("c_nationkey").cast("string")
            )
        ).alias("h_composite"),
        F.substring(F.md5(F.col("c_name")), 1, 8).alias("h_prefix"),
    )


@register(
    "scalar_padding_funcs",
    oracle="""
SELECT c_custkey,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
       rpad(c_mktsegment, 12, '.') AS seg_padded,
       repeat('-', CAST(c_nationkey % 5 AS INT) + 1) AS rule,
       reverse(c_name) AS name_rev,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated
FROM customer
WHERE c_custkey <= 500
""",
    tags=("scalar", "string"),
    doc="String shaping scalar surface: zero-padded fixed-width keys "
    "(lpad — the surrogate/sort-key formatter), rpad, repeat with a "
    "computed count, reverse, and translate — identical semantics "
    "on both engines. Pure per-row codegen, filter pushed to the "
    "scan.",
)
def scalar_padding_funcs(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 500
    )
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias(
            "key_padded"
        ),
        F.rpad(F.col("c_mktsegment"), 12, ".").alias("seg_padded"),
        F.repeat(
            F.lit("-"), (F.col("c_nationkey") % 5).cast("int") + 1
        ).alias("rule"),
        F.reverse(F.col("c_name")).alias("name_rev"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias(
            "seg_translated"
        ),
    )
