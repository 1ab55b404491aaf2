"""Product quantization (PQ) over int8-quantized embeddings — the
compression tier below IVF-SQ8: each vector's code splits into M
contiguous subvectors, each subspace trains its own tiny K-means
codebook, and a vector is stored as M sub-centroid ids (M bytes —
a 64× cut below even SQ8). Queries score candidates with ADC
(asymmetric distance computation): a per-query lookup table of
query-subvector ↔ centroid distances, so a candidate's distance is M
table lookups, never a d-dim dot product.

Spark-first shape (mirrors `clustering.kmeans_fixed`'s discipline,
jointly over all M subspaces in ONE loop):

- assignment is a pure per-row EXPRESSION over one broadcast row of
  (sub, cid, carr) structs — the corpus never shuffles for it;
- the codebook update shuffles only map-side-combined
  (sub, cid, dim) partial sums — O(partitions · M · K · d/M) rows;
- one lazy staging cut (io.stage) per iteration (an unexecuted iterative
  plan otherwise doubles per round — SKILL.md note);
- everything is exact integer arithmetic on the hash-certified
  absmax/floor int8 codes (squared-L2 ≤ 64·254² per pair, no
  overflow), truncating-integer centroid means, smallest-cid
  tiebreaks — so a SQL oracle replays training bit for bit.

Deliberate deviations from production PQ, documented: codebooks are
K=16 per subspace with 2 Lloyd rounds (the determinism-first audit
scale; production uses K=256 and trains to convergence — and on the
near-uniform SYNTHETIC embeddings of this harness, PQ's worst case,
ADC ordering is weak however sized: the serving tier therefore ships
with the exact-refine stage and its recall is pinned at the measured
floor), and the subvector quantization reuses the per-VECTOR absmax
scale instead of per-subspace scales (keeps the one certified int8
derivation; a per-subspace scale changes accuracy, not the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..io import stage

from .clustering import int8_codes

PQ_M = 8        # subspaces
PQ_K = 16       # centroids per subspace (audit scale; prod uses 256)
PQ_ITERS = 2    # Lloyd rounds


def _sub_slice(code, m: int, subdim: int):
    return F.slice(code, m * subdim + 1, subdim)


def _sub_argmin(code, cents, m: int, subdim: int):
    """cid of the nearest sub-centroid of subspace ``m`` for this
    row's subvector: transform the broadcast codebook list to
    (dist, cid) structs — each distance computed ONCE (Spark does
    not reliably CSE a repeated subexpression inside a fold; the
    Bloom-probe lesson) — then `array_min`'s lexicographic struct
    ordering is exactly min-dist-then-smallest-cid."""
    sub = _sub_slice(code, m, subdim)
    mine = F.filter(cents, lambda c: c["sub"] == F.lit(m))
    scored = F.transform(
        mine,
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(sub, c["carr"], lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("d"),
            c["cid"].alias("cid"),
        ),
    )
    return F.array_min(scored)["cid"]


def pq_train_encode(
    emb: DataFrame,
    m: "int | None" = None,
    k: "int | None" = None,
    iterations: "int | None" = None,
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, int]:
    """Train the M sub-codebooks and encode the corpus; returns
    (codebooks, coded, subdim) where codebooks is (sub, cid, carr)
    after the final update and coded is (vec_id, code, pq) with `pq`
    the M-array of assigned sub-centroid ids under the FINAL
    codebooks. Init: subvectors of the k smallest vec_ids. Size
    parameters default to the module constants AT CALL TIME (so
    audits can sweep them)."""
    # Arrow quantize (round 14): `int8_codes` is an interpreted
    # aggregate/transform/zip_with chain — with the Lloyd argmin now
    # an Arrow kernel it was the PQ path's dominant remaining stage
    # (92 task-seconds cold at sf0.1). `_int8_coded` is the same
    # formula as ONE numpy kernel with the raw-row fan-out built in
    # (bit-parity pinned by the int8 family's value-hash oracles
    # since r13).
    from .similarity import _int8_coded

    codes = _int8_coded(emb, vec_col).select(
        "vec_id", F.col("codes").alias("code")
    )
    return pq_train_encode_codes(codes, m, k, iterations)


def pq_train_encode_codes(
    codes: DataFrame,
    m: "int | None" = None,
    k: "int | None" = None,
    iterations: "int | None" = None,
) -> tuple[DataFrame, DataFrame, int]:
    """`pq_train_encode` on an ALREADY-BUILT integer code frame
    (vec_id, code array<bigint>) — the shared core, so the raw tier
    (codes straight from `int8_codes`) and the residual tier (codes
    minus the coarse centroid's code) train through the byte-same
    Lloyd loop."""
    m = PQ_M if m is None else m
    k = PQ_K if k is None else k
    iterations = PQ_ITERS if iterations is None else iterations
    dim = len(
        codes.select("code").first()[0]
    )  # one row — model-state probe, not a collect of data
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by {m} subspaces")
    subdim = dim // m

    codes = codes.transform(stage)

    seeds = codes.orderBy("vec_id").limit(k)
    w = Window.orderBy("vec_id")
    seeded = seeds.withColumn(
        "cid", (F.row_number().over(w) - 1).cast("bigint")
    )
    cent = seeded.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("bigint").alias("sub"),
                        F.col("cid"),
                        _sub_slice(F.col("code"), s, subdim).alias(
                            "carr"
                        ),
                    )
                    for s in range(m)
                ]
            )
        ).alias("c")
    ).select("c.sub", "c.cid", "c.carr").transform(stage)

    for _ in range(iterations):
        asg = _encode(codes, cent, m, subdim)
        # update: each (dim, val) carries its assigned sub-cid from
        # the pq array — pure expressions, no join; partial sums
        # combine map-side to M·K·subdim rows
        upd = (
            asg.select(
                "pq", F.posexplode("code").alias("dim", "val")
            )
            .select(
                (F.col("dim") / subdim).cast("bigint").alias("sub"),
                F.element_at(
                    "pq", (F.col("dim") / subdim).cast("int") + 1
                ).alias("cid"),
                (F.col("dim") % subdim).alias("sdim"),
                "val",
            )
            .groupBy("sub", "cid", "sdim")
            .agg(F.sum("val").alias("s"), F.count("*").alias("cnt"))
        )
        cent_flat = cent.select(
            "sub", "cid", F.posexplode("carr").alias("sdim", "cval")
        )
        new_flat = cent_flat.join(
            upd, ["sub", "cid", "sdim"], "left"
        ).select(
            "sub",
            "cid",
            "sdim",
            F.coalesce(F.expr("s div cnt"), F.col("cval")).alias(
                "cval"
            ),
        )
        cent = (
            new_flat.groupBy("sub", "cid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("sdim", "cval"))
                    ),
                    lambda s: s["cval"],
                ).alias("carr")
            )
            .transform(stage)
        )

    coded = _encode(codes, cent, m, subdim)
    return cent, coded, subdim


def _encode(
    codes: DataFrame, cent: DataFrame, m: int, subdim: int
) -> DataFrame:
    """(vec_id, code, pq): per-subspace nearest sub-centroid ids —
    zero corpus shuffle, as before, but the argmin runs as ONE Arrow
    numpy kernel per batch (guide §4.2, the r13 int8-ADC template)
    instead of the interpreted filter/transform/zip_with fold over
    the broadcast codebook structs, which was the dominant compute
    of the PQ family (3 passes × ~25 task-seconds at sf0.1). The
    codebooks are model state (M·K·subdim ints) collected once per
    call. Exact: int64 squared-L2 in numpy reproduces the same
    integers; per-sub rows are sorted by cid so `argmin` (first
    minimum) is min-dist-then-smallest-cid — the `array_min` struct
    order (pinned by test_pq_encode_arrow_matches_expression)."""
    import numpy as np

    rows = cent.collect()
    by_sub: dict[int, list] = {}
    for r in rows:
        by_sub.setdefault(int(r["sub"]), []).append(r)
    subs = []
    for s in range(m):
        sr = sorted(by_sub[s], key=lambda r: r["cid"])
        subs.append(
            (
                np.asarray([r["cid"] for r in sr], dtype=np.int64),
                np.asarray(
                    [list(r["carr"]) for r in sr], dtype=np.int64
                ),
            )
        )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(pq=pd.Series([], dtype="object"))
                continue
            # same loud ragged-input contract as clustering._assign
            try:
                x = np.asarray(
                    [
                        np.asarray(c, dtype=np.int64)
                        for c in pdf["code"]
                    ],
                    dtype=np.int64,
                )
            except (ValueError, TypeError):
                x = None
            if x is None or x.ndim != 2 or x.shape[1] != m * subdim:
                lens = sorted(
                    {
                        "null" if c is None else str(len(c))
                        for c in pdf["code"]
                    }
                )
                raise ValueError(
                    f"ragged embedding lengths {lens} — every code "
                    f"must have dimension {m * subdim}"
                )
            pq = np.empty((len(pdf), m), dtype=np.int64)
            for s, (cids, cmat) in enumerate(subs):
                sub = x[:, s * subdim : (s + 1) * subdim]
                d2 = ((sub[:, None, :] - cmat[None, :, :]) ** 2).sum(
                    axis=2
                )
                pq[:, s] = cids[d2.argmin(axis=1)]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "code": pdf["code"],
                    "pq": list(pq),
                }
            )

    return codes.mapInPandas(
        kernel,
        schema="vec_id long, code array<bigint>, pq array<bigint>",
    )


def adc_topk(
    cent: DataFrame,
    coded: DataFrame,
    m: int,
    subdim: int,
    topk: int = 20,
) -> DataFrame:
    """ADC serving audit against the query = the corpus vector with
    the smallest vec_id: per candidate, the PQ-approximated squared
    L2 (M lookups into the per-query distance table) NEXT TO the
    exact int8 squared L2 — top-``topk`` by (adc, vec_id), so the
    result quantifies PQ's approximation on the very rows it would
    serve."""
    q = coded.orderBy("vec_id").limit(1).select(
        F.col("code").alias("qcode")
    )
    # per-query LUT: (sub, cid) → squared L2 between the query's
    # subvector and that sub-centroid; M·K rows of model state
    lut = cent.crossJoin(F.broadcast(q)).select(
        "sub",
        "cid",
        F.aggregate(
            F.zip_with(
                F.col("carr"),
                F.slice(
                    F.col("qcode"),
                    (F.col("sub") * subdim + 1).cast("int"),
                    subdim,
                ),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("d"),
    )
    lut1 = lut.agg(
        F.collect_list(F.struct("sub", "cid", "d")).alias("lut")
    )
    scored = (
        coded.crossJoin(F.broadcast(lut1))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.aggregate(
                F.col("lut"),
                F.lit(0).cast("bigint"),
                lambda acc, e: acc
                + F.when(
                    e["cid"]
                    == F.element_at(
                        "pq", (e["sub"] + 1).cast("int")
                    ),
                    e["d"],
                ).otherwise(F.lit(0).cast("bigint")),
            ).alias("adc_dist"),
            F.aggregate(
                F.zip_with(
                    F.col("code"),
                    F.col("qcode"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("exact_dist"),
        )
    )
    return scored.orderBy("adc_dist", "vec_id").limit(topk)


# ---------------------------------------------------------------------------
# IVF-PQ: the production ANN composition — PQ codes stored inside the
# partition-pruned IVF lists (FAISS IVFx,PQy without residual
# encoding; the documented deviation keeps the one certified int8
# derivation and lets the SQL oracle replay the whole build)
# ---------------------------------------------------------------------------


def pq_codebook_state(cent: DataFrame) -> list:
    """Collect the trained sub-codebooks as driver model state —
    (sub, cid, carr) tuples, M·K·subdim ints — the train-offline/
    serve-online boundary (the PQ analog of `extract_centroids`)."""
    return [
        (int(r["sub"]), int(r["cid"]), [int(v) for v in r["carr"]])
        for r in cent.collect()
    ]


def persist_ivf_pq(
    emb: DataFrame,
    path: str,
    coarse_cents: list,
    vec_col: str = "embedding",
) -> tuple[list, int]:
    """Build the IVF-PQ serving layout: train the global sub-codebooks
    (`pq_train_encode` — one joint Lloyd loop), coarse-assign every
    vector to its IVF list on the FLOAT vector (the same quantizer as
    every other layout builder), and persist (vec_id, pq, list_id)
    hive-partitioned by list_id. Returns (pq_codebook_state, subdim)
    — the model state a server needs. The stored row is M small ints:
    the compression floor below IVF-SQ8 (M bytes vs d bytes), which
    at 100 TB is the difference between an index that fits hot
    storage and one that doesn't."""
    from ..io import write_partitioned
    from .similarity import _assign_udf

    cent, coded, subdim = pq_train_encode(emb, vec_col=vec_col)
    assign = _assign_udf(emb.sparkSession, coarse_cents)
    rows = coded.join(
        emb.select("vec_id", vec_col), "vec_id"
    ).select(
        "vec_id",
        "pq",
        # the full int8 codes ride in their own parquet COLUMN: the
        # pure-ADC tier never reads it (column pruning keeps its
        # scan M bytes/vector), the refine tier reads it only for
        # its pruned lists — one layout, two serving costs
        "code",
        assign(F.col(vec_col)).alias("list_id"),
    )
    write_partitioned(rows, path, ["list_id"])
    return pq_codebook_state(cent), subdim


def _int8_codes_np(v) -> "object":
    """numpy replica of `clustering.int8_codes` (absmax/floor) — the
    driver-side query encoding every serving tier shares."""
    import numpy as np

    x = np.asarray(v, dtype="float64")
    scale = max(float(np.abs(x).max()), 1e-12)
    return np.floor(x * 127.0 / scale).astype("int64")


def _lut_from_codes(
    codes, pq_state: list, m: int, k: int, subdim: int
) -> list:
    """Flattened ADC lookup table for an integer code vector: entry
    [sub·K + cid] = exact integer squared L2 between the code's
    subvector and that sub-centroid."""
    import numpy as np

    lut = [0] * (m * k)
    for sub, cid, carr in pq_state:
        qsub = codes[sub * subdim : (sub + 1) * subdim]
        diff = qsub - np.asarray(carr, dtype="int64")
        lut[sub * k + cid] = int((diff * diff).sum())
    return lut


def _query_lut(
    v, pq_state: list, m: int, k: int, subdim: int
) -> list:
    """Per-query flattened ADC lookup table: entry [sub·K + cid] =
    exact integer squared L2 between the query's int8 SUBvector and
    that sub-centroid — the same `int8_codes` absmax/floor formula
    as the corpus side (symmetric code-vs-code distance)."""
    return _lut_from_codes(_int8_codes_np(v), pq_state, m, k, subdim)


def serve_ann_topk_ivf_pq(
    spark,
    queries_df: DataFrame,
    layout_path: str,
    coarse_cents: list,
    pq_state: list,
    subdim: int,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k ADC neighbors for a request batch against the persisted
    IVF-PQ layout: the scan is PARTITION-PRUNED to the batch's probe
    lists (same `_select_probe_lists` arithmetic as every other IVF
    tier), the broadcast probe frame carries each query's M·K-entry
    LUT, and a candidate's distance is M lookups into it — never a
    d-dimensional product. What shuffles is the per-query top-k
    partials below the one exchange. Probe-list selection, coarse
    assignment and the LUT arithmetic each mirror one SQL expression
    in the `ann_ivf_pq_adc` oracle, so the PRUNED result value-hashes
    cross-engine."""
    import math

    import numpy as np

    from pyspark.sql import Window

    from .similarity import (
        QUANT,
        _centroid_state,
        _pruned_layout,
        _select_probe_lists,
    )

    m = PQ_M
    kk = PQ_K
    cents_state = _centroid_state(coarse_cents)
    rows = []
    for r in queries_df.select("vec_id", vec_col).collect():
        v = np.array(list(r[vec_col]), dtype="float64")
        vq = max(int(np.floor(v * v * QUANT).astype("int64").sum()), 1)
        lut = _query_lut(v, pq_state, m, kk, subdim)
        for cid in _select_probe_lists(v, vq, cents_state, n_probe):
            rows.append((int(r["vec_id"]), int(cid), lut))
    probes = spark.createDataFrame(
        rows, "query_id long, list_id int, lut array<long>"
    )
    corpus = _pruned_layout(
        spark,
        layout_path,
        probes,
        {"vec_id": "cand_id", "pq": "cand_pq"},
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.element_at(
            F.col("lut"),
            (
                i * kk
                + F.element_at(F.col("cand_pq"), (i + 1).cast("int"))
                + 1
            ).cast("int"),
        ),
    )
    scored = (
        corpus.join(F.broadcast(probes), "list_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", adc.alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "adc_dist", "rnk")
    )


PQ_REFINE_R = 200  # ADC shortlist depth ahead of the exact rescore


def serve_ann_topk_ivf_pq_refine(
    spark,
    queries_df: DataFrame,
    layout_path: str,
    coarse_cents: list,
    pq_state: list,
    subdim: int,
    k: int = 5,
    n_probe: int = 4,
    shortlist: int = PQ_REFINE_R,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ with EXACT REFINE (the FAISS `refine` stage — how
    production serves PQ): ADC ranks the pruned lists' candidates
    cheaply (M lookups each), the top-``shortlist`` per query are
    re-scored with the exact int8 squared L2 on the full codes, and
    the final top-k follows the exact order. ADC's quantization
    error (severe at the audit-scale M=4, K=8 codebooks — measured
    recall@5 ≈ 0.1 for pure ADC) only costs recall when a true
    neighbor falls OUTSIDE the shortlist, so the refine recovers
    nearly all of it at shortlist/corpus of the compute. The exact
    codes are read ONLY for pruned lists (columnar layout — the
    pure-ADC tier's scan never touches that column)."""
    import numpy as np

    from pyspark.sql import Window

    from .similarity import (
        QUANT,
        _centroid_state,
        _pruned_layout,
        _select_probe_lists,
    )

    m, kk = PQ_M, PQ_K
    cents_state = _centroid_state(coarse_cents)
    rows = []
    for r in queries_df.select("vec_id", vec_col).collect():
        v = np.array(list(r[vec_col]), dtype="float64")
        vq = max(int(np.floor(v * v * QUANT).astype("int64").sum()), 1)
        scale = max(float(np.abs(v).max()), 1e-12)
        qcodes = [
            int(x) for x in np.floor(v * 127.0 / scale).astype("int64")
        ]
        lut = _query_lut(v, pq_state, m, kk, subdim)
        for cid in _select_probe_lists(v, vq, cents_state, n_probe):
            rows.append((int(r["vec_id"]), int(cid), lut, qcodes))
    probes = spark.createDataFrame(
        rows,
        "query_id long, list_id int, lut array<long>, "
        "qcode array<long>",
    )
    corpus = _pruned_layout(
        spark,
        layout_path,
        probes,
        {"vec_id": "cand_id", "pq": "cand_pq", "code": "cand_code"},
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.element_at(
            F.col("lut"),
            (
                i * kk
                + F.element_at(F.col("cand_pq"), (i + 1).cast("int"))
                + 1
            ).cast("int"),
        ),
    )
    scored = (
        corpus.join(F.broadcast(probes), "list_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            "cand_code",
            "qcode",
            adc.alias("adc_dist"),
        )
    )
    w_short = Window.partitionBy("query_id").orderBy(
        "adc_dist", "cand_id"
    )
    short = scored.withColumn(
        "srnk", F.row_number().over(w_short)
    ).filter(F.col("srnk") <= shortlist)
    exact = F.aggregate(
        F.zip_with(
            F.col("qcode"),
            F.col("cand_code"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    refined = short.select(
        "query_id",
        "cand_id",
        "adc_dist",
        exact.alias("exact_dist"),
    )
    w = Window.partitionBy("query_id").orderBy("exact_dist", "cand_id")
    return (
        refined.withColumn(
            "rnk", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "adc_dist", "exact_dist", "rnk")
    )


# ---------------------------------------------------------------------------
# Residual-encoded IVF-PQ (FAISS IVFx,PQy proper): PQ trains on the
# residual code − coarse-centroid code, so the sub-codebooks spend
# their K centroids on the WITHIN-list spread instead of re-encoding
# the coarse offset each list already captured. Same exact-integer
# arithmetic (residuals are bigint subtractions of two int8-coded
# vectors, range ±254), so the SQL oracle replays the whole build.
# ---------------------------------------------------------------------------


def centroid_codes(coarse_cents: list) -> list:
    """int8 codes of the coarse centroids under each centroid's OWN
    absmax scale — the `int8_codes` formula applied to model state
    (n_list tiny vectors, driver-side). Returns [(list_id, [code])]."""
    return [
        (int(cid), [int(x) for x in _int8_codes_np(v)])
        for cid, v in coarse_cents
    ]


def persist_ivf_pq_residual(
    emb: DataFrame,
    path: str,
    coarse_cents: list,
    vec_col: str = "embedding",
) -> tuple[list, int]:
    """Build the residual IVF-PQ serving layout: coarse-assign every
    vector (same float quantizer as every other layout builder),
    subtract the assigned centroid's int8 code from the vector's int8
    code — a pure `zip_with` against one broadcast n_list-row frame,
    no corpus shuffle — train the M sub-codebooks on those residual
    codes (`pq_train_encode_codes`, the byte-same Lloyd loop as the
    raw tier), and persist (vec_id, pq, code, list_id)
    hive-partitioned by list_id. `pq` indexes RESIDUAL sub-centroids;
    `code` keeps the full int8 codes in their own column for the
    refine tier (the ADC scan column-prunes it away). Returns
    (pq_codebook_state, subdim)."""
    from ..io import ensure_min_parallelism, write_partitioned
    from .similarity import _assign_udf

    spark = emb.sparkSession
    assign = _assign_udf(spark, coarse_cents)
    base = ensure_min_parallelism(
        emb.select(
            "vec_id",
            int8_codes(F.col(vec_col)).alias("code"),
            assign(F.col(vec_col)).alias("list_id"),
        )
    ).transform(stage)
    ccodes = spark.createDataFrame(
        centroid_codes(coarse_cents),
        "list_id int, ccode array<bigint>",
    )
    resid = base.join(F.broadcast(ccodes), "list_id").select(
        "vec_id",
        "list_id",
        "code",
        F.zip_with("code", "ccode", lambda a, b: a - b).alias("rcode"),
    )
    cent, coded, subdim = pq_train_encode_codes(
        resid.select("vec_id", F.col("rcode").alias("code"))
    )
    rows = resid.select("vec_id", "list_id", "code").join(
        coded.select("vec_id", "pq"), "vec_id"
    )
    write_partitioned(rows, path, ["list_id"])
    return pq_codebook_state(cent), subdim


def serve_ann_topk_ivf_pq_residual(
    spark,
    queries_df: DataFrame,
    layout_path: str,
    coarse_cents: list,
    pq_state: list,
    subdim: int,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k ADC neighbors against the RESIDUAL IVF-PQ layout. The
    one structural difference from `serve_ann_topk_ivf_pq`: the ADC
    lookup table is per-(query, probe-list) — the query's residual
    against THAT list's centroid code feeds the table — so the
    broadcast probe frame carries n_probe tables per query
    (n_probe·M·K ints of model state) and a candidate's distance is
    still M lookups, resolved within its own list. Approximates
    ||q_code − x_code||² = ||(q−c) − (x−c)||² with the quantizer
    applied to the small within-list residual instead of the whole
    vector — the standard FAISS composition, and the reason the same
    K=16 codebooks rank materially better than the raw-ADC tier
    (recall floors pinned side by side in tests/test_ivf_pq.py)."""
    import numpy as np

    from pyspark.sql import Window

    from .similarity import (
        QUANT,
        _centroid_state,
        _pruned_layout,
        _select_probe_lists,
    )

    m, kk = PQ_M, PQ_K
    cents_state = _centroid_state(coarse_cents)
    ccodes = {cid: np.asarray(c, dtype="int64") for cid, c in centroid_codes(coarse_cents)}
    rows = []
    for r in queries_df.select("vec_id", vec_col).collect():
        v = np.array(list(r[vec_col]), dtype="float64")
        vq = max(int(np.floor(v * v * QUANT).astype("int64").sum()), 1)
        qcodes = _int8_codes_np(v)
        for cid in _select_probe_lists(v, vq, cents_state, n_probe):
            rq = qcodes - ccodes[int(cid)]
            lut = _lut_from_codes(rq, pq_state, m, kk, subdim)
            rows.append((int(r["vec_id"]), int(cid), lut))
    probes = spark.createDataFrame(
        rows, "query_id long, list_id int, lut array<long>"
    )
    corpus = _pruned_layout(
        spark,
        layout_path,
        probes,
        {"vec_id": "cand_id", "pq": "cand_pq"},
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.element_at(
            F.col("lut"),
            (
                i * kk
                + F.element_at(F.col("cand_pq"), (i + 1).cast("int"))
                + 1
            ).cast("int"),
        ),
    )
    scored = (
        corpus.join(F.broadcast(probes), "list_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", adc.alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "adc_dist", "rnk")
    )
