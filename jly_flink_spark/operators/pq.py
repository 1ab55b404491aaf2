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
- one lazy localCheckpoint per iteration (an unexecuted iterative
  plan otherwise doubles per round — SKILL.md note);
- everything is exact integer arithmetic on the hash-certified
  absmax/floor int8 codes (squared-L2 ≤ 64·254² per pair, no
  overflow), truncating-integer centroid means, smallest-cid
  tiebreaks — so a SQL oracle replays training bit for bit.

Deliberate deviations from production PQ, documented: codebooks are
K=8 per subspace with 2 Lloyd rounds (the determinism-first audit
scale; production uses K=256 and trains to convergence), and the
subvector quantization reuses the per-VECTOR absmax scale instead of
per-subspace scales (keeps the one certified int8 derivation; a
per-subspace scale changes accuracy, not the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .clustering import int8_codes

PQ_M = 4        # subspaces
PQ_K = 8        # centroids per subspace
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
    m: int = PQ_M,
    k: int = PQ_K,
    iterations: int = PQ_ITERS,
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, int]:
    """Train the M sub-codebooks and encode the corpus; returns
    (codebooks, coded, subdim) where codebooks is (sub, cid, carr)
    after the final update and coded is (vec_id, code, pq) with `pq`
    the M-array of assigned sub-centroid ids under the FINAL
    codebooks. Init: subvectors of the k smallest vec_ids."""
    from ..io import ensure_min_parallelism

    dim = len(
        emb.select(vec_col).first()[0]
    )  # one row — model-state probe, not a collect of data
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by {m} subspaces")
    subdim = dim // m

    codes = ensure_min_parallelism(
        emb.select("vec_id", int8_codes(F.col(vec_col)).alias("code"))
    ).localCheckpoint(eager=False)

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
    ).select("c.sub", "c.cid", "c.carr").localCheckpoint(eager=False)

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
            .localCheckpoint(eager=False)
        )

    coded = _encode(codes, cent, m, subdim)
    return cent, coded, subdim


def _encode(
    codes: DataFrame, cent: DataFrame, m: int, subdim: int
) -> DataFrame:
    """(vec_id, code, pq): per-subspace nearest sub-centroid ids via
    the broadcast-codebook expression — zero corpus shuffle."""
    cents1 = cent.agg(
        F.collect_list(F.struct("sub", "cid", "carr")).alias("cents")
    )
    return codes.crossJoin(F.broadcast(cents1)).select(
        "vec_id",
        "code",
        F.array(
            *[
                _sub_argmin(F.col("code"), F.col("cents"), s, subdim)
                for s in range(m)
            ]
        ).alias("pq"),
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
