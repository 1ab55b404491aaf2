"""Semantic deduplication: cluster-bucketed embedding near-dup
removal — the SemDeDup pattern (Abbas et al. 2023, "SemDeDup: Data-
efficient learning at web-scale through semantic deduplication"),
composed from this repo's two existing certified kernels:

- the fully-declarative fixed-point K-means (operators/clustering.py)
  buckets the corpus into K semantic clusters, and
- the quantized-exact cosine (operators/similarity.py `_qdot`) scores
  pairs ONLY within a cluster.

A vector is a semantic duplicate when some same-cluster neighbor with
a SMALLER vec_id scores cosine >= threshold against it (keep-lowest-id
— deterministic and engine-portable, where SemDeDup's keep-farthest-
from-centroid rule depends on float centroid geometry).

Scale shape (the 100-TB argument):
- The global all-pairs problem (operators/similarity.py
  `embedding_near_dup_pairs`, O(n²/blocks)) becomes K independent
  per-cluster problems: pair candidates shrink by ~K× and the
  cluster count K grows with the corpus (K ≈ n / target cluster
  size), holding per-cluster pair work roughly constant. This is the
  reason SemDeDup scales where global near-dup does not.
- The corpus shuffles ONCE per join side, hash-partitioned on cid;
  at serving scale the shuffle disappears entirely because
  `assign_stream` (operators/clustering.py) already routes arriving
  vectors to cluster-partitioned storage at ingest — the self-join
  is then partition-local.
- Pair scoring is the same quantized-exact JVM expression the global
  kernel rescores with; a giant skewed cluster falls back to the
  blocked-GEMM kernel applied per cluster (the two compose — the
  cluster id simply becomes part of the block key).

Bit-exactness: cluster assignment is the unrolled integer K-means
(value-hash certified by `embedding_kmeans_clusters`); cosine is the
floor-quantized 1e8 integer dot/norm sums divided in IEEE double —
both engines agree bit-for-bit, so the whole pipeline (clustering +
pairing + thresholding) is value-hash oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import KM_ITERS, KM_K, kmeans_fixed
from .similarity import _qdot, drop_zero_norm, with_norm

SEMDEDUP_T = 0.3  # same cosine threshold as the global near-dup pass
# Target cluster size: K = max(KM_K, ceil(n / TARGET)), so per-cluster
# pair work stays ~TARGET²/2 as the corpus grows — the SemDeDup paper's
# own scaling rule (K ∝ n). A FIXED K is quadratic: the round-5 scale
# probe measured 13.6× wall at 10× data with K=8; corpus-scaled K
# restores the linear decade.
SEMDEDUP_TARGET = 256


def semantic_dup_flags(
    emb: DataFrame,
    threshold: float = SEMDEDUP_T,
    k: int | None = None,
    iterations: int = KM_ITERS,
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cid, n_close_prior, is_dup): every vector with its
    K-means cluster, the number of same-cluster neighbors with a
    smaller vec_id at cosine >= threshold, and the resulting
    duplicate flag (1 = drop, keep-lowest-id rule).

    k=None sizes K from the corpus (one count scan — model sizing,
    like the IVF n_list choice); the oracle mirrors the same
    greatest/ceil expression, so the dynamic K stays value-hash
    checkable.

    Zero-quantized-norm vectors (cosine undefined) never pair — they
    are retained with n_close_prior = 0, mirroring the global
    kernel's guard."""
    if k is None:
        n = emb.count()
        k = max(KM_K, -(-n // SEMDEDUP_TARGET))
    _, asg = kmeans_fixed(emb, k=k, iterations=iterations, vec_col=vec_col)
    # The slim (vec_id, cid) assignment is referenced three times
    # (both self-join sides + the output join); checkpointing it runs
    # the per-row argmin fold ONCE instead of three times.
    asg = asg.localCheckpoint(eager=False)
    members = (
        asg.join(
            drop_zero_norm(with_norm(emb, vec_col)).select(
                "vec_id", vec_col, "q_norm2"
            ),
            "vec_id",
        )
    )
    a = members.select(
        "cid",
        F.col("vec_id").alias("vec_a"),
        F.col(vec_col).alias("va"),
        F.col("q_norm2").alias("na"),
    )
    b = members.select(
        "cid",
        F.col("vec_id").alias("vec_b"),
        F.col(vec_col).alias("vb"),
        F.col("q_norm2").alias("nb"),
    )
    close = (
        a.join(b, "cid")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_b",
            (
                _qdot(F.col("va"), F.col("vb")).cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                )
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )
    n_prior = close.groupBy(F.col("vec_b").alias("vec_id")).agg(
        F.count("*").cast("bigint").alias("n_close_prior")
    )
    return asg.join(n_prior, "vec_id", "left").select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("cid").cast("bigint").alias("cid"),
        F.coalesce(F.col("n_close_prior"), F.lit(0).cast("bigint")).alias(
            "n_close_prior"
        ),
        F.coalesce(F.col("n_close_prior") > 0, F.lit(False))
        .cast("bigint")
        .alias("is_dup"),
    )
