"""Semantic deduplication: cluster-bucketed embedding near-dup
removal — the SemDeDup pattern (Abbas et al. 2023, "SemDeDup: Data-
efficient learning at web-scale through semantic deduplication"),
composed from this repo's two existing certified kernels:

- the fully-declarative fixed-point K-means (operators/clustering.py)
  buckets the corpus into K semantic clusters, and
- the two-stage near-dup kernel (operators/similarity.py: f32 GEMM
  prefilter + exact quantized rescore) scores pairs ONLY within a
  cluster.

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
- The corpus shuffles ONCE, hash-partitioned on cid into one
  applyInPandas task per cluster; at serving scale even that shuffle
  disappears because `assign_stream` (operators/clustering.py)
  already routes arriving vectors to cluster-partitioned storage at
  ingest — the kernel is then partition-local.
- Pair scoring is the intra-group case of the global blocked-GEMM
  kernel (vectorized BLAS prefilter, exact int64 rescore of
  candidates only — identical arithmetic to the SQL oracle), with
  the same a-chunking so even a pathologically giant cluster bounds
  its live score matrix; a cluster too big for one task composes
  with the block-pair split (cluster id joins the block key).

Bit-exactness: cluster assignment is the unrolled integer K-means
(value-hash certified by `embedding_kmeans_clusters`); cosine is the
floor-quantized 1e8 integer dot/norm sums divided in IEEE double —
both engines agree bit-for-bit, so the whole pipeline (clustering +
pairing + thresholding) is value-hash oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import stage

from .clustering import KM_ITERS, KM_K, kmeans_fixed

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
    max_task_rows: int = 32768,
) -> DataFrame:
    """(vec_id, cid, n_close_prior, is_dup): every vector with its
    K-means cluster, the number of same-cluster neighbors with a
    smaller vec_id at cosine >= threshold, and the resulting
    duplicate flag (1 = drop, keep-lowest-id rule).

    k=None sizes K from the corpus (one count scan — model sizing,
    like the IVF n_list choice); the oracle mirrors the same
    greatest/ceil expression, so the dynamic K stays value-hash
    checkable.

    Skew guard: a cluster larger than `max_task_rows` (clustering is
    not balance-guaranteed; a degenerate corpus can put everything in
    one cluster) splits into the global kernel's block-pair scheme
    WITHIN the cluster — B_c = ceil(n_c / max_task_rows) blocks per
    cluster, every unordered pair landing in exactly one
    (cid, bi, bj) task. The per-cluster block count is a COLUMN
    (window count + per-row explode), never driver state, so the
    guard holds at millions of clusters. Healthy clusters have
    B_c = 1 and pay nothing but the count window.

    Zero-quantized-norm vectors (cosine undefined) never pair — they
    are retained with n_close_prior = 0, mirroring the global
    kernel's guard."""
    import numpy as np
    import pandas as pd

    from .similarity import (
        MIN_HEALTHY_QN,
        QUANT,
        prefilter_margin,
    )

    if k is None:
        n = emb.count()
        k = max(KM_K, -(-n // SEMDEDUP_TARGET))
    _, asg = kmeans_fixed(emb, k=k, iterations=iterations, vec_col=vec_col)
    # The slim (vec_id, cid) assignment is referenced twice (kernel
    # input + the output join); checkpointing it runs the per-row
    # argmin ONCE.
    asg = asg.transform(stage)
    members = asg.join(emb.select("vec_id", vec_col), "vec_id")

    _empty = lambda: pd.DataFrame({"vec_b": pd.Series(dtype="int64")})  # noqa: E731

    def close_vec_bs(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        """One task per (cluster, block-pair): emit vec_b once per
        close pair — the blocked near-dup kernel
        (operators/similarity.py `embedding_near_dup_pairs`)
        restricted to a cluster: f32 GEMM prefilter with the
        dimension-scaled margin, exact quantized rescore of
        candidates only, zero-quantized-norm vectors dropped (cosine
        undefined). bi == bj scores a<b pairs within the block;
        bi < bj scores every cross-block pair (each unordered pair
        lands in exactly one group)."""
        bi, bj = int(key[1]), int(key[2])
        ids = pdf["vec_id"].to_numpy(dtype="int64")
        if len(ids) < 2:
            return _empty()
        # Ragged embeddings (inconsistent lengths within one cluster)
        # are malformed input — fail loudly with a clear message
        # rather than silently reporting zero duplicates for the task
        # (older numpy returned a 1-d object array here; newer numpy
        # raises its own inhomogeneous-shape error).
        try:
            mat = np.array(list(pdf[vec_col]), dtype="float64")
        except ValueError:
            mat = None
        if mat is None or mat.ndim != 2:
            lens = sorted(
                {
                    "null" if v is None else str(len(v))
                    for v in pdf[vec_col]
                }
            )
            raise ValueError(
                f"ragged embedding lengths {lens} within cluster "
                f"{int(key[0])} — {vec_col} must be fixed-dimension"
            )
        qn = np.floor(mat * mat * QUANT).astype("int64").sum(axis=1)
        valid = qn > 0
        if not valid.all():
            pdf = pdf[valid]
            ids, mat, qn = ids[valid], mat[valid], qn[valid]
        if len(ids) < 2:
            return _empty()
        sq = np.sqrt(qn.astype("float64"))
        fnorm = np.sqrt((mat * mat).sum(axis=1))
        unit = (mat / fnorm[:, None]).astype("float32")
        cut = np.float32(threshold - prefilter_margin(int(mat.shape[1])))
        unhealthy = qn < MIN_HEALTHY_QN
        if bi == bj:
            a_sel = b_sel = np.arange(len(ids))
        else:
            blks = pdf["blk"].to_numpy(dtype="int64")
            a_sel = np.nonzero(blks == bi)[0]
            b_sel = np.nonzero(blks == bj)[0]
        a_ids, b_ids = ids[a_sel], ids[b_sel]
        a_mat, b_mat = mat[a_sel], mat[b_sel]
        a_sq, b_sq = sq[a_sel], sq[b_sel]
        a_unit, b_unit = unit[a_sel], unit[b_sel]
        a_unh, b_unh = unhealthy[a_sel], unhealthy[b_sel]
        if len(a_ids) == 0 or len(b_ids) == 0:
            return _empty()
        # a-chunked GEMM bounds the live score matrix even on a
        # pathologically giant block (same chunking as the global
        # kernel)
        a_step = max(1, 2**24 // max(1, len(b_ids)))
        ia_parts, ib_parts = [], []
        for alo in range(0, len(a_ids), a_step):
            ahi = alo + a_step
            cand = (a_unit[alo:ahi] @ b_unit.T) >= cut
            cand[a_unh[alo:ahi], :] = True
            cand[:, b_unh] = True
            if bi == bj:
                cand &= a_ids[alo:ahi, None] < b_ids[None, :]
            ca, cb = np.nonzero(cand)
            ia_parts.append(ca + alo)
            ib_parts.append(cb)
        ia = (
            np.concatenate(ia_parts)
            if ia_parts
            else np.array([], dtype=int)
        )
        ib = (
            np.concatenate(ib_parts)
            if ib_parts
            else np.array([], dtype=int)
        )
        outs = []
        step = 4096
        for lo in range(0, len(ia), step):
            sa, sb = ia[lo : lo + step], ib[lo : lo + step]
            qd = (
                np.floor(a_mat[sa] * b_mat[sb] * QUANT)
                .astype("int64")
                .sum(axis=1)
            )
            keep = qd.astype("float64") / (a_sq[sa] * b_sq[sb]) >= threshold
            if keep.any():
                u, v = a_ids[sa[keep]], b_ids[sb[keep]]
                outs.append(
                    pd.DataFrame({"vec_b": np.maximum(u, v)})
                )
        if not outs:
            return _empty()
        return pd.concat(outs, ignore_index=True)

    from pyspark.sql import Window

    n_c = F.count("*").over(Window.partitionBy("cid"))
    mem = (
        members.withColumn(
            "n_blocks",
            F.greatest(
                F.lit(1), F.ceil(n_c / F.lit(max_task_rows))
            ).cast("int"),
        )
        .withColumn(
            "blk",
            F.pmod(
                F.crc32(F.col("vec_id").cast("string")),
                F.col("n_blocks"),
            ).cast("int"),
        )
    )
    targets = F.transform(
        F.sequence(F.lit(0), F.col("n_blocks") - 1),
        lambda q: F.struct(
            F.least(F.col("blk"), q).cast("int").alias("bi"),
            F.greatest(F.col("blk"), q).cast("int").alias("bj"),
        ),
    )
    exploded = mem.withColumn("pk", F.explode(targets)).select(
        "cid",
        F.col("pk.bi").alias("bi"),
        F.col("pk.bj").alias("bj"),
        "blk",
        "vec_id",
        vec_col,
    )
    close = exploded.groupBy("cid", "bi", "bj").applyInPandas(
        close_vec_bs, schema="vec_b long"
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
