"""Dimension-scaled prefilter margin for the embedding near-dup
kernel (ADVICE round 4).

The two-stage kernel in `embedding_near_dup_pairs` drops pairs whose
float32 GEMM cosine sits below `threshold - margin`, trusting that
the exact quantized cosine cannot exceed the float one by more than
`margin`. That gap grows LINEARLY with the embedding dimension d
(flooring loses up to d quantization units on each norm², inflating
the quantized cosine by ~d/qn), so the old FIXED 1e-3 margin was
silently unsound at realistic dims: at d≈1000 with norms at the
healthy floor the floor term alone consumes it, and threshold-edge
pairs vanish from the output — breaking the claimed bit-parity with
the SQL oracle. These tests construct that worst case explicitly at
d=2048 and pin that `prefilter_margin(d)` covers it.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from jly_flink_spark.operators.similarity import (
    MIN_HEALTHY_QN,
    QUANT,
    embedding_near_dup_pairs,
    prefilter_margin,
)

D = 2048


def _edge_element(lo: int, hi: int, want_high_frac: float) -> float:
    """A float32-representable element c whose squared quantized value
    c²·QUANT has fractional part ≥ want_high_frac — i.e. flooring the
    norm term loses almost a full unit per element, the worst case
    for the quantized-cosine inflation. Searched over integer levels
    so the property survives the array<float> round-trip."""
    for a in range(lo, hi):
        c = np.float32(math.sqrt((a + 0.9995) / QUANT))
        if float(np.float64(c) ** 2 * QUANT) % 1.0 >= want_high_frac:
            return float(c)
    raise AssertionError("no adversarial element found")


def _adversarial_pair() -> tuple[float, float]:
    """Two constant-vector element values (ca, cb) at the healthy-norm
    floor where (a) each norm² floors away ~d units and (b) the
    cross-term ca·cb·QUANT floors away little — maximizing how far the
    quantized cosine rises ABOVE the float cosine."""
    # 489·2048 ≈ 1.0e6: right at the MIN_HEALTHY_QN floor, where the
    # relative floor error — and therefore the inflation — is largest
    # (any smaller level would dodge the prefilter entirely)
    ca = _edge_element(489, 520, 0.99)
    for b in range(489, 560):
        cb = np.float32(math.sqrt((b + 0.9995) / QUANT))
        if float(np.float64(cb) ** 2 * QUANT) % 1.0 < 0.99:
            continue
        dot_frac = float(np.float64(ca) * np.float64(cb) * QUANT) % 1.0
        if dot_frac <= 0.05 and float(cb) != ca:
            return ca, float(cb)
    raise AssertionError("no adversarial pair found")


def _quant_cosine(a: np.ndarray, b: np.ndarray) -> float:
    qd = int(np.floor(a * b * QUANT).astype("int64").sum())
    qa = int(np.floor(a * a * QUANT).astype("int64").sum())
    qb = int(np.floor(b * b * QUANT).astype("int64").sum())
    return qd / (math.sqrt(qa) * math.sqrt(qb))


@pytest.fixture(scope="module")
def adversarial():
    ca, cb = _adversarial_pair()
    a = np.full(D, ca, dtype="float64")
    b = np.full(D, cb, dtype="float64")
    qa = int(np.floor(a * a * QUANT).astype("int64").sum())
    qb = int(np.floor(b * b * QUANT).astype("int64").sum())
    assert min(qa, qb) >= MIN_HEALTHY_QN  # healthy: prefilter applies
    # float32 GEMM cosine exactly as the kernel's stage 1 computes it
    an = (a / math.sqrt(float((a * a).sum()))).astype("float32")
    bn = (b / math.sqrt(float((b * b).sum()))).astype("float32")
    f32_cos = float(an @ bn)
    return a, b, _quant_cosine(a, b), f32_cos


def test_fixed_margin_was_unsound_and_scaled_margin_holds(adversarial):
    """At d=2048 the quantized cosine exceeds the float32 cosine by
    MORE than the old fixed 1e-3 margin (the silent-drop regime) but
    by LESS than the dimension-scaled bound."""
    _, _, q_cos, f32_cos = adversarial
    gap = q_cos - f32_cos
    assert gap > 1e-3, gap  # the old fixed margin was insufficient
    assert gap < prefilter_margin(D), gap  # the scaled bound covers it


def test_threshold_edge_pair_survives_prefilter(spark, adversarial):
    """End-to-end: a healthy-norm pair whose quantized cosine clears
    the threshold while its float cosine sits more than 1e-3 below it
    MUST be emitted — under the old fixed margin the GEMM prefilter
    silently dropped it and the kernel disagreed with the SQL
    oracle's exact arithmetic."""
    a, b, q_cos, f32_cos = adversarial
    threshold = q_cos - 1e-4
    assert f32_cos < threshold - 1e-3  # old margin would have dropped it
    emb = spark.createDataFrame(
        [
            (1, [float(x) for x in a]),
            (2, [float(x) for x in b]),
            # orthogonal-ish filler so the corpus isn't only the pair
            (3, [0.2] * (D // 2) + [0.0] * (D - D // 2)),
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dup_pairs(
            emb, threshold=threshold, n_blocks=2
        ).collect()
    }
    assert (1, 2) in pairs, pairs


def test_kernel_matches_bruteforce_at_realistic_dim(spark):
    """Property check at d=768 with norms hovering around the healthy
    floor: the kernel's emitted pair set must equal the exact
    quantized brute force — the prefilter may only ever discard pairs
    the exact stage would discard anyway."""
    rng = np.random.default_rng(7)
    d, n, threshold = 768, 24, 0.3
    mats = []
    for i in range(n):
        v = rng.normal(0.0, 1.0, d)
        v *= (0.09 + 0.04 * rng.random()) / math.sqrt(float((v * v).sum()))
        mats.append(v.astype("float32").astype("float64"))
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            if _quant_cosine(mats[i], mats[j]) >= threshold:
                want.add((i, j))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in mats[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dup_pairs(
            emb, threshold=threshold, n_blocks=3
        ).collect()
    }
    assert got == want
