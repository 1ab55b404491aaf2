"""Clustered-embedding ANN fixture.

The driver's synthetic embeddings are near-uniform on the sphere —
the WORST case for every vector quantizer (IVF lists are arbitrary
Voronoi cells, PQ residuals have nowhere to shrink), so recall pins
on them measure the floor, not the serving regime. Real embedding
corpora cluster (that's why IVF/PQ work at all), so this fixture
plants deterministic Gaussian clusters: 16 centers ~ N(0,1) in
64-dim, 2000 points = center + N(0, 0.8), seed 8. Every recall /
probe-pruning pin for the CLUSTERED regime reads this one generator
(tests/test_ivf_serving.py, tests/test_ivf_pq.py).

Deterministic: numpy's PCG64 stream for a fixed seed is stable
across platforms/versions, so the fixture — and every measured
recall on it — reproduces exactly.
"""

from __future__ import annotations

import numpy as np

N = 2000
DIM = 64
N_CLUSTERS = 16
SIGMA = 0.8
SEED = 8


def clustered_vectors(
    n: int = N,
    dim: int = DIM,
    n_clusters: int = N_CLUSTERS,
    sigma: float = SIGMA,
    seed: int = SEED,
):
    """(X, assignment): the raw numpy fixture."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 1.0, (n_clusters, dim))
    asg = rng.integers(0, n_clusters, n)
    x = centers[asg] + rng.normal(0.0, sigma, (n, dim))
    return x, asg


def clustered_embeddings(spark, **kw):
    """The fixture as an embeddings DataFrame (vec_id, embedding) —
    the same shape `load_table(..., "embeddings")` yields."""
    x, _ = clustered_vectors(**kw)
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(len(x))]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
