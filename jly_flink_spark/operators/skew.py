"""Explicit skew-mitigation operators.

AQE's skew-join handles most hot-key joins at runtime (enabled in
session.py), but it only kicks in for sort-merge shuffle joins in
batch mode. These helpers pre-salt deliberately for the cases AQE
can't see — streaming joins, or when the skew is known up front and
the extra exchange of a runtime re-plan is worth avoiding.

The same structural guards live inside the operators that need them
(LSH bucket caps in dedup.py, document-frequency caps in jaccard,
band-key hashing) — salting is the general-purpose fallback when the
key distribution is not under the operator's control.

Measured evidence that the salt actually beats the straggler-bound
plan on a single-hot-key distribution (1.7× at local[8], output
equality asserted; AQE's skew-join left the same join
straggler-bound): docs/SKEW.md, repro `python -m tools.skew_bench`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on a skewed key with the hot-key rows spread over
    ``n_salt`` sub-partitions.

    The (big, skewed) left side gets a deterministic salt from the
    hash of its full row, so one hot key's rows land in n_salt
    different shuffle partitions; the (smaller) right side is
    replicated n_salt times to meet them. Join output is identical to
    the unsalted join — only the shuffle layout changes. Right-side
    replication costs n_salt×|right|: use when |right| is modest but
    too big (or streaming) to broadcast.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_l = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    l = left.withColumn("__salt", salt_l)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")
