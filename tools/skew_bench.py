"""Micro-bench behind docs/SKEW.md: salted vs unsalted shuffle join
on a single-hot-key distribution, output-equality asserted in-run.

Run: python -m tools.skew_bench [--aqe]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--aqe",
        action="store_true",
        help="enable AQE + its skew-join (the comparison row); "
        "default is AQE off so the static plans are measured",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jly_flink_spark.operators.skew import salted_join

    b = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", str(args.aqe).lower())
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    )
    if args.aqe:
        b = (
            b.config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
            )
            .config(
                "spark.sql.adaptive.skewJoin."
                "skewedPartitionThresholdInBytes",
                "8MB",
            )
        )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # 4M-row fact, 90% of rows on ONE hot key, rest uniform over 9999
    n = 4_000_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(9999)) + 1)
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    dim = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w")
    )

    def best_of(df, runs: int = 3) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    plain = fact.join(dim, "k").select(F.col("v") + F.col("w"))
    salted = salted_join(fact, dim, "k", n_salt=8).select(
        F.col("v") + F.col("w")
    )
    assert (
        plain.agg(F.sum("(v + w)")).collect()
        == salted.agg(F.sum("(v + w)")).collect()
    ), "salted join output diverged from plain join"
    print(f"aqe={args.aqe}")
    print(f"unsalted: {best_of(plain):.2f}s")
    print(f"salted x8: {best_of(salted):.2f}s")


if __name__ == "__main__":
    main()
