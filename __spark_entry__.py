"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``jly_flink_spark`` package; this module
only adapts its query registry to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's CDC
    delete-archival pipeline (SURVEY.md §2.1 T1–T7) end to end."""
    from jly_flink_spark.plans import REGISTRY

    return REGISTRY["cdc_delete_archive"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )


def _is_green_row(row, has_oracle: bool = False) -> bool:
    """A CORRECTNESS row counts as green when the value hash matched,
    or when a declared rows-only check completed — but a rows-only
    completion certifies nothing for a name that NOW has an oracle:
    the oracle was added after that row ran, and counting the old row
    as green would retire the oracle unexecuted (the round-3 verdict's
    `multimodal_extract_features` blind spot). The ONE definition of
    'green' — tools/update_verified_hashes.py imports this, so the
    pin set and the rotation can never disagree on the predicate."""
    return isinstance(row, dict) and (
        row.get("hash_match") is True
        or (
            not has_oracle
            and row.get("err") == "no_oracle"
            and row.get("spark_rows") is not None
        )
    )


def _already_verified() -> dict[str, int]:
    """Names with a green row (hash match, or completed rows-only
    check) in ANY prior round's CORRECTNESS_r*.json — **whose
    implementation is unchanged since that green row** — mapped to
    the LATEST round number that re-verified them (the staleness
    signal the rotation sorts on).

    VERIFIED_HASHES.json (maintained by tools/update_verified_hashes.py
    right after each round) pins every green name to the impl_hash
    (md5 of query-fn source + oracle SQL) it was verified at. A pin
    that no longer matches the registry means the query was rewritten:
    its old green row certifies deleted code, so it re-enters the
    unverified-first rotation.
    """
    import glob
    import json
    import os
    import re

    from jly_flink_spark.plans import REGISTRY

    here = os.path.dirname(os.path.abspath(__file__))
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path, encoding="utf-8") as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            spec = REGISTRY.get(name)
            if _is_green_row(
                row, has_oracle=spec is not None and spec.oracle is not None
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)

    try:
        with open(
            os.path.join(here, "VERIFIED_HASHES.json"), encoding="utf-8"
        ) as f:
            pinned = json.load(f)
    except (OSError, ValueError):
        return last_green  # no sidecar — green-row-only fallback
    return {
        n: rnd
        for n, rnd in last_green.items()
        if n in REGISTRY
        and pinned.get(n) == REGISTRY[n].impl_hash
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so queries WITHOUT a green row in any prior round's
    CORRECTNESS_r*.json come first: if the driver's run is capped or
    time-budgeted, coverage rotates until every registered query has
    been value-checked at least once. Within the unverified group,
    the families the round-1 verdict flagged as the coverage gap
    (training-data suite, TPC-H shapes, multimodal, curation) run
    before the rest. Within the VERIFIED group, STALEST-green first
    (round-13 verdict task 9): a name last re-validated in r01 runs
    ahead of one green last round, so Spark/DuckDB version drift on
    old pins surfaces within a bounded number of rounds instead of
    never. Ties preserve registration order, so the ordering is
    deterministic."""
    from jly_flink_spark.plans import REGISTRY, queries_map

    qm = queries_map()
    verified = _already_verified()
    order = {n: i for i, n in enumerate(qm)}

    def priority(n: str) -> int:
        tags = set(REGISTRY[n].tags)
        if (
            tags & {"training", "curation", "pipeline"}
            or n.startswith(("tpch_", "multimodal_"))
        ):
            return 0
        return 1

    def sort_key(n: str):
        if n in verified:
            # verified tier: stalest green round first, then
            # registration order (family priority only matters for
            # first-time coverage)
            return (1, verified[n], 0, order[n])
        return (0, 0, priority(n), order[n])

    names = sorted(qm, key=sort_key)
    return {n: qm[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for ops that are
    not SQL-expressible → driver records a rows-only check)."""
    from jly_flink_spark.plans import oracle_sql_map

    return oracle_sql_map()
