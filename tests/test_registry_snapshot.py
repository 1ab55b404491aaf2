"""docs/QUERIES.md is the mechanical audit link between SURVEY §2.2's
family claims and the live registry: pin the committed file against a
fresh render so any registry change (new query, tag edit, oracle
added/dropped) that forgets to regenerate the doc fails here instead
of silently drifting."""

from __future__ import annotations

import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_md_matches_live_registry():
    from tools.snapshot_queries import render

    path = os.path.join(HERE, "docs", "QUERIES.md")
    with open(path, encoding="utf-8") as f:
        committed = f.read()
    assert committed == render(), (
        "docs/QUERIES.md is stale — regenerate with "
        "`python -m tools.snapshot_queries`"
    )


def test_family_summary_covers_every_tag():
    """The gate-summary table lists every tag exactly once with
    consistent counts (oracle + rows-only == total)."""
    from jly_flink_spark.plans import REGISTRY
    from tools.snapshot_queries import render

    text = render()
    summary = text.split("## Per-family gate summary")[1].split(
        "## Registry"
    )[0]
    rows = [
        line.split("|")[1:-1]
        for line in summary.splitlines()
        if line.startswith("| ") and not line.startswith("| tag")
    ]
    seen = {}
    for tag, total, oracle, rows_only in rows:
        seen[tag.strip()] = (
            int(total),
            int(oracle),
            int(rows_only),
        )
    live_tags = {t for s in REGISTRY.values() for t in s.tags}
    assert set(seen) == live_tags
    for tag, (total, oracle, rows_only) in seen.items():
        assert oracle + rows_only == total, tag
        assert total == sum(
            1 for s in REGISTRY.values() if tag in s.tags
        ), tag
