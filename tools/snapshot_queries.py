"""Regenerate docs/QUERIES.md: the full registry inventory — every
query exposed through `__spark_entry__.queries()`, its tags, its
correctness mode (value-hash oracle vs rows-only), and its one-line
description. The line-by-line companion to SURVEY.md §2.2.

Run: python tools/snapshot_queries.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jly_flink_spark.plans import REGISTRY  # noqa: E402


def main() -> None:
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    out = [
        "# QUERIES — the registered operator surface",
        "",
        f"{len(REGISTRY)} queries; {n_oracle} value-hash oracle-checked "
        "(the rest are rows-only by declared approximation). Generated "
        "by `tools/snapshot_queries.py` from the live registry — every "
        "row is a callable in `__spark_entry__.queries()`.",
        "",
        "| query | check | tags | what it does |",
        "|---|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        check = "oracle" if spec.oracle else "rows-only"
        tags = " ".join(spec.tags)
        doc = " ".join((spec.doc or "").split())
        if len(doc) > 220:
            doc = doc[:217] + "..."
        doc = doc.replace("|", "\\|")
        out.append(f"| `{name}` | {check} | {tags} | {doc} |")
    out.append("")
    os.makedirs("docs", exist_ok=True)
    with open("docs/QUERIES.md", "w", encoding="utf-8") as f:
        f.write("\n".join(out))
    print(f"wrote docs/QUERIES.md ({len(REGISTRY)} queries)")


if __name__ == "__main__":
    main()
