"""Maintain VERIFIED_HASHES.json — the map of query name → impl_hash
that a green CORRECTNESS row actually certifies.

The driver's CORRECTNESS_r*.json files record green rows but not the
implementation they verified. If a query is rewritten afterwards, its
old green row would otherwise keep it out of the coverage rotation
forever (the round-2 verdict's `dedup_embedding_cosine` problem).
This tool pins each green name to the registry's CURRENT impl_hash —
run it immediately after a round, while the code equals what the
driver verified. Names whose stored hash no longer matches the
registry are treated as unverified by `__spark_entry__.queries()`.

Usage:
    python -m tools.update_verified_hashes [--exclude name1,name2]

--exclude: green names known to have been rewritten since their green
row (do not pin; they re-enter the rotation).
"""

from __future__ import annotations

import argparse
import glob
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIDECAR = os.path.join(HERE, "VERIFIED_HASHES.json")


def green_names() -> set[str]:
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        try:
            with open(path, encoding="utf-8") as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            ):
                seen.add(name)
    return seen


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--exclude", default="", help="comma-separated names")
    args = ap.parse_args()
    exclude = {n for n in args.exclude.split(",") if n}

    from jly_flink_spark.plans import REGISTRY

    try:
        with open(SIDECAR, encoding="utf-8") as f:
            pinned: dict[str, str] = json.load(f)
    except (OSError, ValueError):
        pinned = {}

    current = {n: spec.impl_hash for n, spec in REGISTRY.items()}
    greens = green_names()

    added, stale = [], []
    for name in sorted(greens):
        if name in exclude or name not in current:
            continue
        if name not in pinned:
            pinned[name] = current[name]
            added.append(name)
        elif pinned[name] != current[name]:
            # pinned hash describes an older implementation; keep the
            # pin (it still names what was verified) — the rotation
            # sees the mismatch and re-queues the query.
            stale.append(name)

    for name in list(pinned):
        if name not in current:
            del pinned[name]

    with open(SIDECAR, "w", encoding="utf-8") as f:
        json.dump(pinned, f, indent=1, sort_keys=True)
        f.write("\n")

    print(f"pinned: {len(pinned)}  (+{len(added)} new)")
    if stale:
        print("stale (rewritten since green — will re-verify):")
        for n in stale:
            print(" ", n)


if __name__ == "__main__":
    main()
