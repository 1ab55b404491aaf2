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

Stale-pin refresh: a pin that no longer matches the registry is
refreshed to the current hash ONLY when the name is green in the
MOST RECENT round's CORRECTNESS file — i.e. the latest driver run
verified the current implementation (this is why the tool must run
right after the round). Older green rows cannot refresh a stale pin;
without this rule a rewritten-then-re-verified query would stay
"stale" and burn driver slots every round forever.

Usage:
    python -m tools.update_verified_hashes [--exclude name1,name2]

--exclude: green names known to have been rewritten since their green
row (do not pin; they re-enter the rotation).

Known limitation (by design): impl_hash covers the registered query
fn's source + oracle SQL, NOT the operators/ helpers it calls — a
helper rewrite leaves pins valid. The safety net for helper changes
is the full local oracle sweep (`python -m tests.oracle_harness`),
which value-checks every query regardless of pins.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIDECAR = os.path.join(HERE, "VERIFIED_HASHES.json")
# Exclusion ledger: {name: round-file count at exclusion} — names
# rewritten after their last green row, kept out of the pin set until
# a NEWER CORRECTNESS file shows them green (see
# apply_persistent_excludes). Separate file so the pin sidecar's
# flat {name: hash} contract stays untouched for its consumers.
EXCLUDE_LEDGER = os.path.join(HERE, "VERIFIED_HASHES_EXCLUDE.json")

sys.path.insert(0, HERE)

from __spark_entry__ import _is_green_row  # noqa: E402


def _rounds() -> list[dict]:
    """CORRECTNESS files' contents, oldest → newest.

    An unreadable/corrupt file ABORTS instead of being skipped: pins
    are now dropped when their supporting green row disappears, so
    silently omitting a round would wipe every pin that round alone
    supports — a transient read hiccup must not destroy the pin set."""
    out = []
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        try:
            with open(path, encoding="utf-8") as f:
                out.append(json.load(f))
        except (OSError, ValueError) as e:
            raise SystemExit(
                f"refusing to update pins: {path} is unreadable ({e}); "
                "fix or remove the file and re-run"
            )
    return out


def compute_pins(
    pinned: dict[str, str],
    current: dict[str, str],
    rounds: list[dict],
    exclude: set[str] = frozenset(),
    with_oracle: set[str] = frozenset(),
) -> tuple[dict[str, str], list[str], list[str], list[str]]:
    """Pure pin-update logic → (new_pins, added, refreshed, stale).

    - unpinned green name → pin at the current hash
    - pinned but hash changed: refresh ONLY if the LATEST round is
      green for it (that run verified the current implementation);
      otherwise keep the old pin (rotation re-queues the query)
    - names gone from the registry are dropped
    - excluded names are dropped from pins (they re-enter rotation)
    - a pin with NO supporting green row is dropped — happens when a
      rows-only row stops counting because the name (in `with_oracle`)
      gained an oracle after that row ran; the query re-enters the
      rotation so the driver executes the new oracle
    """
    pins = dict(pinned)
    greens_all = {
        name
        for data in rounds
        for name, row in data.items()
        if _is_green_row(row, has_oracle=name in with_oracle)
    }
    greens_latest = (
        {
            name
            for name, row in rounds[-1].items()
            if _is_green_row(row, has_oracle=name in with_oracle)
        }
        if rounds
        else set()
    )

    added, refreshed, stale = [], [], []
    for name in sorted(greens_all):
        if name in exclude or name not in current:
            continue
        if name not in pins:
            pins[name] = current[name]
            added.append(name)
        elif pins[name] != current[name]:
            if name in greens_latest:
                pins[name] = current[name]
                refreshed.append(name)
            else:
                stale.append(name)

    for name in list(pins):
        if name not in current or name in exclude or name not in greens_all:
            del pins[name]
    return pins, added, refreshed, stale


def apply_persistent_excludes(
    persisted: dict[str, int],
    cli_exclude: set[str],
    rounds: list[dict],
    with_oracle: set[str] = frozenset(),
) -> tuple[set[str], dict[str, int]]:
    """Merge CLI excludes with the persisted exclusion ledger →
    (active_excludes, new_persisted).

    An `--exclude NAME` records {NAME: current round-file count}: the
    exclusion stays ACTIVE on every later run — so forgetting to
    repeat the flag can never re-pin a rewritten query against its
    pre-rewrite green row (the silent false-certification this ledger
    exists to prevent) — until a CORRECTNESS file newer than the
    exclusion shows the name green, i.e. the driver verified the
    post-rewrite implementation; then the entry drops and normal
    pinning resumes."""
    n_rounds = len(rounds)
    ledger = dict(persisted)
    for n in cli_exclude:
        # re-excluding resets the bar to the current round count
        ledger[n] = n_rounds
    active: set[str] = set()
    for name, at in list(ledger.items()):
        regreened = any(
            _is_green_row(
                data.get(name), has_oracle=name in with_oracle
            )
            for data in rounds[at:]
        )
        if regreened:
            del ledger[name]
        else:
            active.add(name)
    return active, ledger


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--exclude", default="", help="comma-separated names")
    args = ap.parse_args()
    cli_exclude = {n for n in args.exclude.split(",") if n}

    from jly_flink_spark.plans import REGISTRY

    try:
        with open(SIDECAR, encoding="utf-8") as f:
            old_pins: dict[str, str] = json.load(f)
    except (OSError, ValueError):
        old_pins = {}
    try:
        with open(EXCLUDE_LEDGER, encoding="utf-8") as f:
            persisted: dict[str, int] = json.load(f)
    except (OSError, ValueError):
        persisted = {}

    current = {n: spec.impl_hash for n, spec in REGISTRY.items()}
    with_oracle = {
        n for n, spec in REGISTRY.items() if spec.oracle is not None
    }
    rounds = _rounds()
    exclude, new_ledger = apply_persistent_excludes(
        persisted, cli_exclude, rounds, with_oracle
    )
    pinned, added, refreshed, stale = compute_pins(
        old_pins, current, rounds, exclude, with_oracle
    )

    with open(SIDECAR, "w", encoding="utf-8") as f:
        json.dump(pinned, f, indent=1, sort_keys=True)
        f.write("\n")
    with open(EXCLUDE_LEDGER, "w", encoding="utf-8") as f:
        json.dump(new_ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    if exclude:
        print(
            "active exclusions (rewritten since their green row; "
            f"awaiting a fresh driver green): {sorted(exclude)}"
        )

    print(
        f"pinned: {len(pinned)}  (+{len(added)} new, "
        f"{len(refreshed)} refreshed)"
    )
    if refreshed:
        print("refreshed (latest round re-verified the rewrite):")
        for n in refreshed:
            print(" ", n)
    if stale:
        print("stale (rewritten since green — will re-verify):")
        for n in stale:
            print(" ", n)


if __name__ == "__main__":
    main()
