"""Quantified row-pattern COMPILER (MATCH_RECOGNIZE's
concatenation-of-quantified-literals subset) over run algebra.

`plans/advanced_queries.py::events_pattern_quantified` hand-compiles
ONE pattern (`view+ click? purchase`) to runs + lead() conditions;
this module is the general compiler: a pattern is a list of steps
``(event_type, lo, hi)`` (``hi=None`` = unbounded), and
`compile_branches` + `match_runs` + `pattern_oracle_sql` emit the
Spark plan AND the DuckDB oracle from the same spec, so every
registered pattern instance is value-hash-checked end to end.

Semantics (maximal-run algebra — regex over the run-length-encoded
alphabet, the declarative form of greedy MATCH_RECOGNIZE):

- the per-user event stream is run-length encoded on (ts, event_id)
  order into MAXIMAL runs (`event_runs`);
- every step except the last consumes its ENTIRE run: the next step
  has a different type (enforced by normalization), so a maximal run
  can never be split — its length must fall within [lo, hi];
- the LAST step consumes a prefix of its run: nothing follows, so
  greedy matching needs only ``len >= lo``;
- an optional step (lo=0) forks the pattern into present/absent
  branches at compile time; if skipping it makes two same-type steps
  adjacent, they MERGE (bounds add) — the run algebra's counterpart
  of regex concatenation collapsing (A+ B? A{2,} with B absent IS
  A{3,});
- branches are mutually exclusive by construction (the first
  position where they diverge demands different run types), so
  matches are counted once, anchored at their first run.

Scale shape: identical to the hand-compiled query — the run-id
windows, the run combine, and the run-sequence window all ride ONE
user_id exchange; the lead() width is the compile-time max branch
length, never data-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Step = tuple  # (event_type: str, lo: int, hi: int | None)


def normalize(steps: list) -> list:
    """Merge adjacent same-type steps (bounds add; ``None`` hi is
    absorbing) and validate the spec."""
    out: list = []
    for t, lo, hi in steps:
        if hi is not None and hi < max(lo, 1):
            raise ValueError(f"step {t}: hi {hi} < max(lo, 1)")
        if out and out[-1][0] == t:
            pt, plo, phi = out[-1]
            out[-1] = (
                t,
                plo + lo,
                None if (phi is None or hi is None) else phi + hi,
            )
        else:
            out.append((t, lo, hi))
    if not out:
        raise ValueError("empty pattern")
    return out


def compile_branches(steps: list) -> list:
    """All optional-step resolutions, each normalized to a list of
    REQUIRED steps (lo >= 1) with adjacent same-type runs merged.
    Branch order: optionals-present first (matches the greedy
    expansion order); every branch is non-empty."""
    branches: list = [[]]
    for t, lo, hi in steps:
        if lo == 0:
            # fork: present (lo=1) and absent
            present = [b + [(t, 1, hi)] for b in branches]
            absent = [list(b) for b in branches]
            branches = present + absent
        else:
            branches = [b + [(t, lo, hi)] for b in branches]
    if any(not b for b in branches):
        raise ValueError(
            "pattern admits an empty match (every step is optional)"
        )
    out = [normalize(b) for b in branches]
    # mutual exclusivity check: two branches must diverge in type at
    # some shared offset (else the same anchor could double-count)
    for i, x in enumerate(out):
        for y in out[i + 1 :]:
            k = min(len(x), len(y))
            if all(x[j][0] == y[j][0] for j in range(k)):
                raise ValueError(
                    "ambiguous pattern: branches "
                    f"{x} and {y} are not type-exclusive"
                )
    return out


def event_runs(ev: DataFrame) -> DataFrame:
    """Run-length encode each user's (ts, event_id)-ordered stream:
    (user_id, run_id, event_type, len, rn0, start_s). One user_id
    exchange; the change-flag window, the running sum, and the run
    combine are all colocated on it."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ts_s"),
        F.row_number().over(w).alias("rn"),
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    ).withColumn("run_id", F.sum("chg").over(wcum))
    return flagged.groupBy("user_id", "run_id").agg(
        F.first("event_type").alias("event_type"),
        F.count("*").cast("bigint").alias("len"),
        F.min("rn").alias("rn0"),
        F.min("ts_s").alias("start_s"),
    )


def _branch_cond(branch: list, t, ln):
    """AND over the branch's steps of type/length conditions; t(j)
    and ln(j) are column factories for the j-th run from the anchor.
    The last step checks only len >= lo (prefix consumption)."""
    conds = []
    last = len(branch) - 1
    for j, (typ, lo, hi) in enumerate(branch):
        conds.append(t(j) == typ)
        if j == last:
            conds.append(ln(j) >= lo)
        else:
            conds.append(ln(j) >= lo)
            if hi is not None:
                conds.append(ln(j) <= hi)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def match_runs(runs: DataFrame, branches: list) -> DataFrame:
    """Anchored matches of the compiled branches over the run table:
    (user_id, branch_id, anchor_len, span_s) — span_s is the start
    of the LAST consumed run minus the anchor's start (the same span
    definition as the hand-compiled query)."""
    max_off = max(len(b) for b in branches) - 1
    wr = Window.partitionBy("user_id").orderBy("rn0")
    cols = [
        runs["user_id"],
        runs["event_type"],
        runs["len"],
        runs["start_s"],
    ]
    for j in range(1, max_off + 1):
        cols.append(F.lead("event_type", j).over(wr).alias(f"t{j}"))
        cols.append(F.lead("len", j).over(wr).alias(f"l{j}"))
        cols.append(F.lead("start_s", j).over(wr).alias(f"s{j}"))
    seq = runs.select(*cols)

    def t(j):
        return F.col("event_type") if j == 0 else F.col(f"t{j}")

    def ln(j):
        return F.col("len") if j == 0 else F.col(f"l{j}")

    def s(j):
        return F.col("start_s") if j == 0 else F.col(f"s{j}")

    cond = None
    branch_id = None
    span_end = None
    for i, b in enumerate(branches):
        c = _branch_cond(b, t, ln)
        cond = c if cond is None else (cond | c)
        bid = F.lit(i)
        end = s(len(b) - 1)
        branch_id = (
            F.when(c, bid)
            if branch_id is None
            else branch_id.when(c, bid)
        )
        span_end = (
            F.when(c, end) if span_end is None else span_end.when(c, end)
        )
    return seq.filter(cond).select(
        "user_id",
        branch_id.cast("int").alias("branch_id"),
        F.col("len").alias("anchor_len"),
        (span_end - F.col("start_s")).cast("bigint").alias("span_s"),
    )


def pattern_rollup(matches: DataFrame) -> DataFrame:
    """The standard exact-integer match summary."""
    return matches.agg(
        F.count("*").cast("bigint").alias("n_matches"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.coalesce(F.sum("anchor_len"), F.lit(0))
        .cast("bigint")
        .alias("anchor_rows"),
        F.coalesce(
            F.sum((F.col("branch_id") == 0).cast("int")), F.lit(0)
        )
        .cast("bigint")
        .alias("n_branch0"),
        F.coalesce(F.min("span_s"), F.lit(-1))
        .cast("bigint")
        .alias("min_span_s"),
        F.coalesce(F.max("span_s"), F.lit(-1))
        .cast("bigint")
        .alias("max_span_s"),
    )


def pattern_oracle_sql(steps: list) -> str:
    """The SAME compilation targeting DuckDB SQL: runs CTE, lead()
    sequence CTE, one OR-of-branches hit filter, exact rollup —
    generated from the identical branch structure `match_runs`
    executes, so the two engines can only agree by construction."""
    branches = compile_branches(steps)
    max_off = max(len(b) for b in branches) - 1
    leads = ",\n         ".join(
        f"lead(event_type, {j}) OVER w AS t{j},\n"
        f"         lead(len, {j}) OVER w AS l{j},\n"
        f"         lead(start_s, {j}) OVER w AS s{j}"
        for j in range(1, max_off + 1)
    )
    seq_cols = f",\n         {leads}" if leads else ""

    def t(j):
        return "event_type" if j == 0 else f"t{j}"

    def ln(j):
        return "len" if j == 0 else f"l{j}"

    def s(j):
        return "start_s" if j == 0 else f"s{j}"

    def cond(b):
        parts = []
        last = len(b) - 1
        for j, (typ, lo, hi) in enumerate(b):
            parts.append(f"{t(j)} = '{typ}'")
            parts.append(f"{ln(j)} >= {lo}")
            if j != last and hi is not None:
                parts.append(f"{ln(j)} <= {hi}")
        return "(" + " AND ".join(parts) + ")"

    ors = "\n      OR ".join(cond(b) for b in branches)
    bid = " ".join(
        f"WHEN {cond(b)} THEN {i}" for i, b in enumerate(branches)
    )
    send = " ".join(
        f"WHEN {cond(b)} THEN {s(len(b) - 1)}"
        for i, b in enumerate(branches)
    )
    return f"""
WITH e AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rnt
  FROM events
), runs AS (
  SELECT user_id, event_type,
         CAST(count(*) AS BIGINT) AS len,
         min(rn) AS rn0,
         min(ts_s) AS start_s
  FROM e GROUP BY user_id, event_type, rn - rnt
), seq AS (
  SELECT user_id, event_type, len, start_s{seq_cols}
  FROM runs
  WINDOW w AS (PARTITION BY user_id ORDER BY rn0)
), hits AS (
  SELECT user_id,
         CAST(CASE {bid} END AS INT) AS branch_id,
         len AS anchor_len,
         (CASE {send} END) - start_s AS span_s
  FROM seq
  WHERE {ors}
)
SELECT CAST(count(*) AS BIGINT) AS n_matches,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(coalesce(sum(anchor_len), 0) AS BIGINT) AS anchor_rows,
       CAST(coalesce(sum(CASE WHEN branch_id = 0 THEN 1 ELSE 0 END),
            0) AS BIGINT) AS n_branch0,
       CAST(coalesce(min(span_s), -1) AS BIGINT) AS min_span_s,
       CAST(coalesce(max(span_s), -1) AS BIGINT) AS max_span_s
FROM hits
"""
