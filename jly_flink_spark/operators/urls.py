"""URL canonicalization for web-corpus ingestion (round 13).

The first stage of every web-scale training pipeline: collapse a
crawl's URL variants — scheme/host case, `www.` prefixes, default
ports, tracking query parameters, parameter order, fragments,
trailing slashes — onto one canonical form so host-level and
page-level dedup can hash-group on it (the front door to the exact-
dedup family in `operators/dedup.py`).

Everything is built-in string/array expressions (split / lower /
substring_index / higher-order filter+sort) — JVM-side, codegen'd,
zero UDFs — so the canonicalizer runs at scan speed over 100 TB and
Catalyst keeps predicate pushdown through it. The same steps are
mirrored verbatim in the registered query's DuckDB oracle, so the
whole normalization is value-hash verified cross-engine.

Contract: input URLs carry an explicit `scheme://`. Percent-encoding
normalization and IDN/punycode are out of scope (they need codec
tables, not string algebra); a real crawler normalizes those at
fetch time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Query parameters that never identify content: analytics/click ids.
# utm_* is a prefix family; the rest are exact names.
TRACKING_PREFIX = "utm_"
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_eid", "igshid")

# default ports dropped during canonicalization, keyed by scheme
DEFAULT_PORTS = (("http", "80"), ("https", "443"))


def _is_tracking(p: Column) -> Column:
    low = F.lower(p)
    cond = low.startswith(TRACKING_PREFIX)
    for name in TRACKING_PARAMS:
        cond = cond | low.startswith(name + "=")
    return cond


def canonicalize_url(url: Column) -> Column:
    """Struct column `(canon_url, host)` — the canonical page key and
    the registrable host key (two dedup grains: page-level groups on
    canon_url, host-level rollups on host).

    Steps (each mirrored 1:1 by the query oracle's SQL):
      1. drop the fragment (`#...` never reaches the server);
      2. lowercase the scheme and host;
      3. strip a leading `www.`;
      4. drop scheme-default ports (:80 http / :443 https), keep
         explicit non-default ones;
      5. strip trailing slashes from the path;
      6. drop tracking params (utm_*, fbclid, gclid, msclkid,
         mc_eid, igshid), sort the survivors so parameter order
         never splits a group, and re-join.
    """
    base = F.substring_index(url, "#", 1)
    scheme = F.lower(F.substring_index(base, "://", 1))
    rest = F.substring_index(base, "://", -1)
    hostport = F.lower(F.substring_index(rest, "/", 1))
    pathq = F.substr(rest, F.length(hostport) + F.lit(1))
    # substring_index returns the WHOLE string when the delimiter is
    # absent, so the "second part" needs an explicit contains() guard
    # to mirror SQL split_part's empty-string behavior
    path_raw = F.substring_index(pathq, "?", 1)
    qs = F.when(
        pathq.contains("?"), F.substring_index(pathq, "?", -1)
    ).otherwise(F.lit(""))
    hostname = F.substring_index(hostport, ":", 1)
    port = F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))

    host = F.when(
        hostname.startswith("www."), F.substr(hostname, F.lit(5))
    ).otherwise(hostname)

    keep_port = port != F.lit("")
    for sch, dport in DEFAULT_PORTS:
        keep_port = keep_port & ~(
            (scheme == F.lit(sch)) & (port == F.lit(dport))
        )
    portseg = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(
        F.lit("")
    )

    path = F.regexp_replace(path_raw, "/+$", "")

    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(qs, "&"),
                lambda p: (p != F.lit("")) & ~_is_tracking(p),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        portseg,
        path,
        F.when(kept != F.lit(""), F.concat(F.lit("?"), kept)).otherwise(
            F.lit("")
        ),
    )
    return F.struct(canon.alias("canon_url"), host.alias("host"))


def canonicalize_url_sql(url_expr: str) -> tuple[str, str]:
    """(canon_url_sql, host_sql) — the DuckDB mirror of
    `canonicalize_url`, step for step, as expressions over
    ``url_expr``. Kept next to the Spark form so the two can never
    drift silently; the registered query's value-hash oracle is the
    drift detector."""
    base = f"split_part({url_expr}, '#', 1)"
    scheme = f"lower(split_part({base}, '://', 1))"
    rest = f"split_part({base}, '://', 2)"
    hostport = f"lower(split_part({rest}, '/', 1))"
    pathq = f"substr({rest}, length({hostport}) + 1)"
    path_raw = f"split_part({pathq}, '?', 1)"
    qs = f"split_part({pathq}, '?', 2)"
    hostname = f"split_part({hostport}, ':', 1)"
    port = f"split_part({hostport}, ':', 2)"
    host = (
        f"CASE WHEN starts_with({hostname}, 'www.')"
        f" THEN substr({hostname}, 5) ELSE {hostname} END"
    )
    keep = f"{port} <> ''"
    for sch, dport in DEFAULT_PORTS:
        keep += (
            f" AND NOT ({scheme} = '{sch}' AND {port} = '{dport}')"
        )
    portseg = f"CASE WHEN {keep} THEN ':' || {port} ELSE '' END"
    path = f"regexp_replace({path_raw}, '/+$', '')"
    not_tracking = f"NOT starts_with(lower(p), '{TRACKING_PREFIX}')"
    for name in TRACKING_PARAMS:
        not_tracking += (
            f" AND NOT starts_with(lower(p), '{name}=')"
        )
    kept = (
        "array_to_string(list_sort(list_filter("
        f"string_split({qs}, '&'),"
        f" p -> p <> '' AND {not_tracking})), '&')"
    )
    canon = (
        f"{scheme} || '://' || {host} || {portseg} || {path} || "
        f"CASE WHEN {kept} <> '' THEN '?' || {kept} ELSE '' END"
    )
    return canon, host
