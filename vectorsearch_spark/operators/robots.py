"""robots.txt evaluation for the URL frontier (RFC 9309, the Robots
Exclusion Protocol): a polite crawl pipeline filters its frontier
through per-host robots rules BEFORE fetching — the natural companion
of the canonicalize/dedup/host-cap frontier operators (urls.py) and
the WARC ingestion that consumes what the crawl brings back.

Semantics implemented (RFC 9309, public spec):

* group selection (§2.2.1): rules belong to the group(s) whose
  ``User-agent`` product token equals the crawler's token
  (case-insensitive); if no group matches, the ``*`` groups apply.
  Several ``User-agent`` lines may head one shared rule block.
* rule matching (§2.2.2): a rule's path pattern matches a URL's
  path+query by prefix, with ``*`` matching any run of octets and a
  trailing ``$`` anchoring the end.
* decision (§2.2.2): among matching rules the LONGEST pattern (octet
  count) wins; on a tie allow wins; no matching rule → allowed. An
  empty ``Disallow:`` value is no rule at all (the historical
  allow-everything idiom).

Split of labor: PARSING robots.txt bodies is per-host metadata work —
one Arrow pass turns (host, robots_txt) into a narrow RULES table of
(host, pattern, allow, like_pattern, plen). MATCHING is pure JVM: the
frontier joins the rules on host, patterns evaluate as SQL ``LIKE``
(the ``*``/``$`` translation below — no per-row Python, no regex
compilation), and a max_by over (plen, allow) picks the winning rule
per URL. At 100 TB the rules table is a few rows per distinct host —
broadcast it when it fits (the operator does); the frontier is never
shuffled by this filter.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Parsing (Python model — also the unit-test oracle)
# ---------------------------------------------------------------------------

def parse_robots(content: str, agent: str = "*") -> "list[tuple[str, bool]]":
    """The (pattern, allow) rules applying to ``agent`` per RFC 9309
    group selection. Lines are ``field: value`` with ``#`` comments;
    unknown fields are ignored inside groups (per spec) and a
    ``user-agent`` line after rules starts a NEW group."""
    groups: "list[tuple[list[str], list[tuple[str, bool]]]]" = []
    uas: "list[str]" = []
    rules: "list[tuple[str, bool]]" = []
    in_rules = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:
                groups.append((uas, rules))
                uas, rules, in_rules = [], [], False
            uas.append(value.lower())
        elif field in ("allow", "disallow"):
            in_rules = True
            if value == "":
                continue  # empty Disallow/Allow: no rule
            rules.append((value, field == "allow"))
    if uas or rules:
        groups.append((uas, rules))

    tok = agent.lower()
    exact = [r for u, rs in groups if tok in u for r in rs]
    if any(tok in u for u, _ in groups):
        return exact
    return [r for u, rs in groups if "*" in u for r in rs]


def parse_crawl_delay(content: str, agent: str = "*") -> "float | None":
    """The ``Crawl-delay`` (seconds) applying to ``agent`` — a de facto
    extension outside RFC 9309 but honored by major crawlers; group
    selection follows the same exact-token-else-* rule. None when no
    group declares one (the crawler's own default applies)."""
    delays: "dict[str, float]" = {}
    uas: "list[str]" = []
    in_rules = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if in_rules:
                uas, in_rules = [], False
            uas.append(value.lower())
        elif field in ("allow", "disallow", "crawl-delay"):
            in_rules = True
            if field == "crawl-delay":
                try:
                    d = float(value)
                except ValueError:
                    continue
                for u in uas:
                    delays[u] = d
    tok = agent.lower()
    if tok in delays:
        return delays[tok]
    return delays.get("*")


def _pattern_matches(pattern: str, path: str) -> bool:
    """RFC 9309 §2.2.2 pattern match: anchored at the path start,
    ``*`` = any octets, trailing ``$`` = end anchor."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    segs = pattern.split("*")
    pos = 0
    for i, seg in enumerate(segs):
        if i == 0:
            if not path.startswith(seg):
                return False
            pos = len(seg)
        else:
            j = path.find(seg, pos)
            if j < 0:
                return False
            pos = j + len(seg)
    if anchored:
        # the last segment must reach the end (preceding * absorbs any gap)
        if len(segs) > 1:
            return path.endswith(segs[-1]) and pos <= len(path)
        return pos == len(path)
    return True


def robots_allowed(path: str, rules: "list[tuple[str, bool]]") -> bool:
    """Longest-match decision over parsed rules (allow wins ties; no
    match → allowed) — the reference model the Spark plan mirrors."""
    best_len, best_allow = -1, True
    for pattern, allow in rules:
        if _pattern_matches(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow and not best_allow):
                best_len, best_allow = plen, allow
    return best_allow


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def _like_pattern(pattern: str) -> "tuple[str, int]":
    """Translate a robots path pattern to a SQL LIKE pattern (shared
    Spark/DuckDB semantics): escape LIKE metacharacters, ``*`` → ``%``,
    trailing ``$`` drops the implicit trailing ``%``. Returns
    (like_pattern, plen) with plen the RFC's octet length of the
    original pattern (the longest-match priority)."""
    plen = len(pattern)
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    lit = pattern.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    like = lit.replace("*", "%")
    if not anchored:
        like += "%"
    return like, plen


def robots_rules(
    robots_df: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    content_col: str = "robots_txt",
) -> DataFrame:
    """(host, pattern, allow, like_pattern, plen) — the parsed rules
    table for ``agent``, one Arrow pass over the per-host robots
    bodies. Hosts whose file yields no applicable rules emit no rows
    (no rule → allowed, the join below is left)."""
    import pandas as pd

    def mapper(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            hosts, pats, allows, likes, plens = [], [], [], [], []
            for host, content in zip(pdf[host_col], pdf[content_col]):
                if content is None:
                    continue
                for pattern, allow in parse_robots(str(content), agent):
                    like, plen = _like_pattern(pattern)
                    hosts.append(host)
                    pats.append(pattern)
                    allows.append(allow)
                    likes.append(like)
                    plens.append(plen)
            yield pd.DataFrame(
                {
                    "host": pd.Series(hosts, dtype="object"),
                    "pattern": pd.Series(pats, dtype="object"),
                    "allow": pd.Series(allows, dtype="bool"),
                    "like_pattern": pd.Series(likes, dtype="object"),
                    "plen": pd.Series(plens, dtype="int32"),
                }
            )

    return robots_df.select(host_col, content_col).mapInPandas(
        mapper,
        schema=(
            "host string, pattern string, allow boolean, "
            "like_pattern string, plen int"
        ),
    )


def url_path_query(url: "Column | str") -> Column:
    """The path+query portion robots rules match against — '/' when
    the URL has an empty path (the root fetch)."""
    u = F.col(url) if isinstance(url, str) else url
    pq = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    return F.when(pq == "", F.lit("/")).otherwise(pq)


def filter_by_robots(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    keep: str = "allowed",
) -> DataFrame:
    """Apply a ``robots_rules`` table to a frontier: per URL, the
    longest matching rule on its host decides (allow wins ties; no
    rule → allowed). ``keep`` = 'allowed' | 'disallowed' | 'all' (the
    last adds an ``allowed`` boolean instead of filtering).

    Plan — the frontier is NEVER shuffled: rules aggregate per host
    into a small array column (the only shuffle, O(|rules|)), that
    per-host table BROADCASTS onto the frontier, and the winning rule
    evaluates entirely inside one projection with higher-order
    functions — ``filter`` (SQL LIKE against each pattern, JVM
    codegen) → ``transform`` to (plen, allow) structs → ``array_max``
    (struct ordering = longest pattern first, allow breaking ties).
    No per-row Python, no regex, no frontier exchange."""
    from vectorsearch_spark.operators.urls import url_host

    per_host = F.broadcast(
        rules.groupBy(F.col("host").alias("__host")).agg(
            F.collect_list(
                F.struct("plen", "allow", "like_pattern")
            ).alias("__rules")
        )
    )
    decided = (
        urls.withColumn("__host", url_host(F.col(url_col)))
        .withColumn("__pq", url_path_query(F.col(url_col)))
        .join(per_host, "__host", "left")
        .withColumn(
            "allowed",
            F.coalesce(
                F.expr(
                    "array_max(transform("
                    " filter(__rules, r -> __pq LIKE r.like_pattern),"
                    " r -> struct(r.plen, r.allow))).allow"
                ),
                F.lit(True),
            ),
        )
        .select(*urls.columns, "allowed")
    )
    if keep == "all":
        return decided
    if keep == "allowed":
        return decided.where(F.col("allowed")).drop("allowed")
    if keep == "disallowed":
        return decided.where(~F.col("allowed")).drop("allowed")
    raise ValueError(f"keep must be allowed|disallowed|all, got {keep!r}")


def politeness_schedule(
    urls: DataFrame,
    url_col: str = "url",
    default_delay_s: float = 1.0,
    n_workers: int = 64,
    delays: "DataFrame | None" = None,
) -> DataFrame:
    """Turn an (allowed) frontier into a POLITE fetch schedule: all of
    a host's URLs go to ONE worker (politeness is per-host serial — a
    host sharded across workers gets hammered no matter what each
    worker's delay is), ordered deterministically, each offset by the
    host's crawl delay.

    Adds: ``fetch_worker`` = pmod(hash(host), n_workers) — the shard
    assignment that makes the per-host-serial invariant structural;
    ``fetch_seq`` = the URL's position within its host (ordered by URL
    for determinism); ``fetch_offset_s`` = fetch_seq x the host's
    delay (from the optional ``delays`` (host, crawl_delay_s) table —
    e.g. robots ``Crawl-delay`` via ``parse_crawl_delay`` — else
    ``default_delay_s``).

    Plan: ONE shuffle, on host (the window's partition key); the
    optional delays table broadcasts. This is also the right 100 TB
    shape — the schedule is computed where the fetch queue will be
    partitioned anyway, and a mega-host (the classic frontier skew) is
    inherently one worker's serial queue, which the host-cap operator
    (urls.host_cap) bounds UPSTREAM of this scheduler."""
    from pyspark.sql import Window

    from vectorsearch_spark.operators.urls import url_host

    u = urls.withColumn("__host", url_host(F.col(url_col)))
    if delays is not None:
        u = u.join(
            F.broadcast(
                delays.select(
                    F.col("host").alias("__host"),
                    F.col("crawl_delay_s").alias("__delay"),
                )
            ),
            "__host",
            "left",
        )
    else:
        u = u.withColumn("__delay", F.lit(None).cast("double"))
    w = Window.partitionBy("__host").orderBy(F.col(url_col))
    return (
        u.withColumn("fetch_seq", (F.row_number().over(w) - 1).cast("long"))
        .withColumn(
            "fetch_offset_s",
            F.round(
                F.col("fetch_seq")
                * F.coalesce(F.col("__delay"), F.lit(float(default_delay_s))),
                4,
            ),
        )
        .withColumn(
            "fetch_worker",
            F.pmod(F.xxhash64(F.col("__host")), F.lit(int(n_workers))).cast("int"),
        )
        .drop("__host", "__delay")
    )
