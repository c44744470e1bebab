"""Crawl-frontier scheduling: priority order with per-host politeness.

The web-crawl twin of the export family's shard ordering: given a
frontier of candidate URLs with fetch priorities (PageRank, recency,
link-evidence — any score), emit a TOTAL fetch order that (a) respects
priority and (b) never lets one host dominate a stretch of the schedule
— a crawler draining the order front-to-back naturally rotates hosts
(politeness without a stateful rate limiter in the hot path).

Pinned algebra: ``pos`` = row_number within host by (priority desc,
url asc) — each host's own priority queue; the global order is
(pos asc, priority desc, url asc) — every host's #1 pick schedules
before any host's #2, so between two fetches of one host every other
host with work gets a turn. ``sched_rank`` numbers that total order.

100 TB shape: one window partitioned by host (per-host sort, AQE-split
hub hosts) plus the global rank. The global row_number is the one
genuinely global total order in the repo — same class as
``export.train_order``'s per-shard trick, and the same fix applies at
scale: take ``sched_rank`` per (pos) band, or only materialize the top
band per scheduling wave (``limit_per_wave``), which is
TakeOrderedAndProject-shaped and never sorts the whole frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "schedule_frontier",
    "parse_robots",
    "robots_filter",
    "recrawl_priority",
]


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """robots.txt (RFC 9309, the Robots Exclusion Protocol) ->
    (host, agent, directive, path): one row per (user-agent, rule)
    binding, ready for :func:`robots_filter`. The compliance half of
    crawl politeness (``schedule_frontier`` is the rate half): at
    crawl scale you fetch each host's robots.txt once, parse the
    corpus of them as a relation, and gate the whole frontier
    against it declaratively.

    Parse semantics (the RFC's group model):

      * comments (``#`` to end of line) stripped, lines trimmed;
        only ``user-agent`` / ``allow`` / ``disallow`` lines are
        meaningful (case-insensitive directive names).
      * CONSECUTIVE user-agent lines form one run; the rules that
        follow bind to EVERY agent in the run (the multi-agent group
        form). A new user-agent line after rules starts a new group.
      * rules before any user-agent line are ignored (no group).
      * an empty-path rule (``Disallow:``) matches nothing — dropped.
      * agent names compare lowercased.

    100 TB shape: robots files are tiny and per-host — the windows
    below partition by host over line numbers (bounded by file
    length), and the output relation is hosts x rules-per-host, i.e.
    dictionary-sized next to the frontier it will gate."""
    w = Window.partitionBy(host_col).orderBy("ln")
    lines = robots.select(
        host_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("ln", "_raw"),
    )
    parsed = (
        lines.select(
            host_col,
            "ln",
            F.trim(F.regexp_replace("_raw", "#.*$", "")).alias("_line"),
        )
        .select(
            host_col,
            "ln",
            F.lower(
                F.regexp_extract("_line", r"^([A-Za-z-]+)\s*:", 1)
            ).alias("directive"),
            F.trim(
                F.regexp_extract("_line", r"^[A-Za-z-]+\s*:(.*)$", 1)
            ).alias("value"),
        )
        .where(F.col("directive").isin("user-agent", "allow", "disallow"))
    )
    tagged = (
        parsed.withColumn(
            "_ua", (F.col("directive") == "user-agent").cast("int")
        )
        .withColumn(
            "_start",
            (
                (F.col("_ua") == 1)
                & (F.coalesce(F.lag("_ua").over(w), F.lit(0)) == 0)
            ).cast("int"),
        )
        .withColumn("_run", F.sum("_start").over(w))
    )
    agents = tagged.where(F.col("_ua") == 1).select(
        host_col, "_run", F.lower(F.col("value")).alias("agent")
    )
    rules = tagged.where(
        (F.col("_ua") == 0) & (F.length("value") > 0)
    ).select(host_col, "_run", "directive", F.col("value").alias("path"))
    return agents.join(rules, [host_col, "_run"]).select(
        host_col, "agent", "directive", "path"
    )


def robots_filter(
    frontier: DataFrame,
    rules: DataFrame,
    agent: str,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Gate a (host, path) frontier against parsed robots rules for
    ``agent`` -> frontier columns + (allowed int, rule_path). RFC 9309
    matching, pinned:

      * group selection: ONE group applies per host — the exact agent
        match if any of its groups name this agent (lowercased), else
        the ``*`` group; a host with neither allows everything.
      * rule matching: the rule path is a prefix pattern with ``*``
        wildcards and an optional trailing ``$`` anchor; compiled to a
        LIKE pattern (``%``/``_``/``\\`` escaped, ``*`` -> ``%``,
        unanchored rules get a trailing ``%``).
      * precedence: the LONGEST matching rule path wins (character
        length of the raw path); at equal length Allow beats Disallow
        (the RFC's least-restrictive tie-break). No match -> allowed.

    100 TB shape: rules collapse to ONE row per host (an array of rule
    structs — robots files are bounded, so the array is too) and join
    BROADCAST; the match + longest-win is a filter/transform/array_max
    chain evaluated per frontier row in codegen. The frontier itself
    never shuffles — the whole gate is map-side, the same
    broadcast-literal discipline as the URL quality filter."""
    a = agent.lower()
    cand = rules.withColumn(
        "_pri",
        F.when(F.col("agent") == F.lit(a), F.lit(2)).otherwise(F.lit(1)),
    ).where((F.col("agent") == F.lit(a)) | (F.col("agent") == "*"))
    best = cand.groupBy(host_col).agg(F.max("_pri").alias("_best"))
    sel = cand.join(best, host_col).where(F.col("_pri") == F.col("_best"))
    anchored = F.col("path").endswith("$")
    body = F.when(
        anchored, F.expr("substring(path, 1, length(path) - 1)")
    ).otherwise(F.col("path"))
    esc = F.replace(
        F.replace(
            F.replace(body, F.lit("\\"), F.lit("\\\\")),
            F.lit("%"),
            F.lit("\\%"),
        ),
        F.lit("_"),
        F.lit("\\_"),
    )
    compiled = sel.select(
        host_col,
        F.struct(
            F.length("path").cast("long").alias("rule_len"),
            (F.col("directive") == "allow").cast("int").alias("is_allow"),
            F.col("path").alias("rule_path"),
            F.concat(
                F.replace(esc, F.lit("*"), F.lit("%")),
                F.when(anchored, F.lit("")).otherwise(F.lit("%")),
            ).alias("pattern"),
        ).alias("_rule"),
    )
    per_host = compiled.groupBy(host_col).agg(
        F.collect_list("_rule").alias("_rules")
    )
    joined = frontier.join(F.broadcast(per_host), host_col, "left")
    winner = F.expr(
        f"array_max(transform("
        f"  filter(_rules, r -> {path_col} LIKE r.pattern ESCAPE '\\\\'),"
        f"  r -> struct(r.rule_len, r.is_allow, r.rule_path)))"
    )
    return (
        joined.withColumn("_w", winner)
        .select(
            *frontier.columns,
            F.coalesce(F.col("_w.is_allow"), F.lit(1))
            .cast("int")
            .alias("allowed"),
            F.col("_w.rule_path").alias("rule_path"),
        )
    )


def recrawl_priority(
    history: DataFrame,
    now_epoch: int,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Fetch history -> per-URL recrawl signals: (url, n_fetches,
    n_changes, last_epoch, span_s, age_s, rate_ppm_day, priority_ppm).
    The freshness half of frontier management (robots = compliance,
    schedule_frontier = rate): a crawler that refetches everything
    equally wastes its budget on static pages — the standard move
    (Cho & Garcia-Molina's change-frequency estimators) is to estimate
    each URL's change rate from its OWN fetch history and prioritize
    by expected staleness.

    Pinned exact-integer algebra (no floats enter the output):

      * a CHANGE is a fetch whose content hash differs from the
        previous fetch of the same URL (lag over (ts, hash) — the hash
        tiebreak makes equal-timestamp runs deterministic); the first
        fetch is not a change.
      * span_s = last - first fetch epoch; age_s = now - last fetch.
      * rate_ppm_day = (n_changes * 86400 * 10^6) DIV max(span_s, 1) —
        observed changes per day, parts-per-million.
      * priority_ppm = (n_changes * age_s * 10^6) DIV max(span_s, 1) —
        the expected number of changes since the last fetch (the
        staleness a refetch would clear), x10^6. Single-fetch URLs
        report 0 on both (no evidence); callers blend in their own
        discovery prior. Feed ``priority_ppm`` straight into
        :func:`schedule_frontier` as the priority column.

    100 TB shape: ONE url-keyed window (per-URL histories are short —
    the sort is bounded by refetch count) + ONE map-side-combinable
    groupBy; output is URL-sized. ``now_epoch`` is a caller-pinned
    epoch-seconds literal so reruns are reproducible (no wall-clock in
    the plan)."""
    w = Window.partitionBy(url_col).orderBy(F.asc(ts_col), F.asc(hash_col))
    ep = F.unix_timestamp(F.col(ts_col)).cast("long")
    marked = history.select(
        F.col(url_col).alias("url"),
        ep.alias("_ep"),
        (
            F.col(hash_col)
            != F.lag(hash_col).over(w)
        ).cast("long").alias("_chg"),
    )
    agg = marked.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.coalesce(F.sum("_chg"), F.lit(0)).cast("long").alias("n_changes"),
        F.min("_ep").alias("_first"),
        F.max("_ep").alias("last_epoch"),
    )
    span = (F.col("last_epoch") - F.col("_first")).cast("long")
    age = (F.lit(int(now_epoch)) - F.col("last_epoch")).cast("long")
    denom = F.greatest(span, F.lit(1).cast("long"))
    return agg.select(
        "url",
        "n_fetches",
        "n_changes",
        "last_epoch",
        span.alias("span_s"),
        age.alias("age_s"),
        F.expr(
            "(n_changes * 86400000000) div "
            "greatest(last_epoch - _first, 1)"
        ).alias("rate_ppm_day"),
        (
            (F.col("n_changes") * age * F.lit(1000000)) .cast("long")
        ).alias("_num"),
    ).select(
        "url",
        "n_fetches",
        "n_changes",
        "last_epoch",
        "span_s",
        "age_s",
        "rate_ppm_day",
        F.expr("_num div greatest(span_s, 1)").alias("priority_ppm"),
    )


def schedule_frontier(
    frontier: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str = "priority",
    limit: int | None = None,
) -> DataFrame:
    """(host, url, priority, pos, sched_rank): the politeness-interleaved
    fetch order. ``limit`` keeps only the first N of the total order (the
    current scheduling wave) via orderBy+limit (TakeOrderedAndProject —
    never a full sort), then numbers only those N rows.

    With ``limit=None`` the full frontier is still never globally
    sorted: sched_rank comes from per-``pos``-band row_numbers plus a
    broadcast cumulative band-size offset — identical output to a global
    row_number over (pos, priority desc, url), because the total order
    sorts on pos first. The only single-partition window runs over the
    band-count relation (one row per distinct pos, i.e. bounded by the
    deepest host queue — a count-sized relation, not the frontier),
    the same shape as export.train_order's shard offsets. Round-4 review
    flagged the previous unbounded default as the repo's one reachable
    global row_number; this removes it from every code path."""
    wh = Window.partitionBy(host_col).orderBy(
        F.desc(priority_col), F.asc(url_col)
    )
    ranked = frontier.select(
        host_col, url_col, priority_col
    ).withColumn("pos", F.row_number().over(wh).cast("long"))
    total = [F.asc("pos"), F.desc(priority_col), F.asc(url_col)]
    if limit is not None:
        ranked = ranked.orderBy(*total).limit(limit)
        wg = Window.orderBy(*total)
        return ranked.withColumn(
            "sched_rank", F.row_number().over(wg).cast("long")
        )
    wb = Window.partitionBy("pos").orderBy(
        F.desc(priority_col), F.asc(url_col)
    )
    in_band = ranked.withColumn(
        "_band_rank", F.row_number().over(wb).cast("long")
    )
    wcum = Window.orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        ranked.groupBy("pos")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset", F.coalesce(F.sum("_n").over(wcum), F.lit(0))
        )
        .select("pos", "_offset")
    )
    return (
        in_band.join(F.broadcast(offsets), "pos")
        .select(
            host_col,
            url_col,
            priority_col,
            "pos",
            (F.col("_offset") + F.col("_band_rank"))
            .cast("long")
            .alias("sched_rank"),
        )
    )
