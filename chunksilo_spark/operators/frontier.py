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
    "crawl_delays",
    "parse_robots",
    "robots_filter",
    "recrawl_priority",
    "crawl_budget",
    "parse_sitemaps",
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
    agents, rules = _robots_groups(
        robots, host_col, text_col, ("allow", "disallow")
    )
    return agents.join(rules, [host_col, "_run"]).select(
        host_col, "agent", "directive", F.col("value").alias("path")
    )


def _robots_groups(
    robots: DataFrame,
    host_col: str,
    text_col: str,
    directives: tuple,
) -> tuple:
    """Shared RFC 9309 group-model tagging: -> (agents, rules) keyed by
    (host, _run). ``agents`` is every user-agent binding of each group
    run; ``rules`` the non-empty-value lines of the requested
    ``directives`` bound to their run. One definition site so
    :func:`parse_robots` (allow/disallow) and :func:`crawl_delays`
    (crawl-delay) parse the SAME group structure."""
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
        .where(F.col("directive").isin("user-agent", *directives))
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
    ).select(host_col, "_run", "directive", "value")
    return agents, rules


def crawl_delays(
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Per-host ``Crawl-delay`` for ``agent`` -> (host, delay_s bigint):
    the de-facto rate directive (not in RFC 9309, but honored by
    Bing/Yandex-class crawlers and ubiquitous in real robots.txt) — the
    missing input between :func:`robots_filter` (may I fetch?) and
    :func:`schedule_frontier` (in what order?): HOW FAST. Compose:
    ``fetch_after_s = (pos - 1) * delay_s`` on the scheduler output
    spaces each host's queue by its requested delay.

    Pinned semantics, same group model as :func:`parse_robots` (one
    shared tagging pass — ``_robots_groups``):

      * group selection: a parseable delay from the exact agent's
        groups wins when one exists, else the ``*`` groups' delays
        apply; a host with no parseable delay in either emits NO row —
        callers supply their own default.
      * the value must parse as a NON-NEGATIVE integer-or-decimal
        number of seconds; decimals truncate to whole seconds (exact
        bigint out), malformed values are dropped.
      * several delay lines in the selected groups -> the MAX wins
        (the conservative read, and a combinable aggregate).

    100 TB shape: the same bounded per-host line windows as
    parse_robots plus one combinable max-agg; output is host-sized."""
    a = agent.lower()
    agents, rules = _robots_groups(
        robots, host_col, text_col, ("crawl-delay",)
    )
    bound = agents.join(rules, [host_col, "_run"]).where(
        (F.col("agent") == F.lit(a)) | (F.col("agent") == "*")
    )
    num = F.regexp_extract(F.col("value"), r"^(\d+(?:\.\d+)?)$", 1)
    cand = bound.select(
        host_col,
        F.when(F.col("agent") == F.lit(a), F.lit(2))
        .otherwise(F.lit(1))
        .alias("_pri"),
        F.when(num != "", F.floor(num.cast("double")).cast("long"))
        .alias("_delay"),
    ).where(F.col("_delay").isNotNull())
    best = cand.groupBy(host_col).agg(F.max("_pri").alias("_best"))
    return (
        cand.join(best, host_col)
        .where(F.col("_pri") == F.col("_best"))
        .groupBy(host_col)
        .agg(F.max("_delay").alias("delay_s"))
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


def _xml_unescape(col: "F.Column") -> "F.Column":
    """The five XML entities, ``&amp;`` LAST so ``&amp;lt;`` decodes to
    the literal ``&lt;`` (single-pass, the protocol's escaping is one
    level deep)."""
    out = col
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


_CHANGEFREQS = (
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never",
)

# W3C datetime as sitemaps.org uses it: date, optionally 'T'-time with
# optional fractional seconds and optional Z / +-hh:mm offset
_W3C_RE = (
    r"^(\d{4})-(\d{2})-(\d{2})"
    r"(?:T(\d{2}):(\d{2}):(\d{2})(?:\.\d+)?(Z|[+-]\d{2}:\d{2})?)?$"
)


def parse_sitemaps(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "xml",
) -> DataFrame:
    """sitemaps.org XML corpus (one row per fetched sitemap:
    ``(host, xml)``) -> the entry relation (host, kind, loc, lastmod,
    lastmod_epoch, changefreq, priority_ppm, same_host) — the DISCOVERY
    quarter of frontier management (robots = compliance,
    schedule_frontier = rate, recrawl_priority = freshness,
    crawl_budget = spend): sitemaps seed the frontier with the URLs a
    host WANTS crawled, plus freshness hints that feed straight into
    recrawl scheduling.

    Protocol semantics pinned (sitemaps.org/protocol.html):

      * both document kinds in one pass: ``<urlset>`` entries emit
        ``kind='url'``, ``<sitemapindex>`` entries emit
        ``kind='sitemap'`` (the child sitemaps a fetcher must recurse
        into — a ledger join away from incremental sitemap ingestion).
      * ``<loc>`` is required; entries without one are dropped. The
        five XML entities are decoded (the protocol REQUIRES entity-
        escaped URLs); surrounding whitespace is trimmed. CDATA is not
        interpreted (machine-generated sitemaps entity-escape).
      * ``<lastmod>`` (W3C datetime) is kept raw AND normalized to
        ``lastmod_epoch`` (bigint epoch seconds) by EXACT integer
        algebra: ISO date via ``datediff`` (unambiguous in any engine)
        x 86400, plus hh/mm/ss, minus the numeric zone offset; a bare
        date or missing offset is pinned to UTC; fractional seconds
        truncate. Malformed values -> null epoch, raw preserved.
      * ``<changefreq>`` is lowercased and gated to the protocol's
        seven tokens, else null; ``<priority>`` becomes exact-integer
        ``priority_ppm`` (decimal x 10^6), defaulting to the
        protocol's 0.5 -> 500000 when absent, null when unparseable.
      * ``same_host`` flags whether loc's authority equals the
        sitemap's host (the protocol's location-scope rule) — emitted
        as a column, not a silent drop, so cross-host submissions are
        auditable (index files legitimately point off-host on CDNs).

    100 TB shape: pure per-row codegen — comment strip, one
    ``split``/``explode`` per kind (a sitemap is <= 50k entries by
    spec, so a row fans out boundedly), regexp field extraction, zero
    shuffles and zero Python. Feed the output to
    :func:`robots_filter` -> :func:`schedule_frontier`."""
    x = sitemaps.select(
        F.col(host_col).alias("host"),
        F.regexp_replace(
            F.col(xml_col), r"(?s)<!--.*?-->", ""
        ).alias("_x"),
    )

    def entries(kind: str) -> DataFrame:
        piece = F.explode(F.split(F.col("_x"), f"</{kind}>")).alias("_p")
        segs = x.select("host", piece).where(
            F.col("_p").contains(f"<{kind}>")
        )
        block = F.element_at(F.split(F.col("_p"), f"<{kind}>"), -1)
        return segs.select(
            "host", F.lit(kind).alias("kind"), block.alias("_b")
        )

    e = entries("url").unionByName(entries("sitemap"))
    loc = _xml_unescape(
        F.regexp_extract(F.col("_b"), r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    )
    lastmod = F.regexp_extract(
        F.col("_b"), r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1
    )
    cf = F.lower(
        F.regexp_extract(
            F.col("_b"), r"(?s)<changefreq>\s*(.*?)\s*</changefreq>", 1
        )
    )
    pr = F.regexp_extract(
        F.col("_b"), r"(?s)<priority>\s*(.*?)\s*</priority>", 1
    )
    rows = e.select(
        "host",
        "kind",
        loc.alias("loc"),
        F.when(lastmod != "", lastmod).alias("lastmod"),
        F.when(cf.isin(*_CHANGEFREQS), cf).alias("changefreq"),
        F.when(pr == "", F.lit(500000).cast("long"))
        .otherwise(
            (pr.try_cast("decimal(9,6)") * 1000000).cast("long")
        )
        .alias("priority_ppm"),
    ).where(F.col("loc") != "")

    def grp(i: int) -> "F.Column":
        return F.regexp_extract(F.col("lastmod"), _W3C_RE, i)

    day_epoch = (
        F.datediff(
            F.try_to_date(
                F.concat_ws("-", grp(1), grp(2), grp(3)), "yyyy-M-d"
            ),
            F.lit("1970-01-01").cast("date"),
        ).cast("long")
        * 86400
    )
    tod = (
        F.coalesce(grp(4).try_cast("long"), F.lit(0)) * 3600
        + F.coalesce(grp(5).try_cast("long"), F.lit(0)) * 60
        + F.coalesce(grp(6).try_cast("long"), F.lit(0))
    )
    off = F.when(
        grp(7).rlike(r"^[+-]"),
        (
            F.concat(F.substring(grp(7), 1, 1), F.lit("1")).cast("long")
            * (
                F.substring(grp(7), 2, 2).cast("long") * 3600
                + F.substring(grp(7), 5, 2).cast("long") * 60
            )
        ),
    ).otherwise(F.lit(0))
    epoch = F.when(
        F.col("lastmod").rlike(_W3C_RE), day_epoch + tod - off
    ).cast("long")
    loc_host = F.lower(
        F.regexp_extract(
            F.col("loc"), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
        )
    )
    return rows.select(
        "host",
        "kind",
        "loc",
        "lastmod",
        epoch.alias("lastmod_epoch"),
        "changefreq",
        "priority_ppm",
        (loc_host == F.lower(F.col("host"))).alias("same_host"),
    )


def crawl_budget(
    hosts: DataFrame,
    total_budget: int,
    host_col: str = "host",
    weight_col: str = "weight",
    bands: int = 1024,
) -> DataFrame:
    """Apportion a global fetch budget across hosts proportionally to a
    weight (priority mass, recrawl demand, past yield) -> (host, weight,
    quota) with ``sum(quota) == total_budget`` EXACTLY — Hamilton's
    largest-remainder method, the standard exact apportionment (used for
    seats-in-parliament for the same reason it fits a crawl: floors
    alone under-spend the budget, naive rounding over- or under-shoots).

    Pinned exact-integer algebra: with W = sum(weight),
    ``floor_i = (total * w_i) div W`` and ``rem_i = (total * w_i) mod
    W``; the ``R = total - sum(floor_i)`` leftover seats go to the R
    largest remainders (ties: host asc), so every output is a bigint
    and the result is hash-stable. Caller contract: weights >= 0,
    W > 0, and ``total_budget * max(w_i)`` fits a bigint.

    100 TB shape: the host relation is domain-count-sized (orders of
    magnitude below the corpus), but even so there is NO global sort:
    the top-R-by-remainder selection uses the same banded-rank trick as
    :func:`schedule_frontier` — row_numbers inside ``bands`` fixed
    remainder bands (band = rem*bands div W, monotone in rem, so
    band-major order IS remainder order) plus a broadcast cumulative
    band-size offset; the only single-partition window runs over the
    <= ``bands``-row band-count relation. Everything else is one 1-row
    broadcast total and map-side arithmetic."""
    if total_budget < 0:
        raise ValueError("crawl_budget needs total_budget >= 0")
    base = hosts.select(
        F.col(host_col).alias("host"),
        F.col(weight_col).cast("long").alias("weight"),
    )
    tot = base.agg(
        F.sum("weight").cast("long").alias("_w_sum")
    )
    t = F.lit(int(total_budget)).cast("long")
    quotas = (
        base.crossJoin(F.broadcast(tot))
        .select(
            "host",
            "weight",
            F.expr("(%s * weight) div greatest(_w_sum, 1)" % int(total_budget))
            .alias("_floor"),
            F.expr("(%s * weight) %% greatest(_w_sum, 1)" % int(total_budget))
            .alias("_rem"),
            F.expr(
                "((%s * weight) %% greatest(_w_sum, 1)) * %d"
                " div greatest(_w_sum, 1)" % (int(total_budget), int(bands))
            ).alias("_band"),
        )
    )
    seats = quotas.agg(
        (t - F.sum("_floor")).cast("long").alias("_r")
    )
    wb = Window.partitionBy("_band").orderBy(
        F.desc("_rem"), F.asc("host")
    )
    in_band = quotas.withColumn(
        "_band_rank", F.row_number().over(wb).cast("long")
    )
    wcum = Window.orderBy(F.desc("_band")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        quotas.groupBy("_band")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset", F.coalesce(F.sum("_n").over(wcum), F.lit(0))
        )
        .select("_band", "_offset")
    )
    return (
        in_band.join(F.broadcast(offsets), "_band")
        .crossJoin(F.broadcast(seats))
        .select(
            "host",
            "weight",
            (
                F.col("_floor")
                + F.when(
                    F.col("_offset") + F.col("_band_rank") <= F.col("_r"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("quota"),
        )
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
