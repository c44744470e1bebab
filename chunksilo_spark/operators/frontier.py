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

__all__ = ["schedule_frontier"]


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
