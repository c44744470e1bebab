"""Event-time windowed aggregation with watermarking over the crawl stream.

The reference has no event-time semantics (SURVEY §2.9) — this operator is
part of the beyond-the-reference streaming surface: per-site crawl-rate
monitoring with late-data tolerance. Standard Structured Streaming shape:
``withWatermark`` bounds state, tumbling ``window`` on warc_ts, hash-agg
counts (map-side combined). The same function works on a batch DataFrame
(windows without watermark) — tested equal on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def site_of(url_col) -> F.Column:
    """Host part of the url (the per-site key)."""
    # no trailing slash in the pattern: path-less urls ('https://h.example')
    # are the canonical homepage form and must not collapse into site=''
    return F.regexp_extract(url_col, r"https?://([^/]+)", 1)


def crawl_rate_per_site(
    pages: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """pages (streaming or batch) -> (window, site, n_pages, n_bytes).

    On a stream, the watermark drops rows later than ``watermark`` behind
    the max seen warc_ts and lets Spark evict window state; on a batch
    frame, withWatermark is a no-op and the result equals the batch window
    aggregation (the unit test asserts exactly that)."""
    src = pages
    if pages.isStreaming:
        src = pages.withWatermark("warc_ts", watermark)
    return (
        src.groupBy(
            F.window("warc_ts", window_duration).alias("window"),
            site_of(F.col("url")).alias("site"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("html")).alias("n_bytes"),
        )
    )
