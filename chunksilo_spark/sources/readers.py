"""Alternative input formats -> the canonical pages table
(url, warc_ts, html binary, text, lang, extras map<string,string>).

The reference ingests from heterogeneous sources (filesystem walks,
Confluence, Jira — index.py SOURCES registry); the distributed analogs are
format readers that normalize into ONE canonical schema so every downstream
stage is source-agnostic:

  * read_jsonl_pages — newline-delimited JSON crawl dumps (the most common
    web-corpus interchange; html carried as a UTF-8 string field);
  * read_csv_pages  — CSV with the same columns;
  * read_text_dir   — a directory of raw .html/.txt files, one page per
    file (wholetext), url = file path; the closest analog of the
    reference's directory scanner (S1/S2);
  * read_warc_pages — WARC/1.0 archives (the native Common Crawl
    interchange, ISO 28500): response records -> pages, parsed inside
    mapInPandas, one file per task (CC shards are ~1 GB; .warc.gz
    multi-member gzip handled), malformed records skipped per the
    convert-or-skip policy.

All readers are schema-explicit (no sampling-based inference job at 100 TB)
and lazy — Catalyst sees an ordinary scan with pushdown/pruning.

Ragged per-source metadata rides in ``extras`` (MapType(string,string)) —
the SURVEY §1.3 mapping of the reference's dynamic metadata dict
(index.py:68-87; Jira extra fields search.py:671-723): heterogeneous
sources attach whatever keys they have, downstream reads are
``element_at(extras, k)`` (null when absent) with no schema migration.
Readers tag provenance (``source_format``) here; stage 1 carries the map
into documents and adds engine-derived keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

JSONL_SCHEMA = (
    "url string, warc_ts timestamp, html string, text string, lang string"
)


def _normalize(df: DataFrame, source_format: str) -> DataFrame:
    """string html -> binary; missing optional columns -> nulls; provenance
    tag into the ragged ``extras`` map."""
    cols = set(df.columns)
    out = df
    if "text" not in cols:
        out = out.withColumn("text", F.lit(None).cast("string"))
    if "lang" not in cols:
        out = out.withColumn("lang", F.lit(None).cast("string"))
    return out.select(
        "url",
        F.col("warc_ts").cast("timestamp").alias("warc_ts"),
        F.encode(F.col("html"), "utf-8").alias("html"),
        "text",
        "lang",
        F.create_map(
            F.lit("source_format"), F.lit(source_format)
        ).alias("extras"),
    )


def read_jsonl_pages(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited JSON -> pages. Explicit schema: no inference pass."""
    return _normalize(spark.read.schema(JSONL_SCHEMA).json(path), "jsonl")


def read_csv_pages(spark: SparkSession, path: str) -> DataFrame:
    """Header CSV -> pages (html must be a quoted UTF-8 string column)."""
    return _normalize(
        spark.read.schema(JSONL_SCHEMA)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path),
        "csv",
    )


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "extras map<string,string>"
)


def parse_warc_records(data: bytes):
    """Yield (uri, iso_date, body_bytes, record_id) for every WARC/1.0
    ``response`` record in ``data``; malformed records are skipped
    (convert-or-skip — a truncated tail must not kill the shard). Pure
    function so the pytest oracle parses the same bytes the UDF does."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/1.0\r\n", pos)
        if start < 0:
            return
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers = {}
        for line in data[start + 10:head_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers[b"content-length"])
        except (KeyError, ValueError):
            pos = head_end + 4  # resync at the next record marker
            continue
        payload = data[head_end + 4:head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get(b"warc-type") != b"response":
            continue
        uri = headers.get(b"warc-target-uri")
        date = headers.get(b"warc-date")
        if not uri or not date:
            continue
        # payload = HTTP response: status line + headers, blank line, body
        http_end = payload.find(b"\r\n\r\n")
        body = payload[http_end + 4:] if http_end >= 0 else payload
        yield (
            uri.decode("utf-8", "replace"),
            date.decode("ascii", "replace"),
            body,
            headers.get(b"warc-record-id", b"").decode("ascii", "replace"),
        )


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC archives -> pages. One task per file (``binaryFile`` — a
    Common Crawl shard is ~1 GB and gzip members can't be split mid-file
    anyway; parallelism comes from the tens of thousands of shards per
    crawl). ``.gz`` files are decompressed with multi-member gzip (the CC
    per-record-gzip layout). text/lang are null — stage 1 derives them."""
    import datetime as dt
    import gzip
    from typing import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if fpath.endswith(".gz"):
                    try:
                        data = gzip.decompress(data)  # multi-member ok
                    except OSError:
                        continue  # unreadable shard: skip, don't kill
                rows = {"url": [], "warc_ts": [], "html": [], "extras": []}
                for uri, date, body, rec_id in parse_warc_records(data):
                    try:
                        ts = dt.datetime.fromisoformat(
                            date.replace("Z", "+00:00")
                        ).replace(tzinfo=None)
                    except ValueError:
                        ts = None
                    rows["url"].append(uri)
                    rows["warc_ts"].append(ts)
                    rows["html"].append(body)
                    rows["extras"].append(
                        {
                            "source_format": "warc",
                            "warc_file": fpath,
                            "warc_record_id": rec_id,
                        }
                    )
                if rows["url"]:
                    yield pd.DataFrame(
                        {
                            "url": rows["url"],
                            "warc_ts": rows["warc_ts"],
                            "html": rows["html"],
                            "text": [None] * len(rows["url"]),
                            "lang": [None] * len(rows["url"]),
                            "extras": rows["extras"],
                        }
                    )

    raw = spark.read.format("binaryFile").load(path)
    return raw.select("path", "content").mapInPandas(run, schema=PAGES_SCHEMA)


def read_text_dir(spark: SparkSession, path: str, lang: str | None = None) -> DataFrame:
    """Directory of raw html/text files -> pages: one row per file
    (wholetext), url = the file path, warc_ts = null (unknown). The S1/S2
    directory-scan analog; apply search.glob_filter on ``url`` for the
    reference's include/exclude semantics."""
    raw = (
        spark.read.format("text")
        .option("wholetext", True)
        .load(path)
        .select(
            F.input_file_name().alias("url"),
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.encode(F.col("value"), "utf-8").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit(lang).cast("string").alias("lang"),
            F.create_map(
                F.lit("source_format"), F.lit("text_dir")
            ).alias("extras"),
        )
    )
    return raw
