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
    reference's directory scanner (S1/S2).

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
