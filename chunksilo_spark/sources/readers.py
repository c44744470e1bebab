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


def _dechunk(body: bytes) -> bytes | None:
    """Decode HTTP/1.1 chunked transfer framing; None on malformed."""
    out = []
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return None
        try:
            size = int(body[pos:eol].split(b";")[0], 16)
        except ValueError:
            return None
        if size == 0:
            return b"".join(out)
        start = eol + 2
        end = start + size
        if end > len(body):
            return None
        out.append(body[start:end])
        pos = end + 2  # skip the chunk's trailing CRLF


def _warc_raw_records(data: bytes):
    """Yield (headers, payload) for every syntactically intact WARC record
    in ``data`` — the byte walk shared by the response parser (WARC) and
    the conversion parser (WET). Header keys are lowercased bytes. The
    skip/resync/truncation discipline documented on
    :func:`parse_warc_records` lives here."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/1.", pos)
        if start < 0:
            return
        ver_eol = data.find(b"\r\n", start)
        if ver_eol < 0:
            return
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers = {}
        for line in data[ver_eol + 2:head_end].split(b"\r\n"):
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers[b"content-length"])
        except (KeyError, ValueError):
            pos = head_end + 4  # resync at the next version marker
            continue
        payload_start = head_end + 4
        if payload_start + length > n:
            return  # truncated shard tail: skip, never emit a partial body
        payload = data[payload_start:payload_start + length]
        pos = payload_start + length
        yield headers, payload


def parse_warc_records(data: bytes):
    """Yield (uri, iso_date, body_bytes, record_id, http_status) for every
    WARC ``response`` record in ``data``.

    Accepts WARC/1.0 and WARC/1.1 version lines and case-insensitive
    record types. Bodies are HTTP-decoded: chunked transfer framing is
    removed and Content-Encoding gzip/x-gzip is decompressed. Records are
    SKIPPED (convert-or-skip — a bad record or truncated tail must not
    kill the shard) when: Content-Length is missing/invalid, the declared
    length runs past end-of-data (truncated shard), the chunked framing
    or gzip body is malformed, or WARC-Target-URI/WARC-Date are absent.
    Angle-bracket URI wrapping (<https://...>, the WARC/1.0 ABNF form) is
    stripped. Resync after a record with a bad header block is heuristic
    (scan for the next version marker) — bytes inside an unconsumed
    payload could in principle fabricate a record, which the
    Content-Length bounds check above makes harmless-but-skippable.
    Pure function so the pytest oracle parses the same bytes the UDF
    does."""
    import gzip as _gzip

    for headers, payload in _warc_raw_records(data):
        if headers.get(b"warc-type", b"").lower() != b"response":
            continue
        uri = headers.get(b"warc-target-uri", b"").strip(b"<>")
        date = headers.get(b"warc-date")
        if not uri or not date:
            continue
        # payload = HTTP response: status line + headers, blank line, body
        http_end = payload.find(b"\r\n\r\n")
        if http_end < 0:
            continue
        http_head = payload[:http_end]
        body = payload[http_end + 4:]
        status_line = http_head.split(b"\r\n", 1)[0]
        parts = status_line.split()
        status = parts[1].decode("ascii", "replace") if len(parts) > 1 else ""
        hh = {}
        for line in http_head.split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                hh[k.strip().lower()] = v.strip().lower()
        if b"chunked" in hh.get(b"transfer-encoding", b""):
            body = _dechunk(body)
            if body is None:
                continue
        if hh.get(b"content-encoding") in (b"gzip", b"x-gzip"):
            try:
                body = _gzip.decompress(body)
            except OSError:
                continue
        yield (
            uri.decode("utf-8", "replace"),
            date.decode("ascii", "replace"),
            body,
            headers.get(b"warc-record-id", b"").decode("ascii", "replace"),
            status,
        )


def parse_wet_records(data: bytes):
    """Yield (uri, iso_date, text, record_id) for every WARC ``conversion``
    record — the WET layout (Common Crawl's pre-extracted text sibling of
    WARC): the payload IS the extracted UTF-8 text, no HTTP envelope, so
    there is no status/chunked/gzip handling. Same skip discipline and
    same pure-function contract as :func:`parse_warc_records` (the pytest
    oracle parses the same bytes the UDF does)."""
    for headers, payload in _warc_raw_records(data):
        if headers.get(b"warc-type", b"").lower() != b"conversion":
            continue
        uri = headers.get(b"warc-target-uri", b"").strip(b"<>")
        date = headers.get(b"warc-date")
        if not uri or not date:
            continue
        yield (
            uri.decode("utf-8", "replace"),
            date.decode("ascii", "replace"),
            payload.decode("utf-8", "replace"),
            headers.get(b"warc-record-id", b"").decode("ascii", "replace"),
        )


def read_wet_pages(
    spark: SparkSession,
    path: str,
    batch_rows: int = 2000,
) -> DataFrame:
    """WET archives -> pages with ``text`` pre-filled and ``html`` null
    (the extraction already happened upstream — stage 1's decode step
    passes these rows straight through to chunking). Same one-task-per-
    shard / multi-member-gzip / batched-flush shape as
    :func:`read_warc_pages`."""
    import datetime as dt
    from typing import Iterator

    import pandas as pd

    def flush(rows):
        return pd.DataFrame(
            {
                "url": rows["url"],
                "warc_ts": pd.to_datetime(rows["warc_ts"], utc=True),
                "html": [None] * len(rows["url"]),
                "text": rows["text"],
                "lang": [None] * len(rows["url"]),
                "extras": rows["extras"],
            }
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if fpath.endswith(".gz"):
                    try:
                        data = gzip.decompress(data)  # multi-member ok
                    except OSError:
                        continue  # unreadable shard: skip, don't kill
                rows = {"url": [], "warc_ts": [], "text": [], "extras": []}
                for uri, date, text, rec_id in parse_wet_records(data):
                    try:
                        ts = dt.datetime.fromisoformat(
                            date.replace("Z", "+00:00")
                        ).astimezone(dt.timezone.utc)
                    except ValueError:
                        ts = None
                    rows["url"].append(uri)
                    rows["warc_ts"].append(ts)
                    rows["text"].append(text)
                    rows["extras"].append(
                        {
                            "source_format": "wet",
                            "warc_file": fpath,
                            "warc_record_id": rec_id,
                        }
                    )
                    if len(rows["url"]) >= batch_rows:
                        yield flush(rows)
                        rows = {
                            "url": [], "warc_ts": [], "text": [], "extras": []
                        }
                if rows["url"]:
                    yield flush(rows)

    raw = spark.read.format("binaryFile").load(path)
    return raw.select("path", "content").mapInPandas(run, schema=PAGES_SCHEMA)


def read_warc_pages(
    spark: SparkSession,
    path: str,
    statuses: tuple[str, ...] = ("200",),
    batch_rows: int = 2000,
) -> DataFrame:
    """WARC archives -> pages. One task per file (``binaryFile`` — a
    Common Crawl shard is ~1 GB and gzip members can't be split mid-file
    anyway; parallelism comes from the tens of thousands of shards per
    crawl). ``.gz`` files are decompressed with multi-member gzip (the CC
    per-record-gzip layout). text/lang are null — stage 1 derives them.

    Only responses whose HTTP status is in ``statuses`` (default: 200)
    become pages — 3xx redirect stubs and 4xx/5xx error boilerplate would
    otherwise pollute the corpus and form giant near-dup clusters; the
    status rides in ``extras['http_status']`` regardless. Rows are
    yielded in ``batch_rows`` chunks so worker memory holds one batch of
    bodies, not a whole decompressed shard's worth, on top of the shard
    bytes themselves. Timestamps are parsed tz-aware UTC (WARC-Date is
    always Zulu) so the stored instant is correct under ANY Spark session
    timezone — a naive datetime would be reinterpreted in session-local
    time."""
    raw = spark.read.format("binaryFile").load(path)
    return warc_pages_from_blobs(
        raw.select("path", "content"), statuses=statuses,
        batch_rows=batch_rows,
    )


def warc_pages_from_blobs(
    blobs: DataFrame,
    statuses: tuple[str, ...] = ("200",),
    batch_rows: int = 2000,
) -> DataFrame:
    """(path string, content binary) -> pages: the in-plan twin of
    :func:`read_warc_pages` — same parse (``parse_warc_records``), same
    status gate, same batched flush — over an ALREADY-LOADED relation of
    WARC shard bytes instead of a ``binaryFile`` scan. Two uses: object
    stores whose listings arrive as a DataFrame (manifest-driven ingest —
    join the manifest to fetched bytes, parse in place), and the driver
    oracle's round-trip check (synthesize WARC bytes in-plan from the
    documents table, parse them back, compare against the direct
    derivation — the parser itself becomes hash-checkable)."""
    import datetime as dt
    from typing import Iterator

    import pandas as pd

    def flush(rows):
        return pd.DataFrame(
            {
                "url": rows["url"],
                "warc_ts": pd.to_datetime(rows["warc_ts"], utc=True),
                "html": rows["html"],
                "text": [None] * len(rows["url"]),
                "lang": [None] * len(rows["url"]),
                "extras": rows["extras"],
            }
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if fpath.endswith(".gz"):
                    try:
                        data = gzip.decompress(data)  # multi-member ok
                    except OSError:
                        continue  # unreadable shard: skip, don't kill
                rows = {"url": [], "warc_ts": [], "html": [], "extras": []}
                for uri, date, body, rec_id, status in parse_warc_records(
                    data
                ):
                    if status not in statuses:
                        continue
                    try:
                        ts = dt.datetime.fromisoformat(
                            date.replace("Z", "+00:00")
                        ).astimezone(dt.timezone.utc)
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
                            "http_status": status,
                        }
                    )
                    if len(rows["url"]) >= batch_rows:
                        yield flush(rows)
                        rows = {
                            "url": [], "warc_ts": [], "html": [], "extras": []
                        }
                if rows["url"]:
                    yield flush(rows)

    return blobs.select("path", "content").mapInPandas(
        run, schema=PAGES_SCHEMA
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


def surt_key_col(url: "F.Column") -> "F.Column":
    """Column twin of ``functions/urls.surt_key`` (pinned algebra there):
    scheme-insensitive http(s) gate, userinfo/default-port/www-label
    drops, reversed comma-joined host labels (non-default port appended
    after the last reversed label), lowercased path and ``&``-sorted
    lowercased query. Pure JVM regexp/split/array ops — whole-stage
    codegen, no Python per row; non-http(s) urls -> NULL."""
    from ..functions import urls as U

    pat = r"(?s)^([hH][tT][tT][pP][sS]?)://([^/?#]*)([^?#]*)(.*)$"
    u = F.regexp_replace(
        F.regexp_replace(url, f"^{U.WS_CLASS}+|{U.WS_CLASS}+$", ""),
        r"(?s)#.*$", "",
    )
    scheme = F.regexp_extract(u, pat, 1)
    auth = F.lower(F.regexp_extract(u, pat, 2))
    auth = F.element_at(F.split(auth, "@"), -1)
    auth = F.regexp_replace(auth, r"\.$", "")
    auth = F.regexp_replace(auth, r":(80|443)$", "")
    auth = F.regexp_replace(auth, r"^www\d*\.", "")
    hp = F.split(auth, ":", 2)
    host = F.element_at(hp, 1)
    port = F.when(F.size(hp) > 1, F.element_at(hp, 2)).otherwise(F.lit(""))
    host_key = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
    )
    path = F.regexp_extract(u, pat, 3)
    path = F.lower(F.when(path == "", F.lit("/")).otherwise(path))
    rest = F.regexp_extract(u, pat, 4)
    kept = F.array_sort(
        F.filter(
            F.split(F.lower(F.substring(rest, 2, 2147483646)), "&"),
            lambda p: p != "",
        )
    )
    q = F.when(
        rest.startswith("?") & (F.size(kept) > 0),
        F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(
        F.concat(host_key, F.lit(")"), path, q)
    )


def cdx_records(
    pages: DataFrame,
    sort_parts: int | None = None,
) -> DataFrame:
    """pages (url, warc_ts, html, extras) -> CDX-style archive index
    rows (urlkey, cdx_ts, url, digest, n_bytes, warc_file, is_revisit):
    the lookup index every web archive writes beside its WARCs (the
    Wayback / Common Crawl cdx convention — urlkey is the SURT so one
    domain's records are a contiguous key range; ``cdx_ts`` is the
    14-digit yyyyMMddHHmmss capture time).

    Pinned: digest = md5 of the FULL decoded body (standing in for
    CDX11's sha1-b32 — same role: capture identity for revisit dedup);
    ``is_revisit`` marks every capture of a digest after its first
    (order: cdx_ts, url, warc_file — deterministic under timestamp
    ties), the archive's storage-dedup signal: a revisit row can point
    at the original's bytes instead of storing them again.

    100 TB shape: one projection (surt/md5/length in codegen) plus ONE
    digest-keyed window whose partitions are duplicate-cluster-sized.
    With ``sort_parts`` the relation is range-partitioned on
    (urlkey, cdx_ts) and sorted within partitions — the distributed way
    to emit a globally-sorted CDX file set (part k's max key <= part
    k+1's min key), no single-node sort anywhere."""
    from pyspark.sql.window import Window

    rows = pages.select(
        surt_key_col(F.col("url")).alias("urlkey"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("cdx_ts"),
        "url",
        F.md5(F.col("html")).alias("digest"),
        F.octet_length("html").cast("long").alias("n_bytes"),
        F.element_at("extras", F.lit("warc_file")).alias("warc_file"),
    )
    w = Window.partitionBy("digest").orderBy("cdx_ts", "url", "warc_file")
    out = rows.withColumn("is_revisit", F.row_number().over(w) > 1)
    if sort_parts:
        out = out.repartitionByRange(
            sort_parts, "urlkey", "cdx_ts"
        ).sortWithinPartitions("urlkey", "cdx_ts")
    return out


def sniff_charset_col(html: "F.Column", probe_bytes: int = 1024) -> "F.Column":
    """Declared/BOM character set of a raw html BINARY column, or NULL
    when nothing is declared (callers treat null as utf-8, the WHATWG
    default) — the first decision real web ingest makes, since a crawl
    delivers bytes, not strings, and mis-decoding silently corrupts
    every downstream token.

    Pinned sniff order (a codegen subset of the WHATWG encoding sniff):

      1. byte-order marks: EF BB BF -> 'utf-8', FF FE -> 'utf-16le',
         FE FF -> 'utf-16be' (BOM beats any later declaration);
      2. else the FIRST charset declaration in the first
         ``probe_bytes`` bytes, decoded as latin-1 (every byte maps to
         a codepoint, so the probe never throws): matches both
         ``<meta charset=X>`` and the http-equiv
         ``content="text/html; charset=X"`` spellings,
         case-insensitive, quotes optional; the token is lowercased
         and 'utf8' is folded to 'utf-8';
      3. else NULL.

    Pure per-row codegen (substring/decode/regexp on the binary) —
    zero shuffles, zero Python."""
    head = F.substring(html, 1, int(probe_bytes))
    probe = F.lower(F.decode(head, "ISO-8859-1"))
    decl = F.regexp_extract(
        probe,
        r"""charset\s*=\s*["']?\s*([a-z0-9._:\-]+)""",
        1,
    )
    decl = F.when(decl == "utf8", F.lit("utf-8")).otherwise(decl)
    bom3 = F.hex(F.substring(html, 1, 3))
    bom2 = F.hex(F.substring(html, 1, 2))
    return (
        F.when(bom3 == "EFBBBF", F.lit("utf-8"))
        .when(bom2 == "FFFE", F.lit("utf-16le"))
        .when(bom2 == "FEFF", F.lit("utf-16be"))
        .when(decl != "", decl)
        .otherwise(F.lit(None).cast("string"))
    )
