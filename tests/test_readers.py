"""Format readers normalize into the canonical pages schema and feed the
SAME stage-1 extraction — round-trip equality against the parquet path."""

import os

import pyspark.sql.functions as F

from chunksilo_spark.operators.stage1_extract import extract_documents
from chunksilo_spark.sources.corpus import pages_df
from chunksilo_spark.sources.readers import (
    read_csv_pages,
    read_jsonl_pages,
    read_text_dir,
)


def _docs_by_url(docs):
    return {
        r["url"]: (r["text"], r["ok"])
        for r in docs.select("url", "text", "ok").collect()
    }


def test_jsonl_roundtrip_same_extraction(spark, tmp_path):
    pages = pages_df(spark, 40, partitions=2)
    # jsonl carries html as a UTF-8 string: restrict to decodable rows
    decodable = pages.withColumn(
        "h", F.expr("try_validate_utf8(html)")
    ).where(F.col("h").isNotNull())
    out = str(tmp_path / "pages_jsonl")
    decodable.select(
        "url", "warc_ts", F.col("h").alias("html"), "text", "lang"
    ).write.mode("overwrite").json(out)

    got = _docs_by_url(extract_documents(read_jsonl_pages(spark, out), 2))
    want = _docs_by_url(extract_documents(decodable.drop("h"), 2))
    assert got == want and len(got) > 30


def test_csv_roundtrip_same_extraction(spark, tmp_path):
    pages = pages_df(spark, 25, partitions=2)
    decodable = pages.withColumn(
        "h", F.expr("try_validate_utf8(html)")
    ).where(F.col("h").isNotNull())
    out = str(tmp_path / "pages_csv")
    decodable.select(
        "url", "warc_ts", F.col("h").alias("html"), "text", "lang"
    ).write.mode("overwrite").option("header", True).option(
        "escape", '"'
    ).csv(out)

    got = _docs_by_url(extract_documents(read_csv_pages(spark, out), 2))
    want = _docs_by_url(extract_documents(decodable.drop("h"), 2))
    assert got == want and len(got) > 15


def test_text_dir_one_row_per_file(spark, tmp_path):
    d = tmp_path / "site"
    d.mkdir()
    (d / "a.html").write_text("<h1>Alpha</h1><p>one two three</p>")
    (d / "b.html").write_text("<p>beta page</p>")
    pages = read_text_dir(spark, str(d), lang="en")
    docs = extract_documents(pages, 2)
    by_name = {
        os.path.basename(r["url"]): r["text"] for r in docs.collect()
    }
    assert by_name == {
        "a.html": "# Alpha\n\none two three",
        "b.html": "beta page",
    }


def test_extras_provenance_flows_to_documents(spark, tmp_path):
    """Ragged metadata (SURVEY §1.3): the reader's source_format tag rides
    the extras map into documents, stage 1 layers engine keys (host) on
    top, and element_at on an absent key is null — no schema migration."""
    d = tmp_path / "site2"
    d.mkdir()
    (d / "a.html").write_text("<p>alpha content here</p>")
    pages = read_text_dir(spark, str(d), lang="en")
    docs = extract_documents(pages, 2)
    row = docs.select(
        F.element_at("extras", "source_format").alias("fmt"),
        F.element_at("extras", "nonexistent_key").alias("missing"),
        F.map_keys("extras").alias("keys"),
    ).collect()[0]
    assert row["fmt"] == "text_dir"
    assert row["missing"] is None
    assert "source_format" in row["keys"]

    # a pages table WITHOUT the optional extras column still extracts,
    # with only engine-derived keys
    plain = pages_df(spark, 5, partitions=1)
    assert "extras" not in plain.columns
    got = extract_documents(plain, 1).select("extras").collect()
    assert all(r["extras"] is not None for r in got)


class TestWarcReader:
    """WARC response records (the Common Crawl interchange) -> pages:
    round-trip a deterministically-built archive (plain + multi-member
    gzip), skip warcinfo/malformed records, feed stage 1."""

    @staticmethod
    def _warc_record(rtype, uri, date, body, rec_id="<urn:uuid:x>"):
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        headers = [b"WARC/1.0", b"WARC-Type: " + rtype]
        if uri:
            headers.append(b"WARC-Target-URI: " + uri)
        headers += [
            b"WARC-Date: " + date,
            b"WARC-Record-ID: " + rec_id.encode(),
            b"Content-Length: " + str(len(http)).encode(),
        ]
        return b"\r\n".join(headers) + b"\r\n\r\n" + http + b"\r\n\r\n"

    def _build(self):
        from chunksilo_spark.sources.corpus import build_entity_pool, generate_page

        pool = build_entity_pool()
        pages = [generate_page(i, pool) for i in range(12)]
        blob = self._warc_record(  # warcinfo: must be skipped
            b"warcinfo", None, b"2024-01-01T00:00:00Z", b"software: test"
        )
        for i, p in enumerate(pages):
            blob += self._warc_record(
                b"response",
                p["url"].encode(),
                b"2024-03-05T12:30:0%d" % (i % 10) + b"Z",
                p["html"],
                f"<urn:uuid:{i}>",
            )
        blob += b"WARC/1.0\r\nWARC-Type: response\r\ntruncated garbage"
        return pages, blob

    def test_plain_and_gzip_roundtrip(self, spark, tmp_path):
        import gzip

        from chunksilo_spark.sources.readers import (
            parse_warc_records,
            read_warc_pages,
        )

        pages, blob = self._build()
        plain_dir = tmp_path / "warc_plain"
        plain_dir.mkdir()
        (plain_dir / "shard-00000.warc").write_bytes(blob)
        gz_dir = tmp_path / "warc_gz"
        gz_dir.mkdir()
        # multi-member gzip, like Common Crawl's per-record compression
        half = len(blob) // 2
        (gz_dir / "shard-00000.warc.gz").write_bytes(
            gzip.compress(blob[:half]) + gzip.compress(blob[half:])
        )

        want = {
            uri: body
            for uri, _d, body, _r, _s in parse_warc_records(blob)
        }
        assert len(want) == 12  # oracle itself sees all responses

        for d in (plain_dir, gz_dir):
            got = {
                r["url"]: bytes(r["html"])
                for r in read_warc_pages(spark, str(d)).collect()
            }
            assert got == want, d
        rows = read_warc_pages(spark, str(plain_dir)).collect()
        one = rows[0]
        assert one["warc_ts"] is not None
        assert one["extras"]["source_format"] == "warc"
        assert one["extras"]["warc_record_id"].startswith("<urn:uuid:")
        assert one["extras"]["http_status"] == "200"
        # WARC-Date is Zulu: the stored instant must be the UTC wall time
        # regardless of session timezone handling on collect
        by_url = {r["url"]: r for r in rows}
        first = min(by_url)  # deterministic pick
        assert by_url[first]["warc_ts"].year == 2024

    def test_hardened_parsing(self, spark, tmp_path):
        """WARC/1.1 version lines, bracketed URIs, chunked bodies, gzip
        bodies, non-200 skip, truncated Content-Length skip."""
        import gzip

        from chunksilo_spark.sources.readers import parse_warc_records

        def rec(uri, body, version=b"WARC/1.0", status=b"200 OK",
                http_extra=b"", rtype=b"response"):
            http = (b"HTTP/1.1 " + status + b"\r\n"
                    b"Content-Type: text/html\r\n" + http_extra
                    + b"\r\n" + body)
            head = (version + b"\r\nWARC-Type: " + rtype
                    + b"\r\nWARC-Target-URI: " + uri
                    + b"\r\nWARC-Date: 2024-03-05T12:30:00Z"
                    + b"\r\nContent-Length: " + str(len(http)).encode())
            return head + b"\r\n\r\n" + http + b"\r\n\r\n"

        chunked = b"5\r\n<p>ab\r\n4\r\ncd</\r\n2\r\np>\r\n0\r\n\r\n"
        gz_body = gzip.compress(b"<p>zip body</p>")
        blob = (
            rec(b"https://a.example/one", b"<p>plain</p>", b"WARC/1.1")
            + rec(b"<https://a.example/two>", b"<p>bracket</p>")
            + rec(b"https://a.example/chunk", chunked,
                  http_extra=b"Transfer-Encoding: chunked\r\n")
            + rec(b"https://a.example/gz", gz_body,
                  http_extra=b"Content-Encoding: gzip\r\n")
            + rec(b"https://a.example/missing", b"<p>404 page</p>",
                  status=b"404 Not Found")
        )
        # truncated tail: declared length runs past end of data
        blob += (b"WARC/1.0\r\nWARC-Type: response\r\n"
                 b"WARC-Target-URI: https://a.example/cut\r\n"
                 b"WARC-Date: 2024-03-05T12:30:00Z\r\n"
                 b"Content-Length: 99999\r\n\r\nHTTP/1.1 200 OK\r\n\r\nxx")

        got = {
            u: (body, status)
            for u, _d, body, _r, status in parse_warc_records(blob)
        }
        assert got["https://a.example/one"][0] == b"<p>plain</p>"
        assert got["https://a.example/two"][0] == b"<p>bracket</p>"  # stripped
        assert got["https://a.example/chunk"][0] == b"<p>abcd</p>"
        assert got["https://a.example/gz"][0] == b"<p>zip body</p>"
        assert got["https://a.example/missing"][1] == "404"
        assert "https://a.example/cut" not in got  # truncated: skipped

        d = tmp_path / "warc_hard"
        d.mkdir()
        (d / "a.warc").write_bytes(blob)
        from chunksilo_spark.sources.readers import read_warc_pages

        urls = {r["url"] for r in read_warc_pages(spark, str(d)).collect()}
        # the reader additionally drops the non-200 record
        assert urls == {
            "https://a.example/one", "https://a.example/two",
            "https://a.example/chunk", "https://a.example/gz",
        }

    def test_flows_into_stage1(self, spark, tmp_path):
        from chunksilo_spark.sources.readers import read_warc_pages

        _pages, blob = self._build()
        d = tmp_path / "warc_s1"
        d.mkdir()
        (d / "a.warc").write_bytes(blob)
        docs = extract_documents(read_warc_pages(spark, str(d)), 2)
        ok = docs.where("ok").count()
        assert ok >= 10  # quarantine rows excepted, extraction runs


class TestWarcBlobs:
    def test_blob_variant_matches_file_variant(self, spark, tmp_path):
        """warc_pages_from_blobs over an in-plan (path, content) relation
        must produce exactly what read_warc_pages produces for the same
        bytes on disk (it IS the same parse — pinned here)."""
        from chunksilo_spark.sources.readers import (
            read_warc_pages,
            warc_pages_from_blobs,
        )

        pages, blob = TestWarcReader()._build()
        p = tmp_path / "shard.warc"
        p.write_bytes(blob)
        via_file = read_warc_pages(spark, str(p)).drop("extras")
        blobs = spark.createDataFrame(
            [("mem://shard.warc", bytearray(blob))],
            "path string, content binary",
        )
        via_blob = warc_pages_from_blobs(blobs).drop("extras")
        rows_f = sorted(
            (r["url"], r["warc_ts"], bytes(r["html"]))
            for r in via_file.collect()
        )
        rows_b = sorted(
            (r["url"], r["warc_ts"], bytes(r["html"]))
            for r in via_blob.collect()
        )
        assert rows_f == rows_b and len(rows_f) == len(pages)


class TestWetReader:
    """WET (conversion-record) shards: payload IS the extracted text."""

    @staticmethod
    def _wet_record(uri, date, text, rec_id="<urn:uuid:w>"):
        body = text.encode("utf-8")
        headers = [b"WARC/1.0", b"WARC-Type: conversion"]
        if uri:
            headers.append(b"WARC-Target-URI: " + uri)
        headers += [
            b"WARC-Date: " + date,
            b"WARC-Record-ID: " + rec_id.encode(),
            b"Content-Length: " + str(len(body)).encode(),
        ]
        return b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n"

    def _build(self):
        texts = [f"Extracted text of page {i}. Unicode: café {i}" for i in range(7)]
        blob = b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nsw:x\r\n\r\n"
        for i, t in enumerate(texts):
            blob += self._wet_record(
                b"https://wet.example/p%d" % i,
                b"2024-06-01T08:00:0%d" % (i % 10) + b"Z",
                t,
                f"<urn:uuid:w{i}>",
            )
        return texts, blob

    def test_parse_and_reader_roundtrip(self, spark, tmp_path):
        import gzip

        from chunksilo_spark.sources.readers import (
            parse_wet_records,
            read_wet_pages,
        )

        texts, blob = self._build()
        # pure-parser oracle
        recs = list(parse_wet_records(blob))
        assert [t for _, _, t, _ in recs] == texts
        assert all(u.startswith("https://wet.example/") for u, _, _, _ in recs)

        d_plain = tmp_path / "wet_plain"
        d_plain.mkdir()
        (d_plain / "a.warc.wet").write_bytes(blob)
        d_gz = tmp_path / "wet_gz"
        d_gz.mkdir()
        (d_gz / "a.warc.wet.gz").write_bytes(gzip.compress(blob))

        for d in (d_plain, d_gz):
            df = read_wet_pages(spark, str(d)).orderBy("url")
            rows = df.collect()
            assert [r["text"] for r in rows] == texts
            assert all(r["html"] is None for r in rows)
            assert all(r["extras"]["source_format"] == "wet" for r in rows)
            assert rows[0]["warc_ts"] is not None

    def test_response_records_ignored_and_vice_versa(self, spark):
        from chunksilo_spark.sources.readers import (
            parse_warc_records,
            parse_wet_records,
        )

        texts, wet_blob = self._build()
        # a WET parse of a response-record shard yields nothing, and the
        # response parser yields nothing from a WET shard — the shared
        # walker must not cross-contaminate record types
        http = b"HTTP/1.1 200 OK\r\n\r\n<html>x</html>"
        resp = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://r.example/\r\n"
            b"WARC-Date: 2024-06-01T00:00:00Z\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
            + http + b"\r\n\r\n"
        )
        assert list(parse_wet_records(resp)) == []
        assert list(parse_warc_records(wet_blob)) == []


class TestSurtKey:
    URLS = [
        "https://WWW.Example.COM:443/Path/X?b=2&A=1&&",
        "http://user:pw@h3.example:8080/p/9",
        "https://www2.sub.example.org./p#frag",
        "http://example.com:80/",
        "https://example.com",
        "  https://pad.example/x \t",
        "https://example.com/UPPER/case?Z=1&a=2&z=0",
        "https://example.com/?",
        "https://www.example.com/?utm_source=x",
        "http://a.b.c.d.example/deep/path/",
        "ftp://nope.example/x",
        "not a url",
        "https://example.com:9090/p?q=%2F&Q=a",
        "https://h.example/p?dup=1&dup=1&b",
    ]

    def test_kernel_column_parity(self, spark):
        from chunksilo_spark.functions.urls import surt_key
        from chunksilo_spark.sources.readers import surt_key_col

        df = spark.createDataFrame([(u,) for u in self.URLS], "url string")
        got = [
            r["k"]
            for r in df.select(surt_key_col(F.col("url")).alias("k"))
            .collect()
        ]
        assert got == [surt_key(u) for u in self.URLS]

    def test_pinned_examples(self, spark):
        from chunksilo_spark.functions.urls import surt_key

        assert surt_key(self.URLS[0]) == "com,example)/path/x?a=1&b=2"
        assert surt_key(self.URLS[1]) == "example,h3:8080)/p/9"
        assert surt_key(self.URLS[2]) == "org,example,sub)/p"
        assert surt_key(self.URLS[3]) == "com,example)/"
        assert surt_key(self.URLS[4]) == "com,example)/"
        assert surt_key(self.URLS[10]) is None
        assert surt_key(self.URLS[11]) is None

    def test_domain_subtree_is_contiguous(self, spark):
        # the point of SURT: every example.com subdomain sorts inside
        # the com,example prefix range
        from chunksilo_spark.functions.urls import surt_key

        keys = sorted(
            surt_key(u)
            for u in (
                "https://a.example.com/1",
                "https://example.com/2",
                "https://z.example.com/3",
                "https://examplf.com/x",
                "https://exampld.com/x",
            )
        )
        inside = [k for k in keys if k.startswith("com,example,")
                  or k.startswith("com,example)")]
        i = keys.index(inside[0])
        assert keys[i:i + len(inside)] == inside


class TestCdxRecords:
    def _pages(self, spark):
        import datetime as dt

        ts = dt.datetime(2025, 6, 1, 12, 0, 0, tzinfo=dt.timezone.utc)
        ts2 = dt.datetime(2025, 6, 1, 13, 0, 0, tzinfo=dt.timezone.utc)
        rows = [
            ("https://a.example/p/1", ts, b"<html>one</html>", "f1.warc"),
            ("https://a.example/p/1", ts2, b"<html>one</html>", "f2.warc"),
            ("https://b.example/p/2", ts, b"<html>two</html>", "f1.warc"),
        ]
        return spark.createDataFrame(
            [
                (u, t, h, None, None, {"warc_file": f})
                for u, t, h, f in rows
            ],
            "url string, warc_ts timestamp, html binary, text string,"
            " lang string, extras map<string,string>",
        )

    def test_fields_and_revisit(self, spark):
        from chunksilo_spark.sources.readers import cdx_records

        got = sorted(
            tuple(r) for r in cdx_records(self._pages(spark)).collect()
        )
        import hashlib

        d1 = hashlib.md5(b"<html>one</html>").hexdigest()
        d2 = hashlib.md5(b"<html>two</html>").hexdigest()
        assert got == sorted(
            [
                ("example,a)/p/1", "20250601120000",
                 "https://a.example/p/1", d1, 16, "f1.warc", False),
                ("example,a)/p/1", "20250601130000",
                 "https://a.example/p/1", d1, 16, "f2.warc", True),
                ("example,b)/p/2", "20250601120000",
                 "https://b.example/p/2", d2, 16, "f1.warc", False),
            ]
        )

    def test_sort_parts_emits_globally_sorted_ranges(self, spark):
        import datetime as dt

        from chunksilo_spark.sources.readers import cdx_records

        ts = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
        pages = spark.createDataFrame(
            [
                (f"https://h{i % 40}.example/p/{i}", ts,
                 f"body{i}".encode(), None, None, {"warc_file": "f"})
                for i in range(400)
            ],
            "url string, warc_ts timestamp, html binary, text string,"
            " lang string, extras map<string,string>",
        )
        out = cdx_records(pages, sort_parts=4)
        parts = out.select("urlkey").rdd.glom().collect()
        flat = [r["urlkey"] for p in parts for r in p]
        assert flat == sorted(flat)
        assert sum(1 for p in parts if p) >= 2


class TestSniffCharset:
    CASES = [
        (b"\xef\xbb\xbf<html>x</html>", "utf-8"),
        (b"\xff\xfeh\x00i\x00", "utf-16le"),
        (b"\xfe\xff\x00h\x00i", "utf-16be"),
        # BOM beats a contradicting later declaration
        (b"\xef\xbb\xbf<meta charset=latin-1>", "utf-8"),
        (b'<html><head><meta charset="Windows-1251"></head>', "windows-1251"),
        (b"<meta http-equiv='Content-Type'"
         b" content='text/html; charset=UTF8'>", "utf-8"),
        (b"<META CHARSET=iso-8859-2>", "iso-8859-2"),
        (b"<meta charset = 'Shift_JIS' >", "shift_jis"),
        (b"<html>no declaration</html>", None),
        # non-ascii garbage where the token would be: no match, no crash
        (b"<meta charset=\x80\xfful>", None),
    ]

    def test_pinned_cases(self, spark):
        from chunksilo_spark.sources.readers import sniff_charset_col

        df = spark.createDataFrame(
            [(h,) for h, _ in self.CASES], "html binary"
        )
        got = [
            r["c"]
            for r in df.select(
                sniff_charset_col(F.col("html")).alias("c")
            ).collect()
        ]
        assert got == [want for _, want in self.CASES]

    def test_declaration_outside_probe_window_is_ignored(self, spark):
        from chunksilo_spark.sources.readers import sniff_charset_col

        html = b"<html>" + b" " * 2000 + b"<meta charset=koi8-r>"
        df = spark.createDataFrame([(html,)], "html binary")
        assert df.select(
            sniff_charset_col(F.col("html")).alias("c")
        ).collect()[0]["c"] is None
        assert df.select(
            sniff_charset_col(F.col("html"), probe_bytes=4096).alias("c")
        ).collect()[0]["c"] == "koi8-r"
