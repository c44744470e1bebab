"""Binary-format routing in stage 1: magic-byte detection, quarantine
without a decoder, pluggable decode with one, HTML rows untouched."""

import sys

from pyspark import cloudpickle as _cloudpickle

from chunksilo_spark.functions.docformats import (
    FakeDocDecoder,
    LibDocDecoder,
    detect_format,
)
from chunksilo_spark.models import ModelSpec
from chunksilo_spark.operators import stage1_extract as s1

_cloudpickle.register_pickle_by_value(sys.modules[__name__])

PDF_BYTES = b"%PDF-1.7 fake body bytes"
DOCX_BYTES = b"PK\x03\x04 fake zip container"
HTML_BYTES = b"<html><body><h1>T</h1><p>hello world</p></body></html>"

PAGES = [
    ("u-pdf", PDF_BYTES),
    ("u-docx", DOCX_BYTES),
    ("u-html", HTML_BYTES),
]
SCHEMA = "url string, html binary"


def _pages(spark):
    rows = [(u, None, h, None, "en") for u, h in PAGES]
    return spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


class TestDetect:
    def test_magic_bytes(self):
        assert detect_format(PDF_BYTES) == "pdf"
        assert detect_format(DOCX_BYTES) == "docx"
        assert detect_format(HTML_BYTES) == "html"
        assert detect_format(b"plain text") == "html"

    def test_lib_decoder_names_the_integration(self):
        try:
            LibDocDecoder().decode("pdf", PDF_BYTES)
        except NotImplementedError as e:
            assert "pypdf" in str(e)
        else:  # pragma: no cover
            raise AssertionError("expected NotImplementedError")


class TestRouting:
    def test_no_decoder_quarantines_binary_formats(self, spark):
        docs = s1.extract_documents(_pages(spark), partitions=2)
        q = {r["url"]: r["error"] for r in s1.quarantine(docs).collect()}
        assert q == {
            "u-pdf": "ValueError: unsupported format: pdf",
            "u-docx": "ValueError: unsupported format: docx",
        }
        ok = {r["url"] for r in docs.where("ok").collect()}
        assert ok == {"u-html"}

    def test_fake_decoder_decodes_and_feeds_downstream(self, spark):
        docs = s1.extract_documents(
            _pages(spark),
            partitions=2,
            binary_decoder=ModelSpec(FakeDocDecoder),
        )
        rows = {r["url"]: r for r in docs.collect()}
        assert all(rows[u]["ok"] for u, _ in PAGES)
        # decoder output matches the driver-side kernel exactly
        want = FakeDocDecoder().decode("pdf", PDF_BYTES)
        assert rows["u-pdf"]["text"] == want
        # the ATX heading the decoder emits lands in the typed column
        assert rows["u-pdf"]["headings"][0]["text"].startswith("pdf document")
        # html rows byte-identical to the no-decoder path
        plain = {
            r["url"]: r["text"]
            for r in s1.extract_documents(_pages(spark), partitions=2)
            .where("ok")
            .collect()
        }
        assert rows["u-html"]["text"] == plain["u-html"]
        # chunking is format-agnostic on the decoded text
        chunks = s1.chunk_documents(docs).collect()
        assert {c["url"] for c in chunks} == {u for u, _ in PAGES}
