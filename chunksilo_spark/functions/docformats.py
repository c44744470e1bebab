"""Binary document format detection + the pluggable decoder seam (S7-S9).

The reference ingests PDFs via a parser library (S7), DOCX via
heading-aware XML walking (S8, docx_utils.py), and legacy DOC by
converting to DOCX first (S9, with the poison-file lesson: a file the
converter hangs on must be skipped, not retried forever). None of those
libraries exist in this environment, so the SEAM is built and tested while
the decoders themselves stay behind a documented integration point — the
same policy as the multimodal stubs (operators/multimodal.py):

  * ``detect_format`` — magic-byte sniffing, pure function, shared by the
    stage-1 router and tests;
  * a decoder is any object with ``decode(fmt, raw) -> str`` returning the
    extracted text in the engine's markdown-ish form (ATX headings), so
    heading extraction / line offsets / chunking downstream are
    format-agnostic;
  * ``FakeDocDecoder`` — deterministic stand-in (md5-derived body) proving
    the plumbing: routing, per-worker construction via ``models.ModelSpec``,
    headings surviving into the documents table;
  * ``LibDocDecoder`` — the real integration point; raises
    ``NotImplementedError`` naming the libraries a production deployment
    would install (pypdf / python-docx), mirroring the reference stack.

Pages whose format has NO decoder configured quarantine with
``unsupported format: <fmt>`` — the reference's convert-or-skip behavior,
distributed (a poison format never kills the job).
"""

from __future__ import annotations

import hashlib

PDF_MAGIC = b"%PDF"
ZIP_MAGIC = b"PK\x03\x04"  # docx/xlsx/pptx are zip containers


def detect_format(raw: bytes) -> str:
    """'pdf' | 'docx' | 'html' (default: treat as markup/plain text)."""
    if raw.startswith(PDF_MAGIC):
        return "pdf"
    if raw.startswith(ZIP_MAGIC):
        return "docx"
    return "html"


class FakeDocDecoder:
    """Deterministic decode stand-in: one heading naming the format plus an
    md5-derived body, so tests can assert exact routing and downstream
    heading/chunk behavior without any document library."""

    def decode(self, fmt: str, raw: bytes) -> str:
        digest = hashlib.md5(raw).hexdigest()
        return (
            f"# {fmt} document {digest[:8]}\n\n"
            f"decoded body {digest[8:16]} with {len(raw)} bytes."
        )


class LibDocDecoder:
    """Real-library integration point (NOT available in this sandbox)."""

    def decode(self, fmt: str, raw: bytes) -> str:
        raise NotImplementedError(
            "install a document stack to decode binary formats: pypdf for "
            "'pdf', python-docx for 'docx' (reference: S7 pdf reader, S8 "
            "docx heading split, S9 doc->docx convert); return the "
            "extracted text with ATX headings"
        )
