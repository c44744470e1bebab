r"""Outlink extraction + URI resolution kernels (SURVEY §2.7 F10).

The reference resolves document locations to absolute URIs once at index
time (reference index.py:74-87 builds `url` from the source root + relative
path; search.py:671-723 joins Jira/Confluence base URLs onto issue keys and
page ids). For a Common-Crawl-style web corpus the analogous operation is
link-graph construction: pull ``href`` targets out of the page HTML and
resolve each against the page URL, yielding the (src_url, dst_url) edge set
the KG stages and PageRank consume.

The resolution semantics are PINNED HERE as a small regex algebra — NOT
``urllib.parse.urljoin`` — so the exact same steps are expressible three
ways with identical results: this Python kernel (pytest oracle), Spark
column expressions (``operators/graph.resolve_href_col``), and DuckDB SQL
(the driver oracle). On the subset of inputs a crawler actually sees
(absolute http(s) base with a path; hrefs that are absolute, scheme-relative,
root-relative, or ``./``/``../``-relative) the result agrees with
``urljoin`` — property-tested in tests/test_graph.py.

Pinned algebra, in order:
  1. trim; strip the fragment (``#`` and everything after); empty -> None.
  2. href with a scheme (``^[A-Za-z][A-Za-z0-9+.-]*:``): keep verbatim iff
     http(s); every other scheme (mailto:, javascript:, tel:, data:) -> None.
  3. ``//host/...`` (scheme-relative)  -> base scheme + ``:`` + href.
  4. ``/...`` (root-relative)          -> base origin (scheme://host) + href.
  5. otherwise (relative)              -> base dir (base with the trailing
     ``[^/]*$`` segment removed) + href.
  6. normalize cases 4-5 ON THE PATH PART ONLY (everything after the
     origin — the authority can never be consumed by a ``..`` collapse):
     FOUR global-replace passes of ``/\./`` -> ``/`` then FOUR of
     ``/[^/]+/\.\./`` -> ``/`` (handles <= 4 levels of ``..``; deeper
     chains and above-root ``..`` keep the fixed-pass residue — documented
     bound, identical in Java regex / RE2 / Python re because all three
     scan left-to-right non-overlapping per pass).

Bases are required to be absolute http(s) URLs WITH a path component — a
``/`` immediately after the authority (every crawl record's WARC-Target-URI
has one); for any other base (no scheme, or path-less like
``https://h.example``) every base-dependent branch returns None. Hrefs that
are already absolute http(s) URLs resolve regardless of the base.
"""

from __future__ import annotations

import re

# double-quoted href attributes — the only form the synthetic corpus emits
# and by far the dominant form in real markup; single-quoted/bare attrs are
# out of scope (documented).
HREF_RE = r'href\s*=\s*"([^"]*)"'
_HREF_C = re.compile(HREF_RE)

# THE pinned whitespace class for url/anchor kernels and their column
# twins: an explicit ASCII set that means the same thing in Python re
# (Unicode-aware \s would differ on U+00A0), Java regex (\s includes
# \x0b), and RE2/DuckDB (\s excludes \x0b) — the three dialects only
# agree when the class is spelled out. \x0b included to match Java's
# historical trim behavior on vertical tabs.
WS_CLASS = r"[ \t\n\r\f\x0b]"
_WS_STRIP = " \t\n\r\f\x0b"

SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"
_SCHEME_C = re.compile(SCHEME_RE)
_HTTP_C = re.compile(r"^https?://")
_ORIGIN_C = re.compile(r"^(https?://[^/]+)")
_BASE_SCHEME_C = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*):")
_DOT_SEG = re.compile(r"/\./")
_UP_SEG = re.compile(r"/[^/]+/\.\./")
NORM_PASSES = 4


def extract_hrefs(html: str) -> list[str]:
    """All double-quoted href attribute values, document order, raw."""
    return _HREF_C.findall(html)


def _normalize_path(path: str) -> str:
    for _ in range(NORM_PASSES):
        path = _DOT_SEG.sub("/", path)
    for _ in range(NORM_PASSES):
        path = _UP_SEG.sub("/", path)
    return path


def resolve_href(base: str, href: str) -> str | None:
    """Resolve ``href`` against ``base`` per the pinned algebra above."""
    href = href.strip(_WS_STRIP)
    href = href.split("#", 1)[0]
    if not href:
        return None
    if _SCHEME_C.match(href):
        return href if _HTTP_C.match(href) else None
    m = _ORIGIN_C.match(base)
    if not m:
        return None
    origin = m.group(1)
    # pinned: bases must carry a path — a '/' immediately after the
    # authority. A path-less base (https://h.example) would concatenate into
    # a corrupted URL in the relative branches ('https://h.examplex'), so
    # every base-dependent branch returns None instead, keeping the
    # docstring's "behavior for other bases is None" true.
    if len(base) <= len(origin) or base[len(origin)] != "/":
        return None
    if href.startswith("//"):
        return _BASE_SCHEME_C.match(base).group(1) + ":" + href
    if href.startswith("/"):
        return origin + _normalize_path(href)
    # path part of the base dir, so '..' collapse can never eat the host
    # (a shallow base like https://h.example/page + href '../x' used to
    # match '/h.example/../' and swallow the authority)
    base_dir_path = re.sub(r"[^/]*$", "", base)[len(origin):]
    return origin + _normalize_path(base_dir_path + href)


def page_outlinks(base: str, html: str) -> list[str]:
    """Resolved, de-duplicated (order-preserving) outlinks of one page."""
    seen: set[str] = set()
    out: list[str] = []
    for href in extract_hrefs(html):
        url = resolve_href(base, href)
        if url is not None and url not in seen:
            seen.add(url)
            out.append(url)
    return out


# full text-bearing <a> elements. Same double-quoted-href scope as HREF_RE;
# (?s) so anchor bodies spanning lines match; non-greedy body stops at the
# first closing tag, so adjacent anchors never merge. Nested <a> (invalid
# HTML) resolves as: inner anchors win their own body, the outer match ends
# at the first </a>.
ANCHOR_RE = r'(?s)<a\s[^>]*href\s*=\s*"([^"]*)"[^>]*>(.*?)</a>'
_ANCHOR_C = re.compile(ANCHOR_RE)
_TAG_C = re.compile(r"<[^>]*>")
_WS_C = re.compile(WS_CLASS + "+")


def clean_anchor_text(raw: str) -> str:
    """Pinned anchor-text normalization: inner tags -> space, whitespace
    runs collapse to one space, trim, lowercase. Identical steps in the
    Spark column twin (graph.anchor_edges) and the DuckDB oracle."""
    return _WS_C.sub(" ", _TAG_C.sub(" ", raw)).strip(_WS_STRIP).lower()


def extract_anchors(html: str) -> list[tuple[str, str]]:
    """(href, cleaned_anchor_text) pairs, document order; empty-text
    anchors (attribute-only navigation/assets) are dropped — HREF_RE
    still sees them, so the edge graph is unaffected."""
    out: list[tuple[str, str]] = []
    for href, body in _ANCHOR_C.findall(html):
        text = clean_anchor_text(body)
        if text:
            out.append((href, text))
    return out


# tracking query parameters stripped by canonicalize_url: the standard
# analytics/click identifiers that fragment crawl urls into near-dup keys
TRACKING_PARAM_RE = r"^(utm_[^=&]*|gclid|fbclid|msclkid|ref_src)(=|$)"
_TRACK_C = re.compile(TRACKING_PARAM_RE)
# scheme matching is case-insensitive (RFC 3986 §3.1); everything after
# the authority is matched case-sensitively
_AUTH_SPLIT_C = re.compile(r"^([hH][tT][tT][pP][sS]?)://([^/?#]*)([^?#]*)(.*)$", re.S)


def canonicalize_url(url: str) -> str | None:
    """Canonical form of an absolute http(s) url, or None for anything
    else. Pinned algebra (same steps in the column twin
    ``operators/graph.canonical_url_col`` and the analytic SQL oracle):

      1. trim; strip the fragment (``#...``).
      2. non-http(s) (or scheme-less) -> None.
      3. scheme and authority lowercase; path/query case preserved.
      4. default port dropped (``:80`` for http, ``:443`` for https).
      5. empty path -> ``/``.
      6. tracking params (TRACKING_PARAM_RE: utm_*, gclid, fbclid,
         msclkid, ref_src) removed from the query, remaining params keep
         their order; an emptied query drops its ``?``.

    Trailing-slash folding and param re-ordering are deliberately NOT
    applied: both can merge genuinely distinct resources, and the cost of
    a missed dup is lower than a wrong merge in a dedup key.
    """
    url = url.strip(_WS_STRIP)
    url = url.split("#", 1)[0]
    m = _AUTH_SPLIT_C.match(url)
    if not m:
        return None
    scheme, auth, path, rest = m.groups()
    scheme = scheme.lower()
    auth = auth.lower()
    if scheme == "http" and auth.endswith(":80"):
        auth = auth[:-3]
    elif scheme == "https" and auth.endswith(":443"):
        auth = auth[:-4]
    if not path:
        path = "/"
    if rest.startswith("?"):
        parts = [
            p for p in rest[1:].split("&") if p and not _TRACK_C.match(p)
        ]
        rest = "?" + "&".join(parts) if parts else ""
    return scheme + "://" + auth + path + rest


_WWW_C = re.compile(r"^www\d*\.")


def surt_key(url: str) -> str | None:
    """SURT (Sort-friendly URI Reordering Transform) key of an absolute
    http(s) url, or None — the web-archive SORT key (Heritrix / pywb
    convention: reversed host labels group a domain's whole subtree into
    one contiguous key range, so "everything under example.com" is a
    prefix scan). Deliberately MORE aggressive than
    :func:`canonicalize_url` (the dedup key, which never reorders or
    case-folds): an archive lookup key must match across cosmetic
    variants even at the cost of merging oddballs.

    Pinned algebra (same steps in the column twin
    ``sources/readers.surt_key_col`` and the analytic oracle):

      1. trim; strip fragment; non-http(s) -> None (scheme is
         case-insensitive, then discarded — http and https share keys).
      2. authority: drop userinfo (after the LAST ``@``), lowercase,
         drop one trailing dot, drop ``:80``/``:443`` (either scheme),
         strip one leading ``www`` + optional digits label.
      3. key = host labels REVERSED and comma-joined, ``)``, the
         LOWERCASED path (``/`` when empty), then ``?`` + the
         ``&``-sorted lowercased non-empty query params (dropped when
         none survive). Non-default ports stay on the last host label
         (``com,example:8080)``).
    """
    url = url.strip(_WS_STRIP)
    url = url.split("#", 1)[0]
    m = _AUTH_SPLIT_C.match(url)
    if not m:
        return None
    _scheme, auth, path, rest = m.groups()
    auth = auth.rsplit("@", 1)[-1].lower()
    if auth.endswith("."):
        auth = auth[:-1]
    for suf in (":80", ":443"):
        if auth.endswith(suf):
            auth = auth[: -len(suf)]
            break
    auth = _WWW_C.sub("", auth, count=1)
    host, _, port = auth.partition(":")
    host_key = ",".join(reversed(host.split("."))) + (
        ":" + port if port else ""
    )
    path = (path or "/").lower()
    q = ""
    if rest.startswith("?"):
        parts = sorted(p for p in rest[1:].lower().split("&") if p)
        if parts:
            q = "?" + "&".join(parts)
    return host_key + ")" + path + q
