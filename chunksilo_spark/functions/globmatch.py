"""Glob include/exclude path filtering (reference index.py:639-684,
``_matches_patterns``) as regex translation usable both as a JVM-side
Catalyst filter (``rlike``) and, verbatim, in the DuckDB oracle
(``regexp_matches``) — the same generated regex strings drive both engines.

Pinned semantics (mirroring the reference):

  * EXCLUDE patterns are checked first; any match drops the row.
  * A pattern of the form ``**/X/**`` excludes paths with any NON-FINAL
    component matching ``X`` (fnmatch-style) — the directory-exclusion form
    (reference: checks ``rel_path.parts[:-1]``).
  * Every other pattern matches RIGHT-ANCHORED against whole trailing path
    components (``PurePosixPath.match`` semantics): ``*.txt`` matches any
    path whose last component matches; ``a/*.txt`` matches the last two
    components; ``*`` never crosses ``/``.
  * INCLUDE: empty include list passes everything; otherwise at least one
    include pattern must match (same right-anchored semantics).
  * ``case_sensitive=False`` (the reference default) lowercases both the
    pattern and the path.

Wildcards supported: ``*`` (any run of non-separator chars) and ``?`` (one
non-separator char); all other characters are literal (regex-escaped).
"""

from __future__ import annotations

import re

_SEP = "/"


def _component_to_regex(comp: str) -> str:
    """fnmatch-style translation of one path component ('*' and '?' only)."""
    out = []
    for ch in comp:
        if ch == "*":
            out.append("[^/]*")
        elif ch == "?":
            out.append("[^/]")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def glob_to_regex(pattern: str) -> str:
    """Right-anchored trailing-components regex for a glob pattern.

    ``a/*.txt`` -> ``(^|/)a/[^/]*\\.txt$`` — matches iff the path's last
    len(components) components match (PurePosixPath.match semantics).
    """
    comps = [c for c in pattern.split(_SEP) if c != ""]
    if not comps:
        return "^$"
    body = _SEP.join(_component_to_regex(c) for c in comps)
    return f"(^|/){body}$"


def dir_exclude_to_regex(pattern: str) -> str:
    """Regex for the ``**/X/**`` directory-exclusion form: some non-final
    component matches X (the trailing '/' in the regex guarantees the
    matched component is not the filename)."""
    inner = pattern[3:-3]  # strip '**/' and '/**'
    return f"(^|/){_component_to_regex(inner)}/"


def compile_rules(
    include: list[str],
    exclude: list[str],
    case_sensitive: bool = False,
) -> tuple[list[str], list[str]]:
    """-> (include_regexes, exclude_regexes), patterns pre-lowercased when
    case-insensitive (apply the path-side lower() in the engine)."""

    def norm(p: str) -> str:
        return p if case_sensitive else p.lower()

    exc = []
    for p in exclude:
        p = norm(p)
        if p.startswith("**/") and p.endswith("/**"):
            exc.append(dir_exclude_to_regex(p))
        else:
            exc.append(glob_to_regex(p))
    inc = [glob_to_regex(norm(p)) for p in include]
    return inc, exc


def matches(
    path: str,
    include: list[str],
    exclude: list[str],
    case_sensitive: bool = False,
) -> bool:
    """Plain-Python reference implementation (the pytest oracle)."""
    inc, exc = compile_rules(include, exclude, case_sensitive)
    p = path if case_sensitive else path.lower()
    if any(re.search(r, p) for r in exc):
        return False
    if not inc:
        return True
    return any(re.search(r, p) for r in inc)
