"""MinHash signatures, LSH banding, SimHash — deterministic, numpy-vectorized.

Used by stage-3 entity canonicalization (MinHash-LSH blocking + connected
components, BASELINE north_star) and by the near-duplicate detection
operators over the documents table. Same code runs in the driver oracle and
inside mapInPandas on executors.

Determinism: base shingle hash = zlib.crc32 (stable across processes, unlike
Python's salted hash()); permutations = universal hashing (a*x + b) mod p
with (a, b) drawn once from numpy's seeded PCG64 (seed 42).
"""

from __future__ import annotations

import zlib

import numpy as np

NUM_PERM = 128
BANDS = 32
ROWS_PER_BAND = NUM_PERM // BANDS  # 4
_MERSENNE = np.uint64((1 << 61) - 1)
_MAX_HASH = np.uint64((1 << 32) - 1)

_rng = np.random.default_rng(42)
_A = _rng.integers(1, int(_MERSENNE), size=NUM_PERM, dtype=np.uint64)
_B = _rng.integers(0, int(_MERSENNE), size=NUM_PERM, dtype=np.uint64)

_EMPTY_SIG = np.full(NUM_PERM, int(_MAX_HASH), dtype=np.uint64)


def char_shingles(text: str, k: int = 3) -> list[str]:
    """Overlapping character k-grams; texts shorter than k yield themselves."""
    if len(text) < k:
        return [text] if text else []
    return [text[i : i + k] for i in range(len(text) - k + 1)]


def word_shingles(text: str, k: int = 3) -> list[str]:
    """Overlapping word k-grams joined by a space."""
    words = text.split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def _base_hashes(shingles: list[str]) -> np.ndarray:
    return np.array(
        [zlib.crc32(s.encode("utf-8")) for s in shingles], dtype=np.uint64
    )


def minhash_signature(shingles: list[str]) -> np.ndarray:
    """(NUM_PERM,) uint64 signature; empty input -> all MAX_HASH sentinel."""
    if not shingles:
        return _EMPTY_SIG.copy()
    h = _base_hashes(shingles)  # (n,)
    # (perm, n) universal hashes, clamped to 32 bits after the Mersenne mod
    vals = (_A[:, None] * h[None, :] + _B[:, None]) % _MERSENNE & _MAX_HASH
    return vals.min(axis=1)


def minhash_signatures_batch(
    shingle_lists: list[list[str]], max_chunk: int = 8192
) -> np.ndarray:
    """(n_docs, NUM_PERM) uint64 signatures — bit-identical to calling
    ``minhash_signature`` per doc (tested), but vectorized across the batch:

      * shingle crc32s are cached across docs (boilerplate-heavy corpora
        repeat shingles constantly — each distinct shingle hashes once);
      * the (NUM_PERM, chunk) universal-hash matrix is built for doc-aligned
        runs of ~``max_chunk`` shingles with IN-PLACE uint64 ops into a
        reused buffer, then reduced to per-doc minima with one
        ``np.minimum.reduceat``. The chunk size keeps the working set
        (NUM_PERM * max_chunk * 8 B = 8 MB) cache-resident — uint64
        multiply/mod are memory-bound, and a whole-batch matrix runs ~50x
        slower than cache-sized chunks (measured).
    """
    n = len(shingle_lists)
    out = np.empty((n, NUM_PERM), dtype=np.uint64)
    cache: dict[str, int] = {}
    doc_hashes: list[np.ndarray | None] = []
    for sh in shingle_lists:
        if not sh:
            doc_hashes.append(None)
            continue
        hs = np.empty(len(sh), dtype=np.uint64)
        for j, s in enumerate(sh):
            v = cache.get(s)
            if v is None:
                v = zlib.crc32(s.encode("utf-8"))
                cache[s] = v
            hs[j] = v
        doc_hashes.append(hs)

    nonempty = [(i, h) for i, h in enumerate(doc_hashes) if h is not None]
    for i, h in enumerate(doc_hashes):
        if h is None:
            out[i] = _EMPTY_SIG
    buf = np.empty((NUM_PERM, max_chunk), dtype=np.uint64)
    start = 0
    while start < len(nonempty):
        end, tot = start, 0
        while end < len(nonempty) and (
            end == start or tot + len(nonempty[end][1]) <= max_chunk
        ):
            tot += len(nonempty[end][1])
            end += 1
        concat = np.concatenate([h for _, h in nonempty[start:end]])
        # same value sequence as minhash_signature (same dtypes, same wrap),
        # computed in place: (_A*h + _B) % MERSENNE & MAX_HASH
        vals = (
            buf[:, : len(concat)]
            if len(concat) <= max_chunk
            else np.empty((NUM_PERM, len(concat)), dtype=np.uint64)
        )
        np.multiply(_A[:, None], concat[None, :], out=vals)
        np.add(vals, _B[:, None], out=vals)
        np.mod(vals, _MERSENNE, out=vals)
        np.bitwise_and(vals, _MAX_HASH, out=vals)
        bounds = np.cumsum(
            [0] + [len(h) for _, h in nonempty[start:end]]
        )[:-1]
        mins = np.minimum.reduceat(vals, bounds, axis=1)  # (NUM_PERM, k)
        for k, (di, _) in enumerate(nonempty[start:end]):
            out[di] = mins[:, k]
        start = end
    return out


def band_keys(sig: np.ndarray) -> list[int]:
    """One stable 64-bit key per band: crc32 over (band_idx, band rows)."""
    keys = []
    for b in range(BANDS):
        chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
        keys.append((b << 32) | zlib.crc32(chunk.tobytes()))
    return keys


def jaccard(a: set, b: set) -> float:
    """Exact Jaccard similarity of two shingle sets."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


_BIT_IDX = np.arange(64, dtype=np.uint64)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over tokens (md5-derived 64-bit token hashes)."""
    return simhash64_batch([tokens])[0]


def simhash64_batch(token_lists: list[list[str]]) -> list[int]:
    """SimHash per token list — one (n_tokens, 64) numpy pass per doc
    (instead of per-token numpy work) with token hashes cached across the
    batch. Definition: bit i of the result is 1 iff the count of tokens
    whose hash has bit i set exceeds the count of tokens that don't.

    Token hash = first 8 bytes of md5(token), big-endian — the same
    hash is re-derivable in ANSI SQL (``('0x' || substr(md5(tok), 1,
    16))::UBIGINT`` in DuckDB), so the full fingerprint has an exact SQL
    oracle (driver query d_simhash), like the winnowing fingerprint."""
    import hashlib

    cache: dict[str, int] = {}
    out: list[int] = []
    for tokens in token_lists:
        if not tokens:
            out.append(0)
            continue
        hs = np.empty(len(tokens), dtype=np.uint64)
        for j, tok in enumerate(tokens):
            v = cache.get(tok)
            if v is None:
                v = int.from_bytes(
                    hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
                )
                cache[tok] = v
            hs[j] = v
        bits = (hs[:, None] >> _BIT_IDX[None, :]) & np.uint64(1)  # (n, 64)
        acc = np.where(bits == 1, 1, -1).sum(axis=0)
        out.append(int(((acc > 0).astype(np.uint64) << _BIT_IDX).sum()))
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(text: str, window: int = 8, keep: int = 4) -> str:
    """Winnowing-style document fingerprint: hash every ``window``-char
    sliding window, keep the ``keep`` lexicographically-smallest hash
    prefixes, hash their concatenation. A deterministic content id that is
    robust to small local edits (unlike md5 of the full text: an edit only
    perturbs ``window`` window-hashes, which rarely intersect the kept
    minima). md5-based so the exact value is re-derivable in ANSI SQL
    (the driver's DuckDB oracle, query t_winnow)."""
    import hashlib

    if len(text) < window:
        windows = [text]
    else:
        windows = [text[i : i + window] for i in range(len(text) - window + 1)]
    smallest = sorted(
        hashlib.md5(w.encode("utf-8")).hexdigest()[:8] for w in windows
    )[:keep]
    return hashlib.md5("".join(smallest).encode("ascii")).hexdigest()
