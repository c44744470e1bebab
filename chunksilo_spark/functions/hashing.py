"""Stable 64-bit string ids shared by driver oracle and executors.

Spark's xxhash64 is JVM-side only; the oracle needs the same ids in plain
Python, so vertex ids for connected components come from this crc32-pair
construction (deterministic, process-independent)."""

from __future__ import annotations

import zlib


def hash64(text: str) -> int:
    """Deterministic 63-bit positive id for a string (crc32 pair)."""
    data = text.encode("utf-8")
    h = (zlib.crc32(data) << 32) | zlib.crc32(data + b"\x01")
    return h & 0x7FFFFFFFFFFFFFFF
