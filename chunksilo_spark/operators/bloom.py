"""Bloom-filter semi-join pruning.

The 100 TB problem this solves: "keep only the fact rows whose key is in
this (much smaller) key set" — incremental re-extraction frontiers,
per-tenant slices, dirty-url re-crawls. An exact semi-join shuffles the
fact side on the key; at corpus scale that shuffle IS the job. A Bloom
filter turns it into a map-side filter: the key set is compressed into a
``width``-bit synopsis, broadcast as a literal, and every fact partition
tests membership locally — the fact table never moves. False positives
(never negatives) survive at a rate ~(1-e^{-kn/m})^k; the pattern is
prune-then-exact-join, where the exact join now runs on the pruned
(orders-of-magnitude smaller) relation.

Spark's own engine applies the same idea internally (runtime row-group
pruning, `spark.sql.optimizer.runtime.bloomFilter.enabled`); this
operator pins an EXPLICIT, deterministic variant — md5-salted bit
positions, the repo-wide ``_md5_bucket`` algebra — so the surviving-row
set (true members AND false positives) is bit-for-bit re-derivable in
ANSI SQL, making a probabilistic pruning step hash-checkable by the
driver's DuckDB oracle.

Determinism pin, shared with the Count-Min sketch: position i of value v
is ``md5("bf{i}:" || v)``'s first 15 hex chars mod ``width``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_prune"]


def _pos(col: Column, i: int, width: int) -> Column:
    """Bit position of the i-th salted hash of ``col`` (string form)."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bf{i}:"), col.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
        F.lit(width),
    )


def bloom_prune(
    facts: DataFrame,
    keys: DataFrame,
    fact_key: str,
    key_col: str | None = None,
    width: int = 8192,
    depth: int = 3,
) -> DataFrame:
    """Filter ``facts`` to rows whose ``fact_key`` passes the Bloom
    membership test against the distinct values of ``keys[key_col]``.
    Returns a SUPERSET of the exact semi-join (false positives possible,
    false negatives impossible); chain an exact join on the pruned
    relation when exactness is required.

    Plan shape: the bit positions set by the key side are computed
    distributively (distinct keys x ``depth`` salted hashes — key-side
    sized, the SMALL side by contract), collected into a
    ``ceil(width/64)``-long bitmask (bounded by ``width`` BITS — constant
    wrt both inputs, the same bounded-collect class as query vectors),
    and embedded as an array literal. The fact-side test is then a pure
    codegen'd column expression — ``depth`` md5s + shift/mask per row,
    NO join, NO shuffle, NO exchange of the fact table — exactly the
    plan you want when facts are 100 TB and keys are a frontier.
    """
    if depth < 1 or width < 64:
        raise ValueError("bloom filter needs depth >= 1 and width >= 64")
    if key_col is None:
        key_col = fact_key
    bit_rows = (
        keys.select(F.col(key_col).cast("string").alias("_v"))
        .where(F.col("_v").isNotNull())
        .distinct()
        .select(
            F.explode(
                F.array(
                    *[_pos(F.col("_v"), i, width) for i in range(depth)]
                )
            ).alias("_b")
        )
        .distinct()
        .collect()
    )
    n_words = (width + 63) // 64
    words = [0] * n_words
    for r in bit_rows:
        b = r["_b"]
        words[b >> 6] |= 1 << (b & 63)
    # python ints are unsigned-ish; LongType literals must be signed 64-bit
    mask = F.array(
        *[
            F.lit(w - (1 << 64) if w >= (1 << 63) else w).cast("long")
            for w in words
        ]
    )
    fk = F.col(fact_key)
    test = F.lit(True)
    for i in range(depth):
        p = _pos(fk, i, width)
        word = F.element_at(mask, F.shiftright(p, 6).cast("int") + 1)
        bit = p.bitwiseAND(F.lit(63))
        test = test & (
            F.call_function("shiftrightunsigned", word, bit)
            .bitwiseAND(F.lit(1))
            == 1
        )
    return facts.where(fk.isNotNull() & test)
