"""Training-data export operators: deterministic shuffle+shard order,
token-budget sequence packing, per-domain caps.

The last mile of an LLM data pipeline: after curation (operators/curation)
the corpus must be (a) capped per source/domain so no single host dominates
the mix, (b) globally shuffled into a reproducible training order, and
(c) packed into fixed-token-budget sequences for the trainer. All three are
pinned as deterministic functions of the row key so re-runs, resumed jobs
and the SQL oracle produce byte-identical output — the property that makes
a 100 TB export auditable.

Scale shape:

  * ``train_order`` — the "global shuffle" is NOT a sort: order is an md5
    key (seeded), the shard is an md5 bucket, and the position is a
    row_number windowed PER SHARD — parallelism = #shards, no global sort,
    no single-partition window. (A real export writes
    ``partitionBy(shard) sortWithinPartitions(sort_key)``; the window here
    materializes the position for auditing.)
  * ``pack_sequences`` — running token count per shard via an UNBOUNDED
    PRECEDING window, ``seq_id = floor(cum_before / budget)``. A document
    that crosses a budget boundary belongs to the sequence where it
    STARTED (the budget is a soft target — the packer's consumer splits or
    pads; pinned so the SQL oracle agrees). Windows are per-shard, so the
    sort is #shards-way parallel and each partition's window state is one
    running sum.
  * ``domain_cap`` — per-domain top-``cap`` by quality: row_number within
    domain. Skewed domains (one host = 10% of the corpus) are the known
    hazard: the window sorts only WITHIN each domain partition and AQE
    splits oversized partitions; for pathological single-domain corpora,
    pre-filter with an approximate per-domain count and hash-rate sample
    before the exact window (documented, not needed at driver scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _md5_long(col: Column) -> Column:
    """First 15 md5 hex chars as a non-negative long — same expression the
    DuckDB oracle re-derives (``('0x' || substr(md5(x), 1, 15))::UBIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def train_order(
    docs: DataFrame,
    shards: int,
    seed: str = "train-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, shard, pos): deterministic seeded shuffle into ``shards`` shards.

    sort_key = md5(seed || ':' || id) — changing the seed reshuffles;
    shard = md5 bucket of the sort key; pos = 1-based rank within the
    shard by (sort_key, id). Pure function of (seed, id).
    """
    key = F.md5(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    )
    shard = F.pmod(_md5_long(key), F.lit(shards))
    with_key = docs.select(
        F.col(id_col), key.alias("_key"), shard.alias("shard")
    )
    w = Window.partitionBy("shard").orderBy(F.col("_key"), F.col(id_col))
    return with_key.select(
        id_col, "shard", F.row_number().over(w).alias("pos")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, shard, n_tokens, seq_id): pack docs into token-budget sequences.

    Tokens = whitespace tokens (the ``t_token_counts`` pin). Docs are laid
    out in ``id_col`` order within md5-bucket shards; ``seq_id`` is the
    budget bin the doc STARTS in (floor of the running token count before
    it / budget). Deterministic, window-parallel per shard.
    """
    toks = F.size(F.split(text_col, r"\s+"))
    shard = F.pmod(_md5_long(F.col(id_col).cast("string")), F.lit(shards))
    base = docs.select(
        F.col(id_col), shard.alias("shard"), toks.alias("n_tokens")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(cum_before / F.lit(budget)).cast("long").alias("seq_id"),
    )


def domain_cap(
    docs: DataFrame,
    cap: int,
    domain_col: str = "source",
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows surviving a per-domain cap: the top-``cap`` docs of each domain
    by (quality desc, id asc) -> (id, domain, domain_rank)."""
    w = Window.partitionBy(domain_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(domain_col),
            F.row_number().over(w).alias("domain_rank"),
        )
        .where(F.col("domain_rank") <= cap)
    )
