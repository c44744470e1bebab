"""Custom stateful streaming operator: per-url change detection.

The streaming spelling of the batch J1 change-classification
(operators/incremental.py): state = last content hash per url;
a page row is emitted only when its html hash differs from the stored
state (new url or modified content). Built on
``applyInPandasWithState`` — Spark's arbitrary-stateful-processing API —
with per-key state that persists across micro-batches via the checkpoint.

Scale notes: state is O(distinct urls) spread across shuffle partitions
keyed by url (uniform); each micro-batch touches only the keys present in
it. No timeout is set (crawl state never expires); pass a TTL via
``state_timeout`` if the url universe must be bounded.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "url string, warc_ts timestamp, content_md5 string"
STATE_SCHEMA = "last_md5 string"


def _detect_changes(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last = state.get[0] if state.exists else None
    out = {"url": [], "warc_ts": [], "content_md5": []}
    # one key's rows may arrive as SEVERAL Arrow chunks: materialize them
    # all and sort ONCE — per-chunk sorting would process cross-chunk rows
    # in arbitrary order and persist a stale hash as the latest state
    chunks = list(pdfs)
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("warc_ts")
        for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
            digest = hashlib.md5(bytes(html)).hexdigest()
            if digest != last:
                out["url"].append(url)
                out["warc_ts"].append(ts)
                out["content_md5"].append(digest)
                last = digest
    state.update((last,))
    if out["url"]:
        yield pd.DataFrame(out)


def changed_pages_stream(pages_stream: DataFrame) -> DataFrame:
    """streaming pages -> rows that are new or content-changed per url."""
    return pages_stream.groupBy("url").applyInPandasWithState(
        _detect_changes,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
