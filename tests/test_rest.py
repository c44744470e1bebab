"""Paginated REST connector: a deterministic in-process fake client drives
the full protocol — multi-round pagination per unit, parallel units,
server-side updated-since pushdown, version-ledger frontier, and the
fetched pages flowing straight into stage-1 extraction."""

import datetime as dt
import sys

from pyspark import cloudpickle as _cloudpickle

from chunksilo_spark.models import ModelSpec
from chunksilo_spark.sources import rest

# ship this test module's classes by value so executors can unpickle the
# fake client without having tests/ on their import path
_cloudpickle.register_pickle_by_value(sys.modules[__name__])

EPOCH = dt.datetime(2024, 1, 1)


class FakeClient:
    """Deterministic stand-in for a Confluence/Jira-style paginated API.

    Unit ``u`` serves ``n_rows(u)`` pages; row i of unit u has
    updated_at = EPOCH + i days and version = 1 + i % 3. ``fetch`` honors
    the cursor and applies updated_since server-side, like real CQL/JQL.
    """

    def __init__(self, rows_base: int = 23):
        self.rows_base = rows_base

    def n_rows(self, unit: str) -> int:
        return self.rows_base + (sum(map(ord, unit)) % 7)

    def row(self, unit: str, i: int) -> dict:
        return {
            "url": f"https://remote.example/{unit}/page-{i}",
            "warc_ts": EPOCH + dt.timedelta(days=i),
            "html": f"<html><body><h1>{unit} {i}</h1><p>body {i}</p>"
                    "</body></html>",
            "lang": "en",
            "remote_id": f"{unit}:{i}",
            "version": 1 + i % 3,
        }

    def fetch(self, unit, cursor, page_size, updated_since):
        start = cursor or 0
        out = []
        i = start
        n = self.n_rows(unit)
        while i < n and len(out) < page_size:
            r = self.row(unit, i)
            if updated_since is None or r["warc_ts"] >= updated_since:
                out.append(r)
            i += 1
        return out, (i if i < n else None)


UNITS = ["alpha", "beta", "gamma"]
SPEC = ModelSpec(FakeClient, rows_base=23)


def _expected_urls(updated_since=None):
    c = FakeClient()
    urls = set()
    for u in UNITS:
        for i in range(c.n_rows(u)):
            r = c.row(u, i)
            if updated_since is None or r["warc_ts"] >= updated_since:
                urls.add(r["url"])
    return urls


class TestFetchPages:
    def test_full_drain_multi_round_pagination(self, spark):
        # page_size 7 forces 4+ rounds per unit
        got = rest.fetch_pages(spark, UNITS, SPEC, page_size=7).collect()
        assert {r["url"] for r in got} == _expected_urls()
        assert len(got) == len(_expected_urls())  # exactly once each
        one = got[0]
        assert one["extras"]["source_format"] == "rest"
        assert one["extras"]["unit"] in UNITS
        assert one["html"].startswith(b"<html>")

    def test_updated_since_pushdown(self, spark):
        since = EPOCH + dt.timedelta(days=20)
        got = rest.fetch_pages(
            spark, UNITS, SPEC, page_size=7, updated_since=since
        ).collect()
        assert {r["url"] for r in got} == _expected_urls(since)
        assert 0 < len(got) < len(_expected_urls())

    def test_flows_into_stage1(self, spark):
        from chunksilo_spark.operators import stage1_extract as s1

        pages = rest.fetch_pages(spark, ["alpha"], SPEC, page_size=50)
        docs = s1.extract_documents(pages, partitions=2)
        rows = {r["url"]: r for r in docs.where("ok").collect()}
        assert len(rows) == FakeClient().n_rows("alpha")
        sample = rows["https://remote.example/alpha/page-0"]
        assert "# alpha 0" in sample["text"]
        # connector provenance survives extraction in extras
        assert sample["extras"]["unit"] == "alpha"
        assert sample["extras"]["source_format"] == "rest"


class StuckCursorClient(FakeClient):
    """Pagination bug stand-in: returns the same cursor forever."""

    def fetch(self, unit, cursor, page_size, updated_since):
        return [self.row(unit, 0)], 1  # cursor never advances past 1


class BytesHtmlClient(FakeClient):
    """A client that naturally returns bytes bodies (e.g. raw HTTP
    content) — the connector must accept both str and bytes."""

    def row(self, unit, i):
        r = super().row(unit, i)
        r["html"] = r["html"].encode("utf-8")
        return r


class PoisonClient(FakeClient):
    """Every fetch for unit 'beta' raises; other units are healthy."""

    def fetch(self, unit, cursor, page_size, updated_since):
        if unit == "beta":
            raise ConnectionError(f"boom for {unit} at {cursor!r}")
        return super().fetch(unit, cursor, page_size, updated_since)


class FlakyClient(FakeClient):
    """First TWO fetches of each (unit, cursor) raise, then succeed —
    the transient-HTTP-error shape the in-place retry must absorb.
    Per-process attempt state is fine: the client instance is cached per
    worker and each unit is drained by exactly one task."""

    def __init__(self, rows_base: int = 23):
        super().__init__(rows_base)
        self.attempts = {}

    def fetch(self, unit, cursor, page_size, updated_since):
        k = (unit, cursor)
        self.attempts[k] = self.attempts.get(k, 0) + 1
        if self.attempts[k] <= 2:
            raise TimeoutError(f"transient for {k}")
        return super().fetch(unit, cursor, page_size, updated_since)


class TestTerminationGuards:
    def test_unchanged_cursor_raises_in_strict_mode(self, spark):
        import pytest as _pytest

        spec = ModelSpec(StuckCursorClient)
        with _pytest.raises(Exception) as ei:  # PySpark wraps the RuntimeError
            rest.fetch_pages(
                spark, ["alpha"], spec, page_size=5, quarantine_errors=False
            ).collect()
        assert "pagination is not progressing" in str(ei.value)

    def test_unchanged_cursor_quarantines_by_default(self, spark):
        got = rest.fetch_pages(
            spark, ["alpha"], ModelSpec(StuckCursorClient), page_size=5
        ).collect()
        q = [r for r in got if r["extras"].get("quarantined") == "1"]
        assert len(q) == 1
        assert q[0]["url"] == "rest-quarantine://rest/alpha"
        assert "not progressing" in q[0]["extras"]["error"]

    def test_poison_unit_quarantined_job_completes(self, spark):
        """The round-4 ADVICE-class edge: a unit whose every fetch raises
        must cost one quarantine row, never the job."""
        got = rest.fetch_pages(
            spark, UNITS, ModelSpec(PoisonClient), page_size=7
        ).collect()
        q = [r for r in got if r["extras"].get("quarantined") == "1"]
        data = [r for r in got if r["extras"].get("quarantined") != "1"]
        assert [r["url"] for r in q] == ["rest-quarantine://rest/beta"]
        assert "fetch raised 3x" in q[0]["extras"]["error"]
        c = FakeClient()
        expect = {
            c.row(u, i)["url"]
            for u in ("alpha", "gamma")
            for i in range(c.n_rows(u))
        }
        assert {r["url"] for r in data} == expect

    def test_transient_errors_retried_in_place_no_duplicates(self, spark):
        got = rest.fetch_pages(
            spark, ["alpha"], ModelSpec(FlakyClient), page_size=7
        ).collect()
        assert all(r["extras"].get("quarantined") != "1" for r in got)
        urls = [r["url"] for r in got]
        c = FakeClient()
        assert sorted(urls) == sorted(
            c.row("alpha", i)["url"] for i in range(c.n_rows("alpha"))
        )

    def test_split_quarantined(self, spark):
        pages = rest.fetch_pages(
            spark, UNITS, ModelSpec(PoisonClient), page_size=7
        )
        clean, quarantined = rest.split_quarantined(pages)
        assert quarantined.count() == 1
        assert clean.count() == sum(
            FakeClient().n_rows(u) for u in ("alpha", "gamma")
        )

    def test_bytes_html_accepted(self, spark):
        got = rest.fetch_pages(
            spark, ["alpha"], ModelSpec(BytesHtmlClient), page_size=7
        ).collect()
        assert len(got) == FakeClient().n_rows("alpha")
        assert all(r["html"].startswith(b"<html>") for r in got)


class TestIncrementalFrontier:
    def test_version_ledger(self, spark):
        fetched = rest.fetch_pages(spark, ["alpha"], SPEC, page_size=50)
        # state: every url already stored, versions matching EXCEPT page-4
        # bumped and page-7 missing entirely
        c = FakeClient()
        state_rows = []
        for i in range(c.n_rows("alpha")):
            r = c.row("alpha", i)
            if r["url"].endswith("page-7"):
                continue
            v = r["version"] + (1 if r["url"].endswith("page-4") else 0)
            state_rows.append((r["url"], {"version": str(v)}))
        state = spark.createDataFrame(
            state_rows, "url string, extras map<string,string>"
        )
        frontier = {
            r["url"]
            for r in rest.incremental_frontier(fetched, state).collect()
        }
        assert frontier == {
            "https://remote.example/alpha/page-4",
            "https://remote.example/alpha/page-7",
        }
