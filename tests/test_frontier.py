"""Frontier scheduler: python parity, host interleaving, wave limit."""

from __future__ import annotations

from chunksilo_spark.operators.frontier import schedule_frontier


def _python_schedule(rows, limit=None):
    by_host = {}
    for h, u, p in rows:
        by_host.setdefault(h, []).append((u, p))
    ranked = []
    for h, items in by_host.items():
        for pos, (u, p) in enumerate(
            sorted(items, key=lambda x: (-x[1], x[0])), start=1
        ):
            ranked.append((h, u, p, pos))
    ranked.sort(key=lambda r: (r[3], -r[2], r[1]))
    if limit is not None:
        ranked = ranked[:limit]
    return [
        (h, u, p, pos, i + 1) for i, (h, u, p, pos) in enumerate(ranked)
    ]


ROWS = [
    (f"h{i % 5}.example", f"https://h{i % 5}.example/p{i}", float((i * 13) % 37))
    for i in range(120)
]


class TestScheduleFrontier:
    def _run(self, spark, rows, limit=None):
        df = spark.createDataFrame(
            rows, "host string, url string, priority double"
        )
        got = schedule_frontier(df, limit=limit)
        return sorted(
            (r["host"], r["url"], r["priority"], r["pos"], r["sched_rank"])
            for r in got.collect()
        )

    def test_matches_python_formula(self, spark):
        assert self._run(spark, ROWS) == sorted(_python_schedule(ROWS))

    def test_wave_limit_is_the_schedule_prefix(self, spark):
        assert self._run(spark, ROWS, limit=17) == sorted(
            _python_schedule(ROWS, limit=17)
        )

    def test_hosts_interleave_no_host_twice_before_all_have_a_turn(
        self, spark
    ):
        got = self._run(spark, ROWS)
        order = [h for h, *_ in sorted(got, key=lambda r: r[4])]
        hosts = set(order)
        # within the first |hosts| slots every host appears exactly once
        assert set(order[: len(hosts)]) == hosts

    def test_plan_never_globally_sorts_the_frontier(self, spark):
        """The round-4 verdict's one API footgun: with limit=None the old
        code ran a single-partition row_number over the WHOLE frontier.
        Now the frontier-sized windows are partitioned (host, then pos);
        the only SinglePartition exchange feeds the per-pos band-count
        relation (post-aggregation, one row per distinct pos)."""
        df = spark.createDataFrame(
            ROWS, "host string, url string, priority double"
        )
        plan = schedule_frontier(df)._jdf.queryExecution().executedPlan().toString()
        # frontier-sized windows are hash-partitioned, not global
        assert "hashpartitioning(pos" in plan
        # the single-partition exchange exists only above an aggregate
        # (band counts), never directly above the scan
        for frag in plan.split("Exchange SinglePartition")[1:]:
            assert "HashAggregate" in frag.split("Scan")[0]

    def test_wave_limit_plan_is_take_ordered(self, spark):
        df = spark.createDataFrame(
            ROWS, "host string, url string, priority double"
        )
        plan = (
            schedule_frontier(df, limit=17)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan

    def test_priority_respected_within_host(self, spark):
        got = self._run(spark, ROWS)
        per_host = {}
        for h, u, p, pos, _ in got:
            per_host.setdefault(h, []).append((pos, p))
        for h, items in per_host.items():
            items.sort()
            prios = [p for _, p in items]
            assert prios == sorted(prios, reverse=True), h


class TestRobots:
    """RFC 9309 parse + gate: python-reference parity and the spec's
    edge semantics (group override, longest match, tie -> allow,
    anchors, wildcards, ignored preamble rules, empty disallow)."""

    TXT = (
        "Disallow: /ignored-preamble/\n"          # before any UA: dropped
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok/\n"
        "Disallow: /*.tmp$\n"
        "Allow: /tie/      # same length as the disallow\n"
        "Disallow: /tie/\n"
        "Disallow:\n"                              # empty: matches nothing
        "User-agent: SiloBot\n"
        "User-agent: altbot\n"
        "Disallow: /drafts/\n"
        "Allow: /drafts/pub*\n"
    )

    @staticmethod
    def _python_match(groups, agent, path):
        import re

        agent = agent.lower()
        rules = groups.get(agent) or groups.get("*") or []
        best = None
        for directive, rp in rules:
            body = rp[:-1] if rp.endswith("$") else rp
            rx = "^" + ".*".join(re.escape(p) for p in body.split("*"))
            if rp.endswith("$"):
                rx += "$"
            if re.match(rx, path):
                key = (len(rp), 1 if directive == "allow" else 0)
                if best is None or key > best[0]:
                    best = (key, directive, rp)
        if best is None:
            return 1, None
        return (1 if best[1] == "allow" else 0), best[2]

    def _groups(self):
        # hand-parsed reference of TXT per the RFC group model
        star = [
            ("disallow", "/private/"),
            ("allow", "/private/ok/"),
            ("disallow", "/*.tmp$"),
            ("allow", "/tie/"),
            ("disallow", "/tie/"),
        ]
        bot = [("disallow", "/drafts/"), ("allow", "/drafts/pub*")]
        return {"*": star, "silobot": bot, "altbot": bot}

    def _rules(self, spark):
        from chunksilo_spark.operators.frontier import parse_robots

        robots = spark.createDataFrame(
            [("h.example", self.TXT)], "host string, robots_txt string"
        )
        return parse_robots(robots)

    def test_parse_matches_hand_parse(self, spark):
        got = sorted(
            (r["agent"], r["directive"], r["path"])
            for r in self._rules(spark).collect()
        )
        want = sorted(
            (agent, d, p)
            for agent, rules in self._groups().items()
            for d, p in rules
        )
        assert got == want

    def test_filter_matches_python_reference(self, spark):
        from chunksilo_spark.operators.frontier import robots_filter

        paths = [
            "/public/p1", "/private/p1", "/private/ok/p1", "/drafts/d1",
            "/drafts/pub1", "/cache/f1.tmp", "/x.tmp.html", "/tie/t",
            "/private/ok", "/PRIVATE/p1",
        ]
        frontier = spark.createDataFrame(
            [("h.example", p) for p in paths] + [("bare.example", "/any")],
            "host string, path string",
        )
        for agent in ("SiloBot", "otherbot", "ALTBOT"):
            got = {
                (r["host"], r["path"]): (r["allowed"], r["rule_path"])
                for r in robots_filter(
                    frontier, self._rules(spark), agent
                ).collect()
            }
            want = {
                ("h.example", p): self._python_match(
                    self._groups(), agent, p
                )
                for p in paths
            }
            want[("bare.example", "/any")] = (1, None)
            assert got == want, agent

    def test_spec_semantics_pinned(self, spark):
        from chunksilo_spark.operators.frontier import robots_filter

        frontier = spark.createDataFrame(
            [
                ("h.example", "/tie/t"),            # equal length: allow
                ("h.example", "/x.tmp.html"),       # $ anchor: no match
                ("h.example", "/ignored-preamble/x"),  # preamble dropped
                ("h.example", "/drafts/d1"),        # '*' group for otherbot
            ],
            "host string, path string",
        )
        got = {
            r["path"]: (r["allowed"], r["rule_path"])
            for r in robots_filter(
                frontier, self._rules(spark), "otherbot"
            ).collect()
        }
        assert got["/tie/t"] == (1, "/tie/")
        assert got["/x.tmp.html"] == (1, None)
        assert got["/ignored-preamble/x"] == (1, None)
        assert got["/drafts/d1"] == (1, None)

    def test_frontier_never_shuffles(self, spark):
        from chunksilo_spark.operators.frontier import robots_filter

        frontier = spark.createDataFrame(
            [("h.example", "/a")], "host string, path string"
        )
        plan = robots_filter(
            frontier, self._rules(spark), "silobot"
        )._jdf.queryExecution().executedPlan().toString()
        # everything below the broadcast join is rule-side; the frontier
        # side must reach the join without an Exchange
        head = plan.split("BroadcastExchange")[0]
        assert "Exchange hashpartitioning" not in head


class TestRecrawlPriority:
    NOW = 1_700_000_000

    def _python(self, rows):
        hist = {}
        for url, ep, h in rows:
            hist.setdefault(url, []).append((ep, h))
        out = {}
        for url, fetches in hist.items():
            fetches.sort()
            n = len(fetches)
            chg = sum(
                1
                for i in range(1, n)
                if fetches[i][1] != fetches[i - 1][1]
            )
            first, last = fetches[0][0], fetches[-1][0]
            span, age = last - first, self.NOW - last
            d = max(span, 1)
            out[url] = (
                n, chg, last, span, age,
                (chg * 86_400_000_000) // d,
                (chg * age * 1_000_000) // d,
            )
        return out

    def _run(self, spark, rows):
        import datetime as dt

        from chunksilo_spark.operators.frontier import recrawl_priority

        df = spark.createDataFrame(
            [
                (u, dt.datetime.fromtimestamp(ep, dt.timezone.utc), h)
                for u, ep, h in rows
            ],
            "url string, fetch_ts timestamp, content_hash string",
        )
        got = recrawl_priority(df, now_epoch=self.NOW)
        return {
            r["url"]: (
                r["n_fetches"], r["n_changes"], r["last_epoch"],
                r["span_s"], r["age_s"], r["rate_ppm_day"],
                r["priority_ppm"],
            )
            for r in got.collect()
        }

    def test_matches_python_formula(self, spark):
        base = 1_690_000_000
        rows = []
        for u in range(8):
            for i in range(1 + u):
                rows.append(
                    (
                        f"u{u}",
                        base + i * 3600 * (u + 1),
                        f"v{(i * (u % 3 + 1)) // 2}",
                    )
                )
        assert self._run(spark, rows) == self._python(rows)

    def test_single_fetch_reports_zero_evidence(self, spark):
        got = self._run(spark, [("u", 1_690_000_000, "v0")])
        n, chg, last, span, age, rate, pri = got["u"]
        assert (n, chg, span) == (1, 0, 0)
        assert rate == 0 and pri == 0
        assert age == self.NOW - 1_690_000_000

    def test_static_page_zero_priority_fast_changer_high(self, spark):
        base = 1_690_000_000
        rows = [("static", base + i * 3600, "same") for i in range(10)]
        rows += [("hot", base + i * 3600, f"v{i}") for i in range(10)]
        got = self._run(spark, rows)
        assert got["static"][6] == 0
        assert got["hot"][6] > 0
        assert got == self._python(rows)


class TestCrawlBudget:
    TOTAL = 9973

    @classmethod
    def _python(cls, weights, total=None):
        total = cls.TOTAL if total is None else total
        w_sum = max(sum(w for _, w in weights), 1)
        floors = {h: (total * w) // w_sum for h, w in weights}
        rems = {h: (total * w) % w_sum for h, w in weights}
        r = total - sum(floors.values())
        winners = sorted(weights, key=lambda p: (-rems[p[0]], p[0]))[:r]
        out = dict(floors)
        for h, _ in winners:
            out[h] += 1
        return out

    def _run(self, spark, weights, total=None, bands=1024):
        from chunksilo_spark.operators.frontier import crawl_budget

        df = spark.createDataFrame(weights, "host string, weight long")
        got = crawl_budget(
            df, self.TOTAL if total is None else total, bands=bands
        )
        return {r["host"]: r["quota"] for r in got.collect()}

    def test_matches_python_hamilton(self, spark):
        weights = [(f"h{i:02d}", (i * 37 + 11) % 101 + 1) for i in range(40)]
        got = self._run(spark, weights)
        assert got == self._python(weights)
        assert sum(got.values()) == self.TOTAL

    def test_band_count_does_not_change_output(self, spark):
        # band-major order must equal global remainder order: bands=1
        # (one global band) and bands=1024 are the same apportionment
        weights = [(f"h{i}", i % 7 + 1) for i in range(25)]
        assert self._run(spark, weights, bands=1) == self._run(
            spark, weights, bands=1024
        )

    def test_within_one_of_exact_share(self, spark):
        weights = [("a", 1), ("b", 1), ("c", 998)]
        got = self._run(spark, weights, total=1000)
        assert sum(got.values()) == 1000
        for h, w in weights:
            exact = 1000 * w / 1000
            assert exact - 1 < got[h] < exact + 1 or got[h] in (
                int(exact), int(exact) + 1
            )
        assert got == self._python(weights, 1000)

    def test_zero_weight_hosts_and_validation(self, spark):
        import pytest as _pytest

        from chunksilo_spark.operators.frontier import crawl_budget

        weights = [("z1", 0), ("z2", 0), ("big", 10)]
        got = self._run(spark, weights, total=12)
        assert got == self._python(weights, 12)
        assert sum(got.values()) == 12
        df = spark.createDataFrame(weights, "host string, weight long")
        with _pytest.raises(ValueError):
            crawl_budget(df, -1)


class TestParseSitemaps:
    URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<!-- generator: test -->
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc> https://a.example/p/1?x=1&amp;y=2 </loc><lastmod>2024-03-05</lastmod><changefreq>Daily</changefreq><priority>0.8</priority></url>
<url><loc>https://a.example/p/2</loc><lastmod>2024-03-05T04:15:30+02:00</lastmod><changefreq>sometimes</changefreq></url>
<url><loc>https://b.example/p/3</loc><lastmod>2024-03-05T04:15:30.25Z</lastmod><priority>1.0</priority></url>
<url><lastmod>2024-01-01</lastmod></url>
<url><loc>https://a.example/p/4</loc><lastmod>not-a-date</lastmod><priority>bogus</priority></url>
</urlset>"""
    INDEX = ("<sitemapindex><sitemap><loc>https://a.example/s1.xml</loc>"
             "<lastmod>2024-02-01</lastmod></sitemap>"
             "<sitemap><loc>https://c.example/s2.xml</loc></sitemap>"
             "</sitemapindex>")

    def _run(self, spark, rows):
        from chunksilo_spark.operators.frontier import parse_sitemaps

        df = spark.createDataFrame(rows, "host string, xml string")
        return sorted(
            tuple(r) for r in parse_sitemaps(df).collect()
        )

    def test_urlset_fields_and_defaults(self, spark):
        got = self._run(spark, [("a.example", self.URLSET)])
        # 2024-03-05T00:00:00Z = 1709596800
        assert got == [
            ("a.example", "url", "https://a.example/p/1?x=1&y=2",
             "2024-03-05", 1709596800, "daily", 800000, True),
            ("a.example", "url", "https://a.example/p/2",
             "2024-03-05T04:15:30+02:00", 1709596800 + 15330 - 7200,
             None, 500000, True),
            ("a.example", "url", "https://a.example/p/4",
             "not-a-date", None, None, None, True),
            ("a.example", "url", "https://b.example/p/3",
             "2024-03-05T04:15:30.25Z", 1709596800 + 15330,
             None, 1000000, False),
        ]

    def test_sitemapindex_kind_and_recursion_ledger(self, spark):
        got = self._run(spark, [("a.example", self.INDEX)])
        assert got == [
            ("a.example", "sitemap", "https://a.example/s1.xml",
             "2024-02-01", 1706745600, None, 500000, True),
            ("a.example", "sitemap", "https://c.example/s2.xml",
             None, None, None, 500000, False),
        ]

    def test_mixed_corpus_one_pass(self, spark):
        got = self._run(
            spark, [("a.example", self.URLSET), ("a.example", self.INDEX)]
        )
        assert len(got) == 6
        assert {k for _, k, *_ in got} == {"url", "sitemap"}

    def test_single_level_entity_decode(self, spark):
        # '&amp;lt;' is the LITERAL text '&lt;' (one decode pass only)
        xml = ("<urlset><url><loc>https://a.example/?q=&amp;lt;tag"
               "&amp;gt;&apos;&quot;</loc></url></urlset>")
        got = self._run(spark, [("a.example", xml)])
        assert got[0][2] == "https://a.example/?q=&lt;tag&gt;'\""

    def test_comments_stripped_and_negative_offset(self, spark):
        xml = ("<urlset><!-- <url><loc>https://x/commented</loc></url> -->"
               "<url><loc>https://a.example/p</loc>"
               "<lastmod>2024-03-05T04:15:30-05:30</lastmod></url></urlset>")
        got = self._run(spark, [("a.example", xml)])
        assert len(got) == 1
        assert got[0][4] == 1709596800 + 15330 + 5 * 3600 + 30 * 60


class TestCrawlDelays:
    ROBOTS = """# corpus-wide politeness
User-agent: *
Crawl-delay: 2
Disallow: /private/

User-agent: silobot
Crawl-delay: 0.9
Allow: /
"""

    def _run(self, spark, rows, agent):
        from chunksilo_spark.operators.frontier import crawl_delays

        df = spark.createDataFrame(rows, "host string, robots_txt string")
        return {
            r["host"]: r["delay_s"]
            for r in crawl_delays(df, agent).collect()
        }

    def test_exact_agent_overrides_star_and_truncates(self, spark):
        got = self._run(spark, [("a.example", self.ROBOTS)], "SiloBot")
        assert got == {"a.example": 0}  # 0.9 truncates to 0 whole sec
        got = self._run(spark, [("a.example", self.ROBOTS)], "otherbot")
        assert got == {"a.example": 2}

    def test_malformed_and_missing_emit_no_row(self, spark):
        rows = [
            ("bad.example", "User-agent: *\nCrawl-delay: soonish\n"),
            ("none.example", "User-agent: *\nDisallow: /x\n"),
            ("neg.example", "User-agent: *\nCrawl-delay: -5\n"),
        ]
        assert self._run(spark, rows, "silobot") == {}

    def test_max_wins_within_selected_groups(self, spark):
        txt = ("User-agent: *\nCrawl-delay: 3\n\n"
               "User-agent: *\nCrawl-delay: 7\n")
        assert self._run(spark, [("h", txt)], "any") == {"h": 7}

    def test_exact_group_without_delay_falls_back_to_star(self, spark):
        txt = ("User-agent: silobot\nDisallow: /x\n\n"
               "User-agent: *\nCrawl-delay: 4\n")
        assert self._run(spark, [("h", txt)], "silobot") == {"h": 4}

    def test_spacing_composition_with_scheduler(self, spark):
        # fetch_after_s = (pos - 1) * delay_s spaces each host's queue
        import pyspark.sql.functions as F_

        from chunksilo_spark.operators.frontier import (
            crawl_delays,
            schedule_frontier,
        )

        frontier = spark.createDataFrame(
            [("h", f"u{i}", 10 - i) for i in range(4)],
            "host string, url string, priority int",
        )
        delays = crawl_delays(
            spark.createDataFrame(
                [("h", "User-agent: *\nCrawl-delay: 5\n")],
                "host string, robots_txt string",
            ),
            "silobot",
        )
        sched = schedule_frontier(frontier, limit=4).join(delays, "host")
        out = {
            r["url"]: r["fa"]
            for r in sched.select(
                "url",
                ((F_.col("pos") - 1) * F_.col("delay_s")).alias("fa"),
            ).collect()
        }
        assert out == {"u0": 0, "u1": 5, "u2": 10, "u3": 15}


class TestCrawlBudgetPlan:
    def test_remainder_rank_is_banded_not_global(self, spark):
        """The top-R-by-remainder selection must run inside remainder
        bands: the quota-side window's exchange hash-partitions on the
        band key (a global single-partition row_number over the host
        relation would be the scale bug the banding exists to avoid)."""
        import io
        from contextlib import redirect_stdout

        from chunksilo_spark.operators.frontier import crawl_budget

        df = spark.createDataFrame(
            [(f"h{i}", i % 9 + 1) for i in range(50)],
            "host string, weight long",
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            crawl_budget(df, 1000).explain("formatted")
        plan = buf.getvalue()
        assert "hashpartitioning(_band" in plan


class TestFrontierEndToEnd:
    """The six frontier verbs compose into one wave plan: discover
    (sitemaps) -> comply (robots) -> budget (Hamilton quotas) ->
    schedule (politeness order) -> pace (crawl-delay spacing), checked
    against a straight-line python replay."""

    def test_six_verb_composition(self, spark):
        import pyspark.sql.functions as F_

        from chunksilo_spark.operators.frontier import (
            crawl_budget,
            crawl_delays,
            parse_robots,
            parse_sitemaps,
            robots_filter,
            schedule_frontier,
        )

        hosts = [f"h{i}.example" for i in range(3)]
        # DISCOVER: each host submits 6 urls with priorities via sitemap
        sitemaps = spark.createDataFrame(
            [
                (
                    h,
                    "<urlset>" + "".join(
                        f"<url><loc>https://{h}/p/{i}</loc>"
                        f"<priority>0.{9 - i}</priority></url>"
                        for i in range(6)
                    ) + "</urlset>",
                )
                for h in hosts
            ],
            "host string, xml string",
        )
        entries = parse_sitemaps(sitemaps).where(F_.col("kind") == "url")
        # COMPLY: h0 blocks /p/0 and /p/1 for everyone; h2 sets a delay
        robots = spark.createDataFrame(
            [
                ("h0.example",
                 "User-agent: *\nDisallow: /p/0\nDisallow: /p/1\n"),
                ("h2.example", "User-agent: *\nCrawl-delay: 7\n"),
            ],
            "host string, robots_txt string",
        )
        rules = parse_robots(robots)
        frontier = entries.select(
            "host",
            F_.regexp_replace("loc", r"^https://[^/]+", "").alias("path"),
            F_.col("loc").alias("url"),
            F_.col("priority_ppm").alias("priority"),
        )
        allowed = robots_filter(frontier, rules, "silobot").where(
            F_.col("allowed") == 1
        )
        # BUDGET: 10 fetches apportioned by per-host priority mass
        quotas = crawl_budget(
            allowed.groupBy("host").agg(
                F_.sum("priority").cast("long").alias("weight")
            ),
            10,
        )
        # SCHEDULE + cap each host at its quota
        sched = schedule_frontier(
            allowed.select("host", "url", "priority"), limit=100
        ).join(quotas.select("host", "quota"), "host").where(
            F_.col("pos") <= F_.col("quota")
        )
        # PACE
        delays = crawl_delays(robots, "silobot")
        wave = sched.join(delays, "host", "left").select(
            "host", "url", "pos",
            ((F_.col("pos") - 1) * F_.coalesce("delay_s", F_.lit(0)))
            .alias("fetch_after_s"),
        )
        got = {
            r["url"]: (r["pos"], r["fetch_after_s"])
            for r in wave.collect()
        }

        # ---- python replay ----
        # h0 loses p/0 (0.9) and p/1 (0.8) to robots; weights:
        w = {
            "h0.example": sum(900000 - i * 100000 for i in range(2, 6)),
            "h1.example": sum(900000 - i * 100000 for i in range(6)),
            "h2.example": sum(900000 - i * 100000 for i in range(6)),
        }
        W = sum(w.values())
        fl = {h: 10 * x // W for h, x in w.items()}
        rem = {h: 10 * x % W for h, x in w.items()}
        seats = 10 - sum(fl.values())
        for h, _ in sorted(rem.items(), key=lambda kv: (-kv[1], kv[0]))[
            :seats
        ]:
            fl[h] += 1
        assert sum(fl.values()) == 10
        want = {}
        for h in hosts:
            urls = list(range(6)) if h != "h0.example" else [2, 3, 4, 5]
            # per-host priority order = ascending i (priority 0.9-i)
            for pos, i in enumerate(urls[: fl[h]], start=1):
                delay = 7 if h == "h2.example" else 0
                want[f"https://{h}/p/{i}"] = (pos, (pos - 1) * delay)
        assert got == want
