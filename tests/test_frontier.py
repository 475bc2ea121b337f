"""Crawl-frontier metadata parsers (sources/frontier.py): sitemap XML
and robots.txt group semantics."""

from __future__ import annotations

from distributed_extraction_framework_spark.sources.frontier import (
    parse_robots,
    parse_sitemaps,
)


def test_parse_sitemaps_urlset_and_index(spark):
    sm = (
        '<?xml version="1.0"?><urlset xmlns="https://sm.example/0.9">\n'
        "<url><loc>https://x/1</loc><lastmod>2024-01-01</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>\n"
        "<url><LOC>https://x/2</LOC></url>\n"       # case-insensitive
        "<url><loc> https://x/3 </loc></url>\n"     # padded loc
        "<url><lastmod>2024</lastmod></url>\n"      # loc-less: dropped
        "</urlset>"
    )
    idx = ("<sitemapindex><sitemap><loc>https://x/s1.xml</loc>"
           "<lastmod>2024-02-02T00:00:00Z</lastmod></sitemap>"
           "</sitemapindex>")
    df = spark.createDataFrame([(0, sm), (1, idx), (2, None)],
                               "page_id long, xml string")
    rows = {(r["id"], r["loc"], r["lastmod"], r["changefreq"],
             r["priority"], r["is_index"])
            for r in parse_sitemaps(df).collect()}
    assert rows == {
        (0, "https://x/1", "2024-01-01", "daily", 0.8, False),
        (0, "https://x/2", None, None, None, False),
        (0, "https://x/3", None, None, None, False),
        (1, "https://x/s1.xml", "2024-02-02T00:00:00Z", None, None, True),
    }
    # pure Catalyst: no exchange, no Python
    plan = parse_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_parse_robots_groups(spark):
    txt = (
        "# top comment\n"
        "User-agent: googlebot\n"
        "User-agent: bingbot\n"          # two-agent group
        "Disallow: /private\n"
        "Allow: /private/ok   # inline comment\n"
        "Crawl-delay: 10\r\n"            # CRLF tolerated
        "\n"
        "User-Agent: *\n"                # second group, case-variant key
        "Disallow:\n"                    # empty value = allow-all marker
        "Sitemap: https://x/sitemap.xml\n"
    )
    df = spark.createDataFrame([(0, txt)], "page_id long, text string")
    rows = {(r["agent"], r["directive"], r["value"])
            for r in parse_robots(df).collect()}
    # every rule of the first group fans out to BOTH agents
    for agent in ("googlebot", "bingbot"):
        assert (agent, "disallow", "/private") in rows
        assert (agent, "allow", "/private/ok") in rows
        assert (agent, "crawl-delay", "10") in rows
    assert ("*", "disallow", "") in rows
    # rules never leak across the blank-line group boundary
    assert ("googlebot", "disallow", "") not in rows
    assert (None, "sitemap", "https://x/sitemap.xml") in rows
    assert len(rows) == 8


def test_parse_robots_rules_before_any_group(spark):
    # hostile: rules before any User-agent line have no group -> dropped;
    # empty / null files emit nothing
    df = spark.createDataFrame(
        [(0, "Disallow: /early\nUser-agent: a\nAllow: /x\n"),
         (1, ""), (2, None)],
        "page_id long, text string",
    )
    rows = {(r["id"], r["agent"], r["directive"], r["value"])
            for r in parse_robots(df).collect()}
    assert rows == {(0, "a", "allow", "/x")}


def test_robots_admission_semantics(spark):
    from distributed_extraction_framework_spark.sources.frontier import (
        robots_admission,
    )

    rules = spark.createDataFrame(
        [
            # h1: specific group for 'mybot' AND a * group — specific wins
            ("h1", "mybot", "disallow", "/private"),
            ("h1", "mybot", "allow", "/private/ok"),
            ("h1", "*", "disallow", "/"),          # must be shadowed
            # h2: only a * group
            ("h2", "*", "disallow", "/blocked"),
            # equal-length tie on h3: allow beats disallow
            ("h3", "mybot", "disallow", "/t/a"),
            ("h3", "mybot", "allow", "/t/b"),
            ("h3", "mybot", "allow", "/t/"),
            ("h3", "mybot", "disallow", "/t/"),
            # crawl-delay rows are not admission rules
            ("h1", "mybot", "crawl-delay", "10"),
        ],
        "host string, agent string, directive string, value string",
    )
    frontier = spark.createDataFrame(
        [("https://h1/private/x",), ("https://h1/private/ok/y",),
         ("https://h1/pub",), ("https://h2/blocked/z",),
         ("https://h2/open",), ("https://h3/t/c",),
         ("https://h4/anything",), ("https://h1",)],
        "url string",
    )
    got = {r["url"]: (r["allowed"], r["rule_path"])
           for r in robots_admission(frontier, rules, agent="mybot")
           .collect()}
    assert got["https://h1/private/x"] == (False, "/private")
    # longest prefix wins: the allow overrides the shorter disallow
    assert got["https://h1/private/ok/y"] == (True, "/private/ok")
    # no mybot rule matches /pub; the * group is shadowed entirely
    assert got["https://h1/pub"] == (True, None)
    # host without a specific group falls back to *
    assert got["https://h2/blocked/z"] == (False, "/blocked")
    assert got["https://h2/open"] == (True, None)
    # equal-length tie: allow beats disallow
    assert got["https://h3/t/c"] == (True, "/t/")
    # rule-less host and bare-host URL (path normalized to /)
    assert got["https://h4/anything"] == (True, None)
    assert got["https://h1"] == (True, None)
    assert len(got) == 8


def test_crawl_delays_shadowing_and_hostile_values(spark):
    from distributed_extraction_framework_spark.sources.frontier import (
        crawl_delays,
        parse_robots,
    )

    robots = {
        # specific group shadows *; max of the winning group's delays
        "a": "User-agent: bot\nCrawl-delay: 2\nCrawl-delay: 3\n"
             "Disallow: /x\nUser-agent: *\nCrawl-delay: 9\n",
        # only *; non-numeric line drops, numeric survives
        "b": "User-agent: *\nCrawl-delay: fast\nCrawl-delay: 1.5\n",
        # only non-numeric -> host absent from the output
        "c": "User-agent: *\nCrawl-delay: soon\n",
        # no crawl-delay at all -> absent
        "d": "User-agent: *\nDisallow: /\n",
    }
    df = spark.createDataFrame(list(robots.items()),
                               "page_id string, text string")
    from pyspark.sql import functions as F

    rules = parse_robots(df).withColumn("host", F.col("id"))
    got = {r["host"]: r["crawl_delay"]
           for r in crawl_delays(rules, agent="bot").collect()}
    assert got == {"a": 3.0, "b": 1.5}


def test_robots_empty_disallow_allows_all(spark):
    """RFC 9309: 'Disallow:' with an EMPTY value matches no path — the
    ubiquitous permissive idiom must not block the host (code-review r5
    wave-3 #1); an empty Allow likewise matches nothing."""
    from distributed_extraction_framework_spark.sources.frontier import (
        parse_robots, robots_admission,
    )

    from pyspark.sql import functions as F

    txt = spark.createDataFrame(
        [(0, "User-agent: *\nDisallow:")], "page_id long, text string"
    )
    rules = parse_robots(txt).withColumn("host", F.lit("h1"))
    frontier = spark.createDataFrame(
        [("https://h1/any/page",), ("https://h1/",)], "url string"
    )
    got = {r["url"]: r["allowed"]
           for r in robots_admission(frontier, rules).collect()}
    assert got == {"https://h1/any/page": True, "https://h1/": True}


def test_robots_agent_case_insensitive(spark):
    """agent='MyBot' must match the lowercased stored group
    (code-review r5 wave-3 #6), for admission AND crawl delays."""
    from distributed_extraction_framework_spark.sources.frontier import (
        crawl_delays, robots_admission,
    )

    rules = spark.createDataFrame(
        [("h1", "mybot", "disallow", "/p"),
         ("h1", "*", "disallow", "/"),
         ("h1", "mybot", "crawl-delay", "7"),
         ("h1", "*", "crawl-delay", "1")],
        "host string, agent string, directive string, value string",
    )
    frontier = spark.createDataFrame(
        [("https://h1/p/x",), ("https://h1/open",)], "url string"
    )
    got = {r["url"]: r["allowed"]
           for r in robots_admission(frontier, rules, agent="MyBot")
           .collect()}
    # the specific group applies (and shadows the * catch-all disallow)
    assert got == {"https://h1/p/x": False, "https://h1/open": True}
    d = crawl_delays(rules, agent="MyBot").collect()[0]
    assert d["crawl_delay"] == 7.0


def test_robots_admission_host_identity(spark):
    """userinfo / default-port URL variants must still match their
    host's rules (found driving the verify pass after wave-3 #5)."""
    from distributed_extraction_framework_spark.sources.frontier import (
        robots_admission,
    )

    rules = spark.createDataFrame(
        [("example.com", "*", "disallow", "/private")],
        "host string, agent string, directive string, value string",
    )
    frontier = spark.createDataFrame(
        [("https://user@example.com/private/x",),
         ("https://EXAMPLE.com:443/private/y",),
         ("https://example.com/open",)], "url string"
    )
    got = {r["url"]: r["allowed"]
           for r in robots_admission(frontier, rules).collect()}
    assert got["https://user@example.com/private/x"] is False
    assert got["https://EXAMPLE.com:443/private/y"] is False
    assert got["https://example.com/open"] is True
