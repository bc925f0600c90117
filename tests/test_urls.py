"""functions/urls.py — canonicalization, registered domain (both
engines from the one pinned suffix table), per-host cap."""

import duckdb
import pytest
from pyspark.sql import functions as F

from parquet_editor_spark.functions import urls as U

_CASES = [
    # raw url, canonical, host, registered domain
    (
        "HTTPS://WWW.Site3.co.uk:443/Articles/5?b=1&a=2#x",
        "https://site3.co.uk/Articles/5?a=2&b=1",
        "site3.co.uk",
        "site3.co.uk",
    ),
    (
        "http://site4.com:8080",
        "http://site4.com:8080/",
        "site4.com",
        "site4.com",
    ),
    (
        "http://CDN.Site5.org./p",
        "http://cdn.site5.org/p",
        "cdn.site5.org",
        "site5.org",
    ),
    (
        "https://site6.io?a=1",
        "https://site6.io/?a=1",
        "site6.io",
        "site6.io",
    ),
    (
        "http://deep.sub.Site7.gov.uk:80/x",
        "http://deep.sub.site7.gov.uk/x",
        "deep.sub.site7.gov.uk",
        "site7.gov.uk",
    ),
    (
        "http://localhost:9999/admin",
        "http://localhost:9999/admin",
        "localhost",
        "localhost",  # no suffix match: passes through
    ),
    (
        "ftp://Files.example.com:21/pub",
        "ftp://files.example.com/pub",
        "files.example.com",
        "example.com",
    ),
]


def test_canonical_url_host_and_registered_domain(spark):
    df = spark.createDataFrame([(u,) for u, *_ in _CASES], "u string")
    got = df.select(
        "u",
        U.canonical_url("u").alias("canon"),
        U.url_host("u").alias("host"),
        U.registered_domain(U.url_host("u")).alias("reg"),
    ).collect()
    by_url = {r["u"]: r for r in got}
    for u, canon, host, reg in _CASES:
        r = by_url[u]
        assert r["canon"] == canon, u
        assert r["host"] == host, u
        assert r["reg"] == reg, u


def test_registered_domain_sql_mirror_matches_spark(spark):
    """The DuckDB CASE chain is generated from the SAME suffix table;
    both engines must agree on every case including multi-label
    suffixes, bare suffixes, and no-match hosts."""
    hosts = [h for _, _, h, _ in _CASES] + [
        "co.uk",  # bare suffix: no label to its left -> pass through
        "a.co.uk",
        "x.y.z.com.au",
        "internal",
        "a.unknowntld",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    spark_out = {
        r["h"]: r["reg"]
        for r in df.select(
            "h", U.registered_domain("h").alias("reg")
        ).collect()
    }
    con = duckdb.connect()
    sql = U.registered_domain_sql("h")
    for h in hosts:
        duck = con.sql(
            f"SELECT {sql} FROM (SELECT ? AS h)", params=[h]
        ).fetchone()[0]
        assert duck == spark_out[h], h
    assert spark_out["co.uk"] == "co.uk"
    assert spark_out["x.y.z.com.au"] == "z.com.au"
    assert spark_out["a.unknowntld"] == "a.unknowntld"


def test_host_cap_keeps_first_n_deterministically(spark):
    rows = [(h, i) for h in ("a.com", "b.com") for i in range(5)] + [
        ("c.com", 0)
    ]
    df = spark.createDataFrame(rows, "host string, doc_id long")
    out = U.host_cap(df, "host", 3, ["doc_id"]).collect()
    kept = sorted((r["host"], r["doc_id"], r["host_rank"], r["host_docs"]) for r in out)
    assert kept == [
        ("a.com", 0, 1, 5), ("a.com", 1, 2, 5), ("a.com", 2, 3, 5),
        ("b.com", 0, 1, 5), ("b.com", 1, 2, 5), ("b.com", 2, 3, 5),
        ("c.com", 0, 1, 1),
    ]
    with pytest.raises(ValueError):
        U.host_cap(df, "host", 0, ["doc_id"])


_ROBOTS = """# robots for test
User-agent: badbot
Disallow: /

User-agent: bot2
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:
Disallow: /tmp
"""


def test_robots_rules_star_group_only(spark):
    df = spark.createDataFrame(
        [("a.com", _ROBOTS), ("b.com", "User-agent: *\nAllow: /x")],
        "host string, robots string",
    )
    got = {
        (r["host"], r["is_allow"], r["prefix"])
        for r in U.robots_rules(df, "host", "robots").collect()
    }
    # badbot's 'Disallow: /' excluded; empty-value Disallow skipped;
    # the stacked bot2/* group's rules all included
    assert got == {
        ("a.com", 0, "/private"),
        ("a.com", 1, "/private/ok"),
        ("a.com", 0, "/tmp"),
        ("b.com", 1, "/x"),
    }


def test_robots_allowed_longest_match_and_ties(spark):
    rules = spark.createDataFrame(
        [
            ("a.com", 0, "/private"),
            ("a.com", 1, "/private/ok"),
            ("a.com", 0, "/p"),
            ("a.com", 1, "/dual"),   # length tie with next:
            ("a.com", 0, "/dual"),   # allow wins equal length
        ],
        "host string, is_allow int, prefix string",
    )
    urls = spark.createDataFrame(
        [
            (1, "a.com", "/public/page"),      # '/p' prefix -> denied
            (2, "a.com", "/private/x"),        # /private -> denied
            (3, "a.com", "/private/ok/y"),     # longer allow wins
            (4, "a.com", "/dual/z"),           # tie -> allow wins
            (5, "b.com", "/private/x"),        # no rules host -> allowed
        ],
        "doc_id long, host string, path string",
    )
    got = {
        r["doc_id"]: (r["allowed"], r["matched_len"])
        for r in U.robots_allowed(urls, rules).collect()
    }
    assert got == {
        1: (0, 2),   # robots prefixes have no segment boundary
        2: (0, 8),
        3: (1, 11),
        4: (1, 5),
        5: (1, 0),
    }


def test_surt_key_clusters_domains(spark):
    df = spark.createDataFrame(
        [
            ("www.example.com", "/a"),   # caller canonicalizes first
            ("sub.example.com", "/b"),
            ("example.org", "/c"),
        ],
        "host string, path string",
    )
    got = [
        r["s"]
        for r in df.select(U.surt_key("host", "path").alias("s")).collect()
    ]
    assert got == [
        "com,example,www)/a",
        "com,example,sub)/b",
        "org,example)/c",
    ]


def test_canonical_url_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — the property that
    makes re-canonicalizing merged crawl snapshots safe."""
    df = spark.createDataFrame([(u,) for u, *_ in _CASES], "u string")
    once = df.select(U.canonical_url("u").alias("c1"))
    twice = once.select(
        "c1", U.canonical_url("c1").alias("c2")
    ).collect()
    for r in twice:
        assert r["c2"] == r["c1"], r["c1"]


def test_canonical_url_no_tracking_strips_campaign_params(spark):
    """r13: tracking keys (utm_*, fbclid, gclid, mc_eid, _ga, spm …)
    vanish, real params survive sorted, all-tracking queries drop to
    no query at all, and the filter is idempotent + a no-op on clean
    URLs."""
    cases = [
        # (input, expected)
        (
            "https://a.com/p?utm_source=nl&id=3&utm_medium=m",
            "https://a.com/p?id=3",
        ),
        (
            "HTTPS://WWW.A.com/p?fbclid=x1&b=2&a=1",
            "https://a.com/p?a=1&b=2",
        ),
        ("https://a.com/p?gclid=g&utm_x=1", "https://a.com/p"),
        ("https://a.com/p?id=3", "https://a.com/p?id=3"),
        (
            "https://a.com/p?_ga=1.2&mc_eid=e&spm=a.b&x=9",
            "https://a.com/p?x=9",
        ),
        # utmx is NOT a tracking key (anchored utm_ prefix only)
        ("https://a.com/p?utmx=1", "https://a.com/p?utmx=1"),
        ("https://a.com/", "https://a.com/"),
        # r14 (r13 ADVICE): VALUELESS tracking params — no '=' —
        # are still tracking keys ((=|$) alternation)
        ("https://a.com/p?fbclid", "https://a.com/p"),
        ("https://a.com/p?utm_source&id=3", "https://a.com/p?id=3"),
        # r14: uppercase alias forms match via the lowercased pair,
        # and non-tracking params keep their original case
        (
            "https://a.com/p?UTM_SOURCE=x&Id=3",
            "https://a.com/p?Id=3",
        ),
        ("https://a.com/p?FBCLID", "https://a.com/p"),
        # key-PREFIX near-misses still survive under (=|$)
        ("https://a.com/p?fbclid2=x", "https://a.com/p?fbclid2=x"),
    ]
    df = spark.createDataFrame(cases, "u string, want string")
    got = df.select(
        "want", U.canonical_url_no_tracking("u").alias("got")
    ).collect()
    for r in got:
        assert r["got"] == r["want"], (r["want"], r["got"])
    # idempotent: stripping an already-clean canonical is a no-op
    twice = df.select(
        U.canonical_url_no_tracking(
            U.canonical_url_no_tracking("u")
        ).alias("c2"),
        U.canonical_url_no_tracking("u").alias("c1"),
    ).collect()
    for r in twice:
        assert r["c2"] == r["c1"]


def test_robots_rules_ignores_headerless_rules_and_comments(spark):
    df = spark.createDataFrame(
        [
            ("x.com", "Disallow: /orphan\n# note\nUser-agent: *\nAllow: /ok"),
            ("y.com", "# only comments\n\n"),
        ],
        "host string, robots string",
    )
    got = {
        (r["host"], r["is_allow"], r["prefix"])
        for r in U.robots_rules(df, "host", "robots").collect()
    }
    # rules before any User-agent group are ignored; comment-only
    # files yield nothing
    assert got == {("x.com", 1, "/ok")}


def _r10_regex_chain(h: str) -> str:
    """The r10 implementation (anchored-regexp CASE chain), kept here
    as the A/B spec for the r11 split-labels + InSet rewrite."""
    import re

    for s in sorted(
        U.PUBLIC_SUFFIXES, key=lambda s: (-s.count("."), -len(s), s)
    ):
        esc = re.escape(s)
        if re.search(r"(^|\.)[^.]+\." + esc + "$", h):
            return re.search(r"([^.]+\." + esc + ")$", h).group(1)
    return h


def test_registered_domain_matches_r10_regex_chain(spark):
    """A/B pin (r11 verdict item 7): the split-labels rewrite must
    reproduce the r10 regex chain byte-for-byte on a brute battery,
    including empty labels, bare suffixes, deep subdomains and
    no-match hosts — in BOTH engines."""
    parts = ["", "a", "blog"]
    tails = ["co.uk", "uk", "com", "com.au", "unknowntld", "internal"]
    hosts = set()
    for t in tails:
        hosts.add(t)
        for p1 in parts:
            hosts.add(f"{p1}.{t}")
            for p2 in parts:
                hosts.add(f"{p2}.{p1}.{t}")
    hosts |= {"", "x", "a.b.c.co.uk", "x..co.uk", "a..com", "co.uk."}
    hosts = sorted(hosts)
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    got = {
        r["h"]: r["reg"]
        for r in df.select(
            "h", U.registered_domain("h").alias("reg")
        ).collect()
    }
    con = duckdb.connect()
    sql = U.registered_domain_sql("h")
    for h in hosts:
        want = _r10_regex_chain(h)
        assert got[h] == want, (h, got[h], want)
        duck = con.sql(
            f"SELECT {sql} FROM (SELECT ? AS h)", params=[h]
        ).fetchone()[0]
        assert duck == want, (h, duck, want)


def test_registered_domain_plan_has_no_regex(spark):
    """r11 done-criterion: the plan shows no rlike chain — the probe
    compiles to split + IN-set membership."""
    from parquet_editor_spark.plans.explain import formatted_plan

    df = spark.range(4).select(
        U.registered_domain(
            F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".co.uk"))
        ).alias("reg")
    )
    plan = formatted_plan(df)
    assert "rlike" not in plan.lower(), plan
    assert "regexp_extract" not in plan.lower(), plan


# ---------------------------------------------------------------------------
# r12: outlink extraction + RFC 3986 resolution (crawl frontier input 3)
# ---------------------------------------------------------------------------

_HTML = """<!doctype html><html><head>
<link href="/styles.css" rel="stylesheet">
<title>t &amp; x</title></head>
<body>plain text with href= bait and a < b comparisons
<a href="https://abs.example.net/x/1?b=2">dq absolute</a>
<A HREF='/root/Rel'>sq root-relative</A>
<a class="c" href=../up/two>unquoted relative</a>
<a data-x="1" href="//proto.org/p">network-path</a>
<a href="#frag">fragment only</a>
<a href="javascript:void(0)">js</a>
<a href = "spaced/attr" >spaced equals</a>
<a name="anchor-without-href">none</a>
</body></html>"""


def test_extract_outlinks_quoting_case_and_non_anchor(spark):
    df = spark.createDataFrame([(_HTML,)], "html string")
    (got,) = df.select(
        U.extract_outlinks("html").alias("links")
    ).collect()
    assert got["links"] == [
        "https://abs.example.net/x/1?b=2",
        "/root/Rel",
        "../up/two",
        "//proto.org/p",
        "#frag",
        "javascript:void(0)",
        "spaced/attr",
    ]


def test_extract_outlinks_empty_and_null(spark):
    df = spark.createDataFrame(
        [("no links here",), (None,)], "html string"
    )
    rows = df.select(U.extract_outlinks("html").alias("l")).collect()
    assert rows[0]["l"] == []
    assert rows[1]["l"] is None


_RESOLVE_CASES = [
    # base, href, expected (urljoin-verified below too)
    ("https://h.com/a/b.html", "c.html", "https://h.com/a/c.html"),
    ("https://h.com/a/b.html", "../c", "https://h.com/c"),
    ("https://h.com/a/b/", "../../x/y", "https://h.com/x/y"),
    ("https://h.com/a/b.html", "/r/s", "https://h.com/r/s"),
    ("https://h.com/a/b.html", "//z.org/p", "https://z.org/p"),
    ("http://h.com/a/b", "//z.org", "http://z.org"),
    ("https://h.com/a/b?q=1", "", "https://h.com/a/b?q=1"),
    ("https://h.com/a/b?q=1", "#frag", "https://h.com/a/b?q=1"),
    ("https://h.com/a/b", "?x=2", "https://h.com/a/b?x=2"),
    ("https://h.com/a/b", "./", "https://h.com/a/"),
    ("https://h.com/a/b", ".", "https://h.com/a/"),
    ("https://h.com/a/b", "..", "https://h.com/"),
    ("https://h.com/a/b", "../../../up", "https://h.com/up"),
    ("https://h.com", "x", "https://h.com/x"),
    ("https://h.com:8080/a/", "p?y=2#z", "https://h.com:8080/a/p?y=2"),
    ("https://u@h.com/a/", "p", "https://u@h.com/a/p"),
    ("https://h.com/a/b", "mailto:x@y.z", "mailto:x@y.z"),
    (
        "https://h.com/a/b",
        "https://other.io/q#f",
        "https://other.io/q",
    ),
    ("https://h.com/d1/d2/d3/f", "../../x", "https://h.com/d1/x"),
    ("https://h.com/a/b", "sub/dir/../leaf", "https://h.com/a/sub/leaf"),
]


def test_resolve_url_cases(spark):
    df = spark.createDataFrame(
        [(b, h) for b, h, _ in _RESOLVE_CASES], "base string, href string"
    )
    got = [
        r["out"]
        for r in df.select(
            U.resolve_url("base", "href").alias("out")
        ).collect()
    ]
    assert got == [e for _, _, e in _RESOLVE_CASES]


def test_resolve_url_matches_urljoin_randomized(spark):
    """A/B the Catalyst resolver against CPython's RFC 3986
    implementation (urljoin + urldefrag) over a constrained random
    space: clean absolute bases; relative / root-relative /
    network-path / query / fragment / dot-segment hrefs.  Absolute
    hrefs are excluded (they pass through verbatim by contract;
    urljoin additionally normalizes same-scheme absolutes)."""
    import random
    from urllib.parse import urldefrag, urljoin

    rng = random.Random(1207)
    segs = ["a", "bb", "c3", "d-d", "e.f", "g"]
    cases = []
    for _ in range(400):
        scheme = rng.choice(["http", "https"])
        host = rng.choice(["h.com", "x.org", "sub.y.net"])
        port = rng.choice(["", "", ":8080"])
        depth = rng.randrange(0, 4)
        bpath = "/" + "/".join(rng.choice(segs) for _ in range(depth))
        if depth and rng.random() < 0.5:
            bpath += "/"
        bq = rng.choice(["", "", "?k=1", "?b=2&a=1"])
        base = f"{scheme}://{host}{port}{bpath}{bq}"
        kind = rng.randrange(6)
        if kind == 0:  # relative with optional dot segments
            parts = [
                rng.choice(segs + ["..", "."])
                for _ in range(rng.randrange(1, 4))
            ]
            href = "/".join(parts)
        elif kind == 1:  # root-relative
            href = "/" + "/".join(
                rng.choice(segs + [".."])
                for _ in range(rng.randrange(0, 3))
            )
        elif kind == 2:  # network-path
            href = "//z.io/" + rng.choice(segs)
        elif kind == 3:  # query-only
            href = "?q=" + rng.choice(segs)
        elif kind == 4:  # fragment-only / empty
            href = rng.choice(["", "#top"])
        else:  # relative + query + fragment
            href = rng.choice(segs) + "?x=1#sec"
        cases.append((base, href))
    df = spark.createDataFrame(cases, "base string, href string")
    got = [
        r["out"]
        for r in df.select(
            U.resolve_url("base", "href").alias("out")
        ).collect()
    ]
    for (base, href), g in zip(cases, got):
        want = urldefrag(urljoin(base, href))[0]
        assert g == want, (base, href, g, want)


def test_resolve_url_plan_is_pure_codegen(spark):
    from parquet_editor_spark.plans import explain as P

    df = spark.createDataFrame(
        [("https://h.com/a/", "x")], "base string, href string"
    ).select(U.resolve_url("base", "href").alias("out"))
    plan = P.executed_plan(df)
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_robots_sitemaps_global_case_insensitive(spark):
    robots = (
        "# c\nUser-agent: a\nDisallow: /\nSitemap: https://h/s1.xml\n"
        "User-agent: *\nDisallow: /x\n"
        "sitemap: https://h/s2.xml\nSiteMap: https://h/s3.xml\n"
        "Sitemap:\n"  # empty value skipped
    )
    df = spark.createDataFrame(
        [("h.com", robots), ("empty.com", "User-agent: *\nAllow: /")],
        "host string, robots string",
    )
    rows = U.robots_sitemaps(df, "host", "robots").collect()
    got = sorted((r["host"], r["sitemap_idx"], r["sitemap_url"]) for r in rows)
    assert got == [
        ("h.com", 0, "https://h/s1.xml"),
        ("h.com", 1, "https://h/s2.xml"),
        ("h.com", 2, "https://h/s3.xml"),
    ]


def test_extract_anchors_inner_text_and_divergences(spark):
    html = (
        '<p>x</p><a href="/p/1">Read <b>more 1</b>\n now</a>'
        "<a name='no-href'>skip</a>"
        "<A HREF='https://x.net/q'><img src=i> Click 2 </A>"
        '<a href="/broken">never closed'
    )
    df = spark.createDataFrame([(html,)], "html string")
    (row,) = df.select(U.extract_anchors("html").alias("a")).collect()
    assert [(x["href"], x["anchor"]) for x in row["a"]] == [
        ("/p/1", "Read more 1 now"),
        ("https://x.net/q", "Click 2"),
    ]
    # extract_outlinks still sees the unterminated anchor
    (row,) = df.select(U.extract_outlinks("html").alias("l")).collect()
    assert row["l"] == ["/p/1", "https://x.net/q", "/broken"]
