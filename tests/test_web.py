"""URL/domain ingest hygiene (operators/web.py): host extraction edge
cases, blocklist anti-join semantics (exact host vs whole registered
domain), per-domain cap exactness + determinism, and the plan shapes
(broadcast anti-joins, WindowGroupLimit)."""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from retrieval_augmented_generation_rag_data_pipeline_spark.operators.web import (  # noqa: E402
    domain_caps,
    extract_host,
    url_filter,
)


def _plan(spark, df) -> str:
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _docs(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )


def test_extract_host_edges(spark):
    urls = [
        "https://www.Example.COM/path?q=1",       # case folded
        "http://user:pw@ads.example.com:8080/x",  # userinfo + port stripped
        "ftp://a.b.co.uk/file",                   # 2-label domain approx
        "https://localhost/",                     # single label -> no domain
        "not a url at all",                       # no host
        "https://example.org",                    # bare host, no path
    ]
    rows = {
        r.doc_id: (r.host, r.domain)
        for r in extract_host(_docs(spark, urls)).collect()
    }
    assert rows[0] == ("www.example.com", "example.com")
    assert rows[1] == ("ads.example.com", "example.com")
    # documented 2-label approximation: co.uk-style public suffixes
    # need the PSL broadcast join mentioned in the module docstring
    assert rows[2] == ("a.b.co.uk", "co.uk")
    assert rows[3] == ("localhost", "")
    assert rows[4] == ("", "")
    assert rows[5] == ("example.org", "example.org")


def test_url_filter_blocks_host_and_whole_domain(spark):
    urls = [
        "https://ads.example.com/x",    # blocked: exact host
        "https://www.example.com/x",    # kept: host not listed, domain not listed
        "https://a.spam.net/x",         # blocked: registered domain spam.net
        "https://spam.net/x",           # blocked: host == domain entry
        "https://clean.org/x",          # kept
    ]
    block = spark.createDataFrame(
        [("ads.example.com",), ("SPAM.net",)], "pattern string"
    )  # blocklist case-folded too
    kept = sorted(
        r.doc_id for r in url_filter(_docs(spark, urls), block).collect()
    )
    assert kept == [1, 4]


def test_url_filter_plan_broadcasts_and_never_nested_loops(spark):
    urls = [f"https://h{i}.d{i % 3}.com/x" for i in range(20)]
    block = spark.createDataFrame([("d0.com",)], "pattern string")
    plan = _plan(spark, url_filter(_docs(spark, urls), block))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # host + domain anti-joins (tree section; detail sections repeat them)
    assert plan.count("BroadcastHashJoin LeftAnti") == 2


def test_domain_caps_exact_k_and_deterministic(spark):
    # 3 domains x 10 docs each; cap at 4
    urls = [
        f"https://sub{i}.dom{d}.net/p/{i}" for d in range(3) for i in range(10)
    ]
    capped1 = domain_caps(_docs(spark, urls), 4, seed=3)
    rows1 = sorted((r.domain, r.doc_id) for r in capped1.collect())
    counts = {}
    for dom, _ in rows1:
        counts[dom] = counts.get(dom, 0) + 1
    assert counts == {"dom0.net": 4, "dom1.net": 4, "dom2.net": 4}
    # deterministic: same seed -> identical kept set
    rows2 = sorted(
        (r.domain, r.doc_id)
        for r in domain_caps(_docs(spark, urls), 4, seed=3).collect()
    )
    assert rows1 == rows2
    # different seed -> (almost surely) different kept set
    rows3 = sorted(
        (r.domain, r.doc_id)
        for r in domain_caps(_docs(spark, urls), 4, seed=4).collect()
    )
    assert rows1 != rows3
    # under-full domains keep everything
    few = domain_caps(_docs(spark, urls[:2]), 4, seed=3)
    assert few.count() == 2


def test_domain_caps_plan_uses_window_group_limit(spark):
    urls = [f"https://s{i}.d{i % 2}.org/x" for i in range(8)]
    plan = _plan(spark, domain_caps(_docs(spark, urls), 2))
    assert "WindowGroupLimit" in plan


def test_canonicalize_url_edges(spark):
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.web import (
        canonicalize_url,
    )

    urls = [
        "HTTPS://User@WWW.Example.COM:8080/CaseSensitive/Path?Q=Mixed#Frag",
        "https://www.example.com/CaseSensitive/Path?Q=Mixed#other",
        "https://www.example.com/CaseSensitive/Path?Q=Mixed",
        "no scheme here #frag",
    ]
    got = {
        r.doc_id: r.url_norm
        for r in canonicalize_url(_docs(spark, urls)).collect()
    }
    # scheme+host:port lowercased; userinfo (case-sensitive per RFC
    # 3986 — only scheme and host are case-insensitive), path and
    # query VERBATIM; fragment gone
    assert got[0] == "https://User@www.example.com:8080/CaseSensitive/Path?Q=Mixed"
    # 1 and 2 collapse (fragment is the only difference)
    assert got[1] == got[2] == "https://www.example.com/CaseSensitive/Path?Q=Mixed"
    # schemeless strings only lose the fragment
    assert got[3] == "no scheme here "


def test_url_dedup_keeps_lowest_id_per_canonical_url(spark):
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.web import (
        url_dedup,
    )

    urls = [
        "https://a.com/x#1",          # 0 — canonical for a.com/x
        "HTTPS://A.COM/x#2",          # 1 — dup of 0 (case + fragment)
        "https://a.com/x?v=1",        # 2 — DIFFERENT (query differs)
        "https://b.com/y",            # 3 — alone
        "https://a.com/X",            # 4 — DIFFERENT (path case-sensitive)
    ]
    rows = {r.doc_id: r for r in url_dedup(_docs(spark, urls)).collect()}
    assert len(rows) == 5  # one audit row per input
    assert rows[0].keep and rows[0].canonical_id == 0
    assert not rows[1].keep and rows[1].canonical_id == 0
    assert rows[2].keep and rows[3].keep and rows[4].keep


def test_html_clean_strips_decodes_and_structures(spark):
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.web import (
        html_clean,
    )

    html = (
        '<html><head><title>My Title</title>'
        '<script type="text/javascript">var x = 1 < 2; alert("hi");</script>'
        "<style>.a{color:red}</style></head>"
        "<body><h1>Heading Words</h1>"
        "<p>first para &amp; more</p>"
        "<div>above<br>below &lt;kept&gt;&nbsp;tail</div>"
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, text string")
    r = html_clean(df).collect()[0]
    # script/style contents gone entirely
    assert "alert" not in r.text_clean and "color" not in r.text_clean
    # block closers and <br> became line breaks
    assert r.text_clean.split("\n") == [
        "My Title Heading Words",
        "first para & more",
        "above",
        "below <kept> tail",
    ]
    assert r.n_tags > 0 and r.n_entities == 4  # amp, lt, gt, nbsp


def test_html_clean_single_pass_entity_decode_and_fixpoint(spark):
    from pyspark.sql import functions as F

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.web import (
        html_clean,
    )

    rows = [
        # &amp;lt; must decode to the LITERAL '&lt;', not '<'
        (1, "<p>escaped: &amp;lt; stays text</p>"),
        # already-clean prose is a fixpoint (0 tags, 0 entities, byte-stable)
        (2, "plain prose line one\nplain prose line two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in html_clean(df).collect()}
    assert got[1].text_clean == "escaped: &lt; stays text"
    assert got[2].n_tags == 0 and got[2].n_entities == 0
    assert got[2].text_clean == "plain prose line one\nplain prose line two"
    # running the cleaner on its own clean output changes nothing more
    # for tag-free text (entities produced by decoding are data now —
    # the single-pass contract — so only doc 2 is asserted byte-stable)
    again = html_clean(
        html_clean(df).select("doc_id", F.col("text_clean").alias("text"))
    )
    got2 = {r.doc_id: r.text_clean for r in again.collect()}
    assert got2[2] == got[2].text_clean


def test_html_clean_feeds_c4_line_filter(spark):
    """The composed front door: html_clean's newline structure is what
    c4_line_filter consumes — block-level text becomes real lines."""
    from pyspark.sql import functions as F

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.text import (
        c4_line_filter,
    )
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.web import (
        html_clean,
    )

    html = (
        "<body><p>this paragraph carries enough words to pass the rule.</p>"
        "<p>short one.</p>"
        "<p>another full sentence with plenty of words to keep here.</p></body>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, text string")
    cleaned = html_clean(df).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    r = c4_line_filter(cleaned, min_kept_lines=2).collect()[0]
    assert r.n_lines == 3
    assert r.n_kept == 2      # the two long sentences
    assert r.n_drop_short == 1
    assert r.keep


def test_extract_host_trailing_dot_and_ipv6(spark):
    """Round-14 hardening: the FQDN trailing-dot form must normalize to
    the same host (else it bypasses every blocklist entry), and a
    bracketed IPv6 authority must not be truncated at its first ':'."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.web import url_filter

    urls = [
        "https://ads.example.com./x",        # trailing dot = same host
        "https://Example.COM../y",           # even doubled
        "https://[2001:db8::1]:8080/x",      # bracketed IPv6 + port
        "https://[2001:db8::1]/y",           # bracketed IPv6, no port
    ]
    rows = {
        r.doc_id: (r.host, r.domain)
        for r in extract_host(_docs(spark, urls)).collect()
    }
    assert rows[0] == ("ads.example.com", "example.com")
    assert rows[1] == ("example.com", "example.com")
    assert rows[2] == ("[2001:db8::1]", "")
    assert rows[3] == ("[2001:db8::1]", "")
    # and the blocklist now actually catches both forms
    block = spark.createDataFrame(
        [("example.com",), ("[2001:db8::1]",)], "pattern string"
    )
    kept = url_filter(_docs(spark, urls), block).count()
    assert kept == 0


def test_url_dedup_null_url_rows_survive_as_singletons(spark):
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.web import url_dedup

    df = spark.createDataFrame(
        [(0, "https://a.com/x"), (1, None), (2, None), (3, "https://a.com/x#f")],
        "doc_id long, url string",
    )
    rows = {r.doc_id: r for r in url_dedup(df).collect()}
    assert len(rows) == 4  # one audit row per input, NULLs included
    # each NULL-url doc is its own singleton cluster, never merged
    assert rows[1].keep and rows[1].canonical_id == 1
    assert rows[2].keep and rows[2].canonical_id == 2
    assert rows[0].keep and not rows[3].keep and rows[3].canonical_id == 0


def test_domain_caps_empty_domain_tiers(spark):
    """Cap-key degradation: single-label hosts cap PER HOST (two
    intranet hosts never cap against each other), and unparseable
    URLs pass through uncapped instead of pooling into one ''
    pseudo-domain."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.web import domain_caps

    urls = (
        [f"https://alpha/{i}" for i in range(4)]       # single-label host A
        + [f"https://beta/{i}" for i in range(4)]      # single-label host B
        + [f"garbage-{i}" for i in range(5)]           # no host at all
        + [f"https://x.example.com/{i}" for i in range(4)]  # real domain
    )
    out = domain_caps(_docs(spark, urls), 2)
    by_host = {
        h: c for h, c in out.groupBy("host").count().collect()
    }
    assert by_host["alpha"] == 2 and by_host["beta"] == 2  # per-host caps
    assert by_host[""] == 5                                # uncapped passthrough
    assert by_host["x.example.com"] == 2


# ---------------------------------------------------------------------
# Public-suffix-list registered domains (round-14 verdict item 2)
# ---------------------------------------------------------------------


def test_extract_host_psl_registered_domains(spark):
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.web import frozen_suffixes

    sfx = frozen_suffixes()
    urls = [
        "https://www.example.co.uk/page",      # 2-label suffix
        "https://a.b.news.example.co.uk/x",    # deep subdomain, same reg dom
        "https://school.act.edu.au/",          # 3-label suffix, bare reg dom
        "https://www.school.act.edu.au/",      # 3-label suffix + subdomain
        "https://co.uk/",                      # host IS a listed suffix
        "https://www.example.com/",            # unlisted -> default 2-label
        "https://localhost/",                  # single label -> ''
        "garbage",                             # no host -> ''
    ]
    got = {
        r.doc_id: (r.host, r.domain)
        for r in extract_host(_docs(spark, urls), suffixes=sfx).collect()
    }
    assert got[0] == ("www.example.co.uk", "example.co.uk")
    assert got[1] == ("a.b.news.example.co.uk", "example.co.uk")
    assert got[2] == ("school.act.edu.au", "school.act.edu.au")
    assert got[3] == ("www.school.act.edu.au", "school.act.edu.au")
    assert got[4] == ("co.uk", "co.uk")          # degrades to the host
    assert got[5] == ("www.example.com", "example.com")
    assert got[6] == ("localhost", "")
    assert got[7] == ("", "")


def test_url_filter_psl_blocks_cctld_subdomains(spark):
    """The round-14 verdict's Done criterion: blocklist entry
    example.co.uk must block www.example.co.uk — under the two-label
    default the derived domain is co.uk and the entry never matches."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.web import frozen_suffixes

    urls = [
        "https://www.example.co.uk/a",   # blocked via PSL domain
        "https://example.co.uk/b",       # blocked (reg dom itself)
        "https://other.co.uk/c",         # kept — sibling site, NOT blocked
        "https://www.example.com/d",     # kept
    ]
    docs = _docs(spark, urls)
    blk = spark.createDataFrame([("example.co.uk",)], "pattern string")
    # two-label default: the exact host still matches the HOST
    # anti-join, but the subdomain bypasses (the documented gap)
    kept_default = {r.doc_id for r in url_filter(docs, blk).collect()}
    assert kept_default == {0, 2, 3}
    # PSL mode: exactly the example.co.uk site is dropped
    kept_psl = {
        r.doc_id
        for r in url_filter(docs, blk, suffixes=frozen_suffixes()).collect()
    }
    assert kept_psl == {2, 3}


def test_domain_caps_psl_does_not_pool_cctld(spark):
    """Under the two-label rule every .co.uk site shares cap key
    'co.uk'; with the PSL each registered domain caps independently."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.web import frozen_suffixes

    urls = [f"https://site{i}.co.uk/p{j}" for i in range(2) for j in range(5)]
    docs = _docs(spark, urls)
    pooled = domain_caps(docs, 3)
    assert pooled.count() == 3  # one shared 'co.uk' key — over-capped
    split = domain_caps(docs, 3, suffixes=frozen_suffixes())
    assert split.count() == 6  # 3 per registered domain
    assert {
        r.domain for r in split.collect()
    } == {"site0.co.uk", "site1.co.uk"}


def test_extract_host_psl_rejects_bad_depth(spark):
    import pytest

    with pytest.raises(ValueError, match="depths are 2-4"):
        extract_host(_docs(spark, ["https://x.y/"]), suffixes=["uk"])
