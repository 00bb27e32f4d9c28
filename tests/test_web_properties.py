"""Property-based checks for the round-14 web/front-door operators:
random inputs must satisfy each operator's structural invariants
(hypothesis-driven, same differential style as
test_retrieval_properties.py). Kept to few examples — each example is
a Spark job on this shared box.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from retrieval_augmented_generation_rag_data_pipeline_spark.operators.text import (
    c4_line_filter,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.operators.web import (
    canonicalize_url,
    domain_caps,
    url_dedup,
)

# line fragments that exercise every C4 rule: terminal punct present /
# absent, short / long, marker words, weird whitespace
_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "javascript", "Zeta"]
line_strategy = st.builds(
    lambda ws, tail: " ".join(ws) + tail,
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8),
    st.sampled_from([".", "!", "?", '"', "", " ", ","]),
)
text_strategy = st.lists(line_strategy, min_size=0, max_size=6).map("\n".join)

host_strategy = st.builds(
    lambda scheme, labels, path, frag: scheme + ".".join(labels) + path + frag,
    st.sampled_from(["https://", "HTTP://", "ftp://", ""]),
    st.lists(
        st.sampled_from(["Example", "www", "a", "CDN7", "org"]),
        min_size=1,
        max_size=3,
    ),
    st.sampled_from(["", "/", "/Path?Q=1", "/x/y"]),
    st.sampled_from(["", "#frag", "#A#B"]),
)


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(text_strategy, min_size=1, max_size=6))
def test_c4_counts_partition_and_fixpoint(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = c4_line_filter(df, min_kept_lines=1).collect()
    assert len(rows) == len(texts)
    for r in rows:
        # every line lands in exactly one audit bucket
        assert (
            r.n_kept + r.n_drop_punct + r.n_drop_short + r.n_drop_marker
            == r.n_lines
        )
        assert r.n_lines >= 1  # split('\n') of any string has >=1 element
    # fixpoint: re-cleaning the kept text drops nothing further
    again = c4_line_filter(
        c4_line_filter(df, min_kept_lines=1).select(
            "doc_id", F.col("text_clean").alias("text")
        ),
        min_kept_lines=1,
    ).collect()
    for r in again:
        assert r.n_kept == r.n_lines or r.text_clean == ""


@settings(max_examples=10, deadline=None)
@given(urls=st.lists(host_strategy, min_size=1, max_size=8))
def test_url_canonicalization_idempotent_and_dedup_invariants(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    once = {
        r.doc_id: r.url_norm for r in canonicalize_url(df).collect()
    }
    # idempotent: canonicalizing a canonical URL changes nothing
    again_df = spark.createDataFrame(
        [(i, u) for i, u in once.items()], "doc_id long, url string"
    )
    twice = {
        r.doc_id: r.url_norm for r in canonicalize_url(again_df).collect()
    }
    assert once == twice
    assert all("#" not in u for u in once.values())

    rows = url_dedup(df).collect()
    assert len(rows) == len(urls)  # one audit row per input
    by_norm: dict = {}
    for r in rows:
        by_norm.setdefault(r.url_norm, []).append(r)
    for norm, grp in by_norm.items():
        keeps = [r for r in grp if r.keep]
        assert len(keeps) == 1  # exactly one survivor per canonical URL
        min_id = min(r.doc_id for r in grp)
        assert keeps[0].doc_id == min_id
        assert all(r.canonical_id == min_id for r in grp)


@settings(max_examples=8, deadline=None)
@given(
    n_per_dom=st.lists(st.integers(min_value=0, max_value=7), min_size=1, max_size=4),
    k=st.integers(min_value=1, max_value=4),
)
def test_domain_caps_never_exceeds_k(spark, n_per_dom, k):
    urls, i = [], 0
    for d, n in enumerate(n_per_dom):
        for _ in range(n):
            urls.append((i, f"https://s{i}.dom{d}.net/p"))
            i += 1
    if not urls:
        return
    df = spark.createDataFrame(urls, "doc_id long, url string")
    rows = domain_caps(df, k).collect()
    counts: dict = {}
    kept_ids = set()
    for r in rows:
        counts[r.domain] = counts.get(r.domain, 0) + 1
        kept_ids.add(r.doc_id)
    assert all(c <= k for c in counts.values())
    assert kept_ids <= {u[0] for u in urls}  # output is a subset of input
    # under-full domains keep everything
    for d, n in enumerate(n_per_dom):
        if 0 < n <= k:
            assert counts.get(f"dom{d}.net", 0) == n
