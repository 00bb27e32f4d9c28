"""Unit tests for the lexical-retrieval surface (TF-IDF / BM25 / RRF)
and the split/mixing operators — small literal corpora with
hand-checkable math. Cross-engine value parity is covered separately by
test_oracle_parity.py.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation_rag_data_pipeline_spark.operators.retrieval import (
    bm25_search,
    rrf_fuse,
    tfidf_top_terms,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.operators.sampling import (
    assign_split,
    mix_corpora,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.operators.text import (
    ngram_topk,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark spark spark query"),
        (1, "spark query engine"),
        (2, "duck pond water"),
        (3, "query engine engine plan"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_math_and_ranks(corpus):
    out = {
        (r.doc_id, r.term): (r.tf, r.tfidf, r.term_rank)
        for r in tfidf_top_terms(corpus, k=2).collect()
    }
    # 'spark' appears in 2 of 4 docs -> idf = ln(2); doc 0 tf = 3
    tf, tfidf, _ = out[(0, "spark")]
    assert tf == 3
    assert tfidf == pytest.approx(3 * math.log(2), abs=1e-6)
    # 'duck' unique to doc 2 -> idf = ln(4), outranks the other doc-2 terms
    assert out[(2, "duck")][2] == 1
    # k=2 respected
    per_doc = {}
    for (d, _t), (_tf, _s, rank) in out.items():
        per_doc.setdefault(d, []).append(rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 2
               for v in per_doc.values())


def test_bm25_prefers_matching_and_higher_tf(corpus):
    got = {r.doc_id: r.score for r in bm25_search(corpus, ["spark"], topk=4).collect()}
    # only docs containing 'spark' are scored
    assert set(got) == {0, 1}
    # doc 0 has tf=3 but is longer; BM25 tf saturation still ranks it first
    assert got[0] > got[1] > 0


def test_bm25_rank_is_deterministic_tiebreak(corpus):
    out = bm25_search(corpus, ["engine"], topk=4).collect()
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    # doc 3 (tf=2) above doc 1 (tf=1)
    assert out[0].doc_id == 3


def test_rrf_fusion_rewards_presence_in_both(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank long")
    out = {r.doc_id: (r.rrf, r.rank) for r in rrf_fuse([a, b], k=60).collect()}
    # doc 2 appears in both lists -> highest fused score
    assert out[2][1] == 1
    assert out[2][0] == pytest.approx(round(1 / 62 + 1 / 61, 6), abs=1e-9)
    assert set(out) == {1, 2, 3}


def test_ngram_topk_counts(spark):
    df = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b x y")], "doc_id long, text string"
    )
    out = {r.gram: r.n_occurrences for r in ngram_topk(df, n=2, k=10).collect()}
    assert out["a b"] == 3  # twice in doc 0 ("a b a b" has a b at pos 1,3), once in doc 1
    assert out["b a"] == 1


def test_assign_split_partitions_and_stability(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = assign_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000  # exhaustive, disjoint by construction
    assert 0.75 * 2000 < counts["train"] < 0.85 * 2000
    # stable across re-evaluation and repartitioning
    again = assign_split(
        df.repartition(7), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3
    )
    assert out.exceptAll(again).count() == 0
    # changing the seed changes assignments
    other = assign_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=4)
    assert out.exceptAll(other).count() > 0


def test_mix_corpora_tags_and_independent_rates(spark):
    a = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    b = spark.range(1000, 2000).withColumnRenamed("id", "doc_id")
    out = mix_corpora({"a": (a, 1.0), "b": (b, 0.0)}, "doc_id", seed=1)
    rows = out.collect()
    assert all(r.source_name == "a" for r in rows)
    assert len(rows) == 1000  # rate 1.0 keeps everything, 0.0 drops everything
    # retuning b's rate must not change which rows a keeps
    half = mix_corpora({"a": (a, 0.5), "b": (b, 0.7)}, "doc_id", seed=1)
    kept_a1 = {r.doc_id for r in half.filter(F.col("source_name") == "a").collect()}
    half2 = mix_corpora({"a": (a, 0.5), "b": (b, 0.2)}, "doc_id", seed=1)
    kept_a2 = {r.doc_id for r in half2.filter(F.col("source_name") == "a").collect()}
    assert kept_a1 == kept_a2
    assert 300 < len(kept_a1) < 700


def test_bm25_empty_query_and_absent_terms(corpus, spark):
    # no query terms -> empty result, not an error
    assert bm25_search(corpus, [], topk=5).count() == 0
    # terms absent from the corpus -> empty result
    assert bm25_search(corpus, ["nonexistentword"], topk=5).count() == 0


def test_tfidf_single_doc_all_zero(spark):
    # one doc: every term has df = N = 1 -> idf = ln(1) = 0; ranks fall
    # back to the deterministic term-asc tie-break
    df = spark.createDataFrame([(0, "b a c")], "doc_id long, text string")
    out = tfidf_top_terms(df, k=3).collect()
    assert all(r.tfidf == 0.0 for r in out)
    assert [r.term for r in sorted(out, key=lambda r: r.term_rank)] == ["a", "b", "c"]


def test_assign_split_remainder_goes_to_last_label(spark):
    # fractions summing below 1: the hash-line remainder lands in the
    # LAST label, so assignment is still exhaustive
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = assign_split(df, "doc_id", {"train": 0.5, "holdout": 0.1}, seed=2)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 500
    assert counts["holdout"] > 0.3 * 500  # 0.1 slice + 0.4 remainder


def test_bm25_rows_come_back_rank_ordered(spark):
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.retrieval import bm25_search

    df = spark.createDataFrame(
        [(i, "alpha " * (i % 5 + 1) + "beta") for i in range(30)],
        ["doc_id", "text"],
    )
    rows = bm25_search(df, ["alpha"], topk=10).collect()
    assert [r.rank for r in rows] == list(range(1, 11))


def test_df_counts_distinct_docs_on_duplicate_rows(spark):
    """Round-10 review regression: duplicate doc_id rows must not
    inflate document frequency in tfidf_top_terms / bm25_search — df
    is per DISTINCT doc (the oracle groups by doc_id), so a term in
    one doc listed twice has df=1, not 2."""
    import math

    from pyspark.sql import functions as F

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.retrieval import (
        bm25_search,
        tfidf_top_terms,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (1, "hello world"), (2, "other words")],
        ["doc_id", "text"],
    )
    top = tfidf_top_terms(docs, k=5)
    hello = [r for r in top.collect() if r.doc_id == 1 and r.term == "hello"]
    # df(hello)=1 of n_docs=3 rows -> idf = ln(3/1); a row count would
    # give ln(3/2)
    assert hello and abs(hello[0].tfidf - round(2 * math.log(3.0 / 1.0), 6)) < 1e-9
    scores = {r.doc_id: r.score for r in bm25_search(docs, ["hello"]).collect()}
    # df=1, N=3: idf = ln(1 + (3 - 1 + 0.5) / 1.5) = ln(8/3)
    assert 1 in scores and scores[1] > 0
    dl, avgdl = 2, 2.0
    tf = 2  # doc 1's rows merge into one tf=2 group
    idf = math.log(1 + (3 - 1 + 0.5) / (1 + 0.5))
    want = idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert abs(scores[1] - round(want, 6)) < 1e-9


def test_bm25_oracle_agrees_on_duplicate_doc_id_different_dl(spark):
    """Round-11 advisory regression: a doc_id appearing twice with
    DIFFERENT texts (different dl) must yield the same document
    frequency on both engines. Spark counts DISTINCT doc_id; the
    oracle's dft used to count (doc_id, dl, term) groups from the tf
    CTE, silently giving df=2 for such degenerate input."""
    import duckdb

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators import (
        retrieval as R,
    )
    from retrieval_augmented_generation_rag_data_pipeline_spark.plans.queries import (
        _bm25_cte,
    )

    rows = [(1, "spark join fast"), (1, "spark slow"), (2, "spark vector join")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r.score
        for r in R.bm25_search(docs, ["spark", "join"], topk=10).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 'spark join fast'), (1, 'spark slow'), "
        "(2, 'spark vector join')) t(doc_id, text)"
    )
    sql = (
        "WITH "
        + _bm25_cte(["spark", "join"], R.BM25_K1, R.BM25_B)
        + " SELECT doc_id, score FROM bm25"
    )
    want = dict(con.execute(sql).fetchall())
    assert set(got) == set(want) == {1, 2}
    for d in want:
        assert abs(got[d] - want[d]) <= 2e-6, (d, got[d], want[d])


def test_bm25_query_terms_are_case_folded(spark):
    """Corpus tokens are lowercased by the shared tokenizer, so cased
    query terms must fold too — 'Apple' used to silently match nothing."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.retrieval import bm25_search

    df = spark.createDataFrame(
        [(1, "Apple pie with extra apple"), (2, "banana bread")],
        "doc_id long, text string",
    )
    hits = bm25_search(df, ["Apple"], topk=5).collect()
    assert [h.doc_id for h in hits] == [1]


def test_rrf_fuse_empty_rankings_raises(spark):
    import pytest

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError, match="rrf_fuse"):
        rrf_fuse([])
