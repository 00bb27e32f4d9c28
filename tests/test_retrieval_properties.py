"""Property-based checks: BM25 and deterministic split assignment must
reproduce direct Python reference computations on random inputs
(hypothesis-driven), the same differential style as test_asof.py.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from retrieval_augmented_generation_rag_data_pipeline_spark.operators.retrieval import (
    bm25_search,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.operators.sampling import (
    RESOLUTION,
    assign_split,
    quantize,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)
terms_strategy = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3, unique=True)


def ref_bm25(texts: list[str], terms: list[str], k1=1.2, b=0.75):
    """Direct BM25 (Lucene +1 idf) over whitespace tokens."""
    toks = {i: t.split() for i, t in enumerate(texts)}
    n = len(texts)
    avgdl = sum(len(tk) for tk in toks.values()) / n
    scores: dict[int, float] = {}
    for term in sorted(set(terms)):
        df = sum(1 for tk in toks.values() if term in tk)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, tk in toks.items():
            tf = tk.count(term)
            if tf == 0:
                continue
            dl = len(tk)
            s = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + (b * dl) / avgdl))
            scores[i] = scores.get(i, 0.0) + s
    return {i: round(s, 6) for i, s in scores.items()}


@settings(max_examples=12, deadline=None)
@given(texts=doc_strategy, terms=terms_strategy)
def test_bm25_matches_python_reference(spark, texts, terms):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.score
        for r in bm25_search(df, terms, topk=len(texts)).collect()
    }
    exp = ref_bm25(texts, terms)
    assert set(got) == set(exp)
    for i in exp:
        assert abs(got[i] - exp[i]) <= 1e-6, (i, got[i], exp[i])


def py_bucket(seed: int, sid: int) -> int:
    return int(hashlib.md5(f"{seed}:{sid}".encode()).hexdigest()[:15], 16) % RESOLUTION


@settings(max_examples=10, deadline=None)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                 max_size=40, unique=True),
    seed=st.integers(min_value=0, max_value=1000),
    fracs=st.tuples(
        st.floats(min_value=0.05, max_value=0.9),
        st.floats(min_value=0.05, max_value=0.5),
    ),
)
def test_assign_split_matches_python_hash_line(spark, ids, seed, fracs):
    f1, f2 = fracs
    f2 = min(f2, max(0.0, 1.0 - f1))
    splits = {"train": f1, "val": f2, "test": max(0.0, 1.0 - f1 - f2)}
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r["split"] for r in assign_split(df, "doc_id", splits, seed=seed).collect()}
    t1 = quantize(f1)
    t2 = t1 + quantize(f2)
    for i in ids:
        bkt = py_bucket(seed, i)
        exp = "train" if bkt < t1 else ("val" if bkt < t2 else "test")
        assert got[i] == exp, (i, bkt, got[i], exp)


# ---------------------------------------------------------------------
# bloom_anti_join and chunk_dedup vs direct Python references
# ---------------------------------------------------------------------

keys_strategy = st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=30)


@settings(max_examples=10, deadline=None)
@given(left_keys=keys_strategy, right_keys=keys_strategy)
def test_bloom_anti_join_matches_set_difference(spark, left_keys, right_keys):
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.bloom import bloom_anti_join

    left = spark.createDataFrame(
        [(k, i) for i, k in enumerate(left_keys)], "k long, ord long"
    )
    right = spark.createDataFrame([(k,) for k in right_keys] or [(None,)], "k long")
    if not right_keys:
        right = right.filter("k IS NOT NULL")
    got = sorted((r.k, r.ord) for r in bloom_anti_join(left, right, "k", fpp=0.3).collect())
    want = sorted((k, i) for i, k in enumerate(left_keys) if k not in set(right_keys))
    assert got == want


chunk_corpus_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=9).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(max_examples=10, deadline=None)
@given(texts=chunk_corpus_strategy)
def test_chunk_dedup_matches_python_reference(spark, texts):
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.dedup import chunk_dedup

    cw = 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # direct reference: first occurrence of each chunk in (doc_id, idx) order
    seen: set[str] = set()
    want: dict[int, tuple[str, int, int]] = {}
    for i, t in enumerate(texts):
        toks = t.lower().split()
        chunks = [" ".join(toks[j : j + cw]) for j in range(0, len(toks), cw)]
        kept = []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        want[i] = (" ".join(kept), len(kept), len(chunks))
    got = {
        r.doc_id: (r.text_dedup, r.n_chunks_kept, r.n_chunks_orig)
        for r in chunk_dedup(df, chunk_words=cw).collect()
    }
    assert got == want


span_corpus_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=14).map(
        " ".join
    ),
    min_size=2,
    max_size=6,
)


def ref_span_regions(texts: list[str], k: int, min_docs: int = 2):
    """Direct duplicated-span regions: index every k-token span, mark
    spans in >= min_docs distinct docs, merge per-doc positions where
    next <= prev + k."""
    toks = {i: [w for w in t.lower().split() if w] for i, t in enumerate(texts)}
    span_docs: dict[str, set[int]] = {}
    for i, tk in toks.items():
        for p in range(len(tk) - k + 1):
            span_docs.setdefault(" ".join(tk[p : p + k]), set()).add(i)
    regions: set[tuple[int, int, int, int]] = set()
    for i, tk in toks.items():
        dup = [
            p + 1
            for p in range(len(tk) - k + 1)
            if len(span_docs[" ".join(tk[p : p + k])]) >= min_docs
        ]
        run: list[int] = []
        for p in dup + [None]:
            if run and (p is None or p > run[-1] + k):
                regions.add((i, run[0], run[-1] - run[0] + k, len(run)))
                run = []
            if p is not None:
                run.append(p)
    return regions


def ref_strip(texts: list[str], regions, k: int):
    out = {}
    for i, t in enumerate(texts):
        tk = [w for w in t.lower().split() if w]
        covered = set()
        for d, start, length, _n in regions:
            if d == i:
                covered.update(range(start, start + length))
        kept = [w for j, w in enumerate(tk, start=1) if j not in covered]
        out[i] = (" ".join(kept), len(tk) - len(kept))
    return out


@settings(max_examples=8, deadline=None)
@given(texts=span_corpus_strategy)
def test_duplicated_spans_match_python_reference(spark, texts):
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.dedup import (
        duplicated_spans,
        strip_duplicated_spans,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.region_start, r.region_len, r.n_spans)
        for r in duplicated_spans(df, k=3).collect()
    }
    assert got == ref_span_regions(texts, k=3)
    stripped = {
        r.doc_id: (r.text, r.n_dropped)
        for r in strip_duplicated_spans(df, k=3).collect()
    }
    assert stripped == ref_strip(texts, got, k=3)


# ---------------------------------------------------------------------
# strip_duplicated_spans_raw vs a direct Python reference: original-byte
# fidelity under mixed case, punctuation, tabs, and multi-space gaps.
# The alphabet deliberately contains case-variants of the SAME lowered
# token ("Aa"/"aA"): the span index matches them (it lowers), so the
# two docs cut DIFFERENT raw characters at the same token positions —
# exactly the per-doc offset arithmetic this operator must get right.
# ---------------------------------------------------------------------

RAW_VOCAB = ["Aa", "bB,", "C!", "dd", "E?e", "ff.", "aA"]

raw_doc_strategy = st.tuples(
    st.sampled_from(["", " ", "\t ", "  "]),  # leading whitespace
    st.lists(
        st.tuples(
            st.sampled_from(RAW_VOCAB),
            st.sampled_from([" ", "  ", "\t", " \t "]),
        ),
        min_size=0,
        max_size=14,
    ),
).map(lambda p: p[0] + "".join(tok + sep for tok, sep in p[1]))

raw_corpus_strategy = st.lists(raw_doc_strategy, min_size=2, max_size=6)


def ref_strip_raw(texts: list[str], regions):
    """Cut each region's character span ([start of first token, end of
    last token], 0-based half-open here) out of the ORIGINAL text."""
    import re

    out = {}
    for i, t in enumerate(texts):
        ms = list(re.finditer(r"\S+", t))
        cuts = sorted(
            (s, s + ln - 1) for d, s, ln, _n in regions if d == i
        )
        kept, prev, dropped = [], 0, 0
        for s, e in cuts:
            kept.append(t[prev : ms[s - 1].start()])
            prev = ms[e - 1].end()
            dropped += e - s + 1
        kept.append(t[prev:])
        out[i] = ("".join(kept), dropped)
    return out


@settings(max_examples=8, deadline=None)
@given(texts=raw_corpus_strategy)
def test_strip_raw_matches_python_reference(spark, texts):
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.dedup import (
        strip_duplicated_spans_raw,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    regions = ref_span_regions(texts, k=3)
    got = {
        r.doc_id: (r.text, r.n_dropped)
        for r in strip_duplicated_spans_raw(df, k=3).collect()
    }
    assert got == ref_strip_raw(texts, regions)


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from(VOCAB + [None])),
        min_size=0,
        max_size=40,
    ),
    st.integers(2, 6),  # hot_threshold
    st.integers(2, 5),  # n_salts
)
@settings(max_examples=12, deadline=None)
def test_hot_salted_count_join_is_exactly_the_plain_join(
    spark, rows, hot_threshold, n_salts
):
    """Property (round 10): hot_salted_count_join with null_safe=True
    is row-for-row the plain null-safe inner join for ANY probe
    multiset, threshold, and salt count — salting may only move rows
    between tasks, never add/drop/duplicate them. Random key skew means
    some examples salt several keys, some none, some all."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.joins import (
        hot_salted_count_join,
    )
    from pyspark.sql import functions as F

    probe = spark.createDataFrame(
        [(i, k) for i, (pid, k) in enumerate(rows)],
        "id long, k string",
    )
    if not rows:
        probe = spark.createDataFrame([], "id long, k string")
    build = probe.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n"))
    got = sorted(
        map(
            tuple,
            hot_salted_count_join(
                probe, build, key="k", count_col="n", salt_src="id",
                hot_threshold=hot_threshold, n_salts=n_salts, null_safe=True,
            ).select("id", "k", "n").collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            probe.alias("p")
            .join(build.alias("b"), F.col("p.k").eqNullSafe(F.col("b.k")))
            .select("id", "p.k", "n")
            .collect(),
        )
    )
    assert got == want
