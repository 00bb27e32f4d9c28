"""Property-based checks for the round-15 operators: random inputs
must satisfy each operator's structural invariants (hypothesis-driven,
the test_web_properties.py style). Few examples on purpose — every
example is a Spark job on this shared box; the pure-Python properties
(greedy segmentation, diff table) run many more.
"""

from __future__ import annotations

import itertools
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from retrieval_augmented_generation_rag_data_pipeline_spark.operators.dedup import (
    phash_near_dup_pairs,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.operators.sampling import (
    dsir_diff_table,
    dsir_importance_weights,
    dsir_select,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.operators.text import (
    MAX_WORD_CHARS,
    decontaminate_fuzzy,
    token_count_subword,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.operators.web import (
    extract_host,
    frozen_suffixes,
)

# -------------------------------------------------------------- phash

hash64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=8, deadline=None)
@given(hashes=st.lists(hash64, min_size=2, max_size=14, unique=True))
def test_phash_banding_exact_vs_all_pairs_random(spark, hashes):
    """For max_distance < n_bands, banded blocking + exact rerank must
    equal the brute-force all-pairs Hamming filter on ANY hash set —
    the pigeonhole exactness contract, fuzzed over the full signed
    64-bit range (sign bit included)."""
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "media_id long, phash long"
    )
    got = {
        (r.media_a, r.media_b): r.distance
        for r in phash_near_dup_pairs(df, max_distance=7, n_bands=8).collect()
    }
    want = {
        (i, j): bin((a ^ b) & (2**64 - 1)).count("1")
        for (i, a), (j, b) in itertools.combinations(enumerate(hashes), 2)
        if bin((a ^ b) & (2**64 - 1)).count("1") <= 7
    }
    assert got == want


# ---------------------------------------------------------------- PSL


@settings(max_examples=8, deadline=None)
@given(
    labels=st.lists(
        st.sampled_from(["www", "a", "news", "example", "co", "uk", "edu",
                         "au", "act", "com", "localhost"]),
        min_size=1,
        max_size=5,
    )
)
def test_psl_domain_is_host_suffix_and_default_consistent(spark, labels):
    """PSL invariants on arbitrary label stacks: the derived domain is
    always '' or a dot-boundary suffix of the host; when no listed
    suffix matches, it equals the two-label default; when one matches,
    the domain has exactly (suffix labels + 1) labels unless the host
    IS the suffix."""
    host = ".".join(labels)
    url = f"https://{host}/p"
    sfx = frozen_suffixes()
    df = spark.createDataFrame([(1, url)], "doc_id long, url string")
    row_psl = extract_host(df, suffixes=sfx).collect()[0]
    row_def = extract_host(df).collect()[0]
    assert row_psl.host == row_def.host == host.lower()
    d = row_psl.domain
    assert d == "" or row_psl.host == d or row_psl.host.endswith("." + d)
    matched = [
        s
        for s in sfx
        if row_psl.host == s or row_psl.host.endswith("." + s)
    ]
    if not matched:
        assert d == row_def.domain
    else:
        longest = max(matched, key=lambda s: s.count("."))
        if row_psl.host == longest:
            assert d == row_psl.host
        else:
            assert d.endswith(longest)
            assert d.count(".") == longest.count(".") + 1


# --------------------------------------------------------------- DSIR

logp = st.floats(min_value=-30.0, max_value=-0.01, allow_nan=False)


@settings(max_examples=30, deadline=None)
@given(
    tvocab=st.dictionaries(st.sampled_from("abcdefg"), logp, max_size=5),
    rvocab=st.dictionaries(st.sampled_from("abcdefg"), logp, max_size=5),
    t_oov=logp,
    r_oov=logp,
)
def test_dsir_diff_table_properties(tvocab, rvocab, t_oov, r_oov):
    """Pure-Python: the diff table covers exactly the union vocab and
    every entry equals the two models' (possibly-OOV) log-prob gap."""
    target = {"logp": tvocab, "oov_logp": t_oov}
    raw = {"logp": rvocab, "oov_logp": r_oov}
    diff, oov = dsir_diff_table(target, raw)
    assert set(diff) == set(tvocab) | set(rvocab)
    assert oov == t_oov - r_oov
    for t, d in diff.items():
        assert d == tvocab.get(t, t_oov) - rvocab.get(t, r_oov)


def test_dsir_weight_monotone_selection(spark):
    """With equal hash draws impossible, a doc whose weight dominates
    by orders of magnitude is always selected before k runs out: rank
    by key ln(-ln u) - logw is monotone in logw for fixed u-range.
    Structural: selected ids are a subset of input, size min(k, n),
    logw values match dsir_importance_weights exactly."""
    target = {"logp": {"x": math.log(0.9)}, "oov_logp": math.log(0.001)}
    raw = {"logp": {"x": math.log(0.001)}, "oov_logp": math.log(0.001)}
    rows = [(i, "x " * 20) for i in range(10)] + [
        (i, "q " * 20) for i in range(10, 40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    w = {r.doc_id: r.logw for r in dsir_importance_weights(df, target, raw).collect()}
    sel = dsir_select(df, 12, target, raw, seed=9)
    got = {r.doc_id: r.logw for r in sel.collect()}
    assert len(got) == 12
    assert set(got) <= set(w) and all(got[i] == w[i] for i in got)
    # all 10 dominating docs (logw ~ 20*ln(900)) must be in any top-12
    assert set(range(10)) <= set(got)


# ------------------------------------------------------------- subword


def _greedy_py(word: str, pieces: set[str], max_len: int) -> int:
    if len(word) > MAX_WORD_CHARS:
        return 1
    pos, n = 0, 0
    while pos < len(word):
        adv = 1
        for l in range(min(max_len, len(word) - pos), 1, -1):
            if word[pos : pos + l] in pieces:
                adv = l
                break
        pos += adv
        n += 1
    return n


@settings(max_examples=6, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcx", min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    ),
    pieces=st.sets(
        st.text(alphabet="abc", min_size=1, max_size=4), min_size=1, max_size=8
    ),
)
def test_subword_counts_match_python_greedy(spark, words, pieces):
    """The fold expression must agree with a direct Python greedy
    longest-prefix implementation on arbitrary words/vocabularies —
    including UNK chars ('x' never in pieces) and words at any
    length."""
    vocab = {"pieces": sorted(pieces)}
    max_len = max(len(p) for p in pieces)
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.n_subword_tokens
        for r in token_count_subword(df, vocab).collect()
    }
    for i, w in enumerate(words):
        toks = w.lower().split()
        want = sum(_greedy_py(t, pieces, max_len) for t in toks)
        assert got[i] == want, (w, pieces, got[i], want)


# ------------------------------------------------- fuzzy decontamination


def test_decontaminate_fuzzy_drops_all_verbatim_bench(spark):
    """Structural guarantees: every verbatim benchmark doc (>= shingle
    width) is dropped — identical text collides in EVERY band; docs
    sharing nothing with the benchmark survive; output columns equal
    input columns."""
    bench_texts = [f"unique sentence number {i} about topic {i*7}" for i in range(5)]
    clean = [f"totally different subject matter row {i} here now" for i in range(5)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(bench_texts + clean)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(t,) for t in bench_texts], "text string")
    out = decontaminate_fuzzy(docs, bench)
    kept = {r.doc_id for r in out.collect()}
    assert kept == set(range(5, 10))
    assert out.columns == docs.columns
