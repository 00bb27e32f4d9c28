"""asof_align must reproduce the reference's sequential loop
(reference src/transcription.py:199-224) exactly — verified against a
direct Python simulation of that loop, including hypothesis-driven
random cases."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from retrieval_augmented_generation_rag_data_pipeline_spark.operators.joins import asof_align

CHUNK_COLS = ["file", "chunk_id", "text", "t_start", "t_end", "confidence"]
SEG_COLS = ["file", "seg_id", "speaker", "spk_end"]


def reference_align(chunks, segments):
    """Line-for-line simulation of reference src/transcription.py:199-224."""
    transcript = [
        {"text": t, "timestamp": (s, e), "confidence": c}
        for (_, _, t, s, e, c) in chunks
        if e is not None
    ]
    end_timestamps = np.array([c["timestamp"][1] for c in transcript])
    out = []
    for (_, seg_id, speaker, end_time) in segments:
        if len(end_timestamps) == 0:
            break
        upto_idx = int(np.argmin(np.abs(end_timestamps - end_time)))
        text = " ".join(c["text"].strip() for c in transcript[: upto_idx + 1])
        out.append(
            (
                seg_id,
                speaker,
                text,
                transcript[0]["timestamp"][0],
                transcript[upto_idx]["timestamp"][1],
                float(np.mean([c.get("confidence", 1.0) or 1.0 for c in transcript[: upto_idx + 1]])),
            )
        )
        transcript = transcript[upto_idx + 1 :]
        end_timestamps = end_timestamps[upto_idx + 1 :]
    return out


def run_spark(spark, chunks, segments):
    cdf = spark.createDataFrame(chunks, CHUNK_COLS)
    sdf = spark.createDataFrame(segments, SEG_COLS)
    rows = asof_align(cdf, sdf).collect()
    return sorted(
        (r.seg_id, r.speaker, r.text, r.t_start, r.t_end, round(r.confidence, 9))
        for r in rows
    )


BASIC_CHUNKS = [
    ("a", 0, " hello ", 0.0, 4.8, 0.99),
    ("a", 1, "world", 4.8, 9.5, 0.85),
    ("a", 2, "again", 9.5, 14.0, 0.90),
    ("a", 3, "bye", 14.0, 18.0, 0.70),
]
BASIC_SEGS = [
    ("a", 0, "SPEAKER_00", 9.0),
    ("a", 1, "SPEAKER_01", 15.0),
    ("a", 2, "SPEAKER_00", 18.0),
]


def check(spark, chunks, segments):
    expected = sorted(
        (s, sp, t, t0, t1, round(c, 9))
        for (s, sp, t, t0, t1, c) in reference_align(chunks, segments)
    )
    assert run_spark(spark, chunks, segments) == expected


def test_basic(spark):
    check(spark, BASIC_CHUNKS, BASIC_SEGS)


def test_exact_tie_prefers_lowest_index(spark):
    # segment end exactly between two chunk ends -> np.argmin takes first
    chunks = [
        ("a", 0, "x", 0.0, 2.0, 0.5),
        ("a", 1, "y", 2.0, 4.0, 0.5),
    ]
    segs = [("a", 0, "S0", 3.0), ("a", 1, "S1", 4.0)]
    check(spark, chunks, segs)


def test_more_segments_than_chunks_breaks(spark):
    chunks = [("a", 0, "x", 0.0, 2.0, 0.5), ("a", 1, "y", 2.0, 4.0, 0.5)]
    segs = [("a", 0, "S0", 5.0), ("a", 1, "S1", 6.0), ("a", 2, "S2", 7.0)]
    # first segment consumes everything; later segments emit no rows
    check(spark, chunks, segs)


def test_null_end_chunks_dropped(spark):
    chunks = [
        ("a", 0, "x", 0.0, 2.0, 0.5),
        ("a", 1, "skip", 2.0, None, 0.5),
        ("a", 2, "y", 2.0, 4.0, 0.5),
    ]
    segs = [("a", 0, "S0", 4.0)]
    got = run_spark(spark, chunks, segs)
    assert got[0][2] == "x y"


def test_null_confidence_defaults_to_one(spark):
    chunks = [("a", 0, "x", 0.0, 2.0, None), ("a", 1, "y", 2.0, 4.0, 0.5)]
    segs = [("a", 0, "S0", 4.0)]
    got = run_spark(spark, chunks, segs)
    assert got[0][5] == round((1.0 + 0.5) / 2, 9)


def test_empty_chunks_no_rows(spark):
    segs = [("a", 0, "S0", 4.0)]
    cdf = spark.createDataFrame([], "file string, chunk_id int, text string, t_start double, t_end double, confidence double")
    sdf = spark.createDataFrame(segs, SEG_COLS)
    assert asof_align(cdf, sdf).count() == 0


def test_multiple_files_isolated(spark):
    chunks = BASIC_CHUNKS + [("b", 0, "solo", 0.0, 3.0, 1.0)]
    segs = BASIC_SEGS + [("b", 0, "SB", 2.0)]
    expected = sorted(
        [("a",) + r for r in reference_align(BASIC_CHUNKS, BASIC_SEGS)]
        + [("b",) + r for r in reference_align([chunks[-1]], [segs[-1]])],
        key=lambda x: (x[0], x[1]),
    )
    cdf = spark.createDataFrame(chunks, CHUNK_COLS)
    sdf = spark.createDataFrame(segs, SEG_COLS)
    rows = asof_align(cdf, sdf).collect()
    got = sorted(
        ((r.file, r.seg_id, r.speaker, r.text, r.t_start, r.t_end, round(r.confidence, 9))
         for r in rows),
        key=lambda x: (x[0], x[1]),
    )
    expected = [
        (f, s, sp, t, t0, t1, round(c, 9)) for (f, s, sp, t, t0, t1, c) in expected
    ]
    assert got == expected


@settings(max_examples=12, deadline=None)
@given(
    ends=st.lists(st.integers(0, 40), min_size=1, max_size=12),
    seg_ends=st.lists(st.integers(0, 45), min_size=1, max_size=8),
)
def test_property_matches_reference_loop(spark, ends, seg_ends):
    ends = sorted(ends)
    starts = [0] + ends[:-1]
    chunks = [
        ("f", i, f"w{i}", float(s), float(e), 0.5 + (i % 3) * 0.1)
        for i, (s, e) in enumerate(zip(starts, ends))
    ]
    segs = [("f", j, f"S{j % 2}", float(t)) for j, t in enumerate(seg_ends)]
    check(spark, chunks, segs)


def test_string_seg_ids_preserved(spark):
    # seg ids are opaque to the algorithm — a string id must come back
    # verbatim, not be nulled by a numeric cast in the internal unions
    chunks = spark.createDataFrame(
        [("a", 0, "hello", 0.0, 4.8, 0.95), ("a", 1, "world", 4.8, 9.5, 0.85)],
        ["file", "chunk_id", "text", "t_start", "t_end", "confidence"],
    )
    segs = spark.createDataFrame(
        [("a", "seg-x", "S0", 5.0), ("a", "seg-y", "S1", 10.0)],
        ["file", "seg_id", "speaker", "spk_end"],
    )
    out = asof_align(chunks, segs).collect()
    assert sorted(r.seg_id for r in out) == ["seg-x", "seg-y"]
    assert dict(out[0].asDict())["seg_id"] in ("seg-x", "seg-y")


def test_asof_align_drops_null_segment_ends(spark):
    """A NULL spk_end used to resolve through the window fills to the
    file's smallest chunk end, stealing a chunk from the next segment
    and shifting every later segment's text; it is now dropped like a
    NULL chunk end, leaving the other segments' assignment intact."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.joins import asof_align

    chunks = spark.createDataFrame(
        [("f", k, f"c{k}", float(k), float(k) + 0.9, 1.0) for k in range(4)],
        "file string, chunk_id long, text string, t_start double, t_end double, confidence double",
    )
    segs = spark.createDataFrame(
        [("f", 0, "A", 1.9), ("f", 1, "B", None), ("f", 2, "C", 3.9)],
        "file string, seg_id long, speaker string, spk_end double",
    )
    rows = {r.seg_id: r.text for r in asof_align(chunks, segs).collect()}
    assert 1 not in rows                  # the NULL-end segment emits no row
    assert rows[0] == "c0 c1"             # unshifted
    assert rows[2] == "c2 c3"             # later segments keep their chunks
