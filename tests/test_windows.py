from __future__ import annotations

from retrieval_augmented_generation_rag_data_pipeline_spark.operators.windows import (
    merge_islands,
    topn_per_group,
)

SEGS = [
    # file, seg_id, spk_start, spk_end, speaker  (FIXTURES.md segments)
    ("a.webm", 0, 0.0, 5.0, "SPEAKER_00"),
    ("a.webm", 1, 5.0, 9.0, "SPEAKER_00"),
    ("a.webm", 2, 9.0, 15.0, "SPEAKER_01"),
    ("a.webm", 3, 15.0, 18.0, "SPEAKER_00"),
]
COLS = ["file", "seg_id", "spk_start", "spk_end", "speaker"]


def _islands(spark, rows):
    df = spark.createDataFrame(rows, COLS)
    out = merge_islands(df, ["file"], "seg_id", "speaker", "spk_start", "spk_end")
    return sorted(
        out.select("island_id", "label", "island_start", "island_end").collect()
    )


def test_islands_reference_case(spark):
    # Matches reference src/transcription.py:277-299: island end = next
    # island's first start; final island ends at last segment's end.
    got = [tuple(r) for r in _islands(spark, SEGS)]
    assert got == [
        (0, "SPEAKER_00", 0.0, 9.0),
        (1, "SPEAKER_01", 9.0, 15.0),
        (2, "SPEAKER_00", 15.0, 18.0),
    ]


def test_islands_single_row(spark):
    got = [tuple(r) for r in _islands(spark, [("f", 0, 1.0, 2.0, "S0")])]
    assert got == [(0, "S0", 1.0, 2.0)]


def test_islands_all_same_speaker(spark):
    rows = [("f", i, float(i), float(i + 1), "S0") for i in range(4)]
    got = [tuple(r) for r in _islands(spark, rows)]
    assert got == [(0, "S0", 0.0, 4.0)]


def test_islands_alternating(spark):
    rows = [("f", i, float(i), float(i + 1), f"S{i % 2}") for i in range(4)]
    got = [tuple(r) for r in _islands(spark, rows)]
    assert got == [
        (0, "S0", 0.0, 1.0),
        (1, "S1", 1.0, 2.0),
        (2, "S0", 2.0, 3.0),
        (3, "S1", 3.0, 4.0),
    ]


def test_topn_per_group(spark):
    rows = [("g1", i) for i in range(10)] + [("g2", i) for i in range(3)]
    df = spark.createDataFrame(rows, ["g", "v"])
    from pyspark.sql import functions as F

    out = topn_per_group(df, ["g"], [F.desc("v")], 2)
    got = sorted((r.g, r.v) for r in out.collect())
    assert got == [("g1", 8), ("g1", 9), ("g2", 1), ("g2", 2)]


def test_session_windows_custom_aggregations(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.windows import (
        session_windows,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 10, m)  # noqa: E731
    df = spark.createDataFrame(
        [("u1", t(0), 5.0), ("u1", t(1), 7.0), ("u1", t(30), 1.0)],
        ["user_id", "ts", "value"],
    )
    out = session_windows(
        df,
        ["user_id"],
        "ts",
        gap_s=300,
        aggs=[
            F.max("value").alias("max_value"),
            F.min("ts").cast("double").alias("first_ts"),
        ],
    ).orderBy("session_start")
    rows = out.collect()
    assert out.columns == [
        "user_id", "session_start", "session_end", "max_value", "first_ts"
    ]
    assert len(rows) == 2
    assert rows[0].max_value == 7.0 and rows[1].max_value == 1.0
    assert rows[0].first_ts == rows[0].session_start


def test_trailing_range_agg_frames_and_tie_semantics(spark):
    """RANGE frame contract: the frame is [ts-3600s, ts]; rows sharing
    a truncated second share ONE frame (both see each other) — the
    order-deterministic behavior a ROWS frame cannot give; and the
    window costs one partitionBy Exchange, no join."""
    import datetime as dt

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.windows import trailing_range_agg

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: 11:00:00, 11:59:00, 12:00:00, 13:30:00
        (1, 1, base - dt.timedelta(hours=1), 10.0),
        (2, 1, base - dt.timedelta(minutes=1), 20.0),
        (3, 1, base, 30.0),
        (4, 1, base + dt.timedelta(minutes=90), 40.0),
        # user 2: two events in the SAME second -> shared frame
        (5, 2, base, 1.0),
        (6, 2, base + dt.timedelta(microseconds=500), 2.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = {
        r.event_id: (r.w_count, r.w_sum)
        for r in trailing_range_agg(df, ["user_id"], "ts", "value", 3600).collect()
    }
    assert out[1] == (1, 10.0)
    assert out[2] == (2, 30.0)  # 11:00 is within [10:59, 11:59]
    assert out[3] == (3, 60.0)  # exactly -3600s is INCLUSIVE
    assert out[4] == (1, 40.0)  # everything else aged out
    assert out[5] == (2, 3.0) and out[6] == (2, 3.0)  # tied second shares a frame
    plan = (
        trailing_range_agg(df, ["user_id"], "ts", "value", 3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # createDataFrame parallelize + partitionBy


def test_trailing_range_agg_matches_bruteforce_property(spark):
    """Differential property: for random (user, second-offset, value)
    event sets — duplicate seconds included — the operator's
    (w_count, w_sum) must equal the brute-force definition: all rows
    of the same user with ts_sec in [ts_sec - W, ts_sec]."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.windows import trailing_range_agg

    base = dt.datetime(2024, 6, 1)
    event_strategy = st.tuples(
        st.integers(min_value=0, max_value=2),      # user
        st.integers(min_value=0, max_value=50),     # second offset
        st.integers(min_value=-5, max_value=5),     # value
    )

    @settings(max_examples=6, deadline=None)
    @given(st.lists(event_strategy, min_size=1, max_size=25), st.sampled_from([0, 1, 10]))
    def check(events, window_s):
        rows = [
            (i, u, base + dt.timedelta(seconds=s), float(v))
            for i, (u, s, v) in enumerate(events)
        ]
        df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
        got = {
            r.event_id: (r.w_count, r.w_sum)
            for r in trailing_range_agg(df, ["user_id"], "ts", "value", window_s).collect()
        }
        for i, (u, s, v) in enumerate(events):
            frame = [
                float(v2)
                for (u2, s2, v2) in events
                if u2 == u and s - window_s <= s2 <= s
            ]
            assert got[i] == (len(frame), sum(frame)), (i, events, window_s)

    check()
