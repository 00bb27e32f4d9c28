from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation_rag_data_pipeline_spark.operators.windows import (
    tumbling_bucket,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.streaming.stream import (
    read_document_stream,
    run_stream,
    sessionized_events,
    windowed_events,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{SF}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def test_stream_foreachbatch_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    docs.write.parquet(src)

    seen = []
    q = run_stream(
        read_document_stream(spark, src, max_files_per_trigger=1),
        lambda df, epoch: seen.append(df.count()),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert sum(seen) == 20
    # restart from the same checkpoint: nothing new to process (T2)
    seen2 = []
    q2 = run_stream(
        read_document_stream(spark, src),
        lambda df, epoch: seen2.append(df.count()),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert sum(seen2) == 0


def test_windowed_stream_matches_batch_tumbling(spark, events, tmp_path):
    # identical window boundaries streaming vs batch (W3)
    src = str(tmp_path / "ev")
    events.write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    )
    agg = windowed_events(stream, window_seconds=3600)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.window_start, r.event_type): (r.n, round(r.sum_value, 6))
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    batch = (
        events.withColumn("bucket", tumbling_bucket(F.col("ts"), 3600))
        .groupBy("bucket", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .collect()
    )
    exp = {}
    for r in batch:
        exp_key = (r.bucket, r.event_type)
        exp[exp_key] = (r.n, r.s)
    assert len(got) == len(exp)
    for (ws, et), (n, s) in got.items():
        assert exp[(int(ws.timestamp()) // 3600, et)] == (n, round(s, 6))


def test_session_window_stream(spark, events, tmp_path):
    src = str(tmp_path / "ev2")
    events.filter(F.col("user_id") < 5).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    agg = sessionized_events(stream, gap="2 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM sess_out").collect()
    assert len(rows) > 0
    n_events = sum(r.n_events for r in rows)
    assert n_events == spark.read.parquet(src).count()
