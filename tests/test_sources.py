"""Source/sink coverage (SURVEY.md §2.1 S1-S6, S9-S10).

Exercises the binaryFile catalog scan (the reference's S3
list+filter+download collapsed into one source), the multi-glob union
scan, the wholetext document scan, and the JSON / formatted-dialogue
sinks — all against tmp files, no cloud dependency.
"""

from __future__ import annotations

import json
import pathlib

from pyspark.sql import functions as F

from retrieval_augmented_generation_rag_data_pipeline_spark.operators.text import format_dialogue
from retrieval_augmented_generation_rag_data_pipeline_spark.sources import sinks
from retrieval_augmented_generation_rag_data_pipeline_spark.sources.readers import (
    scan_catalog,
    scan_globs,
    scan_text_documents,
)


def _mkfiles(tmp_path: pathlib.Path):
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "x.webm").write_bytes(b"\x00\x01\x02")
    (tmp_path / "a" / "y.mp3").write_bytes(b"\x03\x04")
    (tmp_path / "z.webm").write_bytes(b"\x05")
    (tmp_path / "note.txt").write_text("hello spark world")


def test_scan_catalog_glob_and_schema(spark, tmp_path):
    _mkfiles(tmp_path)
    df = scan_catalog(spark, str(tmp_path), glob="*.webm")
    rows = df.collect()
    assert {r.path.rsplit("/", 1)[-1] for r in rows} == {"x.webm", "z.webm"}
    assert set(df.columns) == {"path", "modificationTime", "length"}
    assert {r.length for r in rows} == {3, 1}


def test_scan_catalog_with_content(spark, tmp_path):
    _mkfiles(tmp_path)
    df = scan_catalog(spark, str(tmp_path), glob="z.webm", with_content=True)
    assert bytes(df.first().content) == b"\x05"


def test_scan_globs_union(spark, tmp_path):
    _mkfiles(tmp_path)
    df = scan_globs(spark, str(tmp_path), ["*.webm", "*.mp3"])
    assert df.count() == 3


def test_scan_text_documents_wholetext(spark, tmp_path):
    _mkfiles(tmp_path)
    rows = scan_text_documents(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].text == "hello spark world"
    assert rows[0].source_file.endswith("note.txt")


def test_json_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("SPEAKER_00", "hi", 0.0, 1.5, 0.9)],
        "speaker string, text string, t_start double, t_end double, confidence double",
    )
    out = str(tmp_path / "json_out")
    sinks.write_json(df, out)
    lines = [
        ln
        for f in pathlib.Path(out).glob("*.json")
        for ln in f.read_text().splitlines()
        if ln.strip()
    ]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec == {
        "speaker": "SPEAKER_00",
        "text": "hi",
        "t_start": 0.0,
        "t_end": 1.5,
        "confidence": 0.9,
    }


def test_dialogue_text_sink_format(spark, tmp_path):
    # the reference's "[%.2f-%.2f] %s: %s" line format
    # (src/transcription.py:353-359)
    df = spark.createDataFrame(
        [("SPEAKER_00", "hello there", 0.0, 1.5, 1.0)],
        "speaker string, text string, t_start double, t_end double, confidence double",
    )
    out = str(tmp_path / "txt_out")
    sinks.write_dialogue_text(format_dialogue(df), out)
    lines = []
    for f in pathlib.Path(out).glob("*.txt"):
        lines += f.read_text().splitlines()
    assert lines == ["[0.00-1.50] SPEAKER_00: hello there"]


def test_vector_index_partitioned_by_source(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0], "a", "f1"), (1, [0.0, 1.0], "b", "f2")],
        "vec_id long, embedding array<double>, text string, source_file string",
    )
    out = str(tmp_path / "idx")
    sinks.write_vector_index(df, out)
    # one directory per source file, mirroring the reference's
    # one-FAISS-index-per-file layout
    parts = {p.name for p in pathlib.Path(out).iterdir() if p.is_dir()}
    assert parts == {"source_file=f1", "source_file=f2"}
    back = sinks.read_vector_index(spark, out)
    assert back.count() == 2
    # partition pruning: reading one source touches one partition
    one = back.filter(F.col("source_file") == "f1")
    assert one.count() == 1


def test_artifact_probe_against_catalog_scan(spark, tmp_path):
    """S10 end-to-end: derive sibling artifacts for scanned inputs and
    split by existence against the store's own listing (reference
    src/main.py:81-83 with_suffix + exists, as one semi/anti join)."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.sources.probe import (
        derive_artifact,
        probe_artifacts,
    )
    from retrieval_augmented_generation_rag_data_pipeline_spark.sources.readers import (
        scan_catalog,
    )

    for name in ("a.webm", "b.webm", "c.webm"):
        (tmp_path / name).write_bytes(b"x")
    (tmp_path / "a.wav").write_bytes(b"y")  # only a's artifact exists

    inputs = scan_catalog(spark, str(tmp_path), glob="*.webm")
    expected = derive_artifact(inputs, "path", ".wav")
    inventory = scan_catalog(spark, str(tmp_path), glob="*.wav")
    present, missing = probe_artifacts(expected, inventory)
    assert [p.rsplit("/", 1)[-1] for p in sorted(r.artifact_path for r in present.collect())] == ["a.wav"]
    assert [p.rsplit("/", 1)[-1] for p in sorted(r.artifact_path for r in missing.collect())] == ["b.wav", "c.wav"]


def test_derive_artifact_no_extension(spark):
    from retrieval_augmented_generation_rag_data_pipeline_spark.sources.probe import (
        derive_artifact,
    )

    df = spark.createDataFrame([("dir/noext",), ("dir/x.tar.gz",)], ["path"])
    out = {r.path: r.artifact_path for r in derive_artifact(df, "path", ".json").collect()}
    assert out["dir/noext"] == "dir/noext.json"
    assert out["dir/x.tar.gz"] == "dir/x.tar.json"


def test_jsonl_roundtrip_with_schema_and_corrupt_line(spark, tmp_path):
    """write_json emits one JSON object per line (jsonl); scan_jsonl with
    an explicit schema reads it back identically in ONE pass, and a
    malformed line surfaces in _corrupt_record instead of failing."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.sources.readers import (
        scan_jsonl,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    path = str(tmp_path / "docs_jsonl")
    sinks.write_json(docs.coalesce(1), path)

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    back = scan_jsonl(spark, path, schema=schema, glob="*.json")
    a = {tuple(r) for r in docs.select("doc_id", "text", "lang", "source", "n_chars").collect()}
    b = {tuple(r) for r in back.select("doc_id", "text", "lang", "source", "n_chars").collect()}
    assert a == b

    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-0.json").write_text('{"doc_id": 1, "text": "ok"}\n{not json\n')
    got = scan_jsonl(
        spark, str(bad), schema="doc_id long, text string, _corrupt_record string"
    ).collect()
    assert len(got) == 2
    assert {r.doc_id for r in got} == {1, None}
    assert any(r._corrupt_record is not None for r in got)


def test_scan_csv_schema_first(spark, tmp_path):
    from retrieval_augmented_generation_rag_data_pipeline_spark.sources.readers import (
        scan_csv,
    )

    p = tmp_path / "t.csv"
    p.write_text("id,name,score\n1,alpha,0.5\n2,beta,1.25\n")
    out = scan_csv(
        spark, str(p), schema="id long, name string, score double"
    ).collect()
    assert sorted((r.id, r.name, r.score) for r in out) == [
        (1, "alpha", 0.5),
        (2, "beta", 1.25),
    ]


def test_derive_artifact_keeps_dotfile_names(spark):
    from retrieval_augmented_generation_rag_data_pipeline_spark.sources.probe import derive_artifact

    df = spark.createDataFrame(
        [("/d/a.webm",), ("/d/.config",), ("/d/noext",), ("/d/x.tar.gz",)],
        ["path"],
    )
    got = {r.path: r.artifact_path for r in derive_artifact(df, suffix=".wav").collect()}
    # matches pathlib.Path.with_suffix: a leading dot is a name, not a suffix
    assert got == {
        "/d/a.webm": "/d/a.wav",
        "/d/.config": "/d/.config.wav",
        "/d/noext": "/d/noext.wav",
        "/d/x.tar.gz": "/d/x.tar.wav",
    }


def test_morton_key_rejects_sign_bit_bits():
    import pytest

    from retrieval_augmented_generation_rag_data_pipeline_spark.sources.sinks import morton_key_sql

    with pytest.raises(ValueError, match="sign bit"):
        morton_key_sql("a", "b", bits=32)
    assert "<< 61" in morton_key_sql("a", "b", bits=31)


def test_scan_globs_combines_into_one_listing(spark, tmp_path):
    from retrieval_augmented_generation_rag_data_pipeline_spark.sources.readers import scan_globs

    (tmp_path / "a.wav").write_bytes(b"x")
    (tmp_path / "b.mp3").write_bytes(b"y")
    (tmp_path / "c.txt").write_bytes(b"z")
    out = scan_globs(spark, str(tmp_path), ["*.wav", "*.mp3"])
    names = sorted(r.path.rsplit("/", 1)[-1] for r in out.collect())
    assert names == ["a.wav", "b.mp3"]


def test_scan_csv_reads_nested_shards(spark, tmp_path):
    from retrieval_augmented_generation_rag_data_pipeline_spark.sources.readers import scan_csv

    sub = tmp_path / "source=x"
    sub.mkdir()
    (sub / "part-0.csv").write_text("id,v\n1,a\n2,b\n")
    (tmp_path / "part-1.csv").write_text("id,v\n3,c\n")
    out = scan_csv(spark, str(tmp_path), schema="id INT, v STRING")
    assert sorted(r.id for r in out.collect()) == [1, 2, 3]


def test_scan_globs_overlap_comma_and_empty(spark, tmp_path):
    """The union fallback must match the combined-brace path's
    one-row-per-file semantics (overlapping globs used to duplicate
    files), comma-bearing globs must NOT be brace-combined (the comma
    would be reinterpreted as an alternation separator), and an empty
    glob list raises instead of IndexError."""
    import pytest

    from retrieval_augmented_generation_rag_data_pipeline_spark.sources.readers import scan_globs

    (tmp_path / "a1.txt").write_text("x")
    (tmp_path / "b1.txt").write_text("y")
    (tmp_path / "a,weird.csv").write_text("z")
    base = str(tmp_path)
    # overlapping patterns (second contains braces -> union fallback)
    out = scan_globs(spark, base, ["a*.txt", "{a,b}*.txt"])
    paths = [r.path for r in out.collect()]
    assert len(paths) == len(set(paths)) == 2  # one row per file
    # comma-bearing glob: must match the literal comma file
    out2 = scan_globs(spark, base, ["a,weird*.csv", "b*.txt"])
    names = sorted(p.rsplit("/", 1)[-1] for r in out2.collect() for p in [r.path])
    assert names == ["a,weird.csv", "b1.txt"]
    with pytest.raises(ValueError, match="at least one glob"):
        scan_globs(spark, base, [])


def test_pinned_table_schemas_match_files(spark):
    """The explicit SCHEMAS registry (round 16 — skips per-construction
    parquet schema inference) must stay byte-identical to what
    inference reads from the driver's files; drift here would silently
    drop or re-type columns for every query."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.sources.readers import (
        SCHEMAS,
        TABLES,
    )

    sf_dir = "/root/testdata/sf0.001"
    for t in TABLES:
        inferred = spark.read.parquet(f"{sf_dir}/{t}.parquet")._jdf.schema()
        pinned = spark.read.schema(SCHEMAS[t]).parquet(
            f"{sf_dir}/{t}.parquet"
        )._jdf.schema()
        assert pinned.toDDL() == inferred.toDDL(), (
            f"{t}: pinned schema {pinned.toDDL()!r} != file schema "
            f"{inferred.toDDL()!r} — regenerate readers.SCHEMAS"
        )
