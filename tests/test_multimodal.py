from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation_rag_data_pipeline_spark.ml.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    resize_images,
    sample_video_frames,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.ml.udfs import fake_transcribe


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake image bytes", "image/png", 64, 64, None),
        (2, "audio", b"RIFF fake wav bytes xxxxx", "audio/wav", None, None, 4.0),
        (3, "video", b"\x00\x00ftyp fake mp4", "video/mp4", 320, 240, 3.5),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_deterministic(spark, media):
    out = {r.media_id: r for r in extract_features(media).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert r.n_bytes > 0
        assert len(r.feature) == 8
        assert sum(r.feature) == pytest.approx(1.0)
    again = {r.media_id: r.digest for r in extract_features(media).collect()}
    assert {k: v.digest for k, v in out.items()} == again


def _ppm_bytes(w, h, fn):
    """Build a P6 image whose pixel (x, y) is fn(x, y) -> (r, g, b)."""
    body = bytes(
        c for y in range(h) for x in range(w) for c in fn(x, y)
    )
    return b"P6\n" + f"{w} {h}\n255\n".encode() + body


def test_resize_raises_on_undecodable_blob(spark, media):
    # fake PNG bytes are decodable by neither the PNM codec nor PIL
    with pytest.raises(Exception):
        resize_images(media.filter(F.col("kind") == "image"), 32, 32).collect()


def test_pnm_decode_resize_roundtrip(spark):
    """The no-deps image path end-to-end on a REAL decoded fixture: a
    4x2 P6 with distinct pixel values decodes, downsamples 2x by
    nearest-neighbor, and re-encodes to the exact expected bytes."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.ml.multimodal import (
        _decode_pnm,
        decode_image,
    )

    # pixel (x, y) = (10x, 10y, 99) — every pixel unique in r/g
    blob = _ppm_bytes(4, 2, lambda x, y: (10 * x, 10 * y, 99))
    a = decode_image(blob)
    assert a.shape == (2, 4, 3)
    assert tuple(a[1, 3]) == (30, 10, 99)

    df = spark.createDataFrame(
        [(1, "image", blob, "image/x-portable-pixmap", 4, 2, None)], MEDIA_SCHEMA
    )
    out = resize_images(df, 2, 1).collect()[0]
    assert (out.width, out.height) == (2, 1)
    assert out.mime == "image/x-portable-pixmap"
    r = _decode_pnm(bytes(out.content))
    # nearest-neighbor with floor mapping keeps pixels (0,0) and (2,0)
    assert r.shape == (1, 2, 3)
    assert tuple(r[0, 0]) == (0, 0, 99)
    assert tuple(r[0, 1]) == (20, 0, 99)
    # comment + P5 gray variants decode too
    gray = b"P5\n# a comment\n2 2\n255\n" + bytes([0, 100, 200, 255])
    g = decode_image(gray)
    assert g.shape == (2, 2) and g[1, 1] == 255


def test_image_stats_tolerates_corrupt_rows(spark, media):
    from retrieval_augmented_generation_rag_data_pipeline_spark.ml.multimodal import (
        image_stats,
    )

    blob = _ppm_bytes(4, 4, lambda x, y: (100, 50, 0))
    good = spark.createDataFrame(
        [(9, "image", blob, "image/x-portable-pixmap", 4, 4, None)], MEDIA_SCHEMA
    )
    out = {r.media_id: r for r in image_stats(media.unionByName(good)).collect()}
    assert len(out) == 4  # corrupt rows survive as rows, not failures
    ok = out[9]
    assert (ok.width, ok.height, ok.channels) == (4, 4, 3)
    assert ok.mean == [100.0, 50.0, 0.0]
    assert ok.std == [0.0, 0.0, 0.0]
    assert ok.decode_error is None
    bad = out[1]  # the fake-PNG row
    assert bad.width is None and bad.decode_error


def test_sample_video_frames(spark, media):
    rows = sample_video_frames(media, every_s=1.0).collect()
    # duration 3.5s -> frames at t=0,1,2,3
    assert [(r.frame_idx, r.t_offset_s) for r in sorted(rows, key=lambda r: r.frame_idx)] == [
        (0, 0.0),
        (1, 1.0),
        (2, 2.0),
        (3, 3.0),
    ]


def test_fake_transcribe_plumbing(spark, media):
    out = (
        media.select("media_id", fake_transcribe(F.col("content")).alias("chunks"))
        .select("media_id", F.explode("chunks").alias("c"))
        .select("media_id", "c.text", "c.t_start", "c.t_end", "c.confidence")
        .collect()
    )
    assert len(out) >= 3
    for r in out:
        assert r.t_end == r.t_start + 8.0
        assert isinstance(r.text, str) and len(r.text) > 0


def test_audio_pipeline_end_to_end_with_fakes(spark):
    """EP1 step 4 shape (reference src/main.py:55-95): binary audio ->
    decode (U2) -> transcribe (U1) -> diarize (U3) -> islands (W1) ->
    as-of align (J2), all over deterministic fakes."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from retrieval_augmented_generation_rag_data_pipeline_spark.ml.udfs import (
        fake_decode,
        fake_diarize,
        fake_transcribe,
    )
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.joins import (
        asof_align,
    )
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.windows import (
        merge_islands,
    )

    media = spark.createDataFrame(
        [("f1", bytes(range(64))), ("f2", bytes(range(32)))],
        "file string, content binary",
    )
    decoded = media.select("file", "content", fake_decode("content").alias("wave"))

    chunks = (
        media.select("file", F.explode(fake_transcribe("content")).alias("c"))
        .select("file", "c.text", "c.t_start", "c.t_end", "c.confidence")
        .withColumn(
            "chunk_id",
            F.row_number().over(Window.partitionBy("file").orderBy("t_start")),
        )
    )
    segs = decoded.select("file", F.explode(fake_diarize("wave")).alias("s")).select(
        "file", "s.spk_start", "s.spk_end", "s.speaker"
    )
    islands = merge_islands(segs, ["file"], "spk_start", "speaker", "spk_start", "spk_end")
    segments = islands.select(
        "file",
        F.col("island_id").alias("seg_id"),
        F.col("label").alias("speaker"),
        F.col("island_end").alias("spk_end"),
    )
    aligned = asof_align(chunks, segments)
    rows = aligned.collect()
    # f1: 64 bytes -> 8 transcript chunks, 4 alternating-speaker islands
    # merge to 4 segments; every chunk must be consumed exactly once
    total_words = sum(len(r.text.split()) for r in rows)
    assert total_words == 8 + 4  # f1 chunks + f2 chunks
    assert {r.file for r in rows} == {"f1", "f2"}
    assert all(r.confidence > 0 for r in rows)


# ---------------------------------------------------------------------
# Perceptual hashes (round-14 verdict item 5) — the decode half
# ---------------------------------------------------------------------


def _gradient_img(w, h, tweak=0):
    """A horizontal-gradient P6 image; `tweak` shifts a single corner
    pixel's brightness (a tiny edit a perceptual hash should absorb)."""
    def fn(x, y):
        v = min(255, (x * 255) // max(w - 1, 1))
        if tweak and x == 0 and y == 0:
            v = min(255, v + tweak)
        return (v, v, v)
    return _ppm_bytes(w, h, fn)


def test_dhash_invariant_to_resize_and_tiny_edits():
    from retrieval_augmented_generation_rag_data_pipeline_spark.ml.multimodal import decode_image, dhash64

    base = dhash64(decode_image(_gradient_img(64, 48)))
    resized = dhash64(decode_image(_gradient_img(32, 24)))
    tweaked = dhash64(decode_image(_gradient_img(64, 48, tweak=30)))
    assert base == resized  # same scene at another size -> same hash
    assert bin((base ^ tweaked) & (2**64 - 1)).count("1") <= 7
    # a very different scene (vertical gradient) is far away
    other = dhash64(
        decode_image(
            _ppm_bytes(64, 48, lambda x, y: ((y * 255) // 47,) * 3)
        )
    )
    assert bin((base ^ other) & (2**64 - 1)).count("1") > 7


def test_image_phash_and_near_dup_pairs_end_to_end(spark):
    """Planted near-dup pair: the same gradient at two sizes plus a
    tiny edit must pair up through image_phash ->
    phash_near_dup_pairs; an unrelated image and a corrupt blob must
    not. The full decode -> hash -> band -> pair path."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.ml.multimodal import image_phash
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.dedup import phash_near_dup_pairs

    rows = [
        (1, "image", bytearray(_gradient_img(64, 48)), "image/x-ppm", None, None, None),
        (2, "image", bytearray(_gradient_img(32, 24, tweak=40)), "image/x-ppm", None, None, None),
        (3, "image", bytearray(_ppm_bytes(64, 48, lambda x, y: ((y * 255) // 47,) * 3)), "image/x-ppm", None, None, None),
        (4, "image", bytearray(b"not an image"), "application/octet-stream", None, None, None),
    ]
    from retrieval_augmented_generation_rag_data_pipeline_spark.ml.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = image_phash(media)
    got = {r.media_id: (r.phash, r.decode_error) for r in hashes.collect()}
    assert got[4][0] is None and "PNM" in got[4][1]  # corrupt -> null + msg
    assert all(got[i][0] is not None for i in (1, 2, 3))

    pairs = {
        (r.media_a, r.media_b): r.distance
        for r in phash_near_dup_pairs(hashes).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 7
    assert all(3 not in p and 4 not in p for p in pairs)


def test_phash_banding_equals_all_pairs(spark):
    """The pigeonhole exactness contract: banded blocking + exact
    rerank returns EXACTLY the all-pairs Hamming filter, on adversarial
    hashes mixing near and far pairs."""
    import itertools

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.dedup import phash_near_dup_pairs

    hashes = [
        0, 1, 3, 7, 0b1111111, 0b11111111,        # a chain of close hashes
        -(2**63), -(2**63) + 1,                   # sign-bit territory
        2**62 + 5, 0x5555555555555555 - 2**63,    # far away
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "media_id long, phash long"
    )
    got = {
        (r.media_a, r.media_b): r.distance
        for r in phash_near_dup_pairs(df, max_distance=7).collect()
    }
    want = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(hashes), 2):
        d = bin((a ^ b) & (2**64 - 1)).count("1")
        if d <= 7:
            want[(i, j)] = d
    assert got == want and len(want) > 0

    import pytest

    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_dup_pairs(df, max_distance=8, n_bands=8)
