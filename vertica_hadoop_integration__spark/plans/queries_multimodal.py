"""Multimodal-column queries: binary payload plumbing (oracle-checked
metadata + content hashing) and the Arrow-batched feature/frame-sample
paths (rows-only — the decode stub is not SQL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as M
from ..sources import load_table
from .registry import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))


# -- binary column metadata (oracle-checked incl. sha256 content hash) -----
@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_hash,
           doc_id AS source_doc_id
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _media(spark, sf_dir)
    return m.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.sha2(F.col("payload"), 256).alias("content_hash"),
        "source_doc_id",
    )


# -- Arrow-batched feature extraction (oracle-checked) ----------------------
# The stub decoder derives pseudo-metadata from sha256 bytes of the payload
# (operators/multimodal.py::_decode_stub), and DuckDB has sha256 + hex-byte
# extraction — so even the stub path is exactly SQL-replayable: the oracle
# recomputes width/height from the same hash bytes the UDF reads.
@register(
    "multimodal_features",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]
                          AS media_type,
                      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                      sha256(text) AS content_hash
               FROM documents),
    h AS (SELECT *,
                 ('0x' || substr(content_hash, 1, 2))::INT AS b0,
                 ('0x' || substr(content_hash, 3, 2))::INT AS b1
          FROM m)
    SELECT media_id, media_type, n_bytes, content_hash,
           CASE WHEN media_type = 'image' THEN CAST(64 + b0 % 192 AS INT)
                WHEN media_type = 'video' THEN CAST(320 + b0 % 320 AS INT)
           END AS width,
           CASE WHEN media_type = 'image' THEN CAST(64 + b1 % 192 AS INT)
                WHEN media_type = 'video' THEN CAST(240 + b1 % 240 AS INT)
           END AS height
    FROM h
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.extract_features(_media(spark, sf_dir)).drop("mean_intensity", "duration_sec")


# -- video frame-sampling plan (oracle-checked) ------------------------------
# Stub video duration is 1.0 + (sha256_byte[3] % 600)/10 seconds; the frame
# explode (frame every 10s, zero-frame media dropped) is plain SQL.
@register(
    "multimodal_frame_sample",
    oracle="""
    WITH v AS (SELECT doc_id AS media_id, sha256(text) AS ch
               FROM documents WHERE doc_id % 3 = 2),
    d AS (SELECT media_id,
                 1.0 + (('0x' || substr(ch, 7, 2))::INT % 600) / 10.0 AS dur
          FROM v),
    f AS (SELECT media_id, CAST(floor(dur / 10.0) AS INT) AS n_frames
          FROM d)
    SELECT media_id, CAST(t.u AS INT) AS frame_idx,
           CAST(t.u AS DOUBLE) * 10.0 AS frame_ts_sec
    FROM f, unnest(generate_series(0, n_frames - 1)) AS t(u)
    WHERE n_frames >= 1
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.frame_sample_plan(_media(spark, sf_dir), every_sec=10.0)


# -- REAL format decode (oracle-checked) ------------------------------------
# Payload generators derive every BMP/WAV parameter deterministically from
# doc_id (operators/multimodal.py::_bmp_bytes/_wav_bytes), so DuckDB can
# predict exactly what a correct decoder must recover from the bytes:
# dimensions from the BMP DIB header, duration from the WAV frame count,
# mean intensity from the actual pixel/sample data (constant-luminance
# pixels and a square wave make both analytically exact).
@register(
    "multimodal_decode_real",
    oracle="""
    WITH m AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS k FROM documents
               WHERE doc_id % 3 < 2)
    SELECT doc_id AS media_id,
           CASE WHEN k = 0 THEN 'image' ELSE 'audio' END AS media_type,
           CASE WHEN k = 0
                THEN CAST(54 + ((8 + doc_id % 24) * 3 + 3) // 4 * 4
                          * (8 + (doc_id * 7) % 24) AS BIGINT)
                ELSE CAST(44 + (400 + (doc_id % 50) * 80) * 2 AS BIGINT)
           END AS n_bytes,
           CASE WHEN k = 0 THEN CAST(8 + doc_id % 24 AS INT) END AS width,
           CASE WHEN k = 0 THEN CAST(8 + (doc_id * 7) % 24 AS INT) END AS height,
           CASE WHEN k = 1
                THEN CAST(400 + (doc_id % 50) * 80 AS DOUBLE) / 8000
           END AS duration_sec,
           CASE WHEN k = 0 THEN CAST(doc_id % 256 AS DOUBLE) / 255
                ELSE CAST(1000 + (doc_id % 100) * 300 AS DOUBLE) / 32768
           END AS mean_intensity
    FROM m
    """,
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL media decode: synthesize format-conformant BMP/WAV
    payloads per document (Arrow mapInPandas), then decode them back with
    the stdlib parsers (operators/multimodal.py::_decode_real) — header
    fields and pixel/sample statistics, not hash-derived fakes. The
    oracle recomputes every decoded value from the generation formulas,
    so a decoder that misparses a header or mis-scales samples fails the
    value hash."""
    media = M.synthesize_real_media_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    return M.extract_features(media, decoder="real", with_hash=False)


# -- REAL video decode (oracle-checked) -------------------------------------
# Uncompressed RIFF/AVI is a public container format parseable with stdlib
# struct alone (no codec — the frames are raw DIB pixels), exactly like the
# BMP/WAV real-decode work: the generator derives every parameter from
# doc_id, so DuckDB predicts what a correct parser must recover — dims and
# frame count from the avih header, duration from MicroSecPerFrame *
# TotalFrames, mean intensity from the constant-luminance frame pixels,
# and total byte size from the container layout arithmetic.
@register(
    "multimodal_video_decode",
    oracle="""
    WITH v AS (SELECT doc_id,
                      8 + doc_id % 16 AS w,
                      8 + (doc_id * 5) % 16 AS h,
                      2 + doc_id % 9 AS n_frames,
                      ([4,5,8,10])[CAST(doc_id % 4 AS INT) + 1] AS fps
               FROM documents WHERE doc_id % 3 = 2),
    lum AS (SELECT doc_id, AVG((doc_id + 17 * t.u) % 256) AS mean_lum
            FROM v, unnest(generate_series(0, n_frames - 1)) AS t(u)
            GROUP BY doc_id)
    SELECT v.doc_id AS media_id, 'video' AS media_type,
           CAST(224 + n_frames * (8 + ((w * 3 + 3) // 4 * 4) * h)
                AS BIGINT) AS n_bytes,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(n_frames AS DOUBLE) / fps AS duration_sec,
           lum.mean_lum / 255 AS mean_intensity
    FROM v JOIN lum ON v.doc_id = lum.doc_id
    """,
)
def multimodal_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL video decode: synthesize uncompressed RIFF/AVI
    payloads per video document (Arrow mapInPandas), parse them back with
    the struct-arithmetic container walker (operators/multimodal.py::
    _parse_avi) — header fields AND pixel statistics over every frame.
    Compressed codecs remain honestly gated (the strf compression check
    raises); the container path is fully real."""
    media = M.synthesize_real_video_media(load_table(spark, sf_dir, "documents"))
    return M.extract_features(media, decoder="real", with_hash=False)


# -- REAL per-frame extraction (oracle-checked) ------------------------------
# Each emitted frame's mean is pinned to the generator's per-frame
# luminance lum_k = (doc_id + 17k) % 256 and its timestamp to k/fps; the
# frame explode happens INSIDE the Arrow pass so full video payloads never
# enter a shuffle. The materialized per-frame BMP payload is dropped here
# only because binary blobs aren't oracle-comparable — its pixel content is
# pytest-pinned (tests/test_multimodal.py).
@register(
    "multimodal_video_frames",
    oracle="""
    WITH v AS (SELECT doc_id,
                      2 + doc_id % 9 AS n_frames,
                      ([4,5,8,10])[CAST(doc_id % 4 AS INT) + 1] AS fps
               FROM documents WHERE doc_id % 3 = 2)
    SELECT doc_id AS media_id, CAST(t.u AS INT) AS frame_idx,
           CAST(t.u AS DOUBLE) / fps AS frame_ts_sec,
           CAST((doc_id + 17 * t.u) % 256 AS DOUBLE) / 255 AS frame_mean
    FROM v, unnest(generate_series(0, n_frames - 1)) AS t(u)
    """,
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame extraction (operators/multimodal.py::video_frame_extract):
    parse each AVI, materialize every frame as a standalone BMP with audit
    stats — the video-to-training-images step of a multimodal pipeline."""
    media = M.synthesize_real_video_media(load_table(spark, sf_dir, "documents"))
    return M.video_frame_extract(media, every=1).drop("frame_bmp")


# -- decode-error handling over planted corruption (oracle-checked) ---------
# A 100 TB crawl has truncated downloads and mislabeled bytes; one bad file
# must cost one NULL row, not a task-retry storm. The fixture plants two
# corruption classes deterministically (doc_id % 11: truncation to 10
# bytes; else doc_id % 13: flipped magic bytes) across all three REAL
# formats, every decoder's validation rejects both with ValueError, and
# the oracle predicts the exact ok/failed/error-class partition.
@register(
    "multimodal_decode_errors",
    oracle="""
    WITH m AS (SELECT doc_id,
                      (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]
                          AS media_type,
                      CASE WHEN doc_id % 11 = 0 OR doc_id % 13 = 0
                           THEN 1 ELSE 0 END AS failed
               FROM documents)
    SELECT media_type,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(failed) AS BIGINT) AS n_failed,
           CAST(SUM(failed) AS BIGINT) AS n_valueerror,
           CAST(COUNT(*) - SUM(failed) AS BIGINT) AS n_ok
    FROM m GROUP BY media_type
    """,
)
def multimodal_decode_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust decode over deliberately-corrupt real media
    (operators/multimodal.py::extract_features_robust /
    synthesize_corrupt_media): per-type totals, failures, failures
    classified ValueError (all of them — validation rejects both planted
    classes), and clean rows. n_valueerror == n_failed proves no
    corruption escapes as a different exception class."""
    media = M.synthesize_corrupt_media(load_table(spark, sf_dir, "documents"))
    feats = M.extract_features_robust(media, decoder="real")
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(
            F.when(F.col("decode_error").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_failed"),
        F.sum(
            F.when(F.col("decode_error") == "ValueError", 1).otherwise(0)
        ).cast("long").alias("n_valueerror"),
        F.sum(
            F.when(F.col("decode_error").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_ok"),
    )


# -- video -> per-frame thumbnails (oracle-checked composition) --------------
# The two Arrow kernels compose through a plain binary column: frame BMPs
# materialized by video_frame_extract are decoded again by resize_images on
# the executors — no driver round-trip, no shuffle of pixel data (both ops
# are map-only, so the composition is one fused scan-stage pipeline). Every
# output value is still exactly predictable from the generator formulas.
@register(
    "multimodal_video_thumbnails",
    oracle="""
    WITH v AS (SELECT doc_id, 2 + doc_id % 9 AS n_frames
               FROM documents WHERE doc_id % 3 = 2)
    SELECT doc_id AS video_id, CAST(t.u AS INT) AS frame_idx,
           CAST(8 + doc_id % 16 AS INT) AS orig_width,
           CAST(8 + (doc_id * 5) % 16 AS INT) AS orig_height,
           CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
           CAST(246 AS BIGINT) AS n_bytes,
           CAST((doc_id + 17 * t.u) % 256 AS DOUBLE) / 255 AS mean_intensity
    FROM v, unnest(generate_series(0, n_frames - 1)) AS t(u)
    """,
)
def multimodal_video_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video -> frames -> 8x8 thumbnails: video_frame_extract's BMP
    payloads feed resize_images directly (frame id packed into media_id,
    recovered after). The training-data path for turning crawl video
    into fixed-shape image tensors, end to end on executors."""
    media = M.synthesize_real_video_media(load_table(spark, sf_dir, "documents"))
    frames = M.video_frame_extract(media, every=1)
    as_media = frames.select(
        (F.col("media_id") * 1000 + F.col("frame_idx")).alias("media_id"),
        F.lit("image").alias("media_type"),
        F.col("frame_bmp").alias("payload"),
    )
    thumbs = M.resize_images(as_media, out_w=8, out_h=8)
    return thumbs.select(
        (F.col("media_id") / 1000).cast("long").alias("video_id"),
        F.pmod(F.col("media_id"), F.lit(1000)).cast("int").alias("frame_idx"),
        "orig_width", "orig_height", "width", "height", "n_bytes",
        "mean_intensity",
    )


# -- REAL image resize (oracle-checked) -------------------------------------
# The constant-luminance BMP fixtures make a resize exactly predictable:
# nearest-neighbor sampling of a flat image is flat, so the resized mean
# intensity equals the generator's lum/255; the resized byte size is the
# fixed 16x16 BMP (54 + 48-byte stride * 16 rows = 822); original dims come
# from the generator formulas the decode_real oracle already pins. A resize
# kernel that misparses the header, mis-mapped indices out of bounds, or
# re-encoded with wrong padding fails dims/bytes; the actual resample
# arithmetic is pinned by gradient-fixture parity pytest
# (tests/test_multimodal.py) where every output pixel is checked.
@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8 + doc_id % 24 AS INT) AS orig_width,
           CAST(8 + (doc_id * 7) % 24 AS INT) AS orig_height,
           CAST(16 AS INT) AS width,
           CAST(16 AS INT) AS height,
           CAST(822 AS BIGINT) AS n_bytes,
           CAST(doc_id % 256 AS DOUBLE) / 255 AS mean_intensity
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> nearest-neighbor resize to 16x16 -> re-encode, one Arrow
    pass (operators/multimodal.py::resize_images); the brief's named
    multimodal preprocessing step between crawl bytes and fixed-shape
    training tensors. Payload column dropped here only because binary
    blobs aren't oracle-comparable — the registered op materializes it."""
    media = M.synthesize_real_media_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    return M.resize_images(media, out_w=16, out_h=16).drop("payload")


# -- perceptual-hash near-dup images (oracle-checked since r07) ------------
def _sig_band_dedup_oracle(
    class_hashes: list[int], period: int, max_hamming: int
) -> str:
    """Oracle for the fingerprint-banding dedup family.  The fixture
    payload is a pure function of doc_id % period, so each class's
    64-bit signature is a CONSTANT — computed once driver-side with the
    same pytest-pinned kernel the engine ships to executors (the
    random-projection literal-matrix pattern: the kernel is pinned by
    unit tests, the oracle certifies the DISTRIBUTED pipeline around
    it: signature fan-out, band bucketing, pair generation with no loss
    or duplication, Hamming verify).  Pigeonhole makes banding lossless
    at Hamming <= 3, so the engine's banded pair set must equal the
    plain quadratic predicate the SQL states."""
    vals = ", ".join(
        f"({c}, CAST({h} AS BIGINT))" for c, h in enumerate(class_hashes)
    )
    return f"""
    WITH classes(cls, sig) AS (VALUES {vals}),
    s AS (SELECT d.doc_id AS media_id, c.sig
          FROM documents d
          JOIN classes c ON CAST(d.doc_id % {period} AS INT) = c.cls)
    SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
    FROM s a JOIN s b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
    """


def _phash_dedup_oracle() -> str:
    from ..operators.multimodal import _ahash64_from_bmp, _bmp_gradient_bytes

    hashes = [_ahash64_from_bmp(_bmp_gradient_bytes(c)) for c in range(50)]
    return _sig_band_dedup_oracle(hashes, period=50, max_hamming=3)


@register("multimodal_phash_dedup", oracle=_phash_dedup_oracle())
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image detection without pixel joins: one Arrow
    pass reduces each (real, decoded) BMP to a 64-bit average-hash,
    then 4x16-bit banding generates candidate pairs (pigeonhole: any
    pair within Hamming 3 shares a band) and popcount(xor) verifies
    (operators/multimodal.py::phash_dedup). Gradient fixture payloads
    recur every 50 doc_ids, standing in for repeated web thumbnails.
    Rows-only: the pixel decode is not SQL-expressible; hash
    determinism, planted near-miss recall, and banding losslessness at
    the threshold are pytest-asserted (tests/test_multimodal.py)."""
    from ..operators.multimodal import phash_dedup, synthesize_textured_media

    d = load_table(spark, sf_dir, "documents")
    media = synthesize_textured_media(d)
    return phash_dedup(media, max_hamming=3)


# -- audio near-dup via envelope fingerprint (oracle-checked since r07) ----
def _audio_dedup_oracle() -> str:
    from ..operators.multimodal import _envhash64_from_wav, _wav_am_bytes

    hashes = [_envhash64_from_wav(_wav_am_bytes(c)) for c in range(40)]
    return _sig_band_dedup_oracle(hashes, period=40, max_hamming=3)


@register("multimodal_audio_dedup", oracle=_audio_dedup_oracle())
def multimodal_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate audio detection: one Arrow pass reduces each
    (real, decoded) WAV to a 64-bit envelope hash (64 time windows ->
    above/below-mean bits; duration- and gain-invariant), then the same
    4x16-bit Hamming banding + popcount verify as the image path
    (operators/multimodal.py::audio_fingerprint_dedup). The fixture's
    amplitude-modulated clips recur every 40 doc_ids (repeated
    jingles). Oracle-checked via per-class signature constants (see
    _sig_band_dedup_oracle); kernel determinism, planted near-miss
    recall, and banding losslessness are pytest-asserted
    (tests/test_multimodal.py)."""
    from ..operators.multimodal import audio_fingerprint_dedup, synthesize_am_audio_media

    d = load_table(spark, sf_dir, "documents")
    media = synthesize_am_audio_media(d)
    return audio_fingerprint_dedup(media, max_hamming=3)


# -- audio spectral features (analytic oracle since r10) -------------------
@register(
    "multimodal_audio_spectrum",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(1600 + ((doc_id % 40) % 5) * 320 AS BIGINT) AS n_frames,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(2 + ((doc_id % 40) % 7) AS INT) AS dominant_env_cycles,
           TRUE AS env_power_ok
    FROM documents
    """,
)
def multimodal_audio_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope-spectrum feature extraction per clip (operators/
    multimodal.py::audio_envelope_spectrum): FFT of the rectified
    signal -> dominant modulation frequency (cycles/clip) + relative
    power — the curation-grade audio descriptor.

    Analytic oracle since r10 (previously rows-only): the synthesizer
    modulates each clip's envelope at EXACTLY fm = 2 + (doc_id%40 % 7)
    integer cycles per clip (amplitude 0.3) plus a weaker harmonic
    (0.15), both landing in exact rfft bins, so the FFT's winning bin —
    the per-clip output cell, not an aggregate — replays analytically
    as arithmetic on doc_id, as do n_frames and the sample rate.  The
    relative power (~0.8, or ~1.0 when the harmonics coincide, minus
    int16 quantization noise) is published as the env_power_ok > 0.5
    majority boolean, computed for real.  The FFT itself stays
    non-SQL; what the oracle certifies is the full decode -> rectify ->
    rfft -> argmax pipeline against the generator's closed form."""
    from ..operators.multimodal import (
        audio_envelope_spectrum,
        synthesize_am_audio_media,
    )

    d = load_table(spark, sf_dir, "documents")
    media = synthesize_am_audio_media(d)
    out = audio_envelope_spectrum(media)
    return out.select(
        "media_id",
        "n_frames",
        "sample_rate",
        "dominant_env_cycles",
        (F.col("env_power_frac") > F.lit(0.5)).alias("env_power_ok"),
    )
