"""Multimodal plumbing tests: binary round-trip, Arrow-batched feature
extraction shape/determinism, frame-sample plan arithmetic."""

from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.operators import multimodal as M
from vertica_hadoop_integration__spark.sources import load_table


def _media(spark, sf_dir):
    return M.synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))


def test_media_table_schema_and_payload(spark, sf_dir):
    m = _media(spark, sf_dir)
    assert dict(m.dtypes)["payload"] == "binary"
    # payload round-trips: decoding the bytes gives back the source text
    joined = (
        m.withColumn("text_back", F.decode(F.col("payload"), "UTF-8"))
        .join(
            load_table(spark, sf_dir, "documents"),
            F.col("source_doc_id") == F.col("doc_id"),
        )
        .filter(F.col("text_back") != F.col("text"))
    )
    assert joined.count() == 0


def test_feature_extraction_complete_and_deterministic(spark, sf_dir):
    m = _media(spark, sf_dir)
    f1 = M.extract_features(m)
    assert f1.count() == m.count()
    rows = {r["media_id"]: r for r in f1.collect()}
    rows2 = {r["media_id"]: r for r in M.extract_features(m).collect()}
    assert rows == rows2  # deterministic stub decode
    for r in rows.values():
        if r["media_type"] == "image":
            assert r["width"] is not None and r["duration_sec"] is None
        elif r["media_type"] == "audio":
            assert r["width"] is None and r["duration_sec"] is not None
        else:
            assert r["width"] is not None and r["duration_sec"] is not None


def test_frame_sample_counts_match_duration(spark, sf_dir):
    m = _media(spark, sf_dir)
    feats = {r["media_id"]: r for r in M.extract_features(m).collect()}
    plan = M.frame_sample_plan(m, every_sec=10.0)
    counts = {
        r["media_id"]: r["n"]
        for r in plan.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for mid, r in feats.items():
        if r["media_type"] == "video":
            want = int(r["duration_sec"] // 10.0)
            assert counts.get(mid, 0) == want
    # only videos with >=1 frame got rows
    assert set(counts) == {
        m
        for m, r in feats.items()
        if r["media_type"] == "video" and r["duration_sec"] >= 10.0
    }


def test_real_decoders_roundtrip_without_spark():
    """The stdlib BMP/WAV decoders recover exactly what the generators
    encoded — header fields AND data statistics (no Spark involved)."""
    for doc_id in (0, 7, 123, 4999):
        bmp = M._bmp_bytes(doc_id)
        got = M._decode_real("image", bmp)
        assert got["width"] == 8 + doc_id % 24
        assert got["height"] == 8 + (doc_id * 7) % 24
        assert abs(got["mean_intensity"] - (doc_id % 256) / 255.0) < 1e-12
        assert got["duration_sec"] is None

        wav = M._wav_bytes(doc_id)
        got = M._decode_real("audio", wav)
        n_frames = 400 + (doc_id % 50) * 80
        amp = 1000 + (doc_id % 100) * 300
        assert got["duration_sec"] == n_frames / 8000
        assert abs(got["mean_intensity"] - amp / 32768.0) < 1e-12
        assert got["width"] is None


def test_real_decoder_rejects_garbage_and_compressed_video():
    import struct

    import pytest as _pytest

    with _pytest.raises(ValueError):
        M._decode_real("image", b"\x00" * 64)
    with _pytest.raises(ValueError):
        M._decode_real("video", b"anything-but-RIFF" * 4)
    # a compressed stream (strf biCompression != 0) stays honestly gated
    avi = bytearray(M._avi_bytes(2))
    pos = avi.find(b"strf") + 8 + 16  # biCompression field
    assert struct.unpack_from("<I", avi, pos)[0] == 0
    struct.pack_into("<I", avi, pos, 0x47504A4D)  # 'MJPG'
    with _pytest.raises(NotImplementedError):
        M._decode_real("video", bytes(avi))


def test_avi_generator_parser_roundtrip_without_spark():
    """The struct-arithmetic AVI parser recovers exactly what the
    generator encoded: header fields, every frame's pixels, duration."""
    for doc_id in (2, 5, 8, 47, 1001):
        meta = M._parse_avi(M._avi_bytes(doc_id))
        w, h = 8 + doc_id % 16, 8 + (doc_id * 5) % 16
        nf, fps = 2 + doc_id % 9, (4, 5, 8, 10)[doc_id % 4]
        assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, nf)
        assert len(meta["frames"]) == nf
        for k, f in enumerate(meta["frames"]):
            assert f.shape == (h, w, 3)
            assert (f == (doc_id + 17 * k) % 256).all()
        d = M._decode_real("video", M._avi_bytes(doc_id))
        assert d["duration_sec"] == nf / fps
        want = sum((doc_id + 17 * k) % 256 for k in range(nf)) / nf / 255
        assert d["mean_intensity"] == want


def test_video_frame_extract_distributed(spark, sf_dir):
    """Distributed frame extraction: every frame's materialized BMP
    decodes back to the generator's constant-luminance pixels, with
    exact timestamps and means; `every` subsampling keeps multiples."""
    docs = load_table(spark, sf_dir, "documents").limit(150)
    media = M.synthesize_real_video_media(docs)
    rows = M.video_frame_extract(media, every=1).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    assert by_media and all(mid % 3 == 2 for mid in by_media)
    for mid, frames in by_media.items():
        nf, fps = 2 + mid % 9, (4, 5, 8, 10)[mid % 4]
        assert sorted(f.frame_idx for f in frames) == list(range(nf))
        for f in frames:
            lum = (mid + 17 * f.frame_idx) % 256
            assert f.frame_mean == lum / 255
            assert f.frame_ts_sec == f.frame_idx / fps
            px = M._bmp_pixels(bytes(f.frame_bmp))
            assert px.shape == (8 + (mid * 5) % 16, 8 + mid % 16, 3)
            assert (px == lum).all()
    sub = M.video_frame_extract(media, every=2).collect()
    assert {(r.media_id, r.frame_idx) for r in sub} == {
        (r.media_id, r.frame_idx) for r in rows if r.frame_idx % 2 == 0
    }


def test_real_media_features_distributed(spark, sf_dir):
    """The full distributed path: synthesize real payloads, decode via
    mapInPandas, verify one spot row against the local decoder."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_real_media_from_documents(docs)
    feats = M.extract_features(media, decoder="real")
    rows = {r["media_id"]: r for r in feats.collect()}
    assert rows  # non-empty
    # every image decoded with plausible header-true dims
    for mid, r in rows.items():
        if r["media_type"] == "image":
            assert r["width"] == 8 + mid % 24
        else:
            assert r["duration_sec"] == (400 + (mid % 50) * 80) / 8000


# -- perceptual-hash dedup -------------------------------------------------


def test_phash_identical_classes_and_planted_near_miss(spark):
    """Docs in the same fixture class share a phash (hamming 0); an image
    with a few perturbed pixels lands within the hamming threshold; a
    different class's pattern is NOT paired."""
    from vertica_hadoop_integration__spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _ahash64_from_bmp,
        _bmp_gradient_bytes,
        phash_dedup,
    )

    base = _bmp_gradient_bytes(7)
    # flip a couple of pixel bytes well inside the pixel array
    near = bytearray(base)
    near[60] = (near[60] + 96) % 256
    near[63] = (near[63] + 96) % 256
    other = _bmp_gradient_bytes(8)
    rows = [
        (1, "image", bytes(base), len(base), 1),
        (2, "image", bytes(near), len(near), 2),
        (3, "image", other, len(other), 3),
        (4, "image", _bmp_gradient_bytes(57), len(_bmp_gradient_bytes(57)), 4),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {(r.media_id_a, r.media_id_b): r.hamming
             for r in phash_dedup(media, max_hamming=3).collect()}
    assert (1, 2) in pairs           # perturbed copy found
    assert (1, 4) in pairs and pairs[(1, 4)] == 0  # same class (7 and 57)
    assert (1, 3) not in pairs       # different pattern not paired
    # determinism: python-side hash equals itself across calls
    assert _ahash64_from_bmp(base) == _ahash64_from_bmp(bytes(bytearray(base)))


def test_phash_banding_lossless_at_threshold(spark):
    """Banded candidates recover every pair an exhaustive scan finds at
    hamming <= 3 (pigeonhole over 4x16-bit bands)."""
    from vertica_hadoop_integration__spark.operators.multimodal import (
        perceptual_hash,
        phash_dedup,
        synthesize_textured_media,
    )
    from vertica_hadoop_integration__spark.sources import load_table
    import pyspark.sql.functions as F

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    media = synthesize_textured_media(d)
    sig = perceptual_hash(media)
    a = sig.select(F.col("media_id").alias("ida"), F.col("phash").alias("pa"))
    b = sig.select(F.col("media_id").alias("idb"), F.col("phash").alias("pb"))
    exhaustive = {
        (r.ida, r.idb)
        for r in a.join(b, F.col("ida") < F.col("idb"))
        .select(
            "ida", "idb",
            F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    banded = {
        (r.media_id_a, r.media_id_b)
        for r in phash_dedup(media, max_hamming=3).collect()
    }
    assert banded == exhaustive


def test_audio_fingerprint_classes_and_planted_near_miss(spark):
    """Same-class clips share a fingerprint; a clip with a perturbed
    window stays within the hamming threshold; a different envelope
    shape is not paired. Gain invariance: the same clip at double
    volume fingerprints identically."""
    import struct
    import wave as _wave
    import io

    from vertica_hadoop_integration__spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _envhash64_from_wav,
        _wav_am_bytes,
        audio_fingerprint_dedup,
    )

    base = _wav_am_bytes(3)
    # double the volume: scale every sample 2x (re-encode PCM)
    with _wave.open(io.BytesIO(base)) as w:
        params, frames = w.getparams(), w.readframes(w.getnframes())
    doubled = io.BytesIO()
    with _wave.open(doubled, "wb") as w:
        w.setparams(params)
        w.writeframes(
            b"".join(
                struct.pack("<h", max(-32768, min(32767, 2 * v[0])))
                for v in struct.iter_unpack("<h", frames)
            )
        )
    louder = doubled.getvalue()
    other = _wav_am_bytes(4)
    rows = [
        (1, "audio", base, len(base), 1),
        (2, "audio", louder, len(louder), 2),
        (3, "audio", other, len(other), 3),
        (4, "audio", _wav_am_bytes(43), len(_wav_am_bytes(43)), 4),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {(r.media_id_a, r.media_id_b): r.hamming
             for r in audio_fingerprint_dedup(media, max_hamming=3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 0  # gain-invariant
    assert (1, 4) in pairs and pairs[(1, 4)] == 0  # same class (3 and 43)
    assert (1, 3) not in pairs                     # different shape
    assert _envhash64_from_wav(base) == _envhash64_from_wav(bytes(bytearray(base)))


def test_audio_banding_lossless_at_threshold(spark):
    from vertica_hadoop_integration__spark.operators.multimodal import (
        audio_fingerprint,
        audio_fingerprint_dedup,
        synthesize_am_audio_media,
    )
    from vertica_hadoop_integration__spark.sources import load_table
    import pyspark.sql.functions as F

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    media = synthesize_am_audio_media(d)
    sig = audio_fingerprint(media)
    a = sig.select(F.col("media_id").alias("ida"), F.col("afp").alias("pa"))
    b = sig.select(F.col("media_id").alias("idb"), F.col("afp").alias("pb"))
    exhaustive = {
        (r.ida, r.idb)
        for r in a.join(b, F.col("ida") < F.col("idb"))
        .select(
            "ida", "idb",
            F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    banded = {
        (r.media_id_a, r.media_id_b)
        for r in audio_fingerprint_dedup(media, max_hamming=3).collect()
    }
    assert banded == exhaustive


def test_audio_spectrum_recovers_modulation_frequency(spark, sf_dir):
    """The dominant envelope bin must equal the generator's fm =
    2 + (doc_id % 40 % 7) for EVERY clip — rectifying the square wave
    leaves exactly the modulation envelope, whose integer cycles/clip
    align FFT bins perfectly."""
    from vertica_hadoop_integration__spark.operators.multimodal import (
        audio_envelope_spectrum,
        synthesize_am_audio_media,
    )
    from vertica_hadoop_integration__spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").limit(120)
    rows = audio_envelope_spectrum(synthesize_am_audio_media(d)).collect()
    assert len(rows) == 120
    for r in rows:
        cls = r.media_id % 40
        assert r.dominant_env_cycles == 2 + (cls % 7), r
        assert r.env_power_frac > 0.5, r  # fm harmonic carries most power
        assert r.n_frames == 1600 + (cls % 5) * 320
        assert r.sample_rate == 8000


# -- image resize: kernel parity, round-trip, and the registered query -----


def _reference_resize(arr, out_w, out_h):
    """Independent pure-python nearest-neighbor (pixel-center convention),
    written loop-wise so a bug in the vectorized kernel cannot hide."""
    import math

    h, w = len(arr), len(arr[0])
    out = []
    for i in range(out_h):
        sy = min(h - 1, math.floor((i + 0.5) * h / out_h))
        row = []
        for j in range(out_w):
            sx = min(w - 1, math.floor((j + 0.5) * w / out_w))
            row.append(arr[sy][sx])
        out.append(row)
    return out


def test_bmp_encode_decode_roundtrip():
    import numpy as np

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (8, 8), (13, 7)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = M._bmp_pixels(M._encode_bmp(arr))
        assert back.shape == (h, w, 3)
        assert (back == arr).all()


def test_resize_kernel_matches_reference_on_gradients():
    """Every output pixel of the vectorized kernel equals the loop-wise
    reference, on gradient fixtures, both down- and up-scaling."""
    import numpy as np

    for doc_id in (0, 7, 23, 49, 101):
        arr = M._bmp_pixels(M._bmp_gradient_bytes(doc_id))
        for out_w, out_h in [(4, 4), (16, 16), (32, 8)]:
            got = M.resize_image_array(arr, out_w, out_h)
            want = np.array(
                _reference_resize(arr.tolist(), out_w, out_h), dtype=np.uint8
            )
            assert got.shape == (out_h, out_w, 3)
            assert (got == want).all(), (doc_id, out_w, out_h)


def test_resize_images_distributed(spark, sf_dir):
    """The Arrow path: resized payloads are valid BMPs whose pixels equal
    the reference resize of the source image; flat fixtures preserve
    their mean exactly."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(90)
    media = M.synthesize_textured_media(docs)
    rows = M.resize_images(media, out_w=12, out_h=10).collect()
    assert len(rows) == 90
    for r in rows:
        src = M._bmp_pixels(M._bmp_gradient_bytes(r.media_id))
        assert (r.orig_height, r.orig_width) == src.shape[:2]
        got = M._bmp_pixels(bytes(r.payload))
        want = np.array(
            _reference_resize(src.tolist(), 12, 10), dtype=np.uint8
        )
        assert (got == want).all(), r.media_id
        assert r.n_bytes == len(bytes(r.payload)) == 54 + 36 * 10
        assert abs(r.mean_intensity - got.astype(np.float64).mean() / 255.0) == 0.0

    # flat-luminance fixtures: resize preserves the constant exactly
    flat = M.synthesize_real_media_from_documents(docs)
    for r in M.resize_images(flat, out_w=16, out_h=16).collect():
        assert r.mean_intensity == (r.media_id % 256) / 255.0, r.media_id


def test_avi_roundtrip_randomized_frames():
    """Property-style: arbitrary frame contents and shapes survive the
    encode->parse round-trip bit-exactly (not just the constant-lum
    fixture path)."""
    import numpy as np

    rng = np.random.default_rng(11)
    for _ in range(12):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        nf = int(rng.integers(1, 12))
        fps = int(rng.choice([4, 5, 8, 10, 20, 25]))
        frames = [
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for _ in range(nf)
        ]
        meta = M._parse_avi(M._avi_from_frames(frames, fps))
        assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, nf)
        assert meta["usec_per_frame"] == 1_000_000 // fps
        assert len(meta["frames"]) == nf
        for got, want in zip(meta["frames"], frames):
            assert (got == want).all()


# -- corrupt-input validation and robust decode ----------------------------


def test_decoder_validation_rejects_planted_corruption():
    """Both corruption classes (mid-header truncation, flipped magic)
    fail validation with ValueError for ALL three real formats."""
    import pytest as _pytest

    gens = {
        "image": M._bmp_bytes,
        "audio": M._wav_bytes,
        "video": M._avi_bytes,
    }
    for kind, gen in gens.items():
        for doc_id in (6, 29, 100):
            clean = gen(doc_id)
            with _pytest.raises(ValueError):
                M._decode_real(kind, clean[:10])
            with _pytest.raises(ValueError):
                M._decode_real(kind, bytes([clean[0] ^ 0xFF]) + clean[1:])
            # truncating the DATA region (not just the header) also fails
            with _pytest.raises(ValueError):
                M._decode_real(kind, clean[:-7])
            M._decode_real(kind, clean)  # clean still decodes


def test_extract_features_robust_distributed(spark, sf_dir):
    """One corrupt payload costs one NULL row with the exception class,
    never a task failure; clean rows keep exact features."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    media = M.synthesize_corrupt_media(docs)
    rows = {r.media_id: r for r in M.extract_features_robust(media, "real").collect()}
    assert len(rows) == 200
    for mid, r in rows.items():
        if mid % 11 == 0 or mid % 13 == 0:
            assert r.decode_error == "ValueError", mid
            assert r.width is None and r.mean_intensity is None
        else:
            assert r.decode_error is None, mid
            if r.media_type == "image":
                assert r.width == 8 + mid % 24
                assert r.mean_intensity == (mid % 256) / 255.0
            elif r.media_type == "video":
                nf, fps = 2 + mid % 9, (4, 5, 8, 10)[mid % 4]
                assert r.duration_sec == nf / fps


def test_resize_and_frame_extract_skip_corrupt(spark, sf_dir):
    """on_error='skip' drops exactly the corrupt rows; clean rows are
    untouched; default mode still raises."""
    import pytest as _pytest

    docs = load_table(spark, sf_dir, "documents").limit(120)
    media = M.synthesize_corrupt_media(docs)

    imgs = M.resize_images(media, 8, 8, on_error="skip").collect()
    got_img = {r.media_id for r in imgs}
    want_img = {
        i for i in range(120) if i % 3 == 0 and i % 11 != 0 and i % 13 != 0
    }
    assert got_img == want_img

    frames = M.video_frame_extract(media, on_error="skip").collect()
    got_vid = {r.media_id for r in frames}
    want_vid = {
        i for i in range(120) if i % 3 == 2 and i % 11 != 0 and i % 13 != 0
    }
    assert got_vid == want_vid

    with _pytest.raises(Exception):
        M.resize_images(media, 8, 8).collect()
    with _pytest.raises(Exception):
        M.video_frame_extract(media).collect()
    with _pytest.raises(ValueError):
        M.resize_images(media, 8, 8, on_error="bogus")


def test_resize_and_frame_extract_parameter_guards(spark, sf_dir):
    import pytest as _pytest

    docs = load_table(spark, sf_dir, "documents").limit(5)
    media = M.synthesize_textured_media(docs)
    with _pytest.raises(ValueError):
        M.resize_images(media, 0, 8)
    with _pytest.raises(ValueError):
        M.resize_images(media, 8, -1)
    with _pytest.raises(ValueError):
        M.video_frame_extract(media, every=0)


def test_fingerprint_dedup_skip_corrupt(spark, sf_dir):
    """on_error='skip' in both fingerprint paths: a corrupt payload
    leaves the signature table (so it can join no candidate pair), the
    pairs among clean rows are exactly what a pre-filtered run yields,
    and the default mode still raises."""
    import pytest as _pytest

    docs = load_table(spark, sf_dir, "documents").limit(90)

    def plant(media):
        # truncate every 7th payload mid-header; flip magic on every 17th
        return media.withColumn(
            "payload",
            F.when(
                F.col("media_id") % 7 == 0,
                F.substring(F.col("payload"), 1, 10).cast("binary"),
            )
            .when(
                F.col("media_id") % 17 == 0,
                F.concat(
                    F.lit(bytes([0x00])),
                    F.expr("substring(payload, 2, n_bytes - 1)"),
                ).cast("binary"),
            )
            .otherwise(F.col("payload")),
        )

    for synth, dedup, hashed in (
        (M.synthesize_textured_media, M.phash_dedup, M.perceptual_hash),
        (M.synthesize_am_audio_media, M.audio_fingerprint_dedup, M.audio_fingerprint),
    ):
        clean = synth(docs)
        corrupt = plant(clean)
        bad_ids = {i for i in range(90) if i % 7 == 0 or i % 17 == 0}

        sig_ids = {r.media_id for r in hashed(corrupt, on_error="skip").collect()}
        assert sig_ids == set(range(90)) - bad_ids

        got = {
            (r.media_id_a, r.media_id_b)
            for r in dedup(corrupt, on_error="skip").collect()
        }
        want = {
            (r.media_id_a, r.media_id_b)
            for r in dedup(
                clean.filter(~F.col("media_id").isin(list(bad_ids)))
            ).collect()
        }
        assert got == want and got  # non-trivial pair set survives

        with _pytest.raises(Exception):
            dedup(corrupt).collect()
        with _pytest.raises(ValueError):
            hashed(clean, on_error="bogus")
