"""Real-codec multimodal tests: PPM/BMP parse + decode end-to-end.

The encode/parse helpers are pure functions (tested without Spark); the
Spark path is ``attach_synthetic_image`` → ``decode_images(codec=...)``
over real payload bytes, with stats cross-checked against direct numpy
computation and the plan contract (payload never shuffled) re-pinned.
"""

import numpy as np
import pytest

from pyspark_data_drift_detector_spark.operators.multimodal import (
    _LUMA_WEIGHTS,
    _parse_bmp,
    _parse_ppm,
    attach_synthetic_image,
    decode_images,
    encode_bmp,
    encode_ppm,
)


def _pixels(seed: int, h: int, w: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_and_grammar():
    arr = _pixels(1, 5, 7)
    data = encode_ppm(arr)
    assert data.startswith(b"P6\n7 5\n255\n")
    assert np.array_equal(_parse_ppm(data), arr)
    # comments + arbitrary whitespace anywhere in the header are legal PPM
    commented = b"P6 # a comment\n# another\n 7\t5 # dims\n255 " + arr.tobytes()
    assert np.array_equal(_parse_ppm(commented), arr)
    with pytest.raises(ValueError, match="bad magic"):
        _parse_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated PPM body"):
        _parse_ppm(data[:-3])
    with pytest.raises(ValueError, match="maxval"):
        _parse_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)
    with pytest.raises(ValueError, match="dimensions"):
        _parse_ppm(b"P6\n0 3\n255\n")


@pytest.mark.parametrize("w", [3, 4, 5])  # exercises every row-padding case
def test_bmp_roundtrip_padding(w):
    arr = _pixels(2, 4, w)
    data = encode_bmp(arr)
    assert data[:2] == b"BM"
    assert np.array_equal(_parse_bmp(data), arr)


def test_bmp_topdown_and_rejects():
    import struct

    arr = _pixels(3, 2, 3)
    data = bytearray(encode_bmp(arr))
    # flip to top-down: negate height, reverse the row order in the body
    struct.pack_into("<i", data, 22, -2)
    stride = (3 * 3 + 3) & ~3
    body = bytes(data[54:])
    rows = [body[i * stride : (i + 1) * stride] for i in range(2)]
    data[54:] = rows[1] + rows[0]
    assert np.array_equal(_parse_bmp(bytes(data)), arr)
    with pytest.raises(ValueError, match="bit depth"):
        bad = bytearray(encode_bmp(arr))
        struct.pack_into("<H", bad, 28, 8)
        _parse_bmp(bytes(bad))
    with pytest.raises(ValueError, match="compression"):
        bad = bytearray(encode_bmp(arr))
        struct.pack_into("<I", bad, 30, 1)
        _parse_bmp(bytes(bad))
    with pytest.raises(ValueError, match="truncated BMP body"):
        _parse_bmp(encode_bmp(arr)[:-2])


def test_decode_images_real_end_to_end(spark):
    """Spark decode of REAL payload bytes (both containers, auto-sniffed)
    matches numpy ground truth; a corrupt payload yields a decode_error
    row, never a job failure."""
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    for fmt in ("ppm", "bmp"):
        payloads = attach_synthetic_image(docs, width=8, height=4, fmt=fmt)
        out = {r["doc_id"]: r for r in decode_images(payloads, codec="auto").collect()}
        assert len(out) == 6
        for d in (0, 3, 5):
            i = np.arange(8 * 4 * 3, dtype=np.int64)
            flat = ((d * 31 + i * 7) % 256).astype(np.float64).reshape(-1, 3)
            luma = flat @ np.array(_LUMA_WEIGHTS)
            r = out[d]
            assert r["format"] == fmt and r["width"] == 8 and r["height"] == 4
            assert r["channels"] == 3 and r["decode_error"] is None
            assert r["channel_mean"] == pytest.approx(flat.mean(axis=0).tolist())
            assert r["channel_std"] == pytest.approx(flat.std(axis=0).tolist())
            assert r["luma_mean"] == pytest.approx(luma.mean())
            assert r["luma_std"] == pytest.approx(luma.std())
            assert sum(r["features"]) == pytest.approx(1.0)
            assert len(r["features"]) == 8
        # explicit wrong-codec parse error surfaces per row
        wrong = decode_images(payloads, codec="bmp" if fmt == "ppm" else "ppm")
        assert all(r["decode_error"] is not None for r in wrong.collect())

    corrupt = spark.createDataFrame(
        [(1, bytearray(b"P6\n8 4\n255\n\x00\x01")), (2, None), (3, bytearray(b"GIF89a"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_images(corrupt, codec="auto").collect()}
    assert "truncated PPM body" in rows[1]["decode_error"]
    assert rows[1]["luma_mean"] is None and rows[1]["n_bytes"] == 13
    assert "unrecognized" in rows[2]["decode_error"]
    # GIF magic now sniffs to the real decoder, which rejects the stump
    assert "truncated GIF" in rows[3]["decode_error"]


def test_real_codec_never_shuffles_payload(spark):
    """The real-codec path keeps the stub path's plan contract: payload
    bytes are consumed in their scan partitions, zero exchanges."""
    from tests.test_plans import count_shuffles

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    payloads = attach_synthetic_image(docs)
    assert count_shuffles(decode_images(payloads, codec="ppm")) == 0


def test_codec_fuzz_never_crashes():
    """Property: arbitrary bytes fed to either parser raise ValueError (or
    parse cleanly) — never IndexError/struct.error/segfault-shaped
    failures; arbitrary images round-trip bit-exactly through both
    containers. At 100 TB the decode stage WILL see garbage."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=200))
    def fuzz_parsers(data):
        for parse in (_parse_ppm, _parse_bmp):
            try:
                parse(data)
            except ValueError:
                pass

    fuzz_parsers()

    # corrupt a VALID payload at one position — same property holds
    base_ppm = encode_ppm(_pixels(7, 3, 4))
    base_bmp = encode_bmp(_pixels(8, 3, 4))

    @settings(max_examples=200, deadline=None)
    @given(st.integers(0, len(base_ppm) - 1), st.integers(0, 255))
    def fuzz_ppm_flip(pos, val):
        data = bytearray(base_ppm)
        data[pos] = val
        try:
            _parse_ppm(bytes(data))
        except ValueError:
            pass

    fuzz_ppm_flip()

    @settings(max_examples=200, deadline=None)
    @given(st.integers(0, len(base_bmp) - 1), st.integers(0, 255))
    def fuzz_bmp_flip(pos, val):
        data = bytearray(base_bmp)
        data[pos] = val
        try:
            _parse_bmp(bytes(data))
        except ValueError:
            pass

    fuzz_bmp_flip()

    @settings(max_examples=50, deadline=None)
    @given(
        st.integers(1, 6), st.integers(1, 6),
        st.integers(0, 2**32 - 1),
    )
    def roundtrip(h, w, seed):
        arr = _pixels(seed, h, w)
        assert np.array_equal(_parse_ppm(encode_ppm(arr)), arr)
        assert np.array_equal(_parse_bmp(encode_bmp(arr)), arr)

    roundtrip()


def test_image_ahash_semantics(spark):
    """aHash invariants: identical images hash identically; a RESIZED
    copy (same pattern at 2x resolution) keeps the same hash (the
    block map is scale-invariant); flipping a few pixels moves only a
    few bits; corrupt payloads yield NULL hash + decode_error."""
    import numpy as np

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        encode_ppm,
        image_ahash,
    )

    # a structured image (smooth gradient, like a real photo): blocks
    # sit far from the global mean, so the hash is stable under small
    # edits — random noise would be aHash's worst case (every block at
    # the boundary), which is a property of aHash, not of this code
    gx, gy = np.meshgrid(np.arange(16), np.arange(16))
    base = np.stack([gx * 12, gy * 12, (gx + gy) * 6], axis=2).astype(np.uint8)
    # 2x nearest-neighbor upscale: every block's mean luma is unchanged
    big = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    tweaked = base.copy()
    tweaked[0:2, 0:2] = 255 - tweaked[0:2, 0:2]  # invert ONE 2x2 block
    rows = [
        (1, bytearray(encode_ppm(base))),
        (2, bytearray(encode_ppm(base))),       # identical copy
        (3, bytearray(encode_ppm(big))),        # 2x resize
        (4, bytearray(encode_ppm(tweaked))),    # near copy
        (5, bytearray(b"NOTANIMAGE")),          # corrupt
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in image_ahash(df, codec="auto").collect()}
    assert got[1].ahash == got[2].ahash
    assert got[1].ahash == got[3].ahash, "resize must preserve the hash"
    near = bin((got[1].ahash ^ got[4].ahash) & ((1 << 64) - 1)).count("1")
    assert 0 < near <= 3, f"one-block edit moved {near} bits"
    assert got[5].ahash is None and got[5].decode_error is not None
    assert got[1].width == 16 and got[3].width == 32

    import pytest as _pytest

    with _pytest.raises(ValueError, match="grid"):
        image_ahash(df, grid=9)


def test_image_neardup_pairs_banding_recall(spark):
    """Pigeonhole guarantee: every pair within hamming < bands is found
    through the band join; far images are not paired; undecodable
    payloads drop out instead of pairing at distance 0 with each other."""
    import numpy as np

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        encode_ppm,
        image_neardup_pairs,
    )

    gx, gy = np.meshgrid(np.arange(16), np.arange(16))
    base = np.stack([gx * 12, gy * 12, (gx + gy) * 6], axis=2).astype(np.uint8)
    far = 255 - base  # inverted gradient: every block flips side
    tweaked = base.copy()
    tweaked[2:4, 2:4] = 255 - tweaked[2:4, 2:4]  # invert one block
    rows = [
        (1, bytearray(encode_ppm(base))),
        (2, bytearray(encode_ppm(base))),
        (3, bytearray(encode_ppm(tweaked))),
        (4, bytearray(encode_ppm(far))),
        (5, bytearray(b"garbage")),
        (6, bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {
        (r.id1, r.id2): r.hamming
        for r in image_neardup_pairs(df, max_distance=3, bands=4).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and 0 < pairs[(1, 3)] <= 3
    assert not any(4 in p or 5 in p or 6 in p for p in pairs)


def test_image_neardup_incremental_and_sink(spark, tmp_path):
    """Image vet-the-increment semantics: re-ingested images flag
    dup_of_state, within-batch copies flag dup_in_batch (earliest id
    keeps), undecodable payloads keep with no match; the vetting sink
    replays the same verdicts through real Structured Streaming,
    INCLUDING a bootstrap report (within-batch dups matter on batch 0)."""
    import numpy as np
    from pyspark.sql import functions as F

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        encode_ppm,
        image_ahash_state,
        image_neardup_incremental,
    )
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        image_dedup_vetting_sink,
    )

    gx, gy = np.meshgrid(np.arange(16), np.arange(16))

    def img(a, b, invert=False):
        px = np.stack(
            [gx * a % 256, gy * b % 256, (gx + gy) * 5], axis=2
        ).astype(np.uint8)
        # gradients with positive slopes all aHash alike (same half-plane
        # bit pattern) — "brand new" images must INVERT the gradient
        return bytearray(encode_ppm(255 - px if invert else px))

    prior = spark.createDataFrame(
        [(1, img(11, 3)), (2, img(5, 13))], "doc_id long, payload binary"
    )
    batch = spark.createDataFrame(
        [
            (10, img(11, 3)),   # re-upload of state image 1
            (11, img(2, 9, invert=True)),    # brand new (inverted)
            (12, img(2, 9, invert=True)),    # within-batch copy of 11
            (13, bytearray(b"corrupt")),
        ],
        "doc_id long, payload binary",
    )
    state = image_ahash_state(prior)
    out = {
        r.doc_id: r for r in image_neardup_incremental(batch, state).collect()
    }
    assert out[10].dup_of_state and not out[10].keep
    assert out[11].keep and not out[11].dup_in_batch
    assert out[12].dup_in_batch and not out[12].keep
    assert out[13].keep and not out[13].dup_of_state  # undecodable: kept

    # sink: two files -> bootstrap batch reports within-batch dups, the
    # second batch vets against the first's signatures
    ingest = tmp_path / "img_ingest"
    b1 = spark.createDataFrame(
        [(1, img(11, 3)), (2, img(11, 3))], "doc_id long, payload binary"
    )
    b2 = spark.createDataFrame(
        [(3, img(11, 3)), (4, img(7, 7, invert=True))], "doc_id long, payload binary"
    )
    b1.coalesce(1).write.parquet(str(ingest), mode="append")
    b2.coalesce(1).write.parquet(str(ingest), mode="append")
    state_p = str(tmp_path / "img_state")
    report_p = str(tmp_path / "img_report")
    q = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ingest))
        .writeStream.foreachBatch(
            image_dedup_vetting_sink(state_p, report_p)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    report = {r.doc_id: r for r in spark.read.parquet(report_p).collect()}
    assert len(report) == 4  # bootstrap batch reported too
    # whichever file ran first, the copy pair {1,2} resolves within one
    # batch (min id keeps) and image 3 dups whatever state held image 1
    assert report[1].keep and report[2].dup_in_batch and not report[2].keep
    assert report[3].dup_of_state and not report[3].keep
    assert report[4].keep
    # streamed state is one 8-byte row per decodable image
    assert spark.read.parquet(state_p).count() == 4


def test_wav_roundtrip_and_parser_grammar():
    """encode_wav -> _parse_wav round-trips samples and rate; the chunk
    walk skips unknown chunks (word-aligned); stereo / 8-bit / float /
    truncated payloads are rejected loudly, never misread."""
    import struct

    import numpy as np
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        _parse_wav,
        encode_wav,
    )

    s = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int16)
    rate, got = _parse_wav(encode_wav(s, 8000))
    assert rate == 8000 and np.array_equal(got, s)

    # unknown chunk (odd size -> word-aligned skip) before data
    payload = encode_wav(s, 8000)
    hdr, body = payload[:36], payload[36:]
    junk = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # pad byte
    spliced = payload[:12] + junk + payload[12:]
    rate2, got2 = _parse_wav(spliced)
    assert rate2 == 8000 and np.array_equal(got2, s)

    with _pytest.raises(ValueError, match="RIFF"):
        _parse_wav(b"nope" * 20)
    adpcm = bytearray(encode_wav(s, 8000))
    adpcm[20] = 2  # format tag field -> MS ADPCM
    with _pytest.raises(ValueError, match="format tag 2"):
        _parse_wav(bytes(adpcm))
    wide = bytearray(encode_wav(s, 8000))
    wide[34] = 24  # bit-depth field
    with _pytest.raises(ValueError, match="bit depth 24"):
        _parse_wav(bytes(wide))
    with _pytest.raises(ValueError, match="truncated"):
        _parse_wav(encode_wav(s, 8000)[:-4])


def test_wav_format_variants_decode():
    """The four real-corpus WAV flavors beyond mono PCM16: stereo
    downmixes by exact floor-mean, 8-bit PCM is unsigned offset-128,
    float32 scales/rounds to the int16 domain, and G.711 u-law/A-law
    bytes expand through the ITU tables (spot-checked against known
    codec values)."""
    import numpy as np
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        _g711_luts,
        _parse_wav,
        encode_wav,
    )

    # stereo: interleaved L/R -> floor((l+r)/2), exact for negatives too
    inter = np.array([100, 200, -5, -6, 32767, 32767, -1, 2], dtype=np.int16)
    rate, got = _parse_wav(encode_wav(inter, 8000, channels=2))
    assert np.array_equal(got, np.array([150, -6, 32767, 0], dtype=np.int16))

    # 8-bit PCM: unsigned, offset 128, scaled <<8
    b8 = np.array([0, 128, 255, 129], dtype=np.uint8)
    _, got8 = _parse_wav(encode_wav(b8, 8000, fmt="pcm8"))
    assert np.array_equal(
        got8, np.array([-32768, 0, 32512, 256], dtype=np.int16)
    )

    # float32: clip to [-1, 1], scale x32767, round
    f = np.array([0.0, 1.0, -1.0, 0.5, 2.0, -3.0], dtype=np.float32)
    _, gotf = _parse_wav(encode_wav(f, 8000, fmt="float32"))
    assert np.array_equal(
        gotf,
        np.array([0, 32767, -32767, 16384, 32767, -32767], dtype=np.int16),
    )

    # G.711: spot-check the canonical table values
    ulaw, alaw = _g711_luts()
    assert ulaw[0xFF] == 0 and ulaw[0x7F] == -0  # +0 / -0 both decode 0
    assert ulaw[0x80] == 32124 and ulaw[0x00] == -32124  # full scale
    assert alaw[0xD5] == 8 and alaw[0x55] == -8  # smallest magnitudes
    assert alaw[0xAA] == 32256 and alaw[0x2A] == -32256  # full scale
    comp = np.array([0xFF, 0x80, 0x00, 0x42], dtype=np.uint8)
    _, gotu = _parse_wav(encode_wav(comp, 8000, fmt="ulaw"))
    assert np.array_equal(gotu, ulaw[comp].astype(np.int16))
    _, gota = _parse_wav(encode_wav(comp, 8000, fmt="alaw"))
    assert np.array_equal(gota, alaw[comp].astype(np.int16))

    with _pytest.raises(ValueError, match="fmt must be"):
        encode_wav(b8, 8000, fmt="mp3")
    with _pytest.raises(ValueError, match="divide"):
        encode_wav(inter[:3], 8000, channels=2)


def test_decode_audio_stats_hand_checked(spark):
    """Waveform panel values against hand math: rms from the exact
    int64 sum of squares, zero-cross over consecutive nonzero signs,
    clip ratio at full-scale samples; corrupt rows surface."""
    import math

    import numpy as np

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
    )

    s1 = np.array([0, 100, -100, 100], dtype=np.int16)
    s2 = np.array([32767, -32768, 32767, 1], dtype=np.int16)
    rows = [
        (1, bytearray(encode_wav(s1, 16000))),
        (2, bytearray(encode_wav(s2, 8000))),
        (3, bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_audio(df).collect()}
    r1 = got[1]
    assert r1.sample_rate == 16000 and r1.n_samples == 4
    assert math.isclose(r1.rms, math.sqrt((100**2 * 3) / 4))
    assert r1.peak == 100
    # signs: 0,+,-,+ -> crossings at (+,-) and (-,+); zero-pairs don't count
    assert math.isclose(r1.zero_cross_rate, 2 / 3)
    assert r1.clip_ratio == 0.0
    r2 = got[2]
    assert r2.peak == 32768 and math.isclose(r2.clip_ratio, 3 / 4)
    assert math.isclose(r2.duration_ms, 4000 / 8000)
    assert got[3].rms is None and got[3].decode_error is not None


def test_audio_ahash_and_neardup(spark):
    """Energy-fingerprint invariants: identical recordings hash equal; a
    2x-resampled copy (every sample doubled) keeps the hash (density
    cross-multiply); a re-leveled copy (half volume) keeps the hash
    (energy RATIOS unchanged); silence is excluded from pairing."""
    import numpy as np

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        audio_ahash,
        audio_neardup_pairs,
        encode_wav,
    )

    t = np.arange(256)
    # a bursty envelope: loud first quarter, quiet rest
    base = (np.where(t < 64, 8000, 500) * np.sin(t / 3.0)).astype(np.int16)
    resampled = np.repeat(base, 2)         # 2x duration, same envelope
    releveled = (base // 2).astype(np.int16)  # -6 dB, same envelope
    silence = np.zeros(256, dtype=np.int16)
    rows = [
        (1, bytearray(encode_wav(base))),
        (2, bytearray(encode_wav(base))),
        (3, bytearray(encode_wav(resampled))),
        (4, bytearray(encode_wav(releveled))),
        (5, bytearray(encode_wav(silence))),
        (6, bytearray(encode_wav(silence))),
        (7, bytearray(b"corrupt")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in audio_ahash(df).collect()}
    assert got[1].ahash == got[2].ahash != 0
    assert got[1].ahash == got[3].ahash, "resample must keep the envelope"
    assert got[1].ahash == got[4].ahash, "re-leveling must keep the hash"
    assert got[5].ahash == 0  # silence: no segment above mean energy
    assert got[7].ahash is None and got[7].decode_error is not None

    pairs = {
        (r.id1, r.id2): r.hamming
        for r in audio_neardup_pairs(df, max_distance=3).collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0 and pairs[(1, 4)] == 0
    # silence pair excluded (flat-signature guard), corrupt rows drop out
    assert (5, 6) not in pairs
    assert not any(7 in p for p in pairs)


def test_y4m_roundtrip_and_video_features(spark):
    """encode_y4m -> _parse_y4m round-trips luma planes and fps; the
    decode panel's scene-cut count is exact on a hand-built clip (two
    hard cuts), motion separates static from changing footage; exotic
    colorspaces and truncated frames are rejected loudly."""
    import math

    import numpy as np
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        _parse_y4m,
        decode_video,
        encode_y4m,
    )

    static = np.full((4, 8, 16), 60, dtype=np.uint8)
    w, h, fps, frames = _parse_y4m(encode_y4m(static, 30, 1))
    assert (w, h, fps) == (16, 8, 30.0) and len(frames) == 4
    assert all(np.array_equal(f, static[0].ravel()) for f in frames)

    # dark, dark, BRIGHT, BRIGHT, dark -> cuts at 1->2 and 3->4
    clip = np.stack([
        np.full((8, 16), 40, dtype=np.uint8),
        np.full((8, 16), 42, dtype=np.uint8),
        np.full((8, 16), 200, dtype=np.uint8),
        np.full((8, 16), 202, dtype=np.uint8),
        np.full((8, 16), 41, dtype=np.uint8),
    ])
    rows = [
        (1, bytearray(encode_y4m(clip, 25, 1))),
        (2, bytearray(encode_y4m(static, 30, 1))),
        (3, bytearray(b"RIFFnope")),
        (4, bytearray(encode_y4m(clip, 25, 1)[:-10])),  # truncated frame
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_video(df, cut_threshold=8).collect()}
    assert got[1].scene_cuts == 2 and got[1].n_frames == 5
    assert math.isclose(got[1].duration_ms, 5000 / 25)
    assert got[2].scene_cuts == 0 and got[2].motion == 0.0
    assert got[1].motion > got[2].motion
    assert math.isclose(got[2].luma_mean, 60.0)
    assert got[3].decode_error is not None and got[3].n_frames is None
    assert "truncated frame" in got[4].decode_error

    with _pytest.raises(ValueError, match="colorspace"):
        _parse_y4m(
            encode_y4m(static).replace(b"C420", b"C444")
        )
    with _pytest.raises(ValueError, match="even dims"):
        encode_y4m(np.zeros((1, 3, 5), dtype=np.uint8))


def test_multimodal_state_and_vetting_sink(spark, tmp_path):
    """Intake increment semantics: a misconfigured batch (resized
    images, corrupt payloads) flags against the rolled state; additive
    appends == one-shot; the mixed-stream vetting sink replays the
    verdicts through real Structured Streaming with a silent bootstrap."""
    import math

    from pyspark.sql import functions as F

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        attach_synthetic_audio,
        attach_synthetic_image,
        attach_synthetic_video,
        multimodal_report_incremental,
        multimodal_state,
    )
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        multimodal_vetting_sink,
    )

    ids = spark.range(0, 30).selectExpr("id AS doc_id")
    mk = lambda src, w: attach_synthetic_image(src, width=w, height=4)
    # >=1024 samples: the modular sample ramp wraps ~3x, so per-doc rms is
    # stable across id ranges (at 64 samples it is a position-dependent
    # ramp segment and any two id ranges "drift" spuriously)
    au = lambda src, n: attach_synthetic_audio(src, n_samples=n)
    vi = lambda src, ce: attach_synthetic_video(
        src, width=8, height=4, n_frames=4, cut_every=ce
    )
    state = multimodal_state(mk(ids, 8), au(ids, 1024), vi(ids, 2))
    batch_ids = spark.range(100, 112).selectExpr("id AS doc_id")

    # same configs -> quiet everywhere
    quiet = multimodal_report_incremental(
        mk(batch_ids, 8), au(batch_ids, 1024), vi(batch_ids, 2), state
    ).collect()
    assert all(not r.drift_detected for r in quiet)

    # resized images + corrupt audio payloads -> image and audio flag
    bad_audio = au(batch_ids, 1024).withColumn(
        "payload",
        F.when(F.col("doc_id") % 2 == 0, F.lit(b"junk")).otherwise(
            F.col("payload")
        ),
    )
    loud = {
        r.modality: r
        for r in multimodal_report_incremental(
            mk(batch_ids, 12), bad_audio, vi(batch_ids, 2), state
        ).collect()
    }
    assert loud["image"].drift_detected and loud["image"].s2_rel_diff == 0.5
    assert loud["audio"].drift_detected
    assert math.isclose(loud["audio"].curr_error_rate, 0.5)
    assert not loud["video"].drift_detected

    # additive appends == one-shot
    h1, h2 = ids.filter("doc_id < 15"), ids.filter("doc_id >= 15")
    for h in (h1, h2):
        multimodal_state(mk(h, 8), au(h, 1024), vi(h, 2)).write.mode(
            "append"
        ).parquet(str(tmp_path / "mm_state"))
    appended = spark.read.parquet(str(tmp_path / "mm_state"))
    a = {r.modality: r for r in multimodal_report_incremental(
        mk(batch_ids, 12), bad_audio, vi(batch_ids, 2), appended
    ).collect()}
    for m, r in loud.items():
        assert a[m].drift_detected == r.drift_detected
        assert math.isclose(a[m].ref_s1_mean, r.ref_s1_mean, rel_tol=1e-9)

    # mixed-stream sink: modality column routes payloads
    mixed1 = (
        mk(ids, 8).withColumn("modality", F.lit("image"))
        .unionByName(au(ids, 1024).withColumn("modality", F.lit("audio")))
        .unionByName(vi(ids, 2).withColumn("modality", F.lit("video")))
    )
    mixed2 = (
        mk(batch_ids, 12).withColumn("modality", F.lit("image"))
        .unionByName(
            au(batch_ids, 1024).withColumn("modality", F.lit("audio")))
        .unionByName(
            vi(batch_ids, 2).withColumn("modality", F.lit("video")))
    )
    ingest = tmp_path / "mm_ingest"
    mixed1.coalesce(1).write.parquet(str(ingest), mode="append")
    mixed2.coalesce(1).write.parquet(str(ingest), mode="append")
    state_p, report_p = str(tmp_path / "mm_s2"), str(tmp_path / "mm_rep")
    q = (
        spark.readStream.schema(mixed1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ingest))
        .writeStream.foreachBatch(
            multimodal_vetting_sink(state_p, report_p)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    report = spark.read.parquet(report_p)
    assert report.select("batch_id").distinct().count() == 1
    # whichever file was batch 0, the vetted batch has 3 modality rows
    assert report.count() == 3
    # streamed state rolls to 42 payloads per modality (30 + 12)
    merged = (
        spark.read.parquet(state_p).groupBy("modality")
        .agg(F.expr("CAST(sum(n) AS BIGINT) AS n"))
    )
    assert {r.modality: r.n for r in merged.collect()} == {
        "image": 42, "audio": 42, "video": 42,
    }


def test_hamming_band_pairs_hot_bucket_guard(spark):
    """max_bucket_size drops degenerate hot bands (bounded-recall
    contract): 12 identical signatures in one bucket emit 66 pairs
    unguarded and ZERO pairs with max_bucket_size below the bucket;
    signatures in small buckets are unaffected."""
    from pyspark_data_drift_detector_spark.operators.dedup import (
        hamming_band_pairs,
    )

    rows = [(i, 0x0F0F0F0F) for i in range(12)]  # one hot signature
    rows += [(100, 0x7000000000000001), (101, 0x7000000000000003)]
    sig = spark.createDataFrame(rows, "id long, h long")
    free = hamming_band_pairs(sig, "h", "id", max_distance=3, bands=4)
    assert free.count() == 66 + 1  # C(12,2) hot pairs + the small pair
    capped = hamming_band_pairs(
        sig, "h", "id", max_distance=3, bands=4, max_bucket_size=4
    )
    got = [(r.id1, r.id2) for r in capped.collect()]
    assert got == [(100, 101)], got


def test_multimodal_incremental_one_sided_modality_flags(spark):
    """A modality that vanishes from the batch (or appears with no
    state) must flag: one-sided rows are drift, not silence."""
    from pyspark_data_drift_detector_spark.operators.multimodal import (
        attach_synthetic_audio,
        attach_synthetic_image,
        attach_synthetic_video,
        multimodal_report_incremental,
        multimodal_state,
    )

    ids = spark.range(0, 12).selectExpr("id AS doc_id")
    batch = spark.range(100, 106).selectExpr("id AS doc_id")
    empty = ids.filter("doc_id < 0")
    mk = lambda s: attach_synthetic_image(s, width=8, height=4)
    au = lambda s: attach_synthetic_audio(s, n_samples=1024)
    vi = lambda s: attach_synthetic_video(
        s, width=8, height=4, n_frames=4, cut_every=2
    )
    state = multimodal_state(mk(ids), au(ids), vi(ids))
    out = {
        r.modality: r
        for r in multimodal_report_incremental(
            mk(batch), au(batch), vi(empty), state
        ).collect()
    }
    # video vanished from the batch: curr_n = 0, stats NULL, flagged
    assert out["video"].curr_n == 0 and out["video"].drift_detected
    assert out["video"].curr_s1_mean is None
    assert not out["image"].drift_detected


def test_video_ahash_and_neardup(spark):
    """Temporal-fingerprint invariants: identical clips hash equal; a
    re-graded copy (constant luma shift) keeps the hash EXACTLY (frame
    deltas unchanged); a 2x spatially-upscaled copy keeps the hash
    (delta densities cross-multiply); static and single-frame clips
    hash 0 and are excluded from pairing; corrupt payloads yield NULL."""
    import numpy as np

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        encode_y4m,
        video_ahash,
        video_neardup_pairs,
    )

    # bursty activity envelope: calm first half, hard cuts in the second
    vals = [40, 41, 40, 42, 41, 40, 42, 41, 200, 40, 210, 35, 190, 45,
            220, 30, 40]
    def clip(luma_vals, shift=0, scale=1):
        return np.stack([
            np.full((8 * scale, 16 * scale), v + shift, dtype=np.uint8)
            for v in luma_vals
        ])

    base = clip(vals)
    rows = [
        (1, bytearray(encode_y4m(base))),
        (2, bytearray(encode_y4m(base))),                 # exact copy
        (3, bytearray(encode_y4m(clip(vals, shift=20)))),  # re-graded
        (4, bytearray(encode_y4m(clip(vals, scale=2)))),   # upscaled 2x
        (5, bytearray(encode_y4m(clip([60] * 8)))),        # static
        (6, bytearray(encode_y4m(clip([60] * 8)))),        # static copy
        (7, bytearray(encode_y4m(clip([60])))),            # single frame
        (8, bytearray(b"corrupt")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in video_ahash(df).collect()}
    assert got[1].ahash == got[2].ahash != 0
    assert got[1].ahash == got[3].ahash, "re-grade must keep deltas"
    assert got[1].ahash == got[4].ahash, "upscale must keep densities"
    assert got[5].ahash == 0 and got[7].ahash == 0
    assert got[8].ahash is None and got[8].decode_error is not None
    assert got[1].n_frames == 17 and got[7].n_frames == 1

    pairs = {
        (r.id1, r.id2): r.hamming
        for r in video_neardup_pairs(df, max_distance=3).collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0 and pairs[(1, 4)] == 0
    # static pair excluded (flat-signature guard), corrupt rows drop out
    assert (5, 6) not in pairs
    assert not any(8 in p for p in pairs)


def test_video_neardup_incremental_and_sink(spark, tmp_path):
    """Video vet-the-increment semantics: re-ingested clips flag
    dup_of_state, within-batch copies flag dup_in_batch (earliest id
    keeps), static and undecodable clips keep with no match; the
    vetting sink replays the same verdicts through real Structured
    Streaming, including a bootstrap report."""
    import numpy as np

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        encode_y4m,
        video_ahash_state,
        video_neardup_incremental,
    )
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        video_dedup_vetting_sink,
    )

    def clip(luma_vals):
        return bytearray(encode_y4m(np.stack([
            np.full((8, 16), v, dtype=np.uint8) for v in luma_vals
        ])))

    a = [40, 41, 40, 42, 41, 40, 42, 41, 200, 40, 210, 35, 190, 45, 220,
         30, 40]
    b = list(reversed(a))  # activity at the START: a different envelope
    prior = spark.createDataFrame(
        [(1, clip(a))], "doc_id long, payload binary"
    )
    batch = spark.createDataFrame(
        [
            (10, clip(a)),            # re-upload of state clip 1
            (11, clip(b)),            # brand new envelope
            (12, clip(b)),            # within-batch copy of 11
            (13, clip([60] * 8)),     # static: flat guard, keeps
            (14, bytearray(b"nope")),  # undecodable: keeps
        ],
        "doc_id long, payload binary",
    )
    state = video_ahash_state(prior)
    out = {
        r.doc_id: r for r in video_neardup_incremental(batch, state).collect()
    }
    assert out[10].dup_of_state and not out[10].keep
    assert out[11].keep and not out[11].dup_in_batch
    assert out[12].dup_in_batch and not out[12].keep
    assert out[13].keep and out[14].keep

    # sink: bootstrap batch reports within-batch dups, the second batch
    # vets against the first's fingerprints
    ingest = tmp_path / "vid_ingest"
    b1 = spark.createDataFrame(
        [(1, clip(a)), (2, clip(a))], "doc_id long, payload binary"
    )
    b2 = spark.createDataFrame(
        [(3, clip(a)), (4, clip(b))], "doc_id long, payload binary"
    )
    b1.coalesce(1).write.parquet(str(ingest), mode="append")
    b2.coalesce(1).write.parquet(str(ingest), mode="append")
    state_p = str(tmp_path / "vid_state")
    report_p = str(tmp_path / "vid_report")
    q = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ingest))
        .writeStream.foreachBatch(
            video_dedup_vetting_sink(state_p, report_p)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    report = {r.doc_id: r for r in spark.read.parquet(report_p).collect()}
    assert len(report) == 4
    assert report[1].keep and report[2].dup_in_batch and not report[2].keep
    assert report[3].dup_of_state and not report[3].keep
    assert report[4].keep
    assert spark.read.parquet(state_p).count() == 4


def test_audio_dedup_vetting_sink_batch_parity(spark, tmp_path):
    """audio_dedup_vetting_sink through real Structured Streaming — the
    sink symmetry twin of test_image_neardup_incremental_and_sink:
    bootstrap reports within-batch dups, the second batch's verdicts
    equal the hand-run vet against the first batch's state."""
    import numpy as np

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        audio_ahash_state,
        audio_neardup_incremental,
        encode_wav,
    )
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        audio_dedup_vetting_sink,
    )

    t = np.arange(256)
    loud_start = (np.where(t < 64, 8000, 500) * np.sin(t / 3.0)).astype(
        np.int16
    )
    loud_end = loud_start[::-1].copy()
    wav = lambda s: bytearray(encode_wav(s))
    b1 = spark.createDataFrame(
        [(1, wav(loud_start)), (2, wav(loud_start))],
        "doc_id long, payload binary",
    )
    b2 = spark.createDataFrame(
        [(3, wav(loud_start)), (4, wav(loud_end))],
        "doc_id long, payload binary",
    )
    ingest = tmp_path / "wav_ingest"
    b1.coalesce(1).write.parquet(str(ingest), mode="append")
    b2.coalesce(1).write.parquet(str(ingest), mode="append")
    state_p = str(tmp_path / "wav_state")
    report_p = str(tmp_path / "wav_report")
    q = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ingest))
        .writeStream.foreachBatch(
            audio_dedup_vetting_sink(state_p, report_p)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    report = {r.doc_id: r for r in spark.read.parquet(report_p).collect()}
    assert len(report) == 4
    assert report[1].keep and report[2].dup_in_batch and not report[2].keep
    assert report[3].dup_of_state and not report[3].keep
    assert report[4].keep
    # streamed verdicts == hand-run batch vet against the same state
    hand = {
        r.doc_id: r
        for r in audio_neardup_incremental(b2, audio_ahash_state(b1)).collect()
    }
    for i in (3, 4):
        assert (report[i].dup_of_state, report[i].dup_in_batch,
                report[i].keep) == (
            hand[i].dup_of_state, hand[i].dup_in_batch, hand[i].keep
        )


def test_ahash_exact_above_2_53_with_error_rows(spark):
    """Regression: a batch mixing decode errors (NULL hash) with real
    fingerprints must NOT round hashes through float64 — tuple-list
    pandas construction infers float64 for int+None columns and silently
    rounds values above 2^53 (caught as a 2-ulp hash shift that broke
    engine-portable dedup in batches containing any corrupt payload).
    The hash of every decodable payload must be identical whether or not
    a corrupt row shares its batch."""
    from pyspark_data_drift_detector_spark.operators.multimodal import (
        attach_synthetic_audio,
        attach_synthetic_image,
        attach_synthetic_video,
        audio_ahash,
        image_ahash,
        video_ahash,
    )

    ids = spark.range(0, 40).selectExpr("id AS doc_id")
    fixtures = [
        (image_ahash, attach_synthetic_image(ids, width=8, height=4)),
        (audio_ahash, attach_synthetic_audio(ids, n_samples=256)),
        (video_ahash, attach_synthetic_video(
            ids, width=16, height=8, n_frames=8, cut_every=4)),
    ]
    from pyspark.sql import functions as F

    for hash_fn, payloads in fixtures:
        payloads = payloads.coalesce(1)  # one Arrow batch: errors share it
        clean = {r.doc_id: r.ahash for r in hash_fn(payloads).collect()}
        poisoned = payloads.withColumn(
            "payload",
            F.when(F.col("doc_id") % 10 == 3, F.lit(b"junk")).otherwise(
                F.col("payload")
            ),
        )
        mixed = {r.doc_id: r.ahash for r in hash_fn(poisoned).collect()}
        assert any(
            h is not None and abs(h) > (1 << 53) for h in clean.values()
        ), "fixture must exercise hashes above float64's exact range"
        for d, h in clean.items():
            if d % 10 == 3:
                assert mixed[d] is None
            else:
                assert mixed[d] == h, (
                    f"{hash_fn.__name__}: doc {d} hash changed when a"
                    f" corrupt row joined the batch: {h} -> {mixed[d]}"
                )


def test_avi_mjpeg_container_and_cross_container_neardup(spark):
    """Motion-JPEG AVI: the RIFF walk parses dims/fps/frames, the panel
    matches the y4m panel of the same clip (cuts identical, luma within
    JPEG tolerance), a y4m master and its MJPEG re-encode collide as
    video near-duplicates (the compressed re-upload case), and exotic
    codecs/truncations reject loudly."""
    import numpy as np
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        _parse_avi_mjpeg,
        decode_video,
        encode_avi_mjpeg,
        encode_y4m,
        video_neardup_pairs,
    )

    vals = [40, 41, 40, 42, 41, 40, 42, 41, 200, 40, 210, 35, 190, 45,
            220, 30, 40]
    luma = np.stack([np.full((16, 16), v, dtype=np.uint8) for v in vals])
    rgb = np.repeat(luma[:, :, :, None], 3, axis=3)
    avi = encode_avi_mjpeg(rgb, fps=25, quality=95)
    w, h, fps, jpegs = _parse_avi_mjpeg(avi)
    assert (w, h, fps, len(jpegs)) == (16, 16, 25.0, 17)

    rows = [
        (1, bytearray(encode_y4m(luma, 25))),
        (2, bytearray(avi)),
        (3, bytearray(avi.replace(b"MJPG", b"H264"))),
        (4, bytearray(avi[:80])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_video(df, cut_threshold=8).collect()}
    assert got[2].n_frames == 17 and got[2].fps == 25.0
    assert got[2].scene_cuts == got[1].scene_cuts > 0
    assert abs(got[2].luma_mean - got[1].luma_mean) < 1.0
    assert "H264" in got[3].decode_error
    assert got[4].decode_error is not None

    pairs = {
        (r.id1, r.id2): r.hamming
        for r in video_neardup_pairs(df, max_distance=3).collect()
    }
    assert pairs.get((1, 2)) is not None and pairs[(1, 2)] <= 3
    assert not any(3 in p or 4 in p for p in pairs)

    with _pytest.raises(ValueError, match="expected"):
        encode_avi_mjpeg(luma)  # needs RGB
    # a header-only AVI (hdrl intact, movi removed) has no frames
    movi_at = avi.find(b"LIST", 12 + 4)
    while avi[movi_at + 8 : movi_at + 12] != b"movi":
        movi_at = avi.find(b"LIST", movi_at + 4)
    import struct as _struct
    headless = avi[:movi_at]
    headless = (b"RIFF" + _struct.pack("<I", len(headless) - 8 + 4)
                + b"AVI " + headless[12:])
    with _pytest.raises(ValueError, match="no video frames"):
        _parse_avi_mjpeg(headless)
