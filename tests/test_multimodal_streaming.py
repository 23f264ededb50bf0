"""Multimodal plumbing + streaming-PSI tests (batch/stream parity)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (0, bytes([0xFF, 0xD8, 0xFF]) + b"fakejpegbody" * 50),
        (1, b"\x89PNG\r\n" + b"fakepngbody" * 80),
        (2, b"RIFF....WAVE" + b"aud" * 40),
        (3, b"garbage-without-magic"),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


class TestMultimodal:
    def test_codec_sniff_and_meta(self, media_df):
        from shifu_spark.operators.multimodal import attach_media_meta

        out = attach_media_meta(media_df).select("doc_id", "media_meta.codec", "media_meta.n_bytes").collect()
        by = {r["doc_id"]: r for r in out}
        assert by[0]["codec"] == "jpeg"
        assert by[1]["codec"] == "png"
        assert by[2]["codec"] == "wav"
        assert by[3]["codec"] == "unknown"
        assert by[0]["n_bytes"] == 3 + 12 * 50

    def test_feature_extract_deterministic(self, media_df):
        from shifu_spark.operators.multimodal import extract_image_features

        a = {r["doc_id"]: r["feature"] for r in extract_image_features(media_df).collect()}
        b = {r["doc_id"]: r["feature"] for r in extract_image_features(media_df).collect()}
        assert a == b  # content-addressed, stable
        assert len(a[0]) == 8
        assert all(0.0 <= x <= 1.0 for x in a[0])
        assert a[0] != a[1]

    def test_strict_decode_raises(self, media_df):
        from shifu_spark.operators.multimodal import extract_image_features

        with pytest.raises(Exception) as ei:
            extract_image_features(media_df, decode="strict").collect()
        assert "NotImplementedError" in str(ei.value) or "decode" in str(ei.value)

    def test_repartition_by_payload(self, spark):
        from shifu_spark.operators.multimodal import repartition_by_payload

        big = spark.createDataFrame(
            [(i, b"x" * 100_000) for i in range(50)], "doc_id long, payload binary"
        )
        out = repartition_by_payload(big, target_partition_mb=1)
        assert out.rdd.getNumPartitions() >= 5

    def test_repartition_by_payload_sampled_estimate(self, spark):
        # the at-scale path: a seeded sample estimate lands within ~2x of
        # the exact partition count on a uniform corpus (the point is to
        # avoid the second full payload scan, not byte-exact sizing)
        from shifu_spark.operators.multimodal import repartition_by_payload

        big = spark.createDataFrame(
            [(i, b"x" * 10_000) for i in range(2000)], "doc_id long, payload binary"
        )
        exact = repartition_by_payload(big, target_partition_mb=1).rdd.getNumPartitions()
        est = repartition_by_payload(
            big, target_partition_mb=1, sample_fraction=0.1
        ).rdd.getNumPartitions()
        assert exact >= 20
        assert exact / 2 <= est <= exact * 2

    def test_byte_accounting_contract_large_skewed_payloads(self, spark):
        # Contract (decode stays stubbed — this pins the REAL plumbing):
        # (1) partition sizing follows cumulative payload BYTES, not row
        #     count, under heavy skew; (2) the Arrow stage's byte
        #     accounting (n_bytes, sha256) is exact per row end-to-end;
        # (3) every input row survives the repartition + mapInPandas hop.
        import hashlib

        from shifu_spark.operators.multimodal import (
            extract_image_features,
            repartition_by_payload,
        )

        rows = [(i, bytes([i % 251]) * (1_000_000 if i < 6 else 1_000)) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        # ~6.05 MB total -> >= 7 partitions at 1 MB target even though 90%
        # of ROWS are tiny; a row-count split would give far fewer
        parted = repartition_by_payload(df, target_partition_mb=1)
        assert parted.rdd.getNumPartitions() >= 6
        out = {r["doc_id"]: r for r in extract_image_features(parted).collect()}
        assert len(out) == 60  # no row lost across the hop
        for i, payload in rows:
            assert out[i]["n_bytes"] == len(payload)
            assert out[i]["sha256"] == hashlib.sha256(payload).hexdigest()
            assert len(out[i]["feature"]) == 8

    def test_strict_decode_raises_on_large_payloads_too(self, spark):
        # strict mode must raise for ANY payload — stubs never silently
        # count as decode coverage regardless of batch size
        import pytest as _pytest

        from shifu_spark.operators.multimodal import extract_image_features

        df = spark.createDataFrame(
            [(0, b"\xff\xd8\xff" + b"j" * 500_000)], "doc_id long, payload binary"
        )
        with _pytest.raises(Exception) as ei:
            extract_image_features(df, decode="strict").collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )

    def test_frame_sample_plan(self, spark):
        from shifu_spark.operators.multimodal import attach_media_meta, frame_sample_plan

        df = attach_media_meta(
            spark.createDataFrame([(0, b"v" * 10)], "doc_id long, payload binary"), media_type="video"
        )
        # duration falls back to n_bytes=10 -> offsets 0..10 step 5 = 3 frames
        frames = frame_sample_plan(df, every_ms=5).select("doc_id", "frame_ms").collect()
        assert [r["frame_ms"] for r in frames] == [0, 5, 10]


class TestStreamingPsi:
    def test_stream_matches_batch(self, spark, tmp_path):
        """Streaming windowed bin counts == batch groupBy on the same data,
        and PSI finalization agrees."""
        from shifu_spark.queries import _events
        from shifu_spark.streaming.drift import psi_of_batch, streaming_bin_counts

        ev = _events(spark, "/root/testdata/sf0.001").select("ts", "value", "event_id")
        src = str(tmp_path / "stream_src")
        ev.write.parquet(src)

        boundaries = [float("-inf"), 0.25, 0.5, 1.0, 2.0]
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            streaming_bin_counts(stream, "value", boundaries, window="1 day")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("psi_counts_test")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM psi_counts_test")

        # batch equivalent
        from shifu_spark.operators.binning import bin_index_expr

        batch = (
            ev.withColumn("bin", bin_index_expr("value", boundaries))
            .groupBy(F.window("ts", "1 day").alias("w"), "bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("window_start"), "bin", "cnt")
        )
        g = {(r["window_start"], r["bin"]): r["cnt"] for r in got.collect()}
        b = {(r["window_start"], r["bin"]): r["cnt"] for r in batch.collect()}
        # watermark in append mode holds back the tail window(s); everything
        # emitted must match batch exactly
        assert g, "no windows emitted"
        assert all(b.get(k) == v for k, v in g.items())

        expected = {0: 0.2, 1: 0.2, 2: 0.3, 3: 0.2, 4: 0.1}
        psi = psi_of_batch(got, expected).collect()
        assert all(r["psi"] is not None and r["psi"] >= 0.0 for r in psi)


class TestRealDecodeKernels:
    """WAV (stdlib wave) and PPM (pure numpy) are REAL decoders — these
    pin encode→decode identity and the resize kernel's box math."""

    def test_png_roundtrip_all_filters(self):
        # encode applies the filter forward from RAW bytes; decode
        # reconstructs left/up-dependently — exact identity across all
        # five spec filters proves both directions against RFC 2083 §6
        import numpy as np

        from shifu_spark.operators.multimodal import decode_png, encode_png

        rng = np.random.RandomState(3)
        for c in (3, 4):
            for ft in range(5):
                img = rng.randint(0, 256, (13, 9, c), dtype=np.uint8)
                rt = decode_png(encode_png(img, filter_type=ft))
                assert rt.shape == img.shape
                assert (rt == img).all(), f"channels={c} filter={ft}"

    def test_png_crc_corruption_detected(self):
        import numpy as np

        from shifu_spark.operators.multimodal import decode_png, encode_png

        p = bytearray(encode_png(np.zeros((4, 4, 3), dtype=np.uint8), filter_type=2))
        p[40] ^= 0xFF
        with pytest.raises(ValueError, match="CRC|not a PNG"):
            decode_png(bytes(p))

    def test_png_rejects_unsupported_profiles(self):
        import zlib

        import numpy as np

        from shifu_spark.operators.multimodal import PNG_SIG, _png_chunk, decode_png

        # interlaced IHDR must raise, not silently misdecode
        ihdr = (4).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([8, 2, 0, 0, 1])
        payload = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(
            b"IDAT", zlib.compress(b"\x00" * 52)
        ) + _png_chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError):
            decode_png(payload)

    def test_jpeg_zigzag_and_markers_spec_compliant(self):
        import numpy as np

        from shifu_spark.operators.multimodal import _JPEG_ZIGZAG, encode_jpeg

        # derived zigzag must open with the T.81 figure-5 order
        want = [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2), (2, 1), (3, 0)]
        assert [(int(z) // 8, int(z) % 8) for z in _JPEG_ZIGZAG[:10]] == want
        p = encode_jpeg(np.zeros((16, 16, 3), dtype=np.uint8))
        assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
        assert b"JFIF\x00" in p[:24]
        for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
            assert marker in p

    def test_jpeg_constant_tiles_exact_roundtrip(self):
        # the registry-oracle contract: 16x16-piecewise-constant grayscale
        # at quality 100 survives the LOSSY pipeline exactly (DC-only
        # blocks, all-ones quant, exact grayscale YCbCr inverse), for
        # both subsampling modes
        import numpy as np

        from shifu_spark.operators.multimodal import decode_jpeg, encode_jpeg

        rng = np.random.RandomState(11)
        for h, w in [(16, 16), (32, 48), (16, 32)]:
            tiles = rng.randint(8, 248, (h // 16, w // 16))
            g = np.repeat(np.repeat(tiles, 16, 0), 16, 1).astype(np.uint8)
            img = np.stack([g, g, g], axis=2)
            for sub in ("4:2:0", "4:4:4"):
                rt = decode_jpeg(encode_jpeg(img, quality=100, subsampling=sub))
                assert (rt == img).all(), f"{h}x{w} {sub}"

    def test_jpeg_random_image_bounded_error(self):
        # full AC path (runs, ZRL, EOB, magnitude categories, byte
        # stuffing) on dense random spectra; at quality 100 the only
        # loss is color-convert + DCT float rounding
        import numpy as np

        from shifu_spark.operators.multimodal import decode_jpeg, encode_jpeg

        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, (24, 40, 3), dtype=np.uint8)
        rt = decode_jpeg(encode_jpeg(img, quality=100, subsampling="4:4:4"))
        assert np.abs(rt.astype(int) - img.astype(int)).max() <= 4
        # grayscale + 4:2:0 on non-multiple dims (pad/crop path)
        g = rng.randint(0, 256, (22, 37), dtype=np.uint8)
        img = np.stack([g, g, g], axis=2)
        rt = decode_jpeg(encode_jpeg(img, quality=100, subsampling="4:2:0"))
        assert rt.shape == img.shape
        assert np.abs(rt.astype(int) - img.astype(int)).max() <= 2
        # lossy quality still decodes and stays in the right ballpark
        smooth = np.full((32, 32, 3), 120, dtype=np.uint8)
        rt = decode_jpeg(encode_jpeg(smooth, quality=75))
        assert np.abs(rt.astype(int) - 120).max() <= 3

    def test_jpeg_rejects_unsupported_profiles(self):
        import numpy as np

        from shifu_spark.operators.multimodal import decode_jpeg, encode_jpeg

        with pytest.raises(ValueError, match="not a JPEG"):
            decode_jpeg(b"\x00\x01")
        p = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), subsampling="4:4:4"))
        # flip SOF0 -> SOF2 (progressive) — must raise, not misdecode
        i = bytes(p).index(b"\xff\xc0")
        p[i + 1] = 0xC2
        with pytest.raises(NotImplementedError, match="baseline"):
            decode_jpeg(bytes(p))

    def test_y4m_roundtrip_identity(self):
        import numpy as np

        from shifu_spark.operators.multimodal import decode_y4m, encode_y4m

        rng = np.random.RandomState(5)
        frames = rng.randint(0, 256, (6, 8, 10, 3), dtype=np.uint8)
        rt, fps = decode_y4m(encode_y4m(frames, fps=30))
        assert fps == 30
        assert rt.shape == frames.shape
        assert (rt == frames).all()

    def test_y4m_rejects_subsampled(self):
        from shifu_spark.operators.multimodal import decode_y4m

        # C420 (the spec default) must raise, not misread plane strides
        payload = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\nFRAME\n" + b"\x00" * 24
        with pytest.raises(NotImplementedError):
            decode_y4m(payload)

    def test_wav_roundtrip_identity(self):
        import numpy as np

        from shifu_spark.operators.multimodal import decode_wav, encode_wav_pcm16

        v = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int64)
        x, rate, nch = decode_wav(encode_wav_pcm16(v, sample_rate=16000))
        assert rate == 16000 and nch == 1
        assert np.array_equal(x, v)

    def test_wav_rejects_non_16bit(self):
        import io
        import wave

        import pytest as _pytest

        from shifu_spark.operators.multimodal import decode_wav

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)  # 8-bit
            w.setframerate(8000)
            w.writeframes(b"\x80\x81\x7f")
        with _pytest.raises(NotImplementedError):
            decode_wav(buf.getvalue())

    def test_ppm_roundtrip_and_comments(self):
        import numpy as np

        from shifu_spark.operators.multimodal import decode_ppm, encode_ppm

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)
        # comment lines inside the header must be skipped
        with_comment = b"P6\n# a comment\n4 5\n# another\n255\n" + img.tobytes()
        assert np.array_equal(decode_ppm(with_comment), img)

    def test_box_downsample_exact_means(self):
        import numpy as np

        from shifu_spark.operators.multimodal import box_downsample

        img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
        out = box_downsample(img, k=2)
        assert out.shape == (3, 2, 3)
        # each output pixel = floor mean of its 2x2 box, computed by hand
        box = img[:2, :2].astype(np.int64)
        assert np.array_equal(out[0, 0], (box.sum(axis=(0, 1)) // 4).astype(np.uint8))
        # odd trailing row/col is cropped
        out3 = box_downsample(img, k=4)
        assert out3.shape == (1, 1, 3)

    def test_audio_features_distributed(self, spark):
        import numpy as np

        from shifu_spark.operators.multimodal import encode_wav_pcm16, extract_audio_features

        v = np.array([10, -20, 30, -40], dtype=np.int64)
        df = spark.createDataFrame([(1, encode_wav_pcm16(v))], "doc_id long, payload binary")
        row = extract_audio_features(df).collect()[0]
        assert row["n_samples"] == 4 and row["peak"] == 40
        assert row["zero_crossings"] == 3
        assert row["rms"] == round(float(np.sqrt((v * v).sum() / 4)), 6)


class TestCompressedCodecs:
    """mu-law / IMA ADPCM / MJPEG-AVI — the compressed-codec kernels."""

    def test_mulaw_matches_scalar_spec(self):
        import numpy as np
        from shifu_spark.operators.multimodal import mulaw_compress, mulaw_expand

        def spec(v):  # independent per-sample G.711 mirror
            sign = -1 if v < 0 else 1
            m = min(abs(int(v)), 32635) + 132
            e = sum(m >= th for th in [256, 512, 1024, 2048, 4096, 8192, 16384])
            return sign * ((((((m >> (e + 3)) & 15) << 3) + 132) << e) - 132)

        x = np.concatenate(
            [
                np.array([0, 1, -1, 131, 132, 255, 256, 32635, 32767, -32768]),
                np.random.default_rng(3).integers(-32768, 32768, 4000),
            ]
        )
        dec = mulaw_expand(mulaw_compress(x))
        assert all(int(a) == spec(b) for a, b in zip(dec, x))
        # companding error is bounded by half the widest segment + bias
        assert int(np.abs(dec - x).max()) <= 512 + 132

    def test_mulaw_wav_container_roundtrip(self):
        import numpy as np
        from shifu_spark.operators.multimodal import (
            decode_wav_compressed,
            encode_wav_mulaw,
            mulaw_compress,
            mulaw_expand,
        )

        x = np.random.default_rng(5).integers(-32768, 32768, 777)
        samples, rate, nch, codec = decode_wav_compressed(encode_wav_mulaw(x, 16000))
        assert (codec, rate, nch) == ("mulaw", 16000, 1)
        assert (samples == mulaw_expand(mulaw_compress(x))).all()

    def test_ima_adpcm_state_container_roundtrip(self):
        import numpy as np
        from shifu_spark.operators.multimodal import (
            decode_wav_compressed,
            encode_wav_ima_adpcm_state,
            ima_adpcm_decode_nibbles,
        )

        nibs = [(7 * i + 3) % 16 for i in range(90)]
        ref = ima_adpcm_decode_nibbles(-321, 17, nibs)
        samples, rate, nch, codec = decode_wav_compressed(
            encode_wav_ima_adpcm_state(-321, 17, nibs)
        )
        assert (codec, nch) == ("ima_adpcm", 1)
        assert samples.tolist() == ref
        assert len(samples) == 91  # header predictor is sample 0

    def test_ima_adpcm_encoder_closed_loop(self):
        """Closed-loop properties: once the step index has adapted past
        the initial slope-overload transient (a REAL ADPCM artifact —
        the quantizer can move at most ~1.9x step per sample, so a fast
        attack outruns it until the index climbs; here that takes ~6
        samples), per-sample reconstruction error is bounded by 2x the
        step size active at that sample and cannot accumulate. And
        re-encoding the decoded signal is exactly lossless (decoded
        signals are fixed points of the codec)."""
        import numpy as np
        from shifu_spark.operators.multimodal import (
            _IMA_STEPS,
            decode_wav_compressed,
            encode_wav_ima_adpcm,
            ima_adpcm_encode,
        )

        t = np.arange(1500)
        sig = (9000 * np.sin(t / 25) + 700 * np.sin(t / 4)).astype(np.int64)
        dec, rate, nch, codec = decode_wav_compressed(encode_wav_ima_adpcm(sig))
        # LENGTH-EXACT: the fact chunk declares the true (pre-padding)
        # sample count, so the decoder trims the zero-delta pad nibble
        assert codec == "ima_adpcm" and len(dec) == len(sig)
        # even-length input too (exercises the pad-nibble trim)
        dec_even, _, _, _ = decode_wav_compressed(encode_wav_ima_adpcm(sig[:1000]))
        assert len(dec_even) == 1000
        # track the step sequence to bound per-sample error post-warmup
        pred0, idx0, nibs = ima_adpcm_encode(sig)
        idx = idx0
        for i, nib in enumerate(nibs):
            step = int(_IMA_STEPS[idx])
            if i >= 16:
                assert abs(int(dec[i + 1]) - int(sig[i + 1])) <= 2 * step
            idx = max(0, min(88, idx + [-1, -1, -1, -1, 2, 4, 6, 8][nib & 7]))
        # idempotence: encoding the decoded signal reproduces it exactly
        dec2, *_ = decode_wav_compressed(encode_wav_ima_adpcm(dec[: len(sig)]))
        assert (dec2[: len(sig)] == dec[: len(sig)]).all()

    def test_wav_compressed_rejects(self):
        import numpy as np
        import pytest
        from shifu_spark.operators.multimodal import (
            _riff_wave,
            decode_wav_compressed,
            encode_wav_ima_adpcm_state,
        )

        with pytest.raises(ValueError):
            decode_wav_compressed(b"RIFF\x00\x00\x00\x00JUNK")
        # unsupported format tag (e.g. 0x55 = mp3-in-wav) raises loudly
        fmt = (0x55).to_bytes(2, "little") + bytes(14)
        with pytest.raises(NotImplementedError):
            decode_wav_compressed(_riff_wave([(b"fmt ", fmt), (b"data", b"\x00\x00")]))
        # corrupt ADPCM block header (step index > 88)
        p = bytearray(encode_wav_ima_adpcm_state(0, 0, [0, 0]))
        chunks_off = p.rindex(b"data") + 8
        p[chunks_off + 2] = 120  # step index byte
        with pytest.raises(ValueError):
            decode_wav_compressed(bytes(p))

    def test_avi_mjpeg_exact_roundtrip_and_fps(self):
        import numpy as np
        from shifu_spark.operators.multimodal import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
            encode_jpeg,
        )

        frames, expect = [], []
        w, h = 48, 32
        for f in range(5):
            ti = np.arange(h // 16, dtype=np.int64)[:, None]
            tj = np.arange(w // 16, dtype=np.int64)[None, :]
            tiles = (f * 29 + ti * 7 + tj * 3) % 240 + 8
            g = np.repeat(np.repeat(tiles, 16, 0), 16, 1).astype(np.uint8)
            img = np.stack([g, g, g], 2)
            expect.append(img)
            frames.append(encode_jpeg(img, quality=100, subsampling="4:2:0"))
        dec, fps = decode_avi_mjpeg(encode_avi_mjpeg(frames, w, h, fps=30))
        assert fps == 30 and dec.shape == (5, h, w, 3)
        assert (dec == np.stack(expect)).all()

    def test_avi_rejects_non_mjpg(self):
        import pytest
        from shifu_spark.operators.multimodal import decode_avi_mjpeg, encode_avi_mjpeg

        avi = bytearray(encode_avi_mjpeg([b"\xff\xd8\xff\xd9"], 16, 16))
        i = avi.index(b"vids") + 4
        avi[i : i + 4] = b"H264"
        with pytest.raises(NotImplementedError):
            decode_avi_mjpeg(bytes(avi))
        with pytest.raises(ValueError):
            decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")

    def test_riff_truncated_chunk_raises(self):
        """A truncated WAV must raise, not decode silently with fewer
        samples (ADVICE r4: corruption contract is ValueError)."""
        import pytest
        from shifu_spark.operators.multimodal import (
            decode_wav_compressed,
            encode_wav_mulaw,
        )

        wav = encode_wav_mulaw([0, 100, -200, 300])
        assert decode_wav_compressed(wav)  # intact file decodes
        with pytest.raises(ValueError, match="truncated RIFF chunk"):
            decode_wav_compressed(wav[:-3])

    def test_avi_foreign_stream_frames_ignored(self):
        """Only the vids stream's '##dc' chunks may be decoded — a
        second stream's chunks must not interleave (ADVICE r4); a second
        vids strh raises."""
        import numpy as np
        import pytest
        from shifu_spark.operators.multimodal import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
            encode_jpeg,
        )

        g = np.full((16, 16, 3), 77, np.uint8)
        jpg = encode_jpeg(g, quality=100)
        avi = bytearray(encode_avi_mjpeg([jpg, jpg], 16, 16))
        # rename the second frame chunk to stream 01 -> must be skipped
        j = avi.index(b"00dc", avi.index(b"00dc") + 4)
        avi[j : j + 2] = b"01"
        frames, _fps = decode_avi_mjpeg(bytes(avi))
        assert frames.shape[0] == 1
        # two vids strh chunks -> loud refusal, not silent interleaving
        strh = b"vids" + b"MJPG" + bytes(12) + (1).to_bytes(4, "little") + (30).to_bytes(4, "little")
        ch = b"strh" + len(strh).to_bytes(4, "little") + strh
        two = b"RIFF" + (4 + 2 * len(ch)).to_bytes(4, "little") + b"AVI " + ch + ch
        with pytest.raises(NotImplementedError, match="multiple vids"):
            decode_avi_mjpeg(two)


class TestGifCodec:
    def test_lossless_roundtrip_multiframe(self):
        import numpy as np
        from shifu_spark.operators.multimodal import decode_gif, encode_gif

        rng = np.random.default_rng(9)
        pal = rng.integers(0, 256, (64, 3)).astype(np.uint8)
        frames = rng.integers(0, 64, (5, 11, 23)).astype(np.uint8)
        dec, dpal = decode_gif(encode_gif(frames, pal))
        assert (dec == frames).all() and (dpal == pal).all()

    def test_dictionary_overflow_clear_paths(self):
        import numpy as np
        from shifu_spark.operators.multimodal import decode_gif, encode_gif

        pal = np.zeros((64, 3), np.uint8)
        # highly repetitive data drives the dictionary to 4096 and
        # forces mid-stream CLEAR codes
        big = np.tile(np.arange(64, dtype=np.uint8).repeat(53), 30)[:90000]
        frames = big[: 90000 // 300 * 300].reshape(1, 300, 300)
        dec, _ = decode_gif(encode_gif(frames, pal))
        assert (dec == frames).all()

    def test_decoder_reads_hand_built_spec_stream(self):
        """Spec independence: a GIF byte stream assembled BY HAND from
        the published format (pixel-per-code LZW, explicit width
        schedule) — an encoding path our encoder never produces — must
        decode to the intended pixels."""
        import numpy as np
        from shifu_spark.operators.multimodal import decode_gif

        # 2x2 image, 4-color palette, min_code_size=2:
        # clear=4, end=5; codes (4,1,2,3 @3 bits, then 0,5 @4 bits —
        # width bumps to 4 after the decoder's table reaches 8 entries)
        acc = 0
        pos = 0
        for code, width in [(4, 3), (1, 3), (2, 3), (3, 3), (0, 4), (5, 4)]:
            acc |= code << pos
            pos += width
        lzw = acc.to_bytes((pos + 7) // 8, "little")
        payload = bytearray()
        payload += b"GIF89a"
        payload += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        payload += bytes([0x80 | 0x01, 0, 0])  # GCT present, 4 entries
        payload += bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
        payload += b"\x2c" + bytes(4) + (2).to_bytes(2, "little") + (2).to_bytes(2, "little") + b"\x00"
        payload += bytes([2])  # min code size
        payload += bytes([len(lzw)]) + lzw + b"\x00"
        payload += b"\x3b"
        frames, pal = decode_gif(bytes(payload))
        assert frames.shape == (1, 2, 2)
        assert frames[0].tolist() == [[1, 2], [3, 0]]
        assert pal.tolist()[1] == [40, 50, 60]

    def test_rejects_unsupported_profiles(self):
        import numpy as np
        import pytest
        from shifu_spark.operators.multimodal import decode_gif, encode_gif

        pal = np.zeros((64, 3), np.uint8)
        blob = bytearray(encode_gif(np.zeros((1, 4, 4), np.uint8), pal))
        with pytest.raises(ValueError):
            decode_gif(b"JIF89a" + bytes(20))
        i = blob.index(0x2C)
        blob[i + 9] |= 0x40  # interlace flag
        with pytest.raises(NotImplementedError):
            decode_gif(bytes(blob))


class TestFlacCodec:
    def test_decoder_reads_hand_built_spec_stream(self):
        """Spec independence: a FLAC stream assembled BY HAND from the
        published format (verbatim subframe, explicit bit layout our
        encoder never chooses for compressible input) must decode to the
        intended samples."""
        import hashlib

        import numpy as np
        from shifu_spark.operators.multimodal import (
            _flac_crc8,
            _flac_crc16,
            decode_flac,
        )

        samples = np.array([1, -2, 3, -4], dtype=np.int64)
        md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
        # STREAMINFO: min/max block 4096, frame sizes 0, rate 8000,
        # 1 channel, 16 bps, 4 total samples — packed by hand
        si = bytearray()
        si += (4096).to_bytes(2, "big") * 2
        si += b"\x00\x00\x00" * 2
        # 20 bits rate | 3 bits ch-1 | 5 bits bps-1 | 36 bits total = 64 bits
        packed = (8000 << 44) | (0 << 41) | (15 << 36) | 4
        si += packed.to_bytes(8, "big")
        si += md5
        head = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)
        # frame header: sync(14) 0 0 | bs=0b0111 sr=0b0000 | ch=0b0000 ss=0b100 0
        fh = bytes([0xFF, 0xF8, 0x70, 0x08]) + b"\x00" + (3).to_bytes(2, "big")
        fh += bytes([_flac_crc8(fh)])
        # subframe: 0 000001 0 (VERBATIM) then 4 x 16-bit samples
        body = bytes([0x02]) + b"".join(
            int(v & 0xFFFF).to_bytes(2, "big") for v in samples
        )
        frame = fh + body
        frame += _flac_crc16(frame).to_bytes(2, "big")
        dec, rate, nch = decode_flac(head + frame)
        assert rate == 8000 and nch == 1
        assert dec[:, 0].tolist() == [1, -2, 3, -4]

    def test_rejects_unsupported_and_corrupt(self):
        import numpy as np
        import pytest
        from shifu_spark.operators.multimodal import decode_flac, encode_flac

        x = np.arange(0, 500, dtype=np.int64) * 13 % 2000 - 1000
        blob = bytearray(encode_flac(x))
        with pytest.raises(ValueError, match="not a FLAC"):
            decode_flac(b"fLaK" + bytes(blob[4:]))
        # tamper an audio byte deep in the frame -> CRC-16 catches it
        bad = bytearray(blob)
        bad[-10] ^= 0xFF
        with pytest.raises(ValueError):
            decode_flac(bytes(bad))
        # truncation -> loud
        with pytest.raises(ValueError):
            decode_flac(bytes(blob[: len(blob) - 3]))
        # encoder refuses >16-bit input and >2 channels
        with pytest.raises(ValueError):
            encode_flac(np.array([70000]))
        with pytest.raises(ValueError):
            encode_flac(np.zeros((4, 3)))

    def test_compresses_predictable_signals(self):
        """The point of LPC+Rice: a smooth ramp must come out well under
        raw PCM size (and a constant signal near-nothing)."""
        import numpy as np
        from shifu_spark.operators.multimodal import encode_flac

        ramp = (np.arange(8000, dtype=np.int64) * 3) % 24001 - 12000
        assert len(encode_flac(ramp)) < 0.55 * ramp.size * 2
        assert len(encode_flac(np.full(8000, 77))) < 200

    def test_lpc_subframe_decodes(self):
        """Decoder generality: an LPC subframe (the type real-world
        encoders mostly emit; our encoder writes only FIXED),
        hand-assembled from the spec bit layout, must decode to the
        closed-form recurrence x[i] = res[i] + (3*x[i-1] - x[i-2]) >> 1."""
        import hashlib

        import numpy as np
        from shifu_spark.operators.multimodal import (
            _FlacBitWriter,
            _flac_crc8,
            _flac_crc16,
            decode_flac,
        )

        warm = [100, 103]
        res = [5, -3, 2, 0, 7, -2]
        bs = len(warm) + len(res)
        x = list(warm)
        for r in res:
            x.append(r + ((3 * x[-1] - x[-2]) >> 1))
        samples = np.array(x, dtype=np.int64)

        si = _FlacBitWriter()
        si.write(4096, 16); si.write(4096, 16); si.write(0, 24); si.write(0, 24)
        si.write(8000, 20); si.write(0, 3); si.write(15, 5); si.write(bs, 36)
        md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
        head = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si.getvalue() + md5

        fh = bytes([0xFF, 0xF8, 0x70, 0x08]) + b"\x00" + (bs - 1).to_bytes(2, "big")
        fh += bytes([_flac_crc8(fh)])
        bw = _FlacBitWriter()
        bw.write(0, 1); bw.write(0b100001, 6); bw.write(0, 1)  # LPC, order 2
        for w in warm:
            bw.write(w, 16)
        bw.write(4 - 1, 4)  # QLP precision 4 bits
        bw.write(1, 5)  # shift 1
        bw.write(3, 4); bw.write(-1, 4)  # coefs [3, -1]
        bw.write(0b00, 2); bw.write(0, 4); bw.write(4, 4)  # rice k=4, 1 partition
        for r in res:
            u = (r << 1) ^ (r >> 63)
            bw.write(1, (u >> 4) + 1)  # unary quotient
            bw.write(u, 4)
        bw.align()
        frame = fh + bw.getvalue()
        frame += _flac_crc16(frame).to_bytes(2, "big")
        dec, rate, nch = decode_flac(head + frame)
        assert rate == 8000 and nch == 1
        assert dec[:, 0].tolist() == x

    def test_utf8_frame_number_roundtrip(self):
        """The spec's extended UTF-8 frame-number coding round-trips
        across every byte-length class (1..7 bytes, up to 36 bits)."""
        from shifu_spark.operators.multimodal import (
            _FlacBitReader,
            _flac_read_utf8,
            _flac_utf8,
        )

        for v in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF,
                  2**31, 2**36 - 1]:
            assert _flac_read_utf8(_FlacBitReader(_flac_utf8(v))) == v

    def test_wasted_bits_subframe_decodes(self):
        """Decoder generality: a hand-assembled CONSTANT subframe with 2
        wasted bits (samples all multiples of 4, stored at bps-2 and
        shifted back) decodes to the intended values."""
        import hashlib

        import numpy as np
        from shifu_spark.operators.multimodal import (
            _FlacBitWriter,
            _flac_crc8,
            _flac_crc16,
            decode_flac,
        )

        val, bs = -1024, 5  # -1024 = -256 << 2
        samples = np.full(bs, val, dtype=np.int64)
        si = _FlacBitWriter()
        si.write(4096, 16); si.write(4096, 16); si.write(0, 24); si.write(0, 24)
        si.write(8000, 20); si.write(0, 3); si.write(15, 5); si.write(bs, 36)
        md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
        head = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si.getvalue() + md5
        fh = bytes([0xFF, 0xF8, 0x70, 0x08]) + b"\x00" + (bs - 1).to_bytes(2, "big")
        fh += bytes([_flac_crc8(fh)])
        bw = _FlacBitWriter()
        bw.write(0, 1); bw.write(0b000000, 6)  # CONSTANT
        bw.write(1, 1)  # wasted-bits flag
        bw.write(0b01, 2)  # unary: one zero + one -> 2 wasted bits
        bw.write(val >> 2, 14)  # constant at bps-2
        bw.align()
        frame = fh + bw.getvalue()
        frame += _flac_crc16(frame).to_bytes(2, "big")
        dec, _r, _n = decode_flac(head + frame)
        assert dec[:, 0].tolist() == [val] * bs

    def test_lpc_encoder_beats_fixed_on_tonal_content(self):
        """The Levinson-Durbin LPC path must (a) round-trip exactly and
        (b) genuinely out-compress the fixed predictors on sinusoids —
        the content class LPC exists for."""
        import numpy as np

        import shifu_spark.operators.multimodal as mm

        t = np.arange(12000)
        sine = (
            8000 * np.sin(2 * np.pi * t / 113.7)
            + 3000 * np.sin(2 * np.pi * t / 37.3)
        ).astype(np.int64)
        blob = mm.encode_flac(sine)
        dec, _r, _n = mm.decode_flac(blob)
        assert (dec[:, 0] == sine).all()
        orig = mm._FLAC_LPC_ORDERS
        mm._FLAC_LPC_ORDERS = ()
        try:
            fixed_only = len(mm.encode_flac(sine))
        finally:
            mm._FLAC_LPC_ORDERS = orig
        assert len(blob) < 0.9 * fixed_only


class TestExternalStreamTolerance:
    """Decoder-only branches external (non-repo-encoder) streams hit."""

    def test_flac_unknown_total_and_unset_md5_accepted(self):
        """total_samples=0 means UNKNOWN and an all-zero MD5 means UNSET
        per spec (streaming/piped encodes) — both are legal streams the
        decoder previously rejected as corrupt."""
        import numpy as np
        from shifu_spark.operators.multimodal import decode_flac, encode_flac

        sig = (1000 * np.sin(np.arange(500) / 10)).astype(np.int64)
        payload = bytearray(encode_flac(sig))
        si = 8  # 'fLaC' + 4-byte metadata block header
        payload[si + 13] &= 0xF0  # total_samples high nibble
        payload[si + 14 : si + 18] = b"\x00" * 4  # total_samples low 32
        payload[si + 18 : si + 34] = b"\x00" * 16  # md5 unset
        xs, rate, nch = decode_flac(bytes(payload))
        assert xs.shape == (500, 1) and (rate, nch) == (8000, 1)

    def test_stereo_wav_features_use_frames_not_interleaved_samples(self, spark):
        """A 1-second stereo clip must report 1000 ms, not 2000 ms — the
        extractor previously measured the channel-interleaved flat
        array."""
        import io
        import wave

        import numpy as np
        from shifu_spark.operators.multimodal import extract_audio_features

        rate = 8000
        mono = (5000 * np.sin(np.arange(rate) / 20)).astype(np.int64)
        stereo = np.column_stack([mono, -mono]).ravel()  # interleave L,R
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(stereo.astype("<i2").tobytes())
        payload = buf.getvalue()
        df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
        row = extract_audio_features(df).collect()[0]
        assert row["n_channels"] == 2
        assert row["n_samples"] == rate
        assert row["duration_ms"] == 1000

    def test_gif_min_code_size_below_two_rejected(self):
        import numpy as np
        import pytest
        from shifu_spark.operators.multimodal import encode_gif

        frames = np.zeros((1, 4, 4), dtype=np.uint8)
        palette = np.zeros((2, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="min_code_size"):
            encode_gif(frames, palette, min_code_size=1)


class TestStreamingCorruptQuarantine:
    """The dirty-binaries skip policy must hold under Structured
    Streaming too: the extractors are plain DataFrame transforms, so a
    corrupt payload in a micro-batch quarantines the ROW — one bad blob
    must not kill a long-running ingest stream."""

    def test_corrupt_payload_does_not_kill_the_stream(self, spark, tmp_path):
        import numpy as np
        from shifu_spark.operators.multimodal import (
            encode_wav_pcm16,
            extract_audio_features,
        )

        wav = encode_wav_pcm16(((np.arange(300) * 13) % 997 - 498).astype(np.int16))
        rows = [
            (1, wav),
            (2, wav[:11]),            # torn mid-header
            (3, b"XXXX" + wav[4:]),   # smashed magic
            (4, None),                # NULL payload
            (5, wav),
        ]
        src = str(tmp_path / "media_src")
        spark.createDataFrame(rows, "doc_id long, payload binary").write.parquet(src)

        stream = spark.readStream.schema("doc_id long, payload binary").parquet(src)
        q = (
            extract_audio_features(stream, on_error="skip")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("media_corrupt_quarantine_test")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None
        got = spark.sql(
            "SELECT doc_id, n_samples FROM media_corrupt_quarantine_test ORDER BY doc_id"
        ).collect()
        assert [r["doc_id"] for r in got] == [1, 5]
        assert all(r["n_samples"] == 300 for r in got)
