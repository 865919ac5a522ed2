"""Multimodal plumbing tests: the decode step is a documented stub (FAKE
containers), but the Spark-side schema/batching/UDF plumbing is real."""

import struct

import pytest

from jena_fuseki_kafka_spark.queries.multimodal import (
    AUDIO_FEATURES_SCHEMA,
    IMAGE_FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    audio_features,
    decode_image,
    image_features,
    resize_images,
    sample_frames,
)


def fake_image(w, h, fill=None):
    pixels = bytes((fill if fill is not None else (x % 256)) for x in range(w * h))
    return b"FAKEIMG" + struct.pack("<HH", w, h) + pixels


def fake_audio(rate, samples):
    return b"FAKEAUD" + struct.pack("<II", rate, len(samples)) + struct.pack(
        f"<{len(samples)}h", *samples
    )


def fake_video(frames, w, h):
    return (
        b"FAKEVID"
        + struct.pack("<HHH", len(frames), w, h)
        + b"".join(frames)
    )


def media_df(spark, rows):
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


META = {"format": "FAKE", "width": None, "height": None, "sample_rate": None, "duration_ms": None}


class TestImagePipeline:
    def test_features(self, spark):
        df = media_df(
            spark,
            [
                (1, "image", fake_image(4, 2, fill=32), META),
                (2, "image", fake_image(2, 2, fill=255), META),
                (3, "audio", fake_audio(8000, [0]), META),  # filtered out
            ],
        )
        rows = {r.media_id: r for r in image_features(df).collect()}
        assert set(rows) == {1, 2}
        assert rows[1].width == 4 and rows[1].height == 2
        assert rows[1].mean_intensity == 32.0
        assert rows[1].histogram[1] == 8  # 32>>5 == 1
        assert rows[2].histogram[7] == 4  # 255>>5 == 7
        assert rows[1].error is None

    def test_undecodable_goes_to_error_column(self, spark):
        df = media_df(spark, [(1, "image", b"\x89PNG not really", META)])
        r = image_features(df).collect()[0]
        assert r.error is not None and "FAKEIMG" in r.error
        assert r.width is None

    def test_resize(self, spark):
        df = media_df(spark, [(1, "image", fake_image(8, 8, fill=7), META)])
        out = resize_images(df, 4, 4).collect()[0]
        w, h, pixels = decode_image(bytes(out.data))
        assert (w, h) == (4, 4)
        assert set(pixels) == {7}
        assert out.meta["width"] == 4

    def test_real_decode_is_stubbed(self):
        with pytest.raises(NotImplementedError, match="PIL|FAKEIMG"):
            decode_image(b"\xff\xd8\xff real jpeg header")


class TestAudioPipeline:
    def test_rms(self, spark):
        df = media_df(spark, [(1, "audio", fake_audio(16000, [3, -3, 3, -3]), META)])
        r = audio_features(df).collect()[0]
        assert r.sample_rate == 16000
        assert r.n_samples == 4
        assert r.rms == 3.0


def png_bytes(w, h, pixels, color=0, filters=None):
    """Minimal stdlib PNG encoder (zlib + struct): 8-bit, non-interlaced,
    gray (color=0) or RGB (color=2), with a selectable filter per row so
    the decoder's Sub/Up/Average/Paeth paths are all exercised."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    channels = {0: 1, 2: 3}[color]
    stride = w * channels
    raw = bytearray()
    for y in range(h):
        f = filters[y] if filters else 0
        row = pixels[y * stride : (y + 1) * stride]
        prev = pixels[(y - 1) * stride : y * stride] if y else bytes(stride)
        enc = bytearray(stride)
        for i in range(stride):
            a = row[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
            enc[i] = (row[i] - pred) & 0xFF
        raw.append(f)
        raw.extend(enc)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def wav_bytes(rate, samples, nch=1):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


class TestRealCodecs:
    """The optional real-codec path behind the documented boundary: PCM
    WAV decodes via stdlib ``wave`` everywhere; Pillow/soundfile engage
    when importable (skipped otherwise)."""

    def test_wav_is_a_real_codec_here(self):
        from jena_fuseki_kafka_spark.queries.multimodal import decode_audio

        rate, samples = decode_audio(wav_bytes(22050, [10, -10, 10, -10]))
        assert rate == 22050
        assert samples == [10, -10, 10, -10]

    def test_wav_stereo_takes_channel_zero(self):
        from jena_fuseki_kafka_spark.queries.multimodal import decode_audio

        # interleaved L,R: L channel is [1, 3], R channel is [2, 4]
        rate, samples = decode_audio(wav_bytes(8000, [1, 2, 3, 4], nch=2))
        assert samples == [1, 3]

    def test_wav_through_audio_features_pipeline(self, spark):
        df = media_df(spark, [(9, "audio", wav_bytes(16000, [5, -5, 5, -5]), META)])
        r = audio_features(df).collect()[0]
        assert r.sample_rate == 16000
        assert r.n_samples == 4
        assert r.rms == 5.0
        assert r.error is None

    def test_non_pcm_wav_rejected_cleanly(self, spark):
        # 8-bit WAV: unsupported width must land in the error column, not crash
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(1)
            wf.setframerate(8000)
            wf.writeframes(b"\x80\x7f")
        df = media_df(spark, [(1, "audio", buf.getvalue(), META)])
        r = audio_features(df).collect()[0]
        assert r.error is not None and "16-bit" in r.error

    def test_truncated_riff_lands_in_error_column(self, spark):
        # a RIFF/WAVE header with a chopped body raises wave.Error or
        # EOFError inside the decoder — must go to the error column (DLQ
        # discipline), never crash the mapInPandas task
        good = wav_bytes(16000, [5, -5, 5, -5])
        truncated = good[:20]  # past the RIFF/WAVE magic, before fmt chunk ends
        garbage_body = good[:12] + b"\x00" * 8
        df = media_df(
            spark,
            [(1, "audio", truncated, META), (2, "audio", garbage_body, META)],
        )
        rows = {r.media_id: r for r in audio_features(df).collect()}
        assert rows[1].error is not None and rows[1].rms is None
        assert rows[2].error is not None and rows[2].rms is None

    def test_png_is_a_real_codec_here(self):
        # stdlib zlib+struct encode -> stdlib decode: PNG decodes on every
        # environment, no Pillow needed (formerly this test skipped on
        # missing Pillow); filters 0/1/2 all round-trip
        from jena_fuseki_kafka_spark.queries.multimodal import decode_image

        pixels = bytes(range(48))  # 8x6 gradient
        for filters in (None, [1] * 6, [2] * 6, [0, 1, 2, 4, 3, 0]):
            w, h, got = decode_image(png_bytes(8, 6, pixels, filters=filters))
            assert (w, h) == (8, 6)
            assert got == pixels, f"filters={filters}"

    def test_png_rgb_converts_to_pillow_luma(self):
        from jena_fuseki_kafka_spark.queries.multimodal import decode_image

        # 2x1 RGB: pure red and pure white
        rgb = bytes([255, 0, 0, 255, 255, 255])
        w, h, got = decode_image(png_bytes(2, 1, rgb, color=2))
        assert (w, h) == (2, 1)
        # Pillow's fixed-point ITU-R 601: red -> 76, white -> 255
        assert list(got) == [(19595 * 255 + 0x8000) >> 16, 255]

    def test_png_through_image_features_pipeline(self, spark):
        gray = bytes([100] * 12)
        df = media_df(spark, [(21, "image", png_bytes(4, 3, gray), META)])
        r = image_features(df).collect()[0]
        assert r.error is None
        assert (r.width, r.height) == (4, 3)
        assert r.mean_intensity == 100.0
        assert r.histogram[100 >> 5] == 12

    def test_truncated_png_lands_in_error_column(self, spark):
        good = png_bytes(4, 3, bytes(12))
        df = media_df(spark, [(1, "image", good[:20], META)])
        r = image_features(df).collect()[0]
        assert r.error is not None and r.width is None

    def test_pillow_branch_via_test_double(self, monkeypatch):
        # the Pillow code path (open -> convert("L") -> tobytes) has never
        # run in this Pillow-less container; drive it with a stub module so
        # the call sequence is exercised, not just written
        import sys
        import types

        from jena_fuseki_kafka_spark.queries.multimodal import decode_image

        class FakeGray:
            width, height = 3, 2

            def tobytes(self):
                return bytes([9] * 6)

        class FakeImg:
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def convert(self, mode):
                assert mode == "L"
                return FakeGray()

        fake_image_mod = types.SimpleNamespace(open=lambda buf: FakeImg())
        fake_pil = types.ModuleType("PIL")
        fake_pil.Image = fake_image_mod
        monkeypatch.setitem(sys.modules, "PIL", fake_pil)
        w, h, pixels = decode_image(b"\xff\xd8\xff fake jpeg")
        assert (w, h, pixels) == (3, 2, bytes([9] * 6))

    def test_soundfile_branch_via_test_double(self, monkeypatch):
        import sys
        import types

        import numpy as np

        from jena_fuseki_kafka_spark.queries.multimodal import decode_audio

        def fake_read(buf, dtype, always_2d):
            assert dtype == "int16" and always_2d
            return np.array([[7, 1], [-7, 2]], dtype="int16"), 48000

        fake_sf = types.ModuleType("soundfile")
        fake_sf.read = fake_read
        monkeypatch.setitem(sys.modules, "soundfile", fake_sf)
        rate, samples = decode_audio(b"OggS fake opus payload")
        assert rate == 48000
        assert samples == [7, -7]  # channel 0 only


class TestVideoPipeline:
    def test_frame_sampling(self, spark):
        frames = [bytes([i] * 4) for i in range(6)]  # 2x2 frames
        df = media_df(spark, [(1, "video", fake_video(frames, 2, 2), META)])
        out = sample_frames(df, stride=2).collect()
        assert [r.frame_index for r in out] == [0, 2, 4]
        assert bytes(out[1].frame) == bytes([2] * 4)
        assert out[0].width == 2

    def test_schemas_stable(self, spark):
        # the contract downstream stages rely on
        assert [f.name for f in IMAGE_FEATURES_SCHEMA.fields] == [
            "media_id", "width", "height", "mean_intensity", "histogram", "error",
        ]
        assert [f.name for f in AUDIO_FEATURES_SCHEMA.fields] == [
            "media_id", "sample_rate", "n_samples", "rms", "error",
        ]


class TestSceneChanges:
    def test_hand_built_video_boundaries(self, spark):
        from jena_fuseki_kafka_spark.queries.multimodal import scene_change_stats

        # 2x2 frames: identical pair (MAD 0), then a hard cut (MAD 255)
        frames = [bytes([10] * 4), bytes([10] * 4), bytes([255, 255, 255, 255])]
        df = media_df(spark, [(7, "video", fake_video(frames, 2, 2), META)])
        rows = scene_change_stats(df, threshold=127).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.media_id == 7 and r.n_frames == 3
        assert r.n_boundaries == 1  # only the cut crosses the threshold
        assert r.total_mad_scaled == 0 + 245 * 4  # |255-10| per pixel

    def test_m05_gate_boundary_facet_non_vacuous(self, spark, sf_dir):
        from jena_fuseki_kafka_spark.queries import QUERIES

        rows = QUERIES["m05_scene_changes"](spark, sf_dir).collect()
        assert rows
        total_b = sum(r.n_boundaries for r in rows)
        total_pairs = sum(r.n_frames - 1 for r in rows)
        # the threshold must actually discriminate: some pairs cross it,
        # some don't — all-or-nothing would mean the facet proves nothing
        assert 0 < total_b < total_pairs, (total_b, total_pairs)
