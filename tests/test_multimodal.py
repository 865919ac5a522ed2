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

    def test_pillow_decode_when_available(self):
        PIL = pytest.importorskip("PIL.Image")
        import io

        from jena_fuseki_kafka_spark.queries.multimodal import decode_image

        img = PIL.new("L", (4, 2), color=128)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        w, h, pixels = decode_image(buf.getvalue())
        assert (w, h) == (4, 2)
        assert set(pixels) == {128}


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
