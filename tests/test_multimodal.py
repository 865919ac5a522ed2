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
