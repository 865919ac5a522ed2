"""Multimodal column processing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

This is the training-data-pipeline shape for media at 100 TB: media bytes
never leave the executors, decode/feature-extraction is batched through
Arrow, and outputs are typed columns that downstream dedup/similarity
operators consume.  The actual codec calls are STUBBED (this container has
no image/audio libraries): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless the optional library import succeeds, and the
tests exercise the pipeline with the deterministic FAKE container formats
below — the Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is real and tested.

FAKE formats (deterministic, self-describing):
  image: b"FAKEIMG" + width:u16 + height:u16 + width*height gray bytes
  audio: b"FAKEAUD" + sample_rate:u32 + n:u32 + n samples of s16le
  video: b"FAKEVID" + n_frames:u16 + frame_w:u16 + frame_h:u16 + frames
"""

from __future__ import annotations

import struct
import wave
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
        T.StructField("histogram", T.ArrayType(T.LongType()), True),  # 8 bins
        T.StructField("error", T.StringType(), True),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


# ---------------------------------------------------------------- codecs
# Real codecs are wired behind import-tries: Pillow for images and
# soundfile for non-WAV audio when installed; stdlib ``wave`` decodes PCM
# WAV everywhere (a real container format, exercised by tests even in
# this dependency-free environment).  The deterministic FAKE containers
# remain the fallback test vehicle; unsupported payloads raise
# NotImplementedError (the documented stub boundary).


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png_stdlib(data: bytes) -> tuple[int, int, bytes]:
    """Pure-stdlib PNG decode (zlib inflate + the five scanline filters,
    PNG spec RFC 2083 §6): 8-bit depth, non-interlaced, gray / gray+alpha
    / RGB / RGBA.  Color converts to luma with Pillow's exact fixed-point
    ITU-R 601 formula ((19595R + 38470G + 7471B + 0x8000) >> 16) so the
    output is byte-identical whether this path or Pillow decodes.

    This is the environment-independent real-codec path: it runs (and is
    CI-tested) even where Pillow is absent."""
    import zlib

    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = chunk
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or interlace != 0 or channels is None:
        raise NotImplementedError(
            f"PNG depth={depth} color={color} interlace={interlace} unsupported "
            "(stdlib path handles 8-bit non-interlaced gray/RGB/alpha)"
        )
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = bytearray()
    prev = bytearray(stride)
    rpos = 0
    bpp = channels
    for _y in range(h):
        f = raw[rpos]
        rpos += 1
        line = bytearray(raw[rpos : rpos + stride])
        rpos += stride
        if f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                line[i] = (
                    line[i] + (a if pa <= pb and pa <= pc else b if pb <= pc else c)
                ) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter byte {f}")
        prev = line
        out.extend(line)
    if color == 0:
        return w, h, bytes(out)
    if color == 4:  # gray+alpha: take the gray channel
        return w, h, bytes(out[::2])
    gray = bytearray(w * h)
    for j in range(w * h):
        r, g, b = out[j * channels], out[j * channels + 1], out[j * channels + 2]
        gray[j] = (19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16
    return w, h, bytes(gray)


def decode_image(data: bytes) -> tuple[int, int, bytes]:
    """Decode an image to (width, height, grayscale bytes).

    FAKEIMG decodes natively; PNG decodes via the stdlib decoder above on
    every environment (byte-identical to Pillow's grayscale conversion);
    any other format goes through Pillow when it is importable, else
    raises NotImplementedError."""
    if data[:7] == b"FAKEIMG":
        w, h = struct.unpack_from("<HH", data, 7)
        pixels = data[11 : 11 + w * h]
        return w, h, pixels
    if data[:8] == PNG_SIG:
        return _decode_png_stdlib(data)
    try:
        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "real image decode beyond PNG requires Pillow (not in this "
            "environment); FAKEIMG and PNG containers are supported"
        ) from None
    import io

    with Image.open(io.BytesIO(data)) as img:  # pragma: no cover - needs Pillow
        gray = img.convert("L")
        return gray.width, gray.height, gray.tobytes()


def decode_audio(data: bytes) -> tuple[int, list[int]]:
    """Decode audio to (sample_rate, 16-bit samples of channel 0).

    FAKEAUD decodes natively; RIFF/WAVE PCM decodes via stdlib ``wave``
    (a real codec, available everywhere); other formats go through
    soundfile when importable, else raise NotImplementedError."""
    if data[:7] == b"FAKEAUD":
        rate, n = struct.unpack_from("<II", data, 7)
        samples = list(struct.unpack_from(f"<{n}h", data, 15))
        return rate, samples
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(data), "rb") as wf:
            if wf.getsampwidth() != 2:
                raise NotImplementedError("only 16-bit PCM WAV is supported")
            rate = wf.getframerate()
            nch = wf.getnchannels()
            raw = wf.readframes(wf.getnframes())
            all_samples = struct.unpack(f"<{len(raw) // 2}h", raw)
            return rate, list(all_samples[::nch])  # channel 0
    try:
        import soundfile  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "real audio decode beyond PCM WAV requires soundfile "
            "(not in this environment)"
        ) from None
    import io  # pragma: no cover - needs soundfile

    samples, rate = soundfile.read(io.BytesIO(data), dtype="int16", always_2d=True)
    return int(rate), [int(s) for s in samples[:, 0]]


def split_video_frames(data: bytes) -> tuple[int, int, list[bytes]]:
    if data[:7] == b"FAKEVID":
        n, w, h = struct.unpack_from("<HHH", data, 7)
        size = w * h
        frames = [data[13 + i * size : 13 + (i + 1) * size] for i in range(n)]
        return w, h, frames
    raise NotImplementedError("real video demux requires a video library")


# ---------------------------------------------------------------- operators
def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract images: mean intensity and an 8-bin
    histogram.  mapInPandas: one Arrow batch in, one out; failed decodes go
    to an error column (same DLQ discipline as the ingest path)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                try:
                    w, h, pixels = decode_image(bytes(data))
                    if not pixels:
                        raise ValueError("empty pixel data")
                    hist = [0] * 8
                    total = 0
                    for b in pixels:
                        hist[b >> 5] += 1
                        total += b
                    out.append((mid, w, h, total / len(pixels), hist, None))
                # OSError covers PIL.UnidentifiedImageError and truncated
                # reads — corrupt payloads land in the error column (DLQ
                # discipline), never crash the mapInPandas task
                except (NotImplementedError, ValueError, struct.error, OSError) as e:
                    out.append((mid, None, None, None, None, str(e)))
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "mean_intensity", "histogram", "error"],
            )

    return media.filter(F.col("kind") == "image").select("media_id", "data").mapInPandas(
        extract, schema=IMAGE_FEATURES_SCHEMA
    )


def resize_images(media: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """Nearest-neighbor resize of FAKEIMG grayscale images — the plumbing
    (binary in, binary out, metadata update) is what matters at scale."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, datas, metas = [], [], [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                w, h, pixels = decode_image(bytes(data))
                resized = bytearray()
                for y in range(new_h):
                    sy = min(h - 1, y * h // new_h)
                    row = pixels[sy * w : (sy + 1) * w]
                    for x in range(new_w):
                        resized.append(row[min(w - 1, x * w // new_w)])
                ids.append(mid)
                kinds.append("image")
                datas.append(
                    b"FAKEIMG" + struct.pack("<HH", new_w, new_h) + bytes(resized)
                )
                metas.append(
                    {"format": "FAKEIMG", "width": new_w, "height": new_h,
                     "sample_rate": None, "duration_ms": None}
                )
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "data": datas, "meta": metas}
            )

    return media.filter(F.col("kind") == "image").mapInPandas(resize, schema=MEDIA_SCHEMA)


def audio_features(media: DataFrame) -> DataFrame:
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                try:
                    rate, samples = decode_audio(bytes(data))
                    n = len(samples)
                    rms = (sum(s * s for s in samples) / n) ** 0.5 if n else 0.0
                    out.append((mid, rate, n, rms, None))
                # wave.Error is a plain Exception subclass (not OSError);
                # EOFError/OSError cover truncated RIFF payloads — all go
                # to the error column, never crash the task
                except (
                    NotImplementedError,
                    ValueError,
                    struct.error,
                    OSError,
                    EOFError,
                    wave.Error,
                ) as e:
                    out.append((mid, None, None, None, str(e)))
            yield pd.DataFrame(
                out, columns=["media_id", "sample_rate", "n_samples", "rms", "error"]
            )

    return media.filter(F.col("kind") == "audio").select("media_id", "data").mapInPandas(
        extract, schema=AUDIO_FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling: every ``stride``-th frame of each video, exploded to
    one row per sampled frame (the shape a captioning/embedding stage
    consumes)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                w, h, frames = split_video_frames(bytes(data))
                for idx in range(0, len(frames), stride):
                    out.append((mid, idx, frames[idx], w, h))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_index", "frame", "width", "height"]
            )

    return media.filter(F.col("kind") == "video").select("media_id", "data").mapInPandas(
        sample, schema=FRAME_SCHEMA
    )


def scene_change_stats(media: DataFrame, threshold: int = 127) -> DataFrame:
    """Scene-change detection over videos: mean-absolute-difference
    between consecutive frames, a boundary wherever the per-pixel MAD
    exceeds ``threshold``.  All work is row-local inside one Arrow
    ``mapInPandas`` pass (a video row carries its own frames), so the
    operator shuffles nothing at any corpus size; the integer-scaled MAD
    (sum of per-pixel absolute diffs) keeps both engines bit-exact.
    Real-codec demux stubs behind ``split_video_frames``'s documented
    NotImplementedError boundary, like every media decode here."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_frames", T.IntegerType(), True),
            T.StructField("n_boundaries", T.LongType(), True),
            T.StructField("total_mad_scaled", T.LongType(), True),
        ]
    )

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                w, h, frames = split_video_frames(bytes(data))
                size = w * h
                arrs = [np.frombuffer(f, dtype=np.uint8).astype(np.int32) for f in frames]
                total = 0
                boundaries = 0
                for a, b in zip(arrs, arrs[1:]):
                    scaled = int(np.abs(b - a).sum())
                    total += scaled
                    if scaled > threshold * size:
                        boundaries += 1
                rows.append((int(mid), len(frames), boundaries, total))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_frames", "n_boundaries", "total_mad_scaled"]
            )

    return media.filter(F.col("kind") == "video").select("media_id", "data").mapInPandas(
        detect, schema=schema
    )


def vad_segments(media: DataFrame, win: int = 8, threshold: int = 131072) -> DataFrame:
    """Voice-activity segmentation over audio: frame the waveform into
    fixed ``win``-sample windows (FULL windows only — the ragged tail is
    dropped so both engines agree on window count), mark a window voiced
    when its sum of absolute sample values exceeds ``threshold``, and
    merge consecutive voiced windows into maximal segments — the VAD
    pre-pass a speech-data pipeline runs before transcription/packing.

    Scale shape mirrors scene_change_stats: an audio row carries its own
    samples, so framing, thresholding AND the island merge are all
    row-local inside one Arrow ``mapInPandas`` pass — zero shuffle at any
    corpus size, parallelism = media rows.  Integer energies (|int16|
    sums) keep both engines bit-exact.  Real codecs stub behind
    ``decode_audio``'s documented boundary."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("seg_start", T.LongType(), True),
            T.StructField("seg_end", T.LongType(), True),
            T.StructField("n_windows", T.LongType(), True),
            T.StructField("energy", T.LongType(), True),
        ]
    )

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                rate, samples = decode_audio(bytes(data))
                n_win = len(samples) // win
                voiced = []
                for wi in range(n_win):
                    e = sum(abs(s) for s in samples[wi * win : (wi + 1) * win])
                    if e > threshold:
                        voiced.append((wi, e))
                seg = None  # (start, end, energy)
                for wi, e in voiced:
                    if seg is not None and wi == seg[1] + 1:
                        seg = (seg[0], wi, seg[2] + e)
                    else:
                        if seg is not None:
                            rows.append((int(mid), seg[0], seg[1], seg[1] - seg[0] + 1, seg[2]))
                        seg = (wi, wi, e)
                if seg is not None:
                    rows.append((int(mid), seg[0], seg[1], seg[1] - seg[0] + 1, seg[2]))
            yield pd.DataFrame(
                rows, columns=["media_id", "seg_start", "seg_end", "n_windows", "energy"]
            )

    return media.filter(F.col("kind") == "audio").select("media_id", "data").mapInPandas(
        detect, schema=schema
    )


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("ahash", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

AHASH_BITS = 60  # stays inside a signed 64-bit BIGINT on both engines


def image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual block-hash of images: sample AHASH_BITS pixels on a
    deterministic grid (bit k reads pixel floor(k*n/60) of the row-major
    grayscale raster) and threshold each at >127 — a fixed-threshold
    variant of aHash whose bits are independent of the global image mean,
    so a localized edit flips exactly the bits whose sample pixels it
    touches.  mapInPandas decode, same error-column DLQ discipline as
    image_features; row-local, shuffle-free."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                try:
                    w, h, pixels = decode_image(bytes(data))
                    n = w * h
                    if n == 0:
                        raise ValueError("empty pixel data")
                    hv = 0
                    for k in range(AHASH_BITS):
                        if pixels[k * n // AHASH_BITS] > 127:
                            hv |= 1 << k
                    out.append((mid, w, h, hv, None))
                except (NotImplementedError, ValueError, struct.error, OSError) as e:
                    out.append((mid, None, None, None, str(e)))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "ahash", "error"]
            )

    return media.filter(F.col("kind") == "image").select("media_id", "data").mapInPandas(
        extract, schema=AHASH_SCHEMA
    )
