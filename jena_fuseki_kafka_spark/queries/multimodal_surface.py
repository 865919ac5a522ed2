"""Multimodal operators exercised through the correctness gate.

There is no media table in the driver testdata, so these queries derive a
deterministic FAKE media corpus from ``documents`` (kind = doc_id % 3;
pixel/sample values are closed-form functions of doc_id and index) and push
it through the REAL multimodal pipeline — binary container encode, Arrow
batches, ``mapInPandas`` decode/feature-extract/frame-sample from
``queries.multimodal`` — then project exact-integer features that a DuckDB
``generate_series`` oracle reproduces.  The byte-level decode is therefore
verified end-to-end: if the binary plumbing corrupted a single byte, the
intensity/checksum sums would hash-mismatch.

Fake-media generation formulas (all positive ints; ``%`` agrees between
Python and DuckDB):
  image (doc_id%3==0): w=8+id%8, h=8+id%5, pixel[i]=(id*31+i*7)%256
  audio (doc_id%3==1): rate=8000+(id%4)*4000, n=16+id%32,
                       sample[i]=((id*13+i*17)%65536)-32768
  video (doc_id%3==2): nf=2+id%5, w=4+id%4, h=4+id%3,
                       pixel[f][i]=(id*31+f*911+i*7)%256
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from . import load, query
from .multimodal import (
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    audio_features,
    image_features,
    sample_frames,
    vad_segments,
)


def fake_media(docs: DataFrame) -> DataFrame:
    """documents -> deterministic FAKE media rows (MEDIA_SCHEMA).

    One Arrow-batched pass; media bytes are built executor-side and never
    hit the driver — the same data-locality contract a real 100 TB media
    pipeline needs (binary column + typed metadata, SURVEY-adjacent
    multimodal design)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 3 == 0:
                    w, h = 8 + did % 8, 8 + did % 5
                    px = bytes((did * 31 + i * 7) % 256 for i in range(w * h))
                    data = b"FAKEIMG" + struct.pack("<HH", w, h) + px
                    meta = {"format": "FAKEIMG", "width": w, "height": h,
                            "sample_rate": None, "duration_ms": None}
                    rows.append((did, "image", data, meta))
                elif did % 3 == 1:
                    rate, n = 8000 + (did % 4) * 4000, 16 + did % 32
                    samples = [((did * 13 + i * 17) % 65536) - 32768 for i in range(n)]
                    data = b"FAKEAUD" + struct.pack("<II", rate, n) + struct.pack(f"<{n}h", *samples)
                    meta = {"format": "FAKEAUD", "width": None, "height": None,
                            "sample_rate": rate, "duration_ms": 1000 * n // rate}
                    rows.append((did, "audio", data, meta))
                else:
                    nf, w, h = 2 + did % 5, 4 + did % 4, 4 + did % 3
                    frames = b"".join(
                        bytes((did * 31 + f * 911 + i * 7) % 256 for i in range(w * h))
                        for f in range(nf)
                    )
                    data = b"FAKEVID" + struct.pack("<HHH", nf, w, h) + frames
                    meta = {"format": "FAKEVID", "width": w, "height": h,
                            "sample_rate": None, "duration_ms": None}
                    rows.append((did, "video", data, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "data", "meta"])

    return docs.select("doc_id").mapInPandas(gen, schema=MEDIA_SCHEMA)


@query(
    "m01_image_features",
    oracle="""
    WITH imgs AS (
      SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h
      FROM documents WHERE doc_id % 3 = 0
    ),
    px AS (
      SELECT doc_id, w, h, (doc_id*31 + i*7) % 256 AS p
      FROM imgs, LATERAL (SELECT unnest(generate_series(0, w*h - 1)) AS i)
    )
    SELECT doc_id AS media_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(SUM(p) AS BIGINT) AS intensity_sum,
           CAST(SUM(CASE WHEN p < 32 THEN 1 ELSE 0 END) AS BIGINT) AS hist0
    FROM px GROUP BY doc_id, w, h ORDER BY media_id
    """,
)
def m01(spark, sf_dir):
    """Image decode + feature extraction over binary media columns
    (mapInPandas, Arrow batches).  intensity_sum is recovered exactly from
    the pipeline's mean (sum < 2^53, so round(mean*n) is exact) — a
    byte-level equality check on the decode path."""
    media = fake_media(load(spark, sf_dir, "documents"))
    feats = image_features(media)
    n_px = F.col("width") * F.col("height")
    return (
        feats.filter(F.col("error").isNull())
        .select(
            "media_id",
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"),
            F.round(F.col("mean_intensity") * n_px).cast("long").alias("intensity_sum"),
            F.col("histogram")[0].alias("hist0"),
        )
        .orderBy("media_id")
    )


@query(
    "m02_audio_features",
    oracle="""
    WITH auds AS (
      SELECT doc_id, 8000 + (doc_id % 4) * 4000 AS rate, 16 + doc_id % 32 AS n
      FROM documents WHERE doc_id % 3 = 1
    ),
    smp AS (
      SELECT doc_id, rate, n, ((doc_id*13 + i*17) % 65536) - 32768 AS s
      FROM auds, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i)
    )
    SELECT doc_id AS media_id,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(SUM(s * s) AS BIGINT) AS sum_sq
    FROM smp GROUP BY doc_id, rate, n ORDER BY media_id
    """,
)
def m02(spark, sf_dir):
    """Audio decode + RMS over binary media (mapInPandas).  sum_sq is
    recovered exactly from rms (round(rms^2 * n); sums < 2^53)."""
    media = fake_media(load(spark, sf_dir, "documents"))
    feats = audio_features(media)
    return (
        feats.filter(F.col("error").isNull())
        .select(
            "media_id",
            F.col("sample_rate").cast("long").alias("sample_rate"),
            F.col("n_samples").alias("n_samples"),
            F.round(F.col("rms") * F.col("rms") * F.col("n_samples")).cast("long").alias("sum_sq"),
        )
        .orderBy("media_id")
    )


_FRAME_SUM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("checksum", T.LongType(), True),
    ]
)


@query(
    "m03_video_frame_sample",
    oracle="""
    WITH vids AS (
      SELECT doc_id, 2 + doc_id % 5 AS nf, 4 + doc_id % 4 AS w, 4 + doc_id % 3 AS h
      FROM documents WHERE doc_id % 3 = 2
    ),
    sampled AS (
      SELECT doc_id, nf, w, h, f
      FROM vids, LATERAL (SELECT unnest(generate_series(0, nf - 1, 2)) AS f)
    ),
    px AS (
      SELECT doc_id, w, h, f, (doc_id*31 + f*911 + i*7) % 256 AS p
      FROM sampled, LATERAL (SELECT unnest(generate_series(0, w*h - 1)) AS i)
    )
    SELECT doc_id AS media_id,
           CAST(f AS BIGINT) AS frame_index,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(SUM(p) AS BIGINT) AS checksum
    FROM px GROUP BY doc_id, f, w, h ORDER BY media_id, frame_index
    """,
)
def m03(spark, sf_dir):
    """Video demux + stride-2 frame sampling (mapInPandas explode to one
    row per frame), then a second Arrow pass computing a byte checksum of
    each sampled frame — two chained mapInPandas stages, the exact shape a
    caption/embedding stage consumes at scale."""
    media = fake_media(load(spark, sf_dir, "documents"))
    frames = sample_frames(media, stride=2)

    def checksum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "frame_index": pdf["frame_index"].astype("int64"),
                    "width": pdf["width"].astype("int64"),
                    "height": pdf["height"].astype("int64"),
                    "checksum": [sum(bytes(b)) for b in pdf["frame"]],
                }
            )

    return frames.mapInPandas(checksum, schema=_FRAME_SUM_SCHEMA).orderBy(
        "media_id", "frame_index"
    )


_FRAME_FP_SCHEMA = T.StructType(
    [
        T.StructField("width", T.LongType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("fp", T.StringType(), False),
    ]
)


@query(
    "m04_frame_dedup",
    oracle="""
    WITH vids AS (
      SELECT doc_id, 2 + doc_id % 5 AS nf, 4 + doc_id % 4 AS w, 4 + doc_id % 3 AS h
      FROM documents WHERE doc_id % 3 = 2
    ),
    frames AS (
      SELECT doc_id, w, h, (doc_id*31 + f*911) % 256 AS base
      FROM vids, LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS f)
    ),
    groups AS (
      SELECT w, h, base, COUNT(*) AS c FROM frames GROUP BY w, h, base
    )
    SELECT CAST(SUM(c) AS BIGINT) AS n_frames,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_frames,
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
           CAST(MAX(c) AS BIGINT) AS max_group_size
    FROM groups
    """,
)
def m04(spark, sf_dir):
    """Cross-video frame-level exact dedup: demux every video into frames
    (Arrow mapInPandas), fingerprint the raw frame BYTES (md5), and count
    duplicate groups — the media twin of d01, the first pass a video
    training pipeline runs so repeated intros/stills don't dominate.

    The oracle never sees the bytes: fake frames are fully determined by
    (width, height, (31*doc_id + 911*frame) mod 256), so DuckDB counts
    duplicate groups from that signature while Spark hashes the actual
    decoded frames — independent derivations of the same partition.
    Shuffle carries 16-byte fingerprints, never frames; at scale this is
    the hash-groupBy dedup shape with frame bytes staying columnar in
    Arrow batches."""
    import hashlib

    media = fake_media(load(spark, sf_dir, "documents"))
    frames = sample_frames(media, stride=1)

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "width": pdf["width"].astype("int64"),
                    "height": pdf["height"].astype("int64"),
                    "fp": [hashlib.md5(bytes(b)).hexdigest() for b in pdf["frame"]],
                }
            )

    groups = (
        frames.mapInPandas(fingerprint, schema=_FRAME_FP_SCHEMA)
        .groupBy("width", "height", "fp")
        .agg(F.count("*").alias("c"))
    )
    return groups.agg(
        F.sum("c").cast("long").alias("n_frames"),
        F.count("*").cast("long").alias("n_distinct_frames"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).cast("long").alias("n_dup_groups"),
        F.max("c").cast("long").alias("max_group_size"),
    )


@query(
    "m05_scene_changes",
    oracle="""
    WITH vids AS (
      SELECT doc_id, 2 + doc_id % 5 AS nf,
             (4 + doc_id % 4) * (4 + doc_id % 3) AS size
      FROM documents WHERE doc_id % 3 = 2
    ),
    pairs AS (
      SELECT doc_id, size, (doc_id*31 + f*911) % 256 AS a
      FROM vids, LATERAL (SELECT unnest(generate_series(0, nf - 2)) AS f)
    ),
    mads AS (
      -- consecutive fake frames differ by +143 mod 256 per pixel, so
      -- |diff| is 143 where (a + i*7) % 256 < 113 and 113 elsewhere
      SELECT doc_id, size,
             143 * (SELECT COUNT(*) FROM (SELECT unnest(generate_series(0, size - 1)) AS i)
                    WHERE (a + i*7) % 256 < 113)
             + 113 * (size - (SELECT COUNT(*) FROM (SELECT unnest(generate_series(0, size - 1)) AS i)
                              WHERE (a + i*7) % 256 < 113)) AS scaled
      FROM pairs
    )
    SELECT doc_id AS media_id,
           CAST(MAX(nf_tab.nf) AS INT) AS n_frames,
           CAST(SUM(CASE WHEN scaled > 127 * size THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boundaries,
           CAST(SUM(scaled) AS BIGINT) AS total_mad_scaled
    FROM mads JOIN (SELECT doc_id AS d2, nf FROM vids) nf_tab ON nf_tab.d2 = mads.doc_id
    GROUP BY doc_id ORDER BY media_id
    """,
)
def m05(spark, sf_dir):
    """Scene-change detection per video: integer-scaled mean-absolute
    frame difference with a boundary threshold, computed from the REAL
    decoded frame bytes in one shuffle-free ``mapInPandas`` pass
    (``scene_change_stats``).  The oracle reconstructs the identical
    statistics from the closed-form fake-pixel formula — consecutive
    frames differ by +143 mod 256 per pixel, so the per-pixel |diff| is
    143 or 113 depending on wrap-around — an independent derivation that
    hash-matches only if the byte-level demux and the numpy diff are
    both exact."""
    from .multimodal import scene_change_stats

    media = fake_media(load(spark, sf_dir, "documents"))
    return scene_change_stats(media, threshold=127).orderBy("media_id")


@query(
    "m06_audio_vad_segments",
    oracle="""
    WITH auds AS (
      SELECT doc_id, 16 + doc_id % 32 AS n
      FROM documents WHERE doc_id % 3 = 1
    ),
    smp AS (
      SELECT doc_id, n, i, ABS(((doc_id*13 + i*17) % 65536) - 32768) AS a
      FROM auds, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i)
    ),
    win AS (
      SELECT doc_id, i // 8 AS w_idx, SUM(a) AS e
      FROM smp WHERE i < (n // 8) * 8
      GROUP BY doc_id, i // 8
    ),
    voiced AS (SELECT doc_id, w_idx, e FROM win WHERE e > 131072),
    marked AS (
      SELECT doc_id, w_idx, e,
             CASE WHEN w_idx - 1 = lag(w_idx) OVER (PARTITION BY doc_id ORDER BY w_idx)
                  THEN 0 ELSE 1 END AS ni
      FROM voiced
    ),
    isl AS (
      SELECT doc_id, w_idx, e,
             SUM(ni) OVER (PARTITION BY doc_id ORDER BY w_idx ROWS UNBOUNDED PRECEDING) AS seg
      FROM marked
    )
    SELECT doc_id AS media_id,
           MIN(w_idx) AS seg_start,
           MAX(w_idx) AS seg_end,
           COUNT(*) AS n_windows,
           CAST(SUM(e) AS BIGINT) AS energy
    FROM isl GROUP BY doc_id, seg
    ORDER BY media_id, seg_start
    """,
)
def m06(spark, sf_dir):
    """Voice-activity segmentation through the gate: 8-sample windows,
    |int16| energy > 131072 (the 8 x 16384 midline, so the deterministic
    fake waveform yields a genuine voiced/unvoiced mix), consecutive
    voiced windows merged row-locally into maximal segments — all inside
    one shuffle-free mapInPandas pass (m05's scene-detection shape, on
    audio).  The oracle re-derives windows, thresholds and the island
    merge relationally from the closed-form fake-sample formula, so
    segment boundaries and integer energies match exactly."""
    media = fake_media(load(spark, sf_dir, "documents"))
    return vad_segments(media, win=8, threshold=131072).orderBy(
        "media_id", "seg_start"
    )


# ----------------------------------------------- m07 perceptual-hash dedup
_M07_TWIN_OFFSET = 10_000_000  # twin media_id = doc_id + offset
_M07_EDIT_BITS = (17, 41)  # sample positions the twin's edit touches
_M07_HAM_T = 3  # with 4 bands of 15 bits, ham <= 3 guarantees a band match


def fake_image_pairs(docs: DataFrame) -> DataFrame:
    """Image corpus WITH PLANTED NEAR-DUPLICATES: every image doc yields
    its base image (media_id = doc_id) plus an edited twin (media_id =
    doc_id + {offset}) whose pixels at the sample positions of hash bits
    {bits} are shifted by +128 mod 256 — each edit crosses the fixed 127
    threshold, so the twin's block-hash differs in EXACTLY those bits
    (hamming 2).  The synthetic corpus is otherwise hash-random, so the
    banded join's candidate set is dominated by the planted pairs — the
    non-vacuity trick s03b uses, applied to media."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import AHASH_BITS

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 8, 8 + did % 5
                n = w * h
                px = [(did * 31 + i * 7) % 256 for i in range(n)]
                meta = {"format": "FAKEIMG", "width": w, "height": h,
                        "sample_rate": None, "duration_ms": None}
                rows.append(
                    (did, "image",
                     b"FAKEIMG" + struct.pack("<HH", w, h) + bytes(px), meta)
                )
                edited = list(px)
                for k in _M07_EDIT_BITS:
                    idx = k * n // AHASH_BITS
                    edited[idx] = (edited[idx] + 128) % 256
                rows.append(
                    (did + _M07_TWIN_OFFSET, "image",
                     b"FAKEIMG" + struct.pack("<HH", w, h) + bytes(edited), meta)
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "data", "meta"])

    return (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


@query(
    "m07_image_phash_neardup",
    oracle=f"""
    WITH imgs AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h
                  FROM documents WHERE doc_id % 3 = 0),
    base AS (
      SELECT doc_id AS media_id, doc_id AS id, w, h, 0 AS twin FROM imgs
      UNION ALL
      SELECT doc_id + {_M07_TWIN_OFFSET}, doc_id, w, h, 1 FROM imgs
    ),
    bits AS (
      SELECT media_id, k,
             CASE WHEN ((id*31 + ((k*(w*h))//60)*7
                         + CASE WHEN twin = 1
                                AND (k*(w*h))//60 IN ((17*(w*h))//60, (41*(w*h))//60)
                                THEN 128 ELSE 0 END) % 256) > 127
                  THEN 1 ELSE 0 END AS bit
      FROM base, LATERAL (SELECT unnest(generate_series(0, 59)) AS k)
    ),
    hashes AS (
      SELECT media_id,
             CAST(SUM(bit * (CAST(1 AS BIGINT) << CAST(k AS INT))) AS BIGINT) AS ahash
      FROM bits GROUP BY media_id
    )
    SELECT a.media_id AS media_a, b.media_id AS media_b,
           CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
    FROM hashes a JOIN hashes b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.ahash, b.ahash)) <= {_M07_HAM_T}
    ORDER BY media_a, media_b
    """,
)
def m07(spark, sf_dir):
    """Image NEAR-DUPLICATE detection by banded perceptual hash — m04
    dedupes exact frame bytes; this catches edited/re-encoded copies.
    Pipeline: binary decode -> 60-bit block-hash (mapInPandas, row-local)
    -> LSH banding (4 bands x 15 bits) -> band-equality EQUI-join for
    candidates -> exact hamming verify (bit_count(xor), JVM).

    Scale shape: the only shuffle carries (media_id, ahash, band) rows —
    16 bytes x 4 per image, never pixels; candidates are band-bucket
    bounded exactly like d02's MinHash bands; pigeonhole guarantees every
    pair within hamming {_M07_HAM_T} shares >= 1 of the 4 bands, so the
    banded candidate set is EXHAUSTIVE for the threshold (the oracle's
    all-pairs formulation is the same set by construction, not an
    approximation)."""
    from ..checkpointing import stable_checkpoint
    from .multimodal import image_ahash

    media = fake_image_pairs(load(spark, sf_dir, "documents"))
    # eager checkpoint (d03's fingerprint rule: a lazy checkpoint is not
    # shared between two join sides within a single action): hashes
    # feeds BOTH sides of the band self-join, and without materialization
    # the whole Python generate->PNG-encode->decode->ahash pipeline ran
    # TWICE per query (r15 plan audit: 4 Arrow nodes, two full
    # mapInPandas chains).  The fingerprint table is n x 16 bytes —
    # the production shape stores it once and joins it many times.
    hashes = (
        image_ahash(media)
        .filter(F.col("error").isNull())
        .select("media_id", "ahash")
        .transform(stable_checkpoint, eager=True)
    )
    bands = hashes.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.shiftright("ahash", 15 * b).bitwiseAND(F.lit(32767)).alias("band_val"),
                )
                for b in range(4)
            ])
        ).alias("bd"),
    ).select("media_id", "ahash", "bd.band_id", "bd.band_val")
    a = bands.select(
        F.col("media_id").alias("media_a"), F.col("ahash").alias("ha"),
        "band_id", "band_val",
    )
    b = bands.select(
        F.col("media_id").alias("media_b"), F.col("ahash").alias("hb"),
        "band_id", "band_val",
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("media_a") < F.col("media_b"))
        # a pair agreeing on several bands appears once per band -> dedup
        # BEFORE the (cheap) hamming verify, mirroring d02/s03
        .dropDuplicates(["media_a", "media_b"])
        .filter(ham <= _M07_HAM_T)
        .select("media_a", "media_b", ham.alias("hamming"))
        .orderBy("media_a", "media_b")
    )


@query(
    "m08_image_resize_facets",
    oracle="""
    WITH imgs AS (
      SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h
      FROM documents WHERE doc_id % 3 = 0
    ),
    rp AS (
      SELECT doc_id, x, y,
             (doc_id*31
              + (LEAST(h-1, (y*h)//4) * w + LEAST(w-1, (x*w)//4)) * 7) % 256 AS p
      FROM imgs,
           LATERAL (SELECT unnest(generate_series(0, 3)) AS y),
           LATERAL (SELECT unnest(generate_series(0, 3)) AS x)
    )
    SELECT doc_id AS media_id,
           CAST(4 AS BIGINT) AS width,
           CAST(4 AS BIGINT) AS height,
           CAST(SUM(p) AS BIGINT) AS intensity_sum,
           CAST(SUM(CASE WHEN p < 32 THEN 1 ELSE 0 END) AS BIGINT) AS hist0
    FROM rp GROUP BY doc_id ORDER BY media_id
    """,
)
def m08(spark, sf_dir):
    """RESIZE pipeline gate: images run through the real binary
    resize operator (nearest-neighbor 4x4, mapInPandas: decode -> sample
    grid -> re-encode container) and the resized CONTAINER is then
    decoded AGAIN by image_features — so the oracle's closed-form facet
    check (intensity sum + dark-pixel histogram bin over the 16 resized
    pixels) verifies the resize's per-pixel source indexing and the
    re-encoded bytes end-to-end, not just the metadata.  m01 gates the
    decode path; this gates decode -> transform -> encode -> decode.

    Scale shape: two chained row-local Arrow passes, shuffle-free; the
    resized payload (16 bytes + header) is what a thumbnail/preprocess
    stage would actually materialize at 100 TB."""
    from .multimodal import image_features, resize_images

    media = fake_media(load(spark, sf_dir, "documents"))
    resized = resize_images(media, 4, 4)
    feats = image_features(resized)
    n_px = F.col("width") * F.col("height")
    return (
        feats.filter(F.col("error").isNull())
        .select(
            "media_id",
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"),
            F.round(F.col("mean_intensity") * n_px).cast("long").alias("intensity_sum"),
            F.col("histogram")[0].alias("hist0"),
        )
        .orderBy("media_id")
    )
