"""Pins the Unicode-version skew supplements on the shared case fold.

The engine folds with Java's ``lower()`` + ``\\p{Mn}`` strip, the oracle
with utf8proc's (DuckDB); the two trail the Unicode standard by
different amounts in BOTH directions, so the raw primitives diverge on
218 codepoints (147 marks utf8proc strips that Java's regex tables miss,
70 uppers the JVM lowers that utf8proc keeps, and U+1734 — reclassified
Mn->Mc — which Java strips but utf8proc no longer does).  The
supplements in ``queries.lower_markstrip_spark/_sql`` close all of it to
the UNION semantic; this test sweeps every cased/mark candidate plus all
supplemented codepoints through BOTH engines in one job and requires
ZERO divergence — a Spark/JVM or DuckDB upgrade that moves either
engine's tables fails here and points at the codepoints (regenerate the
constants with tools/gen_unicode_fold_skew.py).
"""

from __future__ import annotations

import unicodedata

import duckdb
import pyarrow as pa
from pyspark.sql import functions as F

from jena_fuseki_kafka_spark.queries import (
    _FOLD_ENGINE_STRIP,
    _FOLD_ORACLE_LOWER,
    _FOLD_ORACLE_STRIP,
    _FOLD_ORACLE_UPPER,
    lower_markstrip_spark,
    lower_markstrip_sql,
)


def test_supplement_constants_well_formed():
    assert len(_FOLD_ORACLE_UPPER) == len(_FOLD_ORACLE_LOWER), (
        "translate() from/to must map 1:1"
    )
    assert len(_FOLD_ENGINE_STRIP) > 0 and len(_FOLD_ORACLE_STRIP) > 0
    # no regex metacharacters may leak into the character classes
    for ch in _FOLD_ENGINE_STRIP + _FOLD_ORACLE_STRIP:
        assert ord(ch) > 0x7F, f"ASCII char {ch!r} in a strip class"
    # the three sets must be disjoint (a codepoint can't need both fixes)
    assert not (set(_FOLD_ENGINE_STRIP) & set(_FOLD_ORACLE_STRIP))
    assert not (set(_FOLD_ENGINE_STRIP) & set(_FOLD_ORACLE_UPPER))


def test_fold_divergence_free_across_candidate_space(spark):
    """Every cased/mark codepoint (per Python's tables) plus every
    supplemented codepoint (which Python's tables may not know), folded
    by both engines: zero divergence."""
    cands = {ord(c) for c in _FOLD_ENGINE_STRIP + _FOLD_ORACLE_STRIP + _FOLD_ORACLE_UPPER}
    for cp in range(0x20, 0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        if unicodedata.category(chr(cp)) in ("Lu", "Ll", "Lt", "Mn", "Mc"):
            cands.add(cp)
    cands = sorted(cands)
    tbl = pa.table(
        {"id": pa.array(cands, pa.int64()), "s": [f"a{chr(c)}b" for c in cands]}
    )
    df = spark.createDataFrame(tbl.to_pandas())
    out = df.select("id", lower_markstrip_spark(F.col("s")).alias("c")).toPandas()
    got_spark = dict(zip(out["id"], out["c"]))

    con = duckdb.connect()
    con.register("tbl", tbl)
    got_duck = dict(
        con.execute(f"SELECT id, {lower_markstrip_sql('s')} FROM tbl").fetchall()
    )

    bad = [
        (hex(c), f"a{chr(c)}b", got_spark[c], got_duck[c])
        for c in cands
        if got_spark[c] != got_duck[c]
    ]
    assert bad == [], (
        f"{len(bad)} divergent codepoints (engine upgrade moved the skew; "
        f"regenerate via tools/gen_unicode_fold_skew.py): {bad[:10]}"
    )


def test_mixed_content_fingerprint_parity(spark):
    """One string mixing every skew class (Vithkuqi upper, Latin Ext-D
    upper, new combining marks, the reclassified U+1734, the U+0130
    class, ASCII) must canon-fold byte-identically on both engines —
    this is the exact fingerprint input class (t04/d01/p02) at 100 TB
    multilingual scale."""
    from jena_fuseki_kafka_spark.queries import canon_text_spark, canon_text_sql

    cases = [
        "Xx \U00010570Ꟁ᫁࢘ \U0001CF00 ᜴ İçerïk straße ΣΣ",
        # final-sigma contexts: Java's lower() applies the Unicode
        # Final_Sigma rule (word-final Σ -> ς) where utf8proc lowers
        # every Σ -> σ; both folds normalize ς -> σ (Unicode case
        # FOLDING maps both sigma forms there), so all of these agree
        "ΑΣ", "Σ", "ΑΣ Β", "ΑΣ.", "ςσΣ", "ΟΔΥΣΣΕΥΣ και ο ΣΙΣΥΦΟΣ",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id long, s string"
    )
    got_spark = [
        r["c"]
        for r in df.select("id", canon_text_spark(F.col("s")).alias("c"))
        .orderBy("id")
        .collect()
    ]
    con = duckdb.connect()
    for c, a in zip(cases, got_spark):
        b = con.execute(
            f"SELECT {canon_text_sql('s')} FROM (SELECT ? AS s)", [c]
        ).fetchone()[0]
        assert a == b, f"{c!r}: spark={a!r} duck={b!r}"
