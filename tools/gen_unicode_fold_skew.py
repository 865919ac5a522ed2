#!/usr/bin/env python
"""Measure the Unicode-version skew between the two engines' case-fold
primitives and emit (or check) the supplement constants the shared
``lower_markstrip`` helpers carry.

Why this exists: the engine's fold is Java's ``lower()`` + ``\\p{Mn}``
strip; the oracle's is utf8proc's (DuckDB).  The two trail the Unicode
standard by different amounts in BOTH directions — measured 2026-08-16
on this Spark/JVM + DuckDB pair, a full-codepoint-space sweep (~1.1M
codepoints) found 218 divergent codepoints:

- 147 combining marks (Unicode 14+ additions such as U+0898.. Arabic
  marks, U+1ACC.. extended combining, the whole U+1CF00.. Znamenny
  block) that utf8proc strips as ``\\p{Mn}`` but Java's older regex
  tables do not know — the ENGINE must strip them explicitly.
- 70 uppercase letters (Vithkuqi U+10570.., Latin Extended-D additions
  such as U+A7C0/U+A7CB->U+0264, Cyrillic U+1C89) that the JVM lowers
  but utf8proc's case tables keep — the ORACLE must map them before
  ``lower()``.
- 1 reclassified char (U+1734 HANUNOO PAMUDPOD, Mn in older tables, Mc
  now) that Java still strips as ``\\p{Mn}`` but utf8proc no longer
  does — the ORACLE must strip it explicitly.

With the supplements, both folds compute the UNION semantic — fold per
the newest tables either engine knows — so a multilingual corpus
fingerprints identically on both engines across the entire codepoint
space (tests/test_unicode_fold_skew.py asserts zero divergence over a
candidate sweep; this tool's --check re-runs the full space).

One divergence class is NOT per-codepoint and therefore not in these
constants: Java's lower() applies the Unicode Final_Sigma CONTEXT rule
(word-final Σ -> ς) where utf8proc lowers every Σ ->
σ.  Both folds close it by normalizing ς -> σ after
lower (Unicode case FOLDING maps both sigma forms to σ);
tests/test_unicode_fold_skew.py pins the context cases.

Run after ANY Spark/JVM or DuckDB upgrade:
  python tools/gen_unicode_fold_skew.py          # print fresh constants
  python tools/gen_unicode_fold_skew.py --check  # exit non-zero on drift
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _all_codepoints():
    return [cp for cp in range(0x20, 0x110000) if not (0xD800 <= cp <= 0xDFFF)]


def measure_baseline_skew():
    """Full-space sweep of the RAW (unsupplemented) fold primitives.
    Returns (eng_strip, ora_strip, ora_lower) codepoint sets/maps."""
    import duckdb
    import pyarrow as pa
    from pyspark.sql import functions as F

    from jena_fuseki_kafka_spark.session import build_session

    cps = _all_codepoints()
    tbl = pa.table(
        {"id": pa.array(cps, pa.int64()), "s": [f"a{chr(cp)}b" for cp in cps]}
    )

    spark = build_session(
        app_name="fold-skew-audit", master="local[16]", shuffle_partitions=16
    )
    df = spark.createDataFrame(tbl.to_pandas())
    raw_spark = F.regexp_replace(F.lower(F.col("s")), r"\p{Mn}", "")
    out = df.select("id", raw_spark.alias("c")).toPandas()
    got_s = dict(zip(out["id"], out["c"]))
    spark.stop()

    con = duckdb.connect()
    con.register("tbl", tbl)
    got_d = dict(
        con.execute(
            "SELECT id, regexp_replace(lower(s), '\\p{Mn}', '', 'g') FROM tbl"
        ).fetchall()
    )

    eng_strip, ora_strip, ora_lower, odd = [], [], {}, []
    for cp in cps:
        inp, sp, du = f"a{chr(cp)}b", got_s[cp], got_d[cp]
        if sp == du:
            continue
        if du == "ab" and sp == inp:
            eng_strip.append(cp)  # utf8proc strips; Java must too
        elif sp == "ab" and du == inp:
            ora_strip.append(cp)  # Java strips; utf8proc must too
        elif du == inp and len(sp) == 3 and sp != inp:
            ora_lower[cp] = ord(sp[1])  # JVM lowers; utf8proc must too
        else:
            odd.append((cp, inp, sp, du))
    if odd:
        raise SystemExit(
            f"unclassifiable divergences (new skew shape — extend the "
            f"supplement model): {odd[:10]}"
        )
    return eng_strip, ora_strip, ora_lower


def fmt(cps) -> str:
    return '"' + "".join(f"\\U{cp:08x}" if cp > 0xFFFF else f"\\u{cp:04x}" for cp in cps) + '"'


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    eng_strip, ora_strip, ora_lower = measure_baseline_skew()
    uppers = sorted(ora_lower)
    lowers = [ora_lower[u] for u in uppers]

    if args.check:
        from jena_fuseki_kafka_spark import queries as q

        want = {
            "_FOLD_ENGINE_STRIP": "".join(map(chr, sorted(eng_strip))),
            "_FOLD_ORACLE_STRIP": "".join(map(chr, sorted(ora_strip))),
            "_FOLD_ORACLE_UPPER": "".join(map(chr, uppers)),
            "_FOLD_ORACLE_LOWER": "".join(map(chr, lowers)),
        }
        drift = [k for k, v in want.items() if getattr(q, k) != v]
        if drift:
            print(f"DRIFT in {drift}: an engine upgrade moved the Unicode skew —")
            print("regenerate with: python tools/gen_unicode_fold_skew.py")
            return 1
        print(
            f"constants match measurement ({len(eng_strip)} engine-strip, "
            f"{len(ora_strip)} oracle-strip, {len(uppers)} oracle-lower pairs)"
        )
        return 0

    print(f"# generated by tools/gen_unicode_fold_skew.py — "
          f"{len(eng_strip)}+{len(ora_strip)}+{len(uppers)} codepoints")
    print(f"_FOLD_ENGINE_STRIP = {fmt(sorted(eng_strip))}")
    print(f"_FOLD_ORACLE_STRIP = {fmt(sorted(ora_strip))}")
    print(f"_FOLD_ORACLE_UPPER = {fmt(uppers)}")
    print(f"_FOLD_ORACLE_LOWER = {fmt(lowers)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
