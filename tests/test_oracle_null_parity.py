"""NULL-propagation parity tripwire for the oracle SQL surface.

r13's part-supplier-edge corpus caught a real engine-primitive
divergence: DuckDB's ``split_part`` returns ``''`` on NULL input where
Spark (and Postgres) return NULL, which split q17's ``type_mid`` on a
NULL ``p_type`` row.  A same-session audit of every scalar function any
oracle uses found the full non-NULL-propagating DuckDB set to be
``{split_part, concat, concat_ws, greatest, least, list_sum}`` — of
which concat_ws/greatest/least skip NULLs identically on BOTH engines
(no hazard), bare ``concat`` appears in no oracle (they use the
NULL-propagating ``||``), list_sum's NULL-element skipping is why
malformed embeddings are quarantined at the scan, and split_part now
carries an IS NULL CASE mirror in q17's oracle.

These tests pin each leg of that audit so it cannot silently rot:
a new oracle adopting a hazard function, a DuckDB upgrade changing a
primitive's NULL behavior, or a Spark upgrade breaking the "skips
NULLs on both engines" class all fail here, cheaply (one DuckDB
connection, one trivial Spark row).
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from jena_fuseki_kafka_spark.queries import ORACLES


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_no_oracle_uses_bare_concat():
    # DuckDB concat SKIPS NULL args; Spark F.concat NULL-poisons.  The
    # oracles must stick to `||`, which NULL-propagates on both.
    offenders = [
        name for name, sql in ORACLES.items()
        if re.search(r"(?<![a-z_])concat\s*\(", sql, re.I)
        and not re.search(r"(?<![a-z_])concat_ws\s*\(", sql, re.I)
    ]
    # concat_ws is allowed (NULL-skipping on BOTH engines); a name that
    # has bare concat alongside concat_ws would hide in the filter
    # above, so check precisely: strip concat_ws tokens, then look.
    precise = [
        name for name, sql in ORACLES.items()
        if re.search(r"(?<![a-z_])concat\s*\(", re.sub(r"concat_ws", "", sql, flags=re.I), re.I)
    ]
    assert offenders == [] and precise == [], (offenders, precise)


def test_split_part_sites_are_null_guarded():
    # Every oracle-side split_part must sit behind an IS NULL CASE on
    # ITS OWN first argument (DuckDB: split_part(NULL,..) = '', not
    # NULL).  The guard is matched against the extracted argument, not
    # just counted — an unrelated NULL CASE elsewhere in the SQL must
    # not mask an unguarded call (ADVICE r13).
    for name, sql in ORACLES.items():
        n_calls = len(re.findall(r"split_part\s*\(", sql, re.I))
        sites = list(re.finditer(r"split_part\s*\(\s*([A-Za-z0-9_.]+)\s*,", sql, re.I))
        # a call whose first argument is an expression (parens, casts)
        # slips the extractor — fail loudly instead of silently skipping
        assert len(sites) == n_calls, (
            f"{name}: {n_calls} split_part call(s) but only {len(sites)} "
            "with an extractable simple-column first argument — extend "
            "the extractor before adding expression-argument calls"
        )
        # one PRECEDING guard per CALL, counted by call rank: the i-th
        # call on a column needs >= i guards on that column strictly
        # before its own position, so a single guarded site can never
        # whitelist a later bare call on the same column, and guards
        # stacked after a bare call don't count for it (review r14, two
        # passes: the positional-only check AND the global per-arg
        # count check each admitted a bypass on their own)
        #
        # Known strictness (ADVICE r14): a single dominating guard whose
        # ELSE branch nests MULTIPLE split_part calls on the same column
        # — 'CASE WHEN c IS NULL THEN NULL ELSE f(split_part(c,..),
        # split_part(c,..)) END' — is legitimately guarded but counts
        # only ONE preceding guard, so this check false-fails it.  That
        # failure is LOUD (the fix is to repeat the guard per call or
        # extend this rule to credit a dominating guard), never a silent
        # admit, so the strictness is kept until the pattern appears in
        # a real oracle.
        rank: dict[str, int] = {}
        for m in sites:
            arg = m.group(1)
            rank[arg] = rank.get(arg, 0) + 1
            guard = (
                r"CASE\s+WHEN\s+" + re.escape(arg) + r"\s+IS\s+NULL\s+THEN\s+NULL"
            )
            n_preceding = len(re.findall(guard, sql[: m.start()], re.I))
            assert n_preceding >= rank[arg], (
                f"{name}: call #{rank[arg]} of split_part({arg}, ...) has "
                f"only {n_preceding} preceding "
                f"'CASE WHEN {arg} IS NULL THEN NULL' guard(s) — DuckDB "
                "split_part returns '' on NULL input where Spark "
                "returns NULL"
            )


def test_duckdb_null_behavior_pins(con):
    # The audited DuckDB facts the oracles' guards are built on.  A
    # DuckDB upgrade flipping any of these invalidates a documented
    # mirror (q17's split_part CASE, the embeddings quarantine
    # rationale) — fail loudly so the mirror gets re-justified.
    row = con.execute(
        "SELECT split_part(NULL::VARCHAR,' ',2),"
        "       concat(NULL::VARCHAR,'a'),"
        "       concat_ws(',',NULL::VARCHAR,'a'),"
        "       greatest(NULL::DOUBLE, 1.0),"
        "       least(NULL::DOUBLE, 1.0),"
        "       list_sum([1.0, NULL])"
    ).fetchone()
    assert row[0] == ""        # split_part: non-propagating ('' on NULL)
    assert row[1] == "a"       # concat: skips NULL args
    assert row[2] == "a"       # concat_ws: skips NULL args
    assert row[3] == 1.0       # greatest: ignores NULL
    assert row[4] == 1.0       # least: ignores NULL
    assert float(row[5]) == 1.0  # list_sum: SKIPS NULL elements


def test_spark_side_class_semantics(spark):
    # The "safe on both engines" class must stay safe on the Spark
    # side, and split_part must stay NULL-propagating (the engine-side
    # semantic q17 keeps).
    row = (
        spark.range(1)
        .select(
            F.expr("split_part(CAST(NULL AS STRING), ' ', 2)").alias("sp"),
            F.concat_ws(",", F.lit(None).cast("string"), F.lit("a")).alias("cw"),
            F.greatest(F.lit(None).cast("double"), F.lit(1.0)).alias("g"),
            F.least(F.lit(None).cast("double"), F.lit(1.0)).alias("l"),
            F.concat(F.lit(None).cast("string"), F.lit("a")).alias("c"),
        )
        .first()
    )
    assert row["sp"] is None   # split_part NULL-propagates in Spark
    assert row["cw"] == "a"    # concat_ws skips NULLs (matches DuckDB)
    assert row["g"] == 1.0     # greatest ignores NULL (matches DuckDB)
    assert row["l"] == 1.0     # least ignores NULL (matches DuckDB)
    assert row["c"] is None    # concat NULL-poisons — why oracles use ||
