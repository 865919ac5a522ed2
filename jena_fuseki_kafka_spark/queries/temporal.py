"""Temporal join operators: as-of join and interval (range) join.

Spark has no native ASOF or range join; both are implemented here as
compositions of built-in operators chosen for the 100 TB path (the task
the reference's event stream feeds — SURVEY.md §2C notes the reference
itself has no join physicalization; the relational surface is ours):

- **as-of join** (q29): union the two sides, one window pass per key.
  Exactly one shuffle (hash by user), no candidate explosion, no
  BroadcastNestedLoopJoin — the plan scales linearly in rows regardless
  of how many right-side rows precede each left row.  The naive
  formulation (theta-join on ts ranges, then max per left row) shuffles
  |L| x |matching R| pairs; this one never materializes pairs at all.
- **interval join** (q30): materialize time-bucket keys on both sides so
  the range predicate becomes an equi-join on (user, bucket) + a cheap
  residual filter.  A window of W seconds spans at most 2 buckets of
  width W, so the fan-out is a constant 2x, not |windows|.

Both are verified against DuckDB's native ASOF JOIN / inequality join —
an independent implementation, not the same algorithm re-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from . import load, query

WINDOW_SECONDS = 300  # interval-join window width


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    strict: bool = True,
    nonstrict_suffix: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest ``ts``
    <= (or < when ``strict``) the left row's ``ts``, per ``key``.

    The matched right row is carried through as ONE struct with a
    ``last(..., ignorenulls=True)`` over a RANGE window on the epoch-
    microsecond ``ts`` of the union of both sides: frame end ``-1``
    sees strictly-earlier rows (the strict arm), frame end ``0`` also
    sees equal-``ts`` rows (the tie-inclusive arm).  Carrying the whole
    row as a struct — NULL on left rows, non-NULL on every right row —
    keeps the match ATOMIC: a right row whose payload column is NULL is
    still "the match", exactly like a native ASOF join, instead of
    per-column lasts stitching a chimera from different right rows.
    With ``nonstrict_suffix`` set (only with ``strict=True``) BOTH arms
    are computed in the same Window operator — two frames, ONE shuffle
    — and the non-strict match columns land as ``f"{col}{suffix}"``.

    One shuffle on ``key``; no pairwise candidate set is ever built, so
    the operator is safe on skewed keys where a range join would
    quadratically explode.  Determinism precondition (same as any ASOF
    engine, incl. DuckDB's): at most one right row per (key, ts) — the
    caller dedupes.  NULL-``ts`` right rows are dropped before the
    union (an ASOF comparison against NULL is NULL on every engine);
    NULL-``ts`` left rows come out with NULL match columns.
    """
    if nonstrict_suffix is not None and not strict:
        raise ValueError("nonstrict_suffix requires strict=True")
    l_cols = [c for c in left.columns if c not in (key, ts)]
    r_cols = [c for c in right.columns if c not in (key, ts)]
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(overlap)}")
    if nonstrict_suffix is not None:
        if not nonstrict_suffix:
            raise ValueError("nonstrict_suffix must be non-empty")
        suffixed = {f"{c}{nonstrict_suffix}" for c in r_cols}
        suffixed.add(f"{ts}_right{nonstrict_suffix}")
        clash = suffixed & set(left.columns) | suffixed & set(r_cols)
        if clash:
            raise ValueError(f"nonstrict_suffix collides with: {sorted(clash)}")

    from pyspark.sql import types as T

    match_type = T.StructType(
        [T.StructField("__r_ts", right.schema[ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in r_cols]
    )
    l_tag = left.select(
        F.col(key), F.col(ts), F.lit(True).alias("__is_left"),
        *[F.col(c) for c in l_cols],
        F.lit(None).cast(match_type).alias("__match"),
    )
    # a NULL-ts right row can never legitimately match (every ASOF
    # comparison against NULL is NULL — DuckDB's native ASOF agrees), and
    # under a range frame Spark groups NULL ordering values together, so
    # an unfiltered NULL-ts right row WOULD match a NULL-ts left row.
    # Drop them before the union; NULL-ts left rows still come out with
    # NULL match columns (left-join semantics).
    r_tag = right.filter(F.col(ts).isNotNull()).select(
        F.col(key), F.col(ts), F.lit(False).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        F.struct(
            F.col(ts).alias("__r_ts"), *[F.col(c) for c in r_cols]
        ).alias("__match"),
    )
    u = l_tag.unionByName(r_tag)
    # ts may arrive as TIMESTAMP_NTZ (Spark 4 parquet inference): route
    # through TIMESTAMP before unix_micros, like q30's bucket key
    tsu = F.unix_micros(F.col(ts).cast("timestamp"))
    frames = [("", -1 if strict else 0)]
    if nonstrict_suffix is not None:
        frames.append((nonstrict_suffix, 0))
    match_cols = []
    for suffix, end in frames:
        w = (
            Window.partitionBy(key)
            .orderBy(tsu)
            .rangeBetween(Window.unboundedPreceding, end)
        )
        match_cols.append(
            F.last("__match", ignorenulls=True).over(w).alias(f"__m{suffix}")
        )
    carried = u.select(key, ts, "__is_left", *l_cols, *match_cols)
    out_cols = [key, ts, *l_cols]
    for suffix, _ in frames:
        m = F.col(f"__m{suffix}")
        out_cols += [m[c].alias(f"{c}{suffix}") for c in r_cols]
        out_cols.append(m["__r_ts"].alias(f"{ts}_right{suffix}"))
    return carried.filter(F.col("__is_left")).select(*out_cols)


@query(
    "q29_asof_join",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS c_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    p AS (
      SELECT user_id, ts, event_id AS p_id FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.p_id, p.ts AS p_ts, c.c_id, c.ts AS c_ts,
           c2.c_id AS cn_id, c2.ts AS cn_ts,
           CAST(FLOOR(epoch(p.ts)) - FLOOR(epoch(c.ts)) AS BIGINT) AS staleness_s
    FROM p
    ASOF LEFT JOIN clicks c  ON p.user_id = c.user_id  AND p.ts > c.ts
    ASOF LEFT JOIN clicks c2 ON p.user_id = c2.user_id AND p.ts >= c2.ts
    ORDER BY p_id
    """,
)
def q29(spark, sf_dir):
    """As-of join: each purchase matched to the user's most recent strictly
    prior click (the feature-pipeline staple: point-in-time-correct
    attribute lookup).  Right side deduped to one row per (user, ts) with
    MAX(event_id) so ties are deterministic on any partitioning.

    Facets (widened r12): BOTH asof arms ride the gate — the strict arm
    (p.ts > c.ts) and the tie-inclusive arm (p.ts >= c.ts, where a click
    at the exact purchase timestamp counts) — verified against TWO
    chained native DuckDB ASOF LEFT JOINs, plus the match staleness in
    whole seconds (the feature-freshness metric a point-in-time pipeline
    monitors).  Both arms come out of ONE window operator with two range
    frames — one shuffle total, the scale property the plan-shape test
    pins (no join node, <=3 exchanges)."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_id")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("c_id"))
    )
    out = asof_join(
        purchases, clicks, key="user_id", ts="ts", strict=True, nonstrict_suffix="_n"
    )
    p_ts, c_ts = F.col("ts").cast("timestamp"), F.col("ts_right").cast("timestamp")
    return out.select(
        "user_id",
        "p_id",
        F.col("ts").alias("p_ts"),
        "c_id",
        F.col("ts_right").alias("c_ts"),
        F.col("c_id_n").alias("cn_id"),
        F.col("ts_right_n").alias("cn_ts"),
        (p_ts.cast("long") - c_ts.cast("long")).alias("staleness_s"),
    ).orderBy("p_id")


@query(
    "q30_interval_join",
    oracle=f"""
    SELECT e.event_id AS e_id, COUNT(v.event_id) AS n,
           COUNT(DISTINCT v.event_type) AS n_types,
           CAST(SUM(CAST(CASE WHEN isfinite(v.value) THEN v.value END
                    AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events e LEFT JOIN events v
      ON v.user_id = e.user_id
     AND v.ts >= e.ts AND v.ts <= e.ts + INTERVAL {WINDOW_SECONDS} SECOND
     AND v.event_id <> e.event_id
    WHERE e.event_type = 'error'
    GROUP BY e.event_id ORDER BY e_id
    """,
)
def q30(spark, sf_dir):
    """Interval join: events landing in the 5-minute window after each
    error by the same user.  The range predicate is rewritten to an
    equi-join on (user_id, time_bucket) — a W-second window spans at most
    2 W-wide buckets, so each error row fans out to exactly 2 join keys
    and Catalyst runs a plain shuffled hash join (a raw ts-range condition
    would pick BroadcastNestedLoopJoin and die at scale).

    Facets (widened r12): beyond the in-window event count, the distinct
    event-type census and the finite-guarded value mass of the window —
    what an incident-triage pipeline actually reads off the blast radius
    of each error.  The sum rides the shared finite_spark/finite_sql
    guard (a NaN/Inf metric inside someone's 5-minute window must not
    abort the whole report)."""
    from . import finite_spark

    ev = load(spark, sf_dir, "events")
    W = WINDOW_SECONDS
    # ts may arrive as TIMESTAMP_NTZ (Spark 4 parquet inference), which
    # cannot cast straight to long; route through TIMESTAMP first.  Any
    # epoch-linear mapping works — the bucket is only a candidate key and
    # the residual filter below compares the real timestamps.
    bucket = (F.col("ts").cast("timestamp").cast("long") / W).cast("long")

    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id"),
        F.col("event_id").alias("e_id"),
        F.col("ts").alias("e_ts"),
        F.explode(F.array(bucket, bucket + 1)).alias("b"),
    )
    others = ev.select(
        F.col("user_id"),
        F.col("event_id").alias("v_id"),
        F.col("ts").alias("v_ts"),
        F.col("event_type").alias("v_type"),
        finite_spark(F.col("value")).cast("decimal(28,6)").alias("v_val"),
        bucket.alias("b"),
    )
    pairs = errors.join(others, ["user_id", "b"]).filter(
        (F.col("v_ts") >= F.col("e_ts"))
        & (F.col("v_ts") <= F.col("e_ts") + F.expr(f"INTERVAL {W} SECONDS"))
        & (F.col("v_id") != F.col("e_id"))
    )
    counts = pairs.groupBy("e_id").agg(
        F.count("*").alias("n"),
        F.countDistinct("v_type").alias("n_types"),
        F.sum("v_val").cast("double").alias("sum_value"),
    )
    all_errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id")
    )
    return (
        all_errors.join(counts, "e_id", "left")
        .select(
            "e_id",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("n_types"), F.lit(0)).alias("n_types"),
            F.col("sum_value"),
        )
        .orderBy("e_id")
    )
