"""Event-stream analytics over the ``events`` table.

The reference has no event-time operators (SURVEY.md §2 "Streaming-only
operators: none"), but its data model feeds a queryable store; these are the
windowed/sessionized workloads a Spark engine adds for free and the driver's
events table exists to exercise.  Batch formulations here; the streaming
module runs the same aggregations under Structured Streaming with
watermarks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import finite_spark, finite_sql, load, query


@query(
    "q20_tumbling_window_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour NULLS LAST, event_type NULLS LAST
    LIMIT 100
    """,
)
def q20(spark, sf_dir):
    """Tumbling event-time window (hourly) aggregation.  In streaming mode
    this is window(ts, '1 hour') + watermark; the batch equivalent is
    date_trunc — one hash aggregate, partial map-side."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(finite_spark(F.col("value")).cast("decimal(28,6)"))
            .cast("double")
            .alias("total_value"),
        )
        # NULLS LAST pinned on both engines: Spark defaults ASC NULLS
        # FIRST where DuckDB defaults NULLS LAST, so once a NULL-hour
        # group (NULL event time) exists AND the group count exceeds
        # the LIMIT, the engines would keep different row SETS
        .orderBy(
            F.col("hour").asc_nulls_last(), F.col("event_type").asc_nulls_last()
        )
        .limit(100)
    )


# ts ordering pins NULLS LAST explicitly: Spark windows default ASC
# NULLS FIRST where DuckDB defaults NULLS LAST, so a NULL-ts event (no
# event time recorded — inevitable in a 100 TB log) would otherwise
# open the session run in one engine and close it in the other.
_SESSION_SQL = """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts NULLS LAST, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts NULLS LAST, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts NULLS LAST, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS se
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(se) AS BIGINT) AS n_events,
           CAST(MAX(se) AS BIGINT) AS max_session_events,
           CAST(MIN(se) AS BIGINT) AS min_session_events
    FROM per_session
    GROUP BY user_id
    ORDER BY user_id
"""


@query("q21_sessionization", oracle=_SESSION_SQL)
def q21(spark, sf_dir):
    """Session windows (30-min inactivity gap) via gaps-and-islands: lag ->
    marker -> running sum.  Identical ANSI SQL runs on Spark and the oracle.
    Streaming equivalent: session_window(ts, '30 minutes').  Widened r11
    with per-user session-shape facets (max/min events per session via a
    per-session aggregate that REUSES the window's user_id partitioning —
    no extra exchange), so the hash pins how the gap rule SPLITS each
    user's stream, not just how many pieces it makes."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_SESSION_SQL)


# Jackson leniencies Spark's JSON readers enable for Hive compat but RFC
# 8259 (and DuckDB's json_valid) reject — all disabled so "valid JSON"
# means the same rows on both engines.
_Q22_STRICT_JSON = {
    "allowSingleQuotes": "false",
    "allowUnquotedFieldNames": "false",
    "allowNumericLeadingZeros": "false",
    "allowNonNumericNumbers": "false",
    "allowBackslashEscapingAnyCharacter": "false",
    "allowComments": "false",
    "allowUnquotedControlChars": "false",
}


@query(
    "q22_json_props_extract",
    oracle="""
    WITH ks AS (
      SELECT event_type,
             CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS kstr
      FROM events
    ),
    ok AS (
      SELECT event_type,
             CASE WHEN regexp_matches(kstr, '^-?[0-9]+$')
                  THEN TRY_CAST(kstr AS INTEGER) END AS k
      FROM ks
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(k AS DECIMAL(28,6))) AS DOUBLE) AS sum_k
    FROM ok
    WHERE k IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def q22(spark, sf_dir):
    """Semi-structured extraction: JSON props column -> typed integer
    (JVM-side JSON parse, no Python UDF).  Cross-engine parity needs two
    deliberate choices on a corpus with junk props:

    - VALIDITY: Spark's get_json_object is lenient in ways DuckDB's
      json_valid is not (Jackson's ALLOW_SINGLE_QUOTES et al.), so the
      extraction runs through from_json with those leniencies DISABLED —
      a malformed document yields a NULL struct on Spark exactly where
      json_valid(props) is false on DuckDB (which must guard inside a
      CASE: DuckDB's json() family ERRORS on malformed input and a bare
      AND does not guarantee conditional evaluation).
    - VALUE: the facet counts INTEGER-coded k.  Spark's try_cast
      string->int rejects '3.0' where DuckDB's TRY_CAST rounds it, so
      both engines gate the raw string on ^-?[0-9]+$ before a try-cast
      (try, not plain: a valid integer string can still overflow int —
      NULL on both engines, never a job abort)."""
    ev = load(spark, sf_dir, "events")
    # schema 'k STRING' captures any scalar k as its raw text (Jackson
    # writes non-string tokens through verbatim), mirroring DuckDB's
    # json_extract_string
    kstr = F.from_json(F.col("props"), "k STRING", _Q22_STRICT_JSON).getField("k")
    k = F.when(kstr.rlike("^-?[0-9]+$"), kstr).try_cast("int")
    return (
        ev.filter(k.isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k.cast("decimal(28,6)")).cast("double").alias("sum_k"),
        )
        .orderBy("event_type")
    )


@query(
    "q23_funnel_signup_to_purchase",
    oracle="""
    WITH f AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS c,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p
      FROM events GROUP BY user_id
    ),
    agg AS (
      SELECT COUNT(*) AS all_users,
             CAST(SUM(CASE WHEN s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN s IS NOT NULL AND c > s THEN 1 ELSE 0 END) AS BIGINT) AS s2,
             CAST(SUM(CASE WHEN s IS NOT NULL AND c > s AND p > c
                      THEN 1 ELSE 0 END) AS BIGINT) AS s3
      FROM f
    )
    SELECT 0 AS step, all_users AS n_users FROM agg
    UNION ALL SELECT 1, s1 FROM agg
    UNION ALL SELECT 2, s2 FROM agg
    UNION ALL SELECT 3, s3 FROM agg
    ORDER BY step
    """,
)
def q23(spark, sf_dir):
    """Funnel analysis: conditional-min per user then step counts — one
    shuffle on user_id, no self-join.  Widened r8 (VERDICT r7 item 4
    family): a THREE-step ordered funnel (signup -> click after signup ->
    purchase after click) emitted as one row per step, so the hash pins
    every stage's drop-off, not one conversion scalar."""
    ev = load(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("c"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
    )
    step1 = F.col("s").isNotNull()
    step2 = step1 & (F.col("c") > F.col("s"))
    step3 = step2 & (F.col("p") > F.col("c"))
    agg = f.agg(
        F.count("*").alias("all_users"),
        F.sum(F.when(step1, 1).otherwise(0)).alias("s1"),
        F.sum(F.when(step2, 1).otherwise(0)).alias("s2"),
        F.sum(F.when(step3, 1).otherwise(0)).alias("s3"),
    )
    return agg.selectExpr(
        "stack(4, 0, all_users, 1, s1, 2, s2, 3, s3) AS (step, n_users)"
    ).orderBy("step")


@query(
    "q26_cohort_retention",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, c.cohort_day,
             date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN cohorts c ON e.user_id = c.user_id
    ),
    cs AS (
      SELECT cohort_day, COUNT(*) AS cohort_size FROM cohorts GROUP BY cohort_day
    ),
    g AS (
      SELECT cohort_day, day_offset, COUNT(*) AS n_users
      FROM activity GROUP BY cohort_day, day_offset
    )
    SELECT CAST(g.cohort_day AS VARCHAR) AS cohort_day,
           CAST(g.day_offset AS BIGINT) AS day_offset,
           g.n_users,
           cs.cohort_size,
           CAST(g.n_users * 10000 // cs.cohort_size AS BIGINT) AS retention_bp
    FROM g JOIN cs ON g.cohort_day IS NOT DISTINCT FROM cs.cohort_day
    ORDER BY cohort_day, day_offset
    """,
)
def q26(spark, sf_dir):
    """Cohort retention: users bucketed by first-activity day; per
    (cohort_day, day_offset) distinct active users.  The cohort map is a
    per-user aggregate joined back onto the fact table — the standard
    retention-triangle shape.  The cohort side scales with the user count,
    so it carries no broadcast hint: AQE broadcasts it at small SF and
    shuffles on user_id at 100 TB, where both sides hash-partition on the
    same key so the join and the preceding groupBy share one exchange.

    Facets (widened r12): the per-cohort size and the retention RATE in
    integer basis points (n_users * 10000 div cohort_size — the
    float-free integer-ratio idiom every rate gate uses, so no rounding
    boundary exists between the engines).  The triangle row for
    day_offset = 0 retains by construction at 10000 bp — a facet a
    mis-joined cohort map fails immediately.  The size join is null-safe
    on both engines so a hypothetical all-NULL-ts cohort stays in the
    result rather than silently dropping on one engine."""
    from ..checkpointing import stable_checkpoint

    ev = load(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    # lazy checkpoint (r15): the cohort map feeds the size census AND
    # the activity join — one per-user pass over the event history
    # instead of two at any scale
    cohorts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day")).transform(
        stable_checkpoint, eager=False
    )
    cohort_sizes = cohorts.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    ).withColumnRenamed("cohort_day", "cs_day")
    activity = (
        ev.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(day, F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    grouped = activity.groupBy("cohort_day", "day_offset").agg(
        F.count("*").alias("n_users")
    )
    return (
        grouped.join(
            cohort_sizes, grouped.cohort_day.eqNullSafe(cohort_sizes.cs_day)
        )
        .select(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
            "n_users",
            "cohort_size",
            F.expr("n_users * 10000 div cohort_size").alias("retention_bp"),
        )
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "q27_sliding_window",
    oracle="""
    WITH w AS (
      SELECT value, unnest(ARRAY[
        to_timestamp(CAST(floor(epoch(ts)/1800)*1800 AS BIGINT)),
        to_timestamp(CAST(floor(epoch(ts)/1800)*1800 - 1800 AS BIGINT))
      ]) AS win_start
      FROM events
      WHERE ts IS NOT NULL
    )
    SELECT strftime(win_start AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM w GROUP BY win_start ORDER BY window_start
    """,
)
def q27(spark, sf_dir):
    """Sliding event-time windows (1 h window, 30 min slide): each event
    lands in exactly two windows; Spark's window() expands them inline (a
    projection, no shuffle beyond the aggregate).  The streaming twin is the
    same expression under a watermark.  An event with no event time
    cannot land in a time window — NULL ts is filtered explicitly on
    BOTH engines (Spark's window() would group it under a NULL window
    where the oracle's epoch arithmetic yields a NULL win_start row)."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(win.alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            # finite_spark: a NaN/Inf metric is an unusable value, not a
            # job abort — Spark's non-finite -> decimal cast silently
            # yields NULL where DuckDB's ERRORS, so both engines pin the
            # exclusion explicitly (isfinite in the oracle)
            F.sum(finite_spark(F.col("value"))
                  .cast("decimal(28,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q41_pivot_wide_metrics",
    oracle="""
    SELECT user_id % 10 AS cohort,
    """
    + ",\n    ".join(
        f"CAST(SUM(CASE WHEN event_type='{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS {t}_n,\n    "
        f"CAST(SUM(CASE WHEN event_type='{t}' AND isfinite(value)"
        f" THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS {t}_value"
        for t in _EVENT_TYPES
    )
    + """
    FROM events GROUP BY 1 ORDER BY cohort
    """,
)
def q41(spark, sf_dir):
    """PIVOT: long event stream -> wide per-cohort metric matrix (count +
    value mass per event type) — the reshape every feature-store /
    report-table pipeline ends with.

    Scale shape: the pivot values are ENUMERATED (``pivot(col, values)``),
    which matters twice at 100 TB — it skips the eager distinct-scan job
    Spark otherwise runs to discover the pivot domain, and it lets the
    planner compile the reshape as its two-phase pivot aggregate: a
    map-side-partial aggregate on (cohort, event_type) first, so the only
    corpus-wide shuffle carries |cohorts| x |types| pre-aggregated rows,
    then a pivot-first reshape on cohort — never a per-type scan or join.
    Sums ride decimal(28,6) so the wide cells are order-independent and
    match the oracle exactly."""
    ev = load(spark, sf_dir, "events")
    wide = (
        ev.groupBy((F.col("user_id") % 10).alias("cohort"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(finite_spark(F.col("value")).cast("decimal(28,6)")).cast("double").alias("value"),
        )
    )
    # a (cohort, type) cell with no rows pivots to NULL, but a COUNT of an
    # empty cell is semantically 0 — and the oracle's SUM(CASE..ELSE 0)
    # says 0.  Coalesce the count cells so a sparser type mix (tiny SF,
    # different data) cannot diverge the engines; value cells stay NULL on
    # both sides (SUM over nothing).
    return wide.select(
        "cohort",
        *[
            c
            for t in _EVENT_TYPES
            for c in (
                F.coalesce(f"{t}_n", F.lit(0).cast("long")).alias(f"{t}_n"),
                F.col(f"{t}_value"),
            )
        ],
    ).orderBy("cohort")


@query(
    "q42_changelog_latest_compaction",
    oracle="""
    SELECT user_id, event_id AS last_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           event_type AS last_type, value AS last_value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 ORDER BY user_id
    """,
)
def q42(spark, sf_dir):
    """CHANGELOG COMPACTION — latest record per key, the primitive behind
    CDC materialization / SCD-type-1 MERGE / upsert-table reads: collapse
    an event log to each key's most recent row, tie-broken
    deterministically by (ts, event_id).

    Scale shape: this is deliberately NOT the window formulation the
    oracle uses (row_number + filter), which must SHUFFLE THE FULL
    HISTORY to co-locate each key before ranking it.  ``max_by`` is an
    aggregate with a map-side partial: each task compacts its slice to
    one candidate row per key BEFORE the exchange, so the shuffle
    carries |keys| rows, not the history — the property that matters at
    a 100 TB changelog, and the one pinned in test_plan_shape.py (no
    Window node; partial_max_by below the hash exchange).  One honest
    caveat: a struct-valued aggregation buffer is not hash-aggregable,
    so Spark plans SortAggregate — each task sorts its own slice
    (spillable, local) rather than the cluster sorting the whole log."""
    ev = load(spark, sf_dir, "events")
    latest = F.max_by(
        F.struct("event_id", "ts", "event_type", "value"),
        F.struct("ts", "event_id"),
    ).alias("last")
    return (
        ev.groupBy("user_id")
        .agg(latest)
        .select(
            "user_id",
            F.col("last.event_id").alias("last_event_id"),
            F.date_format("last.ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.col("last.event_type").alias("last_type"),
            F.col("last.value").alias("last_value"),
        )
        .orderBy("user_id")
    )


@query(
    "q43_scd2_validity_intervals",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS NULL
                    OR LAG(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marked
    ),
    per_run AS (
      SELECT user_id, run_id, MIN(event_type) AS state, MIN(ts) AS vf,
             MIN(event_id) AS min_event_id, COUNT(*) AS n_events
      FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id, CAST(run_id AS BIGINT) AS run_id, state,
           strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(LEAD(vf) OVER w2, '%Y-%m-%d %H:%M:%S') AS valid_to,
           epoch_us(LEAD(vf) OVER w2) - epoch_us(vf) AS valid_us,
           min_event_id, n_events,
           CAST(CASE WHEN LEAD(vf) OVER w2 IS NULL THEN 1 ELSE 0 END
                AS BIGINT) AS is_current
    FROM per_run
    WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)
    ORDER BY user_id, run_id
    """,
)
def q43(spark, sf_dir):
    """SCD TYPE 2 — derive validity intervals from a changelog: collapse
    each user's consecutive run of identical state (event_type) into ONE
    dimension row [valid_from, valid_to) with an is_current flag.  This is
    the other half of CDC materialization next to q42's type-1 latest-row
    compaction: type-2 keeps history, emitting a new row only when the
    tracked attribute CHANGES (gaps-and-islands, then interval chaining).

    Scale shape: every window here — the change marker, the running
    run_id, and the valid_to chain — is partitioned by user_id, so the
    whole derivation is ONE hash exchange on the key followed by
    task-local sorts (spillable, bounded by a single user's history), then
    a hash aggregate per run that REUSES the same partitioning (no second
    exchange: Catalyst sees the groupBy keys are a superset of the window
    partition key).  Nothing global: no corpus-wide sort, no join.  At a
    100 TB changelog the shuffle carries each row once, and the final
    table is |state-changes| rows, typically orders of magnitude smaller.
    Interval arithmetic rides unix_micros (exact integers) and second-
    truncated strings so both engines agree bit-for-bit."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    marked = ev.withColumn(
        "chg",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0),
    )
    runs = marked.withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_run = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("vf"),
        F.min("event_id").alias("min_event_id"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("run_id")
    nxt = F.lead("vf").over(w2)
    return (
        per_run.select(
            "user_id",
            F.col("run_id").cast("long").alias("run_id"),
            "state",
            F.date_format("vf", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
            (
                F.unix_micros(nxt.cast("timestamp"))
                - F.unix_micros(F.col("vf").cast("timestamp"))
            ).alias("valid_us"),
            "min_event_id",
            "n_events",
            F.when(nxt.isNull(), 1).otherwise(0).cast("long").alias("is_current"),
        )
        .orderBy("user_id", "run_id")
    )


_Q44_CUTOFF = "2024-01-20 00:00:00"


@query(
    "q44_incremental_agg_merge",
    oracle=f"""
    SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS total_value,
           MIN(value) AS min_value, MAX(value) AS max_value,
           COUNT(value) AS n_values
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, day
    """,
)
def q44(spark, sf_dir):
    """INCREMENTAL AGGREGATE MAINTENANCE — merge a pre-aggregated BASE
    (history before a cutoff) with a freshly aggregated DELTA (new
    arrivals) into the same result a full recompute would give, using only
    algebraic aggregates (count/sum/min/max merge associatively).  This is
    the materialized-view refresh primitive: at 100 TB you never rescan
    the history — you keep the base's partial aggregates and fold each
    micro-batch in.  The oracle IS the full recompute, so the gate proves
    the merge is lossless.

    Scale shape: both legs scan with the cutoff predicate PUSHED to
    parquet (disjoint row groups at scale; here the same files filtered),
    each leg does a map-side partial aggregate, the union re-aggregates on
    the same keys — so the only corpus-wide shuffle carries two
    pre-aggregated rows per (type, day) key, and the merge aggregate is
    |keys|-sized.  SUM rides decimal(28,6) so base+delta reassociation
    cannot drift from the oracle's single-pass sum."""
    ev = load(spark, sf_dir, "events")
    cutoff = F.lit(_Q44_CUTOFF).cast("timestamp_ntz")

    def partial(leg):
        return leg.groupBy(
            "event_type", F.col("ts").cast("date").cast("string").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(finite_spark(F.col("value"))
                  .cast("decimal(28,6)")).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count("value").alias("n_values"),
        )

    # the two cutoff predicates must PARTITION the table — a NULL ts
    # satisfies neither `<` nor `>=` (NULL comparisons are NULL), so
    # without the IS NULL arm such rows would silently vanish from the
    # merged view while the full-recompute oracle keeps them under a
    # NULL day.  Route them to the base leg; IS NULL pushes down to
    # parquet the same as the range predicate.
    base = partial(ev.filter((F.col("ts") < cutoff) | F.col("ts").isNull()))
    delta = partial(ev.filter(F.col("ts") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.sum("n_values").alias("n_values"),
        )
    )
    return merged.select(
        "event_type",
        "day",
        "n_events",
        F.col("sum_value").cast("double").alias("total_value"),
        "min_value",
        "max_value",
        "n_values",
    ).orderBy("event_type", "day")
