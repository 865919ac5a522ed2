"""Structured Streaming queries exercised through the correctness gate.

Each gate entry runs a REAL streaming query (readStream on the events
parquet, watermark + event-time aggregation, availableNow trigger) to
completion into a memory sink, then returns the sink table — so the
DuckDB oracle verifies that the streaming execution converges to the
batch answer (the streaming/batch consistency contract Structured
Streaming is built on).

Complete output mode is used for the windowed aggregation so tail
windows (those the final watermark hasn't closed) are still emitted —
matching the batch oracle exactly rather than dropping the last hour.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from . import finite_spark, load, query
from .streaming_ops import windowed_event_counts

_sink_ids = itertools.count()


def _stream_events(spark, sf_dir: str) -> DataFrame:
    """events.parquet as an unbounded file-source stream (nanosecond ts
    normalized to TimestampType exactly like the batch ``load``)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    for field in stream.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, T.TimestampNTZType):
            # watermarks require TIMESTAMP, not TIMESTAMP_NTZ (Spark 4
            # parquet inference); session tz is UTC so the cast is identity
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _run_to_table(df: DataFrame, mode: str) -> str:
    name = f"stream_gate_{next(_sink_ids)}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


@query(
    "st01_streaming_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(CASE WHEN isfinite(value) THEN value END
                         AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE ts IS NOT NULL  -- withWatermark drops NULL event times: a row
                          -- with no event time cannot be assigned a
                          -- window (batch q20 KEEPS the NULL-hour group;
                          -- the divergence is the streaming semantic)
    GROUP BY 1, 2
    ORDER BY hour, event_type
    LIMIT 100
    """,
)
def st01(spark, sf_dir):
    """Watermarked tumbling-window aggregation executed AS A STREAM
    (q20's streaming twin, SURVEY.md §2B streaming note): readStream ->
    withWatermark -> window -> memory sink, availableNow.  The oracle is
    the batch answer — streaming/batch consistency is the assertion."""
    stream = _stream_events(spark, sf_dir)
    name = _run_to_table(windowed_event_counts(stream), mode="complete")
    return spark.table(name).orderBy("hour", "event_type").limit(100)


@query(
    "st02_streaming_dedup_count",
    oracle="""
    SELECT user_id, COUNT(DISTINCT event_type) AS n_types
    FROM events
    WHERE user_id < 100
    GROUP BY user_id ORDER BY user_id
    """,
)
def st02(spark, sf_dir):
    """Streaming dropDuplicates (cross-batch keyed state) feeding a
    running aggregate: first occurrence of each (user, event_type) pair
    survives, counted per user.  Complete mode emits the converged
    counts; the oracle is the batch COUNT(DISTINCT)."""
    stream = _stream_events(spark, sf_dir).filter(F.col("user_id") < 100)
    deduped = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    # count("event_type"), not count("*"): COUNT(DISTINCT event_type)
    # skips NULL on the oracle side, so the deduped (user, NULL) row
    # must not count as a type — but it must stay in the stream so a
    # user whose every event has a NULL type still emits its 0 row
    # (events-edge, measured r13)
    counts = deduped.groupBy("user_id").agg(
        F.count("event_type").alias("n_types")
    )
    name = _run_to_table(counts, mode="complete")
    return spark.table(name).orderBy("user_id")


@query(
    "st03_streaming_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WHERE user_id < 50
        AND ts IS NOT NULL  -- session_window is event-time state: a
                            -- NULL event time is dropped by the
                            -- watermark, while this batch CTE would
                            -- glue it onto the user's LAST session
                            -- (NULLS LAST + the CASE's ELSE branch)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    )
    SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def st03(spark, sf_dir):
    """Session windows executed AS A STREAM: Spark's native
    ``session_window`` state machine (merge-on-overlap keyed state,
    watermark-bounded) instead of the batch gaps-and-islands window
    chain.  The oracle IS the gaps-and-islands formulation in DuckDB —
    two independent algorithms, one answer.  Spark closes a session when
    the next event is >= gap after the last, which the oracle's
    ``>= INTERVAL 30 MINUTE`` lag test mirrors exactly."""
    from .streaming_ops import session_window_counts

    stream = _stream_events(spark, sf_dir).filter(F.col("user_id") < 50)
    name = _run_to_table(session_window_counts(stream), mode="complete")
    return (
        spark.table(name)
        .select("user_id", F.col("session_start"), F.col("n_events"))
        .orderBy("user_id", "session_start")
    )


@query(
    "st04_streaming_first_seen",
    oracle="""
    SELECT user_id, event_id AS first_event_id, event_type AS first_event_type
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events WHERE user_id < 200
    ) WHERE rn = 1 ORDER BY user_id
    """,
)
def st04(spark, sf_dir):
    """Custom stateful streaming operator under the gate:
    ``streaming_first_seen`` (applyInPandasWithState, one boolean of
    state per key, hash-partitioned by the state store) emits only the
    first event per user across micro-batches.  The oracle is the batch
    row_number()-over-key answer — keyed-state streaming vs window
    function, same result."""
    from .streaming_ops import streaming_first_seen

    stream = _stream_events(spark, sf_dir).filter(F.col("user_id") < 200)
    deduped = streaming_first_seen(stream, key_col="user_id", order_col="event_id")
    name = _run_to_table(deduped, mode="append")
    return (
        spark.table(name)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.col("event_type").alias("first_event_type"),
        )
        .orderBy("user_id")
    )


@query(
    "st05_streaming_static_enrichment",
    oracle="""
    SELECT c.c_mktsegment AS segment, COUNT(*) AS n_events
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def st05(spark, sf_dir):
    """Stream-static dimension enrichment — the canonical streaming ETL
    join (events stream x customer dim) run as a REAL stream into the
    gate.  The static side carries NO forced broadcast hint (customer is
    SF-scaled — the same unbounded-build-side family VERDICT r6 item 1
    removed from the batch queries): Catalyst broadcasts it while it fits,
    so each micro-batch enriches map-side with no shuffle of the stream
    and dim re-reads pick up slowly-changing updates between batches, and
    falls back to a shuffled hash join when the dim outgrows the
    threshold instead of collecting it onto every executor.  Oracle: the
    batch join+aggregate answer."""
    stream = _stream_events(spark, sf_dir)
    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    joined = stream.join(dim, stream.user_id == dim.c_custkey)
    agg = joined.groupBy("segment").agg(F.count("*").alias("n_events"))
    name = _run_to_table(agg, mode="complete")
    return spark.table(name).orderBy("segment")


@query(
    "st06_streaming_late_data_drop",
    oracle="""
    WITH scope AS (
      SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
    ),
    ontime AS (
      SELECT * FROM scope
      WHERE NOT (date_trunc('hour', ts) = TIMESTAMP '2024-01-01 00:00:00'
                 AND event_id % 2 = 1)
    )
    SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events
    FROM ontime GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def st06(spark, sf_dir):
    """Watermark LATE-DATA DROP, exercised for real: day-1 events are
    staged into ordered source files so hour-0's odd-event_id rows arrive
    two micro-batches after the watermark closed their window.  Spark
    only GUARANTEES the drop once the window's state has been evicted
    (end of the batch whose watermark passed the window end — a late row
    arriving in that same batch still merges into the not-yet-evicted
    state), so the staging inserts a full batch between close and
    arrival, making the drop deterministic:

      f0  hours 00-05 minus the late rows   -> watermark ~04:59
      f1  hours 06-12                       -> h00..h03 emitted + evicted
      f2  hours 13-23 PLUS the late rows    -> late rows filtered (window
                                               end < watermark, no state)
      f3  far-future sentinel               -> closes every day-1 window

    Append output mode: only watermark-closed windows emit, which is why
    the sentinel exists (and is filtered from the result).  The oracle is
    the batch answer MINUS exactly the late rows — the one thing a
    complete-mode or batch run would get wrong, pinning that the
    watermark semantics actually engaged.  Scale shape: identical to
    st01's windowed aggregate (state bounded by watermark horizon, not
    stream length); staging is test scaffolding, not operator cost."""
    import os
    import tempfile

    ev = load(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-02").cast("timestamp")
    )
    h0 = F.date_trunc("hour", F.col("ts")) == F.lit("2024-01-01 00:00:00").cast(
        "timestamp"
    )
    late = h0 & (F.col("event_id") % 2 == 1)
    t06 = F.lit("2024-01-01 06:00:00").cast("timestamp")
    t13 = F.lit("2024-01-01 13:00:00").cast("timestamp")
    f0 = ev.filter((F.col("ts") < t06) & ~late)
    f1 = ev.filter((F.col("ts") >= t06) & (F.col("ts") < t13))
    f2 = ev.filter(F.col("ts") >= t13).unionByName(ev.filter(late))
    sentinel = ev.limit(1).select(
        *[
            F.lit("2024-01-03 00:00:00").cast(ev.schema["ts"].dataType).alias(c)
            if c == "ts"
            else (F.lit("__sentinel").alias(c) if c == "event_type" else F.col(c))
            for c in ev.columns
        ]
    )

    td = tempfile.mkdtemp(prefix="st06-")  # outlives the returned (lazy) DF
    for i, df in enumerate([f0, f1, f2, sentinel]):
        p = os.path.join(td, f"f{i}")
        df.coalesce(1).write.parquet(p)
        # the file source orders batches by modification time; pin it so
        # the staged arrival order is deterministic on any filesystem
        for root, _, files in os.walk(p):
            for fn in files:
                os.utime(os.path.join(root, fn), (1700000000 + i, 1700000000 + i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(td + "/*")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    name = _run_to_table(agg, mode="append")
    return (
        spark.table(name)
        .select(F.col("window.start").alias("hour"), "event_type", "n_events")
        .filter(F.col("hour") < F.lit("2024-01-02").cast("timestamp"))
        .orderBy("hour", "event_type")
    )


def _stage_weekly(
    spark,
    sf_dir: str,
    with_sentinel: bool = False,
    event_types: tuple[str, ...] | None = ("click", "purchase"),
    duplicate: bool = False,
) -> tuple[str, object]:
    """Stage the user<100 events into FOUR time-ordered source files
    (weekly splits, pinned mtimes) so a maxFilesPerTrigger=1 stream
    delivers them across four micro-batches — the watermark then ADVANCES
    between batches and watermark-bounded state eviction is genuinely on
    the execution path (ADVICE r7: a single-batch arrival never evicts).
    Returns (staged_dir, schema).  With ``with_sentinel`` a far-future 5th
    file closes every window so outer-join null rows flush before
    availableNow terminates (st06's sentinel pattern).  With ``duplicate``
    every staged row is written TWICE in its file (same batch, so the
    second copy always lands inside the dedup watermark horizon — st09's
    input shape).

    Staged dirs are CACHED per (sf_dir, event_types, with_sentinel,
    duplicate) and removed at interpreter exit (ADVICE r8: the previous
    per-call mkdtemp leaked a parquet copy of the filtered events on every
    st07/st08/st09 invocation across correctness + bench repeats — 3
    repeats x 3 gates left 9 copies behind per bench run)."""
    import os
    import tempfile

    key = (sf_dir, event_types, with_sentinel, duplicate)
    cached = _STAGE_CACHE.get(key)
    if cached is not None:
        return cached

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    if event_types is not None:
        ev = ev.filter(F.col("event_type").isin(*event_types))
    cuts = ["2024-01-08", "2024-01-15", "2024-01-22"]
    bounds = [F.lit(c).cast("timestamp") for c in cuts]
    splits = [
        ev.filter(F.col("ts") < bounds[0]),
        ev.filter((F.col("ts") >= bounds[0]) & (F.col("ts") < bounds[1])),
        ev.filter((F.col("ts") >= bounds[1]) & (F.col("ts") < bounds[2])),
        ev.filter(F.col("ts") >= bounds[2]),
    ]
    if with_sentinel:
        # one sentinel row PER SIDE: the sides filter on event_type before
        # their watermark nodes, so a single-row sentinel would advance
        # only one side's watermark — the join watermark is the MIN of
        # both and the other side's tail state would never flush
        one = ev.limit(1).select(
            *[
                F.lit("2024-03-01 00:00:00").cast(ev.schema["ts"].dataType).alias(c)
                if c == "ts"
                else (F.lit(9999).cast(ev.schema[c].dataType).alias(c)
                      if c == "user_id" else F.col(c))
                for c in ev.columns
            ]
        )
        splits.append(
            one.select(
                *[F.lit("click").alias(c) if c == "event_type" else F.col(c)
                  for c in ev.columns]
            ).unionByName(
                one.select(
                    *[F.lit("purchase").alias(c) if c == "event_type" else F.col(c)
                      for c in ev.columns]
                )
            )
        )
    td = tempfile.mkdtemp(prefix="st-join-")  # outlives the returned (lazy) DF
    for i, df in enumerate(splits):
        if duplicate:
            df = df.unionByName(df)
        p = os.path.join(td, f"f{i}")
        df.coalesce(1).write.parquet(p)
        for root, _, files in os.walk(p):
            for fn in files:
                os.utime(os.path.join(root, fn), (1700000000 + i, 1700000000 + i))
    _STAGE_CACHE[key] = (td, ev.schema)
    return td, ev.schema


# staged-input cache for _stage_weekly; entries removed at interpreter exit
_STAGE_CACHE: dict[tuple, tuple[str, object]] = {}


def _cleanup_stage_cache() -> None:
    import shutil

    for td, _schema in _STAGE_CACHE.values():
        shutil.rmtree(td, ignore_errors=True)
    _STAGE_CACHE.clear()


import atexit  # noqa: E402

atexit.register(_cleanup_stage_cache)


def _staged_stream(spark, td: str, schema) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(td + "/*")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


@query(
    "st07_stream_stream_join",
    oracle="""
    WITH e AS (
      SELECT CASE WHEN user_id < 50 THEN 0 ELSE user_id END AS jk, *
      FROM events WHERE user_id < 100
    )
    SELECT c.jk, COUNT(*) AS n_pairs
    FROM e c JOIN e p
      ON p.jk = c.jk
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    GROUP BY c.jk ORDER BY c.jk
    """,
)
def st07(spark, sf_dir):
    """STREAM-STREAM inner join — the flagship Structured Streaming shape
    the other gates don't cover: clicks and purchases as two independent
    watermarked streams, joined with an event-time range condition
    (purchase within 1 hour after the click).  The time bound + watermarks
    are what make unbounded-stream joins feasible at all: each side's join
    state is evicted once the other side's watermark passes the range, so
    state is bounded by the watermark horizon x event rate, never by
    stream length.

    Two r7-VERDICT upgrades baked in:
    - MULTI-BATCH ARRIVAL: both sides read the weekly-staged files with
      maxFilesPerTrigger=1 (four micro-batches), so the watermark advances
      ~a week per batch and clicks older than the horizon are genuinely
      EVICTED between batches — pairs spanning a file boundary (click in
      week N's tail, purchase in week N+1's head) still match because the
      2-hour watermark delay exceeds the 1-hour join range, which is
      exactly the eviction-safety arithmetic a production job must get
      right.
    - HOT KEY: users 0-49 collapse onto one join key (jk=0) carrying ~50%
      of both streams — the skewed-state shape (one state-store partition
      far heavier than the rest) that uniform keys never exercise; users
      50-99 stay unique as the uniform control group.

    The oracle is the equivalent batch range join — streaming/batch
    consistency for the join operator itself."""
    td, schema = _stage_weekly(spark, sf_dir)
    jk = F.when(F.col("user_id") < 50, F.lit(0)).otherwise(F.col("user_id")).cast("long")
    clicks = (
        _staged_stream(spark, td, schema)
        .filter(F.col("event_type") == "click")
        .select(jk.alias("jk"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        _staged_stream(spark, td, schema)
        .filter(F.col("event_type") == "purchase")
        .select(jk.alias("p_jk"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("jk") == F.col("p_jk"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    name = _run_to_table(joined, mode="append")
    return (
        spark.table(name)
        .groupBy("jk")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("jk")
    )


@query(
    "st08_stream_stream_outer_join",
    oracle="""
    WITH c AS (SELECT user_id, ts FROM events
               WHERE event_type = 'click' AND user_id < 100),
    p AS (SELECT user_id, ts FROM events
          WHERE event_type = 'purchase' AND user_id < 100)
    SELECT c.user_id,
           CAST(SUM(CASE WHEN p.ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN p.ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
    FROM c LEFT JOIN p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    GROUP BY c.user_id ORDER BY c.user_id
    """,
)
def st08(spark, sf_dir):
    """Watermarked stream-stream LEFT OUTER join — the hardest Structured
    Streaming join semantics: a click with NO purchase within the hour can
    only be emitted (null-extended) once the purchase-side watermark has
    passed the end of its match window, because until then a matching
    purchase could still arrive.  That delayed-null emission is pure
    watermark bookkeeping — a batch engine gets it for free, a streaming
    engine has to prove it — so the gate stages multi-batch arrival
    (weekly files, maxFilesPerTrigger=1) plus a far-future sentinel file
    that closes every window before availableNow terminates (otherwise
    the tail week's unmatched clicks would sit in state forever and the
    result would be nondeterministic).  State stays bounded by the
    watermark horizon exactly as in st07's inner join.  The oracle is the
    batch LEFT JOIN with matched/unmatched counts per user."""
    td, schema = _stage_weekly(spark, sf_dir, with_sentinel=True)
    clicks = (
        _staged_stream(spark, td, schema)
        .filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        _staged_stream(spark, td, schema)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    )
    name = _run_to_table(joined, mode="append")
    return (
        spark.table(name)
        .filter(F.col("user_id") < 100)  # drop the sentinel click row
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("p_ts").isNotNull(), 1).otherwise(0)).alias("n_matched"),
            F.sum(F.when(F.col("p_ts").isNull(), 1).otherwise(0)).alias("n_unmatched"),
        )
        .orderBy("user_id")
    )


@query(
    "st09_streaming_bounded_dedup",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_unique,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id
    FROM events WHERE user_id < 100
      AND ts IS NOT NULL  -- dropDuplicatesWithinWatermark keys state by
                          -- event time: NULL-ts rows are dropped by the
                          -- watermark before the dedup state sees them
    GROUP BY user_id ORDER BY user_id
    """,
)
def st09(spark, sf_dir):
    """Watermark-BOUNDED streaming dedup — ``dropDuplicatesWithinWatermark``
    — the production answer to st02's plain ``dropDuplicates``: st02's
    keyed state grows with the number of distinct keys FOREVER (at 100 TB
    / unbounded streams that is the state-store OOM), while this operator
    evicts a key's state once the watermark passes its event time + delay,
    so state is bounded by (event rate x watermark horizon) regardless of
    stream length.  The contract it keeps: duplicates arriving WITHIN the
    horizon dedupe exactly; the staging therefore writes every event twice
    in its weekly file (same micro-batch, trivially inside the 2-hour
    horizon) and the stream delivers four such batches, with eviction
    running between them.  The gate's two facets prove exactly-one-copy
    survival per event: per-user row counts AND the per-user event_id sum
    (a single surviving duplicate doubles its event_id's contribution; a
    lost event subtracts it — neither can hash-match the batch oracle,
    which reads each event once)."""
    td, schema = _stage_weekly(spark, sf_dir, event_types=None, duplicate=True)
    stream = _staged_stream(spark, td, schema).withWatermark("ts", "2 hours")
    deduped = stream.dropDuplicatesWithinWatermark(["event_id"])
    name = _run_to_table(deduped, mode="append")
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_unique"),
            F.sum("event_id").cast("long").alias("sum_event_id"),
        )
        .orderBy("user_id")
    )


# file-sink + checkpoint dirs for st10, cached per STAGED dir (ADVICE r9:
# keying by sf_dir alone made the cache an assumption independent of
# _STAGE_CACHE's; keyed by the staged dir it is strictly downstream — if
# the staging layer ever rebuilds, the sink rebuilds with it).  Both
# caches rest on the same documented invariant: sf_dir contents are
# immutable for the life of the process (the driver's testdata is
# generated once, before any round runs).  Removed at interpreter exit.
_SINK_CACHE: dict[str, tuple[str, str]] = {}


def _cleanup_sink_cache() -> None:
    import shutil

    import os

    for sink, ckpt in _SINK_CACHE.values():
        # the cached paths are <mkdtemp>/out and <mkdtemp>/cp — remove the
        # mkdtemp PARENTS, or every run leaks two empty dirs in /tmp
        shutil.rmtree(os.path.dirname(sink), ignore_errors=True)
        shutil.rmtree(os.path.dirname(ckpt), ignore_errors=True)
    _SINK_CACHE.clear()


atexit.register(_cleanup_sink_cache)


@query(
    "st10_streaming_file_sink_exactly_once",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(CASE WHEN isfinite(value) THEN value END
                         AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
           COUNT(DISTINCT event_id) AS n_ids,
           CAST(0 AS BIGINT) AS rerun_added
    FROM events WHERE user_id < 100
      AND ts IS NOT NULL  -- the stream is watermarked on ts: NULL event
                          -- times never reach the sink (streaming
                          -- semantic, mirrored; events-edge r13)
    GROUP BY event_type ORDER BY event_type
    """,
)
def st10(spark, sf_dir):
    """STREAMING FILE SINK with EXACTLY-ONCE delivery — the
    batch-handoff surface the other st gates don't touch: a watermarked
    source streamed through a stateless projection into a PARTITIONED
    parquet file sink with a checkpoint, then the stream is started a
    SECOND time on the same checkpoint with no new input and must append
    NOTHING.  This is the contract a production pipeline leans on when a
    driver dies mid-run: the checkpoint's offset log + the sink's
    _spark_metadata manifest together make restarts idempotent (the same
    mechanism the ingest path's commit-then-record offset store mirrors —
    ingest/projector.py A6/A12 — expressed here with Spark's own sink).

    The gate reads the sink back THROUGH the manifest (spark.read on a
    file-sink directory honors _spark_metadata, so orphan files from a
    torn run are invisible) and hashes per-type counts, the decimal value
    mass, the distinct-id census, and the measured rerun delta (a Python
    int from counting the sink after each run — computed, not assumed).
    Any duplicated or lost batch breaks n_events/n_ids; any rerun
    reprocessing breaks rerun_added=0.

    Scale shape: the streamed transform is stateless (no state store at
    all — the cheapest streaming pipeline there is); the sink partitions
    by event_type at write time, so the downstream read prunes on the
    query key.  State: zero.  Exactly-once costs only the manifest
    append per micro-batch."""
    import os
    import tempfile

    td, schema = _stage_weekly(spark, sf_dir, event_types=None)
    cached = _SINK_CACHE.get(td)
    if cached is None:
        sink = tempfile.mkdtemp(prefix="st10-sink-")
        ckpt = tempfile.mkdtemp(prefix="st10-ckpt-")
        # mkdtemp creates the dirs; the sink must not pre-exist for the
        # first start's manifest init, so hand Spark fresh subpaths
        sink = os.path.join(sink, "out")
        ckpt = os.path.join(ckpt, "cp")
        _SINK_CACHE[td] = (sink, ckpt)
    else:
        sink, ckpt = cached

    def run_once() -> None:
        stream = _staged_stream(spark, td, schema).withWatermark("ts", "2 hours")
        shaped = stream.select(
            "event_id", "user_id", "event_type", "value", F.to_date("ts").alias("day")
        )
        q = (
            shaped.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .partitionBy("event_type")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # empty-input robustness: when the staged source has zero rows the
    # availableNow run commits no batch, so the sink dir has no files and
    # no _spark_metadata — schema inference would fail.  Read with the
    # shaped schema explicitly (partition column included); a missing
    # sink dir is an empty frame.
    sink_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("day", T.DateType()),
            T.StructField("event_type", T.StringType()),
        ]
    )

    def read_sink():
        if not os.path.isdir(sink):
            return spark.createDataFrame([], sink_schema)
        return spark.read.schema(sink_schema).parquet(sink)

    run_once()
    n_first = read_sink().count()
    run_once()  # same checkpoint, no new input: must be a no-op
    n_second = read_sink().count()

    return (
        read_sink()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(finite_spark(F.col("value"))
                  .cast("decimal(28,6)")).cast("double").alias("sum_value"),
            F.countDistinct("event_id").alias("n_ids"),
            F.lit(int(n_second - n_first)).cast("long").alias("rerun_added"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- st11
# foreachBatch MERGE state roots, cached per STAGED dir (st10's cache
# discipline) and removed at interpreter exit.  Each root holds
# state_v{batch_id} parquet versions plus a ledger/ directory of applied
# batch-id markers — the commit-then-record layout: state is written
# BEFORE the ledger records the batch, so a torn run leaves an orphan
# version that the replayed batch simply overwrites.
_MERGE_CACHE: dict[str, tuple[str, str]] = {}


def _cleanup_merge_cache() -> None:
    import os
    import shutil

    for root, ckpt in _MERGE_CACHE.values():
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(os.path.dirname(ckpt), ignore_errors=True)
    _MERGE_CACHE.clear()


atexit.register(_cleanup_merge_cache)


_ST11_STATE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DecimalType(28, 6)),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def _st11_read_state(spark, root: str):
    """Current MERGE state = the state version of the HIGHEST batch id the
    ledger records (un-recorded versions are invisible — the crash-safety
    property).  Returns (state DataFrame or None, applied batch ids)."""
    import os

    ledger = os.path.join(root, "ledger")
    applied = (
        sorted(int(fn[1:]) for fn in os.listdir(ledger))
        if os.path.isdir(ledger)
        else []
    )
    if not applied:
        return None, applied
    path = os.path.join(root, f"state_v{max(applied):05d}")
    return spark.read.parquet(path), applied


def _st11_apply_batch(spark, root: str, bdf, batch_id: int) -> None:
    """MERGE (upsert by (user_id, event_type)) one micro-batch into the
    versioned state, idempotently: a batch id already in the ledger is a
    no-op — the exact contract the reference's commit-then-record offset
    store provides (FusekiProjector.java:400-479,
    FusekiOffsetStore.java:345-390), expressed as foreachBatch."""
    import os

    ledger = os.path.join(root, "ledger")
    os.makedirs(ledger, exist_ok=True)
    marker = os.path.join(ledger, f"b{batch_id:05d}")
    if os.path.exists(marker):
        return  # replayed batch: already merged, skip (exactly-once)
    dec = "decimal(28,6)"
    agg = bdf.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(finite_spark(F.col("value")).cast(dec)).cast(dec).alias("sum_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    cur, _applied = _st11_read_state(spark, root)
    if cur is None:
        merged = agg
    else:
        c = (
            cur.withColumnRenamed("n_events", "c_n")
            .withColumnRenamed("sum_value", "c_s")
            .withColumnRenamed("first_ts", "c_f")
            .withColumnRenamed("last_ts", "c_l")
        )
        zero_dec = F.lit(0).cast(dec)
        merged = c.join(agg, ["user_id", "event_type"], "full_outer").select(
            "user_id",
            "event_type",
            (F.coalesce("c_n", F.lit(0)) + F.coalesce("n_events", F.lit(0)))
            .cast("long")
            .alias("n_events"),
            (F.coalesce(F.col("c_s"), zero_dec) + F.coalesce(F.col("sum_value"), zero_dec))
            .cast(dec)
            .alias("sum_value"),
            F.least("c_f", "first_ts").alias("first_ts"),
            F.greatest("c_l", "last_ts").alias("last_ts"),
        )
    # commit (write the new version) ...
    merged.write.mode("overwrite").parquet(
        os.path.join(root, f"state_v{batch_id:05d}")
    )
    # ... THEN record: a crash between the two lines replays the batch,
    # which overwrites the orphan version — never double-merges
    open(marker, "w").close()


@query(
    "st11_foreachbatch_merge_exactly_once",
    oracle="""
    WITH st AS (
      SELECT user_id, event_type, COUNT(*) AS n_events,
             SUM(CAST(CASE WHEN isfinite(value) THEN value END
                      AS DECIMAL(28,6))) AS sv,
             MIN(ts) AS fts, MAX(ts) AS lts
      FROM events WHERE user_id < 100
        AND ts IS NOT NULL  -- watermarked stream: NULL event times are
                            -- dropped before the foreachBatch merge
      GROUP BY user_id, event_type
    )
    SELECT event_type,
           COUNT(*) AS n_keys,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(sv) AS DOUBLE) AS sum_value,
           strftime(MIN(fts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(MAX(lts), '%Y-%m-%d %H:%M:%S') AS last_ts,
           CAST(0 AS BIGINT) AS rerun_added,
           CAST(0 AS BIGINT) AS replay_delta
    FROM st GROUP BY event_type ORDER BY event_type
    """,
)
def st11(spark, sf_dir):
    """STREAMING foreachBatch MERGE with EXACTLY-ONCE semantics — the
    ingest<->streaming-gate loop closed (VERDICT r9 item 6): staged weekly
    event files stream through ``foreachBatch`` into a versioned parquet
    MERGE (upsert by (user_id, event_type): counts and decimal value mass
    accumulate, first/last timestamps widen), guarded by a
    commit-then-record batch ledger — the same A6/A12 contract the ingest
    path's offset store mirrors (FusekiProjector.java:400-479,
    FusekiOffsetStore.java:345-390), here exercised through Spark's OWN
    restart machinery end-to-end.

    Three exactly-once proofs ride the output, all measured, not assumed:
    - ``rerun_added`` = ledger growth when the stream is restarted on the
      same checkpoint with no new input (pinned 0);
    - ``replay_delta`` = change in total merged event count after a staged
      batch is re-applied under an already-recorded batch id — the
      abort-and-replay path (pinned 0: the ledger skips it);
    - the merged state itself must equal the DuckDB batch MERGE oracle
      (net-effect equivalence), hashed per event_type.

    Scale shape: each micro-batch does ONE hash aggregate on the merge
    key and ONE full-outer equi-join against current state — both
    key-partitioned, no window, no global sort; the decimal(28,6)
    accumulator keeps the value mass exact and order-independent across
    batches, so incremental == batch to the last digit.  In production
    the versioned-parquet target is a transactional table (the pattern is
    sink-agnostic); the ledger is what the format's transaction log
    provides natively."""
    import os
    import tempfile

    td, schema = _stage_weekly(spark, sf_dir, event_types=None)
    cached = _MERGE_CACHE.get(td)
    if cached is None:
        root = tempfile.mkdtemp(prefix="st11-merge-")
        ckpt = os.path.join(tempfile.mkdtemp(prefix="st11-ckpt-"), "cp")
        _MERGE_CACHE[td] = (root, ckpt)
    else:
        root, ckpt = cached

    def run_once() -> None:
        stream = _staged_stream(spark, td, schema)
        q = (
            stream.writeStream.foreachBatch(
                lambda bdf, bid: _st11_apply_batch(spark, root, bdf, bid)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    _state1, applied_first = _st11_read_state(spark, root)
    run_once()  # restart on the same checkpoint, no new input: no batches
    state, applied_second = _st11_read_state(spark, root)
    rerun_added = len(applied_second) - len(applied_first)

    # SUM over an all-empty state is NULL; an absent ledger (source
    # staged zero files) has no state at all — both count as 0 so the
    # gate survives an empty input instead of crashing on None arithmetic
    def total_events(st) -> int:
        if st is None:
            return 0
        v = st.agg(F.sum("n_events")).first()[0]
        return int(v) if v is not None else 0

    # abort-and-replay: re-apply a staged file under the LAST recorded
    # batch id; the ledger must make it a no-op
    before = total_events(state)
    if applied_second:
        replay = (
            spark.read.schema(schema)
            .parquet(os.path.join(td, "f0"))
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        _st11_apply_batch(spark, root, replay, max(applied_second))
    state_after, _ = _st11_read_state(spark, root)
    if state_after is None:
        state_after = spark.createDataFrame([], _ST11_STATE_SCHEMA)
    after = total_events(state_after)
    replay_delta = int(after - before)

    return (
        state_after.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_value").cast("double").alias("sum_value"),
            F.date_format(F.min("first_ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format(F.max("last_ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
        .withColumn("rerun_added", F.lit(rerun_added).cast("long"))
        .withColumn("replay_delta", F.lit(replay_delta).cast("long"))
        .orderBy("event_type")
    )
