"""Skew-handling utilities: salting for hot keys.

AQE's skew-join split (enabled in session.py) handles most skew at runtime;
these are the explicit tools for the cases AQE can't fix — a replicated
(fragment-and-replicate) join for a skewed equi-join key, and a two-stage
salted aggregation for hot grouping keys whose single reducer would
otherwise bottleneck a 1000-executor job.

Both are result-identical to their naive counterparts (tests assert it);
only the physical distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SALT = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join of a big (skewed) side with a small side.

    The big side gets a deterministic per-row salt in [0, n_salt); the
    small side is replicated n_salt times; the join key becomes
    (key, salt), so a hot key's rows spread over n_salt reducers instead
    of one.  Equivalent to ``big.join(small, on, how)`` for inner/left —
    the salt never changes which rows match, only where they meet.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt))
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    n_salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-stage aggregation for hot grouping keys: partial sums/counts per
    (keys, salt), then combine per keys.  Spark's map-side partial
    aggregation usually makes this unnecessary — use it when the DISTINCT
    post-shuffle key set is tiny but row counts per key are huge, so even
    the reduce side of one key overflows a task.

    Output columns: keys + ``sum_<col>`` per sum col + ``n`` (row count).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count("*").alias("__n"),
            *[F.sum(c).alias(f"__sum_{c}") for c in sum_cols],
        )
    )
    return stage1.groupBy(*keys).agg(
        F.sum("__n").alias("n"),
        *[F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


# ---------------------------------------------------------------- gate query
from . import finite_spark, load, query  # noqa: E402


@query(
    "q35_salted_skew_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q35(spark, sf_dir):
    """Two-stage salted aggregation through the gate: events has only 5
    event_type keys — at 100 TB each key's reduce partition would be 20%
    of the table.  Salting fans each key over 8 reducers first; the
    combine stage then reduces 5x8 tiny rows.  Result is hash-identical
    to the naive GROUP BY (decimal sums are order-independent)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", finite_spark(F.col("value")).cast("decimal(28,6)").alias("value_dec")
    )
    out = salted_sum_count(ev, keys=["event_type"], sum_cols=["value_dec"])
    return out.select(
        "event_type",
        "n",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
    ).orderBy("event_type")


@query(
    "q40_salted_fact_dim_join",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(28,6)) AS v FROM events
    ),
    dim AS (
      SELECT event_type, SUM(v) AS type_sum, COUNT(*) AS type_n
      FROM e GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n_above,
           CAST(SUM(e.v) AS DOUBLE) AS sum_above
    FROM e JOIN dim d ON e.event_type = d.event_type
    WHERE e.v * CAST(d.type_n AS DECIMAL(10,0)) > d.type_sum
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def q40(spark, sf_dir):
    """``salted_join`` (fragment-and-replicate) through the oracle gate —
    VERDICT r7 item 6: q35 exercises the salted AGGREGATION; this gate
    exercises the salted JOIN on the same pathological key shape.  The
    fact side (events) joins its per-type statistics dim on event_type —
    only 5 distinct keys, so at 100 TB each key is 20% of the table and a
    plain shuffle join funnels the whole corpus through 5 reducers.
    ``salted_join`` salts the fact side into 8 fragments per key and
    EXPLODE-replicates the 5-row dim 8x, spreading each hot key over 8
    reducers; the result is row-identical to the naive join (the salt
    never changes which rows match, only where they meet), which is
    exactly what the unsalted DuckDB oracle asserts.

    The above-type-mean predicate is expressed division-free
    (v * n > sum, all DECIMAL) so both engines compare exact values —
    a double AVG would differ in the last ulp between engines and flip
    boundary rows.  The value cast is decimal(28,6) like every other
    revenue gate — the (18,6) it first shipped with overflows (an ANSI
    job abort, not a wrong answer) on values >= 1e12, which a 100 TB
    corpus will contain."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        # finite_spark: NaN/Inf metric -> NULL v on both engines; a NULL
        # v falls out of the above-mean predicate and the sum alike
        finite_spark(F.col("value")).cast("decimal(28,6)").alias("v"),
    )
    dim = ev.groupBy("event_type").agg(
        F.sum("v").alias("type_sum"), F.count("*").alias("type_n")
    )
    joined = salted_join(ev, dim, on="event_type", n_salt=DEFAULT_SALT)
    return (
        joined.filter(
            F.col("v") * F.col("type_n").cast("decimal(10,0)") > F.col("type_sum")
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_above"),
            F.sum("v").cast("double").alias("sum_above"),
        )
        .orderBy("event_type")
    )
