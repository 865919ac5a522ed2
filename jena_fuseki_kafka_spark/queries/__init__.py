"""Query surface for the correctness/bench harness.

Every query is registered with a name, a (spark, sf_dir) -> DataFrame
callable, and (when SQL-expressible) a DuckDB oracle SQL string producing
identical column names and values.  SURVEY.md §2B maps each relational
query to the SPARQL-algebra operator it exercises; the dedup/similarity/
text modules cover the training-data-pipeline operations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a testdata table; normalize nanosecond-precision parquet
    timestamps (which Spark refuses by default) to TimestampType by
    reading them as long and truncating to micros — matching DuckDB's
    nanos->micros truncation so oracles agree."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a narrow input over all cores BEFORE heavy per-row compute
    (regex tokenize, shingle explode, md5).  Only fires when the scan has
    fewer partitions than the cluster has slots (single-row-group local
    files; a few giant files) — on real multi-row-group data it's a
    no-op, so no shuffle is added at scale.  Where it does fire, shuffle
    bytes ~= input bytes while the downstream CPU work is many times
    that, the same trade the ingest path makes before its parse UDF."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


# import for registration side effects
from . import relational  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import rdf_surface  # noqa: E402,F401
from . import temporal  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import streaming_gate  # noqa: E402,F401
from . import skew  # noqa: E402,F401
from . import multimodal_surface  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query", "load"]
