"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are populated from
``jena_fuseki_kafka_spark.queries`` — each entry is an operator from
SURVEY.md §2 (relational/SPARQL-algebra surface, RDF quad surface,
event-stream analytics) or a training-data-pipeline operator
(dedup / similarity / text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jena_fuseki_kafka_spark.queries import ORACLES, QUERIES  # noqa: E402
from jena_fuseki_kafka_spark.session import _ship_package  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the snowflake-join revenue query (q03): exercises scan,
    pushed filters, broadcast joins, exact decimal aggregation, sort.
    """
    _ship_package(spark)
    return QUERIES["q03_local_supplier_volume"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)  # executors need the package for any UDF paths
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
