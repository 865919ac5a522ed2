"""Data-layout pruning + runtime filtering: the scan-elimination half of
the 100 TB story, next to test_bucketing.py's co-location half.

At cluster scale the fastest byte is the one never read.  These prove the
engine exploits the three mechanisms that delete scan work when data is
laid out by its query keys:

- STATIC partition pruning: a literal predicate on the partition column
  never touches the other partitions' files;
- DYNAMIC partition pruning (DPP): a join against a filtered dimension
  prunes the fact scan at RUNTIME using the dim's surviving keys — the
  star-schema pattern where the pruning predicate is not known until the
  dim side is evaluated;
- RUNTIME bloom-filter join reduction: for selective joins on
  NON-partition keys, Spark builds a bloom filter from the small side and
  pushes might_contain onto the big side's scan, shrinking the shuffle
  before it happens.

All three are conf-gated optimizer behaviors, exactly the kind a version
bump can silently drop — which is why they are runtime-pinned here (same
rationale as TestAqeSkewJoin).
"""

import re

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def day_partitioned_events(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("day", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
    return path


class TestStaticPartitionPruning:
    def test_day_filter_reads_only_that_partition(self, spark, day_partitioned_events):
        df = spark.read.parquet(day_partitioned_events)
        one_day = df.filter(F.col("day") == "2024-01-05")
        # plan-metadata file listings (inputFiles) are NOT pruned; what
        # matters is which files execution actually touches
        files = [
            r[0]
            for r in one_day.select(F.input_file_name()).distinct().collect()
        ]
        assert files, "expected at least one file for the selected day"
        assert all("day=2024-01-05" in f for f in files), files
        # and the plan carries it as a PartitionFilter, not a post-scan one
        p = one_day._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert re.search(r"PartitionFilters: \[[^\]]*day", p), p

    def test_unfiltered_scan_sees_all_partitions(self, spark, day_partitioned_events):
        df = spark.read.parquet(day_partitioned_events)
        days = {re.search(r"day=([0-9-]+)", f).group(1) for f in df.inputFiles()}
        assert len(days) > 1, days


class TestDynamicPartitionPruning:
    def test_filtered_dim_join_prunes_fact_partitions(
        self, spark, day_partitioned_events, tmp_path
    ):
        # a 3-day dim table; joining it must confine the fact scan to
        # those 3 partitions even though the fact-side predicate only
        # exists at runtime
        dim_path = str(tmp_path / "dim_days")
        spark.createDataFrame(
            [("2024-01-03",), ("2024-01-04",), ("2024-01-05",)], ["day"]
        ).select(F.col("day").cast("date").alias("day"), F.lit(1).alias("tag")).write.mode(
            "overwrite"
        ).parquet(dim_path)

        fact = spark.read.parquet(day_partitioned_events)
        dim = spark.read.parquet(dim_path).filter(F.col("tag") == 1)
        joined = fact.join(dim, "day").groupBy("day").agg(F.count("*").alias("n"))

        p = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in p.lower(), p

        rows = {str(r["day"]): r["n"] for r in joined.collect()}
        assert set(rows) == {"2024-01-03", "2024-01-04", "2024-01-05"}
        # cross-check counts against a plain filter
        expect = (
            fact.filter(F.col("day").isin("2024-01-03", "2024-01-04", "2024-01-05"))
            .groupBy("day")
            .agg(F.count("*").alias("n"))
        )
        assert rows == {str(r["day"]): r["n"] for r in expect.collect()}


class TestRuntimeBloomFilterJoin:
    @pytest.fixture()
    def parquet_pair(self, spark, tmp_path):
        fact_path = str(tmp_path / "bloom_fact")
        dim_path = str(tmp_path / "bloom_dim")
        spark.range(0, 200_000).select(
            (F.col("id") % 10_000).alias("k"), F.col("id").alias("payload")
        ).write.mode("overwrite").parquet(fact_path)
        # dim: 10k keys, of which a selective filter keeps 100
        spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") % 100).alias("grp")
        ).write.mode("overwrite").parquet(dim_path)
        return fact_path, dim_path

    def _confs(self, spark, values):
        saved = {}
        for key, val in values.items():
            saved[key] = spark.conf.get(key, None)
            spark.conf.set(key, val)
        return saved

    def _restore(self, spark, saved):
        for key, val in saved.items():
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)

    def test_bloom_filter_injected_and_lossless(self, spark, parquet_pair):
        fact_path, dim_path = parquet_pair
        saved = self._confs(
            spark,
            {
                # force a shuffle join (broadcast would make the bloom moot)
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
                # the real thresholds target 10 GB scans; scale them down
                # so the tiny fixture qualifies — the MECHANISM is what is
                # being pinned, not the default sizing
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
                "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
            },
        )
        try:
            fact = spark.read.parquet(fact_path)
            dim = spark.read.parquet(dim_path).filter(F.col("grp") == 7)
            joined = fact.join(dim, "k").groupBy("grp").agg(
                F.count("*").alias("n"), F.sum("payload").alias("s")
            )
            opt = joined._jdf.queryExecution().optimizedPlan().toString()
            assert "might_contain" in opt, opt
            [row] = joined.collect()
        finally:
            self._restore(spark, saved)

        # lossless: same answer with the rewrite off
        saved = self._confs(
            spark, {"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"}
        )
        try:
            fact = spark.read.parquet(fact_path)
            dim = spark.read.parquet(dim_path).filter(F.col("grp") == 7)
            [plain] = (
                fact.join(dim, "k")
                .groupBy("grp")
                .agg(F.count("*").alias("n"), F.sum("payload").alias("s"))
                .collect()
            )
        finally:
            self._restore(spark, saved)
        assert (row["n"], row["s"]) == (plain["n"], plain["s"])
        assert row["n"] == 100 * 20  # 100 surviving keys x 20 fact rows each
