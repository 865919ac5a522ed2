"""Bucketed-table co-location: the storage-layout half of the 100 TB
story.  The query-side plans (test_plan_shape.py) prove shuffles are
minimal GIVEN the layout Spark chooses; these prove the engine exploits a
bucketed layout when the data is WRITTEN for its join/aggregation keys —
the "write embeddings bucketed by IVF cell id" deployment s04's docstring
prescribes:

- equal-bucket join on the bucket key runs with ZERO Exchange on either
  side (co-located join — at 100 TB this deletes the dominant shuffle);
- aggregation on the bucket key needs no exchange at all;
- an equality filter on the bucket key prunes to 1 of N buckets at scan
  time (SelectedBucketsCount), the file-level analogue of partition
  pruning.
"""

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    base = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    for name in ("bkt_a", "bkt_b"):
        (
            base.write.mode("overwrite")
            .bucketBy(8, "k")
            .sortBy("k")
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    yield "bkt_a", "bkt_b"
    for name in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


class TestBucketedCoLocation:
    def test_equi_join_on_bucket_key_has_no_exchange(self, spark, bucketed_pair):
        a, b = bucketed_pair
        j = spark.table(a).join(spark.table(b), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 10_000

    def test_groupby_on_bucket_key_has_no_exchange(self, spark, bucketed_pair):
        a, _ = bucketed_pair
        g = spark.table(a).groupBy("k").agg(F.sum("v").alias("s"))
        plan = g._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert g.count() == 10_000

    def test_bucket_key_filter_prunes_buckets(self, spark, bucketed_pair):
        # a filter-only query has no distribution requirement, so the
        # auto-bucketed-scan rule reverts to a plain scan and pruning is
        # lost; pin the conf that keeps bucketed scans (and therefore
        # 1-of-N bucket pruning) active for point lookups
        a, _ = bucketed_pair
        prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        try:
            q = spark.table(a).filter(F.col("k") == 42)
            plan = q._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            assert "SelectedBucketsCount: 1 out of 8" in plan, plan
            assert q.count() == 1
        finally:
            spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
