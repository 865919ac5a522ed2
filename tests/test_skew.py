"""Salting utilities must be result-identical to their naive counterparts."""

from pyspark.sql import functions as F

from jena_fuseki_kafka_spark.queries.skew import salted_join, salted_sum_count


def skewed_df(spark):
    # 90% of rows share key 0 — the hot-key shape
    rows = [(i, i % 10 if i % 10 < 2 else 0, float(i)) for i in range(2000)]
    return spark.createDataFrame(rows, "id long, k long, v double")


class TestSaltedJoin:
    def test_inner_matches_plain(self, spark):
        big = skewed_df(spark)
        small = spark.createDataFrame([(0, "zero"), (1, "one"), (5, "five")], "k long, name string")
        plain = {tuple(r) for r in big.join(small, "k").select("id", "k", "v", "name").collect()}
        salted = {
            tuple(r) for r in salted_join(big, small, "k").select("id", "k", "v", "name").collect()
        }
        assert salted == plain and plain

    def test_left_matches_plain(self, spark):
        big = skewed_df(spark)
        small = spark.createDataFrame([(1, "one")], "k long, name string")
        plain = {tuple(r) for r in big.join(small, "k", "left").select("id", "name").collect()}
        salted = {tuple(r) for r in salted_join(big, small, "k", how="left").select("id", "name").collect()}
        assert salted == plain

    def test_salt_spreads_hot_key(self, spark):
        big = skewed_df(spark)
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
        n_salts = (
            big.filter(F.col("k") == 0)
            .select(salt.alias("s"))
            .distinct()
            .count()
        )
        assert n_salts > 1  # the hot key's rows land on multiple reducers


class TestSaltedAggregate:
    def test_matches_plain_groupby(self, spark):
        df = skewed_df(spark)
        plain = {
            (r.k, r.n, round(r.sv, 6))
            for r in df.groupBy("k")
            .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
            .collect()
        }
        salted = {
            (r.k, r.n, round(r.sum_v, 6))
            for r in salted_sum_count(df, ["k"], ["v"]).collect()
        }
        assert salted == plain


class TestAqeSkewJoin:
    def test_aqe_splits_skewed_join_partition(self, spark):
        """The session config (session.py: adaptive.skewJoin.enabled) must
        actually deliver runtime skew splitting — the implicit half of the
        skew story (skew.py's salting is the explicit half).  Build a
        90%-one-key shuffle join with thresholds scaled to test data and
        assert AQE re-planned the join with skew=true."""
        import re

        from pyspark.sql import functions as F

        old = {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                "spark.sql.autoBroadcastJoinThreshold",
            )
        }
        try:
            spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
            )
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            big = spark.range(500_000).select(
                F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 1000).alias("k"),
                F.col("id").alias("v"),
            )
            dim = spark.range(1000).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("w")
            )
            j = big.join(dim, "k").groupBy().agg(F.count("*").alias("n"))
            assert j.collect()[0]["n"] == 500_000 * 1  # every row matches once
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert re.search(r"Join\(skew=true\)", plan), plan
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
