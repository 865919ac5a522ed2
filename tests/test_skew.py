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
