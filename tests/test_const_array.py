"""const_array must be value- AND type-identical to the per-element
literal forms it replaced (F.array(*[F.lit(v)...]) / F.lit(list)): the
t11/t12 model tables and s02's sign matrix feed oracle-hashed outputs,
so a literal whose TYPE drifts (int -> decimal, double -> decimal)
would change downstream arithmetic, not just the plan."""

from pyspark.sql import functions as F

from jena_fuseki_kafka_spark.queries import const_array


def _both(spark, new_col, old_col):
    df = spark.range(1).select(new_col.alias("new"), old_col.alias("old"))
    row = df.collect()[0]
    return row["new"], row["old"], df.schema["new"].dataType, df.schema["old"].dataType


def test_int_array_matches_per_element_lits(spark):
    vals = [0, -1, 7, 2**31 - 1, -(2**31)]
    n, o, tn, to = _both(spark, const_array(vals), F.array(*[F.lit(v) for v in vals]))
    assert n == o == vals
    assert tn == to, f"{tn} != {to}"


def test_long_elements_get_bigint_type(spark):
    vals = [2**31, -(2**31) - 1, 0]
    n, o, tn, to = _both(spark, const_array(vals), F.array(*[F.lit(v) for v in vals]))
    assert n == o == vals
    assert tn.elementType.simpleString() == "bigint"
    # the old form promotes the whole array to the widest element type;
    # const_array renders each element wide enough to hold its value, and
    # SQL's array() applies the same common-type promotion
    assert tn == to


def test_t11_model_values_roundtrip(spark):
    # the real t11 table shape: 729 negative micro-log-probs within int32
    vals = [-(i * 9391) % 7_000_000 * -1 for i in range(729)]
    n, o, tn, to = _both(spark, const_array(vals), F.array(*[F.lit(v) for v in vals]))
    assert n == o == vals
    assert tn == to


def test_nested_double_matrix_matches_f_lit(spark):
    vals = [[1.0, -1.0, 0.5, -0.25], [0.1, -0.0, 2.5e-17, 1e300]]
    n, o, tn, to = _both(spark, const_array(vals), F.lit(vals))
    assert n == o
    assert tn == to, f"{tn} != {to}"
    # bit-exactness of the repr round-trip, element by element
    for row_n, row_v in zip(n, vals):
        for got, want in zip(row_n, row_v):
            assert got == want and str(got) == str(want)
