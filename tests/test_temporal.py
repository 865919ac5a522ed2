"""Unit semantics of the temporal join operators (queries.temporal).

The r12 asof_join rewrite rides RANGE frames on epoch-micros (frame end
-1 = strict arm, 0 = tie-inclusive arm, both from ONE Window operator);
these tests pin the tie, no-match, NULL-ts, and dual-arm semantics the
q29 gate's oracle (DuckDB native ASOF) asserts only on well-formed data.
"""

from __future__ import annotations

import datetime as dt

import pytest

from jena_fuseki_kafka_spark.queries.temporal import asof_join

T0 = dt.datetime(2024, 1, 1)


def _t(s):
    return T0 + dt.timedelta(seconds=s)


class TestAsofJoinSemantics:
    @pytest.fixture(scope="class")
    def out(self, spark):
        left = spark.createDataFrame(
            [(1, _t(10), "p10"), (1, _t(20), "p20"), (2, _t(5), "p5"), (3, None, "pN")],
            "user_id long, ts timestamp, p string",
        )
        right = spark.createDataFrame(
            [(1, _t(10), "c10"), (1, _t(3), "c3"), (2, _t(9), "c9"), (3, None, "cN")],
            "user_id long, ts timestamp, c string",
        )
        rows = asof_join(
            left, right, key="user_id", ts="ts", strict=True, nonstrict_suffix="_n"
        ).collect()
        return {r["p"]: r for r in rows}

    def test_tie_splits_the_arms(self, out):
        # a right row at the EXACT left ts: invisible to the strict arm,
        # the match for the tie-inclusive arm
        r = out["p10"]
        assert (r["c"], r["c_n"]) == ("c3", "c10")
        assert r["ts_right"] == _t(3) and r["ts_right_n"] == _t(10)

    def test_later_left_row_matches_most_recent(self, out):
        r = out["p20"]
        assert r["c"] == r["c_n"] == "c10"

    def test_left_before_any_right_is_unmatched(self, out):
        r = out["p5"]  # the user's only click is at t=9 > t=5
        assert r["c"] is None and r["c_n"] is None and r["ts_right"] is None

    def test_null_ts_never_matches(self, out):
        # NULL-ts right rows are dropped pre-union; a NULL-ts left row
        # survives with NULL match columns (left-join semantics) — the
        # behavior DuckDB's native ASOF has (NULL comparisons never match)
        r = out["pN"]
        assert r["c"] is None and r["c_n"] is None

    def test_overlapping_payload_columns_rejected(self, spark):
        df = spark.createDataFrame([(1, _t(0), "x")], "user_id long, ts timestamp, v string")
        with pytest.raises(ValueError, match="ambiguous"):
            asof_join(df, df, key="user_id", ts="ts")

    def test_nonstrict_suffix_requires_strict(self, spark):
        df = spark.createDataFrame([(1, _t(0), "x")], "user_id long, ts timestamp, v string")
        df2 = spark.createDataFrame([(1, _t(0), "y")], "user_id long, ts timestamp, w string")
        with pytest.raises(ValueError, match="strict"):
            asof_join(df, df2, key="user_id", ts="ts", strict=False, nonstrict_suffix="_n")
