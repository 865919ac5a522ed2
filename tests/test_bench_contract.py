"""Bench record contract (VERDICT r8 item 2): the bench consumer keeps
only the last ~2000 chars of stdout, so the machine JSON line must fit.
These tests pin the contract WITHOUT running Spark: they build the
worst-case record shape bench.py would emit and measure it.
"""

import json

import bench
from jena_fuseki_kafka_spark.queries import QUERIES


def _worst_case_record(exclude):
    names = bench.HEADLINE + ["http_four_ops_roundtrip"]
    timings = {
        n: 999.999 for n in names if n not in exclude
    }  # widest plausible formatting; slim line omits the excluded rows
    return {
        "metric": "headline_suite_seconds",
        "value": 99999.999,
        "unit": "sec",
        "queries": timings,
        "batch_seconds": 99999.999,
        "streaming_seconds": 99999.999,
        "http_seconds": 999.999,
        "failed_queries": 99,  # stdout carries the count; names in BENCH_full

        "calibration_range_sum_sec": 0.999,
        "sf": 0.1,
    }


def test_headline_names_are_registered():
    ghosts = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not ghosts, f"bench HEADLINE names unknown queries: {ghosts}"


def test_no_duplicate_headline_rows():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    overlap = set(bench.HEADLINE_BATCH) & set(bench.HEADLINE_STREAMING)
    assert not overlap, overlap


def test_json_line_fits_tail_capture():
    # the emit path falls back to a batch-only queries map above 1900
    # chars, but the DEFAULT shape should fit with margin: growing the
    # headline past this bound silently degrades the round record, so
    # fail here first and either trim rows or re-shape the record.
    # Both rotation parities must fit — the excluded half alternates
    # with the ROUND marker.
    half = len(bench.SLIM_ROTATION_POOL) // 2
    for exclude in (
        set(bench.SLIM_ROTATION_POOL[:half]),
        set(bench.SLIM_ROTATION_POOL[half:]),
    ):
        line = json.dumps(_worst_case_record(exclude))
        assert len(line) <= 1900, (
            f"bench JSON line would be {len(line)} chars with "
            f"{len(bench.HEADLINE) + 1 - len(exclude)} rows — exceeds the "
            f"consumer's tail capture; trim HEADLINE or move fields to "
            f"BENCH_full.json"
        )


def test_rotation_pool_covers_previous_fixed_drop_list():
    # the five rows the r9 fixed list dropped must be in the pool (so
    # they ride the line on alternating rounds) and the pool halves must
    # be disjoint headline rows
    assert {
        "q02_top_revenue_orders", "q04_forecast_revenue",
        "q20_tumbling_window_hourly", "q21_sessionization",
        "m05_scene_changes",
    } <= set(bench.SLIM_ROTATION_POOL)
    assert len(bench.SLIM_ROTATION_POOL) == len(set(bench.SLIM_ROTATION_POOL))
    assert set(bench.SLIM_ROTATION_POOL) <= set(bench.HEADLINE)
    assert bench.SLIM_LINE_EXCLUDE < set(bench.SLIM_ROTATION_POOL)
