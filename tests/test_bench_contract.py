"""Bench record contract (VERDICT r8 item 2): the bench consumer keeps
only the last ~2000 chars of stdout, so the machine JSON line must fit.
These tests pin the contract WITHOUT running Spark: they build the
worst-case record shape bench.py would emit and measure it.
"""

import json

import bench
from jena_fuseki_kafka_spark.queries import QUERIES


def _worst_case_record():
    names = bench.HEADLINE + ["http_four_ops_roundtrip"]
    timings = {
        n: 999.999 for n in names if n not in bench.SLIM_LINE_EXCLUDE
    }  # widest plausible formatting; slim line omits SLIM_LINE_EXCLUDE rows
    return {
        "metric": "headline_suite_seconds",
        "value": 99999.999,
        "unit": "sec",
        "queries": timings,
        "batch_seconds": 99999.999,
        "streaming_seconds": 99999.999,
        "http_seconds": 999.999,
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
    # fail here first and either trim rows or re-shape the record
    line = json.dumps(_worst_case_record())
    assert len(line) <= 1900, (
        f"bench JSON line would be {len(line)} chars with all "
        f"{len(bench.HEADLINE) + 1} rows — exceeds the consumer's tail "
        f"capture; trim HEADLINE or move fields to BENCH_full.json"
    )
