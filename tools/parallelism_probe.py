#!/usr/bin/env python
"""Cluster-shape invariance probe: results must not depend on parallelism.

At 100 TB the same query runs on 1000 executors with thousands of input
splits and whatever shuffle partitioning the cluster is tuned to; on the
driver's harness it runs on local[8] with a handful of partitions.  Any
gate whose ANSWER depends on partitioning — an unpinned sort under a
LIMIT, a float sum whose partial-aggregation order leaks into a rounded
output, a sketch whose merge isn't associative-commutative in effect, a
``mapInPandas`` kernel that assumes anything about Arrow batch
boundaries, an iterative fixpoint (d06 pointer jumping, r05 closure)
sensitive to iteration partitioning — would silently produce different
answers on different cluster shapes.  That is a worse failure mode than
being wrong consistently: it is wrong *sometimes*, unreproducibly.

This probe runs a representative, hash-sensitive gate per family twice
in ONE session under two deliberately hostile runtime shapes:

- shape A: 3 shuffle partitions, default 128 MiB input splits, default
  Arrow batch size — the "everything in one place" degenerate.
- shape B: 47 shuffle partitions (prime, never divides any fixture's
  row count evenly), 64 KiB input splits (forces multi-split scans of
  even the sf0.001 fixtures), AQE partition coalescing OFF (so the 47
  actually materialize), and 7-row Arrow batches (mapInPandas kernels
  see many tiny batches instead of one big one).

and asserts the order-insensitive value hash (the driver's own compare,
reused from tools/check_correctness.py — floats at 6 significant
digits, so only genuine instability trips; ulp noise does not) is
IDENTICAL.  Three streaming gates are in the default set too: a new
streaming query takes its state-store partition count from the shuffle
partitioning, so shape B runs the same pipelines over 47 state
partitions — the state machinery must converge to the same answer.

Like every probe in this family the measured partition must match
EXPECTED_DIFFER exactly (exit 0 iff it does): a gate newly diverging
AND an expected-diverger going stable both flag.

Usage: python tools/parallelism_probe.py [--sf-dir /root/testdata/sf0.001] [gate ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_correctness import value_hash  # noqa: E402

# gate -> reason its answer is EXPECTED to depend on cluster shape.
# Measured 2026-08-16: EMPTY — every probed gate, including both approx
# sketches (q32's HLL, q38's percentile sketch), every windowed/LIMIT
# ranking (all tie-broken to a total order), the iterative fixpoints
# (d06 pointer jumping, r05 path closure), and the mapInPandas media
# kernels (row-local by construction), is bit-stable across shapes.
EXPECTED_DIFFER: dict[str, str] = {}

# one hash-sensitive representative per family/mechanism:
#   decimal & moment aggregates: q01, q10   windows+LIMIT: q11, q14, q17
#   exact interpolation: q24                asof/interval: q29, q30
#   sketches: q32 (HLL), q38 (percentile)   outlier stddev: q36
#   salted join: q40                        RDF agg/concat/fixpoint: r02, r12, r05
#   dedup: d01 (keeper), d02 (LSH pairs), d03 (simhash), d06 (pointer jumping)
#   ANN: s01 (ranking), s04 (IVF), s07 (quantization), s11 (PQ argmin/ADC)
#   text: t05 (feature hash), t11 (LM float sums), t12 (integer logit)
#   sampling/splits: p01, p06, p08 (rank-prefix epoch selection)
#   mapInPandas batch shape: m07
GATES = [
    "q01_pricing_summary",
    "q10_aggregate_functions",
    "q11_order_offset_pagination",
    "q14_window_top_order_per_cust",
    "q17_string_functions",
    "q24_exact_percentiles",
    "q29_asof_join",
    "q30_interval_join",
    "q32_approx_distinct",
    "q36_per_group_outlier_filter",
    "q38_approx_percentile",
    "q40_salted_fact_dim_join",
    "r02_bgp_join_filter",
    "r05_property_path_closure",
    "r12_group_concat",
    "d01_exact_dedup",
    "d02_minhash_lsh",
    "d03_simhash",
    "d06_dedup_clusters",
    "s01_ann_bruteforce_topk",
    "s04_ann_ivf",
    "s07_int8_quantization",
    "s10_incremental_ann_admission",
    "s11_pq_adc_topk",
    "t05_feature_hash_embedding",
    "t11_bigram_lm_perplexity",
    "t12_classifier_quality_filter",
    "p01_stratified_sample",
    "p06_time_embargo_split",
    "p08_epoch_mixture_plan",
    "m07_image_phash_neardup",
    # streaming: state-store partition count follows shuffle partitions
    # for a NEW query, so shape B runs the same pipeline over 47 state
    # partitions and tiny input splits — windowed aggregation, dedup
    # state, and flatMapGroupsWithState-style first-seen all must
    # converge to the same answer (measured stable 2026-08-16)
    "st01_streaming_tumbling_window",
    "st02_streaming_dedup_count",
    "st04_streaming_first_seen",
]

SHAPES = {
    "A": {
        "spark.sql.shuffle.partitions": "3",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    },
    "B": {
        "spark.sql.shuffle.partitions": "47",
        "spark.sql.files.maxPartitionBytes": str(64 * 1024),
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "7",
    },
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("gates", nargs="*")
    args = ap.parse_args()
    gates = args.gates or GATES

    from jena_fuseki_kafka_spark.queries import QUERIES
    from jena_fuseki_kafka_spark.session import build_session

    spark = build_session(app_name="parallelism-probe", master="local[8]")

    unknown = [g for g in gates if g not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown gates: {unknown}")

    ok = True
    for name in gates:
        hashes = {}
        t0 = time.time()
        err = None
        for shape, confs in SHAPES.items():
            for k, v in confs.items():
                spark.conf.set(k, v)
            try:
                df = QUERIES[name](spark, args.sf_dir)
                hashes[shape] = value_hash(
                    [tuple(r) for r in df.collect()], df.columns
                )
            except Exception as e:  # a crash under either shape is a fail
                err = f"{shape}: {e}"
                break
        dt = time.time() - t0
        if err is not None:
            print(f"FAIL {name} ({dt:.1f}s): error under shape {err}")
            measured_differ = True  # crash counts as shape-dependent
        else:
            measured_differ = hashes["A"] != hashes["B"]
            verdict = "DIFFER" if measured_differ else "STABLE"
            print(f"{'FAIL' if measured_differ else 'PASS'} {name} ({dt:.1f}s): {verdict} {hashes['A']} / {hashes['B']}")
        want_differ = name in EXPECTED_DIFFER
        if measured_differ != want_differ:
            why = EXPECTED_DIFFER.get(name, "expected shape-stable")
            print(f"UNEXPECTED: {name} {'DIFFER' if measured_differ else 'STABLE'} ({why})")
            ok = False

    spark.stop()
    if ok:
        print(
            f"partition as expected ({len(gates)} gates, "
            f"{sum(1 for g in gates if g in EXPECTED_DIFFER)} known shape-dependent)"
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
