#!/usr/bin/env python3
"""Exact-scaling probe: run fact-table aggregates at sf0.1 and at a
materialized 10x copy (sf~1) and assert the answers scale EXACTLY.

Why this exists: the per-round driver verifies correctness at sf0.01 and
the builder sweeps sf0.1, but "would this still be right AND bounded at
100 TB" needs a scale axis, not just a correctness axis.  Duplicating the
fact table k times gives a free exact oracle at the bigger scale — every
group's COUNT multiplies by exactly k and every decimal SUM multiplies by
exactly k (the per-row decimal cast is deterministic and decimal addition
is associative/exact), so the big-scale answer is checkable WITHOUT
running DuckDB on 6M rows.  A partitioning/overflow/precision bug that
only appears with more rows per group (decimal overflow past 28 digits,
a partial-agg merge bug, an AQE re-plan that drops rows) breaks the
k-multiple identity immediately.

What it pins per query:
  - row set: the big run returns the SAME group keys (count parity),
  - values: every count facet is exactly k * small, every decimal-sum
    facet is k * small within double round-off (the final cast to double
    happens after the exact decimal sum, so tolerance is ulp-level:
    rel 1e-9),
  - plans: the big run must stay free of CartesianProduct /
    BroadcastNestedLoopJoin / BatchEvalPython (a join strategy is ALLOWED
    to flip broadcast->shuffle under AQE at the bigger input — that flip
    is the design, not a defect — but it must stay an equi-join),
  - runtime: a catastrophic-complexity tripwire only (big <= 25x small
    wall time; a linear operator lands well under k on a warm JVM, a
    quadratic one blows past) — NOT a performance benchmark; bench.py
    owns timing.  Measured ratios land around 0.3-0.8x (yes, the 10x
    run is FASTER in wall time): the sf0.1 fixture is ONE unsplittable
    parquet row group, so the 1x scan serializes onto one task (the
    layout problem q01's fan_out documents), while the materialized 10x
    copy is 32 parallel files saturating every core — a direct
    demonstration that the operators are IO-layout-bound, not
    compute-bound, exactly the property that survives a 1000-executor
    scale-out.

Facts are duplicated with l_orderkey offset per copy (keeps the
(orderkey, linenumber) PK unique and the orders join fan-out identical);
dimension tables (part/supplier/orders' customer side) are NOT scaled —
dims grow sublinearly in every real warehouse, and keeping them fixed
preserves each group's identity so the k-multiple oracle stays exact.

Queries chosen: the lineitem aggregate family whose facets are all
counts or guarded decimal sums (q01 scan+agg, q04 pure filter+agg, q19
disjunctive join+agg, q18 star join+agg top-k).  q18's HAVING
(n_items >= 5) and LIMIT survive scaling because every count scales by
the same k and the ORDER BY total_qty ranking is scale-invariant.

Usage: python tools/scale_probe.py [--k 10] [--sf-dir /root/testdata/sf0.1]
Exit 0 iff every invariant holds.
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from jena_fuseki_kafka_spark.session import build_session  # noqa: E402
from jena_fuseki_kafka_spark.queries import QUERIES, load  # noqa: E402

# (query, group-key columns, count facets, decimal-sum facets)
PROBES = [
    ("q01_pricing_summary", ["l_returnflag", "l_linestatus"],
     ["count_order"], ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"]),
    ("q04_forecast_revenue", [], [], ["revenue"]),
    ("q19_disjunctive_predicate_join", ["brand"], ["n_items"], ["revenue", "total_qty"]),
    ("q18_multi_join_part_supplier_stats", ["p_brand", "s_name"],
     ["n_items"], ["total_qty"]),
]

FATAL_PLAN_NODES = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")
REL_TOL = 1e-9
TIME_TRIPWIRE = 25.0


def build_scaled_dir(spark, sf_dir: str, out_dir: str, k: int) -> None:
    """Materialize k x lineitem (orderkey-offset per copy); link dims."""
    li = load(spark, sf_dir, "lineitem")
    max_key = li.agg(F.max("l_orderkey")).collect()[0][0]
    copies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * (max_key + 1)))
        for i in range(k)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))
    for dim in ("part", "supplier", "orders", "customer", "nation", "region"):
        src = os.path.join(sf_dir, f"{dim}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(out_dir, f"{dim}.parquet"))


def rows_by_key(df, keys):
    out = {}
    for r in df.collect():
        d = r.asDict()
        out[tuple(d[k] for k in keys)] = d
    return out


def check_query(spark, name, keys, counts, sums, sf_dir, big_dir, k):
    QUERIES[name](spark, sf_dir).collect()  # JVM/codegen warmup, untimed
    t0 = time.time()
    small = rows_by_key(QUERIES[name](spark, sf_dir), keys)
    t_small = time.time() - t0

    big_df = QUERIES[name](spark, big_dir)
    plan = big_df._jdf.queryExecution().executedPlan().toString()
    bad_nodes = [n for n in FATAL_PLAN_NODES if n in plan]

    t0 = time.time()
    big = rows_by_key(big_df, keys)
    t_big = time.time() - t0

    errs = list(f"fatal plan node at {k}x: {n}" for n in bad_nodes)
    if set(small) != set(big):
        errs.append(f"group-key sets differ: {set(small) ^ set(big)}")
    for gk, srow in small.items():
        brow = big.get(gk)
        if brow is None:
            continue
        for c in counts:
            if brow[c] != k * srow[c]:
                errs.append(f"{gk}.{c}: {brow[c]} != {k} * {srow[c]}")
        for c in sums:
            want = k * srow[c]
            got = brow[c]
            if want == 0:
                ok = got == 0
            else:
                ok = abs(got - want) <= REL_TOL * abs(want)
            if not ok:
                errs.append(f"{gk}.{c}: {got} !~ {k} * {srow[c]}")
    ratio = t_big / t_small if t_small > 0 else float("inf")
    if ratio > TIME_TRIPWIRE:
        errs.append(f"runtime tripwire: {t_big:.1f}s at {k}x vs {t_small:.1f}s ({ratio:.1f}x > {TIME_TRIPWIRE}x)")
    status = "PASS" if not errs else "FAIL"
    print(f"{status} {name}: {len(small)} groups, {t_small:.2f}s -> {t_big:.2f}s at {k}x ({ratio:.1f}x wall)")
    for e in errs:
        print(f"  !! {e}")
    return not errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = build_session(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        t0 = time.time()
        build_scaled_dir(spark, args.sf_dir, tmp, args.k)
        print(f"materialized {args.k}x lineitem in {time.time() - t0:.1f}s at {tmp}")
        ok = True
        for name, keys, counts, sums in PROBES:
            ok &= check_query(spark, name, keys, counts, sums, args.sf_dir, tmp, args.k)
        print("scale invariants hold" if ok else "SCALE INVARIANT VIOLATIONS")
        return 0 if ok else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
