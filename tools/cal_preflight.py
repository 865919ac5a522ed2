#!/usr/bin/env python
"""Warmed calibration pre-flight for bench record attempts.

The bench record gate (PLANS.md r14/r15 ledgers): an 8-minute full suite
cannot beat a 0.128-calibration record unless the host's warmed
steady-state calibration is comparable — and two probe pitfalls were
measured in r15:

- JIT warmup inflates the first 2-3 samples of a cold session (observed:
  4.1s first sample converging to ~0.2), so a naive 3-sample median
  overstates the host by 2x+.  This probe runs N samples (default 10)
  and reports the median of samples 4..N.
- The host oscillates fast/slow on MINUTE timescales (a full run's
  END-of-run calibration read 0.124 while its rows ran a non-uniform
  1.2x wave), so a passing pre-flight is NECESSARY, not sufficient —
  the row-uniformity check against the committed record stays the
  decisive post-run filter.

Exit 0 iff the warmed median <= --gate (default 0.15, just above the
0.128 record's calibration); print the verdict either way.  Run this
IMMEDIATELY before `python bench.py` — a minutes-old reading is stale.

Usage: python tools/cal_preflight.py [--samples 10] [--gate 0.15]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=10)
    ap.add_argument("--gate", type=float, default=0.15)
    args = ap.parse_args()

    from jena_fuseki_kafka_spark.session import build_session

    spark = build_session(
        app_name="cal-preflight",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    cal = []
    for _ in range(max(args.samples, 5)):
        t0 = time.time()
        # the bench's own calibration job (bench.py): fixed pure-JVM
        # range sum — no I/O, no shuffle, host speed only
        spark.range(1_000_000_000).selectExpr("sum(id)").collect()
        cal.append(round(time.time() - t0, 3))
    warmed = round(statistics.median(cal[3:]), 3)
    print(f"samples: {cal}")
    print(f"warmed median (samples 4..n): {warmed}  gate: {args.gate}")
    if warmed <= args.gate:
        print("PRE-FLIGHT PASS — launch bench NOW (reading goes stale in minutes)")
        return 0
    print("PRE-FLIGHT FAIL — a record attempt at this calibration is wasted")
    return 1


if __name__ == "__main__":
    sys.exit(main())
