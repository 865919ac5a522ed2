#!/usr/bin/env python
"""Capture the PRE-TRUNCATION plans of every stable_checkpoint'd
sub-relation a query builds (plus the final plan), for judge-checkable
before/after evidence when the interesting plan node lives INSIDE a
checkpoint (e.g. d06/s06's edge-list sort, which the truncated final
plan cannot show).

Works on any code version (monkeypatches stable_checkpoint rather than
relying on the PLAN_OBSERVER hook, which only exists from r16 on).

Usage: python tools/capture_subtree_plans.py <tag> <suffix> query [query ...]
Writes plans/<tag>/<query>_subtrees_<suffix>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jena_fuseki_kafka_spark import checkpointing  # noqa: E402
from jena_fuseki_kafka_spark.queries import QUERIES  # noqa: E402
from jena_fuseki_kafka_spark.session import build_session  # noqa: E402


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__, file=sys.stderr)
        return 2
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(
        app_name="capture-subtree-plans",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    original = checkpointing.stable_checkpoint
    captured: list[str] = []

    def observing(df, eager: bool = True):
        captured.append(
            f"-- stable_checkpoint(eager={eager}) subtree plan --\n"
            + df._jdf.queryExecution().explainString(mode)
        )
        return original(df, eager=eager)

    # patch both the module attr and the names imported into query modules
    import jena_fuseki_kafka_spark.queries.dedup as _d
    import jena_fuseki_kafka_spark.queries.similarity as _s

    patch_sites = [checkpointing, _d, _s]
    for m in patch_sites:
        if getattr(m, "stable_checkpoint", None) is original:
            m.stable_checkpoint = observing

    try:
        for name in names:
            captured.clear()
            df = QUERIES[name](spark, sf_dir)
            final = df._jdf.queryExecution().explainString(mode)
            path = os.path.join(out_dir, f"{name}_subtrees_{suffix}.txt")
            with open(path, "w") as f:
                f.write("\n\n".join(captured))
                f.write("\n\n-- FINAL (post-truncation) plan --\n")
                f.write(final)
            print(f"{name}: {path} ({len(captured)} checkpointed subtrees)")
    finally:
        for m in patch_sites:
            m.stable_checkpoint = original
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
