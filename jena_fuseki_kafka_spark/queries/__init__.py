"""Query surface for the correctness/bench harness.

Every query is registered with a name, a (spark, sf_dir) -> DataFrame
callable, and (when SQL-expressible) a DuckDB oracle SQL string producing
identical column names and values.  SURVEY.md §2B maps each relational
query to the SPARQL-algebra operator it exercises; the dedup/similarity/
text modules cover the training-data-pipeline operations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a testdata table; normalize nanosecond-precision parquet
    timestamps (which Spark refuses by default) to TimestampType by
    reading them as long and truncating to micros — matching DuckDB's
    nanos->micros truncation so oracles agree."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a narrow input over all cores BEFORE heavy per-row compute
    (regex tokenize, shingle explode, md5).  Only fires when the scan
    reads fewer files than the cluster has slots (single-row-group local
    files; a few giant files) — on real multi-file data it's a no-op, so
    no shuffle is added at scale.  Where it does fire, shuffle bytes ~=
    input bytes while the downstream CPU work is many times that, the
    same trade the ingest path makes before its parse UDF.

    The probe uses ``inputFiles()`` (plan metadata only) rather than
    ``df.rdd.getNumPartitions()``, which would force an RDD conversion
    and full plan analysis on the driver per call."""
    sc = df.sparkSession.sparkContext
    n_inputs = len(df.inputFiles())
    if 0 < n_inputs < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


# import for registration side effects
from . import relational  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import rdf_surface  # noqa: E402,F401
from . import temporal  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import streaming_gate  # noqa: E402,F401
from . import skew  # noqa: E402,F401
from . import multimodal_surface  # noqa: E402,F401
from . import update_gate  # noqa: E402,F401

# Explicit registration order.  The correctness driver checks the first 50
# registered queries per round, so ordering is part of the verification
# contract: queries without a prior driver verdict, and queries whose
# implementation changed this round, go first; queries already driver-green
# in a previous round rotate to the tail.  Anything registered but unlisted
# is by definition brand-new (no verdict at all), so it sorts BEFORE the
# listed names — inside the check window, never silently dropped past it.
_CHECK_PRIORITY = [
    # ---- r7 window (first 50; new+unlisted queries sort ahead of all of
    # these and take slots off the end of the window) ----
    # r4-green, 2 rounds stale at the r6 check — MUST lead or they cross
    # the "no verdict older than 2 rounds" boundary (VERDICT r6 item 3):
    "t08_pii_scrub",
    "t09_url_domain_stats",
    "t10_char_entropy",
    "q16_conditional_agg_case",
    "q23_funnel_signup_to_purchase",
    "q38_approx_percentile",
    "t07_repetition_ratio",
    # TOUCHED THIS ROUND (forced-broadcast removal per VERDICT r6 item 1,
    # DESCRIBE frontier unhint item 3) -> re-verify:
    "q02_top_revenue_orders",
    "q03_local_supplier_volume",
    "q18_multi_join_part_supplier_stats",
    "q19_disjunctive_predicate_join",
    "q26_cohort_retention",
    "d02_minhash_lsh",
    "r11_describe_subject",
    # TOUCHED THIS ROUND (widened oracle gates, VERDICT r6 item 6):
    "r18_negated_property_set",
    "p04_leakage_safe_split",
    "u01_update_sequence",
    # TOUCHED THIS ROUND (translate.py ADVICE fixes: ordering datatype
    # gates, string-function unbound propagation, numeric result types,
    # aggregate-projection validation) -> re-verify the SPARQL surface:
    "r01_sparql_acceptance_count",
    "r02_bgp_join_filter",
    "r03_graph_quantification",
    "r04_sparql_engine_group_by",
    "r05_property_path_closure",
    "r06_optional_bind_coalesce",
    "r07_not_exists_antijoin",
    "r08_construct_quads",
    "r09_values_inline_data",
    "r10_ask",
    "r12_group_concat",
    "r13_subselect",
    "r14_degree_histogram",
    "r15_optional_unbound_compat",
    "r16_from_named_dataset",
    "r17_minus_compat",
    # TOUCHED THIS ROUND (connected-components convergence guard,
    # d04 oversized-block MinHash fallback, st05 dim-join unhint):
    "d06_dedup_clusters",
    "s06_embedding_dup_clusters",
    "d04_ngram_jaccard_blocked",
    "st05_streaming_static_enrichment",
    # ---- r5-green, code untouched: 2 rounds stale at the r7 check.  The
    # r7 window cannot hold all 31 of them (30 queries changed this round
    # and must re-verify); the ones below the boundary MUST lead the r8
    # window — rotate them to the very top of this list next round ----
    "m01_image_features",
    "m02_audio_features",
    "q04_forecast_revenue",
    "q05_order_priority_count",
    "q06_customers_without_orders",
    "q07_optional_left_join",
    "q08_union_all_parts_suppliers",
    "q09_distinct_projection",
    "q10_aggregate_functions",
    "q11_order_offset_pagination",
    "q12_subquery_above_avg",
    "q13_values_inline_join",
    "q14_window_top_order_per_cust",
    # ---- window boundary ~here (50 incl. any new registrations) ----
    "q15_rollup_revenue",
    "q17_string_functions",
    "q20_tumbling_window_hourly",
    "q21_sessionization",
    "q22_json_props_extract",
    "q24_exact_percentiles",
    "q25_cube_aggregation",
    "q27_sliding_window",
    "q28_set_operations",
    "q31_grouping_sets",
    "q32_approx_distinct",
    "q33_semi_anti_join",
    "q34_lead_lag_ntile",
    "q36_per_group_outlier_filter",
    "q37_running_frames",
    "t05_feature_hash_embedding",
    "t06_topk_bigrams_per_lang",
    "s02_ann_lsh_bucketed",
    # ---- r6-green, code untouched -> tail (1 round old) ----
    "q01_pricing_summary",
    "s03b_embedding_near_dup_lowt",
    "s03_embedding_near_dup",
    "st01_streaming_tumbling_window",
    "st02_streaming_dedup_count",
    "st03_streaming_session_window",
    "st04_streaming_first_seen",
    "q29_asof_join",
    "q30_interval_join",
    "q35_salted_skew_agg",
    "p01_stratified_sample",
    "p02_curation_pipeline",
    "p03_mixture_rebalance",
    "m03_video_frame_sample",
    "m04_frame_dedup",
    "d01_exact_dedup",
    "d03_simhash",
    "d05_decontamination",
    "s01_ann_bruteforce_topk",
    "s04_ann_ivf",
    "s05_ann_recall_gate",
    "t01_language_id",
    "t02_quality_score",
    "t03_token_count",
    "t04_fingerprint",
]


def _apply_check_priority() -> None:
    ordered = [n for n in QUERIES if n not in _CHECK_PRIORITY]
    ordered += [n for n in _CHECK_PRIORITY if n in QUERIES]
    for mapping in (QUERIES, ORACLES):
        snapshot = dict(mapping)
        mapping.clear()
        mapping.update({n: snapshot[n] for n in ordered if n in snapshot})


_apply_check_priority()

__all__ = ["QUERIES", "ORACLES", "query", "load"]
