"""Plan-shape regression tests: the 100 TB safeguards.

Correctness tests prove the small-SF answer; these prove the PLAN is the
one that survives a 1000-executor scale-up: filters reach the parquet scan
(row-group pruning), small dimensions broadcast (no fact-table shuffle
before aggregation), scans prune columns, and the JVM-path queries never
fall back to row-at-a-time Python evaluation.
"""

import re

import pytest

from jena_fuseki_kafka_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def optimized_plan(spark, name: str) -> str:
    """Optimized LOGICAL plan — explicit F.broadcast hints survive here as
    ``leftHint=/rightHint=(strategy=broadcast)`` annotations on Join nodes,
    whereas the physical plan can't distinguish a forced broadcast from one
    Catalyst/AQE chose from sizes."""
    return QUERIES[name](spark, SF)._jdf.queryExecution().optimizedPlan().toString()


def hint_count(spark, name: str) -> int:
    return len(re.findall(r"strategy=broadcast", optimized_plan(spark, name)))


class TestPushdown:
    def test_q01_shipdate_filter_pushed_to_scan(self, spark):
        p = plan(spark, "q01_pricing_summary")
        assert "PushedFilters" in p
        assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", p), p

    def test_q01_column_pruning(self, spark):
        # 7 needed columns of 11; the scan schema must not include the rest
        p = plan(spark, "q01_pricing_summary")
        m = re.search(r"ReadSchema: (.*)", p)
        assert m and "l_partkey" not in m.group(1) and "l_suppkey" not in m.group(1)

    def test_q19_part_filter_pushed(self, spark):
        p = plan(spark, "q19_disjunctive_predicate_join")
        assert re.search(r"PushedFilters: \[[^\]]*p_brand", p), p


class TestJoinStrategy:
    @pytest.mark.parametrize(
        "name",
        ["q03_local_supplier_volume", "q18_multi_join_part_supplier_stats",
         "q19_disjunctive_predicate_join"],
    )
    def test_dimension_joins_broadcast(self, spark, name):
        # at small SF Catalyst/AQE must still pick broadcast from actual
        # sizes (no hint needed) — the fact table never shuffles here
        p = plan(spark, name)
        assert "BroadcastHashJoin" in p, p

    @pytest.mark.parametrize(
        ("name", "allowed_hints"),
        [
            # q03 hints exactly its two constant-size dims: nation (25
            # rows), region (5 rows).  customer/supplier are SF-scaled and
            # MUST NOT carry a forced-broadcast hint — a hint overrides
            # Spark's size check, so at 100 TB it would collect an
            # unbounded build side and OOM.  AQE still broadcasts them at
            # small SF from runtime sizes.
            ("q03_local_supplier_volume", 2),
            ("q02_top_revenue_orders", 0),
            ("q18_multi_join_part_supplier_stats", 0),
            ("q19_disjunctive_predicate_join", 0),
            ("q26_cohort_retention", 0),
            ("d02_minhash_lsh", 0),
            ("r11_describe_subject", 0),
        ],
    )
    def test_no_forced_broadcast_of_scaled_tables(self, spark, name, allowed_hints):
        n = hint_count(spark, name)
        assert n == allowed_hints, (
            f"{name}: {n} ResolvedHint nodes in optimized plan, expected "
            f"{allowed_hints} (broadcast hints allowed only on provably "
            f"constant-size inputs)\n{optimized_plan(spark, name)}"
        )

    def test_q39_subqueries_decorrelate_to_aggregate_joins(self, spark):
        # both correlated scalar subqueries MUST rewrite to aggregate+join
        # (VERDICT r7 item 2): the per-nation MAX filter becomes an inner
        # hash join against a 25-group aggregate and the projected COUNT a
        # LEFT OUTER hash join against a per-custkey aggregate.  This is
        # the one rewrite owned entirely by Catalyst's decorrelation — a
        # regression to a per-outer-row nested loop would be the classic
        # O(n^2) scale failure and invisible to the correctness gate.
        p = plan(spark, "q39_correlated_scalar_subquery")
        assert "BroadcastNestedLoopJoin" not in p, p
        assert "CartesianProduct" not in p, p
        assert "partial_max" in p, p      # MAX subquery decorrelated
        assert "partial_count" in p, p    # COUNT subquery decorrelated
        assert re.search(r"Join type: LeftOuter", p), p  # 0-preserving COUNT

    def test_d03_candidate_join_is_equi(self, spark):
        # rotation-table candidates must ride an equi-join on (table, key);
        # a nested-loop/cartesian here is the all-pairs scale failure
        p = plan(spark, "d03_simhash")
        assert "BroadcastNestedLoopJoin" not in p, p
        assert "CartesianProduct" not in p, p

    def test_s10_admission_join_is_cell_keyed(self, spark):
        # incremental ANN admission — pinned properties: (a) the ONLY
        # nested-loop broadcasts are the two bounded centroid-table
        # scorings (the allowlisted s04 class — corpus assignment +
        # batch probes), so candidate generation can never be all-pairs;
        # (b) exactly TWO FORCED broadcast hints exist — the admission
        # join and the verdict join must carry none, because probes is
        # |batch| x N_PROBE rows and the verdict side is the batch —
        # both real fractions of the corpus, so a forced broadcast
        # there is the OOM-at-scale failure (review r14 caught a copied
        # F.broadcast(probes)); AQE may still CHOOSE a broadcast from
        # measured sizes at test SF, so the hint count — not the
        # physical operator — is the contract; (c) the verdict join
        # stays an unhinted keyed join (SMJ/SHJ at test sizes)
        p = plan(spark, "s10_incremental_ann_admission")
        assert "CartesianProduct" not in p, p
        assert len(re.findall(r"BroadcastNestedLoopJoin Cross", p)) == 2, p
        assert re.search(r"(SortMergeJoin|ShuffledHashJoin) LeftOuter", p), p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
        assert hint_count(spark, "s10_incremental_ann_admission") == 2

    def test_r15_compat_join_stays_keyed(self, spark):
        # SPARQL compatible-mapping OPTIONAL: the maybe-unbound shared var
        # becomes a null-or-equal RESIDUAL condition, but the join itself
        # must stay keyed on the certainly-bound subject var — a nested
        # loop here would make every OPTIONAL a scale failure
        p = plan(spark, "r15_optional_unbound_compat")
        assert "BroadcastNestedLoopJoin" not in p, p
        assert "CartesianProduct" not in p, p
        assert re.search(r"isnull\(.*\) OR ", p), p  # residual compat clause present

    def test_d08_span_merge_is_doc_partitioned_and_jvm(self, spark):
        # substring-span dedup: the gaps-and-islands merge must ride a
        # doc_id-partitioned window (per-doc work, never a global sort),
        # candidates flag via a keyed join on the n-gram hash, and the
        # whole pipeline stays JVM-side
        p = plan(spark, "d08_substring_span_dedup")
        assert "windowspecdefinition(doc_id" in p, p
        assert "BroadcastNestedLoopJoin" not in p, p
        assert "CartesianProduct" not in p, p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p

    def test_q40_salted_join_explodes_salt_and_stays_keyed(self, spark):
        # fragment-and-replicate: the dim side must EXPLODE the salt array
        # (8 replicas) and the join must be a hash join keyed on
        # (event_type, __salt) — that key pair is what spreads each hot
        # key over 8 reducers; losing either reverts to the 5-reducer
        # funnel the gate exists to prevent
        p = plan(spark, "q40_salted_fact_dim_join")
        assert re.search(r"Generate[\s\S]{0,200}explode\(\[0,1,2,3,4,5,6,7\]\)", p), p
        assert re.search(r"Left keys \[2\]: \[event_type#\d+, __salt#\d+", p), p
        assert "BroadcastNestedLoopJoin" not in p, p
        assert "CartesianProduct" not in p, p

    def test_d04_block_guard_broadcasts(self, spark):
        # the block-size guard must prune via broadcast semi-join, never
        # shuffle the doc-meta relation for the tiny block-count table
        p = plan(spark, "d04_ngram_jaccard_blocked")
        assert "BroadcastNestedLoopJoin" not in p, p
        assert "CartesianProduct" not in p, p

    def test_p05_packing_window_is_shard_partitioned(self, spark):
        # sequence packing's cumsum must be a SHARD-partitioned window —
        # an empty partition spec would funnel the whole corpus through
        # one task, the classic global-window scale failure
        p = plan(spark, "p05_sequence_packing")
        assert "windowspecdefinition(shard" in p, p
        assert re.search(r"hashpartitioning\(shard", p), p
        # and no global-sort exchange before the window (only the final
        # ORDER BY may range-partition)
        assert p.count("rangepartitioning") <= 1, p

    def test_p07_census_window_is_shard_partitioned(self, spark):
        # the efficiency census inherits p05's packing: same
        # shard-partitioned cumsum window, no global sort (the final
        # 16-row ORDER BY may range-partition once), and integer-only
        # derived metrics keep it JVM-side
        p = plan(spark, "p07_packing_efficiency_census")
        assert "windowspecdefinition(shard" in p, p
        assert re.search(r"hashpartitioning\(shard", p), p
        assert p.count("rangepartitioning") <= 1, p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p

    def test_q42_compaction_shuffles_state_not_history(self, spark):
        # changelog compaction must be the aggregate plan, not the window
        # plan: no Window node anywhere, and the partial max_by sits BELOW
        # the hash exchange so each task compacts its slice to one row per
        # key before any data moves — the shuffle carries |keys| rows
        p = (
            QUERIES["q42_changelog_latest_compaction"](spark, SF)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in p, p
        pre, _, post = p.partition("Exchange hashpartitioning")
        assert "partial_max_by" in post, p  # partial below the exchange
        assert "partial_max_by" not in pre, p

    def test_d09_fraction_is_doc_partitioned_and_jvm(self, spark):
        # d09 inherits d08's span machinery and adds two per-doc
        # aggregates; the same scale guarantees must hold — doc-partitioned
        # windows, keyed joins only, JVM-side end to end
        p = plan(spark, "d09_duplication_fraction")
        assert "windowspecdefinition(doc_id" in p, p
        assert "BroadcastNestedLoopJoin" not in p, p
        assert "CartesianProduct" not in p, p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p

    def test_d11_fuzzy_decon_is_hash_keyed_and_jvm(self, spark):
        # fuzzy decontamination: normalization + positional n-grams stay
        # JVM-side, the train x benchmark collision check is a keyed join
        # on the 60-bit gram hash (never nested-loop/cartesian), and the
        # span merge rides a doc_id-partitioned window
        p = plan(spark, "d11_fuzzy_decontamination")
        assert "windowspecdefinition(doc_id" in p, p
        assert "BroadcastNestedLoopJoin" not in p, p
        assert "CartesianProduct" not in p, p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p

    def test_s08_coarse_topc_is_partial_and_slim(self, spark):
        # VERDICT r8 item 3: s08's scale bound rests on (a) the coarse
        # shuffle carrying only (query_id, vec_id, coarse_cos) — pinned on
        # the optimized plan's Project directly under the top-C limit —
        # and (b) Spark applying a PARTIAL WindowGroupLimit below the
        # exchange so each map task forwards at most C rows per query.
        # Either alone bounds the shuffle; pin both so neither can rot.
        exec_plan = (
            QUERIES["s08_prefix_dim_rerank"](spark, SF)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert re.search(r"WindowGroupLimit .*row_number\(\), 50, Partial", exec_plan), exec_plan
        assert re.search(r"WindowGroupLimit .*row_number\(\), 50, Final", exec_plan), exec_plan
        opt = optimized_plan(spark, "s08_prefix_dim_rerank")
        m = re.search(
            r"WindowGroupLimit .*row_number\(\), 50\n\s*:?[+ ]*-? ?Project \[([^\n]*)",
            opt,
        )
        assert m, opt
        # exactly query_id, vec_id, then the computed coarse_cos — no
        # embedding/qv passthrough into the window exchange (they appear
        # only INSIDE the cosine expression).  Since r13 the cosine rides
        # finite_spark, so the third column is CASE WHEN NOT abs(nanvl(
        # ...)) = Inf THEN round(...) END rather than a bare round(...).
        cols = m.group(1)
        assert re.match(
            r"query_id#\d+L, vec_id#\d+L, (CASE WHEN |round\()", cols
        ), cols
        assert re.search(r" AS coarse_cos#\d+\]$", cols), cols
        assert cols.count(" AS ") == 1, cols

    def test_s09_prune_candidates_ride_cell_equi_join(self, spark):
        # SemDeDup pruning must inherit s03's cost envelope: the only
        # nested-loop nodes are the bounded broadcast-centroid crosses;
        # cell-mate pairs and representative lookups are equi-joins
        p = plan(spark, "s09_semdedup_prune")
        assert "CartesianProduct" not in p, p
        for m in re.finditer(r"BroadcastNestedLoopJoin (\w+) (\w+)", p):
            assert m.group(1) == "Cross" and m.group(2).startswith("Build"), p

    def test_s11_pq_stays_broadcast_bounded_and_pruned(self, spark):
        # PQ/ADC — pinned properties: (a) exactly THREE nested-loop
        # broadcasts, all crosses against bounded sides (the <= PQ_K-row
        # codebook on the encode and distance-table branches, the
        # N_QUERY_VECS-row map relation on the ADC pass) and exactly
        # three matching FORCED hints — any fourth hint would mean a
        # corpus-sized relation grew one; (b) the query-side branch
        # prunes at the SCAN (vec_id < N_QUERY_VECS pushed down), so the
        # distance tables never pay a corpus read; (c) the final top-k
        # runs a partial WindowGroupLimit below its exchange, so the
        # rank shuffle carries ~k rows per query per partition, not the
        # whole candidate set; (d) everything stays JVM-side
        p = plan(spark, "s11_pq_adc_topk")
        assert "CartesianProduct" not in p, p
        assert len(re.findall(r"BroadcastNestedLoopJoin Cross", p)) == 3, p
        for m in re.finditer(r"BroadcastNestedLoopJoin (\w+) (\w+)", p):
            assert m.group(1) == "Cross" and m.group(2).startswith("Build"), p
        assert hint_count(spark, "s11_pq_adc_topk") == 3
        assert re.search(r"PushedFilters: \[[^\]]*LessThan\(vec_id,5\)", p), p
        assert "WindowGroupLimit" in p, p
        for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert node not in p, p

    def test_m07_band_join_never_nested_loop(self, spark):
        # the hamming threshold is enforced AFTER band-bucket candidate
        # generation; a plan regression to an all-pairs nested loop (e.g.
        # the filter migrating into a join condition Spark can't hash)
        # would be quadratic in images at 100 TB
        p = plan(spark, "m07_image_phash_neardup")
        assert "CartesianProduct" not in p, p
        assert "BroadcastNestedLoopJoin" not in p, p

    def test_t11_scoring_is_jvm_only(self, spark):
        # the model is a literal array baked into the plan; per-document
        # scoring must stay inside codegen — no Python eval of any kind
        p = plan(spark, "t11_bigram_lm_perplexity")
        for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert node not in p, p

    def test_q41_pivot_shuffles_preaggregated_rows(self, spark):
        # enumerated pivot values -> two-phase pivot aggregate: the
        # map-side partial on (cohort, event_type) must sit below the
        # exchange so the shuffle carries |cohorts| x |types| rows, and
        # the reshape adds at most one more hash exchange
        p = plan(spark, "q41_pivot_wide_metrics")
        assert re.search(r"HashAggregate \[partial", p) or "partial_" in p, p
        assert p.count("Exchange hashpartitioning") <= 2, p
        for node in ("BatchEvalPython", "ArrowEvalPython"):
            assert node not in p, p

    def test_s03_pair_candidates_ride_cell_equi_join(self, spark):
        # near-dup candidates come from an equi-join on IVF cell id; the
        # only cross joins are the centroid-assignment scans against the
        # BROADCAST centroid set (bounded by k, never row x row)
        p = plan(spark, "s03_embedding_near_dup")
        assert "CartesianProduct" not in p, p
        assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
            "BroadcastHashJoin" in p
        ), p
        import re as _re

        # every nested-loop node must be a broadcast cross (centroids)
        for m in _re.finditer(r"BroadcastNestedLoopJoin (\w+) (\w+)", p):
            assert m.group(1) == "Cross" and m.group(2).startswith("Build"), p


class TestAggregation:
    def test_q01_partial_aggregation(self, spark):
        # map-side partial agg -> one exchange for the final agg, one for
        # the output sort; any more would mean a lost partial-agg.  The
        # fan_out RoundRobin repartition (fires only on the
        # fewer-files-than-slots local fixture; a no-op at scale) is
        # counted separately and capped at one, and the shipdate filter
        # must still push THROUGH it to the scan.
        p = plan(spark, "q01_pricing_summary")
        exchanges = re.findall(r"\(\d+\) Exchange\n.*?Arguments: (\w+)", p)
        roundrobin = [e for e in exchanges if e.startswith("RoundRobin")]
        keyed = [e for e in exchanges if not e.startswith("RoundRobin")]
        assert len(keyed) <= 2, p
        assert len(roundrobin) <= 1, p
        assert "partial_sum" in p, p
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in p, p


class TestNoPythonInHotPath:
    @pytest.mark.parametrize(
        "name",
        [
            "q01_pricing_summary",
            "d01_exact_dedup",
            "d02_minhash_lsh",
            "d03_simhash",
            "d05_decontamination",
            "d06_dedup_clusters",
            "t01_language_id",
            "t03_token_count",
            "t07_repetition_ratio",
            "s01_ann_bruteforce_topk",
            "s02_ann_lsh_bucketed",
        ],
    )
    def test_no_python_udf(self, spark, name):
        # dedup/text/similarity are pure JVM column expressions; a Python
        # eval node would mean a 10-100x slowdown at scale
        p = plan(spark, name)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name


class TestTemporalJoins:
    def test_q29_asof_single_shuffle_no_join(self, spark):
        # the as-of union+window plan must contain NO join operator at all
        # and exactly one exchange for the window partitioning (plus one
        # for the output sort) — that is the whole point of the rewrite
        p = plan(spark, "q29_asof_join")
        assert "Join" not in p, p
        # 3 = clicks-dedup agg + window partitioning + output sort
        assert len(re.findall(r"\(\d+\) Exchange", p)) <= 3, p

    def test_q30_interval_join_is_hash_not_nested_loop(self, spark):
        # bucketized range join: the ts-range predicate must ride on an
        # equi-join (hash), never BroadcastNestedLoopJoin
        p = plan(spark, "q30_interval_join")
        assert "BroadcastNestedLoopJoin" not in p, p
        assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or ("BroadcastHashJoin" in p), p

    def test_q29_q30_no_python_eval(self, spark):
        for name in ("q29_asof_join", "q30_interval_join"):
            p = plan(spark, name)
            assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


class TestTextPipelineOps:
    def test_t08_no_python_udf(self, spark):
        p = plan(spark, "t08_pii_scrub")
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p

    def test_t10_entropy_no_aggregate_exchange(self, spark):
        # the whole entropy computation is per-row higher-order array
        # functions: no HashAggregate/explode shuffle may appear — only the
        # fan_out repartition and the output-sort range exchange
        p = plan(spark, "t10_char_entropy")
        assert "HashAggregate" not in p and "ObjectHashAggregate" not in p, p
        assert "Generate" not in p, p  # no explode
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p

    def test_t09_domain_agg_is_partial(self, spark):
        # domain aggregation must partial-aggregate map-side so the
        # exchange carries (task x domain), not one row per URL
        p = plan(spark, "t09_url_domain_stats")
        assert "partial_count" in p, p


class TestScd2AndIncrementalMaintenance:
    def test_q43_single_hash_exchange_for_all_windows(self, spark):
        # the SCD2 derivation (lag marker, running run_id, per-run agg,
        # valid_to lead) must share ONE hash exchange on user_id: the two
        # window layers and the run aggregate all reuse the partitioning,
        # so the changelog's rows move exactly once.  The only other
        # exchange is the deterministic output ORDER BY.
        p = plan(spark, "q43_scd2_validity_intervals")
        assert len(re.findall(r"hashpartitioning\(user_id", p)) == 1, p
        assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2, p
        assert "Join" not in p, p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p

    def test_q44_cutoff_pushed_to_both_scans(self, spark):
        # incremental maintenance only beats recompute if the base/delta
        # split reaches the parquet scans: both legs must carry a pushed
        # ts predicate (row-group / partition pruning at scale), and each
        # leg must partial-aggregate before the union's final aggregate
        p = plan(spark, "q44_incremental_agg_merge")
        pushed = re.findall(r"PushedFilters: \[[^\]]*ts[^\]]*\]", p)
        assert len(pushed) >= 2, p
        assert "partial_count" in p or "partial_sum" in p, p
        assert "Join" not in p, p

    def test_p06_single_scan_no_join(self, spark):
        # the embargo split census + summary must come from ONE scan of
        # events: the census is localCheckpoint-ed (16 rows), so the
        # returned plan reads the checkpoint in both union legs and the
        # parquet scan happened exactly once, at census materialization.
        # A parquet scan in THIS plan would mean the summary leg re-reads
        # the event log — the 2x-cost bug this pin exists to catch.
        p = plan(spark, "p06_time_embargo_split")
        assert len(re.findall(r"Scan parquet", p)) == 0, p
        assert "ExistingRDD" in p, p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


class TestIncrementalDedup:
    def test_d10_band_join_is_asymmetric_and_jvm(self, spark):
        # the candidate join must be batch x corpus (both sides filtered
        # on the doc_id % 5 split BEFORE the band equi-join), never a
        # corpus x corpus self-join or a nested loop, and the whole
        # pipeline stays JVM-side
        p = plan(spark, "d10_incremental_corpus_dedup")
        assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p, p
        # batch side: doc_id % 5 = 0 filter present below the band join
        assert re.search(r"\(\w+#\d+L? % 5\) = 0\)", p), p
        # corpus side: the NEGATED split filter must also be there — if it
        # disappears the band join degrades to corpus x corpus candidates,
        # the exact scale regression this pin exists to catch
        assert re.search(r"NOT \(\(\w+#\d+L? % 5\) = 0\)", p), p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_q11_pages_stay_bounded_heaps(spark):
    """All three q11 pages — including the OFFSET-50000 beyond-end page
    (r15) — must stay per-partition TakeOrderedAndProject heaps.  A
    global Sort + GlobalLimit materializing for any page means the
    pagination no longer bounds memory by offset+limit per partition
    (Spark 4's topKSortFallbackThreshold defaults to ~Int.MaxValue, so
    no session config is load-bearing here — this pins that it stays
    true)."""
    p = plan(spark, "q11_order_offset_pagination")
    # formatted explain prints each node in the tree AND the detail
    # section — count the numbered detail headers, one per node
    assert len(re.findall(r"\(\d+\) TakeOrderedAndProject", p)) == 3, p
    # the only Sort allowed is the final page/price presentation sort
    # above the union, never a per-page global sort below it
    assert "GlobalLimit" not in p, p
