"""Training-data sampling operators over the ``documents`` table.

Sampling for dataset curation must be **deterministic and data-parallel**:
a row's keep/drop decision can only depend on the row itself, never on
RNG state or row order, or the sample changes across retries/partitions.
Both operators key the decision on a content-independent stable hash
(md5 of doc_id -> 60-bit integer, the same expression both engines can
evaluate bit-identically), so the sample is reproducible on 1 core or
1000 executors and under speculative re-execution.

- p01: stratified sampling — per-class (language) keep-rates, the
  downsample-the-head / upsample-the-tail move every corpus mix does.
- p02: the composed curation pipeline: exact dedup (keep min doc_id per
  normalized text hash) -> quality gate -> stratified sample.  One
  window shuffle for dedup, everything else map-side; no joins.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..checkpointing import stable_checkpoint
from . import canon_text_spark, canon_text_sql, load, query, ws_words_spark, ws_words_sql

# per-mille keep thresholds by language: downsample dominant en, keep
# most of the tail
_RATES = {"en": 200, "es": 800, "fr": 800, "de": 800, "zh": 800}
_DEFAULT_RATE = 500


def _bucket_spark(col):
    """Stable 60-bit hash of a string column -> [0, 1000) bucket."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("bigint") % 1000


def _bucket_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT % 1000)"


def _rate_case_sql() -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in _RATES.items())
    return f"CASE lang {whens} ELSE {_DEFAULT_RATE} END"


def _rate_spark():
    expr = F.when(F.col("lang") == "en", _RATES["en"])
    for k, v in list(_RATES.items())[1:]:
        expr = expr.when(F.col("lang") == k, v)
    return expr.otherwise(_DEFAULT_RATE)


@query(
    "p01_stratified_sample",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN {_bucket_sql("CAST(doc_id AS VARCHAR)")} < {_rate_case_sql()}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(MIN({_rate_case_sql()}) AS BIGINT) AS target_permille,
           CAST(SUM(CASE WHEN {_bucket_sql("CAST(doc_id AS VARCHAR)")} < {_rate_case_sql()}
                    THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT) AS kept_bp
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def p01(spark, sf_dir):
    """Stratified sampling: keep a doc iff hash(doc_id) mod 1000 falls
    under its language's per-mille rate.  Pure map-side decision — the
    only shuffle is the per-class count aggregation reporting it.

    Facets (widened r12): each stratum's configured target rate and its
    REALIZED keep rate in integer basis points (kept * 10000 div total,
    the float-free ratio idiom) — the deviation report a sampling
    pipeline monitors to catch a skewed hash or a mis-keyed rate table.
    ``lang`` is constant per group, so MIN(rate) is exactly the group's
    configured rate on both engines."""
    d = load(spark, sf_dir, "documents")
    kept = _bucket_spark(F.col("doc_id").cast("string")) < _rate_spark()
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.min(_rate_spark()).cast("long").alias("target_permille"),
        )
        .withColumn("kept_bp", F.expr("n_kept * 10000 div n_total"))
        .orderBy("lang")
    )


@query(
    "p02_curation_pipeline",
    oracle=f"""
    WITH hashed AS (
      SELECT *, md5({canon_text_sql('text')}) AS h
      FROM documents
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, MIN(doc_id) OVER (PARTITION BY h) AS keeper FROM hashed
      ) WHERE doc_id = keeper
    ),
    quality AS (
      SELECT * FROM deduped
      WHERE len({ws_words_sql('text')}) BETWEEN 20 AND 1000
        AND length(text) >= 100
    ),
    sampled AS (
      SELECT * FROM quality
      WHERE {_bucket_sql("CAST(doc_id AS VARCHAR)")} < {_rate_case_sql()}
    )
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(length(text)) AS BIGINT) AS n_chars_total
    FROM sampled GROUP BY lang ORDER BY lang
    """,
)
def p02(spark, sf_dir):
    """The composed curation pipeline: exact dedup -> quality gate ->
    stratified sample -> per-language accounting.  The dedup keeper
    choice is a min-window over the content hash (one shuffle on h);
    the quality gate and sample decision are row-local, so the whole
    pipeline is two exchanges end-to-end (dedup window + final agg) no
    matter the corpus size.  The dedup key is the shared canonical
    fingerprint form (canon_text_spark: lower + \\p{Mn} strip +
    explicit-ASCII whitespace collapse) and the quality tokenizer the
    shared explicit-class split, so both decisions agree with the
    oracle on exotic casing/whitespace."""
    d = load(spark, sf_dir, "documents")
    h = F.md5(canon_text_spark(F.col("text")).cast("binary"))
    hashed = d.withColumn("h", h)
    keeper = F.min("doc_id").over(Window.partitionBy("h"))
    deduped = hashed.withColumn("keeper", keeper).filter(F.col("doc_id") == F.col("keeper"))
    n_words = F.size(ws_words_spark(F.col("text")))
    quality = deduped.filter((n_words >= 20) & (n_words <= 1000) & (F.length("text") >= 100))
    sampled = quality.filter(_bucket_spark(F.col("doc_id").cast("string")) < _rate_spark())
    return (
        sampled.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars_total"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------- p03 mixture
# Rebalance the corpus to a configured per-source mixture under a global
# budget — the "data mixture" op every LLM pipeline runs (cf. temperature /
# proportional sampling across sources).  The mixture weight here derives
# deterministically from the source id (stand-in for the mixture config
# table; swapping in a real config is one small broadcast join).  All
# arithmetic is integer-exact so both engines compute identical rates, and
# keep/drop stays a per-row stable-hash decision (retry/speculation-safe).
_MIX_BUDGET_PERMILLE = 500  # keep ~half the corpus overall

# TRY_CAST, both engines (review r15): under Spark 4's default ANSI
# mode a plain CAST on a non-'srcN' label ABORTS the whole mixture
# plan (DuckDB's CAST likewise errors); a corrupt label should instead
# degrade to a NULL weight — its row plans NULL and its docs never
# join the selection, while healthy sources share the healthy weight
# mass (SUM skips NULL on both engines).
_W_SQL = "(TRY_CAST(substr(source, 4) AS INT) % 4 + 1)"


@query(
    "p03_mixture_rebalance",
    oracle=f"""
    WITH counts AS (
      SELECT source, {_W_SQL} AS w, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS total, CAST(SUM(w) AS BIGINT) AS sum_w
      FROM counts
    ),
    rates AS (
      SELECT source, n_docs, w, sum_w,
             CAST(LEAST(1000, (total * {_MIX_BUDGET_PERMILLE} * w) // (sum_w * n_docs))
                  AS BIGINT) AS rate_permille
      FROM counts, tot
    )
    , kept AS (
      SELECT r.source, r.n_docs, r.rate_permille, MIN(r.w) AS w, MIN(r.sum_w) AS sum_w,
             CAST(SUM(CASE WHEN {_bucket_sql("CAST(d.doc_id AS VARCHAR)")} < r.rate_permille
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM documents d JOIN rates r ON d.source = r.source
      GROUP BY r.source, r.n_docs, r.rate_permille
    )
    SELECT source, n_docs, rate_permille, n_kept,
           CAST(w * 10000 // sum_w AS BIGINT) AS target_share_bp,
           CAST(n_kept * 10000 // NULLIF(SUM(n_kept) OVER (), 0) AS BIGINT) AS kept_share_bp
    FROM kept ORDER BY source
    """,
)
def p03(spark, sf_dir):
    """Mixture rebalance: per-source keep-rates so the kept corpus hits a
    weighted target mix under a global budget.

    Two tiny aggregations (per-source counts, global totals) produce the
    rate table; the corpus-sized pass is one broadcast join + map-side
    filter — no corpus shuffle at any scale.  Rates use integer
    arithmetic (``div``) so Spark and DuckDB agree bit-exactly, and the
    keep decision is the same stable md5 bucket p01/p02 use."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    w = F.expr("try_cast(substring(source, 4) as int) % 4 + 1")
    # lazy census checkpoint — same re-expansion story as p08: counts
    # feeds tot AND rates, so without truncation the aggregate's corpus
    # scan is planned twice (measured: 3 scans -> 2)
    counts = (
        d.groupBy("source")
        .agg(F.first(w).alias("w"), F.count("*").alias("n_docs"))
        .transform(stable_checkpoint, eager=False)
    )
    tot = counts.agg(
        F.sum("n_docs").alias("total"), F.sum("w").alias("sum_w")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "w",
        "sum_w",
        F.least(
            F.lit(1000),
            F.expr(f"(total * {_MIX_BUDGET_PERMILLE} * w) div (sum_w * n_docs)"),
        ).cast("long").alias("rate_permille"),
    )
    kept = F.when(
        _bucket_spark(F.col("doc_id").cast("string")) < F.col("rate_permille"), 1
    ).otherwise(0)
    grouped = (
        d.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.first("n_docs").alias("n_docs"),
            F.first("rate_permille").alias("rate_permille"),
            F.sum(kept).cast("long").alias("n_kept"),
            F.min("w").alias("w"),
            F.min("sum_w").alias("sum_w"),
        )
    )
    total_kept = F.sum("n_kept").over(Window.partitionBy())
    return (
        grouped.select(
            "source",
            "n_docs",
            "rate_permille",
            "n_kept",
            F.expr("w * 10000 div sum_w").cast("long").alias("target_share_bp"),
            F.expr("n_kept * 10000").cast("long").alias("__num"),
            total_kept.alias("__tot"),
        )
        .withColumn(
            "kept_share_bp", F.expr("__num div nullif(__tot, 0)").cast("long")
        )
        .drop("__num", "__tot")
        .orderBy("source")
    )


# ---------------------------------------------------------------- p04
# Leakage-safe train/eval split: near-duplicate documents must land on
# the SAME side of the split, or eval examples leak into training via
# their dups.  Unit of splitting = the d02 near-dup CLUSTER (connected
# component), not the document: hash the cluster id, not the doc id.
from .dedup import _minhash_oracle, _minhash_pairs, connected_components  # noqa: E402


@query(
    "p04_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({_minhash_oracle()}) p
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(v, r) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.v
    ),
    comp AS (SELECT v, MIN(r) AS cluster FROM reach GROUP BY v),
    unit AS (
      SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp c ON c.v = d.doc_id
    ),
    tagged AS (
      SELECT doc_id, cluster,
             CASE WHEN {_bucket_sql("CAST(cluster AS VARCHAR)")} < 850 THEN 'a_train'
                  WHEN {_bucket_sql("CAST(cluster AS VARCHAR)")} < 925 THEN 'b_val'
                  ELSE 'c_eval' END AS split
      FROM unit
    ),
    straddle AS (
      SELECT COUNT(*) AS n FROM (
        SELECT cluster FROM tagged GROUP BY cluster
        HAVING COUNT(DISTINCT split) > 1
      )
    )
    SELECT t.split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT t.cluster) AS n_clusters,
           CAST(SUM(CASE WHEN cs.sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_in_dup_clusters,
           (SELECT n FROM straddle) AS n_straddling_clusters
    FROM tagged t
    JOIN (SELECT cluster, COUNT(*) AS sz FROM tagged GROUP BY cluster) cs
      ON cs.cluster = t.cluster
    GROUP BY t.split ORDER BY t.split
    """,
)
def p04(spark, sf_dir):
    """Cluster-level 85/7.5/7.5 train/val/eval split: documents -> near-dup
    cluster (d06's connected components; singletons are their own cluster)
    -> md5-bucket the CLUSTER id -> every member of a duplicate group falls
    in the same split by construction.  Facets widened per VERDICT r6 item
    6: three splits instead of two, per-split count of docs living in
    multi-doc (duplicate) clusters (non-vacuous evidence that dup groups
    actually exist in each partition's surface), and the cluster-straddle
    NEGATIVE case — n_straddling_clusters counts clusters whose members
    land in more than one split, provably 0 here, while a per-doc hash
    split (the leaky baseline) lights it up.  Scale shape: the only extra
    work over a naive per-doc hash split is the pair graph + O(diameter)
    label-propagation rounds, all bounded by the (tiny) near-dup relation;
    the split itself stays a stateless per-row hash — reproducible across
    runs and cluster sizes, no RNG state."""
    # ordered=False: d02's declared output ORDER BY would otherwise
    # execute (a full range-partitioning exchange) inside the eager edge
    # checkpoint, and the clustering consumers ignore row order entirely
    # (same dead-sort removal as d06/s06, r16 session 2)
    pairs = _minhash_pairs(spark, sf_dir, ordered=False).select("doc_a", "doc_b")
    comps = connected_components(pairs)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    unit = docs.join(comps, docs.doc_id == comps.v, "left").select(
        "doc_id", F.coalesce(F.col("comp"), F.col("doc_id")).alias("cluster")
    )
    bucket = _bucket_spark(F.col("cluster").cast("string"))
    split = (
        F.when(bucket < 850, F.lit("a_train"))
        .when(bucket < 925, F.lit("b_val"))
        .otherwise(F.lit("c_eval"))
    )
    # lazy localCheckpoint, not persist(): tagged feeds the census agg,
    # the cluster-size table AND the final join; checkpoint storage is
    # released with the RDD when the query's references drop, where
    # persist() pinned executor cache across bench repeats (ADVICE r10)
    tagged = unit.withColumn("split", split).transform(stable_checkpoint, eager=False)
    # cluster-size table: bounded by n_clusters, reused for the dup-doc
    # facet; the straddle count is a 1-row scalar (provably 0 — every
    # cluster hashes to exactly one split) cross-joined broadcast-style
    csize = tagged.groupBy("cluster").agg(
        F.count("*").alias("sz"), F.countDistinct("split").alias("n_splits")
    )
    straddle = csize.agg(
        F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_straddling_clusters")
    )
    return (
        tagged.join(csize.select("cluster", "sz"), "cluster")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("cluster").alias("n_clusters"),
            F.sum(F.when(F.col("sz") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_docs_in_dup_clusters"),
        )
        .crossJoin(F.broadcast(straddle))
        .select(
            "split", "n_docs", "n_clusters", "n_docs_in_dup_clusters",
            "n_straddling_clusters",
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------- p05
# Concat-and-chunk sequence packing: the standard LLM-pretraining step
# that concatenates tokenized documents in a deterministic pseudo-random
# order and slices the stream into fixed-length training sequences.
P05_SEQ_LEN = 2048
P05_N_SHARDS = 16

# the oracle twin of the shared explicit-class whitespace tokenizer
_WS_TOKS_SQL = ws_words_sql("text")


def _packed_cum(spark, sf_dir):
    """The ONE definition of the packing both p05 (what was packed) and
    p07 (how efficiently) describe: whitespace token counts, documents
    ordered by a stable per-doc md5 hash (the deterministic shuffle),
    concatenated within hash shards via a shard-partitioned window
    cumsum.  Returns (shard, n_tok, cum) rows — the census operators
    derive everything from this frame, so an edit to the token split,
    the hash, the shard count, or the pack order changes BOTH gates
    together (their oracles pin the same CTE shape)."""
    from pyspark.sql import Window

    # NULL-text docs carry nothing to pack and their NULL n_tok would
    # poison shard sums (SUM(NULL straddle flags) diverges cross-engine
    # too) — drop them, mirrored in both gates' oracle CTEs
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n_tok = F.size(ws_words_spark(F.col("text")))
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("bigint")
    toks = d.select(
        "doc_id", n_tok.alias("n_tok"), h.alias("h"), (h % P05_N_SHARDS).alias("shard")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return toks.select("shard", "n_tok", F.sum("n_tok").over(w).alias("cum"))


@query(
    "p05_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             len({_WS_TOKS_SQL}) AS n_tok,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM documents WHERE text IS NOT NULL
    ),
    sharded AS (
      SELECT doc_id, n_tok, h, h % {P05_N_SHARDS} AS shard FROM toks
    ),
    packed AS (
      SELECT shard, n_tok,
             SUM(n_tok) OVER (PARTITION BY shard ORDER BY h, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM sharded
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(CEIL(CAST(MAX(cum) AS DOUBLE) / {P05_SEQ_LEN}) AS BIGINT) AS n_sequences,
           CAST(SUM(CASE WHEN (cum - n_tok) // {P05_SEQ_LEN} <> (cum - 1) // {P05_SEQ_LEN}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling_docs
    FROM packed GROUP BY shard ORDER BY shard
    """,
)
def p05(spark, sf_dir):
    """Concat-and-chunk sequence packing for pretraining: whitespace
    token counts, documents ordered by a stable per-doc hash (the
    deterministic shuffle), concatenated within hash shards, and sliced
    into P05_SEQ_LEN(=2048)-token sequences.  Reports per-shard packing stats
    incl. how many docs straddle a sequence boundary.

    Scale shape: the only non-map operator is ONE window cumsum
    PARTITIONED BY shard — shards pack independently exactly like
    per-worker packing in a real pipeline, so parallelism = n_shards
    (set it to the cluster's task slots at 100 TB) and no global sort or
    single-partition window exists.  The deterministic hash order makes
    the packing reproducible under retries and re-runs, which a
    random-shuffle packer is not."""
    packed = _packed_cum(spark, sf_dir)
    straddle = (
        ((F.col("cum") - F.col("n_tok")) / P05_SEQ_LEN).cast("long")
        != ((F.col("cum") - 1) / P05_SEQ_LEN).cast("long")
    )
    return (
        packed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.ceil(F.max("cum").cast("double") / P05_SEQ_LEN).alias("n_sequences"),
            F.sum(straddle.cast("long")).alias("n_straddling_docs"),
        )
        .orderBy("shard")
    )
P06_CUTOFF = "2024-01-22 00:00:00"
P06_TEST_START = "2024-01-23 00:00:00"  # cutoff + 24h embargo
_P06_EMBARGO_US = 86_400_000_000


@query(
    "p06_time_embargo_split",
    oracle=f"""
    WITH tagged AS (
      SELECT CASE WHEN ts < TIMESTAMP '{P06_CUTOFF}' THEN 'train'
                  WHEN ts >= TIMESTAMP '{P06_TEST_START}' THEN 'test'
                  ELSE 'embargo' END AS split,
             event_type, user_id, ts
      FROM events
    ),
    census AS (
      SELECT split, event_type, COUNT(*) AS n_events,
             COUNT(DISTINCT user_id) AS n_users,
             MIN(ts) AS first_raw, MAX(ts) AS last_raw
      FROM tagged GROUP BY split, event_type
    ),
    summary AS (
      SELECT MAX(CASE WHEN split = 'train' THEN last_raw END) AS train_last,
             MIN(CASE WHEN split = 'test' THEN first_raw END) AS test_first,
             CAST(SUM(n_events) AS BIGINT) AS total_n
      FROM census
    )
    SELECT split, event_type, n_events, n_users,
           strftime(first_raw, '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(last_raw, '%Y-%m-%d %H:%M:%S') AS last_ts,
           CAST(NULL AS BIGINT) AS gap_us, CAST(NULL AS BIGINT) AS embargo_ok
    FROM census
    UNION ALL
    SELECT 'summary', 'ALL', total_n, CAST(NULL AS BIGINT),
           strftime(train_last, '%Y-%m-%d %H:%M:%S'),
           strftime(test_first, '%Y-%m-%d %H:%M:%S'),
           epoch_us(test_first) - epoch_us(train_last),
           CAST(CASE WHEN epoch_us(test_first) - epoch_us(train_last)
                          >= {_P06_EMBARGO_US} THEN 1 ELSE 0 END AS BIGINT)
    FROM summary
    ORDER BY split, event_type
    """,
)
def p06(spark, sf_dir):
    """TIME-EMBARGO TRAIN/TEST SPLIT — the temporally-safe counterpart to
    p04's cluster-safe split: train is everything before the cutoff, test
    is everything after cutoff + 24h embargo, and the embargo interval is
    DROPPED so no test example sits within the leakage horizon (the
    purged/embargoed split used for time-series and recommendation
    corpora).  The gate hashes the full (split x event_type) census —
    counts, distinct users, boundary timestamps — plus a summary row
    carrying the PROOF: the realized train→test gap in exact microseconds
    and an integer embargo_ok flag (gap >= 24h), so leakage-freedom is
    pinned by value, not assumed from the filter constants.

    Scale shape: ONE full scan, no join, no per-split passes.  The census
    is a single hash aggregate on (split, event_type) — 16 groups — with
    map-side partials (the distinct-user count shuffles (group, user_id)
    pairs, bounded by the user dimension, not the event log).  The
    summary row re-aggregates the 16 census rows, not the data.  At
    100 TB this is the cheapest possible shape: scan once, reduce to a
    handful of rows."""
    ev = load(spark, sf_dir, "events")
    ts = F.col("ts")
    cutoff = F.lit(P06_CUTOFF).cast("timestamp_ntz")
    test_start = F.lit(P06_TEST_START).cast("timestamp_ntz")
    tagged = ev.select(
        F.when(ts < cutoff, "train")
        .when(ts >= test_start, "test")
        .otherwise("embargo")
        .alias("split"),
        "event_type",
        "user_id",
        "ts",
    )
    census = tagged.groupBy("split", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("first_raw"),
        F.max("ts").alias("last_raw"),
    )
    # The census feeds BOTH output legs (per-group rows + the summary
    # re-aggregate).  Without materialization Spark plans a second full
    # scan of events for the summary leg — at 100 TB that doubles the
    # dominant cost.  localCheckpoint pins the 16-row census once (same
    # trade d06 makes for its fixpoint), so events are read exactly once.
    census = census.transform(stable_checkpoint)
    null_long = F.lit(None).cast("long")
    fmt = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")  # noqa: E731
    census_rows = census.select(
        "split",
        "event_type",
        "n_events",
        "n_users",
        fmt("first_raw").alias("first_ts"),
        fmt("last_raw").alias("last_ts"),
        null_long.alias("gap_us"),
        null_long.alias("embargo_ok"),
    )
    train_last = F.max(F.when(F.col("split") == "train", F.col("last_raw")))
    test_first = F.min(F.when(F.col("split") == "test", F.col("first_raw")))
    gap_us = F.unix_micros(test_first.cast("timestamp")) - F.unix_micros(
        train_last.cast("timestamp")
    )
    summary = census.agg(
        F.lit("summary").alias("split"),
        F.lit("ALL").alias("event_type"),
        F.sum("n_events").alias("n_events"),
        null_long.alias("n_users"),
        fmt(train_last).alias("first_ts"),
        fmt(test_first).alias("last_ts"),
        gap_us.alias("gap_us"),
        F.when(gap_us >= _P06_EMBARGO_US, 1).otherwise(0).cast("long").alias("embargo_ok"),
    )
    return census_rows.unionByName(summary).orderBy("split", "event_type")


# ---------------------------------------------------------------- p07
# Packing-efficiency census: the monitoring readout a pipeline operator
# watches over p05's concat-and-chunk packing.  p05 reports WHAT was
# packed; p07 reports HOW WELL: per shard, capacity vs tokens used
# (utilization, padding waste in the final partial sequence) and the
# fragmentation the chunker introduces (docs cut at sequence boundaries,
# total boundary crossings, resulting fragment count).  Everything is
# integer-exact — utilization ships as basis points via integer division,
# so no float boundary can split the engines.


@query(
    "p07_packing_efficiency_census",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             len({_WS_TOKS_SQL}) AS n_tok,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM documents WHERE text IS NOT NULL
    ),
    sharded AS (
      SELECT doc_id, n_tok, h, h % {P05_N_SHARDS} AS shard FROM toks
    ),
    packed AS (
      SELECT shard, n_tok,
             SUM(n_tok) OVER (PARTITION BY shard ORDER BY h, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM sharded
    ),
    per_doc AS (
      SELECT shard, n_tok,
             ((cum - 1) // {P05_SEQ_LEN}) - ((cum - n_tok) // {P05_SEQ_LEN}) AS crossings
      FROM packed
    ),
    shardagg AS (
      SELECT shard,
             COUNT(*) AS n_docs,
             SUM(n_tok) AS n_tokens,
             (SUM(n_tok) + {P05_SEQ_LEN - 1}) // {P05_SEQ_LEN} AS n_sequences,
             SUM(CASE WHEN crossings >= 1 THEN 1 ELSE 0 END) AS n_straddling_docs,
             SUM(crossings) AS n_boundary_crossings
      FROM per_doc GROUP BY shard
    )
    SELECT shard,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_sequences AS BIGINT) AS n_sequences,
           CAST(n_sequences * {P05_SEQ_LEN} AS BIGINT) AS capacity_tokens,
           CAST(n_sequences * {P05_SEQ_LEN} - n_tokens AS BIGINT) AS pad_tokens,
           CAST((n_tokens * 10000) // (n_sequences * {P05_SEQ_LEN}) AS BIGINT) AS util_bp,
           CAST(n_straddling_docs AS BIGINT) AS n_straddling_docs,
           CAST(n_boundary_crossings AS BIGINT) AS n_boundary_crossings,
           CAST(n_docs + n_boundary_crossings AS BIGINT) AS n_fragments
    FROM shardagg ORDER BY shard
    """,
)
def p07(spark, sf_dir):
    """PACKING-EFFICIENCY CENSUS over p05's deterministic concat-and-chunk
    packing (VERDICT r9 item 7): per shard — tokens used vs sequence
    capacity (utilization in integer basis points, padding waste in the
    final partial sequence) and fragmentation (documents cut at a
    {P05_SEQ_LEN}-token boundary, total boundary crossings — a long doc
    can cross several — and the fragment count the chunker emits).  This
    is the throughput/waste dashboard a training-data pipeline actually
    monitors: rising pad_tokens means shards are too small, rising
    n_fragments means documents are long relative to the sequence length.

    Scale shape (p05's discipline): the ONLY non-map operator is the
    shard-partitioned window cumsum — shards pack independently, so
    parallelism = n_shards and no global sort or single-partition window
    exists; the census itself is a 16-group hash aggregate with map-side
    partials.  Every derived metric is integer arithmetic over the
    per-shard sums (utilization = n_tokens*10000 div capacity), so the
    gate is float-free end to end.  Reference scope note: the reference
    engine has no packing surface (SURVEY.md §2 — LLM-pipeline operators
    are this repo's extension family)."""
    packed = _packed_cum(spark, sf_dir)
    per_doc = packed.select(
        "shard",
        "n_tok",
        (
            F.expr(f"(cum - 1) div {P05_SEQ_LEN}")
            - F.expr(f"(cum - n_tok) div {P05_SEQ_LEN}")
        ).alias("crossings"),
    )
    agg = per_doc.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum(F.when(F.col("crossings") >= 1, 1).otherwise(0))
        .cast("long")
        .alias("n_straddling_docs"),
        F.sum("crossings").alias("n_boundary_crossings"),
    )
    return (
        agg.withColumn(
            "n_sequences", F.expr(f"(n_tokens + {P05_SEQ_LEN - 1}) div {P05_SEQ_LEN}")
        )
        .withColumn("capacity_tokens", F.col("n_sequences") * P05_SEQ_LEN)
        .withColumn("pad_tokens", F.col("capacity_tokens") - F.col("n_tokens"))
        .withColumn("util_bp", F.expr("(n_tokens * 10000) div capacity_tokens"))
        .withColumn("n_fragments", F.col("n_docs") + F.col("n_boundary_crossings"))
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            "n_sequences",
            "capacity_tokens",
            "pad_tokens",
            "util_bp",
            "n_straddling_docs",
            "n_boundary_crossings",
            "n_fragments",
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------- p08
# Epoch-based mixture UPSAMPLING — the repetition plan p03 cannot
# express: p03's keep-rate is capped at 1000 permille (<= 1 epoch), but
# real pretraining mixes run high-value sources at epochs > 1 (GPT-3
# trained Wikipedia at ~3.4 epochs while Common Crawl ran < 1).  The
# plan is exact integer arithmetic end-to-end: target_n docs per source
# (weighted share of a {P08_BUDGET_PERMILLE}/1000 x corpus budget)
# splits into epochs_int full passes + n_extra fractional-epoch docs,
# and the fractional epoch selects by RANK of the stable per-doc hash —
# so n_emitted meets the target EXACTLY (a bucket-gate fractional pass
# would only meet it in expectation), reproducibly under retries and
# any partitioning.
P08_BUDGET_PERMILLE = 1500  # 1.5x the corpus: upsampling is the point


@query(
    "p08_epoch_mixture_plan",
    oracle=f"""
    WITH counts AS (
      SELECT source, {_W_SQL} AS w, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS total, CAST(SUM(w) AS BIGINT) AS sum_w
      FROM counts
    ),
    plan AS (
      SELECT source, n_docs,
             (total * {P08_BUDGET_PERMILLE} * w) // (1000 * sum_w) AS target_n
      FROM counts, tot
    ),
    plan2 AS (
      SELECT source, n_docs, CAST(target_n AS BIGINT) AS target_n,
             CAST(target_n // n_docs AS BIGINT) AS epochs_int,
             CAST(target_n % n_docs AS BIGINT) AS n_extra
      FROM plan
    ),
    ranked AS (
      SELECT doc_id, source, ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      FROM documents
    ),
    extra AS (
      SELECT r.source, CAST(SUM(r.doc_id) AS BIGINT) AS extra_checksum
      FROM ranked r JOIN plan2 p ON p.source = r.source
      WHERE r.rnk <= p.n_extra GROUP BY r.source
    )
    SELECT p.source, p.n_docs, p.target_n, p.epochs_int, p.n_extra,
           CAST(p.n_docs * p.epochs_int + p.n_extra AS BIGINT) AS n_emitted,
           CAST((p.n_docs * p.epochs_int + p.n_extra) * 10000 //
                NULLIF(SUM(p.n_docs * p.epochs_int + p.n_extra) OVER (), 0)
                AS BIGINT) AS share_bp,
           e.extra_checksum
    FROM plan2 p LEFT JOIN extra e ON e.source = p.source
    ORDER BY p.source
    """,
)
def p08(spark, sf_dir):
    """Per-source epoch plan for an upsampled training mixture: two tiny
    aggregations (per-source counts, global totals) produce the integer
    plan — target_n = weighted share of the {P08_BUDGET_PERMILLE}-
    permille budget, epochs_int = target_n div n_docs full passes,
    n_extra = target_n mod n_docs fractional-epoch docs — and ONE
    per-source window ranks docs by the stable md5 hash so the
    fractional epoch is an exact, reproducible prefix of the shuffled
    order (rank <= n_extra), pinned by extra_checksum = SUM of the
    selected doc_ids, not just its (by-construction) count.

    Scale shape: the corpus-sized work is one source-partitioned window
    — shards rank independently, parallelism = |sources| exactly like
    p05's per-shard packing — plus a broadcast of the |sources|-row
    plan; the plan arithmetic is pure integer div/mod so both engines
    agree bit-exactly, and n_emitted meets target_n EXACTLY where p03's
    bucket gate meets its rate only in expectation.  A NULL or
    unparsable source label degrades to a NULL weight via try_cast on
    BOTH engines (plain CAST would abort the whole plan under Spark's
    ANSI mode and DuckDB alike): the corrupt source's plan row goes
    NULL, its docs never join the extra selection, and the healthy
    sources split the healthy weight mass (SUM skips NULL weights on
    both engines) — a corrupt label can neither claim budget nor crash
    the planner."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    w = F.expr("try_cast(substring(source, 4) as int) % 4 + 1")
    # lazy checkpoint of the |sources|-row census: every plan leg (tot,
    # plan, the extra-selection broadcast, the report) derives from it,
    # and without truncation Catalyst re-expands the aggregate into each
    # subtree — SEVEN corpus scans at plan time (measured r15).  With it
    # the corpus is read once for the census and once for the ranking
    # window, matching the docstring's cost claim (p06's census idiom).
    counts = (
        d.groupBy("source")
        .agg(F.first(w).alias("w"), F.count("*").alias("n_docs"))
        .transform(stable_checkpoint, eager=False)
    )
    tot = counts.agg(F.sum("n_docs").alias("total"), F.sum("w").alias("sum_w"))
    plan = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr(f"(total * {P08_BUDGET_PERMILLE} * w) div (1000 * sum_w)")
        .cast("long")
        .alias("target_n"),
    )
    plan = plan.select(
        "source",
        "n_docs",
        "target_n",
        F.expr("target_n div n_docs").cast("long").alias("epochs_int"),
        F.expr("target_n % n_docs").cast("long").alias("n_extra"),
    )
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    wr = Window.partitionBy("source").orderBy("h", "doc_id")
    ranked = d.select("doc_id", "source", h.alias("h")).withColumn(
        "rnk", F.row_number().over(wr)
    )
    extra = (
        ranked.join(F.broadcast(plan.select("source", "n_extra")), "source")
        .filter(F.col("rnk") <= F.col("n_extra"))
        .groupBy("source")
        .agg(F.sum("doc_id").cast("long").alias("extra_checksum"))
    )
    n_emitted = F.col("n_docs") * F.col("epochs_int") + F.col("n_extra")
    report = plan.join(extra, "source", "left").select(
        "source",
        "n_docs",
        "target_n",
        "epochs_int",
        "n_extra",
        n_emitted.cast("long").alias("n_emitted"),
        "extra_checksum",
    )
    # Global emitted total as a broadcast 1-row cross (not an
    # unpartitioned window, which moves the plan rows to one partition
    # AND logs a WARN per run): the plan relation is |sources| rows, so
    # both shapes are cheap, but the cross keeps the logs clean and the
    # shape identical to the target_n totals cross above.
    emitted_tot = report.agg(F.sum("n_emitted").alias("__tot"))
    return (
        report.crossJoin(F.broadcast(emitted_tot))
        .withColumn(
            "share_bp",
            F.expr("(n_emitted * 10000) div nullif(__tot, 0)").cast("long"),
        )
        .drop("__tot")
        .select(
            "source", "n_docs", "target_n", "epochs_int", "n_extra",
            "n_emitted", "share_bp", "extra_checksum",
        )
        .orderBy("source")
    )
