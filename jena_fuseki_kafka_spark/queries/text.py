"""Text-analysis operators over the ``documents`` table: language ID,
quality scoring, token counting, fingerprinting.  All JVM-side column
expressions (no Python UDFs in the hot path); each has an exact DuckDB
oracle computing the same deterministic formula.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import (
    canon_text_spark,
    canon_text_sql,
    const_array,
    fan_out,
    grams_expr,
    load,
    lower_markstrip_spark,
    lower_markstrip_sql,
    query,
    ws_words_spark,
    ws_words_sql,
)

# tiny per-language stopword lists for the n-gram/stopword heuristic;
# chosen to be expressible identically in Spark and DuckDB SQL
_LANG_MARKERS = {
    "en": ["the", "a", "of"],
    "es": ["el", "la", "de"],
    "fr": ["le", "la", "et"],
    "de": ["der", "die", "und"],
    "zh": ["de", "le", "he"],
}


def _count_word_sql(word: str) -> str:
    # occurrences of a whole word, DuckDB side
    return f"len(regexp_extract_all(' ' || text || ' ', '[^a-z]{word}[^a-z]'))"


def _count_word_spark(word: str):
    return F.size(F.expr(f"regexp_extract_all(concat(' ', text, ' '), '[^a-z]{word}[^a-z]', 0)"))


@query(
    "t01_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_count_word_sql('the')} + {_count_word_sql('a')} + {_count_word_sql('of')} AS score_en,
             {_count_word_sql('el')} + {_count_word_sql('la')} + {_count_word_sql('de')} AS score_es,
             {_count_word_sql('le')} + {_count_word_sql('la')} + {_count_word_sql('et')} AS score_fr,
             {_count_word_sql('der')} + {_count_word_sql('die')} + {_count_word_sql('und')} AS score_de
      FROM documents
    )
    , ranked AS (
      SELECT *,
             CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_de THEN 'en'
                  WHEN score_es >= score_fr AND score_es >= score_de THEN 'es'
                  WHEN score_fr >= score_de THEN 'fr'
                  ELSE 'de' END AS predicted_lang,
             list_sort([score_en, score_es, score_fr, score_de], 'DESC') AS s
      FROM scored
    )
    SELECT doc_id, predicted_lang,
           score_en, score_es, score_fr, score_de,
           CAST(s[1] - s[2] AS BIGINT) AS margin,
           CASE WHEN predicted_lang = lang THEN 1 ELSE 0 END AS agrees_label
    FROM ranked ORDER BY doc_id
    """,
)
def t01(spark, sf_dir):
    """Language ID: stopword-marker scoring with deterministic argmax
    tie-breaking (en > es > fr > de).  Real deployments swap the marker
    lists for char-n-gram models; the Spark plumbing is identical.

    Facets (widened r12): the argmax MARGIN (best minus second-best via
    a sorted score array — exact under ties, where a subtract-the-
    runner-up formulation is ambiguous) and agreement with the corpus
    ``lang`` label — the confidence and accuracy columns a routing
    pipeline thresholds on.  All integer arithmetic; still one per-row
    projection, no shuffle beyond the output sort."""
    d = load(spark, sf_dir, "documents")
    scores = {
        "score_en": _count_word_spark("the") + _count_word_spark("a") + _count_word_spark("of"),
        "score_es": _count_word_spark("el") + _count_word_spark("la") + _count_word_spark("de"),
        "score_fr": _count_word_spark("le") + _count_word_spark("la") + _count_word_spark("et"),
        "score_de": _count_word_spark("der") + _count_word_spark("die") + _count_word_spark("und"),
    }
    d = d.select("doc_id", "lang", *[v.alias(k) for k, v in scores.items()])
    predicted = (
        F.when(
            (F.col("score_en") >= F.col("score_es"))
            & (F.col("score_en") >= F.col("score_fr"))
            & (F.col("score_en") >= F.col("score_de")),
            "en",
        )
        .when((F.col("score_es") >= F.col("score_fr")) & (F.col("score_es") >= F.col("score_de")), "es")
        .when(F.col("score_fr") >= F.col("score_de"), "fr")
        .otherwise("de")
    )
    s = F.sort_array(
        F.array("score_en", "score_es", "score_fr", "score_de"), asc=False
    )
    return d.select(
        "doc_id",
        predicted.alias("predicted_lang"),
        "score_en",
        "score_es",
        "score_fr",
        "score_de",
        (s[0] - s[1]).cast("long").alias("margin"),
        F.when(predicted == F.col("lang"), 1).otherwise(0).alias("agrees_label"),
    ).orderBy("doc_id")


@query(
    "t02_quality_score",
    oracle="""
    SELECT doc_id,
           len({WS}) AS n_words,
           length(text) AS n_chars,
           len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
           ROUND(CAST(length(text) AS DOUBLE)
                 / len({WS}), 4) AS avg_word_len,
           CASE WHEN len({WS}) BETWEEN 20 AND 1000
                     AND length(text) >= 100
                THEN 1 ELSE 0 END AS passes_quality
    FROM documents ORDER BY doc_id
    """.replace("{WS}", ws_words_sql("text")),
)
def t02(spark, sf_dir):
    """Quality scoring: length / punctuation / word-shape features + a
    pass/fail gate (the Gopher-style rule shape used by training-data
    pipelines)."""
    d = load(spark, sf_dir, "documents")
    n_words = F.size(ws_words_spark(F.col("text")))
    n_chars = F.length("text")
    n_punct = F.size(F.expr(r"regexp_extract_all(text, '[.,;:!?]', 0)"))
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.alias("n_chars"),
        n_punct.alias("n_punct"),
        F.round(n_chars.cast("double") / n_words, 4).alias("avg_word_len"),
        F.when((n_words >= 20) & (n_words <= 1000) & (n_chars >= 100), 1)
        .otherwise(0)
        .alias("passes_quality"),
    ).orderBy("doc_id")


_T03_BPE_PAT = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f\\x0b]"

# DuckDB-side "lower then strip combining marks" over the text column;
# hoisted because f-string expressions cannot carry the backslash on
# this Python version
_LOWER_MARKSTRIP_SQL = lower_markstrip_sql("text")


@query(
    "t03_token_count",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len({ws_words_sql('text')})) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(
                {_LOWER_MARKSTRIP_SQL},
                '{_T03_BPE_PAT}'))) AS BIGINT) AS bpe_ish_tokens
    FROM documents GROUP BY source ORDER BY source
    """,
)
def t03(spark, sf_dir):
    """Token counting: whitespace tokens + a BPE-ish regex tokenization
    (letters / digits / punctuation runs), aggregated per source —
    the 'how many tokens is this corpus' pipeline primitive.  Both
    facets tokenize with the shared cross-engine recipe: explicit-ASCII
    whitespace class (ws_words; trim()/\\s are engine-dependent on
    exotic whitespace) and \\p{Mn} stripped after lower() (Java maps
    U+0130-class codepoints to letter + combining mark, utf8proc to the
    bare letter — without the strip the mark lands in the punctuation
    alternative on one engine only)."""
    d = load(spark, sf_dir, "documents")
    ws = F.size(ws_words_spark(F.col("text")))
    # the pattern rides F.lit, not F.expr — Spark SQL string literals
    # unescape backslashes, which would corrupt the explicit \\t\\n class
    bpe = F.size(
        F.regexp_extract_all(
            lower_markstrip_spark(F.col("text")),
            F.lit(_T03_BPE_PAT),
            F.lit(0),
        )
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(ws).alias("ws_tokens"),
            F.sum(bpe).alias("bpe_ish_tokens"),
        )
        .orderBy("source")
    )


@query(
    "t04_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5({canon_text_sql('text')}) AS fingerprint,
           substr(md5({canon_text_sql('text')}), 1, 8) AS shard_key
    FROM documents ORDER BY doc_id
    """,
)
def t04(spark, sf_dir):
    """Document fingerprinting: whitespace-normalized, case-folded content
    hash (the canonical-form fingerprint used for exact-dup detection and
    sharding).  The canonical form is the shared canon_text recipe —
    lower, \\p{Mn} stripped after the lower, explicit-ASCII whitespace
    collapse — so the fingerprints are engine-identical on exotic
    casing/whitespace, not just ASCII."""
    d = load(spark, sf_dir, "documents")
    fp = F.md5(canon_text_spark(F.col("text")).cast("binary"))
    return d.select("doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 8).alias("shard_key")).orderBy(
        "doc_id"
    )


EMB_DIM = 64


def _tokhash_sql(expr: str = "w") -> str:
    """The hashing-trick token hash, SQL side: md5 -> top 60 bits as a
    BIGINT.  Single definition shared by t05 (features) and t12
    (classifier input) — the t12 docstring PROMISES its activations are
    t05's signed counts, so the formula must not be able to drift
    between them (review r15; byte-identical render to the previously
    inlined fragments, same proof standard as the IVF oracle CTEs)."""
    return f"('0x'||substr(md5({expr}),1,15))::BIGINT"


def _tokhash_spark(col):
    """Spark twin of _tokhash_sql — bit-identical 60-bit token hash."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def _toksgn_spark(h):
    """Hash bit 6 -> feature sign, the shared t05/t12 sign rule."""
    return F.when(F.shiftright(h, 6).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)


@query(
    "t05_feature_hash_embedding",
    oracle=rf"""
    WITH tokens AS (
      SELECT doc_id,
             unnest({ws_words_sql(_LOWER_MARKSTRIP_SQL)}) AS w
      FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             {_tokhash_sql()} % {EMB_DIM} AS idx,
             CASE WHEN ({_tokhash_sql()} >> 6) & 1 = 1
                  THEN 1 ELSE -1 END AS sgn
      FROM tokens
    )
    SELECT doc_id, idx, CAST(SUM(sgn) AS BIGINT) AS val
    FROM hashed GROUP BY doc_id, idx
    HAVING SUM(sgn) != 0
    ORDER BY doc_id, idx
    """,
)
def t05(spark, sf_dir):
    """Feature-hashed text embedding (the hashing trick): token -> md5 ->
    (dimension = h mod 64, sign = h bit 6); the sparse vector is the signed
    count per dimension, emitted as (doc_id, idx, val) rows — the
    scale-friendly sparse layout (dense assembly is a collect_list away).
    Pure JVM column expressions; the text->vector stage that feeds the
    s01-s04 similarity operators."""
    d = load(spark, sf_dir, "documents")
    tokens = fan_out(d.select("doc_id", "text")).select(
        "doc_id",
        F.explode(
            ws_words_spark(lower_markstrip_spark(F.col("text")))
        ).alias("w"),
    )
    h = _tokhash_spark(F.col("w"))
    hashed = tokens.select(
        "doc_id",
        (h % EMB_DIM).alias("idx"),
        _toksgn_spark(h).alias("sgn"),
    )
    return (
        hashed.groupBy("doc_id", "idx")
        .agg(F.sum("sgn").alias("val"))
        .filter(F.col("val") != 0)
        .orderBy("doc_id", "idx")
    )


@query(
    "t06_topk_bigrams_per_lang",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, lang, {ws_words_sql(_LOWER_MARKSTRIP_SQL)} AS w
      FROM documents
    ),
    bigrams AS (
      SELECT lang, w[i] || ' ' || w[i+1] AS bigram
      FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i)
    ),
    counted AS (
      SELECT lang, bigram, COUNT(*) AS n FROM bigrams GROUP BY lang, bigram
    ),
    ranked AS (
      SELECT lang, bigram, n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rk
      FROM counted
    )
    SELECT lang, bigram, n, rk FROM ranked WHERE rk <= 10
    ORDER BY lang, rk
    """,
)
def t06(spark, sf_dir):
    """Corpus frequency analysis: top-10 bigrams per language.  The rank
    pass runs on the already-aggregated (lang, bigram, n) relation — tiny
    next to the corpus — so at 100 TB the only full-data operations are
    the bigram explode and one partial-aggregated count; the window sees
    |distinct bigrams|, not |tokens|.  Deterministic tie-break on the
    bigram text makes top-k stable across partitionings.  Tokenization
    is the shared cross-engine recipe (ws_words + \\p{Mn} strip after
    lower), and the bigram transform rides grams_expr — its size>=2
    short-circuit is load-bearing: ``sequence(1, 0)`` DESCENDS in
    Spark, so the old greatest(size-1, 0) bound subscripted w[-1] on
    1-word documents, an ANSI job abort."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    words = ws_words_spark(lower_markstrip_spark(F.col("text")))
    with_w = fan_out(d.select("lang", "text")).select("lang", words.alias("w"))
    bigrams = with_w.select(
        "lang",
        F.explode(F.expr(grams_expr(2, "concat(w[i-1], ' ', w[i])"))).alias("bigram"),
    )
    counted = bigrams.groupBy("lang", "bigram").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("lang", "bigram", "n", "rk")
        .orderBy("lang", "rk")
    )


REP_N = 3  # words per repetition n-gram
REP_MAX_DUP_RATIO = 0.30  # Gopher-style duplicate-3-gram gate


@query(
    "t07_repetition_ratio",
    oracle=rf"""
    WITH ngrams AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      FROM (SELECT doc_id, {ws_words_sql('lower(text)')} AS w
            FROM documents),
           LATERAL (SELECT unnest(generate_series(1, greatest(len(w) - {REP_N - 1}, 0))) AS i)
    ),
    gram_counts AS (
      SELECT doc_id, g, COUNT(*) AS c FROM ngrams GROUP BY doc_id, g
    ),
    stats AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_ngrams,
             COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS max_gram_count
      FROM gram_counts GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(s.n_ngrams, 0) AS n_ngrams,
           COALESCE(s.n_distinct, 0) AS n_distinct,
           COALESCE(s.max_gram_count, 0) AS max_gram_count,
           ROUND(CASE WHEN COALESCE(s.n_ngrams, 0) = 0 THEN 0.0
                      ELSE CAST(s.max_gram_count AS DOUBLE) / s.n_ngrams END, 4)
             AS top_gram_frac,
           ROUND(CASE WHEN COALESCE(s.n_ngrams, 0) = 0 THEN 0.0
                      ELSE 1.0 - CAST(s.n_distinct AS DOUBLE) / s.n_ngrams END, 4)
             AS dup_ratio,
           CASE WHEN COALESCE(s.n_ngrams, 0) = 0
                  OR 1.0 - CAST(s.n_distinct AS DOUBLE) / s.n_ngrams <= {REP_MAX_DUP_RATIO}
                THEN 1 ELSE 0 END AS passes_repetition
    FROM documents d LEFT JOIN stats s ON s.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def t07(spark, sf_dir):
    """Within-document repetition scoring (the Gopher duplicate-n-gram
    quality gates): duplicate-3-gram ratio AND top-3-gram share per doc
    plus a pass flag.  Two stacked partial-aggregated hash aggregates
    ((doc_id, gram) counts, then per-doc moments) — this also replaces
    the former countDistinct Expand rewrite, and the max/sum/count
    moments all ride the second aggregate for free.  Window-free shape
    that scales to any corpus; docs too short for an n-gram pass by
    definition."""
    d = load(spark, sf_dir, "documents")
    words = ws_words_spark(F.lower(F.col("text")))
    expr = grams_expr(REP_N, f"concat_ws(' ', slice(w, i, {REP_N}))")
    stats = (
        fan_out(d.select("doc_id", "text"))
        .select("doc_id", words.alias("w"))
        .select("doc_id", F.explode(F.expr(expr)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_ngrams"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("max_gram_count"),
        )
    )
    joined = d.select("doc_id").join(stats, "doc_id", "left")
    n_ngrams = F.coalesce(F.col("n_ngrams"), F.lit(0))
    n_distinct = F.coalesce(F.col("n_distinct"), F.lit(0))
    max_gram = F.coalesce(F.col("max_gram_count"), F.lit(0))
    top_frac = F.when(n_ngrams == 0, F.lit(0.0)).otherwise(
        max_gram.cast("double") / n_ngrams
    )
    ratio = F.when(n_ngrams == 0, F.lit(0.0)).otherwise(
        1.0 - n_distinct.cast("double") / n_ngrams
    )
    return joined.select(
        "doc_id",
        n_ngrams.alias("n_ngrams"),
        n_distinct.alias("n_distinct"),
        max_gram.alias("max_gram_count"),
        F.round(top_frac, 4).alias("top_gram_frac"),
        F.round(ratio, 4).alias("dup_ratio"),
        F.when((n_ngrams == 0) | (ratio <= REP_MAX_DUP_RATIO), 1).otherwise(0).alias(
            "passes_repetition"
        ),
    ).orderBy("doc_id")


# ------------------------------------------------------------------ PII
# The synthetic corpus contains no PII, so both engines append the SAME
# deterministic doc_id-derived contact block before scanning — the scrub
# operator itself (pattern counting + redaction) is what's under test,
# over an input with known-varying match counts.

_PII_AUG_SQL = """
    text
    || ' contact: user' || doc_id::VARCHAR || '@mail.example.com'
    || CASE WHEN doc_id % 3 = 0
            THEN ' cc admin' || doc_id::VARCHAR || '@corp.example.net' ELSE '' END
    || ' from 10.' || (doc_id % 200)::VARCHAR || '.0.' || (doc_id % 250)::VARCHAR
    || CASE WHEN doc_id % 5 = 0 THEN ' call 555-0199' ELSE '' END
    || ' via fe80::1:' || (doc_id % 999)::VARCHAR
    || CASE WHEN doc_id % 7 = 0
            THEN ' ssn 219-09-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' card 4111 1111 1111 ' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
"""

# Patterns are deliberately collision-free over the augmented block:
# IPv4 needs dots (never matches SSN/card), SSN needs the 3-2-4 dash
# shape (never matches the 555- phone), card needs space-grouped 4x4
# digits, IPv6 is anchored on the fe80:: hex prefix.  All constructs
# (classes, \b, \d, bounded repetition, groups) mean the same thing to
# Java's regex and DuckDB's RE2, which is what keeps the oracle exact.
_RE_EMAIL = r"[a-z0-9.]+@[a-z0-9.-]+\.[a-z]{2,}"
_RE_IPV4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
_RE_PHONE = r"\b555-\d{4}\b"
_RE_IPV6 = r"\bfe80::[0-9a-f:]+"
_RE_SSN = r"\b\d{3}-\d{2}-\d{4}\b"
_RE_CARD = r"\b4\d{3}( \d{4}){3}\b"


@query(
    "t08_pii_scrub",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_RE_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_RE_IPV4}')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(t, '{_RE_PHONE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(t, '{_RE_IPV6}')) AS BIGINT) AS n_ipv6,
           CAST(len(regexp_extract_all(t, '{_RE_SSN}')) AS BIGINT) AS n_ssn,
           CAST(len(regexp_extract_all(t, '{_RE_CARD}')) AS BIGINT) AS n_cards,
           CAST(length(regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(regexp_replace(regexp_replace(t,
                '{_RE_EMAIL}', '<EMAIL>', 'g'),
                '{_RE_IPV4}', '<IP>', 'g'),
                '{_RE_PHONE}', '<PHONE>', 'g'),
                '{_RE_IPV6}', '<IP6>', 'g'),
                '{_RE_SSN}', '<SSN>', 'g'),
                '{_RE_CARD}', '<CARD>', 'g')) AS BIGINT) AS redacted_len
    FROM aug ORDER BY doc_id
    """,
)
def t08(spark, sf_dir):
    """PII scrub: count and redact emails / IPv4s / phone-shaped tokens.

    Pure JVM regex expressions (``regexp_extract_all`` + chained
    ``regexp_replace``) — embarrassingly parallel per row, zero shuffle
    beyond the final ORDER BY, so throughput at 100 TB is scan-bound.
    The standard curation step before training-data release (cf. C4 /
    RefinedWeb pipelines).
    """
    aug = F.expr(
        "concat(text,"
        " ' contact: user', cast(doc_id as string), '@mail.example.com',"
        " if(doc_id % 3 = 0, concat(' cc admin', cast(doc_id as string), '@corp.example.net'), ''),"
        " ' from 10.', cast(doc_id % 200 as string), '.0.', cast(doc_id % 250 as string),"
        " if(doc_id % 5 = 0, ' call 555-0199', ''),"
        " ' via fe80::1:', cast(doc_id % 999 as string),"
        " if(doc_id % 7 = 0, concat(' ssn 219-09-', lpad(cast(doc_id % 10000 as string), 4, '0')), ''),"
        " if(doc_id % 11 = 0, concat(' card 4111 1111 1111 ', lpad(cast(doc_id % 10000 as string), 4, '0')), ''))"
    )
    d = fan_out(load(spark, sf_dir, "documents")).select("doc_id", aug.alias("t"))
    redacted = F.col("t")
    for pat, tag in (
        (_RE_EMAIL, "<EMAIL>"),
        (_RE_IPV4, "<IP>"),
        (_RE_PHONE, "<PHONE>"),
        (_RE_IPV6, "<IP6>"),
        (_RE_SSN, "<SSN>"),
        (_RE_CARD, "<CARD>"),
    ):
        redacted = F.regexp_replace(redacted, pat, tag)
    def n_matches(pattern: str):
        # column-function form: SQL-literal escaping would eat the \d \b
        return F.size(F.regexp_extract_all(F.col("t"), F.lit(pattern), F.lit(0))).cast("long")

    return d.select(
        "doc_id",
        n_matches(_RE_EMAIL).alias("n_emails"),
        n_matches(_RE_IPV4).alias("n_ipv4"),
        n_matches(_RE_PHONE).alias("n_phones"),
        n_matches(_RE_IPV6).alias("n_ipv6"),
        n_matches(_RE_SSN).alias("n_ssn"),
        n_matches(_RE_CARD).alias("n_cards"),
        F.length(redacted).cast("long").alias("redacted_len"),
    ).orderBy("doc_id")


_URL_AUG_SQL = """
    text
    || ' see https://site' || (doc_id % 23)::VARCHAR || '.example.org/p/' || doc_id::VARCHAR
    || CASE WHEN doc_id % 4 = 0 THEN ' and http://cdn.example.com/assets/a.js' ELSE '' END
"""

_RE_URL = r"https?://[a-z0-9.-]+[a-z0-9./_-]*"
_RE_DOMAIN = r"https?://([a-z0-9.-]+)"


@query(
    "t09_url_domain_stats",
    oracle=rf"""
    WITH aug AS (SELECT doc_id, {_URL_AUG_SQL} AS t FROM documents),
    urls AS (
      SELECT doc_id, unnest(regexp_extract_all(t, '{_RE_URL}')) AS url FROM aug
    )
    SELECT regexp_extract(url, '{_RE_DOMAIN}', 1) AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN url LIKE 'https://%' THEN 1 ELSE 0 END) AS BIGINT) AS n_https,
           CAST(SUM(length(url) - length(replace(url, '/', '')) - 2) AS BIGINT) AS total_path_depth,
           regexp_extract(regexp_extract(url, '{_RE_DOMAIN}', 1), '([a-z0-9-]+\.[a-z]+)$', 1) AS apex
    FROM urls
    GROUP BY domain
    ORDER BY n_urls DESC, domain
    LIMIT 15
    """,
)
def t09(spark, sf_dir):
    """URL/domain statistics: extract links, aggregate by domain.

    Extraction is per-row JVM regex; the only shuffle is the domain
    aggregation, whose key cardinality is the (small) domain universe —
    partial aggregation collapses it map-side, so the exchange carries
    one row per (task, domain) at any corpus size.  Feeds domain-level
    filtering/weighting decisions (cf. Common Crawl curation).
    """
    aug = F.expr(
        "concat(text,"
        " ' see https://site', cast(doc_id % 23 as string), '.example.org/p/', cast(doc_id as string),"
        " if(doc_id % 4 = 0, ' and http://cdn.example.com/assets/a.js', ''))"
    )
    d = fan_out(load(spark, sf_dir, "documents")).select("doc_id", aug.alias("t"))
    urls = d.select(
        "doc_id", F.explode(F.expr(f"regexp_extract_all(t, '{_RE_URL}', 0)")).alias("url")
    )
    return (
        urls.select("doc_id", "url", F.regexp_extract("url", _RE_DOMAIN, 1).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum(F.when(F.col("url").startswith("https://"), 1).otherwise(0)).alias("n_https"),
            F.sum(
                F.length("url") - F.length(F.regexp_replace("url", "/", "")) - 2
            ).alias("total_path_depth"),
            # apex (registered-domain heuristic): last two dot-labels —
            # grouping-key-derived, so first() inside the same aggregate
            # (identical for every row of the group) keeps it one exchange
            F.first(
                F.regexp_extract("domain", r"([a-z0-9-]+\.[a-z]+)$", 1)
            ).alias("apex"),
        )
        .orderBy(F.desc("n_urls"), "domain")
        .limit(15)
    )


@query(
    "t10_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ),
    counts AS (
      SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
           ROUND(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 4) AS entropy
    FROM counts GROUP BY doc_id ORDER BY doc_id
    """,
)
def t10(spark, sf_dir):
    """Per-document Shannon character entropy (a gibberish/boilerplate
    quality signal: natural text sits in a narrow entropy band).

    Spark side is SHUFFLE-FREE: char counts come from higher-order array
    functions (``array_distinct`` + ``filter``/``size``) evaluated per
    row inside whole-stage codegen, then the entropy identity
    H = log2(N) - sum(c*log2(c))/N folds them with ``aggregate`` —
    no explode, no groupBy.  The DuckDB oracle computes the same number
    the classic explode-and-group way, making the check independent.
    At 100 TB this is scan-bound; the explode formulation would shuffle
    ~n_chars rows per document instead.
    """
    # NULL-text docs have no character distribution: omit the row (the
    # oracle's unnest over a NULL split yields no rows for them, and a
    # NULL-metrics row is useless to a quality filter anyway)
    d = fan_out(load(spark, sf_dir, "documents")).filter(F.col("text").isNotNull())
    # N is the split-element count, not length(text): both engines treat
    # the EMPTY string as one ''-element (entropy 0.0), where log2(
    # length(text)) would be log2(0) = NULL; the two agree for any
    # non-empty text
    expr = (
        "round("
        "  log2(size(split(text, ''))) - aggregate("
        "    transform(array_distinct(split(text, '')),"
        "              c -> size(filter(split(text, ''), x -> x = c))),"
        "    0D, (acc, c) -> acc + c * log2(c)"
        "  ) / size(split(text, '')), 4)"
    )
    return d.select(
        "doc_id",
        F.size(F.array_distinct(F.split("text", ""))).cast("long").alias("n_distinct_chars"),
        F.expr(expr).alias("entropy"),
    ).orderBy("doc_id")


# ------------------------------------------------------- t11 LM perplexity
# 27-symbol alphabet: a-z + space (everything else normalizes to space).
# Combining marks are stripped AFTER the lower on both engines (the d11
# recipe): without it, Java's İ -> i + U+0307 turns into 'i ' (the mark
# is [^a-z]) while utf8proc's bare 'i' stays mid-word, shifting every
# downstream bigram.
_T11_MODEL_SQL = f"""
    norm AS (SELECT doc_id,
                    regexp_replace({_LOWER_MARKSTRIP_SQL}, '[^a-z]', ' ', 'g') AS t
             FROM documents),
    big AS (SELECT doc_id, substr(t, CAST(i AS INT), 2) AS bg
            FROM norm, LATERAL (SELECT unnest(generate_series(1, length(t) - 1)) AS i)),
    cnt AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c FROM big GROUP BY bg),
    sym AS (SELECT i, chr(CAST(CASE WHEN i = 26 THEN 32 ELSE 97 + i END AS INT)) AS ch
            FROM (SELECT unnest(generate_series(0, 26)) AS i)),
    firstc AS (SELECT substr(bg, 1, 1) AS c1, SUM(c) AS cf FROM cnt GROUP BY 1),
    model AS (
      SELECT s1.ch || s2.ch AS bg,
             CAST(FLOOR(LOG10((COALESCE(cnt.c, 0) + 1.0)
                              / (COALESCE(firstc.cf, 0) + 27.0)) * 1000000)
                  AS BIGINT) AS lp
      FROM sym s1 CROSS JOIN sym s2
      LEFT JOIN cnt ON cnt.bg = s1.ch || s2.ch
      LEFT JOIN firstc ON firstc.c1 = s1.ch
    )
"""


@query(
    "t11_bigram_lm_perplexity",
    oracle=f"""
    WITH {_T11_MODEL_SQL},
    scored AS (
      SELECT b.doc_id, SUM(m.lp) AS lp_sum, CAST(COUNT(*) AS BIGINT) AS n_bigrams
      FROM big b JOIN model m ON m.bg = b.bg
      GROUP BY b.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(-s.lp_sum, 0) AS BIGINT) AS nll_micro,
           CASE WHEN s.n_bigrams > 0
                THEN ROUND(-s.lp_sum / s.n_bigrams / 1000000.0, 4) END AS avg_nll
    FROM documents d LEFT JOIN scored s USING (doc_id) ORDER BY d.doc_id
    """,
)
def t11(spark, sf_dir):
    """Character-bigram language-model PERPLEXITY scoring — the CCNet /
    Wikipedia-LM quality filter shape: train a smoothed LM on the corpus,
    score every document by average negative log-likelihood, and gate or
    bucket on the score (high avg_nll = gibberish/boilerplate outliers).

    Scale shape, two passes like the centroid family:
      1. TRAIN: explode bigrams (a projection, no shuffle) into a hash
         aggregate whose partial map-side combine bounds the shuffle by
         the 27x27 alphabet domain per task — the collected model is
         <= 729 rows regardless of corpus size (same bounded-collect
         contract as the IVF centroids), add-one smoothed over the full
         domain so scoring never misses a key.
      2. SCORE: the model is baked into a 729-slot JVM literal array
         indexed by (first*27+second); per-document scoring is ONE
         row-local ``aggregate`` over character positions — no join, no
         Python, no second shuffle.
    Log-probs are fixed-point micro-units via FLOOR(log10(p)*1e6) — no
    rounding-mode ambiguity, and per-document sums are exact-integer
    comparable.  log10 itself is the one op here IEEE doesn't pin to
    correct rounding, so cross-engine agreement is VERIFIED rather than
    assumed: tests/test_text_determinism.py floors all 729 model ratios
    through both Python's math.log10 and DuckDB's LOG10 and fails with
    the offending ratio if a libm/DuckDB change ever splits them."""
    import math

    d = load(spark, sf_dir, "documents")
    norm = F.regexp_replace(lower_markstrip_spark(F.col("text")), "[^a-z]", " ")
    # the normalized corpus feeds both passes; recomputing the regex
    # normalize per pass is deliberate — measured (r11): a lazy
    # localCheckpoint of (doc_id, t) saves nothing at bench scale (the
    # cost lives in the explode/aggregate and the scoring fold), while
    # at 100 TB it would cost corpus-sized executor storage
    docs = fan_out(d.select("doc_id", norm.alias("t")))
    # Split the normalized text into its char array ONCE per row and pair
    # adjacent chars by array slicing.  The r14 form enumerated positions
    # and called substr(i, ...) per position — UTF8String.substring walks
    # bytes from the start, so scoring a doc was O(L^2) in its length
    # (measured: 5.5s -> 0.45s on 2k-char docs, identical results; ~300
    # char driver docs see the same shape).  Adjacent-pair slicing is
    # O(L), and every downstream value is the SAME string/integer, so
    # both passes are bit-identical to the r14 form and the oracle.
    chars = F.split(F.col("t"), "")
    n_pairs = F.greatest(F.size(chars) - 1, F.lit(0))
    bigrams = F.when(
        F.length("t") >= 2,
        F.zip_with(
            F.slice(chars, 1, n_pairs),
            F.slice(chars, 2, n_pairs),
            lambda a, b: F.concat(a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # ---- pass 1: corpus bigram counts (shuffle bounded by 27^2/task)
    counts = {
        r["bg"]: r["c"]
        for r in docs.select(F.explode(bigrams).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    syms = [chr(97 + i) for i in range(26)] + [" "]
    first_tot = {c1: 0 for c1 in syms}
    for bg, c in counts.items():
        first_tot[bg[0]] += c
    lp = [
        int(math.floor(math.log10((counts.get(c1 + c2, 0) + 1.0)
                                  / (first_tot[c1] + 27.0)) * 1_000_000))
        for c1 in syms
        for c2 in syms
    ]
    # one-parse literal table: the 729 per-element F.lit calls this
    # replaces cost ~0.5s of py4j/plan-construction per query build
    # (bench samples and HTTP requests each build fresh plans)
    lp_arr = const_array(lp)

    # ---- pass 2: row-local scoring against the literal model (same
    # adjacent-pair slicing as pass 1; per-bigram log-probs are exact
    # integers, so the summation order is immaterial — the fold below
    # keeps the original order anyway)
    def sym_idx(ch):
        return F.when(ch == " ", F.lit(26)).otherwise(F.ascii(ch) - 97)

    idxs = F.transform(chars, sym_idx)
    pair_lp = F.zip_with(
        F.slice(idxs, 1, n_pairs),
        F.slice(idxs, 2, n_pairs),
        lambda a, b: F.element_at(lp_arr, (a * 27 + b + 1).cast("int")).cast("long"),
    )
    lp_sum = F.when(
        F.length("t") >= 2,
        F.aggregate(pair_lp, F.lit(0).cast("long"), lambda acc, v: acc + v),
    ).otherwise(F.lit(0).cast("long"))
    n_big = F.greatest(F.length("t") - 1, F.lit(0)).cast("long")
    return (
        docs.select(
            "doc_id",
            n_big.alias("n_bigrams"),
            (-lp_sum).alias("nll_micro"),
        )
        .withColumn(
            "avg_nll",
            F.when(
                F.col("n_bigrams") > 0,
                F.round(F.col("nll_micro") / F.col("n_bigrams") / 1_000_000.0, 4),
            ),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------ t12 classifier quality gate
# Model-based quality FILTERING — the fastText-style linear classifier
# gate (CCNet / GPT-3 / LLaMA data pipelines) that t02's hand heuristics
# approximate: score every document with a trained linear model over
# hashed token features and keep docs the model scores positive.  The
# model here is a deterministic stand-in (md5-derived weights — at scale
# you broadcast the trained weight vector instead; same plan), and it is
# INTEGER-QUANTIZED: weights in [-6, 6], activations are t05's signed
# token counts, so the logit is an exact integer — per-doc sums commute,
# no float summation-order skew between engines, and the keep decision
# is reproducible under any partitioning (the same reason s07 quantizes).
T12_W_MOD = 13  # weight = (60-bit md5 of 'w:<idx>') % 13 - 6  in [-6, 6]

# the oracle's weight-table lookup key: 'w:<feature index>', where the
# index is the shared token hash mod EMB_DIM (rendered through
# _tokhash_sql so it cannot drift from t05's feature index)
_T12_WIDX_SQL = (
    "'w:' || CAST(\n"
    f"                   {_tokhash_sql()} % {EMB_DIM}\n"
    "                 AS VARCHAR)"
)


def _t12_weights() -> list[int]:
    """Driver-side precompute of the literal weight table, matching the
    oracle's md5 formula bit-for-bit (the s02 _plane_signs idiom)."""
    import hashlib

    return [
        int(hashlib.md5(f"w:{i}".encode()).hexdigest()[:15], 16) % T12_W_MOD
        - T12_W_MOD // 2
        for i in range(EMB_DIM)
    ]


@query(
    "t12_classifier_quality_filter",
    oracle=rf"""
    WITH tokens AS (
      SELECT doc_id,
             unnest({ws_words_sql(_LOWER_MARKSTRIP_SQL)}) AS w
      FROM documents
    ),
    contrib AS (
      SELECT doc_id,
             (CASE WHEN ({_tokhash_sql()} >> 6) & 1 = 1
                   THEN 1 ELSE -1 END)
             * (({_tokhash_sql(_T12_WIDX_SQL)} % {T12_W_MOD}) - {T12_W_MOD // 2})
               AS c
      FROM tokens
    ),
    logits AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS logit FROM contrib GROUP BY doc_id
    )
    SELECT d.doc_id, d.lang,
           CAST(COALESCE(l.logit, 0) AS BIGINT) AS logit,
           CAST(CASE WHEN COALESCE(l.logit, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM documents d LEFT JOIN logits l ON l.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def t12(spark, sf_dir):
    """Linear-classifier quality gate over hashed token features: each
    token contributes sign(h) * w[h mod {EMB_DIM}] (t05's hashing trick
    feature, weighted by the integer model table), the document logit is
    the exact integer sum, and ``kept = logit > 0`` is the filter
    decision — including for token-less (NULL-text) docs, which score 0
    and drop: a quality gate must emit a verdict for EVERY document, so
    the logits left-join back to the corpus instead of silently omitting
    unscorable rows.

    Scale shape: tokenize/hash/weight-lookup are row-local JVM
    expressions (the weight table is a 64-int literal baked into the
    plan, exactly t11's literal-model idiom — at real scale the trained
    vector broadcasts the same way); the only corpus exchanges are ONE
    partial-aggregated groupBy(doc_id) for the logit and the verdict
    left-join back to documents, both keyed on doc_id, so co-partitioned
    storage makes the join exchange-free.  Integer quantization is the
    cross-engine exactness lever: floating logits would need a
    summation-order pin (impossible under a commutative hash aggregate),
    integer sums commute exactly."""
    d = load(spark, sf_dir, "documents")
    w_arr = const_array(_t12_weights())  # one parse, not 64 py4j lits
    tokens = fan_out(d.select("doc_id", "text")).select(
        "doc_id",
        F.explode(ws_words_spark(lower_markstrip_spark(F.col("text")))).alias("w"),
    )
    h = _tokhash_spark(F.col("w"))
    sgn = _toksgn_spark(h)
    contrib = sgn * F.element_at(w_arr, (h % EMB_DIM + 1).cast("int"))
    logits = (
        tokens.select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("logit"))
    )
    return (
        d.select("doc_id", "lang")
        .join(logits, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("logit", F.lit(0)).cast("long").alias("logit"),
            F.when(F.coalesce("logit", F.lit(0)) > 0, 1).otherwise(0).cast("long").alias("kept"),
        )
        .orderBy("doc_id")
    )
