"""Text analysis operators over ``documents`` — connor.fun's downstream
purpose (per-region text scoring), supplied engine-side.

All four ops are pure built-in expressions (split/filter/aggregate/
regexp) — language ID and quality scoring run inside whole-stage codegen,
which is what makes them viable as a pre-filter pass over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connor_fun_streamproducer_spark.catalog import bounded_series, dim_window, load
from connor_fun_streamproducer_spark.registry import op

# Tiny marker-word lists for the n-gram/stopword language heuristic.
# (Deterministic toy lists — the fixture corpus is synthetic; the operator
# contract is the scoring machinery, not lexicon quality.)
_MARKERS = {
    "en": ("the", "and", "of", "fast"),
    "de": ("der", "und", "von", "schnell"),
    "fr": ("le", "et", "de", "vite"),
}
_STOPWORDS = ("the", "a", "of", "and", "in", "to")


def _toks():
    return F.split(F.col("text"), " ")


def _marker_count(lang: str):
    markers = list(_MARKERS[lang])
    return F.size(F.filter(_toks(), lambda t: t.isin(markers)))


@op(
    "text_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER)                AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
           floor(CAST(length(text) AS DOUBLE)
                 / len(string_split(text, ' ')) * 10000) / 10000        AS avg_token_len,
           floor(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) * 10000) / 10000        AS ttr
    FROM documents
    """,
    tags=("llm", "text"),
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts, type-token ratio, average token length.

    Whitespace tokenization plus a BPE-ish proxy (chars/token) — the cheap
    token-budget estimator a corpus pipeline runs before real tokenizers.
    """
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(_toks())
    n_dis = F.size(F.array_distinct(_toks()))
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_dis.alias("n_distinct"),
        (F.floor(F.length("text").cast("double") / n_tok * 10000) / 10000).alias("avg_token_len"),
        (F.floor(n_dis.cast("double") / n_tok * 10000) / 10000).alias("ttr"),
    )


@op(
    "text_quality",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[^a-z ]')) AS INTEGER) AS n_nonalpha,
           floor(CAST(len(list_filter(string_split(text, ' '),
                 t -> t IN ('the', 'a', 'of', 'and', 'in', 'to'))) AS DOUBLE)
                 / len(string_split(text, ' ')) * 10000) / 10000     AS stopword_ratio,
           floor(least(CAST(length(text) AS DOUBLE) / 500, 1.0)
                 * (0.5 + 0.5 * CAST(len(list_filter(string_split(text, ' '),
                       t -> t IN ('the', 'a', 'of', 'and', 'in', 'to'))) AS DOUBLE)
                       / len(string_split(text, ' '))) * 10000) / 10000  AS quality_score
    FROM documents
    """,
    tags=("llm", "text"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length + stopword-ratio composite.

    The Gopher/C4-style cheap quality gate: documents that are too short
    or stopword-free score low. Formula mirrored exactly in the
    oracle; ratio outputs use floor-truncation at 4 decimals instead of
    round() — identical doubles floor identically on every engine, while
    round() tie-handling is implementation-defined (HALF_UP on exact
    binary vs scaled-multiply half-away).
    """
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(_toks())
    stop_ratio = (
        F.size(F.filter(_toks(), lambda t: t.isin(list(_STOPWORDS)))).cast("double") / n_tok
    )
    length_term = F.least(F.length("text").cast("double") / 500, F.lit(1.0))
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[^a-z ]"), 0)).alias("n_nonalpha"),
        (F.floor(stop_ratio * 10000) / 10000).alias("stopword_ratio"),
        (F.floor(length_term * (0.5 + 0.5 * stop_ratio) * 10000) / 10000).alias("quality_score"),
    )


def _langid_scores_sql() -> str:
    """The marker-count scores CTE body + guess CASE, generated from
    _MARKERS — ONE source for the Spark markers and every langid oracle
    (text_langid + corpus_lang_confusion), the _DOC_TOK_SQL pattern."""
    def in_list(lang: str) -> str:
        return ", ".join(f"'{m}'" for m in _MARKERS[lang])

    return f"""scores AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ({in_list("en")})))     AS s_en,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ({in_list("de")}))) AS s_de,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ({in_list("fr")})))       AS s_fr
        FROM documents
    )"""


_LANGID_GUESS_SQL = """CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END"""



@op(
    "text_langid",
    oracle="WITH " + _langid_scores_sql() + f"""
    SELECT doc_id, lang AS labeled_lang,
           {_LANGID_GUESS_SQL} AS guessed_lang,
           CAST(greatest(s_en, s_de, s_fr) AS INTEGER) AS marker_hits
    FROM scores
    """,
    tags=("llm", "text"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: argmax of per-language marker counts.

    Deterministic tie-break (en > de > fr) mirrored on both sides. On a
    real corpus the marker lists become n-gram profiles; the operator
    shape (k scores + argmax, one pass) is unchanged.
    """
    d = load(spark, sf_dir, "documents")
    s_en, s_de, s_fr = _marker_count("en"), _marker_count("de"), _marker_count("fr")
    guess = (
        F.when((s_en >= s_de) & (s_en >= s_fr), F.lit("en"))
        .when(s_de >= s_fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        guess.alias("guessed_lang"),
        F.greatest(s_en, s_de, s_fr).alias("marker_hits"),
    )


@op(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           CAST(list_sum(list_transform(string_split(text, ' '),
                    (t, i) -> i * (ascii(t) * 100 + length(t)))) % 1000000007
               AS BIGINT) AS fingerprint
    FROM documents
    """,
    tags=("llm", "text"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint (position-weighted token hash).

    Σ_i i · (ascii(tok_i[0])·100 + len(tok_i)) mod p — swapping two
    distinct tokens changes the value, so it detects reorderings that
    bag-of-words hashes miss, at one arithmetic op per token. Both engines
    use 1-based positions (Spark's indexed transform is 0-based → i+1).
    """
    d = load(spark, sf_dir, "documents")
    weighted = F.transform(
        _toks(), lambda t, i: (i + 1).cast("bigint") * (F.ascii(t) * 100 + F.length(t))
    )
    fp = F.aggregate(weighted, F.lit(0).cast("bigint"), lambda acc, x: acc + x) % 1000000007
    return d.select("doc_id", fp.alias("fingerprint"))


@op(
    "text_perplexity_proxy",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents
    ), vocab AS (
        SELECT w, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY w
    ), total AS (
        SELECT sum(c) AS n FROM vocab
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln(v.c / (SELECT n FROM total))), 4) AS nll
    FROM tok t JOIN vocab v ON t.w = v.w
    GROUP BY t.doc_id
    """,
    tags=("llm", "text", "quality"),
)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM negative log-likelihood per doc — the perplexity-proxy
    quality score (the cheap stand-in for a KenLM pass) used to rank
    documents for filtering: low mean NLL ≈ common-word prose, high ≈
    rare-token noise.

    Two aggregation passes over one exploded token stream: (1) corpus
    unigram counts (the "LM training"), (2) per-doc mean of -ln p(w)
    with p from the corpus MLE. At 100 TB the vocabulary aggregate is
    |vocab|-bounded (hash agg with map-side combine) and the scoring
    join is token→count — broadcastable for natural-language vocabularies
    (even web-scale corpora hold ≪100 M distinct tokens after
    normalization), so the only corpus-scale exchange is the final
    (doc_id) count. Probabilities divide by the SAME total on both
    engines and the mean rounds at 4 decimals — ln/avg drift stays well
    inside that at fixture magnitudes.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    vocab = tok.groupBy("w").agg(F.count("*").cast("double").alias("c"))
    # 1-row broadcast scalar (the Q22 decorrelation pattern) instead of a
    # driver collect: one plan, no extra action.
    total = vocab.agg(F.sum("c").alias("n_total"))
    return (
        tok.join(F.broadcast(vocab), "w")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") / F.col("n_total"))), 4).alias("nll"),
        )
    )


@op(
    "text_tokens_bpe_est",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(length(text) AS BIGINT)                 AS n_chars,
           CAST(list_sum(list_transform(
               string_split(text, ' '),
               t -> CAST(ceil(length(t) / 4.0) AS BIGINT)
           )) AS BIGINT)                                AS bpe_est
    FROM documents
    """,
    tags=("llm", "text"),
)
def text_tokens_bpe_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword token estimate — the budget number an LLM-training
    pipeline actually plans with (context packing, epoch token counts,
    per-source mixing quotas are all denominated in SUBWORD tokens, not
    whitespace words).

    Real BPE needs a merges table; the standard cheap estimator is
    ceil(word_len / 4) per word — short words one token, long words
    split roughly every 4 chars, which tracks GPT-style tokenizers
    closely enough for budgeting. The whole computation is two
    higher-order array functions (transform + aggregate) inside
    whole-stage codegen: map-only, zero shuffles, linear in corpus
    bytes — at 100 TB this runs at scan speed next to text_tokens'
    word-level stats.
    """
    toks = F.split("text", " ")
    bpe = F.aggregate(
        F.transform(toks, lambda t: F.ceil(F.length(t) / 4.0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        F.length("text").cast("bigint").alias("n_chars"),
        bpe.alias("bpe_est"),
    )


@op(
    "text_entropy_source",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ), counts AS (
        SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2
    ), m AS (
        SELECT source,
               CAST(sum(c) AS BIGINT)                AS n_tokens,
               CAST(count(*) AS BIGINT)              AS n_types,
               sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS sum_clogc
        FROM counts GROUP BY source
    )
    SELECT source, n_tokens, n_types,
           round(log2(CAST(n_tokens AS DOUBLE)) - sum_clogc / n_tokens, 6)
               AS entropy_bits
    FROM m
    """,
    tags=("llm", "text", "scale"),
)
def text_entropy_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per source — the diversity
    signal corpus curation ranks sources by (a source whose token
    distribution has collapsed — boilerplate, templated spam, scraped
    error pages — shows low entropy long before a human reads it).

    Uses the sufficient-statistics identity H = log2(N) − (Σ c·log2 c)/N
    over EXACT integer token counts, so the only float work is one
    log2-weighted sum of identical integers on both engines — the same
    hash-stability discipline as agg_corr_pairs. Two hash aggregations:
    (source, token) counts (the only corpus-sized exchange, partial-agg
    map-side), then the per-source moment fold at |sources| ×
    |vocabulary| rows. No windows, no joins; at 100 TB the cost is the
    token-count aggregation every corpus pipeline already runs.
    """
    tok = load(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    counts = tok.groupBy("source", "w").agg(F.count("*").alias("c"))
    m = counts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum(F.col("c").cast("double") * F.log2(F.col("c").cast("double"))).alias(
            "sum_clogc"
        ),
    )
    return m.select(
        "source",
        "n_tokens",
        "n_types",
        F.round(
            F.log2(F.col("n_tokens").cast("double"))
            - F.col("sum_clogc") / F.col("n_tokens"),
            6,
        ).alias("entropy_bits"),
    )


@op(
    "text_syllable_density",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(list_sum(list_transform(
               string_split(text, ' '),
               w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)
           )) AS BIGINT)                                AS n_syll,
           CAST(list_sum(list_transform(
               string_split(text, ' '),
               w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)
           )) * 10000 // len(string_split(text, ' ')) AS BIGINT)
                                                        AS syll_per_word_bp
    FROM documents
    """,
    tags=("llm", "text"),
)
def text_syllable_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syllable density per document (vowel-group proxy) — the core
    term of Flesch-style readability, usable standalone as a quality
    signal: prose sits near ~1.3-1.6 syllables/word, while code dumps,
    minified blobs, and consonant-noise scrape artifacts land far
    outside the band.

    Syllables are approximated as maximal vowel-group runs per word
    (floored at 1 — the standard heuristic), counted by a regexp both
    engines' regex dialects treat identically ([aeiouy]+ has no
    dialect-sensitive syntax). Density is reported in integer basis
    points via floor division over the exact counts. Everything runs
    as higher-order array expressions inside codegen — map-only, zero
    shuffles, scan-bandwidth like the rest of the text tier.
    """
    toks = F.split("text", " ")
    syll = F.aggregate(
        F.transform(
            toks,
            lambda w: F.greatest(
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)), F.lit(1)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        syll.alias("n_syll"),
    )
    return d.select(
        "doc_id",
        "n_words",
        "n_syll",
        F.floor(F.col("n_syll") * 10000 / F.col("n_words"))
        .cast("bigint")
        .alias("syll_per_word_bp"),
    )


# ---------------------------------------------------------------------------
# Bigram association (collocation lift, exact integral)
# ---------------------------------------------------------------------------

# Minimum bigram occurrences before an association score is emitted —
# the classical sparse-count guard (PMI explodes on hapax pairs).
_BIGRAM_MIN_N = 5

_BIGRAM_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bg AS (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
          FROM toks)
),
n AS (SELECT count(*) AS total FROM bg),
ab AS (SELECT w1, w2, count(*) AS n_ab FROM bg GROUP BY 1, 2),
a AS (SELECT w1, count(*) AS n_a FROM bg GROUP BY 1),
b AS (SELECT w2, count(*) AS n_b FROM bg GROUP BY 1)
SELECT ab.w1, ab.w2,
       CAST(ab.n_ab AS BIGINT) AS n_ab,
       CAST(a.n_a AS BIGINT) AS n_first,
       CAST(b.n_b AS BIGINT) AS n_second,
       CAST(ab.n_ab * n.total * 10000 // (a.n_a * b.n_b) AS BIGINT)
           AS lift_bp
FROM ab JOIN a USING (w1) JOIN b USING (w2) CROSS JOIN n
WHERE ab.n_ab >= {_BIGRAM_MIN_N}
"""


@op("text_bigram_mi", oracle=_BIGRAM_ORACLE, tags=("llm", "text", "corpus"))
def text_bigram_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram association (collocation) table: for every
    adjacent word pair seen >= _BIGRAM_MIN_N (5) times, its observed count
    and pointwise-lift against independence — n_ab·N / (n_a·n_b) in
    integral basis points (10000 = independent; the integer-exact
    monotone core of PMI, which is just its log). Collocations
    ("of the", named entities) score high and drive phrase-aware
    tokenizer vocab and boilerplate phrase mining; tfidf_top_terms
    ranks single tokens, this scores token ADJACENCY.

    Bigram build is one window ``lead`` over each doc's token positions
    (posexplode → per-doc lead on the existing (doc_id, pos) order) —
    no self-join on position. The three marginal frames are hash aggs
    of the same bigram frame; N is a 1-row scalar cross join. All
    counts exact integers, lift one integral division — hash-identical
    cross-engine.

    Scale: the explode is linear in token count; marginals/bigram aggs
    are partial-combined; the w1/w2 marginal joins are hash joins on
    word keys (Zipf skew on "the" is real but bounded by the vocab's
    heavy head — AQE skew-split handles the outliers).
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    bg = (
        d.select("doc_id", F.posexplode("t").alias("pos", "w1"))
        .withColumn(
            "w2",
            F.lead("w1").over(Window.partitionBy("doc_id").orderBy("pos")),
        )
        .filter(F.col("w2").isNotNull())
        .select("w1", "w2")
    )
    ab = bg.groupBy("w1", "w2").agg(F.count("*").alias("n_ab"))
    a = bg.groupBy("w1").agg(F.count("*").alias("n_a"))
    b = bg.groupBy("w2").agg(F.count("*").alias("n_b"))
    n = bg.agg(F.count("*").alias("total"))
    return (
        ab.filter(F.col("n_ab") >= _BIGRAM_MIN_N)
        .join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("n_a").cast("bigint").alias("n_first"),
            F.col("n_b").cast("bigint").alias("n_second"),
            F.expr("n_ab * total * 10000 div (n_a * n_b)")
            .cast("bigint")
            .alias("lift_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick) over corpus tokens
# ---------------------------------------------------------------------------

_HASH_DIM = 256

_HASHVEC_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), b AS (
    SELECT doc_id, w,
           CAST(concat('0x', substr(md5(w), 1, 8)) AS UBIGINT) % {_HASH_DIM}
               AS bucket
    FROM tok
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_occ,
       CAST(count(DISTINCT w) AS BIGINT) AS n_types,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM b GROUP BY 1
"""


@op("text_hashing_vectorizer", oracle=_HASHVEC_ORACLE, tags=("llm", "text", "scale"))
def text_hashing_vectorizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick): every token maps to one of
    256 buckets via md5 — the fixed-width bag-of-words
    featurization that needs NO vocabulary build, no broadcast
    dictionary, and no second pass; the per-bucket occupancy table this
    emits (occurrences, distinct types, doc frequency) is both the
    feature-frequency profile and the collision audit (n_types >> 1 in
    a hot bucket = collision pressure; grow the dimension).

    The md5-prefix bucket is the repo's standard cross-engine hash
    stream (llm/splits.py): bit-identical in Spark
    (``conv(substr(md5(w),1,8),16,10)``) and DuckDB
    (``CAST('0x'||substr(md5(w),1,8) AS UBIGINT)``), so the whole
    op is hash-checkable — unlike murmur-based hashes which are
    engine-private.

    Scale: map-side token explode + hash, then ONE 256-row
    hash aggregation — the shuffle carries (bucket, token, doc) partial
    aggregates, bounded by corpus token count; output is
    dimension-bounded. This is why the hashing trick beats vocab
    lookup at 100 TB: zero joins against a dictionary that itself
    needs building, sharding, and versioning.
    """
    tok = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long")
        % _HASH_DIM
    )
    return (
        tok.select("doc_id", "w", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_occ"),
            F.countDistinct("w").cast("bigint").alias("n_types"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .select(F.col("bucket").cast("bigint").alias("bucket"), "n_occ", "n_types", "n_docs")
    )


# ---------------------------------------------------------------------------
# Zipf slope per source (log-log least squares, deterministic float folds)
# ---------------------------------------------------------------------------

_ZIPF_RANKS = 50

_ZIPF_ORACLE = f"""
WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
), counts AS (
    SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2
), ranked AS (
    SELECT source, c,
           row_number() OVER (PARTITION BY source ORDER BY c DESC, w) AS rk
    FROM counts
), lists AS (
    SELECT source, list_sort(list([rk, c])) AS l
    FROM ranked WHERE rk <= {_ZIPF_RANKS} GROUP BY source
), m AS (
    SELECT source,
           CAST(len(l) AS DOUBLE) AS n,
           CAST(len(l) AS BIGINT) AS n_ranks,
           l[1][2] AS top_count,
           list_reduce(list_transform(l, p -> ln(CAST(p[1] AS DOUBLE))), (a, b) -> a + b) AS sx,
           list_reduce(list_transform(l, p -> ln(CAST(p[2] AS DOUBLE))), (a, b) -> a + b) AS sy,
           list_reduce(list_transform(l, p -> ln(CAST(p[1] AS DOUBLE)) * ln(CAST(p[2] AS DOUBLE))), (a, b) -> a + b) AS sxy,
           list_reduce(list_transform(l, p -> ln(CAST(p[1] AS DOUBLE)) * ln(CAST(p[1] AS DOUBLE))), (a, b) -> a + b) AS sx2
    FROM lists
)
SELECT source, n_ranks, CAST(top_count AS BIGINT) AS top_count,
       round((n * sxy - sx * sy) / nullif(n * sx2 - sx * sx, 0), 6) + 0.0
           AS zipf_slope
FROM m
"""


@op("text_zipf_alpha", oracle=_ZIPF_ORACLE, tags=("llm", "text"))
def text_zipf_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope per source: least-squares slope of ln(count) on
    ln(rank) over the top-50 token ranks — natural language sits near
    −1; templated/spam sources flatten (|slope| « 1, the head repeats)
    or steepen (a few tokens dominate). The corpus-curation twin of
    text_entropy_source that looks at the SHAPE of the frequency curve
    rather than its mass.

    Float-determinism discipline, one step past entropy's: the four
    log moments are LEFT FOLDS over the per-source rank list sorted
    ascending — Spark's `aggregate` HOF and DuckDB's `list_reduce` add
    the identical doubles in the identical order (IEEE 0.0 + x = x
    makes the differing init conventions exact), so the sums are
    bit-identical by construction, not by luck of partition order.
    Ranks are totally ordered (count DESC, token).

    Scale: the (source, token) count is the only corpus-sized shuffle
    (shared with the entropy/vocab tier); the top-50 cut is a
    WindowGroupLimit over counts and the folds run on 50-element
    arrays per source — dimension-bounded driver-free math.
    """
    tok = load(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    counts = tok.groupBy("source", "w").agg(F.count("*").alias("c"))
    w_rank = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("w"))
    ranked = counts.select(
        "source", "c", F.row_number().over(w_rank).alias("rk")
    ).filter(F.col("rk") <= _ZIPF_RANKS)
    lists = ranked.groupBy("source").agg(
        F.array_sort(F.collect_list(F.array("rk", "c"))).alias("l")
    )

    def fold(expr: str):
        return F.expr(f"aggregate(l, CAST(0.0 AS DOUBLE), (a, p) -> a + {expr})")

    m = lists.select(
        "source",
        F.size("l").cast("double").alias("n"),
        F.size("l").cast("bigint").alias("n_ranks"),
        F.element_at(F.element_at("l", 1), 2).cast("bigint").alias("top_count"),
        fold("ln(CAST(p[0] AS DOUBLE))").alias("sx"),
        fold("ln(CAST(p[1] AS DOUBLE))").alias("sy"),
        fold("ln(CAST(p[0] AS DOUBLE)) * ln(CAST(p[1] AS DOUBLE))").alias("sxy"),
        fold("ln(CAST(p[0] AS DOUBLE)) * ln(CAST(p[0] AS DOUBLE))").alias("sx2"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    return m.select(
        "source",
        "n_ranks",
        "top_count",
        (F.round(slope, 6) + F.lit(0.0)).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# N-gram novelty: how much of each document is first-seen content
# ---------------------------------------------------------------------------

_NOVELTY_N = 3  # token 3-grams: the repo-wide shingle width

_NOVELTY_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
    SELECT DISTINCT doc_id,
           concat(w[i], ' ', w[i + 1], ' ', w[i + 2]) AS g
    FROM (SELECT doc_id, w,
                 unnest(generate_series(1, len(w) - {_NOVELTY_N - 1})) AS i
          FROM toks WHERE len(w) >= {_NOVELTY_N})
), first_seen AS (
    SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g
), per_doc AS (
    SELECT gr.doc_id,
           count(*) AS n_grams,
           sum(CASE WHEN fs.first_doc = gr.doc_id THEN 1 ELSE 0 END) AS n_novel
    FROM grams gr JOIN first_seen fs USING (g)
    GROUP BY gr.doc_id
)
SELECT doc_id,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_novel AS BIGINT) AS n_novel,
       CAST(n_novel * 10000 // n_grams AS BIGINT) AS novelty_bp
FROM per_doc
"""


@op("text_ngram_novelty", oracle=_NOVELTY_ORACLE, tags=("llm", "text", "dedup", "scale"))
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the share of a doc's distinct token
    3-grams whose FIRST occurrence (min doc_id = ingest order) is this
    doc — the incremental-content score a curation pipeline ranks by
    when near-dup tiers say "not a duplicate" but the doc is still
    mostly recombined boilerplate (novelty ≈ 0 = derivative; ≈ 10000 =
    genuinely new text). The document-level complement of
    dedup_substring_window (which finds the REPEATED spans; this
    credits the unrepeated remainder to its earliest source).

    Exactness: first-seen is min(doc_id) per gram — a total order, no
    hashes, no floats; novelty is integral basis points.

    Scale: one explode into (doc, gram) distinct pairs, then ONE
    (gram)-keyed window carries min(doc_id) to every pair — r12
    rewrite: the former agg-then-join-back compiled the corpus-sized
    distinct-gram subtree TWICE (build and probe sides); the window
    form is a single subtree, one gram exchange, no join. Per-gram
    partitions are tiny (a gram's doc list), so the window never sees
    a hot partition. At 100 TB, grams would carry a 64-bit hash
    instead of the string (collision-safe at corpus scale) to shrink
    the shuffle 10x — deliberately NOT done here so the oracle hashes
    the literal strings.
    """
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    grams = (
        toks.filter(F.size("w") >= _NOVELTY_N)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(w) - {_NOVELTY_N}),"
                    f" i -> concat(w[i], ' ', w[i + 1], ' ', w[i + 2]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    wg = Window.partitionBy("g")
    per_doc = (
        grams.select("doc_id", F.min("doc_id").over(wg).alias("first_doc"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("n_novel").cast("bigint").alias("n_novel"),
        F.expr("n_novel * 10000 div n_grams").cast("bigint").alias("novelty_bp"),
    )


# ---------------------------------------------------------------------------
# Declared-vs-detected language confusion matrix (labeling governance)
# ---------------------------------------------------------------------------


def _lang_confusion_oracle() -> str:
    return "WITH " + _langid_scores_sql() + f"""
, g AS (
    SELECT lang AS labeled_lang, {_LANGID_GUESS_SQL} AS guessed_lang
    FROM scores
), cells AS (
    SELECT labeled_lang, guessed_lang, count(*) AS n_docs FROM g GROUP BY 1, 2
)
SELECT labeled_lang, guessed_lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_docs * 10000
            // sum(n_docs) OVER (PARTITION BY labeled_lang) AS BIGINT)
           AS share_bp,
       labeled_lang = guessed_lang AS agree
FROM cells
"""


@op(
    "corpus_lang_confusion",
    oracle=_lang_confusion_oracle(),
    tags=("llm", "text", "corpus", "stats"),
)
def corpus_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language confusion matrix: for every
    (labeled_lang, guessed_lang) cell, the doc count, its share of the
    labeled language in basis points, and an agreement flag — the
    labeling-governance rollup of text_langid (which emits per-doc
    verdicts nobody reads at corpus scale). Off-diagonal mass is
    either mislabeled ingest metadata or detector weakness — both
    things a corpus owner must quantify per SOURCE OF TRUTH before
    stratifying training mixes by language (sample_mix_target trusts
    the label; this measures how much it should).

    Exact: the marker scores and guess CASE come from ONE generated
    fragment shared with text_langid's oracle (_langid_scores_sql — an
    edit to the marker lists can never desync the two); cells and
    shares are integer counts and integral division.

    Scale: one documents scan -> |langs|² hash agg; the share window
    runs on the dim-bounded cell frame.
    """
    d = load(spark, sf_dir, "documents")
    s_en, s_de, s_fr = _marker_count("en"), _marker_count("de"), _marker_count("fr")
    guess = (
        F.when((s_en >= s_de) & (s_en >= s_fr), F.lit("en"))
        .when(s_de >= s_fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    cells = (
        d.select(F.col("lang").alias("labeled_lang"), guess.alias("guessed_lang"))
        .groupBy("labeled_lang", "guessed_lang")
        .agg(F.count("*").alias("n_docs"))
    )
    return cells.select(
        "labeled_lang",
        "guessed_lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.expr("n_docs * 10000 div sum(n_docs) OVER (PARTITION BY labeled_lang)")
        .cast("bigint")
        .alias("share_bp"),
        (F.col("labeled_lang") == F.col("guessed_lang")).alias("agree"),
    )


# ---------------------------------------------------------------------------
# Jensen–Shannon divergence between per-source unigram distributions
# ---------------------------------------------------------------------------

_JSD_VOCAB_K = 200  # shared global vocab: top-K tokens by corpus count

_JSD_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, source, unnest(string_split(text, ' ')) AS t FROM documents
), vocab AS (
    SELECT t FROM tok GROUP BY t
    ORDER BY count(*) DESC, t LIMIT {_JSD_VOCAB_K}
), vr AS (
    SELECT t, row_number() OVER (ORDER BY t) AS vid FROM vocab
), cnt AS (
    SELECT tok.source, vr.vid, count(*) AS c
    FROM tok JOIN vr USING (t) GROUP BY 1, 2
), srcs AS (SELECT DISTINCT source FROM documents
), grid AS (
    SELECT s.source, v.vid, coalesce(c.c, 0) AS c
    FROM srcs s CROSS JOIN vr v
    LEFT JOIN cnt c ON c.source = s.source AND c.vid = v.vid
), vecs AS (
    SELECT source, list(c ORDER BY vid) AS v,
           sum(c) + count(*) AS tt
    FROM grid GROUP BY source
), pairs AS (
    SELECT a.source AS source_a, b.source AS source_b,
           a.v AS va, b.v AS vb, a.tt AS ta, b.tt AS tb
    FROM vecs a JOIN vecs b ON a.source < b.source
)
SELECT source_a, source_b,
       round(list_reduce(list_transform(range(len(va)), i ->
           0.5 * ((CAST(va[i+1] + 1 AS DOUBLE) / ta)
                  * ln((CAST(va[i+1] + 1 AS DOUBLE) / ta)
                       / (0.5 * ((CAST(va[i+1] + 1 AS DOUBLE) / ta)
                                 + (CAST(vb[i+1] + 1 AS DOUBLE) / tb)))))
           + 0.5 * ((CAST(vb[i+1] + 1 AS DOUBLE) / tb)
                    * ln((CAST(vb[i+1] + 1 AS DOUBLE) / tb)
                         / (0.5 * ((CAST(va[i+1] + 1 AS DOUBLE) / ta)
                                   + (CAST(vb[i+1] + 1 AS DOUBLE) / tb)))))),
           (a, b) -> a + b), 6) + 0.0 AS jsd_nats
FROM pairs
"""


@op(
    "text_js_divergence_sources",
    oracle=_JSD_ORACLE,
    tags=("llm", "text", "corpus", "stats"),
)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between every source pair's unigram
    distribution over the shared top-{_JSD_VOCAB_K} corpus vocabulary —
    the symmetric, bounded (≤ ln 2) corpus-similarity matrix behind
    mix design: two sources with near-zero JSD are redundant feeds
    (dedup them against each other — corpus_cross_source_dup will show
    the flow), while a high-JSD source adds genuine distributional
    coverage. tfidf_top_terms ranks WHAT distinguishes a source; this
    scores HOW FAR each pair is apart, in nats.

    Exact: the vocab is a (count DESC, token) total-order top-K; counts
    densify onto the vocab grid (zeros explicit, Laplace+1), each
    source's vector folds in vocab-id order, and every JSD term derives
    from exact ints and two scalar totals — one fixed-shape float fold
    per pair (the corpus_mix_kl_drift discipline, pairwise).

    Scale: token counting is one explode + (source, vid) agg; vectors
    are |sources| rows of K ints; the pair frame is |sources|²-bounded.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split("text", " ")).alias("t")
    )
    vocab = (
        tok.groupBy("t")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("t"))
        .limit(_JSD_VOCAB_K)
    )
    vr = vocab.select(
        "t",
        F.row_number()
        .over(dim_window(Window.orderBy("t"), bound="top-K JSD vocab rows"))
        .alias("vid"),
    )
    cnt = tok.join(vr, "t").groupBy("source", "vid").agg(F.count("*").alias("c"))
    srcs = d.select("source").distinct()
    grid = (
        srcs.crossJoin(F.broadcast(vr.select("vid")))
        .join(cnt, ["source", "vid"], "left")
        .select("source", "vid", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    vecs = grid.groupBy("source").agg(
        F.expr("transform(array_sort(collect_list(struct(vid, c))), s -> s.c)").alias("v"),
        # +count(*): the realized vocab can be smaller than the top-K cap
        (F.sum("c") + F.count("*")).alias("tt"),
    )
    a = vecs.select(
        F.col("source").alias("source_a"), F.col("v").alias("va"), F.col("tt").alias("ta")
    )
    b = vecs.select(
        F.col("source").alias("source_b"), F.col("v").alias("vb"), F.col("tt").alias("tb")
    )
    pairs = a.join(b, F.col("source_a") < F.col("source_b"))
    jsd = F.expr(
        "aggregate(sequence(0, size(va) - 1), CAST(0.0 AS DOUBLE), (a, i) -> a +"
        " 0.5 * ((CAST(va[i] + 1 AS DOUBLE) / ta)"
        "        * ln((CAST(va[i] + 1 AS DOUBLE) / ta)"
        "             / (0.5 * ((CAST(va[i] + 1 AS DOUBLE) / ta)"
        "                       + (CAST(vb[i] + 1 AS DOUBLE) / tb)))))"
        " + 0.5 * ((CAST(vb[i] + 1 AS DOUBLE) / tb)"
        "          * ln((CAST(vb[i] + 1 AS DOUBLE) / tb)"
        "               / (0.5 * ((CAST(va[i] + 1 AS DOUBLE) / ta)"
        "                         + (CAST(vb[i] + 1 AS DOUBLE) / tb))))))"
    )
    return pairs.select(
        "source_a", "source_b", (F.round(jsd, 6) + F.lit(0.0)).alias("jsd_nats")
    )


# ---------------------------------------------------------------------------
# Type-token ratio per source (template/spam screen)
# ---------------------------------------------------------------------------

_TTR_ORACLE = """
WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
), s AS (
    SELECT source, count(*) AS n_tokens, count(DISTINCT t) AS n_types
    FROM tok GROUP BY 1
)
SELECT source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(n_types * 10000 // n_tokens AS BIGINT) AS ttr_bp
FROM s
"""


@op("text_ttr_by_source", oracle=_TTR_ORACLE, tags=("llm", "text", "stats"))
def text_ttr_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio per source: distinct token types over total
    tokens, in basis points — the cheapest template detector there is.
    A natural-prose source holds a TTR band; a log-spam or
    machine-templated source collapses toward a handful of types
    repeated endlessly (low TTR), and a random-id-heavy source inflates
    past it (high TTR). corpus_vocab_coverage profiles the head of the
    distribution per language; this is the one-number-per-SOURCE gate a
    crawler applies before paying for the deeper screens.

    Exact: token stream is the shared whitespace split; counts and the
    integral ratio are order-free integers.

    Scale: one explode → (source, token) agg for distinct types plus a
    map-side total — the same single corpus-sized exchange shape as
    text_entropy_source; output is |sources| rows.
    """
    tok = load(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("t")
    )
    s = tok.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("t").alias("n_types"),
    )
    return s.select(
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.expr("n_types * 10000 div n_tokens").cast("bigint").alias("ttr_bp"),
    )


# ---------------------------------------------------------------------------
# Flesch-Kincaid readability grade per source
# ---------------------------------------------------------------------------

_FK_ORACLE = """
WITH d AS (
    SELECT source,
           len(string_split(text, ' ')) AS w,
           greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
           list_sum(list_transform(string_split(text, ' '),
               t -> greatest(len(regexp_extract_all(t, '[aeiouy]+')), 1)))
               AS syl
    FROM documents
), agg AS (
    SELECT source, sum(w) AS words, sum(s) AS sents, sum(syl) AS sylls,
           count(*) AS n_docs
    FROM d GROUP BY 1
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(words AS BIGINT) AS n_words,
       CAST(sents AS BIGINT) AS n_sentences,
       CAST(sylls AS BIGINT) AS n_syllables,
       round(0.39 * (CAST(words AS DOUBLE) / sents)
             + 11.8 * (CAST(sylls AS DOUBLE) / words) - 15.59, 4) + 0.0
           AS fk_grade
FROM agg
"""


@op("text_readability_fk", oracle=_FK_ORACLE, tags=("llm", "text", "stats"))
def text_readability_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade level per source from exact integer counts
    of words, sentence terminators (floored at 1 per doc), and
    vowel-group syllables — the one-number reading-difficulty screen a
    curriculum/mix designer reads next to quality scores: grade ~5-9 is
    typical prose, negative or >20 flags non-language content that
    slipped past text_quality's ratio gates (tables, code, minified
    blobs). Composes text_syllable_density's vowel-run heuristic with a
    sentence count under the same cross-engine regex discipline.

    Exact: the three counts are order-free integer sums; the FK
    polynomial is one fixed float expression over those integers,
    rounded on both engines.

    Scale: map-only regex folds inside codegen → |sources|-key agg.
    """
    toks = F.split("text", " ")
    syll = F.aggregate(
        F.transform(
            toks,
            lambda w: F.greatest(
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)), F.lit(1)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    d = load(spark, sf_dir, "documents").select(
        "source",
        F.size(toks).cast("long").alias("w"),
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)),
            F.lit(1),
        ).cast("long").alias("s"),
        syll.alias("syl"),
    )
    agg = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("w").alias("words"),
        F.sum("s").alias("sents"),
        F.sum("syl").alias("sylls"),
    )
    fk = (
        F.lit(0.39) * (F.col("words").cast("double") / F.col("sents"))
        + F.lit(11.8) * (F.col("sylls").cast("double") / F.col("words"))
        - F.lit(15.59)
    )
    return agg.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("words").cast("bigint").alias("n_words"),
        F.col("sents").cast("bigint").alias("n_sentences"),
        F.col("sylls").cast("bigint").alias("n_syllables"),
        (F.round(fk, 4) + F.lit(0.0)).alias("fk_grade"),
    )


# ---------------------------------------------------------------------------
# Word-length profile per source (morphology-level quality signal)
# ---------------------------------------------------------------------------

# band edges in characters; compared on exact integer lengths
_WLEN_SHORT_MAX = 3
_WLEN_LONG_MIN = 7

_WLEN_ORACLE = f"""
WITH w AS (
    SELECT source, len(tok) AS wl
    FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents)
    WHERE len(tok) > 0
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_words,
       round(CAST(sum(wl) AS DOUBLE) / count(*), 6) + 0.0 AS avg_word_len,
       CAST(sum(CASE WHEN wl <= {_WLEN_SHORT_MAX} THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS short_share_bp,
       CAST(sum(CASE WHEN wl >= {_WLEN_LONG_MIN} THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS long_share_bp,
       CAST(max(wl) AS BIGINT) AS max_word_len
FROM w GROUP BY source
"""


@op("text_word_length_profile", oracle=_WLEN_ORACLE, tags=("llm", "text"))
def text_word_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-length distribution per source: mean length, short-word
    (≤3 chars) and long-word (≥7 chars) shares, and the longest token —
    the morphology-level quality axis the token-count ops don't see.
    Machine-generated or boilerplate text skews short-and-uniform;
    OCR/concatenation damage shows up as absurd max_word_len; a corpus
    mixer reads these bands next to text_quality's stopword ratios to
    catch sources whose WORDS are wrong, not just their documents.
    (text_ttr_by_source profiles vocabulary REUSE; this profiles the
    shape of the words themselves — independent failure modes.)

    Exact: token lengths are integers off the same whitespace split
    every text op uses (empty tokens from runs of spaces are dropped,
    stated on both sides); band shares are integral basis points; only
    the mean divides, over exact integer sums, rounded.

    Scale: map-only explode → per-source hash agg with map-side
    partials; no joins, no windows; output is |sources| rows.
    """
    w = (
        load(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") > 0)
        .select("source", F.length("tok").alias("wl"))
    )
    return w.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_words"),
        (
            F.round(F.sum("wl").cast("double") / F.count("*"), 6) + F.lit(0.0)
        ).alias("avg_word_len"),
        F.expr(
            f"sum(CASE WHEN wl <= {_WLEN_SHORT_MAX} THEN 1 ELSE 0 END) * 10000"
            " div count(*)"
        )
        .cast("bigint")
        .alias("short_share_bp"),
        F.expr(
            f"sum(CASE WHEN wl >= {_WLEN_LONG_MIN} THEN 1 ELSE 0 END) * 10000"
            " div count(*)"
        )
        .cast("bigint")
        .alias("long_share_bp"),
        F.max("wl").cast("bigint").alias("max_word_len"),
    )


# ---------------------------------------------------------------------------
# Hapax legomenon rate per source (lexical-richness tail)
# ---------------------------------------------------------------------------

_HAPAX_ORACLE = """
WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
), c AS (
    SELECT source, t, count(*) AS cnt FROM tok GROUP BY 1, 2
)
SELECT source,
       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS hapax_share_bp
FROM c GROUP BY 1
"""


@op("text_hapax_rate", oracle=_HAPAX_ORACLE, tags=("llm", "text"))
def text_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomenon rate per source: the share of a source's vocab
    that occurs exactly ONCE — the tail-end lexical-richness signal the
    head statistics miss. text_ttr_by_source's type/token ratio and
    text_zipf_alpha's head slope both move slowly when a template
    source pads itself with unique serial numbers or when natural prose
    is diluted by boilerplate; the hapax share moves first (natural
    language sits near ~40-60% hapax vocab; machine templates collapse
    it, id-spam inflates it toward 100%), which is why Zipf-era corpus
    linguistics treats it as the standard richness tail statistic.

    Exact: the shared whitespace tokenization; counts and the integral
    basis-point share are order-free integers.

    Scale: one explode → (source, token) hash agg (the corpus-sized
    exchange, identical shape to text_ttr_by_source) → map-side
    per-source rollup of the type-grain rows; output is |sources| rows.
    """
    tok = load(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("t")
    )
    c = tok.groupBy("source", "t").agg(F.count("*").alias("cnt"))
    return c.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum((F.col("cnt") == 1).cast("int")).cast("bigint").alias("n_hapax"),
        F.expr("sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 10000 div count(*)")
        .cast("bigint")
        .alias("hapax_share_bp"),
    )


# ---------------------------------------------------------------------------
# Shared-opening template rate per source (boilerplate at position zero)
# ---------------------------------------------------------------------------

_PREFIX_TOKENS = 8  # opening-window length, stated

_PREFIX_ORACLE = f"""
WITH p AS (
    SELECT source, doc_id,
           md5(array_to_string(list_slice(string_split(text, ' '),
                                          1, {_PREFIX_TOKENS}), ' ')) AS pfx
    FROM documents
    WHERE len(string_split(text, ' ')) >= {_PREFIX_TOKENS}
), g AS (
    SELECT pfx, count(*) AS s FROM p GROUP BY 1
)
SELECT p.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT p.pfx) AS BIGINT) AS n_distinct_prefixes,
       CAST(sum(CASE WHEN g.s >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_templated,
       CAST(sum(CASE WHEN g.s >= 2 THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS templated_bp
FROM p JOIN g USING (pfx)
GROUP BY 1
"""


@op("text_prefix_template_rate", oracle=_PREFIX_ORACLE, tags=("llm", "text", "quality"))
def text_prefix_template_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-opening template rate per source: the share of documents
    whose first {k} tokens are byte-identical to some OTHER document's
    opening (corpus-wide digest groups of size ≥ 2) — boilerplate
    detection at position zero, where crawled templates actually live:
    text_boilerplate finds frequent n-grams ANYWHERE, dedup_chunk_exact
    finds shared fixed-offset chunks; this isolates the "every page
    starts with the same header" signal that inflates n-gram novelty
    for models trained on document starts. Docs shorter than {k}
    tokens are skipped, stated.

    Exact: the opening window is a deterministic token slice; digests
    are md5 over the joined slice (identical construction both
    engines); group sizes, the ≥2 membership test, and the basis-point
    share are exact integer aggregates.

    Scale: map-side slice+digest (16-byte keys shuffle, never text) →
    digest hash agg → one digest equi-join back → |sources| rollup —
    the dedup_exact shuffle posture.
    """
    p = (
        load(spark, sf_dir, "documents")
        .select(
            "source",
            "doc_id",
            F.split("text", " ").alias("toks"),
        )
        .filter(F.size("toks") >= _PREFIX_TOKENS)
        .select(
            "source",
            "doc_id",
            F.md5(
                F.array_join(F.slice("toks", 1, _PREFIX_TOKENS), " ")
            ).alias("pfx"),
        )
    )
    g = p.groupBy("pfx").agg(F.count("*").alias("s"))
    j = p.join(g, "pfx")
    out = j.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("pfx").alias("n_distinct_prefixes"),
        F.sum(F.when(F.col("s") >= 2, 1).otherwise(0)).alias("n_templated"),
    )
    return out.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_distinct_prefixes").cast("bigint").alias("n_distinct_prefixes"),
        F.col("n_templated").cast("bigint").alias("n_templated"),
        F.expr("n_templated * 10000 div n_docs")
        .cast("bigint")
        .alias("templated_bp"),
    )


# ---------------------------------------------------------------------------
# Conditional next-token entropy rate per source (round 13)
# ---------------------------------------------------------------------------

_ENT_GRID = 1 << 20  # c*log2(c) quantization grid: order-free integer sums

_NGRAM_RATE_ORACLE = f"""
WITH toks AS (
    SELECT source, doc_id, string_split(text, ' ') AS t FROM documents
), uni AS (
    SELECT source, t[i] AS w
    FROM (SELECT source, t, unnest(generate_series(1, len(t))) AS i FROM toks)
), bg AS (
    SELECT source, t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT source, t, unnest(generate_series(1, len(t) - 1)) AS i
          FROM toks)
), h1 AS (
    SELECT source,
           sum(c) AS n_uni,
           count(*) AS n_types,
           log2(CAST(CAST(sum(c) AS BIGINT) AS DOUBLE))
             - (CAST(CAST(sum(CAST(floor(CAST(c AS DOUBLE)
                    * log2(CAST(c AS DOUBLE)) * {_ENT_GRID} + 0.5) AS BIGINT))
                  AS BIGINT) AS DOUBLE) / {_ENT_GRID})
               / CAST(sum(c) AS BIGINT) AS h_uni
    FROM (SELECT source, w, count(*) AS c FROM uni GROUP BY 1, 2)
    GROUP BY source
), h2 AS (
    SELECT source,
           sum(c) AS n_big,
           count(*) AS n_bigram_types,
           log2(CAST(CAST(sum(c) AS BIGINT) AS DOUBLE))
             - (CAST(CAST(sum(CAST(floor(CAST(c AS DOUBLE)
                    * log2(CAST(c AS DOUBLE)) * {_ENT_GRID} + 0.5) AS BIGINT))
                  AS BIGINT) AS DOUBLE) / {_ENT_GRID})
               / CAST(sum(c) AS BIGINT) AS h_big
    FROM (SELECT source, w1, w2, count(*) AS c FROM bg GROUP BY 1, 2, 3)
    GROUP BY source
)
SELECT h1.source AS source,
       CAST(h1.n_uni AS BIGINT) AS n_tokens,
       CAST(h1.n_types AS BIGINT) AS n_types,
       CAST(h2.n_bigram_types AS BIGINT) AS n_bigram_types,
       round(h1.h_uni, 6) + 0.0 AS h_unigram_bits,
       round(h2.h_big, 6) + 0.0 AS h_bigram_bits,
       round(h2.h_big - h1.h_uni, 6) + 0.0 AS entropy_rate_bits
FROM h1 JOIN h2 ON h1.source = h2.source
"""


@op(
    "text_ngram_entropy_rate",
    oracle=_NGRAM_RATE_ORACLE,
    tags=("llm", "text", "corpus"),
)
def text_ngram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional next-token entropy rate per source: H(bigram) −
    H(unigram) ≈ H(next | current) — how many bits the NEXT token
    carries once you know the current one. text_entropy_source grades
    the static token distribution; this grades the SEQUENCE: templated
    or boilerplate-heavy sources collapse the conditional entropy
    (every token determines its successor) long before the unigram
    entropy moves — the cheap sequence-health companion to
    text_perplexity_proxy, with no model needed.

    Exact: both entropies use the sufficient-statistics identity
    H = log2(N) − Σ c·log2 c / N over exact integer counts (the
    text_entropy_source discipline); the rate is their difference.

    Scale: one explode for unigrams, one per-doc lead-free slice for
    bigrams; two (source, gram) hash aggs with map-side partials —
    the same shape every corpus pipeline already pays for token
    counting. Output is |sources| rows.
    """
    toks = load(spark, sf_dir, "documents").select(
        "source", "doc_id", F.split("text", " ").alias("t")
    )
    uni = toks.select("source", F.explode("t").alias("w"))
    bg = toks.select(
        "source",
        F.posexplode(F.expr("slice(t, 1, size(t) - 1)")).alias("pos", "w1"),
        F.col("t"),
    ).select(
        "source",
        F.concat_ws(" ", F.col("w1"), F.expr("t[pos + 1]")).alias("w12"),
    )

    def ent(counts, gram):
        # Each cell's c*log2(c) is quantized to the _ENT_GRID integer
        # lattice BEFORE summing, so the per-source sum is an exact
        # integer fold — identical under any aggregation order on either
        # engine (ADVICE r13: the raw float sum was the one
        # order-nondeterministic cell fold left in the repo). Grid error
        # on H is ≤ 0.5/_ENT_GRID ≈ 4.8e-7 < the 1e-6 output round;
        # the decimal(38,0) sum holds N·log2(N)·2^20 for any per-source
        # token mass below ~2e11 (documented bound).
        n = F.sum("c")
        qt = F.floor(
            F.col("c").cast("double")
            * F.log2(F.col("c").cast("double"))
            * F.lit(float(_ENT_GRID))
            + F.lit(0.5)
        ).cast("decimal(38,0)")
        return counts.groupBy("source").agg(
            n.cast("bigint").alias(f"n_{gram}"),
            F.count("*").cast("bigint").alias(f"n_{gram}_types"),
            (
                F.log2(n.cast("bigint").cast("double"))
                - (F.sum(qt).cast("double") / F.lit(float(_ENT_GRID)))
                / n.cast("bigint")
            ).alias(f"h_{gram}"),
        )

    h1 = ent(uni.groupBy("source", "w").agg(F.count("*").alias("c")), "uni")
    h2 = ent(bg.groupBy("source", "w12").agg(F.count("*").alias("c")), "big")
    return h1.join(h2, "source").select(
        "source",
        F.col("n_uni").alias("n_tokens"),
        F.col("n_uni_types").alias("n_types"),
        F.col("n_big_types").alias("n_bigram_types"),
        (F.round("h_uni", 6) + F.lit(0.0)).alias("h_unigram_bits"),
        (F.round("h_big", 6) + F.lit(0.0)).alias("h_bigram_bits"),
        (F.round(F.col("h_big") - F.col("h_uni"), 6) + F.lit(0.0)).alias(
            "entropy_rate_bits"
        ),
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth exponent per source (round 13)
# ---------------------------------------------------------------------------

_HEAPS_LEVELS = 8

_HEAPS_ORACLE = f"""
WITH d AS (
    SELECT source, doc_id, string_split(text, ' ') AS t,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               * {_HEAPS_LEVELS} // 4294967296 AS lvl
    FROM documents
), tok AS (
    SELECT source, lvl, t[i] AS w, len(t) AS n_toks
    FROM (SELECT source, lvl, t, unnest(generate_series(1, len(t))) AS i FROM d)
), toklvl AS (
    SELECT source, lvl, sum(n) AS toks_at
    FROM (SELECT source, lvl, doc_id, len(t) AS n FROM d) GROUP BY 1, 2
), wmin AS (
    SELECT source, w, min(lvl) AS mlvl FROM tok GROUP BY 1, 2
), pts AS (
    SELECT t.source, t.lvl,
           sum(t.toks_at) OVER (PARTITION BY t.source ORDER BY t.lvl) AS n_toks,
           sum(coalesce(l.v, 0)) OVER (PARTITION BY t.source ORDER BY t.lvl)
               AS n_vocab
    FROM toklvl t
    LEFT JOIN (SELECT source, mlvl AS lvl, count(*) AS v
          FROM wmin GROUP BY 1, 2) l USING (source, lvl)
), fold AS (
    SELECT source, count(*) AS n_levels,
           list_sort(list([CAST(n_toks AS DOUBLE),
                           CAST(n_vocab AS DOUBLE)])) AS l
    FROM pts WHERE n_toks > 0 GROUP BY source
), ols AS (
    SELECT source, n_levels,
           list_reduce(list_prepend([0.0, 0.0, 0.0, 0.0, 0.0],
               list_transform(l, p -> [1.0, ln(p[1]), ln(p[2]),
                                       ln(p[1]) * ln(p[2]),
                                       ln(p[1]) * ln(p[1])])),
               (a, p) -> [a[1] + p[1], a[2] + p[2], a[3] + p[3],
                          a[4] + p[4], a[5] + p[5]]) AS s
    FROM fold
)
SELECT source,
       CAST(n_levels AS BIGINT) AS n_levels,
       round((s[1] * s[4] - s[2] * s[3])
             / nullif(s[1] * s[5] - s[2] * s[2], 0.0), 6) + 0.0
           AS heaps_beta
FROM ols WHERE n_levels >= 2
"""


@op("text_vocab_growth_heaps", oracle=_HEAPS_ORACLE, tags=("llm", "text", "scale"))
def text_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth exponent β per source (V ≈ K·nᵝ):
    how fast NEW types appear as the corpus grows — natural prose sits
    near β ≈ 0.5; β → 0 flags a closed vocabulary (templates, logs,
    generated spam), β → 1 flags unbounded token churn (IDs,
    hashes, OCR noise). The growth-curve companion to text_zipf_alpha
    (the static rank law) and text_hapax_rate (one point of this
    curve).

    The distributed trick: instead of re-scanning per corpus prefix,
    each doc gets a deterministic md5 LEVEL in 0..7 (nested subsets:
    level ≤ L is a uniform ~((L+1)/8) sample); a token's vocabulary
    entry time is its MINIMUM doc level — so ONE (source, token)
    aggregation yields the full 8-point growth curve (cumulative
    vocab = tokens with min-level ≤ L, cumulative size = token mass at
    levels ≤ L), and β is the log-log OLS slope folded over ≤8 sorted
    points. No prefix windows, no repeated scans.

    Scale: one explode + one (source, token) hash agg (the token-count
    pass again) + |sources|·8 bookkeeping rows. Output is |sources|
    rows.
    """
    d = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.split("text", " ").alias("t"),
        F.expr(
            f"CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
            f" AS BIGINT) * {_HEAPS_LEVELS} div 4294967296"
        ).alias("lvl"),
    )
    tok = d.select("source", "lvl", F.explode("t").alias("w"))
    toklvl = d.groupBy("source", "lvl").agg(F.sum(F.size("t")).alias("toks_at"))
    wmin = tok.groupBy("source", "w").agg(F.min("lvl").alias("mlvl"))
    vat = wmin.groupBy("source", F.col("mlvl").alias("lvl")).agg(
        F.count("*").alias("v")
    )
    wl = dim_window(
        Window.partitionBy("source").orderBy("lvl").rowsBetween(
            Window.unboundedPreceding, 0
        ),
        bound=f"{_HEAPS_LEVELS} level rows per source",
    )
    pts = (
        toklvl.join(vat, ["source", "lvl"], "left")
        .select(
            "source",
            "lvl",
            F.sum("toks_at").over(wl).alias("n_toks"),
            F.sum(F.coalesce(F.col("v"), F.lit(0))).over(wl).alias("n_vocab"),
        )
        .filter(F.col("n_toks") > 0)
    )
    fold = pts.groupBy("source").agg(
        F.count("*").alias("n_levels"),
        bounded_series(
            F.array_sort(
                F.collect_list(
                    F.array(
                        F.col("n_toks").cast("double"),
                        F.col("n_vocab").cast("double"),
                    )
                )
            ),
            what="text_vocab_growth_heaps level points",
        ).alias("l"),
    )
    s = F.expr(
        "aggregate(l, array(0.0D, 0.0D, 0.0D, 0.0D, 0.0D),"
        " (a, p) -> array(a[0] + 1.0D, a[1] + ln(p[0]), a[2] + ln(p[1]),"
        "  a[3] + ln(p[0]) * ln(p[1]), a[4] + ln(p[0]) * ln(p[0])))"
    )
    f = fold.select("source", "n_levels", s.alias("s")).filter(
        F.col("n_levels") >= 2
    )
    return f.select(
        "source",
        F.col("n_levels").cast("bigint").alias("n_levels"),
        (
            F.round(
                (F.col("s")[0] * F.col("s")[3] - F.col("s")[1] * F.col("s")[2])
                / F.nullif(
                    F.col("s")[0] * F.col("s")[4] - F.col("s")[1] * F.col("s")[1],
                    F.lit(0.0),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("heaps_beta"),
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rule battery per source (round 14)
# ---------------------------------------------------------------------------

# The required-marker set is fixture-appropriate (the synthetic vocabulary
# carries "the"/"a"/no punctuation); production swaps in the Gopher
# paper's {the, be, to, of, and, that, have, with} verbatim.
_GOPHER_STOPS = ("the", "a", "of", "to", "and")

_GOPHER_ORACLE = f"""
WITH d AS (
    SELECT doc_id, source, string_split(text, ' ') AS t,
           len(replace(text, ' ', '')) AS sum_chars
    FROM documents
), tok AS (
    SELECT doc_id, t[i] AS w
    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM d)
), md AS (
    SELECT doc_id, max(c) AS max_c
    FROM (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2)
    GROUP BY doc_id
), sig AS (
    SELECT d.source,
           len(d.t) AS n_tok,
           d.sum_chars,
           m.max_c,
           len(list_intersect(list_distinct(d.t),
               ['{"','".join(_GOPHER_STOPS)}'])) AS n_stopdis,
           len(list_filter(d.t, x -> len(x) <= 2)) AS n_short
    FROM d JOIN md m USING (doc_id)
), gates AS (
    SELECT source,
           CASE WHEN 3 * n_tok <= sum_chars AND sum_chars <= 10 * n_tok
                THEN 1 ELSE 0 END AS ok_wordlen,
           CASE WHEN max_c * 5 <= n_tok THEN 1 ELSE 0 END AS ok_topword,
           CASE WHEN n_stopdis >= 2 THEN 1 ELSE 0 END AS ok_stopword,
           CASE WHEN n_short * 10 <= n_tok * 3 THEN 1 ELSE 0 END AS ok_short
    FROM sig
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(1 - ok_wordlen) AS BIGINT) AS fail_word_length,
       CAST(sum(1 - ok_topword) AS BIGINT) AS fail_top_word_mass,
       CAST(sum(1 - ok_stopword) AS BIGINT) AS fail_stopword_markers,
       CAST(sum(1 - ok_short) AS BIGINT) AS fail_short_word_ratio,
       CAST(sum(ok_wordlen * ok_topword * ok_stopword * ok_short)
            AS BIGINT) AS n_pass,
       CAST(sum(ok_wordlen * ok_topword * ok_stopword * ok_short) * 10000
            // count(*) AS BIGINT) AS pass_bp
FROM gates
GROUP BY source
"""


@op("text_gopher_rules", oracle=_GOPHER_ORACLE, tags=("llm", "text", "quality"))
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style (Rae et al. 2021, table A1) quality rule battery,
    counted INDEPENDENTLY per rule per source — the threshold-tuning
    view a corpus owner reads before wiring rules into a cascade
    (corpus_quality_gate is the assembled first-fail cascade of a
    DIFFERENT rule set; this op answers "which rule would remove how
    much, per source" with no rule shadowing another):

    - word-length band: mean token length in [3, 10] chars, as integer
      cross-multiplication 3·n_tok ≤ Σchars ≤ 10·n_tok;
    - top-word dominance: most frequent token carries ≤ 20 % of the
      doc's tokens (max_c·5 ≤ n_tok) — templated/spam screen;
    - required markers: ≥ 2 DISTINCT tokens from the stop-marker set —
      the "reads like prose" floor;
    - short-word ratio: tokens of ≤ 2 chars are ≤ 30 % of the doc.

    Exact: every gate is integer arithmetic over exact token counts —
    no floats anywhere until the final pass_bp integral division.

    Scale: one scan + one (doc, token) hash agg for the per-doc mode
    (map-side combine; the token-count pass every pipeline already
    pays) + per-doc HOF projections fused into the scan; output is
    |sources| rows.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.split("text", " ").alias("t"),
        F.length(F.regexp_replace("text", " ", "")).alias("sum_chars"),
    )
    tok = d.select("doc_id", F.explode("t").alias("w"))
    md = (
        tok.groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_c"))
    )
    stops = F.array(*[F.lit(s) for s in _GOPHER_STOPS])
    sig = d.join(md, "doc_id").select(
        "source",
        F.size("t").alias("n_tok"),
        "sum_chars",
        "max_c",
        F.size(F.array_intersect(F.array_distinct("t"), stops)).alias(
            "n_stopdis"
        ),
        F.size(F.filter("t", lambda x: F.length(x) <= 2)).alias("n_short"),
    )
    g = sig.select(
        "source",
        F.when(
            (3 * F.col("n_tok") <= F.col("sum_chars"))
            & (F.col("sum_chars") <= 10 * F.col("n_tok")),
            1,
        )
        .otherwise(0)
        .alias("ok_wordlen"),
        F.when(F.col("max_c") * 5 <= F.col("n_tok"), 1).otherwise(0).alias(
            "ok_topword"
        ),
        F.when(F.col("n_stopdis") >= 2, 1).otherwise(0).alias("ok_stopword"),
        F.when(F.col("n_short") * 10 <= F.col("n_tok") * 3, 1)
        .otherwise(0)
        .alias("ok_short"),
    )
    allok = (
        F.col("ok_wordlen")
        * F.col("ok_topword")
        * F.col("ok_stopword")
        * F.col("ok_short")
    )
    return g.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(1 - F.col("ok_wordlen")).cast("bigint").alias("fail_word_length"),
        F.sum(1 - F.col("ok_topword")).cast("bigint").alias("fail_top_word_mass"),
        F.sum(1 - F.col("ok_stopword"))
        .cast("bigint")
        .alias("fail_stopword_markers"),
        F.sum(1 - F.col("ok_short")).cast("bigint").alias("fail_short_word_ratio"),
        F.sum(allok).cast("bigint").alias("n_pass"),
        F.expr(
            "CAST(sum(ok_wordlen * ok_topword * ok_stopword * ok_short) * 10000"
            " div count(*) AS BIGINT)"
        ).alias("pass_bp"),
    )


# ---------------------------------------------------------------------------
# Chao1 vocabulary richness + Good-Turing coverage per source (round 14)
# ---------------------------------------------------------------------------

_CHAO1_ORACLE = """
WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
), c AS (
    SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2
), s AS (
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
    FROM c GROUP BY source
)
SELECT source,
       n_tokens,
       n_types,
       f1 AS f1_hapax,
       f2 AS f2_doubleton,
       round(n_types + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 4) + 0.0
           AS chao1_types,
       CAST((n_tokens - f1) * 10000 // n_tokens AS BIGINT) AS coverage_bp
FROM s
"""


@op("text_vocab_chao1", oracle=_CHAO1_ORACLE, tags=("llm", "text", "stats"))
def text_vocab_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 vocabulary-richness estimate + Good-Turing coverage per
    source — "how many distinct types does this source REALLY have,
    and what fraction of its token mass comes from types we've already
    seen?" The unseen-species answer tokenizer-vocabulary planning
    needs BEFORE scaling a crawl: Chao1 (bias-corrected,
    V + f1·(f1−1)/(2·(f2+1))) lower-bounds the true type count from
    the observed hapax/doubleton profile, and the Good–Turing coverage
    1 − f1/N says how much of the next shard will be novel.
    stats_capture_recapture estimates the same population with a
    two-half Chapman design; this is the abundance-profile route (one
    pass, no split), and text_vocab_growth_heaps is the growth-CURVE
    view of the same question.

    Exact: f1/f2/V/N are exact integers from one hash agg; chao1 is
    one fixed float expression over them (integer product f1·(f1−1)
    stays exact; the ÷(2.0·(f2+1)) promotes once), coverage is an
    integral basis-point division.

    Scale: one explode + one (source, token) hash agg with map-side
    combine — the token-count pass again; |sources| output rows.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    c = tok.groupBy("source", "w").agg(F.count("*").alias("c"))
    s = c.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("f2"),
    )
    return s.select(
        "source",
        "n_tokens",
        "n_types",
        F.col("f1").alias("f1_hapax"),
        F.col("f2").alias("f2_doubleton"),
        (
            F.round(
                F.col("n_types")
                + F.col("f1") * (F.col("f1") - 1) / (2.0 * (F.col("f2") + 1)),
                4,
            )
            + F.lit(0.0)
        ).alias("chao1_types"),
        F.expr("CAST((n_tokens - f1) * 10000 div n_tokens AS BIGINT)").alias(
            "coverage_bp"
        ),
    )
