"""Corpus-preparation tier 2 — the stages downstream of chunking/dedup
that assemble model-ready training data: sequence packing, PII scrubbing,
cross-document boilerplate detection, and label-level embedding pooling.

Like llm/corpus.py, these extend the engine past the reference's single
geo dataflow (/root/reference/regionSpout.go:57-124) with the operations a
100 TB training-data pipeline actually runs. Scale posture:

- Per-doc work is codegen'd JVM expressions (regexp, array slices) — no
  Python anywhere.
- Cross-doc state is either a running sum within a stratum (packing), a
  tiny broadcastable dim (the top-K boilerplate set), or a bounded
  (label × dim) aggregate (pooling) — never corpus².
- Synthetic PII is injected deterministically from ``doc_id`` on BOTH
  sides so the scrubbing machinery is oracle-verified end-to-end (the
  fixture corpus is a clean word soup with nothing to redact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connor_fun_streamproducer_spark.catalog import dim_window, load
from connor_fun_streamproducer_spark.registry import op

# Token budget of one packed training sequence.
PACK_BUDGET = 256

# Java-regex ∩ RE2 subset so Spark and DuckDB compile the same automaton.
_EMAIL_RE = r"[a-z0-9]+@[a-z]+\.[a-z]+"
_NUM_RE = r"[0-9]{3,}"

# Corpus-wide most-frequent-n-gram count treated as boilerplate.
NGRAM = 5
TOP_BOILERPLATE = 20


def _toks() -> F.Column:
    return F.split("text", " ")


@op(
    "corpus_pack",
    oracle=f"""
    WITH t AS (
        SELECT lang, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), c AS (
        SELECT lang, doc_id, n_tokens,
               sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS start_cum
        FROM t
    )
    SELECT lang, doc_id, n_tokens,
           CAST(floor(start_cum / {PACK_BUDGET}.0) AS BIGINT) AS pack_id,
           CAST(start_cum % {PACK_BUDGET} AS BIGINT)          AS pack_off
    FROM c
    """,
    tags=("llm", "corpus"),
)
def corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (concat-then-split, budget 256).

    Documents are concatenated in stable ``doc_id`` order within each
    language stratum and split at fixed 256-token boundaries — each doc
    gets the pack it STARTS in and its offset there, the bookkeeping a
    packed-pretraining loader needs (docs may span a boundary; the loader
    reads on into pack_id+1, standard GPT-style packing). The kernel is a
    running sum over (lang) ORDER BY doc_id. At 100 TB a per-stratum
    window serializes each stratum through one task; the scale path is the
    classic two-pass distributed prefix sum — per-range-partition token
    subtotals (tiny) collected and cumulated once, then added back
    map-side — which this op's partition-by-stratum layout already
    enables without changing the contract.
    """
    d = load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.size(_toks()).cast("bigint")
    start_cum = (F.sum(n).over(w) - n).alias("start_cum")
    return d.select("lang", "doc_id", n.alias("n_tokens"), start_cum).select(
        "lang",
        "doc_id",
        "n_tokens",
        F.floor(F.col("start_cum") / PACK_BUDGET).cast("bigint").alias("pack_id"),
        (F.col("start_cum") % PACK_BUDGET).cast("bigint").alias("pack_off"),
    )


@op(
    "text_pii_scrub",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               substring(text, 1, 40) || ' contact user' || lpad(CAST(doc_id AS VARCHAR), 6, '0')
                   || '@example.com ref ' || CAST(doc_id * 7919 AS VARCHAR) || ' end'
                   AS synth
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(synth, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(
                    regexp_replace(synth, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                    '{_NUM_RE}')) AS INTEGER) AS n_numbers,
           regexp_replace(regexp_replace(synth, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_NUM_RE}', '<NUM>', 'g') AS scrubbed
    FROM s
    """,
    tags=("llm", "corpus", "quality"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: emails then long digit runs → typed tags.

    The standard pre-training scrub (emails, phone-ish numbers, IDs).
    The fixture corpus is clean word soup, so each row deterministically
    injects an email + numeric ref derived from ``doc_id`` — identically
    in the oracle — making the redaction machinery itself the thing
    verified: extraction counts before/after, and the scrubbed text
    byte-for-byte. Order matters (emails first, or their digit runs decay
    into ``<NUM>`` fragments); both engines apply the same two-stage
    rewrite. Patterns stay in the Java-regex ∩ RE2 subset. Map-only
    codegen'd regexps: at 100 TB this fuses into the scan with zero
    shuffles, the cheapest possible full-corpus pass.
    """
    d = load(spark, sf_dir, "documents")
    synth = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact user"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0"),
        F.lit("@example.com ref "),
        (F.col("doc_id") * 7919).cast("string"),
        F.lit(" end"),
    )
    no_email = F.regexp_replace(synth, _EMAIL_RE, "<EMAIL>")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(synth, F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(_NUM_RE), 0)).alias("n_numbers"),
        F.regexp_replace(no_email, _NUM_RE, "<NUM>").alias("scrubbed"),
    )


@op(
    "text_boilerplate",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents
        WHERE len(string_split(text, ' ')) >= {NGRAM}
    ), g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - {NGRAM - 2}),
                      i -> array_to_string(list_slice(toks, i, i + {NGRAM - 1}), ' ')))
                   AS gram
        FROM t
    ), freq AS (
        SELECT gram, count(*) AS c FROM g GROUP BY 1
    ), top AS (
        SELECT gram FROM freq ORDER BY c DESC, gram LIMIT {TOP_BOILERPLATE}
    ), hits AS (
        SELECT g.doc_id, count(*) AS n_boiler
        FROM g JOIN top USING (gram) GROUP BY 1
    )
    SELECT t.doc_id,
           CAST(len(t.toks) - {NGRAM - 1} AS BIGINT) AS n_grams,
           CAST(coalesce(hits.n_boiler, 0) AS BIGINT) AS n_boiler
    FROM t LEFT JOIN hits USING (doc_id)
    """,
    tags=("llm", "corpus", "quality"),
)
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection (C4-style frequent-n-gram hit
    count).

    The corpus-wide top-20 most frequent 5-grams are the boilerplate set
    (headers, footers, licence lines in real crawls); each document
    reports how many of its 5-gram positions hit that set. Two passes:
    (1) per-doc 5-grams from one JVM slice expression → hash-aggregated
    counts (map-side partial, key space ≤ corpus token count); (2) the
    top-K set — K rows total, broadcast — joined back per-doc. The
    deterministic (count DESC, gram) tie-break keeps the top-K stable
    across engines. At 100 TB: one agg shuffle + a broadcast join; the
    per-doc n-gram expansion never leaves its scan partition.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", _toks().alias("toks"))
    d = d.filter(F.size("toks") >= NGRAM)
    grams = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (NGRAM - 1)),
                lambda i: F.array_join(F.slice("toks", i, NGRAM), " "),
            )
        ).alias("gram"),
    )
    top = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("gram"))
        .limit(TOP_BOILERPLATE)
        .select("gram")
    )
    hits = (
        grams.join(F.broadcast(top), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_boiler"))
    )
    return (
        d.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            (F.size("toks") - (NGRAM - 1)).cast("bigint").alias("n_grams"),
            F.coalesce("n_boiler", F.lit(0)).cast("bigint").alias("n_boiler"),
        )
    )


@op(
    "text_normalize",
    oracle="""
    WITH noisy AS (
        SELECT doc_id,
               upper(substring(text, 1, 30)) || '  ,, !! ' ||
               substring(text, 31, 60) || '   #' ||
               CAST(doc_id AS VARCHAR) || '#' AS raw
        FROM documents
    ), norm AS (
        SELECT doc_id, raw,
               trim(regexp_replace(
                   regexp_replace(lower(raw), '[^a-z0-9 ]', '', 'g'),
                   '  +', ' ', 'g')) AS norm
        FROM noisy
    )
    SELECT doc_id, norm,
           CAST(len(raw) - len(norm) AS BIGINT)           AS n_removed,
           CAST(len(string_split(norm, ' ')) AS BIGINT)   AS n_tokens
    FROM norm
    """,
    tags=("llm", "corpus", "quality"),
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization pass: casefold, strip punctuation, collapse runs.

    The first stage of every text pipeline (and the precondition of
    shingle-based dedup — llm/dedup.py assumes canonical tokens). The
    fixture corpus is already clean, so each row deterministically
    injects uppercase, punctuation runs, and a doc_id-derived marker on
    BOTH sides; the normalizer (lower -> drop non-[a-z0-9 ] -> collapse
    blanks -> trim) is then verified byte-for-byte, plus the removed-char
    and token counts a quality gate would threshold on. Three codegen'd
    regexp rewrites, map-only: at 100 TB this fuses into the scan with
    zero shuffles, same posture as text_pii_scrub.
    """
    d = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.upper(F.substring("text", 1, 30)),
        F.lit("  ,, !! "),
        F.substring("text", 31, 60),
        F.lit("   #"),
        F.col("doc_id").cast("string"),
        F.lit("#"),
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(raw), r"[^a-z0-9 ]", ""), "  +", " "
        )
    )
    return d.select(
        "doc_id",
        norm.alias("norm"),
        (F.length(raw) - F.length(norm)).cast("bigint").alias("n_removed"),
        F.size(F.split(norm, " ")).cast("bigint").alias("n_tokens"),
    )


EMB_DIM = 64  # fixture embedding width (TESTDATA.md)


@op(
    "embedding_pool",
    oracle=f"""
    WITH comp AS (
        SELECT label, idx.i AS pos, avg(embedding[idx.i + 1]) AS av
        FROM embeddings, (SELECT unnest(range(0, {EMB_DIM})) AS i) idx
        GROUP BY 1, 2
    ), n AS (
        SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY 1
    )
    SELECT comp.label,
           CAST(n.n_vecs AS BIGINT) AS n_vecs,
           round(sqrt(sum(comp.av * comp.av)), 4) AS centroid_norm,
           round(sum(comp.av), 4)                 AS centroid_sum
    FROM comp JOIN n USING (label)
    GROUP BY comp.label, n.n_vecs
    """,
    tags=("llm", "embedding"),
)
def embedding_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-level mean-pooling of embeddings (class centroids).

    The building block of centroid-based clustering / classification and
    of the IVF coarse quantizer (llm/similarity.py builds its codebook
    from exactly this shape): per-(label, dimension) mean, then scalar
    centroid features (L2 norm, component sum) so the result is
    hash-comparable (float arrays don't canonicalize across engines;
    scalars with round(4) do). posexplode fans each vector into 64
    (label, pos, value) rows — partial aggregation combines map-side, so
    the exchange carries |labels| × 64 partial sums, not corpus × 64
    rows. At 100 TB this is one scan + one tiny shuffle; the centroids
    frame (|labels| rows) then broadcasts into whatever consumes it.
    """
    e = load(spark, sf_dir, "embeddings")
    comp = (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("av"), F.count("v").alias("cnt"))
    )
    return (
        comp.groupBy("label")
        .agg(
            F.max("cnt").cast("bigint").alias("n_vecs"),
            F.round(F.sqrt(F.sum(F.col("av") * F.col("av"))), 4).alias("centroid_norm"),
            F.round(F.sum("av"), 4).alias("centroid_sum"),
        )
    )


NGRAM_W = 8          # decontamination n-gram width (word-level)
EVAL_SET_MAX_ID = 20  # fixture stand-in: docs 0..19 are "the benchmark"


@op(
    "corpus_decontaminate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - {NGRAM_W - 2}),
                                     i -> array_to_string(t[i:i+{NGRAM_W - 1}], ' '))) AS g
        FROM toks
    ), eval_g AS (
        SELECT DISTINCT g FROM grams WHERE doc_id < {EVAL_SET_MAX_ID}
    ), corpus_g AS (
        SELECT DISTINCT doc_id, g FROM grams WHERE doc_id >= {EVAL_SET_MAX_ID}
    )
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM corpus_g c JOIN eval_g e ON c.g = e.g
    GROUP BY c.doc_id
    """,
    tags=("llm", "corpus", "dedup"),
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word
    {NGRAM_W}-gram with the eval set (docs 0..19 stand in for a held-out
    benchmark) and count the distinct shared grams per doc.

    The standard training-data hygiene pass (the n-gram-overlap check
    used to scrub eval contamination from pretraining corpora), distinct
    from the self-dedup tier: containment against a FIXED small set, not
    corpus×corpus similarity. Plan shape for 100 TB: the eval side's
    distinct gram set is benchmark-sized (broadcastable however big the
    corpus grows), so the probe is a broadcast semi-ish join over the
    exploded corpus grams — map-side fanout of ~|tokens| rows per doc,
    one (doc_id) exchange for the final count, no corpus×corpus pairing
    anywhere. Docs shorter than {NGRAM_W} tokens produce no grams (empty
    array guard — Spark's sequence() would otherwise run DESCENDING for
    negative spans and fabricate grams).
    """
    d = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    grams_expr = F.when(
        F.size(t) >= NGRAM_W,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (NGRAM_W - 1)),
            lambda i: F.array_join(F.slice(t, i, NGRAM_W), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = d.select("doc_id", F.explode(grams_expr).alias("g"))
    eval_g = grams.filter(F.col("doc_id") < EVAL_SET_MAX_ID).select("g").distinct()
    corpus_g = grams.filter(F.col("doc_id") >= EVAL_SET_MAX_ID).distinct()
    return (
        corpus_g.join(F.broadcast(eval_g), "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )


# Filter-cascade thresholds (integer cross-multiplied in the gate, so the
# ratios never exist as doubles): min/max whitespace tokens, min
# type-token ratio 0.3, min stopword share 5%.
_GATE_MIN_TOKENS = 20
_GATE_MAX_TOKENS = 2000
_GATE_STOPWORDS = ("the", "a", "of", "and", "in", "to")

_GATE_ORACLE = f"""
WITH sig AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_dis,
           CAST(len(list_filter(string_split(text, ' '),
                t -> t IN ('the', 'a', 'of', 'and', 'in', 'to'))) AS BIGINT) AS n_stop
    FROM documents
)
SELECT doc_id,
       CASE WHEN n_tok < {_GATE_MIN_TOKENS} THEN 'too_short'
            WHEN n_tok > {_GATE_MAX_TOKENS} THEN 'too_long'
            WHEN n_dis * 10 < n_tok * 3 THEN 'repetitive'
            WHEN n_stop * 100 < n_tok * 5 THEN 'no_stopwords'
            ELSE 'pass' END AS reason,
       (n_tok >= {_GATE_MIN_TOKENS} AND n_tok <= {_GATE_MAX_TOKENS}
        AND n_dis * 10 >= n_tok * 3 AND n_stop * 100 >= n_tok * 5) AS keep
FROM sig
"""


@op(
    "corpus_quality_gate",
    oracle=_GATE_ORACLE,
    tags=("llm", "corpus", "filter"),
)
def corpus_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style filter cascade: every document gets a keep/drop decision
    plus the FIRST failing rule — (doc_id, reason, keep) with reason in
    {too_short, too_long, repetitive, no_stopwords, pass}.

    This is the assembled form of the individual signals (`text_tokens`,
    `text_quality`, `text_repetition`): real corpus pipelines ship ONE
    gate whose audit trail says which rule dropped each document —
    per-rule drop counts are the first thing reviewed after every
    threshold change.

    Determinism: every comparison is integer cross-multiplication over
    exact token counts (n_distinct·10 ≥ n_tokens·3 instead of a
    type-token-ratio double ≥ 0.3), so the keep decision cannot drift
    between engines. 100 TB shape: pure map-side projection — the gate
    fuses into the scan, adds zero shuffles, and the keep column
    becomes a partition/filter key for everything downstream.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("bigint")
    n_dis = F.size(F.array_distinct(toks)).cast("bigint")
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(list(_GATE_STOPWORDS)))
    ).cast("bigint")
    sig = d.select(
        "doc_id", n_tok.alias("n_tok"), n_dis.alias("n_dis"), n_stop.alias("n_stop")
    )
    reason = (
        F.when(F.col("n_tok") < _GATE_MIN_TOKENS, F.lit("too_short"))
        .when(F.col("n_tok") > _GATE_MAX_TOKENS, F.lit("too_long"))
        .when(F.col("n_dis") * 10 < F.col("n_tok") * 3, F.lit("repetitive"))
        .when(F.col("n_stop") * 100 < F.col("n_tok") * 5, F.lit("no_stopwords"))
        .otherwise(F.lit("pass"))
    )
    keep = (
        (F.col("n_tok") >= _GATE_MIN_TOKENS)
        & (F.col("n_tok") <= _GATE_MAX_TOKENS)
        & (F.col("n_dis") * 10 >= F.col("n_tok") * 3)
        & (F.col("n_stop") * 100 >= F.col("n_tok") * 5)
    )
    return sig.select("doc_id", reason.alias("reason"), keep.alias("keep"))


# ---------------------------------------------------------------------------
# Survivorship dedup pipeline (quality -> exact -> chunk-share cascade)
# ---------------------------------------------------------------------------

# Tier thresholds chosen against the fixture's distributions so every tier
# demonstrably fires: short < 100 chars drops ~7%, chunk-share >= 6000 bp
# (p90 of the CDC dup-share) drops ~10% of what survives the exact tier.
_PIPE_MIN_CHARS = 100
_PIPE_CHUNK_BP = 6000
_PIPE_CDC_MOD = 16

_PIPE_ORACLE = f"""
WITH docs AS (SELECT doc_id, text, n_chars FROM documents),
short AS (SELECT doc_id FROM docs WHERE n_chars < {_PIPE_MIN_CHARS}),
surv1 AS (SELECT * FROM docs WHERE n_chars >= {_PIPE_MIN_CHARS}),
ex AS (
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY sha256(text)) AS keeper
    FROM surv1
),
exact_drop AS (SELECT doc_id FROM ex WHERE doc_id <> keeper),
surv2 AS (SELECT d.* FROM surv1 d ANTI JOIN exact_drop USING (doc_id)),
tok AS (
    SELECT doc_id, i AS pos, t[i] AS tok,
           CASE WHEN CAST(('0x' || substr(md5(t[i]), 1, 8)) AS BIGINT)
                     % {_PIPE_CDC_MOD} = 0 THEN 1 ELSE 0 END AS brk
    FROM (SELECT doc_id, string_split(text, ' ') AS t,
                 unnest(generate_series(1, len(string_split(text, ' ')))) AS i
          FROM surv2)
),
cid AS (
    SELECT doc_id, pos, tok,
           coalesce(sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS chunk_id
    FROM tok
),
chunks AS (
    SELECT doc_id, chunk_id,
           md5(string_agg(tok, ' ' ORDER BY pos)) AS digest
    FROM cid GROUP BY 1, 2
),
share AS (
    SELECT digest, count(DISTINCT doc_id) AS n_docs,
           min(doc_id) AS min_doc
    FROM chunks GROUP BY 1
),
per_doc AS (
    SELECT c.doc_id,
           count(*) AS n_chunks,
           sum(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) AS n_dup,
           min(CASE WHEN s.n_docs > 1 THEN s.min_doc END) AS min_shared
    FROM chunks c JOIN share s USING (digest)
    GROUP BY 1
),
chunk_drop AS (
    SELECT doc_id FROM per_doc
    WHERE n_dup * 10000 >= {_PIPE_CHUNK_BP} * n_chunks
      AND min_shared < doc_id
)
SELECT d.doc_id,
       CASE WHEN sh.doc_id IS NOT NULL THEN 'dropped_short'
            WHEN ed.doc_id IS NOT NULL THEN 'dropped_exact_dup'
            WHEN cd.doc_id IS NOT NULL THEN 'dropped_chunk_dup'
            ELSE 'kept' END AS status,
       CAST(CASE WHEN sh.doc_id IS NOT NULL THEN 1
                 WHEN ed.doc_id IS NOT NULL THEN 2
                 WHEN cd.doc_id IS NOT NULL THEN 3
                 ELSE 0 END AS BIGINT) AS tier
FROM docs d
LEFT JOIN short sh USING (doc_id)
LEFT JOIN exact_drop ed USING (doc_id)
LEFT JOIN chunk_drop cd USING (doc_id)
"""


@op(
    "corpus_dedup_pipeline",
    oracle=_PIPE_ORACLE,
    tags=("llm", "dedup", "corpus", "scale"),
)
def corpus_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END dedup survivorship: the cascade a training-data curator
    actually runs, with a per-document verdict and the TIER that decided
    it — (doc_id, status, tier): quality gate (too short) → exact dedup
    (sha256, min-id keeper) → content-defined chunk-share dedup (≥60% of
    a doc's CDC chunks shared, keeper-protected: a doc only drops if a
    LOWER-id doc shares a chunk with it, so every duplicate cluster
    keeps its minimum member). The single-tier ops report each signal;
    this composes them in the order that minimizes cost — each tier only
    processes the previous tier's survivors, so the expensive chunk pass
    runs on the smallest frame.

    Deterministic and fully SQL-expressible: every rule is integral
    (char counts, min-id keepers, 10000-scaled share compare), so the
    whole cascade hash-matches the DuckDB oracle — the external proof
    that tier composition introduces no order-dependence.

    Scale: tier 1 is a map-side filter; tier 2 one digest exchange; tier
    3 the dedup_cdc_chunks ladder on tier-2 survivors plus a per-digest
    (count, min-id) agg — all linear shuffles on digests or doc ids,
    verdict assembly is three anti/left joins on doc_id.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    short = docs.filter(F.col("n_chars") < _PIPE_MIN_CHARS).select("doc_id")
    surv1 = docs.filter(F.col("n_chars") >= _PIPE_MIN_CHARS)
    wk = Window.partitionBy(F.sha2("text", 256))
    exact_drop = (
        surv1.withColumn("keeper", F.min("doc_id").over(wk))
        .filter(F.col("doc_id") != F.col("keeper"))
        .select("doc_id")
    )
    surv2 = surv1.join(exact_drop, "doc_id", "left_anti")
    tok = surv2.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).withColumn(
        "brk",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
            % _PIPE_CDC_MOD
            == 0
        ).cast("int"),
    )
    wc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cid = tok.select(
        "doc_id",
        "pos",
        "tok",
        F.coalesce(F.sum("brk").over(wc), F.lit(0)).alias("chunk_id"),
    )
    chunks = (
        cid.groupBy("doc_id", "chunk_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "tok"))).alias("ps"))
        .select(
            "doc_id",
            F.md5(F.array_join(F.expr("transform(ps, x -> x.tok)"), " ")).alias(
                "digest"
            ),
        )
    )
    share = chunks.groupBy("digest").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
    )
    per_doc = (
        chunks.join(share, "digest")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("n_docs") > 1).cast("int")).alias("n_dup"),
            F.min(F.when(F.col("n_docs") > 1, F.col("min_doc"))).alias(
                "min_shared"
            ),
        )
    )
    chunk_drop = per_doc.filter(
        (F.col("n_dup") * 10000 >= _PIPE_CHUNK_BP * F.col("n_chunks"))
        & (F.col("min_shared") < F.col("doc_id"))
    ).select("doc_id")
    sh = short.withColumn("t1", F.lit(1))
    ed = exact_drop.withColumn("t2", F.lit(1))
    cd = chunk_drop.withColumn("t3", F.lit(1))
    return (
        docs.select("doc_id")
        .join(sh, "doc_id", "left")
        .join(ed, "doc_id", "left")
        .join(cd, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("t1").isNotNull(), F.lit("dropped_short"))
            .when(F.col("t2").isNotNull(), F.lit("dropped_exact_dup"))
            .when(F.col("t3").isNotNull(), F.lit("dropped_chunk_dup"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            F.when(F.col("t1").isNotNull(), F.lit(1))
            .when(F.col("t2").isNotNull(), F.lit(2))
            .when(F.col("t3").isNotNull(), F.lit(3))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("tier"),
        )
    )


# ---------------------------------------------------------------------------
# Quality-cut token budget curve (what a gate threshold costs in tokens)
# ---------------------------------------------------------------------------

_CURVE_BAND = 1000  # quality_bp band width -> <=21 curve rows

_CURVE_ORACLE = f"""
WITH sig AS (
    SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_dis,
           CAST(len(list_filter(string_split(text, ' '),
                t -> t IN ('the', 'a', 'of', 'and', 'in', 'to'))) AS BIGINT)
               AS n_stop
    FROM documents
), q AS (
    SELECT n_tok,
           (n_dis * 10000 // n_tok + n_stop * 10000 // n_tok)
               // {_CURVE_BAND} AS band
    FROM sig WHERE n_tok > 0
), b AS (
    SELECT band, count(*) AS n_docs, sum(n_tok) AS n_tokens
    FROM q GROUP BY 1
)
SELECT CAST(band AS BIGINT) AS quality_band,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs,
       CAST(sum(n_tokens) OVER w * 10000
            // sum(n_tokens) OVER () AS BIGINT) AS cum_token_share_bp
FROM b
WINDOW w AS (ORDER BY band DESC ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
"""


@op("corpus_quality_token_curve", oracle=_CURVE_ORACLE, tags=("llm", "corpus"))
def corpus_quality_token_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget curve over a quality score: for every quality band,
    how many documents and tokens sit there, and what cumulative share
    of the corpus' TOKENS survives if the gate keeps that band and
    better. corpus_quality_gate answers "what does THIS threshold
    drop"; this is the table you read before choosing the threshold —
    training budgets are token-denominated, and a cut that drops 30% of
    documents can cost 5% or 60% of tokens depending on where short
    docs sit on the score.

    Score (stated, integral): distinct-token share + stopword share,
    both in basis points (the two gate signals that are RATES rather
    than length cutoffs), banded into {_CURVE_BAND}-bp steps — ≤21 curve
    rows by construction.

    Exact: integer cross-multiplied shares (the gate discipline), the
    cumulative window runs over the ≤21 banded rows, and the share is
    an integral-div basis-point column.

    Scale: map-only signal projection → ≤21-key hash agg → a window
    over the banded rows (bounded, the win_lorenz_deciles posture).
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    sig = d.select(
        F.size(toks).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_dis"),
        F.size(F.filter(toks, lambda t: t.isin(list(_GATE_STOPWORDS))))
        .cast("bigint")
        .alias("n_stop"),
    ).filter(F.col("n_tok") > 0)
    q = sig.select(
        "n_tok",
        F.expr(
            f"(n_dis * 10000 div n_tok + n_stop * 10000 div n_tok)"
            f" div {_CURVE_BAND}"
        ).alias("band"),
    )
    b = q.groupBy("band").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    wc = dim_window(
        Window.orderBy(F.col("band").desc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        ),
        bound="\u226421 quality bands",
    )
    return b.select(
        F.col("band").cast("bigint").alias("quality_band"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_docs").over(wc).cast("bigint").alias("cum_docs"),
        F.expr(
            "sum(n_tokens) OVER (ORDER BY band DESC ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND CURRENT ROW) * 10000 div sum(n_tokens) OVER ()"
        )
        .cast("bigint")
        .alias("cum_token_share_bp"),
    )
