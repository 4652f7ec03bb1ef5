"""Leakage-safe dataset splitting and chunk-level dedup — the assignment
stages of an LLM training-data pipeline that decide WHICH corpus rows a
model may see, after the cleaning tiers (llm/corpus.py, llm/corpus_prep.py)
decide what the rows contain.

The reference has no notion of splits (its one dataflow publishes every
event, /root/reference/regionSpout.go:124-160); this tier extends the
engine with the three assignment shapes every 100 TB training run needs:

- **group holdout** (`sample_group_holdout`): evaluation leakage control.
  A random per-document split puts half of a crawl domain in train and
  half in test, so the model is scored on near-copies of its training
  data. The fix is to hash the GROUP (here ``source``) and hold out whole
  groups — any source is entirely in train or entirely heldout.
- **k-fold assignment** (`sample_kfold`): deterministic cross-validation
  folds from a second, decorrelated hash of the document key.
- **chunk-level exact dedup** (`dedup_chunk_exact`): document-level dedup
  (llm/dedup.py) misses the boilerplate paragraph pasted into thousands
  of otherwise-distinct pages. Exploding fixed-width token chunks and
  keeping one canonical copy per chunk digest catches it.

Scale posture:

- Group/fold assignment is a pure map-side projection — a deterministic
  hash expression the scan evaluates in codegen; zero shuffles at any
  corpus size, and the split column can become the ``partitionBy`` key of
  the output layout.
- The group hash must be computable from the STRING key on both engines:
  md5 is bit-identical everywhere, so the first 8 hex digits parsed as an
  integer (Spark ``conv(substring(md5(x),1,8),16,10)``, DuckDB
  ``CAST('0x' || substr(md5(x),1,8) AS UBIGINT)``) give a reproducible
  32-bit group bucket with no engine-specific murmur in sight.
- Chunk dedup is explode → hash-aggregate on the chunk digest: linear in
  corpus tokens, partial-agg before the one exchange, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op

# Fraction of GROUPS (not documents) held out, in percent buckets.
HOLDOUT_PCT = 20

# Decorrelated Knuth multiplier for fold assignment (distinct from the
# split/sample multipliers in llm/corpus.py for the same reason those two
# differ from each other: correlated hashes would align folds with splits).
_FOLD_MULT = 2654435789
_KEY_REDUCE = 2147483648  # 2^31, see llm/corpus.py overflow note
N_FOLDS = 5

# Non-overlapping chunk width for dedup (dedup wants a partition of the
# token stream, unlike training-window chunking in llm/corpus.py which
# overlaps on purpose).
DEDUP_CHUNK = 20


def group_bucket(col: str) -> F.Column:
    """0..99 bucket from the md5 of a string group key — bit-identical in
    the DuckDB oracle (md5 is md5 everywhere), unlike Spark's murmur
    ``hash()`` which has no cross-engine twin."""
    return F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast("long") % 100


def _group_bucket_sql(col: str) -> str:
    return f"CAST(concat('0x', substr(md5({col}), 1, 8)) AS UBIGINT) % 100"


@op(
    "sample_group_holdout",
    oracle=f"""
    SELECT doc_id,
           source,
           CASE WHEN {_group_bucket_sql('source')} < {HOLDOUT_PCT}
                THEN 'heldout' ELSE 'train' END AS split
    FROM documents
    """,
    tags=("llm", "corpus", "split"),
)
def sample_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware holdout split: whole sources go to one side.

    Hashes ``source`` (not ``doc_id``) so every document of a source lands
    in the same split — the leakage-control property a per-document split
    cannot give (train/test near-duplicates from the same crawl domain).
    ~20% of groups are held out; the doc-level fraction then follows the
    group-size distribution, which is the intended semantics (evaluation
    sources are *unseen domains*, not a uniform document sample).

    Map-side projection: the bucket is a codegen'd expression on the scan,
    zero shuffles at 100 TB, and ``split`` is layout-partitionable. The
    whole-group invariant is pinned by tests/test_llm.py on both the
    fixture and a skewed synthetic corpus.
    """
    d = load(spark, sf_dir, "documents")
    split = (
        F.when(group_bucket("source") < HOLDOUT_PCT, F.lit("heldout"))
        .otherwise(F.lit("train"))
    )
    return d.select("doc_id", "source", split.alias("split"))


@op(
    "sample_kfold",
    oracle=f"""
    SELECT doc_id,
           ((doc_id % {_KEY_REDUCE}) * {_FOLD_MULT}) % {N_FOLDS} AS fold
    FROM documents
    """,
    tags=("llm", "corpus", "split"),
)
def sample_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment.

    Knuth multiplicative hash of the reduced doc key, mod 5 — the same
    document is in the same fold on every run, every cluster, and in the
    oracle (``rand(seed)`` is partitioning-dependent and has no DuckDB
    twin). A training pass over fold ``i`` is then a map-side filter
    ``fold != i`` that pushes to the scan. Zero shuffles.
    """
    d = load(spark, sf_dir, "documents")
    fold = ((F.col("doc_id") % _KEY_REDUCE) * _FOLD_MULT) % N_FOLDS
    return d.select("doc_id", fold.alias("fold"))


@op(
    "dedup_chunk_exact",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), c AS (
        SELECT doc_id,
               chunk_id,
               md5(array_to_string(
                   toks[chunk_id*{DEDUP_CHUNK}+1 : (chunk_id+1)*{DEDUP_CHUNK}], ' '
               )) AS digest
        FROM (
            SELECT doc_id, toks,
                   unnest(generate_series(0, (len(toks) - 1) // {DEDUP_CHUNK}))
                       AS chunk_id
            FROM t
        )
    ), canon AS (
        SELECT digest, min(ROW(doc_id, chunk_id)) AS keeper
        FROM c GROUP BY digest
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN ROW(c.doc_id, c.chunk_id) = canon.keeper
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM c JOIN canon USING (digest)
    GROUP BY c.doc_id
    """,
    tags=("llm", "dedup"),
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup: one canonical copy per 20-token chunk.

    Document-level dedup (llm/dedup.py dedup_exact) can't remove the
    boilerplate paragraph shared by thousands of distinct pages; chunk
    dedup partitions each document's token stream into fixed non-
    overlapping 20-token chunks, digests each, and keeps only the chunk
    with the lexicographically smallest (doc_id, chunk_id) per digest.
    Output per document: total chunks vs chunks surviving as canonical
    copies.

    Scale: explode is linear in corpus tokens — the chunk-slot sequence
    is derived PER ROW from the document's own token count (no fixed
    slot cap, so a 10k-token document loses nothing), and the keeper is
    a lexicographic struct min (no positional integer encoding to
    overflow at ≥1000 chunks or large doc_ids; both engines order
    structs field-by-field). The canonical-keeper reduction is a hash
    aggregate on the digest (partial-agg before its single exchange);
    the rejoin is an equi-join on the digest that AQE plans from
    observed sizes. Never all-pairs, no windows over the full corpus.
    At 100 TB the digest agg is the only wide stage and it reduces to
    |distinct chunks|.
    """
    toks = F.split("text", " ")
    d = load(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n_toks")
    )
    # sequence bound derived per row: last chunk index = (n_toks-1) div 20
    # (split() never yields an empty array, so the bound is >= 0).
    chunks = (
        d.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.expr(f"sequence(0, int((n_toks - 1) div {DEDUP_CHUNK}))"),
                    lambda i: F.struct(
                        i.alias("chunk_id"),
                        F.md5(
                            F.concat_ws(
                                " ",
                                F.slice(
                                    F.col("toks"),
                                    i * DEDUP_CHUNK + 1,
                                    DEDUP_CHUNK,
                                ),
                            )
                        ).alias("digest"),
                    ),
                )
            ).alias("ch"),
        )
        .select("doc_id", F.col("ch.chunk_id").alias("chunk_id"), F.col("ch.digest").alias("digest"))
    )
    pos = F.struct(F.col("doc_id"), F.col("chunk_id")).alias("pos")
    canon = chunks.select("digest", pos).groupBy("digest").agg(F.min("pos").alias("keeper"))
    return (
        chunks.select("doc_id", "digest", pos)
        .join(canon, "digest")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum((F.col("pos") == F.col("keeper")).cast("int"))
            .cast("bigint")
            .alias("n_kept"),
        )
    )


N_SHARDS = 8


@op(
    "corpus_shuffle_shard",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) % {N_SHARDS} AS shard
        FROM documents
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id)
                AS BIGINT) AS pos
    FROM h
    """,
    tags=("llm", "corpus", "scale"),
)
def corpus_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle + shard layout for training.

    Training wants documents in an order uncorrelated with ingest order
    (crawl runs cluster by domain/time; reading them sequentially feeds
    the model hour-long single-domain streaks). The standard move is a
    HASH shuffle: order by md5(doc_id) — reproducible across runs and
    engines, unlike rand() — split into shards by a hash bucket, and
    number positions within each shard. Output (doc_id, shard, pos) IS
    the training manifest: reader k streams shard k in pos order.

    Scale: one exchange partitions by shard (hash of the md5 prefix),
    then each shard sorts locally by the full digest — a per-partition
    sort, never a global one; shards are balanced by md5 uniformity
    regardless of doc_id distribution. The position column comes from a
    row_number window that shares the shard partitioning, so the whole
    op is exchange → sort → window, the minimal distributed shuffle. At
    100 TB the same plan writes ``partitionBy(shard)`` with
    ``sortWithinPartitions(hx)`` and the manifest becomes the layout.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("hx")
    )
    sharded = d.withColumn(
        "shard",
        F.conv(F.substring("hx", 1, 8), 16, 10).cast("long") % N_SHARDS,
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard").orderBy("hx", "doc_id")
    return sharded.select(
        "doc_id", "shard", F.row_number().over(w).cast("bigint").alias("pos")
    )


# Quantized Poisson(1) pmf in basis points: P(0)=.3679, P(1)=.3679,
# P(2)=.1839, P(3)=.0613, P(>=4) tail folded into 4 (0.0190).
_BOOT_MULT = 2654435461
_POIS_BP = (3679, 7358, 9197, 9810)  # cumulative basis points for k=0..3


def _bootstrap_copies_sql(bucket: str) -> str:
    return (
        f"CASE WHEN {bucket} < {_POIS_BP[0]} THEN 0 "
        f"WHEN {bucket} < {_POIS_BP[1]} THEN 1 "
        f"WHEN {bucket} < {_POIS_BP[2]} THEN 2 "
        f"WHEN {bucket} < {_POIS_BP[3]} THEN 3 ELSE 4 END"
    )


@op(
    "sample_bootstrap",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, lang,
               ((doc_id % {_KEY_REDUCE}) * {_BOOT_MULT}) % 10000 AS bucket
        FROM documents
    ), c AS (
        SELECT doc_id, lang, {_bootstrap_copies_sql('bucket')} AS n_copies
        FROM b
    )
    SELECT c.doc_id, c.lang, CAST(c.n_copies AS BIGINT) AS n_copies,
           CAST(r.i AS BIGINT) AS replica
    FROM c JOIN (SELECT unnest(generate_series(1, 4)) AS i) r
      ON r.i <= c.n_copies
    """,
    tags=("llm", "corpus", "split"),
)
def sample_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap resample of the corpus — the
    distributed form of sampling WITH replacement (uncertainty
    estimation, bagging, data-mixing ablations).

    True with-replacement sampling needs global coordination; the
    Poisson approximation replaces it with an independent per-row copy
    count ~ Poisson(1) (the standard trick: for n large, multinomial
    row counts converge to independent Poissons). Here the Poisson draw
    is DERANDOMIZED: a Knuth-hash bucket in [0, 10000) thresholded at
    the quantized Poisson(1) CDF (basis points, tail folded at 4), so
    the resample is reproducible across runs, partitionings, and
    engines — rand()-based Poisson is none of those. Rows with count 0
    drop; rows with count k explode into k replicas tagged 1..k.

    Scale: map-side projection + bounded explode (≤4); expected output
    size == input size; zero shuffles. A replica-aware downstream
    (e.g. bagged quality scoring) groups on (doc_id, replica).
    """
    b = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (((F.col("doc_id") % _KEY_REDUCE) * _BOOT_MULT) % 10000).alias("bucket"),
    )
    copies = (
        F.when(F.col("bucket") < _POIS_BP[0], 0)
        .when(F.col("bucket") < _POIS_BP[1], 1)
        .when(F.col("bucket") < _POIS_BP[2], 2)
        .when(F.col("bucket") < _POIS_BP[3], 3)
        .otherwise(4)
    )
    c = b.select("doc_id", "lang", copies.alias("n_copies"))
    return (
        c.filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "lang",
            F.col("n_copies").cast("bigint").alias("n_copies"),
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("replica"),
        )
        .withColumn("replica", F.col("replica").cast("bigint"))
    )


# ---------------------------------------------------------------------------
# Contrastive negative sampling (derandomized, bounded-pool)

_NEG_B = 8   # hash buckets over the candidate pool
_NEG_K = 2   # probes (negatives requested) per anchor


def _h8(expr: str) -> str:
    """First 8 md5 hex digits as a DuckDB BIGINT (the fn_surrogate_key
    cross-engine hash idiom)."""
    return f"CAST(CAST(concat('0x', substr(md5({expr}), 1, 8)) AS UBIGINT) AS BIGINT)"


_NEG_ORACLE = f"""
WITH v AS (
    SELECT vec_id, label,
           {_h8("CAST(vec_id AS VARCHAR)")} % {_NEG_B} AS bucket
    FROM embeddings
), pool AS (
    SELECT bucket, label,
           arg_min(vec_id, md5(CAST(vec_id AS VARCHAR))) AS rep_id
    FROM v GROUP BY bucket, label
), probes AS (
    SELECT v.vec_id AS anchor_id, v.label AS anchor_label, p.probe,
           {_h8("concat(CAST(v.vec_id AS VARCHAR), '#', CAST(p.probe AS VARCHAR))")}
               % {_NEG_B} AS target
    FROM v, (SELECT unnest(generate_series(0, {_NEG_K - 1})) AS probe) p
), cand AS (
    SELECT probes.anchor_id, probes.probe,
           pool.rep_id AS neg_id, pool.label AS neg_label,
           row_number() OVER (
               PARTITION BY probes.anchor_id, probes.probe
               ORDER BY md5(concat(CAST(probes.anchor_id AS VARCHAR), '|',
                                   CAST(probes.probe AS VARCHAR), '|',
                                   CAST(pool.label AS VARCHAR)))
           ) AS rn
    FROM probes JOIN pool
      ON pool.bucket = probes.target AND pool.label <> probes.anchor_label
)
SELECT anchor_id, CAST(probe AS INTEGER) AS probe,
       neg_id, CAST(neg_label AS INTEGER) AS neg_label
FROM cand WHERE rn = 1
"""


@op("sample_negative_pairs", oracle=_NEG_ORACLE, tags=("llm", "sample", "scale"))
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derandomized contrastive negative sampling: for each anchor
    vector, K=2 negatives with a DIFFERENT label, chosen by hash — the
    (anchor, positive, negative) triplet builder behind contrastive
    embedding training, reproducible across runs, engines, and
    partitionings (``rand()`` negatives are none of those).

    Scale design — the naive form (per anchor, choose among all
    other-label vectors) is a quadratic join; this op never builds it:

    - a bounded POOL pre-aggregates one representative per (bucket,
      label) cell — arg_min by md5, B×|labels| rows total, broadcast;
    - each anchor probes K hash-derived buckets (per-anchor variety
      comes from the probe hash, not from scanning candidates);
    - per (anchor, probe) the winning label is again hash-chosen
      (row_number over md5, planned as WindowGroupLimit's running
      top-1).

    Cost at 100 TB: one bounded pool aggregate + a broadcast equi-join
    fanning each anchor to at most |labels|−1 candidate rows — linear
    in anchors, independent of corpus size per anchor. Probes whose
    bucket holds no other-label representative yield no row
    (deterministic on both engines; refresh with a different probe
    salt in production).
    """
    e = load(spark, sf_dir, "embeddings")
    h8 = lambda col: F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
    v = e.select(
        "vec_id",
        "label",
        (h8(F.col("vec_id").cast("string")) % _NEG_B).alias("bucket"),
    )
    pool = v.groupBy("bucket", "label").agg(
        F.min_by("vec_id", F.md5(F.col("vec_id").cast("string"))).alias("rep_id")
    )
    probes = v.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.explode(F.array(*[F.lit(i) for i in range(_NEG_K)])).alias("probe"),
    ).withColumn(
        "target",
        h8(
            F.concat(
                F.col("anchor_id").cast("string"),
                F.lit("#"),
                F.col("probe").cast("string"),
            )
        )
        % _NEG_B,
    )
    cand = probes.join(
        F.broadcast(pool),
        (pool.bucket == probes.target) & (pool.label != probes.anchor_label),
    )
    w = Window.partitionBy("anchor_id", "probe").orderBy(
        F.md5(
            F.concat(
                F.col("anchor_id").cast("string"),
                F.lit("|"),
                F.col("probe").cast("string"),
                F.lit("|"),
                F.col("label").cast("string"),
            )
        )
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("probe").cast("int").alias("probe"),
            F.col("rep_id").alias("neg_id"),
            F.col("label").cast("int").alias("neg_label"),
        )
    )
