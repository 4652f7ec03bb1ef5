"""String function family (fn_string).

The reference treats all text as opaque bytes (the whole tweet is
marshaled unseen, /root/reference/regionSpout.go:152); its only string op
is topic-name concatenation (regionSpout.go:156). The EXT tier exposes the
full built-in string surface — all JVM-side, codegen'd, no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op


@op(
    "fn_string",
    oracle=r"""
    SELECT doc_id,
           upper(lang)                                   AS lang_upper,
           trim(substring(text, 1, 12))                  AS head,
           length(text)                                  AS n_chars_computed,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           concat_ws('|', lang, source)                  AS lang_src,
           regexp_extract(source, '([0-9]+)', 1)         AS src_num,
           levenshtein(lang, 'en')                       AS lang_dist,
           replace(lang, 'e', 'E')                       AS lang_replaced,
           lpad(CAST(doc_id AS VARCHAR), 8, '0')         AS padded_id
    FROM documents
    """,
    tags=("ext", "fn"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string ops over documents: case, trim, substring, split,
    concat, regexp extraction, edit distance, replace, padding.

    `split` + `size` is the cheap token count reused by the text-analysis
    tier (llm/text.py); regexp runs compiled per task, not per row.
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_upper"),
        F.trim(F.substring("text", 1, 12)).alias("head"),
        F.length("text").alias("n_chars_computed"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.concat_ws("|", "lang", "source").alias("lang_src"),
        F.regexp_extract("source", "([0-9]+)", 1).alias("src_num"),
        F.levenshtein("lang", F.lit("en")).alias("lang_dist"),
        F.replace(F.col("lang"), F.lit("e"), F.lit("E")).alias("lang_replaced"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
    )


@op(
    "fn_surrogate_key",
    oracle="""
    WITH h AS (
        SELECT doc_id, source,
               md5(coalesce(source, '') || '|' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents
    )
    SELECT doc_id, source,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-' ||
           substr(hx, 13, 4) || '-' || substr(hx, 17, 4) || '-' ||
           substr(hx, 21, 12)                                   AS sk_uuid,
           CAST(CAST(concat('0x', substr(hx, 1, 15)) AS UBIGINT)
                AS BIGINT)                                       AS sk_int
    FROM h
    """,
    tags=("ext", "fn"),
)
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate-key minting from natural keys — the
    dimension-load stage that replaces sequence generators at scale.

    A sequence/IDENTITY column needs global coordination (the thing a
    1000-executor load job cannot have); the distributed answer is a
    HASH surrogate: md5 over the delimited natural key yields the same
    key on every run, every cluster, and in every engine — idempotent
    re-loads, reproducible joins, no coordination. Emitted in both
    common shapes: UUID-formatted text (external interchange) and a
    60-bit BIGINT (15 hex digits — always positive, join-key friendly;
    collision odds follow the birthday bound, ~1e-10 at a billion
    keys). The '|' delimiter guards the classic concat ambiguity
    ('ab'+'c' vs 'a'+'bc'), and NULL natural-key components are made
    EXPLICIT on both engines — ``coalesce(source, '')`` — because the
    two default behaviors silently diverge (Spark concat_ws skips
    NULLs; SQL ``||`` propagates them) and would mint different keys
    for ('ab', NULL) vs ('ab',). Pure map-side codegen; zero shuffles.
    """
    d = load(spark, sf_dir, "documents")
    hx = F.md5(
        F.concat_ws(
            "|", F.coalesce(F.col("source"), F.lit("")), F.col("doc_id").cast("string")
        )
    )
    h = d.select("doc_id", "source", hx.alias("hx"))
    return h.select(
        "doc_id",
        "source",
        F.concat_ws(
            "-",
            F.substring("hx", 1, 8),
            F.substring("hx", 9, 4),
            F.substring("hx", 13, 4),
            F.substring("hx", 17, 4),
            F.substring("hx", 21, 12),
        ).alias("sk_uuid"),
        F.conv(F.substring("hx", 1, 15), 16, 10).cast("bigint").alias("sk_int"),
    )


# ---------------------------------------------------------------------------
# Binary codec surface (base64 / hex roundtrips over binary payloads)
# ---------------------------------------------------------------------------


@op(
    "fn_binary_codec",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               encode(substring(text, 1, 24)) AS payload
        FROM documents
    )
    SELECT doc_id,
           to_base64(payload) AS b64,
           decode(from_base64(to_base64(payload))) AS b64_roundtrip,
           lower(hex(payload)) AS hx,
           decode(unhex(hex(payload))) AS hex_roundtrip,
           CAST(octet_length(payload) AS INTEGER) AS n_bytes,
           md5(decode(payload)) AS payload_md5
    FROM s
    """,
    tags=("ext", "fn"),
)
def fn_binary_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec surface: base64 and hex encode/decode roundtrips,
    byte length, and digesting over a BINARY payload — the functions a
    multimodal pipeline leans on when image/audio bytes travel through
    text-typed transports (JSON envelopes, Kafka headers, REST
    ingests). The multimodal tier stores opaque binary columns; this
    pins the codec algebra (decode∘encode = id, both codecs) that
    makes those columns portable.

    Both engines emit RFC-4648 base64 without line wrapping and
    lowercase hex over the identical UTF-8 payload bytes, so every
    column — including the roundtrips, which must equal the original
    text — hash-compares exactly.

    Scale: map-only codegen'd expressions fused into the scan; no
    shuffle, no Python.
    """
    d = load(spark, sf_dir, "documents")
    payload = F.substring("text", 1, 24).cast("binary")
    return d.select(
        "doc_id",
        F.base64(payload).alias("b64"),
        F.unbase64(F.base64(payload)).cast("string").alias("b64_roundtrip"),
        F.lower(F.hex(payload)).alias("hx"),
        F.unhex(F.hex(payload)).cast("string").alias("hex_roundtrip"),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


# ---------------------------------------------------------------------------
# Struct algebra surface (pack / field access / lexicographic compare)
# ---------------------------------------------------------------------------


@op(
    "fn_struct_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS field_roundtrip,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS nested_cents,
           (o_orderpriority, o_orderkey) >
               ('3-MEDIUM', CAST(4000 AS BIGINT)) AS after_pivot,
           CASE WHEN o_orderstatus <= o_orderpriority
                THEN o_orderstatus ELSE o_orderpriority END AS lex_min_field
    FROM orders
    """,
    tags=("ext", "fn"),
)
def fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct algebra surface: named-struct packing, nested field
    access, and LEXICOGRAPHIC struct comparison — the row-type calculus
    behind every argmin/argmax-by-struct idiom in the repo
    (agg_extremal_by, ts_ohlc_candles tie-breaks): struct ordering
    compares fields left to right, so packing (key, tiebreak) into a
    struct is the deterministic-ties primitive, and this op pins that
    semantics cross-engine (DuckDB row-value comparison agrees with
    Spark struct ordering on same-typed fields).

    Columns: a field roundtrip through a two-level nested struct
    (extract = original, the identity law), exact cents pulled from a
    nested numeric field, a struct-vs-literal-struct comparison (the
    "after pivot row" predicate of keyset pagination), and the lesser
    of two single-field structs.

    Scale: map-only codegen'd projections; structs never materialize
    off-heap — Tungsten keeps them unwrapped in the row format.
    """
    o = load(spark, sf_dir, "orders")
    nested = F.struct(
        F.col("o_orderstatus").alias("st"),
        F.struct(
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("bigint")
            .alias("cents"),
            F.col("o_orderpriority").alias("prio"),
        ).alias("inner"),
    )
    pivot = F.struct(
        F.lit("3-MEDIUM").alias("prio"), F.lit(4000).cast("bigint").alias("k")
    )
    return o.select(
        "o_orderkey",
        nested.getField("st").alias("field_roundtrip"),
        nested.getField("inner").getField("cents").alias("nested_cents"),
        (
            F.struct(
                F.col("o_orderpriority").alias("prio"),
                F.col("o_orderkey").alias("k"),
            )
            > pivot
        ).alias("after_pivot"),
        F.least(
            F.struct(F.col("o_orderstatus").alias("f")),
            F.struct(F.col("o_orderpriority").alias("f")),
        )
        .getField("f")
        .alias("lex_min_field"),
    )
