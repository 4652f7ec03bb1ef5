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
