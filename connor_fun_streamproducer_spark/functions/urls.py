"""URL function tier: structured extraction from URL strings.

The reference's stream carries no URLs, but every crawl-derived training
corpus keys on them (host-level dedup, per-domain quality priors,
query-param stripping). ``fn_url`` exercises Spark's native ``parse_url``
(HOST / PATH / QUERY-param extraction, JVM-side) against a regexp oracle.
Map-only projection — fuses into the scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op


@op(
    "fn_url",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || lang || '.example.com/docs/' ||
               CAST(doc_id AS VARCHAR) || '?ref=' ||
               CAST(doc_id % 7 AS VARCHAR) || '&page=' ||
               CAST(doc_id % 13 AS VARCHAR) AS url
        FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, 'https://([^/]+)/', 1)      AS host,
           regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'ref=([0-9]+)', 1)          AS ref,
           regexp_extract(url, 'page=([0-9]+)', 1)         AS page
    FROM u
    """,
    tags=("ext", "fn"),
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL structure extraction with the native ``parse_url`` expression.

    Builds a deterministic URL per document (the fixture corpus has
    none), then pulls host, path, and two query params with Spark's
    built-in ``parse_url`` — the JVM java.net-backed parser a crawl
    pipeline would use for domain bucketing and tracking-param strips.
    The oracle re-derives the same fields with anchored regexps, so the
    check proves the parser agrees with the grammar, not that two copies
    of one regexp agree with each other. Pure projection: no shuffle,
    scan-fused at any scale.
    """
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("lang"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&page="),
        (F.col("doc_id") % 13).cast("string"),
    )
    d = d.select("doc_id", url.alias("url"))
    return d.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page"),
    )
