"""Array function family (fn_array) — incl. higher-order functions.

Runs on the `embeddings` fixture (ARRAY<FLOAT>, 64-dim — FIXTURES.md §B).
Everything here is the JVM higher-order-function path (`transform`,
`filter`, `aggregate`, `zip_with`) — no Python, no UDFs — which is also
the baseline implementation for the similarity-search tier (llm/).

DuckDB list indexing is 1-based (embedding[1] == element_at(a, 1) ==
Spark's a[0]); the oracle uses explicit +1 offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op


@op(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER)                               AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4)                        AS first_elem,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4)        AS sq_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER)      AS n_positive,
           round(list_sum(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))), 4)                       AS l1_norm
    FROM embeddings
    """,
    tags=("ext", "fn"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / indexing / transform / filter / aggregate over embeddings.

    sq_norm is the exact expression the cosine-similarity operator uses
    (llm/similarity.py); computing it here JVM-side proves the hot path
    needs no Python.
    """
    e = load(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.col("embedding")[0].cast("double"), 4).alias("first_elem"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("sq_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + F.abs(x)), 4
        ).alias("l1_norm"),
    )


@op(
    "fn_array_explode",
    oracle="""
    SELECT e.vec_id, p.pos, round(CAST(e.embedding[p.pos + 1] AS DOUBLE), 4) AS val
    FROM embeddings e, (VALUES (0), (1), (2), (3)) AS p(pos)
    """,
    tags=("ext", "fn"),
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the leading array slice — array→rows lateral view.

    Sliced to 4 elements so the op stays readable; full-width explode is
    the same plan with 64× the rows (a Generate operator, no shuffle).
    """
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "raw")
    ).select("vec_id", "pos", F.round(F.col("raw").cast("double"), 4).alias("val"))
