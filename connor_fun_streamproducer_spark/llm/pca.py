"""Distributed PCA over the embedding corpus: Gramian sums + projection.

The reference has no vector tier at all (its one dataflow ships opaque
tweet JSON, /root/reference/regionSpout.go:151-163); this adds the
dimensionality-reduction stage a 100 TB embedding pipeline runs between
pooling (llm/corpus_prep.py ``embedding_pool``) and indexing
(llm/similarity.py): estimate the covariance in ONE distributed pass,
eigendecompose the tiny d x d result on the driver, and project the
corpus map-only.

Scale shape (the classic tall-skinny pattern):

- the corpus is TALL (rows ~ 10^9 at 100 TB) but the covariance is
  d x d (here 16 x 16) — so each Arrow batch is collapsed to one
  integer Gramian partial via a single BLAS matmul in ``mapInPandas``,
  and the only shuffle carries d^2 rows per batch, never vectors;
- all sums are EXACT int64 over 1e-6-quantized components (the repo's
  integer-cents discipline applied to vectors), so Spark's and DuckDB's
  summation orders cannot diverge — the covariance op is fully
  hash-checked, a rarity for numeric linear algebra;
- the eigendecomposition runs on the driver over the d x d matrix (the
  IVF-codebook bounded-collect pattern, llm/similarity.py) and the
  projection is a pure JVM column expression — no Python in the
  per-row path.

At ~10^9+ rows the int64 partial sums would need widening; the groupBy
re-aggregates in decimal(38,0) precisely so the design survives that
scale (only the in-batch matmul is int64, bounded by batch size).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op

# Covariance over the first D_SEL dimensions (1-based inclusive on both
# engines): keeps the oracle's self-join quadratic in 16, not 64, while
# exercising the identical distributed pattern.
D_SEL = 16
_Q = 1_000_000  # component quantization scale (1e-6 resolution)

_GRAM_SCHEMA = "i int, j int, sxy long, si long, sj long, n long"


def _gram_partials(batches):
    """Per-Arrow-batch integer Gramian partials: d^2 rows per batch."""
    import pandas as pd

    idx = np.arange(1, D_SEL + 1)
    for pdf in batches:
        if pdf.empty:
            continue
        m = np.stack(pdf["embedding"].to_numpy())[:, :D_SEL].astype("float64")
        q = np.floor(m * _Q + 0.5).astype("int64")
        g = q.T @ q
        s = q.sum(axis=0)
        yield pd.DataFrame(
            {
                "i": np.repeat(idx, D_SEL),
                "j": np.tile(idx, D_SEL),
                "sxy": g.reshape(-1),
                "si": np.repeat(s, D_SEL),
                "sj": np.tile(s, D_SEL),
                "n": np.int64(q.shape[0]),
            }
        )


def _covariance_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select("embedding")
    partials = emb.mapInPandas(_gram_partials, schema=_GRAM_SCHEMA)
    dec = lambda c: F.sum(F.col(c).cast("decimal(38,0)")).cast("double")  # noqa: E731
    agg = partials.groupBy("i", "j").agg(
        dec("sxy").alias("sxy"),
        dec("si").alias("si"),
        dec("sj").alias("sj"),
        dec("n").alias("n"),
    )
    cov = (
        F.col("sxy") / F.col("n")
        - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n"))
    ) / F.lit(float(_Q) ** 2)
    # "+ 0.0" collapses IEEE negative zero (DuckDB's round keeps -0.0 for
    # tiny negatives; Spark normalizes) so the hash compare can't split
    # on a sign bit of zero. Same normalization in the oracle.
    return agg.select("i", "j", (F.round(cov, 6) + F.lit(0.0)).alias("cov"))


_COV_ORACLE = f"""
WITH u AS (
    SELECT vec_id, i, CAST(floor(x * {_Q} + 0.5) AS BIGINT) AS q
    FROM (SELECT vec_id, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS i FROM embeddings)
    WHERE i <= {D_SEL}
)
SELECT a.i AS i, b.i AS j,
       round((CAST(sum(a.q * b.q) AS DOUBLE) / count(*)
              - (CAST(sum(a.q) AS DOUBLE) / count(*))
              * (CAST(sum(b.q) AS DOUBLE) / count(*))) / 1e12, 6) + 0.0 AS cov
FROM u a JOIN u b ON a.vec_id = b.vec_id
GROUP BY 1, 2
"""


@op("embedding_covariance", oracle=_COV_ORACLE, tags=("llm", "embedding", "scale"))
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance matrix of embedding dims 1..16 as (i, j, cov).

    One ``mapInPandas`` pass collapses each Arrow batch to an integer
    d x d Gramian (one int64 BLAS matmul per batch); the shuffle then
    carries only d^2-row partials, merged exactly in decimal. Both
    engines do the identical double arithmetic on the identical exact
    integers, so the result hash-matches despite being floating-point
    linear algebra. The DuckDB side is the quadratic unnest-self-join
    formulation — fine for an oracle, quadratic-in-corpus at scale,
    which is exactly why the Spark side is the Gramian form.
    """
    return _covariance_frame(spark, sf_dir)


@op("embedding_pca_project", oracle=None, tags=("llm", "embedding", "iterative"))
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto its corpus's top-2 principal
    components (dims 1..16): (vec_id, label, pc1, pc2).

    Phase 1 reuses the one-pass covariance above plus the quantized
    column means (same exact-integer sums). Phase 2 collects the 16x16
    matrix — bounded d^2 driver work, NOT a data collect — and
    eigendecomposes with numpy (``eigh``; symmetric by construction).
    Sign is fixed deterministically (largest-|loading| entry positive,
    lowest index on ties) so reruns are bit-stable. Phase 3 projects
    map-only with a pure JVM expression: pc_k = sum_d (x_d - mu_d) *
    w_kd over 16 literal terms — whole-stage codegen, no Python, no
    shuffle.

    Eigendecomposition is not ANSI-SQL-expressible, so this key is the
    sanctioned rows-only class; tests/test_llm.py pins the projection
    against a full numpy PCA recompute at sf0.001 instead.
    """
    cov_rows = _covariance_frame(spark, sf_dir).collect()  # d^2 = 256 rows
    cov = np.zeros((D_SEL, D_SEL))
    for r in cov_rows:
        cov[r["i"] - 1, r["j"] - 1] = r["cov"]

    emb = load(spark, sf_dir, "embeddings")
    mean_aggs = [
        F.sum(
            F.floor(F.element_at("embedding", d).cast("double") * _Q + F.lit(0.5)).cast(
                "decimal(38,0)"
            )
        ).alias(f"s{d}")
        for d in range(1, D_SEL + 1)
    ]
    mean_row = emb.agg(F.count("*").alias("n"), *mean_aggs).collect()[0]
    n = mean_row["n"]
    mu = np.array([float(mean_row[f"s{d}"]) / n / _Q for d in range(1, D_SEL + 1)])

    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    comps = vecs[:, order[:2]].T  # (2, d)
    for k in range(2):
        pivot = int(np.argmax(np.abs(comps[k])))
        if comps[k, pivot] < 0:
            comps[k] = -comps[k]

    def proj(k: int) -> F.Column:
        terms = [
            (F.element_at("embedding", d + 1).cast("double") - F.lit(float(mu[d])))
            * F.lit(float(comps[k, d]))
            for d in range(D_SEL)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return F.round(out, 4)

    return emb.select("vec_id", "label", proj(0).alias("pc1"), proj(1).alias("pc2"))
