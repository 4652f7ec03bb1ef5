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

FLOAT32 promotion trap (found round 14, via embedding_whiten): the
embedding column is float32, and DuckDB evaluates ``x * 1000000 + 0.5``
ENTIRELY in single precision when the multiplier is an INTEGER literal
(FLOAT x INTEGER stays FLOAT, and even ``+ 0.5`` stays FLOAT), while
Spark widens through the double ``0.5`` literal and numpy kernels use
float64 — so the two engines can quantize a boundary element to
ADJACENT integers (568 of 128k elements at sf0.1 for Q=1e6). The
divergence hid under round(…, 6)/1e-4 grids for a full round of green
hashes until whitening amplified it. Rule: every quantization of a
float32 column spells ``CAST(x AS DOUBLE)`` in the oracle and
``.cast("double")`` (or a double literal like ``1e6``) on the Spark
side BEFORE the multiply.
"""

from __future__ import annotations

import math

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
    SELECT vec_id, i, CAST(floor(CAST(x AS DOUBLE) * {_Q} + 0.5) AS BIGINT) AS q
    FROM (SELECT vec_id, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS i FROM embeddings)
    WHERE i <= {D_SEL}
)
SELECT a.i AS i, b.i AS j,
       round((CAST(CAST(sum(a.q * b.q) AS BIGINT) AS DOUBLE) / count(*)
              - (CAST(CAST(sum(a.q) AS BIGINT) AS DOUBLE) / count(*))
              * (CAST(CAST(sum(b.q) AS BIGINT) AS DOUBLE) / count(*))) / 1e12, 6) + 0.0 AS cov
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


# Fixed round budget for the deflated power iteration. The op is DEFINED
# as the T-round iteration (not "the eigenvectors"): with the fixtures'
# near-degenerate spectra (lambda2/lambda1 ~ 0.95-0.985) no fixed budget
# converges to eigh's vectors, but any mix inside the near-degenerate
# top subspace captures essentially the same variance — and a fixed-round
# integer-quantized recurrence is something BOTH engines can replay
# bit-for-bit, which eigh is not. tests/test_properties.py pins the
# captured variance (Rayleigh quotient) against the true eigenvalues.
PI_ROUNDS = 32


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — DuckDB's ``//`` on
    integers and Spark's ``div`` both truncate; Python's ``//`` floors,
    so the driver-side replay must not use it on negatives."""
    q = abs(a) // b
    return -q if a < 0 else q


def _power_iterate(cq: dict, rounds: int) -> list[int]:
    """``rounds`` integer-quantized power-iteration steps on the 16x16
    quantized covariance ``cq[(i, j)]`` (1-based), starting from the
    all-ones vector scaled to _Q. Every step: exact int64 matvec, a
    norm from the SCALED sum of squares (|w| div _Q, squared — keeps the
    sum under 2^53 so the int->double conversion is exact in both
    engines; DuckDB's HUGEINT->DOUBLE cast is NOT correctly rounded
    above 2^53, measured this round), then re-quantize to the _Q grid.
    Float ops are a fixed sequence over exactly-representable integers,
    so DuckDB replays this bit-for-bit as unrolled CTE rounds."""
    v = [_Q] * D_SEL
    for _ in range(rounds):
        w = [
            sum(cq[(i, j)] * v[j - 1] for j in range(1, D_SEL + 1))
            for i in range(1, D_SEL + 1)
        ]
        ssq = sum((abs(x) // _Q) ** 2 for x in w)
        if ssq == 0:
            # degenerate direction (zero or sub-quantum image — e.g. a
            # constant-embedding corpus has an all-zero covariance):
            # collapse to the zero vector, which is a FIXPOINT of every
            # later round and projects every doc to 0 — defined and
            # identical on both engines, instead of a 0/0 crash.
            v = [0] * D_SEL
            continue
        nrm = math.sqrt(float(ssq)) * float(_Q)
        v = [math.floor(x / nrm * float(_Q) + 0.5) for x in w]
    return v


def _sign_fix(v: list[int]) -> list[int]:
    """Largest-|component| entry positive; lowest index wins ties."""
    piv = max(range(D_SEL), key=lambda i: (abs(v[i]), -i))
    return [-x for x in v] if v[piv] < 0 else v


def _rayleigh(cq: dict, v: list[int]) -> float:
    """Rayleigh quotient of quantized v on quantized cov, in cq units.
    num div-scales each va*cq product by _Q so the 256-term sum stays
    exactly double-representable; den = |v|^2 fits int64 outright."""
    num_s = sum(
        _tdiv(v[i - 1] * cq[(i, j)], _Q) * v[j - 1]
        for i in range(1, D_SEL + 1)
        for j in range(1, D_SEL + 1)
    )
    den = sum(x * x for x in v)
    # zero v (the degenerate fixpoint above): lam = 0
    return 0.0 if den == 0 else float(num_s) / float(den) * float(_Q)


def _pca_components(cov_rows, rounds: int = PI_ROUNDS):
    """Top-2 quantized directions AND their Rayleigh eigenvalues (cq
    units, i.e. covariance * _Q) by deflated fixed-round power
    iteration over the collected covq rows. Pure-Python exact-int +
    fixed-IEEE-sequence arithmetic; mirrors the oracle CTEs 1:1.
    Returns (v1, v2, lam1, lam2); lam1 is also the deflation weight."""
    cq1 = {(r["i"], r["j"]): int(r["cq"]) for r in cov_rows}
    v1 = _power_iterate(cq1, rounds)
    lam = _rayleigh(cq1, v1)
    # Hotelling deflation, re-quantized to the covq grid.
    cq2 = {
        (i, j): math.floor(
            float(cq1[(i, j)]) - lam * (float(v1[i - 1] * v1[j - 1]) / 1e12) + 0.5
        )
        for i in range(1, D_SEL + 1)
        for j in range(1, D_SEL + 1)
    }
    v2 = _power_iterate(cq2, rounds)
    lam2 = _rayleigh(cq2, v2)
    return _sign_fix(v1), _sign_fix(v2), lam, lam2


def _covq_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantized covariance (i, j, cq): the SAME distributed Gramian
    aggregation as embedding_covariance, quantized to the _Q grid with
    floor-half-up instead of round(.., 6) (floor over identical doubles
    is engine-stable; decimal round is not at scaled-half boundaries)."""
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
    return agg.select(
        "i", "j", F.floor(cov * F.lit(float(_Q)) + F.lit(0.5)).cast("long").alias("cq")
    )


def _pca_cte_parts(rounds: int = PI_ROUNDS) -> list[str]:
    """The shared DuckDB CTE prefix: quantized covariance + the full
    power iteration unrolled as MATERIALIZED CTE rounds (the kmeans/PQ
    fold discipline — the oracle replays the ALGORITHM, it does not
    trust the engine). Integer-exact matvecs; every int that meets a
    double is first cast through BIGINT (exact hardware conversion —
    HUGEINT->DOUBLE double-rounds above 2^53) and every scaled div is
    DuckDB ``//`` (truncating, mirrored by _tdiv). ``_pca_oracle`` and
    ``_whiten_oracle`` append their own final SELECTs."""
    q, d = _Q, D_SEL
    parts = [
        f"""WITH u AS MATERIALIZED (
  SELECT vec_id, i, CAST(floor(CAST(x AS DOUBLE) * {q} + 0.5) AS BIGINT) AS q
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i FROM embeddings)
  WHERE i <= {d}
), stat AS MATERIALIZED (
  SELECT i, SUM(q) AS sd FROM u GROUP BY i
), nn AS MATERIALIZED (
  SELECT COUNT(*) AS n FROM embeddings
), covagg AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j,
         CAST(CAST(SUM(a.q * b.q) AS BIGINT) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(a.q) AS BIGINT) AS DOUBLE) AS si,
         CAST(CAST(SUM(b.q) AS BIGINT) AS DOUBLE) AS sj,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM u a JOIN u b ON a.vec_id = b.vec_id GROUP BY 1, 2
), cov1 AS MATERIALIZED (
  SELECT i, j,
         CAST(floor((sxy / n - (si / n) * (sj / n)) / 1e12 * {q} + 0.5) AS BIGINT) AS cq
  FROM covagg
), v1_0 AS MATERIALIZED (SELECT i, CAST({q} AS BIGINT) AS vq FROM stat)"""
    ]
    for e in (1, 2):
        for t in range(1, rounds + 1):
            parts.append(
                f""", w{e}_{t} AS MATERIALIZED (
  SELECT c.i AS i, SUM(c.cq * v.vq) AS w
  FROM cov{e} c JOIN v{e}_{t - 1} v ON c.j = v.i GROUP BY c.i
), v{e}_{t} AS MATERIALIZED (
  SELECT i, CASE WHEN (SELECT SUM((abs(CAST(w AS BIGINT)) // {q})
                           * (abs(CAST(w AS BIGINT)) // {q}))
                       FROM w{e}_{t}) = 0 THEN CAST(0 AS BIGINT)
       ELSE CAST(floor(CAST(CAST(w AS BIGINT) AS DOUBLE)
        / (SELECT sqrt(CAST(CAST(SUM((abs(CAST(w AS BIGINT)) // {q})
                 * (abs(CAST(w AS BIGINT)) // {q})) AS BIGINT) AS DOUBLE)) * {q}
           FROM w{e}_{t})
        * {q} + 0.5) AS BIGINT) END AS vq
  FROM w{e}_{t}
)"""
            )
        if e == 1:
            parts.append(
                f""", lam1 AS MATERIALIZED (
  SELECT CASE WHEN (SELECT SUM(vq * vq) FROM v1_{rounds}) = 0 THEN 0.0
       ELSE CAST(CAST((SELECT SUM(((va.vq * c.cq) // {q}) * vb.vq)
               FROM cov1 c JOIN v1_{rounds} va ON c.i = va.i
                           JOIN v1_{rounds} vb ON c.j = vb.i) AS BIGINT) AS DOUBLE)
       / CAST(CAST((SELECT SUM(vq * vq) FROM v1_{rounds}) AS BIGINT) AS DOUBLE)
       * {q} END AS lam
), cov2 AS MATERIALIZED (
  SELECT c.i AS i, c.j AS j,
         CAST(floor(CAST(c.cq AS DOUBLE)
              - (SELECT lam FROM lam1) * (CAST(va.vq * vb.vq AS DOUBLE) / 1e12)
              + 0.5) AS BIGINT) AS cq
  FROM cov1 c JOIN v1_{rounds} va ON c.i = va.i JOIN v1_{rounds} vb ON c.j = vb.i
), v2_0 AS MATERIALIZED (SELECT i, CAST({q} AS BIGINT) AS vq FROM stat)"""
            )
    for e in (1, 2):
        parts.append(
            f""", e{e} AS MATERIALIZED (
  SELECT v.i AS i,
         CASE WHEN (SELECT vq FROM v{e}_{rounds}
                    WHERE i = (SELECT i FROM v{e}_{rounds}
                               ORDER BY abs(vq) DESC, i LIMIT 1)) < 0
              THEN -v.vq ELSE v.vq END AS vq
  FROM v{e}_{rounds} v
)"""
        )
    parts.append(
        f""", lam2 AS MATERIALIZED (
  SELECT CASE WHEN (SELECT SUM(vq * vq) FROM v2_{rounds}) = 0 THEN 0.0
       ELSE CAST(CAST((SELECT SUM(((va.vq * c.cq) // {q}) * vb.vq)
               FROM cov2 c JOIN v2_{rounds} va ON c.i = va.i
                           JOIN v2_{rounds} vb ON c.j = vb.i) AS BIGINT) AS DOUBLE)
       / CAST(CAST((SELECT SUM(vq * vq) FROM v2_{rounds}) AS BIGINT) AS DOUBLE)
       * {q} END AS lam
)"""
    )
    return parts



# One driver solve per fixture state per session (the events_era_mid
# cache pattern): embedding_pca_project and embedding_whiten share the
# collected covariance, the deflated iteration, AND the exact mean sums
# -- both probes are pure functions of the embeddings fixture, and the
# oracle replays the full algorithm WITHOUT this cache, so a stale or
# wrong entry cannot survive a hash check. At production scale these
# are the write-once statistics a feature store would pin per snapshot.
_PCA_SOLVE_CACHE: dict[str, tuple] = {}


def _pca_solution(spark: SparkSession, sf_dir: str) -> tuple:
    from connor_fun_streamproducer_spark.catalog import fixture_fingerprint

    key = fixture_fingerprint(sf_dir, "embeddings")
    hit = _PCA_SOLVE_CACHE.get(key)
    if hit is None:
        cov_rows = _covq_frame(spark, sf_dir).collect()  # d^2 = 256 rows
        e1, e2, lam1, lam2 = _pca_components(cov_rows)
        emb = load(spark, sf_dir, "embeddings")
        mean_aggs = [
            F.sum(
                F.floor(
                    F.element_at("embedding", d).cast("double") * _Q + F.lit(0.5)
                ).cast("decimal(38,0)")
            ).alias(f"s{d}")
            for d in range(1, D_SEL + 1)
        ]
        mean_row = emb.agg(F.count("*").alias("n"), *mean_aggs).collect()[0]
        n = int(mean_row["n"])
        sums = [int(mean_row[f"s{d}"]) for d in range(1, D_SEL + 1)]
        hit = (e1, e2, lam1, lam2, n, sums)
        _PCA_SOLVE_CACHE[key] = hit
    return hit


def _pca_oracle(rounds: int = PI_ROUNDS) -> str:
    parts = list(_pca_cte_parts(rounds))
    parts.append(
        f"""
SELECT u.vec_id AS vec_id, emb.label AS label,
  CAST(floor(CAST(CAST(SUM(CAST(u.q * (SELECT n FROM nn) - st.sd AS HUGEINT)
                           * e1.vq) AS BIGINT) AS DOUBLE)
        / (CAST((SELECT n FROM nn) AS DOUBLE) * 1e12) * 10000 + 0.5) AS BIGINT)
        / 10000.0 AS pc1,
  CAST(floor(CAST(CAST(SUM(CAST(u.q * (SELECT n FROM nn) - st.sd AS HUGEINT)
                           * e2.vq) AS BIGINT) AS DOUBLE)
        / (CAST((SELECT n FROM nn) AS DOUBLE) * 1e12) * 10000 + 0.5) AS BIGINT)
        / 10000.0 AS pc2
FROM u
JOIN stat st ON u.i = st.i
JOIN e1 ON u.i = e1.i
JOIN e2 ON u.i = e2.i
JOIN embeddings emb ON emb.vec_id = u.vec_id
GROUP BY u.vec_id, emb.label"""
    )
    return "".join(parts)


@op("embedding_pca_project", oracle=_pca_oracle(), tags=("llm", "embedding", "iterative"))
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto its corpus's top-2 quantized
    principal directions (dims 1..16): (vec_id, label, pc1, pc2).

    Promoted off rows-only in r13 (VERDICT r12 #2): the driver ``eigh``
    is replaced by a PI_ROUNDS-round deflated power iteration on the
    1e-6-quantized 16x16 covariance, every step exact-int + fixed-IEEE,
    so the full algorithm unrolls into the DuckDB oracle as CTE rounds
    and the key is hash-checked end to end.

    Phase 1 (distributed): the one-pass integer Gramian covariance
    (same mapInPandas kernel as embedding_covariance) and the exact
    quantized column sums. Phase 2 (driver, bounded): collect the d^2 =
    256 covq rows — never data — and run the deflated power iteration
    in pure Python (_pca_components). Phase 3 (distributed, map-only):
    pc_k = floor(sum_d (q_d*n - s_d)*vq_kd / (n*1e12) * 1e4 + .5)/1e4
    as one JVM decimal/double expression per component — whole-stage
    codegen, no Python, no shuffle; the numerator is an exact decimal
    sum so the engines cannot diverge on summation order.

    Scale: identical to before the promotion — the corpus is touched by
    exactly one covariance pass, one sums pass, and one map-only
    projection; the iteration itself is O(d^2 * rounds) driver work.
    """
    e1, e2, _lam1, _lam2, n, s = _pca_solution(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.expr(_proj_sql(e1, n, s)).alias("pc1"),
        F.expr(_proj_sql(e2, n, s)).alias("pc2"),
    )


def _proj_sql(vq: list[int], n: int, s: list[int], lam: float | None = None) -> str:
    """The map-only projection (optionally whitened) as ONE SQL fragment
    (OPTIMIZATION_r14 driver-side rule: the Column-DSL build paid ~2 600
    py4j round-trips per component per call). Term for term the same
    expression tree as before: an exact decimal centered dot product in
    left-fold order, cast to double, optionally divided by
    sqrt(lam/1e6), then floored onto the 1e-4 grid."""
    terms = " + ".join(
        f"(CAST(FLOOR(CAST(embedding[{d}] AS DOUBLE) * {int(_Q)} + 0.5D)"
        f" AS DECIMAL(38,0)) * {n} - CAST({int(s[d])} AS DECIMAL(38,0)))"
        f" * {int(vq[d])}"
        for d in range(D_SEL)
    )
    x = f"CAST({terms} AS DOUBLE) / {float(n) * 1e12!r}D"
    if lam is not None:
        x = f"({x}) / sqrt({lam!r}D / {float(1e6)!r}D)"
    return f"CAST(FLOOR(({x}) * 10000 + 0.5D) AS BIGINT) / 10000.0D"


# ---------------------------------------------------------------------------
# PCA whitening of the top-2 subspace (round 14)
# ---------------------------------------------------------------------------


def _whiten_oracle(rounds: int = PI_ROUNDS) -> str:
    """_pca_cte_parts + the whitened final SELECT: each centered
    projection divides by sqrt(lam_k / 1e6) (its component's Rayleigh
    eigenvalue in ORIGINAL units) before the 1e-4 grid floor; a
    non-positive eigenvalue (degenerate spectrum) whitens to 0.0 by
    definition on both engines."""
    parts = list(_pca_cte_parts(rounds))
    raw = (
        "CAST(CAST(SUM(CAST(u.q * (SELECT n FROM nn) - st.sd AS HUGEINT)"
        " * e{e}.vq) AS BIGINT) AS DOUBLE)"
        " / (CAST((SELECT n FROM nn) AS DOUBLE) * 1e12)"
    )
    col = (
        "CASE WHEN (SELECT lam FROM lam{e}) <= 0.0 THEN 0.0"
        " ELSE CAST(floor(" + raw + " / sqrt((SELECT lam FROM lam{e}) / 1e6)"
        " * 10000 + 0.5) AS BIGINT) / 10000.0 END AS w{e}"
    )
    parts.append(
        "\nSELECT u.vec_id AS vec_id, emb.label AS label,\n  "
        + col.replace("{e}", "1")
        + ",\n  "
        + col.replace("{e}", "2")
        + """
FROM u
JOIN stat st ON u.i = st.i
JOIN e1 ON u.i = e1.i
JOIN e2 ON u.i = e2.i
JOIN embeddings emb ON emb.vec_id = u.vec_id
GROUP BY u.vec_id, emb.label"""
    )
    return "".join(parts)


@op("embedding_whiten", oracle=_whiten_oracle(), tags=("llm", "embedding", "iterative"))
def embedding_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-whitened top-2 coordinates per embedding: (vec_id, label,
    w1, w2) with w_k = pc_k / sqrt(lambda_k) — the retrieval
    post-processing step (Jegou et al.'s whitening) that equalizes the
    dominant directions' variance so downstream cosine/L2 comparisons
    stop being ruled by the top component; embedding_pca_project gives
    the raw rotated coordinates, this divides each by its component's
    energy, and embedding_isotropy_pairs measures the anisotropy this
    op removes.

    Exact: the SAME collected 256-row quantized covariance and deflated
    fixed-round power iteration as embedding_pca_project (shared
    _pca_components — ONE driver solve returns directions AND Rayleigh
    eigenvalues); lambda_k enters the plan as a python-float literal
    both engines reproduce from their own replay of the identical
    integer recurrence, the division is one extra fixed-shape float op
    before the 1e-4 grid floor, and a non-positive lambda (degenerate
    spectrum) defines w_k = 0.0 outright instead of dividing by a
    garbage root.

    Scale: identical to embedding_pca_project — one covariance pass,
    one sums pass, one map-only JVM projection; the whitening itself is
    two scalar multiplies per row.
    """
    e1, e2, lam1, lam2, n, s = _pca_solution(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")

    def white(vq: list[int], lam: float) -> F.Column:
        if lam <= 0.0:
            return F.lit(0.0)
        # shared single-parse projection fragment (see _proj_sql) with
        # the whitening division spliced before the grid floor
        return F.expr(_proj_sql(vq, n, s, lam=lam))

    return emb.select(
        "vec_id",
        "label",
        white(e1, lam1).alias("w1"),
        white(e2, lam2).alias("w2"),
    )


# ---------------------------------------------------------------------------
# Matryoshka-style prefix variance curve (round 13)
# ---------------------------------------------------------------------------

_PREFIX_VAR_ORACLE = f"""
WITH u AS (
    SELECT vec_id, i, CAST(floor(CAST(x AS DOUBLE) * {_Q} + 0.5) AS BIGINT) AS q
    FROM (SELECT vec_id, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS i FROM embeddings)
    WHERE i <= {D_SEL}
), covd AS (
    SELECT i,
           CAST(floor((CAST(CAST(sum(q * q) AS BIGINT) AS DOUBLE) / count(*)
                 - (CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / count(*))
                 * (CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / count(*))) / 1e12 * {_Q} + 0.5)
                AS BIGINT) AS var_q
    FROM u GROUP BY i
), tot AS (SELECT sum(var_q) AS t FROM covd)
SELECT CAST(i AS BIGINT) AS dim,
       CAST(var_q AS BIGINT) AS var_q,
       CAST(sum(var_q) OVER (ORDER BY i) * 10000 // t.t AS BIGINT)
           AS cum_var_share_bp
FROM covd CROSS JOIN tot t
"""


@op(
    "embedding_prefix_variance",
    oracle=_PREFIX_VAR_ORACLE,
    tags=("llm", "embedding"),
)
def embedding_prefix_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative variance captured by each PREFIX of the embedding
    dimensions (dims 1..16) — the Matryoshka/MRL question: "if we
    truncate every vector to its first k dims to cut index cost 4×,
    what share of total variance survives?" A flat early curve means
    truncation is safe; mass concentrated in late dims means the
    embedding was not trained nested and truncation will crater
    recall (sim_search_* at a shorter D_SEL). Reads the same quantized
    per-dimension variances as embedding_covariance's diagonal.

    Exact: per-dim variance quantized to the 1e-6 grid with
    floor-half-up over exact integer moments (the covq discipline);
    cumulative shares are integral basis-point division over a 16-row
    frame.

    Scale: one scan → 16 variance cells (map-side partials; the
    mapInPandas Gramian kernel's diagonal would serve equally) →
    16-row window. Output is D_SEL rows.
    """
    emb = load(spark, sf_dir, "embeddings").select("embedding")
    cells = emb.select(
        F.posexplode(F.slice("embedding", 1, D_SEL)).alias("i0", "x")
    ).select(
        (F.col("i0") + 1).alias("i"),
        F.floor(F.col("x").cast("double") * _Q + F.lit(0.5))
        .cast("bigint")
        .alias("q"),
    )
    nd = F.count("*")
    covd = cells.groupBy("i").agg(
        F.floor(
            (
                F.sum(F.col("q") * F.col("q")).cast("double") / nd
                - (F.sum("q").cast("double") / nd)
                * (F.sum("q").cast("double") / nd)
            )
            / F.lit(1e12)
            * F.lit(float(_Q))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("var_q")
    )
    tot = covd.agg(F.sum("var_q").alias("t"))
    from pyspark.sql.window import Window

    from connor_fun_streamproducer_spark.catalog import dim_window

    wc = dim_window(
        Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0),
        bound=f"{D_SEL} dimension rows",
    )
    cum = (F.sum("var_q").over(wc) * 10000).alias("_cum10k")
    return (
        covd.crossJoin(F.broadcast(tot))
        .select(
            F.col("i").cast("bigint").alias("dim"),
            F.col("var_q").cast("bigint").alias("var_q"),
            cum,
            "t",
        )
        .select(
            "dim",
            "var_q",
            F.expr("_cum10k div t").cast("bigint").alias("cum_var_share_bp"),
        )
    )
