"""Focused pins for the round-14 optimization rewrites.

Every rewrite this round claims BIT-IDENTICAL results through a cheaper
construction (SQL-text parses instead of py4j-built Column trees; hoisted
per-side norms instead of per-pair re-folds; a single-parse shard sum in
distributed_rank). The DuckDB oracles prove end-to-end equality per op;
these tests pin the EQUIVALENCE CLAIMS themselves at the kernel level, so
a future edit that breaks one shows up here with a readable diff instead
of as a mysterious hash mismatch three layers up.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.llm.similarity import (
    _dbl,
    cosine_expr,
    dot_expr,
    dot_pre,
    norm_expr,
)
from connor_fun_streamproducer_spark.operators.scale_patterns import (
    distributed_rank,
)


def _vec_frame(spark):
    rows = [
        (i, [((i * 37 + d * 13) % 101 - 50) / 7.0 for d in range(8)])
        for i in range(24)
    ]
    return spark.createDataFrame(rows, "id bigint, v array<float>")


def test_sql_kernels_bit_equal_lambda_kernels(spark):
    """The SQL-text dot/norm/cosine kernels evaluate bit-identically to
    the Column-DSL lambda forms they replaced (same fold, same operand
    order — not approximately: exactly)."""
    df = _vec_frame(spark).withColumn("w", F.reverse("v"))

    def lam_dbl(col):
        return F.transform(col, lambda x: x.cast("double"))

    lam_dot = F.aggregate(
        F.zip_with(lam_dbl(F.col("v")), lam_dbl(F.col("w")), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lam_norm = F.sqrt(
        F.aggregate(lam_dbl(F.col("v")), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    lam_cos = lam_dot / (lam_norm * F.sqrt(
        F.aggregate(lam_dbl(F.col("w")), F.lit(0.0), lambda acc, x: acc + x * x)
    ))
    got = df.select(
        (dot_expr("v", "w") == lam_dot).alias("dot_eq"),
        (norm_expr("v") == lam_norm).alias("norm_eq"),
        (cosine_expr("v", "w") == lam_cos).alias("cos_eq"),
        (
            dot_pre(
                "transform(v, x -> cast(x as double))",
                "transform(w, x -> cast(x as double))",
            )
            == lam_dot
        ).alias("pre_eq"),
    ).collect()
    for r in got:
        assert r["dot_eq"] and r["norm_eq"] and r["cos_eq"] and r["pre_eq"], r


def test_brute_pairs_norm_hoist_is_exact(spark):
    """Hoisting the per-side norm out of the pair must reproduce the
    per-pair cosine bit-for-bit: sim = dot/(q_norm·c_norm) with the
    norms computed once per side."""
    df = _vec_frame(spark)
    q = df.select(
        F.col("id").alias("qid"),
        _dbl("v").alias("qd"),
        norm_expr("v").alias("qn"),
    )
    c = df.select(
        F.col("id").alias("cid"),
        F.col("v").alias("cv"),
        _dbl("v").alias("cd"),
        norm_expr("v").alias("cn"),
    )
    pairs = c.join(F.broadcast(q), F.col("cid") != F.col("qid"))
    hoisted = dot_pre("qd", "cd") / (F.col("qn") * F.col("cn"))
    # the pre-hoist form, re-folding norms per pair on the same columns
    qv = q.select("qid", F.col("qd").alias("qv_raw"))
    inline = pairs.select(
        "qid",
        "cid",
        hoisted.alias("h"),
        (
            dot_pre("qd", "cd")
            / (
                F.sqrt(F.aggregate(F.col("qd"), F.lit(0.0), lambda a, x: a + x * x))
                * F.sqrt(F.aggregate(F.col("cd"), F.lit(0.0), lambda a, x: a + x * x))
            )
        ).alias("i"),
    )
    bad = inline.filter(F.col("h") != F.col("i")).count()
    assert bad == 0


def test_distributed_rank_sql_shard_exact(spark):
    """The single-parse shard sum must still produce an exact 1..n
    permutation per group (Σ rk = n(n+1)/2) on a value set with heavy
    ties and multiple groups."""
    rows = [(g, (i * 7) % 13, i) for g in ("a", "b") for i in range(200)]
    df = spark.createDataFrame(rows, "g string, k bigint, tb bigint")
    r = distributed_rank(df, "k", ["tb"], partition_cols=["g"])
    got = r.groupBy("g").agg(
        F.sum("rk").alias("s"), F.count("*").alias("n"), F.max("rk").alias("mx")
    ).collect()
    for row in got:
        n = row["n"]
        assert row["s"] == n * (n + 1) // 2, row
        assert row["mx"] == n, row


def test_distributed_rank_float_key_shard(spark):
    """Float keys route through the D-literal cut formatting — ranks
    must stay an exact permutation there too."""
    rows = [(float(((i * 31) % 17) - 8) / 3.0, i) for i in range(150)]
    df = spark.createDataFrame(rows, "k double, tb bigint")
    r = distributed_rank(df, "k", ["tb"])
    row = r.agg(F.sum("rk").alias("s"), F.count("*").alias("n")).collect()[0]
    assert row["s"] == row["n"] * (row["n"] + 1) // 2
