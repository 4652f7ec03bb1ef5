"""Distributed k-means clustering over the embedding corpus.

The corpus-curation step between dedup and sampling: cluster the
embedding space, then balance/downsample per cluster (semdedup-style
curation, Abbas et al. 2023 — cluster first, prune within clusters).
``sample_mix_target`` (llm/corpus.py) consumes exactly this kind of
per-group assignment.

Spark-first design (Lloyd's algorithm, no MLlib dependency, no RDDs):

- **Assignment is JVM-side.** Centroids are k×dim literals (k=8, dim=64
  — a few KB) baked into a whole-stage-codegen expression per iteration:
  squared L2 via ``zip_with`` + ``aggregate`` HOFs, argmin via
  ``array_min`` over (dist, cid) structs (struct comparison orders by
  dist then cid — deterministic tie-break). Zero Python in the hot path,
  zero shuffle for assignment.
- **Update is one keyed shuffle.** ``posexplode(embedding)`` →
  ``groupBy(cluster, pos).avg`` computes the element-wise mean with
  map-side partials; only k×dim aggregated rows come back to the driver
  (the same bounded-collect contract as the IVF codebook,
  llm/similarity.py — O(k·dim), never O(n)).
- **Centroids are quantized** to 1e-4 with the repo's floor idiom each
  round: double summation order varies run to run at scale, and an
  un-quantized last-ulp wobble near a Voronoi boundary could flip an
  assignment — quantization makes the fixpoint bit-reproducible.
- **Iteration lineage is cut** by re-building each round's assignment
  from the ONE cached base frame + new literals (the plan never nests:
  round i's plan is identical in shape to round 0's), so 100 rounds at
  100 TB would not blow up the optimizer the way naive iterative
  DataFrame reuse does.

The reference has no clustering (its stream is unmodeled payload —
regionSpout.go:152); this is EXT-tier corpus tooling per SURVEY §2.
Iterative fixpoint ⇒ no single-statement ANSI oracle (sanctioned
rows-only check); tests/test_llm.py pins determinism, convergence
(monotone non-increasing inertia), and exact agreement with a NumPy
re-implementation on the same init.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op

K_CLUSTERS = 8
N_ITERS = 4
_Q = 10000  # centroid quantization: floor(x*_Q + 0.5)/_Q


def _quantize(x: float) -> float:
    import math

    return math.floor(x * _Q + 0.5) / _Q


def _assign_expr(centroids: list[list[float]]):
    """(dist, cid) argmin over centroid literals — pure JVM HOFs."""
    candidates = []
    for cid, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(v)) for v in c])
        d = F.aggregate(
            F.zip_with("embedding", carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        candidates.append(F.struct(d.alias("dist"), F.lit(cid).alias("cid")))
    best = F.array_min(F.array(*candidates))
    return best["cid"].alias("cluster"), best["dist"].alias("dist")


def kmeans_assignments(
    spark: SparkSession, sf_dir: str, k: int = K_CLUSTERS, n_iters: int = N_ITERS
) -> tuple[DataFrame, list[float]]:
    """Run Lloyd's k-means; return (assignments df, per-round inertia).

    Init is deterministic: the embeddings of the k lowest vec_ids.
    Inertia history is computed from the SAME aggregate that updates the
    centroids (no extra pass) and is returned for the convergence test.
    """
    base = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .cache()
    )
    seed_rows = base.orderBy("vec_id").limit(k).collect()  # k rows — dim-scale
    centroids = [[_quantize(float(v)) for v in r.embedding] for r in seed_rows]

    inertia_history: list[float] = []
    assigned = None
    for _ in range(n_iters):
        cluster_col, dist_col = _assign_expr(centroids)
        assigned = base.select("vec_id", "embedding", cluster_col, dist_col)
        # One shuffle: element-wise mean + inertia, map-side partials first.
        stats = (
            assigned.select("cluster", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
        )
        upd = (
            stats.groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
            .collect()
        )  # k rows of k×dim means — bounded collect, codebook contract
        inertia = (
            assigned.agg(F.sum("dist").alias("i")).collect()[0]["i"]
        )
        inertia_history.append(round(inertia, 2))
        for r in upd:
            centroids[r.cluster] = [_quantize(float(s.m)) for s in r.ms]
    # The cache is an ITERATION-scope artifact: release it before
    # returning, or it leaks session-wide — every later plan over the
    # same embeddings scan silently swaps to InMemoryTableScan (observed
    # as plan-snapshot drift), and at 100 TB it pins the corpus in
    # executor storage memory forever. The returned frame recomputes one
    # cheap scan instead.
    base.unpersist()
    return assigned.select("vec_id", "cluster", "dist"), inertia_history


@op("embedding_cluster_kmeans", oracle=None, tags=("ext", "llm", "iterative", "scale"))
def embedding_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster summary after 4 deterministic Lloyd rounds (k=8).

    Returns (cluster, n_members, inertia) — cluster sizes and the
    quantized within-cluster sum of squared distances. Row shape is
    O(k), stable across runs by construction (quantized centroids +
    struct-ordered argmin tie-break).
    """
    assigned, _ = kmeans_assignments(spark, sf_dir)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            (F.floor(F.sum("dist") * 100 + 0.5) / 100).alias("inertia"),
        )
        .orderBy("cluster")
    )
