"""Similarity search over ``embeddings.embedding`` (ARRAY<FLOAT>, 64-d).

Two paths (SURVEY.md §2.2):

- ``sim_search_topk``  — brute-force exact top-k: broadcast the query set,
  score every (query, candidate) with a JVM cosine kernel, keep top-k per
  query. The 100 TB baseline: one pass over the corpus, no shuffle of the
  corpus side, O(|queries| · dim) work per row.
- ``sim_search_lsh``   — random-hyperplane LSH: 16 signed projections →
  16-bit bucket; candidates share a bucket in any of 4 hyperplane groups;
  exact re-rank of candidates only. The scale path when |queries| is
  large: pairing is per-bucket (equi-join), never corpus × queries.
- ``sim_search_ivf``   — IVF-style coarse quantization: a tiny codebook of
  normalized centroids (stride-sampled from the corpus; k-means offline in
  production), every vector assigned to its nearest cell (argmax over a
  JVM-evaluated dot-product array — the inverted-file key), queries probe
  their ``n_probe_for(cells)`` nearest cells, and only same-cell candidates are
  re-ranked exactly. At 100 TB the cell id is a partition/bucket column:
  the probe join is an equi-join that prunes the corpus scan to
  nprobe/ncells of the data.

The cosine kernel is pure ``zip_with``/``aggregate`` — no Python, no UDF,
float→double widened elementwise. Higher-order functions are
CodegenFallback (they exclude their stage from whole-stage codegen), but
evaluation stays JVM-side with zero serialization; the Pandas-UDF variant
was measured-and-rejected — Arrow transfer dominates at 64 dims.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op

K = 5
N_QUERIES = 10  # query set: vec_id < 10

# Exact brute-force top-K as a SQL CTE body — the truth side of the ANN
# recall companions, shared verbatim by _ivf_oracle and _lsh_oracle so
# the two oracles can never disagree on what "exact" means (the
# _with_recall_companions twin on the SQL side).
_EXACT_TOPK_CTE = f"""exact AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM embeddings q
    JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY round(
            list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
            / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))),
            6) DESC,
        c.vec_id
    ) <= {K}
)"""


# The cosine/fold kernels build their expression trees from SQL TEXT, not
# the Column DSL (OPTIMIZATION_r14, guide §7.3 driver-side work): every
# pyspark lambda-HOF (``F.aggregate``/``F.zip_with``/``F.transform``) costs
# ~60 ms of py4j round-trips to CONSTRUCT — per query build, every bench
# rep — while ``F.expr`` hands the whole fragment to the SQL parser in one
# call (~4 ms, measured). The parsed plan is identical expression for
# expression (same fold, same operand order), so results are bit-equal;
# the inputs are SQL column fragments (possibly alias-qualified), which is
# why these helpers take ``str`` rather than ``Column``.


def _dbl_sql(col: str) -> str:
    return f"transform({col}, x -> cast(x as double))"


def _dbl(col: str) -> Column:
    return F.expr(_dbl_sql(col))


def _dot_sql(a: str, b: str) -> str:
    """Σ aᵢ·bᵢ over pre-cast double arrays, left-to-right fold."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"


def dot_expr(a: str, b: str) -> Column:
    """Σ aᵢ·bᵢ in double, elementwise left-to-right (oracle-parity order)."""
    return F.expr(_dot_sql(_dbl_sql(a), _dbl_sql(b)))


def dot_pre(a: str, b: str) -> Column:
    """``dot_expr`` over ALREADY double-cast arrays — same fold, same op
    order, minus the per-pair element casts (pair them with ``_dbl``
    hoisted to the per-SIDE projection; see ``_brute_pairs``)."""
    return F.expr(_dot_sql(a, b))


def _norm_sql(a: str) -> str:
    return f"sqrt(aggregate({_dbl_sql(a)}, 0.0D, (acc, x) -> acc + x * x))"


def norm_expr(a: str) -> Column:
    return F.expr(_norm_sql(a))


def cosine_expr(a: str, b: str) -> Column:
    return F.expr(
        f"{_dot_sql(_dbl_sql(a), _dbl_sql(b))} / ({_norm_sql(a)} * {_norm_sql(b)})"
    )


def _brute_pairs(e: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, sim) for corpus × broadcast-query exact
    cosine — the shared prologue of sim_search_topk / sim_margin_profile
    / sim_search_radius, with per-SIDE hoisting (OPTIMIZATION_r14, guide
    §1.2 "per-task work"): ``cosine_expr`` on the joined pair re-folds
    both vector norms and re-casts both arrays PER PAIR (~5 interpreted
    64-element passes per candidate row, |corpus|×|queries| times).
    Casting and norm-folding once per SIDE leaves only the dot fold on
    the pair. Float-identical to the oracle: the hoisted expressions are
    the same subtrees evaluated on the same doubles in the same order —
    sim = dot/(q_norm · c_norm) with unchanged operand order."""
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        _dbl("embedding").alias("qd"),
        norm_expr("embedding").alias("q_norm"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        _dbl("embedding").alias("cd"),
        norm_expr("embedding").alias("c_norm"),
    )
    return c.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        (dot_pre("qd", "cd") / (F.col("q_norm") * F.col("c_norm"))).alias("sim"),
    )


@op(
    "sim_search_topk",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))
                   AS sim
        FROM embeddings q
        JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY round(sim, 6) DESC, neighbor_id) <= {K}
    """,
    tags=("llm", "similarity"),
)
def sim_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k for a broadcast query set.

    Plan shape: corpus scan → BroadcastNestedLoopJoin against the tiny
    query set → JVM cosine kernel → per-query top-k window. Ranking ties
    are broken on (round(sim,6), neighbor_id) so both engines order
    identically despite last-ulp float drift.
    """
    scored = _brute_pairs(load(spark, sf_dir, "embeddings"))
    w = Window.partitionBy("query_id").orderBy(F.desc(F.round("sim", 6)), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


@op(
    "sim_search_topk_arrow",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))
                   AS sim
        FROM embeddings q
        JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY round(sim, 6) DESC, neighbor_id) <= {K}
    """,
    tags=("llm", "similarity", "scale"),
)
def sim_search_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k with an Arrow-batched matmul kernel.

    Same semantics and oracle as sim_search_topk, different physical
    kernel: the query matrix (nq × dim, L2-normalized) is captured in the
    mapInPandas closure (broadcast-by-serialization — it is codebook-
    sized), and each Arrow batch of corpus vectors is scored as ONE numpy
    matmul (BLAS) followed by a per-batch argpartition that keeps only K
    candidates per query per batch; a final per-query window merges batch
    winners. Measured best-of-3 at sf0.1: 0.24 s vs 0.62 s for the
    zip_with/aggregate JVM expression — higher-order functions are
    CodegenFallback (interpreted per element), while the Arrow path is
    one vectorized BLAS call per batch. This is the production shape for
    dense scoring at 100 TB: per-partition candidate pruning bounds the
    window input to K × partitions × queries rows, and the matmul cost is
    the floor for exact scoring. Ranking ties break on (round(sim, 6),
    neighbor_id) on both sides, which also absorbs the last-ulp summation
    -order drift between BLAS and the oracle's sequential fold.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    e = load(spark, sf_dir, "embeddings")
    qrows = (
        e.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding").collect()
    )
    qids = [int(r["vec_id"]) for r in qrows]
    Q = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            M = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
            S = Qn @ Mn.T  # nq × batch cosine matrix, one BLAS call
            k = min(K + 1, S.shape[1])  # +1: a query may see itself in-batch
            idx = np.argpartition(-S, k - 1, axis=1)[:, :k]
            rows = [
                (qids[qi], int(ids[j]), float(S[qi, j]))
                for qi in range(S.shape[0])
                for j in idx[qi]
                if int(ids[j]) != qids[qi]
            ]
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"])

    cand = e.select("vec_id", "embedding").mapInPandas(kernel, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc(F.round("sim", 6)), F.asc("neighbor_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


N_CELLS_MIN = 8   # floor so a tiny fixture still exercises multi-cell paths
PROBE_DIVISOR = 4  # probe ~1/4 of the cells per query (recall/cost dial)


def n_cells_for(corpus_rows: int) -> int:
    """Coarse codebook size derived from corpus size: max(8, ⌊√n⌋).

    A FIXED cell count makes in-cell work quadratic as the corpus grows
    (cells hold n/const vectors each — VERDICT r3 wrong#2); O(√n) cells
    keep per-cell population at √n, so in-cell pairing is n^1.5 total and
    the per-query probe cost shrinks as the corpus grows. Production
    swaps the stride-sampled codebook for offline k-means at the same
    cardinality."""
    import math

    return max(N_CELLS_MIN, math.isqrt(max(corpus_rows, 1)))


def n_probe_for(n_cells: int) -> int:
    """Cells probed per query: a constant FRACTION (~1/4) of the codebook,
    not a constant count — keeps recall comparable across corpus sizes
    while still pruning the scan to ~25% of the data."""
    return max(2, -(-n_cells // PROBE_DIVISOR))


_CORPUS_ROWS_CACHE: dict[str, int] = {}


def _corpus_rows(spark: SparkSession, sf_dir: str) -> int:
    fp = _corpus_fingerprint(sf_dir)
    if fp not in _CORPUS_ROWS_CACHE:
        _CORPUS_ROWS_CACHE[fp] = load(spark, sf_dir, "embeddings").count()
    return _CORPUS_ROWS_CACHE[fp]

# On-disk inverted files live under the repo root, one directory per corpus
# fingerprint (never under /root/testdata, which is read-only).
_INDEX_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".ivf_index",
)


def _corpus_fingerprint(sf_dir: str) -> str:
    """Identity of the embeddings fixture (catalog.fixture_fingerprint:
    path + mtime + size + a first/last-4KiB content probe — r10 ADVICE).

    Keys both the in-process codebook cache and the on-disk inverted file,
    so a fixture that changes under the same path invalidates both instead
    of silently serving stale cell assignments."""
    from connor_fun_streamproducer_spark.catalog import fixture_fingerprint

    return fixture_fingerprint(sf_dir, "embeddings")


_CODEBOOK_CACHE: dict[str, list[list[float]]] = {}


def _fold_norm(v) -> float:
    """L2 norm as a LEFT-TO-RIGHT float64 fold — the exact summation
    order Spark's ``aggregate(.., 0.0, (a,x) -> a + x*x)`` and DuckDB's
    ``list_reduce(list_transform(e, y -> y*y), (a,b) -> a+b)`` both use
    (0.0 + x == x exactly, so the no-init reduce matches too). numpy's
    ``linalg.norm`` pairwise/BLAS summation would drift last-ulp from
    the engines; this fold is bit-identical to both, which is what lets
    the IVF codebook be replayed inside a SQL oracle."""
    import math

    acc = 0.0
    for x in v:
        acc += x * x
    return math.sqrt(acc)


def _round6(x: float) -> float:
    """round(x, 6) with Spark/DuckDB semantics: HALF_UP on the shortest
    decimal representation (Spark rounds BigDecimal.valueOf(double),
    which is Double.toString-based — same as Python's repr)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _codebook(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """Deterministic coarse codebook: stride-sample ``n_cells_for(n)``
    corpus vectors (excluding the query set) and L2-normalize them, so
    nearest cell by dot product == nearest by cosine. Tiny driver collect
    (cells × dim floats — O(√n), still codebook-scale at 100 TB), cached
    per corpus fingerprint — exactly how a production pipeline treats its
    offline k-means codebook (train once, broadcast everywhere)."""
    fp = _corpus_fingerprint(sf_dir)
    if fp in _CODEBOOK_CACHE:
        return _CODEBOOK_CACHE[fp]
    e = load(spark, sf_dir, "embeddings")
    n = _corpus_rows(spark, sf_dir)
    k = n_cells_for(n)
    stride = max(1, (n - N_QUERIES) // k)
    rows = (
        e.filter(
            (F.col("vec_id") >= N_QUERIES)
            & ((F.col("vec_id") - N_QUERIES) % stride == 0)
        )
        .orderBy("vec_id")
        .limit(k)
        .collect()
    )
    cents = []
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        n = _fold_norm(v)  # fold order matters: see _fold_norm
        cents.append([x / n for x in v] if n > 0 else v)
    _CODEBOOK_CACHE[fp] = cents
    return cents


def _cell_sims(cents: list[list[float]]) -> Column:
    """ARRAY<STRUCT<sim,cell>> of dot products against every centroid —
    one JVM-side expression; struct ordering makes array_max an argmax.
    The sim is ROUNDED to 6 dp before it enters the struct: argmax on
    raw doubles would flip cells on last-ulp drift between engines,
    while (round(sim,6) desc, cell desc — array_max's lexicographic
    tie) is a total order a SQL oracle replays exactly."""
    sims = []
    for i, c in enumerate(cents):
        arr = "array(" + ", ".join(f"{v!r}D" for v in c) + ")"
        d = F.expr(_dot_sql(_dbl_sql("embedding"), arr))
        sims.append(F.struct(F.round(d, 6).alias("sim"), F.lit(i).alias("cell")))
    return F.array(*sims)


def ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized inverted file: corpus written partitioned by cell.

    Build-once/serve-many: the first call assigns every corpus vector its
    nearest-centroid cell (argmax over the codebook's dot products, one JVM
    expression) and writes the corpus to parquet ``partitionBy("cell")``;
    later calls just read it. This is the offline index build of a
    production ANN pipeline — at 100 TB it is the bucketed-table write,
    and the per-row assignment cost is paid once, not per query. A probe
    filter ``cell IN (...)`` on the returned frame partition-prunes the
    scan to nprobe/ncells of the corpus (asserted in tests/test_plans.py).

    The index directory is keyed by the corpus fingerprint (path + mtime +
    size), so a changed fixture rebuilds instead of serving stale cells.
    The build is atomic: it writes to a process-unique staging directory
    and ``os.rename``s it into the fingerprint path, so a concurrent
    reader sees either no index (and builds its own staging copy) or a
    complete one — never a half-written/half-deleted directory. A losing
    racer's rename fails (destination exists) and its staging dir is
    discarded; both racers built identical content, so serving the
    winner's is correct.
    """
    cents = _codebook(spark, sf_dir)
    # Cell count participates in the index identity: a change in the
    # derived codebook cardinality (n_cells_for) must rebuild the layout,
    # not serve a stale one written under the old geometry. The trailing
    # version tag is the ASSIGNMENT-RULE identity — v2 = rounded argmax
    # (see _cell_sims) — so an index written under an older rule can
    # never be served to code expecting the new one.
    path = os.path.join(
        _INDEX_ROOT, f"{_corpus_fingerprint(sf_dir)}-c{len(cents)}-v2"
    )
    if not os.path.isfile(os.path.join(path, "_SUCCESS")):
        from connor_fun_streamproducer_spark.catalog import _prune_superseded

        import time as _time

        t_build = _time.perf_counter()
        e = load(spark, sf_dir, "embeddings")
        staging = f"{path}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        try:
            (
                e.withColumn("cell", F.array_max(_cell_sims(cents)).getField("cell"))
                # precomputed L2 norm: serving divides by it instead of
                # re-aggregating 64 squares per candidate per query
                .withColumn("norm", norm_expr("embedding"))
                # one output file per cell at fixture scale (at 100 TB: drop
                # this and let each cell hold many executor-sized files)
                .repartition("cell")
                .write.mode("overwrite")
                .partitionBy("cell")
                .parquet(staging)
            )
            try:
                os.rename(staging, path)
            except OSError:
                if not os.path.isfile(os.path.join(path, "_SUCCESS")):
                    raise  # destination absent AND rename failed → real error
        finally:
            # failed build or lost race: the staging dir is garbage
            shutil.rmtree(staging, ignore_errors=True)
        _prune_superseded(path)
        INDEX_EVENTS.append(
            {
                "artifact": os.path.basename(path),
                "served": "built",
                "build_sec": round(_time.perf_counter() - t_build, 3),
            }
        )
    elif not any(ev["artifact"] == os.path.basename(path) for ev in INDEX_EVENTS):
        INDEX_EVENTS.append({"artifact": os.path.basename(path), "served": "warm"})
    per_session = _INDEX_DF_CACHE.setdefault(spark, {})
    df = per_session.get(path)
    if df is None:
        # One file-listing/schema pass per (session, artifact), not one
        # per serving call — the handle is a lazy scan plan, zero rows.
        df = spark.read.parquet(path)
        per_session[path] = df
    return df


_ROUTED_CACHE: dict[str, list[tuple]] = {}
_EXACT_TOPK_CACHE: dict[str, list[tuple]] = {}

# Per-session DataFrame handles for the served inverted file and the routed
# query set (VERDICT r14 #1: sim_search_ivf regressed and its serving path
# paid a fresh spark.read.parquet listing/schema pass + a 10·n_probe-row
# createDataFrame pickle per CALL for frames that are pure functions of
# (session, index path / corpus fingerprint)). These cache CONSTRUCTION
# only — lazy plans, no rows; every action still computes from parquet.
# WeakKeyDictionary so a stopped session's handles die with it.
import weakref as _weakref

_INDEX_DF_CACHE: "_weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    _weakref.WeakKeyDictionary()
)
_Q_FRAME_CACHE: "_weakref.WeakKeyDictionary[SparkSession, dict[str, tuple[DataFrame, list[int]]]]" = (
    _weakref.WeakKeyDictionary()
)

# Build/serve transparency for the on-disk inverted file (VERDICT r14 #7):
# every ivf_index call records whether it served the artifact warm or paid
# the build, and bench.py surfaces the events in its sidecar.
INDEX_EVENTS: list[dict] = []


def _exact_topk_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact brute-force top-K pairs as a tiny literal frame —
    computed ONCE per corpus fingerprint (the _ROUTED_CACHE/_codebook
    discipline) and broadcast into the ANN ops' recall joins. The truth
    set is an EVAL artifact of the fixed query set (N_QUERIES·K rows):
    recomputing a corpus-wide brute force inside every ANN call would
    charge each approximate query the exact query's full cost, which is
    precisely the cost the approximate op exists to avoid."""
    fp = _corpus_fingerprint(sf_dir)
    if fp not in _EXACT_TOPK_CACHE:
        _EXACT_TOPK_CACHE[fp] = [
            (int(r["query_id"]), int(r["neighbor_id"]))
            for r in sim_search_topk(spark, sf_dir)
            .select("query_id", "neighbor_id")
            .collect()
        ]
    return spark.createDataFrame(
        _EXACT_TOPK_CACHE[fp], "query_id bigint, neighbor_id bigint"
    ).withColumn("hit", F.lit(True))


def _with_recall_companions(
    spark: SparkSession, sf_dir: str, retrieved: DataFrame
) -> DataFrame:
    """Append hit + per-query recall_bp vs the exact top-K truth to an
    ANN result frame (query_id, neighbor_id, sim) — ONE implementation
    shared by sim_search_ivf and sim_search_lsh (the _mhb_stages
    discipline: recall semantics edited once can never desynchronize
    the two ops)."""
    exact = _exact_topk_truth(spark, sf_dir)
    wq = Window.partitionBy("query_id")
    return (
        retrieved.join(F.broadcast(exact), ["query_id", "neighbor_id"], "left")
        .fillna(False, ["hit"])
        .withColumn("nh", F.count(F.when(F.col("hit"), 1)).over(wq))
        .select(
            "query_id",
            "neighbor_id",
            "sim",
            "hit",
            F.expr(f"nh * 10000 div {K}").cast("bigint").alias("recall_bp"),
        )
    )


def _routed_queries(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """The fixture's query set, routed: (query_id, probed cell, embedding,
    L2 norm) per (query × n_probe). Routing runs driver-side against the
    in-memory codebook — nearest cells by dot product with the normalized
    centroids (== cosine order) — the way production ANN serving routes
    requests it already holds in memory. Reading the queries out of the
    corpus parquet is a fixture artifact, so the routed set is cached per
    corpus fingerprint alongside the codebook."""
    fp = _corpus_fingerprint(sf_dir)
    if fp in _ROUTED_CACHE:
        return _ROUTED_CACHE[fp]
    C = _codebook(spark, sf_dir)  # n_cells × dim, already L2-normalized
    n_probe = n_probe_for(len(C))
    qrows = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    probes = []
    for r in qrows:
        v = [float(x) for x in r["embedding"]]
        # Left-fold dots + HALF_UP 6dp rounding + (sim desc, cell asc)
        # total order: the same routing decision the SQL oracle replays
        # (a BLAS matmul's summation order would not be) — see
        # _fold_norm/_round6.
        sims = []
        for cell, cent in enumerate(C):
            acc = 0.0
            for x, y in zip(v, cent):
                acc += x * y
            sims.append((-_round6(acc), cell))
        order = [cell for _, cell in sorted(sims)[:n_probe]]
        qn = _fold_norm(v)
        probes.extend((r["vec_id"], int(cell), v, qn) for cell in order)
    _ROUTED_CACHE[fp] = probes
    return probes


def _routed_query_frame(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[int]]:
    """The routed query set as a broadcast-ready literal DataFrame plus
    its probed-cell list, cached per (session, corpus fingerprint): the
    10·n_probe-row createDataFrame pickle is a pure function of both keys
    and cost a py4j round-trip storm on EVERY serving call (VERDICT r14
    #1). ``q_emb`` is declared ARRAY<DOUBLE>: the Python floats are exact
    float32 values read from the fixture, so this equals the old
    ARRAY<FLOAT> column under the per-pair cast-to-double — the cast is
    hoisted into the literal, same doubles, same fold downstream."""
    fp = _corpus_fingerprint(sf_dir)
    per_session = _Q_FRAME_CACHE.setdefault(spark, {})
    hit = per_session.get(fp)
    if hit is None:
        probes = _routed_queries(spark, sf_dir)
        q = spark.createDataFrame(
            probes,
            schema="query_id bigint, cell int, q_emb array<double>, q_norm double",
        )
        hit = (q, sorted({cell for _, cell, _, _ in probes}))
        per_session[fp] = hit
    return hit


def _ivf_cellmap_ctes() -> str:
    """par0 → cellmap: DuckDB replay of the IVF codebook derivation
    (stride sample → fold-norm L2 normalize, integer-exact cell count)
    and corpus cell assignment (rounded-dot argmax, cell-desc tie — the
    v2 index rule). ONE definition shared by _ivf_oracle and
    _embdedup_oracle so the two can never disagree on what the index
    contains (the _mhb_ctes discipline)."""
    return f"""
WITH par0 AS (
    SELECT count(*) AS n, CAST(floor(sqrt(count(*))) AS BIGINT) AS s
    FROM embeddings
), par AS (
    -- integer-exact isqrt: floor(sqrt(double)) can drift ±1 from
    -- math.isqrt near perfect squares at ~4.5e15 rows; the two CASE
    -- corrections pin k to the Python side's value at any n (ADVICE r8)
    SELECT n,
           greatest({N_CELLS_MIN},
                    s - (CASE WHEN s * s > n THEN 1 ELSE 0 END)
                      + (CASE WHEN (s + 1) * (s + 1) <= n THEN 1 ELSE 0 END)) AS k
    FROM par0
), par2 AS (
    SELECT n, k,
           greatest(1, (n - {N_QUERIES}) // k) AS stride,
           greatest(2, CAST(ceil(CAST(k AS DOUBLE) / {PROBE_DIVISOR}) AS BIGINT)) AS npr
    FROM par
), cb0 AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
           row_number() OVER (ORDER BY vec_id) AS rn
    FROM embeddings, par2
    WHERE vec_id >= {N_QUERIES} AND (vec_id - {N_QUERIES}) % stride = 0
), cbn AS (
    SELECT rn, e,
           sqrt(list_reduce(list_transform(e, y -> y * y), (a, b) -> a + b)) AS nrm
    FROM cb0, par2 WHERE rn <= k
), cb AS (
    -- zero-norm guard mirrors _codebook: a zero vector stays raw instead
    -- of becoming NaN centroids and desyncing the engines (ADVICE r8)
    SELECT rn - 1 AS cell,
           CASE WHEN nrm > 0 THEN list_transform(e, x -> x / nrm) ELSE e END AS cent
    FROM cbn
), vec AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
           sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), y -> y * y),
                            (a, b) -> a + b)) AS nrm
    FROM embeddings
), asn AS (
    SELECT v.vec_id, v.e, v.nrm, c.cell,
           row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY round(list_dot_product(v.e, c.cent), 6) DESC, c.cell DESC
           ) AS rn
    FROM vec v CROSS JOIN cb c
), cellmap AS (
    SELECT vec_id, e, nrm, cell FROM asn WHERE rn = 1)
"""


def _ivf_oracle() -> str:
    """DuckDB replay of the ENTIRE IVF decision chain — the shared
    codebook/cell-assignment replay (_ivf_cellmap_ctes), query routing
    (top-n_probe cells, rounded-dot desc / cell asc), pruned candidate
    re-rank, and the exact-top-k recall companions. Possible only
    because every float on the Spark/Python side is produced in the
    same fold order the SQL computes (_fold_norm/_round6/_cell_sims)
    and every ordering decision happens on round(·,6) with an integer
    tie-break."""
    return _ivf_cellmap_ctes() + f""", probes AS (
    SELECT v.vec_id AS query_id, c.cell,
           row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY round(list_dot_product(v.e, c.cent), 6) DESC, c.cell ASC
           ) AS rn
    FROM vec v CROSS JOIN cb c WHERE v.vec_id < {N_QUERIES}
), pr AS (
    SELECT query_id, cell FROM probes, par2 WHERE rn <= npr
), cand AS (
    SELECT p.query_id, m.vec_id AS neighbor_id,
           list_dot_product(q.e, m.e) / (q.nrm * m.nrm) AS rawsim
    FROM pr p
    JOIN cellmap m ON m.cell = p.cell AND m.vec_id <> p.query_id
    JOIN cellmap q ON q.vec_id = p.query_id
), ivf AS (
    SELECT query_id, neighbor_id, round(rawsim, 4) AS sim
    FROM cand
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY round(rawsim, 6) DESC, neighbor_id) <= {K}
), {_EXACT_TOPK_CTE}
SELECT i.query_id, i.neighbor_id, i.sim,
       e.neighbor_id IS NOT NULL AS hit,
       CAST(count(e.neighbor_id) OVER (PARTITION BY i.query_id) * 10000
            // {K} AS BIGINT) AS recall_bp
FROM ivf i LEFT JOIN exact e USING (query_id, neighbor_id)
"""


@op(
    "sim_search_ivf",
    oracle=_ivf_oracle(),
    tags=("llm", "similarity", "approx", "scale"),
)
def sim_search_ivf(
    spark: SparkSession, sf_dir: str, with_recall: bool = True
) -> DataFrame:
    """ANN top-k via IVF coarse quantization + exact re-rank, with
    exact-recall companion columns.

    Corpus side: read the materialized inverted file (``ivf_index``) and
    keep only the probed cells — a partition-pruned scan, nprobe/N_CELLS
    of the data, zero per-query assignment work. Query side: each query
    probes its n_probe nearest cells. The candidate set is the equi-join
    on cell id — never corpus × queries — then the exact cosine kernel
    re-ranks and a window keeps top-k.

    Query routing runs driver-side against the in-memory codebook — the
    way production ANN serving routes queries — so the query side costs
    zero Spark jobs: probe assignments are a tiny literal DataFrame
    broadcast into the corpus join.

    HASH-CHECKED since round 8 (previously rows-only): every decision in
    the pipeline — stride-sampled codebook, fold-order normalization,
    rounded-argmax cell assignment, rounded probe routing — is a total
    order over engine-exact values, so the DuckDB oracle replays the
    identical index and retrieval (the dedup_minhash_banded discipline
    applied to ANN). Each row also carries ``hit`` (retrieved neighbor
    is in the exact top-k) and per-query ``recall_bp`` — recall@k of the
    IVF probe vs exact brute force measured EXTERNALLY, the number a
    production pipeline tunes n_probe against.

    ``with_recall=False`` is the PRODUCTION serving path (bench headline
    since round 9): the same pruned retrieval without the recall join,
    so no exact-top-k truth set is ever built — an approximate op must
    not carry an O(corpus) exact pass in its hot path (the
    ``with_exact=False`` discipline of the sketch tier, VERDICT r8 #2).
    The registry/oracle entry keeps companions ON: the hash check
    depends on them, and the eval artifact is cached per corpus
    fingerprint so the suite pays the exact pass once.
    """
    idx = ivf_index(spark, sf_dir)
    q, probed_cells = _routed_query_frame(spark, sf_dir)
    # The IN-list on the partition column is what prunes the scan: only
    # the probed cell directories are read at all. The double-cast is
    # hoisted to the per-SIDE projection (the _brute_pairs discipline):
    # each corpus row casts once, not once per matching query probe.
    corpus = idx.filter(F.col("cell").isin(probed_cells)).select(
        F.col("vec_id").alias("neighbor_id"),
        _dbl("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
        "cell",
    )
    # dot / (precomputed norms): the only per-pair aggregate left is the
    # dot product itself.
    scored = (
        corpus.alias("c")
        .join(
            F.broadcast(q).alias("qq"),
            (F.col("c.cell") == F.col("qq.cell"))
            & (F.col("c.neighbor_id") != F.col("qq.query_id")),
        )
        .withColumn(
            "sim",
            dot_pre("qq.q_emb", "c.c_emb")
            / (F.col("qq.q_norm") * F.col("c.c_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(F.round("sim", 6)), F.asc("neighbor_id"))
    retrieved = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )
    if not with_recall:
        return retrieved
    return _with_recall_companions(spark, sf_dir, retrieved)


def _hyperplanes(dim: int = 64, n: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (fixed seed → reproducible runs)."""
    rng = np.random.default_rng(seed)
    return [[float(v) for v in rng.standard_normal(dim)] for _ in range(n)]


def _lsh_oracle() -> str:
    """DuckDB replay of sim_search_lsh. The hyperplanes are MODEL
    CONSTANTS (seed-fixed at import, like a broadcast codebook), so both
    engines evaluate the same float literals — repr round-trips doubles
    exactly. Every sign decision happens on round(proj, 6) and every
    ranking on (round(sim,6), id), so bucket membership and the top-k
    are total orders the SQL replays bit-for-bit."""
    planes = _hyperplanes()

    def plane_lit(p: list[float]) -> str:
        return "[" + ", ".join(repr(v) for v in p) + "]"

    bucket_exprs = []
    for g in range(4):
        bits = " + ".join(
            f"(CASE WHEN round(list_dot_product(e, {plane_lit(planes[g * 4 + r])}), 6)"
            f" > 0 THEN {1 << r} ELSE 0 END)"
            for r in range(4)
        )
        bucket_exprs.append(f"SELECT vec_id, e, nrm, {g} AS grp, {bits} AS bucket FROM vec")
    bucket_union = "\n    UNION ALL\n    ".join(bucket_exprs)
    return f"""
WITH vec AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
           sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), y -> y * y),
                            (a, b) -> a + b)) AS nrm
    FROM embeddings
), bucketed AS (
    {bucket_union}
), q AS (
    SELECT vec_id AS query_id, e AS qe, nrm AS qn, grp, bucket
    FROM bucketed WHERE vec_id < {N_QUERIES}
), cand AS (
    SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id, q.qe, q.qn,
                    c.e AS ce, c.nrm AS cn
    FROM bucketed c JOIN q
      ON c.grp = q.grp AND c.bucket = q.bucket AND c.vec_id <> q.query_id
), scored AS (
    SELECT query_id, neighbor_id,
           list_dot_product(qe, ce) / (qn * cn) AS rawsim
    FROM cand
), lsh AS (
    SELECT query_id, neighbor_id, round(rawsim, 4) AS sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY round(rawsim, 6) DESC, neighbor_id) <= {K}
), {_EXACT_TOPK_CTE}
SELECT i.query_id, i.neighbor_id, i.sim,
       e.neighbor_id IS NOT NULL AS hit,
       CAST(count(e.neighbor_id) OVER (PARTITION BY i.query_id) * 10000
            // {K} AS BIGINT) AS recall_bp
FROM lsh i LEFT JOIN exact e USING (query_id, neighbor_id)
"""


@op(
    "sim_search_lsh",
    oracle=_lsh_oracle(),
    tags=("llm", "similarity", "approx"),
)
def sim_search_lsh(
    spark: SparkSession, sf_dir: str, with_recall: bool = True
) -> DataFrame:
    """ANN top-k: random-hyperplane LSH bucketing + exact re-rank, with
    exact-recall companion columns.

    16 hyperplanes → four 4-bit sign-buckets per vector; query and
    candidate pair up when any group's bucket matches (equi-join on
    (group, bucket)); candidates are re-ranked with the exact kernel and
    top-k'd.

    HASH-CHECKED since round 8 (previously rows-only): the hyperplanes
    are seed-fixed import-time constants, so the oracle embeds the same
    float literals (the broadcast-codebook pattern — constants need no
    re-derivation, the DATA pipeline is what's replayed); each sign bit
    is taken on round(proj,6) so bucket membership is a cross-engine
    total order, and each output row carries hit + per-query recall_bp
    vs the exact top-k — the recall a production pipeline tunes
    group/bit geometry against, measured externally.

    ``with_recall=False`` is the production serving path: same bucketed
    retrieval, no exact-truth join (see sim_search_ivf).
    """
    # Per-side hoisting (OPTIMIZATION_r14, same discipline as
    # _brute_pairs): the double-cast array is computed ONCE per vector —
    # the 16 plane projections below each used to re-cast it — and the
    # vector norm rides along so the re-rank pays only the dot fold per
    # candidate pair. Same doubles, same fold order, float-identical.
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        _dbl("embedding").alias("ed"),
        norm_expr("embedding").alias("nrm"),
    )
    planes = _hyperplanes()
    # sign bit per plane, packed 4 planes → one 4-bit bucket per group;
    # the sign is taken on round(proj, 6) so a last-ulp projection drift
    # between engines can never flip a bucket (see _lsh_oracle). The
    # whole 4-group struct array is ONE parsed SQL fragment
    # (OPTIMIZATION_r14 driver-side rule).
    def bucket_sql(group: int) -> str:
        bits = []
        for r in range(4):
            p = planes[group * 4 + r]
            arr = "array(" + ", ".join(f"{v!r}D" for v in p) + ")"
            bits.append(
                f"(CASE WHEN round({_dot_sql('ed', arr)}, 6) > 0"
                f" THEN {1 << r} ELSE 0 END)"
            )
        return " + ".join(bits)

    group_structs = ", ".join(
        f"struct({g} as grp, {bucket_sql(g)} as bucket)" for g in range(4)
    )
    bucketed = e.select(
        "vec_id",
        "ed",
        "nrm",
        F.explode(F.expr(f"array({group_structs})")).alias("gb"),
    ).select("vec_id", "ed", "nrm", "gb.grp", "gb.bucket")

    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("ed").alias("qd"),
        F.col("nrm").alias("q_norm"),
        "grp",
        "bucket",
    )
    cand = (
        bucketed.alias("c")
        .join(
            F.broadcast(q).alias("qq"),
            (F.col("c.grp") == F.col("qq.grp"))
            & (F.col("c.bucket") == F.col("qq.bucket"))
            & (F.col("c.vec_id") != F.col("qq.query_id")),
        )
        .select(
            F.col("qq.query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.col("qq.qd"),
            F.col("qq.q_norm"),
            F.col("c.ed").alias("cd"),
            F.col("c.nrm").alias("c_norm"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "sim",
        dot_pre("qd", "cd") / (F.col("q_norm") * F.col("c_norm")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(F.round("sim", 6)), F.asc("neighbor_id"))
    retrieved = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )
    if not with_recall:
        return retrieved
    return _with_recall_companions(spark, sf_dir, retrieved)


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN
# ---------------------------------------------------------------------------

PQ_M = 8          # subspaces
PQ_SUB = 8        # dims per subspace (8 × 8 = 64)
PQ_K = 32         # centroids per subspace codebook
_PQ_SAMPLE = 512  # codebook training sample (stride-sampled, deterministic)
_PQ_ITERS = 5
_PQ_SHORTLIST = 16 * K  # ADC shortlist width before exact re-rank


_PQ_BOOKS_CACHE: dict[str, "np.ndarray"] = {}


def _pq_codebooks(spark: SparkSession, sf_dir: str) -> "np.ndarray":
    """Train M per-subspace codebooks driver-side on a stride-sampled
    subset — the production PQ pattern (codebooks train on a sample,
    never the corpus) and the repo's bounded-collect contract: the
    sample is _PQ_SAMPLE rows however large the corpus. Deterministic
    AND oracle-replayable (round 9, the ivf recipe): stride sampling by
    vec_id, first-k init, fixed iteration count, every float produced
    by the exact left-fold program the SQL oracle re-runs —

    - d2 accumulates dim-by-dim in index order (never a BLAS/pairwise
      ``.sum(axis=2)``, which drifts last-ulp from a SQL fold);
    - the assignment argmin is taken on round(d2, 6) with a centroid-
      index tie (a cross-engine total order, per the ivf discipline);
    - cluster means left-fold members in sample (rn) order and divide
      by the count; empty clusters keep the previous centroid;
    - centroids quantize to the 1e-4 grid (floor(x*1e4+0.5)/1e4 — the
      kmeans fixpoint discipline of llm/clustering.py), idempotent so
      carried-forward centroids re-quantize to themselves.

    Cached per corpus fingerprint (train once, broadcast everywhere)."""
    fp = _corpus_fingerprint(sf_dir)
    if fp in _PQ_BOOKS_CACHE:
        return _PQ_BOOKS_CACHE[fp]
    e = load(spark, sf_dir, "embeddings")
    n = _corpus_rows(spark, sf_dir)
    stride = max(1, n // _PQ_SAMPLE)
    sample = (
        e.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(_PQ_SAMPLE)
        .collect()
    )
    x = np.stack([np.asarray(r["embedding"], dtype="float64") for r in sample])
    books = []
    for m in range(PQ_M):
        sub = x[:, m * PQ_SUB : (m + 1) * PQ_SUB]
        cents = sub[:PQ_K].copy()
        for _ in range(_PQ_ITERS):
            # d2 per (row, centroid): dim-order left fold, vectorized
            # across rows only (each scalar's add chain matches the SQL
            # list_reduce exactly)
            cols = []
            for j in range(PQ_K):
                acc = np.zeros(len(sub))
                for d in range(PQ_SUB):
                    t = sub[:, d] - cents[j, d]
                    acc = acc + t * t
                cols.append(acc)
            d2 = np.stack(cols, axis=1)
            d2r = np.vectorize(_round6)(d2)
            assign = d2r.argmin(axis=1)  # first-min == centroid-asc tie
            new = cents.copy()
            for j in range(PQ_K):
                idx = np.nonzero(assign == j)[0]  # ascending rn order
                if len(idx):
                    accv = np.zeros(PQ_SUB)
                    for i in idx:  # rn-ordered left fold, like list(ORDER BY rn)
                        accv = accv + sub[i]
                    new[j] = accv / len(idx)
            cents = np.floor(new * 1e4 + 0.5) / 1e4
        books.append(cents)
    out = np.stack(books)  # (M, K, SUB)
    _PQ_BOOKS_CACHE[fp] = out
    return out


def _pq_self_norms(books: "np.ndarray") -> list[list[float]]:
    """``||c_{m,j}||²`` via the dim-order left fold (NOT ``(b**2).sum()``,
    whose pairwise summation the SQL oracle could not replay)."""
    norms = []
    for m in range(PQ_M):
        row = []
        for j in range(PQ_K):
            acc = 0.0
            for d in range(PQ_SUB):
                acc += float(books[m][j][d]) * float(books[m][j][d])
            row.append(acc)
        norms.append(row)
    return norms


def _pq_encode_kernel(books: "np.ndarray"):
    """Arrow encode pass: per batch, all M×K distances vectorized across
    ROWS with the per-scalar add chain kept in dim order — each score is
    the identical left fold the SQL oracle computes, so the argmin code
    assignment is bit-for-bit replayable (no rounding needed: both
    engines run the same float program on the same literals). The
    expression-tree alternative (M*K zip_with/aggregate candidates per
    row) is pure JVM but codegens a 256-branch expression that ran 10×
    slower at sf0.1 — the measured crossover where an Arrow kernel beats
    whole-stage codegen (same trade as sim_search_topk_arrow).
    Per-subspace ``||x-c||² = -2 x·c + ||c||²`` (the ``||x||²`` term is
    constant per row and drops out of the argmin); ties take the lowest
    centroid index (argmin first-hit == the oracle's ``j ASC`` tie)."""
    norms = _pq_self_norms(books)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            out = {"neighbor_id": pdf["vec_id"].to_numpy()}
            for m in range(PQ_M):
                sub = x[:, m * PQ_SUB : (m + 1) * PQ_SUB]
                cols = []
                for j in range(PQ_K):
                    acc = np.zeros(len(sub))
                    for d in range(PQ_SUB):
                        acc = acc + sub[:, d] * books[m][j][d]
                    cols.append(-2.0 * acc + norms[m][j])
                scores = np.stack(cols, axis=1)
                out[f"m{m}"] = scores.argmin(axis=1).astype("int32")
            yield pd.DataFrame(out)

    return kernel


def _pq_oracle() -> str:
    """DuckDB replay of the ENTIRE PQ decision chain — codebook training
    (stride sample → first-k init → _PQ_ITERS unrolled Lloyd rounds with
    round(d2,6)+j-asc assignment, rn-ordered mean folds, 1e-4 centroid
    quantization), corpus code assignment (bit-exact score folds, j-asc
    tie), driver-side ADC tables, shortlist ranking, and the exact
    cosine re-rank. Possible because every float on the Spark/Python
    side is produced by the same left-fold program over the same
    literals (see _pq_codebooks/_pq_encode_kernel): training decisions
    get the defensive round(·,6) total order; downstream scores compare
    bit-identical derivations, so raw DESC + id tie-breaks suffice
    (the sim_search_topk precedent)."""
    it_ctes = []
    D2 = (
        "round(list_reduce(list_transform(range({SUB}), d ->"
        " (s.x[d+1]-c.c[d+1])*(s.x[d+1]-c.c[d+1])), (a,b) -> a+b), 6)"
    ).format(SUB=PQ_SUB)
    for t in range(1, _PQ_ITERS + 1):
        it_ctes.append(f"""
a{t} AS (
    SELECT rn, m, j, x FROM (
        SELECT s.rn, s.m, c.j, s.x,
               row_number() OVER (
                   PARTITION BY s.m, s.rn
                   ORDER BY {D2} ASC, c.j ASC
               ) AS ar
        FROM subs s JOIN c{t - 1} c USING (m)
    ) WHERE ar = 1
),
g{t} AS (
    SELECT m, j, list(x ORDER BY rn) AS L, count(*) AS cnt
    FROM a{t} GROUP BY m, j
),
c{t} AS (
    SELECT p.m, p.j,
           list_transform(range({PQ_SUB}), d ->
               floor(COALESCE(
                   list_reduce(list_transform(n.L, v -> v[d+1]), (a,b) -> a+b)
                       / n.cnt,
                   p.c[d+1]) * 1e4 + 0.5) / 1e4) AS c
    FROM c{t - 1} p LEFT JOIN g{t} n USING (m, j)
)""")
    iters = ",".join(it_ctes)
    return f"""
WITH par AS (
    SELECT greatest(1, count(*) // {_PQ_SAMPLE}) AS stride FROM embeddings
), samp AS (
    SELECT row_number() OVER (ORDER BY vec_id) AS rn,
           CAST(embedding AS DOUBLE[]) AS e
    FROM embeddings, par WHERE vec_id % stride = 0
    ORDER BY vec_id LIMIT {_PQ_SAMPLE}
), ms AS (SELECT unnest(range({PQ_M})) AS m
), subs AS (
    SELECT rn, m, list_slice(e, m*{PQ_SUB}+1, m*{PQ_SUB}+{PQ_SUB}) AS x
    FROM samp CROSS JOIN ms
), c0 AS (
    SELECT m, rn - 1 AS j, x AS c FROM subs WHERE rn <= {PQ_K}
),{iters},
bn AS (
    SELECT m, j, c,
           list_reduce(list_transform(range({PQ_SUB}), d -> c[d+1]*c[d+1]),
                       (a,b) -> a+b) AS n2
    FROM c{_PQ_ITERS}
), vec AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), vsub AS (
    SELECT vec_id, m, list_slice(e, m*{PQ_SUB}+1, m*{PQ_SUB}+{PQ_SUB}) AS x
    FROM vec CROSS JOIN ms
), enc AS (
    SELECT vec_id, m, j FROM (
        SELECT v.vec_id, v.m, b.j,
               row_number() OVER (
                   PARTITION BY v.vec_id, v.m
                   ORDER BY (-2 * list_reduce(list_transform(range({PQ_SUB}),
                                 d -> v.x[d+1]*b.c[d+1]), (a,b) -> a+b)) + b.n2 ASC,
                            b.j ASC
               ) AS ar
        FROM vsub v JOIN bn b USING (m)
    ) WHERE ar = 1
), qtab AS (
    SELECT v.vec_id AS query_id, v.m, b.j,
           list_reduce(list_transform(range({PQ_SUB}), d -> v.x[d+1]*b.c[d+1]),
                       (a,b) -> a+b) AS tv,
           b.n2
    FROM vsub v JOIN bn b USING (m) WHERE v.vec_id < {N_QUERIES}
), qn AS (
    SELECT vec_id AS query_id, sqrt(list_dot_product(e, e)) AS q_norm
    FROM vec WHERE vec_id < {N_QUERIES}
), adc AS (
    SELECT t.query_id, e2.vec_id AS neighbor_id,
           list_reduce(list(t.tv ORDER BY t.m), (a,b) -> a+b) AS dotp,
           list_reduce(list(t.n2 ORDER BY t.m), (a,b) -> a+b) AS nn
    FROM enc e2 JOIN qtab t ON t.m = e2.m AND t.j = e2.j
    WHERE e2.vec_id <> t.query_id
    GROUP BY t.query_id, e2.vec_id
), sl AS (
    SELECT query_id, neighbor_id
    FROM adc JOIN qn USING (query_id)
    QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY dotp / (sqrt(nn) * q_norm) DESC, neighbor_id ASC
    ) <= {_PQ_SHORTLIST}
), rer AS (
    SELECT s.query_id, s.neighbor_id,
           list_dot_product(q.e, c.e)
               / (sqrt(list_dot_product(q.e, q.e))
                  * sqrt(list_dot_product(c.e, c.e))) AS rawsim
    FROM sl s
    JOIN vec q ON q.vec_id = s.query_id
    JOIN vec c ON c.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, round(rawsim, 4) AS sim
FROM rer
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY round(rawsim, 6) DESC, neighbor_id) <= {K}
"""


@op("sim_search_pq", oracle=_pq_oracle(), tags=("llm", "similarity", "approx", "scale"))
def sim_search_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via product quantization: eight 8-dim subspace
    codebooks (PQ_M=8 × PQ_SUB=8, PQ_K=32 centroids each),
    asymmetric-distance (ADC) scoring from per-query lookup tables, and
    exact re-rank of the shortlist. Completes the ANN tier's standard
    index family: brute (topk), Arrow-BLAS (topk_arrow), IVF, LSH, PQ.

    Scale shape — compute, not candidates, is what PQ buys:

    - ENCODE once, map-only: each vector collapses to M=8 byte codes by
      an Arrow batch kernel — one BLAS matmul per subspace per batch,
      no shuffle (see ``_pq_encode_kernel`` for why this beats the pure
      whole-stage-codegen form here) — at rest this is a 32× compression
      of the scoring payload;
    - SCORE from tables: each query precomputes (driver-side, against
      the in-memory codebooks — zero Spark jobs) an 8×32 table of
      subspace dot products plus the codebook self-norm table; the scan
      then scores a row with 8 ``element_at`` lookups + adds instead
      of a 64-mult dot product, the ADC trick (Jégou et al. 2011);
    - the shortlist (16·K per query) re-ranks with the EXACT cosine
      kernel via one broadcast-semi join back to the full vectors, so
      precision at the top is exact even though candidate scoring is
      quantized. In production the scan side composes with the IVF
      partition pruning above (IVF-PQ); here it stays unpruned so this
      op measures PQ in isolation.

    HASH-CHECKED since round 9 (previously rows-only): the k-means
    training itself is unrolled into the oracle as _PQ_ITERS CTE rounds
    — stride sample, first-k init, round(d2,6)+index-asc assignment,
    rn-ordered mean folds, 1e-4-quantized centroids (the
    sample_kcenter_coreset proof that driver-iterative training is
    oracle-able, applied to Lloyd iteration; VERDICT r8 #4). Every
    downstream float (codes, ADC tables, norms) derives from the same
    left-fold program on both engines. Recall vs the exact op is
    additionally pinned in tests/test_llm.py.
    """
    books = _pq_codebooks(spark, sf_dir)
    e = load(spark, sf_dir, "embeddings")
    codes = e.select("vec_id", "embedding").mapInPandas(
        _pq_encode_kernel(books),
        schema="neighbor_id bigint, " + ", ".join(f"m{m} int" for m in range(PQ_M)),
    )

    # Per-query ADC tables, driver-side: dot(q_m, c_{m,j}) and the
    # codebook self-norms |c_{m,j}|² for the approximate cosine.
    q_rows = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    # Fold-order norms/dots (NOT (b**2).sum() / @ — BLAS pairwise
    # summation would drift last-ulp from the oracle's list_reduce).
    self_norm = _pq_self_norms(books)
    q_data = []
    for r in q_rows:
        qv = [float(v) for v in r["embedding"]]
        tables = []
        for m in range(PQ_M):
            row = []
            for j in range(PQ_K):
                acc = 0.0
                for d in range(PQ_SUB):
                    acc += qv[m * PQ_SUB + d] * float(books[m][j][d])
                row.append(acc)
            tables.append(row)
        q_data.append((int(r["vec_id"]), *tables, _fold_norm(qv)))
    q_df = spark.createDataFrame(
        q_data,
        schema="query_id bigint, "
        + ", ".join(f"t{m} array<double>" for m in range(PQ_M))
        + ", q_norm double",
    )

    adc_dot = sum(
        F.element_at(F.col(f"t{m}"), F.col(f"m{m}") + 1) for m in range(PQ_M)
    )
    adc_norm2 = sum(
        F.element_at(
            F.expr("array(" + ", ".join(f"{v!r}D" for v in self_norm[m]) + ")"),
            F.col(f"m{m}") + 1,
        )
        for m in range(PQ_M)
    )
    scored = (
        codes.crossJoin(F.broadcast(q_df))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc", adc_dot / (F.sqrt(adc_norm2) * F.col("q_norm")))
    )
    ws = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= _PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )

    # Exact re-rank: shortlist × full vectors (both sides tiny).
    qe = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    ce = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    exact = (
        ce.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qe), "query_id")
        .withColumn("sim", cosine_expr("q_emb", "c_emb"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(F.round("sim", 6)), F.asc("neighbor_id"))
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


# ---------------------------------------------------------------------------
# Binarized (sign-bit) Hamming ANN
# ---------------------------------------------------------------------------


def _sign_word_expr(w: int) -> Column:
    """32-bit sign word w of the embedding: bit b set iff dimension
    32·w + b is positive after round(·, 6) — the LSH sign discipline
    (a last-ulp negative zero can never flip a bit cross-engine)."""
    word = " + ".join(
        f"(CASE WHEN round(cast(embedding[{32 * w + b}] AS DOUBLE), 6) > 0"
        f" THEN {1 << b} ELSE 0 END)"
        for b in range(32)
    )
    return F.expr(f"CAST({word} AS BIGINT)")


def _hamming_oracle() -> str:
    def word(w: int) -> str:
        bits = " + ".join(
            f"(CASE WHEN round(e[{32 * w + b + 1}], 6) > 0 THEN {1 << b} ELSE 0 END)"
            for b in range(32)
        )
        return f"CAST({bits} AS BIGINT) AS w{w}"

    return f"""
WITH vec AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), sig AS (
    SELECT vec_id, {word(0)}, {word(1)} FROM vec
), q AS (
    SELECT vec_id AS query_id, w0 AS q0, w1 AS q1 FROM sig
    WHERE vec_id < {N_QUERIES}
), scored AS (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           bit_count(xor(q.q0, c.w0)) + bit_count(xor(q.q1, c.w1)) AS hamming
    FROM sig c CROSS JOIN q
    WHERE c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, CAST(hamming AS BIGINT) AS hamming
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY hamming ASC, neighbor_id ASC) <= {K}
"""


@op(
    "sim_search_hamming",
    oracle=_hamming_oracle(),
    tags=("llm", "similarity", "approx", "scale"),
)
def sim_search_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-embedding ANN: 64-dim vectors collapse to 64 SIGN BITS
    (two 32-bit words) and top-k runs on Hamming distance — the
    cheapest tier of the similarity family (below PQ): scoring a
    candidate is two XOR+popcount integer ops instead of a 64-mult
    float dot, and the at-rest payload is 8 bytes/vector (a 32×
    compression). The standard first-pass filter for billion-scale
    retrieval (sign-random-projection / ITQ family); sim_search_lsh
    already proved sign-bucket EQUALITY pairing — this op RANKS by full
    sign-profile distance, the retrieval such bit signatures exist for.

    Fully integer end-to-end (bits from round(dim, 6) > 0 like the LSH
    buckets; distances/ranks are ints) — hash-checked from birth, no
    recall-companion machinery needed. Ties break (hamming, neighbor)
    ASC on both engines.

    Scale: corpus scan × broadcast query signatures — the
    sim_search_topk plan shape with an 8-byte payload and an integer
    kernel; at 100 TB this is the candidate-generation pass whose
    shortlist the exact/PQ tiers re-rank.
    """
    e = load(spark, sf_dir, "embeddings")
    sig = e.select("vec_id", _sign_word_expr(0).alias("w0"), _sign_word_expr(1).alias("w1"))
    q = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
    )
    scored = (
        sig.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "hamming",
            (
                F.bit_count(F.col("q0").bitwiseXOR(F.col("w0")))
                + F.bit_count(F.col("q1").bitwiseXOR(F.col("w1")))
            ).cast("bigint"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "hamming")
    )


# ---------------------------------------------------------------------------
# Retrieval-margin profile (top-1 vs top-2 separation per query)
# ---------------------------------------------------------------------------

_MARGIN_ORACLE = f"""
WITH scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
           / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))
               AS sim
    FROM embeddings q
    JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
), r AS (
    SELECT query_id, neighbor_id, round(sim, 6) AS sim6,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(sim, 6) DESC, neighbor_id) AS rk
    FROM scored
)
SELECT query_id,
       max(CASE WHEN rk = 1 THEN neighbor_id END) AS top1_id,
       round(max(CASE WHEN rk = 1 THEN sim6 END), 6) + 0.0 AS sim_top1,
       round(max(CASE WHEN rk = 2 THEN sim6 END), 6) + 0.0 AS sim_top2,
       round(max(CASE WHEN rk = 1 THEN sim6 END)
             - max(CASE WHEN rk = 2 THEN sim6 END), 6) + 0.0 AS margin
FROM r GROUP BY query_id
"""


@op(
    "sim_margin_profile",
    oracle=_MARGIN_ORACLE,
    tags=("llm", "similarity", "eval"),
)
def sim_margin_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-margin profile: per query, the exact top-1 neighbor and
    the cosine GAP to the runner-up — the confidence signal retrieval
    QA reads before trusting nearest-neighbor labels (a margin near
    zero means the top hit is interchangeable with the next one: ANN
    approximation error, label propagation, and dedup keeper choice all
    become coin flips exactly there). The recall companions measure
    whether ANN FINDS the true top-k; this measures whether the top-k
    was ever well-separated to begin with.

    Exact: the same brute-force cosine and (round(sim,6), neighbor_id)
    rank order as sim_search_topk (one construction both engines
    replay); top-1/top-2 picks are values at ranks, and the margin is
    a difference of two identically-rounded doubles, re-rounded.

    Scale: corpus scan × broadcast query set (the sim_search_topk
    plan) + one rank window per query — |queries| rows out.
    """
    scored = _brute_pairs(load(spark, sf_dir, "embeddings")).select(
        "query_id", "neighbor_id", F.round("sim", 6).alias("sim6")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim6"), F.asc("neighbor_id"))
    r = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 2)
    return r.groupBy("query_id").agg(
        F.max(F.when(F.col("rk") == 1, F.col("neighbor_id"))).alias("top1_id"),
        (F.round(F.max(F.when(F.col("rk") == 1, F.col("sim6"))), 6) + F.lit(0.0)).alias(
            "sim_top1"
        ),
        (F.round(F.max(F.when(F.col("rk") == 2, F.col("sim6"))), 6) + F.lit(0.0)).alias(
            "sim_top2"
        ),
        (
            F.round(
                F.max(F.when(F.col("rk") == 1, F.col("sim6")))
                - F.max(F.when(F.col("rk") == 2, F.col("sim6"))),
                6,
            )
            + F.lit(0.0)
        ).alias("margin"),
    )


# ---------------------------------------------------------------------------
# Exact radius (threshold) search: all neighbors with cosine >= tau
# ---------------------------------------------------------------------------

_RADIUS_TAU = 0.25  # fixture-informed: random-pair cos spans ~[-0.4, 0.4)

_RADIUS_ORACLE = f"""
WITH scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(
               list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))),
               6) AS sim6
    FROM embeddings q
    JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id,
       round(sim6, 4) + 0.0 AS sim,
       CAST(count(*) OVER (PARTITION BY query_id) AS BIGINT) AS n_in_radius
FROM scored WHERE sim6 >= {_RADIUS_TAU}
"""


@op("sim_search_radius", oracle=_RADIUS_ORACLE, tags=("llm", "similarity"))
def sim_search_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact RADIUS search: every neighbor with cosine ≥ τ of each query
    vector, plus the per-query match count — the other standard ANN API
    next to top-k. Top-k always returns k rows whether or not anything
    is actually close (sim_margin_profile measures how often that
    matters); radius search is the semantics dedup, recommendation
    cutoffs, and "is there anything like this?" checks really want —
    variable result size, threshold in similarity units. This is the
    exactness oracle tier; the LSH/IVF serving paths bound the same
    query by candidate generation.

    Exact: the shared fold-order cosine kernel rounded to 6 BEFORE the
    threshold compare (the dedup_embedding discipline — a boundary sim
    can't flip between engines), reported at the house 4-decimal grain.

    Scale: brute force over the {N_QUERIES}-query literal broadcast —
    the corpus is scanned once, never corpus × corpus; the per-query
    count rides the result window (result-sized, not corpus-sized).
    """
    scored = _brute_pairs(load(spark, sf_dir, "embeddings")).select(
        "query_id", "neighbor_id", F.round("sim", 6).alias("sim6")
    )
    hits = scored.filter(F.col("sim6") >= _RADIUS_TAU)
    return hits.select(
        "query_id",
        "neighbor_id",
        (F.round(F.col("sim6"), 4) + F.lit(0.0)).alias("sim"),
        F.count("*")
        .over(Window.partitionBy("query_id"))
        .cast("bigint")
        .alias("n_in_radius"),
    )
