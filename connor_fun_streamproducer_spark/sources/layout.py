"""Physical-layout sinks: partitioned writes that downstream scans prune.

The reference fans its stream out one Kafka topic per region
(/root/reference/regionSpout.go:124-160) — the layout decision that lets
a consumer read one region without touching the rest. The warehouse form
of that decision is a ``partitionBy`` parquet layout: a predicate on the
partition column becomes directory pruning, so a 100 TB table scanned
for one key reads only that key's files. ``sink_partition_prune`` proves
the whole loop — write partitioned, read back with a predicate, and
tests/test_plans.py asserts the scan node carries the predicate as a
PartitionFilter (pruned at planning, zero data files from other keys
opened) rather than a post-scan filter.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op

PRUNE_KEY = "click"

_EVENT_COLS = ["event_id", "ts", "user_id", "value", "event_type"]


def _scratch_path(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join("/root/repo/.scratch", tag, name)


def _atomic_write(writer, path: str) -> None:
    """Write a layout atomically: stage under a process-unique sibling dir,
    then ``os.rename`` into place (the ivf_index pattern,
    llm/similarity.py). Two concurrent sessions on the same sf_dir each
    build a private staging copy; the rename loser sees the winner's
    complete ``_SUCCESS``-marked directory and discards its own — no
    interleaved half-overwrites of the final path.

    ``writer`` is a callable taking the staging path and performing the
    Spark write to it."""
    staging = f"{path}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    writer(staging)
    try:
        if os.path.exists(path):
            # Rebuild case (stale derived layout): swap out the old dir
            # first; rename below is then atomic for new readers.
            shutil.rmtree(path, ignore_errors=True)
        os.rename(staging, path)
    except OSError:
        if not os.path.isfile(os.path.join(path, "_SUCCESS")):
            raise  # destination absent AND rename failed → real error
        shutil.rmtree(staging, ignore_errors=True)  # lost the race


def _events_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select(*_EVENT_COLS)


def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per sf_dir) the events table partitioned by type."""
    path = _scratch_path(sf_dir, "events_by_type")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        _atomic_write(
            lambda p: _events_projection(spark, sf_dir)
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(p),
            path,
        )
    return path


def pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The read side alone (plan tests inspect this before aggregation)."""
    path = partitioned_events_path(spark, sf_dir)
    return spark.read.parquet(path).filter(F.col("event_type") == PRUNE_KEY)


@op(
    "sink_partition_prune",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT)     AS n,
           round(sum(value), 4)         AS total,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE event_type = '{PRUNE_KEY}'
    GROUP BY event_type
    """,
    tags=("ext", "sink", "scale"),
)
def sink_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-layout round trip with a pruned read-back.

    Writes events ``partitionBy(event_type)``, reads back only one
    partition, and aggregates it; the result equals the oracle's direct
    filtered aggregation, proving the layout didn't lose or duplicate
    rows. The scale property — the predicate is applied as directory
    pruning (PartitionFilters on the scan node, 1/5 of the data opened),
    not as a row filter after a full scan — is asserted on the physical
    plan in tests/test_plans.py. This is the engine form of the
    reference's topic-per-region fanout: pay one shuffle at write time,
    then every keyed consumer reads only its slice forever.
    """
    back = pruned_scan(spark, sf_dir)
    return back.groupBy(F.col("event_type").cast("string").alias("event_type")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum("value"), 4).alias("total"),
        F.count_distinct(F.col("user_id")).cast("bigint").alias("n_users"),
    )


FRAGMENT_FILES = 16   # simulated small-file ingest fanout
COMPACT_TARGET = 2    # compacted file count for the fixture volume


def compacted_events_path(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write (once per sf_dir) a fragmented copy of events and its
    compacted rewrite; returns (fragmented_path, compacted_path)."""
    frag = _scratch_path(sf_dir, "events_fragmented")
    comp = _scratch_path(sf_dir, "events_compacted")
    frag_rebuilt = not os.path.exists(os.path.join(frag, "_SUCCESS"))
    if frag_rebuilt:
        # The small-file problem, induced: a streaming ingest writing every
        # micro-batch produces many KB-scale files.
        _atomic_write(
            lambda p: _events_projection(spark, sf_dir)
            .repartition(FRAGMENT_FILES)
            .write.mode("overwrite")
            .parquet(p),
            frag,
        )
    # The compacted layout DERIVES from the fragmented one: rebuild it
    # whenever frag was (re)written, not just when its own marker is
    # missing — independent _SUCCESS checks would serve stale compacted
    # data after a fixture regeneration.
    if frag_rebuilt or not os.path.exists(os.path.join(comp, "_SUCCESS")):
        # The compaction job: read the fragmented layout, coalesce to the
        # target file count, rewrite. At 100 TB the target is
        # total_bytes / desired_file_size and the job runs per partition
        # directory; repartition (not coalesce) so the write stays
        # parallel upstream and file sizes come out even.
        _atomic_write(
            lambda p: spark.read.parquet(frag)
            .repartition(COMPACT_TARGET)
            .write.mode("overwrite")
            .parquet(p),
            comp,
        )
    return frag, comp


@op(
    "sink_compaction",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM events
    GROUP BY event_type
    """,
    tags=("ext", "sink", "scale"),
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction round trip: fragmented ingest layout →
    compaction rewrite → full-fidelity read-back.

    The operational job every streaming ingest needs at 100 TB: micro-
    batch writes leave thousands of KB-scale files per partition (NameNode
    pressure, per-file open cost, tiny row groups that defeat pruning);
    a periodic compaction rewrites each directory to
    total_bytes/target_file_size files. The op induces the problem
    (16-way fragmented copy of events), runs the compaction, and returns
    per-type counts + id-sums READ FROM THE COMPACTED LAYOUT — the
    oracle computes the same from the source table, so the hash-match
    proves the rewrite lost and duplicated nothing. File-count mechanics
    (16 → 2 data files) are pinned in tests/test_plans.py.
    """
    _, comp = compacted_events_path(spark, sf_dir)
    return (
        spark.read.parquet(comp)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("event_id").cast("bigint").alias("id_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order clustering (multi-dimensional data skipping)

Z_BITS = 8        # per-dimension resolution after scaling (8 bits → 0..255)
Z_BUCKET_BITS = 4  # top bits of the 16-bit z-value → 16 layout buckets


def _z_interleave_sql(xs: str, ys: str) -> str:
    """ANSI-SQL bit interleave of two Z_BITS-wide ints (DuckDB + Spark)."""
    terms = []
    for b in range(Z_BITS):
        terms.append(f"((({xs} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({ys} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per sf_dir) lineitem Z-ordered on (partkey, suppkey).

    The write is the whole trick: repartition on the z-bucket (top
    Z_BUCKET_BITS of the interleaved key) then sort within partitions by
    the full z-value, so every output file covers one compact rectangle
    of the (partkey, suppkey) plane and its parquet min/max column stats
    become two-dimensional skipping indexes — the standard answer to
    "my scans filter on EITHER of two columns" that single-column
    partitioning can't give (partitionBy(partkey) does nothing for a
    suppkey predicate; Z-order bounds BOTH).
    """
    path = _scratch_path(sf_dir, "lineitem_zorder")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        li = load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
        )
        mx = li.agg(
            F.max("l_partkey").alias("max_p"), F.max("l_suppkey").alias("max_s")
        )
        scale = 1 << Z_BITS
        # floor() explicitly before the BIGINT cast: Spark's double→bigint
        # cast truncates but DuckDB's ROUNDS (half-even), which shifts the
        # scaled coordinate by one at .5-and-up fractions and moves rows
        # across bucket boundaries between engines.
        scaled = li.join(F.broadcast(mx)).selectExpr(
            "*",
            f"CAST(floor(l_partkey * {scale} / (max_p + 1)) AS BIGINT) AS zx",
            f"CAST(floor(l_suppkey * {scale} / (max_s + 1)) AS BIGINT) AS zy",
        )
        zval = _z_interleave_sql("zx", "zy")
        zdf = scaled.selectExpr(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            f"{zval} AS zval",
            f"({zval} >> {2 * Z_BITS - Z_BUCKET_BITS}) AS zbucket",
        )
        _atomic_write(
            lambda p: zdf.repartition("zbucket")
            .sortWithinPartitions("zval")
            .write.mode("overwrite")
            .partitionBy("zbucket")
            .parquet(p),
            path,
        )
    return path


def _zorder_oracle() -> str:
    scale = 1 << Z_BITS
    zval = _z_interleave_sql("zx", "zy")
    return f"""
    WITH scaled AS (
      SELECT l_orderkey, l_partkey, l_suppkey,
             CAST(floor(l_partkey * {scale} / ((SELECT max(l_partkey) FROM lineitem) + 1))
                  AS BIGINT) AS zx,
             CAST(floor(l_suppkey * {scale} / ((SELECT max(l_suppkey) FROM lineitem) + 1))
                  AS BIGINT) AS zy
      FROM lineitem
    )
    SELECT ({zval} >> {2 * Z_BITS - Z_BUCKET_BITS}) AS zbucket,
           CAST(count(*) AS BIGINT)       AS n,
           CAST(min(l_partkey) AS BIGINT) AS min_p,
           CAST(max(l_partkey) AS BIGINT) AS max_p,
           CAST(min(l_suppkey) AS BIGINT) AS min_s,
           CAST(max(l_suppkey) AS BIGINT) AS max_s
    FROM scaled
    GROUP BY 1
    """


@op("sink_zorder", oracle=_zorder_oracle(), tags=("ext", "sink", "scale"))
def sink_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout round trip: interleaved-bit clustering write, then a
    per-bucket fidelity + locality summary READ FROM THE LAYOUT.

    Returns per z-bucket: row count and the min/max of BOTH clustered
    dimensions. The hash-match against the oracle (same interleave
    arithmetic on the source table) proves the clustered rewrite lost and
    duplicated nothing; the min/max columns ARE the locality evidence —
    each bucket's span in each dimension is a fraction of the key space
    (asserted < half the global span in tests/test_plans.py, which also
    pins that a two-sided predicate scan of the layout prunes to one
    bucket directory). At 100 TB this is the data-skipping layout for
    fact tables filtered on two independent dimensions — one clustering
    write, then every (partkey-range × suppkey-range) scan opens only
    the files whose z-rectangles intersect it.
    """
    path = zorder_events_path(spark, sf_dir)
    return (
        spark.read.parquet(path)
        .groupBy(F.col("zbucket").cast("bigint").alias("zbucket"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("l_partkey").cast("bigint").alias("min_p"),
            F.max("l_partkey").cast("bigint").alias("max_p"),
            F.min("l_suppkey").cast("bigint").alias("min_s"),
            F.max("l_suppkey").cast("bigint").alias("max_s"),
        )
    )


_MERGE_ORACLE = """
SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, lang, n_chars
FROM documents WHERE doc_id % 2 = 1
"""


@op(
    "scan_schema_merge",
    oracle=_MERGE_ORACLE,
    tags=("ext", "source", "layout"),
)
def scan_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: a table directory holding batches written
    under TWO schema versions (v1: (doc_id, lang); v2 adds n_chars) is
    read as ONE DataFrame via mergeSchema — v1 rows surface the new
    column as NULL, exactly the semantics a table format gives an
    added-column evolution.

    Long-lived 100 TB datasets ALWAYS end up with mixed-schema parquet
    (columns appear over time; rewriting history is off the table). The
    contract this op pins:

    - the union schema comes from footer metadata only (mergeSchema
      reads footers, never data pages, for schema resolution — the
      per-file cost is a metadata read, and production table formats
      move even that into a central metadata layer);
    - writes stay atomic: both version batches build in one staging
      directory that renames into place (the _atomic_write pattern), so
      a concurrent reader never observes half a table;
    - absent columns are typed NULLs (BIGINT here), not errors — so
      downstream aggregates over the evolved column skip v1 rows via
      ordinary null semantics with no special-casing.

    Only additive evolution is exercised: mergeSchema rejects true type
    conflicts (that failure mode needs a cast-on-read policy, which is
    a table-format feature, not a parquet-reader one).
    """
    d = load(spark, sf_dir, "documents")
    # layout-version tag in the dir name: the cached scratch layout is
    # reused across calls, so any change to the batch split or schemas
    # below must bump the tag rather than silently reading a stale build
    root = _scratch_path(sf_dir, "docs_evolved_v1")

    def _write(staging: str) -> None:
        d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.parquet(
            os.path.join(staging, "batch=1")
        )
        d.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "lang", "n_chars"
        ).write.parquet(os.path.join(staging, "batch=2"))
        # root-level success marker for the _atomic_write race protocol
        with open(os.path.join(staging, "_SUCCESS"), "w"):
            pass

    if not os.path.isfile(os.path.join(root, "_SUCCESS")):
        _atomic_write(_write, root)
    back = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "false"
    ).parquet(os.path.join(root, "batch=1"), os.path.join(root, "batch=2"))
    return back.select("doc_id", "lang", "n_chars")


# ---------------------------------------------------------------------------
# Manifest-based snapshot versioning (the table-format commit protocol)

SNAPSHOT_CUT = "1995-01-01"  # v1 = orders before the cut; v2 appends the rest


def _part_files(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.startswith("part-") and f.endswith(".parquet")
    )


def versioned_orders_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir) a two-snapshot versioned orders table.

    Layout (the Iceberg/Delta commit protocol reduced to its essentials,
    files + manifests + a current-version pointer):

    - ``data/base/``  — parquet files of orders with o_orderdate < cut
    - ``data/delta/`` — parquet files of the remaining orders
    - ``manifest-1.txt`` — the base file list (snapshot v1)
    - ``manifest-2.txt`` — base + delta file lists (snapshot v2)
    - ``VERSION`` — the current snapshot number ("2")

    A commit is: write NEW data files (never touching existing ones),
    write the next manifest listing old+new files, then atomically swap
    the VERSION pointer. Readers resolve VERSION → manifest → file list,
    so they always see a complete snapshot — never a half-appended
    table — and old manifests keep serving time-travel reads of v1.
    """
    root = _scratch_path(sf_dir, "orders_versioned_v1")
    if not os.path.isfile(os.path.join(root, "_SUCCESS")):
        o = load(spark, sf_dir, "orders")

        def _build(staging: str) -> None:
            base_dir = os.path.join(staging, "data", "base")
            delta_dir = os.path.join(staging, "data", "delta")
            o.filter(F.col("o_orderdate") < SNAPSHOT_CUT).write.parquet(base_dir)
            o.filter(F.col("o_orderdate") >= SNAPSHOT_CUT).write.parquet(delta_dir)
            base_rel = [os.path.relpath(p, staging) for p in _part_files(base_dir)]
            delta_rel = [os.path.relpath(p, staging) for p in _part_files(delta_dir)]
            with open(os.path.join(staging, "manifest-1.txt"), "w") as fh:
                fh.write("\n".join(base_rel))
            with open(os.path.join(staging, "manifest-2.txt"), "w") as fh:
                fh.write("\n".join(base_rel + delta_rel))
            # pointer swap is the commit: write-aside then rename, the
            # same atomicity discipline _atomic_write gives the layout
            tmp = os.path.join(staging, "VERSION.tmp")
            with open(tmp, "w") as fh:
                fh.write("2")
            os.rename(tmp, os.path.join(staging, "VERSION"))
            with open(os.path.join(staging, "_SUCCESS"), "w"):
                pass

        _atomic_write(_build, root)
    return root


def commit_append(root: str, new_rel_files: list[str], expected_version: int) -> int | None:
    """Optimistic-concurrency append commit against a versioned root.

    The table-format commit protocol under CONTENTION: data files are
    already staged (never touching existing ones); committing snapshot
    N+1 means publishing ``manifest-{N+1}.txt`` and advancing VERSION.
    Exactly-one-winner comes from the manifest number itself being the
    compare-and-swap token: the manifest body is staged to a temp file
    and published with ``os.link`` — an atomic create-exclusive, so of
    two racers exactly ONE creates ``manifest-{N+1}.txt``; the other
    gets EEXIST, removes its staged data files, and returns None (its
    retry would re-stage on top of snapshot N+1, Iceberg/Delta's retry
    loop). The VERSION pointer advance after the manifest link is a
    plain monotonic rename — readers between the two steps still
    resolve a complete snapshot N.

    Returns the committed version, or None if this writer lost.
    """
    with open(os.path.join(root, "VERSION")) as fh:
        current = int(fh.read().strip())
    if current != expected_version:
        for rel in new_rel_files:  # stale base — clean staged data
            try:
                os.remove(os.path.join(root, rel))
            except OSError:
                pass
        return None
    with open(os.path.join(root, f"manifest-{current}.txt")) as fh:
        base_files = [line for line in fh.read().splitlines() if line]
    new_v = current + 1
    tmp = os.path.join(root, f"manifest-{new_v}.txt.{os.getpid()}-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write("\n".join(base_files + new_rel_files))
    try:
        os.link(tmp, os.path.join(root, f"manifest-{new_v}.txt"))  # the CAS
    except FileExistsError:
        os.remove(tmp)
        for rel in new_rel_files:
            try:
                os.remove(os.path.join(root, rel))
            except OSError:
                pass
        return None
    os.remove(tmp)
    vtmp = os.path.join(root, f"VERSION.{os.getpid()}-{uuid.uuid4().hex[:8]}")
    with open(vtmp, "w") as fh:
        fh.write(str(new_v))
    os.rename(vtmp, os.path.join(root, "VERSION"))
    return new_v


def read_snapshot(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Resolve VERSION → manifest → file list and read exactly those files.

    ``version=None`` follows the current pointer; an explicit version is
    a time-travel read of that snapshot. The manifest is the source of
    truth — files not listed (e.g. a concurrent writer's half-committed
    data files) are invisible, which is the whole point.
    """
    if version is None:
        with open(os.path.join(root, "VERSION")) as fh:
            version = int(fh.read().strip())
    with open(os.path.join(root, f"manifest-{version}.txt")) as fh:
        files = [os.path.join(root, line) for line in fh.read().splitlines() if line]
    return spark.read.parquet(*files)


@op(
    "sink_versioned_manifest",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("ext", "sink", "scale"),
)
def sink_versioned_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-versioned table round trip: append-only data files +
    manifest commit + pointer swap, read back at the current snapshot.

    The op builds a two-snapshot orders table (base write, then an
    append commit), resolves the VERSION pointer to manifest-2, reads
    exactly the listed files, and aggregates per status in integer
    cents; the oracle aggregates the source table directly, so the
    hash-match proves the commit protocol presented the complete
    appended table — nothing lost from base, nothing duplicated by the
    append. Time-travel (manifest-1 == the pre-cut filter) and
    append-only file reuse (v1 files are a prefix of v2's list) are
    pinned in tests/test_plans.py.

    At 100 TB this is why table formats exist: an append touches only
    its new files + one manifest + one pointer rename, readers never
    block, and old snapshots stay readable for reproducibility — the
    properties object stores can't give a bare directory listing.
    """
    root = versioned_orders_root(spark, sf_dir)
    return (
        read_snapshot(spark, root)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Line-oriented text source/sink round trip


@op(
    "scan_text_roundtrip",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)              AS n_docs,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids,
           CAST(sum(length(text)) AS BIGINT)      AS total_chars,
           CAST(sum(doc_id) AS BIGINT)            AS id_sum
    FROM documents
    """,
    tags=("ext", "source", "sink"),
)
def scan_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text sink + source round trip over documents.

    Serializes each document to one ``doc_id|text`` line with
    ``df.write.text``, reads the directory back with ``spark.read.text``,
    re-parses the two fields, and aggregates count / distinct ids /
    total text chars / id checksum; the oracle computes the same from
    the source table, so the hash-match proves the text codec round
    trip is byte-faithful for this corpus (the fixture text is
    newline-free by construction — a production text sink would
    escape or length-prefix, which parquet's binary layout makes
    unnecessary and is why the engine's default interchange stays
    parquet). Text scan/sink is still a required surface at scale:
    upstream crawls and downstream tokenizer pipelines speak
    line-delimited files, splittable per HDFS block exactly like any
    other splittable source.
    """
    d = load(spark, sf_dir, "documents")
    path = _scratch_path(sf_dir, "documents_lines")
    if not os.path.isfile(os.path.join(path, "_SUCCESS")):
        _atomic_write(
            lambda p: d.select(
                F.concat_ws("|", F.col("doc_id").cast("string"), F.col("text")).alias(
                    "value"
                )
            ).write.text(p),
            path,
        )
    back = spark.read.text(path).select(
        F.split_part(F.col("value"), F.lit("|"), F.lit(1)).cast("bigint").alias("doc_id"),
        F.substring_index(F.col("value"), "|", -1).alias("text"),
    )
    return back.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count_distinct("doc_id").cast("bigint").alias("n_ids"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
    )


# ---------------------------------------------------------------------------
# File-level min/max stats pruning (the Iceberg/Delta manifest-stats read)

_STATS_FILES = 8
_STATS_BOUND = "1997-06-01"


def range_files_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir) orders as ``_STATS_FILES`` range-clustered
    parquet files plus a ``file_stats.txt`` manifest of per-file
    o_orderdate min/max, harvested from the parquet FOOTERS (pyarrow,
    driver-side, bounded by file count) — exactly what a table format
    stores per data file at commit time so readers never open the file
    to learn its range."""
    root = _scratch_path(sf_dir, "orders_range_files")
    if not os.path.isfile(os.path.join(root, "_SUCCESS")):
        o = load(spark, sf_dir, "orders")

        def _build(staging: str) -> None:
            data = os.path.join(staging, "data")
            (
                o.repartitionByRange(_STATS_FILES, "o_orderdate")
                .write.parquet(data)
            )
            lines = []
            for f in _part_files(data):
                lo, hi = footer_minmax(f, "o_orderdate")
                rel = os.path.relpath(f, staging)
                lines.append(f"{rel}\t{lo.isoformat()}\t{hi.isoformat()}")
            with open(os.path.join(staging, "file_stats.txt"), "w") as fh:
                fh.write("\n".join(lines))
            with open(os.path.join(staging, "_SUCCESS"), "w"):
                pass

        _atomic_write(_build, root)
    return root


def footer_minmax(path: str, col: str):
    """(min, max) of a column across ALL of a parquet file's row groups,
    from footer statistics only — no data pages read. Multi-row-group
    files matter: each row group carries its own stats and a
    first-group-only harvest silently under-reports the range
    (pinned in tests/test_properties.py)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().names.index(col)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return lo, hi


def stats_pruned_files(root: str, bound: str) -> tuple[list[str], int]:
    """Resolve the file-stats manifest: (files whose [min,max] range can
    contain a row with o_orderdate >= bound, total file count)."""
    from datetime import datetime

    b = datetime.fromisoformat(bound)
    keep, total = [], 0
    with open(os.path.join(root, "file_stats.txt")) as fh:
        for line in fh.read().splitlines():
            rel, _lo, hi = line.split("\t")
            total += 1
            if datetime.fromisoformat(hi) >= b:
                keep.append(os.path.join(root, rel))
    return keep, total


@op(
    "scan_file_stats_pruning",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_STATS_BOUND} 00:00:00'
    GROUP BY o_orderstatus
    """,
    tags=("ext", "source", "scale"),
)
def scan_file_stats_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats file pruning: answer a date-range query touching
    ONLY the data files whose footer min/max can overlap the predicate —
    the other files are skipped without opening them.

    Directory listings force a 100 TB table scan to at least open every
    footer; table formats instead carry per-file column ranges in the
    commit manifest, so planning is a manifest read (KBs) and the scan
    list shrinks to the overlapping files — here 8 range-clustered files
    of which the late-date predicate keeps a strict subset
    (tests/test_plans.py pins pruned < total). The residual filter still
    applies inside the kept files (row-group pruning + predicate
    pushdown take over), so the result is exact: the oracle runs the
    same query over the unpruned table and the hash must match.
    """
    root = range_files_root(spark, sf_dir)
    keep, _total = stats_pruned_files(root, _STATS_BOUND)
    return (
        spark.read.parquet(*keep)
        .filter(F.col("o_orderdate") >= _STATS_BOUND)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Deletion vectors (merge-on-read soft deletes)

_DV_STATUS = "F"
_DV_MOD = 7


def delete_vectors_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir) an immutable orders base + a deletion
    vector: a tiny parquet of deleted o_orderkeys (every key ≡ 0 mod 7
    among status-F orders). The base files are NEVER rewritten — a
    delete commit writes only the key list, the merge-on-read pattern
    (Delta deletion vectors / Iceberg positional deletes reduced to a
    key-valued DV)."""
    root = _scratch_path(sf_dir, "orders_delete_vectors")
    if not os.path.isfile(os.path.join(root, "_SUCCESS")):
        o = load(spark, sf_dir, "orders")

        def _build(staging: str) -> None:
            o.write.parquet(os.path.join(staging, "base"))
            (
                o.filter(
                    (F.col("o_orderstatus") == _DV_STATUS)
                    & (F.col("o_orderkey") % _DV_MOD == 0)
                )
                .select("o_orderkey")
                .write.parquet(os.path.join(staging, "deletes"))
            )
            with open(os.path.join(staging, "_SUCCESS"), "w"):
                pass

        _atomic_write(_build, root)
    return root


@op(
    "sink_delete_vectors",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    WHERE NOT (o_orderstatus = '{_DV_STATUS}' AND o_orderkey % {_DV_MOD} = 0)
    GROUP BY o_orderstatus
    """,
    tags=("ext", "sink", "scale"),
)
def sink_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read deletes: the live table is base MINUS the deletion
    vector, applied at read time as a broadcast left-anti join on the
    key — no base file is ever rewritten.

    At 100 TB, copy-on-write deletes rewrite whole files to drop a few
    rows (write amplification measured in TBs for a GDPR erasure batch);
    the DV pattern writes KBs — the deleted-key list — and defers the
    subtraction to the scan, where it is a broadcast anti-join (DV side
    is small by construction; a bloom filter over it is the classic
    further step). Compaction later folds DVs into data files; both
    layout halves are already covered by sink_compaction. The oracle
    computes the same live set from the source table with the delete
    predicate inverted — hash-match proves no under- or over-delete.
    """
    root = delete_vectors_root(spark, sf_dir)
    base = spark.read.parquet(os.path.join(root, "base"))
    dv = spark.read.parquet(os.path.join(root, "deletes"))
    return (
        base.join(F.broadcast(dv), "o_orderkey", "left_anti")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Partition-spec evolution (old spec + new spec served as one table)

_EVOLVE_CUT = "1998-01-01"  # fixture dates span 1995-2001; cut mid-range


def evolved_partitions_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir) an orders table whose layout EVOLVED:
    rows before the cut live under spec-v1 (``year=``) directories, rows
    from the cut on under spec-v2 (``year=/o_orderstatus=``) — the
    Iceberg partition-evolution contract: a spec change applies to NEW
    data only; old files are never rewritten."""
    root = _scratch_path(sf_dir, "orders_evolved_spec")
    if not os.path.isfile(os.path.join(root, "_SUCCESS")):
        o = load(spark, sf_dir, "orders").withColumn(
            "year", F.year("o_orderdate").cast("int")
        )

        def _build(staging: str) -> None:
            (
                o.filter(F.col("o_orderdate") < _EVOLVE_CUT)
                .write.partitionBy("year")
                .parquet(os.path.join(staging, "spec1"))
            )
            (
                o.filter(F.col("o_orderdate") >= _EVOLVE_CUT)
                .write.partitionBy("year", "o_orderstatus")
                .parquet(os.path.join(staging, "spec2"))
            )
            with open(os.path.join(staging, "_SUCCESS"), "w"):
                pass

        _atomic_write(_build, root)
    return root


@op(
    "sink_partition_evolution",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
           o_orderstatus,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("ext", "sink", "scale"),
)
def sink_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read one logical table across a partition-spec change: early
    years laid out as ``year=``, later years as ``year=/status=``, both
    subtrees served as a single frame with identical logical schema.

    Repartitioning 100 TB because the query mix changed is the thing
    partition evolution exists to avoid: the spec change applies
    forward-only and the reader unions per-spec subtrees, aligning
    columns by name (the spec-1 branch recovers ``o_orderstatus`` from
    its data pages; the spec-2 branch recovers it from directory
    values). A status predicate still PRUNES DIRECTORIES in the spec-2
    subtree and falls back to row-group pushdown in spec-1 — pinned in
    tests/test_plans.py; the oracle aggregates the flat source table,
    so the hash-match proves the two layouts reassemble the exact
    original row set.
    """
    root = evolved_partitions_root(spark, sf_dir)
    s1 = spark.read.parquet(os.path.join(root, "spec1"))
    s2 = spark.read.parquet(os.path.join(root, "spec2"))
    cols = ["year", "o_orderstatus"]
    return (
        s1.select(*cols)
        .unionByName(s2.select(*cols))
        .groupBy("year", "o_orderstatus")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter file skipping (point-lookup data skipping)
# ---------------------------------------------------------------------------

_BLOOM_FILES = 8
_BLOOM_BITS = 1 << 17  # 16 KiB of bits per file
_BLOOM_K = 4  # hash functions: xxhash64 seeded 0..3
# Fixed probe set: TPC-H orderkeys 1..7 and 32..34 exist at every sf; the
# two 9-digit keys exist at none — absent probes must return no rows AND
# (with high probability) prune every file.
_BLOOM_PROBES = [1, 2, 3, 4, 5, 6, 7, 32, 33, 34, 999999937, 999999938]


def _bloom_positions(key_col, seed: int):
    """Bit position of ``key_col`` under hash function ``seed`` — the
    engine's own xxhash64, so probe-side and build-side agree exactly."""
    return F.pmod(F.xxhash64(F.lit(seed), key_col), F.lit(_BLOOM_BITS))


def bloom_files_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir) a key-hash-clustered lineitem layout plus a
    per-file bloom sidecar: ``data/`` holds _BLOOM_FILES parquet files
    shuffled on l_orderkey (each key's rows live in exactly one file);
    ``bloom/`` holds one row per (file, 64-bit word) with the OR of all
    key-hash bits — the compressed membership summary a manifest carries
    per data file (Parquet's own optional bloom filters / Delta
    stats-skipping, reduced to an explicit sidecar)."""
    root = _scratch_path(sf_dir, "lineitem_bloom_files")
    if not os.path.isfile(os.path.join(root, "_SUCCESS")):
        li = load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )

        def _build(staging: str) -> None:
            data = os.path.join(staging, "data")
            li.repartition(_BLOOM_FILES, "l_orderkey").write.parquet(data)
            back = (
                spark.read.parquet(data)
                .select(
                    F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias(
                        "file"
                    ),
                    "l_orderkey",
                )
                .distinct()
            )
            pos = back.select(
                "file",
                F.explode(
                    F.array(
                        *[
                            _bloom_positions(F.col("l_orderkey"), s)
                            for s in range(_BLOOM_K)
                        ]
                    )
                ).alias("pos"),
            )
            words = (
                pos.select(
                    "file",
                    (F.col("pos") / 64).cast("bigint").alias("word"),
                    F.expr("shiftleft(1L, int(pos % 64))").alias("bit"),
                )
                .groupBy("file", "word")
                .agg(F.bit_or("bit").alias("mask"))
            )
            words.write.parquet(os.path.join(staging, "bloom"))
            with open(os.path.join(staging, "_SUCCESS"), "w"):
                pass

        _atomic_write(_build, root)
    return root


def bloom_candidate_files(spark: SparkSession, root: str, probes: list[int]) -> tuple[list[str], int]:
    """(data files any probe key might live in, total file count).

    The membership test runs DISTRIBUTED — probe requirements (word,
    mask) equi-join the bloom sidecar on word per file; a file is a
    candidate for a key iff every one of its _BLOOM_K required bits is
    set. Only the candidate FILE LIST (bounded by file count) reaches
    the driver; no false negatives are possible (same xxhash64 on both
    sides), false positives only cost an extra file read."""
    need = (
        spark.createDataFrame([(k,) for k in probes], "k bigint")
        .select(
            "k",
            F.explode(
                F.array(*[_bloom_positions(F.col("k"), s) for s in range(_BLOOM_K)])
            ).alias("pos"),
        )
        .select(
            "k",
            (F.col("pos") / 64).cast("bigint").alias("word"),
            F.expr("shiftleft(1L, int(pos % 64))").alias("bit"),
        )
    )
    bloom = spark.read.parquet(os.path.join(root, "bloom"))
    hits = (
        bloom.join(F.broadcast(need), "word")
        .filter((F.col("mask").bitwiseAND(F.col("bit"))) == F.col("bit"))
        .groupBy("file", "k")
        .agg(F.count("*").alias("n_bits"))
        .filter(F.col("n_bits") == _BLOOM_K)
        .select("file")
        .distinct()
    )
    cand = sorted(r["file"] for r in hits.collect())
    data = os.path.join(root, "data")
    total = len(_part_files(data))
    return [os.path.join(data, f) for f in cand], total


@op(
    "sink_bloom_index",
    oracle=f"""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem
    WHERE l_orderkey IN ({", ".join(map(str, _BLOOM_PROBES))})
    GROUP BY 1
    """,
    tags=("ext", "sink", "source", "scale"),
)
def sink_bloom_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter data skipping for point lookups — the complement of
    min/max pruning (scan_file_stats_pruning): range stats cannot skip
    anything for a high-cardinality key scattered uniformly across
    files (every file's [min,max] spans the domain), but a 16 KiB
    per-file bloom answers "might this file contain key k?" and prunes
    every non-matching file.

    Layout: lineitem hash-clustered on l_orderkey into {_BLOOM_FILES}
    files + a (file, word, mask) bloom sidecar built with the engine's
    own xxhash64 ({_BLOOM_K} seeds over 2^17 bits). Probing is a
    distributed semi-join of required bits against the sidecar; the
    driver receives only the candidate file list, opens just those
    files, and the residual IN-filter makes the result exact — bloom
    false positives cost reads, never wrong rows. A present key's file
    is ALWAYS a candidate (no false negatives), so the oracle over the
    unpruned table must hash-match; the absent 9-digit probes return
    nothing. tests/test_plans.py pins that pruning actually bites
    (candidates < total files).

    At 100 TB this is the manifest-level bloom skipping of Parquet/
    Delta/Iceberg: planning cost is index-scale (KBs per file), scan
    cost collapses from all files to the probe's hash cells.
    """
    root = bloom_files_root(spark, sf_dir)
    keep, _total = bloom_candidate_files(spark, root, _BLOOM_PROBES)
    probes_lit = [F.lit(p) for p in _BLOOM_PROBES]
    if not keep:  # absent-only probe sets prune everything
        return spark.createDataFrame(
            [], "l_orderkey bigint, n_items bigint, revenue_cents bigint"
        )
    return (
        spark.read.parquet(*keep)
        .filter(F.col("l_orderkey").isin(_BLOOM_PROBES))
        .groupBy(F.col("l_orderkey").cast("bigint").alias("l_orderkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Snapshot expiry + orphan-file reclaim (the table-format GC)


_GC_CUT = "1997-01-01"


def _gc_orders_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir) a 3-snapshot table whose history makes GC
    meaningful, then run keep-last-2 expiry on it and record the result.

    History (the compaction-then-append lifecycle every real table has):

    - v1: orders before the cut as TWO files (``data/base/``)
    - v2: COMPACTION — the same rows rewritten as ONE file
      (``data/compact/``); manifest-2 references only the new file,
      so v1's files are now referenced by manifest-1 alone
    - v3: append of the remaining orders (``data/delta/``)

    Expiry with retain_last=2 drops snapshot v1: every file referenced
    only by expired manifests (the two pre-compaction base files) is
    physically deleted along with ``manifest-1.txt``; live files (the
    compacted file + the delta) are untouched. The reclaim stats land
    in ``GC_STATS`` at build time so repeated calls — the bench loop,
    the correctness driver — observe the identical one-shot result.
    """
    root = _scratch_path(sf_dir, "orders_gc_v1")
    if not os.path.isfile(os.path.join(root, "_SUCCESS")):
        o = load(spark, sf_dir, "orders")

        def _build(staging: str) -> None:
            base_dir = os.path.join(staging, "data", "base")
            compact_dir = os.path.join(staging, "data", "compact")
            delta_dir = os.path.join(staging, "data", "delta")
            early = o.filter(F.col("o_orderdate") < _GC_CUT)
            early.repartition(2).write.parquet(base_dir)
            early.repartition(1).write.parquet(compact_dir)
            o.filter(F.col("o_orderdate") >= _GC_CUT).repartition(1).write.parquet(
                delta_dir
            )
            rel = lambda d: [os.path.relpath(p, staging) for p in _part_files(d)]
            base_rel, compact_rel, delta_rel = (
                rel(base_dir),
                rel(compact_dir),
                rel(delta_dir),
            )
            manifests = {1: base_rel, 2: compact_rel, 3: compact_rel + delta_rel}
            for v, files in manifests.items():
                with open(os.path.join(staging, f"manifest-{v}.txt"), "w") as fh:
                    fh.write("\n".join(files))
            with open(os.path.join(staging, "VERSION"), "w") as fh:
                fh.write("3")
            # --- expire_snapshots(retain_last=2) + remove orphans ------
            retained = {2, 3}
            live = {f for v in retained for f in manifests[v]}
            expired_only = [
                f
                for v in set(manifests) - retained
                for f in manifests[v]
                if f not in live
            ]
            for f in sorted(set(expired_only)):
                os.remove(os.path.join(staging, f))
            for v in set(manifests) - retained:
                os.remove(os.path.join(staging, f"manifest-{v}.txt"))
            with open(os.path.join(staging, "GC_STATS"), "w") as fh:
                fh.write(f"{len(set(expired_only))}\n{len(live)}\n")
            with open(os.path.join(staging, "_SUCCESS"), "w"):
                pass

        _atomic_write(_build, root)
    return root


@op(
    "sink_snapshot_expire",
    oracle="""
    SELECT CAST(2 AS BIGINT) AS n_reclaimed,
           CAST(2 AS BIGINT) AS n_live_files,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    """,
    tags=("ext", "sink", "scale"),
)
def sink_snapshot_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot expiry + orphan-file reclaim — the GC half of the table
    format (Iceberg's expire_snapshots + remove_orphan_files) that
    versioned tables REQUIRE to not grow forever: compaction rewrites
    leave the pre-compaction files referenced only by old snapshots,
    and without expiry a 100 TB table pays for its history twice.

    The op builds a base→compact→append 3-snapshot history, expires to
    the last 2 snapshots (physically deleting the two files referenced
    only by the dropped snapshot, and its manifest), then reads the
    CURRENT snapshot and aggregates in integer cents. The oracle pins
    both halves: the literal reclaim counts (exactly the 2
    pre-compaction files reclaimed, exactly 2 live files remain —
    file counts are deterministic via repartition) and the full-table
    row count + cents total proving GC deleted nothing a live snapshot
    references. Reclaim correctness is set arithmetic over manifests —
    reference-counting, never directory listing, so a concurrent
    writer's half-staged files are simply not GC's business.

    Scale: expiry is a metadata-only operation — its cost is reading
    |retained| manifests, never the data; the deletes are O(reclaimed
    files). That is the entire point: at 100 TB you cannot afford GC
    that scans the table.
    """
    root = _gc_orders_root(spark, sf_dir)
    with open(os.path.join(root, "GC_STATS")) as fh:
        n_reclaimed, n_live = (int(line) for line in fh.read().splitlines())
    cur = read_snapshot(spark, root)
    return cur.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("total_cents"),
    ).select(
        F.lit(n_reclaimed).cast("bigint").alias("n_reclaimed"),
        F.lit(n_live).cast("bigint").alias("n_live_files"),
        "n_rows",
        "total_cents",
    )


# ---------------------------------------------------------------------------
# Write-Audit-Publish (staged snapshot gated by a quality audit)


_WAP_CUT = "1997-06-01"


def _wap_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) a WAP table: v1 = pre-cut orders; a GOOD delta
    (post-cut rows) staged, audited, and published as v2; then a BAD
    delta (all-NULL keys) staged, FAILED by the audit, and discarded —
    VERSION must still read 2 and the bad files must never be
    reachable from any manifest."""
    root = _scratch_path(sf_dir, "orders_wap_v1")
    if not os.path.isfile(os.path.join(root, "_SUCCESS")):
        o = load(spark, sf_dir, "orders")

        def _build(staging: str) -> None:
            base_dir = os.path.join(staging, "data", "base")
            good_dir = os.path.join(staging, "data", "delta_good")
            bad_dir = os.path.join(staging, "data", "delta_bad")
            o.filter(F.col("o_orderdate") < _WAP_CUT).write.parquet(base_dir)
            o.filter(F.col("o_orderdate") >= _WAP_CUT).write.parquet(good_dir)
            # the poisoned batch: NULL order keys (violates the audit)
            o.filter(F.col("o_orderdate") >= _WAP_CUT).limit(10).select(
                F.lit(None).cast("bigint").alias("o_orderkey"),
                *[c for c in o.columns if c != "o_orderkey"],
            ).write.parquet(bad_dir)
            rel = lambda d: [os.path.relpath(p, staging) for p in _part_files(d)]
            base_rel, good_rel = rel(base_dir), rel(good_dir)
            with open(os.path.join(staging, "manifest-1.txt"), "w") as fh:
                fh.write("\n".join(base_rel))
            with open(os.path.join(staging, "VERSION"), "w") as fh:
                fh.write("1")

            def audit(files: list[str]) -> bool:
                df = spark.read.parquet(*[os.path.join(staging, f) for f in files])
                bad = df.filter(F.col("o_orderkey").isNull()).count()
                return bad == 0 and df.count() > 0

            n_rejected = 0
            # WAP commit of the good batch: audit the WOULD-BE snapshot
            if audit(base_rel + good_rel):
                with open(os.path.join(staging, "manifest-2.txt"), "w") as fh:
                    fh.write("\n".join(base_rel + good_rel))
                with open(os.path.join(staging, "VERSION"), "w") as fh:
                    fh.write("2")
            # WAP commit of the poisoned batch: audit must REJECT it —
            # no manifest-3 is ever written, VERSION stays put, and the
            # staged bad files stay orphans (snapshot-expire's GC tier
            # is what sweeps them)
            if not audit(base_rel + good_rel + rel(bad_dir)):
                n_rejected += 1
            with open(os.path.join(staging, "WAP_STATS"), "w") as fh:
                fh.write(f"{n_rejected}\n")
            with open(os.path.join(staging, "_SUCCESS"), "w"):
                pass

        _atomic_write(_build, root)
    return root


@op(
    "sink_write_audit_publish",
    oracle="""
    SELECT CAST(2 AS BIGINT) AS published_version,
           CAST(1 AS BIGINT) AS n_rejected_batches,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    """,
    tags=("ext", "sink", "scale"),
)
def sink_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish — the staging discipline that keeps bad data
    out of a 100 TB table instead of cleaning it out afterwards: a
    batch lands as unreferenced files + a WOULD-BE manifest, a quality
    audit runs against that staged snapshot (null keys, emptiness —
    corpus_quality_gate's cousins at the table level), and only a
    passing audit publishes the VERSION pointer. Readers can never
    observe an unaudited row because visibility IS the pointer swap.

    The build commits one good batch (audit passes → v2 published) and
    one poisoned batch (NULL order keys → audit rejects, no manifest,
    VERSION untouched, files left as orphans for the snapshot-expire
    GC). The oracle pins the published-version and rejected-batch
    literals plus the full-table cents checksum: the published table
    contains exactly the audited rows — nothing from the poisoned
    batch, nothing lost from the good one.

    Scale: the audit reads ONLY the staged snapshot's files (new batch
    + base via manifest resolution — in production the audit query is
    usually delta-only); publish is one pointer rename. Cost scales
    with the batch, never the table.
    """
    root = _wap_root(spark, sf_dir)
    with open(os.path.join(root, "WAP_STATS")) as fh:
        n_rejected = int(fh.read().strip())
    with open(os.path.join(root, "VERSION")) as fh:
        version = int(fh.read().strip())
    cur = read_snapshot(spark, root)
    return cur.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("total_cents"),
    ).select(
        F.lit(version).cast("bigint").alias("published_version"),
        F.lit(n_rejected).cast("bigint").alias("n_rejected_batches"),
        "n_rows",
        "total_cents",
    )
