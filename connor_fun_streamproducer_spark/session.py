"""SparkSession factory.

One session per process, tuned for the driver's harness (local[N], single
JVM) but configured the way a 1000-executor cluster job would be: AQE on
(runtime coalesce + skew-join handling), UTC session time zone (oracle
comparability), Arrow transfer for the Pandas-UDF slow path, and shuffle
partitions sized to the actual parallelism rather than the 200 default.

The reference process equivalent is ``main``'s bootstrap
(/root/reference/regionSpout.go:57-75): env-config → clients → panic on
error. Here the "clients" are one SparkSession and failures raise normally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partitions: match local core count; on a real cluster this would be
# ~2-3x total executor cores (and AQE coalesces the excess at runtime).
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "connor_fun_spark", cpus: str | None = None) -> SparkSession:
    """Build (or fetch) the process-wide SparkSession.

    Every config below is a 100 TB-posture default, not a local hack:

    - ``spark.sql.adaptive.enabled`` + coalesce + skewJoin: runtime re-plan
      of shuffle partition counts and skew splitting — the safety net for
      skewed region/user keys (the reference's per-region fanout has the
      same skew problem, solved there by one goroutine per region).
    - ``spark.sql.session.timeZone=UTC``: deterministic event-time windows,
      and bit-identical timestamps vs the DuckDB oracle.
    - ``spark.sql.execution.arrow.pyspark.enabled``: Arrow batches for the
      few Pandas-UDF operators (similarity scoring, stateful counters).
    - ``spark.sql.shuffle.partitions``: sized to parallelism; AQE coalesces
      down when partitions are small.
    - ``spark.sql.autoBroadcastJoinThreshold`` stays at default (10 MB) —
      dimension tables (region/nation ≈ the reference's ≤25 locations,
      regionSpout.go:77) broadcast automatically; big joins sort-merge.
    """
    n = cpus or _DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
        # The driver's events.parquet carries TIMESTAMP(NANOS), which Spark
        # rejects by default; read as nanos-long and let the catalog
        # truncate to microseconds (same truncation DuckDB applies).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ICU collation-aware case mapping pays a ~60 s one-time static
        # init in this container; JVM case mapping is semantically
        # identical for ASCII data and matches DuckDB's upper/lower.
        .config("spark.sql.icu.caseMappings.enabled", "false")
        # Managed tables (bucketed-join layouts) land in scratch, not the
        # repo root; the in-memory catalog forgets them between sessions,
        # so writers must clean stale locations (operators/scale_patterns).
        .config("spark.sql.warehouse.dir", "/root/repo/.scratch/spark-warehouse")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
