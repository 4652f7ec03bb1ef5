"""Table registry over the driver's parquet fixtures.

The reference's only "catalog" is a hard-coded path to ./locations.json
(/root/reference/regionSpout.go:169-184: open, read-all, unmarshal, panic on
error). Ours is a thin registry over a scale-factor directory of parquet
tables with explicit, checked schemas — schema-on-read with verification
instead of the reference's schema-oblivious payload handling
(regionSpout.go:152 marshals tweets without ever reading a field).

All reads go through ``spark.read.parquet`` so Catalyst gets column pruning
and predicate pushdown for free; at 100 TB these tables would be
partitioned/bucketed parquet on object storage and the same calls apply.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver's canonical tables (TESTDATA.md / FIXTURES.md §B).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy; columnar scan).

    ``events.ts`` is physically TIMESTAMP(NANOS) parquet; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as a nanos BIGINT,
    which we truncate to microsecond TimestampType — the exact truncation
    DuckDB applies when it reads the same file, so oracle timestamps match.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for SQL-form operators."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
