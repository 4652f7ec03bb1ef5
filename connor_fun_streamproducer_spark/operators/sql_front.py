"""The SQL front door: the engine accepts ANSI SQL strings directly.

Everything else in the package declares plans through the DataFrame API;
this module proves the equivalent ``spark.sql(...)`` surface — the entry
point BI tools and ad-hoc users actually hit. ONE query string drives both
the engine and the oracle (modulo nothing — the text is identical), so the
check certifies dialect-compatible SQL ingestion, not just result parity.

The reference has no query language at all (SURVEY.md §3); this is part of
the EXT "what its downstream analytics would run" surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op

# Written once, run verbatim on BOTH engines. Constraints that keep it
# dialect-portable: EXTRACT (not year()), explicit casts where engine
# default types differ (EXTRACT → int vs BIGINT), aliased aggregates.
_SQL = """
SELECT n_name,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS total
FROM {orders} o
JOIN {customer} c ON o.o_custkey = c.c_custkey
JOIN {nation} n ON c.c_nationkey = n.n_nationkey
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
"""


@op(
    "sql_api",
    oracle=_SQL.format(orders="orders", customer="customer", nation="nation"),
    tags=("ext", "sql"),
)
def sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run a multi-join aggregate through ``spark.sql`` over temp views.

    The SAME string the oracle executes (table names substituted) goes
    through Spark's SQL parser → Catalyst → the identical physical
    machinery as the DataFrame ops: broadcast of the 25-row nation dim,
    shuffled customer join, partial+final aggregation. Registering views
    is idempotent (createOrReplaceTempView), so repeated calls on a
    shared session don't accumulate state.
    """
    for t in ("orders", "customer", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"v_sql_{t}")
    return spark.sql(
        _SQL.format(orders="v_sql_orders", customer="v_sql_customer", nation="v_sql_nation")
    )
