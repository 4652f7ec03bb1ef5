"""PySpark-native analytics engine with the capabilities of
CUBigDataClass/connor.fun-StreamProducer (reference read-only at
/root/reference/), re-expressed Spark-first and extended with a full
relational + LLM-data-pipeline operator surface.

Layout
------
- ``session``    — SparkSession factory (AQE on, UTC, Arrow, sane shuffle).
- ``catalog``    — table registry over the driver's parquet fixtures.
- ``registry``   — operator registry: every op key from SURVEY.md §2 maps to
                   a ``(spark, sf_dir) -> DataFrame`` callable plus (where
                   SQL-expressible) a DuckDB oracle SQL string.
- ``operators/`` — relational operators (joins, aggs, windows, sorts, setops).
- ``functions/`` — scalar function families (string/date/math/array/map/json).
- ``sources/``   — batch + streaming sources and sinks.
- ``streaming/`` — Structured Streaming parity tier for the reference's
                   pipeline (regionSpout.go): geo source, enrichment,
                   routing, windowed counts, health monitoring, state.
- ``llm/``       — LLM-data-pipeline tier: dedup, similarity search,
                   text analysis, multimodal columns.
- ``plans/``     — plan-inspection helpers (broadcast/pushdown assertions).
"""

from connor_fun_streamproducer_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
