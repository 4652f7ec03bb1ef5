"""JSON function family (fn_json).

The reference's whole data model is opaque JSON: tweets are marshaled
blind (/root/reference/regionSpout.go:152) and region metadata rides along
as a JSON string (regionSpout.go:50). This family gives the engine the
tools the reference never had: schema'd parsing (from_json), path
extraction (get_json_object), multi-field extraction (json_tuple), and
re-serialization (to_json) — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op


@op(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')          AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.missing')    AS missing_path,
           json_valid(props)                          AS is_valid
    FROM events
    """,
    tags=("ext", "fn"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path extraction + typed parse + absent-path NULL + validity probe."""
    e = load(spark, sf_dir, "events")
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed["k"].alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_path"),
        F.from_json("props", T.MapType(T.StringType(), T.StringType())).isNotNull().alias("is_valid"),
    )


@op(
    "fn_json_roundtrip",
    oracle="""
    SELECT event_id, event_type, CAST(json_extract(j, '$.value') AS DOUBLE) AS value_rt
    FROM (
        SELECT event_id, event_type,
               json_object('event_type', event_type, 'value', value) AS j
        FROM events
    )
    """,
    tags=("ext", "fn"),
)
def fn_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json(struct) → from_json round-trip fidelity (the serialize
    path of the Kafka sink, proven lossless for typed fields)."""
    e = load(spark, sf_dir, "events")
    j = F.to_json(F.struct("event_type", "value"))
    schema = T.StructType(
        [T.StructField("event_type", T.StringType()), T.StructField("value", T.DoubleType())]
    )
    return e.select(
        "event_id",
        "event_type",
        F.from_json(j, schema)["value"].alias("value_rt"),
    )


@op(
    "fn_xml_roundtrip",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           round(o_totalprice, 4) AS price_r4
    FROM orders
    """,
    tags=("ext", "fn", "format"),
)
def fn_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML format surface: to_xml → from_xml round trip proven to identity.

    Spark 4 ships XML natively (no spark-xml package needed); each order
    row serializes to an XML document and parses back against the typed
    schema. The oracle reads the ORIGINAL columns, so the hash-match
    proves parse(serialize(x)) == x through the XML text layer — key,
    status string, and double price (rounded at 4 on both sides to stay
    off decimal-tie boundaries, the registry convention). Map-only:
    both conversions are codegen'd expressions in one projection; at
    100 TB this is the XML flavor of the proj_serialize envelope path.
    """
    o = load(spark, sf_dir, "orders")
    xml = o.select(
        F.to_xml(F.struct("o_orderkey", "o_orderstatus", "o_totalprice")).alias("doc")
    )
    parsed = xml.select(
        F.from_xml(
            "doc", "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
        ).alias("r")
    )
    return parsed.select(
        F.col("r.o_orderkey").alias("o_orderkey"),
        F.col("r.o_orderstatus").alias("o_orderstatus"),
        F.round("r.o_totalprice", 4).alias("price_r4"),
    )
