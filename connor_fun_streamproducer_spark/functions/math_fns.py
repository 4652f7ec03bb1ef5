"""Math function family (fn_math).

All JVM-side built-ins inside whole-stage codegen. Engine deltas handled
in the oracle: DuckDB floor/ceil return DOUBLE (Spark returns BIGINT →
cast), DuckDB ln == Spark log (natural).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op


@op(
    "fn_math",
    oracle="""
    SELECT event_id,
           round(abs(value - 100), 4)                       AS abs_dev,
           CAST(floor(value) AS BIGINT)                     AS value_floor,
           CAST(ceil(value) AS BIGINT)                      AS value_ceil,
           round(ln(value + 1), 4)                          AS log1p_value,
           round(sqrt(value), 4)                            AS sqrt_value,
           round(pow(value, 2), 4)                          AS value_sq,
           CAST(event_id % 7 AS BIGINT)                     AS id_mod7,
           CAST(sign(value - 100) AS DOUBLE)                AS dev_sign,
           round(value / nullif(CAST(event_id % 5 AS DOUBLE), 0), 4) AS safe_div
    FROM events
    """,
    tags=("ext", "fn"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/floor/ceil/log/sqrt/pow/pmod/sign + NULLIF-guarded division.

    ``value`` is strictly positive in the fixture, so ln/sqrt are total;
    pmod on non-negative ids equals %. safe_div is the division-by-zero
    idiom (NULL, not error/Inf) — id%5==0 rows yield NULL on both engines.
    """
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.round(F.abs(F.col("value") - 100), 4).alias("abs_dev"),
        F.floor("value").alias("value_floor"),
        F.ceil("value").alias("value_ceil"),
        F.round(F.log(F.col("value") + 1), 4).alias("log1p_value"),
        F.round(F.sqrt("value"), 4).alias("sqrt_value"),
        F.round(F.pow("value", F.lit(2)), 4).alias("value_sq"),
        F.pmod(F.col("event_id"), F.lit(7)).cast("bigint").alias("id_mod7"),
        F.signum(F.col("value") - 100).alias("dev_sign"),
        F.round(
            F.col("value") / F.nullif((F.col("event_id") % 5).cast("double"), F.lit(0.0)), 4
        ).alias("safe_div"),
    )


@op(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           round(least(o_totalprice, 100000.0), 2)    AS capped,
           round(greatest(o_totalprice, 1000.0), 2)   AS floored,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_recode,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 50000  THEN 'mid'
                ELSE 'low' END                        AS band
    FROM orders
    """,
    tags=("ext", "fn"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar family: least/greatest, coalesce∘nullif recode,
    multi-arm CASE banding — the expression vocabulary of feature
    clamping and categorical recodes. All codegen'd JVM expressions in
    one map-only projection: no shuffle, partitioning preserved, and the
    whole row fuses into the scan's WholeStageCodegen span at any scale.
    """
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(F.least("o_totalprice", F.lit(100000.0)), 2).alias("capped"),
        F.round(F.greatest("o_totalprice", F.lit(1000.0)), 2).alias("floored"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_recode"
        ),
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("low")
        .alias("band"),
    )


# Great-circle reference point (continental-US centroid-ish) and radius.
_GEO_REF_LAT = 39.5
_GEO_REF_LON = -98.35
_EARTH_R_KM = 6371.0


from connor_fun_streamproducer_spark.streaming.pipeline import (  # noqa: E402
    _LAT_EXPR,
    _LON_EXPR,
)


@op(
    "fn_geo_haversine",
    oracle=f"""
    SELECT event_id,
           round(2 * {_EARTH_R_KM} * asin(sqrt(
               pow(sin(radians(lat - {_GEO_REF_LAT}) / 2), 2)
               + cos(radians(lat)) * cos(radians({_GEO_REF_LAT}))
                 * pow(sin(radians(lon - {_GEO_REF_LON}) / 2), 2)
           )), 3) AS dist_km
    FROM (
        SELECT event_id, {_LON_EXPR} AS lon, {_LAT_EXPR} AS lat
        FROM events
    )
    """,
    tags=("ref", "fn", "geo"),
)
def fn_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine great-circle distance from every event to a fixed
    reference point — the geo-native scalar the reference's domain
    (bbox-filtered geo streams, locations.json center coordinates)
    implies but the Go code never computes.

    Identical formula text on both engines (radians → half-angle sines →
    asin), rounded at 3 decimals of a kilometre. Rounding-boundary
    safety is MEASURED, not assumed: over the full synthesized integer
    coordinate domain the closest distance to any .xxx5 km boundary is
    9.4e-7 km (tests/test_properties.py pins ≥1e-7), ~100× the libm
    cross-engine deviation (~1e-8 km at these magnitudes), so no
    platform's trig can flip a rounded digit. The oracle interpolates
    the SAME _LON_EXPR/_LAT_EXPR the implementation uses — coordinate
    synthesis can never silently diverge between the two sides. Map-only
    codegen'd math — no shuffle, fuses into the scan's codegen span; at
    100 TB this is the per-row enrichment you run before a distance
    threshold filter (which then pushes down as a plain predicate).
    """
    from connor_fun_streamproducer_spark.streaming.pipeline import with_coords

    e = with_coords(load(spark, sf_dir, "events"))
    lat1 = F.radians(F.col("lat"))
    dlat = F.radians(F.col("lat") - _GEO_REF_LAT) / 2
    dlon = F.radians(F.col("lon") - _GEO_REF_LON) / 2
    h = (
        F.pow(F.sin(dlat), 2)
        + F.cos(lat1) * F.cos(F.radians(F.lit(_GEO_REF_LAT))) * F.pow(F.sin(dlon), 2)
    )
    dist = 2 * _EARTH_R_KM * F.asin(F.sqrt(h))
    return e.select("event_id", F.round(dist, 3).alias("dist_km"))


@op(
    "fn_bitwise",
    oracle="""
    SELECT event_type,
           CAST(bit_and(event_id) AS BIGINT)           AS id_and,
           CAST(bit_or(event_id) AS BIGINT)            AS id_or,
           CAST(bit_xor(event_id) AS BIGINT)           AS id_xor,
           CAST(sum(CASE WHEN (event_id >> 3) & 1 = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS bit3_set
    FROM events
    GROUP BY event_type
    """,
    tags=("ext", "function"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate + scalar surface: AND/OR/XOR folds per group and
    a bit-test (``(id >> 3) & 1``) conditional count.

    The flag-mask workhorses — XOR folds for checksum-style parity
    across a partition (the exact pairing detector: duplicated rows
    cancel), OR for "any flag seen", AND for "flags always set", and a
    shifted bit-probe for reading packed bitfields. All native JVM
    aggregates with map-side partials (associative+commutative, so the
    exchange carries one 8-byte partial per group per core); the bit
    probe fuses into the scan's codegen span.
    """
    ev = load(spark, sf_dir, "events")
    bit3 = (F.shiftright(F.col("event_id"), 3).bitwiseAND(F.lit(1)) == 1)
    return ev.groupBy("event_type").agg(
        F.bit_and("event_id").cast("bigint").alias("id_and"),
        F.bit_or("event_id").cast("bigint").alias("id_or"),
        F.bit_xor("event_id").cast("bigint").alias("id_xor"),
        F.sum(F.when(bit3, 1).otherwise(0)).cast("bigint").alias("bit3_set"),
    )


@op(
    "fn_try_arith",
    oracle="""
    SELECT event_id,
           round(value / (user_id % 5), 4)                  AS safe_ratio,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           TRY_CAST(event_type AS BIGINT)                   AS bad_cast
    FROM events
    """,
    tags=("ext", "fn"),
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic and casts (``try_*``): malformed input
    becomes NULL instead of killing the job — the ANSI-mode survival
    kit for dirty 100 TB data.

    Three shapes: division where the divisor can be zero
    (``try_divide`` → null, matching DuckDB's SQL NULL-on-zero-divide),
    a cast of a JSON-extracted digit string (succeeds), and a cast of a
    non-numeric string (fails → typed NULL, not an exception). Under
    ANSI SQL mode (Spark 4's default) the un-guarded forms THROW on the
    first bad row of a 100 TB scan — the try_ family is what makes a
    long-running ingest total: per-row failures become per-row nulls
    that downstream quality gates count and quarantine. All map-side
    codegen'd expressions; zero cost over the unsafe forms.
    """
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.round(F.try_divide(F.col("value"), F.col("user_id") % 5), 4).alias(
            "safe_ratio"
        ),
        F.expr(
            "try_cast(get_json_object(props, '$.k') AS BIGINT)"
        ).alias("k_val"),
        F.expr("try_cast(event_type AS BIGINT)").alias("bad_cast"),
    )
