"""Kafka transport path: as exercised as this environment allows.

The reference's entire output side is a Kafka produce
(regionSpout.go:156-160). The production path here is
``sources/streams.kafka_source`` / ``kafka_sink``; actually running it
needs the spark-sql-kafka connector jar and a broker, and this sandbox has
neither (the jar is not bundled with the pyspark pip distribution, and
Maven Central is unreachable — ``curl repo1.maven.org`` fails DNS; attempt
documented in COVERAGE.md; re-attempted in rounds 5, 6, 7 and 8, still
DNS-blocked (r8: ``urlopen repo1.maven.org`` → "Name or service not
known") — rounds 6, 7 and 8 also confirmed no kafka/spark-sql-kafka jar
exists anywhere on the filesystem to sideload).
The broker-less transport proof is ``sink_socket_roundtrip``
(sources/streams.py): the same to_json frame the Kafka sink uses, shipped
over a live TCP socket and parsed back, externally hash-verified in r04.

What CAN be verified offline, is: the configured reader/writer reaches
Spark's data-source resolution and fails *cleanly* with the canonical
missing-connector error — i.e. our configs are structurally valid and the
failure is the environment's, not the code's. The routing/serialization
logic that feeds the sink is oracle-verified batch-side (route_by_key,
proj_serialize).
"""

from __future__ import annotations

import pytest

from connor_fun_streamproducer_spark.sources.streams import (
    events_stream,
    kafka_sink,
    kafka_source,
)
from tests.conftest import SF_DIR


def _kafka_connector_available(spark) -> bool:
    """True when the spark-sql-kafka datasource actually resolves."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "kafka", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


@pytest.fixture(autouse=True)
def _skip_if_connector_present(spark):
    # These tests document THIS sandbox's limitation (no connector jar).
    # In an environment where the kafka datasource resolves, the clean-
    # failure assertions are meaningless — skip rather than fail.
    if _kafka_connector_available(spark):
        pytest.skip("spark-sql-kafka connector available; missing-connector tests not applicable")


def test_kafka_source_fails_clean_on_missing_connector(spark):
    """Reader config is accepted; stream start dies on connector lookup
    (not on our options) with the canonical guidance error."""
    with pytest.raises(Exception) as ei:
        kafka_source(spark, "localhost:9092", "events").writeStream.format(
            "noop"
        ).start()
    msg = str(ei.value)
    assert "kafka" in msg.lower(), msg
    # Spark's own "deploy with spark-sql-kafka" guidance error — proves the
    # failure is jar availability, not a malformed reader config.
    assert "FAILED_TO_LOAD_DATA_SOURCE" in msg or "Failed to find" in msg, msg


def test_kafka_sink_fails_clean_on_missing_connector(spark, tmp_path):
    """A serialized (key, value, topic) frame wired to the Kafka writer
    fails only at connector lookup."""
    sdf = events_stream(spark, SF_DIR).selectExpr(
        "CAST(event_id AS STRING) AS key",
        "to_json(struct(*)) AS value",
        "'events' AS topic",
    )
    writer = kafka_sink(sdf, "localhost:9092", str(tmp_path / "ckpt"))
    with pytest.raises(Exception) as ei:
        writer.start()
    msg = str(ei.value)
    assert "kafka" in msg.lower(), msg
    assert "FAILED_TO_LOAD_DATA_SOURCE" in msg or "Failed to find" in msg, msg
