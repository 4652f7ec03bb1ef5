"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern (SURVEY.md §2.2): media rides in a BinaryType column next to a
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row objects.

The container has no image/audio codecs, so the *decode* step is stubbed
(`decode_image`: NotImplementedError) and the shipped extractor uses a
deterministic byte-level fake — but the Spark-side plumbing (schema,
binary encoding, Arrow batch shape, partition-parallel extraction) is real
and oracle-verified byte-for-byte.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op


def decode_image(payload: bytes):  # pragma: no cover — container lacks codecs
    """Real decoder slot (PIL/libvips/ffmpeg in production images)."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "wire PIL/av here and return (height, width, channels, pixels)"
    )


def _extract_features(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    """Arrow-batched feature extractor over binary payloads.

    Deterministic byte-level stand-in for decode+featurize: header sum of
    the first 4 bytes and payload length. One pandas op per batch — the
    shape a real decoder plugs into (swap the lambda for decode_image).
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": payloads.map(len).astype("int64"),
                "header_sum": payloads.map(lambda b: int(sum(b[:4]))).astype("int64"),
            }
        )


@op(
    "multimodal_cols",
    oracle="""
    SELECT doc_id,
           'text/utf-8'                       AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(ascii(substring(text, 1, 1)) + ascii(substring(text, 2, 1))
              + ascii(substring(text, 3, 1)) + ascii(substring(text, 4, 1)) AS BIGINT)
               AS header_sum
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + metadata → mapInPandas feature extraction.

    documents.text is encoded to a BinaryType payload (the fixture's
    stand-in for image/audio bytes — production would `spark.read.format(
    "binaryFile")` or decode from object-store URIs), tagged with a
    modality string, then features are extracted per Arrow batch. The
    oracle recomputes the byte-level features from the source text (ASCII
    corpus ⇒ byte i == ascii(char i)), proving the binary round-trip.
    """
    d = load(spark, sf_dir, "documents")
    framed = d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/utf-8").alias("modality"),
    )
    return framed.mapInPandas(
        _extract_features,
        schema="doc_id bigint, modality string, n_bytes bigint, header_sum bigint",
    )
