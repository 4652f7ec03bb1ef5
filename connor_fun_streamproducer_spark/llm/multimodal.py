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


FRAME_BYTES = 16   # fake "frame" size over the byte stream
FRAME_STRIDE = 4   # keep every 4th frame


def _sample_frames(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    """Arrow-batched frame sampler: every FRAME_STRIDE-th full FRAME_BYTES
    window of each payload, with a per-frame byte checksum.

    The video stand-in: a real pipeline swaps the byte-window slicing for
    container demux + keyframe decode (pyav/ffmpeg), keeping the exact
    same batch shape — (doc_id, frame_id, frame feature row) per sampled
    frame, one pandas pass per Arrow batch.
    """
    for pdf in batches:
        out_doc, out_fid, out_sum = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            nf = len(payload) // FRAME_BYTES
            for f in range(0, nf, FRAME_STRIDE):
                out_doc.append(doc_id)
                out_fid.append(f)
                out_sum.append(int(sum(payload[f * FRAME_BYTES:(f + 1) * FRAME_BYTES])))
        yield pd.DataFrame(
            {"doc_id": out_doc, "frame_id": out_fid, "frame_sum": out_sum},
            dtype="int64" if out_doc else None,
        )


@op(
    "multimodal_framesample",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, text,
               CAST(floor(octet_length(encode(text)) / {FRAME_BYTES}) AS BIGINT) AS n_frames
        FROM documents
    ), idx AS (SELECT unnest(generate_series(0, 63)) AS fi)
    SELECT f.doc_id,
           idx.fi AS frame_id,
           CAST(list_sum(list_transform(range(1, {FRAME_BYTES} + 1),
                i -> ascii(substring(f.text, CAST(idx.fi * {FRAME_BYTES} AS INTEGER) + i, 1))))
               AS BIGINT) AS frame_sum
    FROM f JOIN idx ON idx.fi < f.n_frames AND idx.fi % {FRAME_STRIDE} = 0
    """,
    tags=("llm", "multimodal"),
)
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary media payloads (video-pipeline shape).

    Each payload is treated as a stream of {FRAME_BYTES}-byte frames;
    every {FRAME_STRIDE}-th full frame is kept and checksummed — the
    partition-parallel sampling stage of a video training pipeline
    (decode is the honestly-stubbed slot, decode_image above; the fake is
    deterministic byte arithmetic so the oracle can verify the plumbing
    byte-for-byte). Output fan-out is frames/stride per doc; at 100 TB
    the op is map-only over Arrow batches — no shuffle, no Python row
    objects, output partitioning inherited from the scan. The oracle
    recomputes frame sums from the source text (ASCII corpus ⇒ byte i ==
    ascii(char i)) with a bounded frame-index series (fixture docs ≤ 63
    frames).
    """
    d = load(spark, sf_dir, "documents")
    framed = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return framed.mapInPandas(
        _sample_frames, schema="doc_id bigint, frame_id bigint, frame_sum bigint"
    )


RESIZE_FACTOR = 4  # decimation factor: keep every 4th byte


def _resize_payloads(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    """Arrow-batched resize stand-in: decimate each payload by
    RESIZE_FACTOR (keep every 4th byte) and checksum the result.

    Real pipelines put PIL.Image.resize / ffmpeg scale here; the batch
    contract is identical — payload in, smaller payload's features out,
    one vectorizable pass per Arrow batch.
    """
    for pdf in batches:
        resized = pdf["payload"].map(lambda b: b[::RESIZE_FACTOR])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes_in": pdf["payload"].map(len).astype("int64"),
                "n_bytes_out": resized.map(len).astype("int64"),
                "resized_sum": resized.map(lambda b: int(sum(b))).astype("int64"),
            }
        )


@op(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_in,
           CAST(ceil(octet_length(encode(text)) / {RESIZE_FACTOR}.0) AS BIGINT) AS n_bytes_out,
           CAST(list_sum(list_transform(
                    list_filter(range(0, 256), i -> i * {RESIZE_FACTOR} + 1 <= length(text)),
                    i -> ascii(substring(text, CAST(i * {RESIZE_FACTOR} + 1 AS INTEGER), 1))))
               AS BIGINT) AS resized_sum
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media resize/downsample stage (byte-decimation stand-in).

    Completes the multimodal stage set (decode-stub / feature-extract /
    resize / frame-sample): each binary payload is decimated by a factor
    of {RESIZE_FACTOR} inside an Arrow batch — the pixel-resize slot of an
    image pipeline with the codec honestly stubbed, byte arithmetic kept
    real so the oracle verifies the plumbing exactly. Map-only: no
    shuffle, partitioning inherited, output bytes ~1/{RESIZE_FACTOR} of
    input — at 100 TB this is the stage that shrinks the working set
    before expensive feature models run.
    """
    d = load(spark, sf_dir, "documents")
    framed = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return framed.mapInPandas(
        _resize_payloads,
        schema="doc_id bigint, n_bytes_in bigint, n_bytes_out bigint, resized_sum bigint",
    )
