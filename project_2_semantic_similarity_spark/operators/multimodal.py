"""Multimodal column plumbing (SURVEY.md north-star "multimodal
columns"): image/audio/video payloads ride as opaque ``binary``
columns with typed metadata; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` operators.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
``decode_media`` is a clearly-marked stub — but everything Spark
cares about is real and tested: the schema contract, the binary
column flow, the Arrow batch shape, and the partition-parallel UDF
signature. Swapping in a real decoder changes only the body of
``_decode_payload``.

At 100 TB: payloads live in parquet binary columns (or object-store
pointers for >~1 MB blobs); mapInPandas streams Arrow batches so
executor memory is bounded by batch size, not partition size — set
``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep
(batch rows × payload size) inside the executor budget."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "mean_byte double, features array<double>"
)


def attach_binary_payload(docs: DataFrame,
                          media_type: str = "text/plain") -> DataFrame:
    """Stand-in payload: UTF-8 bytes of the text column. A real
    pipeline reads image/audio bytes from parquet binary columns —
    the downstream operators only see ``payload: binary``."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
    )


def _decode_payload(payload: bytes, media_type: str) -> list[float]:
    """STUB decoder. Real media types need codecs absent from this
    container; the deterministic fake below exercises the identical
    dataflow for text payloads."""
    if media_type.startswith(("image/", "audio/", "video/")):
        raise NotImplementedError(
            f"no codec for {media_type} in this environment; "
            "plug a real decoder into _decode_payload")
    # Deterministic fake features: mean byte value of each of
    # FEATURE_DIM contiguous chunks.
    n = len(payload)
    if n == 0:
        return [0.0] * FEATURE_DIM
    step = max(1, n // FEATURE_DIM)
    feats = []
    for i in range(FEATURE_DIM):
        chunk = payload[i * step:(i + 1) * step] or payload[-step:]
        feats.append(sum(chunk) / len(chunk))
    return feats


FRAME_SCHEMA = ("doc_id bigint, frame_idx int, frame binary, "
                "n_bytes bigint")


def sample_frames(payloads: DataFrame, n_frames: int = 4) -> DataFrame:
    """One-to-many mapInPandas: sample ``n_frames`` evenly spaced
    frames from each payload → (doc_id, frame_idx, frame, n_bytes).

    For real video this is the ffmpeg keyframe path (codec absent
    here — the deterministic fake chops the payload into
    ceil(n/k)-byte chunks, exercising the same fan-out batch shape:
    each Arrow input batch yields a larger output batch, which is
    what Spark has to plan for in the schema/partitioning contract).
    Chunk rule: step = ceil(n_bytes / n_frames); frame i =
    payload[i*step : (i+1)*step] for i*step < n_bytes."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, sizes = [], [], [], []
            for doc_id, payload, media_type in zip(
                    pdf["doc_id"], pdf["payload"], pdf["media_type"]):
                if media_type.startswith(("image/", "audio/", "video/")):
                    raise NotImplementedError(
                        f"no codec for {media_type} in this environment; "
                        "plug a real frame sampler into sample_frames")
                n = len(payload)
                step = max(1, -(-n // n_frames))
                for i in range(n_frames):
                    if i * step >= n:
                        break
                    chunk = payload[i * step:(i + 1) * step]
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(chunk))
                    sizes.append(len(chunk))
            yield pd.DataFrame({
                "doc_id": ids, "frame_idx": idxs,
                "frame": frames, "n_bytes": sizes,
            })

    return payloads.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = ("doc_id bigint, orig_bytes bigint, resized binary")


def resize_media(payloads: DataFrame, target_bytes: int = 16) -> DataFrame:
    """Resize each payload to exactly ``target_bytes`` by
    nearest-neighbor sampling: output byte i is input byte
    floor(i * n / target), for i in 0..target-1 (upsamples by
    duplication when n < target; empty payloads stay empty).

    For real images this is the interpolation step of a
    decode→resize→re-encode pipeline (codec absent here — the 1-D
    byte form exercises the identical contract: fixed-size output
    rows from variable-size input rows through an Arrow batch).
    Fixed-size outputs are what make the downstream columnar layout
    predictable — at 100 TB the resized column is a constant
    bytes-per-row parquet column regardless of source media size."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, origs, outs = [], [], []
            for doc_id, payload, media_type in zip(
                    pdf["doc_id"], pdf["payload"], pdf["media_type"]):
                if media_type.startswith(("image/", "audio/", "video/")):
                    raise NotImplementedError(
                        f"no codec for {media_type} in this environment; "
                        "plug a real resampler into resize_media")
                n = len(payload)
                ids.append(doc_id)
                origs.append(n)
                outs.append(bytes(payload[i * n // target_bytes]
                                  for i in range(target_bytes)) if n else b"")
            yield pd.DataFrame({
                "doc_id": ids, "orig_bytes": origs, "resized": outs,
            })

    return payloads.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


def decode_media(payloads: DataFrame) -> DataFrame:
    """Arrow-batched decode: (doc_id, payload, media_type) →
    (doc_id, media_type, n_bytes, mean_byte, features[8])."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads_col = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payloads_col.map(len),
                "mean_byte": payloads_col.map(
                    lambda b: (sum(b) / len(b)) if len(b) else 0.0),
                "features": [
                    _decode_payload(b, m)
                    for b, m in zip(payloads_col, pdf["media_type"])
                ],
            })

    return payloads.mapInPandas(decode_batches, schema=DECODED_SCHEMA)
