"""Multimodal column plumbing: opaque binary payloads + typed metadata (C4).

Images/audio/video ride as ``binary`` columns with a metadata struct; decode /
feature-extract runs as Arrow-batched ``mapInPandas`` so each Python batch is
one Arrow RecordBatch (no per-row pickling).  The actual media decode is
STUBBED (no image/audio libs in this container): ``decode_features`` computes
deterministic byte-level features so the Spark-side plumbing — schema,
partition shape, UDF signature, batch iteration — is real and tested, and
``decode_image`` raises NotImplementedError exactly where a real decoder
(PIL/libav) would plug in.

Scale: mapInPandas preserves partitioning (no shuffle); batch size is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch``.  Media payloads should be
stored out-of-row at 100 TB (pointer + byte-range), fetched inside the batch
iterator — the signature below doesn't change.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, functions as F

if TYPE_CHECKING:
    import pandas as pd

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, first_byte int, "
    "byte_sum long, header_hex string"
)


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fixture adapter: materialize a binary payload column + metadata struct
    (stands in for real image/audio bytes; deterministic from text)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/fake").alias("media_type"),
            F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic byte-level 'features' stand in for a real decoder; the
    mapInPandas mechanics (batching, schema, null payloads) are production
    shape.
    """

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["media_meta"]],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "first_byte": payloads.map(lambda b: b[0] if b else -1),
                    "byte_sum": payloads.map(lambda b: int(sum(b)) if b is not None else 0),
                    "header_hex": payloads.map(
                        lambda b: bytes(b[:4]).hex() if b is not None else ""
                    ),
                }
            )

    return df.mapInPandas(extract, FEATURE_SCHEMA)


def decode_image(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Real image decode/resize — requires PIL/torchvision, absent here.

    The production implementation mirrors :func:`decode_features`: mapInPandas
    batch iterator, payload bytes -> decoded tensor -> resized bytes column.
    """
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; see decode_features for the identical Spark plumbing"
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, n_bytes int, frame_md5 string"


def sample_frames(
    df: DataFrame, frame_bytes: int = 64, stride: int = 128, max_frames: int = 8
) -> DataFrame:
    """Frame sampling over binary payloads — the video path's plumbing.

    A real implementation demuxes the container and decodes every Nth frame;
    here the deterministic stand-in treats the payload as a byte stream and
    cuts ``frame_bytes``-sized windows every ``stride`` bytes.  What this
    exercises for real is the 1:N fan-out mapInPandas shape (one input row ->
    many frame rows inside the same Arrow batch, no explode/shuffle), which
    is exactly how frame extraction runs at scale — sampling happens INSIDE
    the batch so dropped frames are never materialized.
    """

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, idxs, lens, hashes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                for i in range(max_frames):
                    off = i * stride
                    if off >= len(data):
                        break
                    frame = data[off : off + frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(frame))
                    hashes.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "n_bytes": lens, "frame_md5": hashes}
            )

    return df.mapInPandas(frames, FRAME_SCHEMA)
