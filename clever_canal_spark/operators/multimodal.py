"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video exactly like the ``html`` column of the
CDC payload: an opaque ``binary`` column that flows through merge/dedup
untouched, decoded only at the edge by Arrow-batched ``mapInPandas`` stages.

The actual codecs (PIL/ffmpeg/...) are NOT in this container, so the decode
kernels are deliberately split:

- the Spark-side plumbing (schemas, batch iteration, partitioning) is real
  and tested;
- ``decode_image_real`` raises NotImplementedError (clearly-marked stub);
- ``decode_image_fake`` is a deterministic stand-in (header-derived pseudo
  metadata) used by tests so the plumbing is exercised end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def decode_image_real(payload: bytes) -> dict:
    """Real decoder hook — plug PIL/torchvision here on a real cluster."""
    raise NotImplementedError(
        "image codecs not available in this environment; use decode_image_fake"
    )


def decode_image_fake(payload: bytes | None) -> dict:
    """Deterministic fake decode: pseudo-metadata from the byte content.
    Pure arithmetic — stable across runs/partitions."""
    if payload is None:
        return {"n_bytes": 0, "format": "none", "width": 0, "height": 0}
    n = len(payload)
    head = payload[:8]
    acc = 0
    for byte in head:
        acc = (acc * 31 + byte) % 65536
    return {
        "n_bytes": n,
        "format": ["png", "jpeg", "webp", "gif"][acc % 4],
        "width": 64 + (acc % 1024),
        "height": 64 + ((acc // 7) % 1024),
    }


def extract_media_meta(
    df: DataFrame, id_col: str = "doc_id", binary_col: str = "payload", real: bool = False
) -> DataFrame:
    """mapInPandas metadata extraction over a binary column — one Arrow
    batch in, one metadata frame out; decode cost parallelizes per
    partition (the disruptor-stage-3 shape for media)."""
    decode = decode_image_real if real else decode_image_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[binary_col].map(decode)
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [m["n_bytes"] for m in metas],
                    "format": [m["format"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                }
            )
            yield out

    return df.mapInPandas(run, MEDIA_META_SCHEMA)


# --- resize / frame-sample plumbing ---------------------------------------
# Same split as decode: the Spark-side batch plumbing (schemas, Arrow
# iteration, output cardinality) is real and tested; the pixel kernels are
# deterministic fakes behind the same hook seam as decode_image_real.

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_image_fake(payload: bytes | None, width: int, height: int) -> bytes:
    """Deterministic stand-in for a PIL resize: truncate/tile the payload
    to width*height//64 bytes (content-derived, stable)."""
    if not payload:
        return b""
    target = max((width * height) // 64, 1)
    reps = (target // len(payload)) + 1
    return (payload * reps)[:target]


def resize_images(
    df: DataFrame,
    width: int = 224,
    height: int = 224,
    id_col: str = "doc_id",
    binary_col: str = "payload",
) -> DataFrame:
    """Batch image resize as mapInPandas — one binary row in, one out
    (cardinality-preserving; the thumbnailing stage of a multimodal
    training pipeline). Swap ``resize_image_fake`` for a PIL kernel on a
    real cluster; the Spark plumbing is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": pdf[binary_col].map(
                        lambda b: resize_image_fake(b, width, height)
                    ),
                    "out_width": width,
                    "out_height": height,
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 256,
    max_frames: int = 8,
    id_col: str = "doc_id",
    binary_col: str = "payload",
) -> DataFrame:
    """Frame sampling as an EXPLODING mapInPandas (one video row → k frame
    rows — the 1:N batch shape a real ffmpeg sampler needs). The fake
    kernel cuts fixed-stride byte windows; a real one decodes keyframes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    continue
                for k in range(min(max(len(payload) // every_n_bytes, 1), max_frames)):
                    ids.append(int(doc_id))
                    idxs.append(k)
                    frames.append(bytes(payload[k * every_n_bytes:(k + 1) * every_n_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, FRAME_SCHEMA)
