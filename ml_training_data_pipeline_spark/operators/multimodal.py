"""Multimodal (image/audio/video) column plumbing (BASELINE.json scale
extensions).

Design: media are opaque ``binary`` columns + typed metadata, processed by
Arrow-batched ``mapInPandas`` operators. The Spark-side contract — schema,
partitioning, UDF signature, batch shape — is real and tested; the actual
codec step is STUBBED (``decode_image`` raises NotImplementedError) because
media libraries aren't in this container. ``fake_decode_stats`` is the
deterministic stand-in (md5-derived statistics) the tests and oracle use;
swapping in PIL/ffmpeg later changes ONE function, not the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, modality string, content binary, meta string"
FEATURE_SCHEMA = "media_id long, modality string, n_bytes long, h0 long, h1 long, feat0 double, feat1 double"


def documents_as_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapter: treat each document's UTF-8 bytes as an opaque media blob
    so the binary pipeline is exercisable on the driver's tables."""
    return docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("media_id"),
        F.lit("text").alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.to_json(F.struct(F.length(F.col(text_col)).alias("n_chars"))).alias("meta"),
    )


def decode_image(content: bytes) -> object:
    """The real codec hook — not available in this container.

    A deployment installs pillow/opencv on executors and replaces this
    body; the mapInPandas plumbing above/below is unchanged."""
    raise NotImplementedError(
        "image decoding requires a media codec library on the executors; "
        "wire PIL/opencv here — the Spark plan is codec-agnostic"
    )


def fake_decode_stats(content: bytes) -> tuple[int, int, float, float]:
    """Deterministic stand-in 'decode': md5-derived pseudo-statistics.
    (h0, h1, feat0∈[0,1), feat1∈[0,1)) — engine-portable (md5-based), so
    the plumbing is value-checkable against the DuckDB oracle."""
    h = hashlib.md5(content).hexdigest()
    h0 = int(h[:15], 16)
    h1 = int(h[15:30], 16)
    return h0, h1, (h0 % 1000) / 1000.0, (h1 % 1000) / 1000.0


def resize_image(content: bytes, width: int, height: int) -> bytes:
    """The real resize hook — like ``decode_image``, it requires a codec
    library on the executors (PIL/opencv); the surrounding mapInPandas
    plumbing is codec-agnostic and unchanged when this body is filled."""
    raise NotImplementedError(
        "image resizing requires a media codec library on the executors; "
        "wire PIL.Image.resize/cv2.resize here"
    )


def sample_frames(media: DataFrame, frame_size: int = 64, every_n: int = 3) -> DataFrame:
    """Frame sampling over opaque media blobs: split ``content`` into
    fixed-size byte frames and keep every ``every_n``-th (a video
    frame-sampler's plumbing — table-out mapInPandas, multiple rows per
    input, Arrow-batched). The frame boundary logic is real; a video
    deployment swaps byte-slicing for a demuxer behind the same
    signature. Emits (media_id, frame_idx, frame_fp, n_frame_bytes);
    fingerprints are md5 (engine-portable, so the driver's tables —
    ASCII text-as-bytes — stay value-checkable in the DuckDB oracle)."""
    import hashlib as _hashlib

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_fp": [], "n_frame_bytes": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                n_frames = (len(b) + frame_size - 1) // frame_size
                for idx in range(0, n_frames, every_n):
                    fb = b[idx * frame_size : (idx + 1) * frame_size]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_fp"].append(_hashlib.md5(fb).hexdigest())
                    out["n_frame_bytes"].append(len(fb))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        op, schema="media_id long, frame_idx long, frame_fp string, n_frame_bytes long"
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: per-partition Arrow batches, lazy
    per-executor codec init (the 02_test.R:44-58 worker-load pattern —
    here the 'codec' is stateless, but the hook point is where a model
    or codec handle would be cached)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [fake_decode_stats(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "h0": [s[0] for s in stats],
                    "h1": [s[1] for s in stats],
                    "feat0": [s[2] for s in stats],
                    "feat1": [s[3] for s in stats],
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)
