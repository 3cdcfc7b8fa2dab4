"""Multimodal columns ([north-star] N4, BASELINE.json:6).

Pattern for image/audio/video at 100 TB: payloads are opaque
``binary`` columns with typed metadata travelling beside them;
decode / feature-extraction runs as Arrow-batched ``mapInPandas``
so each Python worker touches a columnar batch, never a row at a
time. The actual codecs (PIL/ffmpeg/etc.) are NOT in this container,
so ``decode_image`` is an explicit stub (NotImplementedError) and the
pipeline runs with a deterministic fake decoder — the Spark-side
plumbing (schemas, batch iteration, partitioning) is real and tested.

``multimodal_bytes_meta`` — the metadata/integrity pass (sizes,
digests) — is pure JVM expressions and oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: Output schema of the feature-extraction pass.
FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, mean_byte double, byte_entropy double, "
    "width int, height int"
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real image decode — NOT available in this environment.

    At deploy time this becomes e.g. ``PIL.Image.open(BytesIO(b))``;
    the container ships no imaging libraries, so the operator pipeline
    substitutes :func:`fake_decode` (deterministic) and this stub
    exists to mark the integration point.
    """
    raise NotImplementedError(
        "image codec not available in this environment; "
        "wire PIL/torchvision here at deploy time"
    )


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for codec metadata: pretend the payload
    encodes a (width, height) derived from its length."""
    n = len(payload)
    return (n % 64 + 1, n % 48 + 1)


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per-batch numpy feature extraction over the
    binary payload column. Vectorized within the batch; one Python
    round-trip per Arrow batch, not per row."""
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        feats = []
        for p in payloads:
            arr = np.frombuffer(p, dtype=np.uint8)
            counts = np.bincount(arr, minlength=256)
            probs = counts[counts > 0] / max(len(arr), 1)
            entropy = float(-(probs * np.log2(probs)).sum()) if len(arr) else 0.0
            w, h = fake_decode(p)
            feats.append((float(arr.mean()) if len(arr) else 0.0, entropy, w, h))
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "mean_byte": [f[0] for f in feats],
                "byte_entropy": [f[1] for f in feats],
                "width": pd.Series([f[2] for f in feats], dtype="int32"),
                "height": pd.Series([f[3] for f in feats], dtype="int32"),
            }
        )
        yield out


def resize_image(
    pixels: "np.ndarray", width: int, height: int
) -> "np.ndarray":
    """Nearest-neighbor resize over a decoded (H, W) array — numpy
    index arithmetic only, so it runs for real in this container on
    the fake-decoded arrays (a real deployment swaps in PIL/opencv
    interpolation behind the same signature)."""
    h, w = pixels.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[rows][:, cols]


def sample_frames(payload: bytes, n_frames: int = 4) -> list[bytes]:
    """Frame sampling for video-shaped payloads: evenly spaced byte
    windows standing in for decoded frames (ffmpeg keyframe extraction
    at deploy time; the *sampling policy* — even spacing over the
    stream — is the tested logic)."""
    if not payload:
        return []
    step = max(1, len(payload) // n_frames)
    return [payload[i : i + step] for i in range(0, len(payload), step)][
        :n_frames
    ]


RESIZED_SCHEMA = "doc_id long, out_w int, out_h int, mean_px double"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_bytes int, frame_digest string"


def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: fake-decode payload -> 2D pixel array ->
    resize to 16x16 -> summary stat. Real Arrow plumbing, stubbed codec."""
    for pdf in batches:
        out_rows = []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(p, dtype=np.uint8)
            w, h = fake_decode(p)
            pixels = np.resize(arr, (h, w))  # fake decode to (H, W)
            small = resize_image(pixels, 16, 16)
            out_rows.append((doc_id, 16, 16, float(small.mean())))
        yield pd.DataFrame(
            out_rows, columns=["doc_id", "out_w", "out_h", "mean_px"]
        )


def frame_sample_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per payload, emit one row per sampled frame
    (fan-out kernel — output rows > input rows, the shape a video
    pipeline needs)."""
    import hashlib

    for pdf in batches:
        rows = []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            for i, frame in enumerate(sample_frames(p)):
                rows.append(
                    (
                        doc_id,
                        i,
                        len(frame),
                        hashlib.sha256(frame).hexdigest()[:16],
                    )
                )
        yield pd.DataFrame(
            rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_digest"]
        )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_pipelines_aws_glue_spark.operators.skew import spread

    return spread(_payloads(spark, sf_dir)).mapInPandas(
        resize_batch, schema=RESIZED_SCHEMA
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_pipelines_aws_glue_spark.operators.skew import spread

    return spread(_payloads(spark, sf_dir)).mapInPandas(
        frame_sample_batch, schema=FRAMES_SCHEMA
    )


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column synthesized from document text (the
    corpus ships no real media; the *column type* is what matters)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas
    (rows-only check: numpy entropy has no DuckDB twin)."""
    from bigdata_pipelines_aws_glue_spark.operators.skew import spread

    return spread(_payloads(spark, sf_dir)).mapInPandas(
        extract_features, schema=FEATURE_SCHEMA
    )


def multimodal_bytes_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata/integrity pass over binary payloads: sizes + sha256
    digest — pure JVM expressions (sha2 over the *string*; DuckDB's
    sha256 has no BLOB overload, and UTF-8 bytes of the text are
    identical either way)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("digest"),
        (F.length(payload) - F.length("text")).alias("multibyte_overhead"),
    )


BYTES_META_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       sha256(text) AS digest,
       CAST(octet_length(encode(text)) - length(text) AS INT)
         AS multibyte_overhead
FROM documents
"""


def _register() -> None:
    registry.register("multimodal_features", multimodal_features, None)
    registry.register(
        "multimodal_bytes_meta", multimodal_bytes_meta, BYTES_META_ORACLE
    )
    registry.register("multimodal_resize", multimodal_resize, None)
    registry.register("multimodal_frame_sample", multimodal_frame_sample, None)
