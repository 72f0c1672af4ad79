"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via mapInPandas.

The image/audio decode libraries are NOT in this container, so the decode
kernels are STUBBED: `decode_image` raises NotImplementedError unless
PIL is importable, and `fake_image_features` is the deterministic stand-in
(hash-derived statistics with the same schema/batch shape the real kernel
would produce).  Everything Spark-side — schema, partition sizing, Arrow
batch flow, UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha string, "
    "mean_luma double, aspect double, frames_sampled int"
)

try:  # real decode path — absent in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque media rows (payload = seeded pseudo-bytes)."""
    df = spark.range(n)
    h = F.xxhash64("id", F.lit(seed))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        F.pmod(h, F.lit(3)).cast("int") + 1,
    )
    payload = F.sha2(F.concat(F.lit("payload:"), F.col("id").cast("string")), 512).cast(
        "binary"
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        (F.pmod(h, F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1080)) + 16).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(600000))).cast("int").alias("duration_ms"),
    )


def decode_image(payload: bytes):  # pragma: no cover - no PIL in sandbox
    """Real decode kernel — requires PIL (absent here by design)."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL, which is not in this container; "
            "use fake_image_features for the deterministic stand-in"
        )
    import io

    return PIL.Image.open(io.BytesIO(payload))


def extract_media_features(media: DataFrame, frame_stride_ms: int = 1000) -> DataFrame:
    """mapInPandas feature extraction with the production batch shape:
    per-batch vectorized numpy over the payload bytes.  Uses the real
    decoder when available, else the deterministic fake (same schema)."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            shas = payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16])
            # fake luma: mean of payload bytes scaled — deterministic,
            # same dtype/shape the PIL path would produce
            lumas = payloads.map(lambda b: float(np.frombuffer(bytes(b), dtype=np.uint8).mean()) / 255.0)
            aspect = pdf["width"] / pdf["height"].replace(0, 1)
            frames = np.where(
                pdf["kind"] == "video",
                np.maximum(pdf["duration_ms"] // frame_stride_ms, 1),
                1,
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "sha": shas,
                    "mean_luma": lumas,
                    "aspect": aspect,
                    "frames_sampled": frames.astype("int32"),
                }
            )

    return media.mapInPandas(_features, schema=FEATURE_SCHEMA)
