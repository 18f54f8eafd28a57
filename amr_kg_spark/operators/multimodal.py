"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content is carried as ``binary`` columns with a metadata
struct; decode / feature-extraction run as Arrow-batched ``mapInPandas``
functions so each Python worker sees columnar batches (never rows).

The decode step itself is STUBBED: the sandbox has no image/audio libs, so
``decode_image`` raises NotImplementedError unless a deterministic fake is
requested. Everything Spark-side — schema, batch iteration, partitioning,
output shape — is real and tested; swapping in PIL/librosa later changes
only the inner function body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import scan_parquet

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic media table from the documents testdata:
    payload = utf-8 bytes of the text (an opaque blob as far as the
    pipeline is concerned), kind cycled by doc_id."""
    d = scan_parquet(spark, f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Real decode is unavailable in this container; see module docstring."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv — not installed in this sandbox; "
        "use extract_features(..., fake_decode=True) for the deterministic stub"
    )


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    With fake_decode=True the 'features' are a deterministic 8-bin byte
    histogram (normalized) — a stand-in with the exact batch shape a real
    CNN/fbank extractor would produce.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if payload is None:
                    rows.append((mid, kind, None, None, None))
                    continue
                if not fake_decode:
                    decode_image(bytes(payload))  # raises NotImplementedError
                b = bytes(payload)
                # vectorized per-payload: this inner loop is the template a
                # real extractor copies — it must be numpy, never per-byte
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr >> 5, minlength=8)
                total = max(len(b), 1)
                feats = [round(float(h) / total, 6) for h in hist]
                rows.append(
                    (mid, kind, len(b), hashlib.sha256(b).hexdigest(), feats)
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "sha", "features"]
            )

    return media.mapInPandas(_extract, FEATURES_SCHEMA)


def frame_sample_offsets(media: DataFrame, k: int = 4) -> DataFrame:
    """'Frame sampling' plumbing for video-kind payloads: deterministic k
    byte-offsets (stride = n_bytes/k), the exact
    access pattern a real frame sampler has, minus the codec."""
    v = media.filter(F.col("kind") == "video").withColumn(
        "n_bytes", F.length("payload").cast("long")
    )
    return v.select(
        "media_id",
        "n_bytes",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: F.floor(i * F.col("n_bytes") / F.lit(k)).cast("long"),
            )
        ).alias("frame_no", "offset"),
    )
