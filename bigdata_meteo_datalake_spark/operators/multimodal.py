"""Multimodal columns (SURVEY.md section 2.7): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched Pandas
functions over mapInPandas.

The container has no image/audio codecs, so the decode kernels are STUBS:
``decode=fake`` produces deterministic features derived from the bytes
(so the Spark-side plumbing — schema, batch iteration, partition sizing —
is real and tested); ``decode=real`` raises NotImplementedError at the
exact point a codec (PIL/ffmpeg) would be called.

Scale notes: binary payloads dominate row size, so the operators
repartition by a byte budget before the Pandas stage (each Arrow batch
must fit executor memory) and never collect payloads to the driver.
Feature outputs drop the payload column as early as possible (column
pruning does the rest).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: typed metadata carried alongside every blob
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png, wav, mp4, ...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("source_uri", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, n_bytes long, mean_intensity double"
)
FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_hash string"


def attach_blob(df: DataFrame, text_col: str = "text", *, media_type: str = "image",
                fmt: str = "fake") -> DataFrame:
    """Testing shim: materialize a binary column (+ metadata struct) from an
    existing string column — stands in for reading real media files."""
    blob = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.length(blob).cast("long").alias("n_bytes"),
        F.concat(F.lit("mem://"), F.col("doc_id").cast("string")).alias("source_uri"),
    )
    return df.withColumn("blob", blob).withColumn("media_meta", meta)


def repartition_by_bytes(df: DataFrame, *, target_bytes_per_partition: int,
                         total_bytes: int) -> DataFrame:
    """Size partitions by payload volume, not row count — the knob that keeps
    Arrow batches inside executor memory when blobs are megabytes each."""
    n = max(1, total_bytes // target_bytes_per_partition)
    return df.repartition(n)


def decode_image_features(df: DataFrame, *, decode: str = "fake") -> DataFrame:
    """Image decode -> (width, height, n_bytes, mean_intensity) via
    mapInPandas. `decode="real"` is the PIL insertion point (stubbed)."""
    if decode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode: {decode}")

    def kernel(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real image decode needs PIL/opencv (not in this container); "
                    "swap this branch for Image.open(io.BytesIO(b))"
                )
            feats = {"doc_id": [], "width": [], "height": [], "n_bytes": [],
                     "mean_intensity": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                h = hashlib.md5(b).digest()
                feats["doc_id"].append(doc_id)
                # deterministic fake: dimensions from digest bytes; the
                # intensity averages Unicode code points of the DECODED
                # text so the SQL oracle (ascii over characters) matches
                # on non-ASCII payloads too; n_bytes stays byte-accurate
                chars = b.decode("utf-8", errors="replace")[:256]
                feats["width"].append(64 + h[0] % 64)
                feats["height"].append(64 + h[1] % 64)
                feats["n_bytes"].append(len(b))
                feats["mean_intensity"].append(
                    (sum(ord(c) for c in chars) / max(1, len(chars))) / 255.0
                )
            yield pd.DataFrame(feats)

    return df.select("doc_id", "blob").mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 4,
                  decode: str = "fake") -> DataFrame:
    """Video frame sampling -> (doc_id, frame_idx, frame_hash) via
    mapInPandas; the ffmpeg insertion point is stubbed like decode."""

    def kernel(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("real frame sampling needs ffmpeg")
            out = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                for idx in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    chunk = b[idx * every_n_bytes : (idx + 1) * every_n_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_hash"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)
