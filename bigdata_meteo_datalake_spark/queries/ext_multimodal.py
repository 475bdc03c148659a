"""Multimodal-column queries: the Arrow/mapInPandas decode kernel is
oracle-checked — the deterministic fake decode is pure arithmetic over the
blob bytes (md5 digest bytes -> dimensions, byte sums -> intensity), which
DuckDB replicates exactly over the same utf-8 text bytes. This gates the
whole Pandas-UDF plumbing (schema, batch iteration, byte handling) behind
the same hash-compare as every built-in operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import attach_blob, decode_image_features
from ..sources.lake import read_table
from . import register

_MM_ORACLE = """
WITH b AS (
  SELECT doc_id,
         text,
         length(text) AS n_chars,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS h
  FROM documents
)
SELECT doc_id,
       cast(64 + (('0x' || substr(h, 1, 2))::int % 64) AS int) AS width,
       cast(64 + (('0x' || substr(h, 3, 2))::int % 64) AS int) AS height,
       cast(n_bytes AS bigint) AS n_bytes,
       (cast(list_aggregate(list_transform(range(1, least(n_chars, 256) + 1),
                                           i -> ascii(substr(text, i, 1))), 'sum')
             AS double)
        / greatest(1, least(n_chars, 256))) / 255.0 AS mean_intensity
FROM b
"""


@register("multimodal_image_features", oracle=_MM_ORACLE, tags=("extension", "multimodal"))
def multimodal_image_features(spark, sf_dir):
    """Binary media column -> feature extraction through the mapInPandas
    kernel (operators/multimodal.py). documents.text stands in for the
    media bytes (attach_blob); the fake decode's arithmetic is replicated
    byte-for-byte by the oracle, so a kernel/batching bug cannot hide."""
    d = read_table(spark, sf_dir, "documents")
    media = attach_blob(d)
    return decode_image_features(media, decode="fake")


# --- audio features through the same Arrow kernel gate ------------------------------

_AUDIO_SR = 16_000

_AUDIO_ORACLE = f"""
WITH b AS (
  SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents
),
s AS (
  SELECT doc_id, nb // 2 AS n_samples,
         list_transform(range(1, nb // 2 + 1),
           i -> ascii(substr(text, 2 * i - 1, 1))
                + 256 * ascii(substr(text, 2 * i, 1))) AS smp
  FROM b
)
SELECT doc_id,
       floor(cast(n_samples AS double) / {_AUDIO_SR} * 1000000 + 0.5)
         / 1000000 AS duration_s,
       cast({_AUDIO_SR} AS int) AS sample_rate,
       CASE WHEN n_samples > 0 THEN
         floor(sqrt(cast(list_aggregate(list_transform(smp, x -> x * x),
                                        'sum') AS double) / n_samples)
               / 32768.0 * 1000000 + 0.5) / 1000000
       ELSE 0.0 END AS rms
FROM s
"""


@register(
    "multimodal_audio_features",
    oracle=_AUDIO_ORACLE,
    tags=("extension", "multimodal", "audio"),
)
def multimodal_audio_features(spark, sf_dir):
    """Audio twin of multimodal_image_features: the payload runs through
    the mapInPandas audio kernel (operators/multimodal.py:audio_features,
    fake mode: bytes as 16-bit little-endian PCM), and the oracle
    replicates the exact sample arithmetic — pairs of utf-8 bytes as
    little-endian ints, integer square sums, one division, IEEE sqrt.
    Data contract: documents.text is ASCII (byte == char, verified across
    all SFs by the oracle's own encode() arithmetic), so ascii(substr())
    addresses the same bytes the kernel sees. A batching/schema bug in
    the Arrow plumbing cannot hide behind the fake codec: the hash gate
    checks every value. `decode="real"` decodes actual PCM WAV
    (media_codecs.decode_wav); compressed formats raise at the
    soundfile/librosa insertion point."""
    from ..operators.multimodal import audio_features

    d = read_table(spark, sf_dir, "documents")
    media = attach_blob(d, media_type="audio")
    feats = audio_features(media, sample_rate=_AUDIO_SR, decode="fake")
    from ..functions.numeric import round_half_up

    return feats.select(
        "doc_id",
        round_half_up(F.col("duration_s"), 6).alias("duration_s"),
        "sample_rate",
        round_half_up(F.col("rms"), 6).alias("rms"),
    )


# --- frame sampling through the same gate -------------------------------------------

_FRAME_BYTES = 64
_MAX_FRAMES = 4

_FRAME_ORACLE = f"""
WITH b AS (
  SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents
),
f AS (
  SELECT doc_id, text,
         unnest(range(0, least({_MAX_FRAMES}, greatest(1, nb // {_FRAME_BYTES}))))
           AS frame_idx
  FROM b
)
SELECT doc_id, cast(frame_idx AS int) AS frame_idx,
       md5(substr(text, frame_idx * {_FRAME_BYTES} + 1, {_FRAME_BYTES}))
         AS frame_hash
FROM f
"""


@register(
    "multimodal_frame_sample",
    oracle=_FRAME_ORACLE,
    tags=("extension", "multimodal", "video"),
)
def multimodal_frame_sample(spark, sf_dir):
    """Video-style frame sampling through the mapInPandas kernel
    (operators/multimodal.py:sample_frames): fixed-stride byte windows
    stand in for decoded frames, each fingerprinted with md5 — the
    dedup-ready frame signature a video pipeline extracts before any
    model sees pixels. The oracle re-slices the same bytes with substr
    (documents.text is ASCII — drift-guarded), so the kernel's batching,
    per-row fan-out, and hashing are all value-checked. `decode="real"`
    is the ffmpeg insertion point and raises here."""
    from ..operators.multimodal import sample_frames

    d = read_table(spark, sf_dir, "documents")
    media = attach_blob(d, media_type="video")
    return sample_frames(media, every_n_bytes=_FRAME_BYTES, max_frames=_MAX_FRAMES)
