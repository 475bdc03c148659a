"""Multimodal-column queries: the Arrow/mapInPandas decode kernel is
oracle-checked — the deterministic fake decode is pure arithmetic over the
blob bytes (md5 digest bytes -> dimensions, byte sums -> intensity), which
DuckDB replicates exactly over the same utf-8 text bytes. This gates the
whole Pandas-UDF plumbing (schema, batch iteration, byte handling) behind
the same hash-compare as every built-in operator."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_blob,
    decode_image_features,
    image_phash_bands,
)
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


# --- perceptual-hash near-dup through the same gate ---------------------------------

_PHASH_HOT = 64  # buckets with more members are boilerplate, dropped
_PHASH_MAX_HD = 3  # pigeonhole-safe for 4 bands: hd <= 3 forces a band match

_PHASH_ORACLE = f"""
WITH c AS (
  SELECT doc_id,
         list_transform(range(0, 64),
           i -> ascii(substr(text, (i % length(text)) + 1, 1))) AS cells
  FROM documents WHERE length(text) > 0
),
h AS (SELECT doc_id, cells, list_aggregate(cells, 'sum') AS s FROM c),
bands AS (
  SELECT doc_id, b,
         list_aggregate(list_transform(range(0, 16),
           i -> CASE WHEN cells[b * 16 + i + 1] * 64 > s
                THEN 1 << i ELSE 0 END), 'sum') AS bv
  FROM h CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b)
),
hot AS (SELECT b, bv FROM bands GROUP BY b, bv HAVING count(*) > {_PHASH_HOT}),
bands2 AS (SELECT * FROM bands ANTI JOIN hot USING (b, bv)),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands2 x JOIN bands2 y ON x.b = y.b AND x.bv = y.bv
  WHERE x.doc_id < y.doc_id
),
bv AS (SELECT doc_id, list(bv ORDER BY b) AS bvs FROM bands GROUP BY doc_id)
SELECT c2.doc_a, c2.doc_b,
       cast(bit_count(xor(x.bvs[1], y.bvs[1]))
          + bit_count(xor(x.bvs[2], y.bvs[2]))
          + bit_count(xor(x.bvs[3], y.bvs[3]))
          + bit_count(xor(x.bvs[4], y.bvs[4])) AS int) AS hamming
FROM cand c2
JOIN bv x ON x.doc_id = c2.doc_a
JOIN bv y ON y.doc_id = c2.doc_b
WHERE bit_count(xor(x.bvs[1], y.bvs[1])) + bit_count(xor(x.bvs[2], y.bvs[2]))
    + bit_count(xor(x.bvs[3], y.bvs[3])) + bit_count(xor(x.bvs[4], y.bvs[4]))
    <= {_PHASH_MAX_HD}
"""


@register(
    "multimodal_phash_near_dup",
    oracle=_PHASH_ORACLE,
    tags=("extension", "multimodal", "dedup"),
)
def multimodal_phash_near_dup(spark, sf_dir):
    """Image near-duplicate detection by perceptual hash, end to end
    through the Arrow kernel gate: blobs -> 64-bit average-hash as four
    16-bit bands (operators/multimodal.py:image_phash_bands, mapInPandas)
    -> LSH-style band equi-join (pigeonhole: hamming <= 3 over 4 bands
    guarantees a shared band) -> exact hamming refilter via bit_count.
    Hot bands (> 64 members — boilerplate imagery) are dropped before the
    self-join, the same structural guard the MinHash and SimHash dedups
    use, so the candidate set stays near-linear at corpus scale. Output:
    (doc_a, doc_b, hamming) for every pair within distance 3.

    The oracle recomputes the kernel's byte arithmetic in SQL (ASCII
    contract on documents.text, as with the audio kernel), so an Arrow
    batching or banding bug cannot hide behind the Python path. With a
    real codec the resize stage feeds the same thresholding — the plan
    does not change."""
    d = read_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    feats = image_phash_bands(attach_blob(d))
    bands = feats.select(
        "doc_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("b", "bv"),
    )
    hot = (
        bands.groupBy("b", "bv")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > _PHASH_HOT)
        .select("b", "bv")
    )
    bands2 = bands.join(F.broadcast(hot), ["b", "bv"], "left_anti")
    x, y = bands2.alias("x"), bands2.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    fa = feats.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(c).alias(f"a_{c}") for c in ("b0", "b1", "b2", "b3")],
    )
    fb = feats.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(c).alias(f"b_{c}") for c in ("b0", "b1", "b2", "b3")],
    )
    hd = None
    for c in ("b0", "b1", "b2", "b3"):
        t = F.bit_count(F.col(f"a_{c}").bitwiseXOR(F.col(f"b_{c}")))
        hd = t if hd is None else hd + t
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select("doc_a", "doc_b", hd.cast("int").alias("hamming"))
        .where(F.col("hamming") <= _PHASH_MAX_HD)
    )


# --- REAL PNG decode through the kernel gate ----------------------------------------

_PNG_ORACLE = """
WITH d AS (
  SELECT doc_id,
         4 + doc_id % 13 AS w,
         4 + doc_id % 11 AS h,
         CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ch
  FROM documents
),
px AS (
  SELECT doc_id, w, h, ch,
         list_aggregate(list_transform(range(0, w * h * ch),
           i -> (doc_id * 31 + ((i // ch) % w) * 7 + (i // (ch * w)) * 13
                 + (i % ch) * 101) % 256), 'sum') AS s
  FROM d
)
SELECT doc_id, cast(w AS int) AS width, cast(h AS int) AS height,
       ch = 3 AS is_rgb,
       (cast(s AS double) / (w * h * ch)) / 255.0 AS mean_intensity
FROM px
"""


@register(
    "multimodal_png_decode",
    oracle=_PNG_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def multimodal_png_decode(spark, sf_dir):
    """REAL image decode end to end: per document a genuine 8-bit PNG is
    encoded from a closed-form pixel pattern (operators/multimodal.py:
    synthesize_png_blobs — per-row filter CYCLES through all five PNG
    scanline filters, RGB for even doc_ids, grayscale for odd; every
    fifth document Adam7-interlaced, every third even document
    PALETTE-indexed color type 3 — the closed form makes color a pure
    function of R, so PLTE expansion reproduces the identical RGB image
    and rides this same oracle hash), then the
    production decode path (decode_image_features(decode="real") ->
    media_codecs.decode_png: chunk+CRC parsing, inflate, Sub/Up/Average/
    Paeth unfiltering) recovers dimensions and mean intensity. The
    oracle recomputes the expected pixel sums from the closed form in
    pure SQL — no codec — so any unfiltering or batching defect changes
    mean_intensity and fails the hash. (The filter cycle matters: a
    decoder that botched, say, Paeth would still pass on filter-0-only
    images.) Encoder/decoder inverses are independently pinned by
    hand-computed filter vectors in tests/test_multimodal.py, so a
    compensating encode/decode bug cannot hide either.

    Exactness: pixel sums are exact integers (< 2^53, so numpy's float64
    mean is the exact sum); mean = (s / (w*h*ch)) / 255.0 with identical
    division order in both engines.

    Scale: two chained mapInPandas stages (encode, decode) over
    (doc_id, blob) only — blob payloads never join anything and drop
    before the result projection; both kernels are per-blob O(pixels)."""
    from ..operators.multimodal import decode_image_features, synthesize_png_blobs

    d = read_table(spark, sf_dir, "documents")
    pngs = synthesize_png_blobs(d)
    feats = decode_image_features(pngs, decode="real")
    return feats.select(
        "doc_id",
        "width",
        "height",
        (F.col("doc_id") % 2 == 0).alias("is_rgb"),
        "mean_intensity",
    )


# --- REAL PNG bit-depth sweep through the kernel gate --------------------------------

_PNG_DEPTHS_ORACLE = """
WITH d AS (
  SELECT doc_id,
         4 + doc_id % 13 AS w,
         4 + doc_id % 11 AS h,
         CASE doc_id % 5 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
                         WHEN 3 THEN 8 ELSE 16 END AS dep
  FROM documents
),
px AS (
  SELECT doc_id, w, h, dep,
         list_aggregate(list_transform(range(0, w * h),
           i -> (doc_id * 31 + (i % w) * 7 + (i // w) * 13)
                % (1 << dep)), 'sum') AS s
  FROM d
)
SELECT doc_id, cast(w AS int) AS width, cast(h AS int) AS height,
       cast(dep AS int) AS depth,
       CASE WHEN dep = 16
            THEN (cast(s AS double) / (w * h)) / 65535.0
            ELSE (cast(s * (255 // ((1 << dep) - 1)) AS double) / (w * h))
                 / 255.0
       END AS mean_intensity
FROM px
"""


@register(
    "multimodal_png_depths_decode",
    oracle=_PNG_DEPTHS_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def multimodal_png_depths_decode(spark, sf_dir):
    """REAL PNG decode across EVERY bit depth (round-8): per document a
    genuine grayscale PNG at depth (1, 2, 4, 8, 16)[doc_id % 5] is
    encoded from a closed-form pixel pattern (operators/multimodal.py:
    synthesize_png_depth_blobs — per-row filter cycle, Adam7 when
    doc_id % 4 == 0 so every (depth, interlace) pair occurs), then the
    production decode path (decode_image_features(decode="real") ->
    media_codecs.decode_png: sub-byte MSB-first unpack + exact
    255/(2^d - 1) scaling, big-endian uint16 pairs for depth 16, filter
    distance max(1, depth/8) bytes) recovers dimensions and mean
    intensity normalized by the sample dtype's range.

    Exactness: decoded sample sums are exact integers (< 2^53, numpy's
    float64 mean is the exact sum over the exact count); the oracle
    recomputes them from the closed form with integer arithmetic only —
    scale 255/(2^d - 1) is an exact integer for d in {1, 2, 4, 8} — and
    divides in the same order ((sum / n) / max_sample_value).

    Scale: two chained mapInPandas stages (encode, decode) over
    (doc_id, blob) — zero exchanges, pure scan-map at any scale; blob
    payloads drop before the result projection."""
    from ..operators.multimodal import (
        decode_image_features,
        synthesize_png_depth_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    pngs = synthesize_png_depth_blobs(d)
    feats = decode_image_features(pngs, decode="real")
    depth = F.expr(
        "CASE doc_id % 5 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 "
        "WHEN 3 THEN 8 ELSE 16 END"
    ).cast("int")
    return feats.select(
        "doc_id", "width", "height", depth.alias("depth"), "mean_intensity"
    )


# --- REAL TIFF decode (byte orders / strips / PackBits) through the kernel gate ------

_TIFF_ORACLE = """
WITH d AS (
  SELECT doc_id,
         4 + doc_id % 13 AS w,
         4 + doc_id % 11 AS h,
         CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ch
  FROM documents
),
px AS (
  SELECT doc_id, w, h, ch,
         list_aggregate(list_transform(range(0, w * h * ch),
           i -> (doc_id * 31 + ((i // ch) % w) * 7 + (i // (ch * w)) * 13
                 + (i % ch) * 101) % 256), 'sum') AS s
  FROM d
)
SELECT doc_id, cast(w AS int) AS width, cast(h AS int) AS height,
       ch = 3 AS is_rgb,
       doc_id % 4 >= 2 AS big_endian,
       doc_id % 3 = 0 AS packbits,
       (cast(s AS double) / (w * h * ch)) / 255.0 AS mean_intensity
FROM px
"""


@register(
    "multimodal_tiff_decode",
    oracle=_TIFF_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def multimodal_tiff_decode(spark, sf_dir):
    """REAL TIFF decode end to end (round-8) — the scanned-document
    staple: per document a genuine classic TIFF cycling byte order
    (II / MM), compression (none / PackBits), and strip layout
    (single / rows_per_strip=3) is encoded from the closed-form pixel
    pattern (operators/multimodal.py:synthesize_tiff_blobs), then the
    production decode path (decode_image_features(decode="real") ->
    operators/tiff.py:decode_tiff: IFD tag walk with inline AND
    offset-addressed values, multi-strip reassembly, PackBits
    run/literal expansion) recovers dimensions and mean intensity.

    Exactness: pixel sums are exact integers (< 2^53, numpy's float64
    mean is exact); the oracle recomputes the expected sums from the
    closed form in pure SQL and divides in the same order
    ((sum / (w*h*ch)) / 255).

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges, pure scan-map at any scale."""
    from ..operators.multimodal import decode_image_features, synthesize_tiff_blobs

    d = read_table(spark, sf_dir, "documents")
    tiffs = synthesize_tiff_blobs(d)
    feats = decode_image_features(tiffs, decode="real")
    return feats.select(
        "doc_id",
        "width",
        "height",
        (F.col("doc_id") % 2 == 0).alias("is_rgb"),
        (F.col("doc_id") % 4 >= 2).alias("big_endian"),
        (F.col("doc_id") % 3 == 0).alias("packbits"),
        "mean_intensity",
    )


# --- REAL BMP decode (truecolor / palette / RLE8) through the kernel gate ------------

_BMP_ORACLE = """
WITH d AS (
  SELECT doc_id,
         4 + doc_id % 13 AS w,
         4 + doc_id % 11 AS h
  FROM documents
),
px AS (
  SELECT doc_id, w, h,
         list_aggregate(list_transform(range(0, w * h),
           i -> (doc_id * 31 + (i % w) * 7 + (i // w) * 13) % 256
                + ((doc_id * 31 + (i % w) * 7 + (i // w) * 13) % 256 + 101)
                  % 256
                + ((doc_id * 31 + (i % w) * 7 + (i // w) * 13) % 256 + 202)
                  % 256
         ), 'sum') AS s
  FROM d
)
SELECT doc_id, cast(w AS int) AS width, cast(h AS int) AS height,
       CASE doc_id % 3 WHEN 0 THEN 'truecolor' WHEN 1 THEN 'palette'
            ELSE 'rle8' END AS layout,
       (cast(s AS double) / (w * h * 3)) / 255.0 AS mean_intensity
FROM px
"""


@register(
    "multimodal_bmp_decode",
    oracle=_BMP_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def multimodal_bmp_decode(spark, sf_dir):
    """REAL BMP decode end to end across the format's three layouts
    (round-8): per document a genuine BMP — 24-bit truecolor, 8-bit
    palette, or RLE8-compressed palette by doc_id % 3 — is encoded from
    the closed-form pixel pattern (operators/multimodal.py:
    synthesize_bmp_blobs; the palette trick makes all three layouts
    decode to the IDENTICAL RGB image), then the production decode path
    (decode_image_features(decode="real") -> media_codecs.decode_bmp:
    header parse, BGRX color-table expansion, RLE run/escape replay,
    bottom-up flip) recovers dimensions and mean intensity.

    Exactness: pixel sums are exact integers (< 2^53, numpy's float64
    mean is exact); the oracle recomputes the palette-expanded channel
    sums from the closed form with integer arithmetic only and divides
    in the same order ((sum / (w*h*3)) / 255).

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges, pure scan-map at any scale."""
    from ..operators.multimodal import decode_image_features, synthesize_bmp_blobs

    d = read_table(spark, sf_dir, "documents")
    bmps = synthesize_bmp_blobs(d)
    feats = decode_image_features(bmps, decode="real")
    layout = F.expr(
        "CASE doc_id % 3 WHEN 0 THEN 'truecolor' WHEN 1 THEN 'palette' "
        "ELSE 'rle8' END"
    )
    return feats.select(
        "doc_id", "width", "height", layout.alias("layout"), "mean_intensity"
    )


# --- REAL animated-GIF per-frame decode through the kernel gate ----------------------

_GIF_FRAMES_ORACLE = """
WITH d AS (
  SELECT doc_id,
         5 + doc_id % 12 AS w,
         5 + doc_id % 9 AS h,
         1 + doc_id % 4 AS nf,
         4 + doc_id % 11 AS delay
  FROM documents
),
f AS (
  SELECT doc_id, w, h, delay, unnest(range(0, nf)) AS frame_idx
  FROM d
),
px AS (
  SELECT doc_id, w, h, delay, frame_idx,
         list_aggregate(list_transform(range(0, w * h),
           i -> (doc_id * 31 + (i % w) * 7 + (i // w) * 13 + frame_idx * 59)
                  % 256
                + ((doc_id * 31 + (i % w) * 7 + (i // w) * 13
                    + frame_idx * 59) % 256 + 101) % 256
                + ((doc_id * 31 + (i % w) * 7 + (i // w) * 13
                    + frame_idx * 59) % 256 + 202) % 256
         ), 'sum') AS s
  FROM f
)
SELECT doc_id, cast(frame_idx AS int) AS frame_idx,
       cast(w AS int) AS width, cast(h AS int) AS height,
       cast(delay AS int) AS delay_cs,
       (cast(s AS double) / (w * h * 3)) / 255.0 AS mean_intensity
FROM px
"""


@register(
    "multimodal_gif_frames",
    oracle=_GIF_FRAMES_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def multimodal_gif_frames(spark, sf_dir):
    """REAL animated-GIF per-frame decode end to end — the closest
    implementable thing to video frame sampling without ffmpeg: per
    document a genuine GIF89a animation (1 + doc_id % 4 frames,
    real LZW compression, every fifth document interlaced) is encoded
    from a closed-form index pattern through a palette whose color is a
    pure function of the index (operators/multimodal.py:
    synthesize_gif_blobs), then gif_frame_features demuxes and decodes
    EVERY frame (operators/gif.py:decode_gif: LZW with dictionary
    growth/rebuild, de-interlacing, canvas composition,
    graphic-control delays) into one row per frame.

    Exactness: frame pixel sums are exact integers (< 2^53, numpy's
    float64 mean is exact); the oracle unnests the frame range per
    document and recomputes the palette-expanded channel sums from the
    closed form with integer arithmetic only, dividing in the same
    order ((sum / (w*h*3)) / 255).

    Scale: two chained mapInPandas stages (encode, decode) over
    (doc_id, blob) — zero exchanges, pure scan-map at any scale; the
    per-frame fan-out happens INSIDE the kernel, so blob payloads never
    cross an exchange and drop before the result projection."""
    from ..operators.multimodal import gif_frame_features, synthesize_gif_blobs

    d = read_table(spark, sf_dir, "documents")
    gifs = synthesize_gif_blobs(d)
    return gif_frame_features(gifs).select(
        "doc_id", "frame_idx", "width", "height", "delay_cs", "mean_intensity"
    )


# --- REAL JPEG decode through the kernel gate ---------------------------------------

_JPEG_ORACLE = """
WITH d AS (
  SELECT doc_id,
         9 + doc_id % 16 AS w,
         9 + doc_id % 12 AS h,
         CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ch
  FROM documents
),
px AS (
  SELECT doc_id, w, h, ch,
         list_aggregate(list_transform(range(0, w * h),
           i -> (doc_id * 31 + ((i % w) // 8) * 7 + ((i // w) // 8) * 13)
                % 256), 'sum') AS s
  FROM d
)
SELECT doc_id, cast(w AS int) AS width, cast(h AS int) AS height,
       ch = 3 AS is_rgb,
       (cast(s * ch AS double) / (w * h * ch)) / 255.0 AS mean_intensity
FROM px
"""


@register(
    "multimodal_jpeg_decode",
    oracle=_JPEG_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def multimodal_jpeg_decode(spark, sf_dir):
    """REAL JPEG decode end to end, the lossy sibling of
    multimodal_png_decode: per document a genuine baseline JPEG is
    Huffman-encoded from a closed-form BLOCK-CONSTANT tile pattern
    (operators/multimodal.py:synthesize_jpeg_blobs — dims deliberately
    not multiples of 8 so MCU padding is exercised; RGB with R=G=B for
    even doc_ids so chroma quantizes to exactly zero, grayscale for
    odd), then the production decode path (decode_image_features(
    decode="real") -> operators/jpeg.py:decode_jpeg: marker/segment
    parsing, Huffman entropy decode, dequantize, inverse DCT, YCbCr->RGB)
    recovers dimensions and mean intensity.

    Why a LOSSY codec can carry a value-checked oracle: the DCT of a
    constant 8x8 block is a lone DC coefficient 8*(v-128), AC exactly
    zero, and at IJG quality 75 the luminance DC quantization step is
    exactly 8, so quantization divides exactly and the round trip is
    BIT-exact on these fixtures (divisibility argument in
    operators/jpeg.py's docstring; verified across every fixture shape
    in tests/test_multimodal.py). The oracle recomputes the expected
    tile sums in pure SQL — no codec — so a defect anywhere in the
    Huffman/DCT/color chain shifts pixel values and fails the hash.

    Exactness: pixel sums are exact integers (< 2^53, numpy's float64
    mean is exact); RGB sum = 3 * gray sum (R=G=B), and the oracle
    multiplies by ch and divides by (w*h*ch) in the same order as
    numpy's mean, so the float division is identical.

    Scale: two chained mapInPandas stages (encode, decode) over
    (doc_id, blob) — zero exchanges, pure scan-map at any scale; blob
    payloads drop before the result projection."""
    from ..operators.multimodal import decode_image_features, synthesize_jpeg_blobs

    d = read_table(spark, sf_dir, "documents")
    jpegs = synthesize_jpeg_blobs(d)
    feats = decode_image_features(jpegs, decode="real")
    return feats.select(
        "doc_id",
        "width",
        "height",
        (F.col("doc_id") % 2 == 0).alias("is_rgb"),
        "mean_intensity",
    )


# --- REAL G.711 (mu-law / A-law) WAV decode through the kernel gate ------------------


def _g711_sq_sql() -> tuple[str, str]:
    """SQL list literals of the SQUARED G.711 expansion tables — the
    oracle's per-code lookup. Generated from the same public-reference
    tables the kernel uses; shared-constant bugs are broken by the
    published-value pins in tests/test_multimodal.py (mu-law 0x00 ->
    -32124, A-law 0x2A -> -32256, silence codes -> 0/+-8, per-segment
    monotonicity)."""
    from ..operators.media_codecs import alaw_decode_table, mulaw_decode_table

    mu = "[" + ",".join(str(int(v) * int(v)) for v in mulaw_decode_table()) + "]"
    al = "[" + ",".join(str(int(v) * int(v)) for v in alaw_decode_table()) + "]"
    return mu, al


_MU_SQ, _AL_SQ = _g711_sq_sql()

_G711_ORACLE = f"""
WITH d AS (
  SELECT doc_id, 150 + doc_id % 200 AS n FROM documents
),
s AS (
  SELECT doc_id, n,
         list_aggregate(list_transform(range(0, n),
           i -> CASE WHEN doc_id % 2 = 0
                THEN list_extract({_MU_SQ}, ((doc_id * 13 + i * 7) % 256) + 1)
                ELSE list_extract({_AL_SQ}, ((doc_id * 13 + i * 7) % 256) + 1)
                END), 'sum') AS ss
  FROM d
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'mulaw' ELSE 'alaw' END AS law,
       cast(n AS double) / 8000.0 AS duration_s,
       cast(8000 AS int) AS sample_rate,
       sqrt((cast(ss AS double) / 1073741824.0) / n) AS rms
FROM s
"""


@register(
    "multimodal_wav_g711_decode",
    oracle=_G711_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def multimodal_wav_g711_decode(spark, sf_dir):
    """REAL G.711 companded-audio decode end to end (round-8): per
    document a genuine telephony WAV — mu-law (format 7) for even
    doc_ids, A-law (format 6) for odd — is synthesized from closed-form
    CODE bytes (operators/multimodal.py:synthesize_g711_blobs), then
    the production audio path (audio_features(decode="real") ->
    media_codecs.decode_wav: manual RIFF chunk walk, CCITT expansion
    table, 16-bit normalization) recovers duration, sample rate, and
    RMS.

    Exactness: decoded samples are t/2^15 with |t| <= 32256, so each
    squared sample is an exact dyadic (t^2 / 2^30, t^2 < 2^31) and
    numpy's float64 mean is the exact integer sum of squares over n;
    the oracle looks each code's SQUARED table value up in a 256-entry
    list literal and divides in the same order
    (sqrt((ss / 2^30) / n)) with IEEE-correctly-rounded sqrt on both
    engines.

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges, pure scan-map at any scale."""
    from ..operators.multimodal import audio_features, synthesize_g711_blobs

    d = read_table(spark, sf_dir, "documents")
    wavs = synthesize_g711_blobs(d)
    feats = audio_features(wavs, decode="real")
    law = F.when(F.col("doc_id") % 2 == 0, F.lit("mulaw")).otherwise(
        F.lit("alaw")
    )
    return feats.select(
        "doc_id", law.alias("law"), "duration_s", "sample_rate", "rms"
    )


# --- ID3v2 audio metadata through the kernel gate ------------------------------------

_ID3_ORACLE = """
SELECT doc_id,
       cast(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END AS int) AS version,
       'Track ' || doc_id AS title,
       'Artist ' || (doc_id % 7) AS artist,
       'Album ' || (doc_id % 5) AS album,
       (1 + doc_id % 12) || '/12' AS track,
       TRUE AS has_mpeg_sync
FROM documents
"""


@register(
    "mp3_metadata_report",
    oracle=_ID3_ORACLE,
    tags=("extension", "multimodal", "audio"),
)
def mp3_metadata_report(spark, sf_dir):
    """ID3v2 audio metadata end to end (round-9) — the metadata-real /
    decode-boundary split the MP4 probe uses, now for MP3: per document
    a tagged MP3-shaped blob (ID3v2.3 for even doc_ids, v2.4 syncsafe
    frame sizes for odd; text encodings cycling latin-1 / utf-16-BOM /
    utf-8; variable padding; an MPEG frame-sync after the tag —
    operators/id3.py) is probed for title/artist/album/track and the
    frame sync — every field a closed form. MP3 AUDIO decode remains
    the declared boundary (perceptual codec, genuinely needs a
    library).

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges."""
    from ..operators.id3 import mp3_metadata_features, synthesize_mp3_blobs

    d = read_table(spark, sf_dir, "documents")
    return mp3_metadata_features(synthesize_mp3_blobs(d))


# --- SRT/WebVTT subtitle cues through the kernel gate --------------------------------

_SUBS_ORACLE = """
WITH r AS (
  SELECT doc_id, i.i AS cue_idx
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 5)) AS i) i
  WHERE i.i < 2 + doc_id % 4
)
SELECT doc_id,
       cast(cue_idx AS int) AS cue_idx,
       cast(doc_id * 100 + cue_idx * 2000 AS bigint) AS start_ms,
       cast(doc_id * 100 + cue_idx * 2000
            + 1500 + (doc_id + cue_idx) % 500 AS bigint) AS end_ms,
       cast(1500 + (doc_id + cue_idx) % 500 AS bigint) AS duration_ms,
       cast(5 + length(cast(doc_id AS varchar))
              + length(cast(cue_idx AS varchar)) AS int) AS n_chars
FROM r
"""


@register(
    "subtitle_cues_report",
    oracle=_SUBS_ORACLE,
    tags=("extension", "multimodal", "video"),
)
def subtitle_cues_report(spark, sf_dir):
    """Subtitle parsing end to end (round-9) — where video-caption
    training pairs come from: per document a genuine cue file (SRT for
    even doc_ids; WebVTT with a NOTE block and millisecond-dot
    timestamps for odd, operators/subtitles.py) is parsed into one row
    per cue with start/end/duration and text length — all closed forms
    the oracle recomputes, with both format paths under one hash.

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges; cue files parse independently."""
    from ..operators.subtitles import (
        subtitle_cue_features,
        synthesize_subtitle_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    return subtitle_cue_features(synthesize_subtitle_blobs(d))


# --- WebDataset tar shards through the kernel gate -----------------------------------

_WDS_ORACLE = """
WITH d AS (
  SELECT doc_id, j.j AS j
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j
  WHERE j.j < 2 + doc_id % 3
),
g AS (
  SELECT doc_id, j,
         9 + (doc_id + j) % 16 AS w,
         9 + (doc_id + j) % 12 AS h
  FROM d
),
px AS (
  SELECT doc_id, j, w, h,
         list_aggregate(list_transform(range(0, w * h),
           i -> (doc_id * 47 + ((i % w) // 8) * 7 + ((i // w) // 8) * 13
                 + j * 29) % 256), 'sum') AS s
  FROM g
)
SELECT doc_id,
       lpad(cast(doc_id AS varchar), 5, '0') || '-' || j AS key,
       cast(w AS int) AS width, cast(h AS int) AS height,
       (cast(s AS double) / (w * h)) / 255.0 AS mean_intensity,
       cast(5 + length(cast(doc_id AS varchar))
              + length(cast(j AS varchar)) AS int) AS caption_chars
FROM px
"""


@register(
    "webdataset_samples_report",
    oracle=_WDS_ORACLE,
    tags=("extension", "multimodal"),
)
def webdataset_samples_report(spark, sf_dir):
    """WebDataset shard processing end to end (round-9) — the de-facto
    multimodal-training container: per document a genuine tar shard of
    (image, caption) sample pairs (operators/multimodal.py:
    synthesize_webdataset_shards) is demuxed by basename stem
    (operators/webdataset.py, stdlib tarfile), every image decoded
    through the real JPEG codec and every caption measured — one row
    per SAMPLE with key, dimensions, mean intensity, and caption
    length, all closed forms the oracle recomputes.

    Scale: shards are the unit of parallelism (one blob = hundreds of
    sequentially-read samples) — the exact shape WebDataset was
    designed for; two chained mapInPandas stages, zero exchanges."""
    from ..operators.multimodal import (
        synthesize_webdataset_shards,
        webdataset_sample_features,
    )

    d = read_table(spark, sf_dir, "documents")
    return webdataset_sample_features(synthesize_webdataset_shards(d))


# --- Unicode NFKC normalization + control stripping ----------------------------------

_UNICODE_ORACLE = """
SELECT doc_id,
       CASE doc_id % 5
         WHEN 0 THEN 'café ' || doc_id
         WHEN 1 THEN 'café ' || doc_id
         WHEN 2 THEN 'file ' || doc_id
         WHEN 3 THEN 'AB ' || doc_id
         ELSE 'ab ' || doc_id
       END AS text_clean,
       cast(length(CASE doc_id % 5
         WHEN 0 THEN 'café ' || doc_id
         WHEN 1 THEN 'café ' || doc_id
         WHEN 2 THEN 'file ' || doc_id
         WHEN 3 THEN 'AB ' || doc_id
         ELSE 'ab ' || doc_id
       END) AS bigint) AS n_chars,
       cast(CASE WHEN doc_id % 5 = 4 THEN 2 ELSE 0 END AS int)
         AS n_removed,
       doc_id % 5 <> 0 AS changed
FROM documents
"""


@register(
    "unicode_clean_report",
    oracle=_UNICODE_ORACLE,
    tags=("extension", "text"),
)
def unicode_clean_report(spark, sf_dir):
    """Unicode text normalization end to end (round-10) — the first
    cleaning pass every LLM corpus runs: five real denormalization
    classes (precomposed pass-through, combining-accent composition,
    ligature expansion, fullwidth folding, NUL/zero-width stripping)
    go through NFKC + Cc/Cf removal (operators/textnorm.py, stdlib
    unicodedata) and the oracle states every expected CLEANED string
    literally — so the exact compatibility mappings and category
    stripping are hash-gated, not trusted. The spellings this collapses
    are precisely the ones that defeat exact dedup upstream.

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges — pure per-row string work."""
    from ..operators.textnorm import (
        synthesize_dirty_text,
        unicode_clean_features,
    )

    d = read_table(spark, sf_dir, "documents")
    return unicode_clean_features(synthesize_dirty_text(d))


# --- politeness-aware crawl scheduling ------------------------------------------------

_CRAWL_SCHEDULE_ORACLE = """
WITH u AS (
  SELECT doc_id,
         'site' || (doc_id % 10) || '.example' AS domain,
         'https://site' || (doc_id % 10) || '.example' ||
         CASE doc_id % 4
           WHEN 0 THEN '/public/' || doc_id
           WHEN 1 THEN '/private/' || doc_id
           WHEN 2 THEN '/tmp/x' || doc_id
           ELSE '/private/open/' || doc_id
         END AS url
  FROM documents
),
r AS (
  SELECT doc_id, domain, url,
         row_number() OVER (PARTITION BY domain ORDER BY url, doc_id)
           - 1 AS rn
  FROM u
)
SELECT doc_id, domain, url,
       cast(rn // 4 AS int) AS fetch_round,
       cast(rn % 4 AS int) AS slot_in_round
FROM r
"""


@register(
    "crawl_schedule_report",
    oracle=_CRAWL_SCHEDULE_ORACLE,
    tags=("extension", "web"),
)
def crawl_schedule_report(spark, sf_dir):
    """Politeness-aware crawl scheduling (round-10) — after discovery
    (feed_discovery_report) and admission (robots_admission_report),
    the frontier is batched so no domain is fetched more than
    ``rate`` times per round: a domain-partitioned row_number over a
    deterministic (url, doc_id) order assigns each URL its fetch round
    (rn // rate) and its slot within the round (rn %% rate). One
    shuffle, on the politeness key itself — exactly the partitioning a
    cluster-scale fetcher wants, since a round's fetches for one
    domain land on one executor's rate limiter.

    The window is PARTITIONED by domain (the repo-wide partition-less
    window ban applies to this query like every other), and the oracle
    recomputes the schedule with the identical SQL window."""
    from ..operators.web import synthesize_crawl_urls

    rate = 4
    u = synthesize_crawl_urls(read_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("domain").orderBy(F.asc("url"), F.asc("doc_id"))
    rn = F.row_number().over(w) - 1
    return u.select(
        "doc_id", "domain", "url",
        (rn / rate).cast("int").alias("fetch_round"),
        (rn % rate).cast("int").alias("slot_in_round"),
    )


# --- CSV dialect-sniffing ingestion --------------------------------------------------

_CSV_SNIFF_ORACLE = """
WITH d AS (
  SELECT doc_id,
         3 + doc_id % 4 AS n,
         CASE doc_id % 4 WHEN 0 THEN ',' WHEN 1 THEN ';'
                         WHEN 2 THEN chr(9) ELSE '|' END AS delim,
         CASE doc_id % 4 WHEN 0 THEN 'comma' WHEN 1 THEN 'semicolon'
                         WHEN 2 THEN 'tab' ELSE 'pipe' END AS dname
  FROM documents
)
SELECT doc_id,
       dname AS delimiter_name,
       cast(n AS int) AS n_rows,
       cast(3 AS int) AS n_cols,
       cast(n * doc_id * 10 + n * (n - 1) // 2 AS bigint) AS sum_id,
       CASE WHEN (n - 1) % 2 = 0
            THEN 'q"' || doc_id || '"' || (n - 1)
            ELSE 'v' || delim || (n - 1)
       END AS last_note
FROM d
"""


@register(
    "csv_sniff_report",
    oracle=_CSV_SNIFF_ORACLE,
    tags=("extension", "multimodal", "text"),
)
def csv_sniff_report(spark, sf_dir):
    """CSV dialect-sniffing ingestion end to end (round-10) — tabular
    dumps with UNKNOWN delimiters, the step Spark's own CSV reader
    can't do (it needs the delimiter up front): per document a table
    whose delimiter cycles comma/semicolon/tab/pipe, with doubled-quote
    escapes and quoted embedded delimiters in the later rows, is
    dialect-DETECTED (csv.Sniffer over a clean prefix sample with a
    deterministic fallback ladder) and parsed through the real RFC 4180
    quote grammar (operators/csvsniff.py). Reported: the detected
    delimiter name, row/column counts, the id-column sum (proof every
    row split correctly), and the last note field (proof the quote
    grammar decoded) — all closed forms the oracle recomputes,
    including the delimiter character itself inside last_note.

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges."""
    from ..operators.csvsniff import (
        csv_sniff_features,
        synthesize_csv_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    return csv_sniff_features(synthesize_csv_blobs(d))


# --- sitemap / RSS / Atom discovery parsing ------------------------------------------

_FEED_ORACLE = """
WITH e AS (
  SELECT doc_id, j.j AS i
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j
  WHERE j.j < 1 + doc_id % 4
)
SELECT doc_id,
       cast(i AS int) AS entry_idx,
       CASE doc_id % 3 WHEN 0 THEN 'sitemap'
                       WHEN 1 THEN 'rss'
                       ELSE 'atom' END AS kind,
       'https://s' || (doc_id % 10) || '.example/p/' || doc_id || '/' || i
         AS url,
       CASE WHEN doc_id % 3 = 0 THEN ''
            ELSE 'Post ' || doc_id || '-' || i END AS title,
       '2026-01-' || lpad(cast(1 + (doc_id + i) % 28 AS varchar), 2, '0')
         AS published
FROM e
"""


@register(
    "feed_discovery_report",
    oracle=_FEED_ORACLE,
    tags=("extension", "web"),
)
def feed_discovery_report(spark, sf_dir):
    """Crawl-frontier discovery parsing end to end (round-10) — the
    seeding step before robots admission: per document a discovery
    file cycling all three real formats by doc_id % 3 (sitemaps.org
    urlset with lastmod/priority, RSS 2.0 with RFC 822 pubDates, Atom
    with ISO 8601 updated stamps) is parsed namespace-aware by the
    stdlib XML parser (operators/sitemap.py) — one row per discovered
    entry with url, title, and the published date NORMALIZED to one
    ISO day across all three date grammars (RFC 822 parsing included),
    which is exactly what the oracle hash checks. DOCTYPE/ENTITY
    declarations are rejected up front (XML-bomb guard — these are
    untrusted crawler bytes), pinned in tests.

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges."""
    from ..operators.sitemap import (
        feed_discovery_features,
        synthesize_discovery_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    return feed_discovery_features(synthesize_discovery_blobs(d))


# --- MIME / EML email parsing through the kernel gate --------------------------------

_EML_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN '7bit'
                         WHEN 1 THEN 'quoted-printable'
                         ELSE 'base64' END AS encoding,
         1 + doc_id % 3 AS nl
  FROM documents
),
t AS (
  SELECT d.doc_id, d.encoding,
         string_agg('mail ' || d.doc_id || ' line ' || j.j
                    || CASE WHEN d.encoding = '7bit' THEN ''
                            ELSE ' = 50% ü' END,
                    chr(10) ORDER BY j.j) AS text
  FROM d CROSS JOIN (SELECT unnest(range(0, 3)) AS j) j
  WHERE j.j < d.nl
  GROUP BY d.doc_id, d.encoding
)
SELECT doc_id,
       CASE WHEN doc_id % 4 = 0 THEN 'Sale ü ' || doc_id
            ELSE 'Report ' || doc_id END AS subject,
       'user' || (doc_id % 7) || '@example.com' AS from_addr,
       cast(CASE WHEN doc_id % 5 = 0 THEN 3 ELSE 2 END AS int) AS n_parts,
       encoding,
       doc_id % 5 = 0 AS has_attachment,
       cast(length(text) AS bigint) AS body_chars,
       text
FROM t
"""


@register(
    "eml_text_report",
    oracle=_EML_ORACLE,
    tags=("extension", "multimodal", "text"),
)
def eml_text_report(spark, sf_dir):
    """MIME / EML email parsing end to end (round-10) — mailing-list
    and mailbox archives, a classic LLM corpus source: per document a
    HAND-ROLLED raw MIME message (the writer never touches the email
    library, so the stdlib parser meets independently-constructed
    bytes): RFC 2047 encoded-word subjects every fourth document,
    multipart/alternative text/plain + text/html siblings, transfer
    encoding cycling 7bit / quoted-printable / base64 by doc_id % 3,
    and a multipart/mixed base64 attachment every fifth. The kernel
    (operators/mime.py:parse_eml) decodes headers, selects the
    text/plain part, reverses the transfer encoding + charset, and
    normalizes CRLF — the SAME closed-form text must come back from
    all three encodings, which is exactly what the oracle hash checks
    (full text surfaced as a column, rebuilt by string_agg in SQL).

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges — messages parse independently."""
    from ..operators.mime import eml_text_features, synthesize_eml_blobs

    d = read_table(spark, sf_dir, "documents")
    return eml_text_features(synthesize_eml_blobs(d))


# --- corpus front door: format sniffing over a mixed pile ----------------------------

_SNIFF_ORACLE = """
SELECT doc_id,
       CASE doc_id % 10
         WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' WHEN 2 THEN 'wav'
         WHEN 3 THEN 'flac' WHEN 4 THEN 'gif' WHEN 5 THEN 'pdf'
         WHEN 6 THEN 'zip' WHEN 7 THEN 'gzip' WHEN 8 THEN 'mp3'
         ELSE 'warc'
       END AS detected
FROM documents
"""


@register(
    "format_sniff_report",
    oracle=_SNIFF_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def format_sniff_report(spark, sf_dir):
    """The corpus front door end to end (round-10 capstone): a MIXED
    pile of genuine payloads — one per document, format cycling
    jpeg/png/wav/flac/gif/pdf/zip/gzip/mp3/warc through the REAL
    encoders this engine ships — is routed by the magic-byte dispatch
    (media_codecs.sniff_payload: the nine media signatures plus the
    document/container signatures, 'unknown' for quarantine rather
    than a raise). Every detection is a closed form the oracle
    recomputes, so the dispatch table itself sits under one hash —
    the step every undifferentiated ingest runs before handing
    payloads to the per-format parsers the rest of this registry
    value-checks.

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges — sniffing reads a fixed-size prefix per blob."""
    from ..operators.multimodal import (
        format_sniff_features,
        synthesize_mixed_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    return format_sniff_features(synthesize_mixed_blobs(d))


# --- audio voice-activity triage -----------------------------------------------------

_VAD_ORACLE = """
WITH g AS (
  SELECT doc_id,
         28 + doc_id % 7 AS nf,
         2 + doc_id % 4 AS v,
         doc_id % 7 AS extra
  FROM documents
),
s AS (
  SELECT doc_id, nf,
         4 * v + CASE WHEN extra < v THEN extra ELSE v END AS nsp,
         4 + CASE WHEN extra >= 1 THEN 1 ELSE 0 END AS nseg
  FROM g
)
SELECT doc_id,
       cast(nf AS int) AS n_frames,
       cast(nsp AS int) AS n_speech_frames,
       cast(nseg AS int) AS n_segments,
       floor(cast(nsp AS double) / nf * 1000000 + 0.5) / 1000000
         AS speech_ratio
FROM s
"""


@register(
    "audio_vad_report",
    oracle=_VAD_ORACLE,
    tags=("extension", "multimodal", "codec", "quality"),
)
def audio_vad_report(spark, sf_dir):
    """Voice-activity triage end to end (round-10) — the pre-ASR
    segmentation every audio corpus runs: per document a real 16-bit
    PCM WAV with cyclic voice/silence runs (square-wave frames where
    f %% 7 < 2 + doc_id %% 4) is framed into 80-sample windows, frame
    energies computed as EXACT int64 sums of squares, voiced frames
    thresholded, and maximal voiced runs counted — frame counts,
    speech-frame counts, segment counts, and the speech ratio all
    closed forms the oracle recomputes (segment arithmetic included:
    four full cycles plus the partial-cycle segment when extra frames
    exist).

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges."""
    from ..operators.multimodal import (
        audio_vad_features,
        synthesize_vad_wav_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    return audio_vad_features(synthesize_vad_wav_blobs(d))


# --- safetensors checkpoint probe ----------------------------------------------------

_SAFETENSORS_ORACLE = """
WITH t AS (
  SELECT doc_id, k.k AS k
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 3)) AS k) k
  WHERE k.k < 1 + doc_id % 3
),
g AS (
  SELECT doc_id, k,
         CASE (doc_id + k) % 3 WHEN 0 THEN 'F32'
                               WHEN 1 THEN 'F16' ELSE 'I64' END AS dtype,
         CASE (doc_id + k) % 3 WHEN 0 THEN 4 WHEN 1 THEN 2 ELSE 8 END
           AS dsize,
         (2 + doc_id % 3) * (1 + k) AS n_params
  FROM t
)
SELECT doc_id,
       't' || k AS name,
       dtype,
       cast(n_params AS bigint) AS n_params,
       cast(n_params * dsize AS bigint) AS n_bytes,
       cast(1 + doc_id % 3 AS int) AS n_tensors
FROM g
"""


@register(
    "safetensors_report",
    oracle=_SAFETENSORS_ORACLE,
    tags=("extension", "multimodal"),
)
def safetensors_report(spark, sf_dir):
    """safetensors checkpoint inspection end to end (round-10) — the
    weight-artifact probe a model-management pipeline runs (tensor
    inventory, parameter counts, byte accounting): per document a
    spec-shaped safetensors file (8-byte LE header length, JSON tensor
    map, contiguous data spans) with dtypes cycling F32/F16/I64 is
    parsed under the format's FULL contract — spans must equal
    elements x dtype-size and tile the data section exactly; gaps,
    overlaps, unknown dtypes, and lying headers all raise
    (rejection-tested). One row per tensor, every field a closed form
    the oracle recomputes.

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges — and on a real lake only the 8 + header-length PREFIX
    of each multi-GB checkpoint needs fetching, which is the format's
    design point."""
    from ..operators.safetensors import (
        safetensors_features,
        synthesize_safetensors_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    return safetensors_features(synthesize_safetensors_blobs(d))


# --- TFRecord / tf.train.Example shards ----------------------------------------------

_TFRECORD_ORACLE = """
WITH e AS (
  SELECT doc_id, j.j AS j
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 3)) AS j) j
  WHERE j.j < 1 + doc_id % 3
)
SELECT doc_id,
       cast(j AS int) AS ex_idx,
       cast(doc_id * 99 AS bigint) AS id_sum,
       doc_id * 0.25 + (j + 0.5) AS score_sum,
       'w' || doc_id || '-' || j AS tok,
       cast(3 AS int) AS n_features
FROM e
"""


@register(
    "tfrecord_report",
    oracle=_TFRECORD_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def tfrecord_report(spark, sf_dir):
    """TFRecord shard processing end to end (round-10) — the
    TensorFlow training-data container, all stdlib: per document a
    shard of tf.train.Example records goes through the published
    framing (little-endian lengths, MASKED CRC32C over both the length
    bytes and the payload — the Castagnoli CRC with its 0xE3069283
    check value pinned in tests) and a real protobuf WIRE-FORMAT
    parser (varints including 10-byte negative int64s, packed float32
    and int64 lists, nested messages, unknown-field skipping) —
    reporting per example the int64-feature sum (a negative value pins
    the two's-complement varint path), the float32-exact score sum,
    the bytes feature, and the feature count, all closed forms the
    oracle recomputes.

    Scale: shards are the unit of parallelism (exactly how TFRecord is
    consumed by training jobs); two chained mapInPandas stages, zero
    exchanges."""
    from ..operators.tfrecord import (
        synthesize_tfrecord_blobs,
        tfrecord_features,
    )

    d = read_table(spark, sf_dir, "documents")
    return tfrecord_features(synthesize_tfrecord_blobs(d))


# --- charset detection ---------------------------------------------------------------

_CHARSET_ORACLE = """
SELECT doc_id,
       CASE doc_id % 4
         WHEN 0 THEN 'utf-8-sig' WHEN 1 THEN 'utf-16-le'
         WHEN 2 THEN 'cp1252' ELSE 'utf-8'
       END AS charset,
       CASE doc_id % 4
         WHEN 0 THEN 'bom' WHEN 1 THEN 'bom'
         WHEN 2 THEN 'meta' ELSE 'default'
       END AS how,
       CASE doc_id % 4
         WHEN 0 THEN 'süd ' || doc_id
         WHEN 1 THEN 'süd ' || doc_id
         WHEN 2 THEN 'café ' || doc_id
         ELSE 'plain ' || doc_id
       END AS text
FROM documents
"""


@register(
    "charset_detect_report",
    oracle=_CHARSET_ORACLE,
    tags=("extension", "web", "text"),
)
def charset_detect_report(spark, sf_dir):
    """Charset detection end to end (round-10) — the step BEFORE any
    HTML parse on a real crawl, where pages arrive in whatever
    encoding the server felt like: four declaration shapes (UTF-8 BOM,
    UTF-16 LE BOM, <meta charset=windows-1252>, and undeclared UTF-8
    default) are detected per WHATWG precedence (BOM authoritative,
    then a 1024-byte ASCII pre-scan for meta declarations), decoded
    under the DECLARED codec — a lying declaration raises instead of
    emitting mojibake — and the decoded page runs through the standard
    text extractor. The oracle states the expected charset, detection
    source, and decoded text per class, so the non-UTF-8 decode paths
    are value-checked character for character.

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges."""
    from ..operators.web import (
        charset_text_features,
        synthesize_charset_pages,
    )

    d = read_table(spark, sf_dir, "documents")
    return charset_text_features(synthesize_charset_pages(d))


# --- EXIF GPS geotags ----------------------------------------------------------------

_EXIF_GEO_ORACLE = """
WITH g AS (
  SELECT doc_id,
         (cast(doc_id % 90 AS double)
          + (doc_id * 3 % 60) / 60.0
          + ((doc_id * 7 % 6000) / 100.0) / 3600.0)
         * (CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE -1.0 END) AS lat_raw,
         (cast(doc_id % 180 AS double)
          + (doc_id * 5 % 60) / 60.0
          + ((doc_id * 11 % 6000) / 100.0) / 3600.0)
         * (CASE WHEN doc_id % 3 = 0 THEN -1.0 ELSE 1.0 END) AS lon_raw
  FROM documents
)
SELECT doc_id,
       floor(lat_raw * 1000000 + 0.5) / 1000000 AS lat,
       floor(lon_raw * 1000000 + 0.5) / 1000000 AS lon,
       cast(floor(lat_raw) AS bigint) || ':'
         || cast(floor(lon_raw) AS bigint) AS cell
FROM g
"""


@register(
    "exif_geo_report",
    oracle=_EXIF_GEO_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def exif_geo_report(spark, sf_dir):
    """EXIF GPS geotag extraction end to end (round-10) — the geo
    signal photo corpora bucket and dedup on: per document a real JPEG
    whose APP1 carries a GPS IFD (RATIONAL degree/minute/second
    triples with a 1/100-second denominator, N/S/E/W refs, byte order
    alternating II/MM) is walked by the generic IFD reader
    (operators/exif.py — rational type added round-10, zero
    denominators fail loud) and converted to signed decimal degrees
    plus the 1-degree grid cell — the rational arithmetic, ref signs,
    and floor-form rounding all mirrored in the oracle expression
    shapes.

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges; the cell column is the join key a geo-bucketed dedup
    shuffles on downstream."""
    from ..operators.multimodal import (
        exif_geo_features,
        synthesize_geo_jpeg_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    return exif_geo_features(synthesize_geo_jpeg_blobs(d))


# --- host-level link graph -----------------------------------------------------------

_LINK_GRAPH_ORACLE = """
WITH e AS (
  SELECT doc_id,
         'site' || (doc_id % 10) || '.example' AS src,
         'site' || ((doc_id + k.k) % 10) || '.example' AS dst
  FROM documents
  CROSS JOIN (SELECT unnest(range(1, 5)) AS k) k
  WHERE k.k < 2 + doc_id % 4
)
SELECT src AS src_domain,
       cast(count(DISTINCT doc_id) AS bigint) AS n_pages,
       cast(count(*) AS bigint) AS n_links,
       cast(count(DISTINCT dst) AS int) AS n_distinct_dst
FROM e
GROUP BY src
"""


@register(
    "link_graph_degree_report",
    oracle=_LINK_GRAPH_ORACLE,
    tags=("extension", "web", "graph"),
)
def link_graph_degree_report(spark, sf_dir):
    """Host-level link graph end to end (round-10) — the frontier-
    expansion / domain-authority input a crawler derives from its own
    pages: per document a REAL HTML page on site{doc_id % 10} linking
    to the next 1 + doc_id % 4 sites around the ring is parsed with
    the production extractor (operators/web.py:extract_html), each
    href's host recovered via urlsplit — then the edge list aggregates
    to per-source-domain page counts, out-link counts, and distinct
    destination degrees.

    Scale: one mapInPandas parse pass (edges never carry the page
    payload), then Catalyst's Expand-based multi-distinct rewrite for
    the two DISTINCT aggregates — two exchanges keyed on (domain x
    distinct-column), with map-side partial aggregation on the
    expanded rows. Three exchanges total including the id-spine widen;
    every one carries only domain strings and ids, never page
    content."""
    from ..operators.web import link_graph_edges, synthesize_linked_pages

    d = read_table(spark, sf_dir, "documents")
    edges = link_graph_edges(synthesize_linked_pages(d))
    return edges.groupBy(F.col("src_domain")).agg(
        F.countDistinct("doc_id").alias("n_pages"),
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("dst_domain").cast("int").alias("n_distinct_dst"),
    )


# --- image pixel-quality triage ------------------------------------------------------

_IMG_QUALITY_ORACLE = """
WITH g AS (
  SELECT doc_id, 9 + doc_id % 16 AS w, 9 + doc_id % 12 AS h,
         CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ch
  FROM documents
),
v AS (
  SELECT doc_id, w, h, ch, w * h AS npx,
         list_transform(range(0, w * h),
           i -> (doc_id * 31 + ((i % w) // 8) * 7 + ((i // w) // 8) * 13)
                % 256) AS vals
  FROM g
),
s AS (
  SELECT doc_id, w, h, ch, npx, vals,
         list_aggregate(vals, 'sum') AS s1,
         list_aggregate(list_transform(vals, x -> x * x), 'sum') AS s2,
         list_aggregate(vals, 'min') AS mn,
         list_aggregate(vals, 'max') AS mx
  FROM v
),
e AS (
  SELECT *, cast(list_sum(list_transform(list_distinct(vals),
           u -> cast(floor(
                  (len(list_filter(vals, x -> x = u))
                   / cast(npx AS double))
                  * ln(len(list_filter(vals, x -> x = u))
                       / cast(npx AS double))
                  * 1000000000 - 0.5) AS bigint))) AS double) AS hs
  FROM s
)
SELECT doc_id,
       cast(w AS int) AS width, cast(h AS int) AS height,
       cast(ch AS int) AS channels,
       cast(mn AS int) AS px_min, cast(mx AS int) AS px_max,
       floor((cast(s1 AS double) / npx) * 10000 + 0.5) / 10000 AS mean_px,
       floor((cast(s2 AS double) / npx
              - (cast(s1 AS double) / npx) * (cast(s1 AS double) / npx))
             * 10000 + 0.5) / 10000 AS var_px,
       floor(-(hs / 1000000000) * 10000 + 0.5) / 10000 AS entropy
FROM e
"""


@register(
    "image_quality_report",
    oracle=_IMG_QUALITY_ORACLE,
    tags=("extension", "multimodal", "codec", "quality"),
)
def image_quality_report(spark, sf_dir):
    """Image pixel-quality triage end to end (round-10) — the stats a
    multimodal corpus filters on (flat/blown-out/low-information
    frames): every document's REAL JPEG (the five-subsampling,
    progressive/restart-cycling fixture of multimodal_jpeg_decode) is
    decoded and its luma plane summarized — min/max, exact-int64-sum
    mean and variance, and Shannon entropy with each p*ln(p) term
    int64-quantized before the fold (the text_unigram_entropy idiom,
    so the sum is enumeration-order-independent in both engines). The
    oracle rebuilds every statistic from the tile closed form,
    including the entropy fold over the distinct tile values.

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges."""
    from ..operators.multimodal import (
        image_quality_features,
        synthesize_jpeg_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    return image_quality_features(synthesize_jpeg_blobs(d))


# --- data-URI embedded-image extraction ----------------------------------------------

_DATA_URI_ORACLE = """
WITH d AS (
  SELECT doc_id, j.j AS i
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 3)) AS j) j
  WHERE j.j < doc_id % 3
),
g AS (
  SELECT doc_id, i,
         9 + (doc_id + i) % 16 AS w,
         9 + (doc_id + i) % 12 AS h
  FROM d
),
px AS (
  SELECT doc_id, i, w, h,
         list_aggregate(list_transform(range(0, w * h),
           k -> (doc_id * 41 + ((k % w) // 8) * 7 + ((k // w) // 8) * 13
                 + i * 17) % 256), 'sum') AS s
  FROM g
)
SELECT doc_id,
       cast(i AS int) AS img_idx,
       cast(w AS int) AS width, cast(h AS int) AS height,
       (cast(s AS double) / (w * h)) / 255.0 AS mean_intensity,
       cast(1 AS int) AS n_external
FROM px
"""


@register(
    "data_uri_images_report",
    oracle=_DATA_URI_ORACLE,
    tags=("extension", "web", "multimodal", "codec"),
)
def data_uri_images_report(spark, sf_dir):
    """Embedded-media extraction end to end (round-10) — the step that
    turns a text crawl into a MULTIMODAL corpus: per document an HTML
    page carrying doc_id % 3 data:image/jpeg;base64 <img> URIs (real
    block-constant JPEGs), one external image reference, and a decoy
    non-image data URI is parsed with the stdlib HTML parser; embedded
    URIs are strict-base64-decoded and pushed through the REAL JPEG
    decoder, external refs counted but never fetched, the decoy
    skipped — one row per embedded image with dimensions and mean
    intensity as tile-sum closed forms plus the external count, all
    oracle-recomputed. Malformed data URIs fail loud.

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges — the HTML->media pivot is per-document work."""
    from ..operators.web import (
        data_uri_image_features,
        synthesize_html_with_images,
    )

    d = read_table(spark, sf_dir, "documents")
    return data_uri_image_features(synthesize_html_with_images(d))


# --- mbox archives through the kernel gate -------------------------------------------

_MBOX_ORACLE = """
WITH m AS (
  SELECT doc_id, j.j AS j
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 3)) AS j) j
  WHERE j.j < 1 + doc_id % 3
),
e AS (
  SELECT doc_id, j,
         CASE (doc_id + j) % 3 WHEN 0 THEN '7bit'
                               WHEN 1 THEN 'quoted-printable'
                               ELSE 'base64' END AS encoding,
         CASE WHEN (doc_id + j) % 3 = 0 THEN '' ELSE ' ü 50%' END AS sfx
  FROM m
)
SELECT doc_id,
       cast(j AS int) AS msg_idx,
       'Msg ' || doc_id || '-' || j AS subject,
       'user' || ((doc_id + j) % 7) || '@example.com' AS from_addr,
       encoding,
       'mb ' || doc_id || '-' || j || ' line 0' || sfx
       || CASE WHEN (doc_id + j) % 2 = 1
               THEN chr(10) || 'mb ' || doc_id || '-' || j
                    || ' line 1' || sfx
               ELSE '' END AS text
FROM e
"""


@register(
    "mbox_messages_report",
    oracle=_MBOX_ORACLE,
    tags=("extension", "multimodal", "text"),
)
def mbox_messages_report(spark, sf_dir):
    """mbox archive demux end to end (round-10) — the container
    mailing-list corpora actually ship in: per document an mboxrd
    archive of 1 + doc_id % 3 hand-rolled MIME messages (envelope
    'From ' lines, reversible '>'-quoting of ^>*From body lines) is
    split back into its messages (operators/mime.py:split_mbox) and
    each run through the FULL EML parser — one row per message with
    subject, sender, transfer encoding, and the extracted text (all
    three encodings converging on the closed form, as in
    eml_text_report).

    Scale: archives are the shard unit (one blob = a mailing list's
    month); two chained mapInPandas stages, zero exchanges."""
    from ..operators.mime import (
        mbox_messages_features,
        synthesize_mbox_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    return mbox_messages_features(synthesize_mbox_blobs(d))


# --- robots.txt crawl-policy admission -----------------------------------------------

_ROBOTS_ORACLE = """
WITH u AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN '/public/' || doc_id
           WHEN 1 THEN '/private/' || doc_id
           WHEN 2 THEN '/tmp/x' || doc_id
           ELSE '/private/open/' || doc_id
         END AS path
  FROM documents
)
SELECT doc_id,
       'https://site' || (doc_id % 10) || '.example' || path AS url,
       'site' || (doc_id % 10) || '.example' AS domain,
       CASE (doc_id % 10) % 3
         WHEN 1 THEN false
         WHEN 2 THEN true
         ELSE doc_id % 4 IN (0, 3)
       END AS allowed
FROM u
"""


@register(
    "robots_admission_report",
    oracle=_ROBOTS_ORACLE,
    tags=("extension", "web"),
)
def robots_admission_report(spark, sf_dir):
    """robots.txt crawl-policy admission end to end (round-10) — the
    missing step between WARC parsing and corpus admission: a frontier
    of one URL per document (ten sites cycling three policy shapes:
    Allow-override path rules / full disallow / allow-all, each with a
    decoy specific-agent entry that blocks everything) is broadcast-
    joined against the per-domain robots dimension and each URL
    evaluated with genuine urllib.robotparser semantics ('*'-agent
    entry selection, first-match rule order, Allow above Disallow) in
    an Arrow-batched kernel that parses each domain's robots.txt once
    per batch (operators/web.py:robots_admission).

    The oracle recomputes every admission decision independently from
    the (site policy, path class) closed form — so entry selection,
    prefix matching, and the Allow override are all hash-gated
    (tests/test_multimodal.py additionally pins the decisions against
    a hand-written expected table).

    Scale: the robots side is one row per registered domain — always
    a broadcast; the frontier side is a zero-shuffle scan-map."""
    from ..operators.web import (
        robots_admission,
        synthesize_crawl_urls,
        synthesize_robots_table,
    )

    d = read_table(spark, sf_dir, "documents")
    return robots_admission(
        synthesize_crawl_urls(d), synthesize_robots_table(spark)
    )


# --- MP3 full frame walk through the kernel gate -------------------------------------

_MP3_T1 = "[32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]"
_MP3_T2 = "[8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]"

_MP3_FRAMES_ORACLE = f"""
WITH d AS (
  SELECT doc_id, 8 + doc_id % 5 AS nf,
         doc_id % 2 = 0 AS is_v1, doc_id % 3 = 0 AS vbr
  FROM documents
),
k AS (
  SELECT *, CASE WHEN is_v1 THEN {_MP3_T1} ELSE {_MP3_T2} END AS t
  FROM d
),
l AS (
  SELECT *,
         CASE WHEN vbr
              THEN [t[14]] || list_transform(range(1, nf),
                     j -> t[cast((doc_id + j) % 14 AS int) + 1])
              ELSE list_transform(range(0, nf),
                     j -> t[cast(doc_id % 14 AS int) + 1])
         END AS kbps
  FROM k
)
SELECT doc_id,
       cast(CASE WHEN is_v1 THEN 1 ELSE 2 END AS int) AS version,
       cast(CASE WHEN is_v1 THEN 44100 ELSE 22050 END AS int) AS samplerate,
       cast(nf AS int) AS n_frames,
       cast(list_aggregate(kbps, 'min') AS int) AS min_kbps,
       cast(list_aggregate(kbps, 'max') AS int) AS max_kbps,
       cast(len(list_distinct(kbps)) AS int) AS n_distinct_kbps,
       vbr AS has_xing,
       cast(CASE WHEN vbr THEN nf ELSE -1 END AS int) AS declared_frames,
       cast((nf * CASE WHEN is_v1 THEN 1152 ELSE 576 END * 1000)
            // CASE WHEN is_v1 THEN 44100 ELSE 22050 END AS bigint)
         AS duration_ms
FROM l
"""


@register(
    "mp3_frames_report",
    oracle=_MP3_FRAMES_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def mp3_frames_report(spark, sf_dir):
    """MP3 deep frame walk end to end (round-10) — the audio-corpus
    triage fields beyond the ID3 probe: per document an ID3v2-tagged
    stream of 8 + doc_id % 5 GENUINE MPEG frame headers (MPEG1 Layer
    III @ 44.1 kHz even doc_ids, MPEG2 @ 22.05 kHz odd; CBR at index
    (doc_id % 14) + 1, or VBR with a frames-declaring Xing header when
    doc_id % 3 == 0) is walked frame by frame
    (operators/mp3.py:parse_mp3_frames): every header validated, frame
    lengths computed from the public bitrate/sample-rate tables, stream
    consistency enforced, Xing detected at the version/mode-dependent
    side-info offset — reporting version, sample rate, frame count,
    bitrate histogram summary, VBR declaration, and the exact-integer
    duration estimate, all closed forms the oracle recomputes
    (including both bitrate TABLES as SQL literals, so the table lookup
    itself is hash-gated). Audio decode stays the declared boundary.

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges."""
    from ..operators.mp3 import (
        mp3_frames_features,
        synthesize_mp3_frame_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    return mp3_frames_features(synthesize_mp3_frame_blobs(d))


# --- PDF text extraction through the kernel gate -------------------------------------

_PDF_ORACLE = """
WITH p AS (
  SELECT doc_id, j.j AS p
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 3)) AS j) j
  WHERE j.j < 1 + doc_id % 3
),
t AS (
  SELECT doc_id,
         string_agg('Doc ' || doc_id || ' page ' || p || chr(10)
                    || 'pay(load) ' || (doc_id * 7 + p) || ' '
                    || chr(8364),
                    chr(10) ORDER BY p) AS text,
         count(*) AS n_pages
  FROM p GROUP BY doc_id
)
SELECT doc_id,
       cast(n_pages AS int) AS n_pages,
       cast(length(text) AS bigint) AS n_chars,
       text
FROM t
"""


@register(
    "pdf_text_report",
    oracle=_PDF_ORACLE,
    tags=("extension", "multimodal", "text", "codec"),
)
def pdf_text_report(spark, sf_dir):
    """PDF text extraction end to end (round-10) — the largest untapped
    document source for an LLM corpus: per document a COMPLETE PDF
    (header, object graph, catalog -> page tree -> Helvetica/
    WinAnsiEncoding pages, spec-exact xref table + trailer;
    operators/pdf.py:build_pdf) with 1 + doc_id % 3 pages of two lines
    each is parsed the real way — startxref -> xref walk -> page-tree
    walk -> /Contents FlateDecode (even doc_ids compressed, odd raw) ->
    content-stream BT..ET/Td/Tj/TJ text assembly (every third document
    uses split TJ arrays with kerning numbers) -> cp1252 decoding
    (escaped parentheses + the 0x80 euro in every payload line).

    Container layouts cycle too (round-10 extension): two thirds of
    the fixtures use the PDF 1.5 xref-STREAM layout (W-field rows,
    Flate + PNG Up predictor), a third of those with every non-stream
    object packed into a compressed /ObjStm — so the modern container
    path virtually all real PDFs use sits under the SAME hash as the
    classic table.

    The COMPLETE extracted text is a result column, rebuilt
    character-for-character by the SQL oracle (string_agg over the page
    range) — the assembly rule itself is value-checked, not just
    counts. Encrypted files, CID fonts, and non-Flate filters are loud
    declared boundaries (rejection-swept in tests/test_multimodal.py).

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges — documents parse independently, the WARC/HTML shape."""
    from ..operators.pdf import pdf_text_features, synthesize_pdf_blobs

    d = read_table(spark, sf_dir, "documents")
    return pdf_text_features(synthesize_pdf_blobs(d))


# --- ZIP-container shards through the kernel gate ------------------------------------

_ZIP_ORACLE = """
WITH d AS (
  SELECT doc_id, j.j AS j
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j
  WHERE j.j < 2 + doc_id % 3
),
g AS (
  SELECT doc_id, j,
         9 + (doc_id + 2 * j) % 16 AS w,
         9 + (doc_id + j) % 12 AS h
  FROM d
),
px AS (
  SELECT doc_id, j, w, h,
         list_aggregate(list_transform(range(0, w * h),
           i -> (doc_id * 53 + ((i % w) // 8) * 7 + ((i // w) // 8) * 13
                 + j * 37) % 256), 'sum') AS s
  FROM g
)
SELECT doc_id,
       'z' || lpad(cast(doc_id AS varchar), 5, '0') || '-' || j AS key,
       cast(w AS int) AS width, cast(h AS int) AS height,
       (cast(s AS double) / (w * h)) / 255.0 AS mean_intensity,
       -- 'zipcap-{doc_id}-{j}' = 8 literal chars + the two digit runs
       cast(8 + length(cast(doc_id AS varchar))
              + length(cast(j AS varchar)) AS int) AS caption_chars,
       cast(CASE WHEN (doc_id + j) % 2 = 0 THEN 0 ELSE 8 END AS int)
         AS img_method
FROM px
"""


@register(
    "zip_shard_report",
    oracle=_ZIP_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def zip_shard_report(spark, sf_dir):
    """ZIP-container shard processing end to end (round-10) — the other
    ubiquitous training-data container next to tar WebDataset shards:
    per document a genuine ZIP archive of stem-paired (image, caption)
    samples mixing BOTH storage methods (STORED for the JPEGs on even
    (doc_id + j), DEFLATED otherwise; captions always DEFLATED) is
    demuxed by basename stem with CRC-32 verification
    (operators/zipshard.py, stdlib zipfile), every image decoded
    through the real JPEG codec and every caption measured — one row
    per SAMPLE with key, dimensions, mean intensity, caption length,
    and the image member's storage method, all closed forms the oracle
    recomputes (the method split included, so the inflate path is
    hash-gated).

    Scale: shards are the unit of parallelism; two chained mapInPandas
    stages over an id spine, zero exchanges — same shape as the tar
    and WARC entries."""
    from ..operators.multimodal import (
        synthesize_zip_shards,
        zip_shard_features,
    )

    d = read_table(spark, sf_dir, "documents")
    return zip_shard_features(synthesize_zip_shards(d))


# --- EXIF orientation-aware image features through the kernel gate -------------------

_EXIF_ORACLE = """
WITH d AS (
  SELECT doc_id,
         9 + doc_id % 16 AS w,
         9 + doc_id % 12 AS h,
         1 + doc_id % 8 AS o
  FROM documents
),
px AS (
  SELECT doc_id, w, h, o,
         list_aggregate(list_transform(range(0, w * h),
           i -> (doc_id * 43 + ((i % w) // 8) * 17 + ((i // w) // 8) * 23)
                % 256), 'sum') AS s
  FROM d
)
SELECT doc_id,
       cast(o AS int) AS orientation,
       'Cam' || (doc_id % 3) AS make,
       cast(CASE WHEN o >= 5 THEN h ELSE w END AS int) AS width,
       cast(CASE WHEN o >= 5 THEN w ELSE h END AS int) AS height,
       (cast(s AS double) / (w * h)) / 255.0 AS mean_intensity
FROM px
"""


@register(
    "multimodal_exif_report",
    oracle=_EXIF_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def multimodal_exif_report(spark, sf_dir):
    """EXIF-aware image pipeline end to end (round-9): per document a
    camera-style JPEG — an APP1 Exif segment (complete TIFF structure,
    little-endian for even doc_ids and BIG-endian for odd) carrying
    orientation 1..8, make, and pixel dims over block-constant pixels
    (operators/multimodal.py:synthesize_exif_jpeg_blobs) — is parsed
    (operators/exif.py: generic IFD walk, Exif sub-IFD pointer),
    decoded, and AUTO-ROTATED through the published orientation
    transforms; reported are the metadata and the ORIENTED dimensions
    (orientations 5-8 transpose, so the rotation math is hash-gated)
    plus the mean intensity (invariant under the eight transforms —
    which the oracle exploits to stay a pure tile-sum closed form).

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges, pure scan-map at any scale."""
    from ..operators.multimodal import (
        image_exif_features,
        synthesize_exif_jpeg_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    return image_exif_features(synthesize_exif_jpeg_blobs(d))


# --- web ingestion: HTML extraction + WARC parsing through the kernel gate -----------

_HTML_ORACLE = """
SELECT doc_id,
       'Doc ' || doc_id AS title,
       cast(doc_id % 5 AS int) AS n_links,
       -- each link contributes ' ref{i}' (5 chars incl. the separating
       -- space); when the body text normalizes to EMPTY the first
       -- anchor has no leading space, so one char comes back off
       cast(length(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))
            + 5 * (doc_id % 5)
            - CASE WHEN length(trim(regexp_replace(text, '[ \t\n\r]+',
                                                   ' ', 'g'))) = 0
                        AND doc_id % 5 > 0
                   THEN 1 ELSE 0 END AS bigint) AS n_chars
FROM documents
"""


@register(
    "html_extract_report",
    oracle=_HTML_ORACLE,
    tags=("extension", "web", "text"),
)
def html_extract_report(spark, sf_dir):
    """HTML text extraction end to end (round-9) — the step every web
    corpus starts from: per document a genuine HTML page (title, nested
    paragraph divs, a link footer, plus <script> with a raw '<',
    <style>, and comments that extraction must DROP) is synthesized
    from the document's text (operators/web.py:synthesize_html_blobs),
    then the stdlib-parser extraction kernel (html_text_features ->
    extract_html: script/style skipping, entity decoding, whitespace
    normalization, link collection) recovers the title, link count, and
    extracted-text length.

    The closed form: extracted text = the normalized document text plus
    one ' ref{i}' anchor per link, so n_chars = normalized length +
    5 * (doc_id % 5) — recomputed in pure SQL with the same
    whitespace-collapse semantics.

    Scale: two chained mapInPandas stages — zero exchanges (the widen
    spine carries the source text, no HTML payload ever shuffles)."""
    from ..operators.web import html_text_features, synthesize_html_blobs

    d = read_table(spark, sf_dir, "documents")
    return html_text_features(synthesize_html_blobs(d))


_URL_ORACLE = """
SELECT doc_id,
       CASE doc_id % 6
         WHEN 0 THEN 'https://example.com/p/' || doc_id
         WHEN 1 THEN 'http://site' || (doc_id % 7) || '.org/a/b?a=1&z=2'
         WHEN 2 THEN 'https://www.data.net/x?q=' || doc_id
         WHEN 3 THEN 'https://ex.com/p'
         WHEN 4 THEN 'http://h' || (doc_id % 9) || '.io/'
         ELSE 'https://a.b.c.org/d?a=1&b=2'
       END AS url_canonical,
       CASE doc_id % 6
         WHEN 0 THEN 'example.com'
         WHEN 1 THEN 'site' || (doc_id % 7) || '.org'
         WHEN 2 THEN 'data.net'
         WHEN 3 THEN 'ex.com'
         WHEN 4 THEN 'h' || (doc_id % 9) || '.io'
         ELSE 'c.org'
       END AS domain
FROM documents
"""


@register(
    "url_canonicalize_report",
    oracle=_URL_ORACLE,
    tags=("extension", "web"),
)
def url_canonicalize_report(spark, sf_dir):
    """URL canonicalization (round-9) — the crawl-dedup prerequisite:
    six messy-URL classes (mixed-case scheme/host, explicit default
    ports, utm_*/click-id tracking params, unsorted query params,
    fragments, missing paths) canonicalize through
    operators/web.py:canonicalize_url plus a registered-domain
    projection. The oracle is INDEPENDENT: it states the expected
    canonical string for each variant outright (no shared
    canonicalization code on the SQL side), so a normalization bug
    cannot hide behind mirrored logic.

    Scale: zero-shuffle scan-map (pure per-row string munging)."""
    from ..operators.web import canonical_urls, synthesize_urls

    d = read_table(spark, sf_dir, "documents")
    return canonical_urls(synthesize_urls(d))


_JSONL_ORACLE = """
WITH r AS (
  SELECT doc_id, i.i AS line_idx
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
  WHERE i.i < 1 + doc_id % 4
)
SELECT doc_id,
       cast(line_idx AS int) AS line_idx,
       doc_id || '-' || line_idx AS record_id,
       cast(doc_id * 7 + line_idx AS bigint) AS n
FROM r
"""


@register(
    "jsonl_shard_report",
    oracle=_JSONL_ORACLE,
    tags=("extension", "web"),
)
def jsonl_shard_report(spark, sf_dir):
    """Compressed-JSONL corpus shards end to end (round-9) — the format
    text corpora actually ship in: per document one shard of closed-form
    JSON records, compression cycling gzip / bz2 / xz / lz4 / zstd by
    doc_id % 5 (operators/web.py:synthesize_jsonl_shards; gzip written
    with mtime=0 so the bytes are deterministic; lz4 is the hand-rolled
    full frame codec and zstd the raw-block frame form of
    operators/lz4zstd.py), demuxed by the production kernel
    (jsonl_shard_records -> decompress_jsonl: codec sniffed from magic
    bytes, corrupt streams and malformed lines raise) into one row per
    record — every field a closed form the oracle recomputes.

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges; shards decompress independently."""
    from ..operators.web import jsonl_shard_records, synthesize_jsonl_shards

    d = read_table(spark, sf_dir, "documents")
    return jsonl_shard_records(synthesize_jsonl_shards(d))


_WARC_ORACLE = """
WITH r AS (
  SELECT doc_id, i.i AS record_idx
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 3)) AS i) i
  WHERE i.i < 1 + doc_id % 3
)
SELECT doc_id,
       cast(record_idx AS int) AS record_idx,
       'https://ex.com/' || doc_id || '/' || record_idx AS target_uri,
       cast(CASE (doc_id + record_idx) % 3
            WHEN 0 THEN 200 WHEN 1 THEN 404 ELSE 301 END AS int)
         AS http_status,
       cast(7 + length(cast(doc_id AS varchar))
              + length(cast(record_idx AS varchar))
              + (doc_id * 7 + record_idx * 13) % 50 AS bigint) AS body_bytes
FROM r
"""


@register(
    "warc_response_report",
    oracle=_WARC_ORACLE,
    tags=("extension", "web"),
)
def warc_response_report(spark, sf_dir):
    """WARC crawl-container parsing end to end (round-9) — the entry
    point of a CommonCrawl-scale pipeline: per document a genuine
    WARC/1.0 file (warcinfo record + 1..3 HTTP response records with
    Content-Length framing and double-CRLF separators,
    operators/web.py:synthesize_warc_blobs) is parsed by the production
    kernel (warc_response_features -> parse_warc: framing validated
    record by record; non-response records skipped), emitting one row
    per response with its target URI, the HTTP status parsed from the
    enclosed response, and the body size — the fields a crawl filter
    keys on, every one a closed form the oracle recomputes.

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges; WARC records parse independently within each file."""
    from ..operators.web import synthesize_warc_blobs, warc_response_features

    d = read_table(spark, sf_dir, "documents")
    return warc_response_features(synthesize_warc_blobs(d))


# --- REAL AVI/MJPEG per-frame video decode through the kernel gate -------------------

_AVI_ORACLE = """
WITH d AS (
  SELECT doc_id,
         1 + doc_id % 4 AS nf,
         9 + doc_id % 16 AS w,
         9 + doc_id % 12 AS h,
         40000 + doc_id % 1000 AS usec,
         CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 1 END AS ch
  FROM documents
),
f AS (
  SELECT doc_id, w, h, usec, ch, k.k AS frame_idx
  FROM d CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k
  WHERE k.k < nf
),
px AS (
  SELECT doc_id, frame_idx, w, h, usec, ch,
         list_aggregate(list_transform(range(0, w * h),
           i -> (doc_id * 31 + ((i % w) // 8) * 7 + ((i // w) // 8) * 13
                 + frame_idx * 59) % 256), 'sum') AS s
  FROM f
)
SELECT doc_id, cast(frame_idx AS int) AS frame_idx,
       cast(w AS int) AS width, cast(h AS int) AS height,
       cast(usec AS int) AS usec_per_frame,
       (cast(s * ch AS double) / (w * h * ch)) / 255.0 AS mean_intensity
FROM px
"""


@register(
    "multimodal_avi_frames",
    oracle=_AVI_ORACLE,
    tags=("extension", "multimodal", "codec", "video"),
)
def multimodal_avi_frames(spark, sf_dir):
    """REAL VIDEO demux + frame decode end to end (round-9), no ffmpeg:
    per document a genuine AVI/MJPEG file — RIFF hdrl/movi structure,
    1..4 complete baseline-JPEG frames (grayscale, RGB for every third
    document), a legacy idx1 index — is synthesized from closed-form
    BLOCK-CONSTANT tiles (operators/multimodal.py:synthesize_avi_blobs),
    then the production path (avi_frame_features ->
    operators/avi.py:decode_avi_mjpeg -> operators/jpeg.py) demuxes the
    container, decodes every frame, validates header/stream consistency,
    and emits one row PER FRAME with dimensions, container frame
    duration, and mean intensity.

    Bit-exactness is the JPEG fixture argument (lone DC coefficient,
    q75 luma DC step exactly 8); the oracle recomputes per-frame tile
    sums in pure SQL and divides in numpy-mean order
    ((s*ch / (w*h*ch)) / 255).

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges; frames demux independently within each blob."""
    from ..operators.multimodal import avi_frame_features, synthesize_avi_blobs

    d = read_table(spark, sf_dir, "documents")
    avis = synthesize_avi_blobs(d)
    return avi_frame_features(avis)


# --- audio fingerprint near-dup through the kernel gate ------------------------------

_AFP_HOT = 64
_AFP_MAX_HD = 3

_AFP_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 < 2 THEN 300 + ((doc_id // 4) * 7) % 200
              ELSE 300 + (doc_id * 3) % 200 END AS n,
         CASE WHEN doc_id % 4 < 2 THEN (doc_id // 4) * 37
              ELSE doc_id * 41 END AS c0,
         CASE WHEN doc_id % 4 < 2 THEN 11 ELSE 13 END AS c1
  FROM documents
),
geo AS (SELECT doc_id, c0, c1, n // 17 AS L, (n // 17) // 5 AS L5 FROM d),
en AS (
  SELECT doc_id, f.f, b.b,
         list_aggregate(list_transform(
           list_transform(range(0, L5),
             k -> ((c0 + (f.f * L + b.b * L5 + k) * c1) * 2654435761)
                  % 4294967296),
           h -> (xor(h, h // 65536) % 65536 - 32768)
              * (xor(h, h // 65536) % 65536 - 32768)), 'sum') AS e
  FROM geo
  CROSS JOIN (SELECT unnest(range(0, 17)) AS f) f
  CROSS JOIN (SELECT unnest(range(0, 5)) AS b) b
),
ev AS (SELECT doc_id, list(e ORDER BY f, b) AS E FROM en GROUP BY doc_id),
bands AS (
  SELECT doc_id, k.k AS b,
         list_aggregate(list_transform(range(0, 16), j ->
           CASE WHEN
             (E[((k.k * 16 + j) // 4 + 1) * 5 + (k.k * 16 + j) % 4 + 1]
              - E[((k.k * 16 + j) // 4 + 1) * 5 + (k.k * 16 + j) % 4 + 2])
           - (E[((k.k * 16 + j) // 4) * 5 + (k.k * 16 + j) % 4 + 1]
              - E[((k.k * 16 + j) // 4) * 5 + (k.k * 16 + j) % 4 + 2]) > 0
           THEN 1 << j ELSE 0 END), 'sum') AS bv
  FROM ev CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
),
hot AS (SELECT b, bv FROM bands GROUP BY b, bv HAVING count(*) > {_AFP_HOT}),
bands2 AS (SELECT * FROM bands ANTI JOIN hot USING (b, bv)),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands2 x JOIN bands2 y ON x.b = y.b AND x.bv = y.bv
  WHERE x.doc_id < y.doc_id
),
bv AS (SELECT doc_id, list(bv ORDER BY b) AS bvs FROM bands GROUP BY doc_id)
SELECT c2.doc_a, c2.doc_b,
       cast(bit_count(xor(x.bvs[1], y.bvs[1]))
          + bit_count(xor(x.bvs[2], y.bvs[2]))
          + bit_count(xor(x.bvs[3], y.bvs[3]))
          + bit_count(xor(x.bvs[4], y.bvs[4])) AS int) AS hamming
FROM cand c2
JOIN bv x ON x.doc_id = c2.doc_a
JOIN bv y ON y.doc_id = c2.doc_b
WHERE bit_count(xor(x.bvs[1], y.bvs[1])) + bit_count(xor(x.bvs[2], y.bvs[2]))
    + bit_count(xor(x.bvs[3], y.bvs[3])) + bit_count(xor(x.bvs[4], y.bvs[4]))
    <= {_AFP_MAX_HD}
"""


@register(
    "audio_fingerprint_near_dup",
    oracle=_AFP_ORACLE,
    tags=("extension", "multimodal", "dedup", "audio"),
)
def audio_fingerprint_near_dup(spark, sf_dir):
    """Audio near-duplicate detection by robust fingerprint, completing
    the near-dup triangle (text MinHash/SimHash, image pHash, now
    audio): REAL WAV decode -> 17x5 exact integer band energies ->
    Haitsma-Kalker sign-of-temporal-delta bits -> 64-bit signature as
    four 16-bit bands (operators/multimodal.py:audio_fingerprint_bands)
    -> LSH band equi-join with the >64-member hot-band guard -> exact
    hamming refilter <= 3 (pigeonhole-safe for 4 bands). The fixture
    plants identical-signal pairs (doc 4g vs 4g+1), so the output
    contains every planted pair at hamming 0 plus any chance
    collisions — which the oracle, recomputing the SAME closed forms
    and the SAME band/hot/hamming pipeline in SQL, reproduces exactly.

    Scale: the fingerprint stage is a zero-exchange scan-map; the pair
    stage shuffles only (band, value) keys — the same near-linear
    bucketed shape as every other dedup in the registry."""
    from ..operators.checkpointing import cut_lazy
    from ..operators.multimodal import (
        audio_fingerprint_bands,
        synthesize_dup_wav_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    # the synthesize+decode+fingerprint kernels are the expensive stage
    # and feed THREE consumers (band explode + both hamming join sides):
    # cut lineage so they run once (signatures are 5 longs per doc)
    feats = audio_fingerprint_bands(synthesize_dup_wav_blobs(d)).transform(
        cut_lazy
    )
    bands = feats.select(
        "doc_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("b", "bv"),
    )
    hot = (
        bands.groupBy("b", "bv")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > _AFP_HOT)
        .select("b", "bv")
    )
    bands2 = bands.join(F.broadcast(hot), ["b", "bv"], "left_anti")
    x, y = bands2.alias("x"), bands2.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    fa = feats.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(c).alias(f"a_{c}") for c in ("b0", "b1", "b2", "b3")],
    )
    fb = feats.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(c).alias(f"b_{c}") for c in ("b0", "b1", "b2", "b3")],
    )
    hd = None
    for c in ("b0", "b1", "b2", "b3"):
        t = F.bit_count(F.col(f"a_{c}").bitwiseXOR(F.col(f"b_{c}")))
        hd = t if hd is None else hd + t
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select("doc_a", "doc_b", hd.cast("int").alias("hamming"))
        .where(F.col("hamming") <= _AFP_MAX_HD)
    )


# --- audio resample-to-16k through the kernel gate -----------------------------------

_RESAMPLE_ORACLE = """
WITH d AS (
  SELECT doc_id,
         200 + doc_id % 300 AS n,
         8000 + (doc_id % 4) * 2000 AS sr
  FROM documents
),
mm AS (
  SELECT doc_id, n, sr, ((n - 1) * 16000) // sr + 1 AS m FROM d
),
s AS (
  SELECT doc_id, sr, m,
         list_aggregate(list_transform(
           list_transform(range(0, m), j -> floor(
             (((doc_id * 37 + ((j * sr) // 16000) * 11) % 65536 - 32768)
              + (cast((j * sr) % 16000 AS double) / 16000.0)
                * (((doc_id * 37
                     + least((j * sr) // 16000 + 1, n - 1) * 11)
                    % 65536 - 32768)
                   - ((doc_id * 37 + ((j * sr) // 16000) * 11)
                      % 65536 - 32768))
             ) + 0.5)),
           v -> v * v), 'sum') AS ss
  FROM mm
)
SELECT doc_id,
       cast(sr AS int) AS sr_in,
       cast(16000 AS int) AS sr_out,
       cast(m AS bigint) AS n_out,
       cast(m AS double) / 16000 AS duration_out,
       sqrt((ss / 1073741824.0) / m) AS rms
FROM s
"""


@register(
    "audio_resample_16k",
    oracle=_RESAMPLE_ORACLE,
    tags=("extension", "multimodal", "audio"),
)
def audio_resample_16k(spark, sf_dir):
    """Audio resample-to-16 kHz (round-9): the standard normalization
    step before audio tokenization. Per document a genuine PCM WAV at
    8/10/12/14 kHz (synthesize_wav_blobs' closed-form full-range
    signal) is decoded and UPSAMPLED to 16 kHz by exact-rational linear
    interpolation (operators/multimodal.py:audio_resample_features);
    reported are the resampled length, duration, and RMS.

    Exactness: output position j maps to input idx = (j*sr)//16000 with
    fractional part (j*sr % 16000)/16000 — ONE float64 expression of
    integer inputs with an identical shape on both engines — and the
    interpolated value quantizes through the house floor-form
    round-half-up to an exact int64 (|q| <= 32768) whose squares sum
    exactly (< 2^41); both engines then compute sqrt((ss/2^30)/m).

    Scale: chained mapInPandas over (doc_id, blob) — zero exchanges,
    O(n_out) per blob."""
    from ..operators.multimodal import (
        audio_resample_features,
        synthesize_wav_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    wavs = synthesize_wav_blobs(d)
    return audio_resample_features(wavs, target_sr=16_000)


# --- REAL FLAC decode through the kernel gate ----------------------------------------

_FLAC_ORACLE = """
WITH d AS (
  SELECT doc_id,
         400 + doc_id % 500 AS n,
         8000 + (doc_id % 4) * 2000 AS sr,
         doc_id % 3 AS v
  FROM documents
),
s AS (
  SELECT doc_id, n, sr, v,
         CASE v
           WHEN 0 THEN list_aggregate(list_transform(range(0, n),
             i -> ((abs((i * 3 + doc_id) % 2000 - 1000) - 500) * 30)
                  * ((abs((i * 3 + doc_id) % 2000 - 1000) - 500) * 30)),
             'sum')
           WHEN 1 THEN list_aggregate(list_transform(range(0, n),
             i -> ((doc_id * 37 + i * 11) % 65536 - 32768)
                  * ((doc_id * 37 + i * 11) % 65536 - 32768)), 'sum')
           ELSE n * ((doc_id * 29) % 65536 - 32768)
                  * ((doc_id * 29) % 65536 - 32768)
         END AS ss
  FROM d
)
SELECT doc_id,
       CASE v WHEN 0 THEN 'triangle' WHEN 1 THEN 'noise'
              ELSE 'constant' END AS signal,
       cast(n AS double) / sr AS duration_s,
       cast(sr AS int) AS sample_rate,
       sqrt((cast(ss AS double) / 1073741824.0) / n) AS rms
FROM s
"""


@register(
    "multimodal_flac_decode",
    oracle=_FLAC_ORACLE,
    tags=("extension", "multimodal", "codec", "audio"),
)
def multimodal_flac_decode(spark, sf_dir):
    """REAL FLAC decode end to end (round-9): per document a genuine
    mono 16-bit FLAC — signal class cycling triangle (FIXED-predictor
    subframes), pseudo-noise (VERBATIM / high-parameter Rice), and
    constant (CONSTANT subframes) by doc_id % 3, multiple 512-sample
    frames per stream — is encoded from a closed-form int16 signal
    (operators/multimodal.py:synthesize_flac_blobs), then the
    production audio path (audio_features(decode="real") ->
    operators/flac.py: metadata walk, CRC-8-checked frame headers,
    Rice/fixed-predictor subframe decode, CRC-16 footers, STREAMINFO
    MD5 verification, 16-bit normalization) recovers duration, sample
    rate, and RMS.

    Exactness needs no divisibility argument: FLAC is LOSSLESS, so the
    decoded samples equal the closed form bit for bit; squared samples
    are exact dyadics (t^2 / 2^30, t^2 < 2^31) and the float64 mean is
    the exact integer sum of squares over n (n <= 899, sum < 2^41);
    the oracle recomputes ss in pure SQL and divides in the same order
    (sqrt((ss / 2^30) / n)).

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges, pure scan-map at any scale; FLAC frames are
    independently decodable (self-contained headers + CRCs), the
    property that lets a 100 TB audio corpus split inside files."""
    from ..operators.multimodal import audio_features, synthesize_flac_blobs

    d = read_table(spark, sf_dir, "documents")
    flacs = synthesize_flac_blobs(d)
    feats = audio_features(flacs, decode="real")
    signal = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("triangle"))
        .when(F.col("doc_id") % 3 == 1, F.lit("noise"))
        .otherwise(F.lit("constant"))
    )
    return feats.select(
        "doc_id", signal.alias("signal"), "duration_s", "sample_rate", "rms"
    )


# --- REAL arithmetic-coded JPEG decode through the kernel gate -----------------------

_JPEG_ARITH_ORACLE = """
WITH d AS (
  SELECT doc_id,
         9 + doc_id % 14 AS w,
         9 + doc_id % 10 AS h,
         CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ch
  FROM documents
),
px AS (
  SELECT doc_id, w, h, ch,
         list_aggregate(list_transform(range(0, w * h),
           i -> (doc_id * 41 + ((i % w) // 8) * 11 + ((i // w) // 8) * 17)
                % 256), 'sum') AS s
  FROM d
)
SELECT doc_id, cast(w AS int) AS width, cast(h AS int) AS height,
       ch = 3 AS is_rgb,
       (cast(s * ch AS double) / (w * h * ch)) / 255.0 AS mean_intensity
FROM px
"""


@register(
    "multimodal_jpeg_arith_decode",
    oracle=_JPEG_ARITH_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def multimodal_jpeg_arith_decode(spark, sf_dir):
    """REAL ARITHMETIC-CODED JPEG decode end to end (round-9): per
    document a genuine QM-coded JPEG — SOF9 extended sequential, or
    SOF10 progressive for every third doc_id — with an explicit DAC
    conditioning segment, cycling 444/420/422 subsampling and restart
    markers (QM flush + statistics reset), is encoded from closed-form
    BLOCK-CONSTANT tiles (operators/multimodal.py:
    synthesize_jpeg_arith_blobs), then the production decode path
    (operators/jpeg_arith.py: T.81 Annex D decoder + Annex F/G
    statistical models) recovers dimensions and mean intensity.

    Bit-exactness is the Huffman fixture argument verbatim: arithmetic
    coding replaces only the ENTROPY layer — quantized coefficients are
    identical — and constant tiles carry a lone DC coefficient 8*(v-128)
    with the IJG q75 luma DC step exactly 8. The oracle recomputes tile
    sums in pure SQL and divides in the same order
    ((sum*ch / (w*h*ch)) / 255).

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges, pure scan-map at any scale."""
    from ..operators.multimodal import (
        decode_image_features,
        synthesize_jpeg_arith_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    jpegs = synthesize_jpeg_arith_blobs(d)
    feats = decode_image_features(jpegs, decode="real")
    return feats.select(
        "doc_id",
        "width",
        "height",
        (F.col("doc_id") % 2 == 0).alias("is_rgb"),
        "mean_intensity",
    )


# --- REAL lossless JPEG decode through the kernel gate -------------------------------

_JPEG_LOSSLESS_ORACLE = """
WITH d AS (
  SELECT doc_id,
         8 + doc_id % 15 AS w,
         8 + doc_id % 11 AS h,
         CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ch,
         CASE doc_id % 3 WHEN 0 THEN 256 WHEN 1 THEN 4096 ELSE 65536 END AS p2
  FROM documents
),
px AS (
  SELECT doc_id, w, h, ch, p2,
         list_aggregate(list_transform(range(0, w * h * ch),
           i -> (doc_id * 53 + ((i // ch) % w) * 19
                 + (i // (ch * w)) * 31 + (i % ch) * 7) % p2), 'sum') AS s
  FROM d
)
SELECT doc_id, cast(w AS int) AS width, cast(h AS int) AS height,
       ch = 3 AS is_rgb,
       (cast(s AS double) / (w * h * ch)) / (p2 - 1) AS mean_intensity
FROM px
"""


@register(
    "multimodal_jpeg_lossless_decode",
    oracle=_JPEG_LOSSLESS_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def multimodal_jpeg_lossless_decode(spark, sf_dir):
    """REAL LOSSLESS JPEG decode end to end (round-9): per document a
    genuine SOF3 predictive JPEG — all seven Annex H predictors cycle,
    precision cycles 8/12/16 bits, RGB (coded directly, no color
    transform) for even doc_ids, restart intervals every sixth — is
    encoded from ARBITRARY per-pixel closed forms
    (operators/multimodal.py:synthesize_jpeg_lossless_blobs), then the
    production decode path (operators/jpeg.py:_decode_scan_lossless:
    Huffman difference categories modulo 2^16 with the +32768 special
    case, predictor reconstruction, point transform) recovers
    dimensions and mean intensity normalized by 2^P - 1.

    This is the first IMAGE oracle with non-block-constant pixels: the
    codec is exact by construction, so no quantization-divisibility
    argument is needed. The float argument still holds: the pixel sum
    is < 2^27 so numpy's float64 mean is the exact integer sum over
    w*h*ch, and the oracle divides in the same order
    ((s / (w*h*ch)) / (2^P - 1)).

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges, pure scan-map at any scale."""
    from ..operators.multimodal import (
        decode_image_features,
        synthesize_jpeg_lossless_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    jpegs = synthesize_jpeg_lossless_blobs(d)
    feats = decode_image_features(jpegs, decode="real")
    return feats.select(
        "doc_id",
        "width",
        "height",
        (F.col("doc_id") % 2 == 0).alias("is_rgb"),
        "mean_intensity",
    )


# --- REAL IMA ADPCM WAV decode through the kernel gate -------------------------------


def _adpcm_prefix_sql() -> str:
    """Per-variant SQL list literals of PREFIX SUMS OF SQUARES over the
    fixture's decoded int16 stream — the oracle's closed form. Computed
    here by an INDEPENDENT transcription of the published IMA algorithm
    (own table literals, plain-int loop), not by importing the numpy
    kernel in operators/media_codecs.py; the kernel's tables are pinned
    against the same published values in tests/test_multimodal.py, so a
    shared-constant bug cannot hide on both sides at once."""
    step_table = (
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
        19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
        50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
        130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
        337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
        876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
        5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
        15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    )
    index_table = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
    nb_max = 2 * (75 + 99)  # longest fixture nibble stream
    cases = []
    for v in range(8):
        pred, idx = v * 4111 - 16000, (v * 11) % 89
        prefix, ss = [], 0
        ss += pred * pred  # block-0 header sample
        prefix.append(ss)
        for j in range(nb_max):
            if j and j % 128 == 0:  # block boundary repeats the predictor
                ss += pred * pred
                prefix.append(ss)
            nibble = (j * 7 + v * 5 + 3) % 16
            step = step_table[idx]
            diff = step >> 3
            if nibble & 4:
                diff += step
            if nibble & 2:
                diff += step >> 1
            if nibble & 1:
                diff += step >> 2
            pred = pred - diff if nibble & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + index_table[nibble]))
            ss += pred * pred
            prefix.append(ss)
        lit = "[" + ",".join(str(s) for s in prefix) + "]"
        cases.append(f"WHEN {v} THEN {lit}")
    return "CASE v " + " ".join(cases) + " END"


_ADPCM_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         doc_id % 8 AS v,
         2 * (75 + doc_id % 100) AS nb,
         8000 + (doc_id % 4) * 2000 AS sr
  FROM documents
),
n AS (
  SELECT doc_id, v, sr, nb + (nb + 127) // 128 AS n FROM d
)
SELECT doc_id,
       cast(n AS double) / sr AS duration_s,
       cast(sr AS int) AS sample_rate,
       sqrt((cast(list_extract({_adpcm_prefix_sql()}, n) AS double)
             / 1073741824.0) / n) AS rms
FROM n
"""


@register(
    "multimodal_wav_adpcm_decode",
    oracle=_ADPCM_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def multimodal_wav_adpcm_decode(spark, sf_dir):
    """REAL compressed-audio decode end to end (round-9): per document a
    genuine mono IMA/DVI ADPCM WAV (format 0x11, 4 bits per sample,
    68-byte blocks, fact chunk) is synthesized from closed-form CODE
    nibbles (operators/multimodal.py:synthesize_adpcm_blobs), then the
    production audio path (audio_features(decode="real") ->
    media_codecs.decode_wav -> adpcm_decode: per-block headers, nibble
    cascade, predictor/index clamps, 16-bit normalization) recovers
    duration, sample rate, and RMS.

    Exactness: decoded samples are p/2^15 with |p| <= 32768, so each
    squared sample is an exact dyadic and numpy's float64 mean is the
    exact integer sum of squares over n (n <= 351, sum < 2^39 < 2^53);
    the oracle looks the per-variant PREFIX sum of squares up in a
    351-entry list literal generated by an independent transcription of
    the published IMA algorithm, and divides in the same order
    (sqrt((ss / 2^30) / n)) with IEEE-correctly-rounded sqrt on both
    engines.

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges, pure scan-map at any scale; ADPCM blocks are
    independently decodable (each carries its own state header), which
    is exactly the property that lets a 100 TB audio corpus split
    inside files."""
    from ..operators.multimodal import audio_features, synthesize_adpcm_blobs

    d = read_table(spark, sf_dir, "documents")
    wavs = synthesize_adpcm_blobs(d)
    feats = audio_features(wavs, decode="real")
    return feats.select("doc_id", "duration_s", "sample_rate", "rms")


# --- REAL 12-bit JPEG decode through the kernel gate ---------------------------------

_JPEG12_ORACLE = """
WITH d AS (
  SELECT doc_id,
         9 + doc_id % 16 AS w,
         9 + doc_id % 12 AS h,
         CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ch
  FROM documents
),
px AS (
  SELECT doc_id, w, h, ch,
         list_aggregate(list_transform(range(0, w * h),
           i -> (doc_id * 97 + ((i % w) // 8) * 29 + ((i // w) // 8) * 53)
                % 4096), 'sum') AS s
  FROM d
)
SELECT doc_id, cast(w AS int) AS width, cast(h AS int) AS height,
       ch = 3 AS is_rgb,
       (cast(s * ch AS double) / (w * h * ch)) / 4095.0 AS mean_intensity
FROM px
"""


@register(
    "multimodal_jpeg12_decode",
    oracle=_JPEG12_ORACLE,
    tags=("extension", "multimodal", "codec"),
)
def multimodal_jpeg12_decode(spark, sf_dir):
    """REAL 12-BIT JPEG decode end to end (round-8): per document a
    genuine extended-sequential (SOF1) or progressive (SOF2) 12-bit
    JPEG — 16-bit DQT entries, level shift 2048, flat 12-bit Huffman
    tables, cycling 444/420/422 subsampling, restart markers, and
    progressive scan scripts exactly like the 8-bit fixture mix — is
    encoded from closed-form BLOCK-CONSTANT tiles in 0..4095
    (operators/multimodal.py:synthesize_jpeg12_blobs), then the
    production decode path recovers dimensions and mean intensity
    normalized by the SOF-precision sample range (4095, via
    operators/jpeg.py:jpeg_precision — not the uint16 dtype max).

    Bit-exactness carries over from the 8-bit argument: constant tiles
    have a lone DC coefficient 8*(v-2048) and the IJG q75 luminance DC
    step is exactly 8. The oracle recomputes tile sums in pure SQL and
    divides in the same order ((sum*ch / (w*h*ch)) / 4095).

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges, pure scan-map at any scale."""
    from ..operators.multimodal import (
        decode_image_features,
        synthesize_jpeg12_blobs,
    )

    d = read_table(spark, sf_dir, "documents")
    jpegs = synthesize_jpeg12_blobs(d)
    feats = decode_image_features(jpegs, decode="real")
    return feats.select(
        "doc_id",
        "width",
        "height",
        (F.col("doc_id") % 2 == 0).alias("is_rgb"),
        "mean_intensity",
    )


# --- REAL WAV decode through the kernel gate ----------------------------------------

_WAV_REAL_ORACLE = """
WITH d AS (
  SELECT doc_id,
         200 + doc_id % 300 AS n,
         8000 + (doc_id % 4) * 2000 AS sr
  FROM documents
),
s AS (
  SELECT doc_id, n, sr,
         list_aggregate(list_transform(range(0, n),
           i -> ((doc_id * 37 + i * 11) % 65536 - 32768)
                * ((doc_id * 37 + i * 11) % 65536 - 32768)), 'sum') AS ss
  FROM d
)
SELECT doc_id,
       floor(cast(n AS double) / sr * 1000000 + 0.5) / 1000000 AS duration_s,
       cast(sr AS int) AS sample_rate,
       floor(sqrt((cast(ss AS double) / 1073741824.0) / n) * 1000000 + 0.5)
         / 1000000 AS rms
FROM s
"""


@register(
    "multimodal_wav_decode",
    oracle=_WAV_REAL_ORACLE,
    tags=("extension", "multimodal", "codec", "audio"),
)
def multimodal_wav_decode(spark, sf_dir):
    """REAL audio decode end to end, the WAV twin of multimodal_png_decode:
    per document a genuine PCM-16 WAV of a closed-form full-range signal
    (operators/multimodal.py:synthesize_wav_blobs — per-doc frame count
    AND sample rate vary, so the duration arithmetic cannot pass by
    accident), then the production real path (audio_features(
    decode="real") -> media_codecs.decode_wav: RIFF container via stdlib
    ``wave``, int16 -> [-1, 1] normalization) recovers duration, the
    container sample rate, and RMS. The oracle recomputes the expected
    sum of squares from the closed form in pure SQL.

    Exactness: sample squares are exact integers; their float64 sum is
    exact (< 2^53); mean and sqrt are single correctly-rounded ops with
    identical expression shape in both engines (np.sqrt, never pow);
    both sides quantize to 1e-6 with the floor-form round.

    Scale: two chained mapInPandas stages over (doc_id, blob); payloads
    drop before the result projection; kernels are per-blob O(frames)."""
    from ..functions.numeric import round_half_up
    from ..operators.multimodal import audio_features, synthesize_wav_blobs

    d = read_table(spark, sf_dir, "documents")
    wavs = synthesize_wav_blobs(d)
    feats = audio_features(wavs, decode="real")
    return feats.select(
        "doc_id",
        round_half_up(F.col("duration_s"), 6).alias("duration_s"),
        "sample_rate",
        round_half_up(F.col("rms"), 6).alias("rms"),
    )


# --- REAL MP4 container probe through the kernel gate -------------------------------

_MP4_ORACLE = """
WITH d AS (
  SELECT doc_id,
         500 + doc_id % 5000 AS dur,
         1 + doc_id % 3 AS nt
  FROM documents
),
t AS (
  SELECT doc_id, dur, nt, unnest(range(0, nt)) AS k FROM d
)
SELECT doc_id,
       cast(dur AS double) / 1000 AS duration_s,
       cast(nt AS int) AS n_tracks,
       cast(k + 1 AS int) AS track_id,
       CASE WHEN k % 2 = 0 THEN 'vide' ELSE 'soun' END AS handler,
       cast(1000 + (doc_id * 7 + k * 13) % 100000 AS double)
         / (600 + 100 * ((doc_id + k) % 4)) AS track_seconds
FROM t
"""


@register(
    "multimodal_mp4_probe",
    oracle=_MP4_ORACLE,
    tags=("extension", "multimodal", "codec", "video"),
)
def multimodal_mp4_probe(spark, sf_dir):
    """REAL ISO-BMFF container parse end to end — the video-metadata
    sibling of the PNG/WAV/JPEG codec queries: per document a
    structurally valid metadata-only MP4 is built from closed-form
    fields (operators/multimodal.py:synthesize_mp4_blobs — 64-bit
    version-1 mvhd/mdhd time boxes every fifth document, 1-3 tracks of
    alternating vide/soun handlers with per-track media timescales),
    then the production probe path (probe_media_containers ->
    operators/mp4.py:parse_mp4: box-tree walk, ftyp/mvhd/tkhd/mdhd/hdlr
    extraction across both version layouts) recovers the movie duration
    and one row per track. The oracle recomputes every field from the
    closed form in pure SQL, so a box-offset or version-width defect
    shifts durations/handlers and fails the hash.

    Exactness: every numeric output is ONE IEEE division of exactly-
    representable integers (python int/int and DuckDB double/int agree
    bit-for-bit); per-track rows avoid cross-track float summation.

    Scale: two chained mapInPandas stages over (doc_id, blob) — zero
    exchanges; the probe is the demux-free metadata half of a video
    pipeline (corpus selection by duration/track mix before any frame
    decode, which remains the declared ffmpeg boundary)."""
    from ..operators.multimodal import probe_media_containers, synthesize_mp4_blobs

    d = read_table(spark, sf_dir, "documents")
    mp4s = synthesize_mp4_blobs(d)
    return probe_media_containers(mp4s)


# --- REAL perceptual hash through the kernel gate -----------------------------------

_PHASH_REAL_BANDS = ",\n       ".join(
    f"cast(list_aggregate(list_transform(range(0, 16),"
    f" i -> CASE WHEN cl[{b} * 16 + i + 1] * 64 > s THEN 1 << i ELSE 0 END),"
    f" 'sum') AS int) AS b{b}"
    for b in range(4)
)

_PHASH_REAL_ORACLE = f"""
WITH d AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 11 AS h,
         CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ch
  FROM documents
),
cells AS (
  SELECT doc_id,
         list_transform(range(0, 64),
           k -> list_aggregate(list_transform(range(0, ch),
                  c -> (doc_id * 31 + ((k % 8) * w // 8) * 7
                        + ((k // 8) * h // 8) * 13 + c * 101) % 256), 'sum')) AS cl
  FROM d
),
h AS (SELECT doc_id, cl, list_aggregate(cl, 'sum') AS s FROM cells)
SELECT doc_id,
       {_PHASH_REAL_BANDS}
FROM h
"""


@register(
    "multimodal_phash_real",
    oracle=_PHASH_REAL_ORACLE,
    tags=("extension", "multimodal", "codec", "dedup"),
)
def multimodal_phash_real(spark, sf_dir):
    """Perceptual average-hash over REAL decoded pixels: synthesized PNGs
    (closed-form pattern, all five scanline filters) -> production real
    path (decode_png -> nearest-neighbor 8x8 resize -> per-pixel channel
    sums -> exact-integer mean threshold) -> four 16-bit hash bands per
    image. The oracle replays decode+resize+threshold as pure SQL index
    arithmetic over the closed-form pixels — every band bit is value-
    checked, so a defect anywhere in the decode/resize/threshold chain
    flips bits and fails the hash. Complements multimodal_phash_near_dup
    (which gates the banded JOIN shape on fake cells): together they
    cover signature computation on real pixels and pair generation.

    Scale: two mapInPandas stages over (doc_id, blob); signatures are 4
    ints per image — the join-ready LSH layout (pigeonhole: hamming <= 3
    over 4 bands guarantees a shared band for the downstream equi-join).
    """
    from ..operators.multimodal import image_phash_bands, synthesize_png_blobs

    d = read_table(spark, sf_dir, "documents")
    pngs = synthesize_png_blobs(d)
    return image_phash_bands(pngs, decode="real")


# --- Ogg container page walk through the kernel gate ----------------------------------

_OGG_ORACLE = """
WITH p AS (
  SELECT doc_id,
         6 + doc_id % 5 AS n_audio,
         doc_id % 2 = 0 AS is_vorbis,
         doc_id % 3 AS layout
  FROM documents
)
SELECT doc_id,
       CASE WHEN is_vorbis THEN 'vorbis' ELSE 'opus' END AS codec,
       cast(1 + doc_id % 2 AS int) AS channels,
       cast(CASE WHEN is_vorbis
                 THEN [8000, 16000, 22050, 44100, 48000][doc_id % 5 + 1]
                 ELSE 48000 END AS int) AS sample_rate,
       cast(2 + CASE layout WHEN 0 THEN (n_audio + 2) // 3
                            WHEN 1 THEN (n_audio + 1) // 2
                            ELSE n_audio + 1 END AS int) AS n_pages,
       cast(n_audio + CASE WHEN is_vorbis THEN 3 ELSE 2 END AS int)
         AS n_packets,
       cast(doc_id % 4 AS int) AS n_comments,
       cast(13 AS int) AS vendor_chars,
       cast(list_aggregate(list_transform(range(0, n_audio),
              j -> 260 + (doc_id * 13 + j * 37) % 360), 'sum') AS bigint)
         AS payload_bytes,
       cast(CASE WHEN is_vorbis
                 THEN 320 * n_audio * 1000
                      // [8000, 16000, 22050, 44100, 48000][doc_id % 5 + 1]
                 ELSE 20 * n_audio END AS bigint) AS duration_ms,
       true AS has_eos
FROM p
"""


@register(
    "ogg_pages_report",
    oracle=_OGG_ORACLE,
    tags=("extension", "multimodal", "audio", "codec"),
)
def ogg_pages_report(spark, sf_dir):
    """Ogg container page walk end to end (round-11) — the audio-corpus
    front door next to multimodal_mp4_probe: real podcast/speech shards
    arrive as Ogg/Opus and Ogg/Vorbis, and triage needs page structure,
    codec identity, and duration WITHOUT decoding audio. Per document a
    genuine single-stream Ogg file (operators/ogg.py:build_ogg — pages
    with spec-exact lacing tables and the RFC 3533 non-reflected
    CRC-32, Vorbis id/comment/setup or RFC 7845 OpusHead/OpusTags
    headers) of 6 + doc_id % 5 audio packets, each > 255 bytes so
    multi-segment lacing is always live, page layout cycling by
    doc_id % 3 (3 packets/page, 2 packets/page, or a packet SPANNING
    two pages via terminal-255 lacing + the continued flag) is walked
    page by page: every capture pattern, version byte, CRC, sequence
    number, and continued flag validated; packets reassembled from
    lacing values; codec headers parsed; the duration derived from the
    final granule position in exact integer math (Opus: 48 kHz samples
    minus pre-skip per RFC 7845 section 4).

    The report columns are all closed forms the oracle recomputes —
    n_pages per layout arm gates the page-split arithmetic itself, and
    payload_bytes (a sum over per-packet lengths) gates the lacing
    reassembly byte-for-byte. Audio decode (Vorbis MDCT, Opus
    SILK+CELT) is the declared boundary, same as MP3.

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges — files parse independently, the WARC/PDF shape."""
    from ..operators.ogg import ogg_pages_features, synthesize_ogg_blobs

    d = read_table(spark, sf_dir, "documents")
    return ogg_pages_features(synthesize_ogg_blobs(d))


# --- Matroska/WebM EBML probe through the kernel gate ----------------------------------

_MKV_ORACLE = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'webm' ELSE 'matroska' END AS doc_type,
       cast(1000 + (doc_id * 37) % 60000 AS bigint) AS duration_ms,
       'writer-' || doc_id AS writing_app,
       cast(CASE WHEN doc_id % 7 = 0 THEN 1
                 WHEN doc_id % 5 = 0 THEN 1
                 ELSE 2 END AS int) AS n_tracks,
       CASE WHEN doc_id % 7 = 0 THEN ''
            ELSE ['V_VP8', 'V_VP9', 'V_AV1'][doc_id % 3 + 1]
            END AS video_codec,
       cast(CASE WHEN doc_id % 7 = 0 THEN 0
                 ELSE 320 + 16 * (doc_id % 8) END AS int) AS width,
       cast(CASE WHEN doc_id % 7 = 0 THEN 0
                 ELSE 240 + 16 * (doc_id % 5) END AS int) AS height,
       CASE WHEN doc_id % 7 <> 0 AND doc_id % 5 = 0 THEN ''
            WHEN doc_id % 2 = 0 THEN 'A_OPUS'
            ELSE 'A_VORBIS' END AS audio_codec,
       cast(CASE WHEN doc_id % 7 <> 0 AND doc_id % 5 = 0 THEN 0
                 ELSE 1 + doc_id % 2 END AS int) AS channels,
       cast(CASE WHEN doc_id % 7 <> 0 AND doc_id % 5 = 0 THEN 0
                 ELSE 48000 END AS int) AS sampling_hz,
       cast(1 + doc_id % 4 AS int) AS n_clusters,
       cast(40 * (doc_id % 4) AS bigint) AS last_cluster_ms,
       cast(2 * (1 + doc_id % 4) AS int) AS n_blocks
FROM documents
"""


@register(
    "mkv_probe_report",
    oracle=_MKV_ORACLE,
    tags=("extension", "multimodal", "video", "codec"),
)
def mkv_probe_report(spark, sf_dir):
    """Matroska/WebM container probe end to end (round-11) — the
    web-video container next to multimodal_mp4_probe and
    multimodal_avi_frames: WebM is what WARC piles actually contain.
    Per document a spec-shaped EBML file (operators/mkv.py:build_mkv)
    — EBML header with DocType, Segment with Info (TimestampScale,
    integral Duration float, WritingApp), video / audio / both
    TrackEntries (codec ids, pixel dimensions, channels, 48 kHz
    sampling float), and 1 + doc_id % 4 Clusters of 2 SimpleBlocks —
    is walked by the real EBML grammar: variable-size integers
    (marker-kept ids, marker-stripped sizes), every child size
    validated against its parent, unknown ids skipped by size (the
    spec's extensibility rule), and the streamed unknown-size layouts
    accepted exactly where the specs allow them — unknown-size Segment
    (every fourth document) and unknown-size Clusters bounded by the
    first non-Cluster-child id (every fourth other, the MediaRecorder
    shape; RFC 9559). Frame decode (VP8/VP9/AV1/H.264) stays the
    declared boundary.

    Every report column is a closed form the oracle recomputes —
    including the track-layout CASE arms (audio-only every seventh
    document, video-only every fifth other), so a walk that mistook
    an audio strf... (AVI lesson) or misattributed a track type flips
    the hash.

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges — files probe independently, the WARC/PDF shape."""
    from ..operators.mkv import mkv_probe_features, synthesize_mkv_blobs

    d = read_table(spark, sf_dir, "documents")
    return mkv_probe_features(synthesize_mkv_blobs(d))


# --- WebP container probe through the kernel gate --------------------------------------

_WEBP_ORACLE = """
SELECT doc_id,
       ['vp8', 'vp8l', 'vp8x'][doc_id % 3 + 1] AS format,
       CASE WHEN doc_id % 3 = 1 THEN 'vp8l'
            WHEN doc_id % 3 = 2 AND doc_id % 4 = 0 THEN 'vp8l'
            ELSE 'vp8' END AS codec,
       cast(16 + doc_id % 300 AS int) AS width,
       cast(16 + doc_id % 200 AS int) AS height,
       (doc_id % 3 = 1 AND doc_id % 2 = 1)
         OR (doc_id % 3 = 2 AND doc_id % 2 = 1) AS has_alpha,
       doc_id % 3 = 2 AND doc_id % 2 = 0 AS is_animated,
       cast(CASE WHEN doc_id % 3 = 2 AND doc_id % 2 = 0
                 THEN 1 + doc_id % 4 ELSE 1 END AS int) AS n_frames,
       cast(CASE WHEN doc_id % 3 = 2 AND doc_id % 2 = 0
                 THEN 40 * (1 + doc_id % 4) ELSE 0 END AS bigint)
         AS total_duration_ms,
       doc_id % 3 = 2 AND doc_id % 7 = 0 AS has_icc,
       doc_id % 3 = 2 AND doc_id % 5 = 0 AS has_exif,
       doc_id % 3 = 2 AND doc_id % 11 = 0 AS has_xmp,
       cast(CASE WHEN doc_id % 3 = 2 THEN
              1 + cast(doc_id % 7 = 0 AS int) + cast(doc_id % 5 = 0 AS int)
                + cast(doc_id % 11 = 0 AS int)
                + CASE WHEN doc_id % 2 = 0 THEN 2 + doc_id % 4 ELSE 2 END
            ELSE 1 END AS int) AS n_chunks
FROM documents
"""


@register(
    "webp_probe_report",
    oracle=_WEBP_ORACLE,
    tags=("extension", "multimodal", "image", "codec"),
)
def webp_probe_report(spark, sf_dir):
    """WebP container probe end to end (round-11) — after JPEG/PNG/GIF
    the image format a web crawl actually contains: per document a
    spec-shaped container (operators/webp.py:build_webp) cycling the
    three top-level layouts — simple lossy VP8 (RFC 6386 keyframe
    header: frame tag, 9D 01 2A start code, 14-bit dims), simple
    lossless VP8L (signature byte + packed dims/alpha/version), and
    extended VP8X (flags + u24 canvas, ICCP / ANIM+ANMF frames /
    ALPH+still / EXIF / XMP in spec order, RIFF even-padding
    exercised by odd-size metadata) — walked by the real RIFF chunk
    grammar: sizes validated, unknown chunks skipped, and VP8X flags
    cross-checked against the chunks actually present (a flag
    promising an absent chunk raises — lying layout flags are how
    image parsers get exploited). Pixel decode (VP8/VP8L entropy
    coding) stays the declared boundary, like H.264 in the MP4 probe.

    Every column is a closed form the oracle recomputes — including
    the n_chunks arithmetic per layout arm and the per-frame duration
    sum, so a walk that miscounted padding or swallowed a frame flips
    the hash.

    Scale: two chained mapInPandas stages over an id spine, zero
    exchanges — the WARC/PDF shape."""
    from ..operators.webp import synthesize_webp_blobs, webp_probe_features

    d = read_table(spark, sf_dir, "documents")
    return webp_probe_features(synthesize_webp_blobs(d))
