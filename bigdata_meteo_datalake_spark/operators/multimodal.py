"""Multimodal columns (SURVEY.md section 2.7): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched Pandas
functions over mapInPandas.

The container has no PIL/ffmpeg, so ``decode=fake`` produces deterministic
features derived from the bytes (the Spark-side plumbing — schema, batch
iteration, partition sizing — is real and tested either way).
``decode=real`` now genuinely decodes the formats expressible with
stdlib+numpy — BMP (truecolor/palette/RLE8), PNG at every legal IHDR
combination (+ tRNS), JPEG in five coding processes (SOF0/SOF1/SOF2
Huffman, SOF9/SOF10 QM arithmetic, SOF3 lossless; 8/12/16-bit;
444/422/440/420/411), GIF (animated, LZW), TIFF (both byte orders,
strips, PackBits), WAV (PCM + G.711 mu-law/A-law + IMA ADPCM), FLAC,
and AVI/MJPEG video (real demux + per-frame decode) — and raises
NotImplementedError only for formats that truly need a codec library
(MP4/H.264 video decode, MP3, LZW-in-TIFF), sniffed by magic bytes per
blob.

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
RESIZED_SCHEMA = "doc_id long, blob binary, width int, height int"
AUDIO_FEATURES_SCHEMA = (
    "doc_id long, duration_s double, sample_rate int, rms double"
)


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


def synthesize_png_blobs(df: DataFrame) -> DataFrame:
    """Deterministic real-PNG source for the real-decode path: for each
    ``doc_id`` emit (doc_id, blob) where blob is an actual 8-bit PNG
    (media_codecs.encode_png) of a closed-form pixel pattern —

      w = 4 + doc_id % 13,  h = 4 + doc_id % 11,
      RGB when doc_id is even else grayscale,
      value(x, y, c) = (doc_id*31 + x*7 + y*13 + c*101) % 256,

    encoded with the per-row filter cycle (row y uses scanline filter
    y % 5), so decoding exercises every unfilter path on every image;
    every fifth document writes Adam7 INTERLACED (seven independently
    filtered passes), so the de-interlacing path sits under the oracle
    hash too. Every third EVEN document writes PALETTE-indexed (color
    type 3): the closed form makes each pixel's color a pure function of
    its R value, so a 256-entry PLTE pal[i] = (i, (i+101)%256,
    (i+202)%256) with the R plane as indices decodes to EXACTLY the same
    RGB image — palette expansion sits under the same oracle hash with
    zero oracle change (and did % 30 == 0 combines palette WITH Adam7).
    The closed form is what makes the REAL decode oracle-checkable: a
    SQL engine can recompute the expected pixel sums without a codec.
    Runs as an Arrow-batched mapInPandas kernel — the same distribution
    shape a real object-store media scan would have."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .media_codecs import encode_png

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = 4 + did % 13, 4 + did % 11
                ch = 3 if did % 2 == 0 else 1
                v = (
                    did * 31
                    + np.arange(w)[None, :, None] * 7
                    + np.arange(h)[:, None, None] * 13
                    + np.arange(ch)[None, None, :] * 101
                ) % 256
                arr = v.astype(np.uint8)
                if ch == 1:
                    arr = arr[:, :, 0]
                if ch == 3 and did % 3 == 0:
                    # color-type-3 twin of the same pixels: R determines
                    # the full color, so pal[R] reproduces (R, G, B)
                    i = np.arange(256, dtype=np.int64)
                    pal = np.stack(
                        [i, (i + 101) % 256, (i + 202) % 256], axis=1
                    ).astype(np.uint8)
                    blob = encode_png(
                        arr[:, :, 0],
                        filter_type="cycle",
                        interlace=did % 5 == 0,
                        palette=pal,
                    )
                else:
                    blob = encode_png(
                        arr,
                        filter_type="cycle",
                        interlace=did % 5 == 0,
                    )
                out["doc_id"].append(did)
                out["blob"].append(blob)
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def synthesize_bmp_blobs(df: DataFrame) -> DataFrame:
    """Deterministic real-BMP source cycling the format's three layouts
    (doc_id % 3): 24-bit truecolor, 8-bit palette uncompressed, 8-bit
    palette RLE8-compressed. Same closed form as the PNG fixture —

      w = 4 + doc_id % 13,  h = 4 + doc_id % 11,
      value(x, y, c) = (doc_id*31 + x*7 + y*13 + c*101) % 256

    — with the palette trick (color a pure function of the R value, so
    the index plane is the R plane and pal[i] = (i, (i+101)%256,
    (i+202)%256)): all three layouts decode to the IDENTICAL RGB image,
    letting a single SQL oracle value-check truecolor rows, color-table
    expansion, and the RLE run/escape machinery at once
    (queries/ext_multimodal.py:multimodal_bmp_decode)."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .media_codecs import encode_bmp, encode_bmp_palette

        i = np.arange(256, dtype=np.int64)
        pal = np.stack([i, (i + 101) % 256, (i + 202) % 256], axis=1).astype(
            np.uint8
        )
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = 4 + did % 13, 4 + did % 11
                r = (
                    did * 31
                    + np.arange(w)[None, :] * 7
                    + np.arange(h)[:, None] * 13
                ) % 256
                idx = r.astype(np.uint8)
                mode = did % 3
                if mode == 0:
                    blob = encode_bmp(pal[idx])
                elif mode == 1:
                    blob = encode_bmp_palette(idx, pal, rle=False)
                else:
                    blob = encode_bmp_palette(idx, pal, rle=True)
                out["doc_id"].append(did)
                out["blob"].append(blob)
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def synthesize_tiff_blobs(df: DataFrame) -> DataFrame:
    """Deterministic real-TIFF source (the scanned-document staple),
    cycling byte order, compression, and strip layout: for each
    ``doc_id`` emit (doc_id, blob) where blob is a genuine classic TIFF
    of the SAME closed-form pixels as the PNG fixture —

      w = 4 + doc_id % 13,  h = 4 + doc_id % 11,
      RGB when doc_id is even else grayscale,
      value(x, y, c) = (doc_id*31 + x*7 + y*13 + c*101) % 256,
      byte order: II when doc_id % 4 < 2 else MM,
      compression: PackBits when doc_id % 3 == 0 else none,
      strips: rows_per_strip=3 when doc_id % 5 == 0 else single-strip

    — so one SQL oracle value-checks IFD parsing in both byte orders,
    multi-strip reassembly, and PackBits expansion at once
    (queries/ext_multimodal.py:multimodal_tiff_decode)."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .media_codecs import encode_tiff

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = 4 + did % 13, 4 + did % 11
                ch = 3 if did % 2 == 0 else 1
                v = (
                    did * 31
                    + np.arange(w)[None, :, None] * 7
                    + np.arange(h)[:, None, None] * 13
                    + np.arange(ch)[None, None, :] * 101
                ) % 256
                arr = v.astype(np.uint8)
                if ch == 1:
                    arr = arr[:, :, 0]
                out["doc_id"].append(did)
                out["blob"].append(
                    encode_tiff(
                        arr,
                        byteorder="<" if did % 4 < 2 else ">",
                        packbits=did % 3 == 0,
                        rows_per_strip=3 if did % 5 == 0 else None,
                    )
                )
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def synthesize_png_depth_blobs(df: DataFrame) -> DataFrame:
    """Deterministic real-PNG source sweeping BIT DEPTH, the depth twin
    of :func:`synthesize_png_blobs`: for each ``doc_id`` emit
    (doc_id, blob) where blob is a genuine grayscale PNG at

      depth = (1, 2, 4, 8, 16)[doc_id % 5],
      w = 4 + doc_id % 13,  h = 4 + doc_id % 11,
      raw value v(x, y) = (doc_id*31 + x*7 + y*13) % 2^depth,

    per-row filter cycle (every unfilter path at every depth), Adam7
    interlaced when doc_id % 4 == 0 (co-prime with the depth cycle, so
    every (depth, interlace) pair occurs). Decoding scales sub-byte
    gray by exactly 255/(2^d - 1) and returns uint16 for depth 16, so
    the SQL oracle recomputes the expected sums from the closed form
    with integer arithmetic only
    (queries/ext_multimodal.py:multimodal_png_depths_decode)."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .media_codecs import encode_png

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                depth = (1, 2, 4, 8, 16)[did % 5]
                w, h = 4 + did % 13, 4 + did % 11
                v = (
                    did * 31
                    + np.arange(w)[None, :] * 7
                    + np.arange(h)[:, None] * 13
                ) % (1 << depth)
                arr = v.astype(np.uint16 if depth == 16 else np.uint8)
                out["doc_id"].append(did)
                out["blob"].append(
                    encode_png(
                        arr,
                        filter_type="cycle",
                        interlace=did % 4 == 0,
                        depth=depth if depth < 16 else None,
                    )
                )
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def synthesize_gif_blobs(df: DataFrame) -> DataFrame:
    """Deterministic real-GIF source, the ANIMATED twin of
    :func:`synthesize_png_blobs`: for each ``doc_id`` emit
    (doc_id, blob) where blob is a genuine GIF89a animation of

      n_frames = 1 + doc_id % 4,
      w = 5 + doc_id % 12,  h = 5 + doc_id % 9,
      index(x, y, frame) = (doc_id*31 + x*7 + y*13 + frame*59) % 256,
      palette pal[i] = (i, (i+101) % 256, (i+202) % 256),
      per-frame delay = 4 + doc_id % 11 centiseconds,
      every fifth document INTERLACED,

    real LZW-compressed. The closed form is what makes the REAL
    multi-frame decode oracle-checkable
    (queries/ext_multimodal.py:multimodal_gif_frames). Runs as an
    Arrow-batched mapInPandas kernel like the PNG/JPEG/WAV twins."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .gif import encode_gif

        i = np.arange(256, dtype=np.int64)
        pal = np.stack([i, (i + 101) % 256, (i + 202) % 256], axis=1).astype(
            np.uint8
        )
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                nf = 1 + did % 4
                w, h = 5 + did % 12, 5 + did % 9
                x = np.arange(w)[None, None, :]
                y = np.arange(h)[None, :, None]
                k = np.arange(nf)[:, None, None]
                idx = ((did * 31 + x * 7 + y * 13 + k * 59) % 256).astype(
                    np.uint8
                )
                out["doc_id"].append(did)
                out["blob"].append(
                    encode_gif(
                        idx,
                        pal,
                        delays=[4 + did % 11] * nf,
                        interlace=did % 5 == 0,
                    )
                )
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


GIF_FRAME_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, delay_cs int, "
    "mean_intensity double"
)


def gif_frame_features(df: DataFrame) -> DataFrame:
    """REAL per-frame decode over (doc_id, blob) GIF animations: one row
    PER FRAME with dimensions, the frame's graphic-control delay, and
    its mean intensity — the demux+decode half of a video pipeline
    (frame-level features before any model sees pixels), feasible here
    because GIF needs no ffmpeg. Non-GIF blobs raise at the codec gate."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from .media_codecs import decode_gif, sniff_format

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "width": [], "height": [],
                   "delay_cs": [], "mean_intensity": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                if sniff_format(b) != "gif":
                    raise NotImplementedError(
                        "real frame decode beyond GIF needs ffmpeg/pyav "
                        "(not in this container)"
                    )
                frames, delays = decode_gif(b)
                for fi in range(frames.shape[0]):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(fi)
                    out["width"].append(frames.shape[2])
                    out["height"].append(frames.shape[1])
                    out["delay_cs"].append(delays[fi])
                    # float64 mean of uint8 samples: exact sum / count
                    out["mean_intensity"].append(
                        float(frames[fi].mean()) / 255.0
                    )
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, GIF_FRAME_SCHEMA)


AVI_FRAME_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, usec_per_frame int, "
    "mean_intensity double"
)


def avi_frame_features(df: DataFrame) -> DataFrame:
    """REAL per-frame decode over (doc_id, blob) AVI/MJPEG videos: one
    row PER FRAME with dimensions, the container frame duration, and
    the frame's mean intensity — genuine video demux + frame decode
    with no ffmpeg (operators/avi.py: RIFF walk + the full JPEG codec).
    Non-AVI blobs raise at the codec gate."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from .avi import decode_avi_mjpeg
        from .media_codecs import sniff_format

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "width": [], "height": [],
                   "usec_per_frame": [], "mean_intensity": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                if sniff_format(b) != "avi":
                    raise NotImplementedError(
                        "real video frame decode beyond AVI/MJPEG and GIF "
                        "needs ffmpeg/pyav (not in this container)"
                    )
                frames, usec = decode_avi_mjpeg(b)
                for fi in range(frames.shape[0]):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(fi)
                    out["width"].append(frames.shape[2])
                    out["height"].append(frames.shape[1])
                    out["usec_per_frame"].append(usec)
                    # float64 mean of uint8 samples: exact sum / count
                    out["mean_intensity"].append(
                        float(frames[fi].mean()) / 255.0
                    )
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, AVI_FRAME_SCHEMA)


def synthesize_avi_blobs(df: DataFrame) -> DataFrame:
    """Deterministic real-AVI/MJPEG source: for each ``doc_id`` emit
    (doc_id, blob) where blob is a genuine AVI whose MJPEG frames are
    BLOCK-CONSTANT JPEGs (bit-exact at q75, the house fixture trick) —

      n_frames = 1 + doc_id % 4,   w = 9 + doc_id % 16,  h = 9 + doc_id % 12,
      usec_per_frame = 40000 + doc_id % 1000,
      frame k tile v(bx, by) = (doc_id*31 + bx*7 + by*13 + k*59) % 256
      (grayscale; every third document's frames are RGB with R=G=B),

    so the per-frame mean intensity is a pure function the SQL oracle
    recomputes (queries/ext_multimodal.py:multimodal_avi_frames)."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .avi import encode_avi_mjpeg
        from .jpeg import encode_jpeg

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                nf = 1 + did % 4
                w, h = 9 + did % 16, 9 + did % 12
                bx = np.arange(w)[None, :] // 8
                by = np.arange(h)[:, None] // 8
                frames = []
                for k in range(nf):
                    arr = ((did * 31 + bx * 7 + by * 13 + k * 59) % 256
                           ).astype(np.uint8)
                    if did % 3 == 0:
                        arr = np.stack([arr, arr, arr], axis=2)
                    frames.append(encode_jpeg(arr))
                out["doc_id"].append(did)
                out["blob"].append(
                    encode_avi_mjpeg(
                        frames, w, h,
                        usec_per_frame=40_000 + did % 1000,
                    )
                )
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def synthesize_exif_jpeg_blobs(df: DataFrame) -> DataFrame:
    """Deterministic camera-style JPEG source: block-constant tiles
    (w = 9 + doc_id % 16, h = 9 + doc_id % 12, tile value
    (doc_id*43 + bx*17 + by*23) % 256, grayscale) with an APP1 Exif
    segment attached — orientation 1 + doc_id % 8 (all eight), make
    'Cam{doc_id % 3}', pixel dims, little-endian TIFF for even doc_ids
    and BIG-endian for odd — the phone-photo shape an image pipeline
    must auto-rotate (queries/ext_multimodal.py:multimodal_exif_report)."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .exif import attach_exif
        from .jpeg import encode_jpeg

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = 9 + did % 16, 9 + did % 12
                bx = np.arange(w)[None, :] // 8
                by = np.arange(h)[:, None] // 8
                arr = ((did * 43 + bx * 17 + by * 23) % 256).astype(np.uint8)
                out["doc_id"].append(did)
                out["blob"].append(
                    attach_exif(
                        encode_jpeg(arr),
                        orientation=1 + did % 8,
                        make=f"Cam{did % 3}",
                        pixel_x=w,
                        pixel_y=h,
                        byte_order="<" if did % 2 == 0 else ">",
                    )
                )
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


EXIF_FEATURES_SCHEMA = (
    "doc_id long, orientation int, make string, width int, height int, "
    "mean_intensity double"
)


def image_exif_features(df: DataFrame) -> DataFrame:
    """EXIF-aware image features: parse the APP1 metadata, decode the
    pixels, APPLY THE ORIENTATION (the auto-rotate every camera-image
    pipeline needs), and report the oriented dimensions + mean
    intensity — (doc_id, orientation, make, width, height,
    mean_intensity) via mapInPandas."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from .exif import apply_exif_orientation, parse_exif
        from .media_codecs import decode_jpeg, sniff_format

        for pdf in batches:
            out = {"doc_id": [], "orientation": [], "make": [],
                   "width": [], "height": [], "mean_intensity": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                if sniff_format(b) != "jpeg":
                    raise NotImplementedError(
                        "EXIF metadata lives in JPEG APP1 segments"
                    )
                meta = parse_exif(b)
                pix = apply_exif_orientation(
                    decode_jpeg(b), meta["orientation"]
                )
                out["doc_id"].append(doc_id)
                out["orientation"].append(meta["orientation"])
                out["make"].append(meta["make"])
                out["width"].append(pix.shape[1])
                out["height"].append(pix.shape[0])
                out["mean_intensity"].append(float(pix.mean()) / 255.0)
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel, EXIF_FEATURES_SCHEMA
    )


def synthesize_webdataset_shards(df: DataFrame) -> DataFrame:
    """Deterministic WebDataset shard source: per ``doc_id`` one tar
    shard holding 2 + doc_id % 3 (image, caption) sample pairs —

      sample j: key = '{doc_id:05d}-{j}',
                jpg = block-constant JPEG, w = 9 + (doc_id + j) % 16,
                      h = 9 + (doc_id + j) % 12,
                      tile v = (doc_id*47 + bx*7 + by*13 + j*29) % 256,
                txt = 'cap-{doc_id}-{j}'

    — the multimodal-training container shape, with every field a
    closed form the SQL oracle recomputes
    (queries/ext_multimodal.py:webdataset_samples_report)."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .jpeg import encode_jpeg
        from .webdataset import write_webdataset_shard

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                shard = []
                for j in range(2 + did % 3):
                    w, h = 9 + (did + j) % 16, 9 + (did + j) % 12
                    bx = np.arange(w)[None, :] // 8
                    by = np.arange(h)[:, None] // 8
                    arr = ((did * 47 + bx * 7 + by * 13 + j * 29) % 256
                           ).astype(np.uint8)
                    shard.append({
                        "key": f"{did:05d}-{j}",
                        "jpg": encode_jpeg(arr),
                        "txt": f"cap-{did}-{j}".encode(),
                    })
                out["doc_id"].append(did)
                out["blob"].append(write_webdataset_shard(shard))
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


WDS_SAMPLE_SCHEMA = (
    "doc_id long, key string, width int, height int, "
    "mean_intensity double, caption_chars int"
)


def webdataset_sample_features(df: DataFrame) -> DataFrame:
    """WebDataset shard demux -> one row PER SAMPLE: (doc_id, key,
    width, height, mean_intensity, caption_chars) via mapInPandas —
    tar members grouped by stem, images decoded through the sniffing
    codec dispatch, captions measured. A sample missing either half
    raises (a broken shard must fail loudly)."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from .media_codecs import decode_jpeg
        from .webdataset import read_webdataset_shard

        for pdf in batches:
            out = {"doc_id": [], "key": [], "width": [], "height": [],
                   "mean_intensity": [], "caption_chars": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                for s in read_webdataset_shard(bytes(blob)):
                    if "jpg" not in s or "txt" not in s:
                        raise ValueError(
                            f"webdataset sample {s['key']!r} missing its "
                            "image or caption member"
                        )
                    pix = decode_jpeg(s["jpg"])
                    out["doc_id"].append(doc_id)
                    out["key"].append(s["key"])
                    out["width"].append(pix.shape[1])
                    out["height"].append(pix.shape[0])
                    out["mean_intensity"].append(float(pix.mean()) / 255.0)
                    out["caption_chars"].append(
                        len(s["txt"].decode("utf-8"))
                    )
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, WDS_SAMPLE_SCHEMA)


def synthesize_zip_shards(df: DataFrame) -> DataFrame:
    """Deterministic ZIP shard source: per ``doc_id`` one ZIP archive
    holding 2 + doc_id % 3 (image, caption) sample pairs —

      sample j: key = 'z{doc_id:05d}-{j}',
                jpg = block-constant JPEG, w = 9 + (doc_id + 2*j) % 16,
                      h = 9 + (doc_id + j) % 12,
                      tile v = (doc_id*53 + bx*7 + by*13 + j*37) % 256,
                      STORED when (doc_id + j) % 2 == 0 else DEFLATED,
                txt = 'zipcap-{doc_id}-{j}', always DEFLATED

    — the same stem-paired multimodal layout as the tar shards but in
    the other ubiquitous container, with BOTH ZIP storage methods under
    the oracle hash (queries/ext_multimodal.py:zip_shard_report)."""

    def kernel(batches: Iterator) -> Iterator:
        import zipfile

        import numpy as np
        import pandas as pd

        from .jpeg import encode_jpeg
        from .zipshard import write_zip_shard

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                shard = []
                for j in range(2 + did % 3):
                    w, h = 9 + (did + 2 * j) % 16, 9 + (did + j) % 12
                    bx = np.arange(w)[None, :] // 8
                    by = np.arange(h)[:, None] // 8
                    arr = ((did * 53 + bx * 7 + by * 13 + j * 37) % 256
                           ).astype(np.uint8)
                    shard.append({
                        "key": f"z{did:05d}-{j}",
                        "jpg": encode_jpeg(arr),
                        "txt": f"zipcap-{did}-{j}".encode(),
                        "methods": {
                            "jpg": (zipfile.ZIP_STORED
                                    if (did + j) % 2 == 0
                                    else zipfile.ZIP_DEFLATED),
                            "txt": zipfile.ZIP_DEFLATED,
                        },
                    })
                out["doc_id"].append(did)
                out["blob"].append(write_zip_shard(shard))
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE only (see synthesize_webdataset_shards)
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


ZIP_SAMPLE_SCHEMA = (
    "doc_id long, key string, width int, height int, "
    "mean_intensity double, caption_chars int, img_method int"
)


def zip_shard_features(df: DataFrame) -> DataFrame:
    """ZIP shard demux -> one row PER SAMPLE: (doc_id, key, width,
    height, mean_intensity, caption_chars, img_method) via mapInPandas
    — members grouped by stem, CRC-verified and inflated by the stdlib,
    images decoded through the sniffing codec dispatch, captions
    measured, and the image member's storage method surfaced (so the
    STORED-vs-DEFLATED split is hash-gated, not just exercised). A
    sample missing either half raises."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from .media_codecs import decode_jpeg
        from .zipshard import read_zip_shard

        for pdf in batches:
            out = {"doc_id": [], "key": [], "width": [], "height": [],
                   "mean_intensity": [], "caption_chars": [],
                   "img_method": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                for s in read_zip_shard(bytes(blob)):
                    if "jpg" not in s or "txt" not in s:
                        raise ValueError(
                            f"zip sample {s['key']!r} missing its "
                            "image or caption member"
                        )
                    pix = decode_jpeg(s["jpg"])
                    out["doc_id"].append(doc_id)
                    out["key"].append(s["key"])
                    out["width"].append(pix.shape[1])
                    out["height"].append(pix.shape[0])
                    out["mean_intensity"].append(float(pix.mean()) / 255.0)
                    out["caption_chars"].append(
                        len(s["txt"].decode("utf-8"))
                    )
                    out["img_method"].append(s["methods"]["jpg"])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, ZIP_SAMPLE_SCHEMA)


def synthesize_jpeg_blobs(df: DataFrame, *, quality: int = 75) -> DataFrame:
    """Deterministic real-JPEG source for the real-decode path, the lossy
    twin of :func:`synthesize_png_blobs`: for each ``doc_id`` emit
    (doc_id, blob) where blob is a genuine baseline JPEG
    (operators/jpeg.py:encode_jpeg) of a BLOCK-CONSTANT tile pattern —

      w = 9 + doc_id % 16,  h = 9 + doc_id % 12   (deliberately NOT
      multiples of 8, so MCU edge-replicate padding is exercised; padded
      partial blocks stay constant because tiles are 8-aligned to the
      image origin),
      tile value v(bx, by) = (doc_id*31 + bx*7 + by*13) % 256 for the
      8x8 block at (bx, by) = (x//8, y//8),
      RGB with R=G=B when doc_id is even (Y=v exactly, Cb=Cr=128, so
      chroma quantizes to zero), grayscale when odd; every seventh
      document encodes with restart_interval=2 (DRI + RSTn markers), so
      the decoder's restart/resync path sits under the oracle hash too;
      even documents cycle chroma subsampling ("444", "420", "422" by
      (doc_id//2) % 3), so the interleaved-MCU 4:2:0/4:2:2 decode paths
      — the dominant real-world JPEG layouts — sit under the SAME
      oracle hash: constant-128 chroma box-averages to 128 and its
      blocks still quantize to exactly zero, while luma stays
      full-resolution block-constant, so bit-exactness is preserved;
      every ninth document encodes PROGRESSIVE (SOF2,
      spectral-selection scan script — same coefficients, different
      scan order, so exactness again survives), putting the multi-scan
      decode path under this oracle hash too (doc_id 0 stacks
      progressive + 4:2:0 + restart markers in one stream).

    JPEG is lossy in general, but for block-constant tiles the DCT is a
    lone DC coefficient 8*(v-128) and at IJG quality 75 the luminance DC
    quantization step is exactly 8, so encode->decode is BIT-EXACT (see
    operators/jpeg.py's module docstring for the divisibility argument;
    verified for all (w, h, parity) fixture shapes in
    tests/test_multimodal.py). That exactness is what lets a SQL oracle
    value-check a lossy codec: the closed-form tile sums are recomputable
    without any codec (queries/ext_multimodal.py:multimodal_jpeg_decode).
    Runs as an Arrow-batched mapInPandas kernel like the PNG/WAV twins."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .jpeg import encode_jpeg

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = 9 + did % 16, 9 + did % 12
                bx = np.arange(w)[None, :] // 8
                by = np.arange(h)[:, None] // 8
                arr = ((did * 31 + bx * 7 + by * 13) % 256).astype(np.uint8)
                sub = "444"
                if did % 2 == 0:
                    arr = np.stack([arr, arr, arr], axis=2)
                    sub = ("444", "420", "422", "411", "440")[(did // 2) % 5]
                out["doc_id"].append(did)
                out["blob"].append(
                    encode_jpeg(
                        arr,
                        quality=quality,
                        restart_interval=2 if did % 7 == 0 else 0,
                        subsampling=sub,
                        progressive=did % 9 == 0,
                    )
                )
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def synthesize_jpeg_arith_blobs(df: DataFrame) -> DataFrame:
    """Deterministic ARITHMETIC-CODED real-JPEG source (SOF9 extended
    sequential / SOF10 progressive, T.81 Annex D QM-coder, explicit DAC
    segment — operators/jpeg_arith.py), the entropy-layer twin of
    :func:`synthesize_jpeg_blobs`:

      w = 9 + doc_id % 14,  h = 9 + doc_id % 10,
      tile value v(bx, by) = (doc_id*41 + bx*11 + by*17) % 256 for the
      8x8 block at (x//8, y//8),
      RGB with R=G=B when doc_id is even (chroma constant 128 ->
      quantizes to zero), grayscale when odd; even documents cycle
      subsampling 444/420/422 by (doc_id//2) % 3; every fifth document
      restarts every 2 MCUs (QM-coder flush + statistics reset under
      the oracle hash); every third encodes PROGRESSIVE (SOF10 —
      arithmetic DC scan + per-component arithmetic AC scans).

    Exactness carries over from the Huffman fixture argument unchanged:
    arithmetic coding only replaces the ENTROPY layer — the quantized
    coefficients are identical — and block-constant tiles round-trip
    bit-exact at IJG q75 (lone DC coefficient, luma DC step exactly 8).
    The SQL oracle recomputes the closed-form tile sums with no codec
    (queries/ext_multimodal.py:multimodal_jpeg_arith_decode)."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .jpeg import encode_jpeg

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = 9 + did % 14, 9 + did % 10
                bx = np.arange(w)[None, :] // 8
                by = np.arange(h)[:, None] // 8
                arr = ((did * 41 + bx * 11 + by * 17) % 256).astype(np.uint8)
                sub = "444"
                if did % 2 == 0:
                    arr = np.stack([arr, arr, arr], axis=2)
                    sub = ("444", "420", "422", "411", "440")[(did // 2) % 5]
                out["doc_id"].append(did)
                out["blob"].append(
                    encode_jpeg(
                        arr,
                        restart_interval=2 if did % 5 == 0 else 0,
                        subsampling=sub,
                        progressive=did % 3 == 0,
                        arithmetic=True,
                    )
                )
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def synthesize_jpeg_lossless_blobs(df: DataFrame) -> DataFrame:
    """Deterministic LOSSLESS-JPEG source (SOF3, T.81 Annex H —
    operators/jpeg.py:encode_jpeg_lossless). Unlike every lossy JPEG
    fixture, the pixels are ARBITRARY per-pixel closed forms (no
    block-constant trick needed — predictive coding is exact):

      w = 8 + doc_id % 15,  h = 8 + doc_id % 11,
      precision P = (8, 12, 16)[doc_id % 3],
      pixel v(x, y, c) = (doc_id*53 + x*19 + y*31 + c*7) % 2^P,
      RGB for even doc_ids (channels coded directly — lossless JPEG has
      NO color transform), grayscale for odd,
      predictor = 1 + doc_id % 7 (all seven Annex H predictors cycle),
      every sixth document restarts every 3 samples.

    The SQL oracle recomputes the exact pixel sums
    (queries/ext_multimodal.py:multimodal_jpeg_lossless_decode)."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .jpeg import encode_jpeg_lossless

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = 8 + did % 15, 8 + did % 11
                p = (8, 12, 16)[did % 3]
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                base = did * 53 + x * 19 + y * 31
                if did % 2 == 0:
                    arr = np.stack(
                        [(base + c * 7) % (1 << p) for c in range(3)], axis=2
                    )
                else:
                    arr = base % (1 << p)
                arr = arr.astype(np.uint8 if p == 8 else np.uint16)
                out["doc_id"].append(did)
                out["blob"].append(
                    encode_jpeg_lossless(
                        arr,
                        precision=p,
                        predictor=1 + did % 7,
                        restart_interval=3 if did % 6 == 0 else 0,
                    )
                )
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def synthesize_jpeg12_blobs(df: DataFrame) -> DataFrame:
    """Deterministic 12-BIT real-JPEG source (SOF1 extended sequential /
    SOF2 progressive, 16-bit DQT entries, level shift 2048), the
    high-precision twin of :func:`synthesize_jpeg_blobs`:

      w = 9 + doc_id % 16,  h = 9 + doc_id % 12,
      tile value v(bx, by) = (doc_id*97 + bx*29 + by*53) % 4096 for the
      8x8 block at (x//8, y//8),
      RGB with R=G=B when doc_id is even (chroma constant 2048 ->
      quantizes to zero), grayscale when odd; even documents cycle
      subsampling 444/420/422 by (doc_id//2) % 3; every seventh document
      restarts every 2 MCUs; every ninth encodes progressive.

    Exactness carries over from the 8-bit argument: the DCT of a
    constant block is a lone DC coefficient 8*(v - 2048), and at IJG
    quality 75 the luminance DC step is exactly 8, so the 12-bit round
    trip is BIT-exact on these fixtures — which is what lets the SQL
    oracle value-check the high-precision path
    (queries/ext_multimodal.py:multimodal_jpeg12_decode)."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .jpeg import encode_jpeg

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = 9 + did % 16, 9 + did % 12
                bx = np.arange(w)[None, :] // 8
                by = np.arange(h)[:, None] // 8
                arr = ((did * 97 + bx * 29 + by * 53) % 4096).astype(
                    np.uint16
                )
                sub = "444"
                if did % 2 == 0:
                    arr = np.stack([arr, arr, arr], axis=2)
                    sub = ("444", "420", "422", "411", "440")[(did // 2) % 5]
                out["doc_id"].append(did)
                out["blob"].append(
                    encode_jpeg(
                        arr,
                        quality=75,
                        precision=12,
                        restart_interval=2 if did % 7 == 0 else 0,
                        subsampling=sub,
                        progressive=did % 9 == 0,
                    )
                )
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def synthesize_wav_blobs(df: DataFrame) -> DataFrame:
    """Deterministic real-WAV source, the audio twin of
    :func:`synthesize_png_blobs`: for each ``doc_id`` emit (doc_id, blob)
    where blob is a genuine PCM-16 mono WAV of a closed-form signal —

      n  = 200 + doc_id % 300 frames,
      sr = 8000 + (doc_id % 4) * 2000 Hz,
      sample(i) = ((doc_id*37 + i*11) % 65536) - 32768  (int16, full range)

    written straight from int16 (never through a float re-quantization,
    which would break the closed form a SQL oracle recomputes)."""

    def kernel(batches: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n = 200 + did % 300
                sr = 8000 + (did % 4) * 2000
                i = np.arange(n, dtype=np.int64)
                pcm = ((did * 37 + i * 11) % 65536 - 32768).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(sr)
                    wf.writeframes(pcm.tobytes())
                out["doc_id"].append(did)
                out["blob"].append(buf.getvalue())
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def synthesize_g711_blobs(df: DataFrame) -> DataFrame:
    """Deterministic real-G.711 source (telephony WAV): for each
    ``doc_id`` emit (doc_id, blob) where blob is a genuine mono
    mu-law (even doc_id, format 7) or A-law (odd, format 6) WAV of

      n  = 150 + doc_id % 200 code bytes at 8000 Hz,
      code(i) = (doc_id*13 + i*7) % 256

    — the code bytes are synthesized DIRECTLY (no companding round
    trip), so the decoded samples are pure table lookups a SQL oracle
    reproduces from a 256-entry literal
    (queries/ext_multimodal.py:multimodal_wav_g711_decode); the table
    itself is pinned against published G.711 reference values in
    tests/test_multimodal.py, so a shared-constant bug cannot hide."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .media_codecs import encode_wav_g711

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n = 150 + did % 200
                codes = ((did * 13 + np.arange(n) * 7) % 256).astype(np.uint8)
                out["doc_id"].append(did)
                out["blob"].append(
                    encode_wav_g711(
                        codes, 8000, law="mulaw" if did % 2 == 0 else "alaw"
                    )
                )
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def synthesize_adpcm_blobs(df: DataFrame) -> DataFrame:
    """Deterministic real-IMA-ADPCM source (WAVE_FORMAT_DVI_ADPCM 0x11):
    for each ``doc_id`` emit (doc_id, blob) where blob is a genuine mono
    4-bit ADPCM WAV with

      variant    v  = doc_id % 8,
      nibbles    nb = 2 * (75 + doc_id % 100),   code(j) = (j*7 + v*5 + 3) % 16
      init state    = (pred = v*4111 - 16000, index = (v*11) % 89),
      sample rate   = 8000 + (doc_id % 4) * 2000 Hz,  block_align = 68.

    The CODE nibbles are synthesized directly (no audio quantization
    round trip) and every block header carries the running decoder
    state, so the decoded int16 stream is one continuous IMA decode of
    the variant's nibble stream with the block-leading predictor
    repeated at each 128-nibble boundary — a pure function of
    (v, nb) that the SQL oracle reproduces from per-variant prefix-sum
    literals (queries/ext_multimodal.py:multimodal_wav_adpcm_decode);
    the step/index tables are pinned against the published IMA values
    in tests/test_multimodal.py, so a shared-constant bug cannot hide."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .media_codecs import encode_wav_adpcm

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                v = did % 8
                nb = 2 * (75 + did % 100)
                j = np.arange(nb, dtype=np.int64)
                nibbles = ((j * 7 + v * 5 + 3) % 16).astype(np.uint8)
                out["doc_id"].append(did)
                out["blob"].append(
                    encode_wav_adpcm(
                        nibbles,
                        8000 + (did % 4) * 2000,
                        block_align=68,
                        init_pred=v * 4111 - 16000,
                        init_index=(v * 11) % 89,
                    )
                )
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def synthesize_flac_blobs(df: DataFrame) -> DataFrame:
    """Deterministic real-FLAC source (operators/flac.py): for each
    ``doc_id`` emit (doc_id, blob) where blob is a genuine mono 16-bit
    FLAC of a closed-form signal —

      n  = 400 + doc_id % 500 frames,
      sr = 8000 + (doc_id % 4) * 2000 Hz,   block_size = 512,
      signal by doc_id % 3:
        0: TRIANGLE  s(i) = (abs(((i*3 + doc_id) % 2000) - 1000) - 500) * 30
           (piecewise linear -> the FIXED-predictor path: order-2 diffs
           vanish except at fold points)
        1: PSEUDO-NOISE  s(i) = (doc_id*37 + i*11) % 65536 - 32768
           (incompressible -> VERBATIM / high-parameter Rice path)
        2: CONSTANT  s(i) = (doc_id*29) % 65536 - 32768
           (the CONSTANT-subframe path)

    FLAC is LOSSLESS, so unlike the JPEG fixtures no divisibility
    argument is needed: the decoded int16 samples equal the closed form
    bit for bit, the stream's own CRC-8/CRC-16/MD5 integrity checks all
    verify in the decoder, and the SQL oracle recomputes the exact sum
    of squares (queries/ext_multimodal.py:multimodal_flac_decode)."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .flac import encode_flac

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n = 400 + did % 500
                sr = 8000 + (did % 4) * 2000
                i = np.arange(n, dtype=np.int64)
                v = did % 3
                if v == 0:
                    s = (np.abs((i * 3 + did) % 2000 - 1000) - 500) * 30
                elif v == 1:
                    s = (did * 37 + i * 11) % 65536 - 32768
                else:
                    s = np.full(n, did * 29 % 65536 - 32768, dtype=np.int64)
                out["doc_id"].append(did)
                out["blob"].append(
                    encode_flac(s.astype(np.int16), sr, block_size=512)
                )
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def synthesize_mp4_blobs(df: DataFrame) -> DataFrame:
    """Deterministic real-ISO-BMFF source for the container-probe path:
    for each ``doc_id`` emit (doc_id, blob) where blob is a structurally
    valid metadata-only MP4 (operators/mp4.py:encode_mp4_skeleton) with
    closed-form metadata —

      movie: timescale 1000, duration 500 + doc_id % 5000 (ms),
      64-bit (version 1) mvhd/mdhd time fields when doc_id % 5 == 0,
      32-bit otherwise — so parsing exercises both box layouts,
      tracks: 1 + doc_id % 3 of them; track k (0-based) has
        track_id k+1, handler 'vide' for even k else 'soun',
        media timescale 600 + 100*((doc_id + k) % 4),
        media duration 1000 + (doc_id*7 + k*13) % 100000.

    The closed form is what makes the REAL container parse
    oracle-checkable (queries/ext_multimodal.py:multimodal_mp4_probe);
    the blobs carry no sample data (frame DECODE stays the declared
    ffmpeg boundary)."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from .mp4 import encode_mp4_skeleton

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                tracks = [
                    {
                        "track_id": k + 1,
                        "handler": "vide" if k % 2 == 0 else "soun",
                        "timescale": 600 + 100 * ((did + k) % 4),
                        "duration": 1000 + (did * 7 + k * 13) % 100000,
                    }
                    for k in range(1 + did % 3)
                ]
                out["doc_id"].append(did)
                out["blob"].append(
                    encode_mp4_skeleton(
                        timescale=1000,
                        duration=500 + did % 5000,
                        tracks=tracks,
                        version=1 if did % 5 == 0 else 0,
                    )
                )
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


MEDIA_PROBE_SCHEMA = (
    "doc_id long, duration_s double, n_tracks int, track_id int, "
    "handler string, track_seconds double"
)


def probe_media_containers(df: DataFrame) -> DataFrame:
    """REAL container-metadata probe over (doc_id, blob): parse the
    ISO-BMFF box tree (operators/mp4.py:parse_mp4 — no ffmpeg needed for
    metadata) and emit one row PER TRACK with the movie-level duration
    and the track's handler + media-timescale duration. This is the
    demux-free half of a video pipeline: selecting/partitioning corpora
    by duration, track mix, or media kind before any frame is decoded.

    Per-track rows (not per-movie aggregates) keep every output column a
    single exact division — no cross-track float summation whose
    ordering an oracle would have to replicate. Non-MP4 blobs raise at
    the sniff boundary like every other real kernel."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from .media_codecs import sniff_format
        from .mp4 import parse_mp4

        for pdf in batches:
            out = {
                "doc_id": [], "duration_s": [], "n_tracks": [],
                "track_id": [], "handler": [], "track_seconds": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                if sniff_format(b) != "mp4":
                    raise NotImplementedError(
                        "container probe supports ISO-BMFF (MP4) only; "
                        "other containers need ffmpeg/pyav at this "
                        "insertion point"
                    )
                m = parse_mp4(b)
                dur_s = m["duration"] / m["timescale"]
                for t in m["tracks"]:
                    out["doc_id"].append(doc_id)
                    out["duration_s"].append(dur_s)
                    out["n_tracks"].append(len(m["tracks"]))
                    out["track_id"].append(t["track_id"])
                    out["handler"].append(t["handler"])
                    out["track_seconds"].append(t["duration"] / t["timescale"])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, MEDIA_PROBE_SCHEMA)


def repartition_by_bytes(df: DataFrame, *, target_bytes_per_partition: int,
                         total_bytes: int) -> DataFrame:
    """Size partitions by payload volume, not row count — the knob that keeps
    Arrow batches inside executor memory when blobs are megabytes each."""
    n = max(1, total_bytes // target_bytes_per_partition)
    return df.repartition(n)


def decode_image_features(df: DataFrame, *, decode: str = "fake") -> DataFrame:
    """Image decode -> (width, height, n_bytes, mean_intensity) via
    mapInPandas. `decode="real"` decodes uncompressed 24-bit BMP,
    PNG at every legal depth/color combo (Adam7 included), and baseline sequential
    JPEG with the stdlib codecs (media_codecs.decode_bmp / decode_png /
    decode_jpeg) — actual pixel dimensions and actual mean pixel
    intensity in [0, 1]; other formats raise at the codec boundary
    (PIL insertion point)."""
    if decode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode: {decode}")

    def kernel(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        from .media_codecs import (
            decode_bmp,
            decode_gif,
            decode_jpeg,
            decode_png,
            decode_tiff,
            sniff_format,
        )

        for pdf in batches:
            feats = {"doc_id": [], "width": [], "height": [], "n_bytes": [],
                     "mean_intensity": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                if decode == "real":
                    fmt = sniff_format(b)
                    if fmt == "bmp":
                        pix = decode_bmp(b)
                    elif fmt == "png":
                        pix = decode_png(b)
                    elif fmt == "jpeg":
                        pix = decode_jpeg(b)
                    elif fmt == "gif":
                        # image semantics for an animation: frame 0
                        pix = decode_gif(b)[0][0]
                    elif fmt == "tiff":
                        pix = decode_tiff(b)
                    else:
                        raise NotImplementedError(
                            "real image decode beyond BMP/PNG/JPEG needs "
                            "PIL/opencv (not in this container); swap this "
                            "branch for Image.open(io.BytesIO(b))"
                        )
                    feats["doc_id"].append(doc_id)
                    feats["width"].append(pix.shape[1])
                    feats["height"].append(pix.shape[0])
                    feats["n_bytes"].append(len(b))
                    # normalize by the sample RANGE, not blindly the dtype
                    # max: 16-bit PNG tops out at 65535 but a 12-bit JPEG's
                    # uint16 samples top out at 4095 (SOF precision); the
                    # float64 mean of integer samples is an exact sum over
                    # an exact count
                    if fmt == "jpeg" and pix.dtype != np.uint8:
                        from .jpeg import jpeg_precision

                        maxv = float((1 << jpeg_precision(b)) - 1)
                    else:
                        maxv = float(np.iinfo(pix.dtype).max)
                    feats["mean_intensity"].append(float(pix.mean()) / maxv)
                    continue
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


def resize_images(df: DataFrame, *, width: int = 32, height: int = 32,
                  decode: str = "fake") -> DataFrame:
    """Image resize -> (doc_id, blob, width, height) via mapInPandas; the
    output blob REPLACES the input payload, so downstream batches shrink to
    the target size (the point of resizing early in a media pipeline).
    `decode="real"` decodes BMP, nearest-neighbor-resizes in numpy, and
    re-encodes BMP (media_codecs); non-BMP formats raise at the PIL
    insertion point. The fake kernel emits a deterministic byte-budget
    crop/pad so batch sizing and schema are exercised without a codec."""

    target = width * height // 8  # fake: resized payload budget in bytes

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from .media_codecs import (
            decode_bmp,
            decode_jpeg,
            decode_png,
            encode_bmp,
            encode_jpeg,
            encode_png,
            resize_nearest,
            sniff_format,
        )

        for pdf in batches:
            out = {"doc_id": [], "blob": [], "width": [], "height": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                if decode == "real":
                    fmt = sniff_format(b)
                    if fmt == "bmp":
                        resized = encode_bmp(
                            resize_nearest(decode_bmp(b), width, height)
                        )
                    elif fmt == "png":
                        resized = encode_png(
                            resize_nearest(decode_png(b), width, height)
                        )
                    elif fmt == "jpeg":
                        # re-encode is lossy (resize misaligns the 8x8
                        # tile grid) — fine for a thumbnail pipeline
                        resized = encode_jpeg(
                            resize_nearest(decode_jpeg(b), width, height)
                        )
                    elif fmt == "gif":
                        # thumbnail semantics for an animation: frame 0,
                        # re-encoded lossless as PNG
                        from .media_codecs import decode_gif

                        resized = encode_png(
                            resize_nearest(decode_gif(b)[0][0], width, height)
                        )
                    elif fmt == "tiff":
                        from .media_codecs import decode_tiff, encode_tiff

                        resized = encode_tiff(
                            resize_nearest(decode_tiff(b), width, height)
                        )
                    else:
                        raise NotImplementedError(
                            "real resize beyond BMP/PNG/JPEG/GIF needs PIL "
                            "(not in this container); swap for "
                            "Image.open(...).resize(...)"
                        )
                else:
                    resized = (b * (target // max(1, len(b)) + 1))[:target]
                out["doc_id"].append(doc_id)
                out["blob"].append(resized)
                out["width"].append(width)
                out["height"].append(height)
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, RESIZED_SCHEMA)


def audio_features(df: DataFrame, *, sample_rate: int = 16_000,
                   decode: str = "fake") -> DataFrame:
    """Audio feature extraction -> (doc_id, duration_s, sample_rate, rms)
    via mapInPandas; `decode="real"` decodes WAV with media_codecs.decode_wav
    (PCM 16/8-bit, G.711 mu-law/A-law, IMA ADPCM) and FLAC with
    operators/flac.py — actual container sample rate, frame-count duration,
    and RMS over normalized samples; anything else raises at the
    soundfile/librosa insertion point. The fake kernel
    treats the payload as 16-bit PCM so duration/rms are deterministic
    pure functions of the bytes."""

    def kernel(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        from .media_codecs import decode_wav, sniff_format

        for pdf in batches:
            out = {"doc_id": [], "duration_s": [], "sample_rate": [], "rms": []}
            if decode == "real":
                from .flac import decode_flac

                for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                    b = bytes(blob)
                    fmt = sniff_format(b)
                    if fmt == "wav":
                        samples, sr = decode_wav(b)
                    elif fmt == "flac":
                        samples, sr = decode_flac(b)
                    else:
                        raise NotImplementedError(
                            "real audio decode beyond WAV (PCM/G.711/ADPCM) "
                            "and FLAC needs soundfile/librosa (not in this "
                            "container); swap for sf.read(io.BytesIO(b))"
                        )
                    n_frames = samples.shape[0]
                    # np.sqrt, not ** 0.5: correctly-rounded IEEE sqrt, so a
                    # SQL oracle's sqrt() matches bit-for-bit (pow(x, 0.5)
                    # carries no such guarantee)
                    import numpy as np

                    rms = (
                        float(np.sqrt((samples**2).mean())) if n_frames else 0.0
                    )
                    out["doc_id"].append(doc_id)
                    out["duration_s"].append(n_frames / sr)
                    out["sample_rate"].append(sr)
                    out["rms"].append(rms)
                yield pd.DataFrame(out)
                continue
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                n_samples = len(b) // 2
                samples = [
                    int.from_bytes(b[2 * i : 2 * i + 2], "little", signed=True)
                    for i in range(n_samples)
                ]
                # math.sqrt, not ** 0.5: IEEE-correctly-rounded in every
                # runtime, so the SQL oracle's sqrt() matches bit-for-bit
                rms = (
                    math.sqrt(sum(s * s for s in samples) / n_samples) / 32768.0
                    if n_samples
                    else 0.0
                )
                out["doc_id"].append(doc_id)
                out["duration_s"].append(n_samples / sample_rate)
                out["sample_rate"].append(sample_rate)
                out["rms"].append(rms)
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


RESAMPLE_SCHEMA = (
    "doc_id long, sr_in int, sr_out int, n_out long, duration_out double, "
    "rms double"
)


def audio_resample_features(
    df: DataFrame, *, target_sr: int = 16_000
) -> DataFrame:
    """Resample decoded audio to ``target_sr`` (the standard
    normalization step before audio tokenization / feature extraction)
    by exact-rational LINEAR interpolation, then report the resampled
    length, duration, and RMS — (doc_id, sr_in, sr_out, n_out,
    duration_out, rms) via mapInPandas over real WAV/FLAC blobs.

    Numerics are mirrored EXACTLY by the SQL oracle
    (queries/ext_multimodal.py:audio_resample_16k): output position j
    maps to input position idx = (j*sr_in)//target_sr with fractional
    part frac = (j*sr_in % target_sr)/target_sr; the interpolated raw
    value x = s[idx] + frac*(s[idx1] - s[idx]) (idx1 = min(idx+1, n-1))
    is one float64 expression of integer inputs with an identical shape
    on both engines, quantized with the house floor-form round-half-up
    to an exact int64 whose squares sum exactly.

    Scale: chained mapInPandas over (doc_id, blob) — zero exchanges;
    the resampler is O(n_out) per blob with no state across blobs."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .flac import decode_flac
        from .media_codecs import decode_wav, sniff_format

        for pdf in batches:
            out = {
                "doc_id": [], "sr_in": [], "sr_out": [], "n_out": [],
                "duration_out": [], "rms": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                fmt = sniff_format(b)
                if fmt == "wav":
                    samples, sr = decode_wav(b)
                elif fmt == "flac":
                    samples, sr = decode_flac(b)
                else:
                    raise NotImplementedError(
                        "resample takes real WAV/FLAC audio"
                    )
                raw = samples[:, 0] * 32768.0  # exact: back to raw scale
                n = len(raw)
                if n == 0 or sr <= 0:
                    raise ValueError("empty or invalid audio stream")
                m = ((n - 1) * target_sr) // sr + 1
                j = np.arange(m, dtype=np.int64)
                idx = (j * sr) // target_sr
                idx1 = np.minimum(idx + 1, n - 1)
                frac = ((j * sr) % target_sr).astype(np.float64) / float(
                    target_sr
                )
                x = raw[idx] + frac * (raw[idx1] - raw[idx])
                q = np.floor(x + 0.5)  # house round-half-up, exact int
                ss = float((q * q).sum())  # < 2^41: exact in float64
                rms = float(np.sqrt((ss / 1073741824.0) / m))
                out["doc_id"].append(doc_id)
                out["sr_in"].append(sr)
                out["sr_out"].append(target_sr)
                out["n_out"].append(m)
                out["duration_out"].append(m / target_sr)
                out["rms"].append(rms)
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, RESAMPLE_SCHEMA)


FINGERPRINT_SCHEMA = "doc_id long, b0 long, b1 long, b2 long, b3 long"


def audio_fingerprint_bands(df: DataFrame) -> DataFrame:
    """Audio fingerprint -> 64-bit signature as four 16-bit bands, the
    audio twin of image_phash_bands: decode real WAV/FLAC, split the
    signal into 17 equal frames x 5 equal time sub-bands, take exact
    integer energies E(f, b) = sum of squared raw samples, and derive
    the Haitsma-Kalker-style bit

        bit(f-1, b) = [ (E(f,b) - E(f,b+1)) - (E(f-1,b) - E(f-1,b+1)) > 0 ]

    for f in 1..16, b in 0..3 — the sign of the band-energy difference's
    temporal delta, the published robust-audio-hash construction (here
    over time-domain energy bands so every quantity is an EXACT int64
    a SQL oracle recomputes; a spectral front-end would feed the same
    bit derivation). Bit m = (f-1)*4 + b lands in band m // 16 at
    position m % 16 (LSB-first), the join-ready LSH layout: hamming <= 3
    over 4 bands pigeonholes into a shared band for the downstream
    equi-join."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .flac import decode_flac
        from .media_codecs import decode_wav, sniff_format

        for pdf in batches:
            out = {"doc_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                fmt = sniff_format(b)
                if fmt == "wav":
                    samples, _sr = decode_wav(b)
                elif fmt == "flac":
                    samples, _sr = decode_flac(b)
                else:
                    raise NotImplementedError(
                        "audio fingerprint takes real WAV/FLAC audio"
                    )
                raw = (samples[:, 0] * 32768.0).astype(np.int64)
                n = len(raw)
                frame = n // 17
                sub = frame // 5
                if sub == 0:
                    raise ValueError(
                        f"audio too short to fingerprint ({n} samples; "
                        "needs >= 85)"
                    )
                # E[f, b]: exact int64 (sub * 2^30 < 2^63 for any real n)
                e = (
                    (raw[: 17 * frame] ** 2)
                    .reshape(17, frame)[:, : 5 * sub]
                    .reshape(17, 5, sub)
                    .sum(axis=2)
                )
                d1 = e[:, :4] - e[:, 1:]  # (17, 4) band differences
                bits = (d1[1:] - d1[:-1]) > 0  # (16, 4) temporal deltas
                flat = bits.reshape(64)
                vals = []
                for k in range(4):
                    v = 0
                    for j in range(16):
                        if flat[k * 16 + j]:
                            v |= 1 << j
                    vals.append(v)
                out["doc_id"].append(doc_id)
                for k in range(4):
                    out[f"b{k}"].append(vals[k])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, FINGERPRINT_SCHEMA)


def synthesize_dup_wav_blobs(df: DataFrame) -> DataFrame:
    """Deterministic WAV source WITH PLANTED DUPLICATES for the audio
    near-dup path: documents pair up in groups of four — the first two
    members of group g = doc_id // 4 carry the IDENTICAL closed-form
    signal (n = 300 + (g*7) % 200, c0 = g*37, c1 = 11), the other two
    carry unique signals (n = 300 + (doc_id*3) % 200, c0 = doc_id*41,
    c1 = 13), where

        h(i) = ((c0 + i*c1) * 2654435761) mod 2^32        (Knuth hash)
        s(i) = ((h ^ (h >> 16)) mod 65536) - 32768        (mixed bits)

    — the xor-fold is what makes the samples genuinely pseudo-random
    (a bare multiplicative hash mod 2^16 stays a LINEAR ramp whose
    energy bits degenerate identically across docs; measured: every
    band went hot and zero pairs survived). Planted pairs fingerprint
    identically (hamming 0), unrelated docs collide with probability
    ~2^-50 at hamming <= 3 — and the SQL oracle recomputes the SAME
    closed form, so even an accidental collision matches."""

    def kernel(batches: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                g = did // 4
                if did % 4 < 2:
                    n = 300 + (g * 7) % 200
                    c0, c1 = g * 37, 11
                else:
                    n = 300 + (did * 3) % 200
                    c0, c1 = did * 41, 13
                i = np.arange(n, dtype=np.int64)
                h = ((c0 + i * c1) * 2654435761) % 4294967296
                s = ((h ^ (h >> 16)) % 65536) - 32768
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(s.astype("<i2").tobytes())
                out["doc_id"].append(did)
                out["blob"].append(buf.getvalue())
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    # widen the ID SPINE (longs only — blobs do not exist yet, so the
    # no-payload-shuffle property holds) or a single-split local table
    # would serialize the codec kernels on one core
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def sample_frames(df: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 4,
                  decode: str = "fake") -> DataFrame:
    """Video frame sampling -> (doc_id, frame_idx, frame_hash) via
    mapInPandas. In real mode, AVI/MJPEG videos (operators/avi.py) and
    ANIMATED GIFs (operators/gif.py) genuinely demux and decode —
    frame_hash is the md5 of the decoded frame bytes, at most
    ``max_frames`` frames kept at an even stride; MP4/H.264 frame
    decode needs ffmpeg/pyav and stays a loud boundary, with container
    METADATA (duration, track mix) real already via
    :func:`probe_media_containers` / operators/mp4.py."""

    def kernel(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        from .media_codecs import decode_gif, sniff_format

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                if decode == "real":
                    fmt = sniff_format(b)
                    if fmt == "gif":
                        frames, _delays = decode_gif(b)
                    elif fmt == "avi":
                        from .avi import decode_avi_mjpeg

                        frames, _usec = decode_avi_mjpeg(b)
                    else:
                        raise NotImplementedError(
                            "real frame sampling beyond AVI/MJPEG and GIF "
                            "needs ffmpeg/pyav (codec insertion point); "
                            "container metadata is available without it via "
                            "probe_media_containers"
                        )
                    n = frames.shape[0]
                    step = max(1, -(-n // max_frames))  # ceil: <= max_frames kept
                    for rank, fi in enumerate(range(0, n, step)):
                        out["doc_id"].append(doc_id)
                        out["frame_idx"].append(fi)
                        out["frame_hash"].append(
                            hashlib.md5(frames[fi].tobytes()).hexdigest()
                        )
                        if rank + 1 >= max_frames:
                            break
                    continue
                for idx in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    chunk = b[idx * every_n_bytes : (idx + 1) * every_n_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_hash"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


PHASH_BANDS_SCHEMA = "doc_id long, b0 int, b1 int, b2 int, b3 int"


def image_phash_bands(df: DataFrame, *, decode: str = "fake") -> DataFrame:
    """Perceptual average-hash (aHash) of an image blob, emitted as four
    16-bit bands via mapInPandas. ``decode="fake"``: 64 "cells" are read
    cyclically from the blob bytes (the stand-in for an 8x8 grayscale
    downsample). ``decode="real"``: the blob is decoded (BMP/PNG), the
    pixels are nearest-neighbor-resized to 8x8, and each cell is the
    per-pixel CHANNEL SUM (scale-free grayscale proxy — exact integers,
    no division) — the textbook aHash pipeline on real pixels. Either
    way each bit is cell > mean (compared as ``cell * 64 > sum`` so the
    threshold is exact integer math), and bits 16b..16b+15 fold into
    band b. Bands — not one 64-bit value — because the near-dup join
    needs them anyway (pigeonhole: hamming <= 3 over 4 bands forces at
    least one equal band) and because bit 63 would overflow a signed
    int64."""
    if decode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode: {decode}")

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from .media_codecs import (
            decode_bmp,
            decode_jpeg,
            decode_png,
            resize_nearest,
            sniff_format,
        )

        for pdf in batches:
            out = {"doc_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                if not b:
                    continue
                if decode == "real":
                    fmt = sniff_format(b)
                    if fmt == "bmp":
                        pix = decode_bmp(b)
                    elif fmt == "png":
                        pix = decode_png(b)
                    elif fmt == "jpeg":
                        pix = decode_jpeg(b)
                    elif fmt == "gif":
                        from .media_codecs import decode_gif

                        pix = decode_gif(b)[0][0]  # frame 0
                    elif fmt == "tiff":
                        from .media_codecs import decode_tiff

                        pix = decode_tiff(b)
                    else:
                        raise NotImplementedError(
                            "real phash beyond BMP/PNG/JPEG/GIF needs PIL "
                            "(codec insertion point)"
                        )
                    small = resize_nearest(pix, 8, 8).astype(int)
                    if small.ndim == 3:
                        small = small.sum(axis=2)
                    cells = [int(v) for v in small.reshape(64)]
                else:
                    cells = [b[i % len(b)] for i in range(64)]
                s = sum(cells)
                bands = []
                for band in range(4):
                    v = 0
                    for i in range(16):
                        if cells[band * 16 + i] * 64 > s:
                            v |= 1 << i
                    bands.append(v)
                out["doc_id"].append(doc_id)
                for k, v in zip(("b0", "b1", "b2", "b3"), bands):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, PHASH_BANDS_SCHEMA)


IMAGE_QUALITY_SCHEMA = (
    "doc_id long, width int, height int, channels int, px_min int, "
    "px_max int, mean_px double, var_px double, entropy double"
)


def image_quality_features(df):
    """Image quality triage -> (doc_id, width, height, channels,
    px_min, px_max, mean_px, var_px, entropy) over REAL-decoded JPEGs:
    the pixel statistics a multimodal corpus filters on (flat images,
    blown-out exposures, low-information frames). Stats run on the
    luma plane (channel 0 — the oracle fixtures carry equal channels;
    a real deployment converts to luma first, same shape). Mean and
    variance come from exact int64 pixel sums; the Shannon entropy
    fold int64-quantizes each p*ln(p) term BEFORE summing (the
    text_unigram_entropy idiom), making the sum independent of
    enumeration order on both engines. All three floats are floor-form
    rounded to 4 decimals, mirroring the oracle expression shapes."""
    import math

    import pandas as pd

    def r4(x: float) -> float:
        return math.floor(x * 10000 + 0.5) / 10000

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np

        from .media_codecs import decode_jpeg

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height",
                                   "channels", "px_min", "px_max",
                                   "mean_px", "var_px", "entropy")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                pix = decode_jpeg(bytes(blob))
                ch = pix.shape[2] if pix.ndim == 3 else 1
                plane = pix[..., 0] if pix.ndim == 3 else pix
                flat = plane.astype(np.int64).ravel()
                npx = flat.size
                s1 = int(flat.sum())
                s2 = int((flat * flat).sum())
                mean = float(s1) / npx
                counts = np.bincount(flat, minlength=256)
                hs = 0
                for c in counts[counts > 0]:
                    p = float(int(c)) / npx
                    hs += int(math.floor(p * math.log(p) * 1_000_000_000
                                         - 0.5))
                out["doc_id"].append(doc_id)
                out["width"].append(plane.shape[1])
                out["height"].append(plane.shape[0])
                out["channels"].append(ch)
                out["px_min"].append(int(flat.min()))
                out["px_max"].append(int(flat.max()))
                out["mean_px"].append(r4(mean))
                out["var_px"].append(r4(float(s2) / npx - mean * mean))
                out["entropy"].append(r4(-(float(hs) / 1_000_000_000)))
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel, IMAGE_QUALITY_SCHEMA
    )


def synthesize_geo_jpeg_blobs(df: DataFrame) -> DataFrame:
    """Deterministic geotagged-JPEG source: per ``doc_id`` a small real
    JPEG whose APP1 carries a GPS IFD —

      lat: D = doc_id % 90, M = doc_id*3 % 60,
           S = (doc_id*7 % 6000) / 100, ref N on even doc_ids else S
      lon: D = doc_id % 180, M = doc_id*5 % 60,
           S = (doc_id*11 % 6000) / 100, ref W when doc_id % 3 == 0
           else E
      byte order alternates II/MM by doc_id % 2

    — rational triples with a 1/100-second denominator, so the
    rational-to-decimal math (not just integer passthrough) sits under
    the oracle hash (queries/ext_multimodal.py:exif_geo_report)."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .exif import attach_exif
        from .jpeg import encode_jpeg

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                img = np.full((16, 16), did % 256, dtype=np.uint8)
                gps = (
                    "N" if did % 2 == 0 else "S",
                    ((did % 90, 1), (did * 3 % 60, 1),
                     (did * 7 % 6000, 100)),
                    "W" if did % 3 == 0 else "E",
                    ((did % 180, 1), (did * 5 % 60, 1),
                     (did * 11 % 6000, 100)),
                )
                out["doc_id"].append(did)
                out["blob"].append(attach_exif(
                    encode_jpeg(img), gps=gps,
                    byte_order="<" if did % 2 == 0 else ">",
                ))
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def exif_geo_features(df: DataFrame) -> DataFrame:
    """Geotag extraction -> (doc_id, lat, lon, cell) via mapInPandas:
    GPS IFD rationals to signed decimal degrees (floor-form rounded to
    6 decimals) and the 1-degree grid cell a geo-dedup/bucketing job
    joins on. A geotagged fixture missing its GPS IFD fails loud."""
    import math

    import pandas as pd

    def r6(x: float) -> float:
        return math.floor(x * 1_000_000 + 0.5) / 1_000_000

    def kernel(batches: Iterator) -> Iterator:
        from .exif import parse_exif

        for pdf in batches:
            out = {"doc_id": [], "lat": [], "lon": [], "cell": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                r = parse_exif(bytes(blob))
                if r["gps_lat"] is None or r["gps_lon"] is None:
                    raise ValueError(
                        f"doc {doc_id}: geotagged fixture without GPS IFD"
                    )
                out["doc_id"].append(doc_id)
                out["lat"].append(r6(r["gps_lat"]))
                out["lon"].append(r6(r["gps_lon"]))
                out["cell"].append(
                    f"{math.floor(r['gps_lat'])}:{math.floor(r['gps_lon'])}"
                )
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel, "doc_id long, lat double, lon double, cell string"
    )


def synthesize_vad_wav_blobs(df: DataFrame) -> DataFrame:
    """Deterministic speech-shaped WAV source: per ``doc_id`` an 8 kHz
    16-bit PCM mono file of 28 + doc_id % 7 frames x 80 samples, frame
    f carrying a +/-A square wave (A = 1000 + doc_id % 100) when
    f % 7 < 2 + doc_id % 4 and digital silence otherwise — cyclic
    voice/silence runs whose segment counts are closed forms
    (queries/ext_multimodal.py:audio_vad_report)."""

    def kernel(batches: Iterator) -> Iterator:
        import io
        import struct
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                amp = 1000 + did % 100
                v = 2 + did % 4
                nf = 28 + did % 7
                pcm = np.zeros(nf * 80, dtype=np.int16)
                sq = np.where(np.arange(80) % 2 == 0, amp, -amp
                              ).astype(np.int16)
                for f in range(nf):
                    if f % 7 < v:
                        pcm[f * 80 : (f + 1) * 80] = sq
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(pcm.tobytes())
                out["doc_id"].append(did)
                out["blob"].append(buf.getvalue())
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


VAD_SCHEMA = (
    "doc_id long, n_frames int, n_speech_frames int, n_segments int, "
    "speech_ratio double"
)


def audio_vad_features(df: DataFrame, *, frame_len: int = 80,
                       energy_threshold: int = 0) -> DataFrame:
    """Energy-threshold voice-activity detection — the pre-ASR triage
    every audio corpus runs (how much of this file is speech-like, in
    how many segments): raw PCM int16 frames of ``frame_len`` samples,
    EXACT integer frame energies (sum of squares, int64), a frame is
    voiced iff energy > threshold, and segments are maximal voiced
    runs. speech_ratio is the one float (voiced/total, floor-form
    rounded to 6 decimals, expression mirrored in the oracle)."""
    import math

    import pandas as pd

    def kernel(batches: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_frames", "n_speech_frames",
                                   "n_segments", "speech_ratio")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                with wave.open(io.BytesIO(bytes(blob)), "rb") as wf:
                    if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
                        raise ValueError(
                            "VAD expects 16-bit mono PCM "
                            f"(got width {wf.getsampwidth()}, "
                            f"{wf.getnchannels()} ch)"
                        )
                    pcm = np.frombuffer(
                        wf.readframes(wf.getnframes()), dtype="<i2"
                    ).astype(np.int64)
                if len(pcm) == 0 or len(pcm) % frame_len:
                    raise ValueError(
                        f"{len(pcm)} samples not a whole positive "
                        f"number of {frame_len}-sample frames"
                    )
                frames = pcm.reshape(-1, frame_len)
                energies = (frames * frames).sum(axis=1)
                voiced = energies > energy_threshold
                n = len(voiced)
                nsp = int(voiced.sum())
                segs = int(np.count_nonzero(
                    voiced[1:] & ~voiced[:-1])) + int(voiced[0] if n else 0)
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n)
                out["n_speech_frames"].append(nsp)
                out["n_segments"].append(segs)
                out["speech_ratio"].append(
                    math.floor(nsp / n * 1_000_000 + 0.5) / 1_000_000
                )
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, VAD_SCHEMA)


def synthesize_mixed_blobs(df: DataFrame) -> DataFrame:
    """Deterministic MIXED-format source — the undifferentiated pile a
    corpus ingest actually receives: per ``doc_id`` one genuine payload
    whose format cycles jpeg/png/wav/flac/gif/pdf/zip/gzip/mp3/warc by
    doc_id % 10, each produced by the corresponding REAL encoder
    (queries/ext_multimodal.py:format_sniff_report)."""

    def kernel(batches: Iterator) -> Iterator:
        import gzip as _gzip

        import numpy as np
        import pandas as pd

        from ..operators.flac import encode_flac
        from ..operators.gif import encode_gif
        from ..operators.id3 import build_id3v2
        from ..operators.pdf import build_pdf
        from ..operators.web import encode_warc
        from ..operators.zipshard import write_zip_shard
        from .jpeg import encode_jpeg
        from .media_codecs import encode_png, encode_wav

        def blob_for(did: int) -> bytes:
            k = did % 10
            img = np.full((8, 8), did % 256, dtype=np.uint8)
            if k == 0:
                return encode_jpeg(img)
            if k == 1:
                return encode_png(img)
            if k == 2:
                return encode_wav(np.zeros(64), 8000)
            if k == 3:
                return encode_flac(np.zeros(64, dtype=np.int16), 8000)
            if k == 4:
                pal = np.stack([np.arange(256)] * 3, axis=1
                               ).astype(np.uint8)
                return encode_gif(img[None, :, :], pal)
            if k == 5:
                return build_pdf([[f"doc {did}"]])
            if k == 6:
                return write_zip_shard([{"key": "a", "txt": b"x"}])
            if k == 7:
                return _gzip.compress(f"line {did}\n".encode(), mtime=0)
            if k == 8:
                return build_id3v2(title=f"T{did}") + b"\xff\xfb\x90\x00"
            return encode_warc([{"type": "warcinfo", "uri": None,
                                 "payload": b"software: x\r\n"}])

        for pdf_batch in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf_batch["doc_id"]:
                did = int(doc_id)
                out["doc_id"].append(did)
                out["blob"].append(blob_for(did))
            yield pd.DataFrame(out)

    from ..sources.lake import widen

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def format_sniff_features(df: DataFrame) -> DataFrame:
    """(doc_id, blob) -> (doc_id, detected) through the corpus front
    door (media_codecs.sniff_payload) — the dispatch every mixed-pile
    ingest runs before routing payloads to their parsers."""
    import pandas as pd

    def kernel(batches: Iterator) -> Iterator:
        from .media_codecs import sniff_payload

        for pdf_batch in batches:
            yield pd.DataFrame({
                "doc_id": pdf_batch["doc_id"],
                "detected": [sniff_payload(bytes(b))
                             for b in pdf_batch["blob"]],
            })

    return df.select("doc_id", "blob").mapInPandas(
        kernel, "doc_id long, detected string"
    )
