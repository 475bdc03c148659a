"""Multimodal binary-column plumbing: schema, Arrow batch shape,
deterministic fake decode, and the stubbed real-codec path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.operators.multimodal import (
    attach_blob,
    decode_image_features,
    repartition_by_bytes,
    sample_frames,
)
from bigdata_meteo_datalake_spark.sources.lake import read_table

from .conftest import SF0001


@pytest.fixture(scope="module")
def media(spark):
    docs = read_table(spark, SF0001, "documents").limit(50)
    return attach_blob(docs)


def test_blob_schema_and_metadata(media):
    assert dict(media.dtypes)["blob"] == "binary"
    row = media.select("media_meta", F.length("blob").alias("n")).first()
    assert row["media_meta"]["media_type"] == "image"
    assert row["media_meta"]["n_bytes"] == row["n"]


def test_decode_image_features_deterministic(media):
    feats = decode_image_features(media, decode="fake")
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert len(rows) == 50
    again = {r["doc_id"]: r for r in decode_image_features(media).collect()}
    for k in rows:
        assert rows[k] == again[k]  # bytes -> features is pure
    r = next(iter(rows.values()))
    assert 64 <= r["width"] < 128 and 64 <= r["height"] < 128
    assert 0.0 <= r["mean_intensity"] <= 1.0


def test_decode_real_is_stubbed(media):
    with pytest.raises(Exception) as exc_info:
        decode_image_features(media, decode="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sampling_shape(media):
    frames = sample_frames(media, every_n_bytes=64, max_frames=3)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"doc_id", "frame_idx", "frame_hash"}
    per_doc = pdf.groupby("doc_id")["frame_idx"].agg(["min", "max", "count"])
    assert (per_doc["min"] == 0).all()
    assert (per_doc["count"] <= 3).all()
    assert pdf["frame_hash"].str.len().eq(32).all()


def test_repartition_by_bytes(media):
    total = media.select(F.sum(F.length("blob"))).first()[0]
    sized = repartition_by_bytes(media, target_bytes_per_partition=total // 4,
                                 total_bytes=total)
    assert sized.rdd.getNumPartitions() == 4


def test_resize_images_replaces_payload(media):
    from bigdata_meteo_datalake_spark.operators.multimodal import resize_images

    resized = resize_images(media, width=32, height=32)
    pdf = resized.toPandas()
    assert set(pdf.columns) == {"doc_id", "blob", "width", "height"}
    assert (pdf["width"] == 32).all() and (pdf["height"] == 32).all()
    assert pdf["blob"].map(len).eq(32 * 32 // 8).all()  # byte budget enforced
    again = resize_images(media, width=32, height=32).toPandas()
    assert pdf.sort_values("doc_id")["blob"].tolist() == again.sort_values("doc_id")["blob"].tolist()
    with pytest.raises(Exception) as e:
        resize_images(media, decode="real").collect()
    assert "NotImplementedError" in str(e.value) or isinstance(e.value, NotImplementedError)


def test_audio_features_deterministic(media):
    from bigdata_meteo_datalake_spark.operators.multimodal import audio_features

    feats = audio_features(media).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert set(feats.columns) == {"doc_id", "duration_s", "sample_rate", "rms"}
    assert (feats["sample_rate"] == 16_000).all()
    assert (feats["duration_s"] > 0).all()
    assert feats["rms"].between(0.0, 1.0).all()
    again = audio_features(media).toPandas().sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(feats, again)
    with pytest.raises(Exception) as e:
        audio_features(media, decode="real").collect()
    assert "NotImplementedError" in str(e.value) or isinstance(e.value, NotImplementedError)


# --- real stdlib codecs (BMP via struct+numpy, WAV via wave) -----------------


def _bmp_frame(spark, n=8, w=5, h=3):
    """n real BMP blobs with known pixels: doc i is a solid-gray w x h image
    of intensity 10*i (plus one padded-width image to exercise row padding)."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import encode_bmp

    rows = []
    for i in range(n):
        arr = np.full((h, w, 3), 10 * i, dtype=np.uint8)
        rows.append((i, bytearray(encode_bmp(arr))))
    return spark.createDataFrame(rows, "doc_id long, blob binary")


def test_real_bmp_decode_features(spark):
    df = _bmp_frame(spark, n=8, w=5, h=3)  # w=5 -> 15-byte rows pad to 16
    feats = {r["doc_id"]: r for r in
             decode_image_features(df, decode="real").collect()}
    assert len(feats) == 8
    for i, r in feats.items():
        assert (r["width"], r["height"]) == (5, 3)
        assert abs(r["mean_intensity"] - (10 * i) / 255.0) < 1e-12


def test_real_bmp_roundtrip_and_rowpadding():
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (5, 3), (4, 4), (33, 2)]:  # odd widths hit padding
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(arr))
        assert (out == arr).all(), f"BMP roundtrip mismatch at {w}x{h}"


def test_real_bmp_resize(spark):
    from bigdata_meteo_datalake_spark.operators.media_codecs import decode_bmp
    from bigdata_meteo_datalake_spark.operators.multimodal import resize_images

    df = _bmp_frame(spark, n=3, w=6, h=4)
    out = {r["doc_id"]: r for r in
           resize_images(df, width=3, height=2, decode="real").collect()}
    for i, r in out.items():
        assert (r["width"], r["height"]) == (3, 2)
        pix = decode_bmp(bytes(r["blob"]))
        assert pix.shape == (2, 3, 3)
        assert (pix == 10 * i).all()  # solid image stays solid through resize


def test_real_wav_decode_features(spark):
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import encode_wav
    from bigdata_meteo_datalake_spark.operators.multimodal import audio_features

    sr = 8000
    rows = []
    expected = {}
    for i, amp in enumerate([0.0, 0.25, 0.5]):
        # 1-second constant-amplitude square-ish signal: rms == amp exactly
        sig = np.full(sr, amp)
        rows.append((i, bytearray(encode_wav(sig, sr))))
        expected[i] = amp
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = {r["doc_id"]: r for r in audio_features(df, decode="real").collect()}
    assert len(out) == 3
    for i, r in out.items():
        assert r["sample_rate"] == sr
        assert abs(r["duration_s"] - 1.0) < 1e-9
        # 16-bit quantization: amp*32767/32768 within 1 LSB
        assert abs(r["rms"] - expected[i]) < 1e-3


def test_real_decode_rejects_unknown_formats(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"\x89PNG not really"))], "doc_id long, blob binary"
    )
    with pytest.raises(Exception) as exc_info:
        decode_image_features(df, decode="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


# --- real stdlib PNG codec ----------------------------------------------------


def test_real_png_roundtrip_all_filters_and_shapes():
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_png,
        encode_png,
        sniff_format,
    )

    rng = np.random.default_rng(11)
    shapes = [(1, 1), (5, 3), (7, 4, 3), (6, 6, 4), (2, 9, 3)]
    for shape in shapes:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in [0, 1, 2, 3, 4, "cycle"]:
            b = encode_png(arr, filter_type=ft)
            assert sniff_format(b) == "png"
            out = decode_png(b)
            assert out.shape == arr.shape and (out == arr).all(), (shape, ft)


def test_real_png_hand_computed_filter_vectors():
    """Pin the unfilter math against hand-computed scanlines (independent
    of encode_png, so a compensating encode/decode bug cannot pass):
    a PNG is assembled chunk by chunk in the test itself."""
    import struct
    import zlib

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import decode_png

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    magic = b"\x89PNG\r\n\x1a\n"
    # 3x2 grayscale: row0 Sub [10,5,250] -> [10,15,9] (wraps mod 256);
    # row1 Up [1,2,3] over [10,15,9] -> [11,17,12]
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    raw = bytes([1, 10, 5, 250]) + bytes([2, 1, 2, 3])
    png = magic + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    want = np.array([[10, 15, 9], [11, 17, 12]], dtype=np.uint8)
    assert (decode_png(png) == want).all()

    # 2x2 grayscale: row0 None [4,8]; row1 Average filt [3,7]:
    # x0: 3 + (0+4)//2 = 5 ; x1: 7 + (5+8)//2 = 13
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = bytes([0, 4, 8]) + bytes([3, 3, 7])
    png = magic + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    want = np.array([[4, 8], [5, 13]], dtype=np.uint8)
    assert (decode_png(png) == want).all()

    # 2x2 grayscale Paeth: row0 None [100,200]; row1 Paeth filt [10,20]:
    # x0: a=0 b=100 c=0 -> p=100, pa=100 pb=0 -> predictor b=100 -> 110
    # x1: a=110 b=200 c=100 -> p=210, pa=100 pb=10 pc=110 -> b=200 -> 220
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = bytes([0, 100, 200]) + bytes([4, 10, 20])
    png = magic + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    want = np.array([[100, 200], [110, 220]], dtype=np.uint8)
    assert (decode_png(png) == want).all()


def test_real_png_rejects_bad_crc_and_unsupported():
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_png,
        encode_png,
    )

    good = bytearray(encode_png(np.zeros((2, 2), dtype=np.uint8)))
    # flip a byte inside the IDAT chunk data (signature 8 + IHDR chunk 25,
    # then past the IDAT length+type header) so its CRC no longer matches
    bad = bytearray(good)
    bad[8 + 25 + 8 + 2] ^= 0x01
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))

    # Adam7 interlace is SUPPORTED since round 7: a minimal 1x1
    # interlaced stream (only pass 1 carries the pixel) must decode
    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)  # Adam7
    raw = bytes([0, 7])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert decode_png(png).tolist() == [[7]]

    # palette (color type 3) is SUPPORTED since round 8 — but a palette
    # stream with no PLTE chunk is malformed, not a boundary
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)  # palette
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="PLTE"):
        decode_png(png)

    # every LEGAL depth/color combination decodes since round 8; an
    # ILLEGAL one (depth 2 RGB) is malformed -> ValueError
    ihdr = struct.pack(">IIBBBBB", 1, 1, 2, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes([0, 7])))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="depth"):
        decode_png(png)
    # 16-bit gray decodes, as uint16, big-endian
    import numpy as _np
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes([0, 0x12, 0x34])))
        + chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.dtype == _np.uint16 and out.tolist() == [[0x1234]]


def test_real_png_decode_features_and_resize(spark):
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_png,
        encode_png,
    )
    from bigdata_meteo_datalake_spark.operators.multimodal import resize_images

    rows = []
    for i in range(6):
        arr = np.full((4, 6, 3), 20 * i, dtype=np.uint8)
        rows.append((i, bytearray(encode_png(arr, filter_type="cycle"))))
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    feats = {r["doc_id"]: r for r in
             decode_image_features(df, decode="real").collect()}
    assert len(feats) == 6
    for i, r in feats.items():
        assert (r["width"], r["height"]) == (6, 4)
        assert abs(r["mean_intensity"] - (20 * i) / 255.0) < 1e-12

    out = {r["doc_id"]: r for r in
           resize_images(df, width=3, height=2, decode="real").collect()}
    for i, r in out.items():
        pix = decode_png(bytes(r["blob"]))
        assert pix.shape == (2, 3, 3) and (pix == 20 * i).all()


def test_real_mixed_bmp_png_batch(spark):
    """One Arrow batch with BOTH formats: the sniffing dispatch must pick
    the right codec per blob, not per batch."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        encode_bmp,
        encode_png,
    )

    rows = [
        (0, bytearray(encode_bmp(np.full((3, 5, 3), 40, dtype=np.uint8)))),
        (1, bytearray(encode_png(np.full((2, 4), 80, dtype=np.uint8)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary").coalesce(1)
    feats = {r["doc_id"]: r for r in
             decode_image_features(df, decode="real").collect()}
    assert (feats[0]["width"], feats[0]["height"]) == (5, 3)
    assert abs(feats[0]["mean_intensity"] - 40 / 255.0) < 1e-12
    assert (feats[1]["width"], feats[1]["height"]) == (4, 2)
    assert abs(feats[1]["mean_intensity"] - 80 / 255.0) < 1e-12


def test_real_png_roundtrip_hypothesis():
    """Property fuzz: ANY uint8 array round-trips through encode/decode
    under ANY filter choice (spark-free, pure codec)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_png,
        encode_png,
    )

    shapes = st.one_of(
        st.tuples(st.integers(1, 9), st.integers(1, 9)),
        st.tuples(st.integers(1, 9), st.integers(1, 9), st.sampled_from([3, 4])),
    )

    @settings(max_examples=60, deadline=None)
    @given(
        shape=shapes,
        ft=st.sampled_from([0, 1, 2, 3, 4, "cycle"]),
        data=st.data(),
    )
    def inner(shape, ft, data):
        arr = data.draw(arrays(dtype=np.uint8, shape=shape))
        out = decode_png(encode_png(arr, filter_type=ft))
        assert out.shape == arr.shape and (out == arr).all()

    inner()


# --- real stdlib JPEG codec ---------------------------------------------------


def _jpeg_tiles(did: int):
    """The synthesize_jpeg_blobs closed form, recomputed independently."""
    import numpy as np

    w, h = 9 + did % 16, 9 + did % 12
    bx = np.arange(w)[None, :] // 8
    by = np.arange(h)[:, None] // 8
    arr = ((did * 31 + bx * 7 + by * 13) % 256).astype(np.uint8)
    if did % 2 == 0:
        arr = np.stack([arr, arr, arr], axis=2)
    return arr


def test_real_jpeg_blockconstant_bitexact():
    """The oracle's whole premise: block-constant fixtures at quality 75
    round-trip BIT-exactly through the lossy codec (DC step 8 divides
    8*(v-128); R=G=B keeps chroma at exactly 128). Covers every distinct
    (w, h, parity) fixture shape — 48 width/height combos x both color
    modes via doc_id 0..95."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    for did in range(96):
        arr = _jpeg_tiles(did)
        out = decode_jpeg(encode_jpeg(arr, quality=75))
        assert out.shape == arr.shape, did
        assert (out == arr).all(), did
        assert np.asarray(out).dtype == np.uint8


def test_real_jpeg_lossy_roundtrip_close():
    """General (non-block-constant) content is lossy but must stay close:
    a smooth gradient at quality 90 reconstructs within a few gray
    levels, and a random image survives encode->decode with the right
    shape and bounded mean error (crash-freedom for arbitrary pixels)."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    y, x = np.mgrid[0:24, 0:31]
    grad = ((x * 5 + y * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(grad, quality=90))
    err = np.abs(out.astype(int) - grad.astype(int))
    assert err.mean() < 8.0 and err.max() < 64

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, size=(17, 13, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=75))
    assert out.shape == noise.shape
    assert np.abs(out.astype(int) - noise.astype(int)).mean() < 48.0


def test_real_jpeg_rejects_nonbaseline_and_truncated():
    import pytest

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    good = bytearray(encode_jpeg(_jpeg_tiles(1), quality=75))
    # flip SOF0 (0xC0) to SOF2: progressive is SUPPORTED since round 8,
    # but a full-band (Ss=0, Se=63) scan inside a progressive frame is
    # malformed per T.81 G.1 -> ValueError
    sof = good.find(b"\xff\xc0")
    assert sof >= 0
    prog = bytearray(good)
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(prog))
    # a genuinely unsupported coding process (SOF5 differential
    # sequential) still raises the declared NotImplementedError;
    # SOF3 lossless is SUPPORTED since round 9, so the flipped frame
    # now fails as a malformed lossless scan (Ss=0 predictor) instead
    diff_seq = bytearray(good)
    diff_seq[sof + 1] = 0xC5
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(diff_seq))
    lossless = bytearray(good)
    lossless[sof + 1] = 0xC3
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg(bytes(lossless))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_real_jpeg_decode_features_and_resize(spark):
    """Spark dispatch: synthesized JPEG blobs flow through the production
    real-decode kernel (dims + exact closed-form mean) and through
    resize_images (decode -> nearest resize -> JPEG re-encode)."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_jpeg,
        sniff_format,
    )
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        resize_images,
        synthesize_jpeg_blobs,
    )

    d = read_table(spark, SF0001, "documents").limit(24)
    jpegs = synthesize_jpeg_blobs(d)
    feats = {
        r["doc_id"]: r
        for r in decode_image_features(jpegs, decode="real").collect()
    }
    for did, r in feats.items():
        arr = _jpeg_tiles(did)
        assert (r["width"], r["height"]) == (arr.shape[1], arr.shape[0])
        assert r["mean_intensity"] == float(arr.mean()) / 255.0

    resized = resize_images(jpegs, width=8, height=8, decode="real").collect()
    for r in resized:
        b = bytes(r["blob"])
        assert sniff_format(b) == "jpeg"
        pix = decode_jpeg(b)
        assert pix.shape[:2] == (8, 8)
        # nearest-resize of the source tiles, re-encoded lossily: the
        # resized image is still block-aligned piecewise data, so the
        # re-decode stays within JPEG quantization error of it
        src = _jpeg_tiles(r["doc_id"])
        yi = (np.arange(8) * src.shape[0] // 8).clip(0, src.shape[0] - 1)
        xi = (np.arange(8) * src.shape[1] // 8).clip(0, src.shape[1] - 1)
        want = src[yi][:, xi]
        assert np.abs(pix.astype(int) - want.astype(int)).mean() < 32.0


def test_real_jpeg_phash_dispatch(spark):
    """image_phash_bands(decode='real') accepts JPEG blobs and produces
    the same bands as on the equivalent losslessly-carried pixels."""
    from bigdata_meteo_datalake_spark.operators.media_codecs import encode_png
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        image_phash_bands,
        synthesize_jpeg_blobs,
    )

    d = read_table(spark, SF0001, "documents").limit(16)
    via_jpeg = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in image_phash_bands(
            synthesize_jpeg_blobs(d), decode="real"
        ).collect()
    }
    rows = [
        (did, bytearray(encode_png(_jpeg_tiles(did))))
        for did in via_jpeg
    ]
    pngs = spark.createDataFrame(rows, "doc_id long, blob binary")
    via_png = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in image_phash_bands(pngs, decode="real").collect()
    }
    assert via_jpeg == via_png


def test_real_jpeg_blockconstant_fuzz():
    """Property fuzz of the exactness claim itself: ANY 8-aligned-tile
    image whose tiles are arbitrary random values round-trips bit-exactly
    at quality 75 (gray, and RGB with R=G=B)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 26),
        h=st.integers(1, 22),
        rgb=st.booleans(),
        seed=st.integers(0, 2**31),
    )
    def inner(w, h, rgb, seed):
        rng = np.random.default_rng(seed)
        tiles = rng.integers(0, 256, size=((h + 7) // 8, (w + 7) // 8))
        arr = tiles.repeat(8, axis=0).repeat(8, axis=1)[:h, :w].astype(np.uint8)
        if rgb:
            arr = np.stack([arr] * 3, axis=2)
        out = decode_jpeg(encode_jpeg(arr, quality=75))
        assert out.shape == arr.shape and (out == arr).all()

    inner()


def test_jpeg_arith_table_pins_and_register_traces():
    """QM-coder (round-9): Table D.3 spot-pinned against published
    values with structural invariants over the whole state machine, and
    the encoder/decoder register flows hand-traced step by step from
    the T.81 Annex D flowcharts (independent of encode/decode
    symmetry)."""
    from bigdata_meteo_datalake_spark.operators.jpeg_arith import (
        _ARITH_TAB,
        ArithDecoder,
        ArithEncoder,
        FIXED_STATE,
    )

    # published spot values
    assert len(_ARITH_TAB) == 114
    assert _ARITH_TAB[0][0] == 0x5A1D and _ARITH_TAB[1][0] == 0x2586
    assert _ARITH_TAB[13][0] == 0x0001  # smallest Qe
    assert _ARITH_TAB[112][0] == 0x59EB
    assert _ARITH_TAB[113] == (0x5A1D, 113, 113, 0)  # fixed half-prob bin
    # structural invariants of the published estimation machine
    switches = {i for i, (_, _, _, sw) in enumerate(_ARITH_TAB) if sw}
    assert switches == {0, 14, 36, 64, 80, 88, 95, 105, 110, 112}
    for i, (qe, nmps, nlps, _sw) in enumerate(_ARITH_TAB):
        assert 0 < qe < 0x8000, i
        assert 0 <= nmps <= 113 and 0 <= nlps <= 113, i
        # MPS success never raises the LPS estimate
        assert _ARITH_TAB[nmps][0] <= qe, i
        # LPS always raises it, except at a switch (MPS sense flips)
        if i not in switches and i != FIXED_STATE:
            assert _ARITH_TAB[nlps][0] >= qe, i

    # hand-traced ENCODER registers (D.1.3/D.1.6 flowcharts, state 0,
    # Qe=0x5A1D): MPS with A still >= 0x8000 changes nothing but A;
    # then an LPS hits the conditional-exchange branch, switches the
    # MPS sense, moves to NLPS=1, and renormalizes once.
    enc = ArithEncoder()
    st = bytearray([0])
    enc.encode(st, 0, 0)
    assert (enc.a, enc.c, enc.ct) == (0xA5E3, 0, 11)
    assert st[0] == 0  # no renormalization -> no estimation change
    enc.encode(st, 0, 1)
    assert (enc.a, enc.c, enc.ct) == (0x978C, 0, 10)
    assert st[0] == 0x80 | 1  # switched MPS, Next_Index_LPS = 1

    # hand-traced DECODER registers over the bytes AB CD EF: INITDEC
    # loads C=0xABCD, A=0x10000; the first decision falls in the upper
    # (Qe) region -> LPS, C -= (A-Qe), switch, A=Qe; the second decision
    # renormalizes (one byte feed), lands in the lower region with
    # A >= 0x8000 -> MPS with NO estimation update.
    dec = ArithDecoder(b"\xab\xcd\xef", 0)
    st = bytearray([0])
    assert dec.decode(st, 0) == 1
    assert (dec.a, dec.c, dec.ct) == (0x5A1D, 0x05EA, 0)
    assert st[0] == 0x80 | 1
    assert dec.decode(st, 0) == 1
    assert (dec.a, dec.c, dec.ct) == (0x8EB4, 0x5EAEF, 7)
    assert st[0] == 0x80 | 1

    # coder self-consistency on raw decision streams: random bits over
    # several adaptive contexts + the fixed bin round-trip exactly
    import numpy as np

    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, size=500).tolist()
    ctxs = rng.integers(0, 4, size=500).tolist()
    enc = ArithEncoder()
    st = bytearray(4)
    fixed = bytearray([FIXED_STATE])
    for b_, cx in zip(bits, ctxs):
        enc.encode(st if cx < 3 else fixed, cx if cx < 3 else 0, b_)
    data = enc.flush()
    dec = ArithDecoder(data + b"\xff\xd9", 0)
    st2 = bytearray(4)
    fixed2 = bytearray([FIXED_STATE])
    got = [
        dec.decode(st2 if cx < 3 else fixed2, cx if cx < 3 else 0)
        for cx in ctxs
    ]
    assert got == bits
    assert st2[:3] == st[:3]


def test_real_jpeg_arithmetic_roundtrips():
    """Arithmetic-coded JPEG (round-9): SOF9/SOF10 decode the QM
    entropy layer bit-exactly — block-constant fixtures roundtrip
    exactly across gray/RGB, every subsampling, restart intervals,
    progressive scan scripts, and 12-bit precision; on arbitrary images
    the arithmetic decode equals the Huffman decode (identical
    coefficients, different entropy layer only); arithmetic output is
    smaller than Huffman on real payloads."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    def tiles(h, w, seed, rgb=False, depth=256):
        r = np.random.default_rng(seed)
        t = r.integers(0, depth, size=((h + 7) // 8, (w + 7) // 8))
        a = t.repeat(8, axis=0).repeat(8, axis=1)[:h, :w]
        a = a.astype(np.uint8 if depth == 256 else np.uint16)
        return np.stack([a] * 3, axis=2) if rgb else a

    for seed, (h, w) in enumerate([(8, 8), (9, 17), (24, 31), (1, 1)]):
        for rgb in (False, True):
            for prog in (False, True):
                for sub in ("444", "420", "422") if rgb else ("444",):
                    for rst in (0, 2):
                        img = tiles(h, w, seed, rgb)
                        b = encode_jpeg(
                            img, arithmetic=True, progressive=prog,
                            subsampling=sub, restart_interval=rst,
                        )
                        got = decode_jpeg(b)
                        assert got.shape == img.shape
                        assert (got == img).all(), (h, w, rgb, prog, sub, rst)

    # 12-bit SOF9/SOF10
    img12 = tiles(17, 13, 5, depth=4096)
    for prog in (False, True):
        got = decode_jpeg(
            encode_jpeg(img12, precision=12, arithmetic=True, progressive=prog)
        )
        assert got.dtype == np.uint16 and (got == img12).all()

    # arbitrary (lossy) content: entropy layers must agree exactly
    rng = np.random.default_rng(3)
    for shape in [(16, 16), (21, 19)]:
        noise = rng.integers(0, 256, size=shape, dtype=np.uint8)
        d_h = decode_jpeg(encode_jpeg(noise, quality=90))
        b_a = encode_jpeg(noise, quality=90, arithmetic=True)
        assert np.array_equal(decode_jpeg(b_a), d_h)
        assert len(b_a) < len(encode_jpeg(noise, quality=90))


def test_real_jpeg_arithmetic_sa_script_and_dac():
    """Hand-assembled SOF10 successive-approximation scan script (DC
    first/refine + AC first/refine through the arithmetic models) and a
    NON-default DAC conditioning (U=2, Kx=16) honored by the decoder."""
    import struct

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        _M,
        _ZIGZAG,
        decode_jpeg,
    )
    from bigdata_meteo_datalake_spark.operators.jpeg_arith import (
        ArithScanEncoder,
    )

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def build(dc_cond, ac_cond, dac_payload):
        zz = np.zeros(64, dtype=np.int64)
        zz[0], zz[1], zz[3] = 7, 5, -3
        out = bytearray(b"\xff\xd8")
        out += seg(0xDB, bytes([0]) + np.ones(64, dtype=np.uint8).tobytes())
        out += seg(0xCA, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        out += seg(0xCC, dac_payload)

        def sos(ss, se, ah, al):
            return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

        e = ArithScanEncoder(1, [0], [], dc_cond, ac_cond)
        e.dc_first(0, 0, zz, 1)
        out += sos(0, 0, 0, 1) + e.finish()
        e = ArithScanEncoder(1, [0], [], dc_cond, ac_cond)
        e.dc_refine(zz, 0)
        out += sos(0, 0, 1, 0) + e.finish()
        e = ArithScanEncoder(1, [], [0], dc_cond, ac_cond)
        e.ac_first(0, zz, 1, 63, 1)
        out += sos(1, 63, 0, 1) + e.finish()
        e = ArithScanEncoder(1, [], [0], dc_cond, ac_cond)
        e.ac_refine(0, zz, 1, 63, 1, 0)
        out += sos(1, 63, 1, 0) + e.finish()
        out += b"\xff\xd9"

        block = np.zeros(64, dtype=np.int64)
        block[_ZIGZAG] = zz
        want = _M.T @ block.reshape(8, 8).astype(np.float64) @ _M + 128.0
        want = np.clip(np.rint(want), 0, 255).astype(np.uint8)
        return bytes(out), want

    # default conditioning
    b, want = build({0: (0, 1)}, {0: 5}, bytes([0x00, 0x10, 0x10, 5]))
    assert np.array_equal(decode_jpeg(b), want)
    # non-default conditioning: encoder and DAC agree -> exact decode
    b, want = build({0: (1, 2)}, {0: 16}, bytes([0x00, 0x21, 0x10, 16]))
    assert np.array_equal(decode_jpeg(b), want)


def test_real_jpeg_lossless_roundtrips(spark):
    """Lossless JPEG (SOF3, round-9): bit-exact on ARBITRARY images —
    all seven predictors, 2/8/12/16-bit precision, RGB coded with no
    color transform, restart intervals, point transform, a hand-built
    stream pinning the modulo-2^16 difference arithmetic, rejection of
    malformed scans — then the production kernel over synthesized
    blobs."""
    import struct

    import numpy as np
    import pytest

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        _DC_LL,
        _huff_encode_table,
        _BitWriter,
        _category,
        _mag_bits,
        _seg,
        decode_jpeg,
        encode_jpeg_lossless,
        jpeg_precision,
    )
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        decode_image_features,
        synthesize_jpeg_lossless_blobs,
    )

    rng = np.random.default_rng(47)
    for shape, p in [((13, 17), 8), ((9, 9), 12), ((21, 5), 16),
                     ((1, 1), 8), ((8, 24), 2)]:
        img = rng.integers(0, 1 << p, size=shape)
        img = img.astype(np.uint16 if p > 8 else np.uint8)
        for pred in range(1, 8):
            b = encode_jpeg_lossless(img, precision=p, predictor=pred)
            got = decode_jpeg(b)
            assert got.shape == img.shape and (got == img).all(), (shape, p, pred)
            assert jpeg_precision(b) == p

    rgb = rng.integers(0, 256, size=(14, 11, 3)).astype(np.uint8)
    assert (decode_jpeg(encode_jpeg_lossless(rgb)) == rgb).all()

    img = rng.integers(0, 256, size=(10, 10)).astype(np.uint8)
    for ri in (1, 3, 7):
        assert (decode_jpeg(encode_jpeg_lossless(img, restart_interval=ri))
                == img).all(), ri

    img16 = rng.integers(0, 65536, size=(6, 7)).astype(np.uint16)
    got = decode_jpeg(encode_jpeg_lossless(img16, precision=16,
                                           point_transform=3))
    assert (got == (img16 >> 3) << 3).all()

    # hand-built 2x2 stream, predictor 1, pinning the Annex H rules:
    # (0,0) predicts 128 (2^7), (0,1) predicts Ra, row 1 col 0 predicts
    # Rb, (1,1) predicts Ra; diffs wrap modulo 2^16
    enc = _huff_encode_table(*_DC_LL)
    bw = _BitWriter()
    want = [[200, 50], [10, 250]]
    preds = [128, 200, 200, 10]
    for v, px in zip([200, 50, 10, 250], preds):
        d = (v - px) & 0xFFFF
        if d >= 32768:
            d -= 65536
        t = _category(d)
        code, ln = enc[t]
        bw.write(code, ln)
        if t:
            bw.write(_mag_bits(d, t), t)
    bw.flush()
    out = bytearray(b"\xff\xd8")
    out += _seg(0xC3, struct.pack(">BHHB", 8, 2, 2, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00] + _DC_LL[0] + _DC_LL[1]))
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 0, 0]))
    out += bw.out + b"\xff\xd9"
    assert decode_jpeg(bytes(out)).tolist() == want

    # malformed: predictor 0 and Se != 0 raise
    bad = bytearray(out)
    sos = bytes(out).find(b"\xff\xda")
    bad[sos + 7] = 0  # Ss (predictor) = 0
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg(bytes(bad))
    bad = bytearray(out)
    bad[sos + 8] = 63  # Se = 63 in a lossless scan
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError):
        encode_jpeg_lossless(img, predictor=9)

    # production kernel over synthesized blobs matches the closed form
    d = read_table(spark, SF0001, "documents").limit(21)
    feats = {r["doc_id"]: r for r in decode_image_features(
        synthesize_jpeg_lossless_blobs(d), decode="real").collect()}
    for did, r in feats.items():
        w, h = 8 + did % 15, 8 + did % 11
        p2 = (256, 4096, 65536)[did % 3]
        ch = 3 if did % 2 == 0 else 1
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        s = sum(int(((did * 53 + x * 19 + y * 31 + c * 7) % p2).sum())
                for c in range(ch))
        want_mean = (s / (w * h * ch)) / (p2 - 1)
        assert (r["width"], r["height"]) == (w, h)
        assert abs(r["mean_intensity"] - want_mean) < 1e-15, did


def test_real_jpeg_arithmetic_rejects_corrupt():
    """Fuzz the arithmetic decode contract: truncations and random byte
    flips raise ValueError/NotImplementedError (never IndexError /
    struct.error, never a hang)."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = (np.arange(24 * 24, dtype=np.int64) % 256).astype(np.uint8).reshape(24, 24)
    good = encode_jpeg(img, arithmetic=True)
    decode_jpeg(good)  # sanity
    rng = np.random.default_rng(17)
    for cut in (4, len(good) // 3, len(good) - 2):
        try:
            decode_jpeg(good[:cut])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(60):
        mut = bytearray(good)
        i = int(rng.integers(2, len(mut)))
        mut[i] = int(rng.integers(0, 256))
        try:
            decode_jpeg(bytes(mut))
        except (ValueError, NotImplementedError):
            pass
    # invalid DAC bounds raise loudly
    import pytest

    bad = bytearray(good)
    dac = bad.find(b"\xff\xcc")
    assert dac > 0
    bad[dac + 5] = 0x01  # DC conditioning L=1 > U=0
    with pytest.raises(ValueError, match="conditioning"):
        decode_jpeg(bytes(bad))


# --- ISO-BMFF (MP4) container metadata ----------------------------------------


def test_mp4_skeleton_roundtrip_both_versions():
    """parse_mp4 recovers every field encode_mp4_skeleton wrote, through
    both the 32-bit (v0) and 64-bit (v1) mvhd/mdhd time layouts."""
    from bigdata_meteo_datalake_spark.operators.mp4 import (
        encode_mp4_skeleton,
        parse_mp4,
    )

    tracks = [
        {"track_id": 1, "handler": "vide", "timescale": 600, "duration": 2592},
        {"track_id": 2, "handler": "soun", "timescale": 44100, "duration": 190512},
    ]
    for ver in (0, 1):
        m = parse_mp4(
            encode_mp4_skeleton(
                timescale=1000, duration=4321, tracks=tracks, version=ver
            )
        )
        assert (m["brand"], m["timescale"], m["duration"]) == ("isom", 1000, 4321)
        assert m["tracks"] == [
            {"track_id": 1, "timescale": 600, "duration": 2592, "handler": "vide"},
            {"track_id": 2, "timescale": 44100, "duration": 190512,
             "handler": "soun"},
        ]


def test_mp4_64bit_duration_survives():
    """A duration beyond 2^32 forces the largeint path in v1 boxes."""
    from bigdata_meteo_datalake_spark.operators.mp4 import (
        encode_mp4_skeleton,
        parse_mp4,
    )

    big = 2**40 + 17
    m = parse_mp4(
        encode_mp4_skeleton(
            timescale=90000, duration=big,
            tracks=[{"track_id": 1, "handler": "vide", "timescale": 90000,
                     "duration": big}],
            version=1,
        )
    )
    assert m["duration"] == big and m["tracks"][0]["duration"] == big


def test_mp4_rejects_garbage_and_truncation():
    from bigdata_meteo_datalake_spark.operators.mp4 import (
        encode_mp4_skeleton,
        parse_mp4,
    )

    with pytest.raises(ValueError):
        parse_mp4(b"\x00\x00\x00\x08free" * 4)  # no ftyp
    good = encode_mp4_skeleton(
        timescale=1000, duration=100,
        tracks=[{"track_id": 1, "handler": "vide", "timescale": 600,
                 "duration": 60}],
    )
    with pytest.raises(ValueError):
        parse_mp4(good[:40])  # moov overruns the truncated buffer
    # ftyp alone, no moov -> not a movie
    with pytest.raises(ValueError):
        parse_mp4(good[:24])


def test_mp4_sniff_and_probe_kernel(spark):
    """Spark plumbing: synthesized MP4 blobs sniff as 'mp4' and the probe
    kernel's per-track rows match the closed form."""
    from bigdata_meteo_datalake_spark.operators.media_codecs import sniff_format
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        probe_media_containers,
        synthesize_mp4_blobs,
    )

    d = read_table(spark, SF0001, "documents").limit(20)
    mp4s = synthesize_mp4_blobs(d)
    one = mp4s.first()
    assert sniff_format(bytes(one["blob"])) == "mp4"
    rows = probe_media_containers(mp4s).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, trs in by_doc.items():
        assert len(trs) == 1 + did % 3
        for r in sorted(trs, key=lambda r: r["track_id"]):
            k = r["track_id"] - 1
            assert r["duration_s"] == (500 + did % 5000) / 1000
            assert r["handler"] == ("vide" if k % 2 == 0 else "soun")
            assert r["track_seconds"] == (
                (1000 + (did * 7 + k * 13) % 100000)
                / (600 + 100 * ((did + k) % 4))
            )


def test_probe_rejects_non_mp4(spark):
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        probe_media_containers,
    )

    df = spark.createDataFrame(
        [(0, bytearray(b"RIFF....WAVEfmt "))], "doc_id long, blob binary"
    )
    with pytest.raises(Exception) as exc_info:
        probe_media_containers(df).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


# --- malformed-input contract: clean errors, no leaks, no hangs ---------------


def _assert_clean(fn, payload):
    """Decoding malformed bytes must either succeed or raise the declared
    ValueError/NotImplementedError — never IndexError/KeyError/
    struct.error, and never hang (the sweep itself is the time bound)."""
    try:
        fn(payload)
    except (ValueError, NotImplementedError):
        pass


def test_codecs_reject_malformed_input_cleanly():
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_bmp,
        decode_gif,
        decode_png,
        decode_tiff,
        decode_wav,
        encode_bmp,
        encode_bmp_palette,
        encode_gif,
        encode_png,
        encode_tiff,
        encode_wav,
        encode_wav_g711,
    )
    from bigdata_meteo_datalake_spark.operators.mp4 import (
        encode_mp4_skeleton,
        parse_mp4,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(12, 17, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    goods = [
        (decode_jpeg, encode_jpeg(img, quality=75)),
        (decode_jpeg, encode_jpeg(img, quality=75, subsampling="420",
                                  restart_interval=2)),
        (decode_jpeg, encode_jpeg(img, quality=75, subsampling="420",
                                  progressive=True)),
        (decode_jpeg, encode_jpeg(
            (img.astype(np.uint16) * 16), quality=75, precision=12)),
        (decode_png, encode_png(img, filter_type="cycle")),
        (decode_png, encode_png(img[:, :, 0] % 16, filter_type="cycle",
                                palette=pal)),
        (decode_bmp, encode_bmp(img)),
        (decode_bmp, encode_bmp_palette(
            rng.integers(0, 16, size=(9, 14), dtype=np.uint8),
            rng.integers(0, 256, size=(16, 3), dtype=np.uint8), rle=True)),
        (decode_gif, encode_gif(
            rng.integers(0, 16, size=(3, 10, 12), dtype=np.uint8),
            rng.integers(0, 256, size=(16, 3), dtype=np.uint8),
            interlace=True, transparent=3)),
        (decode_tiff, encode_tiff(img, byteorder=">", packbits=True,
                                  rows_per_strip=3)),
        (decode_wav, encode_wav(rng.uniform(-1, 1, 300), 8000)),
        (decode_wav, encode_wav_g711(
            rng.integers(0, 256, size=200, dtype=np.uint8), 8000,
            law="alaw")),
        (parse_mp4, encode_mp4_skeleton(
            timescale=1000, duration=777,
            tracks=[{"track_id": 1, "handler": "vide", "timescale": 600,
                     "duration": 450}],
        )),
    ]
    for fn, good in goods:
        # truncation sweep
        for cut in range(0, len(good), 3):
            _assert_clean(fn, good[:cut])
        # single-bit flips at every 5th byte position
        for i in range(0, len(good), 5):
            mutated = bytearray(good)
            mutated[i] ^= 1 << int(rng.integers(8))
            _assert_clean(fn, bytes(mutated))
        # random multi-byte garbage splices
        for _ in range(40):
            mutated = bytearray(good)
            start = int(rng.integers(0, max(1, len(mutated) - 8)))
            mutated[start : start + 8] = rng.integers(
                0, 256, size=8, dtype=np.uint8
            ).tobytes()
            _assert_clean(fn, bytes(mutated))


def test_jpeg_flipped_dimension_terminates_quickly():
    """A corrupted SOF height field must not send the decoder into a
    multi-minute all-1-bits decode: entropy exhaustion raises within the
    padding cap."""
    import time

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    good = bytearray(encode_jpeg(np.full((8, 8), 50, dtype=np.uint8)))
    sof = good.find(b"\xff\xc0")
    # SOF0 payload: len(2) precision(1) height(2) width(2) — blow height up
    good[sof + 5] = 0xFF
    good[sof + 6] = 0xFF
    t0 = time.time()
    try:
        decode_jpeg(bytes(good))
    except ValueError:
        pass
    assert time.time() - t0 < 30.0


def test_real_jpeg_restart_markers_roundtrip():
    """DRI/RSTn: the decoder's restart path (byte re-align, DC predictor
    reset) round-trips bit-exactly on block-constant fixtures for every
    restart interval, including ones that force the D0..D7 cycle to
    wrap."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(13)
    tiles = rng.integers(0, 256, size=(4, 5))
    arr = tiles.repeat(8, 0).repeat(8, 1).astype(np.uint8)  # 32x40: 20 MCUs
    for ri in (1, 2, 3, 7):  # ri=1 over 20 MCUs wraps the RST cycle twice
        b = encode_jpeg(arr, quality=75, restart_interval=ri)
        assert b"\xff\xdd" in b
        out = decode_jpeg(b)
        assert (out == arr).all(), ri
    rgbarr = np.stack([arr] * 3, axis=2)
    out = decode_jpeg(encode_jpeg(rgbarr, quality=75, restart_interval=3))
    assert (out == rgbarr).all()


def test_mp4_parser_ignores_noise_boxes_hypothesis():
    """Property: planted mvhd/trak metadata is recovered regardless of
    unknown/noise boxes (free, skip, uuid, mdat payloads) spliced between
    the real ones at top level and inside moov — the parser must walk
    sizes, not assume adjacency."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bigdata_meteo_datalake_spark.operators.mp4 import (
        encode_mp4_skeleton,
        parse_mp4,
    )

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + btype + payload

    noise_types = [b"free", b"skip", b"uuid", b"wide"]

    @settings(max_examples=40, deadline=None)
    @given(
        ts=st.integers(1, 2**31),
        dur=st.integers(0, 2**31),
        n_tracks=st.integers(1, 4),
        ver=st.sampled_from([0, 1]),
        noise=st.lists(
            st.tuples(st.sampled_from(noise_types), st.binary(max_size=24)),
            max_size=4,
        ),
        data=st.data(),
    )
    def inner(ts, dur, n_tracks, ver, noise, data):
        tracks = [
            {"track_id": k + 1, "handler": "vide" if k % 2 == 0 else "soun",
             "timescale": 100 + k, "duration": dur + k}
            for k in range(n_tracks)
        ]
        good = encode_mp4_skeleton(
            timescale=ts, duration=dur, tracks=tracks, version=ver
        )
        # splice noise boxes between top-level boxes: after ftyp, after
        # moov, and (valid per ISO-BMFF) inside moov before mvhd is NOT
        # exercised here — moov interior order is preserved, exterior is
        # scrambled with noise
        (ftyp_len,) = struct.unpack_from(">I", good, 0)
        ftyp, rest = good[:ftyp_len], good[ftyp_len:]
        parts = [ftyp]
        for t, payload in noise:
            parts.append(box(t, payload))
        insert_at = data.draw(st.integers(0, len(parts)))
        parts.insert(max(1, insert_at), rest)  # keep ftyp first
        m = parse_mp4(b"".join(parts))
        assert (m["timescale"], m["duration"]) == (ts, dur)
        assert len(m["tracks"]) == n_tracks
        for k, t in enumerate(m["tracks"]):
            assert t["handler"] == ("vide" if k % 2 == 0 else "soun")
            assert (t["timescale"], t["duration"]) == (100 + k, dur + k)

    inner()


def test_real_png_adam7_hand_built_stream():
    """Decoder against the SPEC, independent of our encoder: an 8x8
    grayscale Adam7 stream is assembled by hand from the published pass
    layout (pass k extracts pixels at (x0 + i*dx, y0 + j*dy)), filter 0
    on every row. A compensating encoder/decoder layout bug cannot pass
    this."""
    import struct
    import zlib

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import decode_png

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)  # pixel = y*8 + x
    passes = [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        for row in sub:
            raw.append(0)  # filter None
            raw.extend(row.tobytes())

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == img).all()


def test_real_png_adam7_roundtrip_and_fake_agreement(spark):
    """Adam7 streams flow through the production Spark decode path
    exactly like non-interlaced ones (sniffed identically), and the two
    encodings of the same pixels decode to identical features."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        encode_png,
        sniff_format,
    )

    rng = np.random.default_rng(21)
    rows_plain, rows_adam = [], []
    for i in range(12):
        arr = rng.integers(0, 256, size=(5 + i, 7 + i, 3), dtype=np.uint8)
        rows_plain.append((i, bytearray(encode_png(arr, filter_type="cycle"))))
        rows_adam.append(
            (i, bytearray(encode_png(arr, filter_type="cycle", interlace=True)))
        )
    assert sniff_format(bytes(rows_adam[0][1])) == "png"
    schema = "doc_id long, blob binary"
    plain = decode_image_features(
        spark.createDataFrame(rows_plain, schema), decode="real"
    ).collect()
    adam = decode_image_features(
        spark.createDataFrame(rows_adam, schema), decode="real"
    ).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    for a, b in zip(sorted(plain, key=key), sorted(adam, key=key)):
        assert (a["width"], a["height"], a["mean_intensity"]) == (
            b["width"], b["height"], b["mean_intensity"]
        )


def test_png_bomb_guard_rejects_before_allocating():
    """Resource-abuse contract (round-8 hardening): a crafted IHDR
    declaring absurd dimensions, or a deflate stream longer than the
    IHDR implies, must raise the codec contract's ValueError quickly —
    never MemoryError from an attacker-sized allocation. CRCs are VALID
    on these payloads, so the chunk gate cannot be what saves us."""
    import struct
    import time
    import zlib

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import decode_png

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    magic = b"\x89PNG\r\n\x1a\n"
    # 100k x 100k RGB: 30 TB of scanlines from a 100-byte payload
    bomb_ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0)
    bomb = (magic + chunk(b"IHDR", bomb_ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
            + chunk(b"IEND", b""))
    t0 = time.time()
    with pytest.raises(ValueError, match="budget"):
        decode_png(bomb)
    assert time.time() - t0 < 2.0

    # zero-dimension header is malformed, not a zero-byte success
    zero_ihdr = struct.pack(">IIBBBBB", 0, 7, 8, 0, 0, 0, 0)
    zero = (magic + chunk(b"IHDR", zero_ihdr)
            + chunk(b"IDAT", zlib.compress(b"")) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="zero"):
        decode_png(zero)

    # valid small IHDR but the deflate stream inflates PAST the implied
    # length (a bomb hiding behind honest dimensions): bounded inflate
    # must stop at expected+1 and reject, not materialize the megabytes
    small_ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    overlong = (magic + chunk(b"IHDR", small_ihdr)
                + chunk(b"IDAT", zlib.compress(b"\x00" * 4_000_000))
                + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="longer"):
        decode_png(overlong)

    # garbage deflate bytes under a VALID chunk CRC -> contract ValueError
    bad_deflate = (magic + chunk(b"IHDR", small_ihdr)
                   + chunk(b"IDAT", b"\x99\x98\x97\x96")
                   + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="deflate|pixel data"):
        decode_png(bad_deflate)


def test_mp4_rejects_incomplete_or_zero_timescale_tracks():
    """Error-contract hardening (round-8): a trak missing its mandatory
    tkhd/mdhd/hdlr children, or carrying timescale 0, is
    malformed-but-parseable — parse_mp4 must raise ValueError itself
    rather than hand a partial track dict downstream (where it surfaced
    as raw KeyError / ZeroDivisionError in probe_media_containers)."""
    import struct

    from bigdata_meteo_datalake_spark.operators.mp4 import (
        encode_mp4_skeleton,
        parse_mp4,
    )

    def box(btype, payload):
        return struct.pack(">I", len(payload) + 8) + btype + payload

    good = encode_mp4_skeleton(
        timescale=1000, duration=100,
        tracks=[{"track_id": 1, "handler": "vide", "timescale": 600,
                 "duration": 60}],
    )
    # rebuild the file with an EMPTY trak appended inside moov
    (ftyp_len,) = struct.unpack_from(">I", good, 0)
    (moov_len,) = struct.unpack_from(">I", good, ftyp_len)
    moov_payload = good[ftyp_len + 8 : ftyp_len + moov_len]
    bad_moov = box(b"moov", moov_payload + box(b"trak", b""))
    with pytest.raises(ValueError, match="missing"):
        parse_mp4(good[:ftyp_len] + bad_moov)

    # zero media timescale (the encoder happily writes it; the parser
    # must be the gate)
    zero_ts = encode_mp4_skeleton(
        timescale=1000, duration=100,
        tracks=[{"track_id": 1, "handler": "soun", "timescale": 0,
                 "duration": 60}],
    )
    with pytest.raises(ValueError, match="timescale"):
        parse_mp4(zero_ts)

    # zero MOVIE timescale
    zero_movie = encode_mp4_skeleton(timescale=0, duration=100, tracks=[])
    with pytest.raises(ValueError, match="timescale"):
        parse_mp4(zero_movie)


def test_png_palette_roundtrip_and_spec_stream():
    """Color type 3 (round-8): encode writes PLTE + a filtered index
    plane, decode expands back to palette[indices] — for every filter
    type and with Adam7 interlacing. A hand-built spec stream (filter 0,
    PLTE assembled by hand) pins the decoder independently of our
    encoder, so a compensating encode/decode bug cannot hide."""
    import struct
    import zlib

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_png,
        encode_png,
        sniff_format,
    )

    rng = np.random.default_rng(31)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(11, 14), dtype=np.uint8)
    for ft in (0, 1, 2, 3, 4, "cycle"):
        b = encode_png(idx, filter_type=ft, palette=pal)
        assert sniff_format(b) == "png"
        assert (decode_png(b) == pal[idx]).all(), ft
    # palette + Adam7 in the same stream
    b = encode_png(idx, filter_type="cycle", interlace=True, palette=pal)
    assert (decode_png(b) == pal[idx]).all()
    # short palette with in-range indices
    pal4 = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]],
                    dtype=np.uint8)
    idx4 = (np.arange(30, dtype=np.uint8).reshape(5, 6)) % 4
    assert (decode_png(encode_png(idx4, palette=pal4)) == pal4[idx4]).all()

    # spec stream assembled by hand: 3x2 image, 2-entry palette, filter 0
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    raw = bytes([0, 0, 1, 0]) + bytes([0, 1, 0, 1])  # 2 rows, w=3
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", bytes([10, 20, 30, 200, 210, 220]))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    expect = np.array([[[10, 20, 30], [200, 210, 220], [10, 20, 30]],
                       [[200, 210, 220], [10, 20, 30], [200, 210, 220]]],
                      dtype=np.uint8)
    assert (decode_png(png) == expect).all()


def test_png_palette_guards():
    """Palette error contract: missing PLTE, out-of-range index, bad
    PLTE length, tRNS, and encoder-side misuse all fail loudly."""
    import struct
    import zlib

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_png,
        encode_png,
    )

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    magic = b"\x89PNG\r\n\x1a\n"
    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
    raw = zlib.compress(bytes([0, 0, 1]))
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(magic + ihdr + chunk(b"IDAT", raw) + chunk(b"IEND", b""))
    # index 1 with a 1-entry palette
    with pytest.raises(ValueError, match="out of range"):
        decode_png(magic + ihdr + chunk(b"PLTE", bytes([9, 9, 9]))
                   + chunk(b"IDAT", raw) + chunk(b"IEND", b""))
    # PLTE length not a multiple of 3
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(magic + ihdr + chunk(b"PLTE", bytes([1, 2]))
                   + chunk(b"IDAT", raw) + chunk(b"IEND", b""))
    # tRNS on a palette image expands to RGBA (round-8): alpha 128 for
    # entry 0, default-opaque 255 for entry 1
    out = decode_png(magic + ihdr + chunk(b"PLTE", bytes([9, 9, 9, 8, 8, 8]))
                     + chunk(b"tRNS", bytes([128]))
                     + chunk(b"IDAT", raw) + chunk(b"IEND", b""))
    assert out.shape == (1, 2, 4)
    assert out[0, 0].tolist() == [9, 9, 9, 128]
    assert out[0, 1].tolist() == [8, 8, 8, 255]
    pal = np.zeros((4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="index"):
        encode_png(np.full((2, 2), 9, dtype=np.uint8), palette=pal)
    with pytest.raises(ValueError, match="palette"):
        encode_png(np.zeros((2, 2, 3), dtype=np.uint8), palette=pal)
    with pytest.raises(ValueError, match="palette"):
        encode_png(np.zeros((2, 2), dtype=np.uint8),
                   palette=np.zeros((300, 3), dtype=np.uint8))


def test_png_palette_fixture_matches_direct_rgb(spark):
    """The synthesized palette fixtures decode to EXACTLY the same
    feature rows as a direct-RGB encoding of the same closed form — the
    property that lets palette images ride the existing oracle hash."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import decode_png
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        synthesize_png_blobs,
    )

    d = read_table(spark, SF0001, "documents").limit(40)
    rows = synthesize_png_blobs(d).collect()
    n_palette = 0
    for r in rows:
        did = r["doc_id"]
        w, h = 4 + did % 13, 4 + did % 11
        ch = 3 if did % 2 == 0 else 1
        v = ((did * 31 + np.arange(w)[None, :, None] * 7
              + np.arange(h)[:, None, None] * 13
              + np.arange(ch)[None, None, :] * 101) % 256).astype(np.uint8)
        expect = v if ch == 3 else v[:, :, 0]
        got = decode_png(bytes(r["blob"]))
        assert (got == expect).all(), did
        if ch == 3 and did % 3 == 0:
            n_palette += 1
            assert b"PLTE" in bytes(r["blob"]), did
    assert n_palette > 0


def test_real_jpeg_420_hand_built_stream():
    """Decoder against the SPEC, independent of our encoder: a 16x16
    4:2:0 JPEG is assembled by hand — headers packed with struct, the
    entropy stream written bit-by-bit from the Annex K Huffman tables.
    The single MCU carries the four luma blocks in T.81 A.2.3 order
    (TL, TR, BL, BR) with DISTINCT constant values, then one Cb and one
    Cr block at 128 — a decoder with swapped in-MCU block order, wrong
    chroma geometry, or wrong upsampling cannot pass."""
    import struct

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        _AC_CHROMA,
        _AC_LUMA,
        _DC_CHROMA,
        _DC_LUMA,
        decode_jpeg,
    )

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + b"\x01" * 64)  # luma quant: all ones
    out += seg(0xDB, bytes([0x01]) + b"\x01" * 64)  # chroma quant: all ones
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0])  # Y: h=2, v=2, table 0
    sof += bytes([2, 0x11, 1])  # Cb
    sof += bytes([3, 0x11, 1])  # Cr
    out += seg(0xC0, sof)
    for i, (bits, values) in enumerate(
        [_DC_LUMA, _AC_LUMA, _DC_CHROMA, _AC_CHROMA]
    ):
        out += seg(0xC4, bytes([(i % 2) << 4 | (i // 2)] + bits + values))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    # luma 129/130/132/136 (TL/TR/BL/BR): with q=1 the lone DC coef is
    # 8*(v-128), so DC diffs are 8, 8, 16, 32 -> categories 4, 4, 5, 6.
    # Annex K DC-luma codes: cat4='101', cat5='110', cat6='1110';
    # AC-luma EOB='1010'. DC-chroma cat0='00', AC-chroma EOB='00'.
    bitstr = (
        "101" + "1000" + "1010"      # Y TL: diff +8
        + "101" + "1000" + "1010"    # Y TR: diff +8 (DC 16)
        + "110" + "10000" + "1010"   # Y BL: diff +16 (DC 32)
        + "1110" + "100000" + "1010" # Y BR: diff +32 (DC 64)
        + "00" + "00"                # Cb: diff 0, EOB
        + "00" + "00"                # Cr: diff 0, EOB
    )
    bitstr += "1" * (-len(bitstr) % 8)  # pad with 1s per spec
    entropy = bytearray()
    for k in range(0, len(bitstr), 8):
        byte = int(bitstr[k : k + 8], 2)
        entropy.append(byte)
        if byte == 0xFF:
            entropy.append(0x00)
    out += entropy + b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    expect = np.zeros((16, 16, 3), dtype=np.uint8)
    for (y0, x0), v in {(0, 0): 129, (0, 8): 130, (8, 0): 132, (8, 8): 136}.items():
        expect[y0 : y0 + 8, x0 : x0 + 8, :] = v
    assert got.shape == (16, 16, 3)
    assert (got == expect).all()


def test_real_jpeg_subsampled_roundtrips():
    """Encoder+decoder through every subsampling mode: bit-exact on
    block-constant R=G=B fixtures (chroma constant 128 quantizes to
    zero; box-average downsampling of a constant is the constant), with
    and without restart markers, across odd/even dimension mixes; and
    sanity-bounded on natural images."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    for did in (0, 2, 4, 6, 14, 28, 30, 42):
        w, h = 9 + did % 16, 9 + did % 12
        bx = np.arange(w)[None, :] // 8
        by = np.arange(h)[:, None] // 8
        tile = ((did * 31 + bx * 7 + by * 13) % 256).astype(np.uint8)
        rgb = np.stack([tile] * 3, axis=2)
        for sub in ("444", "422", "440", "420", "411"):
            for ri in (0, 2):
                out = decode_jpeg(
                    encode_jpeg(rgb, quality=75, restart_interval=ri,
                                subsampling=sub)
                )
                assert (out == rgb).all(), (did, sub, ri)

    rng = np.random.default_rng(17)
    img = (rng.integers(0, 256, size=(33, 41, 3)).astype(np.float64) * 0.2
           + 128 * 0.8).astype(np.uint8)
    for sub in ("444", "422", "440", "420", "411"):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int)).mean()
        assert err < 16.0, (sub, err)

    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(img, subsampling="410")


def test_png_all_legal_depth_color_combinations_roundtrip():
    """Round-8: every legal IHDR (depth, color type) combination
    round-trips through encode/decode, for every filter type and with
    Adam7 — gray 1/2/4 (decoder scales to full 8-bit range), gray 8/16,
    gray+alpha 8/16, RGB 8/16, RGBA 8/16, palette 1/2/4/8."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(41)
    h, w = 9, 13
    cases = []
    for d in (1, 2, 4):  # sub-byte gray: raw values scale by 255/(2^d-1)
        raw = rng.integers(0, 1 << d, size=(h, w), dtype=np.uint8)
        cases.append((raw, {"depth": d}, raw * (255 // ((1 << d) - 1))))
    g8 = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    cases.append((g8, {}, g8))
    g16 = rng.integers(0, 1 << 16, size=(h, w), dtype=np.uint16)
    cases.append((g16, {}, g16))
    for ch in (2, 3, 4):
        a8 = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        cases.append((a8, {}, a8))
        a16 = rng.integers(0, 1 << 16, size=(h, w, ch), dtype=np.uint16)
        cases.append((a16, {}, a16))
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    for d in (1, 2, 4, 8):
        idx = rng.integers(0, min(16, 1 << d), size=(h, w), dtype=np.uint8)
        cases.append((idx, {"depth": d, "palette": pal}, pal[idx]))

    for arr, kw, want in cases:
        for ft in (0, 1, 2, 3, 4, "cycle"):
            got = decode_png(encode_png(arr, filter_type=ft, **kw))
            assert got.dtype == want.dtype, (kw, ft)
            assert (got == want).all(), (kw, ft)
        got = decode_png(encode_png(arr, filter_type="cycle", interlace=True, **kw))
        assert (got == want).all(), (kw, "adam7")


def test_png_subbyte_and_16bit_hand_built_streams():
    """Decoder against the SPEC, independent of our encoder: hand-packed
    4-bit palette, 1-bit gray, and 16-bit RGB streams (filter 0)."""
    import struct
    import zlib

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import decode_png

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    magic = b"\x89PNG\r\n\x1a\n"

    # 3x2 4-bit palette: indices (1,2,3 / 3,0,1), packed two per byte
    # MSB-first with the last nibble of each row as padding
    raw = bytes([0, 0x12, 0x30]) + bytes([0, 0x30, 0x10])
    pal = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 5, 6, 7])
    png = (magic
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 4, 3, 0, 0, 0))
           + chunk(b"PLTE", pal)
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    want = np.array([[[0, 20, 0], [0, 0, 30], [5, 6, 7]],
                     [[5, 6, 7], [10, 0, 0], [0, 20, 0]]], dtype=np.uint8)
    assert (decode_png(png) == want).all()

    # 10x1 1-bit gray: 1011010010 packs to 0xB4 0x80; decoder scales to 0/255
    raw = bytes([0, 0xB4, 0x80])
    png = (magic
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 10, 1, 1, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    want = np.array([[255, 0, 255, 255, 0, 255, 0, 0, 255, 0]], dtype=np.uint8)
    assert (decode_png(png) == want).all()

    # 1x1 16-bit RGB, big-endian samples
    raw = bytes([0, 0xAB, 0xCD, 0x00, 0x01, 0xFF, 0xFE])
    png = (magic
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    out = decode_png(png)
    assert out.dtype == np.uint16
    assert out.tolist() == [[[0xABCD, 0x0001, 0xFFFE]]]


def test_png_16bit_filter_distance_is_two_bytes():
    """Spec pin: at depth 16 the filter delta distance is channels*2
    bytes, NOT channels — a Sub-filtered 16-bit row decodes wrongly if
    the decoder filters at 8-bit distance. Hand-built: two gray16
    pixels (0x0102, 0x0305); Sub stores the second as a per-BYTE delta
    at distance 2 (0x03-0x01=0x02, 0x05-0x02=0x03)."""
    import struct
    import zlib

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import decode_png

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    raw = bytes([1, 0x01, 0x02, 0x02, 0x03])  # filter=Sub
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    out = decode_png(png)
    assert out.dtype == np.uint16
    assert out.tolist() == [[0x0102, 0x0305]]


def test_png_trns_transparency_expands_alpha():
    """Round-8: tRNS decodes to an alpha channel for all three legal
    color types — palette alpha table (RGBA), gray sample keying
    (gray+alpha), RGB triple keying (RGBA); keying compares RAW
    (pre-scaling) sample values per the spec. Encoder round-trips via
    transparency=; tRNS on alpha-bearing color types is ValueError."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(47)
    # palette + alpha table (shorter than the palette -> rest opaque)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(6, 7), dtype=np.uint8)
    alphas = np.array([0, 30, 255], dtype=np.uint8)
    out = decode_png(encode_png(idx, palette=pal, transparency=alphas,
                                filter_type="cycle"))
    full_alpha = np.concatenate([alphas, np.full(5, 255, dtype=np.uint8)])
    assert (out == np.dstack([pal[idx], full_alpha[idx]])).all()

    # gray 8-bit: pixels equal to the key become alpha 0
    g = rng.integers(0, 4, size=(5, 9), dtype=np.uint8) * 80  # values 0/80/160/240
    out = decode_png(encode_png(g, transparency=160))
    assert out.shape == (5, 9, 2)
    assert (out[:, :, 0] == g).all()
    assert (out[:, :, 1] == np.where(g == 160, 0, 255)).all()

    # gray 4-bit: the key is the RAW sample value (here 3), but decoded
    # gray is scaled by 17
    g4 = (np.arange(20, dtype=np.uint8) % 6).reshape(4, 5)
    out = decode_png(encode_png(g4, depth=4, transparency=3))
    assert (out[:, :, 0] == g4 * 17).all()
    assert (out[:, :, 1] == np.where(g4 == 3, 0, 255)).all()

    # gray 16-bit: alpha range follows the sample dtype
    g16 = rng.integers(0, 1 << 16, size=(3, 4), dtype=np.uint16)
    g16[1, 2] = 0x0102
    out = decode_png(encode_png(g16, transparency=0x0102))
    assert out.dtype == np.uint16
    assert (out[:, :, 1] == np.where(g16 == 0x0102, 0, 65535)).all()

    # RGB triple keying
    img = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    img[2, 3] = (1, 2, 3)
    out = decode_png(encode_png(img, transparency=(1, 2, 3)))
    assert out.shape == (4, 6, 4)
    assert (out[:, :, :3] == img).all()
    want = np.where((img == np.array([1, 2, 3])).all(axis=2), 0, 255)
    assert (out[:, :, 3] == want).all()

    # interlaced + tRNS compose
    out = decode_png(encode_png(img, transparency=(1, 2, 3),
                                filter_type="cycle", interlace=True))
    assert (out[:, :, 3] == want).all()

    # illegal: tRNS with an alpha-bearing color type
    rgba = rng.integers(0, 256, size=(2, 2, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="alpha"):
        encode_png(rgba, transparency=(1, 2, 3))


def test_real_jpeg_progressive_roundtrips_match_baseline():
    """Progressive (SOF2, spectral-selection script) round-trips: exact
    on block-constant fixtures across subsamplings and restart
    intervals, and pixel-identical to the baseline encoding on natural
    images (same coefficients, different scan order)."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    for did in (0, 2, 4, 6, 14, 21, 28, 35):
        w, h = 9 + did % 16, 9 + did % 12
        bx = np.arange(w)[None, :] // 8
        by = np.arange(h)[:, None] // 8
        tile = ((did * 31 + bx * 7 + by * 13) % 256).astype(np.uint8)
        img = np.stack([tile] * 3, axis=2) if did % 2 == 0 else tile
        sub = ("444", "420", "422")[(did // 2) % 3] if did % 2 == 0 else "444"
        b = encode_jpeg(img, quality=75, subsampling=sub, progressive=True,
                        restart_interval=2 if did % 7 == 0 else 0)
        assert b"\xff\xc2" in b and b"\xff\xc0" not in b[:200]
        assert (decode_jpeg(b) == img).all(), (did, sub)

    rng = np.random.default_rng(53)
    for shape, sub in [((33, 41, 3), "444"), ((33, 41, 3), "420"),
                       ((24, 17), "444")]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg(img, quality=85, subsampling=sub, progressive=True)
        )
        assert (base == prog).all(), (shape, sub)


def test_real_jpeg_progressive_successive_approximation_hand_built():
    """Decoder against the SPEC for the successive-approximation paths
    our encoder does not emit: a hand-assembled 8x8 gray SOF2 stream
    with four scans — DC first at Al=1, AC first at Al=1 (run/size +
    EOB), DC refinement (one appended bit), AC refinement (EOB run
    whose correction bits bump |coef| by 1). Final zigzag coefficients
    must be DC=7, k1=+5, k3=-3 exactly; any error in shift/refine/EOB
    bookkeeping lands elsewhere."""
    import struct

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        _AC_LUMA,
        _DC_LUMA,
        _M,
        _ZIGZAG,
        decode_jpeg,
    )

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + b"\x01" * 64)
    out += seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    for i, (bits, values) in enumerate([_DC_LUMA, _AC_LUMA]):
        out += seg(0xC4, bytes([(i % 2) << 4 | (i // 2)] + bits + values))

    def sos(ss, se, ah, al):
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    def entropy(bitstr):
        bitstr += "1" * (-len(bitstr) % 8)
        eb = bytearray()
        for k in range(0, len(bitstr), 8):
            byte = int(bitstr[k : k + 8], 2)
            eb.append(byte)
            if byte == 0xFF:
                eb.append(0x00)
        return bytes(eb)

    # scan 1: DC first, Al=1. DC=7 -> 7>>1=3: DC-luma cat2 '011'+'11'
    out += sos(0, 0, 0, 1) + entropy("011" + "11")
    # scan 2: AC first Ss=1..63, Al=1. k1: 5//2=2 -> sym 0x02 '01'+'10';
    # k3: -3 trunc-div 2 = -1 after skipping k2 -> sym 0x11 '1100'+'0';
    # then EOB '1010'
    out += sos(1, 63, 0, 1) + entropy("01" + "10" + "1100" + "0" + "1010")
    # scan 3: DC refinement Ah=1,Al=0: appended bit 1 -> DC 6|1 = 7
    out += sos(0, 0, 1, 0) + entropy("1")
    # scan 4: AC refinement Ah=1,Al=0: EOB run of 1 ('1010'), then one
    # correction bit per history-nonzero coef in band order:
    # k1 4->5 (bit 1), k3 -2->-3 (bit 1)
    out += sos(1, 63, 1, 0) + entropy("1010" + "1" + "1")
    out += b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    zz = np.zeros(64, dtype=np.int64)
    zz[0], zz[1], zz[3] = 7, 5, -3
    block = np.zeros(64, dtype=np.int64)
    block[_ZIGZAG] = zz
    want = _M.T @ block.reshape(8, 8).astype(np.float64) @ _M + 128.0
    want = np.clip(np.rint(want), 0, 255).astype(np.uint8)
    assert (got == want).all()


def test_real_gif_roundtrips():
    """GIF codec (round-8): encode (real LZW) -> decode is exact for
    stills, interlaced frames, animations, small palettes, transparency
    composition, disposal methods, and dictionary overflow/rebuild."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_gif,
        encode_gif,
        sniff_format,
    )

    rng = np.random.default_rng(61)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)

    for interlace in (False, True):
        idx = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
        b = encode_gif(idx, pal, interlace=interlace)
        assert sniff_format(b) == "gif"
        frames, delays = decode_gif(b)
        assert frames.shape == (1, 13, 17, 3) and delays == [0]
        assert (frames[0] == pal[idx]).all(), interlace

    idxs = rng.integers(0, 256, size=(4, 9, 11), dtype=np.uint8)
    frames, delays = decode_gif(encode_gif(idxs, pal, delays=[10, 20, 30, 40]))
    for f in range(4):
        assert (frames[f] == pal[idxs[f]]).all(), f
    assert delays == [10, 20, 30, 40]

    pal5 = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    idx5 = rng.integers(0, 5, size=(7, 6), dtype=np.uint8)
    assert (decode_gif(encode_gif(idx5, pal5))[0][0] == pal5[idx5]).all()

    # transparency: transparent pixels keep the prior canvas visible
    f0 = np.zeros((4, 4), dtype=np.uint8)
    f1 = np.full((4, 4), 1, dtype=np.uint8)
    f1[1, 1] = 2
    frames, _ = decode_gif(encode_gif(np.stack([f0, f1]), pal, transparent=2))
    assert (frames[1][1, 1] == pal[0]).all()
    assert (frames[1][0, 0] == pal[1]).all()

    # disposal 2 (restore background = palette entry 0 here): frame 2's
    # transparent pixel shows the RESTORED region, not frame 1's pixels
    frames, _ = decode_gif(
        encode_gif(np.stack([f1, f1]), pal, transparent=2, disposal=2)
    )
    assert (frames[1][1, 1] == pal[0]).all()

    # worst-case noise forces dictionary overflow + clear/rebuild
    noise = rng.integers(0, 256, size=(150, 173), dtype=np.uint8)
    assert (decode_gif(encode_gif(noise, pal))[0][0] == pal[noise]).all()


def test_real_gif_hand_built_lzw_stream():
    """Decoder against the SPEC, independent of our encoder: a 2x2 GIF
    whose LZW stream is assembled bit-by-bit by hand (LSB-first packing,
    clear code, width growth at (1<<width)-1 on the decoder side)."""
    import struct

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import decode_gif

    pal = np.zeros((4, 3), dtype=np.uint8)
    pal[0], pal[1], pal[2], pal[3] = (9, 9, 9), (10, 20, 30), (40, 50, 60), (7, 8, 9)

    # mcs=2: clear=4, end=5. Pixels [1, 2, 2, 1]: codes (after clear)
    # 1(w3) 2(w3) 2(w4, decoder widened after adding entry 6) 1(w4) end(w4)
    bits = []
    def put(code, width):
        for i in range(width):
            bits.append((code >> i) & 1)
    put(4, 3); put(1, 3); put(2, 3); put(2, 4); put(1, 4); put(5, 4)
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i : i + 8]):
            byte |= bit << j
        data.append(byte)

    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 0, 0)  # GCT of 4
    gif += pal.tobytes()
    gif += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 2, 2) + bytes([0])
    gif += bytes([2])  # LZW minimum code size
    gif += bytes([len(data)]) + bytes(data) + bytes([0])
    gif += bytes([0x3B])
    frames, _ = decode_gif(bytes(gif))
    want = pal[np.array([[1, 2], [2, 1]], dtype=np.uint8)]
    assert (frames[0] == want).all()


def test_real_gif_disposal2_local_table_smaller_than_bg_index():
    """Disposal-2 background restore must index the GLOBAL color table
    (GIF89a 19), even when the disposed frame carries a local table
    smaller than the background index (round-8 advice: this raised
    'index 3 is out of bounds for axis 0 with size 2')."""
    import struct

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import decode_gif

    gct = np.zeros((4, 3), dtype=np.uint8)
    gct[0], gct[1], gct[2], gct[3] = (1, 1, 1), (2, 2, 2), (3, 3, 3), (77, 88, 99)
    lct = np.zeros((2, 3), dtype=np.uint8)
    lct[0], lct[1] = (10, 10, 10), (20, 20, 20)

    def lzw(codes_widths):
        bits = []
        for code, width in codes_widths:
            for i in range(width):
                bits.append((code >> i) & 1)
        data = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for j, bit in enumerate(bits[i : i + 8]):
                byte |= bit << j
            data.append(byte)
        return bytes([2, len(data)]) + bytes(data) + bytes([0])

    gif = bytearray(b"GIF89a")
    # 2x2 screen, GCT of 4, BACKGROUND INDEX 3 (valid: addresses the GCT)
    gif += struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 3, 0)
    gif += gct.tobytes()
    # frame 1: full 2x2, disposal 2, LOCAL color table of only 2 entries
    gif += bytes([0x21, 0xF9, 4, 2 << 2, 0, 0, 0, 0])  # GCE: disposal=2
    gif += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 2, 2)
    gif += bytes([0x80 | 0x00])  # local table flag, size field 0 -> 2 entries
    gif += lct.tobytes()
    # pixels [0,1,1,0]: clear(w3) 0(w3) 1(w3; add#6 -> widen) 1(w4) 0(w4) end(w4)
    gif += lzw([(4, 3), (0, 3), (1, 3), (1, 4), (0, 4), (5, 4)])
    # frame 2: 1x1 at (0,0) from the GCT, so the restored region is visible
    gif += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 1, 1) + bytes([0])
    gif += lzw([(4, 3), (0, 3), (5, 3)])
    gif += bytes([0x3B])

    frames, _ = decode_gif(bytes(gif))
    assert frames.shape == (2, 2, 2, 3)
    assert (frames[0] == lct[np.array([[0, 1], [1, 0]])]).all()
    # after disposal 2, the canvas outside frame 2 is gct[bg], NOT lct[...]
    assert (frames[1][0, 0] == gct[0]).all()
    assert (frames[1][0, 1] == gct[3]).all()
    assert (frames[1][1] == gct[3]).all()


def test_real_gif_through_kernels(spark):
    """Spark plumbing: synthesized animated GIFs flow through
    decode_image_features (frame-0 semantics) and gif_frame_features
    (per-frame rows matching the closed form)."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.multimodal import (
        gif_frame_features,
        synthesize_gif_blobs,
    )

    d = read_table(spark, SF0001, "documents").limit(25)
    gifs = synthesize_gif_blobs(d)
    feats = {r["doc_id"]: r for r in
             decode_image_features(gifs, decode="real").collect()}
    rows = gif_frame_features(gifs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rs in by_doc.items():
        nf = 1 + did % 4
        w, h = 5 + did % 12, 5 + did % 9
        assert len(rs) == nf
        assert (feats[did]["width"], feats[did]["height"]) == (w, h)
        for r in sorted(rs, key=lambda r: r["frame_idx"]):
            k = r["frame_idx"]
            assert (r["width"], r["height"]) == (w, h)
            assert r["delay_cs"] == 4 + did % 11
            x = np.arange(w)[None, :]
            y = np.arange(h)[:, None]
            v = (did * 31 + x * 7 + y * 13 + k * 59) % 256
            s = int((v + (v + 101) % 256 + (v + 202) % 256).sum())
            want = (s / (w * h * 3)) / 255.0
            assert abs(r["mean_intensity"] - want) < 1e-12, (did, k)
        # frame-0 feature agrees between the two kernels
        assert abs(
            feats[did]["mean_intensity"]
            - min(rs, key=lambda r: r["frame_idx"])["mean_intensity"]
        ) < 1e-12


def test_real_gif_frame_sampling_resize_phash(spark):
    """GIF flows through every image kernel (round-8): sample_frames
    real mode hashes genuinely decoded frames (<= max_frames kept, even
    stride), resize_images thumbnails frame 0 as PNG, image_phash_bands
    hashes frame 0 — all against the closed form."""
    import hashlib

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import decode_png
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        image_phash_bands,
        resize_images,
        sample_frames,
        synthesize_gif_blobs,
    )

    d = read_table(spark, SF0001, "documents").limit(20)
    gifs = synthesize_gif_blobs(d)

    def frame(did, k):
        w, h = 5 + did % 12, 5 + did % 9
        i = np.arange(256, dtype=np.int64)
        pal = np.stack([i, (i + 101) % 256, (i + 202) % 256], axis=1).astype(np.uint8)
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        idx = ((did * 31 + x * 7 + y * 13 + k * 59) % 256).astype(np.uint8)
        return pal[idx]

    rows = sample_frames(gifs, max_frames=2, decode="real").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rs in by_doc.items():
        nf = 1 + did % 4
        assert len(rs) == min(2, nf)
        for r in rs:
            want = hashlib.md5(frame(did, r["frame_idx"]).tobytes()).hexdigest()
            assert r["frame_hash"] == want, (did, r["frame_idx"])

    out = {r["doc_id"]: r for r in
           resize_images(gifs, width=4, height=3, decode="real").collect()}
    for did, r in out.items():
        pix = decode_png(bytes(r["blob"]))
        assert pix.shape == (3, 4, 3)

    bands = image_phash_bands(gifs, decode="real").collect()
    assert len(bands) == 20  # one hash per animation (frame-0 semantics)


def test_real_jpeg_12bit_roundtrips():
    """12-bit JPEG (round-8): SOF1 extended sequential / SOF2
    progressive with 16-bit DQT entries and level shift 2048 —
    bit-exact on 0..4095 block-constant fixtures across subsamplings,
    restart intervals, and progressive scan scripts; natural-image
    error bounded; SOF0 with 12-bit precision rejected as malformed."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        jpeg_precision,
    )

    for did in (0, 2, 4, 6, 14, 21, 28, 63):
        w, h = 9 + did % 16, 9 + did % 12
        bx = np.arange(w)[None, :] // 8
        by = np.arange(h)[:, None] // 8
        tile = ((did * 97 + bx * 29 + by * 53) % 4096).astype(np.uint16)
        img = np.stack([tile] * 3, axis=2) if did % 2 == 0 else tile
        sub = ("444", "420", "422")[(did // 2) % 3] if did % 2 == 0 else "444"
        for prog in (False, True):
            b = encode_jpeg(img, quality=75, precision=12, subsampling=sub,
                            progressive=prog,
                            restart_interval=2 if did % 7 == 0 else 0)
            assert jpeg_precision(b) == 12
            out = decode_jpeg(b)
            assert out.dtype == np.uint16
            assert (out == img).all(), (did, sub, prog)

    rng = np.random.default_rng(67)
    img = (rng.integers(0, 4096, size=(33, 41, 3)).astype(np.float64) * 0.2
           + 2048 * 0.8).astype(np.uint16)
    out = decode_jpeg(encode_jpeg(img, quality=90, precision=12))
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4096 * 0.05

    bad = bytearray(encode_jpeg(img, quality=90, precision=12))
    sof = bad.find(b"\xff\xc1")
    bad[sof + 1] = 0xC0
    with pytest.raises(ValueError, match="8-bit only"):
        decode_jpeg(bytes(bad))


def test_wav_g711_tables_and_kernels(spark):
    """G.711 (round-8): expansion tables pinned against PUBLISHED
    reference values (so the shared-constant oracle generation cannot
    hide a table bug), WAV container roundtrip for both laws, and the
    production audio kernel over synthesized telephony blobs."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        alaw_decode_table,
        decode_wav,
        encode_wav_g711,
        mulaw_decode_table,
        sniff_format,
    )
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        audio_features,
        synthesize_g711_blobs,
    )

    mu, al = mulaw_decode_table(), alaw_decode_table()
    # published G.711 reference points
    assert mu[0x00] == -32124 and mu[0x80] == 32124
    assert mu[0xFF] == 0 and mu[0x7F] == 0  # +/-0 collapse
    assert al[0x2A] == -32256 and al[0xAA] == 32256
    assert al[0x55] == -8 and al[0xD5] == 8  # A-law silence is +/-8
    # strict per-side monotonicity (segment boundaries included)
    assert (np.diff(mu[:0x80]) > 0).all() and (np.diff(mu[0x80:]) < 0).all()

    codes = ((np.arange(300) * 7 + 13) % 256).astype(np.uint8)
    for law, table in (("mulaw", mu), ("alaw", al)):
        b = encode_wav_g711(codes, 8000, law=law)
        assert sniff_format(b) == "wav"
        samples, sr = decode_wav(b)
        assert sr == 8000 and samples.shape == (300, 1)
        assert np.allclose(samples[:, 0], table[codes] / 32768.0)

    d = read_table(spark, SF0001, "documents").limit(20)
    rows = {r["doc_id"]: r for r in
            audio_features(synthesize_g711_blobs(d), decode="real").collect()}
    for did, r in rows.items():
        n = 150 + did % 200
        table = mu if did % 2 == 0 else al
        t = table[(did * 13 + np.arange(n) * 7) % 256]
        want = float(np.sqrt(((t / 32768.0) ** 2).mean()))
        assert r["sample_rate"] == 8000
        assert abs(r["duration_s"] - n / 8000) < 1e-15
        assert abs(r["rms"] - want) < 1e-15, did


def test_wav_adpcm_tables_and_kernels(spark):
    """IMA ADPCM (round-9): step/index tables pinned against the
    PUBLISHED IMA recommended-practice values, hand-traced state
    transitions, exact fixture (nibble-stream) decode vs a continuous
    reference, real-encoder roundtrip with bounded steady-state error,
    stereo word interleave, fact-chunk trimming, and loud rejection of
    corrupt blocks — then the production audio kernel over synthesized
    ADPCM blobs."""
    import struct

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        _IMA_INDEX_TABLE,
        _IMA_STEP_TABLE,
        adpcm_decode,
        adpcm_encode_wav,
        decode_wav,
        encode_wav_adpcm,
        ima_adpcm_advance,
        sniff_format,
    )
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        audio_features,
        synthesize_adpcm_blobs,
    )

    # published IMA table pins (rev 3.00 / RFC 3551): first, last, and
    # interior step values; the full index-adjust table
    assert len(_IMA_STEP_TABLE) == 89
    assert _IMA_STEP_TABLE[0] == 7 and _IMA_STEP_TABLE[88] == 32767
    assert _IMA_STEP_TABLE[44] == 494 and _IMA_STEP_TABLE[60] == 2272
    assert _IMA_INDEX_TABLE == (-1, -1, -1, -1, 2, 4, 6, 8,
                                -1, -1, -1, -1, 2, 4, 6, 8)
    # hand-traced transitions from (pred=0, idx=0), step=7:
    # nibble 4: diff = 7>>3 + 7 = 7 -> (7, 2); nibble 0xF: diff =
    # 0+7+3+1 = 11, sign bit -> (-11, 8); nibble 0: diff = 0 -> (0, 0)
    assert ima_adpcm_advance(0, 0, 4) == (7, 2)
    assert ima_adpcm_advance(0, 0, 0xF) == (-11, 8)
    assert ima_adpcm_advance(0, 0, 0) == (0, 0)
    # clamps: predictor saturates at int16, index at [0, 88]
    assert ima_adpcm_advance(32767, 88, 7) == (32767, 88)
    assert ima_adpcm_advance(-32768, 88, 0xF) == (-32768, 88)

    # fixture path: nibble stream -> WAV -> decode equals a continuous
    # reference decode with the block-leading predictor repeated
    rng = np.random.default_rng(9)
    nib = rng.integers(0, 16, size=300, dtype=np.uint8)
    wav = encode_wav_adpcm(nib, 8000, block_align=68,
                           init_pred=-1234, init_index=17)
    assert sniff_format(wav) == "wav"
    samples, sr = decode_wav(wav)
    pred, idx = -1234, 17
    ref = [pred]
    for j, n in enumerate(nib):
        if j and j % 128 == 0:
            ref.append(pred)
        pred, idx = ima_adpcm_advance(pred, idx, int(n))
        ref.append(pred)
    assert sr == 8000 and samples.shape == (len(ref), 1)
    assert np.array_equal(samples[:, 0] * 32768.0, np.array(ref, float))

    # real encoder roundtrip: after the cold-start adaptation ramp the
    # reconstruction tracks the signal within a few quantizer steps
    t = np.arange(4000)
    sine = (10000 * np.sin(2 * np.pi * t / 50)).astype(np.int16)
    dec, sr2 = decode_wav(adpcm_encode_wav(sine, 16000, block_align=256))
    assert sr2 == 16000 and dec.shape == (4000, 1)
    err = np.abs(dec[:, 0] * 32768.0 - sine)
    assert err[200:].max() < 512 and err.mean() < 100

    # stereo: 4-byte words interleave per channel; headers decode per
    # channel and both streams advance independently
    blk = bytearray()
    blk += struct.pack("<hBB", 100, 10, 0) + struct.pack("<hBB", -200, 20, 0)
    blk += bytes(range(8))  # word for ch0, word for ch1
    st = adpcm_decode(bytes(blk), channels=2, block_align=16)
    assert st.shape == (9, 2)
    assert st[0, 0] == 100 and st[0, 1] == -200
    p, i = 100, 10
    for byte in bytes(range(4)):
        for nibble in (byte & 0x0F, byte >> 4):
            p, i = ima_adpcm_advance(p, i, nibble)
    assert st[-1, 0] == p

    # fact-chunk trim: padding nibble's extra frame is dropped
    sine_odd = sine[:101]
    dec_odd, _ = decode_wav(adpcm_encode_wav(sine_odd, 8000, block_align=256))
    assert dec_odd.shape == (101, 1)

    # loud rejections
    import pytest

    with pytest.raises(ValueError, match="step index"):
        adpcm_decode(struct.pack("<hBB", 0, 89, 0), channels=1, block_align=8)
    with pytest.raises(ValueError, match="truncated"):
        adpcm_decode(b"\x00\x00", channels=1, block_align=8)
    with pytest.raises(ValueError, match="whole number"):
        adpcm_decode(bytes(8) + bytes(2), channels=2, block_align=10)
    with pytest.raises(ValueError, match="even"):
        encode_wav_adpcm(np.array([1], dtype=np.uint8), 8000)

    # production kernel over synthesized blobs matches the closed form
    d = read_table(spark, SF0001, "documents").limit(20)
    rows = {r["doc_id"]: r for r in
            audio_features(synthesize_adpcm_blobs(d), decode="real").collect()}
    for did, r in rows.items():
        v = did % 8
        nb = 2 * (75 + did % 100)
        pred, idx = v * 4111 - 16000, (v * 11) % 89
        seq = [pred]
        for j in range(nb):
            if j and j % 128 == 0:
                seq.append(pred)
            pred, idx = ima_adpcm_advance(pred, idx, (j * 7 + v * 5 + 3) % 16)
            seq.append(pred)
        arr = np.array(seq, dtype=np.float64) / 32768.0
        sr = 8000 + (did % 4) * 2000
        assert r["sample_rate"] == sr
        assert abs(r["duration_s"] - len(seq) / sr) < 1e-15
        assert abs(r["rms"] - float(np.sqrt((arr**2).mean()))) < 1e-15, did


def test_flac_roundtrips_and_kernels(spark):
    """FLAC (round-9): CRC-8/CRC-16 pinned against published check
    values, LOSSLESS encoder->decoder roundtrips across signal classes
    (fixed predictors, verbatim/Rice, constant), stereo, partial last
    frames, STREAMINFO MD5 verification, corrupt-stream rejection —
    then the production audio kernel over synthesized FLAC blobs."""
    import numpy as np
    import pytest

    from bigdata_meteo_datalake_spark.operators.flac import (
        _crc8,
        _crc16,
        decode_flac,
        decode_flac_pcm,
        encode_flac,
    )
    from bigdata_meteo_datalake_spark.operators.media_codecs import sniff_format
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        audio_features,
        synthesize_flac_blobs,
    )

    # published CRC check values ("123456789"): CRC-8/SMBUS poly 0x07
    # init 0 -> 0xF4; CRC-16/UMTS poly 0x8005 non-reflected init 0 -> 0xFEE8
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8

    rng = np.random.default_rng(19)
    t = np.arange(9000)
    smooth = (9000 * np.sin(2 * np.pi * t / 250)
              + 500 * np.sin(2 * np.pi * t / 13)).astype(np.int16)
    noise = rng.integers(-32768, 32768, size=4000).astype(np.int16)
    const = np.full(700, -123, dtype=np.int16)
    for sig, sr in ((smooth, 44100), (noise, 8000), (const, 16000),
                    (smooth[:4097], 22050), (smooth[:1], 11025)):
        b = encode_flac(sig, sr)
        assert sniff_format(b) == "flac"
        pcm, got_sr, bps = decode_flac_pcm(b)
        assert got_sr == sr and bps == 16
        assert np.array_equal(pcm[:, 0], sig), (len(sig), sr)
    # smooth signals genuinely compress through the fixed predictors
    assert len(encode_flac(smooth, 44100)) < 2 * len(smooth) * 0.5

    st = np.stack([smooth[:3000], (smooth[:3000] // 3 - 50).astype(np.int16)],
                  axis=1)
    pcm, _, _ = decode_flac_pcm(encode_flac(st, 48000, block_size=1024))
    assert np.array_equal(pcm, st)

    f, _ = decode_flac(encode_flac(const, 16000))
    assert abs(f[0, 0] - (-123) / 32768.0) < 1e-18

    # integrity: a flipped PCM bit fails CRC-16; a flipped STREAMINFO
    # MD5 byte fails the MD5 check; garbage fails the magic
    good = bytearray(encode_flac(smooth[:600], 8000))
    bad = bytearray(good)
    bad[-3] ^= 0x10  # inside the last frame's payload
    with pytest.raises(ValueError):
        decode_flac_pcm(bytes(bad))
    bad2 = bytearray(good)
    bad2[8 + 18] ^= 0xFF  # STREAMINFO md5 byte
    with pytest.raises(ValueError, match="MD5"):
        decode_flac_pcm(bytes(bad2))
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac_pcm(b"not a flac")
    for cut in (3, 20, len(good) // 2, len(good) - 1):
        with pytest.raises(ValueError):
            decode_flac_pcm(bytes(good[:cut]))
    for _ in range(40):
        mut = bytearray(good)
        mut[int(rng.integers(4, len(mut)))] ^= int(rng.integers(1, 256))
        try:
            pcm, _, _ = decode_flac_pcm(bytes(mut))
            # survival is fine only if the samples are untouched
            assert np.array_equal(pcm[:, 0], smooth[:600])
        except ValueError:
            pass

    # production kernel over synthesized blobs matches the closed form
    d = read_table(spark, SF0001, "documents").limit(21)
    rows = {r["doc_id"]: r for r in
            audio_features(synthesize_flac_blobs(d), decode="real").collect()}
    for did, r in rows.items():
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
        arr = s.astype(np.float64) / 32768.0
        assert r["sample_rate"] == sr
        assert abs(r["duration_s"] - n / sr) < 1e-15
        assert abs(r["rms"] - float(np.sqrt((arr**2).mean()))) < 1e-15, did


def test_audio_resample_features(spark):
    """Resample-to-16k (round-9): identity at a matching rate, pinned
    linear interpolation on a hand WAV, FLAC input accepted, and the
    production kernel against the closed form."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.flac import encode_flac
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        audio_resample_features,
        synthesize_wav_blobs,
    )

    def raw_wav(pcm, sr):
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            wf.writeframes(np.asarray(pcm, dtype="<i2").tobytes())
        return buf.getvalue()

    def run_one(blob, target=16_000):
        pdf = __import__("pandas").DataFrame({"doc_id": [0], "blob": [blob]})
        df = spark.createDataFrame(pdf)
        return audio_resample_features(df, target_sr=target).collect()[0]

    # pinned interpolation: [0, 100] at 8 kHz -> [0, 50, 100] at 16 kHz
    r = run_one(raw_wav([0, 100], 8000))
    assert (r["sr_in"], r["sr_out"], r["n_out"]) == (8000, 16000, 3)
    want = np.array([0, 50, 100], dtype=np.float64)
    assert abs(r["rms"] - float(np.sqrt(((want / 32768) ** 2).mean()))) < 1e-15

    # identity at a matching rate: RMS equals the input's RMS exactly
    sig = np.arange(-300, 300, dtype=np.int16)
    r = run_one(raw_wav(sig, 16000))
    assert r["n_out"] == len(sig)
    assert abs(r["rms"] - float(np.sqrt(((sig / 32768.0) ** 2).mean()))) < 1e-15

    # FLAC input flows through the same kernel
    r = run_one(encode_flac(sig, 8000))
    assert r["sr_in"] == 8000 and r["n_out"] == 2 * len(sig) - 1

    # production kernel over the WAV fixture matches the closed form
    d = read_table(spark, SF0001, "documents").limit(12)
    rows = audio_resample_features(synthesize_wav_blobs(d)).collect()
    for r in rows:
        did = r["doc_id"]
        n = 200 + did % 300
        sr = 8000 + (did % 4) * 2000
        i = np.arange(n, dtype=np.int64)
        raw = ((did * 37 + i * 11) % 65536 - 32768).astype(np.float64)
        m = ((n - 1) * 16000) // sr + 1
        j = np.arange(m, dtype=np.int64)
        idx = (j * sr) // 16000
        idx1 = np.minimum(idx + 1, n - 1)
        frac = ((j * sr) % 16000).astype(np.float64) / 16000.0
        q = np.floor(raw[idx] + frac * (raw[idx1] - raw[idx]) + 0.5)
        assert r["n_out"] == m
        want = float(np.sqrt((float((q * q).sum()) / 1073741824.0) / m))
        assert abs(r["rms"] - want) < 1e-15, did


def test_audio_fingerprint_bands(spark):
    """Audio fingerprint (round-9): the Haitsma-Kalker energy-delta
    bits are deterministic, identical for identical signals regardless
    of container (WAV vs FLAC), distinct for unrelated signals, and the
    planted-duplicate fixture produces exactly its groups' matches."""
    import io
    import wave

    import numpy as np
    import pandas as pd
    import pytest

    from bigdata_meteo_datalake_spark.operators.flac import encode_flac
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        audio_fingerprint_bands,
        synthesize_dup_wav_blobs,
    )

    def raw_wav(pcm, sr=8000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            wf.writeframes(np.asarray(pcm, dtype="<i2").tobytes())
        return buf.getvalue()

    rng = np.random.default_rng(23)
    sig = rng.integers(-32768, 32768, size=400).astype(np.int16)
    other = rng.integers(-32768, 32768, size=400).astype(np.int16)
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "blob": [raw_wav(sig), raw_wav(sig), encode_flac(sig, 8000),
                 raw_wav(other)],
    })
    rows = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
            for r in audio_fingerprint_bands(
                spark.createDataFrame(pdf)).collect()}
    assert rows[0] == rows[1]  # deterministic
    assert rows[0] == rows[2]  # container-independent (WAV == FLAC)
    assert rows[0] != rows[3]  # unrelated signal differs
    for v in rows[0]:
        assert 0 <= v < (1 << 16)

    # too-short audio fails loudly (needs 17 frames x 5 sub-bands)
    tiny = pd.DataFrame({"doc_id": [0], "blob": [raw_wav(sig[:50])]})
    with pytest.raises(Exception, match="too short"):
        audio_fingerprint_bands(spark.createDataFrame(tiny)).collect()

    # planted-dup fixture: members 4g/4g+1 share a fingerprint; the
    # kernel output matches an independent numpy recompute
    d = read_table(spark, SF0001, "documents").limit(16)
    feats = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
             for r in audio_fingerprint_bands(
                 synthesize_dup_wav_blobs(d)).collect()}
    for g in range(2):
        assert feats[4 * g] == feats[4 * g + 1], g
    for did, got in feats.items():
        g = did // 4
        if did % 4 < 2:
            n, c0, c1 = 300 + (g * 7) % 200, g * 37, 11
        else:
            n, c0, c1 = 300 + (did * 3) % 200, did * 41, 13
        i = np.arange(n, dtype=np.int64)
        h = ((c0 + i * c1) * 2654435761) % 4294967296
        s = ((h ^ (h >> 16)) % 65536) - 32768
        L = n // 17
        sub = L // 5
        e = ((s[: 17 * L] ** 2).reshape(17, L)[:, : 5 * sub]
             .reshape(17, 5, sub).sum(axis=2))
        d1 = e[:, :4] - e[:, 1:]
        bits = ((d1[1:] - d1[:-1]) > 0).reshape(64)
        want = tuple(
            sum(1 << j for j in range(16) if bits[k * 16 + j])
            for k in range(4)
        )
        assert got == want, did


def test_avi_mjpeg_video(spark):
    """AVI/MJPEG (round-9): real video demux + frame decode without
    ffmpeg — roundtrips exact on block-constant frames (any JPEG
    entropy layer inside the container), header/stream consistency
    enforced, non-MJPEG handlers rejected loudly, sample_frames
    dispatches AVI, and the production per-frame kernel matches the
    closed form."""
    import struct

    import numpy as np
    import pytest

    from bigdata_meteo_datalake_spark.operators.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from bigdata_meteo_datalake_spark.operators.jpeg import encode_jpeg
    from bigdata_meteo_datalake_spark.operators.media_codecs import sniff_format
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        avi_frame_features,
        sample_frames,
        synthesize_avi_blobs,
    )

    def bc(h, w, seed):
        r = np.random.default_rng(seed)
        t = r.integers(0, 256, size=((h + 7) // 8, (w + 7) // 8),
                       dtype=np.uint8)
        return t.repeat(8, axis=0).repeat(8, axis=1)[:h, :w]

    imgs = [bc(16, 24, k) for k in range(5)]
    avi = encode_avi_mjpeg([encode_jpeg(i) for i in imgs], 24, 16,
                           usec_per_frame=33367)
    assert sniff_format(avi) == "avi"
    dec, usec = decode_avi_mjpeg(avi)
    assert usec == 33367 and np.array_equal(dec, np.stack(imgs))

    # any supported JPEG entropy layer decodes inside the container
    dec2, _ = decode_avi_mjpeg(encode_avi_mjpeg(
        [encode_jpeg(imgs[0], arithmetic=True),
         encode_jpeg(imgs[1], progressive=True)], 24, 16))
    assert np.array_equal(dec2, np.stack(imgs[:2]))

    # consistency + rejection paths
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    bad = bytearray(avi)
    i = bad.find(b"avih")
    struct.pack_into("<I", bad, i + 8 + 32, 999)  # wrong header width
    with pytest.raises(ValueError, match="dims"):
        decode_avi_mjpeg(bytes(bad))
    bad = bytearray(avi)
    struct.pack_into("<I", bad, i + 8 + 16, 99)  # wrong total frames
    with pytest.raises(ValueError, match="frames"):
        decode_avi_mjpeg(bytes(bad))
    bad = bytearray(avi)
    j = bad.find(b"MJPG")
    bad[j : j + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_avi_mjpeg(bytes(bad))

    # sample_frames dispatches AVI in real mode
    import pandas as pd

    sdf = spark.createDataFrame(pd.DataFrame({"doc_id": [7], "blob": [avi]}))
    rows = sample_frames(sdf, max_frames=3, decode="real").collect()
    assert 1 <= len(rows) <= 3
    import hashlib

    assert rows[0]["frame_hash"] == hashlib.md5(imgs[0].tobytes()).hexdigest()

    # production kernel over synthesized blobs matches the closed form
    d = read_table(spark, SF0001, "documents").limit(20)
    rows = avi_frame_features(synthesize_avi_blobs(d)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rs in by_doc.items():
        nf = 1 + did % 4
        w, h = 9 + did % 16, 9 + did % 12
        assert len(rs) == nf
        for r in rs:
            assert (r["width"], r["height"]) == (w, h)
            assert r["usec_per_frame"] == 40_000 + did % 1000
            k = r["frame_idx"]
            x = np.arange(w)[None, :] // 8
            y = np.arange(h)[:, None] // 8
            v = (did * 31 + x * 7 + y * 13 + k * 59) % 256
            ch = 3 if did % 3 == 0 else 1
            want = (int(v.sum()) * ch / (w * h * ch)) / 255.0
            assert abs(r["mean_intensity"] - want) < 1e-15, (did, k)


def test_web_ingestion_ops(spark):
    """WARC parsing + HTML extraction (round-9): framing validated,
    script/style/comments dropped, entities decoded, links collected,
    truncations and malformed records raise — then the production
    kernels over synthesized fixtures against the closed forms."""
    import numpy as np
    import pytest

    from bigdata_meteo_datalake_spark.operators.web import (
        encode_warc,
        extract_html,
        http_response_body,
        http_response_status,
        html_text_features,
        parse_warc,
        synthesize_html_blobs,
        synthesize_warc_blobs,
        warc_response_features,
    )

    # HTML: CDATA script content with '<', entities, nested divs,
    # attribute-less anchors ignored, title whitespace normalized
    r = extract_html(
        "<html><head><title> A  B </title><script>if (1 < 2) {}</script>"
        "<style>p{}</style></head><body><!-- x --><div><div><p>a&amp;b\n"
        "c</p></div></div><a href='u'>t</a><a name='n'>u</a></body></html>"
    )
    assert r == {"title": "A B", "text": "a&b c t u", "links": ["u"]}

    # WARC: roundtrip + every framing failure raises
    w = encode_warc([
        {"type": "warcinfo", "uri": None, "payload": b"sw: x\r\n"},
        {"type": "response", "uri": "https://a/b",
         "payload": b"HTTP/1.1 301 Moved\r\nContent-Length: 2\r\n\r\nhi"},
    ])
    recs = parse_warc(w)
    assert [r["type"] for r in recs] == ["warcinfo", "response"]
    assert http_response_status(recs[1]["payload"]) == 301
    assert http_response_body(recs[1]["payload"]) == b"hi"
    for cut in (3, len(w) // 2, len(w) - 2):
        with pytest.raises(ValueError):
            parse_warc(w[:cut])
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"NOPE/1.0\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n")
    with pytest.raises(ValueError, match="HTTP"):
        http_response_status(b"not http")

    # production kernels vs the closed forms
    d = read_table(spark, SF0001, "documents").limit(15)
    texts = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    rows = {r["doc_id"]: r for r in
            html_text_features(synthesize_html_blobs(d)).collect()}
    for did, r in rows.items():
        norm = " ".join(texts[did].split())
        k = did % 5
        assert r["title"] == f"Doc {did}"
        assert r["n_links"] == k
        assert r["n_chars"] == len(norm) + 5 * k, did

    wrows = warc_response_features(synthesize_warc_blobs(d)).collect()
    by_doc = {}
    for r in wrows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rs in by_doc.items():
        assert len(rs) == 1 + did % 3
        for r in sorted(rs, key=lambda r: r["record_idx"]):
            i = r["record_idx"]
            assert r["target_uri"] == f"https://ex.com/{did}/{i}"
            assert r["http_status"] == (200, 404, 301)[(did + i) % 3]
            assert r["body_bytes"] == len(
                f"body-{did}-{i}-") + (did * 7 + i * 13) % 50


def test_flac_hand_built_decoder_paths():
    """Decoder against the SPEC, independent of our encoder: hand-built
    streams exercising LPC subframes, all three stereo decorrelation
    modes, wasted bits, the 5-bit residual method, multi-partition
    residuals, escape partitions, 8-bit samples, and the blocksize /
    sample-rate header escape codes."""
    import struct

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.flac import (
        _BitW,
        _crc8,
        _crc16,
        decode_flac_pcm,
    )

    def streaminfo(sr, ch, bps, total, block):
        si = _BitW()
        si.write(block, 16)
        si.write(block, 16)
        si.write(0, 24)
        si.write(0, 24)
        si.write(sr, 20)
        si.write(ch - 1, 3)
        si.write(bps - 1, 5)
        si.write(total, 36)
        si.align()
        return (b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:]
                + bytes(si.out) + b"\x00" * 16)  # md5 zero = unchecked

    def frame(head_writer, body_writer):
        hdr = bytes(head_writer.out)
        f = bytearray(hdr)
        f.append(_crc8(hdr))
        body_writer.align()
        f += body_writer.out
        f += struct.pack(">H", _crc16(bytes(f)))
        return bytes(f)

    def header(bs_code, sr_code, ca, ss_code, extras=()):
        h = _BitW()
        h.write(0x3FFE, 14)
        h.write(0, 2)
        h.write(bs_code, 4)
        h.write(sr_code, 4)
        h.write(ca, 4)
        h.write(ss_code, 3)
        h.write(0, 1)
        h.write(0, 8)  # frame number 0
        for v, k in extras:
            h.write(v, k)
        h.align()
        return h

    # 1) LPC subframe, order 2, qlp = [3, -1], shift 1:
    #    s[k] = res[k] + (3*s[k-1] - s[k-2]) >> 1, warm-up [10, 12]
    body = _BitW()
    body.write(0, 1)
    body.write(32 + 1, 6)  # LPC order 2 (100001 + order-1)
    body.write(0, 1)
    body.write(10, 16)
    body.write(12, 16)
    body.write(4, 4)   # precision-1 -> 5 bits
    body.write(1, 5)   # shift 1
    body.write(3, 5)
    body.write(-1 & 0x1F, 5)
    body.write(0, 2)   # rice method 0
    body.write(0, 4)   # partition order 0
    body.write(0, 4)   # rice param 0
    for u in (2, 1):   # residuals +1, -1 (zigzag 2, 1), unary-coded
        body.write(1, u + 1)
    b = streaminfo(8000, 1, 16, 4, 4) + frame(
        header(6, 0, 0, 4, extras=[(3, 8)]), body  # blocksize-1=3 via code 6
    )
    pcm, sr, bps = decode_flac_pcm(b)
    # s2 = 1 + (3*12 - 10)>>1 = 14; s3 = -1 + (3*14 - 12)>>1 = 14
    assert pcm[:, 0].tolist() == [10, 12, 14, 14]

    # 2) stereo decorrelation: verify all three against the same L/R
    left = np.array([100, 102, 101, 99], dtype=np.int64)
    right = np.array([-50, -48, -52, -49], dtype=np.int64)
    side = left - right

    def verbatim(vals, bits):
        w = _BitW()
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in vals:
            w.write(int(v), bits)
        return w

    for ca, (c0, b0), (c1, b1) in (
        (8, (left, 16), (side, 17)),          # left/side
        (9, (side, 17), (right, 16)),         # right/side
        (10, ((left + right) >> 1, 16), (side, 17)),  # mid/side
    ):
        body = _BitW()
        for vals, bits in ((c0, b0), (c1, b1)):
            w = verbatim(vals, bits)
            for byte in w.out:
                body.write(byte, 8)
            if w.n:
                body.write(w.buf, w.n)
        b = streaminfo(44100, 2, 16, 4, 4) + frame(
            header(6, 0, ca, 4, extras=[(3, 8)]), body
        )
        pcm, _, _ = decode_flac_pcm(b)
        assert pcm[:, 0].tolist() == left.tolist(), ca
        assert pcm[:, 1].tolist() == right.tolist(), ca

    # 3) wasted bits (2 wasted -> samples shifted left by 2), constant
    body = _BitW()
    body.write(0, 1)
    body.write(0, 6)   # CONSTANT
    body.write(1, 1)   # wasted flag
    body.write(1, 2)   # unary 1 -> wasted = 2
    body.write(25, 14)  # constant 25 at 16-2 bits -> sample 100
    b = streaminfo(32000, 1, 16, 5, 5) + frame(
        header(6, 0, 0, 4, extras=[(4, 8)]), body
    )
    assert decode_flac_pcm(b)[0][:, 0].tolist() == [100] * 5

    # 4) 5-bit residual method + 2 partitions + escape partition +
    #    8-bit samples + 16-bit blocksize escape + sample-rate escapes
    body = _BitW()
    body.write(0, 1)
    body.write(8, 6)   # FIXED order 0
    body.write(0, 1)
    body.write(1, 2)   # method 1: 5-bit params
    body.write(1, 4)   # partition order 1 -> 2 partitions of 2
    body.write(31, 5)  # partition 1: ESCAPE
    body.write(6, 5)   # raw 6-bit
    body.write(-20 & 0x3F, 6)
    body.write(17 & 0x3F, 6)
    body.write(2, 5)   # partition 2: rice param 2
    for u in (5, 0):   # values -3 (zig 5), 0 (zig 0)
        body.write(1, (u >> 2) + 1)
        body.write(u & 3, 2)
    b = streaminfo(12345, 1, 8, 4, 4) + frame(
        header(7, 13, 0, 1, extras=[(3, 16), (12345, 16)]), body
    )
    pcm, sr, bps = decode_flac_pcm(b)
    assert (sr, bps) == (12345, 8)
    assert pcm[:, 0].tolist() == [-20, 17, -3, 0]


def test_real_bmp_palette_and_rle8():
    """BMP 8-bit palette + RLE8 (round-8): roundtrips across shapes and
    both layouts, run compression on constant rows, small color tables
    via biClrUsed, and a hand-built RLE stream exercising the delta and
    end-of-line escapes independently of our encoder."""
    import struct

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_bmp,
        encode_bmp_palette,
    )

    rng = np.random.default_rng(71)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    for rle in (False, True):
        for w, h in [(1, 1), (5, 3), (33, 2), (16, 16)]:
            idx = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            out = decode_bmp(encode_bmp_palette(idx, pal, rle=rle))
            assert (out == pal[idx]).all(), (rle, w, h)
    const = np.full((7, 300), 42, dtype=np.uint8)
    b = encode_bmp_palette(const, pal, rle=True)
    assert len(b) < 14 + 40 + 1024 + 7 * 8 + 10  # runs actually compress
    assert (decode_bmp(b) == pal[const]).all()
    pal5 = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    idx5 = rng.integers(0, 5, size=(4, 6), dtype=np.uint8)
    assert (decode_bmp(encode_bmp_palette(idx5, pal5, rle=True)) == pal5[idx5]).all()

    # hand-built stream: bottom row = run(2, idx1) + run(2, idx3), EOL;
    # top row = delta(+1, 0) then run(3, idx2), EOL, EOB
    pal2 = np.zeros((4, 3), dtype=np.uint8)
    pal2[1], pal2[2], pal2[3] = (10, 20, 30), (40, 50, 60), (70, 80, 90)
    table = np.zeros((4, 4), dtype=np.uint8)
    table[:, 2::-1] = pal2
    data = bytes([2, 1, 2, 3, 0, 0, 0, 2, 1, 0, 3, 2, 0, 0, 0, 1])
    offset = 14 + 40 + 16
    fh = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 1, len(data), 0, 0, 4, 0)
    out = decode_bmp(fh + dib + table.tobytes() + data)
    want_idx = np.array([[0, 2, 2, 2], [1, 1, 3, 3]])
    assert (out == pal2[want_idx]).all()


def test_codec_roundtrip_property_hypothesis():
    """Property sweep (round-8): ANY random image round-trips exactly
    through PNG (random legal depth/color/filter/interlace), BMP (all
    three layouts), and GIF (interlace on/off); JPEG decodes its own
    encoding with bounded error at q90. Hypothesis shrinks failures to
    minimal images."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_bmp,
        decode_gif,
        decode_jpeg,
        decode_png,
        encode_bmp,
        encode_bmp_palette,
        encode_gif,
        encode_jpeg,
        encode_png,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 20),
        seed=st.integers(0, 2**31),
        mode=st.sampled_from(
            ["png_gray", "png_rgb", "png_rgba", "png_gray16", "png_pal",
             "png_sub4", "bmp_true", "bmp_pal", "bmp_rle", "gif", "gif_i",
             "jpeg"]
        ),
        ft=st.sampled_from([0, 1, 2, 3, 4, "cycle"]),
        interlace=st.booleans(),
    )
    def inner(w, h, seed, mode, ft, interlace):
        rng = np.random.default_rng(seed)
        if mode == "png_gray":
            a = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            assert (decode_png(encode_png(a, filter_type=ft,
                                          interlace=interlace)) == a).all()
        elif mode == "png_rgb":
            a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert (decode_png(encode_png(a, filter_type=ft,
                                          interlace=interlace)) == a).all()
        elif mode == "png_rgba":
            a = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
            assert (decode_png(encode_png(a, filter_type=ft,
                                          interlace=interlace)) == a).all()
        elif mode == "png_gray16":
            a = rng.integers(0, 1 << 16, size=(h, w), dtype=np.uint16)
            assert (decode_png(encode_png(a, filter_type=ft,
                                          interlace=interlace)) == a).all()
        elif mode == "png_pal":
            pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
            a = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
            got = decode_png(encode_png(a, filter_type=ft, palette=pal,
                                        interlace=interlace))
            assert (got == pal[a]).all()
        elif mode == "png_sub4":
            a = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
            got = decode_png(encode_png(a, filter_type=ft, depth=4,
                                        interlace=interlace))
            assert (got == a * 17).all()
        elif mode == "bmp_true":
            a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert (decode_bmp(encode_bmp(a)) == a).all()
        elif mode in ("bmp_pal", "bmp_rle"):
            pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
            a = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            got = decode_bmp(encode_bmp_palette(a, pal,
                                                rle=mode == "bmp_rle"))
            assert (got == pal[a]).all()
        elif mode in ("gif", "gif_i"):
            pal = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
            a = rng.integers(0, 64, size=(h, w), dtype=np.uint8)
            frames, _ = decode_gif(
                encode_gif(a, pal, interlace=mode == "gif_i")
            )
            assert (frames[0] == pal[a]).all()
        else:  # jpeg: bounded error, exact shape/dtype
            a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            out = decode_jpeg(encode_jpeg(a, quality=90))
            assert out.shape == a.shape and out.dtype == np.uint8
            assert np.abs(out.astype(int) - a.astype(int)).max() <= 160

    inner()


def test_round9_codec_roundtrip_property_hypothesis():
    """Property sweep over the round-9 codecs: ANY random input
    round-trips exactly through lossless JPEG (every predictor, 8/12/16
    bit), FLAC (mono/stereo, any block size), the ADPCM nibble-stream
    container, AVI/MJPEG (block-constant frames, any frame count), and
    the arithmetic JPEG entropy layer (arith decode == Huffman decode
    on identical coefficients). Hypothesis shrinks failures to minimal
    inputs."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bigdata_meteo_datalake_spark.operators.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from bigdata_meteo_datalake_spark.operators.flac import (
        decode_flac_pcm,
        encode_flac,
    )
    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_lossless,
    )
    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_wav,
        encode_wav_adpcm,
        ima_adpcm_advance,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 20),
        h=st.integers(1, 16),
        seed=st.integers(0, 2**31),
        mode=st.sampled_from(
            ["jls8", "jls12", "jls16", "jls_rgb", "flac_mono", "flac_stereo",
             "adpcm", "avi", "jpeg_arith"]
        ),
        knob=st.integers(0, 6),
    )
    def inner(w, h, seed, mode, knob):
        rng = np.random.default_rng(seed)
        if mode.startswith("jls"):
            p = {"jls8": 8, "jls12": 12, "jls16": 16, "jls_rgb": 8}[mode]
            shape = (h, w, 3) if mode == "jls_rgb" else (h, w)
            a = rng.integers(0, 1 << p, size=shape)
            a = a.astype(np.uint8 if p == 8 else np.uint16)
            b = encode_jpeg_lossless(a, precision=p, predictor=1 + knob % 7,
                                     restart_interval=knob % 3)
            assert (decode_jpeg(b) == a).all()
        elif mode.startswith("flac"):
            n = 64 + int(rng.integers(0, 400))
            ch = 2 if mode == "flac_stereo" else 1
            s = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
            if ch == 1:
                s = s[:, 0]
            bs = (64, 192, 4096)[knob % 3]
            pcm, sr, _ = decode_flac_pcm(encode_flac(s, 8000, block_size=bs))
            want = s if s.ndim == 2 else s[:, None]
            assert sr == 8000 and np.array_equal(pcm, want)
        elif mode == "adpcm":
            nib = rng.integers(0, 16, size=2 * (20 + int(rng.integers(0, 200))),
                               dtype=np.uint8)
            pred0 = int(rng.integers(-32768, 32768))
            idx0 = int(rng.integers(0, 89))
            wav = encode_wav_adpcm(nib, 8000, block_align=12 + 4 * (knob % 4),
                                   init_pred=pred0, init_index=idx0)
            got, _ = decode_wav(wav)
            nper = (12 + 4 * (knob % 4) - 4) * 2
            pred, idx = pred0, idx0
            ref = [pred]
            for j, v in enumerate(nib):
                if j and j % nper == 0:
                    ref.append(pred)
                pred, idx = ima_adpcm_advance(pred, idx, int(v))
                ref.append(pred)
            assert np.array_equal(got[:, 0] * 32768.0, np.array(ref, float))
        elif mode == "avi":
            nf = 1 + knob % 4
            tiles = rng.integers(0, 256,
                                 size=(nf, (h + 7) // 8, (w + 7) // 8))
            imgs = [t.repeat(8, axis=0).repeat(8, axis=1)[:h, :w]
                    .astype(np.uint8) for t in tiles]
            dec, _ = decode_avi_mjpeg(
                encode_avi_mjpeg([encode_jpeg(i) for i in imgs], w, h)
            )
            assert np.array_equal(dec, np.stack(imgs))
        else:  # jpeg_arith: entropy layers agree on identical coefficients
            a = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            d_h = decode_jpeg(encode_jpeg(a, quality=90))
            d_a = decode_jpeg(encode_jpeg(a, quality=90, arithmetic=True,
                                          progressive=knob % 2 == 1))
            # progressive vs sequential arith share coefficients too
            assert np.array_equal(d_a, d_h)

    inner()


def test_real_tiff_roundtrips_and_guards():
    """TIFF (round-8): roundtrips across both byte orders, compression
    modes, and strip layouts for gray/RGB; PackBits actually compresses
    runs; white-is-zero inverts; unsupported compressions raise the
    declared NotImplementedError; truncation raises ValueError."""
    import struct

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        decode_tiff,
        encode_tiff,
        sniff_format,
    )

    rng = np.random.default_rng(77)
    for bo in ("<", ">"):
        for pb in (False, True):
            for rps in (None, 3):
                g = rng.integers(0, 256, size=(11, 17), dtype=np.uint8)
                b = encode_tiff(g, byteorder=bo, packbits=pb,
                                rows_per_strip=rps)
                assert sniff_format(b) == "tiff"
                assert (decode_tiff(b) == g).all(), (bo, pb, rps)
                c = rng.integers(0, 256, size=(7, 9, 3), dtype=np.uint8)
                b = encode_tiff(c, byteorder=bo, packbits=pb,
                                rows_per_strip=rps)
                assert (decode_tiff(b) == c).all(), (bo, pb, rps)

    const = np.full((20, 400), 9, dtype=np.uint8)
    b = encode_tiff(const, packbits=True)
    assert len(b) < 1000 and (decode_tiff(b) == const).all()

    # white-is-zero photometric inverts (patch tag 262 to 0)
    b = bytearray(encode_tiff(np.array([[0, 255]], dtype=np.uint8)))
    n = struct.unpack_from("<H", b, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack_from("<H", b, off)[0] == 262:
            struct.pack_into("<H", b, off + 8, 0)
    assert decode_tiff(bytes(b)).tolist() == [[255, 0]]

    # LZW-in-TIFF stays a declared boundary (patch tag 259 to 5)
    b = bytearray(encode_tiff(np.zeros((2, 2), dtype=np.uint8)))
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack_from("<H", b, off)[0] == 259:
            struct.pack_into("<H", b, off + 8, 5)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_tiff(bytes(b))
    with pytest.raises(ValueError):
        decode_tiff(b"II*\x00\x08\x00\x00")


def test_real_tiff_through_kernel(spark):
    """Spark plumbing: synthesized TIFFs (byte-order / compression /
    strip mix) flow through the production feature kernel and match the
    closed form exactly."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.multimodal import (
        synthesize_tiff_blobs,
    )

    d = read_table(spark, SF0001, "documents").limit(30)
    feats = {r["doc_id"]: r for r in
             decode_image_features(synthesize_tiff_blobs(d),
                                   decode="real").collect()}
    for did, r in feats.items():
        w, h = 4 + did % 13, 4 + did % 11
        ch = 3 if did % 2 == 0 else 1
        v = ((did * 31 + np.arange(w)[None, :, None] * 7
              + np.arange(h)[:, None, None] * 13
              + np.arange(ch)[None, None, :] * 101) % 256)
        want = (float(v.sum()) / (w * h * ch)) / 255.0
        assert (r["width"], r["height"]) == (w, h)
        assert abs(r["mean_intensity"] - want) < 1e-12, did


def test_url_canonicalization(spark):
    """URL canonicalization (round-9): the six messy classes collapse
    to their stated canonical forms, non-default ports and unknown
    params survive, and the Spark kernel agrees with the pure function
    over the fixture."""
    from bigdata_meteo_datalake_spark.operators.web import (
        canonical_urls,
        canonicalize_url,
        registered_domain,
        synthesize_urls,
    )

    cases = [
        ("https://Example.COM/p/7", "https://example.com/p/7"),
        ("HTTP://site3.org:80/a/b?z=2&a=1", "http://site3.org/a/b?a=1&z=2"),
        ("https://www.Data.NET:443/x?utm_source=t&q=5",
         "https://www.data.net/x?q=5"),
        ("https://ex.com/p#frag9", "https://ex.com/p"),
        ("http://H4.io", "http://h4.io/"),
        ("https://a.b.c.org/d?b=2&a=1&utm_medium=m&fbclid=x1",
         "https://a.b.c.org/d?a=1&b=2"),
        # must-NOT-change cases: real port, unknown param, blank value
        ("https://x.com:8443/p?a=1", "https://x.com:8443/p?a=1"),
        ("https://x.com/p?keep=&b=1", "https://x.com/p?b=1&keep="),
    ]
    for u, want in cases:
        assert canonicalize_url(u) == want, u
    assert registered_domain("www.data.net") == "data.net"
    assert registered_domain("x.com:8443") == "x.com"
    assert registered_domain("localhost") == "localhost"

    d = read_table(spark, SF0001, "documents").limit(18)
    rows = canonical_urls(synthesize_urls(d)).collect()
    assert len(rows) == 18
    for r in rows:
        did = r["doc_id"]
        assert r["url_canonical"] == canonicalize_url(
            synthesize_urls(d).where(f"doc_id = {did}").collect()[0]["url"]
        )
        assert "#" not in r["url_canonical"]
        assert "utm_" not in r["url_canonical"]


def test_exif_orientation_pipeline(spark):
    """EXIF (round-9): APP1 parse in both byte orders, all eight
    published orientation transforms pinned on a 2x2 (involutions
    compose to identity), auto-rotation through the kernel, and the
    no-EXIF default."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.exif import (
        apply_exif_orientation,
        attach_exif,
        parse_exif,
    )
    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        image_exif_features,
        synthesize_exif_jpeg_blobs,
    )

    a = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    want = {
        2: [[2, 1], [4, 3]], 3: [[4, 3], [2, 1]], 4: [[3, 4], [1, 2]],
        5: [[1, 3], [2, 4]], 6: [[3, 1], [4, 2]], 7: [[4, 2], [3, 1]],
        8: [[2, 4], [1, 3]],
    }
    for o, w in want.items():
        assert apply_exif_orientation(a, o).tolist() == w, o
    for o in (2, 3, 4, 5, 7):  # the involutions
        assert np.array_equal(
            apply_exif_orientation(apply_exif_orientation(a, o), o), a
        )

    img = (np.arange(48).reshape(6, 8) % 256).astype(np.uint8)
    img = img.repeat(8, axis=0).repeat(8, axis=1)
    for bo in ("<", ">"):
        j = attach_exif(encode_jpeg(img), orientation=6, make="Cam",
                        model="X", pixel_x=64, pixel_y=48, byte_order=bo)
        m = parse_exif(j)
        assert (m["orientation"], m["make"], m["model"]) == (6, "Cam", "X")
        assert (m["pixel_x"], m["pixel_y"]) == (64, 48)
        assert np.array_equal(decode_jpeg(j), img)  # APP1 is transparent
    assert parse_exif(encode_jpeg(img))["orientation"] == 1

    import pytest

    with pytest.raises(ValueError, match="orientation"):
        attach_exif(encode_jpeg(img), orientation=9)
    bad = attach_exif(encode_jpeg(img), orientation=6)
    i = bad.find(b"Exif\x00\x00") + 6
    bad = bad[:i] + b"XX" + bad[i + 2:]
    with pytest.raises(ValueError, match="byte order"):
        parse_exif(bad)

    # kernel over the fixture matches the closed form (oriented dims)
    d = read_table(spark, SF0001, "documents").limit(16)
    rows = {r["doc_id"]: r for r in image_exif_features(
        synthesize_exif_jpeg_blobs(d)).collect()}
    for did, r in rows.items():
        w, h = 9 + did % 16, 9 + did % 12
        o = 1 + did % 8
        assert r["orientation"] == o and r["make"] == f"Cam{did % 3}"
        assert (r["width"], r["height"]) == ((h, w) if o >= 5 else (w, h))


def test_webdataset_shards(spark):
    """WebDataset (round-9): tar roundtrip with stem grouping in tar
    order, directory-prefixed member names, loud failures on
    extension-less members / empty / non-tar shards and half-missing
    samples — then the production per-sample kernel against the closed
    form."""
    import io
    import tarfile

    import pytest

    from bigdata_meteo_datalake_spark.operators.webdataset import (
        read_webdataset_shard,
        write_webdataset_shard,
    )
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        synthesize_webdataset_shards,
        webdataset_sample_features,
    )

    shard = write_webdataset_shard([
        {"key": "a", "jpg": b"J1", "txt": b"hello"},
        {"key": "b", "txt": b"world", "jpg": b"J2", "json": b"{}"},
    ])
    got = read_webdataset_shard(shard)
    assert [s["key"] for s in got] == ["a", "b"]
    assert got[0]["jpg"] == b"J1" and got[1]["json"] == b"{}"

    # directory-prefixed names group by basename stem
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [("d/x.txt", b"t"), ("d/x.jpg", b"j")]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    got = read_webdataset_shard(buf.getvalue())
    assert got == [{"key": "x", "txt": b"t", "jpg": b"j"}]

    with pytest.raises(ValueError, match="tar"):
        read_webdataset_shard(b"not a tar at all")
    with pytest.raises(ValueError, match="empty"):
        # 1024 zero bytes = a valid tar end-of-archive with no members
        read_webdataset_shard(b"\x00" * 1024)
    # extension-less member
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo(name="noext")
        info.size = 1
        tf.addfile(info, io.BytesIO(b"x"))
    with pytest.raises(ValueError, match="extension"):
        read_webdataset_shard(buf.getvalue())

    # kernel: per-sample rows match the closed form
    import numpy as np

    d = read_table(spark, SF0001, "documents").limit(12)
    rows = webdataset_sample_features(synthesize_webdataset_shards(d)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rs in by_doc.items():
        assert len(rs) == 2 + did % 3
        for r in sorted(rs, key=lambda r: r["key"]):
            j = int(r["key"].split("-")[1])
            w, h = 9 + (did + j) % 16, 9 + (did + j) % 12
            assert r["key"] == f"{did:05d}-{j}"
            assert (r["width"], r["height"]) == (w, h)
            assert r["caption_chars"] == len(f"cap-{did}-{j}")
            x = np.arange(w)[None, :] // 8
            y = np.arange(h)[:, None] // 8
            v = (did * 47 + x * 7 + y * 13 + j * 29) % 256
            assert abs(r["mean_intensity"] - (int(v.sum()) / (w * h)) / 255.0) < 1e-15


def test_jsonl_compressed_shards(spark):
    """Compressed JSONL (round-9, widened round-12): all five codecs —
    three stdlib plus the hand-rolled LZ4 frame codec and the raw-block
    zstd frame form (operators/lz4zstd.py) — roundtrip
    deterministically (gzip mtime pinned), magic-byte sniffing, corrupt
    streams and malformed lines raise — then the production kernel
    against the closed form."""
    import pytest

    from bigdata_meteo_datalake_spark.operators.web import (
        compress_jsonl,
        decompress_jsonl,
        jsonl_shard_records,
        synthesize_jsonl_shards,
    )

    recs = [{"id": "a", "n": 1}, {"id": "b", "n": 2}]
    for codec in ("gzip", "bz2", "xz", "lz4", "zstd"):
        b = compress_jsonl(recs, codec)
        assert decompress_jsonl(b) == recs
        assert b == compress_jsonl(recs, codec)  # deterministic bytes
    with pytest.raises(ValueError, match="magic"):
        decompress_jsonl(b"garbage")
    with pytest.raises(ValueError, match="corrupt"):
        decompress_jsonl(compress_jsonl(recs)[:8])
    import gzip

    with pytest.raises(ValueError, match="malformed JSONL"):
        decompress_jsonl(gzip.compress(b'{"ok": 1}\nnot json\n'))
    with pytest.raises(ValueError, match="empty"):
        decompress_jsonl(gzip.compress(b"\n\n"))
    with pytest.raises(ValueError, match="codec"):
        compress_jsonl(recs, "brotli")
    # an entropy-coded zstd shard is the declared boundary
    from bigdata_meteo_datalake_spark.operators.lz4zstd import (
        ZSTD_FRAME_MAGIC,
    )

    entropy = (ZSTD_FRAME_MAGIC + bytes([0x00, 0x00])
               + ((4 << 3) | (2 << 1) | 1).to_bytes(3, "little")
               + b"\xde\xad\xbe\xef")
    with pytest.raises(NotImplementedError, match="boundary"):
        decompress_jsonl(entropy)

    d = read_table(spark, SF0001, "documents").limit(12)
    rows = jsonl_shard_records(synthesize_jsonl_shards(d)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rs in by_doc.items():
        assert len(rs) == 1 + did % 4
        for r in sorted(rs, key=lambda r: r["line_idx"]):
            i = r["line_idx"]
            assert r["record_id"] == f"{did}-{i}"
            assert r["n"] == did * 7 + i


def test_subtitle_parsing(spark):
    """SRT/WebVTT (round-9): both formats roundtrip through the
    formatters, multi-line text joins, NOTE blocks and cue ids/settings
    are tolerated, malformed timing / inverted cues / empty files
    raise — then the production per-cue kernel against the closed
    form."""
    import pytest

    from bigdata_meteo_datalake_spark.operators.subtitles import (
        format_srt,
        format_vtt,
        parse_subtitles,
        subtitle_cue_features,
        synthesize_subtitle_blobs,
    )

    cues = [{"start_ms": 1000, "end_ms": 4000, "text": "hello world"},
            {"start_ms": 5500, "end_ms": 7250, "text": "two lines"}]
    assert parse_subtitles(format_srt(cues)) == cues
    assert parse_subtitles(format_vtt(cues)) == cues
    multi = "1\n00:00:01,000 --> 00:00:02,000\nline one\nline two\n"
    assert parse_subtitles(multi)[0]["text"] == "line one line two"
    v = ("WEBVTT\n\nNOTE a comment\nstill comment\n\nid1\n"
         "00:00:01.000 --> 00:00:02.000 align:start\ntext\n")
    assert parse_subtitles(v) == [
        {"start_ms": 1000, "end_ms": 2000, "text": "text"}
    ]
    for bad in ("garbage\nmore",
                "1\n00:00:02,000 --> 00:00:01,000\nx\n",
                "",
                "1\n00:00:99,000 --> 00:01:00,000\nx\n"):
        with pytest.raises(ValueError):
            parse_subtitles(bad)

    d = read_table(spark, SF0001, "documents").limit(14)
    rows = subtitle_cue_features(synthesize_subtitle_blobs(d)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rs in by_doc.items():
        assert len(rs) == 2 + did % 4
        for r in sorted(rs, key=lambda r: r["cue_idx"]):
            i = r["cue_idx"]
            start = did * 100 + i * 2000
            assert r["start_ms"] == start
            assert r["end_ms"] == start + 1500 + (did + i) % 500
            assert r["duration_ms"] == 1500 + (did + i) % 500
            assert r["n_chars"] == len(f"cue {did} {i}")


def test_id3_metadata(spark):
    """ID3v2 (round-9): v2.3/v2.4 x all three text encodings roundtrip
    (including non-latin text), padding and MPEG sync handled,
    truncations and unsupported versions raise — then the production
    kernel against the closed form."""
    import pytest

    from bigdata_meteo_datalake_spark.operators.id3 import (
        build_id3v2,
        mp3_metadata_features,
        parse_id3v2,
        synthesize_mp3_blobs,
    )

    for v in (3, 4):
        for enc in (0, 1, 3):
            tag = build_id3v2(version=v, title="Song A", artist="Band B",
                              album="LP", track="3/12", encoding=enc,
                              padding=16)
            m = parse_id3v2(tag + b"\xff\xfb\x90\x00" + bytes(40))
            assert (m["version"], m["title"], m["artist"]) == (v, "Song A",
                                                               "Band B")
            assert (m["album"], m["track"]) == ("LP", "3/12")
            assert m["has_mpeg_sync"] and m["tag_bytes"] == len(tag)
    for enc in (1, 3):
        t = build_id3v2(title="uber-Grüße", encoding=enc)
        assert parse_id3v2(t + b"\xff\xe0")["title"] == "uber-Grüße"
    # no sync after the tag
    assert not parse_id3v2(build_id3v2(title="t") + b"\x00\x00")["has_mpeg_sync"]
    for bad in (b"XXX", build_id3v2(title="t")[:8],
                b"ID3\x02\x00\x00\x00\x00\x00\x00"):
        with pytest.raises(ValueError):
            parse_id3v2(bad)

    d = read_table(spark, SF0001, "documents").limit(16)
    rows = {r["doc_id"]: r for r in
            mp3_metadata_features(synthesize_mp3_blobs(d)).collect()}
    for did, r in rows.items():
        assert r["version"] == (3 if did % 2 == 0 else 4)
        assert r["title"] == f"Track {did}"
        assert r["artist"] == f"Artist {did % 7}"
        assert r["album"] == f"Album {did % 5}"
        assert r["track"] == f"{1 + did % 12}/12"
        assert r["has_mpeg_sync"]


def test_round10_advice_regressions(spark):
    """Round-10 ADVICE fixes, pinned:

    1. T.81 D.1.8/D.1.9 — an arithmetic JPEG that RETAINS its zero
       flush bytes before an RSTn marker (removal is optional for a
       conformant encoder) must still decode.
    2. ID3v2 frames with nonzero FORMAT flags (unsync / compression /
       encryption / grouping / data-length-indicator) transform the
       payload layout — parsing must fail loud, not return garbage.
    3. A multi-stream AVI whose AUDIO strl carries a >=40-byte strf
       must not have that strf mistaken for the video
       BITMAPINFOHEADER.
    4. html_extract_report's oracle closed form survives a document
       whose text normalizes to EMPTY (the first ' ref{i}' anchor then
       has no leading space).
    """
    import struct

    import numpy as np
    import pandas as pd

    from bigdata_meteo_datalake_spark.operators.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from bigdata_meteo_datalake_spark.operators.id3 import (
        build_id3v2,
        parse_id3v2,
    )
    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from bigdata_meteo_datalake_spark.operators.web import (
        html_text_features,
        synthesize_html_blobs,
    )

    # -- 1. retained flush bytes before RSTn --------------------------------
    rng = np.random.default_rng(101)
    tile = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    img = tile.repeat(8, axis=0).repeat(8, axis=1)  # 32x40, 20 MCUs
    good = encode_jpeg(img, arithmetic=True, restart_interval=4)
    assert np.array_equal(decode_jpeg(good), img)
    # retain two zero flush bytes before each RST whose preceding byte
    # is not 0xFF (a zero after 0xFF would be byte stuffing, not flush)
    mut = bytearray()
    i = 0
    while i < len(good):
        if (good[i] == 0xFF and i + 1 < len(good)
                and 0xD0 <= good[i + 1] <= 0xD7 and mut and mut[-1] != 0xFF):
            mut += b"\x00\x00"
        mut.append(good[i])
        i += 1
    assert len(mut) > len(good)  # at least one RST got flush bytes
    assert np.array_equal(decode_jpeg(bytes(mut)), img)

    # -- 2. ID3 format flags fail loud --------------------------------------
    tag = bytearray(build_id3v2(version=3, title="Song"))
    fpos = tag.find(b"TIT2")
    assert fpos > 0
    for fmt in (0x80, 0x40, 0x02):  # compression / encryption / v2.4 unsync
        bad = bytearray(tag)
        bad[fpos + 9] = fmt
        with pytest.raises(NotImplementedError, match="format flags"):
            parse_id3v2(bytes(bad))
    # status-only flags (first flag byte) still parse fine
    ok = bytearray(tag)
    ok[fpos + 8] = 0x40  # v2.3 file-alter-preserve (status, not format)
    assert parse_id3v2(bytes(ok))["title"] == "Song"

    # -- 3. audio strf does not clobber the video compression ---------------
    frame = encode_jpeg(img)
    avi = encode_avi_mjpeg([frame], 40, 32)

    def chunk(cid, payload):
        return (cid + struct.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) & 1 else b""))

    strh_a = (b"auds" + b"\x00\x00\x00\x00"
              + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, 8000, 0, 1, 4, 0, 0)
              + struct.pack("<HHHH", 0, 0, 0, 0))
    # 40-byte WAVEFORMATEX-ish strf whose bytes[16:20] are NOT 'MJPG'
    strf_a = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16) + bytes(24)
    assert len(strf_a) >= 40 and strf_a[16:20] != b"MJPG"
    strl_a = chunk(b"LIST", b"strl" + chunk(b"strh", strh_a)
                   + chunk(b"strf", strf_a))
    # splice the audio strl after the video strl, inside hdrl
    h = avi.find(b"hdrl")
    (hsz,) = struct.unpack_from("<I", avi, h - 4)
    spliced = bytearray(avi)
    spliced[h + hsz:h + hsz] = strl_a
    struct.pack_into("<I", spliced, h - 4, hsz + len(strl_a))
    struct.pack_into("<I", spliced, 4,
                     struct.unpack_from("<I", avi, 4)[0] + len(strl_a))
    dec, _ = decode_avi_mjpeg(bytes(spliced))
    assert np.array_equal(dec[0], img)

    # -- 4. HTML closed form on an empty-text document ----------------------
    sdf = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 2, 5], "text": ["   \t\n ", "", "real body text"]}
    ))
    rows = {r["doc_id"]: r for r in
            html_text_features(synthesize_html_blobs(sdf)).collect()}
    import duckdb

    oracle = {r[0]: r for r in duckdb.sql(
        "SELECT doc_id, cast(doc_id % 5 AS int) AS n_links, "
        "cast(length(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'))) "
        "+ 5 * (doc_id % 5) "
        "- CASE WHEN length(trim(regexp_replace(text, '[ \t\n\r]+', ' ', "
        "'g'))) = 0 AND doc_id % 5 > 0 THEN 1 ELSE 0 END AS bigint) "
        "AS n_chars FROM (VALUES (1, '   \t\n '), (2, ''), "
        "(5, 'real body text')) t(doc_id, text)"
    ).fetchall()}
    for did in (1, 2, 5):
        assert rows[did]["n_links"] == oracle[did][1], did
        assert rows[did]["n_chars"] == oracle[did][2], did


def test_zip_shard_roundtrip_and_kernel(spark):
    """ZIP-container shards (round-10): stored+deflated members
    roundtrip byte-exact with deterministic shard bytes, stem grouping
    follows central-directory order, CRC corruption / missing
    extensions / empty shards / exotic methods fail loudly, and the
    production per-sample kernel matches the closed form."""
    import struct
    import zipfile

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.multimodal import (
        synthesize_zip_shards,
        zip_shard_features,
    )
    from bigdata_meteo_datalake_spark.operators.zipshard import (
        read_zip_shard,
        write_zip_shard,
    )

    samples = [
        {"key": "a0", "jpg": b"\xff\xd8JJ", "txt": b"cap zero",
         "methods": {"jpg": zipfile.ZIP_STORED,
                     "txt": zipfile.ZIP_DEFLATED}},
        {"key": "a1", "jpg": b"\xff\xd8KK" * 50, "txt": b"cap one",
         "methods": {"jpg": zipfile.ZIP_DEFLATED}},
    ]
    shard = write_zip_shard(samples)
    assert shard == write_zip_shard(samples)  # epoch-pinned determinism
    back = read_zip_shard(shard)
    assert [s["key"] for s in back] == ["a0", "a1"]
    assert back[0]["jpg"] == b"\xff\xd8JJ" and back[0]["txt"] == b"cap zero"
    assert back[1]["jpg"] == b"\xff\xd8KK" * 50
    assert back[0]["methods"] == {"jpg": 0, "txt": 8}
    assert back[1]["methods"]["jpg"] == 8
    assert back[1]["methods"]["txt"] == 0  # default STORED

    # rejection paths
    with pytest.raises(ValueError, match="not a ZIP"):
        read_zip_shard(b"PK\x03\x04 nope")
    with pytest.raises(ValueError, match="empty"):
        read_zip_shard(write_zip_shard([]))
    with pytest.raises(ValueError, match="no extension"):
        read_zip_shard(write_zip_shard([{"key": "k", "noext": b"x"}])
                       .replace(b"k.noext", b"knoext\x00"))
    # flip a payload byte of the STORED member -> CRC mismatch
    bad = bytearray(shard)
    i = bad.find(b"\xff\xd8JJ")
    bad[i + 2] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt|CRC"):
        read_zip_shard(bytes(bad))
    # exotic compression method (bzip2 = 12) rejected up front
    buf = __import__("io").BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        info = zipfile.ZipInfo("x.bin", date_time=(1980, 1, 1, 0, 0, 0))
        info.compress_type = zipfile.ZIP_BZIP2
        zf.writestr(info, b"payload")
    with pytest.raises(ValueError, match="unsupported"):
        read_zip_shard(buf.getvalue())

    # production kernel matches the closed form
    d = read_table(spark, SF0001, "documents").limit(24)
    rows = zip_shard_features(synthesize_zip_shards(d)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rs in by_doc.items():
        assert len(rs) == 2 + did % 3
        for r in sorted(rs, key=lambda r: r["key"]):
            j = int(r["key"].rsplit("-", 1)[1])
            w, h = 9 + (did + 2 * j) % 16, 9 + (did + j) % 12
            assert (r["width"], r["height"]) == (w, h)
            assert r["key"] == f"z{did:05d}-{j}"
            assert r["caption_chars"] == len(f"zipcap-{did}-{j}")
            assert r["img_method"] == (0 if (did + j) % 2 == 0 else 8)
            bx = np.arange(w)[None, :] // 8
            by = np.arange(h)[:, None] // 8
            v = (did * 53 + bx * 7 + by * 13 + j * 37) % 256
            want = (int(v.sum()) / (w * h)) / 255.0
            assert abs(r["mean_intensity"] - want) < 1e-15, (did, j)


def _mkpdf(objects: dict, *, trailer_extra: str = "") -> bytes:
    """Assemble numbered PDF objects into a file with a correct xref
    table (test helper for hand-built token-path pins)."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        body = objects[num]
        if isinstance(body, str):
            body = body.encode("latin-1")
        out += str(num).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_pos = len(out)
    n = max(objects) + 1
    out += b"xref\n0 " + str(n).encode() + b"\n0000000000 65535 f \n"
    for num in range(1, n):
        out += ("%010d 00000 n \n" % offsets[num]).encode()
    out += (b"trailer\n<< /Size " + str(n).encode() + b" /Root 1 0 R "
            + trailer_extra.encode() + b" >>\nstartxref\n"
            + str(xref_pos).encode() + b"\n%%EOF\n")
    return bytes(out)


_PDF_SKEL = {
    1: "<< /Type /Catalog /Pages 2 0 R >>",
    2: "<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
    3: ("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        "/Encoding /WinAnsiEncoding >>"),
}


def _page_obj(content_num: int = 5, font: str = "/F1 3 0 R") -> str:
    return ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << {font} >> >> "
            f"/Contents {content_num} 0 R >>")


def _content_obj(ops: bytes) -> bytes:
    return (b"<< /Length " + str(len(ops)).encode() + b" >>\nstream\n"
            + ops + b"\nendstream")


def test_pdf_build_extract_roundtrip():
    """build_pdf -> extract_pdf_text pins: multipage, parens/euro
    escapes, TJ arrays, Flate on and off — plus byte determinism."""
    from bigdata_meteo_datalake_spark.operators.pdf import (
        build_pdf,
        extract_pdf_text,
    )

    pages = [["Doc 7 page 0", "pay(load) 49 €"], ["Doc 7 page 1"]]
    for compress in (False, True):
        for tj in (False, True):
            pdf = build_pdf(pages, compress=compress, use_tj_arrays=tj)
            assert pdf == build_pdf(pages, compress=compress,
                                    use_tj_arrays=tj)
            r = extract_pdf_text(pdf)
            assert r["n_pages"] == 2
            assert r["text"] == "Doc 7 page 0\npay(load) 49 €\nDoc 7 page 1"
    assert extract_pdf_text(build_pdf([[""]]))["text"] == ""


def test_pdf_token_paths_hand_built():
    """Hand-built content stream exercising the exotic tokenizer paths:
    escaped parens, octal escapes, backslash line continuation, hex
    strings, TJ kerning, T* and the ' next-line-show operator —
    against a hand-derived expected string."""
    from bigdata_meteo_datalake_spark.operators.pdf import extract_pdf_text

    ops = (b"BT /F1 12 Tf\n"
           b"(a\\)b) Tj\n"
           b"[(c) -50 (d)] TJ\n"
           b"0 -14 Td (e\\145f) Tj\n"
           b"(g\\\nh) Tj\n"
           b"<68693132> Tj\n"
           b"T* (x) '\n"
           b"ET")
    pdf = _mkpdf({**_PDF_SKEL, 4: _page_obj(), 5: _content_obj(ops)})
    r = extract_pdf_text(pdf)
    assert r == {"n_pages": 1, "text": "a)bcd\neefghhi12\nx"}

    # StandardEncoding (no /Encoding): ASCII passes, high bytes raise
    std = {**_PDF_SKEL,
           3: "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
           4: _page_obj(), 5: _content_obj(b"BT /F1 9 Tf (ok) Tj ET")}
    assert extract_pdf_text(_mkpdf(std))["text"] == "ok"
    std[5] = _content_obj(b"BT /F1 9 Tf (\x80bad) Tj ET")
    with pytest.raises(NotImplementedError, match="StandardEncoding"):
        extract_pdf_text(_mkpdf(std))


def test_pdf_declared_boundaries_and_fuzz():
    """Every declared boundary raises loudly with its specific message,
    and random mutation/truncation never escapes the
    ValueError/NotImplementedError contract."""
    import numpy as np

    from bigdata_meteo_datalake_spark.operators.pdf import (
        build_pdf,
        extract_pdf_text,
    )

    # encryption
    enc = _mkpdf({**_PDF_SKEL, 4: _page_obj(),
                  5: _content_obj(b"BT ET")},
                 trailer_extra="/Encrypt 3 0 R")
    with pytest.raises(NotImplementedError, match="ncrypt"):
        extract_pdf_text(enc)
    # CID font
    cid = {**_PDF_SKEL,
           3: "<< /Type /Font /Subtype /Type0 /BaseFont /Sub+X >>",
           4: _page_obj(), 5: _content_obj(b"BT /F1 9 Tf (x) Tj ET")}
    with pytest.raises(NotImplementedError, match="CID"):
        extract_pdf_text(_mkpdf(cid))
    # /Differences re-encoding
    diff = dict(cid)
    diff[3] = ("<< /Type /Font /Subtype /Type1 /Encoding "
               "<< /Differences [65 /x] >> >>")
    with pytest.raises(NotImplementedError, match="Differences"):
        extract_pdf_text(_mkpdf(diff))
    # non-Flate filter
    lzw = {**_PDF_SKEL, 4: _page_obj(),
           5: (b"<< /Length 4 /Filter /LZWDecode >>\nstream\nABCD"
               b"\nendstream")}
    with pytest.raises(NotImplementedError, match="LZWDecode"):
        extract_pdf_text(_mkpdf(lzw))
    # inline image
    bi = {**_PDF_SKEL, 4: _page_obj(),
          5: _content_obj(b"BT ET BI /W 1 ID \x00 EI")}
    with pytest.raises(NotImplementedError, match="inline image"):
        extract_pdf_text(_mkpdf(bi))
    # corrupt Flate data -> ValueError, not zlib.error
    good = build_pdf([["fuzz seed page"]], compress=True)
    i = good.find(b"stream\n") + 7
    corrupt = good[:i] + b"\xff\xff" + good[i + 2:]
    with pytest.raises(ValueError, match="FlateDecode"):
        extract_pdf_text(corrupt)
    # WinAnsi undefined slot
    undef = {**_PDF_SKEL, 4: _page_obj(),
             5: _content_obj(b"BT /F1 9 Tf (\x81) Tj ET")}
    with pytest.raises(ValueError, match="undefined"):
        extract_pdf_text(_mkpdf(undef))
    # xref-stream marker (a number where 'xref' should be)
    xs = bytearray(good)
    j = xs.rfind(b"xref")
    with pytest.raises((ValueError, NotImplementedError)):
        extract_pdf_text(bytes(xs[:j]) + b"1 0 obj" + bytes(xs[j + 4:]))

    # fuzz: truncations + random byte flips stay inside the contract
    rng = np.random.default_rng(23)
    for cut in (5, 60, len(good) // 2, len(good) - 3):
        try:
            extract_pdf_text(good[:cut])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(120):
        mut = bytearray(good)
        k = int(rng.integers(5, len(mut)))
        mut[k] = int(rng.integers(0, 256))
        try:
            extract_pdf_text(bytes(mut))
        except (ValueError, NotImplementedError):
            pass


def test_pdf_incremental_update_prev_chain():
    """An incremental update (second xref section with /Prev) resolves:
    the NEWEST object body wins and the /Prev chain supplies the
    untouched ones."""
    from bigdata_meteo_datalake_spark.operators.pdf import extract_pdf_text

    base = _mkpdf({**_PDF_SKEL, 4: _page_obj(),
                   5: _content_obj(b"BT /F1 9 Tf (old text) Tj ET")})
    old_xref = int(base.rsplit(b"startxref", 1)[1].split()[0])
    newobj = _content_obj(b"BT /F1 9 Tf (new text) Tj ET")
    upd = bytearray(base)
    off5 = len(upd)
    upd += b"5 0 obj\n" + newobj + b"\nendobj\n"
    xref_pos = len(upd)
    upd += (b"xref\n5 1\n" + ("%010d 00000 n \n" % off5).encode()
            + b"trailer\n<< /Size 6 /Root 1 0 R /Prev "
            + str(old_xref).encode() + b" >>\nstartxref\n"
            + str(xref_pos).encode() + b"\n%%EOF\n")
    assert extract_pdf_text(bytes(upd))["text"] == "new text"


def test_mp3_frame_walk(spark):
    """MP3 deep frame walk (round-10): header fields and frame-length
    arithmetic pinned against hand-computed values, Xing offsets for
    all four (version, mode) layouts, stream-consistency and
    corruption rejection, and the production kernel against the closed
    form."""
    import struct

    from bigdata_meteo_datalake_spark.operators.id3 import build_id3v2
    from bigdata_meteo_datalake_spark.operators.mp3 import (
        build_mp3_frames,
        mp3_frames_features,
        parse_mp3_frames,
        synthesize_mp3_frame_blobs,
    )

    # hand-computed frame lengths: MPEG1 L3 128 kbps @ 44100 ->
    # 144*128000/44100 = 417; MPEG2 L3 64 kbps @ 22050 -> 72*64000/22050
    # = 208
    b = build_mp3_frames(version=1, bitrate_indices=[9] * 3)  # 128 kbps
    assert len(b) == 3 * 417
    r = parse_mp3_frames(b)
    assert (r["version"], r["samplerate"], r["n_frames"]) == (1, 44100, 3)
    assert r["bitrates_kbps"] == [128, 128, 128] and not r["has_xing"]
    assert r["duration_ms"] == 3 * 1152 * 1000 // 44100
    b2 = build_mp3_frames(version=2, bitrate_indices=[8] * 2)  # 64 kbps
    assert len(b2) == 2 * 208
    assert parse_mp3_frames(b2)["duration_ms"] == 2 * 576 * 1000 // 22050

    # Xing at all four side-info offsets — measured from FRAME START,
    # header included (the spec's 36/21/21/13, where a real LAME tag
    # lives), review-fixed from an off-by-4 double count
    for v, mono, off in ((1, False, 36), (1, True, 21),
                         (2, False, 21), (2, True, 13)):
        s = build_mp3_frames(version=v, bitrate_indices=[14, 3],
                             mono=mono, xing_frames=2)
        assert s[off : off + 4] == b"Xing", (v, mono)
        rr = parse_mp3_frames(s)
        assert rr["has_xing"] and rr["declared_frames"] == 2, (v, mono)
    # 'Info' tag (CBR-style) also detected
    s = bytearray(build_mp3_frames(version=1, bitrate_indices=[14],
                                   xing_frames=1))
    s[36:40] = b"Info"
    assert parse_mp3_frames(bytes(s))["has_xing"]

    # ID3v2 tag skipped; rejections
    tagged = build_mp3_frames(version=1, bitrate_indices=[5],
                              id3_tag=build_id3v2(version=4, title="x"))
    assert parse_mp3_frames(tagged)["n_frames"] == 1
    with pytest.raises(ValueError, match="sync"):
        parse_mp3_frames(b"\x12\x34\x56\x78")
    with pytest.raises(ValueError, match="overruns"):
        parse_mp3_frames(b[:-10])
    with pytest.raises(ValueError, match="inconsistent"):
        parse_mp3_frames(build_mp3_frames(version=1, bitrate_indices=[5])
                         + build_mp3_frames(version=2, bitrate_indices=[5]))
    bad = bytearray(b)
    bad[2] = (bad[2] & 0x0F) | 0xF0  # bitrate index 15
    with pytest.raises(ValueError, match="bitrate"):
        parse_mp3_frames(bytes(bad))
    free = bytearray(b)
    free[2] = free[2] & 0x0F  # free-format
    with pytest.raises(ValueError, match="free-format"):
        parse_mp3_frames(bytes(free))

    # production kernel vs closed form
    d = read_table(spark, SF0001, "documents").limit(30)
    rows = {r["doc_id"]: r for r in
            mp3_frames_features(synthesize_mp3_frame_blobs(d)).collect()}
    T1 = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
    T2 = [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
    for did, r in rows.items():
        nf = 8 + did % 5
        t = T1 if did % 2 == 0 else T2
        rate = 44100 if did % 2 == 0 else 22050
        spf = 1152 if did % 2 == 0 else 576
        if did % 3 == 0:
            ks = [t[13]] + [t[(did + j) % 14] for j in range(1, nf)]
            assert r["has_xing"] and r["declared_frames"] == nf
        else:
            ks = [t[did % 14]] * nf
            assert not r["has_xing"] and r["declared_frames"] == -1
        assert (r["version"], r["samplerate"]) == (
            1 if did % 2 == 0 else 2, rate)
        assert r["n_frames"] == nf
        assert (r["min_kbps"], r["max_kbps"]) == (min(ks), max(ks))
        assert r["n_distinct_kbps"] == len(set(ks))
        assert r["duration_ms"] == nf * spf * 1000 // rate


def test_robots_admission(spark):
    """robots.txt admission (round-10): the urllib.robotparser kernel
    against a HAND-WRITTEN expected-decision table (independent of the
    SQL closed form), plus the entry-selection decoy: the specific
    'special-bot' entry blocks everything, so a parser matching the
    wrong entry denies every URL."""
    import pandas as pd
    from urllib.robotparser import RobotFileParser

    from bigdata_meteo_datalake_spark.operators.web import (
        build_robots_txt,
        robots_admission,
        synthesize_crawl_urls,
        synthesize_robots_table,
    )

    # hand-written expectations: (site_kind = site % 3, path, allowed)
    expected = [
        (0, "/public/9", True),
        (0, "/private/9", False),
        (0, "/tmp/x9", False),
        (0, "/private/open/9", True),
        (1, "/public/9", False),
        (1, "/private/open/9", False),
        (2, "/public/9", True),
        (2, "/private/9", True),
    ]
    for kind, path, want in expected:
        rp = RobotFileParser()
        rp.parse(build_robots_txt(kind).splitlines())
        got = rp.can_fetch("*", f"https://site{kind}.example{path}")
        assert got is want, (kind, path)
        # the decoy entry denies its own agent everything
        assert not rp.can_fetch("special-bot",
                                f"https://site{kind}.example{path}")

    # production pipeline decisions match the (policy, path) table
    d = read_table(spark, SF0001, "documents").limit(40)
    rows = robots_admission(
        synthesize_crawl_urls(d), synthesize_robots_table(spark)
    ).collect()
    assert len(rows) == 40
    for r in rows:
        did = r["doc_id"]
        s = did % 10
        assert r["domain"] == f"site{s}.example"
        assert r["url"].startswith(f"https://site{s}.example/")
        if s % 3 == 1:
            want = False
        elif s % 3 == 2:
            want = True
        else:
            want = did % 4 in (0, 3)
        assert r["allowed"] is want, (did, r["url"])


def test_eml_parsing(spark):
    """MIME/EML parsing (round-10): all three transfer encodings
    roundtrip the same text, RFC 2047 subjects decode, attachments are
    flagged without polluting the text, and the declared boundaries
    (no text/plain, deep nesting, unknown encodings, unparseable
    input) raise loudly."""
    from bigdata_meteo_datalake_spark.operators.mime import (
        build_eml,
        eml_text_features,
        parse_eml,
        synthesize_eml_blobs,
    )

    body = "line one = 50% ü\nline (two)"
    for enc in ("quoted-printable", "base64"):
        r = parse_eml(build_eml(from_addr="a@b.c", subject="Grüße",
                                body=body, html="<p>x</p>", encoding=enc))
        assert r["text"] == body and r["subject"] == "Grüße", enc
        assert r["n_parts"] == 2 and not r["has_attachment"]
    # 7bit requires ASCII and passes through
    r = parse_eml(build_eml(from_addr="a@b.c", subject="plain",
                            body="ascii only", encoding="7bit"))
    assert r["text"] == "ascii only" and r["encoding"] == "7bit"
    with pytest.raises(UnicodeEncodeError):
        build_eml(from_addr="a@b.c", subject="s", body="ü", encoding="7bit")
    # attachment flagged, text untouched
    r = parse_eml(build_eml(from_addr="a@b.c", subject="s", body="t",
                            html="<i>h</i>", encoding="base64",
                            attachment=("f.bin", b"\x00\x01\x02")))
    assert r["has_attachment"] and r["n_parts"] == 3 and r["text"] == "t"

    # boundaries
    with pytest.raises(ValueError, match="text/plain"):
        parse_eml(b"From: a@b.c\r\nSubject: s\r\n"
                  b"Content-Type: text/html\r\n\r\n<p>only html</p>")
    with pytest.raises(ValueError, match="transfer encoding"):
        parse_eml(b"From: a@b.c\r\nContent-Type: text/plain\r\n"
                  b"Content-Transfer-Encoding: uuencode\r\n\r\nx")
    deep = build_eml(from_addr="a@b.c", subject="s", body="t",
                     encoding="7bit",
                     attachment=("f.bin", b"x")).replace(
        b"Content-Type: application/octet-stream",
        b'Content-Type: multipart/related; boundary="inner"')
    with pytest.raises(ValueError, match="nested"):
        parse_eml(deep)

    # production kernel vs closed form
    d = read_table(spark, SF0001, "documents").limit(30)
    rows = {r["doc_id"]: r for r in
            eml_text_features(synthesize_eml_blobs(d)).collect()}
    for did, r in rows.items():
        enc = ("7bit", "quoted-printable", "base64")[did % 3]
        suffix = "" if enc == "7bit" else " = 50% ü"
        want = "\n".join(f"mail {did} line {i}{suffix}"
                         for i in range(1 + did % 3))
        assert r["text"] == want, did
        assert r["body_chars"] == len(want)
        assert r["subject"] == (f"Sale ü {did}" if did % 4 == 0
                                else f"Report {did}")
        assert r["from_addr"] == f"user{did % 7}@example.com"
        assert r["encoding"] == enc
        assert r["has_attachment"] == (did % 5 == 0)
        assert r["n_parts"] == (3 if did % 5 == 0 else 2)


def test_feed_discovery(spark):
    """Sitemap/RSS/Atom discovery (round-10): all three formats parse
    to one normalized entry shape, the three date grammars land on the
    same ISO day, sitemap-index files are recognized, the XML-bomb
    guard and malformed inputs raise, and the production kernel
    matches the closed form."""
    from bigdata_meteo_datalake_spark.operators.sitemap import (
        build_atom,
        build_rss,
        build_sitemap,
        feed_discovery_features,
        parse_discovery_doc,
        synthesize_discovery_blobs,
    )

    sm = parse_discovery_doc(build_sitemap(
        [{"loc": "https://a/1", "lastmod": "2026-01-05"},
         {"loc": "https://a/2"}]))
    assert sm["kind"] == "sitemap"
    assert sm["entries"][0] == {"url": "https://a/1", "title": "",
                                "published": "2026-01-05"}
    assert sm["entries"][1]["published"] == ""
    rss = parse_discovery_doc(build_rss(
        [{"title": "T", "link": "https://a/p",
          "pubdate_rfc822": "Mon, 05 Jan 2026 12:30:00 +0000"}]))
    assert rss["entries"][0]["published"] == "2026-01-05"
    atom = parse_discovery_doc(build_atom(
        [{"title": "T", "href": "https://a/e",
          "updated_iso": "2026-01-05T23:59:59Z"}]))
    assert atom["entries"][0]["published"] == "2026-01-05"
    assert parse_discovery_doc(
        build_sitemap([{"loc": "https://a/s.xml"}], index=True)
    )["kind"] == "sitemap_index"

    for bad, msg in (
        (b"<foo/>", "unknown"),
        (b"definitely not xml", "malformed"),
        (b'<?xml version="1.0"?><!DOCTYPE x [<!ENTITY a "b">]><urlset/>',
         "XML-bomb"),
        (build_rss([{"title": "T", "link": "https://a/p",
                     "pubdate_rfc822": "not a date"}]), "RFC 822"),
        (build_sitemap([{"loc": "https://a/1",
                         "lastmod": "Jan 5 2026"}]), "ISO 8601"),
        (b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
         b"<url></url></urlset>", "loc"),
    ):
        with pytest.raises(ValueError, match=msg):
            parse_discovery_doc(bad)

    d = read_table(spark, SF0001, "documents").limit(30)
    rows = feed_discovery_features(synthesize_discovery_blobs(d)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rs in by_doc.items():
        assert len(rs) == 1 + did % 4
        kind = ("sitemap", "rss", "atom")[did % 3]
        for r in sorted(rs, key=lambda r: r["entry_idx"]):
            i = r["entry_idx"]
            assert r["kind"] == kind
            assert r["url"] == f"https://s{did % 10}.example/p/{did}/{i}"
            assert r["title"] == ("" if kind == "sitemap"
                                  else f"Post {did}-{i}")
            assert r["published"] == f"2026-01-{1 + (did + i) % 28:02d}"


def test_csv_sniffing(spark):
    """CSV dialect sniffing (round-10): all four delimiters detected,
    RFC 4180 quote grammar (doubled quotes, embedded delimiters,
    embedded newlines) decoded exactly, rejection paths (undetectable,
    ragged rows, non-UTF-8, empty) raise, and the production kernel
    matches the closed form."""
    from bigdata_meteo_datalake_spark.operators.csvsniff import (
        DELIMITERS,
        build_csv,
        csv_sniff_features,
        sniff_parse_csv,
        synthesize_csv_blobs,
    )

    for delim in DELIMITERS:
        rows = [["a", "b"], ["1", "x y"], ["2", "p q"], ["3", "r s"],
                ["4", f'has{delim}delim'], ["5", 'say "hi"'],
                ["6", "multi\nline"]]
        r = sniff_parse_csv(build_csv(rows, delimiter=delim))
        assert r["delimiter"] == delim
        assert r["rows"] == rows[1:], delim

    with pytest.raises(ValueError, match="dialect"):
        sniff_parse_csv(b"no delimiters here\njust words\nmore words\n")
    with pytest.raises(ValueError, match="columns"):
        sniff_parse_csv(b"a,b,c\n1,2,3\n4,5,6\n7,8,9\n10,11\n12,13,14\n")
    with pytest.raises(ValueError, match="UTF-8"):
        sniff_parse_csv(b"a,b\n\xff\xfe,2\n")
    with pytest.raises(ValueError, match="empty"):
        sniff_parse_csv(b"   \n ")
    with pytest.raises(ValueError, match="data rows"):
        sniff_parse_csv(b"a,b,a,b,a,b\n")

    d = read_table(spark, SF0001, "documents").limit(30)
    rows = {r["doc_id"]: r for r in
            csv_sniff_features(synthesize_csv_blobs(d)).collect()}
    names = {0: "comma", 1: "semicolon", 2: "tab", 3: "pipe"}
    for did, r in rows.items():
        n = 3 + did % 4
        delim = DELIMITERS[did % 4]
        assert r["delimiter_name"] == names[did % 4]
        assert (r["n_rows"], r["n_cols"]) == (n, 3)
        assert r["sum_id"] == n * did * 10 + n * (n - 1) // 2
        want = (f'q"{did}"{n-1}' if (n - 1) % 2 == 0
                else f"v{delim}{n-1}")
        assert r["last_note"] == want, did


def test_unicode_clean_and_crawl_schedule(spark):
    """Unicode NFKC cleanup + politeness scheduling (round-10): the
    five denormalization classes pinned against hand-stated expected
    strings, newline/tab preserved while NUL/ZWSP strip, and the
    domain-partitioned schedule respects the per-round rate with
    every URL scheduled exactly once."""
    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.operators.textnorm import (
        clean_unicode,
        synthesize_dirty_text,
        unicode_clean_features,
    )

    assert clean_unicode("caf\u00e9 1") == {
        "text": "caf\u00e9 1", "n_removed": 0, "changed": False}
    assert clean_unicode("cafe\u0301 1")["text"] == "caf\u00e9 1"
    assert clean_unicode("\ufb01le")["text"] == "file"
    assert clean_unicode("\uff21\uff22")["text"] == "AB"
    r = clean_unicode("a\u0000b\u200b\tc\nd\u202e")
    assert r["text"] == "ab\tc\nd" and r["n_removed"] == 3 and r["changed"]

    d = read_table(spark, SF0001, "documents").limit(25)
    rows = {r["doc_id"]: r for r in
            unicode_clean_features(synthesize_dirty_text(d)).collect()}
    want = {0: "caf\u00e9 ", 1: "caf\u00e9 ", 2: "file ", 3: "AB ", 4: "ab "}
    for did, r in rows.items():
        assert r["text_clean"] == want[did % 5] + str(did), did
        assert r["n_removed"] == (2 if did % 5 == 4 else 0)
        assert r["changed"] == (did % 5 != 0)

    # crawl schedule: rate respected, each URL scheduled exactly once
    from __spark_entry__ import queries as _qs

    sched = _qs()["crawl_schedule_report"](spark, SF0001).collect()
    assert len(sched) == len({r["url"] for r in sched})
    per_round = {}
    for r in sched:
        assert 0 <= r["slot_in_round"] < 4
        k = (r["domain"], r["fetch_round"])
        per_round[k] = per_round.get(k, 0) + 1
    assert max(per_round.values()) <= 4
    # rounds are dense per domain: round k+1 implies a FULL round k
    by_dom = {}
    for (dom, rnd), cnt in per_round.items():
        by_dom.setdefault(dom, {})[rnd] = cnt
    for dom, rounds in by_dom.items():
        top = max(rounds)
        for k in range(top):
            assert rounds[k] == 4, (dom, k)


def test_pdf_xref_streams_and_objstm():
    """PDF 1.5 container layouts (round-10): xref STREAMS (W fields,
    Index, Flate + PNG Up predictor) and compressed /ObjStm object
    packing extract byte-identically to the classic table; the PNG
    row-filter inverter is pinned against hand-applied Sub/Up/Avg/
    Paeth filters; mutation fuzz stays inside the error contract."""
    import zlib

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.pdf import (
        _unpredict,
        build_pdf,
        extract_pdf_text,
    )

    pages = [["Doc 3 page 0", "pay(load) 21 €"], ["Doc 3 page 1"]]
    want = extract_pdf_text(build_pdf(pages))
    for xs, objstm in ((True, False), (True, True)):
        got = extract_pdf_text(build_pdf(pages, xref_stream=xs,
                                         use_objstm=objstm))
        assert got == want, (xs, objstm)
    with pytest.raises(ValueError, match="ObjStm requires"):
        build_pdf(pages, use_objstm=True)

    # PNG predictor inverter: forward-filter two rows by hand with
    # every tag, then invert
    rows = [bytes([10, 250, 7, 3]), bytes([200, 1, 128, 255])]
    for tag in (0, 1, 2, 3, 4):
        enc = bytearray()
        prev = bytes(4)
        for row in rows:
            f = bytearray()
            for i, x in enumerate(row):
                a = row[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                if tag == 0:
                    pred = 0
                elif tag == 1:
                    pred = a
                elif tag == 2:
                    pred = b
                elif tag == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                f.append((x - pred) & 0xFF)
            enc.append(tag)
            enc += f
            prev = row
        assert _unpredict(bytes(enc), 12, 4, 1, 8) == b"".join(rows), tag
    with pytest.raises(NotImplementedError, match="TIFF"):
        _unpredict(b"\x00\x00", 2, 2, 1, 8)
    with pytest.raises(ValueError, match="multiple"):
        _unpredict(b"\x02\x00\x00", 12, 4, 1, 8)

    # fuzz the modern layout like the classic one
    good = build_pdf(pages, xref_stream=True, use_objstm=True)
    rng = np.random.default_rng(31)
    for cut in (8, len(good) // 2, len(good) - 4):
        try:
            extract_pdf_text(good[:cut])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(120):
        mut = bytearray(good)
        k = int(rng.integers(5, len(mut)))
        mut[k] = int(rng.integers(0, 256))
        try:
            extract_pdf_text(bytes(mut))
        except (ValueError, NotImplementedError):
            pass
    # corrupt the predictor declaration -> loud, typed error
    bad = bytearray(good)
    i = bad.find(b"/Predictor 12")
    bad[i + 11 : i + 13] = b"77"
    with pytest.raises((ValueError, NotImplementedError)):
        extract_pdf_text(bytes(bad))


def test_http_body_decodings():
    """HTTP body framing (round-10): chunked transfer decoding (with
    chunk extensions), gzip content decoding, their combination, and
    loud rejection of unknown codings / malformed framing — plus the
    existing WARC test's kernel now exercising all three framings."""
    import gzip

    from bigdata_meteo_datalake_spark.operators.web import (
        _dechunk,
        http_response_body,
    )

    body = b"hello world body"
    assert http_response_body(
        b"HTTP/1.1 200 X\r\nContent-Length: 16\r\n\r\n" + body) == body
    chunked = b"5;ext=a\r\nhello\r\nb\r\n world body\r\n0\r\n\r\n"
    assert http_response_body(
        b"HTTP/1.1 200 X\r\nTransfer-Encoding: chunked\r\n\r\n"
        + chunked) == body
    gz = gzip.compress(body, mtime=0)
    assert http_response_body(
        b"HTTP/1.1 200 X\r\nContent-Encoding: gzip\r\n\r\n" + gz) == body
    both = (f"{len(gz):x}".encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n")
    assert http_response_body(
        b"HTTP/1.1 200 X\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + both) == body
    assert _dechunk(b"0\r\n\r\n") == b""

    for bad, msg in (
        (b"HTTP/1.1 200 X\r\nTransfer-Encoding: br\r\n\r\nx",
         "Transfer-Encoding"),
        (b"HTTP/1.1 200 X\r\nContent-Encoding: zstd\r\n\r\nx",
         "Content-Encoding"),
        (b"HTTP/1.1 200 X\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nx",
         "chunk size"),
        (b"HTTP/1.1 200 X\r\nTransfer-Encoding: chunked\r\n\r\n5\r\nhi",
         "truncated"),
        (b"HTTP/1.1 200 X\r\nContent-Encoding: gzip\r\n\r\nnope",
         "gzip"),
    ):
        with pytest.raises(ValueError, match=msg):
            http_response_body(bad)


def test_mbox_archives(spark):
    """mbox demux (round-10): mboxrd From-munging is REVERSIBLE
    (bodies containing 'From ' and '>From ' lines roundtrip exactly),
    envelope lines are stripped, malformed archives raise, and the
    production kernel matches the closed form."""
    from bigdata_meteo_datalake_spark.operators.mime import (
        build_eml,
        build_mbox,
        mbox_messages_features,
        parse_eml,
        split_mbox,
        synthesize_mbox_blobs,
    )

    tricky = "From the start\n>From quoted\n>>From deeper\nnormal"
    msgs = [build_eml(from_addr="a@b.c", subject=f"S{j}", body=tricky,
                      encoding="7bit") for j in range(3)]
    back = split_mbox(build_mbox(msgs))
    assert len(back) == 3
    for j, m in enumerate(back):
        r = parse_eml(m)
        assert r["subject"] == f"S{j}" and r["text"] == tricky, j

    with pytest.raises(ValueError, match="empty"):
        split_mbox(b"  \n")
    with pytest.raises(ValueError, match="envelope"):
        split_mbox(b"not an mbox\nFrom x\n")

    d = read_table(spark, SF0001, "documents").limit(24)
    rows = {}
    for r in mbox_messages_features(synthesize_mbox_blobs(d)).collect():
        rows[(r["doc_id"], r["msg_idx"])] = r
    for (did, j), r in rows.items():
        enc = ("7bit", "quoted-printable", "base64")[(did + j) % 3]
        sfx = "" if enc == "7bit" else " ü 50%"
        want = "\n".join(f"mb {did}-{j} line {i}{sfx}"
                         for i in range(1 + (did + j) % 2))
        assert r["subject"] == f"Msg {did}-{j}"
        assert r["from_addr"] == f"user{(did + j) % 7}@example.com"
        assert r["encoding"] == enc and r["text"] == want, (did, j)
    n_msgs = {did: 1 + did % 3 for did, _ in rows}
    for did, n in n_msgs.items():
        assert all((did, j) in rows for j in range(n)), did


def test_data_uri_image_extraction(spark):
    """Data-URI embedded images (round-10): embedded JPEGs decode
    through the real codec, the external ref is counted not fetched,
    the non-image data URI is skipped, malformed URIs fail loud, and
    the kernel matches the tile-sum closed form."""
    import base64

    import numpy as np
    import pandas as pd

    from bigdata_meteo_datalake_spark.operators.jpeg import encode_jpeg
    from bigdata_meteo_datalake_spark.operators.web import (
        data_uri_image_features,
        synthesize_html_with_images,
    )

    def run(html):
        sdf = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "blob": [html.encode()]}))
        return data_uri_image_features(sdf).collect()

    tile = (np.arange(16)[:, None] // 8 * 40 + 17).astype(np.uint8)
    img = tile.repeat(1, axis=1).repeat(16, axis=1)[:16, :16]
    b64 = base64.b64encode(encode_jpeg(img)).decode()
    rows = run(f'<img src="data:image/jpeg;base64,{b64}">'
               '<img src="https://x.example/a.jpg">'
               '<img src="data:text/plain;base64,aGk=">')
    assert len(rows) == 1
    assert (rows[0]["width"], rows[0]["height"]) == (16, 16)
    assert rows[0]["n_external"] == 1
    assert abs(rows[0]["mean_intensity"]
               - float(img.mean()) / 255.0) < 1e-12

    with pytest.raises(Exception, match="base64"):
        run('<img src="data:image/jpeg;base64,!!notb64!!">')
    with pytest.raises(Exception, match="encoding"):
        run('<img src="data:image/jpeg,rawdata">')
    with pytest.raises(Exception, match="not a JPEG"):
        run('<img src="data:image/png;base64,aGk=">')

    # production kernel vs closed form
    d = read_table(spark, SF0001, "documents").limit(27)
    got = data_uri_image_features(synthesize_html_with_images(d)).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    seen_docs = {r["doc_id"] for r in got}
    for did in range(27):
        assert (did in seen_docs) == (did % 3 != 0), did
    for did, rs in by_doc.items():
        assert len(rs) == did % 3
        for r in rs:
            i = r["img_idx"]
            w, h = 9 + (did + i) % 16, 9 + (did + i) % 12
            assert (r["width"], r["height"]) == (w, h)
            assert r["n_external"] == 1
            bx = np.arange(w)[None, :] // 8
            by = np.arange(h)[:, None] // 8
            v = (did * 41 + bx * 7 + by * 13 + i * 17) % 256
            want = (int(v.sum()) / (w * h)) / 255.0
            assert abs(r["mean_intensity"] - want) < 1e-15, (did, i)


def test_image_quality_stats(spark):
    """Image quality triage (round-10): stats pinned on a hand-built
    two-value image (exact mean/var/entropy closed forms) and the
    production kernel against the fixture tile forms."""
    import math

    import numpy as np
    import pandas as pd

    from bigdata_meteo_datalake_spark.operators.jpeg import encode_jpeg
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        image_quality_features,
        synthesize_jpeg_blobs,
    )

    # 16x8 image: left tile 40, right tile 200 -> p = 0.5 each
    img = np.zeros((8, 16), dtype=np.uint8)
    img[:, :8] = 40
    img[:, 8:] = 200
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": [3], "blob": [encode_jpeg(img)]}))
    r = image_quality_features(sdf).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (16, 8, 1)
    assert (r["px_min"], r["px_max"]) == (40, 200)
    assert r["mean_px"] == 120.0
    assert r["var_px"] == 6400.0  # ((40-120)^2 + (200-120)^2)/2
    # H = -2 * 0.5*ln(0.5) = ln 2, via the quantized fold
    t = math.floor(0.5 * math.log(0.5) * 1e9 - 0.5)
    want = math.floor(-(2 * t / 1e9) * 10000 + 0.5) / 10000
    assert r["entropy"] == want

    d = read_table(spark, SF0001, "documents").limit(24)
    rows = {r["doc_id"]: r for r in
            image_quality_features(synthesize_jpeg_blobs(d)).collect()}
    for did, r in rows.items():
        w, h = 9 + did % 16, 9 + did % 12
        bx = np.arange(w)[None, :] // 8
        by = np.arange(h)[:, None] // 8
        v = ((did * 31 + bx * 7 + by * 13) % 256).astype(np.int64)
        assert (r["width"], r["height"]) == (w, h)
        assert r["channels"] == (3 if did % 2 == 0 else 1)
        assert (r["px_min"], r["px_max"]) == (int(v.min()), int(v.max()))
        npx = w * h
        mean = v.sum() / npx
        assert r["mean_px"] == math.floor(mean * 1e4 + 0.5) / 1e4
        var = (v * v).sum() / npx - mean * mean
        assert abs(r["var_px"] - math.floor(var * 1e4 + 0.5) / 1e4) < 1e-9


def test_link_graph(spark):
    """Host link graph (round-10): edges recovered through the real
    HTML parser match the ring closed form, a hostless href fails
    loud, and the degree aggregate matches a hand aggregation."""
    import pandas as pd

    from bigdata_meteo_datalake_spark.operators.web import (
        link_graph_edges,
        synthesize_linked_pages,
    )

    d = read_table(spark, SF0001, "documents").limit(30)
    edges = link_graph_edges(synthesize_linked_pages(d)).collect()
    by_doc = {}
    for r in edges:
        assert r["src_domain"] == f"site{r['doc_id'] % 10}.example"
        by_doc.setdefault(r["doc_id"], []).append(r["dst_domain"])
    for did, dsts in by_doc.items():
        want = [f"site{(did + k) % 10}.example"
                for k in range(1, 2 + did % 4)]
        assert sorted(dsts) == sorted(want), did
    assert set(by_doc) == set(range(30))

    bad = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "src_domain": ["s.example"],
        "blob": [b'<a href="/relative/only">x</a>'],
    }))
    with pytest.raises(Exception, match="without a host"):
        link_graph_edges(bad).collect()


def test_exif_gps_geotags(spark):
    """EXIF GPS (round-10): rational DMS triples roundtrip to signed
    decimal degrees in both byte orders, refs sign correctly, zero
    denominators and bad refs fail loud, and the production kernel
    matches the closed form including the 1-degree cell."""
    import math

    import numpy as np

    from bigdata_meteo_datalake_spark.operators.exif import (
        attach_exif,
        parse_exif,
    )
    from bigdata_meteo_datalake_spark.operators.jpeg import encode_jpeg
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        exif_geo_features,
        synthesize_geo_jpeg_blobs,
    )

    j = encode_jpeg(np.full((16, 16), 80, dtype=np.uint8))
    for bo in ("<", ">"):
        g = attach_exif(j, gps=("S", ((37, 1), (48, 1), (3012, 100)),
                                "W", ((122, 1), (25, 1), (990, 100))),
                        byte_order=bo)
        r = parse_exif(g)
        assert abs(r["gps_lat"] - -(37 + 48 / 60 + 30.12 / 3600)) < 1e-12
        assert abs(r["gps_lon"] - -(122 + 25 / 60 + 9.9 / 3600)) < 1e-12
    assert parse_exif(attach_exif(j))["gps_lat"] is None
    with pytest.raises(ValueError, match="denominator"):
        parse_exif(attach_exif(j, gps=("N", ((1, 1), (0, 0), (0, 1)),
                                       "E", ((1, 1), (1, 1), (1, 1)))))
    with pytest.raises(ValueError, match="refs"):
        parse_exif(attach_exif(j, gps=("X", ((1, 1), (1, 1), (1, 1)),
                                       "E", ((1, 1), (1, 1), (1, 1)))))

    d = read_table(spark, SF0001, "documents").limit(24)
    rows = {r["doc_id"]: r for r in
            exif_geo_features(synthesize_geo_jpeg_blobs(d)).collect()}
    for did, r in rows.items():
        lat = (did % 90 + (did * 3 % 60) / 60.0
               + ((did * 7 % 6000) / 100.0) / 3600.0)
        lat *= 1.0 if did % 2 == 0 else -1.0
        lon = (did % 180 + (did * 5 % 60) / 60.0
               + ((did * 11 % 6000) / 100.0) / 3600.0)
        lon *= -1.0 if did % 3 == 0 else 1.0
        assert r["lat"] == math.floor(lat * 1e6 + 0.5) / 1e6, did
        assert r["lon"] == math.floor(lon * 1e6 + 0.5) / 1e6, did
        assert r["cell"] == f"{math.floor(lat)}:{math.floor(lon)}", did


def test_charset_detection(spark):
    """Charset detection (round-10): WHATWG precedence (BOM over meta
    over default), both meta declaration forms, loud rejection of
    unknown/lying declarations, and the production kernel against the
    per-class expected texts."""
    from bigdata_meteo_datalake_spark.operators.web import (
        charset_text_features,
        decode_html_bytes,
        detect_charset,
        synthesize_charset_pages,
    )

    assert detect_charset(b"\xef\xbb\xbfx") == ("utf-8-sig", "bom")
    assert detect_charset(b"\xff\xfex\x00") == ("utf-16-le", "bom")
    assert detect_charset(b"\xfe\xff\x00x") == ("utf-16-be", "bom")
    # BOM wins over a contradicting meta declaration
    assert detect_charset(
        b"\xef\xbb\xbf<meta charset='windows-1252'>")[1] == "bom"
    assert detect_charset(b'<META CHARSET="UTF8">'.lower()
                          ) == ("utf-8", "meta")
    # WHATWG aliasing: iso-8859-1 (and us-ascii) are windows-1252 labels
    assert detect_charset(
        b"<meta http-equiv='content-type' "
        b"content='text/html; charset=iso-8859-1'>") == ("cp1252", "meta")
    assert detect_charset(b'<meta charset="us-ascii">') == ("cp1252", "meta")
    assert detect_charset(b"<p>nothing declared</p>") == ("utf-8", "default")
    with pytest.raises(ValueError, match="unknown declared"):
        detect_charset(b'<meta charset="shift_jis">')
    # a lying declaration still raises: cp1252's undefined 0x81 slot
    with pytest.raises(ValueError, match="does not decode"):
        decode_html_bytes(b'<meta charset="us-ascii">x\x81y')
    # ...while the aliasing does its job: 8859-1-declared smart quotes
    # decode as cp1252 punctuation, not C1 controls
    t, _, _ = decode_html_bytes(
        b'<meta charset="iso-8859-1"><p>\x93hi\x94</p>')
    assert "“hi”" in t
    # utf-16-be content decodes with the BOM stripped
    t, c, h = decode_html_bytes(b"\xfe\xff" + "ok ü".encode("utf-16-be"))
    assert (t, c, h) == ("ok ü", "utf-16-be", "bom")

    d = read_table(spark, SF0001, "documents").limit(20)
    rows = {r["doc_id"]: r for r in
            charset_text_features(synthesize_charset_pages(d)).collect()}
    want = {0: ("utf-8-sig", "bom", "süd"), 1: ("utf-16-le", "bom", "süd"),
            2: ("cp1252", "meta", "café"), 3: ("utf-8", "default", "plain")}
    for did, r in rows.items():
        cs, how, word = want[did % 4]
        assert (r["charset"], r["how"]) == (cs, how), did
        assert r["text"] == f"{word} {did}", did


def test_tfrecord_shards(spark):
    """TFRecord + tf.train.Example (round-10): the CRC32C check value
    and a byte-for-byte hand-assembled Example pin the wire format;
    negative int64 varints, packed float32, unknown-field skipping,
    CRC corruption/truncation rejection, and the production kernel
    against the closed form."""
    import struct

    from bigdata_meteo_datalake_spark.operators.tfrecord import (
        crc32c,
        encode_example,
        parse_example,
        read_tfrecord,
        synthesize_tfrecord_blobs,
        tfrecord_features,
        write_tfrecord,
    )

    # the published Castagnoli check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0

    # hand-assembled Example {'a': int64_list [1]} — every tag byte
    # derived from the proto wire spec by hand
    hand = bytes([0x0A, 0x0C,              # Example.features, len 12
                  0x0A, 0x0A,              # Features.feature entry, len 10
                  0x0A, 0x01, 0x61,        # key 'a'
                  0x12, 0x05,              # value Feature, len 5
                  0x1A, 0x03,              # Feature.int64_list, len 3
                  0x0A, 0x01, 0x01])       # packed varints [1]
    assert encode_example({"a": [1]}) == hand
    assert parse_example(hand) == {"a": ("int64", [1])}

    # negative int64 roundtrips as a 10-byte varint
    ex = encode_example({"n": [-3], "f": [2.5, -0.25], "b": [b"xy"]})
    p = parse_example(ex)
    assert p["n"] == ("int64", [-3])
    assert p["f"] == ("float", [2.5, -0.25])
    assert p["b"] == ("bytes", [b"xy"])

    # unknown fields are skipped: prepend a varint field 7 and a
    # fixed64 field 8 at the Example level
    unknown = bytes([0x38, 0x2A, 0x41]) + struct.pack("<d", 1.5) + hand
    assert parse_example(unknown) == {"a": ("int64", [1])}
    # deprecated group wire type raises
    with pytest.raises(NotImplementedError, match="group"):
        parse_example(bytes([0x3B]) + hand)

    # framing: roundtrip, corruption, truncation, both CRCs checked
    shard = write_tfrecord([ex, hand])
    assert read_tfrecord(shard) == [ex, hand]
    for mut_at, msg in ((4, "length CRC"), (14, "CRC")):
        bad = bytearray(shard)
        bad[mut_at] ^= 0x01
        with pytest.raises(ValueError, match=msg):
            read_tfrecord(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        read_tfrecord(shard[:-1])
    with pytest.raises(ValueError, match="empty"):
        read_tfrecord(b"")

    # production kernel vs closed form
    d = read_table(spark, SF0001, "documents").limit(24)
    rows = {}
    for r in tfrecord_features(synthesize_tfrecord_blobs(d)).collect():
        rows[(r["doc_id"], r["ex_idx"])] = r
    for (did, j), r in rows.items():
        assert r["id_sum"] == did * 99
        assert r["score_sum"] == did * 0.25 + (j + 0.5)
        assert r["tok"] == f"w{did}-{j}"
        assert r["n_features"] == 3
    for did in range(24):
        assert sum(1 for (d2, _) in rows if d2 == did) == 1 + did % 3


def test_safetensors_probe(spark):
    """safetensors (round-10): roundtrip inventory, metadata, and the
    full contract enforcement — lying spans, gaps, overlaps, unknown
    dtypes, uncovered data, malformed JSON all raise — plus the
    production kernel against the closed form."""
    import json
    import struct

    from bigdata_meteo_datalake_spark.operators.safetensors import (
        build_safetensors,
        parse_safetensors,
        safetensors_features,
        synthesize_safetensors_blobs,
    )

    b = build_safetensors(
        [{"name": "w", "dtype": "F32", "shape": [3, 4]},
         {"name": "b", "dtype": "I64", "shape": [4]}],
        metadata={"format": "pt"})
    r = parse_safetensors(b)
    assert r["metadata"] == {"format": "pt"}
    assert [(t["name"], t["n_params"], t["n_bytes"])
            for t in r["tensors"]] == [("w", 12, 48), ("b", 4, 32)]
    # scalar tensor (empty shape) = 1 param
    s0 = parse_safetensors(build_safetensors(
        [{"name": "s", "dtype": "F16", "shape": []}]))
    assert s0["tensors"][0]["n_params"] == 1

    def doctor(mutate):
        (hlen,) = struct.unpack_from("<Q", b, 0)
        h = json.loads(b[8 : 8 + hlen])
        data = b[8 + hlen:]
        h2, data = mutate(h, data)
        hj = json.dumps(h2, separators=(",", ":")).encode()
        return struct.pack("<Q", len(hj)) + hj + data

    with pytest.raises(ValueError, match="span .* !=|!="):
        parse_safetensors(doctor(lambda h, d: (
            {**h, "w": {**h["w"], "shape": [3, 5]}}, d)))
    with pytest.raises(ValueError, match="gap or overlap"):
        parse_safetensors(doctor(lambda h, d: (
            {**h, "b": {**h["b"],
                        "data_offsets": [44, 76]}}, d + bytes(0))))
    with pytest.raises(ValueError, match="unknown dtype"):
        parse_safetensors(doctor(lambda h, d: (
            {**h, "w": {**h["w"], "dtype": "F8"}}, d)))
    with pytest.raises(ValueError, match="cover"):
        parse_safetensors(b + bytes(4))
    with pytest.raises(ValueError, match="malformed"):
        parse_safetensors(struct.pack("<Q", 4) + b"nope" + bytes(2))
    with pytest.raises(ValueError, match="exceeds"):
        parse_safetensors(struct.pack("<Q", 999) + b"{}")

    d = read_table(spark, SF0001, "documents").limit(24)
    rows = {}
    for r in safetensors_features(synthesize_safetensors_blobs(d)).collect():
        rows[(r["doc_id"], r["name"])] = r
    sizes = {"F32": 4, "F16": 2, "I64": 8}
    for (did, name), r in rows.items():
        k = int(name[1:])
        dtype = ("F32", "F16", "I64")[(did + k) % 3]
        n = (2 + did % 3) * (1 + k)
        assert r["dtype"] == dtype and r["n_params"] == n
        assert r["n_bytes"] == n * sizes[dtype]
        assert r["n_tensors"] == 1 + did % 3


def test_audio_vad(spark):
    """Audio VAD (round-10): segment counting pinned on hand-built
    voiced/silence patterns (leading/trailing/single-frame segments,
    all-silence, all-voice), rejection of stereo/odd-length inputs,
    and the production kernel against the closed form."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    from bigdata_meteo_datalake_spark.operators.multimodal import (
        audio_vad_features,
        synthesize_vad_wav_blobs,
    )

    def wav(pcm, ch=1):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(ch)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(np.asarray(pcm, dtype="<i2").tobytes())
        return buf.getvalue()

    def run(frames_mask):
        pcm = np.zeros(len(frames_mask) * 80, dtype=np.int16)
        for f, on in enumerate(frames_mask):
            if on:
                pcm[f * 80 : (f + 1) * 80] = 500
        sdf = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "blob": [wav(pcm)]}))
        return audio_vad_features(sdf).collect()[0]

    r = run([1, 1, 0, 1, 0, 0, 1])  # lead + mid + trailing single
    assert (r["n_frames"], r["n_speech_frames"], r["n_segments"]) == (7, 4, 3)
    assert run([0, 0, 0])["n_segments"] == 0
    assert run([1, 1])["n_segments"] == 1
    assert run([0, 1, 0])["n_segments"] == 1

    with pytest.raises(Exception, match="mono"):
        sdf = spark.createDataFrame(pd.DataFrame(
            {"doc_id": [1], "blob": [wav(np.zeros(160), ch=2)]}))
        audio_vad_features(sdf).collect()
    with pytest.raises(Exception, match="whole positive"):
        sdf = spark.createDataFrame(pd.DataFrame(
            {"doc_id": [1], "blob": [wav(np.zeros(81))]}))
        audio_vad_features(sdf).collect()

    d = read_table(spark, SF0001, "documents").limit(28)
    rows = {r["doc_id"]: r for r in
            audio_vad_features(synthesize_vad_wav_blobs(d)).collect()}
    for did, r in rows.items():
        v, e = 2 + did % 4, did % 7
        assert r["n_frames"] == 28 + e
        assert r["n_speech_frames"] == 4 * v + min(e, v), did
        assert r["n_segments"] == 4 + (1 if e >= 1 else 0), did


def test_round10_review_regressions(spark):
    """Round-10 self-review fixes, pinned:
    1. an UNUSED 0/0 rational in any IFD is tolerated (real firmware
       writes them) while GPS coordinate rationals still validate;
    2. repeated/concatenated proto message fields MERGE per the spec
       (features chunks and same-kind Feature lists concatenate, a
       different oneof kind replaces);
    3. a zero-sample WAV fails the VAD loudly instead of dividing by
       zero."""
    import io
    import struct
    import wave

    import numpy as np
    import pandas as pd

    from bigdata_meteo_datalake_spark.operators.exif import _ifd, parse_exif
    from bigdata_meteo_datalake_spark.operators.jpeg import encode_jpeg
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        audio_vad_features,
    )
    from bigdata_meteo_datalake_spark.operators.tfrecord import (
        encode_example,
        parse_example,
    )

    # 1. unused 0/0 rational (ExposureBias-style) in IFD0: tolerated
    j = encode_jpeg(np.full((16, 16), 50, dtype=np.uint8))
    e = "<"
    ifd0 = _ifd(e, [(0x0112, 3, 1), (0x9204, 5, (0, 0))], 8)
    tiff = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8) + ifd0
    payload = b"Exif\x00\x00" + tiff
    seg = struct.pack(">BBH", 0xFF, 0xE1, len(payload) + 2) + payload
    r = parse_exif(j[:2] + seg + j[2:])
    assert r["orientation"] == 1 and r["gps_lat"] is None

    # 2. proto merge semantics: concatenated Examples UNION their
    # distinct feature keys (last-wins per key, the map rule), and a
    # single map entry whose Feature message arrives in two chunks
    # merges same-kind lists / replaces on a kind switch
    from bigdata_meteo_datalake_spark.operators.tfrecord import _ld

    a = encode_example({"x": [1, 2]})
    merged = parse_example(a + encode_example({"y": [3]}))
    assert merged["x"] == ("int64", [1, 2]) and merged["y"] == ("int64", [3])
    assert parse_example(a + encode_example({"x": [9]}))["x"] == (
        "int64", [9])  # duplicate map key: last wins

    def int64_feature(vals):
        packed = bytearray()
        for v in vals:
            packed += bytes([v])  # small positives: 1-byte varints
        inner = bytearray([0x0A, len(packed)]) + packed
        return _ld(3, bytes(inner))

    entry = (_ld(1, b"v") + _ld(2, int64_feature([1, 2]))
             + _ld(2, int64_feature([3])))  # Feature in TWO chunks
    ex = _ld(1, _ld(1, entry))
    assert parse_example(ex)["v"] == ("int64", [1, 2, 3])

    # 3. zero-sample WAV -> loud ValueError, not ZeroDivisionError
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"")
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "blob": [buf.getvalue()]}))
    with pytest.raises(Exception, match="whole positive"):
        audio_vad_features(sdf).collect()


def test_round10_review_regressions_2():
    """Second self-review round, pinned:
    1. an incremental update that FREES an object tombstones it — the
       older /Prev section cannot resurrect it (refs resolve to null);
    2. the Do operator (Form XObject paint) raises instead of silently
       dropping the XObject's text;
    3. chunked size lines must be 1*HEXDIG — signed/prefixed tokens
       that int(x, 16) would accept raise;
    4. mboxrd roundtrips bodies that END in blank lines."""
    from bigdata_meteo_datalake_spark.operators.mime import (
        build_eml,
        build_mbox,
        parse_eml,
        split_mbox,
    )
    from bigdata_meteo_datalake_spark.operators.pdf import extract_pdf_text
    from bigdata_meteo_datalake_spark.operators.web import _dechunk

    # 1. freed object: base defines page content obj 5, update frees it
    base = _mkpdf({**_PDF_SKEL, 4: _page_obj(),
                   5: _content_obj(b"BT /F1 9 Tf (deleted text) Tj ET")})
    old_xref = int(base.rsplit(b"startxref", 1)[1].split()[0])
    upd = bytearray(base)
    xref_pos = len(upd)
    upd += (b"xref\n5 1\n0000000000 65535 f \n"
            + b"trailer\n<< /Size 6 /Root 1 0 R /Prev "
            + str(old_xref).encode() + b" >>\nstartxref\n"
            + str(xref_pos).encode() + b"\n%%EOF\n")
    # the page's /Contents ref resolves to null -> a contentless page
    # (legal per spec), NOT the resurrected deleted text
    r = extract_pdf_text(bytes(upd))
    assert r == {"n_pages": 1, "text": ""}
    assert extract_pdf_text(base)["text"] == "deleted text"

    # 2. Do at the right altitude: an IMAGE XObject next to text is a
    # silent paint (the common real-world page shape) while a FORM
    # XObject — which can hide text — fails loud, as does an
    # unresolvable name
    page_x = ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
              "/Resources << /Font << /F1 3 0 R >> "
              "/XObject << /Im0 6 0 R /Fm0 7 0 R >> >> /Contents 5 0 R >>")
    im = (b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1 "
          b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 1 >>"
          b"\nstream\nA\nendstream")
    fm = (b"<< /Type /XObject /Subtype /Form /Length 8 >>"
          b"\nstream\nBT ET zz\nendstream")
    objs = {**_PDF_SKEL, 4: page_x, 6: im, 7: fm,
            5: _content_obj(b"q 100 0 0 100 10 10 cm /Im0 Do Q "
                            b"BT /F1 9 Tf (hi) Tj ET")}
    assert extract_pdf_text(_mkpdf(objs))["text"] == "hi"
    objs[5] = _content_obj(b"/Fm0 Do BT ET")
    with pytest.raises(NotImplementedError, match="Form XObjects"):
        extract_pdf_text(_mkpdf(objs))
    objs[5] = _content_obj(b"/Nope Do")
    with pytest.raises(ValueError, match="unknown XObject"):
        extract_pdf_text(_mkpdf(objs))

    # 3. RFC 9112 1*HEXDIG chunk sizes only
    for bad in (b"-2\r\n\r\n0\r\n\r\n", b"0x10\r\n" + b"a" * 16 + b"\r\n",
                b"+10\r\nxxxxxxxxxxxxxxxx\r\n", b"1_0\r\n"):
        with pytest.raises(ValueError, match="chunk size"):
            _dechunk(bad)

    # 4. trailing blank lines survive the mbox roundtrip
    body = "para one\n\npara two\n"  # body ENDING with a newline + blanks
    msg = build_eml(from_addr="a@b.c", subject="s", body=body,
                    encoding="quoted-printable")
    for m in split_mbox(build_mbox([msg, msg])):
        assert parse_eml(m)["text"] == parse_eml(msg)["text"]


def test_foreign_writer_interop():
    """Foreign-writer interop (round-10 lesson: fixture roundtrips
    can't catch shared writer/parser spec mistakes): inputs generated
    by INDEPENDENT serializers — the stdlib email library's own MIME
    generator (folding, boundary generation, CTE selection all its
    choices, not build_eml's), ElementTree's XML serializer, and
    PAX-format tars — must parse through the production kernels."""
    import io
    import tarfile
    import xml.etree.ElementTree as ET
    from email.message import EmailMessage

    from bigdata_meteo_datalake_spark.operators.mime import parse_eml
    from bigdata_meteo_datalake_spark.operators.sitemap import (
        parse_discovery_doc,
    )
    from bigdata_meteo_datalake_spark.operators.webdataset import (
        read_webdataset_shard,
    )

    # email-library-generated MIME (8bit CTE, folded headers, its own
    # boundaries) through parse_eml
    m = EmailMessage()
    m["From"] = "foreign@example.com"
    m["Subject"] = "Grüße from an independent generator with a long subject line"
    m.set_content("body line one\nbody ü line two")
    m.add_alternative("<p>html twin</p>", subtype="html")
    r = parse_eml(m.as_bytes())
    assert r["text"] == "body line one\nbody ü line two"
    assert r["subject"].startswith("Grüße")
    assert r["n_parts"] == 2 and r["encoding"] == "8bit"
    m2 = EmailMessage()
    m2["From"] = "a@b.c"
    m2["Subject"] = "s"
    m2.set_content("plain body")
    m2.add_attachment(b"\x00\x01", maintype="application",
                      subtype="octet-stream", filename="f.bin")
    r2 = parse_eml(m2.as_bytes())
    assert (r2["text"], r2["has_attachment"]) == ("plain body", True)

    # ElementTree-serialized sitemap and Atom (namespaced tags,
    # xml declaration, self-closing links) through the discovery parser
    NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
    ET.register_namespace("", NS)
    root = ET.Element(f"{{{NS}}}urlset")
    u = ET.SubElement(root, f"{{{NS}}}url")
    ET.SubElement(u, f"{{{NS}}}loc").text = "https://f.example/0"
    ET.SubElement(u, f"{{{NS}}}lastmod").text = "2026-02-03"
    sm = parse_discovery_doc(
        ET.tostring(root, xml_declaration=True, encoding="utf-8"))
    assert sm["kind"] == "sitemap"
    assert sm["entries"][0] == {"url": "https://f.example/0", "title": "",
                                "published": "2026-02-03"}
    ANS = "http://www.w3.org/2005/Atom"
    ET.register_namespace("", ANS)
    feed = ET.Element(f"{{{ANS}}}feed")
    e = ET.SubElement(feed, f"{{{ANS}}}entry")
    ET.SubElement(e, f"{{{ANS}}}title").text = "E1"
    ET.SubElement(e, f"{{{ANS}}}link", href="https://f.example/e1")
    ET.SubElement(e, f"{{{ANS}}}updated").text = "2026-02-04T05:06:07Z"
    at = parse_discovery_doc(
        ET.tostring(feed, xml_declaration=True, encoding="utf-8"))
    assert at["entries"][0]["published"] == "2026-02-04"

    # PAX-format tar (extended headers the default writer never emits)
    # through the WebDataset demux
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.PAX_FORMAT) as tf:
        for name, payload in (("k0.txt", b"cap"), ("k0.bin", b"\x01")):
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    samples = read_webdataset_shard(buf.getvalue())
    assert samples == [{"key": "k0", "txt": b"cap", "bin": b"\x01"}]


def _real_tar_blob() -> bytes:
    """A genuine single-member tar (stdlib tarfile writer) — valid
    positional magic AND header checksum."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo(name="member.txt")
        info.size = 3
        tf.addfile(info, io.BytesIO(b"abc"))
    return buf.getvalue()


def test_format_sniff_front_door(spark):
    """The corpus front door (round-10 capstone): every document/
    container signature routes correctly, unknowns quarantine instead
    of raising, and the production kernel matches the cycle."""
    import gzip
    import struct

    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        sniff_payload,
    )
    from bigdata_meteo_datalake_spark.operators.multimodal import (
        format_sniff_features,
        synthesize_mixed_blobs,
    )

    cases = {
        b"%PDF-1.4\n%x": "pdf", b"PK\x03\x04rest": "zip",
        gzip.compress(b"x", mtime=0): "gzip", b"BZh91AY&SY": "bzip2",
        b"\xfd7zXZ\x00\x00": "xz", b"ID3\x04\x00": "mp3",
        b"\xff\xfb\x90\x00": "unknown",  # 4B fragment: not a full frame
        b"\xff\xfeU\x00T\x00" + bytes(600): "unknown",  # UTF-16LE BOM
        b"WARC/1.0\r\nW": "warc",
        b"  <!DOCTYPE HTML><html>": "html",
        b"<?xml version='1.0'?><feed/>": "xml",
        b"Received: by relay\r\n": "email",
        b"\x00\x01\x02 garbage": "unknown", b"": "unknown",
        b"OggS\x00\x02" + bytes(30): "ogg",
        bytes.fromhex("1a45dfa3") + bytes(8): "mkv",
        b"Obj\x01\x04meta": "avro",
        b"ARROW1\x00\x00\xff\xff": "arrow",
        b"\x28\xb5\x2f\xfd\x00\x00": "zstd",
        b"\x04\x22\x4d\x18\x60\x40": "lz4",
        _real_tar_blob(): "tar",
        # 'ustar' at offset 257 WITHOUT a valid header checksum is not
        # tar (a positional magic alone misroutes e.g. large
        # safetensors JSON headers carrying the substring)
        bytes(257) + b"ustar\x00" + bytes(250): "unknown",
        struct.pack("<Q", 2) + b"{}": "safetensors",
        # a safetensors header large enough to place arbitrary text at
        # offset 257 must still sniff as safetensors, even when that
        # text is 'ustar'
        struct.pack("<Q", 601) + b'{"w": "' + b" " * 242 + b"ustar"
        + b" " * 345 + b'"}': "safetensors",
    }
    for blob, want in cases.items():
        assert sniff_payload(blob) == want, (blob[:10], want)
    # a genuine headerless CBR stream sniffs as mp3 (full first frame
    # validated, next sync confirmed)
    from bigdata_meteo_datalake_spark.operators.mp3 import build_mp3_frames

    assert sniff_payload(build_mp3_frames(version=1,
                                          bitrate_indices=[5, 5])) == "mp3"

    d = read_table(spark, SF0001, "documents").limit(30)
    rows = {r["doc_id"]: r["detected"] for r in
            format_sniff_features(synthesize_mixed_blobs(d)).collect()}
    want = ["jpeg", "png", "wav", "flac", "gif", "pdf", "zip", "gzip",
            "mp3", "warc"]
    for did, got in rows.items():
        assert got == want[did % 10], did


def test_round11_advice_regressions(spark):
    """Round-11 ADVICE fixes, pinned:

    1. A classic-xref PDF written with 19-byte single-LF xref entries
       (the tolerance's intended case — testing entry[18] alone can't
       detect it, since in a 19-byte entry byte 18 IS the lone EOL)
       must parse with every entry aligned.
    2. Nonzero garbage between the arithmetic decoder's stop position
       and an RSTn marker is stream corruption, not T.81 flush — it
       must raise, not be skipped.
    3. A frontier URL whose domain has no row in the robots dimension
       must SURVIVE robots_admission with allowed=true (RFC 9309
       2.3.1.2: no robots.txt means unrestricted), not silently vanish
       through an inner join.
    4. A positional 'ustar' at offset 257 is only tar when the POSIX
       header checksum corroborates it.
    """
    import numpy as np
    import pandas as pd

    from bigdata_meteo_datalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        sniff_payload,
    )
    from bigdata_meteo_datalake_spark.operators.pdf import (
        build_pdf,
        extract_pdf_text,
    )
    from bigdata_meteo_datalake_spark.operators.web import (
        robots_admission,
        synthesize_crawl_urls,
        synthesize_robots_table,
    )

    # -- 1. 19-byte single-LF xref entries -----------------------------------
    pages = [["alpha line", "beta line"], ["gamma"], ["delta delta"]]
    good = build_pdf(pages, compress=True, xref_stream=False)
    want = extract_pdf_text(good)
    xs = good.rindex(b"xref\n0 ")
    tr = good.index(b"trailer", xs)
    block = good[xs:tr]
    short = block.replace(b" n \n", b" n\n").replace(b" f \n", b" f\n")
    assert len(short) == len(block) - block.count(b" \n")
    mut = good[:xs] + short + good[tr:]
    # startxref still points at the unchanged 'xref' keyword offset;
    # only the per-entry terminators shrank — a misaligned walk would
    # read garbage offsets and fail loudly downstream
    got = extract_pdf_text(mut)
    assert got["text"] == want["text"] and got["n_pages"] == want["n_pages"]

    # -- 2. nonzero byte before RSTn raises ----------------------------------
    rng = np.random.default_rng(111)
    tile = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    img = tile.repeat(8, axis=0).repeat(8, axis=1)  # 32x40, 20 MCUs
    blob = encode_jpeg(img, arithmetic=True, restart_interval=4)
    assert np.array_equal(decode_jpeg(blob), img)
    i = blob.index(b"\xff\xd0")  # first restart marker
    while blob[i - 1] == 0xFF:  # never split a stuffed/marker pair
        i = blob.index(b"\xff\xd0", i + 1)
    # zeros around the garbage keep any decoder lookahead inside legal
    # flush bytes, so the failure is attributable to the 0x01 itself
    bad = blob[:i] + b"\x00\x00\x00\x00\x01\x00\x00" + blob[i:]
    with pytest.raises(ValueError, match="non-flush byte"):
        decode_jpeg(bad)
    # pure zero flush bytes in the same position still decode
    ok = blob[:i] + b"\x00\x00\x00" + blob[i:]
    assert np.array_equal(decode_jpeg(ok), img)

    # -- 3. unknown domain survives admission as allow-all -------------------
    base = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(8))}))
    urls = synthesize_crawl_urls(base).union(
        spark.createDataFrame(pd.DataFrame({
            "doc_id": [999],
            "domain": ["unregistered.example"],
            "url": ["https://unregistered.example/private/1"],
        }))
    )
    robots = synthesize_robots_table(spark)
    rows = {r["doc_id"]: r for r in
            robots_admission(urls, robots).collect()}
    assert len(rows) == 9  # nothing vanished
    assert rows[999]["allowed"] is True
    assert rows[999]["domain"] == "unregistered.example"
    # registered domains still evaluate their real policy: doc 1 maps
    # to /private/1 on site1.example, whose policy is full disallow
    assert rows[1]["allowed"] is False

    # -- 4. tar needs the checksum corroboration -----------------------------
    real = _real_tar_blob()
    assert sniff_payload(real) == "tar"
    corrupt = bytearray(real)
    corrupt[0] ^= 0x01  # name byte flips -> stored checksum no longer matches
    assert sniff_payload(bytes(corrupt)) == "unknown"


# --- Ogg container (round 11) ---------------------------------------------------------


def test_ogg_crc_published_vectors():
    """The RFC 3533 page CRC (poly 0x04C11DB7, init 0, non-reflected,
    no final XOR) pinned to PUBLISHED check vectors — the same
    discipline as tfrecord.py's masked CRC32C. The table is shared, so
    either vector failing means the polynomial/shift direction is
    wrong, not the fixture:
    - CRC-32/CKSUM (POSIX cksum) is this algorithm + final complement:
      check("123456789") = 0x765E7680.
    - CRC-32/MPEG-2 is this table under init 0xFFFFFFFF:
      check("123456789") = 0x0376E6E7.
    """
    from bigdata_meteo_datalake_spark.operators.ogg import (
        _crc_update,
        ogg_crc,
    )

    assert ogg_crc(b"123456789") ^ 0xFFFFFFFF == 0x765E7680
    assert _crc_update(0xFFFFFFFF, b"123456789") == 0x0376E6E7
    assert ogg_crc(b"") == 0


def _ogg_fixture(did: int) -> tuple[bytes, list[bytes]]:
    from bigdata_meteo_datalake_spark.operators.ogg import build_ogg

    n = 6 + did % 5
    pkts = [bytes((did + j + k) % 256
                  for k in range(260 + (did * 13 + j * 37) % 360))
            for j in range(n)]
    layout = did % 3
    return build_ogg(
        codec="vorbis" if did % 2 == 0 else "opus",
        channels=1 + did % 2,
        sample_rate=[8000, 16000, 22050, 44100, 48000][did % 5]
        if did % 2 == 0 else 48000,
        audio_packets=pkts,
        samples_per_packet=320 if did % 2 == 0 else 960,
        comments=[f"k{i}=v{did}" for i in range(did % 4)],
        packets_per_page=3 - layout,
        span_first=(layout == 2),
    ), pkts


def test_ogg_roundtrip_layouts():
    """Packet reassembly is framing-invariant: the same packets through
    all three page layouts (3/page, 2/page, spanning) parse to the same
    packet stream, page counts match the per-layout closed form, and a
    packet of exactly k*255 bytes gets its explicit 0 lacing
    terminator."""
    from bigdata_meteo_datalake_spark.operators.ogg import (
        build_ogg,
        parse_ogg,
    )

    for did in range(9):
        blob, pkts = _ogg_fixture(did)
        r = parse_ogg(blob)
        n = len(pkts)
        layout = did % 3
        want_pages = {0: 2 + (n + 2) // 3, 1: 2 + (n + 1) // 2,
                      2: n + 3}[layout]
        assert r["n_pages"] == want_pages, did
        assert r["payload_bytes"] == sum(len(p) for p in pkts), did
        assert r["n_packets"] == n + (3 if did % 2 == 0 else 2), did
        assert len(r["comments"]) == did % 4
        assert r["comments"] == [f"k{i}=v{did}" for i in range(did % 4)]
        assert r["has_eos"] is True

    # multiple-of-255 packet: lacing must end with an explicit 0
    blob = build_ogg(codec="opus", channels=1, sample_rate=48000,
                     audio_packets=[bytes(510), b"xy"],
                     samples_per_packet=960, comments=[])
    assert b"\xff\xff\x00" in blob
    r = parse_ogg(blob)
    assert r["n_packets"] == 4 and r["payload_bytes"] == 512
    # opus duration subtracts pre-skip: 2 packets * 960 / 48k = 40 ms
    assert r["duration_ms"] == 40


def test_ogg_rejections():
    """Every malformation fails loud: corrupt CRC, lost capture,
    nonzero version, missing BOS, sequence gaps, multiplexed serials,
    inconsistent continued flag, truncation, trailing data after EOS,
    mid-packet EOF, unknown codec, missing OpusTags, and comment
    overruns."""
    import struct

    from bigdata_meteo_datalake_spark.operators.ogg import (
        ogg_crc,
        parse_ogg,
    )

    blob, _ = _ogg_fixture(1)  # opus, 2 packets/page

    def mutate(b, pos, val):
        m = bytearray(b)
        m[pos] = val
        return bytes(m)

    with pytest.raises(ValueError, match="CRC mismatch"):
        parse_ogg(mutate(blob, 60, blob[60] ^ 1))
    with pytest.raises(ValueError, match="capture pattern"):
        parse_ogg(mutate(blob, 0, ord("X")))
    with pytest.raises(ValueError, match="version"):
        # re-CRC a version-1 page so the version check itself fires
        m = bytearray(blob)
        m[4] = 1
        m[22:26] = b"\x00\x00\x00\x00"
        nseg = m[26]
        end = 27 + nseg + sum(m[27:27 + nseg])
        struct.pack_into("<I", m, 22, ogg_crc(bytes(m[:end])))
        parse_ogg(bytes(m))
    with pytest.raises(ValueError, match="truncated|overruns"):
        parse_ogg(blob[:30])
    with pytest.raises(ValueError, match="data after the EOS"):
        parse_ogg(blob + b"junk")
    with pytest.raises(ValueError, match="not BOS"):
        # second page (no BOS flag) presented as the stream start
        second = blob.index(b"OggS", 4)
        parse_ogg(blob[second:])
    with pytest.raises(ValueError, match="unknown codec"):
        # valid page framing, unrecognized first packet
        from bigdata_meteo_datalake_spark.operators.ogg import _page

        pg = _page(7, 0, 0, 0x02 | 0x04, b"\x08", b"notacode")
        parse_ogg(pg)
    with pytest.raises(ValueError, match="OpusTags"):
        from bigdata_meteo_datalake_spark.operators.ogg import _page

        head = b"OpusHead" + struct.pack("<BBHIhB", 1, 1, 0, 48000, 0, 0)
        pg = _page(7, 0, 0, 0x02 | 0x04, bytes([len(head)]), head)
        parse_ogg(pg)
    with pytest.raises(ValueError, match="declares"):
        from bigdata_meteo_datalake_spark.operators.ogg import _page

        tags = (b"OpusTags" + struct.pack("<I", 1) + b"v"
                + struct.pack("<I", 1 << 30))
        head = b"OpusHead" + struct.pack("<BBHIhB", 1, 1, 0, 48000, 0, 0)
        p0 = _page(7, 0, 0, 0x02, bytes([len(head)]), head)
        p1 = _page(7, 1, 0, 0x04, bytes([len(tags)]), tags)
        parse_ogg(p0 + p1)
    with pytest.raises(ValueError, match="mid-packet"):
        from bigdata_meteo_datalake_spark.operators.ogg import _page

        head = b"OpusHead" + struct.pack("<BBHIhB", 1, 1, 0, 48000, 0, 0)
        p0 = _page(7, 0, 0, 0x02, bytes([len(head)]), head)
        # a page whose last lacing value is 255 with nothing after it
        p1 = _page(7, 1, -1, 0x04, b"\xff", bytes(255))
        parse_ogg(p0 + p1)
    from bigdata_meteo_datalake_spark.operators.ogg import _page

    head = b"OpusHead" + struct.pack("<BBHIhB", 1, 1, 0, 48000, 0, 0)
    tags = b"OpusTags" + struct.pack("<I", 1) + b"v" + struct.pack("<I", 0)
    p0 = _page(7, 0, 0, 0x02, bytes([len(head)]), head)
    with pytest.raises(ValueError, match="multiplexed"):
        parse_ogg(p0 + _page(8, 1, 0, 0x04, bytes([len(tags)]), tags))
    with pytest.raises(ValueError, match="sequence gap"):
        parse_ogg(p0 + _page(7, 2, 0, 0x04, bytes([len(tags)]), tags))
    with pytest.raises(ValueError, match="continued-packet flag"):
        parse_ogg(p0 + _page(7, 1, 0, 0x04 | 0x01, bytes([len(tags)]), tags))
    with pytest.raises(ValueError, match="BOS flag on non-first"):
        parse_ogg(p0 + _page(7, 1, 0, 0x04 | 0x02, bytes([len(tags)]), tags))


# --- Matroska/WebM EBML probe (round 11) -----------------------------------------------


def test_mkv_hand_pinned_bytes():
    """Byte-level EBML pinned BY HAND (not via build_mkv — the round-10
    lesson: writer/parser roundtrips can't catch shared spec mistakes):
    a webm with unknown-size Segment, ms TimestampScale, 2000 ms
    Duration, one Opus audio track, one 40 ms cluster with one
    SimpleBlock. Every varint width and size byte below is hand
    computed from RFC 8794."""
    from bigdata_meteo_datalake_spark.operators.mkv import parse_mkv

    blob = bytes.fromhex(
        "1a45dfa3" "87" "4282" "84" "7765626d"          # EBML{DocType 'webm'}
        "18538067" "ff"                                  # Segment, unknown size
        "1549a966" "92"                                  # Info, 18 bytes
        "2ad7b1" "83" "0f4240"                           #   TimestampScale 1e6
        "4489" "88" "409f400000000000"                   #   Duration 2000.0 (f64)
        "1654ae6b" "98"                                  # Tracks, 24 bytes
        "ae" "96"                                        #   TrackEntry, 22 bytes
        "83" "81" "02"                                   #     TrackType audio
        "86" "86" "415f4f505553"                         #     CodecID 'A_OPUS'
        "e1" "89"                                        #     Audio, 9 bytes
        "b5" "84" "473b8000"                             #       Sampling 48000 (f32)
        "9f" "81" "01"                                   #       Channels 1
        "1f43b675" "89"                                  # Cluster, 9 bytes
        "e7" "81" "28"                                   #   Timestamp 40
        "a3" "84" "81000080"                             #   SimpleBlock
    )
    r = parse_mkv(blob)
    assert r["doc_type"] == "webm"
    assert r["timestamp_scale"] == 1_000_000
    assert r["duration_ms"] == 2000
    assert r["n_tracks"] == 1 and r["video_codec"] == "" and r["width"] == 0
    assert r["audio_codec"] == "A_OPUS"
    assert r["channels"] == 1 and r["sampling_hz"] == 48000
    assert r["n_clusters"] == 1 and r["last_cluster_ms"] == 40
    assert r["n_blocks"] == 1
    # unknown ids are SKIPPED by size (EBML extensibility): a Void
    # element (0xEC) of garbage spliced between Info and Tracks
    # changes nothing
    info_end = blob.index(bytes.fromhex("1654ae6b"))
    spliced = blob[:info_end] + bytes.fromhex("ec85") + b"\xde" * 5 + blob[info_end:]
    assert parse_mkv(spliced) == r


def test_mkv_roundtrip_and_rejections():
    from bigdata_meteo_datalake_spark.operators.mkv import (
        build_mkv,
        parse_mkv,
    )

    for did in (0, 1, 3, 4, 5, 7, 10, 14, 15, 35):
        audio_only = did % 7 == 0
        video_only = (not audio_only) and did % 5 == 0
        nclus = 1 + did % 4
        blob = build_mkv(
            doc_type="webm" if did % 2 == 0 else "matroska",
            duration_ms=1000 + (did * 37) % 60000,
            video_codec=None if audio_only
            else ["V_VP8", "V_VP9", "V_AV1"][did % 3],
            width=320 + 16 * (did % 8), height=240 + 16 * (did % 5),
            audio_codec=None if video_only
            else ("A_OPUS" if did % 2 == 0 else "A_VORBIS"),
            channels=1 + did % 2, sampling_hz=48000,
            writing_app=f"writer-{did}",
            cluster_timestamps_ms=[40 * j for j in range(nclus)],
            unknown_size_segment=(did % 4 == 0),
        )
        r = parse_mkv(blob)
        assert r["duration_ms"] == 1000 + (did * 37) % 60000, did
        assert r["n_tracks"] == (1 if audio_only or video_only else 2), did
        assert r["n_clusters"] == nclus, did
        assert r["last_cluster_ms"] == 40 * (nclus - 1), did
        assert r["writing_app"] == f"writer-{did}", did

    good = build_mkv(duration_ms=500, cluster_timestamps_ms=[0])
    # truncation anywhere raises
    with pytest.raises(ValueError):
        parse_mkv(good[:-3])
    with pytest.raises(ValueError, match="EBML"):
        parse_mkv(b"\x00\x00\x00\x00")
    # data after a known-size Segment
    with pytest.raises(ValueError, match="after the Segment"):
        parse_mkv(good + b"x")
    # a child size overrunning its parent
    bad = bytearray(good)
    pos = bad.index(bytes.fromhex("2ad7b1")) + 3
    bad[pos] = 0xFF  # TimestampScale's 1-byte size -> unknown (all-ones)
    with pytest.raises(ValueError, match="only Segment"):
        parse_mkv(bytes(bad))
    bad = bytearray(good)
    bad[pos] = 0xBF  # size 63 overruns Info
    with pytest.raises(ValueError, match="overruns its parent"):
        parse_mkv(bytes(bad))
    # DocType gate
    with pytest.raises(ValueError, match="DocType"):
        parse_mkv(build_mkv(doc_type="avif", duration_ms=1,
                            cluster_timestamps_ms=[]))
    # fractional Duration handling is pinned in test_round11_review_fixes
    assert parse_mkv(good)["duration_ms"] == 500


def test_round11_review_fixes():
    """Self-review fixes, pinned:

    1. A NIL page (zero lacing values, RFC 3533 allows it) arriving
       MID-PACKET must not clear the open-packet state.
    2. A giant packet laced into thousands of 255-byte segments
       reassembles correctly (and in O(packet), not O(n^2)).
    3. Unknown-size CLUSTERS (RFC 9559 — the MediaRecorder streamed
       layout) parse identically to sized ones.
    4. A fractional Duration (legal: the field is typed float) rounds
       half-up to ms instead of raising.
    """
    import struct

    from bigdata_meteo_datalake_spark.operators.mkv import (
        build_mkv,
        parse_mkv,
    )
    from bigdata_meteo_datalake_spark.operators.ogg import (
        _lacing,
        _page,
        build_ogg,
        parse_ogg,
    )

    # -- 1. nil page mid-packet ----------------------------------------------
    head = b"OpusHead" + struct.pack("<BBHIhB", 1, 1, 0, 48000, 0, 0)
    tags = b"OpusTags" + struct.pack("<I", 1) + b"v" + struct.pack("<I", 0)
    body = bytes(range(256)) * 2  # one 512-byte audio packet
    p0 = _page(7, 0, 0, 0x02, bytes([len(head)]), head)
    p1 = _page(7, 1, 0, 0, bytes([len(tags)]), tags)
    p2 = _page(7, 2, -1, 0, b"\xff", body[:255])       # opens the packet
    p3 = _page(7, 3, -1, 0x01, b"", b"")               # NIL page, continued
    p4 = _page(7, 4, 960, 0x04 | 0x01, _lacing(len(body) - 255), body[255:])
    r = parse_ogg(p0 + p1 + p2 + p3 + p4)
    assert r["n_packets"] == 3 and r["payload_bytes"] == 512
    assert r["n_pages"] == 5

    # -- 2. giant multi-segment packet ---------------------------------------
    big = bytes(i % 251 for i in range(300_000))  # ~1177 lacing segments
    blob = build_ogg(codec="opus", channels=1, sample_rate=48000,
                     audio_packets=[big, b"tail"], samples_per_packet=960,
                     comments=[], packets_per_page=1)
    r = parse_ogg(blob)
    assert r["payload_bytes"] == len(big) + 4

    # -- 3. unknown-size clusters --------------------------------------------
    kw = dict(doc_type="webm", duration_ms=777,
              cluster_timestamps_ms=[0, 40, 80], blocks_per_cluster=2)
    sized = parse_mkv(build_mkv(**kw))
    streamed = parse_mkv(build_mkv(**kw, unknown_size_clusters=True))
    assert streamed == sized
    assert streamed["n_clusters"] == 3 and streamed["n_blocks"] == 6
    assert streamed["last_cluster_ms"] == 80
    # and under an unknown-size Segment simultaneously (fully streamed)
    both = parse_mkv(build_mkv(**kw, unknown_size_clusters=True,
                               unknown_size_segment=True))
    assert both == sized

    # -- 4. fractional Duration rounds, integral stays exact -----------------
    frac = bytearray(build_mkv(doc_type="webm", duration_ms=2,
                               cluster_timestamps_ms=[]))
    dpos = frac.index(bytes.fromhex("4489"))
    frac[dpos + 3 : dpos + 11] = struct.pack(">d", 1234.5)
    assert parse_mkv(bytes(frac))["duration_ms"] == 1235
    frac[dpos + 3 : dpos + 11] = struct.pack(">d", -1.0)
    with pytest.raises(ValueError, match="invalid Duration"):
        parse_mkv(bytes(frac))


def test_round11_review_pass2_fixes():
    """Second-pass review fixes, pinned:

    1. EBML GLOBAL elements (Void 0xEC, CRC-32 0xBF) inside an
       unknown-size Cluster must not end it (RFC 8794 section 11.3:
       globals are descendants of every master element).
    2. Duration = +inf raises ValueError, not OverflowError.
    3. A misspelled audit column against an EMPTY parquet file still
       fails loud (existence is checked against the footer SCHEMA, not
       the chunk list).
    """
    import struct

    import duckdb

    from bigdata_meteo_datalake_spark.operators.mkv import (
        _CLUSTER,
        _CLUSTER_TS,
        _SIMPLE_BLOCK,
        _el,
        _uint_bytes,
        build_mkv,
        parse_mkv,
    )

    # -- 1. Void inside an unknown-size Cluster ------------------------------
    base = build_mkv(doc_type="webm", duration_ms=100,
                     cluster_timestamps_ms=[0], blocks_per_cluster=1,
                     unknown_size_clusters=True, unknown_size_segment=True)
    # splice [Void(5 bytes) + SimpleBlock] after the existing block of
    # the (unknown-size) cluster, i.e. at end of file (the segment is
    # unknown-size too, so the appended bytes are inside it)
    block = _el(_SIMPLE_BLOCK, b"\x81" + struct.pack(">h", 9) + b"\x80"
                + bytes(4))
    spliced = base + bytes.fromhex("ec85") + b"\x00" * 5 + block
    r = parse_mkv(spliced)
    assert r["n_blocks"] == 2  # the post-Void block still counts

    # -- 2. infinite Duration raises ValueError ------------------------------
    import pytest as _pytest

    frac = bytearray(build_mkv(doc_type="webm", duration_ms=2,
                               cluster_timestamps_ms=[]))
    dpos = frac.index(bytes.fromhex("4489"))
    frac[dpos + 3 : dpos + 11] = struct.pack(">d", float("inf"))
    with _pytest.raises(ValueError, match="invalid Duration"):
        parse_mkv(bytes(frac))

    # -- 3. misspelled column vs an empty file fails loud --------------------
    import tempfile, os

    from bigdata_meteo_datalake_spark.operators.parquet_footer import (
        read_footer_from_path,
    )

    tmp = tempfile.mkdtemp()
    p = os.path.join(tmp, "empty.parquet")
    duckdb.sql(f"COPY (SELECT 1 AS a WHERE false) TO '{p}' (FORMAT PARQUET)")
    fo = read_footer_from_path(p)
    assert fo["num_rows"] == 0 and "a" in fo["schema_names"]
    assert "misspelled" not in fo["schema_names"]


# --- WebP container (round 11) ----------------------------------------------------------


def test_webp_roundtrip_and_rejections():
    """All three WebP layouts roundtrip with closed-form chunk/frame
    accounting, and the container fails loud on: wrong magics,
    inconsistent RIFF size, bad VP8 start code, non-keyframe stills,
    bad VP8L signature/version, truncated chunks, and VP8X layout
    flags that lie about the chunks present (both directions)."""
    import struct

    from bigdata_meteo_datalake_spark.operators.webp import (
        build_webp,
        parse_webp,
    )

    for did in range(24):
        layout = ["vp8", "vp8l", "vp8x"][did % 3]
        animated = layout == "vp8x" and did % 2 == 0
        r = parse_webp(build_webp(
            layout=layout, width=16 + did % 300, height=16 + did % 200,
            alpha=(layout == "vp8l" and did % 2 == 1)
            or (layout == "vp8x" and not animated),
            animated=animated, n_frames=1 + did % 4, lossless=did % 4 == 0,
            icc=layout == "vp8x" and did % 7 == 0,
            exif=layout == "vp8x" and did % 5 == 0,
            xmp=layout == "vp8x" and did % 11 == 0,
        ))
        assert r["format"] == layout, did
        assert (r["width"], r["height"]) == (16 + did % 300, 16 + did % 200)
        if animated:
            assert r["n_frames"] == 1 + did % 4
            assert r["total_duration_ms"] == 40 * (1 + did % 4)

    good = build_webp(layout="vp8x", width=20, height=20,
                      animated=True, n_frames=2)
    with pytest.raises(ValueError, match="not a WebP"):
        parse_webp(b"RIFX" + good[4:])
    with pytest.raises(ValueError, match="not a WebP"):
        parse_webp(good[:8] + b"WAVE" + good[12:])
    with pytest.raises(ValueError, match="inconsistent"):
        parse_webp(good[:4] + struct.pack("<I", 5) + good[8:])
    with pytest.raises(ValueError, match="overruns|truncated"):
        parse_webp(good[:4] + struct.pack("<I", len(good) - 10)
                   + good[8:-2])
    # VP8X anim flag cleared but ANIM chunks present
    m = bytearray(good)
    off = m.index(b"VP8X") + 8
    m[off] &= ~0x02
    with pytest.raises(ValueError, match="flag/chunk mismatch"):
        parse_webp(bytes(m))
    # ICC flag set but no ICCP chunk
    m = bytearray(good)
    m[off] |= 0x20
    with pytest.raises(ValueError, match="flag/chunk mismatch"):
        parse_webp(bytes(m))
    # still VP8 must be a keyframe; start code must match
    still = build_webp(layout="vp8", width=32, height=24)
    vp8 = bytearray(still)
    p = vp8.index(b"VP8 ") + 8
    vp8[p] |= 1  # frame type bit -> interframe
    with pytest.raises(ValueError, match="keyframe"):
        parse_webp(bytes(vp8))
    vp8 = bytearray(still)
    vp8[p + 3] = 0x00  # clobber the 9D 01 2A start code
    with pytest.raises(ValueError, match="start code"):
        parse_webp(bytes(vp8))
    # VP8L signature / version
    ll = bytearray(build_webp(layout="vp8l", width=10, height=10))
    q = ll.index(b"VP8L") + 8
    ll[q] = 0x30
    with pytest.raises(ValueError, match="signature"):
        parse_webp(bytes(ll))
    ll = bytearray(build_webp(layout="vp8l", width=10, height=10))
    ll[q + 4] |= 0xE0  # version bits 29-31
    with pytest.raises(ValueError, match="version"):
        parse_webp(bytes(ll))
    # unknown chunks are SKIPPED (the RIFF extensibility rule)
    extra = bytearray(still)
    splice = b"JUNK" + struct.pack("<I", 3) + b"abc\x00"
    spliced = bytes(extra) + splice
    spliced = (spliced[:4]
               + struct.pack("<I", struct.unpack_from("<I", spliced, 4)[0]
                             + len(splice))
               + spliced[8:])
    r = parse_webp(spliced)
    assert r["width"] == 32 and r["n_chunks"] == 2  # VP8 + JUNK


def test_webp_sniff_routes():
    from bigdata_meteo_datalake_spark.operators.media_codecs import (
        sniff_payload,
    )
    from bigdata_meteo_datalake_spark.operators.webp import build_webp

    assert sniff_payload(build_webp(layout="vp8l", width=4, height=4)) \
        == "webp"
    # WAV and AVI RIFFs still route to themselves
    assert sniff_payload(b"RIFF\x04\x00\x00\x00WAVE") == "wav"
    assert sniff_payload(b"RIFF\x04\x00\x00\x00AVI ") == "avi"


def test_webp_review_fixes():
    """WebP review fixes, pinned: (1) a top-level ALPH chunk the VP8X
    alpha flag disowns raises (the flag-lie direction the sibling
    flags already reject); (2) EVERY animation frame's bitstream
    header validates, not just the codec-setting first one."""
    import struct

    from bigdata_meteo_datalake_spark.operators.webp import (
        build_webp,
        parse_webp,
    )

    # ALPH present, alpha flag clear
    still = bytearray(build_webp(layout="vp8x", width=20, height=20,
                                 alpha=True))
    off = still.index(b"VP8X") + 8
    still[off] &= ~0x10
    with pytest.raises(ValueError, match="alpha flag clear"):
        parse_webp(bytes(still))

    # corrupt start code in the SECOND frame of an animation
    anim = bytearray(build_webp(layout="vp8x", width=20, height=20,
                                animated=True, n_frames=3))
    second = anim.index(b"VP8 ", anim.index(b"VP8 ") + 1)
    anim[second + 8 + 3] = 0x00  # 9D -> 00 in frame 2's start code
    with pytest.raises(ValueError, match="start code"):
        parse_webp(bytes(anim))
