#!/usr/bin/env python
"""Worked example: a multimodal media pipeline end to end — the
binary-column workflow (decode, feature-extract, fingerprint, near-dup,
container probe) a multimodal training-data curation job runs, here over
REAL codecs (stdlib PNG + baseline JPEG + PCM WAV + ISO-BMFF metadata,
operators/media_codecs.py, operators/jpeg.py, operators/mp4.py).

    python examples/multimodal_media_run.py [sf_dir]

Stages (each piece a tested operator; this script only composes them):

1. media synthesis   — deterministic real PNGs + WAVs per document
                       (the stand-in for an object-store media scan;
                       with PIL/ffmpeg installed the same pipeline runs
                       on arbitrary formats via the sniffing dispatch)
2. image features    — decode_image_features(decode="real"): dimensions
                       + mean intensity through the actual PNG decoder
3. audio features    — audio_features(decode="real"): duration, sample
                       rate, RMS through the actual WAV decoder
4. perceptual hash   — image_phash_bands(decode="real"): decode -> 8x8
                       nearest resize -> integer aHash as 4 x 16-bit
                       bands (the join-ready LSH layout)
5. near-dup pairs    — banded equi-join on (band_idx, band_value) with a
                       hot-bucket guard, exact Hamming refilter <= 3
                       (pigeonhole-safe for 4 bands)
6. clusters          — connected components over the pair graph
                       (star-contraction; pass reliable=True on a real
                       cluster to checkpoint into fault-tolerant storage)
7. JPEG cross-check  — the same feature kernel over baseline JPEGs
                       (bit-exact on the block-constant fixtures)
8. video probe       — probe_media_containers: ISO-BMFF box parse for
                       duration / track mix, the demux-free selection
                       half of a video pipeline (frame decode stays the
                       declared ffmpeg boundary)

Every stage stays lazy until the final actions; blobs live only between
the synthesize and decode kernels (payloads never join anything), so at
100 TB the decode stages are one zero-shuffle scan-map pass and the only
shuffles are the band join and the CC rounds.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.operators.dedup import connected_components_two_phase
from bigdata_meteo_datalake_spark.operators.multimodal import (
    audio_features,
    decode_image_features,
    image_phash_bands,
    probe_media_containers,
    synthesize_jpeg_blobs,
    synthesize_mp4_blobs,
    synthesize_png_blobs,
    synthesize_wav_blobs,
)
from bigdata_meteo_datalake_spark.session import get_spark
from bigdata_meteo_datalake_spark.sources.lake import read_table

_HOT_BUCKET = 64  # bands shared by more docs are boilerplate imagery
_MAX_HAMMING = 3  # pigeonhole-safe: <= 3 over 4 bands forces a band match


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("multimodal-media", cpus=8, shuffle_partitions=8)

    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    # 1-2. synthesize real PNGs, decode them through the production path
    pngs = synthesize_png_blobs(docs)
    img = decode_image_features(pngs, decode="real")
    print("image features (real PNG decode):")
    img.orderBy("doc_id").show(5)

    # 3. audio twin
    wavs = synthesize_wav_blobs(docs)
    aud = audio_features(wavs, decode="real")
    print("audio features (real WAV decode):")
    aud.orderBy("doc_id").show(5)

    # 4. perceptual hash on real pixels
    sig = image_phash_bands(pngs, decode="real")

    # 5. banded near-dup join: unpivot bands -> drop hot buckets ->
    # equi-join -> exact hamming refilter (same shape as the oracle-gated
    # multimodal_phash_near_dup query)
    long = sig.unpivot("doc_id", ["b0", "b1", "b2", "b3"], "band", "bv")
    hot = long.groupBy("band", "bv").count().where(F.col("count") > _HOT_BUCKET)
    cold = long.join(hot.select("band", "bv"), ["band", "bv"], "left_anti")
    cand = (
        cold.alias("x")
        .join(cold.alias("y"), ["band", "bv"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    hd = sum(
        F.bit_count(F.col(f"xa.b{i}").bitwiseXOR(F.col(f"xb.b{i}")))
        for i in range(4)
    )
    pairs = (
        cand.join(sig.alias("xa"), F.col("doc_a") == F.col("xa.doc_id"))
        .join(sig.alias("xb"), F.col("doc_b") == F.col("xb.doc_id"))
        .select("doc_a", "doc_b", hd.cast("int").alias("hamming"))
        .where(F.col("hamming") <= _MAX_HAMMING)
    )
    n_pairs = pairs.count()
    print(f"near-dup pairs (hamming <= {_MAX_HAMMING}): {n_pairs}")

    # 6. cluster the pair graph (keep one representative per cluster in a
    # real curation job)
    if n_pairs:
        cc = connected_components_two_phase(pairs)
        n_clusters = cc.select("cluster_rep").distinct().count()
        print(f"near-dup clusters: {n_clusters}")
        cc.orderBy("cluster_rep", "node").show(10)

    # 7. the same decode kernel dispatches JPEG by magic bytes — the
    # fixture mix cycles Huffman baseline/progressive, QM ARITHMETIC
    # (SOF9/SOF10), and every subsampling layout; lossless (SOF3) and
    # compressed audio (ADPCM / FLAC) flow through the same gates
    jpegs = synthesize_jpeg_blobs(docs)
    jimg = decode_image_features(jpegs, decode="real")
    print("image features (real baseline-JPEG decode):")
    jimg.orderBy("doc_id").show(5)

    from bigdata_meteo_datalake_spark.operators.multimodal import (
        audio_resample_features,
        synthesize_flac_blobs,
    )

    flacs = synthesize_flac_blobs(docs)
    print("audio features (real FLAC decode, CRC/MD5-verified):")
    audio_features(flacs, decode="real").orderBy("doc_id").show(5)
    print("resample-to-16k (exact-rational linear interpolation):")
    audio_resample_features(wavs).orderBy("doc_id").show(5)

    # 8. video container probe: one row per track, no ffmpeg needed
    mp4s = synthesize_mp4_blobs(docs)
    probe = probe_media_containers(mp4s)
    print("container metadata (ISO-BMFF probe):")
    probe.orderBy("doc_id", "track_id").show(8)

    spark.stop()


if __name__ == "__main__":
    main()
