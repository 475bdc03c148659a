#!/usr/bin/env python
"""Worked example: audio/video corpus triage end to end — the
round-11 surface composed as one pipeline: a mixed media pile is
routed by the format front door, each container walked by its real
parser (Ogg pages, Matroska/WebM EBML, MP3 frames), speech segments
gated by VAD, the text side screened by the hashed-linear quality
classifier, and the resulting lake audited through its parquet
FOOTERS.

    python examples/av_corpus_run.py [sf_dir]

Stages (each one a registered, oracle-checked operator — this script
only composes them):

1. front door      — sniff_payload routes every blob (ogg / mkv / mp3 /
                     pdf / zip / ... / unknown-quarantine)
2. Ogg triage      — RFC 3533 page walk: codec identity (Vorbis/Opus),
                     channels, duration from granule positions,
                     CRC-validated pages (no audio decode)
3. WebM probe      — EBML walk: codec ids, dimensions, cluster
                     structure, streamed unknown-size layouts included
4. MP3 frame walk  — header-by-header bitrate/duration triage,
                     Xing/VBR detection
5. speech gating   — energy VAD over PCM frames (exact int64 energies)
6. text screening  — fastText-style hashed-linear classifier admission
                     over the caption/text side
7. lake audit      — parquet footer introspection: zone-map bounds
                     from the FOOTER thrift, trusted because the
                     oracle proves footer == data

Every parse stage is a pure per-blob map (blobs never cross an
exchange); the classifier is in-row; the footer audit reads O(footer
bytes) per file. At 100 TB this whole pipeline is scan-map passes plus
one politeness-sized aggregate.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from bigdata_meteo_datalake_spark.queries import queries
    from bigdata_meteo_datalake_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("av-corpus", cpus=8, shuffle_partitions=8)
    qs = queries()

    # 1. the front door: what is in the pile?
    routed = qs["format_sniff_report"](spark, sf_dir)
    print("pile by detected format:",
          dict(sorted(routed.groupBy("detected").count().collect())))

    # 2. Ogg: the podcast/speech shards
    ogg = qs["ogg_pages_report"](spark, sf_dir)
    by_codec = {
        r["codec"]: (r["n"], r["total_s"])
        for r in ogg.groupBy("codec").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("duration_ms") / 1000.0, 1).alias("total_s"),
        ).collect()
    }
    print("ogg shards by codec (count, total seconds):", by_codec)
    print("ogg pages CRC-validated:",
          ogg.agg(F.sum("n_pages")).first()[0])

    # 3. WebM/Matroska: the web-video side
    mkv = qs["mkv_probe_report"](spark, sf_dir)
    print("video codecs:",
          dict(mkv.where(F.col("video_codec") != "")
               .groupBy("video_codec").count().collect()),
          "| audio-only files:",
          mkv.where(F.col("video_codec") == "").count())
    hd = mkv.where(F.col("width") >= 400).count()
    print("clips at >=400px width:", hd,
          "| total clusters:", mkv.agg(F.sum("n_clusters")).first()[0])

    # 4. MP3: frame-walk triage (no audio decode)
    mp3 = qs["mp3_frames_report"](spark, sf_dir)
    vbr = mp3.where(F.col("has_xing")).count()
    print("mp3 streams:", mp3.count(), "| VBR (Xing):", vbr,
          "| mean duration ms:",
          int(mp3.agg(F.avg("duration_ms")).first()[0]))

    # 5. VAD: which audio actually contains speech-like energy?
    vad = qs["audio_vad_report"](spark, sf_dir)
    print("voiced-frame fraction (corpus):",
          round(vad.agg(F.sum("n_speech_frames") / F.sum("n_frames"))
                .first()[0], 4))

    # 6. the text side: model-based admission
    adm = qs["quality_classifier_admission"](spark, sf_dir)
    n, n_admitted = adm.count(), adm.where(F.col("admitted")).count()
    print(f"classifier admission: {n_admitted}/{n} documents "
          f"({n_admitted / n:.1%})")

    # 7. audit the lake itself through its footers
    audit = qs["parquet_footer_report"](spark, sf_dir)
    print("footer audit rows (all hash-verified vs data):", audit.count())
    ev = {r["col"]: (r["min_micro"], r["max_micro"])
          for r in audit.where(F.col("tbl") == "events").collect()}
    print("events zone-map bounds from the FOOTER:", ev)

    spark.stop()


if __name__ == "__main__":
    main()
