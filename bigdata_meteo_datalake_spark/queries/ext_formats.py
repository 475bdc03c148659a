"""Round-12 arrival/lakehouse file formats: Avro Object Container
Files (and, added alongside, Delta-log snapshots and ORC footers) —
the remaining shard formats a training-data pipeline meets at the
ingest edge next to TFRecord/WebDataset/ZIP/Parquet.

Every query follows the codec-pillar pattern: a deterministic
synthesizer builds spec-shaped files per document (so the parser runs
under the driver's correctness gate, not just unit tests), the parser
enforces the format's full contract fail-loud, and the report columns
are closed forms the DuckDB oracle recomputes from first principles.

Scale: chained mapInPandas stages over the id spine — zero exchanges;
shards are the unit of parallelism, exactly how these containers are
consumed by ingest jobs.

Reference parity note: the reference repo has no container-file layer
(SURVEY.md section 4); these belong to the training-data pillar.
"""

from __future__ import annotations

from ..sources.lake import read_table
from . import register

# --- Avro Object Container Files -------------------------------------------------

_AVRO_ORACLE = """
WITH e AS (
  SELECT doc_id, j.j AS j
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 5)) AS j) j
  WHERE j.j < 1 + doc_id % 5
),
g AS (
  SELECT doc_id, j, j // 2 AS block_idx FROM e
)
SELECT doc_id,
       cast(block_idx AS int) AS block_idx,
       cast(count(*) AS int) AS n_records,
       CASE doc_id % 3 WHEN 0 THEN 'null' WHEN 1 THEN 'deflate'
                       ELSE 'snappy' END AS codec,
       cast(7 AS int) AS n_fields,
       cast(sum(doc_id * 10 + j) AS bigint) AS id_sum,
       sum(doc_id * 0.5 + j * 0.25) AS score_sum,
       string_agg('n' || doc_id || '-' || j, ',' ORDER BY j) AS name_cat,
       cast(sum(j % 3) AS bigint) AS n_tags,
       cast(sum(CASE WHEN j % 2 = 0 THEN doc_id + j END) AS bigint)
         AS opt_sum,
       cast(coalesce(sum(CASE WHEN j % 3 = 0 THEN doc_id + 3 * j END), 0)
            AS bigint) AS meta_sum,
       string_agg(CASE j % 3 WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta'
                             ELSE 'gamma' END, ',' ORDER BY j) AS kind_cat
FROM g
GROUP BY doc_id, block_idx
"""


@register(
    "avro_shard_report",
    oracle=_AVRO_ORACLE,
    tags=("extension", "formats", "codec"),
)
def avro_shard_report(spark, sf_dir):
    """Avro Object Container File processing end to end (round-12) —
    the row-oriented arrival format, all stdlib from the public Avro
    1.11 spec: per document a shard whose records exercise every avro
    type family in one schema (long, double, string, array, null|long
    union, map, enum), two records per block, codec cycling
    null / raw-deflate / HAND-ROLLED snappy (varint preamble, literal
    and 1-2-4-byte-offset copy tags, avro's big-endian CRC32 suffix)
    by doc_id % 3. The reader enforces the full contract — magic,
    mandatory schema metadata, per-block sync-marker equality, records
    consuming each block's bytes EXACTLY, typed decode with bounded
    counts — and the report emits one row per data block with
    per-column aggregates of the DECODED values, all closed forms the
    oracle recomputes (the decode is only hash-right if every layer,
    codec included, is right).

    Scale: two chained mapInPandas stages over the id spine, zero
    exchanges; OCF blocks are independently decodable, so at 100 TB
    the same kernel fans out per (file, block) split exactly like the
    Spark-Avro reader's own partitioning."""
    from ..operators.avro_ocf import avro_features, synthesize_avro_blobs

    d = read_table(spark, sf_dir, "documents")
    return avro_features(synthesize_avro_blobs(d))


# --- Delta _delta_log snapshot reconstruction -------------------------------------

_DELTA_ORACLE = """
WITH p AS (
  SELECT doc_id, 1 + doc_id % 4 AS nv FROM documents
),
lv AS (
  -- live versions: the last two (one for single-version tables);
  -- identifiers stay case-distinct (DuckDB is case-insensitive)
  SELECT doc_id, nv,
         unnest(CASE WHEN nv = 1 THEN [0] ELSE [nv - 2, nv - 1] END) AS ver
  FROM p
)
SELECT doc_id,
       cast(nv - 1 AS int) AS table_version,
       cast(count(*) AS int) AS n_live_files,
       cast(sum(100 * (ver + 1) + doc_id) AS bigint) AS live_bytes,
       cast(sum(10 + ver + doc_id % 7) AS bigint) AS live_rows,
       cast(count(DISTINCT ver % 3) AS int) AS n_partitions,
       cast(1 AS int) AS min_reader,
       cast(3 AS int) AS n_schema_fields,
       (doc_id % 3 = 2 AND nv >= 3) AS used_checkpoint,
       string_agg('f' || ver || '.parquet', ',' ORDER BY ver) AS live_path_cat
FROM lv
GROUP BY doc_id, nv
"""


@register(
    "delta_log_snapshot",
    oracle=_DELTA_ORACLE,
    tags=("extension", "formats", "lakehouse"),
)
def delta_log_snapshot(spark, sf_dir):
    """Delta Lake ``_delta_log`` snapshot reconstruction end to end
    (round-12) — the lakehouse table audit, from the public Delta
    transaction-log protocol: per document a synthetic table history
    (1 + doc_id % 4 versions of add/remove/metaData/protocol/
    commitInfo JSON actions; every third eligible table CHECKPOINTED
    as parquet with its pre-checkpoint JSON cleaned, so the
    ``_last_checkpoint`` branch is load-bearing, not decorative) is
    replayed under the protocol's contract — contiguous versions,
    one action per object, last-writer-wins per path, checkpoint
    size accounting — into one snapshot row per table: version,
    live-file set (paths, bytes, stats rows), partition spread, and
    protocol/schema facts, all closed forms the oracle recomputes.

    Scale: two chained mapInPandas stages over the id spine, zero
    exchanges; one table's log replay is inherently sequential (the
    protocol is a serial history) but tables are independent — at a
    million-table estate the kernel IS the per-table unit of
    parallelism, and within one giant table the checkpoint bounds
    the JSON tail to O(retention window)."""
    from ..operators.delta_log import (
        delta_snapshot_features,
        synthesize_delta_logs,
    )

    d = read_table(spark, sf_dir, "documents")
    return delta_snapshot_features(synthesize_delta_logs(d))


# --- ORC postscript/footer audit ---------------------------------------------------

#: audited (table, column, kind) — the SAME fixed-width set the parquet
#: footer audit uses (queries/ext_layout.py), so the two columnar-footer
#: readers are held to one standard
def _orc_columns():
    from .ext_layout import _PQF_COLUMNS

    return _PQF_COLUMNS


def _orc_codec_by_table() -> dict[str, str]:
    cols = _orc_columns()
    tables = sorted({t for t, _, _ in cols})
    return {t: ("none", "zlib", "snappy")[i % 3]
            for i, t in enumerate(tables)}


def _orc_arm(tbl: str, col: str, kind: str, codec: str) -> str:
    if kind == "int":
        mn = f"cast(min({col}) * 1000000 AS bigint)"
        mx = f"cast(max({col}) * 1000000 AS bigint)"
    else:
        mn = f"cast(floor(min({col}) * 1000000 + 0.5) AS bigint)"
        mx = f"cast(floor(max({col}) * 1000000 + 0.5) AS bigint)"
    return (
        f"SELECT '{tbl}' AS tbl, '{col}' AS col, '{codec.upper()}' AS codec, "
        f"cast(count(*) AS bigint) AS num_rows, "
        f"cast(count(*) - count({col}) AS bigint) AS null_count, "
        f"{mn} AS min_micro, {mx} AS max_micro FROM {tbl}"
    )


def _orc_oracle() -> str:
    codecs = _orc_codec_by_table()
    return "\nUNION ALL\n".join(
        _orc_arm(t, c, k, codecs[t]) for t, c, k in _orc_columns()
    )


@register(
    "orc_footer_report",
    oracle=_orc_oracle(),
    tags=("extension", "formats", "footer", "metadata"),
)
def orc_footer_report(spark, sf_dir):
    """ORC postscript/footer introspection (round-12) — the protobuf
    twin of parquet_footer_report, closing the read-back loop on the
    engine's own ORC sink: every audited table is first written as
    ORC by Spark's native writer (codec cycling none/zlib/snappy per
    table — the snappy chunks come from the JAVA writer, so the
    hand-rolled snappy decoder is held to foreign-file interop here,
    not just its own compressor), then per (table, column) the row
    count, null count, and min/max zone-map bounds are read straight
    from the FOOTER PROTOBUF (operators/orc_footer.py: varint/zigzag/
    fixed64 wire walk, chunked stream decompression, stripe-row and
    type-tree accounting re-checked) — never touching a data page.
    The oracle recomputes every fact from the DATA, so a misparsed
    zigzag, a wrong chunk header, or a misaligned statistics list
    hash-mismatches: footer-vs-data equality is the zone-map trust
    property, held to the same standard as the parquet twin.

    Scale: one footer read per file via a bounded tail window; the
    file list fans out over executors (here one per audited table; on
    a Hive estate, the metastore's partition manifest)."""
    import glob
    import tempfile

    from ..operators.orc_footer import orc_footer_column_stats

    cols = _orc_columns()
    codecs = _orc_codec_by_table()
    base = tempfile.mkdtemp(prefix="orc_audit_")
    rows = []
    for tbl in sorted({t for t, _, _ in cols}):
        audited = [c for t, c, _ in cols if t == tbl]
        out = f"{base}/{tbl}"
        (read_table(spark, sf_dir, tbl)
         .select(*audited)
         .coalesce(1)
         .write.mode("overwrite")
         .option("compression", codecs[tbl])
         .orc(out))
        files = glob.glob(out + "/*.orc")
        if len(files) != 1:
            raise ValueError(
                f"expected one ORC part for {tbl}, found {len(files)}"
            )
        rows += [(t, c, k, files[0]) for t, c, k in cols if t == tbl]
    df = spark.createDataFrame(
        rows, "tbl string, col string, kind string, path string"
    )
    return orc_footer_column_stats(df.repartition(len(rows)))
