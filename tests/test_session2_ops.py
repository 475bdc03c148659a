"""Semantic edge tests for the session-2 operators — properties the
sf0.01 oracle gate can't see (edit stability, distribution invariants),
plus the scale-overflow regressions pinned at sf0.1 during development."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.queries import REGISTRY, queries
from bigdata_meteo_datalake_spark.queries.ext_training import content_defined_chunks

from .conftest import TEST_SF_DIR


def _chunks(spark, text: str) -> list[str]:
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    rows = content_defined_chunks(df).orderBy("chunk_idx").collect()
    return [r.chunk_text for r in rows]


def test_cdc_chunking_is_edit_stable(spark):
    """Inserting one token must perturb only the chunks overlapping the
    edit; every other chunk's text is unchanged. This is the property that
    distinguishes content-defined from fixed-stride chunking."""
    words = [f"w{(i * 7) % 97}" for i in range(240)]
    base = " ".join(words)
    edited = " ".join(words[:120] + ["inserted"] + words[120:])
    a, b = _chunks(spark, base), _chunks(spark, edited)
    assert len(a) > 5, "corpus too small to be meaningful"
    sym_diff = set(a) ^ set(b)
    # the insertion can split/merge at most the chunks touching it: a
    # handful of texts differ, everything else is byte-identical
    assert len(sym_diff) <= 6, f"edit perturbed too many chunks: {sym_diff}"
    # chunks strictly before the edit are identical AND in the same order
    prefix = 0
    for x, y in zip(a, b):
        if x != y:
            break
        prefix += 1
    assert prefix >= 1, "no shared prefix — boundaries are not content-defined"


def test_cdc_chunking_round_trips(spark):
    """Concatenating the chunks in order reconstructs the tokenized doc."""
    words = [f"t{(i * 13) % 53}" for i in range(100)]
    text = " ".join(words)
    assert " ".join(_chunks(spark, text)) == text.lower()


def test_pagerank_ranks_sum_to_one(spark):
    """PageRank conserves probability mass: ranks sum to ~1 (the oracle
    hash-checks exact values; this pins the global invariant readably)."""
    queries()
    df = REGISTRY["pagerank_trade_graph"].fn(spark, TEST_SF_DIR)
    total = df.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-4, total


def test_domain_quota_cap_and_determinism(spark):
    """Every domain is capped at the quota and two runs agree exactly."""
    queries()
    fn = REGISTRY["domain_quota_sample"].fn
    a = fn(spark, TEST_SF_DIR)
    per_domain = a.groupBy("source").count().collect()
    assert all(r["count"] <= 10 for r in per_domain)
    b = fn(spark, TEST_SF_DIR)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_interpolation_leaves_leading_trailing_gaps_null(spark):
    """A series' hours before its first / after its last observation have
    no neighbor on one side — interp must stay NULL, never extrapolate."""
    queries()
    df = REGISTRY["ts_interpolate_linear"].fn(spark, TEST_SF_DIR)
    rows = df.where(F.col("interp_avg").isNull()).collect()
    # every NULL must be a leading/trailing run: no observed value exists
    # on one side of it within its series
    obs = {
        (r.event_type, r.bucket)
        for r in df.where(F.col("obs_avg").isNotNull()).collect()
    }
    for r in rows:
        before = any(k[0] == r.event_type and k[1] < r.bucket for k in obs)
        after = any(k[0] == r.event_type and k[1] > r.bucket for k in obs)
        assert not (before and after), f"interior gap left NULL: {r}"


def test_winsorize_bounds_clip_only_outliers(spark):
    queries()
    df = REGISTRY["winsorize_order_totals"].fn(spark, TEST_SF_DIR)
    clipped = df.where("was_clipped")
    kept = df.where("NOT was_clipped")
    # clipped values moved; kept values byte-identical to the original
    assert kept.where(
        F.abs(F.col("clipped_price") - F.col("total_price")) > 0.005
    ).count() == 0
    if clipped.count():
        lo_hi = clipped.agg(
            F.min("clipped_price").alias("lo"), F.max("clipped_price").alias("hi")
        ).first()
        inner = kept.agg(
            F.min("total_price").alias("lo"), F.max("total_price").alias("hi")
        ).first()
        assert lo_hi["lo"] >= inner["lo"] - 0.01
        assert lo_hi["hi"] <= inner["hi"] + 0.01
