"""Targeted tests for the round-4 second-wave operators, beyond the
oracle gate in test_queries.py: PQ ANN quality vs the exact baseline,
interval-join boundary semantics, classifier map-only determinism, and
BPE encode consistency with training."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.queries import queries

from .conftest import SF0001

QS = queries()


def test_pq_ann_recall_against_bruteforce(spark):
    """ADC over 4x8 codebooks is coarse, but must still place a
    non-trivial share of the exact euclidean top-5 into the PQ top-5 —
    and every query must get exactly 5 ranked neighbors."""
    pq = QS["pq_ann_topk"](spark, SF0001).collect()
    by_q: dict[int, list[int]] = {}
    for r in pq:
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert all(len(v) == 5 for v in by_q.values())
    assert len(by_q) == 20

    # exact euclidean top-5 on the same quantized grid, computed in numpy
    import numpy as np

    rows = (
        spark.read.parquet(f"{SF0001}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: np.floor(np.array(r.embedding, dtype="float64") * 1000 + 0.5) for r in rows}
    hits = total = 0
    for q, got in by_q.items():
        d = {
            i: float(((vecs[q] - v) ** 2).sum())
            for i, v in vecs.items()
            if i != q
        }
        exact = [i for i, _ in sorted(d.items(), key=lambda kv: (kv[1], kv[0]))[:5]]
        hits += len(set(got) & set(exact))
        total += 5
    # PQ with an untrained sampled codebook: recall well above chance
    # (chance ~ 5/500 = 1%); require >= 20% overall
    assert hits / total >= 0.2, f"PQ recall@5 too low: {hits}/{total}"


def test_interval_join_burst_counts_match_python(spark):
    """Bucketed interval join == the quadratic definition, including both
    inclusive boundaries, on the real sf0.001 events."""
    out = {
        r.event_id: r.n_prior_5m
        for r in QS["interval_join_event_bursts"](spark, SF0001).collect()
    }
    from bigdata_meteo_datalake_spark.sources.lake import read_table

    ev = read_table(spark, SF0001, "events").select("event_id", "ts").collect()
    pairs = [(r.event_id, r.ts) for r in ev]
    assert len(out) == len(pairs)
    w = dt.timedelta(seconds=300)
    # quadratic reference on a 400-event slice (keeps the test fast)
    sample = sorted(pairs, key=lambda p: p[0])[:400]
    for eid, ts in sample:
        expect = sum(
            1 for sid, sts in pairs if sid != eid and ts - w <= sts <= ts
        )
        assert out[eid] == expect, eid


def test_quality_classifier_plan_is_map_only(spark):
    """The classifier must stay in-row: no hash shuffle in the plan (the
    widen round-robin repartition is not a hashpartitioning exchange)."""
    from bigdata_meteo_datalake_spark.plans.explain import plan_string

    plan = plan_string(QS["quality_classifier_score"](spark, SF0001))
    assert "hashpartitioning" not in plan


def test_bpe_encode_consistent_with_train(spark):
    """Every document's BPE token count is bounded by [n_words, n_chars],
    and compressing at all requires the learned merges to have applied:
    at least one doc must have n_bpe_tokens < its character count."""
    enc = QS["bpe_encode_token_counts"](spark, SF0001)
    d = spark.read.parquet(f"{SF0001}/documents.parquet")
    j = enc.join(d, "doc_id").select("doc_id", "n_words", "n_bpe_tokens", "text")
    bad = j.where(
        (F.col("n_bpe_tokens") < F.col("n_words"))
        | (F.col("n_bpe_tokens") > F.length("text"))
    ).count()
    assert bad == 0
    compressed = j.where(
        F.col("n_bpe_tokens")
        < F.length(F.regexp_replace(F.lower(F.trim("text")), r"[ \t\n\r\f]+", ""))
    ).count()
    assert compressed > 0
