"""Semantic properties of the deterministic sketches (ext_sketch) and the
prefix-filtered set-similarity join — the guarantees the docstrings claim,
checked on real data (the oracle gate in test_queries.py already checks
cross-engine equality; these check the *math*)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.queries import REGISTRY, queries

from .conftest import TEST_SF_DIR

SF001 = "/root/testdata/sf0.01"


def _q(name):
    queries()
    return REGISTRY[name].fn


def test_countmin_never_underestimates(spark):
    out = _q("countmin_user_frequencies")(spark, TEST_SF_DIR).toPandas()
    assert (out["overcount"] >= 0).all()
    assert (out["est_count"] >= out["exact_count"]).all()


def test_bloom_no_false_negatives(spark):
    row = _q("bloom_prefilter_orders")(spark, TEST_SF_DIR).collect()[0]
    # every exact match bloom-passes, so passes >= matches and the fp
    # count is exactly the difference
    assert row.n_bloom_pass >= row.n_exact_match
    assert row.n_false_positive == row.n_bloom_pass - row.n_exact_match
    assert row.n_probe_orders >= row.n_bloom_pass


def test_hll_and_kmv_estimate_quality(spark):
    """At sf0.01 (150 distinct users/type) the estimators should land
    within 50% — loose enough to never flake (error is deterministic
    given the fixed hash), tight enough to catch a broken register fold."""
    for name in ("hll_distinct_users", "kmv_distinct_users"):
        out = _q(name)(spark, SF001).toPandas()
        assert len(out) > 0, name
        assert (out["rel_err"] < 0.5).all(), f"{name}: {out.to_dict()}"


def test_prefix_filter_join_is_complete(spark):
    """The prefix filter must find EVERY pair with Jaccard >= 0.6 — verify
    against a brute-force all-pairs pass over the same hashed shingle
    sets (feasible at the small SF)."""
    from bigdata_meteo_datalake_spark.operators.dedup import (
        doc_shingle_hash_sets,
        jaccard_verify_sets,
    )
    from bigdata_meteo_datalake_spark.sources.lake import read_table

    d = read_table(spark, TEST_SF_DIR, "documents")
    sets = doc_shingle_hash_sets(d)
    ids = sets.select("doc_id")
    all_pairs = (
        ids.withColumnRenamed("doc_id", "doc_a")
        .crossJoin(ids.withColumnRenamed("doc_id", "doc_b"))
        .where(F.col("doc_a") < F.col("doc_b"))
    )
    brute = {
        (r.doc_a, r.doc_b)
        for r in jaccard_verify_sets(all_pairs, sets)
        .where(F.col("jaccard_raw") >= 0.6)
        .collect()
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in _q("dedup_jaccard_prefix_filter")(spark, TEST_SF_DIR).collect()
    }
    assert got == brute


def test_stratified_sample_exact_quota(spark):
    from bigdata_meteo_datalake_spark.sources.lake import read_table

    sample = (
        _q("stratified_sample_exact")(spark, TEST_SF_DIR)
        .groupBy("event_type")
        .count()
        .toPandas()
        .set_index("event_type")["count"]
    )
    full = (
        read_table(spark, TEST_SF_DIR, "events")
        .groupBy("event_type")
        .count()
        .toPandas()
        .set_index("event_type")["count"]
    )
    for etype, n in full.items():
        assert sample[etype] == -(-n // 5)  # ceil(n/5), exactly
