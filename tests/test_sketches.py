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


def test_hll_registers_merge(spark):
    """HLL registers are max-mergeable: merging the per-event_type register
    tables (max per bucket) must give EXACTLY the registers of a direct
    global sketch — the property that lets partial sketches roll up
    without touching raw data (same algebra the re-aggregation query
    proves for sums)."""
    from bigdata_meteo_datalake_spark.operators.dedup import token_hash
    from bigdata_meteo_datalake_spark.queries.ext_sketch import (
        _HLL_M,
        _HLL_P,
        _HLL_RHO_MAX,
        _HLL_W_BITS,
    )
    from bigdata_meteo_datalake_spark.sources.lake import read_table

    ev = read_table(spark, TEST_SF_DIR, "events").select("event_type", "user_id")
    hv = token_hash(F.col("user_id").cast("string"))
    w = F.shiftright(hv, _HLL_P)
    rho = F.when(w == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        F.instr(F.lpad(F.bin(w), _HLL_W_BITS, "0"), "1")
    )
    r = ev.select(
        "event_type",
        hv.bitwiseAND(F.lit(_HLL_M - 1)).alias("bucket"),
        rho.alias("rho"),
    )
    per_group = r.groupBy("event_type", "bucket").agg(F.max("rho").alias("m_j"))
    merged = {
        row.bucket: row.m
        for row in per_group.groupBy("bucket").agg(F.max("m_j").alias("m")).collect()
    }
    direct = {
        row.bucket: row.m
        for row in r.groupBy("bucket").agg(F.max("rho").alias("m")).collect()
    }
    assert merged == direct


def test_sketch_and_join_plan_shapes(spark):
    """The scale claims, checked structurally: CMS/Bloom point lookups are
    broadcast joins; the prefix-filter join never degenerates to a nested
    loop; z-order stats is one aggregation shuffle over the scan; the
    skew report's top-k is a TakeOrdered, not a global window."""
    from bigdata_meteo_datalake_spark.plans.explain import (
        n_broadcast_joins,
        n_shuffle_exchanges,
        plan_string,
    )

    assert n_broadcast_joins(_q("countmin_user_frequencies")(spark, TEST_SF_DIR)) >= 1
    assert n_broadcast_joins(_q("bloom_prefilter_orders")(spark, TEST_SF_DIR)) >= 2
    pf = plan_string(_q("dedup_jaccard_prefix_filter")(spark, TEST_SF_DIR))
    assert "CartesianProduct" not in pf and "NestedLoop" not in pf
    # 2 = the distinct-aggregate's expand phase ((zbucket,user) then zbucket)
    assert n_shuffle_exchanges(_q("zorder_cluster_stats")(spark, TEST_SF_DIR)) <= 2
    sk = plan_string(_q("skew_report_custkey")(spark, TEST_SF_DIR))
    assert "TakeOrderedAndProject" in sk


def test_hll_rolling_merge_equals_from_scratch(spark, tmp_path):
    """Register-merge associativity: the merged 7-day estimate for a day
    must be BIT-IDENTICAL to the estimate computed from scratch over just
    that window's events (max over daily maxes == max over raw rows)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.sources.lake import read_table

    fn = _q("hll_rolling_7d_users")
    full = {r.day: r for r in fn(spark, TEST_SF_DIR).collect()}
    target = max(full)
    lo = target - dt.timedelta(days=6)
    ev = read_table(spark, TEST_SF_DIR, "events").where(
        (F.to_date("ts") >= F.lit(lo)) & (F.to_date("ts") <= F.lit(target))
    )
    d = str(tmp_path / "hllwin")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    scratch = {r.day: r for r in fn(spark, d).collect()}
    assert scratch[target].est_users_7d == full[target].est_users_7d
    assert scratch[target].exact_users_7d == full[target].exact_users_7d


def test_priority_sample_equal_weights(spark, tmp_path):
    """Equal weights reduce priority sampling to hash bottom-k count
    estimation: the estimate must be n_total * w within the ~1/sqrt(k)
    band (deterministic here — the hash fixes the draw)."""
    import pandas as pd

    d = str(tmp_path / "prio")
    import os

    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        [{"o_orderkey": i, "o_custkey": 0, "o_orderstatus": "O",
          "o_totalprice": 100.0, "o_orderdate": None, "o_orderpriority": "1"}
         for i in range(1000)]
    ).to_parquet(f"{d}/orders.parquet")
    r = _q("priority_sample_total")(spark, d).collect()[0]
    assert r.k_sample == 64
    assert r.exact_total == 100000.0
    assert abs(r.est_total / r.exact_total - 1) < 0.4  # ~3 sigma at k=64
    assert r.est_total > 0


def test_priority_sample_unbiased_across_salts(spark, tmp_path):
    """Unbiasedness: averaging the estimator over many independent hash
    draws (salts) must converge toward the exact total much tighter than
    a single draw's error band — the statistical property the estimator
    formula exists for."""
    import statistics

    from bigdata_meteo_datalake_spark.queries.ext_sketch import (
        priority_sample_total,
    )

    ests, exact = [], None
    for s in range(12):
        r = priority_sample_total(spark, SF001, salt=f"#s{s}").collect()[0]
        ests.append(r.est_total)
        exact = r.exact_total
    mean_est = statistics.fmean(ests)
    # single-draw errors run 10-25% at k=64; the 12-draw mean must be
    # well inside that band around the exact value
    assert abs(mean_est / exact - 1) < 0.08, (mean_est, exact, ests)
    # and the draws genuinely differ (the salt actually changes the sample)
    assert len(set(ests)) > 6


def test_jackknife_se_tracks_classic_formula(spark):
    """The grouped jackknife SE must agree with the classic sd/sqrt(n)
    within sampling wobble, and the CI must bracket the mean."""
    import numpy as np
    import pandas as pd

    r = _q("jackknife_mean_se")(spark, TEST_SF_DIR).collect()[0]
    prices = pd.read_parquet(f"{TEST_SF_DIR}/orders.parquet")["o_totalprice"].values
    classic = np.std(prices, ddof=1) / np.sqrt(len(prices))
    assert 0.5 < r.jackknife_se / classic < 2.0, (r.jackknife_se, classic)
    assert r.ci_low < r.mean_price < r.ci_high
    assert abs(r.mean_price - prices.mean()) < 1.0


def test_prefix_filter_length_and_positional_pruning(spark):
    """The PPJoin filters must actually PRUNE, not just preserve
    completeness: a shared prefix element is not enough to become a
    candidate when (a) the set sizes violate t*max <= min, or (b) the
    remaining-suffix overlap bound cannot reach the required overlap."""
    from bigdata_meteo_datalake_spark.operators.dedup import (
        prefix_filter_candidates,
    )

    # doc 1: 4 elements; doc 2: 40 elements sharing ALL of doc 1's —
    # containment 1.0 but Jaccard 4/40 = 0.1 << 0.6. Doc 3 duplicates
    # doc 2's tail so EVERY element has df = 2 and the rarest-first
    # order reduces to x order: doc 1's prefix {100, 101} sits inside
    # doc 2's 17-element prefix {100..116}, so the pair DOES reach the
    # join and only the size-ratio filters can kill it.
    small = list(range(100, 104))
    big = list(range(100, 140))
    sets = spark.createDataFrame(
        [(1, small), (2, big), (3, list(range(104, 140)))],
        "doc_id long, xs array<long>",
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filter_candidates(sets, t_num=3, t_den=5).collect()
    }
    assert (1, 2) not in got

    # positional filter: docs 1 and 2 (n = 10 each, length filter passes)
    # share exactly one element x=50. Every element in the corpus has
    # df = 2 (filler docs 3-6 pair up the rest), so the rarest-first
    # order reduces to plain x order and 50 sits at position 4 of BOTH
    # prefixes (prefix_len = 10 - ceil(0.6*10) + 1 = 5 — it IS joined
    # on). The overlap bound 1 + min(10-4, 10-4) = 7 cannot reach
    # o_min = ceil(3/8 * 20) = 8, so the positional filter — and only
    # it — must kill the pair.
    rows = [
        (1, [10, 11, 12, 50, 100, 101, 102, 103, 104, 105]),
        (2, [20, 21, 22, 50, 200, 201, 202, 203, 204, 205]),
        (3, [10, 11, 12]),
        (4, [20, 21, 22]),
        (5, [100, 101, 102, 103, 104, 105]),
        (6, [200, 201, 202, 203, 204, 205]),
    ]
    sets2 = spark.createDataFrame(rows, "doc_id long, xs array<long>")
    got2 = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filter_candidates(sets2, t_num=3, t_den=5).collect()
    }
    assert (1, 2) not in got2
