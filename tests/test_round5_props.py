"""Property tests for the round-5 operators: skyline vs brute force on
adversarial point sets, BM25 monotonicity, RRF score reconstruction,
ACF on a perfectly periodic series, and bootstrap CI sanity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.queries import queries

from .conftest import SF0001

QS = queries()


# --- skyline ------------------------------------------------------------------------


def _write_trade(spark, path, points):
    """One lineitem row per supplier encoding exact (rev_cents, qty):
    discount 0, extendedprice = rev_cents/100."""
    li = [
        (int(sk), float(rev_cents) / 100.0, 0.0, float(qty))
        for sk, (rev_cents, qty) in enumerate(points, start=1)
    ]
    spark.createDataFrame(
        li, "l_suppkey long, l_extendedprice double, l_discount double, l_quantity double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")
    spark.createDataFrame(
        [(int(sk), f"S{sk}") for sk in range(1, len(points) + 1)],
        "s_suppkey long, s_name string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/supplier.parquet")


def _brute_skyline(points):
    out = set()
    for i, (r, q) in enumerate(points):
        dominated = any(
            (r2 >= r and q2 >= q and (r2 > r or q2 > q))
            for j, (r2, q2) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.add(i + 1)  # suppkeys are 1-based
    return out


def test_skyline_matches_bruteforce_adversarial(spark, tmp_path):
    """Exact-duplicate coordinates survive together; one-dimension ties
    resolve by the other dimension; a diagonal (everything on the
    frontier — worst case for the local pre-filter) passes through."""
    cases = [
        # duplicates + dominated interior + ties
        [(100, 5), (100, 5), (90, 5), (100, 4), (50, 50), (50, 49), (101, 1)],
        # pure diagonal: every point is on the frontier
        [(i * 10, 100 - i * 10) for i in range(1, 10)],
        # single dominator
        [(10, 10), (9, 9), (8, 8), (1, 1)],
        # same revenue everywhere: only max-qty points survive
        [(70, 1), (70, 2), (70, 3), (70, 3)],
    ]
    for n, points in enumerate(cases):
        path = str(tmp_path / f"case{n}")
        _write_trade(spark, path, points)
        got = {r.s_suppkey for r in QS["pareto_frontier_suppliers"](spark, path).collect()}
        assert got == _brute_skyline(points), (n, points)


# --- BM25 ---------------------------------------------------------------------------


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_bm25_monotone_in_tf_and_length(spark, tmp_path):
    """Same length, more query-term hits -> higher score; same hits,
    longer doc -> lower score; no query terms -> score 0."""
    path = str(tmp_path / "bm25")
    texts = [
        "hash merge vector pad1 pad2",  # all three terms
        "hash merge pad0 pad1 pad2",  # two terms, same length
        "hash pad9 pad0 pad1 pad2",  # one term, same length
        "hash " + " ".join(f"pad{i}" for i in range(20)),  # one term, longer
        "pad0 pad1 pad2 pad3 pad4",  # no terms
    ]
    _write_docs(spark, path, texts)
    rows = {r.doc_id: r for r in QS["bm25_doc_scores"](spark, path).collect()}
    assert rows[0].bm25 > rows[1].bm25 > rows[2].bm25 > 0
    assert rows[2].bm25 > rows[3].bm25 > 0
    assert rows[4].bm25 == 0.0
    assert (rows[0].tf_hash, rows[0].tf_merge, rows[0].tf_vector) == (1, 1, 1)


# --- RRF ----------------------------------------------------------------------------


def test_rrf_scores_reconstruct_from_ranks(spark):
    """Every fused row's score equals 1/(60+text_rank) + 1/(60+vec_rank)
    with absent-list terms contributing 0, quantized the way the query
    quantizes; output is the top-20 by that score."""
    rows = QS["rrf_hybrid_fusion"](spark, SF0001).collect()
    assert len(rows) == 20
    import math

    for r in rows:
        expect = 0.0
        if r.text_rank is not None:
            expect += 1.0 / (60 + r.text_rank)
        if r.vec_rank is not None:
            expect += 1.0 / (60 + r.vec_rank)
        assert abs(r.rrf_score - math.floor(expect * 1e12 + 0.5) / 1e12) < 1e-15
        assert r.text_rank is not None or r.vec_rank is not None
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)


# --- ACF ----------------------------------------------------------------------------


def test_acf_periodic_series(spark, tmp_path):
    """A period-3 daily revenue series: ACF at lag 3 ~ (n-3)/n (near 1),
    ACF at lag 1 negative."""
    path = str(tmp_path / "acf")
    t0 = dt.datetime(2024, 1, 1)
    vals = [100_000.0, 200_000.0, 300_000.0]  # dollars -> 100/200/300 k$
    rows = [
        (i, t0 + dt.timedelta(days=i), vals[i % 3]) for i in range(90)
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    acf = {r.lag: r for r in QS["acf_daily_revenue"](spark, path).collect()}
    assert acf[3].acf > 0.9
    assert acf[1].acf < 0.0
    assert acf[3].n_pairs == 87


# --- bootstrap ----------------------------------------------------------------------


def test_bootstrap_ci_brackets_mean(spark):
    """On real sf0.001 data the 95% interval must contain the point
    estimate and be properly ordered and non-degenerate."""
    r = QS["poisson_bootstrap_ci"](spark, SF0001).collect()[0]
    assert r.n_reps == 200
    assert r.ci_lo < r.ci_hi
    assert r.ci_lo <= r.mean_spend <= r.ci_hi


# --- Shapley attribution ------------------------------------------------------------


def test_shapley_efficiency_on_real_data(spark):
    """The Shapley axioms' teeth: per-channel values must sum exactly to
    v(all channels) = total attributable conversions (efficiency)."""
    rows = QS["attribution_shapley"](spark, SF0001).collect()
    assert rows
    total24 = sum(r.phi24 for r in rows)
    assert total24 == rows[0].attributed_conversions * 24


def test_shapley_symmetry_and_null_player(spark, tmp_path):
    """Two channels that appear in identical coalitions get identical
    values (symmetry); a channel that never appears gets zero (null
    player). Users u0/u1: click+error together before purchase; 'view'
    and 'signup' never touch."""
    path = str(tmp_path / "shap")
    t0 = dt.datetime(2024, 1, 10)
    rows = []
    eid = 0
    for u in (0, 1):
        for ch in ("click", "error"):
            rows.append((eid, t0 + dt.timedelta(hours=u), u, ch, 0.0, "{}"))
            eid += 1
        rows.append((eid, t0 + dt.timedelta(days=1, hours=u), u, "purchase", 50.0, "{}"))
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double,"
        " props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")
    got = {r.channel: r for r in QS["attribution_shapley"](spark, path).collect()}
    assert got["click"].phi24 == got["error"].phi24 > 0
    assert got["view"].phi24 == 0 and got["signup"].phi24 == 0
    assert got["click"].attributed_conversions == 2


# --- IPW ----------------------------------------------------------------------------


def test_ipw_removes_confounding(spark, tmp_path):
    """Engineered confounder: high-activity users are mostly treated AND
    spend 100; low-activity users are mostly control AND spend 10 —
    within each stratum treatment does nothing, so the true effect is 0.
    The naive difference must be large; the IPW estimate ~0."""
    path = str(tmp_path / "ipw")
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(200):
        high = u < 100
        # activity: 45 views (segment 4) vs 2 views (segment 0)
        for i in range(45 if high else 2):
            rows.append((eid, t0 + dt.timedelta(minutes=eid), u, "view", 1.0, "{}"))
            eid += 1
        treated = (u % 10) < (9 if high else 1)  # 90% vs 10% treated
        if treated:
            rows.append((eid, t0 + dt.timedelta(minutes=eid), u, "signup", 0.0, "{}"))
            eid += 1
        rows.append(
            (eid, t0 + dt.timedelta(minutes=eid), u, "purchase",
             100.0 if high else 10.0, "{}")
        )
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double,"
        " props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")
    r = QS["ipw_treatment_effect"](spark, path).collect()[0]
    assert r.naive_diff > 50  # confounded gap ~72
    assert abs(r.ate) < 1e-9  # stratified IPW recovers the true 0


# --- SES ----------------------------------------------------------------------------


def test_ses_constant_series_is_exact(spark, tmp_path):
    """On a constant monthly series the SES level equals the constant and
    the one-step-ahead backtest error is 0 (up to the term quantization,
    which is exact for integer levels)."""
    path = str(tmp_path / "ses")
    rows = [
        (i, dt.datetime(2024 + i // 12, 1 + i % 12, 15), 500_000.0)
        for i in range(24)
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    r = QS["ses_backtest_monthly"](spark, path).collect()[0]
    assert r.n_months == 24
    assert r.ses_level == 500.0  # 500 k$
    assert r.backtest_mae == 0.0


# --- association rules ---------------------------------------------------------------


def test_association_rules_values(spark, tmp_path):
    """Hand-computable baskets: items 1,2 co-occur in 3 of 6 orders,
    item 1 appears in 4, item 2 in 3 -> conf(1->2)=0.75, conf(2->1)=1.0,
    lift = 6*3/(4*3) = 1.5 both ways."""
    path = str(tmp_path / "ar")
    # item 1 in orders 1-4; item 2 in orders 1-3 only; pair {1,2} in 1-3
    baskets = {1: [1, 2], 2: [1, 2], 3: [1, 2], 4: [1, 3], 5: [3, 4], 6: [3, 4]}
    rows = [
        (ok, pk, 1.0) for ok, items in baskets.items() for pk in items
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")
    got = {
        (r.antecedent, r.consequent): r
        for r in QS["association_rules_pairs"](spark, path).collect()
    }
    assert set(got) == {(1, 2), (2, 1)}
    assert got[(1, 2)].n_ab == 3
    assert got[(1, 2)].confidence == 0.75  # 3/4
    assert got[(2, 1)].confidence == 1.0  # 3/3
    assert got[(1, 2)].lift == 1.5  # 6*3/(4*3)
    assert got[(2, 1)].lift == 1.5


# --- window funnel -------------------------------------------------------------------


def test_window_funnel_order_and_deadline(spark, tmp_path):
    """u0 completes all 4 steps in order inside the window; u1 has the
    click BEFORE the view (order violated at step 3); u2's purchase
    lands after the 7-day anchor deadline (drops at step 4)."""
    path = str(tmp_path / "wf")
    t0 = dt.datetime(2024, 3, 1)
    h = dt.timedelta(hours=1)

    def ev(eid, u, ty, t):
        return (eid, t, u, ty, 1.0, "{}")

    rows = [
        # u0: full ordered funnel
        ev(0, 0, "signup", t0), ev(1, 0, "view", t0 + h),
        ev(2, 0, "click", t0 + 2 * h), ev(3, 0, "purchase", t0 + 3 * h),
        # u1: click precedes view -> funnel stops after view
        ev(4, 1, "signup", t0), ev(5, 1, "click", t0 + h),
        ev(6, 1, "view", t0 + 2 * h),
        # u2: purchase outside the 7-day anchored window
        ev(7, 2, "signup", t0), ev(8, 2, "view", t0 + h),
        ev(9, 2, "click", t0 + 2 * h),
        ev(10, 2, "purchase", t0 + dt.timedelta(days=8)),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double,"
        " props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")
    got = {r.step: r for r in QS["window_funnel_steps"](spark, path).collect()}
    assert [got[k].n_users for k in (1, 2, 3, 4)] == [3, 3, 2, 1]
    assert got[4].conv_from_prev == 0.5


# --- containment dedup ---------------------------------------------------------------


def test_containment_catches_embedded_doc(spark, tmp_path):
    """A document embedded verbatim inside a larger one has containment
    1.0 in the embed direction only — the asymmetric case symmetric
    Jaccard misses (here Jaccard ~ 0.47, below any dedup threshold)."""
    path = str(tmp_path / "contain")
    core = " ".join(f"w{i}" for i in range(20))
    texts = [
        core,  # doc 0: the contained document
        core + " " + " ".join(f"x{i}" for i in range(20)),  # doc 1: wraps doc 0
        " ".join(f"z{i}" for i in range(20)),  # doc 2: unrelated
    ]
    _write_docs(spark, path, texts)
    rows = {
        (r.contained_doc, r.container_doc): r
        for r in QS["dedup_containment_pairs"](spark, path).collect()
    }
    assert set(rows) == {(0, 1)}
    assert rows[(0, 1)].containment == 1.0
    assert rows[(0, 1)].n_contained == 18  # 20 tokens -> 18 trigrams


# --- Simpson's paradox ---------------------------------------------------------------


def test_simpsons_reversal_detected(spark, tmp_path):
    """Engineered reversal: within BOTH activity strata the control
    converts better, but treatment concentrates in the high-rate
    stratum, so the pooled comparison says treatment wins — every
    stratum must flag is_reversed, the pooled row must not."""
    path = str(tmp_path / "simpson")
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def add_user(u, high, treated, converts):
        nonlocal eid
        for i in range(45 if high else 2):
            rows.append((eid, t0 + dt.timedelta(minutes=eid), u, "view", 1.0, "{}"))
            eid += 1
        if treated:
            rows.append((eid, t0 + dt.timedelta(minutes=eid), u, "signup", 0.0, "{}"))
            eid += 1
        if converts:
            rows.append((eid, t0 + dt.timedelta(minutes=eid), u, "purchase", 9.0, "{}"))
            eid += 1

    u = 0
    # high stratum: 100 treated (80% convert), 10 control (90% convert)
    for i in range(100):
        add_user(u, True, True, i < 80); u += 1
    for i in range(10):
        add_user(u, True, False, i < 9); u += 1
    # low stratum: 10 treated (10% convert), 100 control (20% convert)
    for i in range(10):
        add_user(u, False, True, i < 1); u += 1
    for i in range(100):
        add_user(u, False, False, i < 20); u += 1

    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double,"
        " props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")
    got = {r.segment: r for r in QS["simpsons_paradox_check"](spark, path).collect()}
    pooled = got[-1]
    assert pooled.diff_sign == 1 and not pooled.is_reversed  # pooled: treated "wins"
    for seg, r in got.items():
        if seg >= 0:
            assert r.diff_sign == -1 and r.is_reversed, seg  # every stratum reversed


# --- parallelism invariance ----------------------------------------------------------


def test_round5_results_invariant_under_shuffle_parallelism(spark):
    """Order-free-arithmetic claims for the round-5 float-adjacent
    queries: bit-identical results at shuffle partition counts 3 vs 17
    (same discipline as test_selection_ops — any cross-row float sum
    that escaped integer quantization would flip low bits here)."""
    import pandas as pd

    names = [
        "bm25_doc_scores",
        "rrf_hybrid_fusion",
        "acf_daily_revenue",
        "poisson_bootstrap_ci",
        "ses_backtest_monthly",
        "ipw_treatment_effect",
        "attribution_shapley",
        "simpsons_paradox_check",
        "pareto_frontier_suppliers",
        "association_rules_pairs",
    ]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                df = QS[n](spark, SF0001).toPandas()
                df = df.sort_values(list(df.columns)).reset_index(drop=True)
                results.setdefault(n, []).append(df)
        for n, (a, b) in results.items():
            pd.testing.assert_frame_equal(a, b, check_exact=True), n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


# --- MRR ----------------------------------------------------------------------------


def test_mrr_reciprocals_consistent(spark):
    """first_rel_rank 0 <=> reciprocal_rank 0; otherwise the reciprocal
    equals the shared micro literal for that rank."""
    rows = QS["mrr_at10_report"](spark, SF0001).collect()
    assert rows
    micro = [round(1000000 / r) / 1000000 for r in range(1, 11)]
    for r in rows:
        if r.first_rel_rank == 0:
            assert r.reciprocal_rank == 0.0
        else:
            assert 1 <= r.first_rel_rank <= 10
            assert r.reciprocal_rank == micro[r.first_rel_rank - 1]


# --- Fano burstiness -----------------------------------------------------------------


def test_fano_constant_vs_bursty(spark, tmp_path):
    """A metronome stream (exactly 2 events every hour) has Fano 0; a
    stream with all events packed into one hour of a 100-hour span has
    Fano ~ n_events (99.x here) and flags bursty."""
    path = str(tmp_path / "fano")
    t0 = dt.datetime(2024, 5, 1)
    rows = []
    eid = 0
    for hr in range(100):
        for j in range(2):
            rows.append((eid, t0 + dt.timedelta(hours=hr, minutes=j), 1,
                         "steady", 1.0, "{}"))
            eid += 1
    for j in range(100):
        rows.append((eid, t0 + dt.timedelta(minutes=j % 60), 2, "bursty", 1.0, "{}"))
        eid += 1
    # pin the shared span with one late bursty-type event at hour 99
    rows.append((eid, t0 + dt.timedelta(hours=99, minutes=30), 2, "bursty", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double,"
        " props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")
    got = {r.event_type: r for r in QS["fano_burstiness_report"](spark, path).collect()}
    assert got["steady"].fano == 0.0 and not got["steady"].is_bursty
    assert got["bursty"].fano > 90 and got["bursty"].is_bursty
    assert got["steady"].n_hours == got["bursty"].n_hours == 100


# --- RBO ----------------------------------------------------------------------------


def test_rbo_identical_rankings(spark, tmp_path):
    """Five documents engineered so the BM25 order and the cosine order
    are the SAME list [0..4]: RBO must equal the closed-form truncated
    value sum_d W[d]*min(d,5)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_meteo_datalake_spark.queries.ext_search import _RBO_W

    path = str(tmp_path / "rbo")
    # bm25 order: more 'hash' hits first (equal length)
    texts = [
        " ".join(["hash"] * (5 - i) + [f"pad{j}" for j in range(5 + i)]) for i in range(5)
    ]
    _write_docs(spark, path, texts)
    # cosine order vs vec 0: v_i = [1, 0.1*i, 0, ...] -> decreasing cosine in i
    vecs = [[1.0] + [0.1 * i] + [0.0] * 62 for i in range(5)]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(5), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * 5, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{path}/embeddings.parquet")
    r = QS["rank_biased_overlap"](spark, path).collect()[0]
    assert r.n_both == 5
    import math

    expect_q = sum(
        math.floor(min(d, 5) * _RBO_W[d - 1] * 1e12 + 0.5) for d in range(1, 101)
    )
    assert r.rbo == expect_q / 1e12


# --- cohort LTV ----------------------------------------------------------------------


def test_ltv_curve_monotone_and_consistent(spark):
    """Within every cohort the cumulative LTV is non-decreasing in age
    and the final value matches the cohort's total monthly revenue per
    user (within cent rounding)."""
    import collections

    rows = QS["cohort_ltv_curve"](spark, SF0001).collect()
    assert rows
    by_cohort = collections.defaultdict(list)
    for r in rows:
        by_cohort[r.cohort_m].append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age_months)
        ltvs = [r.cum_ltv_per_user for r in rs]
        assert ltvs == sorted(ltvs), cohort
        total = sum(r.month_revenue for r in rs)
        assert abs(ltvs[-1] - total / rs[0].cohort_users) < 0.02, cohort
