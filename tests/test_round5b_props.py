"""Property tests for the round-5 second-wave operators (ext_metrics):
OHLC tie-breaking, assortativity vs brute force, MASE on a perfectly
linear series, Bayesian posterior reconstruction, LSH band-load
consistency, elasticity on a constructed power law, blocking-audit
arithmetic, and tokenizer fertility on hand-counted docs."""

from __future__ import annotations

import datetime as dt
import math

from bigdata_meteo_datalake_spark.queries import queries

from .conftest import SF0001

QS = queries()


# --- OHLC ---------------------------------------------------------------------------


def test_ohlc_open_close_tiebreak(spark, tmp_path):
    """Open/close follow (ts, event_id) order — including two events at
    the SAME timestamp, where event_id must break the tie."""
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # (event_id, ts, value) — all in the same hour, one type
        (5, t0.replace(minute=30), 9.00),   # middle
        (2, t0.replace(minute=1), 1.00),    # earliest ts -> open
        (9, t0.replace(minute=59), 4.00),   # latest ts, higher id
        (8, t0.replace(minute=59), 3.00),   # same ts, lower id
        (1, t0.replace(minute=1), 2.00),    # same ts as open, lower id -> open
    ]
    spark.createDataFrame(
        [(eid, ts, "trade", float(v)) for eid, ts, v in rows],
        "event_id long, ts timestamp, event_type string, value double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = QS["ohlc_hourly_bars"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["open_cents"] == 200  # event_id 1 wins the ts tie
    assert r["close_cents"] == 400  # event_id 9 wins the ts tie
    assert r["high_cents"] == 900 and r["low_cents"] == 100
    assert r["n_events"] == 5 and r["volume_cents"] == 1900


def test_ohlc_pre_1970_epoch_bias(spark, tmp_path):
    """Negative-epoch (pre-1970) timestamps order correctly: the order key
    biases the epoch before zero-padding, so '-' never lands inside the
    padded field (which would invert lexicographic order)."""
    t0 = dt.datetime(1969, 12, 31, 10, 0, 0)  # epoch_us < 0 for every row
    rows = [
        (3, t0.replace(minute=50), 7.00),  # latest -> close
        (1, t0.replace(minute=5), 2.00),   # earliest -> open
        (2, t0.replace(minute=20), 5.00),  # middle
    ]
    spark.createDataFrame(
        [(eid, ts, "trade", float(v)) for eid, ts, v in rows],
        "event_id long, ts timestamp, event_type string, value double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = QS["ohlc_hourly_bars"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["open_cents"] == 200 and r["close_cents"] == 700
    assert r["high_cents"] == 700 and r["low_cents"] == 200


# --- degree assortativity -----------------------------------------------------------


def _brute_assortativity(pairs):
    from collections import Counter

    dc = Counter(c for c, _ in pairs)
    ds = Counter(s for _, s in pairs)
    xs, ys = [], []
    for c, s in pairs:
        xs += [dc[c], ds[s]]
        ys += [ds[s], dc[c]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    return (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))


def test_assortativity_matches_bruteforce(spark, tmp_path):
    # c1-{s1,s2}, c2-{s2,s3}, c3-{s3}: mixed degrees, no zero-variance
    orders = [(1, 1), (2, 2), (3, 3)]  # (orderkey, custkey)
    items = [(1, 1), (1, 2), (2, 2), (2, 3), (3, 3)]  # (orderkey, suppkey)
    pairs = {(1, 1), (1, 2), (2, 2), (2, 3), (3, 3)}
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        items, "l_orderkey long, l_suppkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = QS["degree_assortativity"](spark, str(tmp_path)).collect()[0]
    want = _brute_assortativity(sorted(pairs))
    assert out["n_edges"] == 5 and out["n_cust"] == 3 and out["n_supp"] == 3
    assert abs(out["assortativity"] - want) < 1e-6 + 1e-9


# --- MASE on a linear series --------------------------------------------------------


def test_mase_zero_on_linear_series(spark, tmp_path):
    """x_t exactly linear -> the drift forecast is exact for t >= 3:
    mae_drift = mase = 0 and mae_naive = |slope|."""
    rows = []
    for t in range(12):
        # monthly scaled value x = 1000 + 10*t (x = floor(price*100/100000))
        price = float((1000 + 10 * t) * 1000)
        rows.append((t + 1, price, dt.datetime(2024, 1 + t % 12, 15)))
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = QS["forecast_backtest_mase"](spark, str(tmp_path)).collect()[0]
    assert out["n_months"] == 12
    assert out["mae_naive"] == 10.0
    assert out["mae_drift"] == 0.0
    assert out["mase_drift"] == 0.0


# --- Bayesian posterior reconstruction ----------------------------------------------


def test_bayes_posterior_reconstructs_from_counts(spark):
    out = QS["bayes_ab_posterior"](spark, SF0001).collect()[0]
    for arm in ("a", "b"):
        n, c = out[f"n_{arm}"], out[f"c_{arm}"]
        a, b = 1 + c, 1 + n - c
        mean = a / (a + b)
        sd = math.sqrt(a * b / ((a + b) ** 2 * (a + b + 1)))
        assert abs(out[f"post_mean_{arm}"] - mean) < 1e-6 + 1e-9
        assert abs(out[f"post_sd_{arm}"] - sd) < 1e-8 + 1e-9
        assert 0.0 < out[f"post_mean_{arm}"] < 1.0
    # z sign agrees with the mean difference
    diff = out["post_mean_b"] - out["post_mean_a"]
    if abs(diff) > 1e-4:
        assert (out["z_ab"] > 0) == (diff > 0)


# --- LSH band-load consistency ------------------------------------------------------


def test_lsh_band_load_consistency(spark, tmp_path):
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [(1, dup), (2, dup), (3, "one two three four five six seven")]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    rows = QS["lsh_band_load_report"](spark, str(tmp_path)).collect()
    assert len(rows) == 8  # LSH_BANDS
    for r in rows:
        # every doc lands in every band exactly once
        assert r["n_docs"] == 3
        # identical docs share identical signatures -> a >=2 bucket per band
        assert r["n_buckets_ge2"] >= 1
        assert r["candidate_pairs"] >= 1
        assert r["max_bucket"] >= 2
        assert r["n_hot"] == 0
        # pair budget consistent with bucket sizes: C(max,2) <= pairs
        assert r["candidate_pairs"] >= r["max_bucket"] * (r["max_bucket"] - 1) // 2


# --- elasticity on a constructed power law ------------------------------------------


def test_elasticity_recovers_power_law(spark, tmp_path):
    """qty = K * unitprice^-2 exactly -> slope -2, r2 ~ 1."""
    prices = [1.0, 2.0, 4.0, 8.0]
    rows = []
    for i, p in enumerate(prices):
        qty = 1024.0 / (p * p)
        rows.append((i + 1, 1, qty, p * qty))  # extendedprice = unit * qty
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double, l_extendedprice double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [(1, "BRAND#1")], "p_partkey long, p_brand string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    out = QS["price_elasticity_by_brand"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_lines"] == 4
    assert abs(r["elasticity"] - (-2.0)) < 1e-3  # 1e-4 log quantization
    assert r["r2"] > 0.999999 - 1e-6


# --- blocking audit arithmetic ------------------------------------------------------


def test_blocking_quality_exact_counts(spark, tmp_path):
    custs = [
        (1, 1, "A"),
        (2, 1, "B"),
        (3, 2, "A"),
        (4, 2, "B"),
    ]
    spark.createDataFrame(
        custs, "c_custkey long, c_nationkey int, c_mktsegment string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    rows = {r["strategy"]: r for r in QS["blocking_quality_report"](spark, str(tmp_path)).collect()}
    total_pairs = 4 * 3 // 2  # 6
    for strat in ("nation", "segment"):
        r = rows[strat]
        assert r["n_records"] == 4 and r["n_blocks"] == 2
        assert r["max_block"] == 2 and r["candidate_pairs"] == 2
        assert abs(r["reduction_ratio"] - (1 - 2 / total_pairs)) < 1e-6 + 1e-9
    r = rows["nation_segment"]
    assert r["n_blocks"] == 4 and r["candidate_pairs"] == 0
    assert abs(r["reduction_ratio"] - 1.0) < 1e-9


# --- tokenizer fertility ------------------------------------------------------------


def test_fertility_hand_counted(spark, tmp_path):
    docs = [
        (1, "aa bb", "en"),   # 5 bytes, 2 word tokens
        (2, "ccc d", "en"),   # 5 bytes, 2 word tokens
        (3, "xyzzy", "fr"),   # 5 bytes, 1 word token
    ]
    spark.createDataFrame(docs, "doc_id long, text string, lang string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = {r["lang"]: r for r in QS["tokenizer_fertility_by_lang"](spark, str(tmp_path)).collect()}
    en = rows["en"]
    assert en["n_docs"] == 2 and en["n_bytes"] == 10
    assert en["n_word_tokens"] == 4
    assert abs(en["bytes_per_token"] - 2.5) < 1e-9
    assert abs(en["tokens_per_doc"] - 2.0) < 1e-9
    fr = rows["fr"]
    assert fr["n_bytes"] == 5 and fr["n_word_tokens"] == 1
    assert abs(fr["bytes_per_token"] - 5.0) < 1e-9


# --- span corruption invariants -----------------------------------------------------


def test_span_corruption_reconstruction(spark):
    """Non-sentinel corrupted tokens + target span tokens reconstruct the
    original token multiset; sentinel numbering is consistent on both
    sides; counts reconcile."""
    rows = QS["span_corruption_build"](spark, SF0001).collect()
    assert rows
    masked_docs = 0
    for r in rows:
        corr = r["corrupted_text"].split() if r["corrupted_text"] else []
        targ = r["target_text"].split() if r["target_text"] else []
        sent_c = [t for t in corr if t.startswith("<extra_id_")]
        sent_t = [t for t in targ if t.startswith("<extra_id_")]
        plain_c = [t for t in corr if not t.startswith("<extra_id_")]
        plain_t = [t for t in targ if not t.startswith("<extra_id_")]
        assert len(sent_c) == r["n_spans"] == len(sent_t)
        assert sent_c == [f"<extra_id_{k}>" for k in range(1, r["n_spans"] + 1)]
        assert sent_t == sent_c  # same order left to right
        assert len(plain_t) == r["n_masked"]
        assert len(plain_c) + len(plain_t) == r["n_tokens"]
        if r["n_spans"]:
            masked_docs += 1
    assert masked_docs > 0  # the corpus actually exercises masking


# --- n-gram novelty extremes --------------------------------------------------------


def test_novelty_extremes(spark, tmp_path):
    """A val doc copied verbatim from train has novelty 0; a val doc with
    disjoint vocabulary has novelty 1. doc_ids 1/2/3 hash to train and
    6/31 to val under the shared split hash."""
    dup = "red orange yellow green blue indigo violet"
    docs = [
        (1, dup),                     # train
        (2, "aa bb cc dd ee ff gg"),  # train
        (6, dup),                     # val, fully seen -> novelty 0
        (31, "qq ww rr tt yy uu ii"), # val, fully novel -> novelty 1
    ]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    rows = {r["split"]: r for r in QS["ngram_novelty_rate"](spark, str(tmp_path)).collect()}
    val = rows["val"]
    assert val["n_docs"] == 2
    n_grams_each = 5  # 7 tokens -> 5 distinct trigrams
    assert val["n_grams_total"] == 2 * n_grams_each
    assert val["n_grams_seen"] == n_grams_each
    assert abs(val["micro_novelty"] - 0.5) < 1e-6 + 1e-9
    assert abs(val["macro_novelty"] - 0.5) < 1e-6 + 1e-9
    assert "test" not in rows  # no test-split docs in the fixture


# --- cross-source near-dup matrix ---------------------------------------------------


def test_near_dup_matrix_planted_pair(spark, tmp_path):
    dup = " ".join(f"tok{i}" for i in range(30))
    docs = [
        (1, dup, "srcA"),
        (2, dup, "srcB"),
        (3, " ".join(f"other{i}" for i in range(30)), "srcC"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string, source string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = QS["near_dup_source_matrix"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src_a"], r["src_b"], r["n_pairs"]) == ("srcA", "srcB", 1)


# --- motif discovery ----------------------------------------------------------------


def test_motif_finds_planted_repeat(spark, tmp_path):
    """A 7-day pattern planted at day 0 and day 30 -> top pair is exactly
    that (corr 1.0), ahead of all incidental pairs."""
    pattern = [100, 300, 200, 500, 400, 700, 600]
    base = dt.datetime(2024, 1, 1)
    daily = {}
    for t in range(90):
        # irregular filler, strictly positive, no affine repeats
        daily[t] = 10 + 3 * t + (t % 5) * 17 + (t % 11) * 7
    for k, v in enumerate(pattern):
        daily[k] = v
        daily[30 + k] = v
    rows = [
        (t + 1, float(x * 1000), base + dt.timedelta(days=t))
        for t, x in daily.items()
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = QS["ts_motif_top_pairs"](spark, str(tmp_path)).collect()
    assert len(out) == 3
    top = out[0]
    assert top["corr"] == 1.0
    assert top["start_a"] == dt.date(2024, 1, 1)
    assert top["start_b"] == dt.date(2024, 1, 31)


# --- bandit replay ------------------------------------------------------------------


def test_bandit_greedy_picks_planted_best_arm(spark, tmp_path):
    rows = []
    eid = 0
    for day in (5, 20):  # one first-half day, one second-half day
        for u in range(20):
            for et, val in (("good", 150.0), ("bad", 10.0)):
                eid += 1
                rows.append(
                    (eid, dt.datetime(2024, 1, day, 12, 0, 0), u, et, val)
                )
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["policy"]: r for r in QS["bandit_replay_eval"](spark, str(tmp_path)).collect()}
    assert out["greedy"]["n_matched"] == 20  # all second-half 'good' events
    assert out["greedy"]["reward_rate"] == 1.0
    assert out["logging"]["n_matched"] == 40
    assert abs(out["logging"]["reward_rate"] - 0.5) < 1e-9
    u = out["uniform"]
    assert 0 <= u["n_rewarded"] <= u["n_matched"] <= 40


# --- Brier decomposition ------------------------------------------------------------


def test_brier_decomposition_identities(spark):
    r = QS["brier_score_decomposition"](spark, SF0001).collect()[0]
    y = r["base_rate"]
    assert abs(r["uncertainty"] - round(y * (1 - y), 6)) < 2e-6
    assert r["reliability"] >= 0 and r["resolution"] >= 0
    # binned identity holds by construction
    assert (
        abs(r["brier_binned"] - (r["reliability"] - r["resolution"] + r["uncertainty"]))
        < 3e-6
    )
    # raw Brier differs from the binned one only by within-bin variance of p
    assert 0.0 <= r["brier"] <= 1.0
    assert r["resolution"] <= r["uncertainty"] + 1e-9


# --- decision stump -----------------------------------------------------------------


def test_stump_finds_perfect_split(spark, tmp_path):
    """Converted users have 10 events, non-converted have 2 -> any
    n_events threshold in [2,8] splits perfectly (gini 0) and is_best."""
    rows = []
    eid = 0
    for u in range(1, 11):  # converters: all purchases
        for i in range(10):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 2, 10, 0, i), u, "purchase", 150.0))
    for u in range(11, 21):  # non-converters: two views
        for i in range(2):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 2, 11, 0, i), u, "view", 10.0))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = QS["decision_stump_train"](spark, str(tmp_path)).collect()
    assert len(out) == 19  # full candidate grid emitted
    perfect = [r for r in out if r["gini_q"] == 0 and r["is_best"]]
    assert perfect  # a perfect split exists and is flagged best
    at4 = next(r for r in out if r["feature"] == "n_events" and r["threshold"] == 4)
    assert (at4["n_left"], at4["s_left"], at4["n_right"], at4["s_right"]) == (10, 0, 10, 10)
    assert at4["gini_q"] == 0 and at4["is_best"]
    # no imperfect candidate may be flagged best when a perfect one exists
    assert all(r["gini_q"] == 0 for r in out if r["is_best"])


# --- logistic gradient --------------------------------------------------------------


def test_logreg_gradient_matches_hand_computation(spark, tmp_path):
    """Two planted users with known features -> gradient and loss match
    the hand-computed sums (within one quantization ulp for engine exp)."""
    rows = []
    eid = 0
    # user 1: 4 purchase events of 250.00 on one day -> y=1,
    #   n_events=4, cents_k=floor(100000/100000)=1, active_days=1
    for i in range(4):
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 3, 10, 0, i), 1, "purchase", 250.0))
    # user 2: 2 view events of 50.00 on two days -> y=0,
    #   n_events=2, cents_k=0, active_days=2
    for d in (4, 5):
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, d, 10, 0, 0), 2, "view", 50.0))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["feature"]: r for r in QS["logreg_gradient_step"](spark, str(tmp_path)).collect()}

    import math

    W = (-1.0, 0.25, 0.125, 0.5)
    users = [  # (n_events, cents_k, active_days, y)
        (4, 1, 1, 1),
        (2, 0, 2, 0),
    ]
    feats = {"n_events": 0, "cents_k": 1, "active_days": 2}
    for fname, fi in feats.items():
        g = 0
        loss = 0
        for ne, ck, ad, y in users:
            z = W[0] + W[1] * ne + W[2] * ck + W[3] * ad
            r = 1.0 / (1.0 + math.exp(-z)) - y
            x = (ne, ck, ad)[fi]
            g += math.floor(r * x * 1e9 + 0.5)
            loss += math.floor(
                (math.log(1 + math.exp(-z)) if y else math.log(1 + math.exp(z)))
                * 1e6 + 0.5
            )
        row = out[fname]
        assert abs(row["g_q"] - g) <= 2, fname
        assert abs(row["loss_q"] - loss) <= 2, fname
        assert row["n_users"] == 2


# --- quantile normalization ---------------------------------------------------------


def test_quantile_normalization_converges_means(spark, tmp_path):
    """Two series with shifted distributions -> after normalization both
    means sit near the pooled mean (and exactly equal each other when the
    series are order-isomorphic)."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(101):
        eid += 1
        rows.append((eid, t0, "low", float(i)))          # 0..100
    for i in range(101):
        eid += 1
        rows.append((eid, t0, "high", float(i + 1000)))  # 1000..1100
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["event_type"]: r for r in QS["quantile_normalize_report"](spark, str(tmp_path)).collect()}
    lo, hi = out["low"], out["high"]
    assert hi["mean_raw"] - lo["mean_raw"] > 900  # raw shift visible
    # both series are uniform 101-pointers -> identical rank profiles ->
    # identical normalized values -> equal means
    assert lo["mean_norm"] == hi["mean_norm"]


# --- seasonal MASE ------------------------------------------------------------------


def test_seasonal_mase_zero_on_periodic_series(spark, tmp_path):
    """A perfectly 12-periodic series -> seasonal-naive errors are 0."""
    pattern = [1000, 1200, 900, 1500, 1100, 1300, 950, 1250, 1050, 1400, 1000, 1350]
    rows = []
    for t in range(30):  # 2.5 cycles
        price = float(pattern[t % 12] * 1000)
        rows.append((t + 1, price, dt.datetime(2022 + t // 12, 1 + t % 12, 15)))
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = QS["seasonal_backtest_mase12"](spark, str(tmp_path)).collect()[0]
    assert out["n_months"] == 30 and out["n_scored"] == 18
    assert out["mae_seasonal"] == 0.0 and out["mase12"] == 0.0


# --- entropy rate -------------------------------------------------------------------


def test_entropy_rate_extremes(spark, tmp_path):
    """Deterministic alternation -> H = 0; the uniform bound is ln(K)."""
    rows = []
    eid = 0
    for u in (1, 2):
        for i in range(40):
            eid += 1
            et = "a" if i % 2 == 0 else "b"
            rows.append((eid, dt.datetime(2024, 1, 2, 0, 0, 0) + dt.timedelta(minutes=i), u, et, 1.0))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = QS["markov_entropy_rate"](spark, str(tmp_path)).collect()[0]
    assert out["entropy_rate_nats"] == 0.0  # a->b->a-> is fully predictable
    assert out["n_states"] == 2
    assert abs(out["max_entropy_nats"] - 0.693147) < 1e-6


# --- hypothesis fuzz: span corruption invariants ------------------------------------


def test_span_corruption_fuzz_invariants(spark, tmp_path):
    """Random corpora (single tokens, repeated tokens, long runs, unicode
    whitespace shapes) always satisfy the structural invariants:
    token-count partition, sentinel sequence integrity on both sides, and
    mask-independent token preservation."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcxyz", min_size=1, max_size=6)
    doc = st.lists(word, min_size=1, max_size=60).map(" ".join)

    case = [0]

    @given(st.lists(doc, min_size=1, max_size=5))
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
    )
    def check(texts):
        case[0] += 1
        path = f"{tmp_path}/fuzz_{case[0]}"
        spark.createDataFrame(
            [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
        for r in QS["span_corruption_build"](spark, path).collect():
            corr = r["corrupted_text"].split() if r["corrupted_text"] else []
            targ = r["target_text"].split() if r["target_text"] else []
            sent_c = [t for t in corr if t.startswith("<extra_id_")]
            sent_t = [t for t in targ if t.startswith("<extra_id_")]
            plain_c = [t for t in corr if not t.startswith("<extra_id_")]
            plain_t = [t for t in targ if not t.startswith("<extra_id_")]
            assert len(sent_c) == r["n_spans"] == len(sent_t)
            assert sent_c == [f"<extra_id_{k}>" for k in range(1, r["n_spans"] + 1)]
            assert sent_t == sent_c
            assert len(plain_t) == r["n_masked"]
            assert len(plain_c) + len(plain_t) == r["n_tokens"]
            assert 0 <= r["n_masked"] <= r["n_tokens"]

    check()
