"""Round-4 data-selection operators: independent (non-SQL) checks.

The oracle gate proves Spark == DuckDB; these re-derive the SHARED
semantics in plain Python on synthetic corpora — the guard against both
engines agreeing on a wrong formula (same rationale as test_corpus_ops).
"""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd
import pytest

from bigdata_meteo_datalake_spark.queries import queries

from .conftest import SF0001

QS = queries()


def _th(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[ \t\n\r\f]+", text.strip().lower()) if t]


def _write_docs(tmp_path, rows):
    """rows: (doc_id, text, lang, source)."""
    import os

    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": lang,
                "source": src,
                "n_chars": len(t),
            }
            for i, t, lang, src in rows
        ]
    ).to_parquet(f"{d}/documents.parquet")
    return d


def _python_dsir(rows, dim=1024, topk=200):
    """Reference DSIR: hashed uni+bigram buckets, add-1 smoothed
    micro-quantized log-ratios, integer doc sums, total-ordered top-k."""
    from collections import Counter, defaultdict

    q_c: Counter = Counter()
    t_c: Counter = Counter()
    doc_feats: dict[int, list[int]] = defaultdict(list)
    for doc_id, text, _lang, src in rows:
        toks = _toks(text)
        feats = [_th(t) % dim for t in toks] + [
            _th(f"{a} {b}") % dim for a, b in zip(toks, toks[1:])
        ]
        doc_feats[doc_id] = feats
        for f in feats:
            q_c[f] += 1
            if src == "src0":
                t_c[f] += 1
    qn, tn = sum(q_c.values()), sum(t_c.values())
    wq = {
        f: math.floor(
            (
                math.log((t_c[f] + 1.0) / (tn + dim))
                - math.log((q_c[f] + 1.0) / (qn + dim))
            )
            * 1_000_000
            + 0.5
        )
        for f in q_c
    }
    scored = [
        (doc_id, len(fs), sum(wq[f] for f in fs))
        for doc_id, fs in doc_feats.items()
        if fs
    ]
    scored.sort(key=lambda r: (-r[2], r[0]))
    return scored[:topk]


def test_dsir_matches_python_reference(spark, tmp_path):
    rows = [
        (0, "alpha beta gamma alpha beta", "en", "src0"),
        (1, "alpha beta gamma delta", "en", "src0"),
        (2, "zeta eta theta zeta eta", "en", "src1"),
        (3, "alpha beta alpha beta alpha", "en", "src1"),  # target-like text, raw src
        (4, "theta zeta eta iota", "en", "src2"),
        (5, "", "en", "src2"),  # zero tokens -> unscored
        (6, "alpha gamma beta", "en", "src0"),
    ]
    d = _write_docs(tmp_path, rows)
    got = [
        (r.doc_id, r.n_feats, r.w_micro)
        for r in QS["dsir_importance_weights"](spark, d).collect()
    ]
    assert got == _python_dsir(rows)
    # target-distribution text scores above off-target text regardless of
    # which source bucket it sits in (the whole point of DSIR):
    by_doc = {doc: w for doc, _n, w in got}
    assert by_doc[3] > by_doc[2] and by_doc[3] > by_doc[4]


def test_boilerplate_flags_shared_spans(spark, tmp_path):
    chrome = "all rights reserved contact us today"  # 6 tokens -> two 5-grams
    rows = [(i, f"{chrome} body{i} text{i}", "en", "src0") for i in range(12)] + [
        (50, "entirely unique document body here now", "en", "src1"),
        (51, "tiny", "en", "src1"),  # < 5 tokens -> zero grams
    ]
    d = _write_docs(tmp_path, rows)
    out = {r.doc_id: r for r in QS["boilerplate_ngram_coverage"](spark, d).collect()}
    # 8 tokens -> 4 gram positions; the two chrome-only grams appear in all
    # 12 docs (df=12 >= 10) -> 2 of 4 positions boilerplate, frac 0.5 -> flag
    assert out[0].n_grams == 4 and out[0].n_boiler == 2
    assert out[0].boiler_frac == 0.5 and out[0].is_boilerplate_doc is True
    assert out[50].n_boiler == 0 and out[50].is_boilerplate_doc is False
    assert out[51].n_grams == 0 and out[51].boiler_frac is None


def test_heaps_growth_monotone_and_exact_at_full(spark):
    rows = QS["heaps_vocab_growth"](spark, SF0001).collect()
    by_pct = {r.pct: r for r in rows}
    assert sorted(by_pct) == [10, 25, 50, 75, 100]
    prev = None
    for pct in sorted(by_pct):
        r = by_pct[pct]
        assert r.vocab_size <= r.n_token_occ
        if prev is not None:
            assert r.n_docs_covered >= prev.n_docs_covered
            assert r.n_token_occ >= prev.n_token_occ
            assert r.vocab_size >= prev.vocab_size
        prev = r
    # at 100% the cumulative numbers equal the straight corpus totals
    docs = pd.read_parquet(f"{SF0001}/documents.parquet")
    all_toks = [t for text in docs["text"] for t in _toks(text)]
    assert by_pct[100].n_token_occ == len(all_toks)
    assert by_pct[100].vocab_size == len({_th(t) for t in all_toks})
    assert by_pct[100].n_docs_covered == len(docs)


def test_zipf_recovers_synthetic_power_law(spark, tmp_path):
    # token k (1-based) appears floor(512 / k) times -> exact slope -1 law
    words = []
    for k in range(1, 65):
        words += [f"w{k:03d}"] * (512 // k)
    # spread across docs so the corpus shape is realistic
    rows = [
        (i, " ".join(words[i::8]), "en", "src0") for i in range(8)
    ]
    d = _write_docs(tmp_path, rows)
    r = QS["zipf_fit_tokens"](spark, d).collect()[0]
    assert r.n_tokens == 64
    assert r.slope == pytest.approx(-1.0, abs=0.05)
    assert r.r2 > 0.999
    assert r.intercept == pytest.approx(math.log(512), abs=0.1)


def test_fs_linkage_classes(spark, tmp_path):
    import os

    d = str(tmp_path / "cust")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        [
            # same nation, same segment, balances within 50, same sign -> link
            {"c_custkey": 1, "c_name": "a", "c_nationkey": 7, "c_acctbal": 100.0, "c_mktsegment": "AUTO"},
            {"c_custkey": 2, "c_name": "b", "c_nationkey": 7, "c_acctbal": 120.0, "c_mktsegment": "AUTO"},
            # same nation, bal within 50 + sign agree but segment differs ->
            # possible (ln(.1/.8) + ln(.85/.05) + ln(.95/.7) ~= +1.06)
            {"c_custkey": 3, "c_name": "c", "c_nationkey": 7, "c_acctbal": 130.0, "c_mktsegment": "HOUSEHOLD"},
            # different nation -> never a candidate pair
            {"c_custkey": 4, "c_name": "d", "c_nationkey": 8, "c_acctbal": 100.0, "c_mktsegment": "AUTO"},
            # same nation but only seg+sign agree -> score ~= -0.036, excluded
            {"c_custkey": 5, "c_name": "e", "c_nationkey": 7, "c_acctbal": 5000.0, "c_mktsegment": "AUTO"},
        ]
    ).to_parquet(f"{d}/customer.parquet")
    out = {(r.custkey_a, r.custkey_b): r for r in QS["record_linkage_fs"](spark, d).collect()}
    assert out[(1, 2)].match_class == "link"
    assert out[(1, 3)].match_class == "possible" and out[(2, 3)].match_class == "possible"
    assert not any(4 in k for k in out)
    assert not any(5 in k for k in out)


def test_selection_plan_shapes(spark):
    """Scale shapes pinned: DSIR and Zipf end in TakeOrderedAndProject /
    single-row reductions with their corpus-side joins broadcast; the
    boilerplate join back onto the gram stream is broadcast too."""
    from bigdata_meteo_datalake_spark.plans.explain import n_nodes, plan_string

    dsir = QS["dsir_importance_weights"](spark, SF0001)
    assert n_nodes(dsir, "TakeOrderedAndProject") == 1
    assert "BroadcastHashJoin" in plan_string(dsir)  # ratio table join
    # zipf checkpoints the top-k cut, so the final plan joins two scans of
    # the materialized <=1000-row relation — the corpus appears ZERO times
    # (a TakeOrdered over the corpus would mean a second full scan).
    zp = plan_string(QS["zipf_fit_tokens"](spark, SF0001))
    assert "Scan parquet" not in zp and "ExistingRDD" in zp
    bp = plan_string(QS["boilerplate_ngram_coverage"](spark, SF0001))
    assert "BroadcastHashJoin" in bp
    assert "CartesianProduct" not in bp


def test_mutual_information_independent_vs_dependent(spark, tmp_path):
    """MI ~ 0 for independent columns; MI == H(X) when Y determines X.
    Built on the orders pair (priority ~ status) with synthetic data."""
    import itertools
    import os

    d = str(tmp_path / "mi")
    os.makedirs(d, exist_ok=True)
    # independent: every (priority, status) combo equally often
    rows = []
    k = 0
    for p, s in itertools.product(["A", "B"], ["X", "Y"]):
        for _ in range(25):
            rows.append({"o_orderkey": k, "o_custkey": 0, "o_orderstatus": s,
                         "o_totalprice": 1.0, "o_orderdate": None,
                         "o_orderpriority": p})
            k += 1
    pd.DataFrame(rows).to_parquet(f"{d}/orders.parquet")
    # the other two pairs need their tables present
    pd.DataFrame(
        [{"l_orderkey": 0, "l_partkey": 0, "l_suppkey": 0, "l_linenumber": 1,
          "l_quantity": 1.0, "l_extendedprice": 1.0, "l_discount": 0.0,
          "l_tax": 0.0, "l_returnflag": "N", "l_linestatus": "O",
          "l_shipdate": None}]
    ).to_parquet(f"{d}/lineitem.parquet")
    pd.DataFrame(
        [{"p_partkey": 0, "p_name": "x", "p_brand": "B", "p_type": "T",
          "p_size": 1, "p_retailprice": 1.0}]
    ).to_parquet(f"{d}/part.parquet")
    out = {r.pair: r.mi_nats for r in QS["mutual_information_report"](spark, d).collect()}
    assert out["orders:priority~status"] == pytest.approx(0.0, abs=1e-6)

    # dependent: status == f(priority) exactly -> MI = H(priority) = ln 2.
    # NB: a fresh directory, not an overwrite — Spark's FileStatusCache
    # keys on (path, size, mtime) and a same-second same-size rewrite
    # would serve the stale file listing.
    d2 = str(tmp_path / "mi2")
    os.makedirs(d2, exist_ok=True)
    for r in rows:
        r["o_orderstatus"] = "X" if r["o_orderpriority"] == "A" else "Y"
    pd.DataFrame(rows).to_parquet(f"{d2}/orders.parquet")
    for t in ("lineitem", "part"):
        import shutil

        shutil.copy(f"{d}/{t}.parquet", f"{d2}/{t}.parquet")
    out = {r.pair: r.mi_nats for r in QS["mutual_information_report"](spark, d2).collect()}
    assert out["orders:priority~status"] == pytest.approx(math.log(2), abs=1e-5)


def test_purged_folds_conserve_and_embargo(spark):
    rows = QS["purged_timeseries_folds"](spark, SF0001).collect()
    assert len(rows) == 5
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    total = len(ev)
    for r in rows:
        assert r.test_n + r.embargo_n + r.train_n == total
        assert r.fold_end_day > r.fold_start_day
        assert r.test_n > 0
    # contiguous cover of the whole span
    bounds = sorted((r.fold_start_day, r.fold_end_day) for r in rows)
    assert bounds[0][0] == 0
    for (s0, e0), (s1, e1) in zip(bounds, bounds[1:]):
        assert e0 == s1


def test_negative_sampling_excludes_purchases(spark):
    out = QS["negative_sampling_popularity"](spark, SF0001).toPandas()
    lineitem = pd.read_parquet(f"{SF0001}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF0001}/orders.parquet")
    purch = orders.merge(lineitem, left_on="o_orderkey", right_on="l_orderkey")[
        ["o_custkey", "l_partkey"]
    ].drop_duplicates()
    purchased = set(map(tuple, purch.values))
    assert not any((c, p) in purchased for c, p in zip(out.custkey, out.partkey))
    # per customer at most top-N candidates
    assert out.groupby("custkey").size().max() <= 20


def test_embedding_covariance_matches_numpy(spark):
    """Quantized integer-moment covariance tracks the float covariance to
    within quantization error (1e-4 per coordinate -> ~1e-6 per cell),
    and the diagonal is the per-dimension variance (non-negative)."""
    import numpy as np

    out = QS["embedding_covariance"](spark, SF0001).toPandas()
    emb = np.stack(pd.read_parquet(f"{SF0001}/embeddings.parquet")["embedding"].values)
    ref = np.cov(emb.astype(np.float64), rowvar=False, bias=True)
    assert len(out) == 64 * 65 // 2
    for r in out.itertuples():
        assert abs(r.cov - ref[r.i, r.j]) < 1e-6, (r.i, r.j)
        if r.i == r.j:
            assert r.cov >= 0


def test_auc_binned_boundary_values(spark, tmp_path):
    """Perfect separation -> 1.0; inverted -> 0.0; all-tied -> 0.5; and a
    mixed case matches a plain-Python binned rank computation."""
    def write(rows, sub):
        import os

        d = str(tmp_path / sub)
        os.makedirs(d, exist_ok=True)
        pd.DataFrame(
            [{"doc_id": i, "text": "", "lang": lang, "source": "s",
              "n_chars": n} for i, (n, lang) in enumerate(rows)]
        ).to_parquet(f"{d}/documents.parquet")
        return d

    fn = QS["auc_binned_report"]
    # positives (en) all score higher
    r = fn(spark, write([(100 + i, "en") for i in range(5)]
                        + [(i, "fr") for i in range(5)], "sep")).collect()[0]
    assert r.auc == 1.0 and r.n_pos == 5 and r.n_neg == 5
    # inverted
    r = fn(spark, write([(i, "en") for i in range(5)]
                        + [(100 + i, "fr") for i in range(5)], "inv")).collect()[0]
    assert r.auc == 0.0
    # every score identical -> one bin, all ties -> 0.5
    r = fn(spark, write([(42, "en")] * 3 + [(42, "fr")] * 4, "tie")).collect()[0]
    assert r.auc == 0.5


def test_ndcg_perfect_and_empty(spark, tmp_path):
    """Identical same-label vectors rank first -> NDCG 1.0; a query with
    no same-label candidates has undefined (NULL) NDCG."""
    import os

    import numpy as np

    d = str(tmp_path / "ndcg")
    os.makedirs(d, exist_ok=True)
    rng = [0.1 * (i + 1) for i in range(8)]
    rows = []
    # queries are vec_id < 20; give query 0 label 1 with 3 exact clones,
    # query 1 label 9 with no other label-9 vector
    rows.append({"vec_id": 0, "embedding": rng, "label": 1})
    rows.append({"vec_id": 1, "embedding": [x + 1 for x in rng], "label": 9})
    for i in range(3):
        rows.append({"vec_id": 100 + i, "embedding": rng, "label": 1})
    for i in range(5):
        rows.append({"vec_id": 200 + i, "embedding": [x * (2 + i) for x in rng][::-1], "label": 2})
    pd.DataFrame(rows).to_parquet(f"{d}/embeddings.parquet")
    out = {r.query_id: r for r in QS["ndcg_at10_report"](spark, d).collect()}
    assert out[0].n_rel == 3 and out[0].ndcg10 == 1.0
    assert out[1].n_rel == 0 and out[1].ndcg10 is None


def _py_binned_auc(pairs, bins=1024):
    """Pure-Python reference of the binned AUC (same binning rule)."""
    lo, hi = min(s for s, _ in pairs), max(s for s, _ in pairs)
    hist_p: dict[int, int] = {}
    hist_n: dict[int, int] = {}
    for s, pos in pairs:
        b = (s - lo) * bins // (hi - lo + 1)
        (hist_p if pos else hist_n)[b] = (hist_p if pos else hist_n).get(b, 0) + 1
    gt = sum(
        np_ * nn for bp, np_ in hist_p.items() for bn, nn in hist_n.items() if bp > bn
    )
    eq = sum(np_ * hist_n.get(bp, 0) for bp, np_ in hist_p.items())
    n_pos, n_neg = sum(hist_p.values()), sum(hist_n.values())
    return math.floor((2 * gt + eq) / (2.0 * n_pos * n_neg) * 1e6 + 0.5) / 1e6


def test_auc_property_random_scores(spark, tmp_path):
    """Random integer scores + labels: the Spark AUC equals the pure-Python
    binned reference exactly (hypothesis, bounded examples — each runs
    real Spark jobs)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    counter = [0]

    @given(
        st.lists(
            st.tuples(st.integers(min_value=0, max_value=5000), st.booleans()),
            min_size=4,
            max_size=60,
        ).filter(lambda xs: any(p for _, p in xs) and any(not p for _, p in xs))
    )
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
    )
    def check(pairs):
        import os

        counter[0] += 1
        d = str(tmp_path / f"aucp{counter[0]}")
        os.makedirs(d, exist_ok=True)
        pd.DataFrame(
            [
                {"doc_id": i, "text": "", "lang": "en" if pos else "fr",
                 "source": "s", "n_chars": s}
                for i, (s, pos) in enumerate(pairs)
            ]
        ).to_parquet(f"{d}/documents.parquet")
        r = QS["auc_binned_report"](spark, d).collect()[0]
        assert r.auc == _py_binned_auc(pairs)

    check()


def test_mi_property_bounds(spark, tmp_path):
    """Random joint distributions: MI within quantization error of the
    direct float computation, non-negative, and bounded by min marginal
    entropy."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    counter = [0]

    @given(
        st.lists(
            st.tuples(st.sampled_from("AB"), st.sampled_from("XYZ")),
            min_size=5,
            max_size=80,
        )
    )
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
    )
    def check(cells):
        import os
        from collections import Counter

        counter[0] += 1
        d = str(tmp_path / f"mip{counter[0]}")
        os.makedirs(d, exist_ok=True)
        pd.DataFrame(
            [
                {"o_orderkey": i, "o_custkey": 0, "o_orderstatus": y,
                 "o_totalprice": 1.0, "o_orderdate": None, "o_orderpriority": x}
                for i, (x, y) in enumerate(cells)
            ]
        ).to_parquet(f"{d}/orders.parquet")
        pd.DataFrame(
            [{"l_orderkey": 0, "l_partkey": 0, "l_suppkey": 0, "l_linenumber": 1,
              "l_quantity": 1.0, "l_extendedprice": 1.0, "l_discount": 0.0,
              "l_tax": 0.0, "l_returnflag": "N", "l_linestatus": "O",
              "l_shipdate": None}]
        ).to_parquet(f"{d}/lineitem.parquet")
        pd.DataFrame(
            [{"p_partkey": 0, "p_name": "x", "p_brand": "B", "p_type": "T",
              "p_size": 1, "p_retailprice": 1.0}]
        ).to_parquet(f"{d}/part.parquet")
        out = {r.pair: r.mi_nats
               for r in QS["mutual_information_report"](spark, d).collect()}
        got = out["orders:priority~status"]
        n = len(cells)
        jx, jy, jxy = Counter(x for x, _ in cells), Counter(y for _, y in cells), Counter(cells)
        mi = sum(
            c / n * math.log(c * n / (jx[x] * jy[y])) for (x, y), c in jxy.items()
        )
        hx = -sum(c / n * math.log(c / n) for c in jx.values())
        hy = -sum(c / n * math.log(c / n) for c in jy.values())
        assert abs(got - mi) < 1e-5
        assert got >= -1e-6
        assert got <= min(hx, hy) + 1e-5

    check()


def test_gini_boundary_cases(spark, tmp_path):
    """Equal spends -> Gini 0; one whale holding almost everything ->
    Gini near (n-1)/n."""
    import os

    def write(totals, sub):
        d = str(tmp_path / sub)
        os.makedirs(d, exist_ok=True)
        pd.DataFrame(
            [{"o_orderkey": i, "o_custkey": i, "o_orderstatus": "O",
              "o_totalprice": float(v), "o_orderdate": None,
              "o_orderpriority": "1"} for i, v in enumerate(totals)]
        ).to_parquet(f"{d}/orders.parquet")
        return d

    fn = QS["gini_customer_spend"]
    r = fn(spark, write([500.0] * 10, "eq")).collect()[0]
    assert r.gini == 0.0 and r.n_customers == 10
    r = fn(spark, write([1.0] * 9 + [1_000_000.0], "whale")).collect()[0]
    assert r.gini > 0.85


def test_stl_reconstruction_identity(spark):
    """For interior months: trend + seasonal + residual reconstructs the
    revenue (within component rounding); seasonal repeats with period 12;
    edge months (incomplete +/-6 window) have NULL trend and residual."""
    rows = QS["stl_decompose_monthly"](spark, SF0001).collect()
    assert len(rows) == 80
    interior = [r for r in rows if r.trend is not None]
    assert len(interior) == 80 - 12  # 6 months lost at each end
    for r in interior:
        assert abs(r.revenue - (r.trend + r.seasonal + r.residual)) < 0.03
    by_month = {}
    for r in rows:
        by_month.setdefault(r.month.month, set()).add(r.seasonal)
    assert all(len(v) == 1 for v in by_month.values())  # period-12 constant
    for r in rows:
        assert (r.trend is None) == (r.residual is None)


def test_token_dropout_rate_and_determinism(spark, tmp_path):
    """Drop rate lands near 1/10 over a large corpus, reruns are
    bit-identical, and empty docs survive with NULL kept_frac."""
    rows = [(0, "", "en", "s")] + [
        (i, " ".join(f"tok{i}w{j}" for j in range(50)), "en", "s")
        for i in range(1, 41)
    ]
    d = _write_docs(tmp_path, rows)
    a = QS["augment_token_dropout"](spark, d).toPandas().sort_values("doc_id")
    b = QS["augment_token_dropout"](spark, d).toPandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    empty = a[a.doc_id == 0].iloc[0]
    assert empty.n_tokens == 0 and pd.isna(empty.kept_frac)
    body = a[a.doc_id > 0]
    rate = 1 - body.n_kept.sum() / body.n_tokens.sum()
    assert 0.05 < rate < 0.15  # 2000 positions at p=0.1


def test_kcore_peels_pendants_keeps_clique(spark, tmp_path):
    """K4,4 complete bipartite survives the 3-core; a pendant customer and
    its low-degree supplier peel away (cascade), and the run converges."""
    import os

    d = str(tmp_path / "kcore")
    os.makedirs(d, exist_ok=True)
    orders, lines, ok = [], [], 0
    # complete bipartite: customers 1-4 x suppliers 1-4 (degrees 4 >= 3)
    for c in range(1, 5):
        for s in range(1, 5):
            orders.append({"o_orderkey": ok, "o_custkey": c, "o_orderstatus": "O",
                           "o_totalprice": 1.0, "o_orderdate": None,
                           "o_orderpriority": "1"})
            lines.append({"l_orderkey": ok, "l_partkey": 0, "l_suppkey": s,
                          "l_linenumber": 1, "l_quantity": 1.0,
                          "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0,
                          "l_returnflag": "N", "l_linestatus": "O",
                          "l_shipdate": None})
            ok += 1
    # pendant: customer 9 -> supplier 9 only (both degree 1 -> peel)
    orders.append({"o_orderkey": ok, "o_custkey": 9, "o_orderstatus": "O",
                   "o_totalprice": 1.0, "o_orderdate": None, "o_orderpriority": "1"})
    lines.append({"l_orderkey": ok, "l_partkey": 0, "l_suppkey": 9,
                  "l_linenumber": 1, "l_quantity": 1.0, "l_extendedprice": 1.0,
                  "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
                  "l_linestatus": "O", "l_shipdate": None})
    pd.DataFrame(orders).to_parquet(f"{d}/orders.parquet")
    pd.DataFrame(lines).to_parquet(f"{d}/lineitem.parquet")
    rows = QS["kcore_trade_graph"](spark, d).collect()
    nodes = {r.node for r in rows}
    assert nodes == {1, 2, 3, 4, 10_000_001, 10_000_002, 10_000_003, 10_000_004}
    assert all(r.degree == 4 and r.converged for r in rows)


def test_ivm_retraction_vanishes_group(spark, tmp_path):
    """A group whose every base row is deleted must disappear from the
    maintained view (count reaches zero), and inserted-only groups appear."""
    import datetime as dt
    import os

    d = str(tmp_path / "ivm")
    os.makedirs(d, exist_ok=True)
    jan, feb, mar = dt.datetime(2024, 1, 15), dt.datetime(2024, 2, 15), dt.datetime(2024, 3, 15)
    # written via Spark so o_orderdate is a real TIMESTAMP (pandas writes
    # nanos, which the reader surfaces as long — the drift guard's domain)
    spark.createDataFrame(
        [
            # group (Jan, X): single base row with orderkey % 100 == 7 -> deleted
            (107, 0, "X", 10.0, jan, "1"),
            # group (Feb, Y): base row that stays
            (11, 0, "Y", 20.0, feb, "1"),
            # group (Mar, Z): insert-only (orderkey % 10 == 0)
            (30, 0, "Z", 30.0, mar, "1"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    out = {(r.month.month, r.o_orderstatus): r for r in QS["ivm_apply_delta"](spark, d).collect()}
    assert (1, "X") not in out          # fully retracted group vanished
    assert out[(2, "Y")].n_rows == 1 and out[(2, "Y")].total == 20.0
    assert out[(3, "Z")].n_rows == 1 and out[(3, "Z")].total == 30.0


def test_results_invariant_under_shuffle_parallelism(spark):
    """Order-free-arithmetic claims, tested directly: re-running the
    float-adjacent queries under a different shuffle partition count must
    produce BIT-IDENTICAL results — if any cross-row float sum slipped
    through the integer-quantization discipline, varying the partitioning
    would reorder it and flip low bits."""
    names = [
        "dsir_importance_weights",
        "zipf_fit_tokens",
        "gini_customer_spend",
        "priority_sample_total",
        "mutual_information_report",
        "embedding_covariance",
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


def test_conformal_coverage_near_target(spark):
    """The split-conformal guarantee: empirical test coverage per group
    should land near the 0.9 target (finite-sample wobble bounded at
    sf0.001's group sizes) and the splits must partition the table."""
    rows = QS["conformal_interval_report"](spark, SF0001).collect()
    assert len(rows) == 5
    total = sum(r.n_train + r.n_cal + r.n_test for r in rows)
    orders = pd.read_parquet(f"{SF0001}/orders.parquet")
    assert total == len(orders)
    for r in rows:
        assert 0.75 <= r.coverage <= 1.0, r
        assert r.q90_residual > 0


def test_mann_kendall_detects_monotone_trend(spark, tmp_path):
    """A strictly increasing monthly series must report 'increasing' with
    S = n(n-1)/2; a constant series has S = 0 and 'no_trend'."""
    import datetime as dt
    import os

    def write(vals, sub):
        d = str(tmp_path / sub)
        os.makedirs(d, exist_ok=True)
        spark.createDataFrame(
            [
                (i, 0, "O", float(v), dt.datetime(2020 + i // 12, i % 12 + 1, 5), "1")
                for i, v in enumerate(vals)
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
        return d

    fn = QS["mann_kendall_trend"]
    r = fn(spark, write([100.0 + 10 * i for i in range(24)], "up")).collect()[0]
    assert r.verdict == "increasing" and r.s_stat == 24 * 23 // 2
    r = fn(spark, write([100.0] * 24, "flat")).collect()[0]
    assert r.verdict == "no_trend" and r.s_stat == 0
    r = fn(spark, write([100.0 - 2 * i for i in range(24)], "down")).collect()[0]
    assert r.verdict == "decreasing" and r.s_stat == -(24 * 23 // 2)


def test_theil_sen_robust_to_outlier(spark, tmp_path):
    """A clean linear series recovers its slope exactly; corrupting ONE
    month by 100x moves the Theil-Sen slope only marginally (the
    robustness OLS lacks)."""
    import datetime as dt
    import os

    def write(vals, sub):
        d = str(tmp_path / sub)
        os.makedirs(d, exist_ok=True)
        spark.createDataFrame(
            [
                (i, 0, "O", float(v), dt.datetime(2020 + i // 12, i % 12 + 1, 5), "1")
                for i, v in enumerate(vals)
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
        return d

    fn = QS["theil_sen_slope"]
    clean = [1000.0 + 50 * i for i in range(24)]
    r = fn(spark, write(clean, "clean")).collect()[0]
    assert r.theil_sen_slope == 50.0 and r.n_pairs == 24 * 23 // 2
    dirty = list(clean)
    dirty[12] *= 100  # one corrupted month
    r2 = fn(spark, write(dirty, "dirty")).collect()[0]
    assert abs(r2.theil_sen_slope - 50.0) < 15.0  # median barely moves


def test_cuped_reduces_variance_under_user_persistence(spark, tmp_path):
    """When users have stable spending levels (pre-period predicts
    post-period), CUPED must cut the adjusted variance substantially;
    the adjustment must not move the pooled mean materially."""
    import datetime as dt
    import os

    d = str(tmp_path / "cuped")
    os.makedirs(d, exist_ok=True)
    rows, eid = [], 0
    for u in range(40):
        level = 10.0 + 5.0 * (u % 10)  # persistent per-user level
        for day in range(1, 29):
            rows.append(
                (eid, dt.datetime(2024, 1, day, 12), u, "purchase", level, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = QS["cuped_variance_reduction"](spark, d).collect()
    assert {r.arm for r in out} == {"A", "B"}
    for r in out:
        # perfectly persistent users -> theta ~ y/x ratio, near-total
        # variance elimination within each arm
        assert r.var_reduction > 0.95, r
        assert abs(r.mean_y_cuped - r.mean_y) / r.mean_y < 0.5


def test_chi2_matches_scipy_free_reference(spark, tmp_path):
    """Chi-square and Cramer's V agree with a direct Python computation;
    a deterministic column gives V = 1, an independent one V ~ 0."""
    import itertools
    import os

    d = str(tmp_path / "chi2")
    os.makedirs(d, exist_ok=True)
    rows, k = [], 0
    for p, s in itertools.product(["A", "B"], ["X", "Y"]):
        for _ in range(25):
            rows.append({"o_orderkey": k, "o_custkey": 0, "o_orderstatus": s,
                         "o_totalprice": 1.0, "o_orderdate": None,
                         "o_orderpriority": p})
            k += 1
    pd.DataFrame(rows).to_parquet(f"{d}/orders.parquet")
    pd.DataFrame(
        [{"l_orderkey": 0, "l_partkey": 0, "l_suppkey": 0, "l_linenumber": 1,
          "l_quantity": 1.0, "l_extendedprice": 1.0, "l_discount": 0.0,
          "l_tax": 0.0, "l_returnflag": "N", "l_linestatus": "O",
          "l_shipdate": None}]
    ).to_parquet(f"{d}/lineitem.parquet")
    pd.DataFrame(
        [{"p_partkey": 0, "p_name": "x", "p_brand": "B", "p_type": "T",
          "p_size": 1, "p_retailprice": 1.0}]
    ).to_parquet(f"{d}/part.parquet")
    out = {r.pair: r for r in QS["chi2_independence_report"](spark, d).collect()}
    r = out["orders:priority~status"]
    assert r.chi2 == pytest.approx(0.0, abs=1e-4) and r.cramers_v == pytest.approx(0.0, abs=1e-4)

    import shutil

    d2 = str(tmp_path / "chi2b")
    os.makedirs(d2, exist_ok=True)
    for row in rows:
        row["o_orderstatus"] = "X" if row["o_orderpriority"] == "A" else "Y"
    pd.DataFrame(rows).to_parquet(f"{d2}/orders.parquet")
    for tname in ("lineitem", "part"):
        shutil.copy(f"{d}/{tname}.parquet", f"{d2}/{tname}.parquet")
    r = {x.pair: x for x in QS["chi2_independence_report"](spark, d2).collect()}[
        "orders:priority~status"
    ]
    assert r.chi2 == pytest.approx(100.0, abs=0.01)  # chi2 == n at determinism
    assert r.cramers_v == pytest.approx(1.0, abs=1e-4)


def test_kaplan_meier_monotone(spark):
    """Survival is non-increasing in time, stays in (0, 1], the at-risk
    count is non-increasing, and every step's factor matches
    (1 - d/n) within log-quantization error."""
    import math

    rows = sorted(
        QS["kaplan_meier_lifetimes"](spark, SF0001).collect(), key=lambda r: r.t_days
    )
    assert rows
    prev_s, prev_risk, log_prev = 1.0 + 1e-12, None, 0
    for r in rows:
        assert 0 < r.survival <= prev_s + 1e-9
        if prev_risk is not None:
            assert r.n_risk <= prev_risk
        expected_factor = math.log(1 - r.n_deaths / r.n_risk)
        got_factor = (r.log_s_micro - log_prev) / 1e6
        assert abs(got_factor - expected_factor) < 2e-6
        prev_s, prev_risk, log_prev = r.survival, r.n_risk, r.log_s_micro


def test_logrank_detects_group_difference(spark, tmp_path):
    """BUILDING customers engineered to churn at 30 days vs 1000 days for
    everyone else -> the log-rank test must reject (curves_differ)."""
    import datetime as dt
    import os

    d = str(tmp_path / "logrank")
    os.makedirs(d, exist_ok=True)
    cust, orders, ok = [], [], 0

    def add(ck, seg, start, span_days):
        nonlocal ok
        cust.append({"c_custkey": ck, "c_name": f"c{ck}", "c_nationkey": 0,
                     "c_acctbal": 0.0, "c_mktsegment": seg})
        for dd in (0, span_days):
            orders.append((ok, ck, "O", 1.0, start + dt.timedelta(days=dd), "1"))
            ok += 1

    t0 = dt.datetime(2020, 1, 1)
    for ck in range(1, 21):
        add(ck, "BUILDING", t0, 30)     # early churn
    for ck in range(21, 41):
        add(ck, "AUTO", t0, 1000)       # late churn
    # anchor sets the censor horizon far past every death
    add(99, "AUTO", dt.datetime(2024, 1, 1), 1)
    pd.DataFrame(cust).to_parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    r = QS["logrank_segment_survival"](spark, d).collect()[0]
    assert r.n_g1 == 20 and r.o1 == 20
    assert r.curves_differ and abs(r.z) > 1.96


def test_fdr_screen_detects_engineered_shift(spark, tmp_path):
    """One event type's mean doubles after the cutoff -> it must be
    rejected by BH and Bonferroni; the stable types must not."""
    import datetime as dt
    import os

    d = str(tmp_path / "fdr")
    os.makedirs(d, exist_ok=True)
    rows, eid = [], 0
    for et in ("click", "view", "purchase", "signup", "error"):
        for day in range(1, 29):
            for k in range(8):
                val = 10.0 + (k % 3)
                if et == "purchase" and day >= 16:
                    val += 20.0  # the shifted metric
                rows.append(
                    (eid, dt.datetime(2024, 1, day, 6 + k), eid % 40, et, val, "{}")
                )
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r.event_type: r for r in QS["fdr_stability_screen"](spark, d).collect()}
    assert out["purchase"].rejected_bh and out["purchase"].rejected_bonferroni
    for et in ("click", "view", "signup", "error"):
        assert not out[et].rejected_bh, out[et]


def test_ks_detects_distribution_shift(spark, tmp_path):
    """A variance doubling with an unchanged mean after the cutoff — the
    drift a mean-based z-test misses — must trip the KS gate; identical
    halves must not."""
    import datetime as dt
    import os

    def write(shift, sub):
        d = str(tmp_path / sub)
        os.makedirs(d, exist_ok=True)
        rows, eid = [], 0
        for day in range(1, 29):
            for k in range(40):
                # mean 20 in both halves; post-cutoff spread doubles
                base = (k % 9) - 4  # -4..4, mean 0
                v = 20.0 + (2 * base if (shift and day >= 16) else base)
                rows.append(
                    (eid, dt.datetime(2024, 1, day, 6 + k % 12), k, "click", v, "{}")
                )
                eid += 1
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        return d

    fn = QS["ks_two_sample_drift"]
    r = fn(spark, write(True, "shifted")).collect()[0]
    assert r.distributions_differ, r
    r = fn(spark, write(False, "stable")).collect()[0]
    assert not r.distributions_differ, r


def test_spearman_monotone_and_reference(spark, tmp_path):
    """Monotone (even nonlinear) relation -> rho ~ +1; anti-monotone ->
    -1; a noisy case tracks numpy's exact Spearman within binning error."""
    import os

    import numpy as np

    def write(qs, ps, sub):
        d = str(tmp_path / sub)
        os.makedirs(d, exist_ok=True)
        pd.DataFrame(
            [{"l_orderkey": i, "l_partkey": 0, "l_suppkey": 0, "l_linenumber": 1,
              "l_quantity": float(q), "l_extendedprice": float(p),
              "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
              "l_linestatus": "O", "l_shipdate": None}
             for i, (q, p) in enumerate(zip(qs, ps))]
        ).to_parquet(f"{d}/lineitem.parquet")
        return d

    fn = QS["spearman_qty_price"]
    qs = [float(1 + i % 50) for i in range(500)]
    ps = [q ** 3 * 7 + 100 for q in qs]  # nonlinear but monotone
    r = fn(spark, write(qs, ps, "mono")).collect()[0]
    assert r.spearman_rho > 0.99
    r = fn(spark, write(qs, [-p for p in ps], "anti")).collect()[0]
    assert r.spearman_rho < -0.99
    # noisy linear: compare to numpy rank correlation (exact, unbinned)
    rng = np.random.RandomState(7)
    qs = rng.randint(1, 51, 800).astype(float)
    ps = qs * 100 + rng.normal(0, 400, 800)
    r = fn(spark, write(qs, np.round(ps, 2), "noisy")).collect()[0]

    def rankdata(v):
        order = np.argsort(v, kind="mergesort")
        ranks = np.empty(len(v))
        sv = np.array(v)[order]
        i = 0
        while i < len(v):
            j = i
            while j + 1 < len(v) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i:j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    ref = np.corrcoef(rankdata(qs), rankdata(ps))[0, 1]
    assert abs(r.spearman_rho - ref) < 0.02  # binning tolerance


def test_ab_ztest_detects_engineered_uplift(spark, tmp_path):
    """Arms engineered so arm-1 users purchase far above the base rate ->
    significant positive uplift with a CI excluding zero; balanced data
    (the A/A case above on real testdata) must not reject."""
    import datetime as dt
    import hashlib
    import os

    d = str(tmp_path / "abz")
    os.makedirs(d, exist_ok=True)
    rows, eid = [], 0
    for u in range(200):
        arm = int(hashlib.md5(f"ab1|{u}".encode()).hexdigest()[:15], 16) % 2
        # arm 1: 3 of 5 events are purchases (60%); arm 0: 1 of 5 (20%)
        kinds = (["purchase"] * 3 + ["view"] * 2) if arm else (["purchase"] + ["view"] * 4)
        for k, et in enumerate(kinds * 4):
            rows.append((eid, dt.datetime(2024, 1, 1 + k % 20), u, et, 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    r = QS["ab_uplift_ztest"](spark, d).collect()[0]
    assert r.conv_a == 0.0 and r.conv_b == 1.0  # 20% vs 60% purchase share
    assert r.significant and r.z > 1.96
    assert r.ci_low > 0


def test_gumbel_return_levels_ordered(spark):
    """Return levels are ordered above the mean block max (the 1-in-120
    peak exceeds the 1-in-12, which exceeds the typical month's peak),
    and beta is positive."""
    r = QS["gumbel_return_levels"](spark, SF0001).collect()[0]
    assert r.n_blocks == 80
    assert r.gumbel_beta > 0
    assert r.mean_block_max < r.return_level_12 < r.return_level_120
    assert r.gumbel_mu < r.mean_block_max  # mode below mean for Gumbel
