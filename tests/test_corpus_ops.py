"""Round-3 corpus-governance operators: independent (non-SQL) checks.

The oracle gate proves Spark == DuckDB; these tests prove the SHARED
semantics are right by re-deriving results in plain Python — important for
bpe_train_merges, where both engines run the same greedy-merge window
logic and could in principle agree on a wrong greedy rule.
"""

from __future__ import annotations

import pandas as pd
import pytest

from bigdata_meteo_datalake_spark.queries import queries

from .conftest import SF0001


def _python_bpe_merges(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    """Reference BPE: word-frequency-weighted pair counts, greedy
    left-to-right non-overlapping merges, ties to lexicographic order."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                words[w] += 1
    vocab = {w: list(w) for w in words}
    out = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, freq in words.items():
            toks = vocab[w]
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += freq
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((a, b, cnt))
        for w in words:
            toks = vocab[w]
            new = []
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    new.append(a + b)
                    i += 2  # greedy non-overlapping
                else:
                    new.append(toks[i])
                    i += 1
            vocab[w] = new
    return out


def test_bpe_matches_pure_python_reference(spark):
    texts = pd.read_parquet(f"{SF0001}/documents.parquet")["text"].tolist()
    want = _python_bpe_merges(texts, 3)
    got = (
        queries()["bpe_train_merges"](spark, SF0001)
        .toPandas()
        .sort_values("merge_rank")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 3
    for i, (a, b, cnt) in enumerate(want):
        row = got.iloc[i]
        assert (row["left_tok"], row["right_tok"]) == (a, b), (
            f"merge {i + 1}: engine learned ({row['left_tok']},"
            f" {row['right_tok']}), python reference ({a}, {b})"
        )
        assert int(row["pair_count"]) == cnt


def test_python_bpe_reference_greedy_nonoverlap():
    """Sanity-pin the reference itself: pair COUNTING sees every adjacent
    pair ('aaaa' -> 3 occurrences of (a,a), x3 words = 9), but the MERGE is
    greedy non-overlapping: 'aaaa' -> [aa, aa] (never the middle pair), so
    merge 2 is (aa, aa) with count 3."""
    merges = _python_bpe_merges(["aaaa aaaa aaaa"], 2)
    assert merges[0] == ("a", "a", 9)
    assert merges[1] == ("aa", "aa", 3)


def test_span_dedup_matches_pure_python(spark):
    docs = pd.read_parquet(f"{SF0001}/documents.parquet")[["doc_id", "text"]]
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    seen: set[str] = set()
    want: dict[int, tuple[int, int]] = {}
    for _, r in docs.iterrows():
        toks = r["text"].strip().lower().split()
        spans = [
            " ".join(toks[i * 8 : i * 8 + 8]) for i in range(len(toks) // 8)
        ]
        dup = 0
        for s in spans:
            if s in seen:
                dup += 1
            else:
                seen.add(s)
        want[int(r["doc_id"])] = (len(spans), dup)
    got = queries()["span_dedup_report"](spark, SF0001).toPandas()
    assert len(got) == len(docs)
    for _, r in got.iterrows():
        n, d = want[int(r["doc_id"])]
        assert (int(r["n_spans"]), int(r["n_dup_spans"])) == (n, d), (
            f"doc {r['doc_id']}: got ({r['n_spans']}, {r['n_dup_spans']}),"
            f" python reference ({n}, {d})"
        )


def test_erasure_cascade_counts(spark):
    """Erasure audit vs direct pandas recount at sf0.001."""
    cust = pd.read_parquet(f"{SF0001}/customer.parquet")
    orders = pd.read_parquet(f"{SF0001}/orders.parquet")
    li = pd.read_parquet(f"{SF0001}/lineitem.parquet")
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ck = set(cust[cust["c_custkey"] % 97 == 0]["c_custkey"])
    eo = orders[orders["o_custkey"].isin(ck)]
    row = queries()["user_erasure_cascade"](spark, SF0001).toPandas().iloc[0]
    assert int(row["n_customers_erased"]) == len(ck)
    assert int(row["n_orders_erased"]) == len(eo)
    assert int(row["n_lineitems_erased"]) == int(
        li["l_orderkey"].isin(set(eo["o_orderkey"])).sum()
    )
    assert int(row["n_events_erased"]) == int(ev["user_id"].isin(ck).sum())


def test_centroid_outlier_fraction(spark):
    """Exactly ceil(5%) of each label's vectors are flagged."""
    got = queries()["emb_centroid_outliers"](spark, SF0001).toPandas()
    import math

    for label, grp in got.groupby("label"):
        want = math.ceil(len(grp) * 0.05)
        assert int(grp["is_outlier"].sum()) == want


# --- two-phase connected components ------------------------------------------


def test_two_phase_cc_agrees_with_label_propagation(spark):
    """Both CC algorithms must produce identical components on the trade
    graph (independent algorithms, shared answer)."""
    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.operators.dedup import (
        connected_components,
        connected_components_two_phase,
    )
    from bigdata_meteo_datalake_spark.sources.lake import read_table

    o = read_table(spark, SF0001, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, SF0001, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("a"),
            (F.col("l_suppkey") + 1000000).alias("b"),
        )
        .distinct()
    )
    lp = {
        r["node"]: r["cluster_rep"]
        for r in connected_components(pairs, src_col="a", dst_col="b").collect()
    }
    tp = {
        r["node"]: r["cluster_rep"]
        for r in connected_components_two_phase(
            pairs, src_col="a", dst_col="b"
        ).collect()
    }
    assert lp == tp


def test_two_phase_cc_long_path(spark):
    """A 60-node path graph: diameter 59. Label propagation needs ~59
    rounds (more than its cap); star contraction must finish well inside
    20 and still find the single component."""
    from bigdata_meteo_datalake_spark.operators.dedup import (
        connected_components_two_phase,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(60)] + [(100, 101), (101, 102)],
        "doc_a long, doc_b long",
    )
    got = {
        r["node"]: r["cluster_rep"]
        for r in connected_components_two_phase(edges).collect()
    }
    assert all(got[i] == 0 for i in range(61))
    assert all(got[i] == 100 for i in (100, 101, 102))


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Ground truth independent of both Spark implementations: plain
    union-find, rep = component minimum."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def test_two_phase_cc_property_random_graphs(spark):
    """Round-3 verdict #8: the star-contraction CC must match union-find on
    adversarial shapes beyond the path graph — random forests, hub graphs,
    and mixed random edge sets (hypothesis, bounded n; deadline off because
    each example runs real Spark jobs)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_meteo_datalake_spark.operators.dedup import (
        connected_components_two_phase,
    )

    edge = st.tuples(
        st.integers(min_value=0, max_value=39), st.integers(min_value=0, max_value=39)
    )

    @st.composite
    def graph(draw):
        kind = draw(st.sampled_from(["random", "forest", "hub"]))
        if kind == "random":
            return draw(st.lists(edge, min_size=1, max_size=50))
        if kind == "forest":
            # random parent pointers: every node i>0 may attach to a
            # smaller-id parent — a forest of random-depth trees
            n = draw(st.integers(min_value=2, max_value=40))
            out = []
            for i in range(1, n):
                if draw(st.booleans()):
                    out.append((draw(st.integers(min_value=0, max_value=i - 1)), i))
            return out or [(0, 1)]
        # hub: a few high-degree centers plus random chords — the skew shape
        n_hubs = draw(st.integers(min_value=1, max_value=3))
        spokes = draw(st.lists(st.integers(min_value=3, max_value=39), min_size=2, max_size=30))
        out = [(h, s) for i, h in enumerate(range(n_hubs)) for s in spokes[i::n_hubs]]
        out += draw(st.lists(edge, min_size=0, max_size=8))
        return out

    @given(graph())
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
    )
    def check(edges):
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        want = _union_find_components(edges)
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r["node"]: r["cluster_rep"]
            for r in connected_components_two_phase(df).collect()
        }
        assert got == want

    check()
