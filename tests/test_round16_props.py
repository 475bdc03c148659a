"""Round-16 properties: r15 advice items (dictionary-index empty
0-bit payload, estate-audit temp-dir lifecycle) and verdict items
(sweep staleness ceiling — pinned in test_round13_props/
test_sweep_rotation — PPJoin+ positional filter, CC frontier
shrinking)."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF_MID = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


# --- dictionary-index stream: empty 0-bit payload (r15 advice item 2) --------------------


def _rle_header(run: int) -> bytes:
    h = run << 1
    out = bytearray()
    while True:
        b = h & 0x7F
        h >>= 7
        if h:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_dict_index_stream_accepts_bare_width0_byte():
    """A conformant writer may emit JUST the width byte for a 0-bit
    page (zero-bit indices need no run headers); the decoder accepts
    it as [0]*present — against single- AND multi-entry dictionaries —
    while parquet-mr-shaped explicit run headers still validate."""
    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        dict_index_stream,
    )

    for n_dict in (1, 2, 100):
        assert dict_index_stream(b"\x00", 500, n_dict) == [0] * 500
        assert dict_index_stream(b"\x00", 0, n_dict) == []
    # explicit headers (the parquet-mr/pyarrow shape) still decode
    assert dict_index_stream(b"\x00" + _rle_header(500), 500, 2) == [0] * 500


def test_dict_index_stream_still_validates_nonempty_width0():
    """Non-empty 0-bit payloads keep full hybrid validation: an
    under-covering run set, a zero-length run, or an endless varint
    raise — the empty-payload relax must not weaken them. The empty
    page and empty-dictionary guards also hold."""
    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        dict_index_stream,
    )

    with pytest.raises(ValueError):
        dict_index_stream(b"\x00" + _rle_header(100), 500, 2)
    with pytest.raises(ValueError):
        dict_index_stream(b"\x00" + _rle_header(0), 1, 2)
    with pytest.raises(ValueError):
        dict_index_stream(b"\x00" + b"\x80" * 6, 1, 2)
    with pytest.raises(ValueError):
        dict_index_stream(b"", 1, 2)  # empty page, not empty payload
    with pytest.raises(ValueError):
        dict_index_stream(b"\x00", 1, 0)  # empty dictionary
    with pytest.raises(ValueError):
        dict_index_stream(b"\x21", 1, 2)  # width 33 out of range


@settings(max_examples=200, deadline=None)
@given(payload=st.binary(min_size=0, max_size=16),
       present=st.integers(min_value=0, max_value=300))
def test_dict_index_stream_never_crashes(payload, present):
    """Garbage payloads decode or raise ValueError, never crash; the
    numpy and pure interiors agree."""
    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        dict_index_stream,
    )

    outs = []
    for use_np in (True, False):
        try:
            outs.append(("ok", dict_index_stream(b"\x00" + payload, present,
                                                 3, use_np)))
        except ValueError:
            outs.append(("err",))
    assert outs[0] == outs[1]


def test_pyarrow_dict_files_still_decode_through_helper(tmp_path):
    """End-to-end: the refactored decode path (decode_values ->
    dict_index_stream) still reads real pyarrow dictionary files —
    constant (bw=0 with explicit headers) and multi-value."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        decode_parquet_column,
    )

    p = str(tmp_path / "const.parquet")
    pq.write_table(pa.table({"x": pa.array([9] * 300)}), p)
    assert decode_parquet_column(open(p, "rb").read(), "x")["values"] == [9] * 300

    p2 = str(tmp_path / "multi.parquet")
    vals = [i % 7 for i in range(300)]
    pq.write_table(pa.table({"x": pa.array(vals)}), p2)
    assert decode_parquet_column(open(p2, "rb").read(), "x")["values"] == vals


# --- estate audit temp-dir lifecycle (r15 advice item 1) ----------------------------------


def test_estate_audit_records_and_cleans_temp_dirs(spark):
    """run_estate_audit records each audit's mkdtemp shard-copy base on
    the run; the reports stay collectable while the dirs live, and
    cleanup() removes them so a continuous-audit scheduler does not
    accumulate unbounded /tmp disk."""
    from bigdata_meteo_datalake_spark.plans.pipeline import run_estate_audit

    res = run_estate_audit(
        spark, SF_MID, "2026-08-16", audits=("parquet_pageindex",)
    )
    assert set(res.temp_dirs) == {"parquet_pageindex"}
    base = res.temp_dirs["parquet_pageindex"]
    assert os.path.isdir(base)
    # lazy report still evaluates while the shard copies live
    assert res.reports["parquet_pageindex"].count() > 0
    res.cleanup()
    assert not os.path.exists(base)
    assert res.temp_dirs == {}
    res.cleanup()  # idempotent


# --- PPJoin+ grouped positional filter (r15 verdict item 3) -------------------------------


def test_grouped_positional_filter_prunes_spread_pairs(spark):
    """The pair-level bound c + min(na - pa_last, nb - pb_last) kills a
    candidate the old per-element filter (1 + min-tail at the FIRST
    shared element) could not: two shared prefix elements at positions
    1 and 5 of two 10-element sets give first-element bound 10 >= 8 but
    grouped bound 2 + min(5, 5) = 7 < 8. True Jaccard is 2/18 << 0.6,
    so pruning is sound — and the candidate list shrinks before the
    exact verify, which is the whole point."""
    from bigdata_meteo_datalake_spark.operators.dedup import (
        prefix_filter_candidates,
    )

    rows = [
        (1, [10, 30, 31, 32, 50, 100, 101, 102, 103, 104]),
        (2, [10, 40, 41, 42, 50, 200, 201, 202, 203, 204]),
        # fillers give every element df = 2, so rarest-first order
        # reduces to plain x order and both shared elements land at
        # positions 1 and 5 of both prefixes (prefix_len = 5)
        (3, [30, 31, 32]),
        (4, [40, 41, 42]),
        (5, [100, 101, 102, 103, 104]),
        (6, [200, 201, 202, 203, 204]),
    ]
    sets = spark.createDataFrame(rows, "doc_id long, xs array<long>")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filter_candidates(sets, t_num=3, t_den=5).collect()
    }
    assert (1, 2) not in got


def test_grouped_positional_filter_complete_on_random_corpus(spark):
    """Completeness under the full pruning stack: on a seeded random
    corpus, every pair with true Jaccard >= 0.6 appears among the
    prefix-filter candidates (the filters may only drop provably
    sub-threshold pairs)."""
    import random

    from bigdata_meteo_datalake_spark.operators.dedup import (
        prefix_filter_candidates,
    )

    rng = random.Random(1606)
    docs = []
    for i in range(40):
        base = rng.sample(range(1000), rng.randint(4, 30))
        docs.append((i, sorted(set(base))))
        if rng.random() < 0.5:
            # planted near-dup: mutate a few elements
            mut = set(base)
            for _ in range(rng.randint(0, 3)):
                if mut and rng.random() < 0.7:
                    mut.discard(next(iter(mut)))
                mut.add(rng.randrange(1000))
            docs.append((100 + i, sorted(mut)))
    true_pairs = set()
    for ia, xa in docs:
        for ib, xb in docs:
            if ia >= ib:
                continue
            sa, sb = set(xa), set(xb)
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.6:
                true_pairs.add((ia, ib))
    assert true_pairs, "seed must plant at least one true pair"
    sets = spark.createDataFrame(
        [(i, [int(v) for v in xs]) for i, xs in docs],
        "doc_id long, xs array<long>",
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filter_candidates(sets, t_num=3, t_den=5).collect()
    }
    missing = true_pairs - got
    assert not missing, f"pruned true pairs: {sorted(missing)}"


# --- multi-day pipeline soak with audit rotation (r15 verdict item 5) ---------------------


def test_multiday_pipeline_soak_with_audit_rotation(spark, tmp_path_factory):
    """Ten consecutive logical dates through the daily pipeline in ONE
    session (r15 verdict item 5): every tick passes its quality gate,
    re-runs are idempotent (spot-checked on three days), and the
    continuous estate audit — epoch derived from the run date — rotates
    its sampled coverage (at sf0.01 — sf0.001 tables mostly fit in one
    shard, which cannot rotate) (per-day picks accumulate across days, each
    day oracle-green) while cleanup() keeps /tmp flat."""
    from datetime import date, timedelta

    from bigdata_meteo_datalake_spark.oracle import (
        compare_frames,
        duckdb_connect,
    )
    from bigdata_meteo_datalake_spark.plans import pipeline
    from bigdata_meteo_datalake_spark.plans.pipeline import (
        _ESTATE_AUDITS,
        run_estate_audit,
    )
    from bigdata_meteo_datalake_spark.sources.rest import ingest_omdb, ingest_tmdb

    lake = str(tmp_path_factory.mktemp("soak_lake"))
    d0 = date(2026, 3, 1)
    days = [(d0 + timedelta(days=i)).isoformat() for i in range(10)]

    def day_data(i):
        base = 1000 + 10 * i
        popular = [
            {"id": base + k, "title": f"Soak {i}-{k}",
             "release_date": (d0 + timedelta(days=i)).isoformat(),
             "popularity": 20.0 + 7 * k, "vote_average": 5.0 + 0.5 * k,
             "vote_count": 50 + 10 * k, "original_language": "en",
             "genre_ids": [18]}
            for k in range(3)
        ]
        details = {
            m["id"]: {"id": m["id"], "imdb_id": f"tt{m['id']}",
                      "title": m["title"], "release_date": m["release_date"],
                      "runtime": "100", "status": "Released",
                      "original_language": "en",
                      "genres": [{"id": 18, "name": "Drama"}],
                      "production_countries": []}
            for m in popular
        }
        omdb = {
            f"tt{m['id']}": {"Title": m["title"], "Year": "2026", "Rated": "PG",
                             "Type": "movie", "Country": "US", "Genre": "Drama",
                             "Director": "D", "Actors": "A, B",
                             "imdbRating": "7.0", "imdbVotes": "1,000",
                             "Metascore": "60", "Ratings": [],
                             "Response": "True"}
            for m in popular
        }
        return popular, details, omdb

    def enriched_snapshot(day):
        df = spark.read.parquet(f"{lake}/usage/movies_enriched_daily").where(
            F.col("snapshot_date") == day
        )
        return sorted(map(str, df.collect()))

    picks_by_day = []
    for i, day in enumerate(days):
        popular, details, omdb = day_data(i)
        ingest_tmdb(
            lambda ep, params, popular=popular, details=details: (
                {"page": 1, "results": popular}
                if ep == "movie/popular" else details[int(ep.split("/")[1])]
            ),
            lake, snapshot_date=day, run_id=f"soak{i}",
            extracted_at_utc=f"{day}T19:00:00+00:00",
        )
        ingest_omdb(
            lambda ep, params, omdb=omdb: omdb[params["i"]],
            lake, sorted(omdb), snapshot_date=day, run_id=f"soak{i}",
            extracted_at_utc=f"{day}T19:00:01+00:00",
        )
        # quality gate enforced: a violation raises and fails the soak
        res = pipeline.run(spark, lake, day, run_id=f"soak{i}", retry=None)
        rep = res.quality_report.collect()
        assert rep and all(r["n_violations"] == 0 for r in rep), (
            f"quality gate, {day}"
        )

        if i in (0, 4, 9):  # idempotent re-run spot checks
            before = enriched_snapshot(day)
            pipeline.run(spark, lake, day, run_id=f"soak{i}-rerun", retry=None)
            assert enriched_snapshot(day) == before, f"re-run changed {day}"

        # continuous estate audit, family rotating with the day
        fam = _ESTATE_AUDITS[i % len(_ESTATE_AUDITS)]
        audit = run_estate_audit(spark, SF_MID, day, audits=(fam,))
        rep_df = audit.reports[fam].toPandas()
        con = duckdb_connect(SF_MID)
        try:
            compare_frames(rep_df, con.execute(audit.oracles[fam]).df())
        finally:
            con.close()
        picks_by_day.append({fam: set(zip(rep_df["tbl"], rep_df["shard"]))})
        tmp = dict(audit.temp_dirs)
        audit.cleanup()
        assert all(not os.path.exists(p) for p in tmp.values())

    # rotation accumulates coverage: within each audit family, the union
    # of (table, shard) picks across its days exceeds any single day's
    for fam in _ESTATE_AUDITS:
        daily = [p[fam] for p in picks_by_day if fam in p]
        if len(daily) >= 2:
            union = set().union(*daily)
            assert len(union) > max(len(d) for d in daily), (
                f"audit family {fam} never rotated its sampled coverage"
            )


# --- CC frontier shrinking (r15 verdict item 4) -------------------------------------------


def test_cc_frontier_output_exactly_equals_unfrontiered(spark):
    """Leaf retirement must not change a single output row: across the
    adversarial topologies (pair, path, star, cycle, random, many tiny
    components — the near-dup shape), frontier=True and frontier=False
    return identical (node, cluster_rep) sets, and the frontier run
    actually retires nodes where the shape allows it."""
    import random

    from bigdata_meteo_datalake_spark.operators.dedup import (
        connected_components_two_phase,
    )

    rng = random.Random(16)
    shapes = {
        "pair": [(1, 2)],
        "path": [(i, i + 1) for i in range(40)],
        "star": [(0, i) for i in range(1, 25)],
        "cycle": [(i, (i + 1) % 30) for i in range(30)],
        "random": [
            (a, b)
            for a, b in ((rng.randrange(300), rng.randrange(300))
                         for _ in range(250))
            if a != b
        ],
        "many_triples": [
            e for c in range(60)
            for e in ((1000 * c, 1000 * c + 1), (1000 * c + 1, 1000 * c + 2))
        ],
    }
    any_retired = False
    for name, edges in shapes.items():
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        stats = {}
        plain = sorted(
            map(tuple, connected_components_two_phase(df, frontier=False).collect())
        )
        # thresholds forced to zero so retirement engages on these tiny
        # graphs (the production defaults gate it to >= 1M-edge graphs)
        shrunk = sorted(
            map(tuple,
                connected_components_two_phase(
                    df, frontier=True, frontier_min_edges=0,
                    frontier_min_retire_frac=0.0, stats=stats,
                ).collect())
        )
        assert plain == shrunk, name
        any_retired = any_retired or any(stats.get("retired_per_round", []))
    assert any_retired, "frontier never retired a node on any shape"


def test_cc_frontier_default_thresholds_stay_inert_on_small_graphs(spark):
    """With the production thresholds, a small graph never pays the
    pruning anti-joins (retired_per_round stays absent/zero) and the
    result still matches — the sf0.1 bench path is byte-identical to
    the pre-frontier operator."""
    from bigdata_meteo_datalake_spark.operators.dedup import (
        connected_components_two_phase,
    )

    edges = [(i, i + 1) for i in range(100)] + [(5000, 5001)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    stats = {}
    out = sorted(
        map(tuple,
            connected_components_two_phase(df, stats=stats).collect())
    )
    assert not any(stats.get("retired_per_round", []))
    plain = sorted(
        map(tuple, connected_components_two_phase(df, frontier=False).collect())
    )
    assert out == plain


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_cc_frontier_equality_rotating_random_graphs(spark, data):
    """Rotating-seed soak (fresh graphs every suite run): on arbitrary
    small random multigraph edge lists — duplicates and both
    orientations included, exactly what upstream pair generators emit —
    forced-threshold frontier retirement returns byte-identical
    components to the plain operator."""
    from bigdata_meteo_datalake_spark.operators.dedup import (
        connected_components_two_phase,
    )

    n_nodes = data.draw(st.integers(min_value=2, max_value=40))
    edges = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n_nodes - 1),
                st.integers(min_value=0, max_value=n_nodes - 1),
            ).filter(lambda e: e[0] != e[1]),
            min_size=1,
            max_size=60,
        )
    )
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    plain = sorted(
        map(tuple, connected_components_two_phase(df, frontier=False).collect())
    )
    shrunk = sorted(
        map(tuple,
            connected_components_two_phase(
                df, frontier=True, frontier_min_edges=0,
                frontier_min_retire_frac=0.0,
            ).collect())
    )
    assert plain == shrunk


# --- unrolled vector kernels == general fold (r16 optimization §1) ------------------------


@settings(max_examples=12, deadline=None)
@given(data=st.data())
def test_vec_unrolled_kernels_equal_fold(spark, data):
    """functions.vec unrolled kernels are bit-identical to the general
    fold on ANY array shape — exact dim (unrolled path), shorter/longer
    arrays and null elements (guard fallback path). Doubles compared by
    exact bit pattern, not approximately: the unroll preserves the
    fold's left-to-right association order."""
    from bigdata_meteo_datalake_spark.functions import vec

    # the kernels read the env at expression build time: a leftover
    # SPARK_GRAFT_VEC_UNROLL=0 (e.g. from an A/B run) would silently turn
    # this into fold-vs-fold, testing nothing (r16 advice)
    import os as _os
    _os.environ["SPARK_GRAFT_VEC_UNROLL"] = "1"
    assert vec._unroll_enabled()

    dim = data.draw(st.sampled_from([1, 4, 7, 64]))
    elem = st.one_of(
        st.none(),
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False),
    )
    rows = data.draw(
        st.lists(
            st.tuples(
                st.lists(elem, min_size=0, max_size=dim + 2),
                st.lists(elem, min_size=0, max_size=dim + 2),
            ),
            min_size=1,
            max_size=12,
        )
    )
    df = spark.createDataFrame(
        rows, "a array<double>, b array<double>"
    )
    out = df.select(
        F.col("a").cast("string").alias("ka"),
        F.col("b").cast("string").alias("kb"),
        vec.dot(F.col("a"), F.col("b"), dim=dim).alias("u_dot"),
        vec.fold_dot(F.col("a"), F.col("b")).alias("f_dot"),
        vec.sum_sq(F.col("a"), dim=dim).alias("u_ss"),
        vec.fold_sum_sq(F.col("a")).alias("f_ss"),
        vec.sqdist(F.col("a"), F.col("b"), dim=dim).alias("u_sq"),
        vec.fold_sqdist(F.col("a"), F.col("b")).alias("f_sq"),
    ).collect()
    import struct

    def bits(x):
        return None if x is None else struct.pack("<d", x)

    for r in out:
        assert bits(r.u_dot) == bits(r.f_dot), (dim, r.ka, r.kb, "dot")
        assert bits(r.u_ss) == bits(r.f_ss), (dim, r.ka, "sum_sq")
        assert bits(r.u_sq) == bits(r.f_sq), (dim, r.ka, r.kb, "sqdist")

    ints = st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000))
    irows = data.draw(
        st.lists(
            st.tuples(
                st.lists(ints, min_size=0, max_size=dim + 2),
                st.lists(ints, min_size=0, max_size=dim + 2),
            ),
            min_size=1,
            max_size=8,
        )
    )
    idf = spark.createDataFrame(irows, "a array<long>, b array<long>")
    iout = idf.select(
        vec.dot_long(F.col("a"), F.col("b"), dim=dim).alias("u_dot"),
        # fold_dot_long, not fold_dot: the double-zero fold accumulates in
        # double and is exact here only because test values are small —
        # a long-zero fold compares exact integers at any magnitude
        # (r16 advice)
        vec.fold_dot_long(F.col("a"), F.col("b")).alias("f_dot"),
        vec.sqdist_long(F.col("a"), F.col("b"), dim=dim).alias("u_sq"),
        vec.fold_sqdist_long(F.col("a"), F.col("b")).alias("f_sq"),
    ).collect()
    for r in iout:
        assert r.u_dot == r.f_dot
        assert r.u_sq == r.f_sq
