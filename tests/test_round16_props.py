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
