"""Round-17 optimization-equivalence properties.

Every round-17 optimization is a build-time-levered rewrite of an
operator's internals with a proof obligation that the OUTPUT is
bit-identical; these tests pin that obligation row-for-row on adversarial
inputs (whitespace runs, empty docs, unicode, null text), independent of
the DuckDB oracle gate.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


_TEXTS = st.lists(
    st.one_of(
        st.none(),
        st.text(
            alphabet=st.sampled_from(list("ab \t\n\r\fxyz0")),
            min_size=0,
            max_size=60,
        ),
        st.text(min_size=0, max_size=30),  # arbitrary unicode
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(texts=_TEXTS)
def test_simhash_packed_equals_perbit(spark, texts):
    """The lane-packed SimHash bit counter (16 folds, 32-bit lanes) is
    row-identical to the 32 per-bit folds on arbitrary text — the
    2*count > n readout is the same sign test as the +/-1 sum."""
    import os

    from bigdata_meteo_datalake_spark.operators import dedup as D

    df = _docs_df(spark, texts)
    prev = os.environ.get("SPARK_GRAFT_SIMHASH_PACKED")
    try:
        os.environ["SPARK_GRAFT_SIMHASH_PACKED"] = "0"
        legacy = {r.doc_id: r.simhash for r in D.simhash(df).collect()}
        os.environ["SPARK_GRAFT_SIMHASH_PACKED"] = "1"
        packed = {r.doc_id: r.simhash for r in D.simhash(df).collect()}
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_SIMHASH_PACKED", None)
        else:
            os.environ["SPARK_GRAFT_SIMHASH_PACKED"] = prev
    assert packed == legacy


def test_simhash_packed_equals_perbit_on_long_docs(spark, monkeypatch):
    """The packed counter has NO length guard (32-bit lanes are exact up
    to Spark's array-size cap); pin equality on documents with thousands
    of distinct tokens, where per-bit counts stress many lanes at once."""
    from bigdata_meteo_datalake_spark.operators import dedup as D

    import random

    rng = random.Random(17)
    texts = [
        " ".join(f"tok{rng.randrange(100000)}" for _ in range(4000)),
        " ".join(f"w{i}" for i in range(2500)),
    ]
    df = _docs_df(spark, texts)
    monkeypatch.setenv("SPARK_GRAFT_SIMHASH_PACKED", "0")
    legacy = {r.doc_id: r.simhash for r in D.simhash(df).collect()}
    monkeypatch.setenv("SPARK_GRAFT_SIMHASH_PACKED", "1")
    packed = {r.doc_id: r.simhash for r in D.simhash(df).collect()}
    assert packed == legacy


@settings(max_examples=8, deadline=None)
@given(texts=_TEXTS)
def test_shingle_arrow_kernel_equals_jvm_sets(spark, texts):
    """The mapInArrow shingle-hash kernel returns EXACTLY the JVM
    expression form's rows: same surviving doc_ids, same hashed shingle
    set, same first-occurrence element order — trim/split/lower/md5/mod
    semantics pinned one by one."""
    import os

    from bigdata_meteo_datalake_spark.operators import dedup as D

    df = _docs_df(spark, texts)
    prev = os.environ.get("SPARK_GRAFT_SHINGLE_ARROW")
    try:
        os.environ["SPARK_GRAFT_SHINGLE_ARROW"] = "0"
        jvm = {r.doc_id: r.xs for r in D.doc_shingle_hash_sets(df).collect()}
        os.environ["SPARK_GRAFT_SHINGLE_ARROW"] = "1"
        arrow = {r.doc_id: r.xs for r in D.doc_shingle_hash_sets(df).collect()}
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_SHINGLE_ARROW", None)
        else:
            os.environ["SPARK_GRAFT_SHINGLE_ARROW"] = prev
    assert arrow == jvm


def test_cc_midcut_lazy_equals_eager(spark, monkeypatch):
    """connected_components_two_phase output is independent of whether
    the per-round large-star edge set is checkpointed eagerly (its own
    job) or lazily (materialized by the small-star checkpoint's job)."""
    import random

    from bigdata_meteo_datalake_spark.operators.dedup import (
        connected_components_two_phase,
    )

    rng = random.Random(1717)
    edges = [
        (rng.randrange(0, 40), rng.randrange(0, 40)) for _ in range(60)
    ] + [(100, 101), (101, 102), (102, 103)]  # a path component
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")

    monkeypatch.setenv("SPARK_GRAFT_CC_MIDCUT_LAZY", "0")
    eager = sorted(map(tuple, connected_components_two_phase(df).collect()))
    monkeypatch.setenv("SPARK_GRAFT_CC_MIDCUT_LAZY", "1")
    lazy = sorted(map(tuple, connected_components_two_phase(df).collect()))
    assert eager == lazy


@settings(max_examples=8, deadline=None)
@given(texts=_TEXTS)
def test_span_arrow_kernel_equals_jvm_tiles(spark, texts):
    """The mapInArrow span-fingerprint kernel emits EXACTLY the JVM tile
    pipeline's rows: same (doc_id, span_idx, h) multiset — md5 hex per
    8-token non-overlapping tile, 0-based tile order, short/null docs
    absent."""
    import os

    from bigdata_meteo_datalake_spark.queries import ext_corpus as C

    df = _docs_df(spark, texts)
    # the JVM form, built verbatim (the query's lever-off branch)
    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.sources.lake import widen

    tokd = widen(df.select("doc_id", "text")).select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+").alias("t"),
    )
    toks = F.col("t")
    nsp = F.floor(F.size(toks) / F.lit(8)).cast("int")
    spans = F.when(
        nsp >= 1,
        F.transform(
            F.sequence(F.lit(1), nsp),
            lambda i: F.md5(
                F.concat_ws(" ", F.slice(toks, (i - 1) * 8 + 1, 8))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    jvm = sorted(
        map(
            tuple,
            tokd.select("doc_id", spans.alias("hs"))
            .select("doc_id", F.posexplode("hs").alias("span_idx", "h"))
            .collect(),
        )
    )
    arrow = sorted(
        map(tuple, C._doc_span_hashes_arrow(df, 8).collect())
    )
    assert arrow == jvm


@settings(max_examples=8, deadline=None)
@given(texts=_TEXTS)
def test_ngram_arrow_streams_equal_jvm(spark, texts):
    """The Arrow dsir-feature and n-gram-hash stream kernels emit exactly
    the JVM expression forms' row multisets (filtered tokenizer, unigram+
    bigram bucket hashes with the is_target echo, 5-gram 60-bit hashes)."""
    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.operators.dedup import token_hash
    from bigdata_meteo_datalake_spark.queries import ext_selection as S

    df = spark.createDataFrame(
        [(i, f"src{i % 3}", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    # dsir feature stream, JVM form verbatim
    toks = S._toks()
    uni = F.transform(F.col("toks"), lambda x: token_hash(x) % S._DSIR_DIM)
    bi = F.when(
        F.size("toks") > 1,
        F.zip_with(
            F.slice(F.col("toks"), 1, F.size("toks") - 1),
            F.slice(F.col("toks"), 2, F.size("toks") - 1),
            lambda a, b: token_hash(F.concat(a, F.lit(" "), b)) % S._DSIR_DIM,
        ),
    ).otherwise(F.array().cast("array<long>"))
    jvm_feats = sorted(
        map(
            tuple,
            df.select(
                "doc_id",
                (F.col("source") == S._DSIR_TARGET_SOURCE).alias("is_target"),
                toks.alias("toks"),
            )
            .select("doc_id", "is_target", F.explode(F.concat(uni, bi)).alias("fb"))
            .collect(),
        )
    )
    arrow_feats = sorted(map(tuple, S._dsir_feats_arrow(df).collect()))
    assert arrow_feats == jvm_feats

    # 5-gram hash stream, JVM form verbatim
    grams = F.when(
        F.size("toks") >= S._BP_N,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (S._BP_N - 1)),
            lambda i: token_hash(
                F.concat_ws(" ", F.slice(F.col("toks"), i, S._BP_N))
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    jvm_g = sorted(
        map(
            tuple,
            df.select("doc_id", toks.alias("toks"))
            .select("doc_id", F.explode(grams).alias("gh"))
            .collect(),
        )
    )
    arrow_g = sorted(
        map(tuple, S._gram_hash_stream_arrow(df, S._BP_N).collect())
    )
    assert arrow_g == jvm_g


@settings(max_examples=8, deadline=None)
@given(texts=_TEXTS)
def test_bm25_per_doc_arrow_equals_jvm(spark, texts):
    """The Arrow per-doc BM25 token-stats kernel returns exactly the JVM
    rows: one row per document INCLUDING null text (null dl/tf), dl over
    the unfiltered split (empty tokens kept), exact term counts."""
    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.queries import ext_search as S

    df = _docs_df(spark, texts)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")

    def _tf(term):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    jvm = sorted(
        map(
            tuple,
            df.select(
                "doc_id",
                F.size(toks).cast("long").alias("dl"),
                *[
                    _tf(t).cast("long").alias(f"tf{i}")
                    for i, t in enumerate(S._Q_TERMS)
                ],
            ).collect(),
        )
    )
    arrow = sorted(map(tuple, S._bm25_per_doc_arrow(df).collect()))
    assert arrow == jvm


def test_hot_bucket_guard_agg_equals_window(spark, monkeypatch):
    """The aggregate+broadcast-anti-join hot-bucket guard keeps exactly
    the window guard's rows, including a null key group (eqNullSafe)
    and a group exactly at the limit."""
    import os

    from bigdata_meteo_datalake_spark.queries import ext_similarity as S

    rows = (
        [(i, "hot") for i in range(80)]          # over the limit -> dropped
        + [(100 + i, "warm") for i in range(64)]  # exactly at the limit -> kept
        + [(200 + i, "cool") for i in range(3)]
        + [(300 + i, None) for i in range(70)]    # null group over limit
    )
    df = spark.createDataFrame(rows, "vec_id long, bucket string")
    monkeypatch.setitem(os.environ, "SPARK_GRAFT_LSH_GUARD_AGG", "0")
    win = sorted(map(tuple, S._drop_hot_buckets(df, "bucket", 64).collect()))
    monkeypatch.setitem(os.environ, "SPARK_GRAFT_LSH_GUARD_AGG", "1")
    agg = sorted(map(tuple, S._drop_hot_buckets(df, "bucket", 64).collect()))
    assert agg == win
    kept = {b for _, b in win}
    assert kept == {"warm", "cool"}  # hot and the null group dropped


def test_ivf_assign_agg_equals_window_query_level(spark, monkeypatch):
    """semantic_dedup_ivf under the min(struct) assignment lever returns
    exactly the window-assignment rows on the real sf0.001 corpus (the
    full query, so the guard + pair + CC pipeline all see the same
    assignment)."""
    import os

    from bigdata_meteo_datalake_spark.queries import ext_similarity as S

    from .conftest import SF0001

    monkeypatch.setitem(os.environ, "SPARK_GRAFT_IVF_ASSIGN_AGG", "0")
    win = sorted(map(tuple, S.semantic_dedup_ivf(spark, SF0001).collect()))
    monkeypatch.setitem(os.environ, "SPARK_GRAFT_IVF_ASSIGN_AGG", "1")
    agg = sorted(map(tuple, S.semantic_dedup_ivf(spark, SF0001).collect()))
    assert agg == win
    assert len(win) > 0


def test_semantic_dedup_lsh_guard_lever_query_level(spark, monkeypatch):
    """semantic_dedup_lsh under the aggregate guard returns exactly the
    window-guard rows on the real sf0.001 corpus."""
    import os

    from bigdata_meteo_datalake_spark.queries import ext_similarity as S

    from .conftest import SF0001

    monkeypatch.setitem(os.environ, "SPARK_GRAFT_LSH_GUARD_AGG", "0")
    win = sorted(map(tuple, S.semantic_dedup_lsh(spark, SF0001).collect()))
    monkeypatch.setitem(os.environ, "SPARK_GRAFT_LSH_GUARD_AGG", "1")
    agg = sorted(map(tuple, S.semantic_dedup_lsh(spark, SF0001).collect()))
    assert agg == win
    assert len(win) > 0
