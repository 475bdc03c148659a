"""Semantic edge checks for session-3 operators — properties the oracle
hash can't state directly (zero-count preservation, survivor optimality,
salt-invariance, trainer invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.queries import queries
from bigdata_meteo_datalake_spark.sources.lake import read_table

from .conftest import SF0001

QS = queries()


def test_q13_keeps_zero_order_customers(spark):
    """The left join's filter lives in the JOIN condition: customers with
    zero qualifying orders must appear in the c_count=0 bucket, not vanish
    (a WHERE would drop them — the classic Q13 trap)."""
    out = {r["c_count"]: r["custdist"] for r in QS["q13_customer_distribution"](spark, SF0001).collect()}
    c = read_table(spark, SF0001, "customer")
    o = read_table(spark, SF0001, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    n_zero = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").count()
    )
    if n_zero:
        assert out.get(0) == n_zero
    assert sum(out.values()) == c.count()


def test_q4_excludes_orders_without_late_lines(spark):
    """Semi-join semantics: the priority counts must total exactly the
    orders having >=1 late line, each counted once regardless of how many
    lines were late."""
    o = read_table(spark, SF0001, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = read_table(spark, SF0001, "lineitem")
    late_orders = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .select("l_orderkey")
        .distinct()
        .count()
    )
    total = (
        QS["q4_priority_check"](spark, SF0001)
        .agg(F.sum("order_count"))
        .collect()[0][0]
    )
    assert total == late_orders
    assert total < o.count()  # some in-window orders had no late line


def test_survivor_by_quality_beats_cluster_peers(spark):
    """Each kept clustered doc must carry the maximum quality score of its
    cluster (tie -> lowest doc_id), and the survivor COUNT equals the
    min-id policy's (same clusters, different representative)."""
    from bigdata_meteo_datalake_spark.operators.dedup import connected_components
    from bigdata_meteo_datalake_spark.queries.ext_dedup import dedup_ngram_jaccard
    from bigdata_meteo_datalake_spark.queries.ext_text import text_quality_score

    out = QS["dedup_survivors_by_quality"](spark, SF0001)
    assert out.count() == QS["dedup_survivors"](spark, SF0001).count()

    pairs = dedup_ngram_jaccard(spark, SF0001).select("doc_a", "doc_b")
    members = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_rep"
    )
    quality = text_quality_score(spark, SF0001).select("doc_id", "quality_score")
    best = (
        members.join(quality, "doc_id")
        .groupBy("cluster_rep")
        .agg(F.max("quality_score").alias("best_q"))
    )
    kept_clustered = out.where(F.col("was_clustered")).join(members, "doc_id")
    mismatched = (
        kept_clustered.join(best, "cluster_rep")
        .where(F.col("quality_score") != F.col("best_q"))
        .count()
    )
    assert mismatched == 0


def test_salted_equals_plain_groupby(spark):
    """Salt-invariance: the two-phase salted aggregate must be value-equal
    to the plain single-phase groupBy."""
    ev = read_table(spark, SF0001, "events")
    plain = {
        r["event_type"]: (r["n"], float(r["s"]))
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    salted = {
        r["event_type"]: (r["n_rows"], float(r["sum_value"]))
        for r in QS["salted_user_event_stats"](spark, SF0001).collect()
    }
    assert salted == plain


def test_kmeans_partitions_the_corpus(spark):
    """Trainer invariants: cells partition the corpus (member counts sum to
    the vector count), every centroid has all 64 dims, and components lie
    on the 1e-9 quantization grid."""
    out = QS["kmeans_ivf_train"](spark, SF0001)
    cells = out.select("cent_id", "n_members").distinct()
    n_vecs = read_table(spark, SF0001, "embeddings").count()
    assert cells.agg(F.sum("n_members")).collect()[0][0] == n_vecs
    dims_per_cell = out.groupBy("cent_id").count().select("count").distinct().collect()
    assert [r["count"] for r in dims_per_cell] == [64]
    off_grid = out.where(
        F.abs(F.col("comp") * 1_000_000_000 - F.round(F.col("comp") * 1_000_000_000))
        > 1e-6
    ).count()
    assert off_grid == 0


def test_unpivot_preserves_totals_and_zero_cells(spark):
    """The melt must conserve the event total and materialize explicit
    zero cells for absent (day, type) pairs."""
    out = QS["unpivot_event_counts"](spark, SF0001)
    ev = read_table(spark, SF0001, "events")
    assert out.agg(F.sum("n")).collect()[0][0] == ev.count()
    n_days = ev.select(F.col("ts").cast("date")).distinct().count()
    assert out.count() == n_days * 5
    assert out.where(F.col("n") == 0).count() > 0 or out.count() == ev.select(
        F.col("ts").cast("date"), "event_type"
    ).distinct().count()
