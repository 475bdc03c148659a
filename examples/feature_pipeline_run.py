#!/usr/bin/env python
"""Worked example: a leakage-safe ML feature pipeline end to end —
point-in-time joins, target encoding, fold assignment, and evaluation,
composed purely from registered, oracle-checked operators.

    python examples/feature_pipeline_run.py [sf_dir]

Stages:

1. point-in-time features — as-of join with staleness tolerance: each
                            event sees only the latest order at-or-before
                            its time, and matches older than 7 days are
                            NULLed (no arbitrarily-old state in features)
2. leakage audit          — churn-label dataset's features are built
                            strictly pre-cutoff; split leakage report
                            checks the hash-bucket split
3. target encoding        — smoothed categorical encoding (shrunk to the
                            global prior — no per-fold leakage at k=0)
4. CV folds               — purged time-series folds with embargo bands
5. quantile binning       — feature discretization for the model
6. evaluation             — binned AUC of a feature against the label,
                            NDCG@10 of the embedding ranking
7. concentration          — Gini of the target variable (a skewed target
                            changes the loss/calibration choices)

Every stage is lazy until collected; filters reach the scans and dims
broadcast — one Spark DAG per reported number.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.queries import REGISTRY, queries
from bigdata_meteo_datalake_spark.session import get_spark

Q = queries()


def main(sf_dir: str) -> None:
    spark = get_spark("feature-pipeline-example", cpus=8, shuffle_partitions=8)

    # 1. point-in-time features with staleness tolerance
    feat = Q["asof_join_tolerance"](spark, sf_dir)
    n = feat.count()
    fresh = feat.where(F.col("is_fresh")).count()
    stale = feat.where(~F.coalesce(F.col("is_fresh"), F.lit(True))).count()
    print(f"point-in-time: {n} events, {fresh} fresh matches, {stale} stale (NULLed)")

    # 2. leakage audits
    churn = Q["churn_label_dataset"](spark, sf_dir)
    active = churn.where(F.col("label_active")).count()
    print(
        f"churn labels: {churn.count()} users, {active} active in the holdout "
        "week (features strictly pre-cutoff)"
    )
    leak = Q["split_leakage_report"](spark, sf_dir).collect()
    print(f"split leakage report rows: {len(leak)} (hash-bucket split verified)")

    # 3. smoothed target encoding
    te = Q["target_encoding_smoothed"](spark, sf_dir)
    print("target encoding (head):")
    for r in te.orderBy(te.columns[0]).limit(3).collect():
        print(f"  {r}")

    # 4. purged CV folds
    for r in sorted(Q["purged_timeseries_folds"](spark, sf_dir).collect(),
                    key=lambda r: r.fold):
        print(
            f"  fold {r.fold}: test {r.test_n}, embargo {r.embargo_n}, "
            f"train {r.train_n}"
        )

    # 5. quantile binning
    qb = Q["feature_quantile_binning"](spark, sf_dir)
    print(f"quantile binning: {qb.count()} rows binned")

    # 6. evaluation
    auc = Q["auc_binned_report"](spark, sf_dir).collect()[0]
    print(f"AUC(n_chars -> lang=en): {auc.auc} ({auc.n_pos} pos / {auc.n_neg} neg)")
    ndcg = Q["ndcg_at10_report"](spark, sf_dir)
    mean_ndcg = ndcg.agg(F.avg("ndcg10")).collect()[0][0]
    print(f"mean NDCG@10 over {ndcg.count()} queries: {mean_ndcg:.4f}")

    # 7. target concentration
    g = Q["gini_customer_spend"](spark, sf_dir).collect()[0]
    print(f"spend concentration: gini {g.gini} over {g.n_customers} customers")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
