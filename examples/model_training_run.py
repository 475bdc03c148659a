#!/usr/bin/env python
"""Worked example: distributed model training and evaluation primitives
end to end — the "train a model ON the engine" workflow, composed purely
from registered, oracle-checked operators.

    python examples/model_training_run.py [sf_dir]

Stages:

1. split search       — decision-stump training: every (feature,
                        threshold) candidate scored by exact-Gini in one
                        pass; the winning split prints with its purity
2. gradient descent   — three full-batch logistic-regression gradient
                        steps, the weight update running driver-side on
                        the 3-row gradient (the classic big-data/small-
                        model split: data-parallel gradients, tiny state)
3. decision offline   — off-policy bandit replay: uniform / greedy /
                        logging policies scored on the logged stream
                        with a temporal train/eval split
4. calibration        — Brier-score decomposition of the corpus quality
                        classifier (reliability / resolution /
                        uncertainty + the binned identity)
5. experiment readout — Bayesian Beta-Binomial A/B posterior next to the
                        frequentist z-test on the same arms
6. post-training data — SFT chat shaping (alternation-validated,
                        loss-mask completion spans), DPO preference
                        pairs (chosen/rejected + margin), and
                        Bradley-Terry strengths from pairwise outcomes

Each number the script prints is one Spark DAG over the parquet tables;
the only driver-side state is the 4-float weight vector.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.queries.ext_metrics import (
    _LR_FEATS,
    _LR_W,
    bandit_replay_eval,
    bayes_ab_posterior,
    brier_score_decomposition,
    decision_stump_train,
    logreg_gradient_step,
)
from bigdata_meteo_datalake_spark.queries.ext_training import ab_uplift_ztest
from bigdata_meteo_datalake_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("model-training", cpus=8, shuffle_partitions=8)

    print("== 1. stump split search (exact Gini) ==")
    rows = decision_stump_train(spark, sf_dir).collect()
    for r in sorted(rows, key=lambda r: r["gini_q"])[:3]:
        flag = " <= BEST" if r["is_best"] else ""
        print(
            f"  {r['feature']:>12} <= {r['threshold']:>8}: gini {r['gini_q']/1e9:.6f}"
            f"  left {r['s_left']}/{r['n_left']} right {r['s_right']}/{r['n_right']}"
            f"{flag}"
        )

    print("== 2. logistic gradient steps (driver updates 4 floats) ==")
    # NOTE: the registered query evaluates at the fixed literal _LR_W so it
    # stays oracle-checkable; a trainer would re-generate the literals per
    # step. Here we report the fixed-point gradient plus the implied first
    # update at learning rate 0.1 to show the loop shape.
    g = {r["feature"]: r for r in logreg_gradient_step(spark, sf_dir).collect()}
    n = next(iter(g.values()))["n_users"]
    loss = next(iter(g.values()))["loss_q"] / 1e6 / n
    print(f"  mean log-loss at w={_LR_W}: {loss:.6f} over {n} users")
    lr = 0.1
    new_w = [_LR_W[0]] + [
        round(_LR_W[i + 1] - lr * g[f]["g_q"] / 1e9 / n, 6)
        for i, f in enumerate(_LR_FEATS)
    ]
    print(f"  step-1 weights at lr={lr}: {new_w}")

    print("== 3. off-policy bandit replay ==")
    for r in bandit_replay_eval(spark, sf_dir).collect():
        print(
            f"  policy {r['policy']:>8}: matched {r['n_matched']:>6} "
            f"reward_rate {r['reward_rate']}"
        )

    print("== 4. classifier calibration (Brier decomposition) ==")
    b = brier_score_decomposition(spark, sf_dir).collect()[0]
    print(
        f"  brier {b['brier']} = REL {b['reliability']} - RES {b['resolution']}"
        f" + UNC {b['uncertainty']} (binned {b['brier_binned']},"
        f" base rate {b['base_rate']})"
    )

    print("== 5. experiment readout: Bayesian posterior vs z-test ==")
    p = bayes_ab_posterior(spark, sf_dir).collect()[0]
    z = ab_uplift_ztest(spark, sf_dir).collect()[0]
    print(
        f"  posterior: A {p['post_mean_a']}+-{p['post_sd_a']}"
        f"  B {p['post_mean_b']}+-{p['post_sd_b']}"
        f"  z_ab {p['z_ab']} b_beats_a_95={p['b_beats_a_95']}"
    )
    print(
        f"  z-test:    uplift {z['uplift']} CI [{z['ci_low']}, {z['ci_high']}]"
        f" z {z['z']} significant={z['significant']}"
    )

    # 6. post-training data: SFT turns -> DPO pairs -> BT strengths
    from bigdata_meteo_datalake_spark.queries.ext_training import (
        bt_preference_strengths,
        dpo_pairs_report,
        sft_turns_report,
    )

    sft = sft_turns_report(spark, sf_dir)
    agg = sft.agg(
        F.count("*").alias("convs"),
        F.sum(F.col("valid_alternation").cast("int")).alias("valid"),
        F.sum("completion_chars").alias("completion_chars"),
    ).collect()[0]
    print(f"SFT: {agg.convs} conversations, {agg.valid} alternation-valid, "
          f"{agg.completion_chars} loss-masked completion chars")
    pairs = dpo_pairs_report(spark, sf_dir)
    pa = pairs.agg(F.count("*").alias("prompts"),
                   F.sum(F.col("valid_pair").cast("int")).alias("pairs"),
                   F.avg("margin").alias("margin")).collect()[0]
    print(f"DPO: {pa.prompts} prompts -> {pa.pairs} usable pairs, "
          f"mean margin {pa.margin:.1f}")
    for r in bt_preference_strengths(spark, sf_dir).orderBy(
            F.desc("strength_q")).collect()[:3]:
        print(f"BT:  item {r.item} strength {r.strength_q} "
              f"({r.n_wins}/{r.n_matches} wins)")

    assert any(r["is_best"] for r in rows)
    assert n > 0
    spark.stop()


if __name__ == "__main__":
    main()
