"""Submodular data selection — greedy max-coverage subset choice.

Coverage-based selection is the classic submodular objective for training
-data curation (Nemhauser et al. 1978 give the (1 - 1/e) greedy
guarantee; facility-location / coverage selection for corpus subsetting
appears in e.g. Kirchhoff & Bilmes 2014): pick k documents maximizing the
number of DISTINCT features (tokens, n-grams, domains) the chosen set
covers. Unlike DSIR (datapipe/dsir.py — per-doc importance weights,
embarrassingly parallel), coverage is a SET function: each pick changes
every other document's marginal gain, so the exact greedy is inherently
k sequential rounds.

Distributed shape: the k-round driver loop runs one bounded aggregate per
round — never a collect of data rows:

  round r:  gain(d) = |features(d) \\ covered|   (anti-join + groupBy)
            argmax over docs by (gain desc, doc_id asc)  — a 1-row agg
            covered ∪= features(winner)  — semi-join on the winner id

`covered` is never materialized on the driver: it stays a DataFrame
(features of the selected ids, recomputed by semi-join — selected is <= k
ids, a broadcast literal). k is a small constant (a curation batch), so
the loop is k scans of the feature relation — the standard exact-greedy
trade; at larger k switch to the stochastic-greedy variant (sample
candidates per round) with the same plan shape per round.

Determinism: ties broken by ascending doc id, so the selection is unique
and replayable by any engine (the DuckDB oracle unrolls the same k
rounds).

No counterpart in the reference repo (no training-data selection stage);
extends the LLM-data-pipeline operators (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def greedy_max_coverage(
    features: DataFrame,
    id_col: str,
    feature_col: str,
    k: int,
) -> DataFrame:
    """features(id_col, feature_col) -> the greedy max-coverage selection:
    (round_idx, <id_col>, gain, covered_total), one row per pick, in pick
    order. `gain` = newly covered distinct features; `covered_total` =
    running coverage after the pick. Stops early (fewer than k rows) when
    every feature is covered — further picks would all gain 0.

    Ties on gain break by ascending id (unique, engine-replayable).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    feats = (
        features.select(
            F.col(id_col).alias("_id"), F.col(feature_col).alias("_f")
        )
        .distinct()
        .localCheckpoint()  # reused k times; truncate upstream lineage
    )
    selected: list = []  # [(round_idx, id, gain, covered_total)]
    covered_total = 0
    for r in range(k):
        if selected:
            sel_ids = [s[1] for s in selected]
            covered = feats.filter(F.col("_id").isin(sel_ids)).select(
                "_f"
            ).distinct()
            remaining = feats.join(covered, "_f", "left_anti")
        else:
            remaining = feats
        top = (
            remaining.groupBy("_id")
            .agg(F.count("*").alias("gain"))
            .orderBy(F.desc("gain"), F.asc("_id"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["gain"] == 0:
            break
        covered_total += int(top[0]["gain"])
        selected.append((r, top[0]["_id"], int(top[0]["gain"]), covered_total))
    spark = features.sparkSession
    schema_id_type = dict(features.dtypes)[id_col]
    out = spark.createDataFrame(
        selected,
        f"round_idx int, {id_col} {schema_id_type}, "
        "gain long, covered_total long",
    )
    return out
