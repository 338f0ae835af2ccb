"""Skew utilities: salted join and salted distinct count must equal their
plain equivalents."""

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
)


def test_salted_join_equals_plain_join(spark):
    # one hot key (k=0 appears 500x) + tail
    probe = spark.range(600).select(
        F.when(F.col("id") < 500, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    build = spark.createDataFrame(
        [(0, "hot"), (510, "a"), (550, "b")], "k long, tag string"
    )
    plain = {(r["v"], r["tag"]) for r in probe.join(build, "k").collect()}
    salted = {
        (r["v"], r["tag"])
        for r in salted_join(probe, build, ["k"], buckets=4).collect()
    }
    assert salted == plain and len(plain) == 502


def test_salted_distinct_count(spark):
    df = spark.createDataFrame(
        [("g1", x % 7) for x in range(100)] + [("g2", 1), ("g2", 2)],
        "g string, v int",
    )
    got = {
        r["g"]: r["n_distinct"]
        for r in salted_distinct_count(df, ["g"], "v", buckets=4).collect()
    }
    assert got == {"g1": 7, "g2": 2}


def test_two_stage_candidate_join_plan(spark):
    """VERDICT item 4: the two-stage plan must show broadcast(head) +
    shuffle(tail), and auto-engage above AUTO_BROADCAST_MAX."""
    from dbpedia_spotlight_spark.operators.candidates import join_candidates

    spots_sf = spark.createDataFrame(
        [(i, f"sf{i}") for i in range(50)], "sf_id int, surface_form string"
    )
    cands = spark.createDataFrame(
        [(i, i * 10 + j, 5) for i in range(50) for j in range(3)],
        "sf_id int, res_id int, pair_count long",
    )
    heads = [0, 1, 2]
    joined = join_candidates(spots_sf, cands, heads=heads)
    # same rows as the plain join
    plain = {tuple(r) for r in spots_sf.join(cands, "sf_id").collect()}
    got = {
        tuple(r)
        for r in joined.select("sf_id", "surface_form", "res_id", "pair_count")
        .collect()
    }
    assert {r[0:1] + r[2:] for r in got} == {r[0:1] + r[2:] for r in plain}
    # plan shape: one broadcast hash join (head) + one shuffle join (tail)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)


def test_annotate_auto_heads_threshold(monkeypatch):
    """annotate() flips to the two-stage join when candidates_count exceeds
    the broadcast ceiling: above it, model.head_ids() is fetched and passed
    through to generate_candidates; below it, heads stays None (single
    broadcast). No Spark needed — generate_candidates is stubbed to capture
    the decision."""
    import pytest

    from dbpedia_spotlight_spark.operators import candidates as C
    from dbpedia_spotlight_spark.pipeline import annotate as A

    assert C.AUTO_BROADCAST_MAX >= 1_000_000  # a real-model-scale ceiling

    captured = {}

    class _Stop(Exception):
        pass

    def fake_generate(spots, surface_forms, candidates, heads=None):
        captured["heads"] = heads
        raise _Stop

    monkeypatch.setattr(A, "generate_candidates", fake_generate)

    class _FakeSpots:
        def repartition(self, *cols):
            return self

    class _BigModel:
        surface_forms = None
        candidates = None
        candidates_count = C.AUTO_BROADCAST_MAX + 1

        def head_ids(self):
            return [7, 8, 9]

    class _SmallModel(_BigModel):
        candidates_count = 10

        def head_ids(self):
            raise AssertionError("small model must not compute heads")

    with pytest.raises(_Stop):
        A.annotate(None, _BigModel(), spots=_FakeSpots())
    assert captured["heads"] == [7, 8, 9]

    with pytest.raises(_Stop):
        A.annotate(None, _SmallModel(), spots=_FakeSpots())
    assert captured["heads"] is None


def test_dense_sorted_id_matches_global_window(spark):
    """dense_sorted_id == row_number over a global sort (same dense ids in
    the same key order), with no single-partition window in the plan."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from dbpedia_spotlight_spark.operators.skew import dense_sorted_id

    df = spark.range(0, 500).withColumn(
        "k", F.format_string("sf%04d", (F.col("id") * 37) % 500)
    )
    got = {
        r["k"]: r["kid"]
        for r in dense_sorted_id(df, ["k"], "kid", start=3, partitions=8).collect()
    }
    want = {
        r["k"]: r["kid"]
        for r in df.withColumn(
            "kid", F.row_number().over(Window.orderBy("k")) + 2
        ).collect()
    }
    assert got == want

    out = dense_sorted_id(df, ["k"], "kid", partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every Window node must be partitioned (partitionBy _pid), never global
    for line in plan.splitlines():
        if "Window " in line or line.strip().startswith("Window"):
            assert "_pid" in line, line
