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


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_session7_operators_plan_shapes(spark):
    """Scale-claim pins for the session-7 operators: the joins they
    plan must be keyed (hash/sort-merge/broadcast), never a cartesian
    or broadcast-nested-loop — the shapes their docstrings promise."""
    import pyspark.sql.functions as F

    from dbpedia_spotlight_spark.operators.kbaugment import (
        edit_distance_join,
        fellegi_sunter_score,
    )
    from dbpedia_spotlight_spark.operators.temporal import (
        interval_coalesce,
        interval_subtract,
    )
    from dbpedia_spotlight_spark.pipeline.triples import distant_supervision

    recs = spark.createDataFrame(
        [("u%d" % i, "name%03d" % i) for i in range(60)],
        "uri string, label string",
    )
    p = _plan(edit_distance_join(recs, max_edits=1))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p

    m = spark.createDataFrame(
        [(i % 9, i, "u%d" % (i % 11)) for i in range(80)],
        "doc_id int, pos int, uri string",
    )
    kb = spark.createDataFrame(
        [("u%d" % i, "p", "u%d" % ((i + 3) % 11)) for i in range(11)],
        "subj string, pred string, obj string",
    )
    p = _plan(distant_supervision(m, kb))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p

    facts = spark.createDataFrame(
        [("e%d" % (i % 7), "p", "v", i % 20, i % 20 + 3) for i in range(60)],
        "subj string, pred string, obj string, valid_from int, valid_to int",
    )
    retr = facts.withColumn("valid_from", F.col("valid_from") + 1)
    p = _plan(interval_subtract(facts, retr))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # coalesce: single hash-partition exchange feeding the windows
    p = _plan(interval_coalesce(facts))
    assert "CartesianProduct" not in p

    # Fellegi-Sunter is pure projection: NO join/exchange at all
    pairs = spark.createDataFrame(
        [("a", "b", True, False)],
        "a string, b string, x_agree boolean, y_agree boolean",
    )
    p = _plan(
        fellegi_sunter_score(
            pairs, ["x", "y"], {"x": 0.9, "y": 0.8}, {"x": 0.1, "y": 0.2}
        )
    )
    assert "Join" not in p and "Exchange" not in p


def test_session7_mask_and_blend_plan_shapes(spark):
    """mask_spans stays doc-keyed (no keyless join); blend_scores'
    windows are the documented total-order ranks, nothing else."""
    from dbpedia_spotlight_spark.datapipe.interleaved import mask_spans
    from dbpedia_spotlight_spark.datapipe.packing import blend_scores

    docs = spark.createDataFrame(
        [(i, "text %d body" % i) for i in range(30)], "doc_id int, text string"
    )
    spans = spark.createDataFrame(
        [(i, 0, 4) for i in range(30)], "doc_id int, begin int, end int"
    )
    p = _plan(mask_spans(docs, spans))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p

    d = spark.createDataFrame(
        [("d%d" % i, float(i), float(i % 5)) for i in range(30)],
        "doc_id string, q double, w double",
    )
    p = _plan(blend_scores(d, {"q": 1.0, "w": -1.0}))
    assert "Join" not in p  # per-signal distributed ranks, no self-join
    # r5 scale fix: NO unpartitioned window anywhere — the old per-signal
    # global percent_rank window planned an Exchange SinglePartition
    # (whole relation through one task); the dense_sorted_id rewrite
    # plans only range + _pid-partitioned exchanges.
    assert "SinglePartition" not in p, p[:2000]
    assert "rangepartitioning" in p.lower(), p[:2000]


def test_session7_late_operators_plan_shapes(spark):
    """Plan pins for the late session-7 operators: doc-keyed joins
    only; the regex harvesters and the hashing featurizer plan no join
    at all before their aggregations."""
    import pyspark.sql.functions as F

    from dbpedia_spotlight_spark.datapipe.textstats import (
        feature_hash,
        ngram_novelty,
        textrank_summaries,
    )
    from dbpedia_spotlight_spark.pipeline.triples import hearst_patterns

    docs = spark.createDataFrame(
        [(i, "w%d x y. z a b. c d e" % i) for i in range(20)],
        "doc_id int, text string",
    )

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p = plan(textrank_summaries(docs, top_k=1, iterations=1))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p

    p = plan(ngram_novelty(docs))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p

    # pure scan -> aggregate pipelines: no join operator anywhere
    assert "Join" not in plan(hearst_patterns(docs))
    assert "Join" not in plan(feature_hash(docs, dim=64))


def test_session8_operators_plan_shapes(spark):
    """Scale-claim pins for the session-8 operators: sketches and
    layout keys plan as pure projections/keyed aggregates (no join at
    all), the attribution/transition/ACF family joins stay keyed —
    never cartesian/broadcast-nested-loop — and every window they use
    is partitioned, not global."""
    import pyspark.sql.functions as F

    from dbpedia_spotlight_spark.datapipe.funnel import (
        event_acf,
        event_transitions,
        touch_attribution,
    )
    from dbpedia_spotlight_spark.datapipe.sketches import (
        cms_sketch,
        hll_registers,
    )
    from dbpedia_spotlight_spark.functions.zorder import with_hilbert_key

    toks = spark.createDataFrame(
        [(i % 4, f"t{i % 50}") for i in range(300)], "grp int, item string"
    )
    # HLL registers: one keyed aggregate, no join, no global window
    p = _plan(hll_registers(toks, ["grp"], "item", p=8))
    assert "Join" not in p and "CartesianProduct" not in p

    # CMS build: explode (constant depth) + one aggregate, no join;
    # the shuffle key is the cell, never the item
    p = _plan(cms_sketch(toks, "item", depth=3, width=64))
    assert "Join" not in p

    # Hilbert key: projection-only — no exchange, no join, no window
    grid = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x int, y int"
    )
    p = _plan(with_hilbert_key(grid, "x", "y", bits=8))
    assert "Join" not in p and "Exchange" not in p and "Window" not in p

    ev = spark.createDataFrame(
        [
            (i, f"2024-01-01 00:{i % 60:02d}:00", i % 5,
             ["view", "click", "purchase"][i % 3], float(i % 30))
            for i in range(120)
        ],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    # attribution: the conv x touch join is keyed on user; windows are
    # per-conversion, never global
    p = _plan(touch_attribution(ev, "purchase", ["view", "click"]))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    for line in p.splitlines():
        if line.strip().startswith("Window"):
            assert "_u" in line or "_cid" in line, line

    # transitions / ACF: lead() windows keyed by user / event_type
    p = _plan(event_transitions(ev))
    assert "CartesianProduct" not in p
    for line in p.splitlines():
        if line.strip().startswith("Window"):
            assert "user_id" in line or "src" in line, line

    p = _plan(event_acf(ev, max_lag=3))
    assert "Join" not in p
    for line in p.splitlines():
        if line.strip().startswith("Window"):
            assert "event_type" in line, line


def test_blend_scores_skew_balance_and_linearity(spark):
    """r5 scale fix fixture: a CONSTANT signal is the worst-case skew for
    any rank computation (every row shares one key). blend_scores' range
    keys include the unique id tie-break, so even that degenerate signal
    spreads evenly across range partitions, and 4x the rows costs far
    less than the quadratic blow-up a hot partition would show."""
    import time

    from dbpedia_spotlight_spark.datapipe.packing import blend_scores

    def make(n):
        return spark.range(n).select(
            F.concat(F.lit("d"), F.format_string("%08d", "id")).alias(
                "doc_id"
            ),
            F.lit(1.0).alias("konst"),
            (F.col("id") % 97).cast("double").alias("sig"),
        )

    # balance: range-partitioning on (constant, id) stays even
    parts = (
        make(8000)
        .repartitionByRange(
            8, F.col("konst").asc_nulls_first(), F.col("doc_id").asc()
        )
        .groupBy(F.spark_partition_id().alias("_pid"))
        .count()
        .collect()
    )
    sizes = [r["count"] for r in parts]
    assert max(sizes) <= 3 * (sum(sizes) / len(sizes)), sizes

    def run(n):
        t0 = time.time()
        out = blend_scores(make(n), {"konst": 1.0, "sig": -0.5})
        assert out.count() == n
        return time.time() - t0

    t1 = run(20_000)
    t4 = run(80_000)
    # linear-ish: 4x rows must stay well under the 16x a one-task global
    # window degenerates toward; generous slack absorbs JVM warm-up noise
    assert t4 <= max(6 * t1, t1 + 20.0), (t1, t4)

    # correctness on the skewed fixture: konst pct is rn/(n-1) by id order
    rows = (
        blend_scores(make(5), {"konst": 1.0})
        .orderBy("doc_id")
        .collect()
    )
    assert [round(r["konst_pct"], 6) for r in rows] == [
        0.0,
        0.25,
        0.5,
        0.75,
        1.0,
    ]
