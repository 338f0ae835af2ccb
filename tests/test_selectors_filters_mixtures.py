"""P13 spot selectors, F7/F8 occurrence filters, D6 TF-ICF, D9 mixtures,
D2 context windowing."""

import math

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.disambiguate import (
    attach_context_windows,
    tficf_scores,
)
from dbpedia_spotlight_spark.operators.mixtures import (
    fader2_mixture,
    linear_regression_feature_mixture,
    prior_baseline,
    random_baseline,
    unweighted_mixture,
)
from dbpedia_spotlight_spark.operators.occ_filters import (
    list_pages_filter,
    lowercase_surface_forms_filter,
    narrow_context,
    number_resources_filter,
    pattern_filter,
    term_size_filter,
    uri_whitelist_filter,
)
from dbpedia_spotlight_spark.operators.selectors import (
    at_least_one_noun_selector,
    chained_selector,
    non_common_word_selector,
    short_surface_form_selector,
    surface_form_whitelist_selector,
)


@pytest.fixture(scope="module")
def spots(spark):
    rows = [
        ("d1", 0, 0, "the"),
        ("d1", 0, 10, "Apple Inc"),
        ("d1", 0, 30, "it"),
        ("d1", 0, 40, "Paris"),
        ("d2", 0, 0, "apple"),
    ]
    return spark.createDataFrame(
        rows, "doc_id string, span_pos int, offset int, surface_form string"
    )


def test_non_common_word_selector(spark, spots):
    common = spark.createDataFrame([("the",), ("it",), ("apple",)], "word string")
    kept = {r["surface_form"] for r in non_common_word_selector(spots, common).collect()}
    # single common words dropped; multi-word and non-common kept
    assert kept == {"Apple Inc", "Paris"}


def test_short_and_whitelist_and_chain(spark, spots):
    assert {
        r["surface_form"] for r in short_surface_form_selector(spots, 4).collect()
    } == {"Apple Inc", "Paris", "apple"}
    wl = spark.createDataFrame([("Paris",), ("apple",)], "sf string")
    assert {
        r["surface_form"]
        for r in surface_form_whitelist_selector(spots, wl).collect()
    } == {"Paris", "apple"}
    chained = chained_selector(
        spots,
        [
            lambda df: short_surface_form_selector(df, 4),
            lambda df: surface_form_whitelist_selector(df, wl),
        ],
    )
    assert {r["surface_form"] for r in chained.collect()} == {"Paris", "apple"}


def test_noun_selector_requires_pos(spark, spots):
    with pytest.raises(ValueError):
        at_least_one_noun_selector(spots)
    tagged = spots.withColumn(
        "pos_tags",
        F.when(F.col("surface_form") == "Paris", F.array(F.lit("NNP"))).otherwise(
            F.array(F.lit("DT"))
        ),
    )
    assert {
        r["surface_form"] for r in at_least_one_noun_selector(tagged).collect()
    } == {"Paris"}


def test_occurrence_filters(spark):
    occs = spark.createDataFrame(
        [
            ("d1", 0, "Apple", "Apple_Inc"),
            ("d1", 5, "42", "Year_42"),
            ("d1", 9, "lists", "List_of_fruits"),
            ("d2", 0, "Paris", "Paris"),
        ],
        "doc_id string, offset int, surface_form string, uri string",
    )
    assert {r["uri"] for r in number_resources_filter(occs).collect()} == {
        "Apple_Inc", "List_of_fruits", "Paris",
    }
    assert {r["uri"] for r in list_pages_filter(occs).collect()} == {
        "Apple_Inc", "Year_42", "Paris",
    }
    wl = spark.createDataFrame([("Paris",)], "uri string")
    assert {r["uri"] for r in uri_whitelist_filter(occs, wl).collect()} == {"Paris"}
    low = lowercase_surface_forms_filter(occs).collect()
    assert all(r["surface_form"] == r["surface_form"].lower() for r in low)
    assert term_size_filter(occs, 1, 1).count() == 4
    assert {
        r["uri"] for r in pattern_filter(occs, r"^[0-9]+$").collect()
    } == {"Apple_Inc", "List_of_fruits", "Paris"}


def test_narrow_context(spark):
    toks = spark.createDataFrame(
        [("d1", i * 10, f"t{i}", False) for i in range(20)],
        "doc_id string, offset int, stem string, is_stopword boolean",
    )
    occs = spark.createDataFrame([("d1", 100)], "doc_id string, offset int")
    kept = narrow_context(toks, occs, window_tokens=2).collect()
    stems = sorted(r["stem"] for r in kept)
    # occurrence sits on token 10; ±2 window keeps t8..t12
    assert stems == ["t10", "t11", "t12", "t8", "t9"]


def test_mixture_columns(spark):
    df = spark.createDataFrame([(math.log(0.5), math.log(0.25), 0.3, 0.001)],
                               "p_e double, p_s double, ctx double, prior double")
    row = df.select(
        unweighted_mixture(F.col("p_e"), F.col("p_s")).alias("u"),
        linear_regression_feature_mixture(
            [(F.col("p_e"), 2.0), (F.col("p_s"), 1.0)], 0.5
        ).alias("lr"),
        fader2_mixture(F.col("ctx"), F.col("prior"), 0.7, 100.0).alias("f2"),
    ).collect()[0]
    assert abs(row["u"] - (math.log(0.5) + math.log(0.25))) < 1e-12
    assert abs(row["lr"] - (2 * math.log(0.5) + math.log(0.25) + 0.5)) < 1e-12
    expect_f2 = 0.7 * 0.3 + 0.3 * (1 + math.log(1 + 0.001 * 100.0))
    assert abs(row["f2"] - expect_f2) < 1e-12


def test_prior_and_random_baselines(spark):
    cands = spark.createDataFrame(
        [
            ("d1", 0, 0, 1, 80, 100),
            ("d1", 0, 0, 2, 20, 100),
            ("d1", 0, 9, 3, 5, 10),
        ],
        "doc_id string, span_pos int, offset int, res_id int, "
        "pair_count long, annotated_count long",
    )
    best = {(r["offset"], r["res_id"]) for r in prior_baseline(cands).collect()}
    assert best == {(0, 1), (9, 3)}
    rnd = random_baseline(cands).collect()
    assert len(rnd) == 2  # one per spot, deterministic
    assert random_baseline(cands).collect() == rnd


def test_tficf_scores(spark, world):
    # candidate set {res A=0, B=1} for doc q; query tokens overlap A only
    from dbpedia_spotlight_spark.model.model_tables import SpotlightModel

    ctx = spark.createDataFrame(
        [(0, 1, 5), (0, 2, 5), (1, 3, 10)],
        "res_id int, token_id int, count long",
    )
    model = SpotlightModel(
        surface_forms=world.model.surface_forms,
        resources=world.model.resources,
        candidates=world.model.candidates,
        token_types=world.model.token_types,
        context_counts=ctx,
    )
    query = spark.createDataFrame(
        [("q", 1, 2.0), ("q", 9, 1.0)], "doc_id string, token_id int, c double"
    )
    pairs = spark.createDataFrame([("q", 0), ("q", 1)], "doc_id string, res_id int")
    got = {r["res_id"]: r["tficf"] for r in tficf_scores(query, pairs, model).collect()}
    # token 1: tf(A)=5, icf=log(2/1)+1; norm(A)=2 distinct tokens
    expect_a = 5 * (math.log(2.0) + 1.0) / 2
    assert abs(got[0] - expect_a) < 1e-9
    assert got[1] == 0.0  # B's context shares no query token


def test_context_windowing(spark):
    toks = spark.createDataFrame(
        [("d1", i * 10, f"t{i}", False) for i in range(10)],
        "doc_id string, offset int, stem string, is_stopword boolean",
    )
    spots = spark.createDataFrame(
        [("d1", 0, 0, "x"), ("d1", 0, 55, "y"), ("d1", 0, 90, "z")],
        "doc_id string, span_pos int, offset int, surface_form string",
    )
    tk, sp = attach_context_windows(toks, spots, max_tokens=4)
    wins = {r["stem"]: r["ctx_id"] for r in tk.collect()}
    assert wins["t0"] == "d1#0" and wins["t3"] == "d1#0"
    assert wins["t4"] == "d1#1" and wins["t9"] == "d1#2"
    spot_wins = {r["offset"]: r["ctx_id"] for r in sp.collect()}
    # offset 0 -> window 0 (toks 0-30); 55 inside window 1 (40-70); 90 -> window 2
    assert spot_wins == {0: "d1#0", 55: "d1#1", 90: "d1#2"}
    assert sp.count() == 3  # exactly one window per spot


def test_spotter_tuner(spark, world):
    """M12: tuned weights must score gold spots above non-gold spots."""
    from dbpedia_spotlight_spark.operators.spotter import spot_documents
    from dbpedia_spotlight_spark.operators.tuner import (
        tune_spot_weights,
        write_spot_weights,
    )

    spots = spot_documents(world.documents, world.model.surface_forms)
    w = tune_spot_weights(spots, world.gold, world.model.surface_forms)
    assert len(w) == 4
    # gold-heavy sfs have annot_prob 1.0 (total=-1); weight must be positive
    assert w[0] > 0
    import tempfile, os
    p = os.path.join(tempfile.mkdtemp(), "spotter_thresholds.txt")
    write_spot_weights(w, p)
    assert len(open(p).read().split()) == 4


def test_m14_topic_signatures_and_web_queries(spark):
    """M14 (ExtractTopicSignatures + GetWebPriors query construction)."""
    from dbpedia_spotlight_spark.operators.auxstats import (
        topic_signatures,
        uri_token_counts,
        web_query_strings,
    )
    from pyspark.sql import functions as F

    occs = spark.createDataFrame(
        [("d1", "Spark_(fire)"), ("d2", "Spark_(fire)")],
        "doc_id string, uri string",
    )
    toks = spark.createDataFrame(
        [("d1", w) for w in ["flame", "flame", "heat", "the", "spark"]]
        + [("d2", w) for w in ["heat", "ember", "the"]],
        "doc_id string, token string",
    )
    utc = uri_token_counts(occs, toks)
    sig = topic_signatures(utc, stopwords=["the"], n_keywords=3).collect()
    # flame(2) heat(2) ember(1)/spark(1) -> tie broken token asc
    assert sig[0]["keywords"] == "heat flame ember".replace(
        "heat flame", "flame heat"
    )
    wq = web_query_strings(utc, stopwords=["the"], n_keywords=3).collect()[0]
    assert wq["must"] == '+"Spark" +"fire"'
    # 'spark' is contained in the must clause -> excluded from extras
    assert "spark" not in wq["keywords"].split()
    assert wq["query"].startswith('+"Spark" +"fire" ')


def test_cooccurrence_selector_learns_gold_membership(spark):
    """P13 WEKA selector twin: retrained from gold membership, it must learn
    to keep high-annot-prob multi-word spots and drop common words."""
    from dbpedia_spotlight_spark.operators.cooccurrence_selector import (
        cooccurrence_selector,
        train_cooccurrence_selector,
    )

    sfs = spark.createDataFrame(
        [(0, "New York", "new york", 90, 100),
         (1, "the", "the", 1, 10000),
         (2, "house", "house", 5, 5000),
         (3, "Apache Spark", "apache spark", 80, 90)],
        "sf_id int, surface_form string, surface_form_norm string, "
        "annotated_count long, total_count long",
    )
    rows = []
    gold_rows = []
    for i in range(40):
        d = f"d{i}"
        rows += [(d, 0, 0, "New York", 1.0, "m", []),
                 (d, 0, 10, "the", 0.1, "m", []),
                 (d, 0, 20, "house", 0.1, "m", []),
                 (d, 0, 30, "Apache Spark", 1.0, "m", [])]
        gold_rows += [(d, 0, "New York"), (d, 30, "Apache Spark")]
    spots = spark.createDataFrame(
        rows,
        "doc_id string, span_pos int, offset int, surface_form string, "
        "spot_prob double, spot_type string, token_stems array<string>",
    )
    gold = spark.createDataFrame(
        gold_rows, "doc_id string, offset int, surface_form string"
    )
    model = train_cooccurrence_selector(spots, gold, sfs)
    kept = {r["surface_form"]
            for r in cooccurrence_selector(spots, sfs, model).collect()}
    assert "New York" in kept and "Apache Spark" in kept
    assert "the" not in kept and "house" not in kept


def test_context_windowing_long_doc_reference_default(spark):
    """D2 at the reference default MAX_CONTEXT=250
    (DBTwoStepDisambiguator.scala:72): a 600-token document splits into 3
    windows (250/250/100); every spot lands in the last window whose
    start <= its offset, and a windowed-scoring run sees per-window, not
    whole-doc, context ids (the round-3 item #7 long-doc fixture)."""
    n = 600
    toks = spark.createDataFrame(
        [("long", i * 5, f"w{i}", False) for i in range(n)],
        "doc_id string, offset int, stem string, is_stopword boolean",
    )
    spots = spark.createDataFrame(
        [
            ("long", 0, 0, "a"),          # first token -> window 0
            ("long", 0, 249 * 5, "b"),    # last token of window 0
            ("long", 0, 250 * 5, "c"),    # first token of window 1
            ("long", 0, 599 * 5, "d"),    # last token -> window 2
        ],
        "doc_id string, span_pos int, offset int, surface_form string",
    )
    tk, sp = attach_context_windows(toks, spots, max_tokens=250)
    assert tk.select("ctx_id").distinct().count() == 3
    sizes = {
        r["ctx_id"]: r["n"]
        for r in tk.groupBy("ctx_id").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {"long#0": 250, "long#1": 250, "long#2": 100}
    spot_wins = {r["offset"]: r["ctx_id"] for r in sp.collect()}
    assert spot_wins == {
        0: "long#0",
        249 * 5: "long#0",
        250 * 5: "long#1",
        599 * 5: "long#2",
    }
