"""Deterministic synthetic world for correctness tests and the north-rule
bench (FIXTURES.md). Seeded; no external data.

The world contains every edge case FIXTURES.md calls for:
  - ambiguous head surface forms ("Apple", "Paris") with skewed frequency
  - one sf with >20 candidates (MAX_CANDIDATES pruning)
  - redirect chain A->B->C and a cycle X1->X2->X1
  - disambiguation pages excluded from candidate targets
  - sfs below/between/above the spotter probability thresholds
  - an ALL-CAPS abbreviation (<5 chars) and a pure-number sf
  - two sfs sharing a surface_form_norm with different annotated counts
  - candidates of one sf with disjoint context vocabularies so context
    scoring flips the prior-only ranking ("Paris" -> Paris_Hilton in a
    celebrity context)
  - interleaved text/media spans; a >250-token doc; a >1200-char doc

Gold is produced by the same generator that assembles the documents, so it
is exact by construction (FIXTURES.md §3).
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from dbpedia_spotlight_spark.model.model_tables import SpotlightModel
from dbpedia_spotlight_spark.model import schemas
from dbpedia_spotlight_spark.functions.text import normalize_surface_form_py

SEED = 42

# --------------------------------------------------------------------------
# Static model definition
# --------------------------------------------------------------------------

# uri -> (support, [type qnames])
RESOURCES = {
    "Apple_Inc": (800, ["DBpedia:Organisation"]),
    "Apple": (400, ["DBpedia:Species"]),
    "Big_Apple": (150, ["DBpedia:Place"]),
    "Paris": (900, ["DBpedia:Place"]),
    "Paris_Hilton": (300, ["DBpedia:Person"]),
    "Berlin": (500, ["DBpedia:Place"]),
    "France": (600, ["DBpedia:Place"]),
    "Java_(programming_language)": (600, ["DBpedia:Work"]),
    "Java_(island)": (200, ["DBpedia:Place"]),
    "New_York_City": (700, ["DBpedia:Place"]),
    "IBM": (400, ["DBpedia:Organisation"]),
    "Year_2024": (50, []),
}
# 22 low-support fillers -> "Apple" has >20 candidates total
FILLER_RESOURCES = {f"Apple_Item_{i:02d}": (5 + i, []) for i in range(22)}

# redirects: chain + cycle (ref WikipediaToDBpediaClosure.scala:106-116)
REDIRECTS = [
    ("Apple_Computer_Inc", "Apple_Computer"),
    ("Apple_Computer", "Apple_Inc"),  # chain A->B->C
    ("Paname", "Paris"),
    ("NYC", "New_York_City"),
    ("X1", "X2"),
    ("X2", "X1"),  # cycle
]
DISAMBIGUATIONS = ["Apple_(disambiguation)", "Paris_(disambiguation)"]

# sf -> (annotated_count, total_count, {uri: pair_count})
# spot score (weighted) = annot_prob*1.0 + is_abbrev*0.2 + is_number*(-0.2) + 0.1,
# accepted at >= 0.5 -> plain sfs need annot_prob >= 0.4.
SURFACE_FORMS = {
    "Apple": (1000, 1600, {"Apple_Inc": 700, "Apple": 250,
                           **{f"Apple_Item_{i:02d}": 1 + (i % 3) for i in range(22)}}),
    "Apple Inc": (120, 150, {"Apple_Inc": 120}),
    "Paris": (900, 1500, {"Paris": 750, "Paris_Hilton": 150}),
    "Paris Hilton": (200, 260, {"Paris_Hilton": 200}),
    "Berlin": (400, 800, {"Berlin": 400}),
    "France": (500, 1000, {"France": 500}),
    "Java": (500, 1000, {"Java_(programming_language)": 350, "Java_(island)": 150}),
    "Big Apple": (80, 100, {"Big_Apple": 80}),
    "big apple": (20, 40, {"Big_Apple": 20}),  # norm collision, lower count
    "New York City": (300, 500, {"New_York_City": 300}),
    "IBM": (150, 600, {"IBM": 150}),       # abbrev: 0.25+0.2+0.1 = 0.55 ✓
    "2024": (700, 1000, {"Year_2024": 700}),  # number: 0.7-0.2+0.1 = 0.6 ✓
    # below FSA threshold (annot_prob < 0.1): never in dictionary paths
    "fruit": (20, 400, {"Apple": 20}),
    # in FSA (>=0.1) but rejected by weighted score (0.15+0.1=0.25 < 0.5)
    "company": (60, 400, {"Apple_Inc": 60}),
}

# context vocabularies (stemmed lowercase); token -> global count
CONTEXT = {
    "Apple_Inc": {"iphone": 50, "mac": 30, "company": 25, "technology": 15},
    "Apple": {"fruit": 40, "tree": 30, "pie": 15, "orchard": 10},
    "Big_Apple": {"borough": 12, "manhattan": 10, "nickname": 8},
    "Paris": {"city": 60, "france": 45, "eiffel": 30, "capital": 20},
    "Paris_Hilton": {"celebrity": 30, "hotel": 25, "reality": 10},
    "Berlin": {"city": 35, "germany": 30, "wall": 10},
    "France": {"country": 40, "europe": 30, "wine": 10},
    "Java_(programming_language)": {"programming": 45, "code": 30, "language": 20},
    "Java_(island)": {"island": 30, "coffee": 25, "indonesia": 10},
    "New_York_City": {"city": 40, "borough": 20, "manhattan": 25},
    "IBM": {"computer": 30, "mainframe": 15, "technology": 10},
    "Year_2024": {"calendar": 5, "year": 10},
}

# filler words: in vocabulary, absent from every context vector (constant
# shift only — see operators/disambiguate.py docstring)
FILLER_WORDS = (
    "report meeting data table chart note memo draft review plan agenda "
    "summary record entry item list page file folder index"
).split()


# --------------------------------------------------------------------------
# Document templates: (sentence, [(sf, uri or None)]) — gold by construction
# --------------------------------------------------------------------------

def _templates():
    return [
        # head skew + clear contexts
        ("Apple released the iphone and the mac.", [("Apple", "Apple_Inc")]),
        ("Apple makes technology and is a big company.", [("Apple", "Apple_Inc")]),
        ("Apple pie is baked from the fruit of an orchard tree.", [("Apple", "Apple")]),
        ("Paris is the capital of france near the eiffel tower.", [("Paris", "Paris")]),
        ("Paris is a beautiful city in france.", [("Paris", "Paris")]),
        # context flips the prior: celebrity context -> Paris_Hilton
        ("Paris Hilton is a reality celebrity.", [("Paris Hilton", "Paris_Hilton")]),
        ("Paris stayed at the hotel like a true celebrity.", [("Paris", "Paris_Hilton")]),
        ("Berlin is a city in germany behind the wall.", [("Berlin", "Berlin")]),
        ("France is a country in europe known for wine.", [("France", "France")]),
        ("Java is a programming language with much code.", [("Java", "Java_(programming_language)")]),
        ("Java is an island of indonesia famous for coffee.", [("Java", "Java_(island)")]),
        ("Big Apple is a nickname with borough and manhattan roots.", [("Big Apple", "Big_Apple")]),
        ("New York City has a borough called manhattan.", [("New York City", "New_York_City")]),
        ("IBM built a mainframe computer with new technology.", [("IBM", "IBM")]),
        ("2024 is a calendar year.", [("2024", "Year_2024")]),
    ]


@dataclass
class World:
    documents: DataFrame
    gold: DataFrame
    model: SpotlightModel


def build_model(spark: SparkSession) -> SpotlightModel:
    all_resources = {**RESOURCES, **FILLER_RESOURCES}
    uris = sorted(all_resources)
    res_id = {u: i for i, u in enumerate(uris)}

    type_qnames = sorted({t for _, ts in all_resources.values() for t in ts})
    type_id = {q: i + 1 for i, q in enumerate(type_qnames)}
    ontology_rows = [
        (tid, q, "http://dbpedia.org/ontology/" + q.split(":")[1])
        for q, tid in sorted(type_id.items(), key=lambda kv: kv[1])
    ]

    res_rows = [
        (res_id[u], u, s, [type_id[t] for t in ts])
        for u, (s, ts) in sorted(all_resources.items())
    ]

    sfs = sorted(SURFACE_FORMS)
    sf_id = {s: i for i, s in enumerate(sfs)}
    sf_rows = [
        (sf_id[s], s, normalize_surface_form_py(s), a, t)
        for s, (a, t, _) in sorted(SURFACE_FORMS.items())
    ]

    cand_rows = [
        (sf_id[s], res_id[u], c)
        for s, (_, _, pairs) in sorted(SURFACE_FORMS.items())
        for u, c in sorted(pairs.items())
    ]

    # vocabulary: all context words + filler words, STEMMED with the same
    # stem() the tokenizer applies at query time (SnowballStemmer parity —
    # the model vocab must live in stem space; collisions sum)
    from dbpedia_spotlight_spark.operators.tokenizer import stem as _stem

    vocab_counts: dict = {}
    for ctx in CONTEXT.values():
        for tok, c in ctx.items():
            s = _stem(tok)
            vocab_counts[s] = vocab_counts.get(s, 0) + c
    for w in FILLER_WORDS:
        s = _stem(w)
        vocab_counts[s] = vocab_counts.get(s, 0) + 20
    tokens_sorted = sorted(vocab_counts)
    token_id = {t: i + 1 for i, t in enumerate(tokens_sorted)}  # 0 reserved
    tok_rows = [(token_id[t], t, vocab_counts[t]) for t in tokens_sorted]

    ctx_agg: dict = {}
    for u, ctx in sorted(CONTEXT.items()):
        for t, c in sorted(ctx.items()):
            key = (res_id[u], token_id[_stem(t)])
            ctx_agg[key] = ctx_agg.get(key, 0) + c
    ctx_rows = [(r, t, c) for (r, t), c in sorted(ctx_agg.items())]

    stop_rows = [(w,) for w in sorted({"the", "a", "an", "of", "is", "in", "and"})]

    return SpotlightModel(
        surface_forms=spark.createDataFrame(sf_rows, schemas.SURFACE_FORMS_SCHEMA),
        resources=spark.createDataFrame(res_rows, schemas.RESOURCES_SCHEMA),
        candidates=spark.createDataFrame(cand_rows, schemas.CANDIDATES_SCHEMA),
        token_types=spark.createDataFrame(tok_rows, schemas.TOKEN_TYPES_SCHEMA),
        context_counts=spark.createDataFrame(ctx_rows, schemas.CONTEXT_COUNTS_SCHEMA),
        redirects=spark.createDataFrame(REDIRECTS, schemas.REDIRECTS_SCHEMA),
        disambiguations=spark.createDataFrame(
            [(u,) for u in DISAMBIGUATIONS], "uri string"
        ),
        ontology_types=spark.createDataFrame(
            ontology_rows, "type_id smallint, type_qname string, type_uri string"
        ),
        stopwords=spark.createDataFrame(stop_rows, "word string"),
    )


# Docs draw sentences from ONE topic cluster: context scoring is per
# document, so a coherent cluster makes gold exact by construction. Weights
# skew toward the head clusters (Apple/Paris) per FIXTURES.md.
CLUSTERS = [
    ([0, 1, 13], 4),   # Apple_Inc (+IBM) — head
    ([2], 1),          # Apple the fruit
    ([3, 4, 7, 8], 4), # Paris/Berlin/France — head
    ([5, 6], 2),       # Paris_Hilton (context flips prior)
    ([9], 1),          # Java language
    ([10], 1),         # Java island
    ([11, 12], 1),     # Big Apple / NYC
    ([14], 1),         # year 2024
]


def build_corpus(n_docs: int = 200, seed: int = SEED):
    """-> (doc_rows, gold_rows) in DOCUMENTS_SCHEMA / GOLD_SCHEMA layout."""
    rng = random.Random(seed)
    templates = _templates()
    doc_rows, gold_rows = [], []
    weighted = [c for c, w in CLUSTERS for _ in range(w)]
    n_apple_inc_gold = 0

    for d in range(n_docs):
        doc_id = f"doc{d:05d}"
        cluster = weighted[rng.randrange(len(weighted))]
        k = 2 + (d % 3)
        idxs = [cluster[rng.randrange(len(cluster))] for _ in range(k)]

        spans, cursor, span_pos = [], 0, 0
        for i, ti in enumerate(idxs):
            sentence, anchors = templates[ti]
            filler = " ".join(rng.choice(FILLER_WORDS) for _ in range(rng.randrange(0, 4)))
            text = (sentence + (" " + filler.capitalize() + "." if filler else "")) + " "
            for sf, uri in anchors:
                off = text.index(sf)
                # every 10th Apple_Inc gold row is written pre-closure
                # (redirect source) — the eval path must resolve it
                # (ref index/.../filter/occurrences/RedirectResolveFilter.scala:27-48)
                if uri == "Apple_Inc":
                    n_apple_inc_gold += 1
                    if n_apple_inc_gold % 10 == 0:
                        uri = "Apple_Computer"
                gold_rows.append((doc_id, span_pos, cursor + off, sf, uri))
            spans.append(("text", text, None, cursor))
            cursor += len(text)
            span_pos += 1
            # interleave media spans deterministically
            if (d + i) % 3 == 0:
                spans.append(("image", None, f"media://{doc_id}/{i}", cursor))
                span_pos += 1

        # one long doc (>250 tokens) and one >1200 chars
        if d == 7 or d == 13:
            extra = []
            while sum(len(t or "") for _, t, _, _ in spans) < 1400:
                filler = " ".join(rng.choice(FILLER_WORDS) for _ in range(12))
                extra.append(filler.capitalize() + ".")
                spans.append(("text", extra[-1] + " ", None, cursor))
                cursor += len(extra[-1]) + 1
                span_pos += 1

        doc_rows.append((doc_id, spans))
    return doc_rows, gold_rows


def build_world(spark: SparkSession, n_docs: int = 200, seed: int = SEED) -> World:
    model = build_model(spark)
    doc_rows, gold_rows = build_corpus(n_docs=n_docs, seed=seed)
    documents = spark.createDataFrame(doc_rows, schemas.DOCUMENTS_SCHEMA)
    gold = spark.createDataFrame(gold_rows, schemas.GOLD_SCHEMA)
    return World(documents=documents, gold=gold, model=model)
