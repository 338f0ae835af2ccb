"""P2/P12 — model-based spotting: NER / chunker candidate-span generators
plugged into the DBSpotter pipeline.

Reference:
  - OpenNLPSpotter (core/src/main/scala/org/dbpedia/spotlight/db/
    OpenNLPSpotter.scala:25-70): generateCandidates = uppercase sequences
    + NP chunker spans + NER spans; typeOrder puts NE types before
    Capital_Sequences (:64).
  - NESpotter (core/src/main/java/org/dbpedia/spotlight/spot/
    NESpotter.java:55-130): person/location/organization OpenNLP models.

The external ME model files the reference ships are not public-redistributable
and no NLP model runtime is baked into this container, so the generator slot
is the contract: anything callable `tokens -> [(start, end_excl, type)]` and
picklable (it is broadcast with the dictionary). Two implementations:

  - SpacyNERGenerator: real model-based NER behind an import-try (works
    wherever spaCy + a model are installed; pre-tokenized Doc, so spans map
     1:1 to our token indices).
  - RuleNERGenerator: a deterministic rule-based stand-in (org suffixes,
    person titles, location prepositions over capitalized runs) so the
    P12 pipeline — span typing, sub-span dictionary match, type-ordered
    overlap resolution — is fully exercised and tested without model files.

Everything downstream (sub-span search DBSpotter.scala:59-87, scoring
:97-117, overlap resolution :129-179) is shared with the FSA spotter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dbpedia_spotlight_spark.operators.spotter import (
    _uppercase_spans,
    spot_documents,
)
from dbpedia_spotlight_spark.operators.tokenizer import DEFAULT_STOPWORDS
from dbpedia_spotlight_spark.model.model_tables import DEFAULT_SPOT_WEIGHTS

# ref OpenNLPSpotter.scala:64 (phraseTags = {"NP"})
OPENNLP_TYPE_ORDER = (
    "person",
    "organization",
    "location",
    "misc",
    "NP",
    "Capital_Sequences",
)


class RuleNERGenerator:
    """Deterministic typed-NE stand-in over capitalized token runs:
    a trailing org suffix -> organization; a preceding person title ->
    person; a preceding location preposition -> location; else misc.
    Lowercase-start camelCase tokens (iPhone, eBay) become misc spans —
    the one thing uppercase-sequence spotting can never see, which is the
    point of a model-based spotter.
    Declared substitute for the reference's externally-trained ME models."""

    ORG_SUFFIXES = frozenset(
        {"Inc", "Inc.", "Corp", "Corp.", "Ltd", "Ltd.", "LLC", "Company",
         "Foundation", "University"}
    )
    PERSON_TITLES = frozenset(
        {"Mr", "Mr.", "Mrs", "Mrs.", "Ms", "Ms.", "Dr", "Dr.", "Prof",
         "Prof.", "President", "Senator"}
    )
    LOC_PREPOSITIONS = frozenset({"in", "at", "near", "from", "to"})

    def __call__(self, tokens: list) -> list:
        spans = []
        for s, e, _t in _uppercase_spans(tokens):
            if tokens[e - 1] in self.ORG_SUFFIXES:
                spans.append((s, e, "organization"))
            elif tokens[s] in self.PERSON_TITLES and e - s > 1:
                # the capitalized run starts with the title itself
                spans.append((s + 1, e, "person"))
            elif s > 0 and tokens[s - 1] in self.PERSON_TITLES:
                spans.append((s, e, "person"))
            elif s > 0 and tokens[s - 1].lower() in self.LOC_PREPOSITIONS:
                spans.append((s, e, "location"))
            else:
                spans.append((s, e, "misc"))
        for i, tok in enumerate(tokens):
            if tok[:1].islower() and any(c.isupper() for c in tok[1:]):
                spans.append((i, i + 1, "misc"))
        return spans


class PerceptronNERGenerator:
    """REAL trained model-based NER: an averaged-perceptron BIO tagger
    (Collins 2002 — the same family as the reference's OpenNLP maxent
    models) with greedy left-to-right decoding and a previous-tag feature.
    Trained in-process from labeled token sequences (`fit`), so — unlike
    the spaCy path — it demonstrates actual model inference in this
    container with zero external model files. Weights are a plain
    feature->tag-score dict: picklable, broadcastable.

    Features are deliberately lexical-shape-heavy (shape, prefix/suffix,
    neighbor words) so the model generalizes to entity NAMES it never saw
    in training — asserted by test_perceptron_ner_generalizes."""

    TAGS = (
        "O",
        "B-person", "I-person",
        "B-organization", "I-organization",
        "B-location", "I-location",
    )

    def __init__(self, weights: dict):
        self.weights = weights  # feature -> {tag_idx: score}

    @staticmethod
    def _shape(tok: str) -> str:
        return "".join(
            "X" if c.isupper() else ("x" if c.islower() else ("d" if c.isdigit() else c))
            for c in tok[:4]
        )

    @classmethod
    def _features(cls, tokens, i, prev_tag: str):
        tok = tokens[i]
        prev_w = tokens[i - 1].lower() if i > 0 else "<s>"
        next_w = tokens[i + 1].lower() if i + 1 < len(tokens) else "</s>"
        return (
            "b",
            f"w={tok.lower()}",
            f"sh={cls._shape(tok)}",
            f"pre={tok[:3].lower()}",
            f"suf={tok[-3:].lower()}",
            f"ti={tok[:1].isupper()}",
            f"pw={prev_w}",
            f"nw={next_w}",
            f"pt={prev_tag}",
            f"pw+sh={prev_w}|{cls._shape(tok)}",
        )

    def _score(self, feats):
        import numpy as np

        s = np.zeros(len(self.TAGS))
        w = self.weights
        for f in feats:
            row = w.get(f)
            if row is not None:
                for t, v in row.items():
                    s[t] += v
        return s

    def tag(self, tokens) -> list:
        """Greedy BIO decode -> one tag per token."""
        out = []
        prev = "O"
        for i in range(len(tokens)):
            s = self._score(self._features(tokens, i, prev))
            best = int(s.argmax())
            prev = self.TAGS[best]
            out.append(prev)
        return out

    def __call__(self, tokens: list) -> list:
        spans = []
        start = None
        kind = None
        tags = self.tag(list(tokens))
        for i, t in enumerate(tags + ["O"]):
            cont = t.startswith("I-") and kind == t[2:]
            if start is not None and not cont:
                spans.append((start, i, kind))
                start, kind = None, None
            if t.startswith("B-") or (t.startswith("I-") and start is None):
                start, kind = i, t[2:]
        return spans

    @classmethod
    def fit(cls, examples, epochs: int = 8, seed: int = 13):
        """examples: [(tokens, bio_tags)] -> trained generator (averaged
        perceptron: final weights are the average over all updates)."""
        import random

        tag_idx = {t: i for i, t in enumerate(cls.TAGS)}
        w: dict = {}
        acc: dict = {}
        rng = random.Random(seed)
        examples = list(examples)
        step = 0
        total_steps = epochs * sum(len(t) for t, _ in examples)

        def bump(feats, t, delta):
            for f in feats:
                row = w.setdefault(f, {})
                row[t] = row.get(t, 0.0) + delta
                arow = acc.setdefault(f, {})
                # remaining-steps weighting == averaging over updates
                arow[t] = arow.get(t, 0.0) + delta * (total_steps - step)

        model = cls(w)
        for _ep in range(epochs):
            rng.shuffle(examples)
            for tokens, gold in examples:
                prev = "O"
                for i, g in enumerate(gold):
                    feats = cls._features(tokens, i, prev)
                    pred = int(model._score(feats).argmax())
                    gi = tag_idx[g]
                    if pred != gi:
                        bump(feats, gi, 1.0)
                        bump(feats, pred, -1.0)
                    # gold previous tag during training (teacher forcing)
                    prev = g
                    step += 1
        avg = {
            f: {t: v / total_steps for t, v in row.items()}
            for f, row in acc.items()
        }
        return cls(avg)


class SpacyNERGenerator:
    """spaCy-backed NER generator. Lazily loads the pipeline on first call
    inside the executor (the generator itself is pickled by model *name*,
    never by weights). Raises ImportError where spaCy is absent — callers
    gate on `spacy_available()`."""

    LABEL_MAP = {
        "PERSON": "person",
        "ORG": "organization",
        "GPE": "location",
        "LOC": "location",
        "FAC": "location",
    }

    def __init__(self, model: str = "en_core_web_sm"):
        self.model = model
        self._nlp = None

    def _load(self):
        if self._nlp is None:
            import spacy

            self._nlp = spacy.load(self.model)
        return self._nlp

    def __getstate__(self):
        return {"model": self.model}

    def __setstate__(self, state):
        self.model = state["model"]
        self._nlp = None

    def __call__(self, tokens: list) -> list:
        nlp = self._load()
        from spacy.tokens import Doc

        doc = Doc(nlp.vocab, words=list(tokens))
        for _name, pipe in nlp.pipeline:
            doc = pipe(doc)
        return [
            (ent.start, ent.end, self.LABEL_MAP.get(ent.label_, "misc"))
            for ent in doc.ents
        ]


def spacy_available(model: str = "en_core_web_sm") -> bool:
    try:
        import spacy

        spacy.load(model)
        return True
    except Exception:  # noqa: BLE001
        return False


def spot_documents_model(
    documents: DataFrame,
    surface_forms: DataFrame,
    generators: tuple | None = None,
    weights=DEFAULT_SPOT_WEIGHTS,
    stopwords: frozenset = DEFAULT_STOPWORDS,
    min_annotation_probability: float = 0.1,
) -> DataFrame:
    """OpenNLPSpotter-shaped spotting: uppercase sequences + model spans
    (no FSA walk), NE-first type order. Defaults to the rule-based
    generator; pass (SpacyNERGenerator(),) where spaCy is installed."""
    if generators is None:
        generators = (RuleNERGenerator(),)
    return spot_documents(
        documents,
        surface_forms,
        weights=weights,
        stopwords=stopwords,
        spotter="fsa",
        min_annotation_probability=min_annotation_probability,
        generators=tuple(generators),
        type_order=OPENNLP_TYPE_ORDER,
    )
