"""Snowball English (Porter2) stemmer — vectors from the published sample
vocabulary (snowballstem.org), exercising every algorithm step."""

import pytest

from dbpedia_spotlight_spark.functions.stemmer import porter2_stem
from dbpedia_spotlight_spark.operators.tokenizer import stem

CASES = {
    # step 1a/1b
    "consigned": "consign", "consigning": "consign", "consignment": "consign",
    "consisted": "consist", "consistency": "consist", "consistently": "consist",
    "kneaded": "knead", "meetings": "meet", "agreed": "agre",
    # 1b post-fix (at/bl/iz + e, doubles, short-word + e)
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "failing": "fail", "filing": "file",
    "hoping": "hope",
    # step 1c
    "happy": "happi", "crying": "cri", "sky": "sky", "saying": "say",
    # step 2
    "conditional": "condit", "rational": "ration", "valency": "valenc",
    "hesitancy": "hesit", "digitizer": "digit", "conformably": "conform",
    "radically": "radic", "differently": "differ", "vileness": "vile",
    "analogously": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formality": "formal", "sensitivity": "sensit", "sensibility": "sensibl",
    # step 3
    # formative: step-3 'ative' fails its R2 condition (longest-match still
    # consumes the step), then step-4 'ive' applies in R2 -> format
    "triplicate": "triplic", "formative": "format", "formalize": "formal",
    "electricity": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "homologous": "homolog", "activate": "activ",
    "angularity": "angular", "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "controller": "control",
    "roll": "roll",
    # exceptional forms
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "news": "news", "inning": "inning", "proceed": "proceed",
    # gener/commun/arsen prefixes (R1 starts after them — prevents
    # overstemming: 'ism' of communism is NOT in R2)
    "generate": "generat", "general": "general", "generous": "generous",
    "communism": "communism",
}


@pytest.mark.parametrize("word,expected", sorted(CASES.items()))
def test_porter2_vectors(word, expected):
    assert porter2_stem(word) == expected


def test_stem_lowercases_first():
    assert stem("Meetings") == "meet"
    assert stem("APPLE") == "appl"
